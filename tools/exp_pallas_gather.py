#!/usr/bin/env python
"""Experiment: does Mosaic support per-element dynamic gather from a
VMEM-resident table inside a Pallas kernel on this device/jax version?

Tries three formulations at bench-relevant sizes (table 905k words, 262k
queries/batch):
  1. flat 1-D table, vector indices:      out = table[idx]
  2. 2-D table, take_along_axis on lanes
  3. one-hot matmul fallback (known-slow control)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

N = 1 << 20          # table words (4 MB)
B, Q = 2048, 128     # queries per block


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 2**31, N).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, N, (B, Q)).astype(np.int32))

    # --- 1: flat gather ---------------------------------------------------
    def k1(t_ref, i_ref, o_ref):
        o_ref[:] = t_ref[:][i_ref[:]]

    try:
        f1 = jax.jit(lambda t, i: pl.pallas_call(
            k1,
            out_shape=jax.ShapeDtypeStruct((B, Q), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i))
        out = f1(table, idx)
        ok = bool(jnp.all(out == table[idx]))
        print(f"1 flat gather: OK correct={ok} {timeit(f1, table, idx):.3f} ms",
              flush=True)
    except Exception as e:
        print(f"1 flat gather: FAIL {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    # --- 2: 2-D table, gather rows via take_along_axis on sublanes -------
    t2 = table.reshape(N // 128, 128)

    def k2(t_ref, i_ref, o_ref):
        # gather one lane-row per index: out[b,q] = t[idx//128, idx%128]
        ii = i_ref[:]
        rows = ii >> 7
        lanes = ii & 127
        g = jnp.take(t_ref[:], rows.reshape(-1), axis=0)  # [B*Q,128]
        o_ref[:] = jnp.take_along_axis(
            g, lanes.reshape(-1, 1), axis=1).reshape(B, Q)

    try:
        f2 = jax.jit(lambda t, i: pl.pallas_call(
            k2,
            out_shape=jax.ShapeDtypeStruct((B, Q), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(t, i))
        out = f2(t2, idx)
        ok = bool(jnp.all(out == table[idx]))
        print(f"2 row+lane gather: OK correct={ok} "
              f"{timeit(f2, t2, idx):.3f} ms", flush=True)
    except Exception as e:
        print(f"2 row+lane gather: FAIL {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    # --- XLA control: same gather outside pallas -------------------------
    fx = jax.jit(lambda t, i: t[i])
    out = fx(table, idx)
    print(f"x XLA gather control: {timeit(fx, table, idx):.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
