#!/usr/bin/env python
"""Experiment: is the in-pipeline gather slowness a lane-width/layout
problem?  Benchmarks the actual lookup stages at their pipeline shapes
([B, NF] = [8192, 32], minor dim 32) vs lane-aligned reshapes
([2048, 128]), at bench DB sizes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from metacache_tpu.ops import lookup


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
    F = 905_100
    B, NF, LMAX = 8192, 32, 64
    keys = np.sort(rng.integers(0, 2**32, F, dtype=np.uint64)
                   .astype(np.uint32))
    queries = keys[rng.integers(0, F, (B, NF))]
    bo, steps = lookup.build_radix_index(keys)
    print(f"radix steps: {steps}", flush=True)
    dkeys, dq, dbo = jnp.asarray(keys), jnp.asarray(queries), jnp.asarray(bo)

    f_narrow = jax.jit(
        lambda q: lookup.global_lower_bound(dkeys, q, dbo, steps))
    ms = timeit(f_narrow, dq)
    print(f"search at [8192,32]:  {ms:.3f} ms", flush=True)

    dq128 = dq.reshape(2048, 128)
    ms = timeit(f_narrow, dq128)
    print(f"search at [2048,128]: {ms:.3f} ms", flush=True)

    # search embedded in a program whose input arrives as [8192,32] but is
    # reshaped to lanes before the search
    f_reshape = jax.jit(lambda q: lookup.global_lower_bound(
        dkeys, q.reshape(2048, 128), dbo, steps).reshape(B, NF))
    ms = timeit(f_reshape, dq)
    print(f"search reshape inside jit: {ms:.3f} ms", flush=True)

    # CSR expansion at pipeline shape
    counts = rng.integers(1, 3, F)
    offsets = np.zeros(F + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    doff = jnp.asarray(offsets.astype(np.int32))

    def expand(q):
        idx = lookup.global_lower_bound(dkeys, q, dbo, steps)
        idx = jnp.minimum(idx, F - 1)
        found = dkeys[idx] == q
        off_pairs = jnp.stack([doff[:-1], doff[1:]], axis=1)[idx]
        start = off_pairs[..., 0].astype(jnp.int32)
        cnt = jnp.where(found, (off_pairs[..., 1]
                                - off_pairs[..., 0]).astype(jnp.int32), 0)
        cum = jnp.cumsum(cnt, axis=1)
        li = lookup._expand_slots(start, cum - cnt, LMAX)
        return li

    f_exp = jax.jit(expand)
    ms = timeit(f_exp, dq)
    print(f"search+offsets+expand [8192,32]: {ms:.3f} ms", flush=True)

    # same but offsets fetched as two separate 1-word gathers (no stack)
    def expand2(q):
        idx = lookup.global_lower_bound(dkeys, q, dbo, steps)
        idx = jnp.minimum(idx, F - 1)
        found = dkeys[idx] == q
        start = doff[idx].astype(jnp.int32)
        end = doff[idx + 1].astype(jnp.int32)
        cnt = jnp.where(found, end - start, 0)
        cum = jnp.cumsum(cnt, axis=1)
        li = lookup._expand_slots(start, cum - cnt, LMAX)
        return li

    ms = timeit(jax.jit(expand2), dq)
    print(f"search+2x1word+expand [8192,32]: {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
