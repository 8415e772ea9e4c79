#!/usr/bin/env python
"""Verify: padding the lookup tables to a multiple of 128 (or pow2) takes
the fast gather path.  Re-runs global_lower_bound and the full expand at
pipeline shapes with padded vs unpadded tables, checking correctness."""
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


def pad_to(arr, m, fill):
    n = len(arr)
    p = (-n) % m
    if p == 0:
        return arr
    return np.concatenate([arr, np.full(p, fill, arr.dtype)])


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    F = 905_100
    B, NF = 8192, 32
    keys = np.sort(rng.integers(0, 2**32 - 2, F, dtype=np.uint64)
                   .astype(np.uint32))
    queries = keys[rng.integers(0, F, (B, NF))]
    bo, steps = lookup.build_radix_index(keys)
    dq, dbo = jnp.asarray(queries), jnp.asarray(bo)

    ref = None
    for label, mult in (("unpadded", 1), ("pad128", 128), ("pad512", 512),
                        ("pad8", 8)):
        kp = pad_to(keys, mult, np.uint32(0xFFFFFFFF))
        dk = jnp.asarray(kp)
        f = jax.jit(
            lambda q, dk=dk: lookup.global_lower_bound(dk, q, dbo, steps))
        out = np.asarray(f(dq))
        if ref is None:
            ref = out
        ok = bool((out == ref).all())
        print(f"search {label} (F={len(kp)}): {timeit(f, dq):.3f} ms "
              f"correct={ok}", flush=True)

    # single gather padded vs not
    idx = jnp.asarray(rng.integers(0, F, (B, NF)).astype(np.int32))
    for label, mult in (("unpadded", 1), ("pad8", 8), ("pad128", 128)):
        kp = jnp.asarray(pad_to(keys, mult, np.uint32(0)))
        f = jax.jit(lambda t, i: t[i])
        print(f"single gather {label}: {timeit(f, kp, idx):.3f} ms",
              flush=True)


if __name__ == "__main__":
    main()
