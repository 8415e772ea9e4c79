#!/usr/bin/env python
"""Bisect the 12 ms binary-search cost: gather time vs table size, vs
number of dependent steps, vs dtype."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


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
    B, Q = 2048, 128

    for logn in (17, 20, 22, 24):
        N = 1 << logn
        table = jnp.asarray(rng.integers(0, 2**31, N).astype(np.int32))
        idx = jnp.asarray(rng.integers(0, N, (B, Q)).astype(np.int32))
        f = jax.jit(lambda t, i: t[i])
        ms = timeit(f, table, idx)
        print(f"gather table 2^{logn} ({N*4>>20} MB): {ms:.3f} ms",
              flush=True)

    # dependent chain of 3 gathers over a 905k table (the search pattern)
    F = 905_100
    table = jnp.asarray(np.sort(
        rng.integers(0, 2**32, F, dtype=np.uint64).astype(np.uint32)))
    q = jnp.asarray(table[rng.integers(0, F, (B, Q))])

    def chain(t, q, steps):
        lo = jnp.zeros(q.shape, jnp.int32)
        hi = jnp.full(q.shape, F, jnp.int32)
        for _ in range(steps):
            mid = (lo + hi) >> 1
            mv = t[jnp.minimum(mid, F - 1)]
            less = mv < q
            lo = jnp.where(less, mid + 1, lo)
            hi = jnp.where(less, hi, mid)
        return lo

    for steps in (1, 3, 8, 20):
        f = jax.jit(lambda t, qq, s=steps: chain(t, qq, s))
        ms = timeit(f, table, q)
        print(f"dependent search steps={steps} (u32 keys): {ms:.3f} ms",
              flush=True)

    # same but keys bitcast to int32 (monotone under xor 0x80000000)
    tbl_i32 = jnp.asarray(
        (np.asarray(table).astype(np.int64) - 2**31).astype(np.int32))
    q_i32 = jnp.asarray(
        (np.asarray(q).astype(np.int64) - 2**31).astype(np.int32))

    def chain_i32(t, q, steps):
        lo = jnp.zeros(q.shape, jnp.int32)
        hi = jnp.full(q.shape, F, jnp.int32)
        for _ in range(steps):
            mid = (lo + hi) >> 1
            mv = t[jnp.minimum(mid, F - 1)]
            less = mv < q
            lo = jnp.where(less, mid + 1, lo)
            hi = jnp.where(less, hi, mid)
        return lo

    for steps in (3, 8):
        f = jax.jit(lambda t, qq, s=steps: chain_i32(t, qq, s))
        ms = timeit(f, tbl_i32, q_i32)
        print(f"dependent search steps={steps} (i32 keys): {ms:.3f} ms",
              flush=True)

    # one isolated u32 gather
    idx = jnp.asarray(rng.integers(0, F, (B, Q)).astype(np.int32))
    f = jax.jit(lambda t, i: t[i])
    ms = timeit(f, table, idx)
    print(f"single u32 gather over 905k: {ms:.3f} ms", flush=True)
    ms = timeit(f, tbl_i32, idx)
    print(f"single i32 gather over 905k: {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
