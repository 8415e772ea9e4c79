#!/usr/bin/env python
"""Decide the search formulation: radix vs plain binary search, with
checksummed outputs and varied inputs to rule out measurement artifacts."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from metacache_tpu.ops import lookup


def timeit_varied(fn, arg_list, n=20, warmup=3):
    for i in range(warmup):
        r = fn(arg_list[i % len(arg_list)])
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    outs = []
    for i in range(n):
        outs.append(fn(arg_list[i % len(arg_list)]))
    jax.block_until_ready(outs[-1])
    dt = (time.perf_counter() - t0) / n * 1e3
    cs = int(np.asarray(outs[0]).astype(np.int64).sum())
    return dt, cs


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    F = 905_100
    B, NF = 8192, 32
    keys = np.sort(rng.integers(0, 2**32 - 2, F, dtype=np.uint64)
                   .astype(np.uint32))
    bo, steps = lookup.build_radix_index(keys)
    dk, dbo = jnp.asarray(keys), jnp.asarray(bo)
    qs = [jnp.asarray(keys[rng.integers(0, F, (B, NF))]) for _ in range(4)]
    expect = [np.searchsorted(keys, np.asarray(q).ravel()).reshape(B, NF)
              for q in qs]

    f_radix = jax.jit(lambda q: lookup.global_lower_bound(dk, q, dbo, steps))
    f_plain = jax.jit(lambda q: lookup.global_lower_bound(dk, q, None, None))

    for name, f in (("radix(3 steps)", f_radix), ("plain(20 steps)", f_plain)):
        dt, cs = timeit_varied(f, qs)
        ok = all((np.asarray(f(q)) == e).all() for q, e in zip(qs, expect))
        print(f"{name}: {dt:.3f} ms  correct={ok}", flush=True)

    # radix with smaller bucket tables
    for bits in (16, 18, 20, 22):
        nb = 1 << bits
        prefixes = (keys >> np.uint32(32 - bits)).astype(np.int64)
        b2 = np.searchsorted(prefixes, np.arange(nb + 1),
                             side="left").astype(np.int32)
        maxb = int(np.max(np.diff(b2)))
        st = max(1, maxb.bit_length())
        db2 = jnp.asarray(b2[:-1].copy())
        f = jax.jit(lambda q, db2=db2, st=st:
                    lookup.global_lower_bound(dk, q, db2, st))
        dt, cs = timeit_varied(f, qs)
        ok = (np.asarray(f(qs[0])) == expect[0]).all()
        print(f"radix bits={bits} steps={st}: {dt:.3f} ms correct={bool(ok)}",
              flush=True)


if __name__ == "__main__":
    main()
