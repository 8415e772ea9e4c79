#!/usr/bin/env python
"""Clean lookup-stage microbenchmarks at pipeline shapes.

Methodology notes (hard-won, see PERF.md "measurement pitfalls"):
  * Tables MUST be passed as jit arguments — capturing a device array in
    the jitted closure costs ~26 ms/call in host-side overhead on this
    tunneled backend, drowning the device time.
  * Time with block-on-every-call: async back-to-back dispatch adds a
    ~2.5 ms/call queueing overhead through the tunnel that is NOT device
    time (the real pipeline overlaps it with host work).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from metacache_tpu.ops import lookup


def bench(fn, arglists, n=30, warmup=4):
    for i in range(warmup):
        r = fn(*arglists[i % len(arglists)])
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for i in range(n):
        r = fn(*arglists[i % len(arglists)])
        jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    F = 905_100
    L = 906_240
    B, NF, LMAX = 8192, 32, 64
    keys = np.sort(rng.integers(0, 2**32 - 2, F, dtype=np.uint64)
                   .astype(np.uint32))
    counts = rng.integers(1, 3, F)
    offsets = np.zeros(F + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    offsets = (offsets * (L / offsets[-1])).astype(np.int32)
    loc_packed = np.sort(rng.integers(0, 2**20, L).astype(np.int32))
    bo, steps = lookup.build_radix_index(keys)
    print(f"radix steps={steps} bits={int(len(bo)).bit_length()-1}",
          flush=True)

    dk, dbo = jnp.asarray(keys), jnp.asarray(bo)
    doff = jnp.asarray(offsets)
    dlp = jnp.asarray(loc_packed)
    qs = [jnp.asarray(keys[rng.integers(0, F, (B, NF))]) for _ in range(4)]
    exp = np.searchsorted(keys, np.asarray(qs[0]).ravel()).reshape(B, NF)

    # 1. search at pipeline shape
    f = jax.jit(lambda k, b, q: lookup.global_lower_bound(k, q, b, steps))
    ok = bool((np.asarray(f(dk, dbo, qs[0])) == exp).all())
    print(f"1 search [8192,32]: {bench(f, [(dk, dbo, q) for q in qs]):.3f} ms"
          f" correct={ok}", flush=True)

    # 2. search reshaped to lanes
    f2 = jax.jit(lambda k, b, q: lookup.global_lower_bound(
        k, q.reshape(2048, 128), b, steps).reshape(B, NF))
    ok = bool((np.asarray(f2(dk, dbo, qs[0])) == exp).all())
    print(f"2 search reshaped [2048,128]: "
          f"{bench(f2, [(dk, dbo, q) for q in qs]):.3f} ms correct={ok}",
          flush=True)

    # 3. search + offsets fetch + counts
    def stage3(k, b, off, q):
        idx = lookup.global_lower_bound(k, q, b, steps)
        idx = jnp.minimum(idx, F - 1)
        found = k[idx] == q
        op = jnp.stack([off[:-1], off[1:]], axis=1)[idx]
        start = op[..., 0].astype(jnp.int32)
        cnt = jnp.where(found, (op[..., 1] - op[..., 0]).astype(jnp.int32), 0)
        return start, cnt
    f3 = jax.jit(stage3)
    print(f"3 search+offsets: "
          f"{bench(f3, [(dk, dbo, doff, q) for q in qs]):.3f} ms", flush=True)

    # 4. + expand + gather + sort (full lookup, packed path)
    def stage4(k, b, off, lp, q):
        return lookup.lookup_matches(q, k, off, None, None, LMAX,
                                     bucket_offsets=b, search_steps=steps,
                                     loc_packed=lp, win_bits=11)
    f4 = jax.jit(stage4)
    print(f"4 full lookup (packed, LMAX={LMAX}): "
          f"{bench(f4, [(dk, dbo, doff, dlp, q) for q in qs]):.3f} ms",
          flush=True)

    # 5. expand_slots alone
    start0, cnt0 = f3(dk, dbo, doff, qs[0])
    cum = jnp.cumsum(cnt0, axis=1)
    f5 = jax.jit(lambda s, ce: lookup._expand_slots(s, ce, LMAX))
    print(f"5 expand_slots [B,{NF}]->[B,{LMAX}]: "
          f"{bench(f5, [(start0, cum - cnt0)]):.3f} ms", flush=True)


if __name__ == "__main__":
    main()
