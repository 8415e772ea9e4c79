#!/usr/bin/env python
"""Honestly-synchronized microbenchmarks: block_until_ready can return
before remote execution completes on the tunneled axon backend, so every
timed iteration must PULL data (np.asarray of a tiny reduction) to
synchronize.  Compares lookup-stage formulations at bench shapes."""
import sys, time, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
from metacache_tpu.ops import lookup

def bench(fn, arglists, n=12, warmup=3):
    for i in range(warmup):
        r = np.asarray(fn(*arglists[i % len(arglists)]))
    t0 = time.perf_counter()
    for i in range(n):
        r = np.asarray(fn(*arglists[i % len(arglists)]))
    return (time.perf_counter() - t0) / n * 1e3

rng = np.random.default_rng(0)
F = 905_100; L = 906_240; B, NF, MB = 8192, 32, 3
keys = np.sort(rng.integers(0, 2**32 - 2, F, dtype=np.uint64).astype(np.uint32))
counts = rng.integers(1, 3, F)
offsets = np.zeros(F + 1, np.int64); np.cumsum(counts, out=offsets[1:])
offsets = (offsets * (L / offsets[-1])).astype(np.int64)
st_np, ct_np = offsets[:-1].astype(np.int32), np.diff(offsets).astype(np.int32)
locp = np.sort(rng.integers(0, 2**20, L).astype(np.int32))
bo, steps = lookup.build_radix_index(keys)
dk, dbo = jnp.asarray(keys), jnp.asarray(bo)
dst, dct, dlp = jnp.asarray(st_np), jnp.asarray(ct_np), jnp.asarray(locp)
qs = [jnp.asarray(keys[rng.integers(0, F, (B, NF))]) for _ in range(4)]

# 0: empty-ish control (sync overhead floor)
f0 = jax.jit(lambda q: jnp.sum(q, dtype=jnp.uint32).reshape(1))
print(f"0 sync floor: {bench(f0, [(q,) for q in qs]):.2f} ms", flush=True)

# 1: search only
f1 = jax.jit(lambda k, b, q: jnp.sum(
    lookup.global_lower_bound(k, q, b, steps)).reshape(1))
print(f"1 search (radix {steps} steps): {bench(f1, [(dk, dbo, q) for q in qs]):.2f} ms", flush=True)

# 1b: search without radix (20 steps over keys only)
f1b = jax.jit(lambda k, q: jnp.sum(
    lookup.global_lower_bound(k, q, None, None)).reshape(1))
print(f"1b search (plain 20 steps): {bench(f1b, [(dk, q) for q in qs]):.2f} ms", flush=True)

# 2: full direct lookup
def direct(q, k, st, ct, lp, b):
    tgt, win, tot, ovf = lookup.lookup_matches_direct(
        q, k, st, ct, None, None, MB, bucket_offsets=b, search_steps=steps,
        loc_packed=lp, win_bits=11)
    return (jnp.sum(tgt) + jnp.sum(win) + jnp.sum(tot)).reshape(1)
f2 = jax.jit(direct)
print(f"2 direct lookup (mb={MB}): {bench(f2, [(q, dk, dst, dct, dlp, dbo) for q in qs]):.2f} ms", flush=True)
