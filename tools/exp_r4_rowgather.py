#!/usr/bin/env python
"""Round-4: row-gather cost vs row width/alignment at lookup shapes.

The fused realistic program's cost is 7 gathers (trace): 6 word-gathers
for the radix search (3.7 ms each at [524288]) + one 9-word row gather
(10.8 ms). Planning a bucket-key-table that replaces the search with ONE
row gather — measure row-width scaling to pick the layout."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N = 524288          # 16384 reads x 32 features
F = 16_777_216      # bucket count at bits=24


def stat(name, fn, *args):
    comp = jax.jit(fn).lower(*args).compile()
    r = comp(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(10):
        r = comp(*args)
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / 10 * 1e3
    print(f"{name:40s} {ms:7.2f} ms", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, F, N, dtype=np.int32))
    idx2d = idx.reshape(16384, 32)
    for W in (1, 4, 5, 8, 9, 16):
        tbl = jnp.asarray(rng.integers(0, 2**30, (F, W), dtype=np.int32))
        stat(f"row gather [{N}] x [{F//1000000}M,{W}]",
             (lambda t, i: t[i]), tbl, idx)
        jax.clear_caches()
    tbl9 = jnp.asarray(rng.integers(0, 2**30, (F, 9), dtype=np.int32))
    stat("row gather 2-D idx [16384,32] W=9",
         (lambda t, i: t[i]), tbl9, idx2d)
    # fused search replacement: gather + compare-count + second gather
    feat = jnp.asarray(rng.integers(0, 2**31 - 1, (16384, 32),
                                    dtype=np.int32))
    dt = jnp.asarray(rng.integers(0, 2**30, (5_794_057, 9), dtype=np.int32))

    def kbt_lookup(kbt, feat, dt):
        b = feat >> 8
        row = kbt[b]                        # [B, NF, 9]
        lo = row[..., 0]
        ks = row[..., 1:]
        slot = jnp.sum((ks < feat[..., None]).astype(jnp.int32), axis=-1)
        idx = jnp.minimum(lo + slot, dt.shape[0] - 1)
        drow = dt[idx]                      # [B, NF, 9]
        return drow, jnp.any(ks == feat[..., None], axis=-1)
    stat("kbt row + compare + direct row", kbt_lookup, tbl9, feat, dt)


if __name__ == "__main__":
    main()
