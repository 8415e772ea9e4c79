#!/usr/bin/env python
"""Round-4: reproduce the S(1)-staged gather slowdown and find a
formulation that avoids it.

Trace fact: the identical [524288]-index gathers run 0.04 ms in an
isolated jit but 3.7-10.8 ms inside the fused query program, where their
operands/outputs carry {...S(1)} layouts. Hypothesis: the flatten/reshape
between the tiled [16384, 32] index tensor, the [B*NF]-flat gather, and
the tiled [16384, 288] consumer forces linear-layout staging.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

B, NF, W = 16384, 32, 9
F = 5_794_057


def stat(name, fn, *args):
    comp = jax.jit(fn).lower(*args).compile()
    r = comp(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(10):
        r = comp(*args)
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / 10 * 1e3
    print(f"{name:52s} {ms:7.2f} ms", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.integers(0, 2**31 - 1, (B, NF), dtype=np.int32))
    tbl = jnp.asarray(rng.integers(0, 2**30, (F, W), dtype=np.int32))
    tb1 = jnp.asarray(rng.integers(0, 2**30, F, dtype=np.int32))

    def chain_3d(feat, tbl):
        idx = (feat >> 8) % F
        row = tbl[idx]                       # [B, NF, 9]
        vals = row[..., 1:].reshape(B, NF * 8)
        s = jax.lax.sort(vals, dimension=1, is_stable=False)
        return s[:, :4].sum()
    stat("3-D row gather -> reshape -> sort", chain_3d, feat, tbl)

    def chain_word(feat, tb1):
        idx = (feat >> 8) % F
        v = tb1[idx]                          # [B, NF] word gather
        s = jax.lax.sort(jnp.tile(v, (1, 8)), dimension=1, is_stable=False)
        return s[:, :4].sum()
    stat("2-D word gather -> tile -> sort", chain_word, feat, tb1)

    def chain_cols(feat, tbl):
        idx = (feat >> 8) % F
        cols = [tbl[:, j][idx] for j in range(1, 9)]   # 8 x [B, NF]
        vals = jnp.concatenate(cols, axis=1)           # [B, NF*8]
        s = jax.lax.sort(vals, dimension=1, is_stable=False)
        return s[:, :4].sum()
    stat("8 column word gathers -> concat -> sort", chain_cols, feat, tbl)

    def chain_flat(feat, tbl):
        idx = ((feat >> 8) % F).reshape(B * NF)
        row = tbl[idx]                       # [B*NF, 9]
        vals = row[:, 1:].reshape(B, NF * 8)
        s = jax.lax.sort(vals, dimension=1, is_stable=False)
        return s[:, :4].sum()
    stat("flat row gather -> reshape -> sort", chain_flat, feat, tbl)

    # iterative binary-search-style dependent word gathers (the radix search)
    def chain_search(feat, tb1):
        lo = (feat >> 12) % F
        for _ in range(4):
            mid = (lo + 7) >> 1
            v = tb1[jnp.minimum(mid, F - 1)]
            lo = jnp.where(v < feat, mid + 1, lo)
        s = jax.lax.sort(jnp.tile(lo, (1, 8)), dimension=1, is_stable=False)
        return s[:, :4].sum()
    stat("4-step dependent word gathers -> sort", chain_search, feat, tb1)

    def chain_nosort(feat, tbl):
        idx = (feat >> 8) % F
        row = tbl[idx]
        return row.sum()
    stat("3-D row gather -> sum (no sort)", chain_nosort, feat, tbl)


if __name__ == "__main__":
    main()
