#!/usr/bin/env python
"""Round-4: which op inside lookup_matches_direct costs 194 MB / 42 ms at
realistic table sizes (5.8M keys / 13.4M locations)?

Sub-bisects: binary search, start/cnt fetch, slot emission, the location
gather, the final sort — each standalone, at realistic AND toy table
sizes, plus candidate reformulations of the location gather."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from metacache_tpu.ops import lookup

B, NF, MB = 8192, 32, 8
W = NF * MB


def stat(name, fn, *args):
    jitted = jax.jit(fn)
    comp = jitted.lower(*args).compile()
    ma = comp.memory_analysis()
    r = comp(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(10):
        r = comp(*args)
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / 10 * 1e3
    print(f"{name:44s} {ma.generated_code_size_in_bytes/1e6:8.2f} MB "
          f"{ms:8.2f} ms", flush=True)


def run(L_TABLE, F_KEYS, tag):
    print(f"--- tables: {F_KEYS/1e6:.1f}M keys, {L_TABLE/1e6:.1f}M "
          f"locations ({tag}) ---", flush=True)
    rng = np.random.default_rng(0)
    loc_packed = jnp.asarray(rng.integers(0, 2**21, L_TABLE, np.int64)
                             .astype(np.int32))
    start_np = rng.integers(0, L_TABLE - MB, F_KEYS).astype(np.int32)
    start_tbl = jnp.asarray(start_np)
    cnt_tbl = jnp.asarray(rng.integers(0, MB + 1, F_KEYS).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, F_KEYS, (B, NF)).astype(np.int32))

    def fetch_start_cnt(idx):
        return start_tbl[idx], cnt_tbl[idx]
    stat("start/cnt fetch [B,NF] x2", fetch_start_cnt, idx)

    start, cnt = jax.jit(fetch_start_cnt)(idx)

    def emit(start, cnt):
        cnt_c = jnp.minimum(cnt, MB)
        li = jnp.concatenate([start + j for j in range(MB)], axis=1)
        validf = jnp.concatenate([cnt_c > j for j in range(MB)], axis=1)
        return jnp.where(validf, li, 0), validf
    stat("slot emission (concat, j-major)", emit, start, cnt)
    li, validf = jax.jit(emit)(start, cnt)

    def gather_flat(li, validf):
        return jnp.where(validf, loc_packed[li], jnp.int32(2**31 - 1))
    stat("location gather [B,256] flat", gather_flat, li, validf)

    g = jax.jit(gather_flat)(li, validf)

    def sort_only(g):
        return jax.lax.sort(g, dimension=1, is_stable=False)
    stat("final sort [B,256] single key", sort_only, g)

    # reformulation A: row-gather from a padded [F, MB] direct table
    direct_tbl = jnp.asarray(
        np.stack([np.asarray(loc_packed)[np.minimum(
            start_np + j, L_TABLE - 1)] for j in range(MB)], axis=1))

    def gather_rows(idx, cnt):
        cnt_c = jnp.minimum(cnt, MB)
        vals = direct_tbl[idx]                       # [B, NF, MB] row gather
        validf = cnt_c[:, :, None] > jnp.arange(MB, dtype=jnp.int32)
        vals = jnp.where(validf, vals, jnp.int32(2**31 - 1))
        return vals.reshape(B, W)
    stat("A: row gather [B,NF] x MB-row table", gather_rows, idx, cnt)

    # reformulation B: one flat gather of [B*NF] base + reshape via iota
    def gather_cols(start, cnt):
        cnt_c = jnp.minimum(cnt, MB)
        cols = []
        for j in range(MB):
            cols.append(jnp.where(cnt_c > j, loc_packed[start + j],
                                  jnp.int32(2**31 - 1)))
        return jnp.concatenate(cols, axis=1)
    stat("B: MB separate [B,NF] gathers", gather_cols, start, cnt)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    run(13_400_000, 5_800_000, "realistic")
    run(906_000, 600_000, "toy")
