#!/usr/bin/env python
"""Round-4: find where generate_candidates' ~23 ms/batch actually goes.

tools/exp_r4_candsort.py shows the raw lax.sort custom calls at these
shapes cost 0.03-0.08 ms — the stage's cost is in the glue. Bisect the
packed formulation cumulatively on realistic-shaped data.
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

from metacache_tpu.ops import candidates as cand_ops

B, L = 8192, 256
WB = 14


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
    print(f"{name:44s} {ma.generated_code_size_in_bytes/1e6:7.2f} MB"
          f"  {ms:7.2f} ms", flush=True)
    return r


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    # realistic-looking sorted (tgt, win) rows with sentinel padding
    tgt = np.sort(rng.integers(0, 96, (B, L), dtype=np.int32), axis=1)
    win = rng.integers(0, 8800, (B, L), dtype=np.int32)
    order = np.lexsort((win, tgt), axis=1)
    win = np.take_along_axis(win, order, axis=1)
    npad = rng.integers(0, L // 2, B)
    for i in range(B):
        tgt[i, L - npad[i]:] = 2**31 - 1
        win[i, L - npad[i]:] = 2**31 - 1
    tgt = jnp.asarray(tgt)
    win = jnp.asarray(win)
    nw = jnp.full((B,), 4, jnp.int32)

    def keys_only(tgt, win, nw):
        valid = tgt != 2**31 - 1
        pk_raw = (tgt << WB) | win
        pk = jnp.where(valid, pk_raw, 2**30 - 1)
        base = pk_raw & jnp.int32(~((1 << WB) - 1))
        qk = jnp.where(valid,
                       jnp.maximum(pk_raw - (nw[:, None] - 1), base),
                       2**30 - 1)
        return pk, qk
    pk, qk = stat("keys (elementwise)", keys_only, tgt, win, nw)

    def concat_sort(pk, qk):
        pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None, :],
                               (B, L))
        c_key = jnp.concatenate([qk * 2, pk * 2 + 1], axis=1)
        c_pos = jnp.concatenate([pos, pos], axis=1)
        return jax.lax.sort((c_key, c_pos), dimension=1, num_keys=1,
                            is_stable=False)
    s_key, s_pos = stat("concat + sort1 [B,512] 2-op", concat_sort, pk, qk)

    def cums(s_key):
        return jnp.cumsum(s_key & 1, axis=1)
    items_before = stat("cumsum [B,512]", cums, s_key)

    def backsort(s_key, s_pos, items_before):
        s_item = s_key & 1
        P2 = 1 << int(max(1, L - 1)).bit_length()
        RP = 1 << int(L).bit_length()
        bkey = (s_item * P2 + s_pos) * RP + items_before
        sb = jax.lax.sort(bkey, dimension=1, is_stable=False)
        return sb[:, :L] & (RP - 1)
    stat("back sort [B,512] 1-op", backsort, s_key, s_pos, items_before)

    def full_rank(tgt, win, nw):
        valid = tgt != 2**31 - 1
        pk_raw = (tgt << WB) | win
        pk = jnp.where(valid, pk_raw, 2**30 - 1)
        base = pk_raw & jnp.int32(~((1 << WB) - 1))
        qk = jnp.where(valid,
                       jnp.maximum(pk_raw - (nw[:, None] - 1), base),
                       2**30 - 1)
        return cand_ops._rank_lower_bound_packed(pk, qk, L)
    left = stat("full packed rank_lower_bound", full_rank, tgt, win, nw)

    # segment scans on their own
    def scans(tgt, left):
        valid = tgt != 2**31 - 1
        pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None, :],
                               (B, L))
        hits = jnp.where(valid, pos - left + 1, 0).astype(jnp.int32)
        new_seg = jnp.concatenate(
            [jnp.ones((B, 1), dtype=jnp.bool_),
             tgt[:, 1:] != tgt[:, :-1]], axis=1)
        seg_best = cand_ops._segment_broadcast_max(hits, new_seg, L)
        achiever = valid & (hits == seg_best)
        first_pos = cand_ops._segment_broadcast_min(
            jnp.where(achiever, pos, L), new_seg, L)
        return seg_best, first_pos
    stat("segment scans (prefix+suffix max)", scans, tgt, left)

    # single prefix-max scan
    def pmax(x):
        return cand_ops._prefix_max(x)
    stat("one _prefix_max [B,256]", pmax, left)

    tct = jnp.asarray(np.arange(98, dtype=np.int32))

    def full(tgt, win, nw):
        return cand_ops.generate_candidates(tgt, win, nw, tct, 2,
                                            win_bits=WB)
    stat("generate_candidates packed (synthetic)", full, tgt, win, nw)


if __name__ == "__main__":
    main()
