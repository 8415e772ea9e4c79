#!/usr/bin/env python
"""Round-4: cumulative prefix bisect of generate_candidates (packed path).
Each stat compiles the stage PREFIX up to a point; the step that adds the
~20 ms pins the pathology (tools/exp_r4_glue.py shows each piece alone is
<0.05 ms while the fused whole is ~21 ms)."""
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
_BIG = np.int32(2**31 - 1)


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


def make_inputs():
    rng = np.random.default_rng(0)
    tgt = np.sort(rng.integers(0, 96, (B, L), dtype=np.int32), axis=1)
    win = rng.integers(0, 8800, (B, L), dtype=np.int32)
    order = np.lexsort((win, tgt), axis=1)
    win = np.take_along_axis(win, order, axis=1)
    npad = rng.integers(0, L // 2, B)
    for i in range(B):
        tgt[i, L - npad[i]:] = 2**31 - 1
        win[i, L - npad[i]:] = 2**31 - 1
    return (jnp.asarray(tgt), jnp.asarray(win),
            jnp.full((B,), 4, jnp.int32),
            jnp.asarray(np.arange(98, dtype=np.int32)))


def prefix(upto):
    P2 = 1 << int(max(1, L - 1)).bit_length()
    LP = 1 << int(L).bit_length()
    PK_PAD = jnp.int32(2**30 - 1)

    def fn(tgt, win, num_windows, target_cand_tax):
        T1 = target_cand_tax.shape[0]
        valid = tgt != _BIG
        pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None, :],
                               (B, L))
        pk_raw = (tgt << WB) | win
        pk = jnp.where(valid, pk_raw, PK_PAD)
        base = pk_raw & jnp.int32(~((1 << WB) - 1))
        qk = jnp.where(valid,
                       jnp.maximum(pk_raw - (num_windows[:, None] - 1),
                                   base), PK_PAD)
        left = cand_ops._rank_lower_bound_packed(pk, qk, L)
        hits = jnp.where(valid, pos - left + 1, 0).astype(jnp.int32)
        if upto == "rank":
            return hits
        new_seg = jnp.concatenate(
            [jnp.ones((B, 1), dtype=jnp.bool_),
             tgt[:, 1:] != tgt[:, :-1]], axis=1)
        seg_best = cand_ops._segment_broadcast_max(hits, new_seg, L)
        achiever = valid & (hits == seg_best)
        first_pos = cand_ops._segment_broadcast_min(
            jnp.where(achiever, pos, L), new_seg, L)
        rep = achiever & (pos == first_pos)
        if upto == "rep":
            return rep
        safe_tgt = jnp.where(valid, tgt, T1 - 1)
        key = jnp.where(rep, target_cand_tax[safe_tgt], _BIG)
        if upto == "key":
            return key
        hp = (L - hits) * P2 + pos
        hpl = hp * LP + left
        s_key, s_hpl, s_pk = jax.lax.sort(
            (key, hpl, pk_raw), dimension=1, num_keys=2, is_stable=False)
        if upto == "dedup_sort":
            return s_key, s_hpl, s_pk
        first_of_key = jnp.concatenate(
            [jnp.ones((B, 1), dtype=jnp.bool_),
             s_key[:, 1:] != s_key[:, :-1]], axis=1)
        winner = first_of_key & (s_key != _BIG)
        o_hpl = jnp.where(winner, s_hpl, _BIG)
        if upto == "winner":
            return o_hpl
        f_hpl, f_key, f_pk = jax.lax.sort(
            (o_hpl, s_key, s_pk), dimension=1, num_keys=1, is_stable=False)
        if upto == "topk_sort":
            return f_hpl, f_key, f_pk
        Cn = 2
        top_ok = f_hpl[:, :Cn] != _BIG
        f_hp = f_hpl[:, :Cn] // LP
        f_hits = L - f_hp // P2
        top_left = jnp.clip(f_hpl[:, :Cn] & (LP - 1), 0, L - 1)
        f_end = f_pk[:, :Cn] & jnp.int32((1 << WB) - 1)
        f_tgt = f_pk[:, :Cn] >> WB
        beg = jnp.take_along_axis(win, top_left, axis=1)
        if upto == "decode_nobeg":
            return f_hits, f_end, f_tgt
        return {
            "tax": jnp.where(top_ok, f_key[:, :Cn], 0),
            "hits": jnp.where(top_ok, f_hits, 0),
            "beg": jnp.where(top_ok, beg, 0),
            "end": jnp.where(top_ok, f_end, 0),
            "tgt": jnp.where(top_ok, f_tgt, TARGET_SENTINEL_,),
        }
    return fn


TARGET_SENTINEL_ = np.int32(2**31 - 1)


def main():
    print("devices:", jax.devices(), flush=True)
    tgt, win, nw, tct = make_inputs()
    for upto in ("rank", "rep", "key", "dedup_sort", "winner", "topk_sort",
                 "decode_nobeg", "full"):
        stat(f"prefix:{upto}", prefix(upto), tgt, win, nw, tct)


if __name__ == "__main__":
    main()
