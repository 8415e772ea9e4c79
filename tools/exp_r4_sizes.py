#!/usr/bin/env python
"""Round-4: per-stage generated-code sizes + device times of the REALISTIC
main program (direct_mb=8, slim wire, [8192, 256] match width).

The full program measured 18.7 MB generated code (exp_r4_realistic) vs
~6 MB for the toy configuration — this pins down which stage grew."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from metacache_tpu.config import ClassifyParams, QueryPipelineParams
from metacache_tpu.modes.query import load_all_shards
from metacache_tpu.query.engine import (QueryEngine, compute_features,
                                        unfuse_device_inputs_slim)
from metacache_tpu.native import NativeBatchReader
from metacache_tpu.ops import lookup, candidates as cand_ops, classify_op

BIG = "/tmp/mc_bench_big"


def stat(name, fn, *args, run=True):
    jitted = jax.jit(fn)
    lowered = jitted.lower(*args)
    comp = lowered.compile()
    ma = comp.memory_analysis()
    ms = ""
    if run:
        r = comp(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(5):
            r = comp(*args)
        jax.block_until_ready(r)
        ms = f"  {(time.perf_counter()-t0)/5*1e3:7.2f} ms"
    print(f"{name:34s} {ma.generated_code_size_in_bytes/1e6:7.2f} MB{ms}",
          flush=True)
    return r if run else None


def main():
    print("devices:", jax.devices(), flush=True)
    db = load_all_shards(os.path.join(BIG, "mydb"))
    pipeline = QueryPipelineParams(batch_size=8192, max_query_len=104,
                                   max_locations_per_query=256)
    eng = QueryEngine(db, ClassifyParams(lowest_rank="species"), pipeline)
    p = eng.sketch_params
    b = next(iter(NativeBatchReader(
        os.path.join(BIG, "reads_1.fa"), os.path.join(BIG, "reads_2.fa"),
        "files", pipeline.batch_size, pipeline.max_query_len)))
    fused, _ = eng.precompute_wire(b.packed1, b.ambig1, b.lens1,
                                   b.packed2, b.ambig2, b.lens2)
    fused = jnp.asarray(fused)
    qlen = pipeline.max_query_len

    def unfuse(f):
        return unfuse_device_inputs_slim(f, qlen, eng._len_bytes)

    parts = stat("unfuse(slim)", unfuse, fused)

    def feats(f):
        p1, a1, l1, p2, a2, l2 = unfuse_device_inputs_slim(
            f, qlen, eng._len_bytes)
        return compute_features(p1, a1, l1, p2, a2, l2,
                                k=p.kmer_size, sketch_size=p.sketch_size,
                                window_size=p.window_size, starts=eng.starts,
                                use_pallas_sketch=False)
    features = stat("unfuse+sketch", feats, fused)

    mb = eng._direct_mb

    steps = eng._search_steps
    wbits = eng._win_bits

    def lk(features, keys, start_tbl, cnt_tbl, buckets, direct_tbl):
        return lookup.lookup_matches_direct(
            features, keys, start_tbl, cnt_tbl,
            eng._loc_tgt, eng._loc_win, mb,
            bucket_offsets=buckets,
            search_steps=steps, loc_packed=None,
            win_bits=wbits, direct_tbl=direct_tbl)
    tgt, win, total, overflow = stat(
        "lookup_direct(mb=%d,row-tbl)" % mb, lk, features, eng._keys,
        eng._start_tbl, eng._cnt_tbl, eng._bucket_offsets, eng._direct_tbl)

    def lk_search(features, keys, buckets):
        return lookup.global_lower_bound(keys, features, buckets, steps)
    stat("  lookup: radix search (%d steps)" % steps,
         lk_search, features, eng._keys, eng._bucket_offsets)

    def lk_rowgather(features, keys, buckets, direct_tbl):
        idx = lookup.global_lower_bound(keys, features, buckets, steps)
        return direct_tbl[jnp.minimum(idx, direct_tbl.shape[0] - 1)]
    stat("  lookup: search + direct row gather", lk_rowgather, features,
         eng._keys, eng._bucket_offsets, eng._direct_tbl)

    nw = jnp.full((8192,), 4, jnp.int32)

    def cands(tgt, win, nw):
        return cand_ops.generate_candidates(tgt, win, nw, eng._tct,
                                            eng.classify.max_candidates,
                                            win_bits=eng._win_bits,
                                            ci_shift=eng._seg_shift)
    cand = stat("generate_candidates(L=%d,seg=%d)" % (
        tgt.shape[1], eng._seg_shift), cands, tgt, win, nw)

    lineage = eng._lineage_small if eng._seg_shift else eng._lineage

    def cls(tax, hits):
        return classify_op.classify_lca(tax, hits, lineage,
                                        eng._hits_min_dev,
                                        eng._hits_diff_dev,
                                        eng.highest_rank)
    stat("classify_lca(N=%d)" % lineage.shape[0], cls,
         cand["tax"], cand["hits"])

    # sub-bisect of generate_candidates at this width
    def rank_lb(tgt, win, nw):
        q_win = win - nw[:, None] + 1
        return cand_ops._rank_lower_bound(tgt, win, q_win)
    stat("  cand: rank_lower_bound", rank_lb, tgt, win, nw)

    def seg(tgt, win, nw):
        q_win = win - nw[:, None] + 1
        left = cand_ops._rank_lower_bound(tgt, win, q_win)
        B, L = tgt.shape
        valid = tgt != -1
        pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None, :],
                               (B, L))
        hits = jnp.where(valid, pos - left + 1, 0).astype(jnp.int32)
        new_seg = jnp.concatenate(
            [jnp.ones((B, 1), dtype=jnp.bool_),
             tgt[:, 1:] != tgt[:, :-1]], axis=1)
        seg_best = cand_ops._segment_broadcast_max(hits, new_seg, L)
        first_pos = cand_ops._segment_broadcast_min(
            jnp.where(valid & (hits == seg_best), pos, L), new_seg, L)
        return seg_best, first_pos
    stat("  cand: +segment scans", seg, tgt, win, nw)


if __name__ == "__main__":
    main()
