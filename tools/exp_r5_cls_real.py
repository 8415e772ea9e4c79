#!/usr/bin/env python
"""Round-5: classify-stage cost on the REALISTIC world with single-use
inputs (the config-3 cut bisect showed +classify = 110 ms/exec vs 0.06 ms
through candidates; repeated-input timings are invalid on this service).
Tests the candidate fixes: optimization_barrier before classify, split
two-program dispatch, gather-path lineage."""
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
N_USE = 10
B = 16384


def main():
    print("devices:", jax.devices(), flush=True)
    db = load_all_shards(os.path.join(BIG, "mydb"))
    pipeline = QueryPipelineParams(batch_size=B, max_query_len=104,
                                   max_locations_per_query=256)
    eng = QueryEngine(db, ClassifyParams(lowest_rank="species"), pipeline)
    p = eng.sketch_params
    qlen = pipeline.max_query_len
    print(f"B={B} seg={eng._seg_shift} direct_mb={eng._direct_mb}",
          flush=True)

    batches = []
    rd = NativeBatchReader(os.path.join(BIG, "reads_1.fa"),
                           os.path.join(BIG, "reads_2.fa"), "files",
                           B, qlen)
    need = N_USE * 8 + 8
    for b in rd:
        batches.append(b)
        if len(batches) >= need:
            break
    rd.close()
    pool = []
    for b in batches:
        w, _ = eng.precompute_wire(b.packed1, b.ambig1, b.lens1,
                                   b.packed2, b.ambig2, b.lens2)
        pool.append(jax.device_put(np.asarray(w)))
    jax.block_until_ready(pool)
    print(f"pool {len(pool)}", flush=True)
    cursor = [0]

    def take(n):
        s = cursor[0]
        cursor[0] += n
        return pool[s:s + n]

    def run(name, jf, *extra):
        wa = take(1)[0]
        t0 = time.perf_counter()
        jax.block_until_ready(jf(wa, *extra))
        tc = time.perf_counter() - t0
        ins = take(N_USE)
        t0 = time.perf_counter()
        outs = [jf(f, *extra) for f in ins]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / N_USE * 1e3
        print(f"{name:40s} {dt:8.2f} ms/exec (warm {tc:.0f}s)", flush=True)

    # the ENGINE's own fused main program (direct tier, seg, slim, p2)
    def eng_prog(f):
        out = eng._dispatch_tier(f, None, eng.lmax_fast,
                                 direct_mb=eng._direct_mb,
                                 wire=eng._wire, sfmt="p2")
        return out["summary"]
    run("engine fused main program", eng_prog)

    # rebuild the same pipeline explicitly so we can cut it
    lineage = eng._lineage_small if eng._seg_shift else eng._lineage

    def cand_stage(f):
        p1, a1, l1, p2, a2, l2 = unfuse_device_inputs_slim(
            f, qlen, eng._len_bytes)
        feats = compute_features(p1, a1, l1, p2, a2, l2,
                                 k=p.kmer_size, sketch_size=p.sketch_size,
                                 window_size=p.window_size,
                                 starts=eng.starts, use_pallas_sketch=False)
        tgt, win, total, overflow = lookup.lookup_matches_direct(
            feats, eng._keys, eng._start_tbl, eng._cnt_tbl,
            eng._loc_tgt, eng._loc_win, eng._direct_mb,
            bucket_offsets=eng._bucket_offsets,
            search_steps=eng._search_steps, loc_packed=eng._loc_packed,
            win_bits=eng._win_bits, direct_tbl=eng._direct_tbl)
        pair_len = jnp.maximum(l1 + l2, eng.classify.insert_size_max)
        nw = (2 + pair_len // p.window_stride).astype(jnp.int32)
        cand = cand_ops.generate_candidates(
            tgt, win, nw, eng._tct, eng.classify.max_candidates,
            win_bits=eng._win_bits, ci_shift=eng._seg_shift,
            tax_onehot=eng._seg_shift == 0 and eng._pack_ok)
        return cand, total, overflow

    def cut_cand(f):
        cand, total, overflow = cand_stage(f)
        return jnp.sum(cand["tax"]) + jnp.sum(cand["hits"])
    run("through candidates only", jax.jit(cut_cand))

    def full(f):
        cand, total, overflow = cand_stage(f)
        best, best_rank = classify_op.classify_lca(
            cand["tax"], cand["hits"], lineage, eng._hits_min_dev,
            eng._hits_diff_dev, eng.highest_rank)
        return jnp.sum(best) + jnp.sum(best_rank)
    run("full (cand + classify)", jax.jit(full))

    def full_barrier(f):
        cand, total, overflow = cand_stage(f)
        tax, hits = jax.lax.optimization_barrier(
            (cand["tax"], cand["hits"]))
        best, best_rank = classify_op.classify_lca(
            tax, hits, lineage, eng._hits_min_dev,
            eng._hits_diff_dev, eng.highest_rank)
        return jnp.sum(best) + jnp.sum(best_rank)
    run("full with optimization_barrier", jax.jit(full_barrier))

    # split: two programs
    jf1 = jax.jit(lambda f: cand_stage(f)[0])
    jf2 = jax.jit(lambda tax, hits: classify_op.classify_lca(
        tax, hits, lineage, eng._hits_min_dev, eng._hits_diff_dev,
        eng.highest_rank))
    wa = take(1)[0]
    c = jf1(wa)
    jax.block_until_ready(jf2(c["tax"], c["hits"]))
    ins = take(N_USE)
    t0 = time.perf_counter()
    outs = []
    for f in ins:
        c = jf1(f)
        outs.append(jf2(c["tax"], c["hits"]))
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / N_USE * 1e3
    print(f"{'SPLIT cand | classify':40s} {dt:8.2f} ms/exec", flush=True)


if __name__ == "__main__":
    main()
