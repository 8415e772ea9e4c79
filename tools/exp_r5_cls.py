#!/usr/bin/env python
"""Round-5: classify_lca is the config-3 program's 110 ms/exec (single-use
inputs, exp_r5_cuts — everything through candidates is 0.06 ms). Bisect
WHICH construct in classify does it: lineage one-hot vs gather, the fold
loop, the final argmax/take, nested-jit, or the program split."""
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

C3 = "/tmp/mc_bench_c3"
N_USE = 10
B = 8192


def main():
    print("devices:", jax.devices(), flush=True)
    db = load_all_shards(os.path.join(C3, "mydb"))
    pipeline = QueryPipelineParams(batch_size=B, max_query_len=104,
                                   max_locations_per_query=256)
    eng = QueryEngine(db, ClassifyParams(lowest_rank="species"), pipeline)
    p = eng.sketch_params
    qlen = pipeline.max_query_len

    batches = []
    rd = NativeBatchReader(os.path.join(C3, "reads_1.fa"),
                           os.path.join(C3, "reads_2.fa"), "files",
                           B, qlen)
    need = N_USE * 10 + 10
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

    def cand_stage(f):
        p1, a1, l1, p2, a2, l2 = unfuse_device_inputs_slim(
            f, qlen, eng._len_bytes)
        feats = compute_features(p1, a1, l1, p2, a2, l2,
                                 k=p.kmer_size, sketch_size=p.sketch_size,
                                 window_size=p.window_size,
                                 starts=eng.starts, use_pallas_sketch=False)
        tgt, win, total, overflow = lookup.lookup_matches(
            feats, eng._keys, eng._offsets, jnp.zeros(1, jnp.int32),
            jnp.zeros(1, jnp.int32), eng.lmax_full,
            bucket_offsets=eng._bucket_offsets,
            search_steps=eng._search_steps,
            loc_packed=eng._loc_packed, win_bits=eng._win_bits)
        pair_len = jnp.maximum(l1 + l2, eng.classify.insert_size_max)
        nw = (2 + pair_len // p.window_stride).astype(jnp.int32)
        return cand_ops.generate_candidates(
            tgt, win, nw, eng._tct, eng.classify.max_candidates,
            win_bits=eng._win_bits, tax_onehot=True)

    lineage = eng._lineage       # [263, 21] device
    n_nodes = int(lineage.shape[0])
    big_lineage = jnp.asarray(np.tile(np.asarray(lineage),
                                      (2049 // n_nodes + 1, 1))[:4096])

    variants = {}

    def v_thr(f):
        cand = cand_stage(f)
        hits0 = cand["hits"][:, 0]
        thr = jnp.where(hits0 > eng._hits_min_dev,
                        hits0.astype(jnp.float32) * eng._hits_diff_dev,
                        jnp.float32(0))
        return jnp.sum(thr)
    variants["cand + thr only"] = v_thr

    def v_lin0(f):
        cand = cand_stage(f)
        lin = classify_op._lineage_rows(lineage, cand["tax"][:, 0])
        return jnp.sum(lin)
    variants["cand + lineage_rows(onehot) x1"] = v_lin0

    def v_lin0_gather(f):
        cand = cand_stage(f)
        lin = big_lineage[cand["tax"][:, 0]]
        return jnp.sum(lin)
    variants["cand + lineage GATHER x1"] = v_lin0_gather

    def v_cls_onehot(f):
        cand = cand_stage(f)
        best, best_rank = classify_op.classify_lca(
            cand["tax"], cand["hits"], lineage, eng._hits_min_dev,
            eng._hits_diff_dev, eng.highest_rank)
        return jnp.sum(best) + jnp.sum(best_rank)
    variants["cand + classify (onehot)"] = v_cls_onehot

    def v_cls_gather(f):
        cand = cand_stage(f)
        best, best_rank = classify_op.classify_lca(
            cand["tax"], cand["hits"], big_lineage, eng._hits_min_dev,
            eng._hits_diff_dev, eng.highest_rank)
        return jnp.sum(best) + jnp.sum(best_rank)
    variants["cand + classify (gather path)"] = v_cls_gather

    # split into two programs: cand | classify — FIRST (most decisive)
    jf1 = jax.jit(lambda f: cand_stage(f))
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
    print(f"{'SPLIT cand | classify':36s} {dt:8.2f} ms/exec", flush=True)

    order = ["cand + classify (gather path)", "cand + lineage GATHER x1",
             "cand + lineage_rows(onehot) x1", "cand + thr only",
             "cand + classify (onehot)"]
    for name in order:
        fn = variants[name]
        jf = jax.jit(fn)
        wa = take(1)[0]
        jax.block_until_ready(jf(wa))
        ins = take(N_USE)
        t0 = time.perf_counter()
        outs = [jf(f) for f in ins]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / N_USE * 1e3
        print(f"{name:36s} {dt:8.2f} ms/exec", flush=True)


if __name__ == "__main__":
    main()
