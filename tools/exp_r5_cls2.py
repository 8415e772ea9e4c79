#!/usr/bin/env python
"""Round-5: config-3 classify-stage bisect, take 2. All big tables passed
as jit ARGUMENTS (closure capture embeds them as constants -> the remote
compile service rejects/stalls, HTTP 413). Single-use inputs throughout
(repeated-args executions are served from a cache on this service).
Variants ordered by decisiveness; compiles are disk-cached so partial
progress survives reruns."""
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
N_USE = 8
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

    TBL = (eng._keys, eng._bucket_offsets, eng._offsets, eng._loc_packed,
           eng._tct)

    def cand_stage(f, keys, buckets, offsets, loc_packed, tct):
        p1, a1, l1, p2, a2, l2 = unfuse_device_inputs_slim(
            f, qlen, eng._len_bytes)
        feats = compute_features(p1, a1, l1, p2, a2, l2,
                                 k=p.kmer_size, sketch_size=p.sketch_size,
                                 window_size=p.window_size,
                                 starts=eng.starts, use_pallas_sketch=False)
        tgt, win, total, overflow = lookup.lookup_matches(
            feats, keys, offsets, jnp.zeros(1, jnp.int32),
            jnp.zeros(1, jnp.int32), eng.lmax_full,
            bucket_offsets=buckets, search_steps=eng._search_steps,
            loc_packed=loc_packed, win_bits=eng._win_bits)
        pair_len = jnp.maximum(l1 + l2, eng.classify.insert_size_max)
        nw = (2 + pair_len // p.window_stride).astype(jnp.int32)
        cand = cand_ops.generate_candidates(
            tgt, win, nw, tct, eng.classify.max_candidates,
            win_bits=eng._win_bits, tax_onehot=True)
        return cand

    def run(name, jf, args_of):
        wa = take(1)[0]
        t0 = time.perf_counter()
        jax.block_until_ready(jf(*args_of(wa)))
        tc = time.perf_counter() - t0
        ins = take(N_USE)
        t0 = time.perf_counter()
        outs = [jf(*args_of(f)) for f in ins]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / N_USE * 1e3
        print(f"{name:40s} {dt:8.2f} ms/exec (warm {tc:.0f}s)", flush=True)

    lineage = eng._lineage

    # 1. SPLIT: cand program | classify program
    jf1 = jax.jit(lambda f, *t: cand_stage(f, *t))
    jf2 = jax.jit(lambda tax, hits, lin, hm, hd: classify_op.classify_lca(
        tax, hits, lin, hm, hd, eng.highest_rank))
    wa = take(1)[0]
    t0 = time.perf_counter()
    c = jf1(wa, *TBL)
    jax.block_until_ready(jf2(c["tax"], c["hits"], lineage,
                              eng._hits_min_dev, eng._hits_diff_dev))
    tc = time.perf_counter() - t0
    ins = take(N_USE)
    t0 = time.perf_counter()
    outs = []
    for f in ins:
        c = jf1(f, *TBL)
        outs.append(jf2(c["tax"], c["hits"], lineage,
                        eng._hits_min_dev, eng._hits_diff_dev))
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / N_USE * 1e3
    print(f"{'SPLIT cand | classify':40s} {dt:8.2f} ms/exec (warm {tc:.0f}s)",
          flush=True)

    # 2. fused with optimization_barrier between cand and classify
    def full_barrier(f, keys, buckets, offsets, loc_packed, tct, lin,
                     hm, hd):
        cand = cand_stage(f, keys, buckets, offsets, loc_packed, tct)
        tax, hits = jax.lax.optimization_barrier((cand["tax"],
                                                  cand["hits"]))
        best, best_rank = classify_op.classify_lca(tax, hits, lin, hm, hd,
                                                   eng.highest_rank)
        return jnp.sum(best) + jnp.sum(best_rank)
    run("fused + optimization_barrier",
        jax.jit(full_barrier),
        lambda f: (f, *TBL, lineage, eng._hits_min_dev,
                   eng._hits_diff_dev))

    # 3. fused, classify via row GATHER (padded lineage > 2048 rows)
    big_lineage = jnp.asarray(np.tile(
        np.asarray(lineage), (2049 // lineage.shape[0] + 1, 1)))

    def full_gather(f, keys, buckets, offsets, loc_packed, tct, lin,
                    hm, hd):
        cand = cand_stage(f, keys, buckets, offsets, loc_packed, tct)
        best, best_rank = classify_op.classify_lca(
            cand["tax"], cand["hits"], lin, hm, hd, eng.highest_rank)
        return jnp.sum(best) + jnp.sum(best_rank)
    run("fused, classify via gather",
        jax.jit(full_gather),
        lambda f: (f, *TBL, big_lineage, eng._hits_min_dev,
                   eng._hits_diff_dev))

    # 4. fused one-hot (the 110 ms baseline, re-confirm in this weather)
    run("fused, classify via one-hot (base)",
        jax.jit(full_gather),
        lambda f: (f, *TBL, lineage, eng._hits_min_dev,
                   eng._hits_diff_dev))


if __name__ == "__main__":
    main()
