#!/usr/bin/env python
"""Round-5: config-2 program cut-bisect (single-use inputs, tables as
args). The map_topk fix removed the [B, L] map gather but per-exec is
still ~185 ms; find the stage."""
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
                                        unfuse_device_inputs_slim1)
from metacache_tpu.native import NativeBatchReader
from metacache_tpu.ops import lookup, candidates as cand_ops, classify_op

C2 = "/tmp/mc_bench_c2"
N_USE = 8
B = 16384


def main():
    print("devices:", jax.devices(), flush=True)
    db = load_all_shards(os.path.join(C2, "mydb"))
    pipeline = QueryPipelineParams(batch_size=B, max_query_len=104,
                                   max_locations_per_query=256)
    eng = QueryEngine(db, ClassifyParams(lowest_rank="species"), pipeline)
    p = eng.sketch_params
    qlen = pipeline.max_query_len
    print(f"B={B} direct_mb={eng._direct_mb} map_topk={eng._map_topk} "
          f"n_nodes={eng._lineage.shape}", flush=True)

    batches = []
    rd = NativeBatchReader(os.path.join(C2, "reads.fa"), None, "none",
                           B, qlen)
    for b in rd:
        batches.append(b)
        if len(batches) >= N_USE * 8 + 8:
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

    def feats_of(f):
        p1, a1, l1, p2, a2, l2 = unfuse_device_inputs_slim1(
            f, qlen, eng._len_bytes)
        fe = compute_features(p1, a1, l1, p2, a2, l2,
                              k=p.kmer_size, sketch_size=p.sketch_size,
                              window_size=p.window_size,
                              starts=eng.starts, use_pallas_sketch=False)
        return fe, l1, l2

    def cut_sketch(f):
        fe, _, _ = feats_of(f)
        return jnp.sum(fe, dtype=jnp.uint32)

    def cut_search(f, keys, buckets):
        fe, _, _ = feats_of(f)
        idx = lookup.global_lower_bound(keys, fe, buckets,
                                        eng._search_steps)
        return jnp.sum(idx)

    def cut_lookup(f, keys, buckets, st, ct, loc_packed, dtbl):
        fe, _, _ = feats_of(f)
        tgt, win, total, overflow = lookup.lookup_matches_direct(
            fe, keys, st, ct, jnp.zeros(1, jnp.int32),
            jnp.zeros(1, jnp.int32), eng._direct_mb,
            bucket_offsets=buckets, search_steps=eng._search_steps,
            loc_packed=loc_packed, win_bits=eng._win_bits,
            direct_tbl=dtbl)
        return jnp.sum(tgt) + jnp.sum(win)

    def cut_cand(f, keys, buckets, st, ct, loc_packed, dtbl, tct):
        fe, l1, l2 = feats_of(f)
        tgt, win, total, overflow = lookup.lookup_matches_direct(
            fe, keys, st, ct, jnp.zeros(1, jnp.int32),
            jnp.zeros(1, jnp.int32), eng._direct_mb,
            bucket_offsets=buckets, search_steps=eng._search_steps,
            loc_packed=loc_packed, win_bits=eng._win_bits,
            direct_tbl=dtbl)
        pair_len = jnp.maximum(l1 + l2, eng.classify.insert_size_max)
        nw = (2 + pair_len // p.window_stride).astype(jnp.int32)
        cand = cand_ops.generate_candidates(
            tgt, win, nw, tct, eng.classify.max_candidates,
            win_bits=eng._win_bits, map_topk=True)
        return jnp.sum(cand["tax"]) + jnp.sum(cand["hits"])

    def cut_full(f, keys, buckets, st, ct, loc_packed, dtbl, tct, lin,
                 hm, hd):
        fe, l1, l2 = feats_of(f)
        tgt, win, total, overflow = lookup.lookup_matches_direct(
            fe, keys, st, ct, jnp.zeros(1, jnp.int32),
            jnp.zeros(1, jnp.int32), eng._direct_mb,
            bucket_offsets=buckets, search_steps=eng._search_steps,
            loc_packed=loc_packed, win_bits=eng._win_bits,
            direct_tbl=dtbl)
        pair_len = jnp.maximum(l1 + l2, eng.classify.insert_size_max)
        nw = (2 + pair_len // p.window_stride).astype(jnp.int32)
        cand = cand_ops.generate_candidates(
            tgt, win, nw, tct, eng.classify.max_candidates,
            win_bits=eng._win_bits, map_topk=True)
        ks = ("tax", "hits")
        tax, hits = jax.lax.optimization_barrier((cand["tax"],
                                                  cand["hits"]))
        best, best_rank = classify_op.classify_lca(
            tax, hits, lin, hm, hd, eng.highest_rank)
        return jnp.sum(best) + jnp.sum(best_rank)

    cuts = [
        ("sketch", cut_sketch, ()),
        ("+search", cut_search, (eng._keys, eng._bucket_offsets)),
        ("+direct lookup", cut_lookup,
         (eng._keys, eng._bucket_offsets, eng._start_tbl, eng._cnt_tbl,
          eng._loc_packed, eng._direct_tbl)),
        ("+candidates", cut_cand,
         (eng._keys, eng._bucket_offsets, eng._start_tbl, eng._cnt_tbl,
          eng._loc_packed, eng._direct_tbl, eng._tct)),
        ("+classify (full)", cut_full,
         (eng._keys, eng._bucket_offsets, eng._start_tbl, eng._cnt_tbl,
          eng._loc_packed, eng._direct_tbl, eng._tct, eng._lineage,
          eng._hits_min_dev, eng._hits_diff_dev)),
    ]
    for name, fn, extra in cuts:
        jf = jax.jit(fn)
        wa = take(1)[0]
        t0 = time.perf_counter()
        jax.block_until_ready(jf(wa, *extra))
        tc = time.perf_counter() - t0
        ins = take(N_USE)
        t0 = time.perf_counter()
        outs = [jf(f, *extra) for f in ins]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / N_USE * 1e3
        print(f"{name:28s} {dt:8.2f} ms/exec (warm {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
