#!/usr/bin/env python
"""Round-5: config-3 program cut-bisect with SINGLE-USE inputs.

Methodology correction: timings that reuse ANY input are unreliable on
this service (identical executions appear to be served from a cache:
0.10 ms/batch repeated vs 231 ms/batch over distinct inputs,
exp_r5_c3wire). Here every timed execution gets an input used EXACTLY
once. The full program is cut at stage boundaries; each cut's time over
N single-use inputs localizes the composition cost.
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

from metacache_tpu.config import ClassifyParams, QueryPipelineParams
from metacache_tpu.modes.query import load_all_shards
from metacache_tpu.query.engine import (QueryEngine, compute_features,
                                        unfuse_device_inputs_slim)
from metacache_tpu.native import NativeBatchReader
from metacache_tpu.ops import lookup, candidates as cand_ops, classify_op

C3 = "/tmp/mc_bench_c3"
N_USE = 12     # single-use inputs per timing
B = 8192


def main():
    print("devices:", jax.devices(), flush=True)
    db = load_all_shards(os.path.join(C3, "mydb"))
    pipeline = QueryPipelineParams(batch_size=B, max_query_len=104,
                                   max_locations_per_query=256)
    eng = QueryEngine(db, ClassifyParams(lowest_rank="species"), pipeline)
    p = eng.sketch_params
    qlen = pipeline.max_query_len
    print(f"B={B} steps={eng._search_steps} wire={eng._wire}", flush=True)

    # a large pool of distinct device-resident inputs; each timed exec
    # consumes pool entries that have never been used before
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
    cursor = [0]

    def take(n):
        s = cursor[0]
        cursor[0] += n
        return pool[s:s + n]

    def cut_sketch(f):
        p1, a1, l1, p2, a2, l2 = unfuse_device_inputs_slim(
            f, qlen, eng._len_bytes)
        feats = compute_features(p1, a1, l1, p2, a2, l2,
                                 k=p.kmer_size, sketch_size=p.sketch_size,
                                 window_size=p.window_size,
                                 starts=eng.starts, use_pallas_sketch=False)
        return jnp.sum(feats, dtype=jnp.uint32)

    def _lookup_parts(f):
        p1, a1, l1, p2, a2, l2 = unfuse_device_inputs_slim(
            f, qlen, eng._len_bytes)
        feats = compute_features(p1, a1, l1, p2, a2, l2,
                                 k=p.kmer_size, sketch_size=p.sketch_size,
                                 window_size=p.window_size,
                                 starts=eng.starts, use_pallas_sketch=False)
        return feats, l1, l2

    def cut_search(f, keys, buckets):
        feats, _, _ = _lookup_parts(f)
        idx = lookup.global_lower_bound(keys, feats, buckets,
                                        eng._search_steps)
        return jnp.sum(idx)

    def cut_offsets(f, keys, buckets, offsets):
        feats, _, _ = _lookup_parts(f)
        idx = lookup.global_lower_bound(keys, feats, buckets,
                                        eng._search_steps)
        idx = jnp.minimum(idx, keys.shape[0] - 1)
        found = (keys[idx] == feats)
        off_pairs = jnp.stack([offsets[:-1], offsets[1:]], axis=1)[idx]
        start = off_pairs[..., 0].astype(jnp.int32)
        cnt = jnp.where(found,
                        (off_pairs[..., 1] - off_pairs[..., 0])
                        .astype(jnp.int32), 0)
        return jnp.sum(start) + jnp.sum(cnt)

    def cut_lookup(f, keys, buckets, offsets, loc_packed):
        feats, _, _ = _lookup_parts(f)
        tgt, win, total, overflow = lookup.lookup_matches(
            feats, keys, offsets, jnp.zeros(1, jnp.int32),
            jnp.zeros(1, jnp.int32), eng.lmax_full,
            bucket_offsets=buckets, search_steps=eng._search_steps,
            loc_packed=loc_packed, win_bits=eng._win_bits)
        return jnp.sum(tgt) + jnp.sum(win)

    def cut_cand(f, keys, buckets, offsets, loc_packed, tct):
        feats, l1, l2 = _lookup_parts(f)
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
        return jnp.sum(cand["tax"]) + jnp.sum(cand["hits"])

    def cut_full(f, keys, buckets, offsets, loc_packed, tct, lineage):
        feats, l1, l2 = _lookup_parts(f)
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
        best, best_rank = classify_op.classify_lca(
            cand["tax"], cand["hits"], eng._lineage, eng._hits_min_dev,
            eng._hits_diff_dev, eng.highest_rank)
        return jnp.sum(best) + jnp.sum(best_rank)

    cuts = [
        ("sketch", cut_sketch, ()),
        ("+search", cut_search, (eng._keys, eng._bucket_offsets)),
        ("+offsets", cut_offsets, (eng._keys, eng._bucket_offsets,
                                   eng._offsets)),
        ("+expand+gather+sort (lookup)", cut_lookup,
         (eng._keys, eng._bucket_offsets, eng._offsets, eng._loc_packed)),
        ("+candidates", cut_cand,
         (eng._keys, eng._bucket_offsets, eng._offsets, eng._loc_packed,
          eng._tct)),
        ("+classify (full)", cut_full,
         (eng._keys, eng._bucket_offsets, eng._offsets, eng._loc_packed,
          eng._tct, eng._lineage)),
    ]
    for name, fn, extra in cuts:
        jf = jax.jit(fn)
        # warm: compile + program load on one pool input (never timed)
        wa = take(1)[0]
        jax.block_until_ready(jf(wa, *extra))
        ins = take(N_USE)
        t0 = time.perf_counter()
        outs = [jf(f, *extra) for f in ins]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / N_USE * 1e3
        print(f"{name:34s} {dt:8.2f} ms/exec (single-use x{N_USE})",
              flush=True)


if __name__ == "__main__":
    main()
