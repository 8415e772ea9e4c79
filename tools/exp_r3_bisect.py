#!/usr/bin/env python
"""Round-3 bisect: where does the 45.9 ms of device-busy time in the
fast-tier query program actually go?

Round-2 PERF attributed ~75% to S(1)-staged gathers, but the same gathers
compiled standalone run in ~0.02 ms — the slowness is a property of the
FUSED program, not the ops.  This script times:
  1. the full fast-tier program (engine._dispatch_tier)
  2. each stage compiled as its own jit program
  3. the full program with optimization_barrier between stages
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
from metacache_tpu.query import engine as eng_mod
from metacache_tpu.query.engine import QueryEngine, fuse_host_inputs
from metacache_tpu.native import NativeBatchReader
from metacache_tpu.ops import lookup, candidates as cand_ops, classify_op

WORK = "/tmp/mc_bench"


def timeit(fn, *a, n=20):
    r = fn(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    db = load_all_shards(os.path.join(WORK, "mydb"))
    classify = ClassifyParams(lowest_rank="species")
    pipeline = QueryPipelineParams(batch_size=8192, max_query_len=128,
                                   max_locations_per_query=256)
    eng = QueryEngine(db, classify, pipeline)
    print("direct_mb:", eng._direct_mb, "exact:", eng._direct_exact,
          "lmax_fast:", eng.lmax_fast, flush=True)

    b = next(iter(NativeBatchReader(
        os.path.join(WORK, "reads_1.fa"), os.path.join(WORK, "reads_2.fa"),
        "files", pipeline.batch_size, pipeline.max_query_len)))
    fused = fuse_host_inputs(b.packed1, b.ambig1, b.lens1,
                             b.packed2, b.ambig2, b.lens2)
    fused_dev = jnp.asarray(fused)

    # ---- 1. full program ------------------------------------------------
    def full(fd):
        out = eng._dispatch_tier(np.asarray(fd), None, eng.lmax_fast,
                                 direct_mb=eng._direct_mb)
        return out["summary"]
    print(f"full fast-tier program: {timeit(full, fused):.2f} ms", flush=True)

    # ---- 2. stages standalone ------------------------------------------
    p = eng.sketch_params
    feat_fn = jax.jit(lambda fd: eng_mod.compute_features(
        *eng_mod.unfuse_device_inputs(fd, pipeline.max_query_len),
        k=p.kmer_size, sketch_size=p.sketch_size, window_size=p.window_size,
        starts=eng.starts, use_pallas_sketch=False))
    print(f"  stage sketch(features): {timeit(feat_fn, fused_dev):.2f} ms",
          flush=True)
    feats = feat_fn(fused_dev)
    feats = jax.block_until_ready(feats)

    mb = eng._direct_mb
    lk_fn = jax.jit(lambda f: lookup.lookup_matches_direct(
        f, eng._keys, eng._start_tbl, eng._cnt_tbl, eng._loc_tgt,
        eng._loc_win, mb, bucket_offsets=eng._bucket_offsets,
        search_steps=eng._search_steps, loc_packed=eng._loc_packed,
        win_bits=eng._win_bits))
    print(f"  stage lookup_direct:    {timeit(lk_fn, feats):.2f} ms",
          flush=True)
    tgt, win, total, ovf = [jax.block_until_ready(x) for x in lk_fn(feats)]

    lens1 = jnp.asarray(b.lens1)
    lens2 = jnp.asarray(b.lens2)
    def cand_fn_(tgt, win, l1, l2):
        pair_len = jnp.maximum(l1 + l2, classify.insert_size_max)
        num_windows = (2 + pair_len // p.window_stride).astype(jnp.int32)
        return cand_ops.generate_candidates(tgt, win, num_windows,
                                            eng._tct, classify.max_candidates)
    cand_fn = jax.jit(cand_fn_)
    print(f"  stage candidates:       "
          f"{timeit(cand_fn, tgt, win, lens1, lens2):.2f} ms", flush=True)
    cand = jax.block_until_ready(cand_fn(tgt, win, lens1, lens2))

    cls_fn = jax.jit(lambda tax, hits: classify_op.classify_lca(
        tax, hits, eng._lineage, jnp.int32(eng.hits_min),
        jnp.float32(classify.hits_diff_fraction), eng.highest_rank))
    print(f"  stage classify_lca:     "
          f"{timeit(cls_fn, cand['tax'], cand['hits']):.2f} ms", flush=True)

    # ---- 3. stages chained in ONE jit program (no barriers) -------------
    def chained(fd):
        f = eng_mod.compute_features(
            *eng_mod.unfuse_device_inputs(fd, pipeline.max_query_len),
            k=p.kmer_size, sketch_size=p.sketch_size,
            window_size=p.window_size, starts=eng.starts,
            use_pallas_sketch=False)
        tgt, win, total, ovf = lookup.lookup_matches_direct(
            f, eng._keys, eng._start_tbl, eng._cnt_tbl, eng._loc_tgt,
            eng._loc_win, mb, bucket_offsets=eng._bucket_offsets,
            search_steps=eng._search_steps, loc_packed=eng._loc_packed,
            win_bits=eng._win_bits)
        _, _, l1, _, _, l2 = eng_mod.unfuse_device_inputs(
            fd, pipeline.max_query_len)
        c = cand_fn_(tgt, win, l1, l2)
        best, best_rank = classify_op.classify_lca(
            c["tax"], c["hits"], eng._lineage, jnp.int32(eng.hits_min),
            jnp.float32(classify.hits_diff_fraction), eng.highest_rank)
        return jnp.stack([best, best_rank])
    cj = jax.jit(chained)
    print(f"  chained one-jit:        {timeit(cj, fused_dev):.2f} ms",
          flush=True)

    # ---- 4. chained with optimization barriers --------------------------
    def barriered(fd):
        f = eng_mod.compute_features(
            *eng_mod.unfuse_device_inputs(fd, pipeline.max_query_len),
            k=p.kmer_size, sketch_size=p.sketch_size,
            window_size=p.window_size, starts=eng.starts,
            use_pallas_sketch=False)
        f = jax.lax.optimization_barrier(f)
        tgt, win, total, ovf = lookup.lookup_matches_direct(
            f, eng._keys, eng._start_tbl, eng._cnt_tbl, eng._loc_tgt,
            eng._loc_win, mb, bucket_offsets=eng._bucket_offsets,
            search_steps=eng._search_steps, loc_packed=eng._loc_packed,
            win_bits=eng._win_bits)
        tgt, win = jax.lax.optimization_barrier((tgt, win))
        _, _, l1, _, _, l2 = eng_mod.unfuse_device_inputs(
            fd, pipeline.max_query_len)
        c = cand_fn_(tgt, win, l1, l2)
        c = jax.lax.optimization_barrier(c)
        best, best_rank = classify_op.classify_lca(
            c["tax"], c["hits"], eng._lineage, jnp.int32(eng.hits_min),
            jnp.float32(classify.hits_diff_fraction), eng.highest_rank)
        return jnp.stack([best, best_rank])
    bj = jax.jit(barriered)
    print(f"  chained + barriers:     {timeit(bj, fused_dev):.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
