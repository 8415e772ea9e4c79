#!/usr/bin/env python
"""Round-5: FULL fused config-3 program time with device-resident inputs,
vs the ~7 ms sum of its isolated stages (exp_r4_c3stages rerun) and the
~105 ms/batch it costs inside the bench pipeline. Bisects the fusion
pathology: whole program, split-at-lookup, split-at-candidates."""
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
from metacache_tpu.query.engine import QueryEngine
from metacache_tpu.native import NativeBatchReader

C3 = "/tmp/mc_bench_c3"


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:44s} {ms:8.2f} ms/batch", flush=True)
    return out


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    print("devices:", jax.devices(), flush=True)
    db = load_all_shards(os.path.join(C3, "mydb"))
    pipeline = QueryPipelineParams(batch_size=B, max_query_len=104,
                                   max_locations_per_query=256)
    eng = QueryEngine(db, ClassifyParams(lowest_rank="species"), pipeline)
    print(f"B={B} direct_mb={eng._direct_mb} seg={eng._seg_shift} "
          f"steps={eng._search_steps} wire={eng._wire}", flush=True)
    b = next(iter(NativeBatchReader(
        os.path.join(C3, "reads_1.fa"), os.path.join(C3, "reads_2.fa"),
        "files", B, pipeline.max_query_len)))
    fused, _ = eng.precompute_wire(b.packed1, b.ambig1, b.lens1,
                                   b.packed2, b.ambig2, b.lens2)
    fused_dev = jax.device_put(np.asarray(fused), jax.devices()[0])
    jax.block_until_ready(fused_dev)

    # 1. the engine's real fused program, device-resident input
    def full(f):
        out = eng._dispatch_tier(f, None, eng.lmax_full, direct_mb=0,
                                 wire=eng._wire, sfmt="s4")
        return out["summary"]
    timeit("full fused program (summary out)", full, fused_dev)

    # 2. same but pull ALL outputs (cand tensors too)
    def full_all(f):
        out = eng._dispatch_tier(f, None, eng.lmax_full, direct_mb=0,
                                 wire=eng._wire, sfmt="s4")
        return (out["summary"], out["cand"]["tax"], out["cand"]["hits"],
                out["cand"]["beg"], out["cand"]["end"], out["cand"]["tgt"])
    timeit("full program, all outputs", full_all, fused_dev)

    # 3. split: (sketch+lookup) | (candidates+classify)
    from metacache_tpu.query.engine import (compute_features,
                                            unfuse_device_inputs_slim)
    from metacache_tpu.ops import lookup, candidates as cand_ops, classify_op
    p = eng.sketch_params
    qlen = pipeline.max_query_len

    @jax.jit
    def part1(f, keys, offsets, buckets, loc_packed):
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
        return tgt, win, total, overflow, l1 + l2

    @jax.jit
    def part2(tgt, win, lens, tct, lineage, hmin, hdiff):
        nw = (2 + jnp.maximum(lens, eng.classify.insert_size_max)
              // p.window_stride).astype(jnp.int32)
        cand = cand_ops.generate_candidates(
            tgt, win, nw, tct, eng.classify.max_candidates,
            win_bits=eng._win_bits, tax_onehot=True)
        best, best_rank = classify_op.classify_lca(
            cand["tax"], cand["hits"], lineage, hmin, hdiff,
            eng.highest_rank)
        return jnp.stack([best, best_rank])

    def split(f):
        tgt, win, total, overflow, lens = part1(
            f, eng._keys, eng._offsets, eng._bucket_offsets,
            eng._loc_packed)
        return part2(tgt, win, lens, eng._tct, eng._lineage,
                     eng._hits_min_dev, eng._hits_diff_dev)
    timeit("split: sketch+lookup | cand+classify", split, fused_dev)
    timeit("  part1 alone", lambda f: part1(
        f, eng._keys, eng._offsets, eng._bucket_offsets,
        eng._loc_packed)[0], fused_dev)

    # 4. classify bisect: one-hot vs gather lineage at this node count
    n_nodes = int(db.taxonomy.ranked_lineage.shape[0])
    print(f"n_nodes={n_nodes} lineage={eng._lineage.shape}", flush=True)
    ctax = jnp.asarray(np.random.default_rng(0).integers(
        0, n_nodes, (B, 2)).astype(np.int32))
    chits = jnp.ones((B, 2), jnp.int32) * 20

    def cls(tax, hits, lin):
        return classify_op.classify_lca(tax, hits, lin, eng._hits_min_dev,
                                        eng._hits_diff_dev,
                                        eng.highest_rank)
    timeit("classify_lca (auto path)", jax.jit(cls), ctax, chits,
           eng._lineage)

    big = jnp.concatenate([eng._lineage] * (2049 // n_nodes + 1))[:4096]

    def cls_gather(tax, hits, lin):
        return classify_op.classify_lca(tax, hits, lin, eng._hits_min_dev,
                                        eng._hits_diff_dev,
                                        eng.highest_rank)
    timeit("classify_lca (gather, padded>2048)", jax.jit(cls_gather),
           ctax, chits, big)


if __name__ == "__main__":
    main()
