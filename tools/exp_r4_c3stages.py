#!/usr/bin/env python
"""Round-4: per-stage device times of the config-3 single-tier program
(210M features / 708M locations, B=8192, lmax=256). All tables passed as
jit ARGUMENTS (closure capture embeds them in the HLO and the remote
compile service rejects >400 MB programs)."""
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


def stat(name, fn, *args, n=5):
    comp = jax.jit(fn).lower(*args).compile()
    r = comp(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = comp(*args)
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:44s} {ms:8.2f} ms", flush=True)
    return r


def main():
    print("devices:", jax.devices(), flush=True)
    db = load_all_shards(os.path.join(C3, "mydb"))
    pipeline = QueryPipelineParams(batch_size=8192, max_query_len=104,
                                   max_locations_per_query=256)
    eng = QueryEngine(db, ClassifyParams(lowest_rank="species"), pipeline)
    p = eng.sketch_params
    b = next(iter(NativeBatchReader(
        os.path.join(C3, "reads_1.fa"), os.path.join(C3, "reads_2.fa"),
        "files", pipeline.batch_size, pipeline.max_query_len)))
    fused, _ = eng.precompute_wire(b.packed1, b.ambig1, b.lens1,
                                   b.packed2, b.ambig2, b.lens2)
    fused = jnp.asarray(fused)
    qlen = pipeline.max_query_len
    steps = eng._search_steps
    wbits = eng._win_bits
    lmax = eng.lmax_full
    print(f"search_steps={steps} win_bits={wbits} lmax={lmax} "
          f"seg={eng._seg_shift}", flush=True)

    def feats(f):
        p1, a1, l1, p2, a2, l2 = unfuse_device_inputs_slim(
            f, qlen, eng._len_bytes)
        return compute_features(p1, a1, l1, p2, a2, l2,
                                k=p.kmer_size, sketch_size=p.sketch_size,
                                window_size=p.window_size,
                                starts=eng.starts, use_pallas_sketch=False)
    features = stat("unfuse+sketch", feats, fused)

    def srch(features, keys, buckets):
        return lookup.global_lower_bound(keys, features, buckets, steps)
    idx = stat(f"radix search ({steps} steps)", srch, features, eng._keys,
               eng._bucket_offsets)

    def offs(idx, offsets, keys, features):
        F = keys.shape[0]
        i = jnp.minimum(idx, F - 1)
        found = (keys[i] == features)
        off_pairs = jnp.stack([offsets[:-1], offsets[1:]], axis=1)[i]
        start = off_pairs[..., 0].astype(jnp.int32)
        cnt = (off_pairs[..., 1] - off_pairs[..., 0]).astype(jnp.int32)
        return start, jnp.where(found, cnt, 0)
    start, cnt = stat("verify + offsets row gather", offs, idx,
                      eng._offsets, eng._keys, features)

    def expand(start, cnt):
        cum = jnp.cumsum(cnt, axis=1)
        cum_ex = cum - cnt
        li = lookup._expand_slots(start, cum_ex, lmax)
        return li, cum[:, -1]
    li, total = stat("expand_slots (rank-by-sort)", expand, start, cnt)

    def locg(li, loc_packed):
        return loc_packed[li]
    packed = stat("location word gather [8192,256]", locg, li,
                  eng._loc_packed)

    def srt(packed):
        return jax.lax.sort(packed, dimension=1, is_stable=False)
    stat("match sort", srt, packed)

    tgtw = jax.lax.sort(jnp.where(packed > 0, packed, 2**31 - 1),
                        dimension=1, is_stable=False)
    tgt = jnp.where(tgtw != 2**31 - 1, tgtw >> wbits, 2**31 - 1)
    win = jnp.where(tgtw != 2**31 - 1, tgtw & ((1 << wbits) - 1),
                    2**31 - 1)
    nw = jnp.full((8192,), 4, jnp.int32)

    def cands(tgt, win, nw, tct):
        return cand_ops.generate_candidates(tgt, win, nw, tct,
                                            eng.classify.max_candidates,
                                            win_bits=wbits,
                                            tax_onehot=True)
    cand = stat("generate_candidates (onehot map)", cands, tgt, win, nw,
                eng._tct)

    def cands_g(tgt, win, nw, tct):
        return cand_ops.generate_candidates(tgt, win, nw, tct,
                                            eng.classify.max_candidates,
                                            win_bits=wbits)
    stat("generate_candidates (gather map)", cands_g, tgt, win, nw,
         eng._tct)

    def cls(tax, hits, lin):
        return classify_op.classify_lca(tax, hits, lin,
                                        eng._hits_min_dev,
                                        eng._hits_diff_dev,
                                        eng.highest_rank)
    stat("classify_lca", cls, cand["tax"], cand["hits"], eng._lineage)


if __name__ == "__main__":
    main()
