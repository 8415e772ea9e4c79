#!/usr/bin/env python
"""Round-5: which PROGRAM OUTPUT re-triggers the config-3 relayout
pathology? cls2 showed barrier+scalar-outputs = 0.04 ms/exec while the
engine program (barrier + real outputs) stays at 112 ms. Same scaffolding:
single-use inputs, tables as args."""
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
                                        unfuse_device_inputs_slim,
                                        pack_summary_word)
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

    TBL = (eng._keys, eng._bucket_offsets, eng._offsets, eng._loc_packed,
           eng._tct, eng._lineage, eng._hits_min_dev, eng._hits_diff_dev)

    def stage(f, keys, buckets, offsets, loc_packed, tct, lin, hm, hd):
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
        ks = ("tax", "hits", "beg", "end", "tgt")
        fen = jax.lax.optimization_barrier(
            tuple(cand[k] for k in ks) + (total, overflow))
        cand = dict(zip(ks, fen[:5]))
        total, overflow = fen[5], fen[6]
        best, best_rank = classify_op.classify_lca(
            cand["tax"], cand["hits"], lin, hm, hd, eng.highest_rank)
        return cand, total, overflow, best, best_rank

    def v_scalar(*a):
        cand, total, overflow, best, best_rank = stage(*a)
        return jnp.sum(best) + jnp.sum(best_rank)

    def v_vec(*a):
        cand, total, overflow, best, best_rank = stage(*a)
        return best, best_rank

    def v_sum2(*a):
        cand, total, overflow, best, best_rank = stage(*a)
        return jnp.stack([pack_summary_word(best, best_rank), overflow])

    def v_sum4(*a):
        cand, total, overflow, best, best_rank = stage(*a)
        return jnp.stack([best, best_rank, total, overflow])

    def v_sum_cand(*a):
        cand, total, overflow, best, best_rank = stage(*a)
        s = jnp.stack([pack_summary_word(best, best_rank), overflow])
        return s, cand

    def v_full(*a):
        cand, total, overflow, best, best_rank = stage(*a)
        s = jnp.stack([best, best_rank, total, overflow])
        return {"cand": cand, "best": best, "best_rank": best_rank,
                "match_total": total, "match_overflow": overflow,
                "summary": s}

    for name, fn in [("scalar out", v_scalar),
                     ("best/best_rank vectors", v_vec),
                     ("summary p2 [2,B]", v_sum2),
                     ("summary s4 [4,B]", v_sum4),
                     ("summary p2 + cand dict", v_sum_cand),
                     ("full engine dict", v_full)]:
        jf = jax.jit(fn)
        wa = take(1)[0]
        t0 = time.perf_counter()
        jax.block_until_ready(jf(wa, *TBL))
        tc = time.perf_counter() - t0
        ins = take(N_USE)
        t0 = time.perf_counter()
        outs = [jf(f, *TBL) for f in ins]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / N_USE * 1e3
        print(f"{name:32s} {dt:8.2f} ms/exec (warm {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
