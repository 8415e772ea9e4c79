#!/usr/bin/env python
"""Round-5: head-to-head — the ENGINE's _dispatch_tier program vs the
equivalent reconstruction that measures fast (exp_r5_out v_full), both
WARMED, single-use pre-resident inputs, same process."""
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
                                        pack_summary_word,
                                        _query_batch_device)
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
    print(f"pool {len(pool)} lmax_fast={eng.lmax_fast} "
          f"direct_mb={eng._direct_mb}", flush=True)
    cursor = [0]

    def take(n):
        s = cursor[0]
        cursor[0] += n
        return pool[s:s + n]

    def run(name, call):
        wa = take(1)[0]
        t0 = time.perf_counter()
        jax.block_until_ready(jax.tree.leaves(call(wa)))
        tc = time.perf_counter() - t0
        ins = take(N_USE)
        t0 = time.perf_counter()
        outs = [call(f) for f in ins]
        jax.block_until_ready(jax.tree.leaves(outs))
        dt = (time.perf_counter() - t0) / N_USE * 1e3
        print(f"{name:44s} {dt:8.2f} ms/exec (warm {tc:.0f}s)", flush=True)

    # A. the engine's real dispatch (p2, main tier)
    def eng_call(f):
        out = eng._dispatch_tier(f, None, eng.lmax_fast, direct_mb=0,
                                 wire=eng._wire, sfmt="p2")
        return (out["summary"], out["cand"]["tax"])
    run("A engine _dispatch_tier p2", eng_call)

    # B. raw _query_batch_device with the engine's exact argument objects
    def raw_call(f):
        out = _query_batch_device(
            f, eng._keys, eng._offsets, eng._loc_tgt, eng._loc_win,
            eng._tct, eng._lineage, eng._hits_min_dev, eng._hits_diff_dev,
            None, None, eng._bucket_offsets, eng._loc_packed,
            eng._start_tbl, eng._cnt_tbl, None,
            k=p.kmer_size, sketch_size=p.sketch_size,
            window_size=p.window_size, window_stride=p.window_stride,
            starts=eng.starts, lmax=eng.lmax_fast,
            max_candidates=eng.classify.max_candidates,
            highest_rank=eng.highest_rank,
            insert_size_max=eng.classify.insert_size_max,
            qlen=qlen, target_window_k=0,
            search_steps=eng._search_steps, use_pallas_sketch=False,
            win_bits=eng._win_bits, direct_mb=0, wire=eng._wire,
            sfmt="p2", len_bytes=eng._len_bytes, ci_shift=eng._seg_shift,
            tax_onehot=True)
        return (out["summary"], out["cand"]["tax"])
    run("B raw _query_batch_device (same args)", raw_call)

    # C. same as B but WITHOUT start_tbl/cnt_tbl (fresh dummies)
    z1 = jnp.zeros(1, jnp.int32)
    def raw_nodirect(f):
        out = _query_batch_device(
            f, eng._keys, eng._offsets, z1, z1,
            eng._tct, eng._lineage, eng._hits_min_dev, eng._hits_diff_dev,
            None, None, eng._bucket_offsets, eng._loc_packed,
            None, None, None,
            k=p.kmer_size, sketch_size=p.sketch_size,
            window_size=p.window_size, window_stride=p.window_stride,
            starts=eng.starts, lmax=eng.lmax_fast,
            max_candidates=eng.classify.max_candidates,
            highest_rank=eng.highest_rank,
            insert_size_max=eng.classify.insert_size_max,
            qlen=qlen, target_window_k=0,
            search_steps=eng._search_steps, use_pallas_sketch=False,
            win_bits=eng._win_bits, direct_mb=0, wire=eng._wire,
            sfmt="p2", len_bytes=eng._len_bytes, ci_shift=0,
            tax_onehot=True)
        return (out["summary"], out["cand"]["tax"])
    run("C raw, no start/cnt tbl args", raw_nodirect)


if __name__ == "__main__":
    main()
