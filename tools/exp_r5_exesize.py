#!/usr/bin/env python
"""Round-5: generated-code sizes of each workload's MAIN engine program
(compile-only; the degraded service mode costs ~exe_size/40 MB/s per
execution, so exe bytes/read is the robust-throughput knob)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from metacache_tpu.config import ClassifyParams, QueryPipelineParams
from metacache_tpu.modes.query import load_all_shards
from metacache_tpu.query.engine import QueryEngine, _query_batch_device


def size_of(eng, B, wire, sfmt):
    import jax.numpy as jnp
    p = eng.sketch_params
    qlen = eng.pipeline.max_query_len
    fused_cols = {"slim": 2 * (qlen // 4 + eng._len_bytes),
                  "slim1": qlen // 4 + eng._len_bytes}[wire]
    fused = jnp.zeros((B, fused_cols), jnp.uint8)
    lowered = _query_batch_device.lower(
        fused, eng._keys, eng._offsets, eng._loc_tgt, eng._loc_win,
        eng._tct,
        eng._lineage_small if eng._seg_shift else eng._lineage,
        eng._hits_min_dev, eng._hits_diff_dev,
        None, None, eng._bucket_offsets, eng._loc_packed,
        eng._start_tbl, eng._cnt_tbl,
        eng._direct_tbl if eng._direct_mb > 0 else None,
        k=p.kmer_size, sketch_size=p.sketch_size,
        window_size=p.window_size, window_stride=p.window_stride,
        starts=eng.starts, lmax=eng.lmax_fast,
        max_candidates=eng.classify.max_candidates,
        highest_rank=eng.highest_rank,
        insert_size_max=eng.classify.insert_size_max,
        qlen=qlen, target_window_k=0,
        search_steps=eng._search_steps, use_pallas_sketch=False,
        win_bits=eng._win_bits, direct_mb=eng._direct_mb,
        wire=wire, sfmt=sfmt, len_bytes=eng._len_bytes,
        ci_shift=eng._seg_shift,
        tax_onehot=eng._seg_shift == 0 and eng._pack_ok,
        map_topk=eng._map_topk)
    comp = lowered.compile()
    return comp.memory_analysis().generated_code_size_in_bytes


def main():
    B = 16384
    classify = ClassifyParams(lowest_rank="species")
    for name, base, wire in (("realistic", "/tmp/mc_bench_big/mydb", "slim"),
                             ("config2", "/tmp/mc_bench_c2/mydb", "slim1"),
                             ("config3", "/tmp/mc_bench_c3/mydb", "slim")):
        db = load_all_shards(base)
        eng = QueryEngine(db, classify, QueryPipelineParams(
            batch_size=B, max_query_len=104,
            max_locations_per_query=256))
        sfmt = eng._main_sfmt()
        sz = size_of(eng, B, wire, sfmt)
        print(f"{name:10s} B={B} direct_mb={eng._direct_mb} "
              f"seg={eng._seg_shift} lmax_fast={eng.lmax_fast} "
              f"sfmt={sfmt}: {sz/1e6:7.2f} MB generated code "
              f"({sz/B:.0f} B/read)", flush=True)
        del db, eng


if __name__ == "__main__":
    main()
