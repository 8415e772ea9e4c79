#!/usr/bin/env python
"""Round-4: sharded engine (P=1 mesh, full shard_map + all_gather + merge
machinery, slim wire + two-tier re-runs) vs the fused single-chip engine
on the REALISTIC world, real TPU — VERDICT r3 item 2's closing number
(the round-3 2.6% overhead figure was toy-only).

Writes chip_realistic_* into SCALING.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from metacache_tpu.config import ClassifyParams, QueryPipelineParams
from metacache_tpu.modes.query import load_all_shards
from metacache_tpu.query.engine import QueryEngine
from metacache_tpu.parallel import ShardedQueryEngine, make_mesh
from metacache_tpu.native import NativeBatchReader
import bench

BIG = "/tmp/mc_bench_big"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "SCALING.json")


def run(eng, batches, wires, trials=3):
    b0 = batches[0]
    eng.materialize(eng.dispatch_packed(
        b0.packed1, b0.ambig1, b0.lens1, b0.packed2, b0.ambig2, b0.lens2),
        b0.n).best
    best = 0.0
    speeds = []
    for t in range(trials):
        probe = bench.weather_probe()
        t0 = time.time()
        total = 0
        pending = [(eng.dispatch_packed(
            b.packed1, b.ambig1, b.lens1, b.packed2, b.ambig2, b.lens2,
            wire=w), b.n) for b, w in zip(batches, wires)]
        for res, (_, m) in zip(eng.materialize_many(pending), pending):
            res.best
            total += m
        dt = time.time() - t0
        print(f"  trial {t}: {total/dt:.0f} pairs/s "
              f"(probe {probe:.0f} MB/s)", flush=True)
        speeds.append(total / dt)
    return max(speeds), sorted(speeds)[len(speeds) // 2]


def main():
    db = load_all_shards(os.path.join(BIG, "mydb"))
    pipeline = QueryPipelineParams(batch_size=16384, max_query_len=104,
                                   max_locations_per_query=256)
    classify = ClassifyParams(lowest_rank="species")
    batches = list(NativeBatchReader(
        os.path.join(BIG, "reads_1.fa"), os.path.join(BIG, "reads_2.fa"),
        "files", pipeline.batch_size, pipeline.max_query_len))

    fused = QueryEngine(db, classify, pipeline)
    wires = [fused.precompute_wire(b.packed1, b.ambig1, b.lens1,
                                   b.packed2, b.ambig2, b.lens2)
             for b in batches]
    print(f"fused engine (direct_mb={fused._direct_mb}):", flush=True)
    f_best, f_med = run(fused, batches, wires)

    mesh = make_mesh(jax.devices()[:1])
    sharded = ShardedQueryEngine([db], classify, pipeline, mesh)
    print(f"sharded P=1 (direct_mb={sharded._direct_mb}, "
          f"wire={sharded._wire}):", flush=True)
    s_best, s_med = run(sharded, batches, wires)

    res = {
        "chip_realistic_fused_pairs_per_sec": round(f_best, 1),
        "chip_realistic_fused_median": round(f_med, 1),
        "chip_realistic_sharded_p1_pairs_per_sec": round(s_best, 1),
        "chip_realistic_sharded_p1_median": round(s_med, 1),
        "chip_realistic_sharding_overhead": round(1 - s_best / f_best, 4),
    }
    data = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            data = json.load(f)
    data.update(res)
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
