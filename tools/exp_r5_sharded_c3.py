#!/usr/bin/env python
"""Round-5 (VERDICT r4 item 8): sharded engine at CONFIG-3 scale on the
real chip — P=1 mesh through the full shard_map + all_gather + dedup/
top-k merge machinery over the 210M-feature table, vs the fused engine,
alternating trials to cancel weather drift. Also a P=1-via-2-shard-files
load (the true mode_query.cpp:421-426 shape). Writes chip_config3_* into
SCALING.json."""
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

C3 = "/tmp/mc_bench_c3"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "SCALING.json")
NPAIRS = 262144


def one_trial(eng, batches, wires):
    t0 = time.time()
    total = 0
    pending = [(eng.dispatch_packed(
        b.packed1, b.ambig1, b.lens1, b.packed2, b.ambig2, b.lens2,
        wire=w), b.n) for b, w in zip(batches, wires)]
    for res, (_, m) in zip(eng.materialize_many(pending), pending):
        res.best
        total += m
    return total / (time.time() - t0)


def main():
    db = load_all_shards(os.path.join(C3, "mydb"))
    pipeline = QueryPipelineParams(batch_size=16384, max_query_len=104,
                                   max_locations_per_query=256)
    classify = ClassifyParams(lowest_rank="species")
    batches = list(NativeBatchReader(
        os.path.join(C3, "reads_1.fa"), os.path.join(C3, "reads_2.fa"),
        "files", pipeline.batch_size, pipeline.max_query_len,
        limit=NPAIRS))

    fused = QueryEngine(db, classify, pipeline)
    wires = [fused.precompute_wire(b.packed1, b.ambig1, b.lens1,
                                   b.packed2, b.ambig2, b.lens2)
             for b in batches]
    mesh = make_mesh(jax.devices()[:1])
    sharded = ShardedQueryEngine([db], classify, pipeline, mesh)
    print(f"fused direct_mb={fused._direct_mb} sharded "
          f"direct_mb={sharded._direct_mb} seg={sharded._seg_shift}",
          flush=True)

    # warm both
    b0 = batches[0]
    fused.materialize(fused.dispatch_packed(
        b0.packed1, b0.ambig1, b0.lens1, b0.packed2, b0.ambig2, b0.lens2,
        wire=wires[0]), b0.n).best
    sharded.materialize(sharded.dispatch_packed(
        b0.packed1, b0.ambig1, b0.lens1, b0.packed2, b0.ambig2, b0.lens2,
        wire=wires[0]), b0.n).best

    # per-read agreement on the first window (sharded P=1 == fused)
    rf = fused.materialize(fused.dispatch_packed(
        b0.packed1, b0.ambig1, b0.lens1, b0.packed2, b0.ambig2, b0.lens2,
        wire=wires[0]), b0.n)
    rs = sharded.materialize(sharded.dispatch_packed(
        b0.packed1, b0.ambig1, b0.lens1, b0.packed2, b0.ambig2, b0.lens2,
        wire=wires[0]), b0.n)
    np.testing.assert_array_equal(rf.best[:b0.n], rs.best[:b0.n])
    np.testing.assert_array_equal(rf.best_rank[:b0.n], rs.best_rank[:b0.n])
    print("sharded P=1 == fused on a full batch", flush=True)

    fs, ss, probes = [], [], []
    for t in range(3):   # alternate to cancel weather drift
        probes.append(bench.weather_probe())
        fs.append(one_trial(fused, batches, wires))
        ss.append(one_trial(sharded, batches, wires))
        print(f"trial {t}: fused {fs[-1]:.0f}  sharded {ss[-1]:.0f} "
              f"pairs/s (probe {probes[-1]:.0f} MB/s)", flush=True)
    res = {
        "chip_config3_fused_pairs_per_sec": round(max(fs), 1),
        "chip_config3_fused_median": round(sorted(fs)[1], 1),
        "chip_config3_sharded_p1_pairs_per_sec": round(max(ss), 1),
        "chip_config3_sharded_p1_median": round(sorted(ss)[1], 1),
        "chip_config3_sharding_overhead": round(1 - max(ss) / max(fs), 4),
        "chip_config3_h2d_probes_mbps": probes,
        "chip_config3_agreement": "per-read equal on 16384-pair batch",
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
