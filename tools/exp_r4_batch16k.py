#!/usr/bin/env python
"""Round-4: does B=16384 beat B=8192 end-to-end?

At ~37 MB/s tunnel weather the measured per-window time matches
wire-bytes + ~15-20 ms of per-dispatch round-trip latency x n_dispatches;
halving the dispatch count should recover most of the latency term.
Round 3 abandoned B=16384 because its remote compile stalled >25 min in
bad weather — with the persistent compile cache that cost is one-time.
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
from metacache_tpu.query.engine import QueryEngine
from metacache_tpu.native import NativeBatchReader
import bench


def run_world(name, work, B):
    db = load_all_shards(os.path.join(work, "mydb"))
    pipeline = QueryPipelineParams(batch_size=B, max_query_len=104,
                                   max_locations_per_query=256)
    eng = QueryEngine(db, ClassifyParams(lowest_rank="species"), pipeline)
    print(f"{name} B={B}: direct_mb={eng._direct_mb} "
          f"direct_tbl={eng._direct_tbl is not None}", flush=True)
    batches = list(NativeBatchReader(
        os.path.join(work, "reads_1.fa"), os.path.join(work, "reads_2.fa"),
        "files", B, 104))
    wires = [eng.precompute_wire(b.packed1, b.ambig1, b.lens1,
                                 b.packed2, b.ambig2, b.lens2)
             for b in batches]
    t0 = time.time()
    b0 = batches[0]
    eng.materialize(eng.dispatch_packed(
        b0.packed1, b0.ambig1, b0.lens1, b0.packed2, b0.ambig2, b0.lens2),
        b0.n).best
    print(f"{name} first batch (compile/load): {time.time()-t0:.0f}s",
          flush=True)
    reps = max(1, 262144 // (len(batches) * B))
    for trial in range(4):
        probe = bench.weather_probe()
        t0 = time.time()
        total = 0
        pending = [(eng.dispatch_packed(
            b.packed1, b.ambig1, b.lens1, b.packed2, b.ambig2, b.lens2,
            wire=w), b.n) for b, w in zip(batches * reps, wires * reps)]
        for res, (_, m) in zip(eng.materialize_many(pending), pending):
            res.best
            total += m
        dt = time.time() - t0
        print(f"{name} B={B} trial {trial}: {total} pairs in {dt:.2f}s = "
              f"{total/dt:.0f} pairs/s (probe {probe:.0f} MB/s)", flush=True)


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    run_world("toy", "/tmp/mc_bench", B)
    run_world("realistic", "/tmp/mc_bench_big", B)
