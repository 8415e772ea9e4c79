#!/usr/bin/env python
"""Round-4: where do the ~48 ms/batch of rquery wall time go, given the
compiled program executes in ~0.1 ms with device-resident inputs?
Bisect: h2d wire alone, dispatch loop, + summary pull, + reruns."""
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

BIG = "/tmp/mc_bench_big"


def main():
    print("devices:", jax.devices(), flush=True)
    db = load_all_shards(os.path.join(BIG, "mydb"))
    pipeline = QueryPipelineParams(batch_size=16384, max_query_len=104,
                                   max_locations_per_query=256)
    eng = QueryEngine(db, ClassifyParams(lowest_rank="species"), pipeline)
    batches = list(NativeBatchReader(
        os.path.join(BIG, "reads_1.fa"), os.path.join(BIG, "reads_2.fa"),
        "files", pipeline.batch_size, pipeline.max_query_len))
    wires = [eng.precompute_wire(b.packed1, b.ambig1, b.lens1,
                                 b.packed2, b.ambig2, b.lens2)
             for b in batches]
    b0 = batches[0]
    eng.materialize(eng.dispatch_packed(
        b0.packed1, b0.ambig1, b0.lens1, b0.packed2, b0.ambig2, b0.lens2),
        b0.n).best
    warm = [(eng.dispatch_packed(b.packed1, b.ambig1, b.lens1,
                                 b.packed2, b.ambig2, b.lens2, wire=w), b.n)
            for b, w in zip(batches, wires)]
    for res in eng.materialize_many(warm):
        res.best

    nb = len(batches)
    wire_mb = wires[0][0].nbytes / 1e6
    print(f"{nb} batches, wire {wire_mb:.2f} MB each", flush=True)

    # 1) h2d only
    for _ in range(2):
        t0 = time.perf_counter()
        devs = [jax.block_until_ready(jnp.asarray(w[0])) for w in wires]
        dt = time.perf_counter() - t0
        print(f"h2d only: {dt*1e3/nb:.1f} ms/batch "
              f"({wire_mb*nb/dt:.0f} MB/s)", flush=True)

    # 2) dispatch loop, block on summaries, NO materialize/reruns
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [eng.dispatch_packed(b.packed1, b.ambig1, b.lens1,
                                    b.packed2, b.ambig2, b.lens2, wire=w)
                for b, w in zip(batches, wires)]
        jax.block_until_ready([o["summary"] for o in outs])
        dt = time.perf_counter() - t0
        print(f"dispatch+exec: {dt*1e3/nb:.1f} ms/batch", flush=True)

    # 3) + stacked summary pull + rerun patches (the full materialize path)
    for _ in range(2):
        t0 = time.perf_counter()
        pending = [(eng.dispatch_packed(b.packed1, b.ambig1, b.lens1,
                                        b.packed2, b.ambig2, b.lens2,
                                        wire=w), b.n)
                   for b, w in zip(batches, wires)]
        results = eng.materialize_many(pending)
        for res, (_, m) in zip(results, pending):
            res.best
        dt = time.perf_counter() - t0
        print(f"full window: {dt*1e3/nb:.1f} ms/batch", flush=True)

    # 4) rerun cost: how many rows/dispatches?
    pending = [(eng.dispatch_packed(b.packed1, b.ambig1, b.lens1,
                                    b.packed2, b.ambig2, b.lens2, wire=w),
                b.n) for b, w in zip(batches, wires)]
    results = eng.materialize_many(pending)
    nr = sum(len(r._patches) for r in results)
    rows = sum(len(rows) for r in results for rows, _, _ in r._patches)
    print(f"reruns: {rows} rows in {nr} patch entries", flush=True)


if __name__ == "__main__":
    main()
