#!/usr/bin/env python
"""Round-5: where do config-3's 111 ms/batch actually go? The fused program
is 0.10 ms/batch device-resident (exp_r5_c3full), so the pipeline cost is
wire + dispatch. Measures the REAL bench loop (dispatch_packed all batches,
materialize_many) at B=8192 / 16384, then bisects: h2d only, h2d+exec
pipelined at several queue depths, and precompute_wire host cost."""
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
NPAIRS = 262144


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    print("devices:", jax.devices(), flush=True)
    db = load_all_shards(os.path.join(C3, "mydb"))
    pipeline = QueryPipelineParams(batch_size=B, max_query_len=104,
                                   max_locations_per_query=256)
    eng = QueryEngine(db, ClassifyParams(lowest_rank="species"), pipeline)
    print(f"B={B} wire={eng._wire} sfmt={eng._main_sfmt()}", flush=True)
    batches = []
    rd = NativeBatchReader(os.path.join(C3, "reads_1.fa"),
                           os.path.join(C3, "reads_2.fa"), "files",
                           B, pipeline.max_query_len, limit=NPAIRS)
    for b in rd:
        batches.append(b)
    wires = [eng.precompute_wire(b.packed1, b.ambig1, b.lens1,
                                 b.packed2, b.ambig2, b.lens2)
             for b in batches]
    nb = len(batches)
    print(f"{nb} batches x {B}", flush=True)

    # warm: compile + load at depth 1
    b0 = batches[0]
    eng.materialize(eng.dispatch_packed(
        b0.packed1, b0.ambig1, b0.lens1, b0.packed2, b0.ambig2, b0.lens2,
        wire=wires[0]), b0.n).best

    # 0. host-side wire precompute cost
    t0 = time.perf_counter()
    for b in batches:
        eng.precompute_wire(b.packed1, b.ambig1, b.lens1,
                            b.packed2, b.ambig2, b.lens2)
    dt = time.perf_counter() - t0
    print(f"precompute_wire host: {dt/nb*1e3:6.1f} ms/batch", flush=True)

    # 1. h2d transfers only (device_put of each wire, block at end)
    t0 = time.perf_counter()
    devs = [jax.device_put(w[0]) for w in wires]
    jax.block_until_ready(devs)
    dt = time.perf_counter() - t0
    mb = sum(w[0].nbytes for w in wires) / 1e6
    print(f"h2d only: {dt/nb*1e3:6.1f} ms/batch "
          f"({mb/dt:.0f} MB/s over {mb:.0f} MB)", flush=True)
    del devs

    # 2. full loop exactly like bench (dispatch all + materialize_many)
    for trial in range(3):
        t0 = time.perf_counter()
        pending = [(eng.dispatch_packed(
            b.packed1, b.ambig1, b.lens1, b.packed2, b.ambig2, b.lens2,
            wire=w), b.n) for b, w in zip(batches, wires)]
        results = eng.materialize_many(pending)
        for r in results:
            r.best
        dt = time.perf_counter() - t0
        print(f"bench loop trial {trial}: {dt/nb*1e3:6.1f} ms/batch = "
              f"{NPAIRS/dt:8.0f} pairs/s", flush=True)

    # 3. dispatch-side bisect: time until all dispatch calls return vs
    #    total (how much is enqueue vs drain)
    t0 = time.perf_counter()
    pending = [(eng.dispatch_packed(
        b.packed1, b.ambig1, b.lens1, b.packed2, b.ambig2, b.lens2,
        wire=w), b.n) for b, w in zip(batches, wires)]
    t1 = time.perf_counter()
    results = eng.materialize_many(pending)
    for r in results:
        r.best
    t2 = time.perf_counter()
    print(f"enqueue {t1-t0:.2f}s  drain {t2-t1:.2f}s", flush=True)

    # 4. pre-transferred inputs: dispatch on device arrays (no h2d in loop)
    fdevs = [jax.device_put(np.asarray(w[0])) for w in wires]
    jax.block_until_ready(fdevs)
    t0 = time.perf_counter()
    outs = [eng._dispatch_tier(f, None, eng.lmax_full, direct_mb=0,
                               wire=eng._wire, sfmt="s4")["summary"]
            for f in fdevs]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    print(f"exec only (pre-resident): {dt/nb*1e3:6.1f} ms/batch",
          flush=True)


if __name__ == "__main__":
    main()
