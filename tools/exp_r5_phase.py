#!/usr/bin/env python
"""Round-5: does interleaving h2d transfers with executions trigger the
per-execution slowdown? Back-to-back single-use execs measure 0.13 ms
(exp_r5_engprog) while the dispatch loop (h2d, exec, h2d, exec, ...)
costs ~112 ms/batch at the same weather. Compares three schedules over
the same 32 single-use batches:
  A. interleaved: device_put(w); exec; device_put(w); exec; ...
  B. two-phase:   device_put ALL; then exec ALL
  C. exec-only:   (inputs pre-resident) — control
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

C3 = "/tmp/mc_bench_c3"
B = 8192
NB = 32


def main():
    print("devices:", jax.devices(), flush=True)
    db = load_all_shards(os.path.join(C3, "mydb"))
    pipeline = QueryPipelineParams(batch_size=B, max_query_len=104,
                                   max_locations_per_query=256)
    eng = QueryEngine(db, ClassifyParams(lowest_rank="species"), pipeline)
    qlen = pipeline.max_query_len

    batches = []
    rd = NativeBatchReader(os.path.join(C3, "reads_1.fa"),
                           os.path.join(C3, "reads_2.fa"), "files",
                           B, qlen)
    for b in rd:
        batches.append(b)
        if len(batches) >= 3 * NB + 2:
            break
    rd.close()
    wires = [np.asarray(eng.precompute_wire(
        b.packed1, b.ambig1, b.lens1, b.packed2, b.ambig2, b.lens2)[0])
        for b in batches]
    print(f"{len(wires)} wires x {wires[0].nbytes/1e6:.2f} MB", flush=True)

    def call(fdev):
        out = eng._dispatch_tier(fdev, None, eng.lmax_fast, direct_mb=0,
                                 wire=eng._wire, sfmt="p2")
        return out["summary"]

    # warm (compile + program load)
    w0 = jax.device_put(wires[-1])
    jax.block_until_ready(call(w0))
    jax.block_until_ready(call(jax.device_put(wires[-2])))
    cur = [0]

    def take(n):
        s = cur[0]
        cur[0] += n
        return wires[s:s + n]

    # A. interleaved
    ws = take(NB)
    t0 = time.perf_counter()
    outs = []
    for w in ws:
        outs.append(call(jax.device_put(w)))
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    print(f"A interleaved:  {dt/NB*1e3:7.1f} ms/batch = "
          f"{NB*B/dt:8.0f} pairs/s", flush=True)

    # B. two-phase
    ws = take(NB)
    t0 = time.perf_counter()
    devs = [jax.device_put(w) for w in ws]
    outs = [call(d) for d in devs]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    print(f"B two-phase:    {dt/NB*1e3:7.1f} ms/batch = "
          f"{NB*B/dt:8.0f} pairs/s", flush=True)

    # C. exec-only control (pre-resident, same count)
    ws = take(NB)
    devs = [jax.device_put(w) for w in ws]
    jax.block_until_ready(devs)
    t0 = time.perf_counter()
    outs = [call(d) for d in devs]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    print(f"C exec-only:    {dt/NB*1e3:7.1f} ms/batch = "
          f"{NB*B/dt:8.0f} pairs/s", flush=True)


if __name__ == "__main__":
    main()
