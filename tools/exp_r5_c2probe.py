#!/usr/bin/env python
"""Round-5: why is config-2 (single-end slim1 wire, 27 B/read) stuck at
the SAME per-batch cost as the paired 54 B wire? Instruments the bench
loop: wire widths, enqueue vs drain, pre-resident variant."""
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

C2 = "/tmp/mc_bench_c2"
B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
NB = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def main():
    print("devices:", jax.devices(), flush=True)
    db = load_all_shards(os.path.join(C2, "mydb"))
    pipeline = QueryPipelineParams(batch_size=B, max_query_len=104,
                                   max_locations_per_query=256)
    eng = QueryEngine(db, ClassifyParams(lowest_rank="species"), pipeline)
    print(f"direct_mb={eng._direct_mb} exact={eng._direct_exact} "
          f"sfmt={eng._main_sfmt()} wire={eng._wire}", flush=True)
    batches = []
    rd = NativeBatchReader(os.path.join(C2, "reads.fa"), None, "none",
                           B, 104)
    for b in rd:
        batches.append(b)
        if len(batches) >= NB:
            break
    rd.close()
    wires = [eng.precompute_wire(b.packed1, b.ambig1, b.lens1,
                                 b.packed2, b.ambig2, b.lens2)
             for b in batches]
    print(f"wire width {wires[0][0].shape[1]} cols "
          f"({wires[0][0].nbytes/1e6:.2f} MB/batch)", flush=True)

    b0 = batches[0]
    eng.materialize(eng.dispatch_packed(
        b0.packed1, b0.ambig1, b0.lens1, b0.packed2, b0.ambig2, b0.lens2,
        wire=wires[0]), b0.n).best

    for trial in range(3):
        t0 = time.perf_counter()
        pending = [(eng.dispatch_packed(
            b.packed1, b.ambig1, b.lens1, b.packed2, b.ambig2, b.lens2,
            wire=w), b.n) for b, w in zip(batches, wires)]
        t1 = time.perf_counter()
        results = eng.materialize_many(pending)
        t2 = time.perf_counter()
        for r in results:
            r.best
        t3 = time.perf_counter()
        print(f"trial {trial}: enqueue {t1-t0:.2f}s  "
              f"materialize {t2-t1:.2f}s  best {t3-t2:.2f}s  "
              f"= {NB*B/(t3-t0):.0f} reads/s", flush=True)

    # pre-resident: device_put all wires first, then dispatch
    devs = [jax.device_put(np.asarray(w[0])) for w in wires]
    jax.block_until_ready(devs)
    t0 = time.perf_counter()
    outs = [eng._dispatch_tier(d, None, eng.lmax_fast,
                               direct_mb=eng._direct_mb,
                               wire="slim1", sfmt=eng._main_sfmt())
            for d in devs]
    sums = [o["summary"] for o in outs]
    jax.block_until_ready(sums)
    dt = time.perf_counter() - t0
    print(f"pre-resident exec: {dt/NB*1e3:.1f} ms/batch", flush=True)
    # d2h fetch cost of the stacked summaries
    t0 = time.perf_counter()
    stk = jnp.concatenate(sums, axis=0)
    host = np.asarray(stk)
    dt = time.perf_counter() - t0
    print(f"summary stack+fetch: {dt*1e3:.0f} ms for {host.nbytes/1e6:.2f} "
          f"MB", flush=True)


if __name__ == "__main__":
    main()
