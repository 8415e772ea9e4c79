#!/usr/bin/env python
"""Round-3 host-side profile: where do the ~36 ms/batch of wall time go
when the device program itself is ~1.2 ms?

Times, for a 32-batch window of the bench workload:
  - fuse_host_inputs alone (numpy)
  - jnp.asarray transfer alone
  - dispatch_packed alone (no materialize)
  - full dispatch + materialize_many
  - python-level jit call overhead (aot-compiled, device-resident input)
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
from metacache_tpu.query.engine import QueryEngine, fuse_host_inputs
from metacache_tpu.native import NativeBatchReader

WORK = "/tmp/mc_bench"


def main():
    print("devices:", jax.devices(), flush=True)
    db = load_all_shards(os.path.join(WORK, "mydb"))
    classify = ClassifyParams(lowest_rank="species")
    pipeline = QueryPipelineParams(batch_size=8192, max_query_len=128,
                                   max_locations_per_query=256)
    eng = QueryEngine(db, classify, pipeline)
    batches = list(NativeBatchReader(
        os.path.join(WORK, "reads_1.fa"), os.path.join(WORK, "reads_2.fa"),
        "files", pipeline.batch_size, pipeline.max_query_len)) * 16
    N = len(batches)
    print(f"{N} batches x {pipeline.batch_size}", flush=True)

    # warmup
    warm = [(eng.dispatch_packed(b.packed1, b.ambig1, b.lens1,
                                 b.packed2, b.ambig2, b.lens2), b.n)
            for b in batches]
    for res in eng.materialize_many(warm):
        res.best

    # 1. fuse_host_inputs alone
    t0 = time.perf_counter()
    fused = [fuse_host_inputs(b.packed1, b.ambig1, b.lens1,
                              b.packed2, b.ambig2, b.lens2)
             for b in batches]
    t_fuse = (time.perf_counter() - t0) / N * 1e3
    print(f"fuse_host_inputs:      {t_fuse:.2f} ms/batch", flush=True)

    # 2. transfer alone
    t0 = time.perf_counter()
    devs = [jnp.asarray(f) for f in fused]
    jax.block_until_ready(devs)
    t_xfer = (time.perf_counter() - t0) / N * 1e3
    mb = fused[0].nbytes / 1e6
    print(f"h2d transfer ({mb:.2f} MB): {t_xfer:.2f} ms/batch "
          f"({mb/t_xfer*1000:.0f} MB/s)", flush=True)

    # 3. dispatch only (async) then block
    for trial in range(2):
        t0 = time.perf_counter()
        outs = [eng.dispatch_packed(b.packed1, b.ambig1, b.lens1,
                                    b.packed2, b.ambig2, b.lens2)
                for b in batches]
        t_disp = (time.perf_counter() - t0) / N * 1e3
        jax.block_until_ready([o["summary"] for o in outs])
        t_all = (time.perf_counter() - t0) / N * 1e3
        print(f"dispatch_packed: enqueue {t_disp:.2f} ms/batch, "
              f"+device drain {t_all:.2f} ms/batch", flush=True)

    # 4. full loop as in bench
    for trial in range(2):
        t0 = time.perf_counter()
        pending = [(eng.dispatch_packed(b.packed1, b.ambig1, b.lens1,
                                        b.packed2, b.ambig2, b.lens2), b.n)
                   for b in batches]
        results = eng.materialize_many(pending)
        tot = sum(int((r.best[:m] != 0).sum())
                  for r, (_, m) in zip(results, pending))
        t_full = (time.perf_counter() - t0) / N * 1e3
        print(f"full loop:             {t_full:.2f} ms/batch "
              f"({pipeline.batch_size/t_full*1000:.0f} pairs/s)", flush=True)

    # 5. jit-call overhead: call with device-resident fused input
    fd = devs[0]
    t0 = time.perf_counter()
    outs = [eng._dispatch_tier(fd, None, eng.lmax_fast,
                               direct_mb=eng._direct_mb) for _ in range(N)]
    t_enq = (time.perf_counter() - t0) / N * 1e3
    jax.block_until_ready([o["summary"] for o in outs])
    t_dev = (time.perf_counter() - t0) / N * 1e3
    print(f"device-resident input: enqueue {t_enq:.2f} ms/batch, "
          f"total {t_dev:.2f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
