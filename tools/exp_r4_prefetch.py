#!/usr/bin/env python
"""Round-4: does xla_enable_cross_program_prefetch=false remove the
S(1)-staged table copies, and what does it do to execution time?
Compiles the REAL engine program both ways (explicit compiler_options,
persistent cache off) and times executions."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from metacache_tpu.config import ClassifyParams, QueryPipelineParams
from metacache_tpu.modes.query import load_all_shards
from metacache_tpu.query import engine as eng_mod
from metacache_tpu.query.engine import QueryEngine
from metacache_tpu.native import NativeBatchReader

BIG = "/tmp/mc_bench_big"


class Recorder:
    def __init__(self, orig):
        self.orig = orig
        self.calls = []

    def __call__(self, *a, **kw):
        self.calls.append((a, kw))
        return self.orig(*a, **kw)


def main():
    print("devices:", jax.devices(), flush=True)
    db = load_all_shards(os.path.join(BIG, "mydb"))
    pipeline = QueryPipelineParams(batch_size=16384, max_query_len=104,
                                   max_locations_per_query=256)
    eng = QueryEngine(db, ClassifyParams(lowest_rank="species"), pipeline)
    b0 = next(iter(NativeBatchReader(
        os.path.join(BIG, "reads_1.fa"), os.path.join(BIG, "reads_2.fa"),
        "files", pipeline.batch_size, pipeline.max_query_len)))
    rec = Recorder(eng_mod._query_batch_device)
    eng_mod._query_batch_device = rec
    out = eng.dispatch_packed(b0.packed1, b0.ambig1, b0.lens1,
                              b0.packed2, b0.ambig2, b0.lens2)
    jax.block_until_ready(out["summary"])
    a, kw = rec.calls[0]
    for name, opts in (("default", None),
                       ("no-cpp",
                        {"xla_enable_cross_program_prefetch": "false"})):
        t0 = time.perf_counter()
        comp = rec.orig.lower(*a, **kw).compile(compiler_options=opts)
        print(f"{name}: compile {time.perf_counter()-t0:.1f}s", flush=True)
        txt = comp.as_text()
        print(f"  cross_program_prefetch markers: "
              f"{txt.count('cross_program_prefetch_index')}, "
              f"slice-done: {txt.count('slice-done')}, "
              f"S(1) mentions: {txt.count('S(1)')}", flush=True)
        r = comp(*a)
        jax.block_until_ready(r["summary"])
        t0 = time.perf_counter()
        for _ in range(10):
            r = comp(*a)
        jax.block_until_ready(r["summary"])
        ms = (time.perf_counter() - t0) / 10 * 1e3
        print(f"  exec: {ms:.2f} ms/batch (B=16384)", flush=True)


if __name__ == "__main__":
    main()
