#!/usr/bin/env python
"""Round-4: jax.profiler trace of the fused realistic program — real
per-op device times inside the compiled executable (stage microbenches
are bounded by ~2.5 ms/dispatch tunnel noise)."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

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
TRACE = "/tmp/mc_trace"


def main():
    print("devices:", jax.devices(), flush=True)
    db = load_all_shards(os.path.join(BIG, "mydb"))
    pipeline = QueryPipelineParams(batch_size=16384, max_query_len=104,
                                   max_locations_per_query=256)
    eng = QueryEngine(db, ClassifyParams(lowest_rank="species"), pipeline)
    batches = list(NativeBatchReader(
        os.path.join(BIG, "reads_1.fa"), os.path.join(BIG, "reads_2.fa"),
        "files", pipeline.batch_size, pipeline.max_query_len))[:4]
    wires = [eng.precompute_wire(b.packed1, b.ambig1, b.lens1,
                                 b.packed2, b.ambig2, b.lens2)
             for b in batches]
    b0 = batches[0]
    eng.materialize(eng.dispatch_packed(
        b0.packed1, b0.ambig1, b0.lens1, b0.packed2, b0.ambig2, b0.lens2),
        b0.n).best
    outs = [eng.dispatch_packed(b.packed1, b.ambig1, b.lens1, b.packed2,
                                b.ambig2, b.lens2, wire=w)["summary"]
            for b, w in zip(batches, wires)]
    jax.block_until_ready(outs)

    os.system(f"rm -rf {TRACE}")
    with jax.profiler.trace(TRACE):
        outs = [eng.dispatch_packed(b.packed1, b.ambig1, b.lens1, b.packed2,
                                    b.ambig2, b.lens2, wire=w)["summary"]
                for b, w in zip(batches, wires)]
        jax.block_until_ready(outs)

    # parse the trace: aggregate device-op durations by op name
    files = glob.glob(f"{TRACE}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, flush=True)
    agg = defaultdict(float)
    total = 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            pid_name = ev.get("pid")
            name = ev.get("name", "")
            dur = ev.get("dur", 0) / 1e3  # us -> ms
            args = ev.get("args", {})
            # device op events carry 'long_name' or hlo metadata
            if "tid" in ev and dur > 0 and args.get("device_type",
                                                    "") == "TPU":
                agg[name] += dur
                total += dur
    if not agg:
        # fallback: aggregate all X events whose name looks like an HLO op
        for f in files:
            with gzip.open(f, "rt") as fh:
                data = json.load(fh)
            for ev in data.get("traceEvents", []):
                if ev.get("ph") != "X":
                    continue
                dur = ev.get("dur", 0) / 1e3
                name = ev.get("name", "")
                if dur > 0:
                    agg[(name[:70])] += dur
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{ms:9.2f} ms  {name}", flush=True)


if __name__ == "__main__":
    main()
