#!/usr/bin/env python
"""Round-4: dump the optimized HLO of the fused realistic program and
print the named fusions the profiler trace charges (fusion, fusion.1..6),
with their root ops and shapes."""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

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
    comp = rec.orig.lower(*a, **kw).compile()
    txt = comp.as_text()
    open("/tmp/mc_hlo.txt", "w").write(txt)
    print("HLO dumped to /tmp/mc_hlo.txt,", len(txt), "bytes")
    # print each computation named fusion/fusion.N (the profiler charges
    # these names): its root instruction line
    for m in re.finditer(r'^\s*(ROOT )?([%\w.\-]+) = .*fusion\(.*calls=([%\w.\-]+)',
                         txt, re.M):
        pass
    # simpler: find fusion instruction definitions
    names = {}
    for m in re.finditer(
            r'(\S+) = (\S+) fusion\((.*?)\), kind=(\S+), calls=(\S+)', txt):
        names[m.group(1).lstrip('%')] = (m.group(2), m.group(4),
                                         m.group(5).lstrip('%'))
    for n in sorted(names):
        shape, kind, called = names[n]
        print(f"{n:14s} {kind:10s} {shape[:60]:62s} calls {called}")


if __name__ == "__main__":
    main()
