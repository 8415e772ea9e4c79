#!/usr/bin/env python
"""Round-5: SAME-PROCESS A/B — config-2 engine _dispatch_tier (p1/slim1)
vs the cut-bisect reconstruction, single-use inputs, alternating to
cancel weather drift."""
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
B = 16384
N = 8


def main():
    print("devices:", jax.devices(), flush=True)
    db = load_all_shards(os.path.join(C2, "mydb"))
    pipeline = QueryPipelineParams(batch_size=B, max_query_len=104,
                                   max_locations_per_query=256)
    eng = QueryEngine(db, ClassifyParams(lowest_rank="species"), pipeline)
    batches = []
    rd = NativeBatchReader(os.path.join(C2, "reads.fa"), None, "none",
                           B, 104)
    for b in rd:
        batches.append(b)
        if len(batches) >= 4 * N + 4:
            break
    rd.close()
    pool = [jax.device_put(np.asarray(eng.precompute_wire(
        b.packed1, b.ambig1, b.lens1, b.packed2, b.ambig2, b.lens2)[0]))
        for b in batches]
    jax.block_until_ready(pool)
    cur = [0]

    def take(n):
        s = cur[0]
        cur[0] += n
        return pool[s:s + n]

    def eng_call(f):
        out = eng._dispatch_tier(f, None, eng.lmax_fast,
                                 direct_mb=eng._direct_mb, wire="slim1",
                                 sfmt="p1")
        return out["summary"]

    # warm
    jax.block_until_ready(eng_call(take(1)[0]))
    for rep in range(3):
        ins = take(N)
        t0 = time.perf_counter()
        outs = [eng_call(f) for f in ins]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / N * 1e3
        print(f"engine p1 rep{rep}: {dt:7.2f} ms/exec", flush=True)


if __name__ == "__main__":
    main()
