#!/usr/bin/env python
"""Round-4: profile the REALISTIC-workload device programs.

VERDICT r3: the toy program saturates the tunnel wire (~9x) while the
realistic program gets 2.4x on the same wire — the loss is program-side.
This measures, for the realistic configuration (direct_mb=8 fast tier +
full-width legacy re-run tier):

  1. generated-code size of each program (exe size sets the tunneled
     device's program-load AND degraded-mode re-ship cost, PERF.md)
  2. per-batch device time of each program (n timed executions)
  3. a weather probe (timed 8 MB h2d copy) so numbers are interpretable

Run AFTER bench.py has created /tmp/mc_bench_big.
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
from metacache_tpu.query import engine as eng_mod
from metacache_tpu.query.engine import QueryEngine
from metacache_tpu.native import NativeBatchReader

BIG = "/tmp/mc_bench_big"


def weather_probe():
    """Timed 8 MB h2d copy -> effective MB/s right now."""
    buf = np.zeros(8 * 1024 * 1024, np.uint8)
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.asarray(buf))
    dt = time.perf_counter() - t0
    return 8.0 / dt


def timeit(fn, n=10):
    r = fn()
    jax.block_until_ready(list(r.values()) if isinstance(r, dict) else r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(list(r.values()) if isinstance(r, dict) else r)
    return (time.perf_counter() - t0) / n * 1e3


class Recorder:
    """Shim around the jitted _query_batch_device that records call args so
    the same call can be .lower()ed for memory_analysis."""

    def __init__(self, orig):
        self.orig = orig
        self.calls = []

    def __call__(self, *a, **kw):
        self.calls.append((a, kw))
        return self.orig(*a, **kw)


def main():
    print("devices:", jax.devices(), flush=True)
    print(f"weather probe: {weather_probe():.0f} MB/s h2d", flush=True)
    db = load_all_shards(os.path.join(BIG, "mydb"))
    pipeline = QueryPipelineParams(batch_size=8192, max_query_len=104,
                                   max_locations_per_query=256)
    eng = QueryEngine(db, ClassifyParams(lowest_rank="species"), pipeline)
    print("direct_mb:", eng._direct_mb, "exact:", eng._direct_exact,
          "lmax_full:", eng.lmax_full, "wire:", eng._wire, flush=True)

    batches = []
    it = iter(NativeBatchReader(
        os.path.join(BIG, "reads_1.fa"), os.path.join(BIG, "reads_2.fa"),
        "files", pipeline.batch_size, pipeline.max_query_len))
    for _ in range(4):
        batches.append(next(it))

    rec = Recorder(eng_mod._query_batch_device)
    eng_mod._query_batch_device = rec

    b0 = batches[0]
    # main program (queue depth 1 first execution)
    out = eng.dispatch_packed(b0.packed1, b0.ambig1, b0.lens1,
                              b0.packed2, b0.ambig2, b0.lens2)
    res = eng.materialize(out, b0.n)
    res.best
    n_main_calls = 1
    main_call = rec.calls[0]
    rerun_call = rec.calls[1] if len(rec.calls) > 1 else None
    print(f"dispatch+materialize made {len(rec.calls)} device calls",
          flush=True)

    for name, call in (("main(fast-tier)", main_call),
                       ("rerun(legacy full)", rerun_call)):
        if call is None:
            continue
        a, kw = call
        lowered = rec.orig.lower(*a, **kw)
        comp = lowered.compile()
        ma = comp.memory_analysis()
        print(f"{name}: generated_code = "
              f"{ma.generated_code_size_in_bytes/1e6:.2f} MB, "
              f"argument_size = {ma.argument_size_in_bytes/1e6:.1f} MB, "
              f"temp = {ma.temp_size_in_bytes/1e6:.1f} MB", flush=True)

    # device time per program
    wires = [eng.precompute_wire(b.packed1, b.ambig1, b.lens1,
                                 b.packed2, b.ambig2, b.lens2)
             for b in batches]

    def run_main():
        outs = [eng.dispatch_packed(b.packed1, b.ambig1, b.lens1,
                                    b.packed2, b.ambig2, b.lens2, wire=w)
                for b, w in zip(batches, wires)]
        return [o["summary"] for o in outs]

    t_main = timeit(run_main, n=5) / len(batches)
    print(f"weather probe: {weather_probe():.0f} MB/s h2d", flush=True)
    print(f"main program: {t_main:.1f} ms/batch end-to-end (incl. wire)",
          flush=True)

    if rerun_call is not None:
        a, kw = rerun_call

        def run_rerun():
            return rec.orig(*a, **kw)["summary"]

        t_rerun = timeit(run_rerun, n=5)
        print(f"rerun program: {t_rerun:.1f} ms/dispatch end-to-end",
              flush=True)

    # full window simulation: how many rerun dispatches per 32 batches?
    pending = []
    for b, w in zip(batches * 8, wires * 8):
        pending.append((eng.dispatch_packed(
            b.packed1, b.ambig1, b.lens1, b.packed2, b.ambig2, b.lens2,
            wire=w), b.n))
    rec.calls.clear()
    t0 = time.perf_counter()
    results = eng.materialize_many(pending)
    for r in results:
        r.best
    dt = time.perf_counter() - t0
    n_rerun = len(rec.calls)
    rerun_rows = sum(len(rows) for r in results for rows, _, _ in r._patches)
    print(f"window of {len(pending)} batches: materialize_many took "
          f"{dt*1e3:.0f} ms, {n_rerun} rerun dispatches for {rerun_rows} "
          f"rows ({rerun_rows/max(1,n_rerun)/eng._rerun_batch:.0%} "
          f"occupancy)", flush=True)
    print(f"weather probe: {weather_probe():.0f} MB/s h2d", flush=True)


if __name__ == "__main__":
    main()
