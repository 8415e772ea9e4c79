#!/usr/bin/env python
"""Round-3 scaling quantification (VERDICT item 4).

Two measurements feed the PERF.md efficiency model:

1. REAL CHIP (run under the default tpu backend): fused single-chip
   QueryEngine vs ShardedQueryEngine at P=1 on the bench workload — the
   sharding-machinery overhead (shard_map + all_gather at world size 1).

2. VIRTUAL MESH (run with JAX_PLATFORMS=cpu
   XLA_FLAGS=--xla_force_host_platform_device_count=8): microbenchmark of
   ONLY the candidate merge (all_gather [P,B,C] + dedup/top-k) as a
   function of P — the single component of the sharded engine whose cost
   grows with P (local lookup work per shard is constant: each shard holds
   1/P of the table; the read sketch is recomputed per shard, but it is
   the same per-shard work the reference's ranks also replicate,
   querying.h:749-830).

Usage:
  python tools/exp_r3_scaling.py chip    # on the real TPU
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/exp_r3_scaling.py merge
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

WORK = "/tmp/mc_bench"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "SCALING.json")


def _bench_batches(pipeline):
    from metacache_tpu.native import NativeBatchReader
    return list(NativeBatchReader(
        os.path.join(WORK, "reads_1.fa"), os.path.join(WORK, "reads_2.fa"),
        "files", pipeline.batch_size, pipeline.max_query_len))


def chip():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from metacache_tpu.config import ClassifyParams, QueryPipelineParams
    from metacache_tpu.modes.query import load_all_shards
    from metacache_tpu.query.engine import QueryEngine
    from metacache_tpu.parallel import ShardedQueryEngine, make_mesh

    db = load_all_shards(os.path.join(WORK, "mydb"))
    classify = ClassifyParams(lowest_rank="species")
    pipeline = QueryPipelineParams(batch_size=8192, max_query_len=104,
                                   max_locations_per_query=256)
    batches = _bench_batches(pipeline)

    def run(eng, label):
        warm = [(eng.dispatch_packed(b.packed1, b.ambig1, b.lens1,
                                     b.packed2, b.ambig2, b.lens2), b.n)
                for b in batches * 4]
        for r in eng.materialize_many(warm):
            r.best
        speeds = []
        for _ in range(3):
            t0 = time.time()
            pend = [(eng.dispatch_packed(b.packed1, b.ambig1, b.lens1,
                                         b.packed2, b.ambig2, b.lens2), b.n)
                    for b in batches * 8]
            tot = 0
            for r, (_, m) in zip(eng.materialize_many(pend), pend):
                r.best
                tot += m
            speeds.append(tot / (time.time() - t0))
        best = max(speeds)
        print(f"{label}: {best:.0f} pairs/s (median "
              f"{sorted(speeds)[1]:.0f})", flush=True)
        return best

    single = run(QueryEngine(db, classify, pipeline), "single-chip fused")
    mesh = make_mesh(jax.devices()[:1])
    sharded = run(ShardedQueryEngine([db], classify, pipeline, mesh),
                  "sharded engine P=1")
    res = {"chip_single_pairs_per_sec": round(single, 1),
           "chip_sharded_p1_pairs_per_sec": round(sharded, 1),
           "chip_sharding_overhead": round(1 - sharded / single, 4)}
    _merge_into_scaling(res)
    print(json.dumps(res))


def merge():
    """Cost of the cross-shard candidate merge alone as a function of P."""
    # sitecustomize imports jax (axon backend) at interpreter start; env
    # vars are too late — override via jax.config like tests/conftest.py
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from metacache_tpu.ops import candidates as cand_ops
    from metacache_tpu.parallel import make_mesh

    B, C = 8192, 2
    rng = np.random.default_rng(0)
    res = {"merge_microbench": []}
    for Pn in (1, 2, 4, 8):
        if Pn > len(jax.devices()):
            break
        mesh = make_mesh(jax.devices()[:Pn])

        def shard_fn(tax, hits, beg, end, tgt):
            g = {k: jax.lax.all_gather(v, "shard")
                 for k, v in dict(tax=tax, hits=hits, beg=beg, end=end,
                                  tgt=tgt).items()}
            flat = {k: jnp.transpose(v, (1, 0, 2)).reshape(B, Pn * C)
                    for k, v in g.items()}
            m = cand_ops._dedup_topk(flat["tax"], flat["hits"], flat["beg"],
                                     flat["end"], flat["tgt"], C)
            return m["tax"], m["hits"]

        fn = jax.jit(jax.shard_map(
            shard_fn, mesh=mesh, in_specs=(P(), P(), P(), P(), P()),
            out_specs=(P(), P()), check_vma=False))
        args = [jnp.asarray(rng.integers(0, 100, (B, C)).astype(np.int32))
                for _ in range(5)]
        try:
            r = fn(*args)
            jax.block_until_ready(r)
            t0 = time.time()
            N = 50
            for _ in range(N):
                r = fn(*args)
            jax.block_until_ready(r)
        except Exception as e:     # 8 virtual devices on 2 cores can OOM
            print(f"P={Pn}: failed ({type(e).__name__})", flush=True)
            break
        ms = (time.time() - t0) / N * 1e3
        print(f"P={Pn}: merge {ms:.3f} ms/batch", flush=True)
        res["merge_microbench"].append({"P": Pn, "ms_per_batch": round(ms, 4)})
        _merge_into_scaling(res)   # save incrementally: P=8 may abort
    print(json.dumps(res))


def _merge_into_scaling(update: dict):
    data = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            data = json.load(f)
    data.update(update)
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)


if __name__ == "__main__":
    {"chip": chip, "merge": merge}[sys.argv[1]]()
