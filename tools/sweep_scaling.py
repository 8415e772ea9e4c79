#!/usr/bin/env python
"""Scaling-efficiency sweep of the sharded query engine over 1/2/4/8
device shards (BASELINE.json north star: reads/s scaling efficiency >=80%
at 2+ shards; reference analogue: script/ft/queries_s4/* rank sweeps).

Each shard count runs in its own subprocess on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=P). Two regimes:

  strong: total database FIXED (32 genomes), sharded P ways — per-shard
          tables shrink with P; per-batch time should not grow.
  weak:   per-shard database FIXED (8 genomes per shard, total 8*P) —
          the regime the reference's rank sweeps measure (bigger refsets
          on more ranks at constant time); efficiency_P = T_1 / T_P.

CAVEAT (recorded in SCALING.json): virtual CPU devices share the host's
physical cores, so device compute does NOT speed up with P here; what this
sweep isolates is the sharded engine's overhead trend — all_gather +
merge cost and per-shard table scaling — which is exactly the part that
rides ICI on real multi-chip hardware. Run on a real slice for absolute
numbers.

Writes SCALING.json at the repo root and prints the table.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys, time, json
import numpy as np
sys.path.insert(0, %(repo)r)
import jax
# sitecustomize pins the remote axon platform; redirect to the virtual CPU
# mesh before any backend use (same trick as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
from tests import util_mockdata as mock
from metacache_tpu.config import ClassifyParams, QueryPipelineParams
from metacache_tpu.db.build import build_database_from_records
from metacache_tpu.db.taxonomy import Rank, Taxonomy
from metacache_tpu.parallel import ShardedQueryEngine, make_mesh
from metacache_tpu.query.engine import encode_read_into

P = int(sys.argv[1])
mode = sys.argv[2]
NUM_GENOMES = 32 if mode == "strong" else 8 * P
GENOME_LEN = 50_000
B = 2048

rng = np.random.default_rng(5)
bases = np.array(list("ACGT"))
genomes = ["".join(bases[rng.integers(0, 4, GENOME_LEN)])
           for _ in range(NUM_GENOMES)]
tax = Taxonomy()
tax.add_node(1, 1, "root", Rank.ROOT)
tax.add_node(2, 1, "Bacteria", Rank.DOMAIN)
records = []
for i in range(NUM_GENOMES):
    tax.add_node(100 + i, 2, f"Species{i}", Rank.SPECIES)
    records.append((f"NC_{i:06d}.1|taxid|{100 + i}| g", genomes[i]))

devices = jax.devices()[:P]
mesh = make_mesh(devices)
dbs = [build_database_from_records(records, taxonomy=tax,
                                   num_shards=P, shard_id=s)
       for s in range(P)]
eng = ShardedQueryEngine(dbs, ClassifyParams(lowest_rank="species"),
                         QueryPipelineParams(batch_size=B, max_query_len=128,
                                             max_locations_per_query=256),
                         mesh)
c1, l1, c2, l2 = eng.make_host_buffers()
for i in range(B):
    g = int(rng.integers(0, NUM_GENOMES))
    pos = int(rng.integers(0, GENOME_LEN - 400))
    encode_read_into(c1, l1, i, genomes[g][pos:pos + 100], 128)
    encode_read_into(c2, l2, i, genomes[g][pos + 250:pos + 350], 128)

from metacache_tpu.ops import encode as enc
p1, a1 = enc.np_pack_codes(c1)
p2, a2 = enc.np_pack_codes(c2)
# warmup: compile + first-execution costs
for _ in range(2):
    r = eng.classify_batch_packed(p1, a1, l1, p2, a2, l2, B)
    r.best
rounds = 6
t0 = time.perf_counter()
for _ in range(rounds):
    r = eng.classify_batch_packed(p1, a1, l1, p2, a2, l2, B)
    n_cls = int((r.best[:B] != 0).sum())
wall = time.perf_counter() - t0
print(json.dumps({"P": P, "mode": mode,
                  "pairs_per_sec": round(rounds * B / wall, 1),
                  "batch_ms": round(wall / rounds * 1e3, 2),
                  "classified_frac": round(n_cls / B, 4),
                  "genomes": NUM_GENOMES}))
"""


def run_child(p: int, mode: str) -> dict:
    env = dict(os.environ, METACACHE_PLATFORM="cpu", PYTHONPATH=REPO,
               XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
               + f" --xla_force_host_platform_device_count={p}")
    r = subprocess.run(
        [sys.executable, "-c", CHILD % {"repo": REPO}, str(p), mode],
        capture_output=True, text=True, cwd=REPO, env=env)
    if r.returncode != 0:
        print(r.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"child P={p} mode={mode} failed")
    return json.loads(r.stdout.strip().splitlines()[-1])


def main():
    shard_counts = [1, 2, 4, 8]
    results = {"caveat": ("virtual CPU mesh: devices share host cores; "
                          "this isolates sharding/merge overhead trends, "
                          "not absolute speedup"),
               "strong": [], "weak": []}
    for mode in ("strong", "weak"):
        for p in shard_counts:
            res = run_child(p, mode)
            results[mode].append(res)
            print(f"{mode:6s} P={p}: {res['pairs_per_sec']:>9.1f} pairs/s  "
                  f"{res['batch_ms']:>8.2f} ms/batch  "
                  f"({res['classified_frac']*100:.1f}% classified)",
                  flush=True)
        base = results[mode][0]["batch_ms"]
        for res in results[mode]:
            res["efficiency_vs_p1"] = round(base / res["batch_ms"], 3)
    with open(os.path.join(REPO, "SCALING.json"), "w") as f:
        json.dump(results, f, indent=1)
    print("wrote SCALING.json")


if __name__ == "__main__":
    main()
