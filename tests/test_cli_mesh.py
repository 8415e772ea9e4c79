"""CLI -mesh flag: sharded multi-device query equals single-device query."""
import os
import subprocess
import sys

import numpy as np
import pytest

from tests import util_mockdata as mock


def run_cli(args, tmp):
    env = dict(os.environ, METACACHE_PLATFORM="cpu", PYTHONPATH="/root/repo",
               XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
               + " --xla_force_host_platform_device_count=8")
    return subprocess.run([sys.executable, "-m", "metacache_tpu.cli"] + args,
                          capture_output=True, text=True, cwd="/root/repo",
                          env=env)


def test_cli_mesh_query_matches_single(tmp_path):
    tmp = str(tmp_path)
    fasta, nodes, names, merged, genomes, taxids = mock.make_mock_world(
        tmp, num_genomes=8, genome_len=2000, seed=9)
    rng = np.random.default_rng(3)
    reads = mock.sample_reads(rng, genomes, 100)
    mock.write_fasta(os.path.join(tmp, "r1.fa"),
                     [(h, s) for h, s, _ in reads])
    mock.write_fasta(os.path.join(tmp, "r2.fa"),
                     [(h, s) for h, s, _ in reads])

    r = run_cli(["build", f"{tmp}/db8", fasta, "-taxonomy", f"{tmp}/tax",
                 "-num-shards", "8"], tmp)
    assert r.returncode == 0, r.stderr

    r = run_cli(["query", f"{tmp}/db8", f"{tmp}/r1.fa", f"{tmp}/r2.fa",
                 "-pairfiles", "-lowest", "species",
                 "-out", f"{tmp}/single.txt"], tmp)
    assert r.returncode == 0, r.stderr

    r = run_cli(["query", f"{tmp}/db8", f"{tmp}/r1.fa", f"{tmp}/r2.fa",
                 "-pairfiles", "-lowest", "species", "-mesh",
                 "-out", f"{tmp}/mesh.txt"], tmp)
    assert r.returncode == 0, r.stderr
    assert "falling back" not in r.stderr, r.stderr

    def lines(p):
        with open(p) as f:
            return [l for l in f if not l.startswith("#")]
    assert lines(f"{tmp}/single.txt") == lines(f"{tmp}/mesh.txt")
    assert len(lines(f"{tmp}/single.txt")) == 100
