"""Multi-device sharded query engine on the 8-device virtual CPU mesh."""
import numpy as np
import pytest

import jax

from metacache_tpu.config import ClassifyParams, QueryPipelineParams
from metacache_tpu.db.build import BuildOptions, build_database
from metacache_tpu.parallel import ShardedQueryEngine, make_mesh
from metacache_tpu.query.engine import QueryEngine, encode_read_into
from tests import util_mockdata as mock

RNG = np.random.default_rng(17)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("sharded"))
    fasta, nodes, names, merged, genomes, taxids = mock.make_mock_world(
        tmp, num_genomes=8, genome_len=2500, seed=2)
    opt = BuildOptions(taxonomy_nodes=nodes, taxonomy_names=names,
                       taxonomy_merged=merged)
    return dict(fasta=fasta, opt=opt, genomes=genomes)


@pytest.mark.parametrize("nshards", [2, 4, 8])
def test_sharded_equals_single(world, nshards):
    devices = jax.devices()[:nshards]
    assert len(devices) == nshards, "conftest must provide 8 cpu devices"
    mesh = make_mesh(devices)

    dbs = [build_database([world["fasta"]], world["opt"],
                          num_shards=nshards, shard_id=s)
           for s in range(nshards)]
    single = build_database([world["fasta"]], world["opt"])

    classify = ClassifyParams(lowest_rank="species")
    pipeline = QueryPipelineParams(batch_size=32, max_query_len=128,
                                   max_locations_per_query=512)
    sharded = ShardedQueryEngine(dbs, classify, pipeline, mesh)
    ref = QueryEngine(single, classify, pipeline)

    reads = mock.sample_reads(RNG, world["genomes"], 32)
    c1, l1, c2, l2 = ref.make_host_buffers()
    for i, (_, seq, _) in enumerate(reads):
        encode_read_into(c1, l1, i, seq, 128)
    want = ref.classify_batch(c1, l1, c2, l2, 32)
    got = sharded.classify_batch(c1, l1, c2, l2, 32)

    np.testing.assert_array_equal(got.best, want.best)
    np.testing.assert_array_equal(got.cand_tax, want.cand_tax)
    np.testing.assert_array_equal(got.cand_hits, want.cand_hits)
    np.testing.assert_array_equal(got.best_rank, want.best_rank)


def test_sharded_paired_reads(world):
    nshards = 4
    mesh = make_mesh(jax.devices()[:nshards])
    dbs = [build_database([world["fasta"]], world["opt"],
                          num_shards=nshards, shard_id=s)
           for s in range(nshards)]
    classify = ClassifyParams()
    pipeline = QueryPipelineParams(batch_size=16, max_query_len=128,
                                   max_locations_per_query=512)
    eng = ShardedQueryEngine(dbs, classify, pipeline, mesh)
    c1, l1, c2, l2 = eng.make_host_buffers()
    g = 3
    genome = world["genomes"][g]
    for i in range(16):
        pos = int(RNG.integers(0, len(genome) - 400))
        encode_read_into(c1, l1, i, genome[pos:pos + 100], 128)
        encode_read_into(c2, l2, i, genome[pos + 280:pos + 380], 128)
    res = eng.classify_batch(c1, l1, c2, l2, 16)
    names = [eng.db.taxonomy.names[int(b)] if b else "--" for b in res.best]
    assert all(n == f"NC_{g:06d}.1" for n in names), names
