"""One-pass multi-shard build (db.build.build_database_shards): a single
parse of the inputs must produce shard databases identical to the
per-shard build path (which re-reads the inputs once per shard)."""
import numpy as np
import pytest

from metacache_tpu.db.build import (BuildOptions, build_database,
                                    build_database_shards)
from tests import util_mockdata as mock


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("multishard"))
    fasta, nodes, names, merged, genomes, taxids = mock.make_mock_world(
        tmp, num_genomes=10, genome_len=3000, seed=21)
    opt = BuildOptions(taxonomy_nodes=nodes, taxonomy_names=names,
                       taxonomy_merged=merged)
    return dict(fasta=fasta, opt=opt)


@pytest.mark.parametrize("nshards", [2, 4])
def test_one_pass_equals_per_shard(world, nshards):
    one_pass = build_database_shards([world["fasta"]], world["opt"],
                                     num_shards=nshards)
    assert len(one_pass) == nshards
    for s in range(nshards):
        ref = build_database([world["fasta"]], world["opt"],
                             num_shards=nshards, shard_id=s)
        got = one_pass[s]
        assert got.shard_id == s and got.num_shards == nshards
        np.testing.assert_array_equal(got.features.keys, ref.features.keys)
        np.testing.assert_array_equal(got.features.offsets,
                                      ref.features.offsets)
        np.testing.assert_array_equal(got.features.loc_tgt,
                                      ref.features.loc_tgt)
        np.testing.assert_array_equal(got.features.loc_win,
                                      ref.features.loc_win)
        np.testing.assert_array_equal(got.target_taxon_node,
                                      ref.target_taxon_node)
        # per-shard taxonomy view: windows recorded only for owned targets
        np.testing.assert_array_equal(got.taxonomy.source_windows,
                                      ref.taxonomy.source_windows)


def test_one_pass_shard_union_covers_everything(world):
    full = build_database([world["fasta"]], world["opt"])
    shards = build_database_shards([world["fasta"]], world["opt"],
                                   num_shards=3)
    total = sum(d.features.num_locations for d in shards)
    assert total == full.features.num_locations


def test_one_pass_with_spills(world):
    """One-pass multi-shard build with a tiny chunk budget: every shard's
    external sorter must spill to disk and still produce tables identical
    to the in-RAM path."""
    import dataclasses
    opt_spill = dataclasses.replace(world["opt"], chunk_triples=1000)
    spilled = build_database_shards([world["fasta"]], opt_spill,
                                    num_shards=2)
    plain = build_database_shards([world["fasta"]], world["opt"],
                                  num_shards=2)
    for a, b in zip(spilled, plain):
        np.testing.assert_array_equal(a.features.keys, b.features.keys)
        np.testing.assert_array_equal(a.features.offsets, b.features.offsets)
        np.testing.assert_array_equal(a.features.loc_tgt, b.features.loc_tgt)
        np.testing.assert_array_equal(a.features.loc_win, b.features.loc_win)
