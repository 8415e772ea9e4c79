import os

import numpy as np
import pytest

from metacache_tpu.config import BuildParams, ClassifyParams, QueryPipelineParams
from metacache_tpu.db import Database, Rank
from metacache_tpu.db.build import BuildOptions, build_database, \
    merge_shard_feature_counts
from metacache_tpu.query.engine import QueryEngine, encode_read_into
from metacache_tpu.ops import candidates as cand_ops
from tests import util_mockdata as mock

RNG = np.random.default_rng(99)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("world"))
    fasta, nodes, names, merged, genomes, taxids = mock.make_mock_world(
        tmp, num_genomes=6, genome_len=3000)
    opt = BuildOptions(taxonomy_nodes=nodes, taxonomy_names=names,
                       taxonomy_merged=merged)
    db = build_database([fasta], opt)
    return dict(tmp=tmp, fasta=fasta, opt=opt, db=db, genomes=genomes,
                taxids=taxids)


def classify_reads(db, reads, classify=None, pipeline=None):
    classify = classify or ClassifyParams()
    pipeline = pipeline or QueryPipelineParams(batch_size=64, max_query_len=128,
                                               max_locations_per_query=512)
    eng = QueryEngine(db, classify, pipeline)
    c1, l1, c2, l2 = eng.make_host_buffers()
    n = len(reads)
    assert n <= pipeline.batch_size
    for i, (_, seq, _) in enumerate(reads):
        encode_read_into(c1, l1, i, seq, pipeline.max_query_len)
    res = eng.classify_batch(c1, l1, c2, l2, n)
    return res, eng


class TestBuild:
    def test_build_basic(self, world):
        db = world["db"]
        assert db.target_count == 6
        assert db.features.num_keys > 0
        # every genome of 3000bp has 26 full + 1 tail window = ceil
        node = db.target_taxon_node[0]
        assert db.taxonomy.rank[node] == Rank.SEQUENCE
        assert db.taxonomy.source_windows[node] == 27
        # parent taxid resolved from header 'taxid|...|'
        assert db.taxonomy.parent_taxid[node] == world["taxids"][0]

    def test_save_load_roundtrip(self, world):
        db = world["db"]
        base = os.path.join(world["tmp"], "mockdb")
        path = db.save(base)
        db2 = Database.load(base, 0)
        assert db2.target_count == db.target_count
        np.testing.assert_array_equal(db2.features.keys, db.features.keys)
        np.testing.assert_array_equal(db2.features.loc_tgt, db.features.loc_tgt)
        np.testing.assert_array_equal(db2.taxonomy.ranked_lineage,
                                      db.taxonomy.ranked_lineage)
        assert db2.sketch_params == db.sketch_params

    def test_load_metadata_only(self, world):
        base = os.path.join(world["tmp"], "mockdb_meta")
        world["db"].save(base)
        db2 = Database.load(base, 0, metadata_only=True)
        assert db2.features.num_keys == 0
        assert db2.target_count == 6


class TestQuery:
    def test_exact_reads_classify_to_sequence(self, world):
        reads = mock.sample_reads(RNG, world["genomes"], 40)
        res, eng = classify_reads(world["db"], reads)
        correct = 0
        for i, (_, _, g) in enumerate(reads):
            best = int(res.best[i])
            assert best != 0, f"read {i} unclassified"
            if res.best_rank[i] == Rank.SEQUENCE:
                # maps back to the right genome
                if world["db"].taxonomy.names[best] == f"NC_{g:06d}.1":
                    correct += 1
        assert correct >= 38  # rare repeats may produce genus-level LCA

    def test_mutated_reads_mostly_classify(self, world):
        reads = mock.sample_reads(RNG, world["genomes"], 40, error_rate=0.02)
        res, _ = classify_reads(world["db"], reads)
        assert (res.best[:40] != 0).mean() > 0.8

    def test_random_reads_unclassified(self, world):
        reads = [(f"r{i}", mock.random_genome(RNG, 100), -1)
                 for i in range(20)]
        res, _ = classify_reads(world["db"], reads)
        assert (res.best[:20] == 0).all()

    def test_lowest_rank_species(self, world):
        reads = mock.sample_reads(RNG, world["genomes"], 30)
        res, eng = classify_reads(
            world["db"], reads, classify=ClassifyParams(lowest_rank="species"))
        for i, (_, _, g) in enumerate(reads):
            best = int(res.best[i])
            assert best != 0
            assert res.best_rank[i] >= Rank.SPECIES
            if res.best_rank[i] == Rank.SPECIES:
                assert world["db"].taxonomy.names[best] == f"Species{g}"

    def test_paired_reads(self, world):
        g = 2
        genome = world["genomes"][g]
        n = 16
        eng = QueryEngine(world["db"], ClassifyParams(),
                          QueryPipelineParams(batch_size=16, max_query_len=128,
                                              max_locations_per_query=512))
        c1, l1, c2, l2 = eng.make_host_buffers()
        for i in range(n):
            pos = int(RNG.integers(0, len(genome) - 400))
            encode_read_into(c1, l1, i, genome[pos:pos + 100], 128)
            encode_read_into(c2, l2, i, genome[pos + 300:pos + 400], 128)
        res = eng.classify_batch(c1, l1, c2, l2, n)
        for i in range(n):
            best = int(res.best[i])
            assert best != 0
            name = world["db"].taxonomy.names[best]
            assert name == f"NC_{g:06d}.1", name


class TestSharding:
    def test_shard_build_partitions_targets(self, world):
        dbs = [build_database([world["fasta"]], world["opt"],
                              num_shards=3, shard_id=s) for s in range(3)]
        # every shard has all targets/taxonomy but only its gated features
        for s, dbx in enumerate(dbs):
            assert dbx.target_count == 6
            assert set(np.unique(dbx.features.loc_tgt)) <= \
                {t for t in range(6) if t % 3 == s}
        # union of shard locations == single-shard locations
        total = sum(dbx.features.num_locations for dbx in dbs)
        assert total == world["db"].features.num_locations

    def test_shard_query_merge_equals_single(self, world):
        reads = mock.sample_reads(RNG, world["genomes"], 32)
        full_res, _ = classify_reads(world["db"], reads)

        dbs = [build_database([world["fasta"]], world["opt"],
                              num_shards=2, shard_id=s) for s in range(2)]
        import jax.numpy as jnp
        shard_results = [classify_reads(dbx, reads)[0] for dbx in dbs]
        a, b = shard_results
        merged = cand_ops.merge_candidate_lists(
            {"tax": jnp.asarray(a.cand_tax), "hits": jnp.asarray(a.cand_hits),
             "beg": jnp.asarray(a.cand_beg), "end": jnp.asarray(a.cand_end),
             "tgt": jnp.asarray(a.cand_tgt)},
            {"tax": jnp.asarray(b.cand_tax), "hits": jnp.asarray(b.cand_hits),
             "beg": jnp.asarray(b.cand_beg), "end": jnp.asarray(b.cand_end),
             "tgt": jnp.asarray(b.cand_tgt)}, 2)
        np.testing.assert_array_equal(np.asarray(merged["tax"])[:32],
                                      full_res.cand_tax[:32])
        np.testing.assert_array_equal(np.asarray(merged["hits"])[:32],
                                      full_res.cand_hits[:32])

    def test_global_overpopulated_removal(self, world):
        dbs = [build_database([world["fasta"]], world["opt"],
                              num_shards=2, shard_id=s) for s in range(2)]
        gk, gc = merge_shard_feature_counts([d.features for d in dbs])
        # single-shard table must yield identical global counts
        k1, c1 = world["db"].features.feature_counts()
        np.testing.assert_array_equal(gk, np.asarray(k1, dtype=np.uint32))
        np.testing.assert_array_equal(gc, np.asarray(c1, dtype=np.int64))
