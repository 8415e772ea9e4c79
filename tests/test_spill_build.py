"""Bounded-memory build path: the native streaming spill
(mcio_sketch_file_spill) + K-way chunk merge to CSR files
(mcio_merge_chunks_csr) must produce a table IDENTICAL to the in-RAM
build on the same inputs — including multi-shard routing, the per-feature
location cap, and insertion order (reference semantics:
src/hash_multimap.h:653 insertion + shrink; src/sketch_database.h:519-563
shard gating)."""
import os

import numpy as np
import pytest

from metacache_tpu.db.build import BuildOptions, build_database_shards
from metacache_tpu.db.feature_table import ChunkedTripleSorter, FeatureTable
from metacache_tpu import native
from tests import util_mockdata as mock


def _tables_equal(a, b):
    np.testing.assert_array_equal(np.asarray(a.keys), np.asarray(b.keys))
    np.testing.assert_array_equal(np.asarray(a.offsets),
                                  np.asarray(b.offsets))
    np.testing.assert_array_equal(np.asarray(a.loc_tgt),
                                  np.asarray(b.loc_tgt))
    np.testing.assert_array_equal(np.asarray(a.loc_win),
                                  np.asarray(b.loc_win))


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("spillworld"))
    fasta, nodes, names, merged, genomes, taxids = mock.make_mock_world(
        tmp, num_genomes=10, genome_len=6000)
    return dict(tmp=tmp, fasta=fasta, nodes=nodes, names=names,
                merged=merged)


def _build(world, spill_min, chunk_triples, num_shards=1):
    import metacache_tpu.db.build as build_mod
    old = build_mod.SPILL_MIN_BYTES
    build_mod.SPILL_MIN_BYTES = spill_min
    try:
        opt = BuildOptions(taxonomy_nodes=world["nodes"],
                           taxonomy_names=world["names"],
                           taxonomy_merged=world["merged"],
                           chunk_triples=chunk_triples)
        return build_database_shards([world["fasta"]], opt,
                                     num_shards=num_shards)
    finally:
        build_mod.SPILL_MIN_BYTES = old


@pytest.mark.skipif(native.load_mcio() is None, reason="native unavailable")
def test_spill_build_matches_inram(world):
    base = _build(world, spill_min=1 << 40, chunk_triples=32 << 20)[0]
    # force EVERY file through the spill path, with chunks small enough
    # that the K-way merge sees many per shard
    spilled = _build(world, spill_min=0, chunk_triples=1000)[0]
    assert isinstance(spilled.features.keys, np.memmap)
    _tables_equal(base.features, spilled.features)
    np.testing.assert_array_equal(base.target_taxon_node,
                                  spilled.target_taxon_node)
    np.testing.assert_array_equal(base.taxonomy.source_windows,
                                  spilled.taxonomy.source_windows)


@pytest.mark.skipif(native.load_mcio() is None, reason="native unavailable")
def test_spill_build_multishard(world):
    bases = _build(world, spill_min=1 << 40, chunk_triples=32 << 20,
                   num_shards=2)
    spills = _build(world, spill_min=0, chunk_triples=500, num_shards=2)
    for b, s in zip(bases, spills):
        _tables_equal(b.features, s.features)


@pytest.mark.skipif(native.load_mcio() is None, reason="native unavailable")
def test_spill_build_respects_location_cap(world):
    import metacache_tpu.db.build as build_mod
    old = build_mod.SPILL_MIN_BYTES
    build_mod.SPILL_MIN_BYTES = 0
    try:
        from metacache_tpu.config import BuildParams, SketchParams
        opt = BuildOptions(params=BuildParams(
            sketch=SketchParams(), max_locations_per_feature=2),
            taxonomy_nodes=world["nodes"], taxonomy_names=world["names"],
            taxonomy_merged=world["merged"], chunk_triples=700)
        db = build_database_shards([world["fasta"]], opt)[0]
    finally:
        build_mod.SPILL_MIN_BYTES = old
    assert int(db.features.bucket_sizes().max()) <= 2


@pytest.mark.skipif(native.load_mcio() is None, reason="native unavailable")
def test_chunk_merge_vs_range_fallback():
    """The native K-way CSR merge and the numpy key-range fallback must
    agree exactly on the same spilled chunks."""
    rng = np.random.default_rng(3)
    n = 40_000

    def fill(sorter):
        # triples arrive in (target, window) insertion order
        pos = 0
        for tgt in range(8):
            nw = n // 8 // 10
            for w in range(nw):
                f = rng.integers(0, 5000, 10).astype(np.uint32)
                sorter.add(f, np.full(10, tgt, np.int32),
                           np.full(10, w, np.int32))
                pos += 10

    rng = np.random.default_rng(3)
    s1 = ChunkedTripleSorter(chunk_triples=3000)
    fill(s1)
    t1 = s1.finalize(4)
    rng = np.random.default_rng(3)
    s2 = ChunkedTripleSorter(chunk_triples=3000)
    fill(s2)
    # force the numpy fallback by monkeypatching the native merge away
    orig = native.merge_chunks_csr
    native.merge_chunks_csr = lambda *a, **k: None
    try:
        t2 = s2.finalize(4)
    finally:
        native.merge_chunks_csr = orig
    _tables_equal(t1, t2)
