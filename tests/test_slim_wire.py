"""Slim wire format (engine.fuse_host_inputs_slim): 2-bit packed bases +
short lengths only, ambiguity plane synthesized on device from the
lengths. Reads containing ambiguous characters (N) are re-run through the
legacy full-width program host-side — results must be BIT-IDENTICAL to
the legacy wire format for every read."""
import numpy as np
import pytest

from metacache_tpu.config import ClassifyParams, QueryPipelineParams
from metacache_tpu.db.build import build_database_from_records
from metacache_tpu.db.taxonomy import Rank, Taxonomy
from metacache_tpu.ops import encode
from metacache_tpu.query.engine import (QueryEngine, encode_read_into,
                                        pack_summary_word,
                                        unpack_summary_word)


@pytest.fixture(scope="module")
def world():
    rng = np.random.default_rng(7)
    bases = np.array(list("ACGT"))
    tax = Taxonomy()
    tax.add_node(1, 1, "root", Rank.ROOT)
    tax.add_node(2, 1, "Bacteria", Rank.DOMAIN)
    records, genomes = [], []
    for i in range(6):
        g = "".join(bases[rng.integers(0, 4, 5000)])
        genomes.append(g)
        tax.add_node(100 + i, 2, f"Species{i}", Rank.SPECIES)
        records.append((f"NC_{i:06d}.1|taxid|{100 + i}| g{i}", g))
    db = build_database_from_records(records, taxonomy=tax)
    return db, genomes, rng


def _reads(eng, genomes, rng, n, with_n_every=0):
    c1, l1, c2, l2 = eng.make_host_buffers()
    for i in range(n):
        g = genomes[int(rng.integers(0, len(genomes)))]
        pos = int(rng.integers(0, len(g) - 400))
        s1 = g[pos:pos + 100]
        s2 = g[pos + 250:pos + 350]
        if with_n_every and i % with_n_every == 0:
            # ambiguous chars at varying positions (some inside kmers)
            j = (i // with_n_every) % 90
            s1 = s1[:j] + "N" + s1[j + 1:]
        encode_read_into(c1, l1, i, s1, 128)
        encode_read_into(c2, l2, i, s2, 128)
    return c1, l1, c2, l2


def _engines(db, monkeypatch_env=None):
    classify = ClassifyParams(lowest_rank="species")
    pipe = QueryPipelineParams(batch_size=64, max_query_len=128,
                               max_locations_per_query=256)
    slim = QueryEngine(db, classify, pipe)
    import os
    os.environ["METACACHE_WIRE"] = "legacy"
    try:
        legacy = QueryEngine(db, classify, pipe)
    finally:
        del os.environ["METACACHE_WIRE"]
    assert slim._wire == "slim" and legacy._wire == "legacy"
    return slim, legacy


def test_slim_equals_legacy_clean_reads(world):
    db, genomes, rng = world
    slim, legacy = _engines(db)
    c1, l1, c2, l2 = _reads(slim, genomes, rng, 64)
    rs = slim.classify_batch(c1, l1, c2, l2, 64)
    rl = legacy.classify_batch(c1, l1, c2, l2, 64)
    assert len(rs._patches) == 0          # no ambiguity -> no re-runs
    np.testing.assert_array_equal(rs.best[:64], rl.best[:64])
    np.testing.assert_array_equal(rs.best_rank[:64], rl.best_rank[:64])
    np.testing.assert_array_equal(rs.match_overflow[:64],
                                  rl.match_overflow[:64])
    assert int((rs.best[:64] != 0).sum()) > 32


def test_slim_equals_legacy_ambiguous_reads(world):
    db, genomes, rng = world
    slim, legacy = _engines(db)
    c1, l1, c2, l2 = _reads(slim, genomes, rng, 64, with_n_every=4)
    rs = slim.classify_batch(c1, l1, c2, l2, 64)
    rl = legacy.classify_batch(c1, l1, c2, l2, 64)
    assert len(rs._patches) > 0           # N-reads re-ran through legacy
    np.testing.assert_array_equal(rs.best[:64], rl.best[:64])
    np.testing.assert_array_equal(rs.best_rank[:64], rl.best_rank[:64])
    np.testing.assert_array_equal(rs.cand_tax[:64], rl.cand_tax[:64])
    np.testing.assert_array_equal(rs.cand_hits[:64], rl.cand_hits[:64])
    np.testing.assert_array_equal(rs.match_total[:64], rl.match_total[:64])


def test_single_end_slim1_equals_legacy(world):
    """A single-end batch (all mate-2 lengths zero) auto-selects the
    27-B/read slim1 wire (half the paired slim format); results must be
    bit-identical to the legacy wire."""
    db, genomes, rng = world
    slim, legacy = _engines(db)
    c1, l1, c2, l2 = slim.make_host_buffers()
    for i in range(64):
        g = genomes[int(rng.integers(0, len(genomes)))]
        pos = int(rng.integers(0, len(g) - 200))
        encode_read_into(c1, l1, i, g[pos:pos + 100], 128)
    assert int(l2.max()) == 0
    fused, ambig_rows = slim.precompute_wire(
        *_pack_args(slim, c1, l1, c2, l2))
    # single-end wire is mate-1-only: pw + len_bytes columns
    assert fused.shape[1] == 128 // 4 + slim._len_bytes
    rs = slim.classify_batch(c1, l1, c2, l2, 64)
    rl = legacy.classify_batch(c1, l1, c2, l2, 64)
    np.testing.assert_array_equal(rs.best[:64], rl.best[:64])
    np.testing.assert_array_equal(rs.best_rank[:64], rl.best_rank[:64])
    np.testing.assert_array_equal(rs.match_total[:64], rl.match_total[:64])
    assert int((rs.best[:64] != 0).sum()) > 32


def _pack_args(eng, c1, l1, c2, l2):
    p1, a1 = encode.np_pack_codes(c1)
    p2, a2 = encode.np_pack_codes(c2)
    return p1, a1, l1, p2, a2, l2


def test_ambig_row_detection_masks_padding():
    # padding bits (np_pack_codes marks them) must NOT flag a row
    codes = np.full((3, 16), 255, np.uint8)
    codes[0, :10] = 1            # clean 10bp read
    codes[1, :10] = 1
    codes[1, 5] = 255            # real ambiguous char inside the read
    codes[2, :16] = 2            # full-length clean read
    packed, ambig = encode.np_pack_codes(codes)
    lens = np.array([10, 10, 16], np.int32)
    rows = encode.np_rows_with_ambiguity(ambig, lens, 16)
    assert rows.tolist() == [False, True, False]


def test_synth_ambig_matches_padding_plane():
    import jax.numpy as jnp
    lens = np.array([0, 3, 8, 13, 16], np.int32)
    got = np.asarray(encode.synth_ambig_from_lens(jnp.asarray(lens), 16))
    codes = np.zeros((5, 16), np.uint8)
    for i, L in enumerate(lens):
        codes[i, L:] = 255
    _, want = encode.np_pack_codes(codes)
    np.testing.assert_array_equal(got, want)


def test_summary_word_roundtrip():
    best = np.array([0, 1, (1 << 26) - 1, 12345], np.int32)
    rank = np.array([0, 5, 31, 22], np.int32)
    import jax.numpy as jnp
    packed = np.asarray(pack_summary_word(jnp.asarray(best),
                                          jnp.asarray(rank)))
    b, r = unpack_summary_word(packed)
    np.testing.assert_array_equal(b, best)
    np.testing.assert_array_equal(r, rank)
