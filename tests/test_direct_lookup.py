"""Direct (per-feature-capped) fast-tier lookup: ops.lookup.lookup_matches_direct
and its engine integration.

Contract (lookup.py docstring): rows with overflow == 0 produce exactly the
same sorted match list as lookup_matches; rows where any feature holds more
than `mb` locations report overflow > 0 and are re-run at full width by the
engine, so end-to-end classifications are IDENTICAL to a single-tier run.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from metacache_tpu.config import (ClassifyParams, FEATURE_SENTINEL,
                                  QueryPipelineParams, TARGET_SENTINEL)
from metacache_tpu.ops import lookup
from tests.test_lookup import make_table, oracle


@pytest.mark.parametrize("use_packed", [False, True])
@pytest.mark.parametrize("mb", [1, 3, 6])
def test_direct_vs_oracle(use_packed, mb):
    rng = np.random.default_rng(13)
    keys, offsets, tgt, win = make_table(rng, max_run=6)
    B, NF = 13, 7
    feats = np.where(rng.random((B, NF)) < 0.2, FEATURE_SENTINEL,
                     keys[rng.integers(0, len(keys), (B, NF))]).astype(
                         np.uint32)
    sizes = np.diff(offsets).astype(np.int32)
    loc_packed = win_bits = None
    if use_packed:
        win_bits = 9
        loc_packed = ((tgt.astype(np.int64) << win_bits) | win).astype(
            np.int32)
    ot, ow, tot, ovf = lookup.lookup_matches_direct(
        jnp.asarray(feats), jnp.asarray(keys),
        jnp.asarray(offsets[:-1].astype(np.int32)), jnp.asarray(sizes),
        jnp.asarray(tgt), jnp.asarray(win), mb,
        loc_packed=None if loc_packed is None else jnp.asarray(loc_packed),
        win_bits=win_bits or 0)
    ot, ow = np.asarray(ot), np.asarray(ow)
    tot, ovf = np.asarray(tot), np.asarray(ovf)
    assert ot.shape == (B, NF * mb)
    for b in range(B):
        exp, exp_total = oracle(feats[b], keys, offsets, tgt, win,
                                lmax=10**9)
        n_drop = sum(max(0, offsets[np.searchsorted(keys, f) + 1]
                         - offsets[np.searchsorted(keys, f)] - mb)
                     for f in feats[b]
                     if f != FEATURE_SENTINEL
                     and keys[min(np.searchsorted(keys, f),
                                  len(keys) - 1)] == f)
        assert ovf[b] == n_drop
        if n_drop == 0:
            # exact rows: full sorted match list
            assert tot[b] == exp_total
            got = [(int(ot[b, i]), int(ow[b, i])) for i in range(tot[b])]
            assert got == exp
            assert (ot[b, tot[b]:] == TARGET_SENTINEL).all()


def _crowded_db(copies):
    from metacache_tpu.db.build import build_database_from_records
    from metacache_tpu.db.taxonomy import Rank, Taxonomy
    rng = np.random.default_rng(5)
    bases = np.array(list("ACGT"))
    genome = "".join(bases[rng.integers(0, 4, 4000)])
    tax = Taxonomy()
    tax.add_node(1, 1, "root", Rank.ROOT)
    tax.add_node(2, 1, "Bacteria", Rank.DOMAIN)
    records = []
    for i in range(copies):
        tax.add_node(100 + i, 2, f"Species{i}", Rank.SPECIES)
        records.append((f"NC_{i:06d}.1|taxid|{100 + i}| copy", genome))
    return build_database_from_records(records, taxonomy=tax), genome, rng


def _batch(eng, genome, rng, n=32):
    from metacache_tpu.query.engine import encode_read_into
    c1, l1, c2, l2 = eng.make_host_buffers()
    for i in range(n):
        pos = int(rng.integers(0, len(genome) - 400))
        encode_read_into(c1, l1, i, genome[pos:pos + 100], 128)
        encode_read_into(c2, l2, i, genome[pos + 250:pos + 350], 128)
    return c1, l1, c2, l2


def test_direct_engine_equals_legacy():
    """Direct fast tier with a cap BELOW the max bucket (forces re-runs)
    must classify identically to the legacy full-width engine."""
    from metacache_tpu.query.engine import QueryEngine
    db, genome, rng = _crowded_db(8)   # every feature in 8 targets
    classify = ClassifyParams(lowest_rank="species")
    direct = QueryEngine(db, classify, QueryPipelineParams(
        batch_size=32, max_query_len=128, max_locations_per_query=2048,
        fast_bucket_cap=2))
    legacy = QueryEngine(db, classify, QueryPipelineParams(
        batch_size=32, max_query_len=128, max_locations_per_query=2048,
        fast_locations_per_query=2048, fast_bucket_cap=-1))
    assert direct._direct_mb == 2 and not direct._direct_exact

    c1, l1, c2, l2 = _batch(direct, genome, rng)
    rd = direct.classify_batch(c1, l1, c2, l2, 32)
    rl = legacy.classify_batch(c1, l1, c2, l2, 32)
    assert len(rd._patches) > 0        # cap 2 < bucket 8 -> re-runs happened
    np.testing.assert_array_equal(rd.best[:32], rl.best[:32])
    np.testing.assert_array_equal(rd.best_rank[:32], rl.best_rank[:32])
    np.testing.assert_array_equal(rd.cand_tax[:32], rl.cand_tax[:32])
    np.testing.assert_array_equal(rd.cand_hits[:32], rl.cand_hits[:32])
    assert int(rd.match_overflow[:32].sum()) == 0


def test_direct_engine_exact_mode():
    """Auto-sized cap covering the max bucket: exact, no re-runs."""
    from metacache_tpu.query.engine import QueryEngine
    db, genome, rng = _crowded_db(3)
    eng = QueryEngine(db, ClassifyParams(lowest_rank="species"),
                      QueryPipelineParams(batch_size=32, max_query_len=128,
                                          max_locations_per_query=2048))
    assert eng._direct_mb >= 3 and eng._direct_exact
    legacy = QueryEngine(db, ClassifyParams(lowest_rank="species"),
                         QueryPipelineParams(batch_size=32,
                                             max_query_len=128,
                                             max_locations_per_query=2048,
                                             fast_bucket_cap=-1,
                                             fast_locations_per_query=2048))
    c1, l1, c2, l2 = _batch(eng, genome, rng)
    re_ = eng.classify_batch(c1, l1, c2, l2, 32)
    rl = legacy.classify_batch(c1, l1, c2, l2, 32)
    assert len(re_._patches) == 0
    np.testing.assert_array_equal(re_.best[:32], rl.best[:32])
    np.testing.assert_array_equal(re_.cand_hits[:32], rl.cand_hits[:32])


@pytest.mark.parametrize("mb", [1, 3, 6])
def test_direct_tbl_equals_flat(mb):
    """The padded row-gather table (build_direct_table) must reproduce the
    flat-gather direct lookup exactly (tgt/win/total/overflow)."""
    rng = np.random.default_rng(29)
    keys, offsets, tgt, win = make_table(rng, max_run=6)
    B, NF = 11, 7
    feats = np.where(rng.random((B, NF)) < 0.2, FEATURE_SENTINEL,
                     keys[rng.integers(0, len(keys), (B, NF))]).astype(
                         np.uint32)
    sizes = np.diff(offsets).astype(np.int32)
    win_bits = 9
    loc_packed = ((tgt.astype(np.int64) << win_bits) | win).astype(np.int32)
    args = (jnp.asarray(feats), jnp.asarray(keys),
            jnp.asarray(offsets[:-1].astype(np.int32)), jnp.asarray(sizes),
            jnp.asarray(tgt), jnp.asarray(win), mb)
    flat = lookup.lookup_matches_direct(
        *args, loc_packed=jnp.asarray(loc_packed), win_bits=win_bits)
    dtbl = lookup.build_direct_table(offsets[:-1], sizes, loc_packed, mb)
    assert dtbl.shape == (len(keys), mb + 1)
    rows = lookup.lookup_matches_direct(
        *args, loc_packed=jnp.asarray(loc_packed), win_bits=win_bits,
        direct_tbl=jnp.asarray(dtbl))
    for a, b in zip(flat, rows):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_estimate_overflow_fraction_regimes():
    """The window-overflow estimator must distinguish a concentrated heavy
    tail (few windows hold the >cap features) from a diffuse one (most
    windows do) — the round-4 tier decision input."""
    from metacache_tpu.query.engine import estimate_overflow_fraction
    # 10 features x bucket 2 spread over 20 windows (light), plus one
    # bucket-10 feature whose locations all sit in windows 0..1 of tgt 9
    sizes = np.array([2] * 10 + [10])
    lt = np.array([i // 2 for i in range(20)] + [9] * 10, np.int32)
    lw = np.array([i % 2 for i in range(20)] + [0, 1] * 5, np.int32)
    est = estimate_overflow_fraction(sizes, lt, lw, 4, total_windows=100)
    assert est == pytest.approx(2 * 2 / 100)   # 2 heavy windows, x2 mates
    # diffuse: every location belongs to a >cap bucket, all windows heavy
    sizes2 = np.array([10, 10])
    lt2 = np.arange(20, dtype=np.int32) % 10
    lw2 = np.arange(20, dtype=np.int32) // 10
    est2 = estimate_overflow_fraction(sizes2, lt2, lw2, 4,
                                      total_windows=20)
    assert est2 == 1.0
