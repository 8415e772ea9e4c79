"""Two-tier LMAX dispatch: reads overflowing the fast program re-run at
full capacity, so results must be IDENTICAL to a single-tier full-width
engine (the capacity knob must never change classifications unless the
full tier itself truncates)."""
import numpy as np
import pytest

from metacache_tpu.config import ClassifyParams, QueryPipelineParams
from metacache_tpu.db.build import build_database_from_records
from metacache_tpu.db.taxonomy import Rank, Taxonomy
from metacache_tpu.query.engine import QueryEngine, encode_read_into


@pytest.fixture(scope="module")
def crowded_db():
    """Every feature appears in 8 near-identical targets, so a 100bp pair
    collects ~8x more matches than the feature count — overflowing a
    narrow fast tier."""
    rng = np.random.default_rng(11)
    bases = np.array(list("ACGT"))
    genome = "".join(bases[rng.integers(0, 4, 4000)])
    tax = Taxonomy()
    tax.add_node(1, 1, "root", Rank.ROOT)
    tax.add_node(2, 1, "Bacteria", Rank.DOMAIN)
    records = []
    for i in range(8):
        tax.add_node(100 + i, 2, f"Species{i}", Rank.SPECIES)
        records.append((f"NC_{i:06d}.1|taxid|{100 + i}| copy", genome))
    db = build_database_from_records(records, taxonomy=tax)
    return db, genome, rng


def _batch(eng, genome, rng, n=32):
    c1, l1, c2, l2 = eng.make_host_buffers()
    for i in range(n):
        pos = int(rng.integers(0, len(genome) - 400))
        encode_read_into(c1, l1, i, genome[pos:pos + 100], 128)
        encode_read_into(c2, l2, i, genome[pos + 250:pos + 350], 128)
    return c1, l1, c2, l2


def test_two_tier_equals_single_tier(crowded_db):
    db, genome, rng = crowded_db
    classify = ClassifyParams(lowest_rank="species")
    # fast_bucket_cap=-1 pins the legacy LMAX-tier path (the direct path
    # has its own tests in test_direct_lookup.py)
    mk = lambda fast: QueryEngine(
        db, classify,
        QueryPipelineParams(batch_size=32, max_query_len=128,
                            max_locations_per_query=2048,
                            fast_locations_per_query=fast,
                            fast_bucket_cap=-1))
    tiered = mk(64)           # narrow fast tier -> overflow path exercised
    single = mk(2048)         # fast == full: plain single-tier
    assert tiered.lmax_fast == 64 and tiered.lmax_full == 2048
    assert single.lmax_fast == single.lmax_full == 2048

    c1, l1, c2, l2 = _batch(tiered, genome, rng)
    rt = tiered.classify_batch(c1, l1, c2, l2, 32)
    rs = single.classify_batch(c1, l1, c2, l2, 32)

    # the fast tier must actually have overflowed (else the test is vacuous)
    assert len(rt._patches) > 0
    np.testing.assert_array_equal(rt.best[:32], rs.best[:32])
    np.testing.assert_array_equal(rt.best_rank[:32], rs.best_rank[:32])
    np.testing.assert_array_equal(rt.cand_tax[:32], rs.cand_tax[:32])
    np.testing.assert_array_equal(rt.cand_hits[:32], rs.cand_hits[:32])
    # full tier did not truncate -> overflow counters all zero after patch
    assert int(rt.match_overflow[:32].sum()) == 0


def test_auto_fast_tier_sizing(crowded_db):
    db, genome, rng = crowded_db
    eng = QueryEngine(
        db, ClassifyParams(lowest_rank="species"),
        QueryPipelineParams(batch_size=32, max_query_len=128,
                            max_locations_per_query=2048,
                            fast_bucket_cap=-1))
    # mean bucket size ~8 (8 copies), 2 windows * 16 features * 2 mates:
    # auto sizing must pick >= the typical total and <= the full tier
    assert 64 <= eng.lmax_fast <= eng.lmax_full
    c1, l1, c2, l2 = _batch(eng, genome, rng)
    res = eng.classify_batch(c1, l1, c2, l2, 32)
    assert int((res.best[:32] != 0).sum()) == 32


def test_cross_batch_rerun_coalescing(crowded_db):
    """materialize_many must pack overflow rows from MANY batches into few
    full-occupancy rerun dispatches, and the patched results must equal a
    single-tier run for every batch."""
    db, genome, rng = crowded_db
    classify = ClassifyParams(lowest_rank="species")
    tiered = QueryEngine(
        db, classify,
        QueryPipelineParams(batch_size=32, max_query_len=128,
                            max_locations_per_query=2048,
                            fast_locations_per_query=64,
                            fast_bucket_cap=-1))
    single = QueryEngine(
        db, classify,
        QueryPipelineParams(batch_size=32, max_query_len=128,
                            max_locations_per_query=2048,
                            fast_locations_per_query=2048,
                            fast_bucket_cap=-1))
    tiered._rerun_batch = 64          # force multi-batch packing at n=32
    batches = [_batch(tiered, genome, rng) for _ in range(5)]
    pending = []
    for c1, l1, c2, l2 in batches:
        from metacache_tpu.ops import encode
        p1, a1 = encode.np_pack_codes(c1)
        p2, a2 = encode.np_pack_codes(c2)
        pending.append((tiered.dispatch_packed(p1, a1, l1, p2, a2, l2), 32))
    results = tiered.materialize_many(pending)
    # count DISTINCT rerun dispatches: every read overflows (crowded DB),
    # 5 batches x 32 rows at RB=64 -> ceil(160/64) = 3 dispatches, and at
    # least one dispatch must serve rows of more than one batch
    pouts = {id(p) for r in results for _, p, _ in r._patches}
    total_rows = sum(len(rows) for r in results for rows, _, _ in r._patches)
    assert total_rows == 160
    assert len(pouts) == 3
    for res, (c1, l1, c2, l2) in zip(results, batches):
        ref = single.classify_batch(c1, l1, c2, l2, 32)
        np.testing.assert_array_equal(res.best[:32], ref.best[:32])
        np.testing.assert_array_equal(res.best_rank[:32], ref.best_rank[:32])
        np.testing.assert_array_equal(res.cand_tax[:32], ref.cand_tax[:32])
        assert int(res.match_overflow[:32].sum()) == 0
