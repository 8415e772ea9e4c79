import numpy as np

from metacache_tpu.db.feature_table import FeatureTable

RNG = np.random.default_rng(3)


def random_triples(n, nf=50, nt=8, nw=40):
    f = RNG.integers(0, nf, size=n).astype(np.uint32)
    t = RNG.integers(0, nt, size=n).astype(np.int32)
    w = RNG.integers(0, nw, size=n).astype(np.int32)
    order = np.lexsort((w, t))
    return f[order], t[order], w[order]


def as_dict(ft: FeatureTable):
    d = {}
    for i, k in enumerate(ft.keys):
        s, e = ft.offsets[i], ft.offsets[i + 1]
        d[int(k)] = list(zip(ft.loc_tgt[s:e].tolist(), ft.loc_win[s:e].tolist()))
    return d


def oracle_dict(f, t, w, cap):
    d = {}
    for fi, ti, wi in zip(f.tolist(), t.tolist(), w.tolist()):
        d.setdefault(fi, [])
        if len(d[fi]) < cap:
            # insertion order is (tgt, win) ascending because triples are
            # generated in that order; cap keeps the first entries
            d[fi].append((ti, wi))
    return {k: v for k, v in d.items()}


def test_from_triples_matches_oracle():
    f, t, w = random_triples(500)
    ft = FeatureTable.from_triples(f, t, w, max_locs_per_feature=254)
    assert as_dict(ft) == oracle_dict(f, t, w, 254)
    # keys strictly ascending
    assert (np.diff(ft.keys.astype(np.int64)) > 0).all()


def test_location_cap():
    f, t, w = random_triples(2000, nf=5)
    ft = FeatureTable.from_triples(f, t, w, max_locs_per_feature=7)
    assert as_dict(ft) == oracle_dict(f, t, w, 7)
    assert (ft.bucket_sizes() <= 7).all()


def test_empty():
    ft = FeatureTable.from_triples(np.zeros(0, np.uint32), np.zeros(0, np.int32),
                                   np.zeros(0, np.int32), 254)
    assert ft.num_keys == 0 and ft.num_locations == 0


def test_remove_overpopulated():
    f, t, w = random_triples(1000, nf=10)
    ft = FeatureTable.from_triples(f, t, w, max_locs_per_feature=254)
    big = ft.keys[ft.bucket_sizes() > 50]
    ft2, removed = ft.remove_overpopulated(50)
    assert removed == len(big)
    assert (ft2.bucket_sizes() <= 50).all()
    assert not np.isin(big, ft2.keys).any()
    # surviving runs unchanged
    d1, d2 = as_dict(ft), as_dict(ft2)
    for k in d2:
        assert d2[k] == d1[k]


def test_remove_keys():
    f, t, w = random_triples(300)
    ft = FeatureTable.from_triples(f, t, w, 254)
    kill = ft.keys[::3]
    ft2, removed = ft.remove_keys(kill)
    assert removed == len(np.unique(kill))
    assert not np.isin(kill, ft2.keys).any()


def test_remove_ambiguous():
    f, t, w = random_triples(800, nf=20, nt=10)
    ft = FeatureTable.from_triples(f, t, w, 254)
    groups = np.arange(10, dtype=np.int32) % 3  # 10 targets -> 3 groups
    ft2, removed = ft.remove_ambiguous(groups, max_groups=2)
    d1 = as_dict(ft)
    expect_removed = sum(
        1 for k, locs in d1.items()
        if len({int(groups[t]) for t, _ in locs}) > 2)
    assert removed == expect_removed
    for k, locs in as_dict(ft2).items():
        assert len({int(groups[t]) for t, _ in locs}) <= 2


def test_merge_with():
    f1, t1, w1 = random_triples(200, nt=4)
    f2, t2, w2 = random_triples(200, nt=4)
    t2 = t2 + 4  # disjoint target ranges, as in `modify` mode
    a = FeatureTable.from_triples(f1, t1, w1, 254)
    b = FeatureTable.from_triples(f2, t2, w2, 254)
    m = a.merge_with(b, 254)
    fall = np.concatenate([f1, f2])
    tall = np.concatenate([t1, t2])
    wall = np.concatenate([w1, w2])
    order = np.lexsort((wall, tall))
    want = oracle_dict(fall[order], tall[order], wall[order], 254)
    assert as_dict(m) == want


def test_device_arrays_padding():
    f, t, w = random_triples(100)
    ft = FeatureTable.from_triples(f, t, w, 254)
    keys, offsets, tgt, win = ft.device_arrays(pad_keys_to=128,
                                               pad_locs_to=256)
    assert keys.shape == (128,) and offsets.shape == (129,)
    assert (keys[ft.num_keys:] == np.uint32(0xFFFFFFFF)).all()
    assert (offsets[ft.num_keys:] == ft.offsets[-1]).all()
    # padded rows have zero length
    assert (np.diff(offsets)[ft.num_keys:] == 0).all()


class TestChunkedTripleSorter:
    def _triples(self, n, seed=0, tmax=50, wmax=40):
        """Random triples in ascending (target, window) order."""
        import numpy as np
        rng = np.random.default_rng(seed)
        t = np.sort(rng.integers(0, tmax, n).astype(np.int32))
        # windows ascending within each target
        w = np.zeros(n, np.int32)
        for tv in np.unique(t):
            m = t == tv
            w[m] = np.sort(rng.integers(0, wmax, int(m.sum())))
        f = rng.integers(0, 5000, n).astype(np.uint32)
        return f, t, w

    def test_spill_equivalent_to_in_memory(self, tmp_path):
        import numpy as np
        from metacache_tpu.db.feature_table import (ChunkedTripleSorter,
                                                    FeatureTable)
        f, t, w = self._triples(100_000, seed=3)
        want = FeatureTable.from_triples(f, t, w, 254)
        s = ChunkedTripleSorter(chunk_triples=7_000, tmpdir=str(tmp_path))
        for i in range(0, len(f), 1_000):  # feed in slices, forcing spills
            s.add(f[i:i+1000], t[i:i+1000], w[i:i+1000])
        got = s.finalize(254, range_budget=9_000)
        np.testing.assert_array_equal(want.keys, got.keys)
        np.testing.assert_array_equal(want.offsets, got.offsets)
        np.testing.assert_array_equal(want.loc_tgt, got.loc_tgt)
        np.testing.assert_array_equal(want.loc_win, got.loc_win)

    def test_cap_keeps_first_in_insertion_order(self, tmp_path):
        import numpy as np
        from metacache_tpu.db.feature_table import (ChunkedTripleSorter,
                                                    FeatureTable)
        # one hot feature appearing in many targets; cap must keep the
        # lowest (target, window) entries (= first inserted)
        n = 1000
        f = np.full(n, 42, np.uint32)
        t = np.arange(n, dtype=np.int32)
        w = np.zeros(n, np.int32)
        s = ChunkedTripleSorter(chunk_triples=100, tmpdir=str(tmp_path))
        for i in range(0, n, 50):
            s.add(f[i:i+50], t[i:i+50], w[i:i+50])
        got = s.finalize(254, range_budget=200)
        assert got.num_keys == 1
        np.testing.assert_array_equal(got.loc_tgt,
                                      np.arange(254, dtype=np.int32))

    def test_no_spill_path(self):
        import numpy as np
        from metacache_tpu.db.feature_table import (ChunkedTripleSorter,
                                                    FeatureTable)
        f, t, w = self._triples(5_000, seed=9)
        want = FeatureTable.from_triples(f, t, w, 254)
        s = ChunkedTripleSorter()  # default chunk size: never spills here
        s.add(f, t, w)
        got = s.finalize(254)
        np.testing.assert_array_equal(want.keys, got.keys)
        np.testing.assert_array_equal(want.loc_tgt, got.loc_tgt)


def test_native_merge_shard_tables_equals_lexsort():
    """The native P-way shard merge must equal the numpy lexsort path."""
    import os
    from metacache_tpu import native
    from metacache_tpu.db.feature_table import FeatureTable
    if native.load_mcio() is None:
        import pytest
        pytest.skip("native unavailable")
    rng = np.random.default_rng(7)
    tables = []
    P = 3
    for s in range(P):
        n = int(rng.integers(50, 200))
        f = rng.integers(0, 40, n).astype(np.uint32)
        t = (rng.integers(0, 30, n) * P + s).astype(np.int32)  # disjoint
        w = rng.integers(0, 100, n).astype(np.int32)
        order = np.lexsort((w, t, f))
        tables.append(FeatureTable.from_triples(
            f[order], t[order], w[order], 1000,
            presorted_by_location=True, sort_in_place=False))
    got = FeatureTable.concat_shards(tables)
    # numpy reference path
    f = np.concatenate([np.repeat(t.keys, t.bucket_sizes())
                        for t in tables])
    tg = np.concatenate([t.loc_tgt for t in tables])
    w = np.concatenate([t.loc_win for t in tables])
    order = np.lexsort((w, tg, f))
    f, tg, w = f[order], tg[order], w[order]
    keys, counts = np.unique(f, return_counts=True)
    offsets = np.zeros(len(keys) + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    np.testing.assert_array_equal(got.keys, keys.astype(np.uint32))
    np.testing.assert_array_equal(got.offsets, offsets)
    np.testing.assert_array_equal(got.loc_tgt, tg)
    np.testing.assert_array_equal(got.loc_win, w)
