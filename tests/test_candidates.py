import numpy as np

from metacache_tpu.config import TARGET_SENTINEL
from metacache_tpu.ops import candidates as cand_ops
from tests.util_oracles import (oracle_contiguous_ranges,
                                oracle_insert_candidates)

RNG = np.random.default_rng(11)
L = 64  # match-list capacity for tests


def run_device(match_lists, num_windows, tgt_to_tax, num_targets, max_cand):
    """match_lists: list (per read) of sorted (tgt, win) tuples."""
    B = len(match_lists)
    tgt = np.full((B, L), TARGET_SENTINEL, dtype=np.int32)
    win = np.full((B, L), 2**31 - 1, dtype=np.int32)
    for b, ml in enumerate(match_lists):
        for j, (t, w) in enumerate(ml):
            tgt[b, j] = t
            win[b, j] = w
    tmap = np.zeros(num_targets + 1, dtype=np.int32)
    for t in range(num_targets):
        tmap[t] = tgt_to_tax[t][0]
    out = cand_ops.generate_candidates(
        tgt, win, np.asarray(num_windows, np.int32), tmap, max_cand)
    # the packed-operand path (win_bits > 0) must be result-identical to
    # the multi-operand formulation on every oracle case
    out_pk = cand_ops.generate_candidates(
        tgt, win, np.asarray(num_windows, np.int32), tmap, max_cand,
        win_bits=16)
    # ... and the one-hot-matmul taxon-map path
    out_oh = cand_ops.generate_candidates(
        tgt, win, np.asarray(num_windows, np.int32), tmap, max_cand,
        win_bits=16, tax_onehot=True)
    for kk in out:
        np.testing.assert_array_equal(np.asarray(out[kk]),
                                      np.asarray(out_pk[kk]),
                                      err_msg=f"packed path differs: {kk}")
        np.testing.assert_array_equal(np.asarray(out[kk]),
                                      np.asarray(out_oh[kk]),
                                      err_msg=f"onehot path differs: {kk}")
    # ... and the map_topk path (injective maps only: dedup by target id,
    # winners' taxa gathered after the top-k cut)
    if len(np.unique(tmap[:num_targets])) == num_targets:
        out_mt = cand_ops.generate_candidates(
            tgt, win, np.asarray(num_windows, np.int32), tmap, max_cand,
            win_bits=16, map_topk=True)
        for kk in out:
            np.testing.assert_array_equal(
                np.asarray(out[kk]), np.asarray(out_mt[kk]),
                err_msg=f"map_topk path differs: {kk}")
    # ... and the seg-encoded path (ci_shift > 0): pre-encode tgt as
    # (ci << tb) | raw the way the engine's seg encoding does
    # (query/engine.derive_seg_encoding), re-sort the match rows by encoded
    # key (the engine's per-read sort orders seg-encoded words), then
    # decode tax (= ci + 1 -> uniq[ci]) / tgt (low tb bits) and compare.
    # When ci is monotone in t the consume order is unchanged and the
    # comparison is STRICT on all fields; a non-monotone map legitimately
    # reorders equal-hits ties (consume order becomes (ci, tgt)), so there
    # the check widens max_cand past truncation and compares (tax, hits)
    # multisets per read.
    uniq = np.unique(tmap[:num_targets])
    tb = max(1, int(max(num_targets - 1, 1)).bit_length())
    ci_of_t = np.searchsorted(uniq, tmap[:num_targets]).astype(np.int32)
    monotone = bool(np.all(np.diff(ci_of_t) >= 0))
    vmask = tgt != TARGET_SENTINEL
    tgt_seg = tgt.copy()
    tgt_seg[vmask] = (ci_of_t[tgt[vmask]] << tb) | tgt[vmask]
    key64 = (tgt_seg.astype(np.int64) << 32) | win.astype(np.int64)
    order = np.argsort(key64, axis=1, kind="stable")
    tgt_seg = np.take_along_axis(tgt_seg, order, axis=1)
    win_seg = np.take_along_axis(win, order, axis=1)
    mc_seg = max_cand if monotone else len(uniq) + 1
    out_seg = cand_ops.generate_candidates(
        tgt_seg, win_seg, np.asarray(num_windows, np.int32), tmap, mc_seg,
        win_bits=16, ci_shift=tb)
    stax = np.asarray(out_seg["tax"])
    stgt = np.asarray(out_seg["tgt"])
    dec_tax = np.where(stax > 0, uniq[np.maximum(stax - 1, 0)], 0)
    dec_tgt = np.where(stgt != TARGET_SENTINEL,
                       stgt & ((1 << tb) - 1), TARGET_SENTINEL)
    if monotone:
        np.testing.assert_array_equal(dec_tax, np.asarray(out["tax"]),
                                      err_msg="seg path differs: tax")
        np.testing.assert_array_equal(dec_tgt, np.asarray(out["tgt"]),
                                      err_msg="seg path differs: tgt")
        for kk in ("hits", "beg", "end"):
            np.testing.assert_array_equal(np.asarray(out_seg[kk]),
                                          np.asarray(out[kk]),
                                          err_msg=f"seg path differs: {kk}")
    else:
        ref_full = cand_ops.generate_candidates(
            tgt, win, np.asarray(num_windows, np.int32), tmap, mc_seg)
        for b in range(tgt.shape[0]):
            got = sorted((int(dec_tax[b, i]), int(out_seg["hits"][b, i]))
                         for i in range(mc_seg) if stax[b, i] != 0)
            want = sorted((int(ref_full["tax"][b, i]),
                           int(ref_full["hits"][b, i]))
                          for i in range(mc_seg) if ref_full["tax"][b, i] != 0)
            assert got == want, (b, got, want)
    return {k: np.asarray(v) for k, v in out.items()}


def oracle(match_list, num_windows, tgt_to_tax, max_cand):
    per_tgt = oracle_contiguous_ranges(match_list, num_windows)
    return oracle_insert_candidates(per_tgt, tgt_to_tax, max_cand)


def random_matches(n, nt, nw):
    t = RNG.integers(0, nt, size=n)
    w = RNG.integers(0, nw, size=n)
    return sorted(zip(t.tolist(), w.tolist()))


class TestSequenceLevel:
    """lowest rank = sequence: tgt_to_tax maps each target to a distinct
    sequence-level taxon (is_sequence=True)."""

    def check(self, match_lists, num_windows, nt, max_cand=2):
        tgt_to_tax = {t: (t + 100, True) for t in range(nt)}
        got = run_device(match_lists, [num_windows] * len(match_lists),
                         tgt_to_tax, nt, max_cand)
        for b, ml in enumerate(match_lists):
            want = oracle(ml, num_windows, tgt_to_tax, max_cand)
            got_list = [
                {"tax": int(got["tax"][b, i]), "hits": int(got["hits"][b, i]),
                 "beg": int(got["beg"][b, i]), "end": int(got["end"][b, i])}
                for i in range(max_cand) if got["tax"][b, i] != 0]
            assert len(got_list) == len(want), (b, got_list, want)
            for g, w_ in zip(got_list, want):
                assert g["tax"] == w_["tax"], (b, got_list, want)
                assert g["hits"] == w_["hits"], (b, got_list, want)
                assert g["beg"] == w_["beg"], (b, got_list, want)
                assert g["end"] == w_["end"], (b, got_list, want)

    def test_single_target_contiguous(self):
        self.check([[(0, 0), (0, 1), (0, 2)]], 3, 1)

    def test_window_range_limit(self):
        # windows 0,1,5: range of 3 windows can hold {0,1} or {5}
        self.check([[(0, 0), (0, 1), (0, 5)]], 3, 1)

    def test_two_targets(self):
        self.check([[(0, 0), (0, 1), (1, 0), (1, 1), (1, 2)]], 3, 2)

    def test_multiplicity(self):
        # duplicate (tgt, win) entries count separately (feature multiplicity)
        self.check([[(0, 4), (0, 4), (0, 4), (1, 0)]], 3, 2)

    def test_empty(self):
        self.check([[]], 3, 1)

    def test_ties_prefer_first_range(self):
        # two ranges of equal hits; reference keeps the first
        self.check([[(0, 0), (0, 10), (0, 11), (0, 20), (0, 21)]], 2, 1)

    def test_random_cases(self):
        for _ in range(25):
            nt = int(RNG.integers(1, 6))
            nw = int(RNG.integers(1, 30))
            numw = int(RNG.integers(1, 8))
            n = int(RNG.integers(0, L))
            batch = [random_matches(n, nt, nw) for _ in range(4)]
            self.check(batch, numw, nt, max_cand=int(RNG.integers(1, 5)))


class TestMergedLevel:
    """lowest rank above sequence: several targets share a merged taxon."""

    def check(self, match_lists, num_windows, tgt_to_tax, nt, max_cand=2):
        got = run_device(match_lists, [num_windows] * len(match_lists),
                         tgt_to_tax, nt, max_cand)
        for b, ml in enumerate(match_lists):
            want = oracle(ml, num_windows, tgt_to_tax, max_cand)
            got_pairs = [(int(got["tax"][b, i]), int(got["hits"][b, i]))
                         for i in range(max_cand) if got["tax"][b, i] != 0]
            want_pairs = [(w_["tax"], w_["hits"]) for w_ in want]
            # the reference's unstable std::sort on updates makes exact tie
            # order unspecified; compare as sorted multisets of (hits,tax)
            assert sorted(got_pairs) == sorted(want_pairs), (b, got_pairs,
                                                             want_pairs)

    def test_two_targets_one_species(self):
        tgt_to_tax = {0: (500, False), 1: (500, False), 2: (600, False)}
        self.check([[(0, 0), (0, 1), (1, 3), (1, 4), (1, 5), (2, 0)]],
                   3, tgt_to_tax, 3)

    def test_max_kept_on_merge(self):
        tgt_to_tax = {0: (500, False), 1: (500, False)}
        # target 0 best=2, target 1 best=3 -> merged candidate hits=3
        self.check([[(0, 0), (0, 1), (1, 7), (1, 8), (1, 9)]],
                   3, tgt_to_tax, 2)

    def test_random_merged(self):
        for _ in range(15):
            nt = int(RNG.integers(2, 8))
            species = {t: (400 + int(RNG.integers(0, 3)), False)
                       for t in range(nt)}
            n = int(RNG.integers(0, L))
            batch = [random_matches(n, nt, 20) for _ in range(3)]
            self.check(batch, int(RNG.integers(1, 6)), species, nt,
                       max_cand=int(RNG.integers(1, 5)))


def test_merge_candidate_lists_shard_invariance():
    """Splitting targets across shards then merging candidate lists must give
    the same result as a single shard (SURVEY.md §5 'key semantic')."""
    nt = 6
    tgt_to_tax = {t: (t + 100, True) for t in range(nt)}
    mls = [random_matches(40, nt, 20) for _ in range(8)]
    maxc = 3
    full = run_device(mls, [3] * 8, tgt_to_tax, nt, maxc)

    shard0 = [[m for m in ml if m[0] % 2 == 0] for ml in mls]
    shard1 = [[m for m in ml if m[0] % 2 == 1] for ml in mls]
    c0 = run_device(shard0, [3] * 8, tgt_to_tax, nt, maxc)
    c1 = run_device(shard1, [3] * 8, tgt_to_tax, nt, maxc)
    import jax.numpy as jnp
    merged = cand_ops.merge_candidate_lists(
        {k: jnp.asarray(v) for k, v in c0.items()},
        {k: jnp.asarray(v) for k, v in c1.items()}, maxc)
    for k in ("tax", "hits"):
        np.testing.assert_array_equal(np.asarray(merged[k]), full[k], err_msg=k)
