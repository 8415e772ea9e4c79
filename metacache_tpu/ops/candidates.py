"""Candidate generation: sorted per-read match lists -> top-k classification
candidates with contiguous-window-range hit counts.

Reference semantics reproduced (src/candidates.h:118-285):

  for_all_contiguous_window_ranges — slide over the (target, window)-sorted
  match list; for every right endpoint j the window range is the maximal
  suffix i..j of the same target with win_j - win_i < numWindows; a target's
  candidate is its *first* range achieving the maximal hit count (strict
  `hits > curBest.hits` update).

  best_distinct_matches_in_contiguous_window_ranges::insert — map each
  candidate taxon to its ancestor at `mergeBelow` (the query's lowest rank)
  if one exists; candidates with the same (merged) taxon keep the max hit
  count (strict update => first achiever wins ties); the final list is
  sorted by hits descending, ties in consume order (= ascending target id),
  truncated to maxCandidates.

TPU-native formulation: the sliding window becomes a per-element batched
binary search (hits_j = j - lowerbound(tgt_j, win_j - numWindows + 1) + 1),
the per-target max becomes a segment-max, dedup-by-taxon becomes one
three-key lexicographic sort, and the final selection one top_k — all
static shapes [B, L].
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import TARGET_SENTINEL

_BIG = jnp.int32(2**31 - 1)


def _lower_bound_pairs(tgt, win, q_tgt, q_win):
    """Per-row lower bound over lexicographically sorted (tgt, win) pairs.

    tgt, win: [B, L] sorted rows; q_tgt, q_win: [B, L] queries.
    Returns [B, L] int32 insertion points. Manual binary search to stay in
    int32 (no packing into 64-bit keys needed on TPU).
    """
    B, L = tgt.shape
    steps = max(1, L.bit_length())  # interval size L needs ceil(log2(L))+1 halvings
    lo = jnp.zeros_like(q_tgt)
    hi = jnp.full_like(q_tgt, L)
    for _ in range(steps):
        mid = (lo + hi) >> 1
        mt = jnp.take_along_axis(tgt, mid, axis=1)
        mw = jnp.take_along_axis(win, mid, axis=1)
        less = (mt < q_tgt) | ((mt == q_tgt) & (mw < q_win))
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
    return lo


@functools.partial(jax.jit, static_argnames=("max_candidates",))
def generate_candidates(tgt, win, num_windows, target_cand_tax,
                        max_candidates: int):
    """Top-k candidates per read.

    Args:
      tgt, win: [B, L] int32 match lists sorted by (tgt, win); padding rows
                carry tgt == TARGET_SENTINEL.
      num_windows: [B] int32 per-read maxWindowsInRange
                   (2 + max(len1+len2, insertSizeMax)//stride,
                   src/classification.cpp:217-219)
      target_cand_tax: [T+1] int32 map target id -> candidate taxon node
                   (ancestor at the query's lowest rank if it exists, else
                   the target's own sequence-level taxon node). The last
                   entry is a scratch slot for the sentinel target.
      max_candidates: static top-k size.

    Returns dict of [B, C] arrays: tax, hits, beg, end, tgt
      (tax==0 marks an empty candidate slot).
    """
    B, L = tgt.shape
    T1 = target_cand_tax.shape[0]
    valid = tgt != TARGET_SENTINEL
    pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None, :], (B, L))

    # ---- per-element contiguous-range hit count --------------------------
    q_win = win - num_windows[:, None] + 1
    left = _lower_bound_pairs(tgt, win, tgt, q_win)
    hits = jnp.where(valid, pos - left + 1, 0).astype(jnp.int32)
    beg = jnp.take_along_axis(win, jnp.minimum(left, L - 1), axis=1)
    end = win

    # ---- per-target best (segment max, first achiever) -------------------
    new_seg = jnp.concatenate(
        [jnp.ones((B, 1), dtype=jnp.bool_), tgt[:, 1:] != tgt[:, :-1]], axis=1)
    seg_id = (jnp.cumsum(new_seg, axis=1) - 1).astype(jnp.int32)

    seg_max = jax.vmap(
        lambda s, h: jax.ops.segment_max(h, s, num_segments=L,
                                         indices_are_sorted=True))(seg_id, hits)
    seg_best = jnp.take_along_axis(seg_max, seg_id, axis=1)
    achiever = valid & (hits == seg_best)
    first_pos = jax.vmap(
        lambda s, p: jax.ops.segment_min(p, s, num_segments=L,
                                         indices_are_sorted=True))(
        seg_id, jnp.where(achiever, pos, _BIG))
    rep = achiever & (pos == jnp.take_along_axis(first_pos, seg_id, axis=1))

    # ---- map targets to candidate taxa (merge below lowest rank) ---------
    safe_tgt = jnp.where(valid, tgt, T1 - 1)
    key = jnp.where(rep, target_cand_tax[safe_tgt], _BIG)

    # ---- dedup by taxon: keep max hits, first achiever on ties -----------
    # sort by (key asc, hits desc, pos asc); winner = first of each key run
    s_key, s_neg_hits, s_pos, s_hits, s_beg, s_end, s_tgt = jax.lax.sort(
        (key, -hits, pos, hits, beg, end, tgt), dimension=1, num_keys=3,
        is_stable=False)
    first_of_key = jnp.concatenate(
        [jnp.ones((B, 1), dtype=jnp.bool_), s_key[:, 1:] != s_key[:, :-1]],
        axis=1)
    winner = first_of_key & (s_key != _BIG)

    # ---- final top-k by (hits desc, consume order asc) --------------------
    score = jnp.where(winner, s_hits * L + (L - 1 - s_pos), -1)
    _, top_idx = jax.lax.top_k(score, max_candidates)
    take = lambda a: jnp.take_along_axis(a, top_idx, axis=1)
    top_ok = take(score) >= 0
    return {
        "tax": jnp.where(top_ok, take(s_key), 0),
        "hits": jnp.where(top_ok, take(s_hits), 0),
        "beg": jnp.where(top_ok, take(s_beg), 0),
        "end": jnp.where(top_ok, take(s_end), 0),
        "tgt": jnp.where(top_ok, take(s_tgt), TARGET_SENTINEL),
    }


def merge_candidate_lists(cand_a, cand_b, max_candidates: int):
    """Merge two candidate dicts (e.g. from different database shards).

    Reproduces the cross-rank re-insertion of querying.h:958-971: same-taxon
    candidates keep the max hit count; the merged list is re-sorted by hits
    (descending) and truncated. Associative & commutative => shard-count
    invariant. Works on [B, C] dicts; returns [B, C] dict.
    """
    tax = jnp.concatenate([cand_a["tax"], cand_b["tax"]], axis=1)
    hits = jnp.concatenate([cand_a["hits"], cand_b["hits"]], axis=1)
    beg = jnp.concatenate([cand_a["beg"], cand_b["beg"]], axis=1)
    end = jnp.concatenate([cand_a["end"], cand_b["end"]], axis=1)
    tgt = jnp.concatenate([cand_a["tgt"], cand_b["tgt"]], axis=1)
    return _dedup_topk(tax, hits, beg, end, tgt, max_candidates)


def _dedup_topk(tax, hits, beg, end, tgt, max_candidates: int):
    """Dedup by taxon then order by (hits desc, winning target id asc).

    The target-id tie key is global, so merging per-shard lists commutes
    with single-shard candidate generation (the reference's tree merge is
    tie-UNstable across shard counts — std::upper_bound insertion at
    querying.h:958-971; we define the deterministic order instead).
    """
    B, L = tax.shape
    key = jnp.where(tax > 0, tax, _BIG)
    # dedup winner per taxon: max hits, smallest target id on ties
    s_key, s_neg, s_tgt, s_hits, s_beg, s_end = jax.lax.sort(
        (key, -hits, tgt, hits, beg, end), dimension=1, num_keys=3,
        is_stable=False)
    first = jnp.concatenate(
        [jnp.ones((B, 1), dtype=jnp.bool_), s_key[:, 1:] != s_key[:, :-1]],
        axis=1)
    winner = first & (s_key != _BIG)
    o_neg = jnp.where(winner, -s_hits, _BIG)
    o_tgt = jnp.where(winner, s_tgt, _BIG)
    f_neg, f_tgt, f_key, f_hits, f_beg, f_end = jax.lax.sort(
        (o_neg, o_tgt, s_key, s_hits, s_beg, s_end), dimension=1, num_keys=2,
        is_stable=False)
    ok = f_neg[:, :max_candidates] != _BIG
    cut = lambda a: jnp.where(ok, a[:, :max_candidates], 0)
    return {
        "tax": cut(f_key),
        "hits": cut(f_hits),
        "beg": cut(f_beg),
        "end": cut(f_end),
        "tgt": jnp.where(ok, f_tgt[:, :max_candidates], TARGET_SENTINEL),
    }
