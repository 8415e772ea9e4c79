"""Device-side database lookup: query features -> sorted per-read match lists.

Reference behavior being reproduced (sketch_database::accumulate_matches,
src/sketch_database.h:804-833 + the per-read merge_sort at
src/querying.h:88-106): for every query-window feature, append ALL stored
locations of that feature; the concatenation, sorted by (target, window),
is the per-read match list. A feature sketched in two query windows
contributes its locations twice (multiplicity matters for hit counts).

TPU-native formulation: the hash-map probe becomes a batched binary search
(`searchsorted`) over the sorted key array; the location append becomes a
fixed-width slot gather driven by a per-read exclusive cumsum of run
lengths; the merge sort becomes one stable two-key `lax.sort` per read row.
All shapes are static: [B, NF] features in, [B, LMAX] match slots out.

Reads whose total match count exceeds LMAX are truncated deterministically
(trailing features' locations dropped); the overflow count is returned so
callers can report it. The reference has no such cap (unbounded vectors) —
this is the documented fixed-shape divergence knob (SURVEY.md §7 "hard
parts"); LMAX must simply be sized for the workload.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..config import FEATURE_SENTINEL, TARGET_SENTINEL

SENTINEL_U32 = jnp.uint32(FEATURE_SENTINEL)


def global_lower_bound(keys, queries):
    """Lower bound of each query in a sorted 1-D key array.

    Unrolled binary search keeping queries in their natural 2-D tiled
    layout — jnp.searchsorted flattens to 1-D, which on TPU forces
    expensive relayout copies between linear and (8,128)-tiled layouts
    around every step.
    keys: [F] sorted uint32; queries: [B, Q] uint32. Returns [B, Q] int32.
    """
    F = keys.shape[0]
    steps = max(1, F.bit_length())
    lo = jnp.zeros(queries.shape, dtype=jnp.int32)
    hi = jnp.full(queries.shape, F, dtype=jnp.int32)
    for _ in range(steps):
        mid = (lo + hi) >> 1
        mv = keys[jnp.minimum(mid, F - 1)]
        less = mv < queries
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
    return lo


def row_upper_bound(values, queries):
    """Per-row upper bound: for each row b and query q, the count of
    values[b, :] that are <= q (i.e. searchsorted side='right').

    Manual unrolled binary search over take_along_axis steps — a vmapped
    jnp.searchsorted lowers to a serialized per-row while-loop on TPU
    (~1000x slower).
    values: [B, N] sorted rows; queries: [B, Q]. Returns [B, Q] int32.
    """
    B, N = values.shape
    steps = max(1, N.bit_length())
    lo = jnp.zeros(queries.shape, dtype=jnp.int32)
    hi = jnp.full(queries.shape, N, dtype=jnp.int32)
    for _ in range(steps):
        mid = (lo + hi) >> 1
        mv = jnp.take_along_axis(values, jnp.minimum(mid, N - 1), axis=1)
        le = mv <= queries
        lo = jnp.where(le, mid + 1, lo)
        hi = jnp.where(le, hi, mid)
    return lo


def lookup_matches(features, keys, offsets, loc_tgt, loc_win, lmax: int):
    """Gather + sort the match lists for a batch of reads.

    Args:
      features: [B, NF] uint32 query features (FEATURE_SENTINEL = none).
                NF = windows_per_read * sketch_size (* 2 for pairs).
      keys:     [F] uint32 sorted feature keys (padded with sentinel)
      offsets:  [F+1] int32/int64 CSR offsets
      loc_tgt:  [L] int32
      loc_win:  [L] int32
      lmax:     static per-read match-list capacity

    Returns:
      (tgt, win, total, overflow):
        tgt, win: [B, LMAX] int32 sorted by (tgt, win) ascending, padded
                  with TARGET_SENTINEL rows
        total:    [B] int32 number of valid matches (pre-truncation count
                  clamped to LMAX)
        overflow: [B] int32 number of dropped locations per read
    """
    B, NF = features.shape
    F = keys.shape[0]

    idx = global_lower_bound(keys, features)
    idx = jnp.minimum(idx, F - 1)
    found = (keys[idx] == features) & (features != SENTINEL_U32)

    start = offsets[idx].astype(jnp.int32)
    cnt = (offsets[idx + 1] - offsets[idx]).astype(jnp.int32)
    cnt = jnp.where(found, cnt, 0)

    # exclusive cumsum of counts = output slot of each feature's first location
    cum = jnp.cumsum(cnt, axis=1)
    total_all = cum[:, -1]
    cum_ex = cum - cnt

    # slot j of read b belongs to feature fi = #{features whose run ends <= j}
    # and reads location start[fi] + (j - cum_ex[fi]).
    # Gather-free: fi and the per-slot start/cum_ex values are computed by a
    # fused compare/select-reduce over the (small) NF axis — random access
    # into per-row arrays is the slowest construct on TPU, while
    # broadcast-compare-reduce is pure VPU work.
    slots = jnp.arange(lmax, dtype=jnp.int32)
    run_covers = (cum_ex[:, None, :] <= slots[None, :, None]) & \
        (slots[None, :, None] < cum[:, None, :])          # [B, lmax, NF]
    # exactly one run covers each valid slot => a masked sum selects it
    # (start - cum_ex may be negative, so sum, not max)
    li = jnp.sum(jnp.where(run_covers,
                           start[:, None, :] - cum_ex[:, None, :], 0),
                 axis=2) + slots[None, :]
    valid = slots[None, :] < jnp.minimum(total_all, lmax)[:, None]
    li = jnp.where(valid, li, 0)

    tgt = jnp.where(valid, loc_tgt[li], TARGET_SENTINEL)
    win = jnp.where(valid, loc_win[li], jnp.int32(2**31 - 1))

    # stable lexicographic sort by (tgt, win) per read
    tgt, win = jax.lax.sort((tgt, win), dimension=1, num_keys=2,
                            is_stable=True)

    total = jnp.minimum(total_all, lmax)
    overflow = jnp.maximum(total_all - lmax, 0)
    return tgt, win, total, overflow
