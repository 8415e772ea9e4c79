"""Unit tests for ops.lookup: lookup_matches vs a numpy oracle.

Oracle semantics = sketch_database::accumulate_matches
(src/sketch_database.h:804-833) + per-read merge sort
(src/querying.h:88-106): concatenate the location lists of every query
feature (multiplicity preserved), sort by (target, window).
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from metacache_tpu.config import FEATURE_SENTINEL, TARGET_SENTINEL
from metacache_tpu.ops import lookup


def make_table(rng, num_keys=97, max_run=6, tmax=50, wmax=400):
    keys = np.unique(rng.integers(0, 2**32 - 2, num_keys, dtype=np.uint64)
                     .astype(np.uint32))
    sizes = rng.integers(0, max_run + 1, len(keys))
    offsets = np.zeros(len(keys) + 1, np.int64)
    np.cumsum(sizes, out=offsets[1:])
    L = int(offsets[-1])
    tgt = rng.integers(0, tmax, L).astype(np.int32)
    win = rng.integers(0, wmax, L).astype(np.int32)
    # per-feature location lists need no internal order; keep as drawn
    return keys, offsets.astype(np.int32), tgt, win


def oracle(features_row, keys, offsets, tgt, win, lmax):
    out = []
    for f in features_row:
        if f == FEATURE_SENTINEL:
            continue
        i = np.searchsorted(keys, f)
        if i < len(keys) and keys[i] == f:
            for j in range(offsets[i], offsets[i + 1]):
                out.append((int(tgt[j]), int(win[j])))
    total = len(out)
    out = out[:lmax]  # deterministic truncation: trailing features dropped
    out.sort()
    return out, total


@pytest.mark.parametrize("use_packed", [False, True])
def test_lookup_matches_oracle(use_packed):
    rng = np.random.default_rng(7)
    keys, offsets, tgt, win = make_table(rng)
    B, NF, LMAX = 17, 9, 24
    # mix of present keys, absent keys, sentinels
    feats = np.full((B, NF), FEATURE_SENTINEL, np.uint32)
    for b in range(B):
        n = rng.integers(0, NF + 1)
        pick = rng.integers(0, len(keys), n)
        feats[b, :n] = keys[pick]
        # corrupt some to absent values
        for j in range(n):
            if rng.random() < 0.3:
                feats[b, j] = np.uint32(int(feats[b, j]) ^ 1)

    if use_packed:
        wbits = max(1, int(win.max()).bit_length())
        packed = jnp.asarray(((tgt.astype(np.int64) << wbits)
                              | win).astype(np.int32))
    else:
        packed, wbits = None, 0

    dtgt, dwin, total, overflow = lookup.lookup_matches(
        jnp.asarray(feats), jnp.asarray(keys), jnp.asarray(offsets),
        jnp.asarray(tgt), jnp.asarray(win), LMAX,
        loc_packed=packed, win_bits=wbits)
    dtgt, dwin = np.asarray(dtgt), np.asarray(dwin)
    total, overflow = np.asarray(total), np.asarray(overflow)

    for b in range(B):
        want, want_total = oracle(feats[b], keys, offsets, tgt, win, LMAX)
        got = [(int(dtgt[b, i]), int(dwin[b, i])) for i in range(LMAX)
               if dtgt[b, i] != TARGET_SENTINEL]
        assert got == want, f"row {b}"
        assert int(total[b]) == min(want_total, LMAX)
        assert int(overflow[b]) == max(0, want_total - LMAX)


def test_lookup_radix_index_path():
    rng = np.random.default_rng(11)
    keys, offsets, tgt, win = make_table(rng, num_keys=500)
    bo, steps = lookup.build_radix_index(keys)
    B, NF, LMAX = 8, 6, 32
    feats = keys[rng.integers(0, len(keys), (B, NF))].astype(np.uint32)
    a = lookup.lookup_matches(jnp.asarray(feats), jnp.asarray(keys),
                              jnp.asarray(offsets), jnp.asarray(tgt),
                              jnp.asarray(win), LMAX)
    b = lookup.lookup_matches(jnp.asarray(feats), jnp.asarray(keys),
                              jnp.asarray(offsets), jnp.asarray(tgt),
                              jnp.asarray(win), LMAX,
                              bucket_offsets=jnp.asarray(bo),
                              search_steps=steps)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_packed_locations_roundtrip():
    from metacache_tpu.db.feature_table import FeatureTable
    rng = np.random.default_rng(3)
    keys, offsets, tgt, win = make_table(rng)
    ft = FeatureTable(keys=keys, offsets=offsets.astype(np.int64),
                      loc_tgt=tgt, loc_win=win)
    packed, wbits = ft.packed_locations()
    assert packed is not None and wbits >= 1
    np.testing.assert_array_equal(packed >> wbits, tgt)
    np.testing.assert_array_equal(packed & ((1 << wbits) - 1), win)


def test_packed_locations_overflow_declined():
    from metacache_tpu.db.feature_table import FeatureTable
    keys = np.array([5], np.uint32)
    offsets = np.array([0, 1], np.int64)
    ft = FeatureTable(keys=keys, offsets=offsets,
                      loc_tgt=np.array([2**20], np.int32),
                      loc_win=np.array([2**20], np.int32))
    packed, wbits = ft.packed_locations()
    assert packed is None and wbits == 0
