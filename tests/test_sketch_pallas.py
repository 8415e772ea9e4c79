"""Pallas fused sketch kernel (ops/sketch_pallas.py) parity vs the XLA
path (ops/sketch.py) — both implement single_function_unique_min_hasher
(reference src/hash_dna.h:50-182). Runs in interpreter mode on CPU."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from metacache_tpu.ops import encode, sketch
from metacache_tpu.ops.sketch_pallas import sketch_packed_pallas
from metacache_tpu.query.engine import encode_read_into, \
    _window_starts_static


def xla_reference(p, a, lens, starts, B, k=16, s=16, W=128):
    codes = encode.unpack_codes(jnp.asarray(p), jnp.asarray(a))
    feats = []
    for s0 in starts:
        w = codes[:, s0:s0 + W]
        if w.shape[1] < W:
            w = jnp.concatenate(
                [w, jnp.full((B, W - w.shape[1]), 255, jnp.uint8)], axis=1)
        wlen = jnp.clip(jnp.asarray(lens) - s0, 0, W)
        feats.append(sketch.sketch_windows(w, wlen, k, s))
    return np.asarray(jnp.concatenate(feats, axis=1))


def make_batch(rng, B, L, minlen=10, alphabet="ACGTN"):
    bases = np.array(list(alphabet))
    c = np.zeros((B, L), np.uint8)
    lens = np.zeros(B, np.int32)
    for i in range(B):
        n = int(rng.integers(minlen, L + 1))
        encode_read_into(c, lens, i, "".join(bases[rng.integers(
            0, len(bases), n)]), L)
    p, a = encode.np_pack_codes(c)
    return p, a, lens


@pytest.mark.parametrize("L", [128, 256])
def test_parity_vs_xla(L):
    rng = np.random.default_rng(L)
    B = 16
    p, a, lens = make_batch(rng, B, L)
    starts = tuple(_window_starts_static(L, 128, 113))
    out = np.asarray(sketch_packed_pallas(
        jnp.asarray(p), jnp.asarray(a), jnp.asarray(lens),
        k=16, sketch_size=16, window_size=128, starts=starts, tile=8,
        interpret=True))
    ref = xla_reference(p, a, lens, starts, B)
    assert np.array_equal(out, ref)


def test_short_and_empty_reads():
    rng = np.random.default_rng(7)
    B, L = 8, 128
    p, a, lens = make_batch(rng, B, L, minlen=0)
    lens[0] = 0                      # empty read
    lens[1] = 10                     # shorter than k
    p[0] = 0; a[0] = 255
    starts = (0,)
    out = np.asarray(sketch_packed_pallas(
        jnp.asarray(p), jnp.asarray(a), jnp.asarray(lens),
        k=16, sketch_size=16, window_size=128, starts=starts, tile=8,
        interpret=True))
    assert (out[0] == 0xFFFFFFFF).all()
    assert (out[1] == 0xFFFFFFFF).all()


def test_all_ambiguous():
    B, L = 8, 128
    c = np.full((B, L), 255, np.uint8)
    p, a = encode.np_pack_codes(c)
    lens = np.full(B, L, np.int32)
    out = np.asarray(sketch_packed_pallas(
        jnp.asarray(p), jnp.asarray(a), jnp.asarray(lens),
        k=16, sketch_size=16, window_size=128, starts=(0,), tile=8,
        interpret=True))
    assert (out == 0xFFFFFFFF).all()
