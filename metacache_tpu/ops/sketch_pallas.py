"""Pallas TPU kernel: fused read -> MinHash sketch.

One VMEM pass per read tile fuses what the XLA path (ops/sketch.py)
materializes as separate staged intermediates: rolling canonical k-mer
build, ambiguity masking, Thomas-Mueller hashing, and the s-round
unique-min extraction (single_function_unique_min_hasher, reference
src/hash_dna.h:50-182; k-mer iteration src/dna_encoding.h:305-348).

Mosaic (TPU) has no lane interleave/strided slice, so the kernel never
unpacks to per-character arrays. K-mers are assembled **in packed 2-bit
space**: 32-bit words spanning 16 chars are formed from 4 byte columns
with lane rolls; a k-mer starting at char 4q+r is the 2-bit-groupwise
reversal of `(W[q] >> 2r) | (next_byte << (32-2r))`. The MinHash is
order-independent (s smallest unique values), so k-mers are processed in
phase-major order (r = p mod 4) without ever materializing position-major
layout. Ambiguity uses the same construction over a 2-bit ambiguity plane
(prepared from the 1-bit wire plane by a tiny XLA prologue).

Everything is elementwise VPU work over [TB, 128]-aligned tiles plus
lane-axis min-reductions; no gathers, no sorts, no lane shuffles.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import FEATURE_SENTINEL

SENT = np.uint32(FEATURE_SENTINEL)


def _tm_hash(x):
    """Thomas-Mueller 32-bit hash (src/hash_int.h:39-45), u32 in/out."""
    c = jnp.uint32(0x45D9F3B)
    x = ((x >> 16) ^ x) * c
    x = ((x >> 16) ^ x) * c
    x = (x >> 16) ^ x
    return x


def _group_reverse(x):
    """Reverse the sixteen 2-bit groups of a u32 (packed c0..c15 ->
    k-mer order c0<<30 | c1<<28 | ... | c15)."""
    x = ((x >> 2) & jnp.uint32(0x33333333)) | ((x & jnp.uint32(0x33333333)) << 2)
    x = ((x >> 4) & jnp.uint32(0x0F0F0F0F)) | ((x & jnp.uint32(0x0F0F0F0F)) << 4)
    x = ((x >> 8) & jnp.uint32(0x00FF00FF)) | ((x & jnp.uint32(0x00FF00FF)) << 8)
    return (x >> 16) | (x << 16)


def _revcomp_u32(kmer, k: int):
    """Bit-twiddled reverse complement (src/dna_encoding.h:113-121)."""
    s = _group_reverse(kmer)
    s = jnp.uint32(0xFFFFFFFF) - s
    shift = 32 - (k << 1)
    if shift:
        s = s >> shift
    return s


def _shift_lanes(b, s: int):
    """Logical left shift along the lane axis with zero fill (out[:, i] =
    b[:, i+s]). NOT pltpu.roll: roll rotates over the PHYSICAL padded
    128-lane register, so logical sizes < 128 pull in padding lanes."""
    TB, n = b.shape
    return jnp.concatenate([b[:, s:], jnp.zeros((TB, s), b.dtype)], axis=1)


def _words_from_bytes(b):
    """[TB, N] u32 byte values -> [TB, N] little-endian 4-byte windows:
    out[:, i] = b[i] | b[i+1]<<8 | b[i+2]<<16 | b[i+3]<<24 (zero-filled at
    the tail — callers mask positions that would read past the end)."""
    return (b | (_shift_lanes(b, 1) << 8) | (_shift_lanes(b, 2) << 16)
            | (_shift_lanes(b, 3) << 24))


def _make_kernel(k: int, sketch_size: int, window_size: int,
                 starts: Tuple[int, ...], L: int):
    """Kernel over one read tile: packed codes + 2-bit ambiguity plane +
    lens -> features. Requires k == 16 (u32 k-mers spanning 4 bytes, the
    reference's default and maximum for 32-bit k-mers)."""
    if k != 16:
        raise NotImplementedError("pallas sketch kernel requires k == 16")
    P4 = L // 4
    n_win = len(starts)

    def kernel(packed_ref, amb2_ref, lens_ref, out_ref):
        packed = packed_ref[:].astype(jnp.uint32)      # [TB, P4]
        amb2 = amb2_ref[:].astype(jnp.uint32)          # [TB, P4]
        lens = lens_ref[:]                             # [TB, 1] int32
        TB = packed.shape[0]

        W = _words_from_bytes(packed)                  # chars 4q..4q+15
        A = _words_from_bytes(amb2)                    # flags, bit 2i
        nxtW = _shift_lanes(packed, 4)                 # byte q+4
        nxtA = _shift_lanes(amb2, 4)

        # k-mer start positions p = 4q + r, phase-major; [TB, P4] per phase
        q4 = jax.lax.broadcasted_iota(jnp.int32, (TB, P4), 1) * 4
        hs = []
        for r in range(4):
            if r == 0:
                t, a = W, A
            else:
                t = (W >> (2 * r)) | (nxtW << (32 - 2 * r))
                a = (A >> (2 * r)) | (nxtA << (32 - 2 * r))
            kmer = _group_reverse(t)
            bad = (a & jnp.uint32(0x55555555)) != 0
            p = q4 + r
            # unsigned elementwise min (arith.minui) is not legalizable on
            # Mosaic either: take the min in sign-bit-flipped int32 space
            bias = lambda u: jax.lax.bitcast_convert_type(
                u ^ jnp.uint32(0x80000000), jnp.int32)
            cb = jnp.minimum(bias(kmer), bias(_revcomp_u32(kmer, k)))
            canon = jax.lax.bitcast_convert_type(cb, jnp.uint32) \
                ^ jnp.uint32(0x80000000)
            h = jnp.where(bad, jnp.uint32(SENT), _tm_hash(canon))
            hs.append((p, h))

        for wi, s in enumerate(starts):
            wlen = jnp.clip(lens - s, 0, window_size)   # [TB, 1]
            # Mosaic has no unsigned reductions: bias into int32 with the
            # order-preserving sign-bit flip; sentinel -> int32 max.
            hb = []
            for p, h in hs:
                valid = (p >= s) & (p + k - s <= wlen)
                hv = jnp.where(valid, h, jnp.uint32(SENT))
                hb.append(jax.lax.bitcast_convert_type(
                    hv ^ jnp.uint32(0x80000000), jnp.int32))
            hcat = jnp.concatenate(hb, axis=1)          # [TB, 4*P4]
            # s rounds of (row min, retire all copies) = the s smallest
            # unique values, ascending (see ops/sketch.py equivalence note)
            outs = []
            for _ in range(sketch_size):
                m = jnp.min(hcat, axis=1, keepdims=True)
                outs.append(jax.lax.bitcast_convert_type(m, jnp.uint32)
                            ^ jnp.uint32(0x80000000))
                hcat = jnp.where(hcat == m, jnp.int32(2**31 - 1), hcat)
            out_ref[:, wi * sketch_size:(wi + 1) * sketch_size] = \
                jnp.concatenate(outs, axis=1)

    return kernel, n_win


def _ambig_2bit_plane(ambig, L: int):
    """XLA prologue: 1-bit ambiguity plane [B, L/8] -> 2-bit plane
    [B, L/4] u8 (char i's flag at bit 2*(i&3) of byte i>>2)."""
    B = ambig.shape[0]
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = ((ambig[:, :, None] >> shifts[None, None, :]) & 1)
    bits = bits.reshape(B, L // 4, 4)
    w = jnp.array([1, 4, 16, 64], jnp.uint8)
    return jnp.sum(bits * w[None, None, :], axis=2,
                   dtype=jnp.uint8)


@functools.partial(jax.jit, static_argnames=("k", "sketch_size",
                                             "window_size", "starts",
                                             "tile", "interpret"))
def sketch_packed_pallas(packed, ambig, lens, *, k: int, sketch_size: int,
                         window_size: int, starts: Tuple[int, ...],
                         tile: int = 256, interpret: bool = False):
    """Fused sketch of 2-bit packed reads.

    Args:
      packed: [B, L/4] uint8 (np_pack_codes layout)
      ambig:  [B, L/8] uint8 ambiguity bitplane
      lens:   [B] int32
      starts: static window start offsets (engine._window_starts_static)

    Returns [B, len(starts)*sketch_size] uint32 features, each window's
    block ascending with 0xFFFFFFFF padding — identical to concatenating
    ops.sketch.sketch_windows over the same windows (bit-parity tests in
    tests/test_sketch_pallas.py).
    """
    B, P4 = packed.shape
    L = P4 * 4
    if B % tile:
        raise ValueError(f"batch {B} not a multiple of tile {tile}")
    kernel, n_win = _make_kernel(k, sketch_size, window_size, starts, L)
    amb2 = _ambig_2bit_plane(ambig, L)
    lens2 = lens.reshape(B, 1).astype(jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(B // tile,),
        in_specs=[
            pl.BlockSpec((tile, P4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, P4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, n_win * sketch_size),
                               lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_win * sketch_size),
                                       jnp.uint32),
        interpret=interpret,
    )(packed, amb2, lens2)
