"""Pallas TPU kernel: fused read -> MinHash sketch.

One VMEM pass per read tile fuses what the XLA path (ops/sketch.py)
materializes as separate fusions with staged intermediates: 2-bit unpack,
rolling canonical k-mer build, ambiguity masking, Thomas-Mueller hashing,
and the s-round unique-min extraction (single_function_unique_min_hasher,
reference src/hash_dna.h:50-182; k-mer iteration src/dna_encoding.h:305-348).

Layout: reads arrive 2-bit packed ([B, L/4] u8 + ambiguity bitplane
[B, L/8] u8, see ops/encode.np_pack_codes); the kernel processes a tile of
TB reads at a time and emits, for each of the (static) window starts, the
`s` ascending unique hash values (0xFFFFFFFF padded) — identical output to
ops.sketch.sketch_windows stacked over windows.

Everything is elementwise VPU work over [TB, 128]-aligned tiles plus
lane-axis min-reductions; no gathers, no sorts.
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


def _revcomp_u32(kmer, k: int):
    """Bit-twiddled reverse complement (src/dna_encoding.h:113-121)."""
    s = kmer
    s = ((s >> 2) & jnp.uint32(0x33333333)) | ((s & jnp.uint32(0x33333333)) << 2)
    s = ((s >> 4) & jnp.uint32(0x0F0F0F0F)) | ((s & jnp.uint32(0x0F0F0F0F)) << 4)
    s = ((s >> 8) & jnp.uint32(0x00FF00FF)) | ((s & jnp.uint32(0x00FF00FF)) << 8)
    s = ((s >> 16) & jnp.uint32(0x0000FFFF)) | ((s & jnp.uint32(0x0000FFFF)) << 16)
    s = jnp.uint32(0xFFFFFFFF) - s
    shift = 32 - (k << 1)
    if shift:
        s = s >> shift
    return s


def _make_kernel(k: int, sketch_size: int, window_size: int,
                 starts: Tuple[int, ...], L: int):
    """Kernel over one read tile: packed/ambig/lens -> features."""
    n_win = len(starts)
    NK = window_size - k + 1  # kmer slots per (padded) window
    # characters needed beyond L so every window slice is in bounds
    Lp = max(L, max(starts) + window_size)

    def kernel(packed_ref, ambig_ref, lens_ref, out_ref):
        packed = packed_ref[:].astype(jnp.uint32)      # [TB, L/4]
        ambig_b = ambig_ref[:].astype(jnp.uint32)      # [TB, L/8]
        lens = lens_ref[:]                             # [TB, 1] int32
        TB = packed.shape[0]

        # unpack 2-bit codes and ambiguity flags to [TB, L]
        codes = jnp.stack(
            [(packed >> (2 * j)) & 3 for j in range(4)],
            axis=2).reshape(TB, L)
        amb = jnp.stack(
            [(ambig_b >> j) & 1 for j in range(8)],
            axis=2).reshape(TB, L)
        if Lp > L:
            codes = jnp.concatenate(
                [codes, jnp.zeros((TB, Lp - L), jnp.uint32)], axis=1)
            amb = jnp.concatenate(
                [amb, jnp.ones((TB, Lp - L), jnp.uint32)], axis=1)

        for wi, s in enumerate(starts):
            # rolling kmer over the window [s, s+window_size)
            kmer = jnp.zeros((TB, NK), jnp.uint32)
            bad = jnp.zeros((TB, NK), jnp.uint32)
            for j in range(k):
                kmer = (kmer << 2) | codes[:, s + j:s + j + NK]
                bad = bad | amb[:, s + j:s + j + NK]
            # validity: kmer must lie within this window's actual chars
            wlen = jnp.clip(lens - s, 0, window_size)       # [TB, 1]
            kpos = jax.lax.broadcasted_iota(jnp.int32, (TB, NK), 1)
            valid = (kpos + k <= wlen) & (bad == 0)
            canon = jnp.minimum(kmer, _revcomp_u32(kmer, k))
            h = jnp.where(valid, _tm_hash(canon), jnp.uint32(SENT))
            # s rounds of (row min, retire all copies) = the s smallest
            # unique values, ascending (see ops/sketch.py equivalence note)
            outs = []
            for _ in range(sketch_size):
                m = jnp.min(h, axis=1, keepdims=True)        # [TB, 1]
                outs.append(m)
                h = jnp.where(h == m, jnp.uint32(SENT), h)
            out_ref[:, wi * sketch_size:(wi + 1) * sketch_size] = \
                jnp.concatenate(outs, axis=1)

    return kernel, n_win


@functools.partial(jax.jit, static_argnames=("k", "sketch_size",
                                             "window_size", "starts",
                                             "tile", "interpret"))
def sketch_packed_pallas(packed, ambig, lens, *, k: int, sketch_size: int,
                         window_size: int, starts: Tuple[int, ...],
                         tile: int = 256, interpret: bool = False):
    """Fused sketch of 2-bit packed reads.

    Args:
      packed: [B, L/4] uint8 (np_pack_codes layout)
      ambig:  [B, L/8] uint8
      lens:   [B] int32
      starts: static window start offsets (engine._window_starts_static)

    Returns [B, len(starts)*sketch_size] uint32 features, each window's
    block ascending with 0xFFFFFFFF padding — identical to concatenating
    ops.sketch.sketch_windows over the same windows.
    """
    B, P4 = packed.shape
    L = P4 * 4
    if B % tile:
        raise ValueError(f"batch {B} not a multiple of tile {tile}")
    kernel, n_win = _make_kernel(k, sketch_size, window_size, starts, L)
    lens2 = lens.reshape(B, 1).astype(jnp.int32)
    return pl.pallas_call(
        kernel,
        grid=(B // tile,),
        in_specs=[
            pl.BlockSpec((tile, P4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, L // 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, n_win * sketch_size),
                               lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_win * sketch_size),
                                       jnp.uint32),
        interpret=interpret,
    )(packed, ambig, lens2)
