"""Exactness of the one-hot-matmul table lookups for LARGE values.

The 13-bit value split in ops/candidates._onehot_map and
ops/classify_op._lineage_rows is only exact if the dot runs in full f32:
the TPU's default precision lowers f32 dots to single-pass bf16, which
rounds values above 2^8 (ADVICE r4, fixed with Precision.HIGHEST). These
tests use table entries spanning the full permitted range (< 2^26) so a
precision regression fails loudly — including under the
METACACHE_TPU_PARITY=1 real-accelerator rerun (tests/README.md).
"""
import numpy as np
import jax.numpy as jnp

from metacache_tpu.ops.candidates import _onehot_map
from metacache_tpu.ops.classify_op import _lineage_rows

RNG = np.random.default_rng(77)


def test_onehot_map_exact_large_values():
    T = 512
    values = RNG.integers(0, 1 << 26, size=T, dtype=np.int64).astype(np.int32)
    # make sure the dangerous range is represented
    values[0] = (1 << 26) - 1
    values[1] = (1 << 13) + 1
    values[2] = 257  # first value bf16 would round
    idx = RNG.integers(0, T, size=(8, 32)).astype(np.int32)
    got = np.asarray(_onehot_map(jnp.asarray(values), jnp.asarray(idx)))
    np.testing.assert_array_equal(got, values[idx])


def test_lineage_rows_exact_large_values():
    N, R = 300, 22
    lineage = RNG.integers(0, 1 << 26, size=(N, R),
                           dtype=np.int64).astype(np.int32)
    lineage[0] = 0
    lineage[5, 3] = (1 << 26) - 1
    tax = RNG.integers(0, N, size=64).astype(np.int32)
    got = np.asarray(_lineage_rows(jnp.asarray(lineage), jnp.asarray(tax)))
    np.testing.assert_array_equal(got, lineage[tax])
