"""Integer hash family — vectorized JAX versions, bit-identical to the reference.

Reference: src/hash_int.h:39-205. These must match bit-for-bit because the
feature keys of a database are these hash values; classification parity
depends on them.

All functions operate elementwise on uint32 / uint64 arrays. uint32
multiplication in XLA wraps mod 2**32, matching C semantics.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def thomas_mueller_hash(x):
    """32-bit -> 32-bit hash (src/hash_int.h:39-45). The default kmer hash h1."""
    x = x.astype(jnp.uint32)
    c = jnp.uint32(0x45D9F3B)
    x = ((x >> 16) ^ x) * c
    x = ((x >> 16) ^ x) * c
    x = (x >> 16) ^ x
    return x


def nvidia_hash(x):
    """32-bit -> 32-bit hash (src/hash_int.h:57-66)."""
    x = x.astype(jnp.uint32)
    x = (x + jnp.uint32(0x7ED55D16)) + (x << 12)
    x = (x ^ jnp.uint32(0xC761C23C)) ^ (x >> 19)
    x = (x + jnp.uint32(0x165667B1)) + (x << 5)
    x = (x + jnp.uint32(0xD3A2646C)) ^ (x << 9)
    x = (x + jnp.uint32(0xFD7046C5)) + (x << 3)
    x = (x ^ jnp.uint32(0xB55A4F09)) ^ (x >> 16)
    return x


def murmur3_fmix32(x):
    """32-bit murmur3 finalizer (src/hash_int.h:88-96)."""
    x = x.astype(jnp.uint32)
    x ^= x >> 16
    x *= jnp.uint32(0x85EBCA6B)
    x ^= x >> 13
    x *= jnp.uint32(0xC2B2AE35)
    x ^= x >> 16
    return x


def murmur3_fmix64(x):
    """64-bit murmur3 finalizer (src/hash_int.h:78-86). Requires x64 enabled."""
    x = x.astype(jnp.uint64)
    x ^= x >> 33
    x *= jnp.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> 33
    x *= jnp.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> 33
    return x


def splitmix64_hash(x):
    """64-bit splitmix64 (src/hash_int.h:109-116)."""
    x = x.astype(jnp.uint64)
    x = (x ^ (x >> 30)) * jnp.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> 27)) * jnp.uint64(0x94D049BB133111EB)
    x = x ^ (x >> 31)
    return x


def halve_size_hash(x):
    """64-bit -> 32-bit down hash (src/hash_int.h:128-138)."""
    x = x.astype(jnp.uint64)
    x = (~x) + (x << 18)
    x = x ^ (x >> 31)
    x = x * jnp.uint64(21)
    x = x ^ (x >> 11)
    x = x + (x << 6)
    x = x ^ (x >> 22)
    return x.astype(jnp.uint32)


# --- numpy mirrors (host-side build path; identical math) -------------------

def np_thomas_mueller_hash(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint32)
    with np.errstate(over="ignore"):
        c = np.uint32(0x45D9F3B)
        x = ((x >> np.uint32(16)) ^ x) * c
        x = ((x >> np.uint32(16)) ^ x) * c
        x = (x >> np.uint32(16)) ^ x
    return x
