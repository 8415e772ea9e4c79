#!/usr/bin/env python
"""Round-4: bisect classify_lca's ~5 ms at [8192, 2] with a small lineage
table (every other stage of the seg-mode realistic program is now
<0.1 ms, tools/exp_r4_sizes.py)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from metacache_tpu.ops import classify_op

B, C, N, R = 8192, 2, 25, 22


def stat(name, fn, *args):
    jitted = jax.jit(fn)
    comp = jitted.lower(*args).compile()
    ma = comp.memory_analysis()
    r = comp(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(10):
        r = comp(*args)
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / 10 * 1e3
    print(f"{name:44s} {ma.generated_code_size_in_bytes/1e6:7.2f} MB"
          f"  {ms:7.2f} ms", flush=True)
    return r


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    tax = jnp.asarray(rng.integers(0, N, (B, C), dtype=np.int32))
    hits = jnp.asarray(rng.integers(0, 30, (B, C), dtype=np.int32))
    lineage = jnp.asarray(rng.integers(0, 1 << 20, (N, R), dtype=np.int32))
    hм = jnp.int32(4)
    hd = jnp.float32(1.0)

    stat("full classify_lca", lambda t, h, lin: classify_op.classify_lca(
        t, h, lin, hм, hd, 21), tax, hits, lineage)

    stat("_lineage_rows (one-hot dot) x2",
         lambda t, lin: (classify_op._lineage_rows(lin, t[:, 0]),
                         classify_op._lineage_rows(lin, t[:, 1])),
         tax, lineage)

    def tail(t, h, lin):
        lin0 = classify_op._lineage_rows(lin, t[:, 0])
        nonzero = lin0 != 0
        any_nz = nonzero.any(axis=1)
        first = jnp.argmax(nonzero, axis=1).astype(jnp.int32)
        best = jnp.take_along_axis(lin0, first[:, None], axis=1)[:, 0]
        return any_nz, first, best
    stat("tail: argmax + take_along_axis", tail, tax, hits, lineage)

    def tail2(t, h, lin):
        lin0 = classify_op._lineage_rows(lin, t[:, 0])
        nonzero = (lin0 != 0).astype(jnp.int32)
        any_nz = nonzero.any(axis=1)
        first = jnp.argmax(nonzero, axis=1).astype(jnp.int32)
        pick = (jnp.cumsum(nonzero, axis=1) == 1) & (nonzero == 1)
        best = jnp.sum(jnp.where(pick, lin0, 0), axis=1)
        return any_nz, first, best
    stat("tail: argmax + cumsum-pick (no gather)", tail2, tax, hits,
         lineage)

    def argmax_only(t, lin):
        lin0 = classify_op._lineage_rows(lin, t[:, 0])
        return jnp.argmax(lin0 != 0, axis=1)
    stat("argmax alone", argmax_only, tax, lineage)

    def ta_only(t, lin):
        lin0 = classify_op._lineage_rows(lin, t[:, 0])
        first = jnp.zeros((B, 1), jnp.int32)
        return jnp.take_along_axis(lin0, first, axis=1)
    stat("take_along_axis alone (const idx)", ta_only, tax, lineage)


if __name__ == "__main__":
    main()
