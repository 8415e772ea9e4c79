#!/usr/bin/env python
"""Round-4: bisect the candidate-stage dedup/top-k sorts on the real chip.

The stage profile (tools/exp_r4_sizes.py) shows generate_candidates at
~26 ms/batch at [8192, 256] with ~18 ms in the two 5-operand sorts.
Compares:
  - 5-operand 2-key sort (legacy dedup)   vs 3-operand (packed payloads)
  - 5-operand 1-key sort (legacy top-k)   vs 3-operand packed
  - lax.top_k + [B, C] take_along_axis payload gathers (runtime alt)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

B, L, C = 8192, 256, 2


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


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 20, (B, L), dtype=np.int32))
    a = jnp.asarray(rng.integers(0, 1 << 25, (B, L), dtype=np.int32))
    b = jnp.asarray(rng.integers(0, 1 << 25, (B, L), dtype=np.int32))
    c = jnp.asarray(rng.integers(0, 1 << 25, (B, L), dtype=np.int32))
    d = jnp.asarray(rng.integers(0, 1 << 25, (B, L), dtype=np.int32))

    stat("sort 5-op 2-key [8192,256]",
         lambda k, w, x, y, z: jax.lax.sort((k, w, x, y, z), dimension=1,
                                            num_keys=2, is_stable=False),
         key, a, b, c, d)
    stat("sort 3-op 2-key [8192,256]",
         lambda k, w, x: jax.lax.sort((k, w, x), dimension=1, num_keys=2,
                                      is_stable=False),
         key, a, b)
    stat("sort 3-op 1-key [8192,256]",
         lambda k, w, x: jax.lax.sort((k, w, x), dimension=1, num_keys=1,
                                      is_stable=False),
         key, a, b)
    stat("sort 2-op 1-key [8192,512]",
         lambda k, w: jax.lax.sort(
             (jnp.concatenate([k, k], 1), jnp.concatenate([w, w], 1)),
             dimension=1, num_keys=1, is_stable=False),
         key, a)
    stat("sort 1-op [8192,512]",
         lambda k: jax.lax.sort(jnp.concatenate([k, k], 1), dimension=1,
                                is_stable=False),
         key)

    def topk_gather(k, w, x):
        nv, idx = jax.lax.top_k(-k, C)
        return -nv, jnp.take_along_axis(w, idx, axis=1), \
            jnp.take_along_axis(x, idx, axis=1)
    stat("lax.top_k(C=2) + 2 payload gathers", topk_gather, key, a, b)

    def topk_only(k):
        return jax.lax.top_k(-k, C)
    stat("lax.top_k(C=2) alone", topk_only, key)


if __name__ == "__main__":
    main()
