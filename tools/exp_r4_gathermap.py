#!/usr/bin/env python
"""Round-4: alternatives to the tiny-table gather tct[safe_tgt].

tools/exp_r4_glue2.py pins ~17 ms of generate_candidates' ~21 ms on ONE
[8192, 256] gather from a 98-entry map. Candidates:
  a) baseline advanced-index gather
  b) flat take + reshape
  c) T elementwise selects (sum of tct[t] * (x == t))
  d) sort-based map (merge the sorted targets with (t, tct[t]) items,
     fill-forward, route back) — targets are ALREADY sorted per row
  e) fill-forward only (exploit sortedness: gather once per segment start
     is still a gather; instead compare-to-items via searchsorted-free
     broadcast over T in chunks)
  f) one-hot matmul in two 13-bit halves (exact in f32)
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

B, L, T = 8192, 256, 96


def stat(name, fn, *args, check=None):
    jitted = jax.jit(fn)
    comp = jitted.lower(*args).compile()
    ma = comp.memory_analysis()
    r = comp(*args)
    jax.block_until_ready(r)
    if check is not None:
        np.testing.assert_array_equal(np.asarray(r), check)
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
    x_np = np.sort(rng.integers(0, T, (B, L), dtype=np.int32), axis=1)
    tct_np = rng.integers(0, 1 << 25, T + 2, dtype=np.int32)
    want = tct_np[x_np]
    x = jnp.asarray(x_np)
    tct = jnp.asarray(tct_np)

    stat("a) tct[x] gather", lambda t, v: t[v], tct, x, check=want)
    stat("b) take flat", lambda t, v: jnp.take(t, v.reshape(-1))
         .reshape(B, L), tct, x, check=want)

    def selects(t, v):
        out = jnp.zeros_like(v)
        for i in range(T):
            out = out + t[i] * (v == i)
        return out
    stat("c) T elementwise selects", selects, tct, x, check=want)

    def sortmap(t, v):
        # v rows are sorted ascending; items (i*2, t[i]) replicated per row
        ids = jnp.broadcast_to(
            (jnp.arange(T, dtype=jnp.int32) * 2)[None, :], (B, T))
        vals = jnp.broadcast_to(t[None, :T], (B, T))
        pos = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None, :],
                               (B, L))
        c_key = jnp.concatenate([ids, v * 2 + 1], axis=1)
        c_val = jnp.concatenate([vals, jnp.zeros((B, L), jnp.int32)], axis=1)
        c_pos = jnp.concatenate([jnp.full((B, T), L, jnp.int32), pos],
                                axis=1)
        s_key, s_val, s_pos = jax.lax.sort(
            (c_key, c_val, c_pos), dimension=1, num_keys=1, is_stable=False)
        is_item = (s_key & 1) == 0
        pay = jnp.where(is_item, s_val, 0)
        have = is_item
        W2 = T + L
        s = 1
        while s < W2:
            pv = jnp.concatenate([jnp.zeros((B, s), pay.dtype),
                                  pay[:, :-s]], axis=1)
            hv = jnp.concatenate([jnp.zeros((B, s), jnp.bool_),
                                  have[:, :-s]], axis=1)
            pay = jnp.where(have, pay, pv)
            have = have | hv
            s <<= 1
        # route back: queries by pos (items got pos=L, sort after)
        _, back = jax.lax.sort((s_pos * 2 + is_item, pay), dimension=1,
                               num_keys=1, is_stable=False)
        return back[:, :L]
    stat("d) sort-based map (width L+T)", sortmap, tct, x, check=want)

    def onehot_dot(t, v):
        lo = (t & jnp.int32((1 << 13) - 1)).astype(jnp.float32)
        hi = (t >> 13).astype(jnp.float32)
        oh = jax.nn.one_hot(v, T + 2, dtype=jnp.float32)   # [B, L, T+2]
        fl = oh.reshape(B * L, T + 2)
        rlo = fl @ lo.astype(jnp.float32)
        rhi = fl @ hi.astype(jnp.float32)
        return (rlo.astype(jnp.int32)
                + (rhi.astype(jnp.int32) << 13)).reshape(B, L)
    stat("f) one-hot matmul 2x13-bit", onehot_dot, tct, x, check=want)

    # same pathology probe: [B, 2] gather from a [2M, 22] lineage table
    lin = jnp.asarray(rng.integers(0, 1 << 20, (2_000_000, 22),
                                   dtype=np.int32))
    idx2 = jnp.asarray(rng.integers(0, 2_000_000, (B, 2), dtype=np.int32))
    stat("lineage row gather [8192,2] from [2M,22]",
         lambda lin_, i: lin_[i], lin, idx2)
    idxw = jnp.asarray(rng.integers(0, 2_000_000, (B, 256), dtype=np.int32))
    stat("word gather [8192,256] from [2M]",
         lambda lin_, i: lin_[:, 0][i] if False else lin_[i, 0], lin, idxw)


if __name__ == "__main__":
    main()
