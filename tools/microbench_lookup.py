#!/usr/bin/env python
"""Micro-benchmarks for lookup formulations on the real device.

Compares, at benchmark shapes (B=8192, NF=32 features/read, LMAX=256 match
slots, F~905k keys, L~906k locations):

  A. current: radix-bucketed unrolled binary search (8 gather steps)
  B. rank-by-sort global lower bound (1-D co-sort, no gathers)
  C. current CSR slot expansion (masked-sum li) + XLA pair gather
  D. sort-join location fetch (co-sort loc table with slot indices)
  E. raw 1-D sort costs at the relevant sizes
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    F = 905_100
    L = 906_240
    B, NF, LMAX = 8192, 32, 256

    keys = np.sort(rng.integers(0, 2**32, F, dtype=np.uint64)
                   .astype(np.uint32))
    counts = rng.integers(1, 3, F).astype(np.int64)
    offsets = np.zeros(F + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    scale = offsets[-1] / L
    offsets = (offsets / scale).astype(np.int32)
    loc_tgt = rng.integers(0, 64, L).astype(np.int32)
    loc_win = rng.integers(0, 2000, L).astype(np.int32)
    queries = keys[rng.integers(0, F, (B, NF))]

    dkeys = jnp.asarray(keys)
    dq = jnp.asarray(queries)
    doff = jnp.asarray(offsets)
    dlt, dlw = jnp.asarray(loc_tgt), jnp.asarray(loc_win)

    from metacache_tpu.ops import lookup

    bo, steps = lookup.build_radix_index(keys)
    dbo = jnp.asarray(bo)

    # ---- A: current binary search --------------------------------------
    @jax.jit
    def curA(q):
        return lookup.global_lower_bound(dkeys, q, dbo, steps)

    ms = timeit(curA, dq)
    print(f"A binary search (radix, {steps} steps): {ms:.2f} ms")

    # ---- B: rank-by-sort lower bound ------------------------------------
    @jax.jit
    def curB(q):
        Q = q.size
        qf = q.reshape(-1)
        payload = jnp.arange(Q, dtype=jnp.int32)
        # keys first on ties (is_q=0 for keys) => rank counts keys < q OR ==
        # -> to get lower bound (keys < q), queries must sort BEFORE equal
        # keys: is_q 0 for queries, 1 for keys
        vals = jnp.concatenate([qf, dkeys])
        isk = jnp.concatenate([jnp.zeros(Q, jnp.int32),
                               jnp.ones(F, jnp.int32)])
        pay = jnp.concatenate([payload, jnp.zeros(F, jnp.int32)])
        sv, si, sp = jax.lax.sort((vals, isk, pay), num_keys=2)
        rank = jnp.cumsum(si) - si  # keys strictly before this slot
        # bring query slots back to payload order
        si2, sp2, rk = jax.lax.sort((1 - si, sp, rank), num_keys=2)
        return rk[:Q].reshape(q.shape)

    ms = timeit(curB, dq)
    print(f"B rank-by-sort lower bound: {ms:.2f} ms")
    a = np.asarray(curA(dq))
    b = np.asarray(curB(dq))
    print("  A == B:", np.array_equal(a, b))

    # ---- C: current slot expansion + gather ------------------------------
    @jax.jit
    def curC(q):
        return lookup.lookup_matches(q, dkeys, doff, dlt, dlw, LMAX,
                                     bucket_offsets=dbo, search_steps=steps)

    ms = timeit(curC, dq)
    print(f"C full lookup_matches (current): {ms:.2f} ms")

    # ---- D: sort-join variant of the full lookup -------------------------
    @jax.jit
    def curD(q):
        idx = curB(q)
        idx = jnp.minimum(idx, F - 1)
        found = (dkeys[idx] == q)
        off_pairs = jnp.stack([doff[:-1], doff[1:]], axis=1)[idx]
        start = off_pairs[..., 0].astype(jnp.int32)
        cnt = jnp.where(found, (off_pairs[..., 1] - off_pairs[..., 0])
                        .astype(jnp.int32), 0)
        cum = jnp.cumsum(cnt, axis=1)
        total = cum[:, -1]
        cum_ex = cum - cnt
        # per-slot li via row-local rank-by-sort (width NF+LMAX)
        slots = jnp.arange(LMAX, dtype=jnp.int32)
        sl = jnp.broadcast_to(slots[None, :], (q.shape[0], LMAX))
        item_key = jnp.concatenate([cum_ex, sl], axis=1)
        is_slot = jnp.concatenate(
            [jnp.zeros_like(cum_ex), jnp.ones_like(sl)], axis=1)
        pay = jnp.concatenate(
            [start - cum_ex,
             jnp.zeros_like(sl)], axis=1)
        k1, k2, p1 = jax.lax.sort((item_key, is_slot, pay), dimension=1,
                                  num_keys=2)
        # forward-propagate the latest feature's (start-cum_ex)
        def comb(a, c):
            (v1, f1), (v2, f2) = a, c
            return (jnp.where(f2, v2, v1), f1 | f2)
        base, _ = jax.lax.associative_scan(
            comb, (p1, k2 == 0), axis=1)
        li_sorted = base + k1  # start - cum_ex + slot
        # un-permute slots back
        s_is, s_key, s_li = jax.lax.sort((1 - k2, k1, li_sorted),
                                         dimension=1, num_keys=2)
        li = s_li[:, :LMAX]
        valid = sl < jnp.minimum(total, LMAX)[:, None]
        li = jnp.where(valid, li, 0)
        loc_pairs = jnp.stack([dlt, dlw], axis=1)[li]
        tgt = jnp.where(valid, loc_pairs[..., 0], 2**31 - 1)
        win = jnp.where(valid, loc_pairs[..., 1], 2**31 - 1)
        tgt, win = jax.lax.sort((tgt, win), dimension=1, num_keys=2,
                                is_stable=True)
        return tgt, win, jnp.minimum(total, LMAX)

    ms = timeit(curD, dq)
    print(f"D sort-join lookup (B + row-sort expansion): {ms:.2f} ms")
    tC = curC(dq)
    tD = curD(dq)
    print("  C.tgt == D.tgt:", np.array_equal(np.asarray(tC[0]),
                                              np.asarray(tD[0])),
          " C.win == D.win:", np.array_equal(np.asarray(tC[1]),
                                             np.asarray(tD[1])))

    # ---- E2: global gather-by-sort of loc pairs --------------------------
    @jax.jit
    def gather_by_sort(li):
        # fetch loc[li] for [B*LMAX] indices via co-sort with the loc table
        n = li.size
        flat = li.reshape(-1)
        dest = jnp.arange(n, dtype=jnp.int32)
        idx = jnp.concatenate([jnp.arange(L, dtype=jnp.int32), flat])
        isq = jnp.concatenate([jnp.zeros(L, jnp.int32),
                               jnp.ones(n, jnp.int32)])
        pay = jnp.concatenate([jnp.zeros(L, jnp.int32), dest])
        vt = jnp.concatenate([dlt, jnp.zeros(n, jnp.int32)])
        vw = jnp.concatenate([dlw, jnp.zeros(n, jnp.int32)])
        si, sq, sp, st, sw = jax.lax.sort((idx, isq, pay, vt, vw),
                                          num_keys=2)
        def comb(a, c):
            (t1, w1, f1), (t2, w2, f2) = a, c
            return (jnp.where(f2, t2, t1), jnp.where(f2, w2, w1), f1 | f2)
        pt, pw, _ = jax.lax.associative_scan(
            comb, (st, sw, sq == 0), axis=0)
        # un-permute query slots
        o1, o2, ot, ow = jax.lax.sort((1 - sq, sp, pt, pw), num_keys=2)
        return ot[:n].reshape(li.shape), ow[:n].reshape(li.shape)

    li = jnp.asarray(rng.integers(0, L, (B, LMAX)).astype(np.int32))
    ms = timeit(gather_by_sort, li)
    print(f"E2 gather-by-sort loc pairs [B,LMAX]: {ms:.2f} ms")

    @jax.jit
    def gather_xla(li):
        lp = jnp.stack([dlt, dlw], axis=1)[li]
        return lp[..., 0], lp[..., 1]

    ms = timeit(gather_xla, li)
    print(f"E1 XLA gather loc pairs [B,LMAX]: {ms:.2f} ms")
    gt, gw = gather_xla(li)
    st, sw = gather_by_sort(li)
    print("  E1 == E2:", np.array_equal(np.asarray(gt), np.asarray(st)),
          np.array_equal(np.asarray(gw), np.asarray(sw)))

    # ---- E: raw sorts -----------------------------------------------------
    for n in (262_144, 1_170_000, 3_000_000):
        x = jnp.asarray(rng.integers(0, 2**32, n, np.uint64)
                        .astype(np.uint32))
        y = jnp.asarray(rng.integers(0, 2**31, n).astype(np.int32))
        z = jnp.asarray(rng.integers(0, 2**31, n).astype(np.int32))
        f = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=1))
        ms = timeit(f, x, y, z)
        print(f"E sort 1-D n={n} x3 operands: {ms:.2f} ms")


if __name__ == "__main__":
    main()
