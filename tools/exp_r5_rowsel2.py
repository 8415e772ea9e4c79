"""Round-5: GB-scale gather timings with DISTINCT inputs per execution.

exp_r5_rowsel measured repeated identical args — invalid: the tunneled
service appears to serve identical (executable, args) executions from a
cache (exp_r5_c3wire: the same program measures 0.10 ms/batch with one
repeated input and 231 ms/batch over 32 distinct resident inputs). Every
timing here cycles through NDIST distinct pre-resident index batches.

Run: python tools/exp_r5_rowsel2.py [L_elems]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

L = int(sys.argv[1]) if len(sys.argv) > 1 else 708_000_000
B, NF = 8192, 256
NDIST = 16
ITERS = 32

rng = np.random.default_rng(0)
print(f"table {L} int32 = {L*4/1e9:.2f} GB; idx [{B}, {NF}] x {NDIST} "
      f"distinct", flush=True)
tbl_host = rng.integers(0, 2**31 - 1, size=L, dtype=np.int64).astype(np.int32)
idx_hosts = [rng.integers(0, L, size=(B, NF), dtype=np.int64).astype(np.int32)
             for _ in range(NDIST)]

dev = jax.devices()[0]
tbl = jax.device_put(tbl_host, dev)
idxs = [jax.device_put(i, dev) for i in idx_hosts]
jax.block_until_ready(idxs)


def bench(name, fn, make_args):
    f = jax.jit(fn)
    outs = [f(*make_args(i)) for i in range(2)]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    outs = []
    for it in range(ITERS):
        outs.append(f(*make_args(it % NDIST)))
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:34s} {dt:8.2f} ms/iter", flush=True)
    return dt


def flat_gather(t, i):
    return jnp.sum(t[i], dtype=jnp.int32)


def rowsel(w):
    lg = int(np.log2(w))

    def f(t2, i):
        rows = t2[i >> lg]
        lane = (i & (w - 1))[..., None]
        sel = lane == jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
        v = jnp.sum(jnp.where(sel, rows, 0), axis=-1)
        return jnp.sum(v, dtype=jnp.int32)
    return f


bench("flat word gather", flat_gather, lambda i: (tbl, idxs[i]))

for w in (8, 16):
    pad = (-L) % w
    t2 = jax.device_put(
        np.concatenate([tbl_host, np.zeros(pad, np.int32)]).reshape(-1, w),
        dev)
    jax.block_until_ready(t2)
    bench(f"rowsel w={w}", rowsel(w), lambda i: (t2, idxs[i]))
    del t2

# sorted per-row indices (the real lookup's indices are run-ordered)
idx_sorted = [jax.device_put(np.sort(i, axis=1), dev) for i in idx_hosts]
jax.block_until_ready(idx_sorted)
bench("flat gather, row-sorted idx", flat_gather,
      lambda i: (tbl, idx_sorted[i]))

# gather embedded between sorts (program context like the real pipeline)
def in_prog(t, i):
    i2 = jax.lax.sort(i, dimension=1, is_stable=False)
    v = t[i2]
    v = jax.lax.sort(v, dimension=1, is_stable=False)
    return jnp.sum(v, dtype=jnp.int32)
bench("sort | flat gather | sort", in_prog, lambda i: (tbl, idxs[i]))

w = 8
pad = (-L) % w
t2 = jax.device_put(
    np.concatenate([tbl_host, np.zeros(pad, np.int32)]).reshape(-1, w), dev)
jax.block_until_ready(t2)

def in_prog_row(t2_, i):
    i2 = jax.lax.sort(i, dimension=1, is_stable=False)
    lg = 3
    rows = t2_[i2 >> lg]
    lane = (i2 & 7)[..., None]
    sel = lane == jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8), 2)
    v = jnp.sum(jnp.where(sel, rows, 0), axis=-1)
    v = jax.lax.sort(v, dimension=1, is_stable=False)
    return jnp.sum(v, dtype=jnp.int32)
bench("sort | rowsel8 | sort", in_prog_row, lambda i: (t2, idxs[i]))
