"""Round-5 experiment: GB-scale table gathers — scattered word gather vs
aligned row-gather + lane-select.

config-3 (210M features / 708M locations) is program-bound at ~134 ms/batch
in the single-tier CSR program; per-op traces (round 4) blame the scattered
word gathers `loc_packed[li]` and the key/offset gathers of the binary
search. Round 4 showed aligned ROW gathers (direct table [F, mb+1]) run
10-30x faster than word gathers in-program. Hypothesis: reshaping a flat
[L] word table to [L/W, W] rows and fetching `tbl2[idx >> log2W]` + lane
select turns every scattered word fetch into one aligned row DMA at zero
memory overhead.

Run on the real chip: python tools/exp_r5_rowsel.py [L_elems]
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
ITERS = 30

rng = np.random.default_rng(0)
print(f"table {L} int32 = {L*4/1e9:.2f} GB; idx [{B}, {NF}]")
tbl_host = rng.integers(0, 2**31 - 1, size=L, dtype=np.int64).astype(np.int32)
idx_host = rng.integers(0, L, size=(B, NF), dtype=np.int64).astype(np.int32)
# int32 idx only safe to 2^31; L < 2^31 ok

dev = jax.devices()[0]
tbl = jax.device_put(tbl_host, dev)
idx = jax.device_put(idx_host, dev)


def bench(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    # queue-depth-1 warm pass (service quirk), then timed window
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    csz = f.lower(*args).compile().memory_analysis().generated_code_size_in_bytes
    print(f"{name:28s} {dt:8.3f} ms/iter   code {csz/1e6:.2f} MB")
    return dt


def flat_gather(t, i):
    return jnp.sum(t[i], dtype=jnp.int32)


def rowsel(w):
    lg = int(np.log2(w))

    def f(t2, i):
        rows = t2[i >> lg]                       # [B, NF, w] aligned rows
        lane = (i & (w - 1))[..., None]
        sel = lane == jax.lax.broadcasted_iota(jnp.int32, (1, 1, w), 2)
        v = jnp.sum(jnp.where(sel, rows, 0), axis=-1)
        return jnp.sum(v, dtype=jnp.int32)
    return f


def in_program(core):
    """Wrap a gather between sorts to mimic the real program's context."""
    def f(*args):
        i = args[-1]
        i2 = jax.lax.sort(i, dimension=1, is_stable=False)
        v = core(*(args[:-1] + (i2,)))
        return v
    return f


flat = bench("flat word gather", flat_gather, tbl, idx)
for w in (8, 16, 32):
    pad = (-L) % w
    t2 = jax.device_put(
        np.concatenate([tbl_host, np.zeros(pad, np.int32)]).reshape(-1, w),
        dev)
    bench(f"rowsel w={w}", rowsel(w), t2, idx)
    del t2

# sorted-indices variant: does index order matter?
idx_sorted = jax.device_put(np.sort(idx_host, axis=1), dev)
bench("flat gather, sorted idx", flat_gather, tbl, idx_sorted)

# in-program (sort before gather) context
bench("flat in-program", in_program(flat_gather), tbl, idx)
w = 8
pad = (-L) % w
t2 = jax.device_put(
    np.concatenate([tbl_host, np.zeros(pad, np.int32)]).reshape(-1, w), dev)
bench("rowsel8 in-program", in_program(rowsel(w)), t2, idx)
