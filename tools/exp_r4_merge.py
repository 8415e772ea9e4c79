#!/usr/bin/env python
"""Round-4: de-confounded cross-shard merge cost (VERDICT r3 item 7).

The round-3 merge microbench ran P virtual CPU devices on 2 cores, so its
1.5/5.5/21 ms for P=1/2/4 measured core-sharing, not the algorithm. Here
the per-shard merge COMPUTE (dedup/top-k over the all-gathered [B, P*C]
candidate tensors) runs on the real TPU chip as a single-device program at
exactly the widths a P-shard merge produces — fixed hardware, growing
width — and the collective itself is bounded analytically from payload
bytes vs published ICI bandwidth.

Writes merge_device_* fields into SCALING.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from metacache_tpu.ops import candidates as cand_ops

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "SCALING.json")

B, C = 8192, 2


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    rows = []
    for Pn in (1, 2, 4, 8, 16):
        W = Pn * C

        def merge_fn(tax, hits, beg, end, tgt):
            m = cand_ops._dedup_topk(tax, hits, beg, end, tgt, C)
            return m["tax"], m["hits"]

        args = [jnp.asarray(rng.integers(0, 100, (B, W)).astype(np.int32))
                for _ in range(5)]
        comp = jax.jit(merge_fn).lower(*args).compile()
        code_mb = comp.memory_analysis().generated_code_size_in_bytes / 1e6
        r = comp(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        N = 30
        for _ in range(N):
            r = comp(*args)
        jax.block_until_ready(r)
        ms = (time.perf_counter() - t0) / N * 1e3
        print(f"P={Pn:2d} (width {W}): merge compute {ms:.3f} ms/batch, "
              f"{code_mb:.2f} MB code", flush=True)
        rows.append({"P": Pn, "width": W, "ms_per_batch": round(ms, 4),
                     "code_mb": round(code_mb, 3)})

    # analytic collective bound: all_gather payload = (P-1)/P * P*B*C*5
    # int32 words arriving per chip; v5e ICI ~45 GB/s per link
    # (public v5e spec; the exact constant only scales the bound)
    payload_mb = {Pn: Pn * B * C * 5 * 4 / 1e6 for Pn in (2, 4, 8, 16)}
    bound_us = {Pn: payload_mb[Pn] / 45e3 * 1e6 for Pn in payload_mb}
    for Pn in payload_mb:
        print(f"P={Pn:2d}: all_gather payload {payload_mb[Pn]:.2f} MB "
              f"-> >= {bound_us[Pn]:.0f} us at 45 GB/s ICI", flush=True)

    data = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            data = json.load(f)
    data["merge_device_compute"] = rows
    data["merge_ici_bound"] = [
        {"P": Pn, "payload_mb": round(payload_mb[Pn], 3),
         "ici_us_at_45GBps": round(bound_us[Pn], 1)} for Pn in payload_mb]
    data["merge_note"] = (
        "merge_device_compute: per-shard dedup/top-k over the all-gathered "
        "[B, P*C] candidates, measured on the real chip at fixed hardware "
        "and growing width (replaces the round-3 virtual-CPU microbench "
        "whose 1.5/5.5/21 ms for P=1/2/4 was 8-devices-on-2-cores "
        "core-sharing). merge_ici_bound: collective payload vs ICI "
        "bandwidth.")
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)
    print("SCALING.json updated", flush=True)


if __name__ == "__main__":
    main()
