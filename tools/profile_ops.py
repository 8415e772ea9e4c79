#!/usr/bin/env python
"""Capture a jax profiler trace of the query pipeline and print the top TPU
ops by accumulated duration (hand-rolled xplane.pb parser — no tensorboard
dependency in this image)."""
import collections
import glob
import os
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def read_varint(b, i):
    x = 0
    s = 0
    while True:
        v = b[i]
        i += 1
        x |= (v & 0x7F) << s
        if not v & 0x80:
            return x, i
        s += 7


def fields(b):
    i = 0
    while i < len(b):
        tag, i = read_varint(b, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = read_varint(b, i)
        elif wt == 2:
            ln, i = read_varint(b, i)
            v = b[i:i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack("<I", b[i:i + 4])[0]
            i += 4
        elif wt == 1:
            v = struct.unpack("<Q", b[i:i + 8])[0]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def top_ops(pb_path, n=25):
    data = open(pb_path, "rb").read()
    for fn, wt, plane in fields(data):
        if fn != 1:
            continue
        name = ""
        meta = {}
        lines = []
        for f2, w2, v2 in fields(plane):
            if f2 == 2 and w2 == 2:
                name = v2.decode()
            elif f2 == 3 and w2 == 2:
                lines.append(v2)
            elif f2 == 4 and w2 == 2:
                k = None
                mname = ""
                for f3, w3, v3 in fields(v2):
                    if f3 == 1:
                        k = v3
                    elif f3 == 2 and w3 == 2:
                        for f4, w4, v4 in fields(v3):
                            if f4 == 2 and w4 == 2:
                                mname = v4.decode()
                if k is not None:
                    meta[k] = mname
        if "TPU" not in name:
            continue
        durs = collections.Counter()
        counts = collections.Counter()
        for line in lines:
            evs = []
            lname = ""
            for f3, w3, v3 in fields(line):
                if f3 == 4 and w3 == 2:
                    evs.append(v3)
                elif f3 == 2 and w3 == 2:
                    lname = v3.decode(errors="replace")
            if lname and ("step" in lname.lower() or
                          "framework" in lname.lower()):
                continue
            for ev in evs:
                mid = None
                dur = 0
                for f4, w4, v4 in fields(ev):
                    if f4 == 1 and w4 == 0:
                        mid = v4
                    elif f4 == 3 and w4 == 0:
                        dur = v4
                if mid is not None:
                    opname = meta.get(mid, str(mid))
                    durs[opname] += dur
                    counts[opname] += 1
        total = sum(durs.values())
        print(f"== {name}: total busy {total/1e9:.1f} ms, "
              f"{sum(counts.values())} events")
        for op, d in durs.most_common(n):
            print(f"  {d/1e9:9.2f} ms x{counts[op]:<4} {op[:100]}")


def main():
    import numpy as np
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from metacache_tpu.config import ClassifyParams, QueryPipelineParams
    from metacache_tpu.modes.query import load_all_shards
    from metacache_tpu.query.engine import QueryEngine, encode_read_into

    db = load_all_shards(sys.argv[1] if len(sys.argv) > 1
                         else "/tmp/mc_bench/mydb")
    pipeline = QueryPipelineParams(batch_size=8192, max_query_len=128,
                                   max_locations_per_query=256)
    eng = QueryEngine(db, ClassifyParams(lowest_rank="species"), pipeline)
    c1, l1, c2, l2 = eng.make_host_buffers()
    rng = np.random.default_rng(0)
    bases = np.array(list("ACGT"))
    for i in range(8192):
        encode_read_into(c1, l1, i, "".join(bases[rng.integers(0, 4, 100)]),
                         128)
        encode_read_into(c2, l2, i, "".join(bases[rng.integers(0, 4, 100)]),
                         128)
    eng.classify_batch(c1, l1, c2, l2, 8192)
    tdir = "/tmp/mc_trace_%d" % int(time.time())
    jax.profiler.start_trace(tdir)
    eng.classify_batch(c1, l1, c2, l2, 8192)
    jax.profiler.stop_trace()
    pbs = glob.glob(tdir + "/**/*.xplane.pb", recursive=True)
    top_ops(pbs[0])


if __name__ == "__main__":
    main()
