"""Build mode CLI driver (main_mode_build, src/mode_build.cpp:1145-1175)."""
from __future__ import annotations

import os
import sys
from typing import List

from ..config import BuildParams, SketchParams
from ..db import build as build_mod
from ..db.taxonomy import Rank, rank_from_name
from ..utils import ArgsParser, Timer, vm_rss_mb


def get_build_options(args: ArgsParser) -> build_mod.BuildOptions:
    """(get_build_options, src/mode_build.cpp:93-138)"""
    kmerlen = args.get("kmerlen", 16, int)
    sketchlen = args.get("sketchlen", 16, int)
    winlen = args.get("winlen", 128, int)
    winstride = args.get("winstride", winlen - kmerlen + 1, int)
    maxlocs = args.get(["max-locations-per-feature",
                        "max_locations_per_feature"], 254, int)
    params = BuildParams(
        sketch=SketchParams(kmerlen, sketchlen, winlen, winstride),
        max_locations_per_feature=min(max(1, maxlocs), 254),
        remove_overpopulated_features=args.contains(
            ["remove-overpopulated-features",
             "remove_overpopulated_features"]),
        remove_ambig_features_rank=args.get(
            ["remove-ambig-features", "remove_ambig_features"], None),
        max_taxa_per_feature=args.get(
            ["max-ambig-per-feature", "max_ambig_per_feature"], 1, int))

    # (mode_build.cpp:102-106)
    info_level = "moderate"
    if args.contains("silent"):
        info_level = "silent"
    elif args.contains("verbose"):
        info_level = "verbose"

    taxdir = args.get("taxonomy", "")
    opt = build_mod.BuildOptions(
        params=params,
        taxonomy_nodes=os.path.join(taxdir, "nodes.dmp") if taxdir else "",
        taxonomy_names=os.path.join(taxdir, "names.dmp") if taxdir else "",
        taxonomy_merged=os.path.join(taxdir, "merged.dmp") if taxdir else "",
        taxpostmap=tuple(args.get_all("taxpostmap")),
        reset_parents=args.contains(["reset-parents", "reset_parents"]),
        info_level=info_level)
    return opt


def main_mode_build(args: ArgsParser, num_shards: int = 1,
                    shard_id: int = 0) -> int:
    if len(args.positionals) < 3:
        print("usage: metacache build <database> <sequence files/dirs...> "
              "OPTIONS", file=sys.stderr)
        return 1
    dbfile = args.positionals[1]
    infiles = args.positionals[2:]
    opt = get_build_options(args)
    # allow overriding shard layout for single-host multi-shard builds
    num_shards = args.get(["num-shards", "num_shards"], num_shards, int)

    # multi-process launch: one shard per process, exactly the reference's
    # rank-gated build (add_target_distributed, sketch_database.h:519-563;
    # per-rank file write, mode_build.cpp:1079-1091)
    import jax
    multiproc = jax.process_count() > 1
    if multiproc:
        num_shards = max(num_shards, jax.process_count())
        my_shards = [s for s in range(num_shards)
                     if s % jax.process_count() == jax.process_index()]
    else:
        my_shards = list(range(num_shards)) if (shard_id < 0 or
                                                num_shards > 1) \
            else [shard_id]

    silent = opt.info_level == "silent"
    verbose = opt.info_level == "verbose"
    progress = None
    if verbose:
        seen_files = set()

        def progress(path, tgt):
            if path not in seen_files:
                seen_files.add(path)
                print(f"  processing {path}")

    timer = Timer()
    timer.start()
    if not silent:
        print("Processing reference sequences.")
    # ONE pass over the inputs for all of this process's shards (the
    # reference's ranks parse concurrently in separate processes,
    # mode_build.cpp:559-617; re-reading the inputs per shard would
    # multiply the parse cost by S)
    shard_dbs = build_mod.build_database_shards(
        infiles, opt, num_shards=num_shards, shard_ids=my_shards,
        progress=progress)
    if not silent and shard_dbs:
        print(f"Added {shard_dbs[0].target_count} reference sequences "
              f"in {timer.seconds():.3f} s")

    if opt.params.remove_overpopulated_features:
        # global counts across shards (mode_build.cpp:847-1074); with
        # multiple processes the (key, count) dumps are all-gathered over
        # the coordinator (the reference's log2(P) Send/Recv tree + Bcast)
        local = [d.features for d in shard_dbs]
        counts = build_mod.merge_shard_feature_counts(local)
        if multiproc:
            from jax.experimental import multihost_utils
            import numpy as _np
            k, c = counts
            kv = _np.stack([k.astype(_np.int64), c], axis=1) if len(k) \
                else _np.zeros((0, 2), _np.int64)
            n = _np.array([kv.shape[0]], _np.int64)
            nmax = int(multihost_utils.process_allgather(n).max())
            pad = _np.full((nmax, 2), -1, _np.int64)
            pad[:kv.shape[0]] = kv
            allkv = multihost_utils.process_allgather(pad).reshape(-1, 2)
            valid = allkv[:, 0] >= 0
            counts = build_mod.merge_feature_count_arrays(
                allkv[valid, 0].astype(_np.uint32), allkv[valid, 1])
        maxlocs = opt.params.max_locations_per_feature
        for db in shard_dbs:
            rem = db.remove_overpopulated_features(maxlocs,
                                                   global_counts=counts)
            if not silent:
                print(f"Removed {rem} overpopulated features in shard "
                      f"{db.shard_id}.")

    write_timer = Timer()
    write_timer.start()
    for db in shard_dbs:
        path = db.save(dbfile)
        if not silent:
            print(f"Writing database to file '{path}' ... done.")
    write_timer.stop()
    timer.stop()
    if not silent:
        # per-phase timers + memory report (mode_build.cpp:829-840,
        # :1076-1091; VmRSS print per querying.h:305-323)
        print(f"Time for database write: {write_timer.seconds():.3f} s")
        print(f"Total build time: {timer.seconds():.3f} s")
        rss = vm_rss_mb()
        if rss is not None:
            print(f"Current memory usage (VmRSS): {rss:.1f} MB")

    if not silent and shard_dbs:
        props = shard_dbs[0].properties()
        print("------------------------------------------------")
        for k, v in props.items():
            print(f"{k:<22}{v}")
    return 0
