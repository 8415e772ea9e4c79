"""Multi-chip sharded query: database shards across a device mesh.

The TPU-native replacement for the reference's MPI query distribution
(query_batched_parallel2, src/querying.h:721-1173):

  reference                                TPU
  ---------                                ---
  per-rank DB shard file (t % P == rank)   feature-table shard per device,
                                           stacked [P, F] + NamedSharding
  every rank reads the same read block     read batch replicated to devices
  log2(P) MPI_Send/Recv candidate tree     all_gather of fixed-shape [B, C]
  + re-insert into per-qid lists           candidate tensors over ICI +
                                           deterministic dedup/top-k merge
  rank 0 classifies + formats              classification computed
                                           replicated; host 0 formats

The merge is associative/commutative (max hits per taxon), so results are
shard-count invariant (each target's matches live wholly on one shard).

Every per-read feature of the single-chip engine is available here with
identical semantics (the local pipeline is literally the same function,
query.engine.local_candidates): clade exclusion, the packed-location
single-key fast path, the Pallas sketch opt-in, and per-candidate window
hit counts (-hits-per-seq) — the latter computed against each shard's
local match list and psum'd (a target's matches live wholly on one shard,
so per-shard counts sum to the reference's global counts,
src/matches_per_target.h:111-155).
"""
from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ClassifyParams, QueryPipelineParams
from ..db.database import Database
from ..db.taxonomy import Rank
from ..ops import candidates as cand_ops
from ..ops import classify_op, lookup
from ..query.engine import (BatchResult, _rank_code, _window_starts_static,
                            local_candidates, make_target_groups,
                            target_window_hits)


def make_mesh(devices=None, axis: str = "shard") -> Mesh:
    """Mesh over the given (default: ALL, incl. other hosts') devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def stack_shard_tables(dbs: List[Database], pad_keys_to=None,
                       pad_locs_to=None, win_bits: int = 0):
    """Pad shard feature tables to common sizes and stack to [P_local, ...].

    Multi-host: every process must pad to the same (global) sizes; pass the
    globally agreed pad_keys_to/pad_locs_to/win_bits (ShardedQueryEngine).

    Returns (keys, offsets, tgts, wins, packed) — packed is None unless
    every shard packs with the common win_bits.
    """
    fmax = pad_keys_to or max(d.features.num_keys for d in dbs)
    lmax = pad_locs_to or max(d.features.num_locations for d in dbs)
    keys, offsets, tgts, wins, packs = [], [], [], [], []
    for d in dbs:
        k, o, t, w = d.features.device_arrays(pad_keys_to=fmax,
                                              pad_locs_to=lmax)
        keys.append(k)
        offsets.append(o.astype(np.int32))
        tgts.append(t)
        wins.append(w)
        if win_bits and packs is not None:
            p, wb = d.features.packed_locations(pad_locs_to=lmax,
                                                win_bits=win_bits)
            packs = None if p is None else packs + [p]
    packed = np.stack(packs) if win_bits and packs else None
    return (np.stack(keys), np.stack(offsets), np.stack(tgts),
            np.stack(wins), packed)


class ShardedQueryEngine:
    """Query engine over a device mesh: one database shard per device.

    API-compatible with query.engine.QueryEngine (classify_batch,
    dispatch_packed/materialize, set_exclusion, target_window_k).
    """

    def __init__(self, dbs: List[Database], classify: ClassifyParams,
                 pipeline: QueryPipelineParams = QueryPipelineParams(),
                 mesh: Optional[Mesh] = None, target_window_k: int = 0):
        """dbs: this process's shards, in mesh-device order. Single-process:
        all shards. Multi-process (jax.distributed initialized): only the
        shards owned by this host's devices — shard s belongs to global
        device s, mirroring the reference's per-rank DB files
        (mode_query.cpp:421-426)."""
        from . import distributed as dist
        if mesh is None:
            mesh = make_mesh()
        n_dev = mesh.devices.size
        multiproc = jax.process_count() > 1
        expected = len(dist.local_shard_ids(n_dev, mesh)) if multiproc \
            else n_dev
        if len(dbs) != expected:
            raise ValueError(f"{len(dbs)} shards for {expected} "
                             f"local devices")
        self.mesh = mesh
        self.db = dbs[0]          # taxonomy/targets replicated across shards
        self.classify = classify
        self.pipeline = pipeline
        self.target_window_k = target_window_k
        p = self.db.query_sketch_params
        self.sketch_params = p
        # threshold deduced from the TARGET sketcher's size, like
        # adapt_options_to_database (src/mode_query.cpp:247-260)
        self.hits_min = classify.resolved_hits_min(
            self.db.sketch_params.sketch_size)
        self.lowest_rank = _rank_code(classify.lowest_rank)
        self.highest_rank = _rank_code(classify.highest_rank)
        self.starts = tuple(_window_starts_static(
            pipeline.max_query_len, p.window_size, p.window_stride))

        import os
        self._use_pallas = (jax.default_backend() == "tpu"
                            and pipeline.batch_size % 256 == 0
                            and bool(os.environ.get(
                                "METACACHE_PALLAS_SKETCH")))

        pad_f = max(d.features.num_keys for d in dbs)
        pad_l = max(d.features.num_locations for d in dbs)
        # common packed-location encoding: win_bits must fit every shard's
        # max window AND leave room for the global max target id
        wb = max((int(d.features.loc_win.max()) if d.features.num_locations
                  else 0) for d in dbs)
        tb = max((int(d.features.loc_tgt.max()) if d.features.num_locations
                  else 0) for d in dbs)
        win_bits = max(1, wb.bit_length())
        packable = max(1, tb.bit_length()) + win_bits <= 31
        max_bucket = max((int(d.features.bucket_sizes().max())
                          if d.features.num_keys else 0) for d in dbs)
        if multiproc:
            # all shards must pad to the same (global) table sizes, and the
            # unrolled-search step count / win_bits / direct-path bucket cap
            # are static compile parameters — agree across hosts
            from jax.experimental import multihost_utils
            g = multihost_utils.process_allgather(
                np.array([pad_f, pad_l, win_bits, int(packable),
                          max_bucket], np.int64))
            pad_f, pad_l = int(g[:, 0].max()), int(g[:, 1].max())
            win_bits = int(g[:, 2].max())
            packable = bool(g[:, 3].min())
            max_bucket = int(g[:, 4].max())
        # direct fast lookup (ops/lookup.lookup_matches_direct): the sharded
        # engine has no overflow re-run tier, so use it only when EXACT —
        # the per-feature cap covers the global max bucket size and the
        # resulting static match width stays below the legacy lmax
        nf_width = 2 * len(self.starts) * p.sketch_size * max(1, max_bucket)
        if pipeline.fast_bucket_cap > 0:
            import warnings
            warnings.warn(
                "sharded engines have no overflow re-run tier and ignore a "
                "positive fast_bucket_cap: the direct path is used only "
                "when exact (cap = global max bucket size); pass -1 to "
                "disable it")
        self._direct_mb = max_bucket if (
            pipeline.fast_bucket_cap >= 0 and max_bucket > 0
            and nf_width <= pipeline.max_locations_per_query) else 0
        keys, offsets, tgts, wins, packed = stack_shard_tables(
            dbs, pad_keys_to=pad_f, pad_locs_to=pad_l,
            win_bits=win_bits if packable else 0)
        self._win_bits = win_bits if packed is not None else 0
        buckets = []
        radix_steps = 1
        for i in range(keys.shape[0]):
            bo, st = lookup.build_radix_index(keys[i])
            buckets.append(bo)
            radix_steps = max(radix_steps, st)
        if multiproc:
            from jax.experimental import multihost_utils
            g = multihost_utils.process_allgather(
                np.array([radix_steps], np.int64))
            radix_steps = int(g.max())
        self._search_steps = radix_steps
        self._bucket_offsets = dist.put_sharded(np.stack(buckets), mesh)
        self._keys = dist.put_sharded(keys, mesh)
        self._offsets = dist.put_sharded(offsets, mesh)
        # flat (start, cnt) tables for the direct lookup; padded key slots
        # carry cnt == 0 (device_arrays pads offsets with the last offset)
        self._start_tbl = dist.put_sharded(
            offsets[:, :-1].astype(np.int32), mesh)
        self._cnt_tbl = dist.put_sharded(
            np.diff(offsets, axis=1).astype(np.int32), mesh)
        self._loc_tgt = dist.put_sharded(tgts, mesh)
        self._loc_win = dist.put_sharded(wins, mesh)
        self._loc_packed = None if packed is None \
            else dist.put_sharded(packed, mesh)
        self._tct = dist.put_replicated(
            np.asarray(self.db.target_cand_tax(self.lowest_rank)), mesh)
        self._lineage = dist.put_replicated(
            self.db.taxonomy.ranked_lineage.astype(np.int32), mesh)
        self._dist = dist
        self._target_groups = None
        self._compiled = {}
        # device-resident threshold scalars (see QueryEngine: per-dispatch
        # scalar creation costs two extra host->device copies per batch)
        self._hits_min_dev = jnp.int32(self.hits_min)
        self._hits_diff_dev = jnp.float32(classify.hits_diff_fraction)

    # ------------------------------------------------------------------
    def set_exclusion(self, rank_code: int):
        """Enable clade exclusion on the given rank: per-read exclusion
        groups must then be passed to classify_batch (remove_hits_on_rank,
        src/classification.cpp:141-157)."""
        groups = make_target_groups(self.db, rank_code)
        self._target_groups = self._dist.put_replicated(groups, self.mesh)
        self.exclude_rank = rank_code

    def exclusion_group_of(self, node: int) -> int:
        if node == 0:
            return 0
        return int(self.db.taxonomy.ranked_lineage[node, self.exclude_rank])

    def _build_fn(self, with_exclusion: bool):
        p = self.sketch_params
        starts = self.starts
        lmax = self.pipeline.max_locations_per_query
        C = self.classify.max_candidates
        highest = self.highest_rank
        insert_max = self.classify.insert_size_max
        k, S, W, stride = (p.kmer_size, p.sketch_size, p.window_size,
                           p.window_stride)
        search_steps = self._search_steps
        use_pallas = self._use_pallas
        win_bits = self._win_bits
        twk = self.target_window_k
        has_packed = self._loc_packed is not None

        direct_mb = self._direct_mb

        def shard_fn(packed1, ambig1, lens1, packed2, ambig2, lens2,
                     keys, offsets, loc_tgt, loc_win, loc_packed, buckets,
                     start_tbl, cnt_tbl,
                     tct, lineage, hits_min, hits_diff,
                     exclude_groups, target_groups):
            # local shard block: leading axis of size 1
            cand, tgt, win, total, overflow = local_candidates(
                packed1, ambig1, lens1, packed2, ambig2, lens2,
                keys[0], offsets[0], loc_tgt[0], loc_win[0], tct,
                exclude_groups, target_groups, buckets[0],
                loc_packed[0] if has_packed else None,
                start_tbl[0], cnt_tbl[0],
                k=k, sketch_size=S, window_size=W, window_stride=stride,
                starts=starts, lmax=lmax, max_candidates=C,
                insert_size_max=insert_max, search_steps=search_steps,
                use_pallas_sketch=use_pallas, win_bits=win_bits,
                direct_mb=direct_mb)
            B = tgt.shape[0]

            # ---- cross-shard candidate merge over ICI ----
            # all_gather fixed-shape candidate tensors, then deterministic
            # dedup/top-k (replaces the reference's log2(P) Send/Recv tree)
            gath = {key: jax.lax.all_gather(val, "shard")
                    for key, val in cand.items()}           # [P, B, C]
            Pn = gath["tax"].shape[0]
            flat = {key: jnp.transpose(val, (1, 0, 2)).reshape(B, Pn * C)
                    for key, val in gath.items()}
            merged = cand_ops._dedup_topk(flat["tax"], flat["hits"],
                                          flat["beg"], flat["end"],
                                          flat["tgt"], C)
            best, best_rank = classify_op.classify_lca(
                merged["tax"], merged["hits"], lineage, hits_min, hits_diff,
                highest)
            ovf = jax.lax.psum(overflow, "shard")
            tot = jax.lax.psum(total, "shard")
            # fused summary: one device->host transfer serves the default
            # output path (see query.engine.BatchResult). The direct path
            # is only enabled when exact (overflow provably zero), so it
            # ships the slim [2, B] form.
            if direct_mb:
                summary = jnp.stack([best, best_rank])
            else:
                summary = jnp.stack([best, best_rank, tot, ovf])
            twh = None
            if twk:
                # per-shard counts vs the local match list; psum = global
                # counts (each target's matches live wholly on one shard)
                twh = jax.lax.psum(
                    target_window_hits(merged, tgt, win, twk), "shard")
            return merged, best, best_rank, tot, ovf, summary, twh

        mesh = self.mesh
        fn = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(),   # reads replicated
                      P("shard"), P("shard"), P("shard"), P("shard"),
                      P("shard"), P("shard"), P("shard"), P("shard"),
                      P(), P(), P(), P(), P(), P()),
            out_specs=(P(), P(), P(), P(), P(), P(), P()),
            check_vma=False)
        return jax.jit(fn)

    def make_host_buffers(self):
        B, L = self.pipeline.batch_size, self.pipeline.max_query_len
        return (np.zeros((B, L), np.uint8), np.zeros(B, np.int32),
                np.zeros((B, L), np.uint8), np.zeros(B, np.int32))

    def classify_batch(self, codes1, lens1, codes2, lens2, n: int,
                       exclude_groups=None) -> BatchResult:
        from ..ops import encode as _enc
        p1, a1 = _enc.np_pack_codes(codes1)
        p2, a2 = _enc.np_pack_codes(codes2)
        return self.classify_batch_packed(p1, a1, lens1, p2, a2, lens2, n,
                                          exclude_groups=exclude_groups)

    def classify_batch_packed(self, p1, a1, lens1, p2, a2, lens2, n: int,
                              exclude_groups=None) -> BatchResult:
        out = self.dispatch_packed(p1, a1, lens1, p2, a2, lens2,
                                   exclude_groups=exclude_groups)
        return self.materialize(out, n)

    def dispatch_packed(self, p1, a1, lens1, p2, a2, lens2,
                        exclude_groups=None):
        with_excl = exclude_groups is not None
        if with_excl and self._target_groups is None:
            raise ValueError("call set_exclusion() before passing "
                             "exclude_groups")
        if with_excl not in self._compiled:
            self._compiled[with_excl] = self._build_fn(with_excl)
        if jax.process_count() > 1:
            # every process streams the same reads (the reference's "all
            # ranks read the same block", querying.h:749-790) -> replicate
            put = lambda x: self._dist.put_replicated(np.asarray(x),
                                                      self.mesh)
        else:
            put = jnp.asarray
        # dummy placeholder for the unused packed-location operand: the
        # sharded keys array (never read when has_packed is False)
        loc_packed = self._loc_packed if self._loc_packed is not None \
            else self._keys
        eg = put(exclude_groups) if with_excl else None
        tg = self._target_groups if with_excl else None
        merged, best, best_rank, tot, ovf, summary, twh = \
            self._compiled[with_excl](
            put(p1), put(a1), put(lens1),
            put(p2), put(a2), put(lens2),
            self._keys, self._offsets, self._loc_tgt, self._loc_win,
            loc_packed, self._bucket_offsets,
            self._start_tbl, self._cnt_tbl, self._tct, self._lineage,
            self._hits_min_dev, self._hits_diff_dev,
            eg, tg)
        out = {"cand": merged, "best": best, "best_rank": best_rank,
               "match_total": tot, "match_overflow": ovf,
               "summary": summary}
        if self._direct_mb:
            out["_zero_overflow"] = True
        if twh is not None:
            out["target_window_hits"] = twh
        return out

    def materialize(self, out, n: int) -> BatchResult:
        return BatchResult(n, out,
                           has_target_window_hits=bool(self.target_window_k))

    def materialize_many(self, items):
        """One stacked summary transfer for several dispatched batches
        (see QueryEngine.materialize_many)."""
        outs = [o for o, _ in items]
        if outs and all(
                "summary" in o and getattr(o["summary"],
                                           "is_fully_addressable", True)
                for o in outs):
            host = np.asarray(jnp.stack([o["summary"] for o in outs]))
            for o, h in zip(outs, host):
                o["_summary_host"] = h
        return [self.materialize(o, n) for o, n in items]
