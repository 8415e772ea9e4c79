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
from ..ops import classify_op, lookup, sketch
from ..query.engine import BatchResult, _rank_code, _window_starts_static


def make_mesh(devices=None, axis: str = "shard") -> Mesh:
    """Mesh over the given (default: ALL, incl. other hosts') devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def stack_shard_tables(dbs: List[Database], pad_keys_to=None,
                       pad_locs_to=None):
    """Pad shard feature tables to common sizes and stack to [P_local, ...].

    Multi-host: every process must pad to the same (global) sizes; pass the
    globally agreed pad_keys_to/pad_locs_to (see ShardedQueryEngine).
    """
    fmax = pad_keys_to or max(d.features.num_keys for d in dbs)
    lmax = pad_locs_to or max(d.features.num_locations for d in dbs)
    keys, offsets, tgts, wins = [], [], [], []
    for d in dbs:
        k, o, t, w = d.features.device_arrays(pad_keys_to=fmax,
                                              pad_locs_to=lmax)
        keys.append(k)
        offsets.append(o.astype(np.int32))
        tgts.append(t)
        wins.append(w)
    return (np.stack(keys), np.stack(offsets), np.stack(tgts),
            np.stack(wins))


class ShardedQueryEngine:
    """Query engine over a device mesh: one database shard per device.

    API-compatible with query.engine.QueryEngine (classify_batch).
    """

    def __init__(self, dbs: List[Database], classify: ClassifyParams,
                 pipeline: QueryPipelineParams = QueryPipelineParams(),
                 mesh: Optional[Mesh] = None):
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
        p = self.db.query_sketch_params
        self.sketch_params = p
        self.hits_min = classify.resolved_hits_min(p.sketch_size)
        self.lowest_rank = _rank_code(classify.lowest_rank)
        self.highest_rank = _rank_code(classify.highest_rank)
        self.starts = tuple(_window_starts_static(
            pipeline.max_query_len, p.window_size, p.window_stride))

        pad_f = max(d.features.num_keys for d in dbs)
        pad_l = max(d.features.num_locations for d in dbs)
        if multiproc:
            # all shards must pad to the same (global) table sizes, and the
            # unrolled-search step count is a static compile parameter —
            # agree across hosts
            from jax.experimental import multihost_utils
            g = multihost_utils.process_allgather(
                np.array([pad_f, pad_l], np.int64))
            pad_f, pad_l = int(g[:, 0].max()), int(g[:, 1].max())
        keys, offsets, tgts, wins = stack_shard_tables(
            dbs, pad_keys_to=pad_f, pad_locs_to=pad_l)
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
        self._loc_tgt = dist.put_sharded(tgts, mesh)
        self._loc_win = dist.put_sharded(wins, mesh)
        self._tct = dist.put_replicated(
            np.asarray(self.db.target_cand_tax(self.lowest_rank)), mesh)
        self._lineage = dist.put_replicated(
            self.db.taxonomy.ranked_lineage.astype(np.int32), mesh)
        self._dist = dist
        self._compiled = None

    # ------------------------------------------------------------------
    def _build_fn(self):
        p = self.sketch_params
        starts = self.starts
        lmax = self.pipeline.max_locations_per_query
        C = self.classify.max_candidates
        highest = self.highest_rank
        insert_max = self.classify.insert_size_max
        k, S, W, stride = (p.kmer_size, p.sketch_size, p.window_size,
                           p.window_stride)

        search_steps = self._search_steps

        def shard_fn(packed1, ambig1, lens1, packed2, ambig2, lens2,
                     keys, offsets, loc_tgt,
                     loc_win, buckets, tct, lineage, hits_min, hits_diff):
            from ..ops import encode
            codes1 = encode.unpack_codes(packed1, ambig1)
            codes2 = encode.unpack_codes(packed2, ambig2)
            # local shard block: leading axis of size 1
            keys, offsets = keys[0], offsets[0]
            loc_tgt, loc_win = loc_tgt[0], loc_win[0]
            buckets = buckets[0]
            B = codes1.shape[0]
            feats = []
            for codes, lens in ((codes1, lens1), (codes2, lens2)):
                for s in starts:
                    wcodes = codes[:, s:s + W]
                    if wcodes.shape[1] < W:
                        pad = jnp.full((B, W - wcodes.shape[1]), 255,
                                       dtype=jnp.uint8)
                        wcodes = jnp.concatenate([wcodes, pad], axis=1)
                    wlen = jnp.clip(lens - s, 0, W)
                    feats.append(sketch.sketch_windows(wcodes, wlen, k, S))
            features = jnp.concatenate(feats, axis=1)

            tgt, win, total, overflow = lookup.lookup_matches(
                features, keys, offsets, loc_tgt, loc_win, lmax,
                bucket_offsets=buckets, search_steps=search_steps)
            pair_len = jnp.maximum(lens1 + lens2, insert_max)
            num_windows = (2 + pair_len // stride).astype(jnp.int32)
            cand = cand_ops.generate_candidates(tgt, win, num_windows, tct, C)

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
            return merged, best, best_rank, ovf

        mesh = self.mesh
        fn = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P(),   # reads replicated
                      P("shard"), P("shard"), P("shard"), P("shard"),
                      P("shard"),
                      P(), P(), P(), P()),
            out_specs=(P(), P(), P(), P()),
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
        if exclude_groups is not None:
            raise NotImplementedError(
                "clade exclusion is not yet supported on the sharded engine")
        if self._compiled is None:
            self._compiled = self._build_fn()
        if jax.process_count() > 1:
            # every process streams the same reads (the reference's "all
            # ranks read the same block", querying.h:749-790) -> replicate
            put = lambda x: self._dist.put_replicated(np.asarray(x),
                                                      self.mesh)
        else:
            put = jnp.asarray
        merged, best, best_rank, ovf = self._compiled(
            put(p1), put(a1), put(lens1),
            put(p2), put(a2), put(lens2),
            self._keys, self._offsets, self._loc_tgt, self._loc_win,
            self._bucket_offsets, self._tct, self._lineage,
            jnp.int32(self.hits_min),
            jnp.float32(self.classify.hits_diff_fraction))
        return {"cand": merged, "best": best, "best_rank": best_rank,
                "match_overflow": ovf}

    def materialize(self, out, n: int) -> BatchResult:
        return BatchResult(n, out)
