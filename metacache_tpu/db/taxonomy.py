"""Taxonomy: dense-array representation designed for on-device LCA.

The reference stores taxa in a ``std::set<taxon>`` with pointer-linked
lineages and a mutex-guarded ranked-lineage cache
(src/taxonomy.h:253-806). The TPU design replaces all of that with dense
int32 arrays indexed by *node index* (not NCBI taxid):

  - ``taxid[i]``      NCBI taxon id (negative ids = sequence-level taxa,
                      mirroring src/sketch_database.h:149-150)
  - ``parent[i]``     node index of parent (0 = no parent; node 0 is a
                      reserved null node)
  - ``rank[i]``       rank code 0..21 (see Rank)
  - ``ranked_lineage[i, r]`` node index of the ancestor at rank r
                      (0 = none) for r in 0..20 (Sequence..root) —
                      the device-side LCA table
  - ``name[i]``       python list (host only)

ranked_lca(a, b) = first r with lineage[a,r] == lineage[b,r] != 0
(src/taxonomy.h:539-546) — on device a vectorized masked-min over 21 lanes.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np


class Rank:
    """Rank codes, identical ordering to the reference enum
    (src/taxonomy.h:59-84)."""
    SEQUENCE = 0
    FORM = 1
    VARIETY = 2
    SUBSPECIES = 3
    SPECIES = 4
    SUBGENUS = 5
    GENUS = 6
    SUBTRIBE = 7
    TRIBE = 8
    SUBFAMILY = 9
    FAMILY = 10
    SUBORDER = 11
    ORDER = 12
    SUBCLASS = 13
    CLASS = 14
    SUBPHYLUM = 15
    PHYLUM = 16
    SUBKINGDOM = 17
    KINGDOM = 18
    DOMAIN = 19
    ROOT = 20
    NONE = 21

    NUM_RANKS = 21  # number of real ranks (Sequence..root inclusive = 0..20)


_RANK_NAMES = [
    "sequence", "form", "variety", "subspecies", "species", "subgenus",
    "genus", "subtribe", "tribe", "subfamily", "family", "suborder", "order",
    "subclass", "class", "subphylum", "phylum", "subkingdom", "kingdom",
    "domain", "root", "none",
]

# NCBI rank-name -> code (src/taxonomy.h:174-224 rank_from_name)
_NAME_TO_RANK: Dict[str, int] = {
    "sequence": Rank.SEQUENCE, "genome": Rank.SEQUENCE,
    "form": Rank.FORM, "forma": Rank.FORM,
    "variety": Rank.VARIETY, "varietas": Rank.VARIETY,
    "subspecies": Rank.SUBSPECIES,
    "species": Rank.SPECIES,
    "species group": Rank.SUBGENUS, "species subgroup": Rank.SUBGENUS,
    "subgenus": Rank.SUBGENUS,
    "genus": Rank.GENUS,
    "subtribe": Rank.SUBTRIBE,
    "tribe": Rank.TRIBE,
    "subfamily": Rank.SUBFAMILY,
    "family": Rank.FAMILY,
    "superfamily": Rank.SUBORDER, "parvorder": Rank.SUBORDER,
    "infraorder": Rank.SUBORDER, "suborder": Rank.SUBORDER,
    "order": Rank.ORDER,
    "superorder": Rank.SUBCLASS, "infraclass": Rank.SUBCLASS,
    "subclass": Rank.SUBCLASS,
    "class": Rank.CLASS,
    "superclass": Rank.SUBPHYLUM, "subphylum": Rank.SUBPHYLUM,
    "phylum": Rank.PHYLUM, "division": Rank.PHYLUM,
    "superphylum": Rank.SUBKINGDOM, "subkingdom": Rank.SUBKINGDOM,
    "kingdom": Rank.KINGDOM, "subdomain": Rank.KINGDOM,
    "superkingdom": Rank.DOMAIN, "domain": Rank.DOMAIN,
    "root": Rank.ROOT,
}


def rank_from_name(name: str) -> int:
    return _NAME_TO_RANK.get(name.strip().lower(), Rank.NONE)


def rank_name(code: int) -> str:
    if 0 <= code < len(_RANK_NAMES):
        return _RANK_NAMES[code]
    return "none"


NONE_TAXID = 0  # taxonomy::none_id


class Taxonomy:
    """Dense taxonomy. Node 0 is the reserved null node."""

    def __init__(self):
        self.taxid = np.zeros(1, dtype=np.int64)     # NCBI id (neg = sequence)
        self.parent_taxid = np.zeros(1, dtype=np.int64)
        self.rank = np.full(1, Rank.NONE, dtype=np.int8)
        self.names: List[str] = [""]
        # file source info for sequence-level taxa (filename, index, windows)
        self.source_filename: List[str] = [""]
        self.source_index = np.zeros(1, dtype=np.int64)
        self.source_windows = np.zeros(1, dtype=np.int64)
        self._id2node: Dict[int, int] = {}
        self._lineage_cache: Optional[np.ndarray] = None

    # ------------------------------------------------------------------ build
    def add_node(self, taxid: int, parent_taxid: int, name: str,
                 rank_code: int, source_filename: str = "",
                 source_index: int = 0, source_windows: int = 0) -> int:
        """Insert or update a node; returns its node index.

        Mirrors taxonomy::emplace semantics: an existing id keeps its node;
        re-adding updates fields that were previously unset.
        """
        node = self._id2node.get(taxid)
        if node is not None:
            if rank_code != Rank.NONE and self.rank[node] == Rank.NONE:
                self.rank[node] = rank_code
            if parent_taxid != NONE_TAXID and self.parent_taxid[node] == NONE_TAXID:
                self.parent_taxid[node] = parent_taxid
            if name and not self.names[node]:
                self.names[node] = name
            self._lineage_cache = None
            return node
        node = len(self.taxid)
        self.taxid = np.append(self.taxid, np.int64(taxid))
        self.parent_taxid = np.append(self.parent_taxid, np.int64(parent_taxid))
        self.rank = np.append(self.rank, np.int8(rank_code))
        self.names.append(name)
        self.source_filename.append(source_filename)
        self.source_index = np.append(self.source_index, np.int64(source_index))
        self.source_windows = np.append(self.source_windows,
                                        np.int64(source_windows))
        self._id2node[taxid] = node
        self._lineage_cache = None
        return node

    def bulk_add(self, taxids, parents, names, ranks) -> None:
        for t, p, n, r in zip(taxids, parents, names, ranks):
            self.add_node(int(t), int(p), n, int(r))

    # ------------------------------------------------------------------ query
    def __len__(self) -> int:
        return len(self.taxid)

    def node_of_id(self, taxid: int) -> int:
        """Node index for an NCBI taxid, 0 if unknown."""
        return self._id2node.get(taxid, 0)

    def parent_node(self, node: int) -> int:
        return self.node_of_id(int(self.parent_taxid[node]))

    def lineage_nodes(self, node: int) -> List[int]:
        """Full lineage node indices starting at `node` (src/taxonomy.h:600-625)."""
        out = []
        seen = set()
        while node != 0 and node not in seen:
            out.append(node)
            seen.add(node)
            node = self.parent_node(node)
        return out

    @property
    def ranked_lineage(self) -> np.ndarray:
        """[num_nodes, 21] int32 node index of ancestor at each rank (0=none).

        Rebuilt lazily after modifications — the dense analogue of
        ranked_lineages_cache (src/taxonomy.h:702-806).
        """
        if self._lineage_cache is None:
            n = len(self.taxid)
            lin = np.zeros((n, Rank.NUM_RANKS), dtype=np.int32)
            # vectorized pointer-jumping: walk all lineages in lock-step,
            # one pass per tree level (NCBI depth is ~40)
            parent_node = self._parent_node_array()
            cur = np.arange(n, dtype=np.int32)
            cur[0] = 0
            nodes = np.arange(n, dtype=np.int32)
            for _ in range(n + 1):
                active = cur != 0
                if not active.any():
                    break
                r = self.rank[cur]
                place = active & (r < Rank.NUM_RANKS)
                lin[nodes[place], r[place].astype(np.int64)] = cur[place]
                nxt = parent_node[cur]
                nxt = np.where(nxt == cur, 0, nxt)  # break self-cycles
                cur = np.where(active, nxt, 0).astype(np.int32)
            self._lineage_cache = lin
        return self._lineage_cache

    def _parent_node_array(self) -> np.ndarray:
        """[num_nodes] int32: node index of each node's parent (0 if none)."""
        order = np.argsort(self.taxid, kind="stable")
        sorted_ids = self.taxid[order]
        pos = np.searchsorted(sorted_ids, self.parent_taxid)
        pos = np.clip(pos, 0, len(sorted_ids) - 1)
        found = sorted_ids[pos] == self.parent_taxid
        pnode = np.where(found, order[pos], 0).astype(np.int32)
        pnode[self.parent_taxid == NONE_TAXID] = 0
        pnode[0] = 0
        return pnode

    def ranks_of(self, node: int) -> np.ndarray:
        return self.ranked_lineage[node]

    def ranked_lca_node(self, a: int, b: int) -> int:
        """First common entry of the two ranked lineages
        (src/taxonomy.h:539-546). Returns node index, 0 if none."""
        if a == 0 or b == 0:
            return 0
        la, lb = self.ranked_lineage[a], self.ranked_lineage[b]
        eq = (la == lb) & (la != 0)
        idx = np.nonzero(eq)[0]
        return int(la[idx[0]]) if len(idx) else 0

    def ancestor_at_rank(self, node: int, rank_code: int) -> int:
        """Ancestor on exactly `rank_code`, 0 if none (taxonomy::ancestor)."""
        if node == 0 or rank_code >= Rank.NUM_RANKS:
            return 0
        return int(self.ranked_lineage[node, rank_code])

    def next_ranked_ancestor(self, node: int) -> int:
        """`node` itself if ranked, else closest ranked ancestor
        (src/taxonomy.h:549-576)."""
        while node != 0:
            if self.rank[node] != Rank.NONE:
                return node
            parent = self.parent_node(node)
            if parent == node:
                return 0
            node = parent
        return 0

    def covers_node(self, node: int) -> bool:
        """True if `node` lies on the lineage of any sequence-level taxon
        (sketch_database::covers, src/sketch_database.h:791-800)."""
        if node == 0:
            return False
        seq_nodes = np.nonzero(self.rank == Rank.SEQUENCE)[0]
        for sn in seq_nodes:
            if node in self.lineage_nodes(int(sn)):
                return True
        return False

    # ------------------------------------------------------------- serialize
    def to_arrays(self) -> Dict[str, np.ndarray]:
        return {
            "taxid": self.taxid,
            "parent_taxid": self.parent_taxid,
            "rank": self.rank,
            "names": np.array(self.names, dtype=object),
            "source_filename": np.array(self.source_filename, dtype=object),
            "source_index": self.source_index,
            "source_windows": self.source_windows,
        }

    @classmethod
    def from_arrays(cls, arrs: Dict[str, np.ndarray]) -> "Taxonomy":
        t = cls()
        t.taxid = np.asarray(arrs["taxid"], dtype=np.int64)
        t.parent_taxid = np.asarray(arrs["parent_taxid"], dtype=np.int64)
        t.rank = np.asarray(arrs["rank"], dtype=np.int8)
        t.names = [str(x) for x in arrs["names"]]
        t.source_filename = [str(x) for x in arrs["source_filename"]]
        t.source_index = np.asarray(arrs["source_index"], dtype=np.int64)
        t.source_windows = np.asarray(arrs["source_windows"], dtype=np.int64)
        t._id2node = {int(tid): i for i, tid in enumerate(t.taxid) if i != 0}
        t._lineage_cache = None
        return t
