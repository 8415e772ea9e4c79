"""NCBI-scale taxonomy construction tests.

The real NCBI nodes.dmp has ~2.4M nodes; construction must be vectorized
(bulk array ops), not per-node appends. Reference parse semantics:
src/taxonomy_io.cpp:56-181.
"""
import os
import time

import numpy as np
import pytest

from metacache_tpu.db.taxonomy import NONE_TAXID, Rank, Taxonomy
from metacache_tpu.io import taxonomy_io


def synth_nodes_dmp(path: str, n: int, seed: int = 7) -> np.ndarray:
    """Write a synthetic nodes.dmp with n nodes forming a random forest
    rooted at taxid 1. Returns the parent array (parent[i] = parent taxid
    of taxid i+1)."""
    rng = np.random.default_rng(seed)
    ids = np.arange(1, n + 1, dtype=np.int64)
    # parent of node i is a uniformly random smaller id -> bounded depth
    parent = np.empty(n, dtype=np.int64)
    parent[0] = 1
    parent[1:] = rng.integers(1, ids[1:])
    rank_names = ["no rank", "species", "genus", "family", "order", "class",
                  "phylum", "superkingdom"]
    ranks = rng.integers(0, len(rank_names), size=n)
    with open(path, "w") as f:
        for i in range(n):
            f.write(f"{ids[i]}\t|\t{parent[i]}\t|\t{rank_names[ranks[i]]}\t|\n")
    return parent


class TestScale:
    def test_2m_node_ingest_fast(self, tmp_path):
        n = 2_000_000
        nodes_file = str(tmp_path / "nodes.dmp")
        parent = synth_nodes_dmp(nodes_file, n)

        t0 = time.perf_counter()
        tax = taxonomy_io.make_taxonomic_hierarchy(nodes_file)
        parse_s = time.perf_counter() - t0
        assert len(tax) == n + 1  # + null node
        # budget: parse + bulk insert must be "a few seconds"
        assert parse_s < 20.0, f"nodes.dmp ingest too slow: {parse_s:.1f}s"

        # spot-check structure
        for tid in (1, 2, n // 2, n):
            node = tax.node_of_id(tid)
            assert node != 0
            assert int(tax.taxid[node]) == tid
            assert int(tax.parent_taxid[node]) == int(parent[tid - 1])
        assert tax.rank[tax.node_of_id(1)] == Rank.ROOT

        # ranked lineage build is vectorized pointer jumping
        t0 = time.perf_counter()
        lin = tax.ranked_lineage
        lineage_s = time.perf_counter() - t0
        assert lin.shape == (n + 1, Rank.NUM_RANKS)
        assert lineage_s < 30.0, f"lineage build too slow: {lineage_s:.1f}s"
        # every node's root-lane ancestor is the root node
        root = tax.node_of_id(1)
        assert int(lin[tax.node_of_id(n), Rank.ROOT]) == root

    def test_lineage_correct_vs_walk(self, tmp_path):
        n = 5000
        nodes_file = str(tmp_path / "nodes.dmp")
        synth_nodes_dmp(nodes_file, n, seed=11)
        tax = taxonomy_io.make_taxonomic_hierarchy(nodes_file)
        lin = tax.ranked_lineage
        rng = np.random.default_rng(3)
        for tid in rng.integers(1, n + 1, size=50):
            node = tax.node_of_id(int(tid))
            want = np.zeros(Rank.NUM_RANKS, dtype=np.int32)
            for anc in tax.lineage_nodes(node):
                r = int(tax.rank[anc])
                if r < Rank.NUM_RANKS:
                    # reference overwrites while walking up: farthest
                    # ancestor wins a duplicated rank (taxonomy.h:581-585)
                    want[r] = anc
            np.testing.assert_array_equal(lin[node], want)


class TestBulkAddSemantics:
    def test_duplicate_in_batch_first_valid_wins(self):
        t = Taxonomy()
        t.bulk_add([5, 5, 5], [NONE_TAXID, 3, 4],
                   ["", "beta", "gamma"], [Rank.NONE, Rank.GENUS, Rank.SPECIES])
        n = t.node_of_id(5)
        assert int(t.parent_taxid[n]) == 3       # first non-none parent
        assert int(t.rank[n]) == Rank.GENUS      # first non-none rank
        assert t.names[n] == "beta"              # first non-empty name

    def test_existing_node_only_unset_fields_update(self):
        t = Taxonomy()
        t.add_node(7, 2, "alpha", Rank.SPECIES)
        t.bulk_add([7], [9], ["other"], [Rank.GENUS])
        n = t.node_of_id(7)
        assert int(t.parent_taxid[n]) == 2
        assert int(t.rank[n]) == Rank.SPECIES
        assert t.names[n] == "alpha"

    def test_existing_node_unset_fields_fill(self):
        t = Taxonomy()
        t.add_node(7, NONE_TAXID, "", Rank.NONE)
        t.bulk_add([7], [9], ["other"], [Rank.GENUS])
        n = t.node_of_id(7)
        assert int(t.parent_taxid[n]) == 9
        assert int(t.rank[n]) == Rank.GENUS
        assert t.names[n] == "other"

    def test_mixed_bulk_and_incremental_equivalent(self):
        rows = [(1, 1, "root", Rank.ROOT), (10, 1, "a", Rank.DOMAIN),
                (20, 10, "b", Rank.GENUS), (30, 20, "c", Rank.SPECIES),
                (20, 99, "zz", Rank.FAMILY)]  # dup: must not override
        t1 = Taxonomy()
        for r in rows:
            t1.add_node(*r)
        t2 = Taxonomy()
        t2.bulk_add([r[0] for r in rows], [r[1] for r in rows],
                    [r[2] for r in rows], [r[3] for r in rows])
        assert len(t1) == len(t2)
        np.testing.assert_array_equal(t1.taxid, t2.taxid)
        np.testing.assert_array_equal(t1.parent_taxid, t2.parent_taxid)
        np.testing.assert_array_equal(t1.rank, t2.rank)
        assert t1.names == t2.names
        np.testing.assert_array_equal(t1.ranked_lineage, t2.ranked_lineage)


class TestCoveredMask:
    def test_covers_matches_lineage_walk(self):
        t = Taxonomy()
        t.add_node(1, 1, "root", Rank.ROOT)
        t.add_node(10, 1, "d", Rank.DOMAIN)
        t.add_node(20, 10, "g", Rank.GENUS)
        t.add_node(21, 10, "g2", Rank.GENUS)  # no sequence below
        t.add_node(-1, 20, "s1", Rank.SEQUENCE)
        seq = t.node_of_id(-1)
        on_lineage = set(t.lineage_nodes(seq))
        for node in range(len(t)):
            assert t.covers_node(node) == (node in on_lineage), node

    def test_cache_invalidation(self):
        t = Taxonomy()
        t.add_node(1, 1, "root", Rank.ROOT)
        t.add_node(10, 1, "d", Rank.DOMAIN)
        assert not t.covers_node(t.node_of_id(10))
        t.add_node(-1, 10, "s", Rank.SEQUENCE)
        assert t.covers_node(t.node_of_id(10))
