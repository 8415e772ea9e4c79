import numpy as np

from metacache_tpu.db.taxonomy import Rank, Taxonomy, rank_from_name, rank_name
from metacache_tpu.ops.classify_op import classify_lca
from tests.util_oracles import oracle_classify

RNG = np.random.default_rng(5)


def make_taxonomy():
    """root -> 2 domains -> 2 genera each -> 2 species each -> seq taxa."""
    t = Taxonomy()
    t.add_node(1, 1, "root", Rank.ROOT)
    nid = 10
    seqs = []
    for d in range(2):
        dom = nid; nid += 1
        t.add_node(dom, 1, f"domain{d}", Rank.DOMAIN)
        for g in range(2):
            gen = nid; nid += 1
            t.add_node(gen, dom, f"genus{d}{g}", Rank.GENUS)
            for s in range(2):
                sp = nid; nid += 1
                t.add_node(sp, gen, f"species{d}{g}{s}", Rank.SPECIES)
                seq_id = -(len(seqs) + 1)
                t.add_node(seq_id, sp, f"seq{d}{g}{s}", Rank.SEQUENCE)
                seqs.append(seq_id)
    return t, seqs


class TestTaxonomy:
    def test_rank_names_roundtrip(self):
        for code, name in [(Rank.SEQUENCE, "sequence"), (Rank.SPECIES, "species"),
                           (Rank.GENUS, "genus"), (Rank.DOMAIN, "domain"),
                           (Rank.ROOT, "root")]:
            assert rank_name(code) == name
            assert rank_from_name(name) == code
        assert rank_from_name("superkingdom") == Rank.DOMAIN
        assert rank_from_name("varietas") == Rank.VARIETY
        assert rank_from_name("no circle") == Rank.NONE

    def test_ranked_lineage(self):
        t, seqs = make_taxonomy()
        n = t.node_of_id(seqs[0])
        lin = t.ranks_of(n)
        assert lin[Rank.SEQUENCE] == n
        assert t.names[lin[Rank.SPECIES]] == "species000"
        assert t.names[lin[Rank.GENUS]] == "genus00"
        assert t.names[lin[Rank.DOMAIN]] == "domain0"
        assert t.names[lin[Rank.ROOT]] == "root"
        assert lin[Rank.FAMILY] == 0

    def test_ranked_lca(self):
        t, seqs = make_taxonomy()
        a = t.node_of_id(seqs[0])  # d0 g0 s0
        b = t.node_of_id(seqs[1])  # d0 g0 s1
        c = t.node_of_id(seqs[3])  # d0 g1 s1
        d = t.node_of_id(seqs[4])  # d1 g0 s0
        assert t.names[t.ranked_lca_node(a, b)] == "genus00"
        assert t.names[t.ranked_lca_node(a, c)] == "domain0"
        assert t.names[t.ranked_lca_node(a, d)] == "root"
        assert t.ranked_lca_node(a, a) == a

    def test_ancestor_at_rank(self):
        t, seqs = make_taxonomy()
        n = t.node_of_id(seqs[0])
        assert t.names[t.ancestor_at_rank(n, Rank.SPECIES)] == "species000"
        assert t.ancestor_at_rank(n, Rank.FAMILY) == 0

    def test_next_ranked_ancestor(self):
        t = Taxonomy()
        t.add_node(1, 1, "root", Rank.ROOT)
        t.add_node(5, 1, "unranked", Rank.NONE)
        t.add_node(6, 5, "leaf", Rank.NONE)
        n = t.node_of_id(6)
        assert t.names[t.next_ranked_ancestor(n)] == "root"

    def test_serialization_roundtrip(self):
        t, seqs = make_taxonomy()
        t2 = Taxonomy.from_arrays(t.to_arrays())
        np.testing.assert_array_equal(t.ranked_lineage, t2.ranked_lineage)
        assert t2.node_of_id(seqs[0]) == t.node_of_id(seqs[0])


class TestClassifyLCA:
    def run_both(self, cands, hits_min, frac, highest):
        t, seqs = make_taxonomy()
        lin = t.ranked_lineage
        C = 4
        tax = np.zeros((1, C), np.int32)
        hits = np.zeros((1, C), np.int32)
        for i, (tx, h) in enumerate(cands):
            tax[0, i] = tx
            hits[0, i] = h
        best, rank = classify_lca(tax, hits, lin, np.int32(hits_min),
                                  np.float32(frac), highest)
        want = oracle_classify([{"tax": int(t_), "hits": int(h)}
                                for t_, h in cands],
                               lin, hits_min, frac, highest)
        assert int(best[0]) == want, (cands, int(best[0]), want)
        return t, int(best[0]), int(rank[0])

    def test_single_candidate(self):
        t, _ = make_taxonomy()
        a = t.node_of_id(-1)
        _, best, rank = self.run_both([(a, 10)], 5, 1.0, Rank.DOMAIN)
        assert best == a and rank == Rank.SEQUENCE

    def test_below_hitsmin_unclassified(self):
        t, _ = make_taxonomy()
        a = t.node_of_id(-1)
        _, best, rank = self.run_both([(a, 4)], 5, 1.0, Rank.DOMAIN)
        assert best == 0 and rank == Rank.NONE

    def test_two_candidates_same_genus(self):
        t, _ = make_taxonomy()
        a, b = t.node_of_id(-1), t.node_of_id(-2)
        tt, best, rank = self.run_both([(a, 10), (b, 9)], 5, 1.0, Rank.DOMAIN)
        assert tt.names[best] == "genus00" and rank == Rank.GENUS

    def test_second_below_threshold_ignored(self):
        t, _ = make_taxonomy()
        a, b = t.node_of_id(-1), t.node_of_id(-2)
        # threshold = (10-5)*1.0 = 5; hits=5 not > 5 -> ignored
        _, best, rank = self.run_both([(a, 10), (b, 5)], 5, 1.0, Rank.DOMAIN)
        assert best == a

    def test_lca_above_highest_unclassified(self):
        t, _ = make_taxonomy()
        a, d = t.node_of_id(-1), t.node_of_id(-5)  # different domains
        _, best, _ = self.run_both([(a, 10), (d, 9)], 5, 1.0, Rank.DOMAIN)
        assert best == 0  # LCA = root > domain

    def test_random_votes(self):
        t, seqs = make_taxonomy()
        nodes = [t.node_of_id(s) for s in seqs]
        for _ in range(40):
            k = int(RNG.integers(1, 5))
            cands = sorted(
                [(nodes[RNG.integers(0, len(nodes))], int(RNG.integers(0, 20)))
                 for _ in range(k)], key=lambda x: -x[1])
            self.run_both(cands, int(RNG.integers(0, 8)),
                          float(RNG.choice([0.0, 0.5, 0.8, 1.0])), Rank.DOMAIN)
