import numpy as np
import pytest

from metacache_tpu.query import align


def brute_force_dp(query, subject):
    """Direct transcription of align_semi_global (src/alignment.h:176-279)."""
    lq, ls = len(query), len(subject)
    score = [[0] * (ls + 1) for _ in range(lq + 1)]
    pred = [[0] * (ls + 1) for _ in range(lq + 1)]  # 0 none 1 diag 2 up 3 left
    for q in range(1, lq + 1):
        for s in range(1, ls + 1):
            m = 2 if query[q - 1] == subject[s - 1] else -1
            best, p = score[q - 1][s - 1] + m, 1
            if score[q - 1][s] - 1 > best:
                best, p = score[q - 1][s] - 1, 2
            if score[q][s - 1] - 1 > best:
                best, p = score[q][s - 1] - 1, 3
            score[q][s] = best
            pred[q][s] = p
    bq, bs, bv = lq, ls, score[lq][ls]
    for q in range(1, lq):
        if score[q][ls] > bv:
            bq, bs, bv = q, ls, score[q][ls]
    for s in range(1, ls):
        if score[lq][s] > bv:
            bq, bs, bv = lq, s, score[lq][s]
    qa, sa = [], []
    q, s = bq, bs
    p = pred[q][s]
    while p:
        if p == 1:
            q -= 1; s -= 1
            qa.append(query[q]); sa.append(subject[s])
        elif p == 2:
            q -= 1
            qa.append(query[q]); sa.append("_")
        else:
            s -= 1
            qa.append("_"); sa.append(subject[s])
        p = pred[q][s]
    return bv, "".join(reversed(qa)), "".join(reversed(sa))


RNG = np.random.default_rng(8)


def rand_seq(n):
    return "".join(np.array(list("ACGT"))[RNG.integers(0, 4, n)])


def test_exact_substring():
    subject = rand_seq(200)
    query = subject[50:130]
    score, qa, sa = align.align_semi_global(query, subject)
    assert score == 2 * len(query)
    assert qa == query and sa == query


def test_matches_brute_force():
    for _ in range(15):
        q = rand_seq(int(RNG.integers(5, 40)))
        s = rand_seq(int(RNG.integers(5, 60)))
        want = brute_force_dp(q, s)
        got = align.align_semi_global(q, s)
        assert got == want, (q, s, got, want)


def test_mutated_alignment():
    subject = rand_seq(300)
    query = list(subject[100:200])
    query[30] = "A" if query[30] != "A" else "C"
    del query[60]
    query = "".join(query)
    score, qa, sa = align.align_semi_global(query, subject)
    want, _, _ = brute_force_dp(query, subject)
    assert score == want
    assert "_" in qa  # the deletion shows as a query gap


def test_reverse_complement_direction():
    subject = rand_seq(200)
    query = align.reverse_complement(subject[40:140])
    score, qa, sa = align.best_alignment_for_query(query, "", subject)
    assert score == 2 * len(query)
