"""Native C++ reader/encoder (metacache_tpu/native) parity vs the pure
Python readers (metacache_tpu/io/sequence_io.py) — both must implement the
reference's sequence_io semantics (src/sequence_io.cpp:100-560)."""
import gzip
import os

import numpy as np
import pytest

from metacache_tpu.io import sequence_io
from metacache_tpu.native import NativeBatchReader, encode_batch, load_mcio
from metacache_tpu.ops import encode
from metacache_tpu.query.engine import encode_read_into

pytestmark = pytest.mark.skipif(load_mcio() is None,
                                reason="native mcio unavailable")


def python_batches(f1, f2, pairing, B, L, limit=-1):
    """Reference batching via the Python reader + encoder."""
    out = []
    c1 = np.zeros((B, L), np.uint8)
    l1 = np.zeros(B, np.int32)
    c2 = np.zeros((B, L), np.uint8)
    l2 = np.zeros(B, np.int32)
    meta = []
    n = 0
    count = 0
    for r1, r2 in sequence_io.read_sequence_pairs(f1, f2, pairing):
        if limit > 0 and count >= limit:
            break
        count += 1
        if r1.empty:
            continue
        encode_read_into(c1, l1, n, r1.data, L)
        if r2 is not None and r2.data:
            encode_read_into(c2, l2, n, r2.data, L)
        else:
            l2[n] = 0
        meta.append((r1.index, r1.header))
        n += 1
        if n == B:
            p1, a1 = encode.np_pack_codes(c1)
            p2, a2 = encode.np_pack_codes(c2)
            out.append((n, p1, a1, l1.copy(), p2, a2, l2.copy(), meta))
            c1 = np.zeros((B, L), np.uint8)
            l1 = np.zeros(B, np.int32)
            c2 = np.zeros((B, L), np.uint8)
            l2 = np.zeros(B, np.int32)
            meta = []
            n = 0
    if n:
        p1, a1 = encode.np_pack_codes(c1)
        p2, a2 = encode.np_pack_codes(c2)
        out.append((n, p1, a1, l1.copy(), p2, a2, l2.copy(), meta))
    return out


def assert_same(native_batches, py_batches):
    assert len(native_batches) == len(py_batches)
    for nb, pb in zip(native_batches, py_batches):
        n, p1, a1, l1, p2, a2, l2, meta = pb
        assert nb.n == n
        assert np.array_equal(nb.lens1[:n], l1[:n])
        assert np.array_equal(nb.lens2[:n], l2[:n])
        assert np.array_equal(nb.packed1[:n], p1[:n])
        assert np.array_equal(nb.ambig1[:n], a1[:n])
        # mate-2 rows with len 0: python leaves stale zeros; only compare
        # rows that hold data
        for i in range(n):
            if l2[i]:
                assert np.array_equal(nb.packed2[i], p2[i])
                assert np.array_equal(nb.ambig2[i], a2[i])
        assert [(int(i), h) for i, h in
                zip(nb.indices, nb.headers)] == meta


@pytest.fixture
def world(tmp_path):
    fa = tmp_path / "g.fa"
    fa.write_text(">s1 first record\nACGTAC\nGTNNAC\n"
                  ">s2|taxid|77|\nTTTTGGGGCCCC\n"
                  ">s3\nA\n"
                  ">empty_data\n"
                  ">s4\nACGTACGTACGTACGTACGTACGTACGT\n")
    fq = tmp_path / "r.fq"
    fq.write_text("@q1\nACGTACGT\n+\nIIIIIIII\n"
                  "@q2 desc\nGGGGNNNN\n+x\nIIIIIIII\n"
                  "@q3\nCCCC\n+\nIIII\n")
    fagz = tmp_path / "g.fa.gz"
    with gzip.open(fagz, "wt") as f:
        f.write(fa.read_text())
    return str(fa), str(fq), str(fagz)


def collect(reader):
    return list(reader)


def test_fasta_single(world):
    fa, _, _ = world
    assert_same(collect(NativeBatchReader(fa, None, "none", 3, 32)),
                python_batches(fa, None, "none", 3, 32))


def test_fastq_single(world):
    _, fq, _ = world
    assert_same(collect(NativeBatchReader(fq, None, "none", 2, 16)),
                python_batches(fq, None, "none", 2, 16))


def test_fasta_gzip(world):
    fa, _, fagz = world
    assert_same(collect(NativeBatchReader(fagz, None, "none", 8, 32)),
                python_batches(fa, None, "none", 8, 32))


def test_pair_files(world):
    fa, fq, _ = world
    assert_same(collect(NativeBatchReader(fa, fq, "files", 4, 16)),
                python_batches(fa, fq, "files", 4, 16))


def test_pair_sequences(world):
    _, fq, _ = world
    assert_same(collect(NativeBatchReader(fq, None, "sequences", 4, 16)),
                python_batches(fq, None, "sequences", 4, 16))


def test_query_limit(world):
    fa, _, _ = world
    assert_same(collect(NativeBatchReader(fa, None, "none", 2, 32, limit=3)),
                python_batches(fa, None, "none", 2, 32, limit=3))


def test_truncation(world, tmp_path):
    fa = tmp_path / "long.fa"
    fa.write_text(">L\n" + "ACGT" * 100 + "\n")
    nb = collect(NativeBatchReader(str(fa), None, "none", 1, 64))
    pb = python_batches(str(fa), None, "none", 1, 64)
    assert_same(nb, pb)
    assert nb[0].lens1[0] == 64


def test_missing_file(tmp_path):
    with pytest.raises(OSError):
        NativeBatchReader(str(tmp_path / "nope.fa"), None, "none", 2, 16)


def test_malformed_fastq(tmp_path):
    bad = tmp_path / "bad.fq"
    bad.write_text("@q1\nACGT\nIIII\nACGT\n")  # missing '+' line
    r = NativeBatchReader(str(bad), None, "none", 2, 16)
    with pytest.raises(RuntimeError):
        next(r)


def test_encode_batch_matches_python():
    seqs = [b"ACGTNNACGT", b"", b"acgtacgtacgtacgt", b"XYZT"]
    res = encode_batch(seqs, 16)
    assert res is not None
    packed, ambig, lens = res
    B = len(seqs)
    codes = np.zeros((B, 16), np.uint8)
    ls = np.zeros(B, np.int32)
    for i, s in enumerate(seqs):
        encode_read_into(codes, ls, i, s.decode(), 16)
    p, a = encode.np_pack_codes(codes)
    assert np.array_equal(lens, ls)
    assert np.array_equal(packed, p)
    assert np.array_equal(ambig, a)
