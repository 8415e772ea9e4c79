"""Native (C++) build sketcher vs the device sketch pipeline: the
(feature, target, window) triples emitted by native.sketch_file /
sketch_sequences must be bit-identical to what db.build.WindowBatcher
produces through ops.sketch.sketch_windows (reference semantics:
add_all_window_sketches, src/sketch_database.h:1079-1097)."""
import numpy as np
import pytest

from metacache_tpu import native
from metacache_tpu.config import SketchParams
from metacache_tpu.db.build import TripleAccumulator, WindowBatcher
from metacache_tpu.ops import encode


pytestmark = pytest.mark.skipif(native.load_mcio() is None,
                                reason="native mcio unavailable")


def _oracle_triples(seqs, params, num_shards=1, shard_id=0):
    triples = TripleAccumulator()
    batcher = WindowBatcher(params, triples, batch_size=512)
    for t, seq in enumerate(seqs):
        if t % num_shards != shard_id:
            continue
        codes = encode.np_encode_bytes(
            np.frombuffer(seq, dtype=np.uint8))
        batcher.add_sequence(codes, t)
    batcher.finish()
    return triples.concat()


def _gen_seqs(rng, n, lens, with_ambig=True):
    bases = np.array(list("ACGTN" if with_ambig else "ACGT"))
    p = [0.24, 0.24, 0.24, 0.24, 0.04] if with_ambig else None
    out = []
    for i in range(n):
        L = lens[i % len(lens)]
        out.append("".join(
            rng.choice(bases, size=L, p=p)).encode())
    return out


@pytest.mark.parametrize("k,s,win,stride", [
    (16, 16, 128, 113),   # defaults
    (15, 8, 100, 80),     # non-default, overlapping windows
    (16, 16, 128, 150),   # stride > window (gaps)
])
def test_sketch_sequences_matches_device(k, s, win, stride):
    rng = np.random.default_rng(42)
    seqs = _gen_seqs(rng, 12, [5, 15, 16, 127, 128, 129, 500, 1000])
    params = SketchParams(kmer_size=k, sketch_size=s, window_size=win,
                          window_stride=stride)
    res = native.sketch_sequences(seqs, k, s, win, stride, t0=0)
    assert res is not None
    f0, t0, w0 = _oracle_triples(seqs, params)
    np.testing.assert_array_equal(res.feat, f0)
    np.testing.assert_array_equal(res.tgt, t0)
    np.testing.assert_array_equal(res.win, w0)
    # window counts match the host helper
    for i, seq in enumerate(seqs):
        assert res.seq_windows[i] == encode.num_windows(len(seq), win,
                                                        stride)
        assert res.seq_lens[i] == len(seq)


def test_sketch_sequences_shard_gate():
    rng = np.random.default_rng(1)
    seqs = _gen_seqs(rng, 9, [300, 400])
    params = SketchParams()
    p = params
    res = native.sketch_sequences(seqs, p.kmer_size, p.sketch_size,
                                  p.window_size, p.window_stride,
                                  t0=0, num_shards=3, shard_id=1)
    f0, t0, w0 = _oracle_triples(seqs, params, num_shards=3, shard_id=1)
    np.testing.assert_array_equal(res.feat, f0)
    np.testing.assert_array_equal(res.tgt, t0)
    assert set(np.unique(res.tgt)) <= {1, 4, 7}


def test_sketch_file_matches_and_headers(tmp_path):
    rng = np.random.default_rng(5)
    seqs = _gen_seqs(rng, 6, [200, 350, 1000])
    fa = tmp_path / "g.fa"
    with open(fa, "w") as f:
        for i, s_ in enumerate(seqs):
            f.write(f">NC_{i:06d}.1 desc{i}\n")
            d = s_.decode()
            for j in range(0, len(d), 70):
                f.write(d[j:j + 70] + "\n")
    p = SketchParams()
    res = native.sketch_file(str(fa), p.kmer_size, p.sketch_size,
                             p.window_size, p.window_stride, t0=10)
    assert res is not None
    assert res.headers == [f"NC_{i:06d}.1 desc{i}" for i in range(6)]
    f0, t0, w0 = _oracle_triples(seqs, p)
    np.testing.assert_array_equal(res.feat, f0)
    np.testing.assert_array_equal(res.tgt, t0 + 10)   # t0 offset applied
    np.testing.assert_array_equal(res.win, w0)
