import numpy as np

from metacache_tpu.config import FEATURE_SENTINEL, SketchParams
from metacache_tpu.ops import encode, sketch
from tests.test_encode import encode_kmer_int, revcomp_str, str_to_codes
from tests.test_hashes import scalar_thomas_mueller


def oracle_sketch(s: str, k: int, sketch_size: int):
    """Direct transcription of single_function_unique_min_hasher semantics:
    sorted-insert of the s smallest unique hashes of all unambiguous
    canonical kmers (src/hash_dna.h:115-152)."""
    n = len(s)
    if n < k:
        return []
    smax = min(sketch_size, n - k + 1)
    if smax < 1:
        return []
    buf = [0xFFFFFFFF] * smax
    for i in range(n - k + 1):
        sub = s[i:i + k].upper()
        if any(c not in "ACGT" for c in sub):
            continue
        km = min(encode_kmer_int(sub), encode_kmer_int(revcomp_str(sub)))
        h = scalar_thomas_mueller(km)
        if h < buf[-1]:
            # insert sorted if not already present
            import bisect
            pos = bisect.bisect_left(buf, h)
            if pos < len(buf) and buf[pos] != h:
                buf.pop()
                buf.insert(pos, h)
    return [x for x in buf if x != 0xFFFFFFFF]


def device_sketch(s: str, k: int, sketch_size: int, pad_to=None):
    codes = str_to_codes(s)
    if pad_to and pad_to > len(codes):
        codes = np.concatenate(
            [codes, np.full(pad_to - len(codes), 255, np.uint8)])
    out = np.asarray(sketch.sketch_windows(
        codes[None, :], np.array([len(s)], np.int32), k, sketch_size))[0]
    return [int(x) for x in out if x != FEATURE_SENTINEL]


RNG = np.random.default_rng(7)


def random_seq(n, alphabet="ACGT"):
    return "".join(RNG.choice(list(alphabet)) for _ in range(n))


def test_full_window_matches_oracle():
    p = SketchParams()
    s = random_seq(p.window_size)
    assert device_sketch(s, p.kmer_size, p.sketch_size) == \
        oracle_sketch(s, p.kmer_size, p.sketch_size)


def test_short_window():
    p = SketchParams()
    for n in [10, 16, 17, 20, 31, 50]:
        s = random_seq(n)
        got = device_sketch(s, p.kmer_size, p.sketch_size, pad_to=p.window_size)
        assert got == oracle_sketch(s, p.kmer_size, p.sketch_size), n


def test_window_shorter_than_k_is_empty():
    p = SketchParams()
    s = random_seq(p.kmer_size - 1)
    assert device_sketch(s, p.kmer_size, p.sketch_size, pad_to=128) == []


def test_ambiguous_heavy_window():
    p = SketchParams()
    s = random_seq(128, alphabet="ACGTNNNN")
    assert device_sketch(s, p.kmer_size, p.sketch_size) == \
        oracle_sketch(s, p.kmer_size, p.sketch_size)


def test_all_ambiguous_is_empty():
    assert device_sketch("N" * 128, 16, 16) == []


def test_repetitive_sequence_dedup():
    # AAAA... has a single distinct kmer -> sketch of size 1
    got = device_sketch("A" * 128, 16, 16)
    assert len(got) == 1
    assert got == oracle_sketch("A" * 128, 16, 16)


def test_many_random_cases():
    # fixed (k, sketch_size, pad) combos to bound jit recompiles
    for k, ssz in [(4, 8), (12, 16), (16, 16), (16, 32), (7, 1)]:
        for _ in range(6):
            n = int(RNG.integers(1, 200))
            s = random_seq(n, alphabet="ACGTACGTN")
            got = device_sketch(s, k, ssz, pad_to=256)
            assert got == oracle_sketch(s, k, ssz), (n, k, ssz, s)


def test_batched_consistency():
    p = SketchParams()
    seqs = [random_seq(p.window_size) for _ in range(32)]
    codes = np.stack([str_to_codes(s) for s in seqs])
    lens = np.full(32, p.window_size, np.int32)
    out = np.asarray(sketch.sketch_windows(codes, lens, p.kmer_size,
                                           p.sketch_size))
    for i, s in enumerate(seqs):
        got = [int(x) for x in out[i] if x != FEATURE_SENTINEL]
        assert got == oracle_sketch(s, p.kmer_size, p.sketch_size)
