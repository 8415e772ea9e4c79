import numpy as np
import pytest

from metacache_tpu.ops import encode

COMP = {"A": "T", "C": "G", "G": "C", "T": "A"}


def str_to_codes(s: str) -> np.ndarray:
    return encode.np_encode_bytes(np.frombuffer(s.encode(), dtype=np.uint8))


def encode_kmer_int(kmer: str) -> int:
    """Independent oracle: A=0 C=1 G=2 T=3, first char in highest bits."""
    v = 0
    for ch in kmer.upper():
        v = (v << 2) | {"A": 0, "C": 1, "G": 2, "T": 3}[ch]
    return v


def revcomp_str(s: str) -> str:
    return "".join(COMP[c] for c in reversed(s.upper()))


class TestReverseComplement:
    @pytest.mark.parametrize("kmer", ["ACGT", "AAAA", "TTTT", "ACGTACGTACGTACGT",
                                      "GATTACA", "CGCGCGCG", "A", "T"])
    def test_matches_string_oracle(self, kmer):
        k = len(kmer)
        v = np.uint32(encode_kmer_int(kmer))
        want = encode_kmer_int(revcomp_str(kmer))
        got = int(encode.np_reverse_complement_u32(v, k))
        assert got == want
        got_jax = int(np.asarray(encode.reverse_complement_u32(
            np.array([v], dtype=np.uint32), k))[0])
        assert got_jax == want

    def test_palindrome_is_fixed_point(self):
        v = np.uint32(encode_kmer_int("ACGT"))
        assert int(encode.np_reverse_complement_u32(v, 4)) == int(v)


class TestWindowStarts:
    def test_short_sequence_single_window(self):
        # for_each_window: sequence <= window -> exactly one window
        assert list(encode.window_starts(100, 128, 113)) == [0]
        assert list(encode.window_starts(128, 128, 113)) == [0]
        assert list(encode.window_starts(5, 128, 113)) == [0]

    def test_full_plus_tail(self):
        # len 300: full windows at 0 and 113 (113+128=241<=300); start 226:
        # 226+128=354>300 so not full; tail at 226 (< 300)
        assert list(encode.window_starts(300, 128, 113)) == [0, 113, 226]

    def test_tail_always_present_when_stride_lt_window(self):
        # stride < window => every sequence longer than one window has a tail
        # (the tail re-covers the remaining k-mers)
        assert list(encode.window_starts(241, 128, 113)) == [0, 113, 226]
        assert list(encode.window_starts(242, 128, 113)) == [0, 113, 226]
        # stride == window (non-overlapping): exact multiple -> no tail
        assert list(encode.window_starts(256, 128, 128)) == [0, 128]
        assert list(encode.window_starts(257, 128, 128)) == [0, 128, 256]

    def test_window_count_against_loop_oracle(self):
        def oracle(n, w, st):
            # direct transcription of for_each_window semantics
            if n <= w:
                return 1
            cnt = 0
            first = 0
            wend = w
            while wend <= n:
                cnt += 1
                first += st
                wend += st
            if first < n:
                cnt += 1
            return cnt
        rng = np.random.default_rng(0)
        for _ in range(200):
            n = int(rng.integers(1, 2000))
            w = int(rng.integers(2, 300))
            st = int(rng.integers(1, 300))
            assert encode.num_windows(n, w, st) == oracle(n, w, st), (n, w, st)


class TestWindowKmers:
    def test_simple_sequence(self):
        s = "ACGTACGTAC"
        k = 4
        codes = str_to_codes(s)[None, :]
        kmers, valid = encode.window_kmers(codes, np.array([len(s)], np.int32), k)
        kmers, valid = np.asarray(kmers)[0], np.asarray(valid)[0]
        assert valid.all()
        for i in range(len(s) - k + 1):
            sub = s[i:i + k]
            want = min(encode_kmer_int(sub), encode_kmer_int(revcomp_str(sub)))
            assert int(kmers[i]) == want

    def test_ambiguous_masks_covering_kmers(self):
        s = "ACGTNACGTA"
        k = 4
        codes = str_to_codes(s)[None, :]
        _, valid = encode.window_kmers(codes, np.array([len(s)], np.int32), k)
        valid = np.asarray(valid)[0]
        # positions whose 4-mer covers index 4 ('N') are invalid: 1,2,3,4
        want = np.array([True, False, False, False, False, True, True])
        np.testing.assert_array_equal(valid, want)

    def test_valid_len_masks_tail(self):
        s = "ACGTACGTAC"
        k = 4
        codes = str_to_codes(s)[None, :]
        _, valid = encode.window_kmers(codes, np.array([6], np.int32), k)
        valid = np.asarray(valid)[0]
        # only kmers fully within first 6 chars: positions 0,1,2
        np.testing.assert_array_equal(valid, [True, True, True] + [False] * 4)

    def test_np_mirror_agrees(self):
        rng = np.random.default_rng(1)
        chars = np.array(list(b"ACGTN"), dtype=np.uint8)
        PAD = 160
        for k in (4, 11, 16):
            for _ in range(6):
                L = int(rng.integers(16, 130))
                seq = chars[rng.integers(0, 5, size=PAD)]
                codes = encode.np_encode_bytes(seq)
                kj, vj = encode.window_kmers(codes[None, :],
                                             np.array([L], np.int32), k)
                kn, vn = encode.np_window_kmers(codes, L, k)
                np.testing.assert_array_equal(np.asarray(kj)[0], kn)
                np.testing.assert_array_equal(np.asarray(vj)[0], vn)
