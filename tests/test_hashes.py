import numpy as np

from metacache_tpu.ops import hashes


def scalar_thomas_mueller(x: int) -> int:
    M = 0xFFFFFFFF
    x = (((x >> 16) ^ x) * 0x45D9F3B) & M
    x = (((x >> 16) ^ x) * 0x45D9F3B) & M
    x = ((x >> 16) ^ x) & M
    return x


def scalar_murmur3_fmix32(x: int) -> int:
    M = 0xFFFFFFFF
    x ^= x >> 16
    x = (x * 0x85EBCA6B) & M
    x ^= x >> 13
    x = (x * 0xC2B2AE35) & M
    x ^= x >> 16
    return x


def scalar_murmur3_fmix64(x: int) -> int:
    M = 0xFFFFFFFFFFFFFFFF
    x ^= x >> 33
    x = (x * 0xFF51AFD7ED558CCD) & M
    x ^= x >> 33
    x = (x * 0xC4CEB9FE1A85EC53) & M
    x ^= x >> 33
    return x


def scalar_nvidia(x: int) -> int:
    M = 0xFFFFFFFF
    x = ((x + 0x7ED55D16) + (x << 12)) & M
    x = ((x ^ 0xC761C23C) ^ (x >> 19)) & M
    x = ((x + 0x165667B1) + (x << 5)) & M
    x = ((x + 0xD3A2646C) ^ (x << 9)) & M
    x = ((x + 0xFD7046C5) + (x << 3)) & M
    x = ((x ^ 0xB55A4F09) ^ (x >> 16)) & M
    return x


RNG = np.random.default_rng(42)
SAMPLES32 = np.concatenate([
    np.array([0, 1, 2, 0xFFFFFFFF, 0x80000000, 0x45D9F3B], dtype=np.uint64),
    RNG.integers(0, 2**32, size=1000, dtype=np.uint64),
]).astype(np.uint32)


def test_thomas_mueller_matches_scalar():
    got = np.asarray(hashes.thomas_mueller_hash(SAMPLES32))
    want = np.array([scalar_thomas_mueller(int(x)) for x in SAMPLES32],
                    dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_thomas_mueller_numpy_mirror():
    np.testing.assert_array_equal(
        hashes.np_thomas_mueller_hash(SAMPLES32),
        np.asarray(hashes.thomas_mueller_hash(SAMPLES32)))


def test_murmur3_fmix32_matches_scalar():
    got = np.asarray(hashes.murmur3_fmix32(SAMPLES32))
    want = np.array([scalar_murmur3_fmix32(int(x)) for x in SAMPLES32],
                    dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_nvidia_matches_scalar():
    got = np.asarray(hashes.nvidia_hash(SAMPLES32))
    want = np.array([scalar_nvidia(int(x)) for x in SAMPLES32], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_known_value_nonzero():
    # sanity: hash of 0 is 0 for thomas-mueller (fixed point), of 1 is not
    assert scalar_thomas_mueller(0) == 0
    assert int(np.asarray(hashes.thomas_mueller_hash(np.uint32(0)))) == 0
    assert int(np.asarray(hashes.thomas_mueller_hash(np.uint32(1)))) != 1
