"""Codec roundtrip property tests.

Mirrors the reference's tier-1 strategy
(/root/reference/test/test_block_codecs.cpp:9-49): magnitude sweep
2^1..2^24 x sizes {1, 16, 255, 256} x {known, unknown sum_of_values},
asserting exact roundtrip and exact consumed-byte count.
"""

import numpy as np
import pytest

from dint_ray.codecs import interpolative, simple16, u32, varbyte, varintgb
from dint_ray.config import U32_INVALID

RNG = np.random.default_rng(12345)
SIZES = [1, 16, 255, 256]
MAGNITUDES = [1, 4, 8, 16, 24]


def _roundtrip(codec, values, sum_known):
    sov = int(values.sum()) if sum_known else U32_INVALID
    blob = codec.encode(values, sov)
    tail = b"\xaa" * 7  # ensure decode does not depend on trailing bytes
    buf = np.frombuffer(blob + tail, dtype=np.uint8)
    out, consumed = codec.decode(buf, 0, sov, len(values))
    np.testing.assert_array_equal(out.astype(np.uint64), values.astype(np.uint64))
    assert consumed == len(blob)


@pytest.mark.parametrize("codec", [u32, varbyte, interpolative, simple16,
                                   varintgb])
@pytest.mark.parametrize("size", SIZES)
@pytest.mark.parametrize("mag", MAGNITUDES)
@pytest.mark.parametrize("sum_known", [False, True])
def test_roundtrip_sweep(codec, size, mag, sum_known):
    values = RNG.integers(0, 1 << mag, size=size).astype(np.uint32)
    _roundtrip(codec, values, sum_known)


def test_simple16_rejects_over_28_bits():
    with pytest.raises(ValueError):
        simple16.encode(np.array([1 << 28], dtype=np.uint32), U32_INVALID)


def test_varintgb_full_range():
    values = np.array([0, 255, 256, 65535, 65536, 2**24 - 1, 2**24,
                       2**32 - 1, 7], dtype=np.uint32)
    _roundtrip(varintgb, values, False)


def test_varbyte_singles():
    for v in [0, 1, 127, 128, 16383, 16384, 2**21 - 1, 2**28, 2**32 - 1]:
        blob = varbyte.encode_single(v)
        buf = np.frombuffer(blob, dtype=np.uint8)
        out, off = varbyte.decode_single(buf, 0)
        assert out == v and off == len(blob)


def test_interpolative_all_zero_known_sum_is_empty():
    # docs gaps block of consecutive docIDs: gaps all zero, sum known ->
    # zero payload bytes (every value pinned by the recursion bounds)
    values = np.zeros(255, dtype=np.uint32)
    blob = interpolative.encode(values, 0)
    assert blob == b""
    out, consumed = interpolative.decode(np.frombuffer(b"", dtype=np.uint8), 0, 0, 255)
    np.testing.assert_array_equal(out, values)
    assert consumed == 0


def test_interpolative_single_value():
    values = np.array([42], dtype=np.uint32)
    blob = interpolative.encode(values, 42)
    assert blob == b""  # n==1 with known sum needs no bits
    out, consumed = interpolative.decode(np.frombuffer(b"", np.uint8), 0, 42, 1)
    assert out[0] == 42
