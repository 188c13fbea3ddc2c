"""Codec roundtrip property tests.

Mirrors the reference's tier-1 strategy
(/root/reference/test/test_block_codecs.cpp:9-49): magnitude sweep
2^1..2^24 x sizes {1, 16, 255, 256} x {known, unknown sum_of_values},
asserting exact roundtrip and exact consumed-byte count.
"""

import numpy as np
import pytest

from dint_ray.codecs import (interpolative, maskedvbyte, mixed, optpfor,
                             qmx, simple16, streamvbyte, u32, varbyte,
                             varint_g8iu, varintgb)
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
                                   varintgb, streamvbyte, optpfor,
                                   varint_g8iu, maskedvbyte, qmx, mixed])
@pytest.mark.parametrize("size", SIZES)
@pytest.mark.parametrize("mag", MAGNITUDES)
@pytest.mark.parametrize("sum_known", [False, True])
def test_roundtrip_sweep(codec, size, mag, sum_known):
    values = RNG.integers(0, 1 << mag, size=size).astype(np.uint32)
    _roundtrip(codec, values, sum_known)


def test_simple16_rejects_over_28_bits():
    with pytest.raises(ValueError):
        simple16.encode(np.array([1 << 28], dtype=np.uint32), U32_INVALID)


def test_simple16_published_wire_vectors():
    """Hand-built words per the published s16 format (WWW'08 reference
    code): 4-bit selector in the top bits, values packed LSB-first."""
    def words(vals):
        return np.frombuffer(
            simple16.encode(np.array(vals, np.uint32), U32_INVALID), "<u4")

    # 28 one-bit values -> selector 0, payload bits 0..27 all set
    np.testing.assert_array_equal(words([1] * 28), [0x0FFFFFFF])
    # 14 values of 3 -> selector 4 (14x2), every 2-bit field = 0b11
    np.testing.assert_array_equal(words([3] * 14), [0x4FFFFFFF])
    # mixed widths hit selector 2 (7x1, 7x2, 7x1): first seven 1-bit
    # values at bits 0..6, seven 2-bit at 7..20, seven 1-bit at 21..27
    v = [1] * 7 + [2] * 7 + [0] * 7
    expect = (2 << 28) | 0x7F | (0b10101010101010 << 7)
    np.testing.assert_array_equal(words(v), [expect])
    # a lone value of 5 first fits selector 5 (widths 4,3,3,...)
    np.testing.assert_array_equal(words([5]), [(5 << 28) | 5])
    # single 28-bit value -> selector 15
    np.testing.assert_array_equal(
        words([(1 << 28) - 1]), [(15 << 28) | ((1 << 28) - 1)])
    # greedy split: 28 ones then a 14-bit value -> selector 0 word
    # followed by a selector-14 word (2x14) holding [9999, 0]
    np.testing.assert_array_equal(
        words([1] * 28 + [9999]), [0x0FFFFFFF, (14 << 28) | 9999])


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


def test_interpolative_c_kernel_byte_identical():
    """native.interp_encode must be byte-for-byte the Python bit
    writer on every (size, magnitude, known/unknown-sum) combination —
    it is the hot encoder for partial blocks and direct-build
    segments, so divergence would corrupt indexes silently."""
    import pytest

    from dint_ray import native
    from dint_ray.config import U32_INVALID

    if native.get_lib()[1] is None:
        pytest.skip("no C compiler")
    rng = np.random.default_rng(17)
    for _ in range(400):
        n = int(rng.integers(1, 257))
        mag = int(rng.choice([2, 16, 1 << 10, 1 << 20, 1 << 27]))
        g = rng.integers(0, mag, n).astype(np.uint32)
        total = int(g.astype(np.uint64).sum())
        for sv in (U32_INVALID, total):
            if sv == U32_INVALID and total >= U32_INVALID:
                # self-described sum past the u32 wire limit: the
                # kernel must refuse (raise), never emit an oversized
                # varbyte header the wire contract forbids
                with pytest.raises(ValueError):
                    native.interp_encode(g, sv)
                continue
            py_bw = interpolative._BitWriter()
            prefix = np.cumsum(g.astype(np.uint64)).tolist()
            header = b""
            s = sv
            if s == U32_INVALID:
                s = int(prefix[-1])
                header = varbyte.encode_single(s)
            py_bw.write_interpolative(prefix, 0, n - 1, 0, s)
            py = header + py_bw.tobytes()
            c = native.interp_encode(g, sv)
            assert c == py, (n, mag, sv)


# --------------------------------------------------------------------------
# Elias-Fano + partitioned sequences (C12 family)
# --------------------------------------------------------------------------

def test_ef_roundtrip_magnitude_sweep():
    """compact EF over the reference's codec-test recipe
    (test_block_codecs.cpp:9-49 magnitudes x sizes, seeded)."""
    import numpy as np

    from dint_ray.codecs.ef import ef_decode, ef_encode

    rng = np.random.default_rng(12345)
    for mag in range(1, 25, 3):
        for n in (1, 16, 255, 256, 1000):
            u = max((1 << mag), n + 1)
            vals = np.sort(rng.integers(0, u, size=n, dtype=np.uint64))
            enc = ef_encode(vals, u)
            dec, off = ef_decode(enc)
            assert off == len(enc)
            assert np.array_equal(dec, vals), (mag, n)


def test_sequence_kinds_roundtrip_and_density():
    import numpy as np

    from dint_ray.index.sequences import (SEQ_KINDS, SequenceListView,
                                          write_sequence_list)

    rng = np.random.default_rng(77)
    for kind in SEQ_KINDS:
        for n, u in ((1, 10), (100, 200), (500, 100000), (5000, 5001)):
            docs = np.sort(rng.choice(u, size=min(n, u),
                                      replace=False)).astype(np.uint32)
            freqs = rng.integers(1, 300, len(docs)).astype(np.uint32)
            pl = write_sequence_list(docs, freqs, kind, universe=u)
            d, f = SequenceListView(pl).decode_all()
            assert np.array_equal(d, docs), (kind, n, u)
            assert np.array_equal(f, freqs), (kind, n, u)
    # all-ones partitions: a dense run must cost ~nothing
    docs = np.arange(4096, dtype=np.uint32)
    freqs = np.ones(4096, np.uint32)
    pl = write_sequence_list(docs, freqs, "pef_opt", universe=4096)
    # docs side is all-ones (near-free); the ~2 bits/posting left is the
    # freqs positive_sequence (EF over a unit-step cumsum)
    assert len(pl) * 8 / 4096 < 2.5


def test_pef_index_kind_end_to_end():
    """build_index_local with sequence kinds + full verify replay +
    query equality vs the DINT index."""
    import numpy as np

    from dint_ray.index.build import build_index_local, verify_index
    from dint_ray.queries import algorithms as qa

    rng = np.random.default_rng(3)
    postings = {}
    for t in range(20):
        n = int(rng.integers(5, 2000))
        docs = np.sort(rng.choice(8000, size=n, replace=False)).astype(np.uint32)
        freqs = rng.integers(1, 64, n).astype(np.uint32)
        postings[t] = (docs, freqs)
    sizes = rng.integers(8, 512, 8000).astype(np.uint32)
    ref = build_index_local(postings, sizes, 8000, kind="single_packed")
    for kind in ("ef", "pef_uniform", "pef_opt"):
        built = build_index_local(postings, sizes, 8000, kind=kind)
        verify_index(built.index, postings)
        for q in ([0, 3], [1, 2, 5], [7], [10, 11, 12, 13]):
            want = qa.wand(ref.index, ref.wand, q, k=10)
            got = qa.wand(built.index, built.wand, q, k=10)
            assert got == want, (kind, q)
