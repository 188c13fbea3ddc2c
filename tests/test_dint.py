"""DINT dictionary + codec tests (reference tier-1/2 for the novel part).

Fixture recipes follow FIXTURES.md F5: zero-run-rich blocks (runs of
15/16/17/31/64/255/256 -> run codewords + DP run edges,
dint_codecs.hpp:166-182) and exception-rich blocks (values >= 65536 ->
4-byte escapes, dint_codecs.hpp:199-207).
"""

import numpy as np
import pytest

from dint_ray.config import INVALID_INDEX, RESERVED
from dint_ray.dint import codec as dc
from dint_ray.dint.dictionary import (
    LookupTable,
    build_packed_multi,
    build_packed_single,
    load,
    save_multi,
    save_single,
)
from dint_ray.util import hash_pattern, window_hashes

RNG = np.random.default_rng(42)


def _mk_targets():
    """A plausible DSF output: some 16/8/4/2/1-grams."""
    targets = []
    targets.append(np.zeros(8, dtype=np.uint32))
    targets.append(np.array([1] * 16, dtype=np.uint32))
    targets.append(np.array([0, 1, 0, 1], dtype=np.uint32))
    targets.append(np.array([2, 3], dtype=np.uint32))
    for v in [0, 1, 2, 3, 5, 7, 100, 1000]:
        targets.append(np.array([v], dtype=np.uint32))
    targets.append(np.array([0, 1], dtype=np.uint32))       # prefix of [0,1,0,1]
    targets.append(np.array([4, 4, 4, 4], dtype=np.uint32))
    return targets


@pytest.fixture(scope="module")
def single_dict():
    return build_packed_single(_mk_targets())


@pytest.fixture(scope="module")
def multi_dict():
    per = []
    for s in range(6):
        ts = _mk_targets()
        if s % 2:
            ts.append(np.array([s, s, s, s, s, s, s, s], dtype=np.uint32))
        per.append(ts)
    return build_packed_multi(per)


def test_window_hashes_match_scalar():
    buf = RNG.integers(0, 50, 64).astype(np.uint32)
    for s in (1, 2, 4, 8, 16):
        hs = window_hashes(buf, s)
        for i in (0, 5, len(buf) - s):
            assert hs[i] == hash_pattern(buf[i : i + s])


def test_lookup_table_last_wins():
    lut = LookupTable.from_pairs([(10, 1), (20, 2), (10, 3)])
    assert lut.lookup(10) == 3
    assert lut.lookup(20) == 2
    assert lut.lookup(99) == INVALID_INDEX


def test_reserved_layout(single_dict):
    d = single_dict
    # codewords 2..6: zero runs 256..16 (single_dictionary.hpp:39-56)
    assert list(d.lengths[2:7]) == [256, 128, 64, 32, 16]
    assert (d.entries16[2:7] == 0).all()
    # appended entries begin at codeword 7
    assert d.size >= RESERVED + len(_mk_targets()) - 0


def test_prefix_compaction(single_dict):
    d = single_dict
    # [0,1] was appended after [0,1,0,1]; the packed table should not
    # store it separately: its entry content must still decode as [0,1]
    for i in range(RESERVED, d.size):
        e = d.entry(i)
        ln = int(d.lengths[i])
        assert len(e) == ln


def _roundtrip_block(buf, d, encode, decode):
    blob = encode(buf)
    arr = np.frombuffer(blob + b"\x55" * 8, dtype=np.uint8)
    out, off = decode(arr, 0, int(buf.sum()), len(buf))
    np.testing.assert_array_equal(out, buf)
    assert off == len(blob)


BLOCKS = []
# random small gaps (dict hits + exceptions)
BLOCKS.append(RNG.integers(0, 8, 256).astype(np.uint32))
# zero-run rich
b = np.zeros(256, dtype=np.uint32)
b[0] = 5
b[200] = 9
BLOCKS.append(b)
b2 = np.zeros(256, dtype=np.uint32)
for pos, ln in [(0, 15), (20, 17), (60, 31), (100, 64)]:
    b2[pos + ln] = 3
BLOCKS.append(b2)
# exception rich (values >= 65536 -> 4-byte escapes)
b3 = RNG.integers(0, 4, 256).astype(np.uint32)
b3[[7, 50, 130]] = [70000, 65536, 2**31 + 17]
b3[[8, 9]] = [65535, 12345]
BLOCKS.append(b3)
# all zeros (single 256-run codeword)
BLOCKS.append(np.zeros(256, dtype=np.uint32))


@pytest.mark.parametrize("blk", range(len(BLOCKS)))
def test_single_opt_roundtrip(single_dict, blk):
    buf = BLOCKS[blk]
    _roundtrip_block(
        buf,
        single_dict,
        lambda x: dc.encode_block_opt(x, single_dict),
        lambda a, o, s, n: dc.decode_single(a, o, s, n, single_dict),
    )


@pytest.mark.parametrize("blk", range(len(BLOCKS)))
def test_single_greedy_roundtrip(single_dict, blk):
    buf = BLOCKS[blk]
    _roundtrip_block(
        buf,
        single_dict,
        lambda x: dc.encode_block_greedy(x, single_dict),
        lambda a, o, s, n: dc.decode_single(a, o, s, n, single_dict),
    )


@pytest.mark.parametrize("blk", range(len(BLOCKS)))
def test_multi_roundtrip(multi_dict, blk):
    buf = BLOCKS[blk]
    _roundtrip_block(
        buf,
        multi_dict,
        lambda x: dc.encode_block_multi(x, multi_dict),
        lambda a, o, s, n: dc.decode_multi(a, o, s, n, multi_dict),
    )


def test_all_zero_block_is_one_codeword(single_dict):
    blob = dc.encode_block_opt(np.zeros(256, dtype=np.uint32), single_dict)
    assert len(blob) == 2  # one 16-bit run-256 codeword
    assert blob == (2).to_bytes(2, "little")


def test_opt_never_larger_than_greedy(single_dict):
    for buf in BLOCKS:
        opt = dc.encode_block_opt(buf, single_dict)
        greedy = dc.encode_block_greedy(buf, single_dict)
        assert len(opt) <= len(greedy)


def test_multi_never_larger_than_single_plus_control(single_dict, multi_dict):
    # multi picks the best of 12 encodings; with identical dict content
    # it costs at most single + 1 control byte
    for buf in BLOCKS:
        single = dc.encode_block_opt(buf, single_dict)
        multi = dc.encode_block_multi(buf, multi_dict)
        assert len(multi) <= len(single) + 1


def test_partial_block_uses_interpolative(single_dict):
    buf = RNG.integers(0, 100, 100).astype(np.uint32)
    blob = dc.encode_single(buf, int(buf.sum()), single_dict)
    arr = np.frombuffer(blob, dtype=np.uint8)
    out, off = dc.decode_single(arr, 0, int(buf.sum()), 100, single_dict)
    np.testing.assert_array_equal(out, buf)


def test_dict_artifact_roundtrip(tmp_path, single_dict, multi_dict):
    p1 = str(tmp_path / "single.npz")
    save_single(p1, single_dict)
    d2 = load(p1)
    np.testing.assert_array_equal(d2.offsets, single_dict.offsets)
    np.testing.assert_array_equal(d2.table, single_dict.table)
    buf = BLOCKS[0]
    assert dc.encode_block_opt(buf, d2) == dc.encode_block_opt(buf, single_dict)

    p2 = str(tmp_path / "multi.npz")
    save_multi(p2, multi_dict)
    m2 = load(p2)
    assert dc.encode_block_multi(buf, m2) == dc.encode_block_multi(buf, multi_dict)


# --------------------------------------------------------------------------
# overlap compaction (D6, dictionary_building_utils.hpp:63-239)
# --------------------------------------------------------------------------

def test_overlap_compaction_locates_every_target():
    from dint_ray.dint.dictionary import (build_packed_single,
                                          build_packed_single_overlap)

    rng = np.random.default_rng(77)
    targets = []
    # overlapping family: suffix of one = prefix of another
    base = [int(x) for x in rng.integers(0, 50, size=24)]
    for ln in (16, 8, 4, 2, 1):
        for s in range(0, 8):
            targets.append(np.asarray(base[s : s + ln], dtype=np.uint32))
    targets.append(np.asarray(base[:3], dtype=np.uint32))  # substring case
    seen = set()
    uniq_targets = []
    for t in targets:
        k = tuple(t.tolist())
        if k not in seen and len(k):
            seen.add(k)
            uniq_targets.append(t)

    d_over = build_packed_single_overlap(uniq_targets)
    d_pack = build_packed_single(uniq_targets)
    # same codeword assignment, every entry recoverable
    assert d_over.size == d_pack.size
    from dint_ray.config import RESERVED

    for i in range(RESERVED, d_over.size):
        np.testing.assert_array_equal(d_over.entry(i), d_pack.entry(i))
    # the point of the policy: a smaller table
    assert len(d_over.table) <= len(d_pack.table)


def test_overlap_dict_codec_roundtrip():
    from dint_ray.dint.codec import SingleDintCodec
    from dint_ray.dint.dictionary import build_packed_single_overlap
    from dint_ray.dint import stats as st
    from dint_ray.config import DintConfig

    rng = np.random.default_rng(123)
    bufs = [st.docs_gap_buffer(np.sort(
        rng.choice(50000, size=n, replace=False)).astype(np.uint32))
        for n in (300, 700, 1200)]
    counts, total = st.collect_single(bufs)
    targets = st.select_targets(counts, total, DintConfig())
    codec = SingleDintCodec(build_packed_single_overlap(targets))
    for buf in bufs:
        blob = codec.encode(buf, int(buf.sum()))
        out, consumed = codec.decode(
            np.frombuffer(blob, dtype=np.uint8), 0, int(buf.sum()), len(buf))
        np.testing.assert_array_equal(out, buf)
        assert consumed == len(blob)


def test_rect_dictionary_matches_packed_stream():
    """single_rect: fixed 16-u32 slots; the codeword stream (and so
    bits/int) must equal single_packed built from the same stats
    (reference README rows 1-2 are identical,
    rectangular_dictionary.hpp:14-227)."""
    import numpy as np

    from dint_ray.index.build import build_index_local, verify_index

    rng = np.random.default_rng(17)
    postings = {}
    for t in range(25):
        n = int(rng.integers(10, 3000))
        docs = np.sort(rng.choice(10000, size=n, replace=False)).astype(np.uint32)
        freqs = rng.integers(1, 32, n).astype(np.uint32)
        postings[t] = (docs, freqs)
    sizes = rng.integers(8, 512, 10000).astype(np.uint32)
    packed = build_index_local(postings, sizes, 10000, kind="single_packed")
    rect = build_index_local(postings, sizes, 10000, kind="single_rect")
    verify_index(rect.index, postings)
    bp = packed.stats_bits_per_int()["bits_per_posting_pair"]
    br = rect.stats_bits_per_int()["bits_per_posting_pair"]
    assert abs(bp - br) < 1e-9
    # payloads byte-identical: same codeword values, same layout
    for t in postings:
        assert packed.index.payloads[t] == rect.index.payloads[t]


def test_c_opt_encoder_matches_python(single_dict, multi_dict):
    """The C DP encode kernel (native.dint_opt_encode) must be
    BYTE-identical to the pure-Python _opt_encode_core on every block
    shape — same window hashing, same DP tie-breaking, same emission."""
    from dint_ray import native

    if not native.available():
        pytest.skip("C kernels unavailable")
    rng = np.random.default_rng(123)
    blocks = list(BLOCKS)
    # partial tails and odd lengths (DP tail-codeword paths)
    for n in (1, 2, 15, 17, 255):
        blocks.append(rng.integers(0, 300, n).astype(np.uint32))
    for buf in blocks:
        hashes, tails = dc._precompute_hashes(buf)
        for lk, b in ((single_dict.lookup, 16),
                      (multi_dict.dicts[0].lookup, 16),
                      (multi_dict.small_lookups[0], 8),
                      (multi_dict.small_lookups[3], 8)):
            want = dc._opt_encode_core(buf, lk, b, hashes, tails)
            got = native.opt_encode(buf, lk, b)
            assert got == want, (len(buf), b)


def test_c_write_list_matches_python(single_dict, monkeypatch):
    """The whole-list C kernel (native.dint_write_list) must be
    BYTE-identical to the per-block Python composition in
    index/layout.py write_posting_list — header, maxs, endpoints,
    full-block DP sections and partial-block interpolative tails."""
    from dint_ray import native
    from dint_ray.dint.codec import SingleDintCodec
    from dint_ray.index import layout as L

    if not native.available():
        pytest.skip("C kernels unavailable")
    dcodec = SingleDintCodec(single_dict)
    fcodec = SingleDintCodec(single_dict)
    rng = np.random.default_rng(7)
    # list shapes: single partial block, exactly one block, several
    # blocks + tail, dense (gap-0 runs), sparse (big gaps)
    for n, gap_hi in ((1, 5), (133, 4), (256, 4), (257, 4), (1000, 3),
                      (2049, 50), (700, 100000)):
        gaps = rng.integers(1, gap_hi + 1, n).astype(np.uint64)
        docs = (np.cumsum(gaps) - 1).astype(np.uint32)
        freqs = rng.integers(1, 30, n).astype(np.uint32)
        got = L.write_posting_list(docs, freqs, dcodec, fcodec)
        with monkeypatch.context() as m:
            m.setattr(native, "write_list", lambda *a, **k: None)
            want = L.write_posting_list(docs, freqs, dcodec, fcodec)
        assert got == want, n


def test_c_aligned_hashes_match_numpy():
    """native.aligned_window_hashes must be VALUE-identical to the
    numpy polynomial+finalizer in stats.aligned_hashes (the stats
    mining and resolve passes key everything on these hashes)."""
    from dint_ray import native
    from dint_ray.util import _M, _finalize

    if not native.available():
        pytest.skip("C kernels unavailable")
    rng = np.random.default_rng(11)
    for n in (0, 1, 15, 16, 17, 4096, 100003):
        buf = rng.integers(0, 1 << 31, n).astype(np.uint32)
        for s in (16, 8, 4, 2, 1):
            got = native.aligned_hashes(buf, s)
            m = n // s * s
            if not m:
                assert len(got) == 0
                continue
            w = buf[:m].reshape(-1, s).astype(np.uint64)
            h = np.zeros(len(w), dtype=np.uint64)
            with np.errstate(over="ignore"):
                for j in range(s):
                    h = h * _M + w[:, j]
            assert (got == _finalize(h, s)).all(), (n, s)


def test_single_packed8_roundtrip():
    """single_packed8 — the comment-compiled single-dictionary b=8
    variant (dint_configuration.hpp:6-29): 256-entry dictionary,
    single-byte codeword stream.  Every list must roundtrip, the
    stream must be narrower than b=16 on dictionary-codeword-dense
    data, and the C whole-list writer must NOT have been used (its
    streams are b=16)."""
    import numpy as np

    from dint_ray.index.build import build_index_local, verify_index

    rng = np.random.default_rng(23)
    postings = {}
    for t in range(20):
        n = int(rng.integers(1, 2000))
        docs = np.sort(rng.choice(9000, size=n, replace=False)).astype(np.uint32)
        freqs = rng.integers(1, 9, n).astype(np.uint32)
        postings[t] = (docs, freqs)
    sizes = rng.integers(8, 512, 9000).astype(np.uint32)
    li8 = build_index_local(postings, sizes, 9000, kind="single_packed8")
    verify_index(li8.index, postings)
    # dictionary capacity honored: every codeword fits one byte
    assert li8.dicts.docs_dict.size <= 256
    assert li8.dicts.freqs_dict.size <= 256
