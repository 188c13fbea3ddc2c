"""ds2i format adapter tests — including the reference's own bundled
test data (the only real, non-synthetic conformance artifacts present:
test_collection.sizes and the 500-query log; the .docs/.freqs blobs
are absent per /root/reference/.MISSING_LARGE_BLOBS)."""

import os

import numpy as np
import pytest

from dint_ray.sources import ds2i

REF_DATA = "/root/reference/test/test_data"


def test_roundtrip_freq_collection(tmp_path):
    rng = np.random.default_rng(3)
    postings = {}
    for t in range(20):
        n = int(rng.integers(1, 50))
        docs = np.sort(rng.choice(1000, size=n, replace=False)).astype(np.uint32)
        freqs = rng.integers(1, 9, size=n).astype(np.uint32)
        postings[t] = (docs, freqs)
    base = str(tmp_path / "coll")
    ds2i.write_freq_collection(base, 1000, postings)
    num_docs, got = ds2i.read_freq_collection(base)
    assert num_docs == 1000
    assert set(got) == set(postings)
    for t in postings:
        np.testing.assert_array_equal(got[t][0], postings[t][0])
        np.testing.assert_array_equal(got[t][1], postings[t][1])


@pytest.mark.skipif(not os.path.exists(REF_DATA), reason="reference absent")
def test_reference_sizes_file_parses():
    sizes = ds2i.read_sizes(os.path.join(REF_DATA, "test_collection.sizes"))
    # README.md:53: 10,000 documents
    assert len(sizes) == 10_000
    assert sizes.min() >= 0
    # lengths count token occurrences (>= the 3.3M distinct postings /
    # 10k docs = 332); observed mean is ~1770
    assert 332 < sizes.mean() < 10_000


@pytest.mark.skipif(not os.path.exists(REF_DATA), reason="reference absent")
def test_reference_query_log_parses():
    queries = ds2i.read_query_log(os.path.join(REF_DATA, "queries"))
    assert len(queries) == 500
    assert all(q and all(t >= 0 for t in q) for q in queries)
    assert max(len(q) for q in queries) <= 16


def test_ds2i_collection_feeds_local_build(tmp_path):
    """ds2i-prepared postings flow straight into the index builder."""
    from dint_ray.index.build import build_index_local, verify_index

    rng = np.random.default_rng(4)
    postings = {}
    for t in range(30):
        n = int(rng.integers(2, 400))
        docs = np.sort(rng.choice(5000, size=n, replace=False)).astype(np.uint32)
        freqs = rng.integers(1, 30, size=n).astype(np.uint32)
        postings[t] = (docs, freqs)
    base = str(tmp_path / "c")
    ds2i.write_freq_collection(base, 5000, postings)
    num_docs, loaded = ds2i.read_freq_collection(base)
    sizes = np.zeros(num_docs, dtype=np.uint32)
    for docs, freqs in loaded.values():
        sizes[docs] += freqs
    li = build_index_local(loaded, sizes, num_docs)
    verify_index(li.index, postings)


def test_blocks_collection_roundtrip(tmp_path):
    """S3 binary_blocks_collection: write -> read preserves (freq,
    values) pairs and their order; layout per
    binary_blocks_collection.hpp:121-137."""
    rng = np.random.default_rng(9)
    blocks = []
    for _ in range(50):
        n = int(rng.integers(1, 17))
        blocks.append((int(rng.integers(1, 1_000_000)),
                       rng.integers(0, 256, size=n).astype(np.uint32)))
    path = str(tmp_path / "stats.blocks")
    ds2i.write_blocks_collection(path, blocks)
    loaded = ds2i.read_blocks_collection(path)
    assert len(loaded) == len(blocks)
    for (f0, v0), (f1, v1) in zip(blocks, loaded):
        assert f0 == f1 and np.array_equal(v0, v1)


def test_blocks_collection_skips_empty_and_rejects_zero_header(tmp_path):
    # a hand-written stream with an interleaved zero-length word: the
    # reference iterator skips it (hpp:128 `while (!(n = ...))`)
    words = np.asarray([2,            # num_blocks
                        3, 7, 1, 2, 3,  # block 0: n=3 freq=7
                        0,             # empty seq, skipped
                        1, 9, 42],     # block 1: n=1 freq=9
                       dtype="<u4")
    path = str(tmp_path / "b.blocks")
    words.tofile(path)
    loaded = ds2i.read_blocks_collection(path)
    assert [(f, v.tolist()) for f, v in loaded] == [(7, [1, 2, 3]),
                                                    (9, [42])]
    tbl = ds2i.blocks_to_table(loaded)
    assert tbl.column("size").to_pylist() == [3, 1]
    assert tbl.column("freq").to_pylist() == [7, 9]

    np.asarray([0], dtype="<u4").tofile(path)
    with pytest.raises(ValueError):
        ds2i.read_blocks_collection(path)


def test_dicts_from_blocks_collection_match_mined(tmp_path):
    """Dictionaries mined from a precomputed S3 stats file equal the
    ones mined by scanning the postings (dictionary_builders.hpp
    consumes either source interchangeably)."""
    from dint_ray.dint import stats as st
    from dint_ray.index.build import (build_index_local,
                                      dicts_from_blocks_collections,
                                      mine_counts_local, verify_index)

    rng = np.random.default_rng(12)
    postings = {}
    for t in range(40):
        n = int(rng.integers(2, 500))
        docs = np.sort(rng.choice(20000, size=n,
                                  replace=False)).astype(np.uint32)
        freqs = rng.integers(1, 40, size=n).astype(np.uint32)
        postings[t] = (docs, freqs)
    sizes = np.zeros(20000, dtype=np.uint32)
    for docs, freqs in postings.values():
        sizes[docs] += freqs

    # export mined pattern statistics in the S3 on-disk shape
    doc_bufs = [st.docs_gap_buffer(d) for d, _ in postings.values()]
    freq_bufs = [st.freqs_gap_buffer(f) for _, f in postings.values()]
    paths = {}
    for name, bufs in (("docs", doc_bufs), ("freqs", freq_bufs)):
        counts, _ = mine_counts_local(bufs, multi=False)
        blocks = [(f, np.frombuffer(p, dtype="<u4"))
                  for p, f in counts[0].items()]
        paths[name] = str(tmp_path / f"{name}.blocks")
        ds2i.write_blocks_collection(paths[name], blocks)

    dicts = dicts_from_blocks_collections(paths["docs"], paths["freqs"])
    li = build_index_local(postings, sizes, num_docs=20000)
    for a, b in ((dicts.docs_dict, li.dicts.docs_dict),
                 (dicts.freqs_dict, li.dicts.freqs_dict)):
        assert np.array_equal(a.table, b.table)
        assert np.array_equal(a.offsets, b.offsets)
    li2 = build_index_local(postings, sizes, num_docs=20000, dicts=dicts)
    verify_index(li2.index, postings)
