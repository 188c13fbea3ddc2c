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
