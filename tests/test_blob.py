"""Blob export: single-file shard image with EF endpoint directory
(dict_freq_index.hpp:96-100 parity — the reference keeps list
endpoints as a compact-Elias-Fano sequence over one payload stream)."""

import numpy as np
import pytest

from dint_ray.fixtures import pages_fixture_path
from dint_ray.index.blob import BlobView, write_blob


def test_blob_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    n = 300
    tids = np.sort(rng.choice(10_000, n, replace=False)).astype(np.uint64)
    payloads = [rng.integers(0, 256, int(rng.integers(1, 400)))
                .astype(np.uint8).tobytes() for _ in range(n)]
    path = str(tmp_path / "s.blob")
    st = write_blob(path, tids, payloads)
    assert st["n_lists"] == n
    assert st["blob_bytes"] == sum(len(p) for p in payloads)
    v = BlobView(path)
    assert len(v) == n
    np.testing.assert_array_equal(v.term_ids, tids.astype(np.uint32))
    for i in rng.choice(n, 40, replace=False):
        assert bytes(v.payload(int(i))) == payloads[int(i)]
    # by term id, including misses
    for i in (0, 7, n - 1):
        assert bytes(v.payload_of_term(int(tids[i]))) == payloads[i]
    missing = int(tids[-1]) + 1
    assert v.payload_of_term(missing) is None


def test_blob_directory_is_compact(tmp_path):
    # EF directory must be far smaller than raw u64 offsets
    n = 5_000
    tids = np.arange(n, dtype=np.uint64)
    payloads = [b"x" * 100] * n
    st = write_blob(str(tmp_path / "s.blob"), tids, payloads)
    assert st["directory_bytes"] < 16 * n / 4   # < 4 B/list vs 16 raw


def test_export_shards_to_blobs_matches_parquet(tmp_path, ray_session):
    from dint_ray.index.blob import export_shards_to_blobs
    from dint_ray.index.build import load_codec_bundle
    from dint_ray.index.layout import PostingListView
    from dint_ray.index.shards import load_shards
    from dint_ray.pipelines.build import build_index_ray

    out = str(tmp_path / "idx")
    build_index_ray(pages_fixture_path(500, 200, seed=4), out)
    stats = export_shards_to_blobs(out)
    assert stats and all(s["n_lists"] > 0 for s in stats)
    bundle = load_codec_bundle(out, "single_packed")
    dc, fc = bundle.codecs()
    idx, _, manifest = load_shards(out, dc, fc)
    import os
    seen = 0
    for i in range(len(stats)):
        v = BlobView(os.path.join(out, "blobs", f"shard-{i}.blob"))
        for j, tid in enumerate(v.term_ids):
            want_docs, want_freqs = idx.decode(int(tid))
            got = PostingListView(
                np.frombuffer(v.payload(j), np.uint8), dc, fc)
            gd, gf = got.decode_all()
            np.testing.assert_array_equal(gd, want_docs)
            np.testing.assert_array_equal(gf, want_freqs)
            seen += 1
    assert seen == manifest["num_terms"]
