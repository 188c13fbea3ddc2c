"""Doc-stat slicing: owners/encoders hold O(bucket) arrays, never
O(num_docs) (VERDICT r2 item 1; reference wand_data.hpp:17-63 mmaps one
image instead of heap-copying per thread)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dint_ray.fixtures import pages_fixture_path

N_DOCS, VOCAB = 600, 80


def test_write_sizes_sorted_and_range_reads(tmp_path):
    from dint_ray.index.docstats import (DocStats, streaming_len_stats,
                                         write_sizes_sorted)

    rng = np.random.default_rng(3)
    ids = rng.permutation(1000)[:700]      # gaps: some docs have no rows
    lens = rng.integers(1, 500, size=700)
    t = pa.table({"doc_id": pa.array(ids.astype(np.uint64), pa.uint64()),
                  "len": pa.array(lens.astype(np.int64), pa.int64())})
    path = os.path.join(tmp_path, "sizes.parquet")
    write_sizes_sorted(t, path, row_group_size=64)
    back = pq.read_table(path)
    got_ids = back.column("doc_id").to_numpy()
    assert (np.diff(got_ids.astype(np.int64)) > 0).all()
    assert pq.ParquetFile(path).num_row_groups > 1

    total, rows = streaming_len_stats(path)
    assert total == int(lens.sum()) and rows == 700

    full = np.zeros(1000, dtype=np.uint32)
    full[ids] = lens
    stats = DocStats(path, 1000, total / 1000, cache_slices=2)
    for lo, hi in ((0, 250), (250, 500), (990, 1000), (0, 1000)):
        np.testing.assert_array_equal(stats.range_lens(lo, hi),
                                      full[lo:hi])
    # row-group pruning: a 250-doc slice must not materialize all rows
    fresh = DocStats(path, 1000, total / 1000)
    fresh.range_lens(0, 250)
    assert fresh.rows_read < 700

    n = stats.range_norms32(0, 250)
    avg32 = np.float32(total / 1000)
    np.testing.assert_array_equal(
        n, (full[:250].astype(np.float32) / avg32).astype(np.float32))


def test_docstats_cache_is_bounded(tmp_path):
    from dint_ray.index.docstats import DocStats, write_sizes_sorted

    t = pa.table({"doc_id": pa.array(np.arange(100, dtype=np.uint64)),
                  "len": pa.array(np.full(100, 7, dtype=np.int64))})
    path = os.path.join(tmp_path, "sizes.parquet")
    write_sizes_sorted(t, path)
    stats = DocStats(path, 100, 7.0, cache_slices=2)
    for lo in range(0, 100, 10):
        stats.range_lens(lo, lo + 10)
        stats.range_norms32(lo, lo + 10)
    assert len(stats._cache) <= 2


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from dint_ray.pipelines.build import build_index_ray

    out = str(tmp_path_factory.mktemp("dsidx"))
    pages = pages_fixture_path(N_DOCS, VOCAB, seed=13)
    build_index_ray(pages, out, kind="single_packed")
    return out


def test_partition_scorer_resident_stats_are_bucket_sized(built):
    from dint_ray.pipelines.partitioned import (PartitionScorer,
                                                build_serve_partitions)

    num_buckets = 4
    serve = build_serve_partitions(built, num_buckets)
    width = (N_DOCS + num_buckets - 1) // num_buckets
    s = PartitionScorer(built, serve, 1)
    assert s.local_sizes.size <= width < N_DOCS
    assert s.wand.norms(np.float32).vals.size <= width
    assert s.wand.norms(np.float64).vals.size <= width
    # no attribute anywhere holds an O(num_docs) doc-stat vector
    for name, v in vars(s).items():
        if isinstance(v, np.ndarray) and v.dtype in (np.uint32, np.float32,
                                                     np.float64):
            if name == "df_global":       # O(num_terms), not num_docs
                continue
            assert v.size < N_DOCS, name


def test_sorted_sizes_still_match_unsorted_semantics(built):
    """sizes.parquet is now sorted; every doc's len must equal the
    token count (spot-check vs the fixture text)."""
    import re

    sz = pq.read_table(os.path.join(built, "sizes.parquet"))
    ids = sz.column("doc_id").to_numpy()
    assert (np.diff(ids.astype(np.int64)) > 0).all()
    pages = pq.read_table(pages_fixture_path(N_DOCS, VOCAB, seed=13),
                          columns=["doc_id", "text"])
    lens = dict(zip(ids.tolist(), sz.column("len").to_numpy().tolist()))
    tok = re.compile(r"[a-z0-9]+")
    for i in (0, 5, 100, N_DOCS - 1):
        text = pages.column("text")[i].as_py()
        assert lens[pages.column("doc_id")[i].as_py()] == \
            len(tok.findall(text.lower()))
