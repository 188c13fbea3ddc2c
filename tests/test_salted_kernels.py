"""Unit tests for the salted-merge kernels (postings.py).

The salted path's phase-2 merge is an ordered CONCAT that relies on one
sorted run per (term, bucket) with pairwise-disjoint doc ranges; the
kernel must also survive the invariant BREAKING (executor-split
partitions emit duplicate groups with interleaved ranges) via its
monotonicity audit + lexsort repair.
"""

import numpy as np
import pyarrow as pa
import pytest

from dint_ray.postings import (_concat_sorted_runs_block, _merge_runs_block,
                               _runs_from_runs_block)


def _runs_table(rows):
    return pa.table({
        "term_id": pa.array([r[0] for r in rows], pa.uint32()),
        "bucket": pa.array([r[1] for r in rows], pa.uint32()),
        "docs": pa.array([r[2].astype(np.uint32) for r in rows],
                         pa.list_(pa.uint32())),
        "freqs": pa.array([r[3].astype(np.uint32) for r in rows],
                          pa.list_(pa.uint32())),
    })


def _random_runs(seed, n_terms, universe, bucket_w, split_prob):
    """Random per-term postings cut into (term, bucket) runs; with
    split_prob some buckets yield two interleaved runs (the broken
    invariant)."""
    rng = np.random.default_rng(seed)
    rows = []
    for t in range(n_terms):
        df = int(rng.integers(1, min(universe, 1500)))
        docs = np.sort(rng.choice(universe, df, replace=False))
        tfs = rng.integers(1, 30, df)
        b = docs // bucket_w
        for bb in np.unique(b):
            idx = np.flatnonzero(b == bb)
            if len(idx) > 3 and rng.random() < split_prob:
                half = rng.random(len(idx)) < 0.5
                for sel in (idx[half], idx[~half]):
                    if len(sel):
                        rows.append((t, int(bb), docs[sel], tfs[sel]))
            else:
                rows.append((t, int(bb), docs[idx], tfs[idx]))
    rng.shuffle(rows)
    return rows


def _assert_equal(got: pa.Table, want: pa.Table):
    gs, ws = got.sort_by("term_id"), want.sort_by("term_id")
    assert gs.column("term_id").to_pylist() == ws.column("term_id").to_pylist()
    assert gs.column("docs").to_pylist() == ws.column("docs").to_pylist()
    assert gs.column("freqs").to_pylist() == ws.column("freqs").to_pylist()


def test_runs_from_runs_then_concat_matches_lexsort_merge():
    rows = _random_runs(5, n_terms=40, universe=9000, bucket_w=256,
                        split_prob=0.5)
    batch = _runs_table(rows)
    one_per_group = _runs_from_runs_block(batch)
    got = _concat_sorted_runs_block(one_per_group)
    _assert_equal(got, _merge_runs_block(batch))


def test_concat_repairs_interleaved_duplicate_groups():
    # EVERY bucket split into interleaved runs and fed straight to the
    # concat kernel (skipping the per-group merge) — the monotonicity
    # audit must reroute every term through the lexsort repair
    rows = _random_runs(9, n_terms=25, universe=5000, bucket_w=128,
                        split_prob=1.1)
    batch = _runs_table(rows)
    got = _concat_sorted_runs_block(batch)
    _assert_equal(got, _merge_runs_block(batch))


def test_concat_single_run_per_term():
    docs = np.array([3, 9, 77], dtype=np.uint32)
    tfs = np.array([1, 2, 3], dtype=np.uint32)
    batch = _runs_table([(7, 0, docs, tfs)])
    got = _concat_sorted_runs_block(batch)
    assert got.column("term_id").to_pylist() == [7]
    assert got.column("docs").to_pylist() == [docs.tolist()]
    assert got.column("freqs").to_pylist() == [tfs.tolist()]


def test_concat_empty_batch():
    got = _concat_sorted_runs_block(_runs_table([]))
    assert got.num_rows == 0
    assert set(got.column_names) == {"term_id", "docs", "freqs"}
