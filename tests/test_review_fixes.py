"""Regressions for the round-3 self-review findings: bucket-edge
IndexError in SplitEncode, batch-composition-dependent pair buckets,
XOR digest cancellation, tiny-cluster pool clamp, and the _sum_by_key
distributed reduce being exact regardless of block structure."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dint_ray.fixtures import pages_fixture_path

N_DOCS, VOCAB = 600, 80


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from dint_ray.pipelines.build import build_index_ray

    out = str(tmp_path_factory.mktemp("rfidx"))
    pages = pages_fixture_path(N_DOCS, VOCAB, seed=13)
    build_index_ray(pages, out, kind="single_packed")
    return out


def test_serve_partitions_with_empty_trailing_buckets(built):
    """ceil(600/26)=24 docs/bucket fills only 25 buckets; the 26th is
    empty.  The old edge derivation indexed past the end of the cut
    array for every such (num_docs, num_buckets) pair."""
    from dint_ray.pipelines.partitioned import build_serve_partitions

    num_buckets = 26
    width = -(-N_DOCS // num_buckets)
    assert -(-N_DOCS // width) < num_buckets  # the failing regime
    serve = build_serve_partitions(built, num_buckets)

    import glob

    files = glob.glob(os.path.join(serve, "bucket=*", "*.parquet"))
    t = pa.concat_tables([pq.read_table(f, columns=["term_id", "df_local"])
                          for f in files])
    by_term = (t.group_by("term_id").aggregate([("df_local", "sum")])
               .to_pandas().set_index("term_id")["df_local_sum"])
    vocab = pq.read_table(os.path.join(built, "vocab.parquet"),
                          columns=["term_id", "df"]).to_pandas()
    for tid, df in zip(vocab["term_id"], vocab["df"]):
        assert by_term.get(tid, 0) == df, tid


def test_pair_bucket_independent_of_batch_composition():
    """The shuffle bucket of a (band_id, band_hash) value must be a
    function of the VALUE: the same 16-byte key must land in the same
    bucket whether its batch is uniform-width (vector path) or
    mixed-width (fallback path)."""
    from dint_ray.ops.dedup import _add_pair_bucket

    v16 = bytes(range(16))
    v4 = b"\x01\x02\x03\x04"

    def bucket_of(values, probe):
        t = pa.table({"band_id": pa.array([0] * len(values), pa.int32()),
                      "band_hash": pa.array(values, pa.binary()),
                      "doc_id": pa.array(range(len(values)), pa.int64())})
        out = _add_pair_bucket(t)
        i = values.index(probe)
        return out.column("bucket")[i].as_py()

    # 16-byte key: uniform batch vs mixed-width batch
    assert bucket_of([v16, bytes(16)], v16) == \
        bucket_of([v16, b"odd-width"], v16)
    # short key (< 8 bytes): uniform vs mixed
    assert bucket_of([v4, b"\x09\x08\x07\x06"], v4) == \
        bucket_of([v4, b"longer-than-eight"], v4)
    # null present forces the fallback path for the whole batch
    t = pa.table({"band_id": pa.array([0, 0], pa.int32()),
                  "band_hash": pa.array([v16, None], pa.binary()),
                  "doc_id": pa.array([0, 1], pa.int64())})
    assert _add_pair_bucket(t).column("bucket")[0].as_py() == \
        bucket_of([v16, bytes(16)], v16)


def test_index_digest_detects_duplicate_rows(tmp_path):
    """XOR-combining row hashes cancels any even number of identical
    rows; the digest must distinguish {row} from {row, row, row}."""
    import bench

    def make(dirname, rows):
        d = os.path.join(tmp_path, dirname, "shards", "shard=0")
        os.makedirs(d)
        pq.write_table(
            pa.table({"term_id": pa.array([r[0] for r in rows], pa.uint32()),
                      "payload": pa.array([r[1] for r in rows], pa.binary())}),
            os.path.join(d, "part.parquet"))
        return os.path.join(tmp_path, dirname)

    one = make("one", [(7, b"abc")])
    three = make("three", [(7, b"abc")] * 3)
    assert bench._index_digest(one) != bench._index_digest(three)
    assert bench._index_digest(one) == bench._index_digest(
        make("one_again", [(7, b"abc")]))


def test_pool_bounds_never_covers_all_cpus_on_tiny_clusters(monkeypatch,
                                                           ray_session):
    import ray

    from dint_ray.config import BuildConfig

    cfg = BuildConfig()
    for ncpu in (1, 2, 3, 8, 32):
        monkeypatch.setattr(ray, "cluster_resources",
                            lambda n=ncpu: {"CPU": float(n)})
        lo, hi = cfg.pool_bounds(0)
        assert 1 <= lo <= hi
        if ncpu > 1:
            # at least one CPU left for read tasks / shuffle aggregators
            assert hi < ncpu, ncpu
        # explicitly configured sizes are clamped the same way
        lo2, hi2 = cfg.pool_bounds(64)
        assert hi2 <= max(1, ncpu - 1)


def test_sum_by_key_distributed_is_exact(ray_session):
    """The forced-distributed branch must equal the driver group_by for
    every key even when partial rows for one key arrive in many blocks
    (the input below is deliberately split into 16 tiny blocks)."""
    import ray.data as rd

    from dint_ray.postings import _sum_by_key

    rng = np.random.default_rng(5)
    keys = [f"k{int(i):03d}" for i in rng.integers(0, 40, size=3000)]
    vals = rng.integers(1, 100, size=3000).astype(np.int64)
    t = pa.table({"term": pa.array(keys, pa.string()),
                  "df_part": pa.array(vals, pa.int64())})
    ds = rd.from_arrow(t).repartition(16)

    got = _sum_by_key(ds, "term", "df_part", "df", pa.string(),
                      driver_limit=0)
    got_pd = (got.to_pandas().sort_values("term").reset_index(drop=True))
    import pandas as pd

    exp = (pd.DataFrame({"term": keys, "df": vals})
           .groupby("term", as_index=False)["df"].sum()
           .sort_values("term").reset_index(drop=True))
    assert got_pd["term"].tolist() == exp["term"].tolist()
    assert got_pd["df"].astype(np.int64).tolist() == exp["df"].tolist()
    # exactly one row per key — no split-block duplicates
    assert got_pd["term"].is_unique


def test_aligned_hashes_wide_dtype_routes_to_numpy():
    """The C kernel hashes 32-bit windows; a uint64 input with values
    >= 2^32 must fall back (return None) rather than silently
    truncate, so it always agrees with the numpy path."""
    from dint_ray import native
    from dint_ray.dint import stats as st

    wide = np.array([1 << 40, (1 << 41) + 3, 7, 9, 1 << 33, 2, 5, 8],
                    dtype=np.uint64)
    assert native.aligned_hashes(wide, 4) is None
    # and the public stats path still produces hashes for wide input
    got = st.aligned_hashes(wide, 4)
    assert len(got) == 2
    if native.available():
        narrow = (wide & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        kern = native.aligned_hashes(narrow, 4)
        assert kern is not None
        np.testing.assert_array_equal(kern, st.aligned_hashes(narrow, 4))


def test_lookup_table_pickle_drops_probe_cache():
    """probe_table caches open-addressing slots (>= 4x entries at
    16 B/slot) on the LookupTable; pickling the dictionary bundle must
    not ship it — each process rebuilds lazily."""
    import pickle

    from dint_ray import native
    from dint_ray.dint.dictionary import LookupTable

    lt = LookupTable.from_pairs([(h, h % 97) for h in
                                 range(1000, 2000, 7)])
    if native.available():
        native.probe_table(lt)
        assert getattr(lt, "_probe", None) is not None
    else:
        lt._probe = (np.zeros(8, np.uint64), 7)  # simulate the cache
    clean = LookupTable.from_pairs([(h, h % 97) for h in
                                    range(1000, 2000, 7)])
    blob = pickle.dumps(lt)
    # serialized-size assert: a broadcast of a probe-warmed table must
    # cost the same bytes as a cold one (the slot array is >= 4x
    # entries at 16 B/slot and must never ride along)
    assert len(blob) <= len(pickle.dumps(clean)) + 64
    rt = pickle.loads(blob)
    assert not hasattr(rt, "_probe")
    np.testing.assert_array_equal(rt.hashes, lt.hashes)
    np.testing.assert_array_equal(rt.codewords, lt.codewords)
    if native.available():
        # the cache rebuilds after unpickle and serves lookups
        native.probe_table(rt)
        assert rt.lookup(1007) == lt.lookup(1007)


def test_doc_lengths_null_text_is_zero_both_paths():
    from dint_ray import tokenize as T

    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["alpha beta", None, "gamma"], pa.string()),
    })
    arrow = T.doc_lengths_batch(batch)
    assert arrow.column("len").to_pylist() == [2, 0, 1]
    # force the regex fallback by monkeypatching the Arrow kernel away
    import pyarrow.compute as pc
    orig = pc.split_pattern_regex
    try:
        def boom(*a, **k):
            raise pa.ArrowNotImplementedError("forced")
        pc.split_pattern_regex = boom
        fb = T.doc_lengths_batch(batch)
    finally:
        pc.split_pattern_regex = orig
    assert fb.column("len").to_pylist() == [2, 0, 1]
