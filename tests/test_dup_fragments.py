"""Duplicate list-row fragments must MERGE at load, never overwrite.

The streaming executor may split a hash partition's output into
multiple blocks; the per-block list kernels (postings._merge_rows_block,
partitioned._segment_rows_block) then emit one row per block for a key
straddling the split — i.e. duplicate (term) / (bucket, term) rows with
complementary doc sets.  Overwriting on load silently drops postings.
These tests synthesize such fragments and assert every loader merges
them back to the exact original results.
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dint_ray.fixtures import pages_fixture_path

N_DOCS, VOCAB = 400, 60


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from dint_ray.pipelines.build import build_index_ray

    out = str(tmp_path_factory.mktemp("dupidx"))
    pages = pages_fixture_path(N_DOCS, VOCAB, seed=11)
    build_index_ray(pages, out, kind="single_packed")
    return out


def _codecs(index_dir):
    from dint_ray.index.build import load_codec_bundle

    return load_codec_bundle(index_dir, "single_packed").codecs()


def _split_payload(pl, docs_codec, freqs_codec):
    from dint_ray.index.layout import PostingListView, write_posting_list

    docs, freqs = PostingListView(pl, docs_codec, freqs_codec).decode_all()
    assert len(docs) >= 2
    h = len(docs) // 2
    a = write_posting_list(docs[:h].astype(np.uint32),
                           freqs[:h].astype(np.uint32),
                           docs_codec, freqs_codec)
    b = write_posting_list(docs[h:].astype(np.uint32),
                           freqs[h:].astype(np.uint32),
                           docs_codec, freqs_codec)
    return a, b


def _fragment_one_row(path: str, docs_codec, freqs_codec,
                      out_paths: list[str] | None = None) -> int:
    """Rewrite a shard/bucket parquet file so its longest list becomes
    TWO fragment rows (same term_id, same max_weight).  If out_paths is
    given, the two fragments are appended to those files instead (to
    exercise non-adjacent duplicates).  Returns the fragmented tid."""
    t = pq.read_table(path)
    dfs = [len(p) for p in t.column("payload").to_pylist()]
    i = int(np.argmax(dfs))
    tid = int(t.column("term_id")[i].as_py())
    row = {c: t.column(c)[i].as_py() for c in t.column_names}
    a, b = _split_payload(row["payload"], docs_codec, freqs_codec)

    def row_table(payload):
        cols = {}
        for c in t.column_names:
            v = payload if c == "payload" else row[c]
            cols[c] = pa.array([v], t.schema.field(c).type)
        return pa.table(cols)

    # typed indices: an empty plain list infers a null-typed array and
    # take() has no (T, null) kernel — bites when the file has 1 row
    rest = t.take(pa.array([j for j in range(t.num_rows) if j != i],
                           pa.int64()))
    if out_paths is None:
        new = pa.concat_tables([rest, row_table(a), row_table(b)])
        pq.write_table(new, path)
    else:
        pq.write_table(rest, path)
        for p, frag in zip(out_paths, (a, b)):
            old = pq.read_table(p)
            pq.write_table(pa.concat_tables([old, row_table(frag)]), p)
    return tid


def _copy_index(src: str, tmp_path_factory, name: str) -> str:
    dst = os.path.join(str(tmp_path_factory.mktemp(name)), "idx")
    shutil.copytree(src, dst)
    return dst


def test_load_shards_merges_fragments(built, tmp_path_factory):
    from dint_ray.pipelines.build import load_built_index
    from dint_ray.queries import algorithms as qa

    dup_dir = _copy_index(built, tmp_path_factory, "dup_shards")
    dc, fc = _codecs(dup_dir)
    files = sorted(glob.glob(os.path.join(dup_dir, "shards", "shard=*",
                                          "*.parquet")))
    tid = _fragment_one_row(files[0], dc, fc)

    idx0, wand0, _ = load_built_index(built)
    idx1, wand1, _ = load_built_index(dup_dir)
    d0, f0 = idx0.decode(tid)
    d1, f1 = idx1.decode(tid)
    np.testing.assert_array_equal(d0, d1)
    np.testing.assert_array_equal(f0, f1)
    for terms in ([tid], [tid, 0], [0, 1, tid]):
        assert qa.wand(idx1, wand1, terms, 10) == \
            qa.wand(idx0, wand0, terms, 10)


def test_shared_index_merges_nonadjacent_fragments(built, tmp_path_factory):
    from dint_ray.pipelines.serve import _build_shared_index, build_shared_index

    dup_dir = _copy_index(built, tmp_path_factory, "dup_shared")
    dc, fc = _codecs(dup_dir)
    files = sorted(glob.glob(os.path.join(dup_dir, "shards", "shard=*",
                                          "*.parquet")))
    assert len(files) >= 2
    # fragments land in two DIFFERENT shard files -> non-contiguous
    # duplicate runs -> exercises the lexsort rebuild path
    tid = _fragment_one_row(files[0], dc, fc,
                            out_paths=[files[0], files[-1]])

    idx0, _, _ = build_shared_index(built)
    idx1, _, _ = _build_shared_index(dup_dir)
    d0, f0 = idx0.decode(tid)
    d1, f1 = idx1.decode(tid)
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    # every other term's span must survive the rebuild too
    for t in range(VOCAB):
        if t == tid or t not in idx0:
            continue
        np.testing.assert_array_equal(np.asarray(idx0.decode(t)[0]),
                                      np.asarray(idx1.decode(t)[0]))


@pytest.mark.parametrize("storage", ["decoded", "compressed"])
def test_partition_scorer_merges_fragments(built, tmp_path_factory, storage):
    from dint_ray.pipelines.partitioned import (PartitionScorer,
                                                build_serve_partitions)

    dup_dir = _copy_index(built, tmp_path_factory, f"dup_serve_{storage}")
    serve0 = build_serve_partitions(built, 2)
    serve1 = build_serve_partitions(dup_dir, 2)
    dc, fc = _codecs(dup_dir)
    files = sorted(glob.glob(os.path.join(serve1, "bucket=0", "*.parquet")))
    tid = _fragment_one_row(files[0], dc, fc)

    s0 = PartitionScorer(built, serve0, 0, storage=storage)
    s1 = PartitionScorer(dup_dir, serve1, 0, storage=storage)
    qids = np.arange(3)
    terms = [[tid], [tid, 0], [0, 1, tid]]
    c0, d0, sc0 = s0.score_topk_arrays(qids, terms, "wand", 10)
    c1, d1, sc1 = s1.score_topk_arrays(qids, terms, "wand", 10)
    np.testing.assert_array_equal(c0, c1)
    np.testing.assert_array_equal(d0, d1)
    np.testing.assert_array_equal(sc0, sc1)
