"""Vocabulary-as-Dataset term-id join (VERDICT r2 item 2): above the
term threshold the vocabulary never materializes on the driver and ids
are assigned via a distributed hash join on term, fused with the
posting-list merge.  Must be value-identical to the broadcast path."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from dint_ray.fixtures import pages_fixture_path

N_DOCS, VOCAB = 500, 70


@pytest.fixture(scope="module")
def rows(ray_session):
    import ray.data as rd

    from dint_ray.postings import tokenize_rows

    return tokenize_rows(
        rd.read_parquet(pages_fixture_path(N_DOCS, VOCAB, seed=17),
                        columns=["doc_id", "text"])).materialize()


def test_vocabulary_ds_matches_driver(rows):
    from dint_ray.postings import build_vocabulary, build_vocabulary_ds

    driver = build_vocabulary(rows).terms
    ds = build_vocabulary_ds(rows).to_pandas()
    ds = ds.sort_values("term_id").reset_index(drop=True)
    assert list(ds.columns) == ["term", "df", "term_id"]
    pd.testing.assert_frame_equal(
        driver[["term", "df", "term_id"]].astype(
            {"df": np.int64, "term_id": np.uint32}),
        ds.astype({"df": np.int64, "term_id": np.uint32}))


def _flatten(lists_ds) -> pd.DataFrame:
    rows = []
    for b in lists_ds.iter_batches(batch_format="pyarrow"):
        for tid, d, f in zip(b.column("term_id").to_pylist(),
                             b.column("docs").to_pylist(),
                             b.column("freqs").to_pylist()):
            rows.extend((int(tid), int(x), int(y)) for x, y in zip(d, f))
    return (pd.DataFrame(rows, columns=["term_id", "doc_id", "tf"])
            .sort_values(["term_id", "doc_id"]).reset_index(drop=True))


def test_joined_posting_lists_match_broadcast(rows):
    from dint_ray.postings import (build_posting_lists,
                                   build_posting_lists_joined,
                                   build_vocabulary, build_vocabulary_ds)

    vocab = build_vocabulary(rows)
    single = _flatten(build_posting_lists(rows, vocab, num_docs=N_DOCS))
    joined = _flatten(build_posting_lists_joined(
        rows, build_vocabulary_ds(rows)))
    pd.testing.assert_frame_equal(single, joined)


def test_join_kernel_resolves_block_splits():
    """Simulate the executor splitting a hash partition into two blocks:
    round 1 emits misses for the block without the vocab row; round 2
    (misses ∪ vocab) resolves them."""
    from dint_ray.postings import (_join_frags_block, _tag_frags,
                                   _tag_vocab, _take_hits, _take_misses)

    def frag(term, docs, freqs):
        return pa.table({
            "term": pa.array([term], pa.string()),
            "docs": pa.array([docs], pa.list_(pa.uint32())),
            "freqs": pa.array([freqs], pa.list_(pa.uint32())),
        })

    vocab = pa.table({"term": pa.array(["a", "b"], pa.string()),
                      "term_id": pa.array([0, 1], pa.uint32())})
    # block 1 of the partition: vocab rows + one fragment of 'a'
    blk1 = pa.concat_tables([_tag_vocab(vocab),
                             _tag_frags(frag("a", [1, 5], [2, 1]))])
    # block 2: fragments of 'a' and 'b', NO vocab rows (the split)
    blk2 = pa.concat_tables([_tag_frags(frag("a", [3], [7])),
                             _tag_frags(frag("b", [2, 9], [1, 1]))])
    out1 = _join_frags_block(blk1)
    out2 = _join_frags_block(blk2)
    hits = pa.concat_tables([_take_hits(out1), _take_hits(out2)])
    misses = pa.concat_tables([_take_misses(out1), _take_misses(out2)])
    assert hits.num_rows == 1          # 'a' fragment co-located w/ vocab
    assert misses.num_rows == 2        # both blk2 fragments missed

    # round 2: misses ∪ vocab in one block -> fully resolved
    blk3 = pa.concat_tables([_tag_vocab(vocab), _tag_frags(misses)])
    out3 = _join_frags_block(blk3)
    assert _take_misses(out3).num_rows == 0
    hits = pa.concat_tables([hits, _take_hits(out3)])
    got = {}
    for tid, d, f in zip(hits.column("term_id").to_pylist(),
                         hits.column("docs").to_pylist(),
                         hits.column("freqs").to_pylist()):
        prev = got.setdefault(int(tid), ([], []))
        prev[0].extend(d)
        prev[1].extend(f)
    # fragments merged across rounds == the full lists
    a = sorted(zip(*got[0]))
    assert a == [(1, 2), (3, 7), (5, 1)]
    assert sorted(zip(*got[1])) == [(2, 1), (9, 1)]


def test_build_index_with_dataset_vocab(ray_session, tmp_path_factory):
    """End-to-end build with vocab_mode='dataset' must serve identical
    WAND results to the default broadcast build."""
    from dint_ray.config import BuildConfig
    from dint_ray.pipelines.build import build_index_ray, load_built_index
    from dint_ray.queries import algorithms as qa

    pages = pages_fixture_path(N_DOCS, VOCAB, seed=17)
    out_a = str(tmp_path_factory.mktemp("vjoin_a"))
    out_b = str(tmp_path_factory.mktemp("vjoin_b"))
    build_index_ray(pages, out_a, kind="single_packed")
    build_index_ray(pages, out_b, kind="single_packed",
                    bcfg=BuildConfig(vocab_mode="dataset"))
    ia, wa, ma = load_built_index(out_a)
    ib, wb, mb = load_built_index(out_b)
    assert ma["num_terms"] == mb["num_terms"]
    for terms in ([0], [1, 2], [0, 3, 9], [5, 5, 7]):
        assert qa.wand(ia, wa, list(terms), 10) == \
            qa.wand(ib, wb, list(terms), 10)
