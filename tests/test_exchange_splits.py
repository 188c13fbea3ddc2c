"""The num_returns sub-block split of the direct task exchange must be
a pure re-blocking: same rows, same per-term postings, regardless of
DINT_EXCHANGE_SPLITS — and the split outputs must actually be compact
sub-blocks (more blocks than exchange width)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from dint_ray.fixtures import pages_fixture_path

N_DOCS, VOCAB = 500, 80


def _lists_by_term(splits: int, strategy: str, map_split: bool = False):
    import ray.data as rd

    from dint_ray import postings as P
    from dint_ray.config import BuildConfig

    os.environ["DINT_EXCHANGE_SPLITS"] = str(splits)
    os.environ["DINT_EXCHANGE_MAP_SPLIT"] = "1" if map_split else "0"
    try:
        pages = pages_fixture_path(N_DOCS, VOCAB, seed=23)
        cfg = BuildConfig(merge_strategy=strategy, salt_df_threshold=64,
                          salt_bucket_docs=128)
        rows = P.tokenize_rows(rd.read_parquet(pages), cfg)
        vocab = P.build_vocabulary(rows)
        lists = P.build_posting_lists(rows, vocab, cfg,
                                      num_docs=N_DOCS).materialize()
        out = {}
        for r in lists.iter_rows():
            assert r["term_id"] not in out, "duplicate term row"
            out[r["term_id"]] = (np.asarray(r["docs"], dtype=np.uint64),
                                 np.asarray(r["freqs"], dtype=np.uint64))
        return out, lists.num_blocks()
    finally:
        os.environ.pop("DINT_EXCHANGE_SPLITS", None)
        os.environ.pop("DINT_EXCHANGE_MAP_SPLIT", None)


@pytest.mark.parametrize("strategy", ["single", "salted"])
def test_split_exchange_matches_whole_blocks(ray_session, strategy):
    base, nblocks1 = _lists_by_term(1, strategy)
    split, nblocks4 = _lists_by_term(4, strategy)
    assert set(base) == set(split)
    for tid, (docs, freqs) in base.items():
        sd, sf = split[tid]
        assert np.array_equal(docs, sd), f"term {tid} docs differ"
        assert np.array_equal(freqs, sf), f"term {tid} freqs differ"
    # the split path must emit MORE blocks (sub-block load balancing);
    # equality would mean the splits silently collapsed
    assert nblocks4 > nblocks1


@pytest.mark.parametrize("strategy", ["single", "salted"])
def test_map_split_exchange_matches_filter_all(ray_session, strategy):
    """The multi-node map-side pre-split (merge task p receives only
    its own partition's compacted sub-blocks) must be byte-identical to
    the single-node filter-all design, at both sub-block settings."""
    base, _ = _lists_by_term(1, strategy, map_split=False)
    for splits in (1, 4):
        ms, _ = _lists_by_term(splits, strategy, map_split=True)
        assert set(base) == set(ms)
        for tid, (docs, freqs) in base.items():
            sd, sf = ms[tid]
            assert np.array_equal(docs, sd), f"term {tid} docs differ"
            assert np.array_equal(freqs, sf), f"term {tid} freqs differ"
