"""Block-split safety for the keyed exchanges in the dedup verify
joins and the kNN top-k finalizer.

These kernels (the key->sids attach lookup, the 1..k rank cutoff) need
ALL rows of a key in one call.  Ray 2.49's hash-shuffle aggregator
happens to emit ONE block per partition — its source carries a "TODO
break down blocks to target size" (hash_shuffle.py), so that guarantee
is an implementation detail, not a contract.  Both call sites
therefore route through `postings._direct_merge_exchange`, where
partition completeness holds BY CONSTRUCTION (one merge task filters
its partition's rows from every block ref), with a
`groupby().map_groups` fallback past the ref cap (complete groups by
Ray's group contract).

The tests shrink the block-size ceiling to a few KB (the most split-
hostile config the sandbox can express) and assert outputs are
identical to the default-config run — no dropped pairs, no duplicated
ranks.  A second set forces the fallback path
(`_DIRECT_EXCHANGE_MAX_REFS = 0`) under the same tiny blocks, so the
split-tolerant fallback is exercised and pinned too.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from dint_ray.ops import dedup, simsearch


def _near_dup_docs(n_groups: int = 24, group: int = 3):
    """Clusters of near-identical docs: every in-group pair clears the
    0.5 Jaccard bar, cross-group pairs share almost nothing.  Docs are
    ~200 tokens so one doc's shingle-set row is a few KB — several
    rows per hash partition guarantee the 4 KB ceiling splits them."""
    rows = []
    words = [f"tok{i}" for i in range(40)]
    for g in range(n_groups):
        base = " ".join(words[(g * 7 + i) % 40] + f"g{g}"
                        for i in range(200))
        for m in range(group):
            rows.append(base + (f" tail{m}" if m else ""))
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(rows))), pa.int64()),
        "text": pa.array(rows, pa.string()),
    }))


def _emb_table(n: int = 2048, d: int = 32, seed: int = 3):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, d))
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(list(range(n)), pa.int64()),
        "embedding": pa.array([row.tolist() for row in m],
                              pa.list_(pa.float64())),
    }))


def _pairs_set(ds):
    return {(r["doc_a"], r["doc_b"])
            for r in ds.take_all()}


def _topk_rows(ds):
    return sorted((r["query_id"], r["rank"], r["vec_id"])
                  for r in ds.take_all())


@pytest.fixture
def tiny_blocks():
    """Shrink the executor's block-split ceiling so keyed exchange
    outputs split into many sub-blocks (the at-scale regime)."""
    import ray.data

    ctx = ray.data.DataContext.get_current()
    saved = ctx.target_max_block_size
    ctx.target_max_block_size = 4 * 1024
    try:
        yield
    finally:
        ctx.target_max_block_size = saved


@pytest.fixture
def forced_fallback(monkeypatch):
    """Route every direct-task exchange through its fallback path."""
    from dint_ray import postings

    monkeypatch.setattr(postings, "_DIRECT_EXCHANGE_MAX_REFS", 0)
    yield


def test_minhash_pairs_survive_block_splits(ray_session, tiny_blocks):
    docs = _near_dup_docs()
    import ray.data

    ctx = ray.data.DataContext.get_current()
    want_ctx = ctx.target_max_block_size
    ctx.target_max_block_size = 128 * 1024 * 1024
    try:
        want = _pairs_set(dedup.minhash_dedup_pairs_ds(docs, threshold=0.5))
    finally:
        ctx.target_max_block_size = want_ctx
    assert want, "fixture must produce near-dup pairs"
    got = _pairs_set(dedup.minhash_dedup_pairs_ds(docs, threshold=0.5))
    assert got == want


def test_minhash_pairs_fallback_under_splits(ray_session, tiny_blocks,
                                             forced_fallback):
    docs = _near_dup_docs(n_groups=12)
    got = _pairs_set(dedup.minhash_dedup_pairs_ds(docs, threshold=0.5))
    import ray.data

    ctx = ray.data.DataContext.get_current()
    saved = ctx.target_max_block_size
    ctx.target_max_block_size = 128 * 1024 * 1024
    try:
        want = _pairs_set(dedup.minhash_dedup_pairs_ds(docs, threshold=0.5))
    finally:
        ctx.target_max_block_size = saved
    assert got == want and want


def test_knn_topk_survives_block_splits(ray_session, tiny_blocks):
    emb = _emb_table()
    qids = [0, 17, 63, 128, 255, 600, 1024, 2047]
    got = _topk_rows(simsearch.knn_cosine_ds(emb, qids, k=5,
                                             num_partitions=8))
    import ray.data

    ctx = ray.data.DataContext.get_current()
    saved = ctx.target_max_block_size
    ctx.target_max_block_size = 128 * 1024 * 1024
    try:
        want = _topk_rows(simsearch.knn_cosine_ds(emb, qids, k=5,
                                                  num_partitions=8))
    finally:
        ctx.target_max_block_size = saved
    assert len(want) == len(qids) * 5
    assert got == want


def test_knn_topk_fallback_under_splits(ray_session, tiny_blocks,
                                        forced_fallback):
    emb = _emb_table(n=512)
    qids = [1, 2, 77, 311]
    got = _topk_rows(simsearch.knn_cosine_ds(emb, qids, k=4,
                                             num_partitions=8))
    import ray.data

    ctx = ray.data.DataContext.get_current()
    saved = ctx.target_max_block_size
    ctx.target_max_block_size = 128 * 1024 * 1024
    try:
        want = _topk_rows(simsearch.knn_cosine_ds(emb, qids, k=4,
                                                  num_partitions=8))
    finally:
        ctx.target_max_block_size = saved
    assert got == want and len(want) == len(qids) * 4


def _simhash_pairs_set(ds):
    return {(r["doc_a"], r["doc_b"]) for r in ds.take_all()}


def _simhash_dup_docs(n_groups: int = 12):
    """Groups of two IDENTICAL docs plus one distant variant: the
    identical pair is hamming 0 (always emitted), the tail variant
    measures 13-15 bits on this corpus and must stay excluded at
    max_hamming=8."""
    rows = []
    words = [f"tok{i}" for i in range(40)]
    for g in range(n_groups):
        base = " ".join(words[(g * 7 + i) % 40] + f"g{g}"
                        for i in range(200))
        rows += [base, base, base + " tail"]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(rows))), pa.int64()),
        "text": pa.array(rows, pa.string()),
    }))


def test_simhash_pairs_fallback_under_splits(ray_session, tiny_blocks,
                                             forced_fallback):
    """The simhash pair kernel needs a bucket's rows complete in one
    call; the ref-cap escape path must route through the grouped
    fallback (review round 5), not a bare keyed repartition."""
    docs = _simhash_dup_docs(n_groups=12)
    got = _simhash_pairs_set(dedup.simhash_pairs_ds(docs, max_hamming=8))
    import ray.data

    ctx = ray.data.DataContext.get_current()
    saved = ctx.target_max_block_size
    ctx.target_max_block_size = 128 * 1024 * 1024
    try:
        want = _simhash_pairs_set(dedup.simhash_pairs_ds(docs,
                                                         max_hamming=8))
    finally:
        ctx.target_max_block_size = saved
    assert len(want) == 12, "one identical pair per group expected"
    assert got == want


def test_ngram_pairs_fallback_under_splits(ray_session, tiny_blocks,
                                           forced_fallback):
    docs = _near_dup_docs(n_groups=12)
    got = _pairs_set(dedup.ngram_jaccard_pairs_ds(docs, threshold=0.5))
    import ray.data

    ctx = ray.data.DataContext.get_current()
    saved = ctx.target_max_block_size
    ctx.target_max_block_size = 128 * 1024 * 1024
    try:
        want = _pairs_set(dedup.ngram_jaccard_pairs_ds(docs,
                                                       threshold=0.5))
    finally:
        ctx.target_max_block_size = saved
    assert want, "fixture must produce ngram near-dup pairs"
    assert got == want


def test_knn_topk_map_split_matches_filter_all(ray_session, tiny_blocks):
    """kNN finalizer under the multi-node pre-split exchange mode x
    tiny blocks: identical ranks to the default filter-all run."""
    import os

    emb = _emb_table()
    queries = [3, 99, 512]
    want = _topk_rows(simsearch.knn_cosine_ds(emb, queries, k=5))
    os.environ["DINT_EXCHANGE_MAP_SPLIT"] = "1"
    try:
        got = _topk_rows(simsearch.knn_cosine_ds(emb, queries, k=5))
    finally:
        os.environ.pop("DINT_EXCHANGE_MAP_SPLIT", None)
    assert got == want
