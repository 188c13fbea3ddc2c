"""Compressed-owner coverage beyond round 2 (VERDICT r2 item 4):
maxscore over raw DINT payloads, and the multi_packed payload layout —
both bit-identical to the decoded/Python paths."""

from __future__ import annotations

import numpy as np
import pytest

from dint_ray.fixtures import generate_pages, generate_queries, \
    pages_fixture_path
from dint_ray.index.build import build_index_local, verify_index
from dint_ray.postings import oracle_postings
from dint_ray.queries import algorithms as qa
from dint_ray.scoring import query_term_weight


def _nat():
    from dint_ray import native as nat

    if not nat.available():
        pytest.skip("C kernels unavailable")
    return nat


@pytest.fixture(scope="module", params=["single_packed", "multi_packed"])
def corpus(request):
    pages = generate_pages(600, vocab_size=400, seed=42)
    postings, vocab, sizes, num_docs = oracle_postings(pages)
    built = build_index_local(postings, sizes, num_docs, kind=request.param)
    verify_index(built.index, postings)
    queries = generate_queries(60, vocab.size, seed=7)
    return built, queries


def _cw_for(nat, li):
    return nat.CompressedWand(li.dicts.docs_dict, li.dicts.freqs_dict,
                              li.wand.norms(np.float32))


def test_compressed_decode_matches_python(corpus):
    nat = _nat()
    li, _ = corpus
    cw = _cw_for(nat, li)
    for tid in li.index.payloads:
        docs, freqs = li.index.decode(tid)
        buf = np.frombuffer(li.index.payloads[tid] + b"\x00" * 8, np.uint8)
        dd, ff = cw.decode_list(buf, len(docs))
        assert np.array_equal(dd, docs.astype(np.uint32))
        assert np.array_equal(ff, freqs.astype(np.uint32))


@pytest.mark.parametrize("algo", ["wand", "maxscore"])
def test_compressed_query_bit_identical(corpus, algo):
    nat = _nat()
    li, queries = corpus
    num_docs = li.index.num_docs
    cw = _cw_for(nat, li)
    payloads = {
        t: np.frombuffer(li.index.payloads[t] + b"\x00" * 8, np.uint8)
        for t in li.index.payloads}
    ref_fn = getattr(qa, algo)
    checked = 0
    for terms in queries:
        ref = ref_fn(li.index, li.wand, list(terms), 10)
        ptrs, qws, mws = [], [], []
        for term, qf in qa.query_freqs(list(terms)):
            if term not in li.index:
                continue
            qw = query_term_weight(qf, li.index.size(term), num_docs,
                                   np.float32)
            ptrs.append(payloads[term].ctypes.data)
            qws.append(qw)
            mws.append(np.float32(qw * li.wand.max_term_weight[term]))
        if not ptrs:
            assert ref == []
            continue
        got = cw.query(np.array(ptrs, np.uint64), np.array(qws, np.float32),
                       np.array(mws, np.float32), num_docs, 10, algo=algo)
        assert got == [(int(d), float(s)) for d, s in ref], terms
        checked += 1
    assert checked > 40


N_DOCS, VOCAB = 500, 60


@pytest.mark.parametrize("kind,algo", [("single_packed", "maxscore"),
                                       ("single_packed", "ranked_or"),
                                       ("single_packed", "ranked_and"),
                                       ("multi_packed", "wand"),
                                       ("multi_packed", "maxscore")])
def test_partition_scorer_compressed_matches_decoded(ray_session,
                                                     tmp_path_factory,
                                                     kind, algo):
    from dint_ray.pipelines.build import build_index_ray
    from dint_ray.pipelines.partitioned import (PartitionScorer,
                                                build_serve_partitions)

    _nat()
    out = str(tmp_path_factory.mktemp(f"cmp_{kind}_{algo}"))
    build_index_ray(pages_fixture_path(N_DOCS, VOCAB, seed=11), out,
                    kind=kind)
    serve = build_serve_partitions(out, 2)
    for b in range(2):
        dec = PartitionScorer(out, serve, b, storage="decoded")
        cmp_ = PartitionScorer(out, serve, b, storage="compressed")
        qids = np.arange(4)
        terms = [[0], [1, 2], [0, 3, 9], [5, 5, 7]]
        c0, d0, s0 = dec.score_topk_arrays(qids, terms, algo, 10)
        c1, d1, s1 = cmp_.score_topk_arrays(qids, terms, algo, 10)
        np.testing.assert_array_equal(c0, c1)
        np.testing.assert_array_equal(d0, d1)
        np.testing.assert_array_equal(s0, s1)
