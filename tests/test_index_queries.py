"""Index-level + ranked-query tests (reference tiers 3-5, SURVEY.md §5).

- build 30 random posting lists (universe 20,000, avg gap 1.1-11,
  freqs 1..256 — test_generic_sequence.hpp:7-26 recipe), encode with
  single/multi DINT, replay-verify every posting;
- build a real index from the synthetic pages fixture; assert WAND and
  MaxScore top-10 are rank-identical (docids AND float32 scores) with
  exhaustive ranked-OR (the reference allows 0.1% score tolerance,
  test_ranked_queries.cpp:52; our determinism fixes make it exact).
"""

import numpy as np
import pytest

from dint_ray.fixtures import generate_pages, generate_queries
from dint_ray.index.build import build_index_local, verify_index
from dint_ray.postings import oracle_postings
from dint_ray.queries import algorithms as qa

RNG = np.random.default_rng(42)


def _random_postings(num_lists=30, universe=20_000):
    postings = {}
    for t in range(num_lists):
        avg_gap = 1.1 + 10 * RNG.random()
        n = max(1, int(universe / avg_gap))
        docs = np.sort(RNG.choice(universe, size=min(n, universe), replace=False))
        freqs = RNG.integers(1, 257, len(docs))
        postings[t] = (docs.astype(np.uint32), freqs.astype(np.uint32))
    return postings


@pytest.mark.parametrize("kind", ["single_packed", "multi_packed"])
def test_random_lists_roundtrip(kind):
    postings = _random_postings()
    sizes = RNG.integers(8, 2048, 20_000).astype(np.uint32)
    built = build_index_local(postings, sizes, 20_000, kind=kind)
    verify_index(built.index, postings)


@pytest.fixture(scope="module")
def corpus():
    pages = generate_pages(600, vocab_size=400, seed=42)
    postings, vocab, sizes, num_docs = oracle_postings(pages)
    built = build_index_local(postings, sizes, num_docs, kind="single_packed")
    verify_index(built.index, postings)
    queries = generate_queries(80, vocab.size, seed=7)
    return built, queries


def test_enumerator_next_geq_contract(corpus):
    built, _ = corpus
    idx = built.index
    tid = max(idx.payloads, key=lambda t: idx.size(t))
    docs, _ = idx.decode(tid)
    en = idx.enumerator(tid)
    # skip to every 7th docid + 1
    for target in docs[::7]:
        en2 = idx.enumerator(tid)
        en2.next_geq(int(target))
        assert en2.docid() == target
    en.next_geq(int(docs[-1]) + 1)
    assert en.docid() == idx.num_docs  # beyond-universe behavior


def test_rank_identity(corpus):
    built, queries = corpus
    idx, wd = built.index, built.wand
    checked = 0
    for q in queries:
        oracle = qa.ranked_or(idx, wd, q, k=10)
        fast = qa.ranked_or_fast(idx, wd, q, k=10)
        w = qa.wand(idx, wd, q, k=10)
        ms = qa.maxscore(idx, wd, q, k=10)
        assert fast == pytest.approx(oracle), f"fast != oracle for {q}"
        assert [d for d, _ in w] == [d for d, _ in oracle], f"wand docids {q}"
        assert [d for d, _ in ms] == [d for d, _ in oracle], f"maxscore docids {q}"
        np.testing.assert_allclose([s for _, s in w], [s for _, s in oracle], rtol=0)
        np.testing.assert_allclose([s for _, s in ms], [s for _, s in oracle], rtol=0)
        checked += 1
    assert checked == len(queries)


def test_ranked_and_subset_of_or(corpus):
    built, queries = corpus
    idx, wd = built.index, built.wand
    for q in queries[:30]:
        ra = qa.ranked_and(idx, wd, q, k=10)
        terms = [t for t in qa.remove_duplicate_terms(q) if t in idx]
        if not terms:
            assert ra == []
            continue
        # every ranked-AND hit must contain all query terms
        doclists = [set(idx.decode(t)[0].tolist()) for t in terms]
        inter = set.intersection(*doclists)
        for d, _ in ra:
            assert d in inter
        assert len(ra) == min(10, len(inter))


def test_boolean_counts_match_sets(corpus):
    built, queries = corpus
    idx, _ = built.wand, None
    idx = built.index
    for q in queries[:30]:
        terms = [t for t in qa.remove_duplicate_terms(q) if t in idx]
        if not terms:
            continue
        doclists = [set(idx.decode(t)[0].tolist()) for t in terms]
        assert qa.and_count(idx, q) == len(set.intersection(*doclists))
        assert qa.or_count(idx, q) == len(set.union(*doclists))


def test_compression_beats_raw(corpus):
    built, _ = corpus
    bpi = built.stats_bits_per_int()["bits_per_posting_pair"]
    assert bpi < 64  # two uint32 streams raw = 64 bits/pair


# --------------------------------------------------------------------------
# block-codec index family (block_freq_index<T>,
# /root/reference/include/index_types.hpp:25-37)
# --------------------------------------------------------------------------

import pytest as _pytest


@_pytest.mark.parametrize("codec", ["vbyte", "u32", "interpolative",
                                    "simple16", "varintgb"])
def test_block_codec_index_roundtrip(codec):
    import numpy as np

    from dint_ray.fixtures import generate_pages
    from dint_ray.index.build import build_index_local, verify_index
    from dint_ray.postings import oracle_postings

    pages = generate_pages(120, vocab_size=150, seed=9)
    postings, vocab, sizes, num_docs = oracle_postings(pages)
    li = build_index_local(postings, sizes, num_docs, kind=f"block_{codec}")
    verify_index(li.index, postings)
    # enumerator contract holds over the block-codec layout too
    tid = max(postings, key=lambda t: len(postings[t][0]))
    docs = postings[tid][0]
    e = li.index.enumerator(tid)
    e.next_geq(int(docs[len(docs) // 2]))
    assert e.docid() == int(docs[len(docs) // 2])


def test_block_max_wand_rank_identity():
    """BMW == exhaustive ranked-OR on every query (exact pruning)."""
    import numpy as np

    from dint_ray.fixtures import generate_pages, generate_queries
    from dint_ray.index.build import build_index_local
    from dint_ray.postings import oracle_postings
    from dint_ray.queries import algorithms as qa

    pages = generate_pages(600, vocab_size=800, seed=21)
    postings, vocab, sizes, num_docs = oracle_postings(pages)
    li = build_index_local(postings, sizes, num_docs)
    for q in generate_queries(300, vocab.size, seed=33):
        want = qa.ranked_or(li.index, li.wand, q, 10)
        got = qa.block_max_wand(li.index, li.wand, q, 10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        np.testing.assert_array_equal(
            np.asarray([s for _, s in got], np.float32),
            np.asarray([s for _, s in want], np.float32))


def test_and_family_empty_on_missing_term(corpus):
    """AND semantics with an out-of-vocabulary term: unsatisfiable
    (matches the SQL oracles, which count ALL distinct query terms)."""
    built, _ = corpus
    idx, wd = built.index, built.wand
    present = [t for t in (0, 1) if t in idx]
    missing = 10_000_000  # far beyond any vocab
    q = present + [missing]
    assert qa.and_count(idx, q) == 0
    assert qa.and_docs(idx, q) == []
    assert qa.ranked_and(idx, wd, q, k=10) == []
    # OR-family still scores the present terms
    assert qa.or_count(idx, q) > 0
    assert qa.ranked_or(idx, wd, q, k=10)


def test_native_kernels_match_python(corpus):
    """C kernels must be float32-exact vs the pure-Python reference
    implementations — same docids AND bitwise-equal scores."""
    from dint_ray import native

    if not native.available():
        pytest.skip("no C compiler available")
    built, queries = corpus
    idx, wd = built.index, built.wand
    checked = 0
    for q in queries:
        for algo in (qa.wand, qa.maxscore, qa.block_max_wand):
            got = algo(idx, wd, q, k=10)            # native path
            want = algo(idx, wd, q, k=10, native=False)
            assert got == want, f"{algo.__name__} diverges for {q}"
        checked += 1
    assert checked == len(queries)


def test_compressed_c_decode_and_wand_match_python(corpus):
    """The C compressed-cursor path (decode_list_compressed +
    wand_compressed_query) must reproduce the Python decode and WAND
    results bit-exactly — including edge list sizes around the 256-int
    block boundary and the interpolative tail blocks."""
    import pytest

    from dint_ray import native as nat

    if not nat.available():
        pytest.skip("C kernels unavailable")
    li, queries = corpus
    num_docs = li.index.num_docs
    cw = nat.CompressedWand(li.dicts.docs_dict, li.dicts.freqs_dict,
                            li.wand.norms(np.float32))
    payloads = {
        t: np.frombuffer(li.index.payloads[t] + b"\x00" * 8, np.uint8)
        for t in li.index.payloads}
    for tid in li.index.payloads:
        docs, freqs = li.index.decode(tid)
        dd, ff = cw.decode_list(payloads[tid], len(docs))
        assert np.array_equal(dd, docs.astype(np.uint32))
        assert np.array_equal(ff, freqs.astype(np.uint32))
    from dint_ray.scoring import query_term_weight

    for terms in queries:
        ref = qa.wand(li.index, li.wand, list(terms), 10)
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
        got = cw.query(np.array(ptrs, np.uint64),
                       np.array(qws, np.float32),
                       np.array(mws, np.float32), num_docs, 10)
        assert got == [(int(d), float(s)) for d, s in ref]
