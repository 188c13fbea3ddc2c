"""Distributed pipeline vs single-process oracle (SURVEY.md §5 tier 5).

The Ray build over the pages fixture must produce:
- identical vocabulary (term -> term_id) and posting lists,
- byte-identical encoded payloads per term (same dictionaries, same
  deterministic encode),
- rank-identical query results through the serving actor pool.
"""

import numpy as np
import pytest

import dint_ray.postings as pg
from dint_ray.config import BuildConfig
from dint_ray.fixtures import generate_queries, pages_fixture_path
from dint_ray.index.build import build_index_local
from dint_ray.pipelines.build import build_index_ray, load_built_index
from dint_ray.pipelines.serve import queries_to_dataset, run_queries_ray
from dint_ray.queries import algorithms as qa

N_DOCS = 400
VOCAB = 300

# low salting threshold + forced salted strategy on purpose: head terms
# of the fixture exceed it, so the two-phase merge path is exercised at
# test scale (the default auto strategy picks single-exchange here)
BCFG = BuildConfig(salt_df_threshold=64, salt_bucket_docs=100,
                   merge_strategy="salted",
                   tokenize_batch_size=128, tokenize_concurrency=2,
                   encode_concurrency=2)


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import pyarrow.parquet as pq

    pages_path = pages_fixture_path(N_DOCS, VOCAB, seed=5)
    out_dir = str(tmp_path_factory.mktemp("index"))
    manifest = build_index_ray(pages_path, out_dir, kind="single_packed",
                               bcfg=BCFG, num_shards=4)
    pages = pq.read_table(pages_path)
    oracle_postings, vocab, sizes, num_docs = pg.oracle_postings(pages)
    return out_dir, manifest, oracle_postings, vocab, sizes, num_docs


def test_manifest_lineage(built):
    out_dir, manifest, *_ = built
    assert manifest["num_docs"] == N_DOCS
    assert len(manifest["shards"]) <= 4
    for s in manifest["shards"]:
        assert s["rows"] > 0 and s["bytes"] > 0 and s["files"] >= 1
        assert s["input"].startswith("pages_")


def test_postings_match_oracle(built):
    out_dir, manifest, oracle, vocab, sizes, num_docs = built
    idx, wand, _ = load_built_index(out_dir)
    assert set(idx.payloads.keys()) == set(oracle.keys())
    for tid, (docs, freqs) in oracle.items():
        dd, ff = idx.decode(tid)
        np.testing.assert_array_equal(dd, docs)
        np.testing.assert_array_equal(ff, freqs)


def test_payloads_byte_identical_to_oracle(built):
    out_dir, manifest, oracle, vocab, sizes, num_docs = built
    local = build_index_local(oracle, sizes, num_docs, kind="single_packed")
    idx, _, _ = load_built_index(out_dir)
    mism = [t for t in oracle
            if idx.payloads[t] != local.index.payloads[t]]
    assert mism == [], f"{len(mism)} payloads differ, e.g. term {mism[:3]}"


def test_resume_skips_finished_build(built):
    out_dir, manifest, *_ = built
    import time

    t0 = time.time()
    again = build_index_ray("unused-path.parquet", out_dir)  # must not read pages
    assert time.time() - t0 < 2.0
    assert again["num_docs"] == manifest["num_docs"]


def test_serving_matches_local(built):
    out_dir, manifest, oracle, vocab, sizes, num_docs = built
    local = build_index_local(oracle, sizes, num_docs, kind="single_packed")
    queries = generate_queries(40, vocab.size, seed=9)
    qds = queries_to_dataset(queries)
    res = run_queries_ray(qds, out_dir, algo="wand", k=10,
                          concurrency=2).to_pandas()
    for qid, q in enumerate(queries):
        expect = qa.wand(local.index, local.wand, q, k=10)
        got = res[res.query_id == qid].sort_values("rank")
        assert got["doc_id"].tolist() == [d for d, _ in expect], f"q{qid}"
        np.testing.assert_array_equal(
            got["score"].to_numpy(),
            np.array([s for _, s in expect], dtype=np.float32),
        )


def test_verify_index_ray(built):
    """Distributed --check replay (verify_collection.hpp:7-53): every
    decoded shard list matches the postings checkpoint."""
    from dint_ray.pipelines.verify import verify_index_ray

    out_dir, *_ = built
    report = verify_index_ray(out_dir)
    assert report["ok"], report
    assert report["terms"] > 0


def test_verify_detects_corruption(built, tmp_path):
    """A corrupted shard payload must fail the check."""
    import glob
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dint_ray.pipelines.verify import verify_index_ray

    from dint_ray.index.shards import shard_files

    out_dir, *_ = built
    bad_dir = str(tmp_path / "bad")
    shutil.copytree(out_dir, bad_dir)
    shard = shard_files(bad_dir)[0]
    t = pq.read_table(shard)
    payloads = t.column("payload").to_pylist()
    p = bytearray(payloads[0])
    p[len(p) // 2] ^= 0xFF
    payloads[0] = bytes(p)
    t = t.set_column(t.schema.get_field_index("payload"), "payload",
                     pa.array(payloads, pa.binary()))
    pq.write_table(t, shard)
    report = verify_index_ray(bad_dir)
    assert not report["ok"]


def test_build_resume_from_checkpoints(built, tmp_path):
    """Kill-and-resume drill: wiping the manifest + shards and
    re-running reuses every earlier checkpoint (mtimes untouched) and
    regenerates byte-identical shards."""
    import glob
    import hashlib
    import os
    import shutil
    import time as _time

    out_dir, manifest, *_ = built

    # 1. finished build: re-invoking returns the manifest immediately
    t0 = _time.time()
    again = build_index_ray(os.path.join(out_dir, "..", "nonexistent-pages"),
                            out_dir)  # pages path unused when manifest exists
    assert again["num_docs"] == manifest["num_docs"]
    assert _time.time() - t0 < 2.0

    # 2. simulate a crash after encode started: manifest + shards lost
    from dint_ray.index.shards import shard_files

    def _content_hash(d):
        """Order-independent hash of every (term_id, payload) row —
        partitioned shard files have run-unique names, so identity is
        checked on content, not file bytes."""
        import pyarrow.parquet as pq

        rows = []
        for p in shard_files(d):
            t = pq.read_table(p, columns=["term_id", "payload"])
            rows.extend(zip(t.column("term_id").to_pylist(),
                            t.column("payload").to_pylist()))
        h = hashlib.sha1()
        for tid, pl in sorted(rows):
            h.update(tid.to_bytes(8, "little"))
            h.update(pl)
        return h.hexdigest()

    resume_dir = str(tmp_path / "resume")
    shutil.copytree(out_dir, resume_dir)
    orig_hash = _content_hash(resume_dir)
    os.remove(os.path.join(resume_dir, "manifest.json"))
    for p in shard_files(resume_dir):
        os.remove(p)
    shutil.rmtree(os.path.join(resume_dir, "shards"), ignore_errors=True)
    pages_path = pages_fixture_path(N_DOCS, VOCAB, seed=5)
    mtimes = {p: os.path.getmtime(p) for p in (
        os.path.join(resume_dir, "vocab.parquet"),
        os.path.join(resume_dir, "sizes.parquet"),
        os.path.join(resume_dir, "stats_docs.parquet"),
        os.path.join(resume_dir, "dicts_single_packed.npz.docs.npz"),
    )}
    m2 = build_index_ray(pages_path, resume_dir, kind="single_packed",
                         bcfg=BCFG, num_shards=4)
    assert m2["num_docs"] == manifest["num_docs"]
    for p, t in mtimes.items():
        assert os.path.getmtime(p) == t, f"checkpoint {p} was rebuilt"
    assert _content_hash(resume_dir) == orig_hash


def test_routed_matches_broadcast(built):
    """Doc-partitioned routed serving must be rank- AND score-identical
    to the single-shared-image path for every heap algorithm."""
    out_dir, manifest, oracle, vocab, sizes, num_docs = built
    queries = generate_queries(30, vocab.size, seed=13)
    for algo in ("wand", "maxscore", "ranked_or"):
        ref = run_queries_ray(queries_to_dataset(queries), out_dir,
                              algo=algo, k=10, concurrency=2,
                              broadcast=True).to_pandas()
        ref = ref.sort_values(["query_id", "rank"]).reset_index(drop=True)
        got = run_queries_ray(queries_to_dataset(queries), out_dir,
                              algo=algo, k=10, concurrency=4,
                              num_buckets=3).to_pandas()
        got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
        assert got["doc_id"].tolist() == ref["doc_id"].tolist(), algo
        np.testing.assert_array_equal(got["score"].to_numpy(),
                                      ref["score"].to_numpy())


def test_routed_quantized_conformance(built):
    """Quantized routed scoring (global df / N / avg inside bucket
    owners) equals the whole-index quantized order."""
    from dint_ray.pipelines.partitioned import run_queries_routed

    out_dir, manifest, oracle, vocab, sizes, num_docs = built
    local = build_index_local(oracle, sizes, num_docs, kind="single_packed")
    queries = generate_queries(20, vocab.size, seed=21)
    got = run_queries_routed(queries_to_dataset(queries), out_dir,
                             algo="ranked_or", k=10, num_buckets=3,
                             quantized=True, mode="ranked_or").to_pandas()
    # whole-index quantized reference (same arithmetic, no partitioning)
    sz64 = np.asarray(sizes, dtype=np.float64)
    N = np.float64(num_docs)
    avg = np.float64(sz64.sum() / num_docs)
    for qid, q in enumerate(queries):
        acc = {}
        for term, qf in qa.query_freqs(q):
            if term not in local.index:
                continue
            docs, freqs = local.index.decode(term)
            df = np.float64(len(docs))
            g = max(np.float64(1e-6), np.log((N - df + 0.5) / (df + 0.5)))
            qtw = np.float64(qf) * g * 2.2
            tf = freqs.astype(np.float64)
            lens = sz64[docs]
            cu = np.floor(qtw * tf / (tf + 1.2 * (0.5 + 0.5 * (lens / avg)))
                          * 1e15 + 0.5).astype(np.int64)
            for d, v in zip(docs.astype(np.int64), cu):
                acc[int(d)] = acc.get(int(d), 0) + int(v)
        want = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        sub = got[got.query_id == qid].sort_values("rank")
        assert sub["doc_id"].tolist() == [d for d, _ in want], f"q{qid}"
        assert sub["score_u"].tolist() == [s for _, s in want], f"q{qid}"


def test_routed_compressed_storage_identical(built):
    """Compressed-storage owners (WAND with lazy per-block C decode
    over raw DINT payloads, native.wand_compressed_query) must be
    rank- AND score-identical to decoded-storage routed serving."""
    from dint_ray import native as nat
    from dint_ray.pipelines.partitioned import run_queries_routed

    if not nat.available():
        import pytest

        pytest.skip("C kernels unavailable")
    out_dir, manifest, oracle, vocab, sizes, num_docs = built
    queries = generate_queries(40, vocab.size, seed=31)
    ref = run_queries_routed(queries_to_dataset(queries), out_dir,
                             algo="wand", k=10, num_buckets=3,
                             storage="decoded").to_pandas()
    got = run_queries_routed(queries_to_dataset(queries), out_dir,
                             algo="wand", k=10, num_buckets=3,
                             storage="compressed").to_pandas()
    ref = ref.sort_values(["query_id", "rank"]).reset_index(drop=True)
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert got["doc_id"].tolist() == ref["doc_id"].tolist()
    np.testing.assert_array_equal(got["score"].to_numpy(),
                                  ref["score"].to_numpy())


def test_compressed_owners_full_algo_surface(built):
    """Compressed owners must serve EVERY query op the decoded owners
    do (the reference serves all ops over every index type,
    src/queries.cpp:87-111): ranked_and / ranked_or / block_max_wand
    run via transient decode of only the query's lists and must be
    rank- and score-identical to decoded-storage routed serving."""
    from dint_ray.pipelines.partitioned import (
        release_all_actors, run_queries_routed)

    out_dir, manifest, oracle, vocab, sizes, num_docs = built
    queries = generate_queries(25, vocab.size, seed=77)
    for algo in ("ranked_and", "ranked_or", "block_max_wand"):
        ref = run_queries_routed(queries_to_dataset(queries), out_dir,
                                 algo=algo, k=10, num_buckets=3,
                                 storage="decoded").to_pandas()
        got = run_queries_routed(queries_to_dataset(queries), out_dir,
                                 algo=algo, k=10, num_buckets=3,
                                 storage="compressed").to_pandas()
        ref = ref.sort_values(["query_id", "rank"]).reset_index(drop=True)
        got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
        assert got["doc_id"].tolist() == ref["doc_id"].tolist(), algo
        np.testing.assert_array_equal(got["score"].to_numpy(),
                                      ref["score"].to_numpy(), err_msg=algo)
    # drop the cached owner sets: their CPU reservations would starve
    # the direct-build tests below on the 4-CPU test session
    release_all_actors()


def test_compressed_decode_cache_bounded(built):
    """The transient-decode cache must evict FIFO and never hold more
    than DEC_CACHE_MAX_POSTINGS decoded postings."""
    from dint_ray.pipelines.partitioned import (
        PartitionScorer, build_serve_partitions)

    out_dir, manifest, oracle, vocab, sizes, num_docs = built
    serve_dir = build_serve_partitions(out_dir, num_buckets=3)
    sc = PartitionScorer(out_dir, serve_dir, 0, storage="compressed")
    sc.DEC_CACHE_MAX_POSTINGS = 50
    terms = [t for t in sorted(sc._span_of)][:40]
    total_decoded = 0
    for t in terms:
        hit = sc._decode_term(t)
        assert hit is not False
        total_decoded += len(hit[0])
        assert sc._dec_cached_postings <= max(
            sc.DEC_CACHE_MAX_POSTINGS, len(hit[0]))
    assert total_decoded > sc.DEC_CACHE_MAX_POSTINGS  # eviction happened
    resident = sum(len(v[0]) for v in sc._dec_cache.values()
                   if v is not False)
    assert resident == sc._dec_cached_postings


def test_direct_serve_build_matches_classic(built, tmp_path_factory):
    """The direct serve-layout build (pages -> bucket/term segments ->
    segment-mined dictionaries -> per-bucket encode, NO whole posting
    list in any task) must serve rank-identical top-k to the classic
    whole-list index."""
    from dint_ray.pipelines.partitioned import (build_serve_direct,
                                                run_queries_routed)

    out_dir, manifest, oracle, vocab, sizes, num_docs = built
    pages_path = pages_fixture_path(N_DOCS, VOCAB, seed=5)
    direct_dir = str(tmp_path_factory.mktemp("direct"))
    build_serve_direct(pages_path, direct_dir, kind="single_packed",
                       num_buckets=3, bcfg=BCFG)
    # segments checkpoint exists and no row holds a whole head list
    import pyarrow.parquet as pq

    segs = pq.read_table(f"{direct_dir}/segments")
    assert segs.num_rows > 0
    width = (num_docs + 2) // 3
    for v in segs.column("docs"):
        assert len(v) <= width
    queries = generate_queries(25, vocab.size, seed=31)
    ref = run_queries_ray(queries_to_dataset(queries), out_dir,
                          algo="wand", k=10, concurrency=2,
                          broadcast=True).to_pandas()
    got = run_queries_routed(queries_to_dataset(queries), direct_dir,
                             algo="wand", k=10,
                             num_buckets=3).to_pandas()
    ref = ref.sort_values(["query_id", "rank"]).reset_index(drop=True)
    got = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert got["doc_id"].tolist() == ref["doc_id"].tolist()
    np.testing.assert_array_equal(got["score"].to_numpy(),
                                  ref["score"].to_numpy())


def test_direct_layout_compressed_owners(built, tmp_path_factory):
    """Compressed-storage owners (C WAND over raw DINT payloads) serve
    the DIRECT-built layout bit-identically to decoded owners — the
    full 100-TB configuration: bounded-memory build AND bounded-memory
    serving."""
    from dint_ray import native as nat
    from dint_ray.pipelines.partitioned import (build_serve_direct,
                                                run_queries_routed)

    if not nat.available():
        pytest.skip("C kernels unavailable")
    out_dir, manifest, oracle, vocab, sizes, num_docs = built
    pages_path = pages_fixture_path(N_DOCS, VOCAB, seed=5)
    direct_dir = str(tmp_path_factory.mktemp("directc"))
    build_serve_direct(pages_path, direct_dir, kind="single_packed",
                       num_buckets=3, bcfg=BCFG)
    queries = generate_queries(20, vocab.size, seed=41)
    dec = run_queries_routed(queries_to_dataset(queries), direct_dir,
                             algo="wand", k=10, num_buckets=3).to_pandas()
    comp = run_queries_routed(queries_to_dataset(queries), direct_dir,
                              algo="wand", k=10, num_buckets=3,
                              storage="compressed").to_pandas()
    dec = dec.sort_values(["query_id", "rank"]).reset_index(drop=True)
    comp = comp.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert dec["doc_id"].tolist() == comp["doc_id"].tolist()
    np.testing.assert_array_equal(dec["score"].to_numpy(),
                                  comp["score"].to_numpy())
