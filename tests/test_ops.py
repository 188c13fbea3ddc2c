"""Training-data ops tests: dedup (exact / MinHash / SimHash / ngram),
similarity search, text stats — the operators SURVEY.md lists beyond
the reference's own surface.

The SQL-oracle driver entries cross-check these at sf0.01; here we pin
the algorithmic invariants (banding recall guarantees, exactness of
the brute-force paths) on tiny in-process datasets.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from dint_ray.ops import dedup


def _docs(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(rows))), pa.int64()),
        "text": pa.array(rows, pa.string()),
    }))


def test_simhash_band_spec_pigeonhole():
    """max_hamming+1 bands over 64 bits: any pair with Hamming <=
    max_hamming must share a band (recall-1 guarantee)."""
    rng = np.random.default_rng(5)
    for mh in (1, 3, 8, 15):
        spec = dedup._simhash_bands(mh)
        assert len(spec) == mh + 1
        assert sum(w for _, w in spec) == 64
        # adversarial check: flip exactly mh bits at random positions
        for _ in range(200):
            a = rng.integers(0, 1 << 63, dtype=np.uint64)
            flip = rng.choice(64, size=mh, replace=False)
            b = a
            for f in flip:
                b ^= np.uint64(1) << np.uint64(f)
            shared = any(
                ((a >> np.uint64(s)) & np.uint64((1 << w) - 1))
                == ((b >> np.uint64(s)) & np.uint64((1 << w) - 1))
                for s, w in spec)
            assert shared


def test_simhash_pairs_finds_near_dups():
    base = "the quick brown fox jumps over the lazy dog " * 8
    texts = [base, base + "extra", "completely different words here " * 8]
    out = dedup.simhash_pairs_ds(_docs(texts), max_hamming=8).take_all()
    pairs = {(r["doc_a"], r["doc_b"]) for r in out}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_exact_dedup_keeps_min_doc_id():
    texts = ["aaa", "bbb", "aaa", "ccc", "bbb"]
    kept = sorted(r["doc_id"] for r in
                  dedup.exact_dedup_ds(_docs(texts)).take_all())
    assert kept == [0, 1, 3]


def test_minhash_verified_pairs_subset_of_true_jaccard():
    base = "alpha beta gamma delta epsilon zeta eta theta " * 6
    texts = [base, base + "iota", "unrelated stuff entirely " * 10,
             base.replace("delta", "kappa")]
    ds = _docs(texts)
    out = dedup.minhash_dedup_pairs_ds(ds, threshold=0.5).take_all()
    got = {(r["doc_a"], r["doc_b"]) for r in out}
    # verify against true shingle Jaccard
    shs = [dedup._shingles(t.lower(), 3) for t in texts]
    true = set()
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            u = shs[i] | shs[j]
            if u and len(shs[i] & shs[j]) / len(u) >= 0.5:
                true.add((i, j))
    assert got <= true          # verifier admits no false positives
    assert (0, 1) in got        # and the obvious near-dup is found


def test_knn_cosine_exact():
    from dint_ray.ops.simsearch import knn_cosine_ds

    rng = np.random.default_rng(3)
    mat = rng.standard_normal((40, 8))
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(list(range(40)), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float64())),
    }))
    out = knn_cosine_ds(emb, [0, 5], k=3).take_all()
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for q in (0, 5):
        sims = norm @ norm[q]
        sims[q] = -np.inf
        want = np.lexsort((np.arange(40), -sims))[:3].tolist()
        got = [r["vec_id"] for r in sorted(
            (r for r in out if r["query_id"] == q), key=lambda r: r["rank"])]
        assert got == want


def _rand_emb(n=40, d=8, seed=3):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, d))
    return mat, rd.from_arrow(pa.table({
        "vec_id": pa.array(list(range(n)), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float64())),
    }))


def test_partial_topk_combiner_is_exact_under_splits():
    """top-k( union of per-split top-ks ) == top-k(all rows) under the
    shared (sim desc, vec_id asc) order — the invariant that lets the
    combiner run per block before the keyed repartition (and keeps the
    final stage safe if the executor ever splits a partition)."""
    from dint_ray.ops.simsearch import _final_topk_block, _partial_topk_block

    rng = np.random.default_rng(5)
    n = 500
    tbl = pa.table({
        "query_id": pa.array(rng.integers(0, 7, n), pa.int64()),
        "vec_id": pa.array(rng.permutation(n).astype(np.int64), pa.int64()),
        # duplicate sims on purpose: tie-break must carry through
        "sim": pa.array(np.round(rng.random(n), 2), pa.float64()),
    })
    direct = _final_topk_block(tbl, k=4).to_pydict()
    pieces = [tbl.slice(o, 99) for o in range(0, n, 99)]
    combined = pa.concat_tables(
        [_partial_topk_block(p, k=4) for p in pieces])
    two_stage = _final_topk_block(combined.combine_chunks(),
                                  k=4).to_pydict()
    assert two_stage == direct


def test_ivf_full_probe_is_exact():
    """nprobe == num_centroids probes every cell -> identical rows to
    the exact scan (same float64 sims, same tie-break kernel)."""
    from dint_ray.ops.simsearch import ivf_knn_ds, knn_cosine_ds

    _, emb = _rand_emb()
    exact = sorted(map(tuple, (
        (r["query_id"], r["rank"], r["vec_id"])
        for r in knn_cosine_ds(emb, [0, 5, 17], k=4).take_all())))
    full = sorted(map(tuple, (
        (r["query_id"], r["rank"], r["vec_id"])
        for r in ivf_knn_ds(emb, [0, 5, 17], k=4, num_centroids=4,
                            nprobe=4).take_all())))
    assert full == exact


def test_ivf_partial_probe_recall():
    """Clustered corpus: probing the nearest cell alone recovers the
    same-cluster neighbors (recall 1.0 on well-separated clusters)."""
    from dint_ray.ops.simsearch import ivf_recall

    rng = np.random.default_rng(11)
    centers = np.eye(4).repeat(2, axis=1)  # 4 orthogonal cluster axes, d=8
    mat = np.concatenate([
        centers[i] + 0.05 * rng.standard_normal((25, 8)) for i in range(4)])
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(list(range(100)), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float64())),
    }))
    r = ivf_recall(emb, [0, 30, 60, 90], k=5, num_centroids=4, nprobe=1)
    assert r == 1.0


def test_media_decode_words_match_digest():
    """emit_words exposes the raw LE u32 sha256 words the float
    feature is derived from (the SQL-oracle view of media_features)."""
    import hashlib

    from dint_ray.ops.multimodal import (MediaDecode, media_features_ds,
                                         synthesize_media_table)

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["hello world", "café ☕", ""], pa.string()),
    })
    media = synthesize_media_table(docs)
    out = media_features_ds(rd.from_arrow(media), emit_words=True).take_all()
    out.sort(key=lambda r: r["media_id"])
    for r, text in zip(out, docs.column("text").to_pylist()):
        digest = hashlib.sha256(text.encode()).digest()
        want = np.frombuffer(digest[:32], dtype="<u4")
        got = np.array([r[f"w{i}"] for i in range(8)], dtype=np.uint64)
        assert np.array_equal(got, want.astype(np.uint64))
        # float feature stays the bijective transform of the words
        feat = np.asarray(r["feature"], dtype=np.float32)
        assert np.array_equal(
            feat, (want.astype(np.float32) / np.float32(2**32)))
        assert r["n_bytes"] == len(text.encode())
        assert r["kind"] == ("image", "audio", "video")[r["media_id"] % 3]


def test_exact_dedup_digest_keys_no_text_in_exchange():
    """The dedup exchange carries digests, not text (VERDICT r2 item 6):
    the digest stage's output schema has no text column, and crc32
    collisions are still resolved (len+md5 disambiguate)."""
    t = pa.table({"doc_id": pa.array([7, 3], pa.int64()),
                  "text": pa.array(["same text", "same text"], pa.string())})
    d = dedup._digest_rows(t)
    assert "text" not in d.column_names
    assert d.column("md5")[0].as_py() == d.column("md5")[1].as_py()
    assert d.column("tlen")[0].as_py() == len("same text".encode())
    texts = ["x" * 40, "y" * 40, "x" * 40, "z"]
    kept = sorted(r["doc_id"] for r in
                  dedup.exact_dedup_ds(_docs(texts)).take_all())
    assert kept == [0, 1, 3]


def test_minhash_kernel_and_fold_match_modulo_reference():
    """The C minhash kernel and the numpy Mersenne-fold fallback must
    be bit-identical to the %-based per-doc reference (the SQL oracle
    computes (a*x+b) % p in BIGINT)."""
    P = np.uint64(2147483647)
    rng = np.random.default_rng(7)
    x = np.concatenate([rng.integers(0, 1 << 32, 50_000, dtype=np.uint64),
                        np.array([0, 1, P - 1, P, P + 1, (1 << 32) - 1],
                                 np.uint64)])
    a = np.concatenate([rng.integers(1, P, 16, dtype=np.uint64),
                        np.array([1, P - 1], np.uint64)])
    b = np.concatenate([rng.integers(0, P, 16, dtype=np.uint64),
                        np.array([0, P - 1], np.uint64)])
    v = x[:, None] * a[None, :] + b[None, :]
    f = (v & P) + (v >> np.uint64(31))
    f = (f & P) + (f >> np.uint64(31))
    f -= P * (f >= P)
    assert np.array_equal(v % P, f)

    texts = ["the quick brown fox " * 20, "", "a",
             "unicode ünïcödé ß " * 9, "dup dup dup dup",
             "x y z w v u t s r q p o n m l k"]
    ref = np.stack([dedup.minhash_signature(
        dedup._shingle_digests(t, 3)[1], 64) for t in texts])
    assert np.array_equal(dedup._batch_signatures(texts, 3, 64), ref)
    # numpy fallback path (kernel forced off)
    from dint_ray import native
    orig = native.minhash_sigs
    native.minhash_sigs = lambda *a_, **k_: None
    try:
        assert np.array_equal(dedup._batch_signatures(texts, 3, 64), ref)
    finally:
        native.minhash_sigs = orig


def test_batch_shingle_u64_matches_per_doc_digests():
    """The span-gather batched shingle hasher must reproduce the
    per-doc join-path digests exactly (after unique of either shift)."""
    texts = ["the quick brown fox " * 20, "", "a",
             "unicode ünïcödé ß " * 9, "a b",
             "hello 123 world 456 hello 123 world"]
    u, offs = dedup._batch_shingle_u64(texts, 3)
    for i, t in enumerate(texts):
        s60, s32 = dedup._shingle_digests(t, 3)
        ud = u[offs[i]:offs[i + 1]]
        assert np.array_equal(np.unique(ud >> np.uint64(4)), s60), t
        assert np.array_equal(np.unique(ud >> np.uint64(32)), s32), t


def test_exact_dedup_fallback_matches_direct_exchange(monkeypatch):
    """Past the direct exchange's ref cap, exact dedup must switch to
    the real groupby aggregate (a split keyed partition would emit two
    mins per digest on the generic repartition fallback) and return the
    identical kept set."""
    from dint_ray import postings

    texts = [f"doc {i % 13} body" for i in range(60)] + ["solo"]
    direct = sorted(r["doc_id"] for r in
                    dedup.exact_dedup_ds(_docs(texts)).take_all())
    monkeypatch.setattr(postings, "_DIRECT_EXCHANGE_MAX_REFS", 0)
    fb = sorted(r["doc_id"] for r in
                dedup.exact_dedup_ds(_docs(texts)).take_all())
    assert fb == direct
    assert fb == sorted({texts.index(t) for t in set(texts)})


def test_ngram_jaccard_hot_shingle_guard_bounds_pairs():
    """A shingle shared by every doc must not emit O(n^2) pairs when
    its df exceeds max_shingle_df; discriminative shingles still pair."""
    hot = "aaa bbb ccc"                     # shared by ALL docs
    texts = [f"{hot} unique{i} u{i}x u{i}y u{i}z" for i in range(30)]
    # make 0/1 true near-dups through non-hot shingles
    texts[1] = texts[0] + " tail"
    ds = _docs(texts)
    guarded = dedup.ngram_jaccard_pairs_ds(
        ds, threshold=0.3, max_shingle_df=8).take_all()
    pairs = {(r["doc_a"], r["doc_b"]) for r in guarded}
    assert (0, 1) in pairs
    # the hot shingle alone may NOT create the all-pairs clique
    assert len(pairs) < 30 * 29 / 2 / 2
    # guard off: same corpus, exact semantics (fixture-scale dfs)
    exact = dedup.ngram_jaccard_pairs_ds(
        ds, threshold=0.3, max_shingle_df=0).take_all()
    assert {(r["doc_a"], r["doc_b"]) for r in exact} >= pairs


def test_ngram_jaccard_guard_above_max_df_is_exact():
    """With max_shingle_df above the corpus max df the guard must not
    change a single pair."""
    texts = ["red green blue yellow purple " * 3,
             "red green blue yellow purple " * 3 + "orange",
             "totally different content here " * 4]
    ds = _docs(texts)
    a = {(r["doc_a"], r["doc_b"]) for r in
         dedup.ngram_jaccard_pairs_ds(ds, threshold=0.4).take_all()}
    b = {(r["doc_a"], r["doc_b"]) for r in
         dedup.ngram_jaccard_pairs_ds(ds, threshold=0.4,
                                      max_shingle_df=0).take_all()}
    assert a == b and (0, 1) in a


def test_native_md5_batch_matches_hashlib():
    """The C md5 kernel must be bit-identical to hashlib (the dedup
    DuckDB md5() oracles depend on it), including the padding edges
    at 55/56/64/119/120 bytes."""
    import hashlib

    from dint_ray import native

    if not native.available():  # pragma: no cover - no compiler
        import pytest

        pytest.skip("no C compiler")
    rng = np.random.default_rng(5)
    strs = [b"", b"a", b"x" * 55, b"x" * 56, b"x" * 63, b"x" * 64,
            b"x" * 65, b"x" * 119, b"x" * 120, b"x" * 200]
    strs += [rng.bytes(int(rng.integers(0, 300))) for _ in range(500)]
    offs = np.zeros(len(strs) + 1, np.int64)
    np.cumsum([len(s) for s in strs], out=offs[1:])
    out = native.md5_batch(b"".join(strs), offs)
    for i, s in enumerate(strs):
        assert out[i].tobytes() == hashlib.md5(s).digest()


def test_native_crc32_batch_matches_zlib():
    """The C crc32 kernel must be bit-identical to zlib.crc32 (the
    exact-dedup digest key and its Python fallback depend on it)."""
    import zlib

    from dint_ray import native

    if not native.available():  # pragma: no cover - no compiler
        import pytest

        pytest.skip("no C compiler")
    rng = np.random.default_rng(6)
    strs = [b"", b"a", b"hello world", b"\x00" * 64]
    strs += [rng.bytes(int(rng.integers(0, 300))) for _ in range(500)]
    offs = np.zeros(len(strs) + 1, np.int64)
    np.cumsum([len(s) for s in strs], out=offs[1:])
    out = native.crc32_batch(b"".join(strs), offs)
    for i, s in enumerate(strs):
        assert int(out[i]) == zlib.crc32(s)


def test_digest_rows_zero_copy_matches_python():
    """_digest_rows over the Arrow buffers (sliced, multibyte UTF-8)
    must equal per-row zlib/hashlib digests."""
    import hashlib
    import zlib

    texts = ["", "hello", "wörld ünïcode", "x" * 200, "emoji \U0001f600"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    for tbl in (t, t.slice(1, 3)):
        out = dedup._digest_rows(tbl)
        for i, txt in enumerate(tbl.column("text").to_pylist()):
            b = txt.encode()
            assert out.column("crc")[i].as_py() == zlib.crc32(b)
            assert out.column("tlen")[i].as_py() == len(b)
            assert out.column("md5")[i].as_py() == hashlib.md5(b).digest()


def test_batch_signatures_match_per_doc():
    """_batch_signatures (reduceat path) == minhash_signature per doc,
    including empty-shingle docs (max-filled signature)."""
    rng = np.random.default_rng(9)
    texts = ["", "one", "a b c d e f g h"]
    texts += [" ".join(f"w{int(x)}" for x in rng.integers(0, 50, n))
              for n in rng.integers(1, 200, 30)]
    got = dedup._batch_signatures(texts, 3, 64)
    for i, t in enumerate(texts):
        want = dedup.minhash_signature(
            dedup._shingle_digests(t, 3)[1], 64)
        np.testing.assert_array_equal(got[i], want)


def test_batch_signatures_chunking():
    """Chunk boundaries must not change results: num_hashes=2**21
    would give max_shingles=2, so use a wide num_hashes to force many
    small chunks over the same docs."""
    texts = [f"tok{i} tok{i+1} tok{i+2} tok{i+3} tok{i+4}"
             for i in range(12)]
    wide = 1 << 20  # max_shingles = 4 -> several docs per chunk max
    a = dedup._batch_signatures(texts, 3, wide)
    assert a.shape == (len(texts), wide)
    for i in (0, 5, 11):
        want = dedup.minhash_signature(
            dedup._shingle_digests(texts[i], 3)[1], wide)
        np.testing.assert_array_equal(a[i], want)


def test_dedup_fixture_contract():
    """generate_dedup_pages: chunked generation with doc_offset forms
    one coherent corpus (unique urls/doc_ids), carries the promised
    exact-duplicate population, and the near-duplicates land in the
    MinHash-candidate Jaccard band (the bench's dedup scaling legs
    depend on all three — a duplicate-free corpus only measures the
    no-match fast path)."""
    from collections import Counter

    import pyarrow as pa

    from dint_ray.fixtures import generate_dedup_pages

    chunks = [generate_dedup_pages(1000, vocab_size=400, seed=s,
                                   doc_offset=off)
              for s, off in ((1, 0), (2, 1000))]
    t = pa.concat_tables(chunks)
    assert t.num_rows == 2000
    doc_ids = t.column("doc_id").to_pylist()
    urls = t.column("url").to_pylist()
    assert len(set(doc_ids)) == 2000 and len(set(urls)) == 2000

    texts = t.column("text").to_pylist()
    extra_exact = sum(v - 1 for v in Counter(texts).values() if v > 1)
    # 8% per chunk, exact by construction (sources precede victims)
    assert extra_exact == 2 * int(1000 * 0.08)

    # near-dups: ~2% token substitution => shingle Jaccard well above
    # the 0.5-0.7 thresholds the LSH band specs target
    def shingles(s, n=3):
        toks = s.split(" ")
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    # recover near-pairs by brute force on one chunk: pairs with
    # 0.5 < J < 1 exist and number at least near_frac/2 of the chunk
    sh = [shingles(x) for x in chunks[0].column("text").to_pylist()]
    near = 0
    for i in range(500, 1000):          # victims live in the tail half
        for j in range(0, 500):
            inter = len(sh[i] & sh[j])
            if not inter:
                continue
            jac = inter / len(sh[i] | sh[j])
            if 0.5 < jac < 1.0:
                near += 1
                break
    assert near >= int(1000 * 0.04) * 0.8
