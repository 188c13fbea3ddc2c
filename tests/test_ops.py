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
