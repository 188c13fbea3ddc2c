"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Ray-Data shapes (ray_guide patterns):
- exact: content-hash column (vectorized map_batches) ->
  groupby(hash).map_groups(first);
- MinHash+LSH: shingle -> minhash signature per doc (map_batches) ->
  explode to (band_id, band_hash, doc_id) rows -> groupby(band) ->
  candidate pairs -> Jaccard verify;
- SimHash: 64-bit signature per doc -> bucket on bit-bands -> verify
  Hamming distance;
- embedding cosine: normalized vectors; at this scale an O(n^2) blocked
  matmul against a broadcast matrix; the LSH-bucketed variant is the
  scale path (see simsearch.py).

All thresholded outputs are (doc_a, doc_b) pairs with doc_a < doc_b,
sorted, so results are deterministic and SQL-comparable where an
oracle exists.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

TOKEN_RE = r"[a-z0-9]+"
_tok = re.compile(TOKEN_RE)


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def add_text_hash(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    h = np.asarray([zlib.crc32(t.encode()) for t in texts], dtype=np.int64)
    return batch.append_column("text_hash", pa.array(h, pa.int64()))


def exact_dedup_ds(docs_ds):
    """Keep the smallest doc_id per identical text; returns Dataset of
    kept (doc_id) rows.

    Shape: hash-partition by content hash + per-group min — expressed
    as one native groupby((text_hash, text)).min(doc_id) shuffle (no
    per-group Python; the hash key keeps the sort cheap, the text key
    resolves crc32 collisions exactly)."""
    from ray.data.aggregate import Min

    hashed = docs_ds.map_batches(add_text_hash, batch_format="pyarrow")
    agg = hashed.groupby(["text_hash", "text"]).aggregate(
        Min("doc_id", alias_name="doc_id"))
    return agg.select_columns(["doc_id"])


# --------------------------------------------------------------------------
# shingles + MinHash + LSH
# --------------------------------------------------------------------------

def _shingles(text: str, k: int) -> set:
    toks = _tok.findall(text.lower())
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


_MH_A = None
_MH_B = None
_MH_PRIME = np.uint64((1 << 61) - 1)


def _mh_params(num_hashes: int, seed: int = 1234):
    global _MH_A, _MH_B
    if _MH_A is None or len(_MH_A) != num_hashes:
        rng = np.random.default_rng(seed)
        _MH_A = rng.integers(1, _MH_PRIME, num_hashes, dtype=np.uint64)
        _MH_B = rng.integers(0, _MH_PRIME, num_hashes, dtype=np.uint64)
    return _MH_A, _MH_B


def minhash_signature(text: str, num_hashes: int = 64, shingle_k: int = 3) -> np.ndarray:
    """(a*x + b) mod p universal-hash MinHash over crc32 shingle ids."""
    sh = _shingles(text, shingle_k)
    if not sh:
        return np.full(num_hashes, np.iinfo(np.uint64).max, dtype=np.uint64)
    ids = np.asarray([zlib.crc32(s.encode()) for s in sh], dtype=np.uint64)
    a, b = _mh_params(num_hashes)
    with np.errstate(over="ignore"):
        hv = (ids[:, None] * a[None, :] + b[None, :]) % _MH_PRIME
    return hv.min(axis=0)


class MinHasher:
    def __init__(self, num_hashes: int = 64, shingle_k: int = 3, bands: int = 16):
        assert num_hashes % bands == 0
        self.num_hashes = num_hashes
        self.shingle_k = shingle_k
        self.bands = bands
        self.rows = num_hashes // bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        """doc batch -> exploded (band_id, band_hash, doc_id) rows."""
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        sigs = np.stack([minhash_signature(t, self.num_hashes, self.shingle_k)
                         for t in texts])
        out_band, out_hash, out_doc = [], [], []
        for bnd in range(self.bands):
            seg = sigs[:, bnd * self.rows : (bnd + 1) * self.rows]
            bh = [zlib.crc32(row.tobytes()) for row in seg]
            out_band.extend([bnd] * len(ids))
            out_hash.extend(bh)
            out_doc.extend(ids.tolist())
        return pa.table({
            "band_id": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(np.asarray(out_hash, np.int64), pa.int64()),
            "doc_id": pa.array(np.asarray(out_doc, np.int64), pa.int64()),
        })


_PAIR_BUCKETS = 64


def _add_pair_bucket(batch: pa.Table) -> pa.Table:
    """Coarse shuffle key: co-locates equal (band_id, band_hash) rows
    while keeping the group count bounded (one UDF call per bucket,
    not per band value)."""
    band = batch.column("band_id").to_numpy(zero_copy_only=False).astype(np.int64)
    h = batch.column("band_hash").to_numpy(zero_copy_only=False)
    b = ((h * 1000003 + band) % _PAIR_BUCKETS).astype(np.int32)
    return batch.append_column("bucket", pa.array(b, pa.int32()))


def _pairs_from_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Emit candidate pairs for every (band_id, band_hash) group inside
    one bucket; grouping runs in pandas' C path."""
    out_a, out_b = [], []
    for _, grp in g.groupby(["band_id", "band_hash"], sort=False):
        docs = np.sort(grp["doc_id"].to_numpy())
        if len(docs) < 2:
            continue
        a, b = np.triu_indices(len(docs), k=1)
        out_a.append(docs[a])
        out_b.append(docs[b])
    if not out_a:
        return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                             "doc_b": pd.Series([], dtype=np.int64)})
    return pd.DataFrame({"doc_a": np.concatenate(out_a),
                         "doc_b": np.concatenate(out_b)})


def minhash_candidates_ds(docs_ds, num_hashes=64, shingle_k=3, bands=16,
                          concurrency: int = 8):
    """LSH candidate pairs (may include false positives; verify after)."""
    exploded = docs_ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_hashes": num_hashes,
                               "shingle_k": shingle_k, "bands": bands},
        batch_format="pyarrow", batch_size=1024,
        concurrency=(1, concurrency), num_cpus=1,
    )
    pairs = (exploded.map_batches(_add_pair_bucket, batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(_pairs_from_bucket, batch_format="pandas"))
    return pairs


class JaccardVerifier:
    """Verify candidate pairs against true shingle-set Jaccard.

    The documents table is broadcast (ray.put) — the small side of the
    join; candidate pairs stream through."""

    def __init__(self, texts_ref, shingle_k: int, threshold: float):
        import ray

        self.texts: dict[int, str] = ray.get(texts_ref)
        self.k = shingle_k
        self.threshold = threshold
        self._cache: dict[int, set] = {}

    def _sh(self, doc: int) -> set:
        s = self._cache.get(doc)
        if s is None:
            s = _shingles(self.texts[doc], self.k)
            self._cache[doc] = s
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        keep_a, keep_b = [], []
        for x, y in zip(a, b):
            sa, sb = self._sh(int(x)), self._sh(int(y))
            union = len(sa | sb)
            if union and len(sa & sb) / union >= self.threshold:
                keep_a.append(int(x))
                keep_b.append(int(y))
        return pa.table({
            "doc_a": pa.array(keep_a, pa.int64()),
            "doc_b": pa.array(keep_b, pa.int64()),
        })


def minhash_dedup_pairs_ds(docs_ds, texts_ref, num_hashes=64, shingle_k=3,
                           bands=16, threshold=0.8, concurrency: int = 8):
    from ray.data.aggregate import Count

    cands = minhash_candidates_ds(docs_ds, num_hashes, shingle_k, bands,
                                  concurrency)
    # dedupe candidate pairs before the (expensive) verify: native
    # groupby-aggregate (keys-only distinct), no per-group Python
    uniq = (cands.groupby(["doc_a", "doc_b"]).aggregate(Count())
            .select_columns(["doc_a", "doc_b"]))
    return uniq.map_batches(
        JaccardVerifier,
        fn_constructor_kwargs={"texts_ref": texts_ref,
                               "shingle_k": shingle_k, "threshold": threshold},
        batch_format="pyarrow", batch_size=4096,
        concurrency=(1, concurrency), num_cpus=1,
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """Classic 64-bit SimHash over token crc32s weighted by tf."""
    toks = _tok.findall(text.lower())
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    from collections import Counter

    for w, tf in Counter(toks).items():
        h = np.uint64(zlib.crc32(w.encode()) | (zlib.crc32(w[::-1].encode()) << 32))
        bits = ((h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        acc += np.where(bits == 1, tf, -tf)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


class SimHasher:
    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        sigs = np.asarray([simhash64(t) for t in texts], dtype=np.uint64)
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
            "simhash": pa.array(sigs.view(np.int64), pa.int64()),
        })


def simhash_pairs_ds(docs_ds, max_hamming: int = 3, concurrency: int = 8):
    """Near-dup pairs by SimHash: bucket on each of 4 16-bit bands (any
    pair within Hamming<=3 shares at least one band), verify distance."""
    sigs = docs_ds.map_batches(SimHasher, batch_format="pyarrow",
                               batch_size=1024, concurrency=(1, concurrency),
                               num_cpus=1)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        s = batch.column("simhash").to_numpy().view(np.uint64)
        bands, hashes, docs, full = [], [], [], []
        for bnd in range(4):
            seg = ((s >> np.uint64(16 * bnd)) & np.uint64(0xFFFF)).astype(np.int64)
            bands.extend([bnd] * len(ids))
            hashes.extend(seg.tolist())
            docs.extend(ids.tolist())
            full.extend(s.view(np.int64).tolist())
        return pa.table({
            "band_id": pa.array(bands, pa.int32()),
            "band_hash": pa.array(hashes, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "simhash": pa.array(full, pa.int64()),
        })

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, grp in g.groupby(["band_id", "band_hash"], sort=False):
            grp = grp.sort_values("doc_id")
            docs = grp["doc_id"].to_numpy()
            if len(docs) < 2:
                continue
            sh = grp["simhash"].to_numpy().view(np.uint64)
            a, b = np.triu_indices(len(docs), k=1)
            x = sh[a] ^ sh[b]
            ham = np.zeros(len(x), dtype=np.int64)
            for i in range(64):
                ham += ((x >> np.uint64(i)) & np.uint64(1)).astype(np.int64)
            keep = ham <= max_hamming
            if keep.any():
                out.append(pd.DataFrame({"doc_a": docs[a[keep]],
                                         "doc_b": docs[b[keep]],
                                         "hamming": ham[keep]}))
        if not out:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64),
                                 "hamming": pd.Series([], dtype=np.int64)})
        return pd.concat(out, ignore_index=True)

    from ray.data.aggregate import Count

    exploded = sigs.map_batches(explode, batch_format="pyarrow")
    raw = (exploded.map_batches(_add_pair_bucket, batch_format="pyarrow")
           .groupby("bucket")
           .map_groups(pairs_of_bucket, batch_format="pandas"))
    # a pair can surface from several bands -> distinct (hamming is a
    # function of the pair, so grouping on all three keys is exact)
    return (raw.groupby(["doc_a", "doc_b", "hamming"]).aggregate(Count())
            .select_columns(["doc_a", "doc_b", "hamming"]))


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------

def embedding_dup_pairs_ds(emb_ds, threshold: float = 0.95,
                           concurrency: int = 8):
    """All pairs with cosine similarity >= threshold.

    The (normalized) embedding matrix is broadcast once via ray.put;
    each batch does one blocked matmul against it — the brute-force
    baseline; the IVF/LSH variant in simsearch.py is the scale path."""
    import ray

    tbl = pa.concat_tables([t for t in ray.get(emb_ds.to_arrow_refs())
                            if t is not None])
    ids = tbl.column("vec_id").to_numpy().astype(np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64)
                    for v in tbl.column("embedding").to_pylist()])
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    class PairFinder:
        def __init__(self):
            self.ids, self.mat = ray.get(ref)
            self.pos = {int(v): i for i, v in enumerate(self.ids)}

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = batch.column("vec_id").to_numpy().astype(np.int64)
            rows = np.stack([np.asarray(v, dtype=np.float64)
                             for v in batch.column("embedding").to_pylist()])
            rows /= np.maximum(np.linalg.norm(rows, axis=1, keepdims=True), 1e-12)
            sims = rows @ self.mat.T
            out_a, out_b = [], []
            for i, vid in enumerate(bids):
                hit = np.flatnonzero(sims[i] >= threshold)
                for j in hit:
                    other = int(self.ids[j])
                    if other > int(vid):
                        out_a.append(int(vid))
                        out_b.append(other)
            return pa.table({
                "vec_a": pa.array(out_a, pa.int64()),
                "vec_b": pa.array(out_b, pa.int64()),
            })

    return emb_ds.map_batches(PairFinder, batch_format="pyarrow",
                              batch_size=256, concurrency=(1, concurrency),
                              num_cpus=1)


# --------------------------------------------------------------------------
# exact n-gram Jaccard (the non-approximate near-dup baseline)
# --------------------------------------------------------------------------

class _ShingleRows:
    """(doc_id, text) batch -> distinct (doc_id, shingle) rows.

    Shingle = k consecutive tokens joined by a space; docs with fewer
    than k tokens yield NO shingles (matching the SQL-window oracle;
    the MinHash path pads instead -- documented difference)."""

    def __init__(self, k: int) -> None:
        self.k = k
        self.tok = re.compile(TOKEN_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        out_d: list[int] = []
        out_s: list[str] = []
        k = self.k
        for doc, text in zip(ids, texts):
            toks = self.tok.findall(text.lower())
            sh = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
            out_d.extend([int(doc)] * len(sh))
            out_s.extend(sh)
        return pa.table({
            "doc_id": pa.array(out_d, pa.int64()),
            "shingle": pa.array(out_s, pa.string()),
        })


def ngram_jaccard_pairs_ds(docs_ds, k: int = 3, threshold: float = 0.5,
                           concurrency: int = 8):
    """Exact all-pairs n-gram Jaccard >= threshold -> (doc_a, doc_b).

    Shape: shingle rows -> groupby(shingle) pair emission ->
    groupby(pair).count = |intersection|; per-doc shingle cardinalities
    are broadcast (small side).  Exact but quadratic in co-occurring
    docs per shingle -- the scale path is minhash_dedup_pairs_ds; this
    is the oracle-checkable baseline (SURVEY.md training-data ops)."""
    import ray
    from ray.data.aggregate import Count

    shingles = docs_ds.map_batches(
        _ShingleRows, fn_constructor_kwargs={"k": k},
        batch_format="pyarrow", batch_size=1024,
        concurrency=(1, concurrency), num_cpus=1,
    ).materialize()  # used twice: cardinalities + pair emission

    card = {int(r["doc_id"]): int(r["count()"])
            for r in shingles.groupby("doc_id").aggregate(Count()).take_all()}
    card_ref = ray.put(card)

    num_buckets = 64

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = np.asarray([zlib.crc32(s.encode()) % num_buckets
                        for s in batch.column("shingle").to_pylist()],
                       dtype=np.int32)
        return batch.append_column("bucket", pa.array(h, pa.int32()))

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """All co-occurrence pairs within one hash bucket of shingles.

        One UDF call per bucket (not per shingle): equal shingles are
        contiguous after an in-bucket sort, so pair emission is a scan
        over group slices — the per-group-call overhead of
        map_groups(shingle) is avoided."""
        g = g.sort_values(["shingle", "doc_id"], kind="mergesort")
        docs = g["doc_id"].to_numpy()
        codes, starts = np.unique(g["shingle"].to_numpy(), return_index=True)
        bounds = np.append(starts, len(docs))
        out_a, out_b = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            d = docs[s:e]
            a, b = np.triu_indices(len(d), k=1)
            out_a.append(d[a])
            out_b.append(d[b])
        if not out_a:
            return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                                 "doc_b": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"doc_a": np.concatenate(out_a),
                             "doc_b": np.concatenate(out_b)})

    inter = (
        shingles.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_of_bucket, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count())
    )

    class Threshold:
        def __init__(self) -> None:
            self.card = ray.get(card_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            da = batch.column("doc_a").to_numpy(zero_copy_only=False)
            db = batch.column("doc_b").to_numpy(zero_copy_only=False)
            i = batch.column("count()").to_numpy(zero_copy_only=False)
            ca = np.fromiter((self.card[int(x)] for x in da), dtype=np.int64,
                             count=len(da))
            cb = np.fromiter((self.card[int(x)] for x in db), dtype=np.int64,
                             count=len(db))
            keep = i.astype(np.float64) / (ca + cb - i) >= threshold
            return pa.table({
                "doc_a": pa.array(da[keep].astype(np.int64), pa.int64()),
                "doc_b": pa.array(db[keep].astype(np.int64), pa.int64()),
            })

    return inter.map_batches(Threshold, batch_format="pyarrow",
                             batch_size=8192, concurrency=(1, concurrency),
                             num_cpus=1)
