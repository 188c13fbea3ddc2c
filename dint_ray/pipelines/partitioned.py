"""Routed, document-partitioned BM25 serving.

The round-1 serve path decoded the WHOLE index into one driver-built
image and broadcast it to every scorer — correct at sf0.1, the first
thing to die at 10^12 docs.  This module is the scale path:

- **Serve layout** (``build_serve_partitions``): posting lists are
  split at document-bucket boundaries (bucket = doc_id // width) and
  each (term, bucket) segment is DINT-encoded separately (docIDs
  relative to the bucket base).  One parquet directory per bucket
  (``serve_{P}/bucket=b/``), written with Ray's partitioned
  write_parquet — resumable, no whole-shard UDF call.
- **Partition scorers** (``PartitionScorer``, raw Ray actors — the one
  place the Dataset API genuinely can't express the semantics: P
  long-lived owners of disjoint index partitions that every query
  batch must visit): actor b decodes ONLY bucket b in __init__ (no
  driver image, no replication), keeps flat numpy arrays + per-posting
  float32 BM25 weights, and runs the same query algorithms (C kernel
  or Python) over its slice.
- **Routing** (``run_queries_routed``): queries stay a streaming
  Dataset; a router map-stage fans each batch to all P owners and
  merges per-bucket top-k exactly.

Exactness: documents are partitioned disjointly, BM25 depends on the
doc's own tf/len plus GLOBAL collection stats (df, N, avg length), so
a doc's full score is computed in its home bucket; the cross-bucket
merge of per-bucket top-k under the global (score desc, docid asc)
order is therefore rank-identical to single-image serving (asserted in
tests and by the *_routed oracle entries).  WAND/MaxScore bounds use
per-(term,bucket) local maxima — tighter than global, still upper
bounds within the bucket.

Reference behavior mirrored: queries.cpp:69-83 (one mmap image,
warmup) generalized to P owners; SURVEY.md §2.6 J3 / §2.8 O1.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


# --------------------------------------------------------------------------
# serve-layout build
# --------------------------------------------------------------------------

def serve_dir_for(index_dir: str, num_buckets: int) -> str:
    return os.path.join(index_dir, f"serve_{num_buckets}")


def build_serve_partitions(index_dir: str, num_buckets: int,
                           concurrency: int = 8) -> str:
    """Split + re-encode the built index into doc-bucket partitions.

    Reads the grouped-postings checkpoint (term_id, docs, freqs) the
    build already wrote, so this is one distributed map over lists —
    no extra shuffle (lists are split columnar-wise per batch)."""
    import ray
    import ray.data as rd

    from dint_ray.index.build import load_codec_bundle

    out_dir = serve_dir_for(index_dir, num_buckets)
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    num_docs = int(manifest["num_docs"])
    width = (num_docs + num_buckets - 1) // num_buckets

    sz = pq.read_table(os.path.join(index_dir, "sizes.parquet"))
    sizes = np.zeros(num_docs, dtype=np.uint32)
    sizes[sz.column("doc_id").to_numpy().astype(np.int64)] = \
        sz.column("len").to_numpy()
    avg = float(np.asarray(sizes, dtype=np.float64).sum()) / num_docs
    norm_lens = (sizes.astype(np.float32) / np.float32(avg)).astype(np.float32)

    dicts = load_codec_bundle(index_dir, manifest["dict_kind"])
    dicts_ref = ray.put(dicts)
    norms_ref = ray.put(norm_lens)

    class SplitEncode:
        def __init__(self):
            from dint_ray.scoring import doc_term_weight

            d = ray.get(dicts_ref)
            self.docs_codec, self.freqs_codec = d.codecs()
            self.norms = ray.get(norms_ref)
            self._dtw = doc_term_weight

        def __call__(self, batch: pa.Table) -> pa.Table:
            from dint_ray.index.layout import write_posting_list
            from dint_ray.util import list_views

            tids = batch.column("term_id").to_numpy()
            docs_views = list_views(batch.column("docs"))
            freqs_views = list_views(batch.column("freqs"))
            o_bucket, o_tid, o_df, o_mw, o_pl = [], [], [], [], []
            for tid, docs, freqs in zip(tids, docs_views, freqs_views):
                docs = np.ascontiguousarray(docs, dtype=np.uint32)
                freqs = np.ascontiguousarray(freqs, dtype=np.uint32)
                edges = np.arange(width, num_docs, width, dtype=np.uint32)
                cuts = np.concatenate(
                    ([0], np.searchsorted(docs, edges), [len(docs)]))
                for b in range(len(cuts) - 1):
                    lo_i, hi_i = int(cuts[b]), int(cuts[b + 1])
                    if hi_i == lo_i:
                        continue
                    seg_d = docs[lo_i:hi_i]
                    seg_f = freqs[lo_i:hi_i]
                    base = b * width
                    rel = (seg_d - np.uint32(base)).astype(np.uint32)
                    pl = write_posting_list(rel, seg_f, self.docs_codec,
                                            self.freqs_codec)
                    w = self._dtw(seg_f, self.norms[seg_d])
                    o_bucket.append(b)
                    o_tid.append(int(tid))
                    o_df.append(hi_i - lo_i)
                    o_mw.append(float(w.max()))
                    o_pl.append(pl)
            return pa.table({
                "bucket": pa.array(o_bucket, pa.int32()),
                "term_id": pa.array(np.asarray(o_tid, np.uint32), pa.uint32()),
                "df_local": pa.array(np.asarray(o_df, np.uint32), pa.uint32()),
                "max_weight": pa.array(np.asarray(o_mw, np.float32),
                                       pa.float32()),
                "payload": pa.array(o_pl, pa.binary()),
            })

    lists_ds = rd.read_parquet(os.path.join(index_dir, "postings"))
    (lists_ds.map_batches(SplitEncode, batch_format="pyarrow",
                          batch_size=None, concurrency=(1, concurrency),
                          num_cpus=1)
     .write_parquet(out_dir, partition_cols=["bucket"]))

    meta = {"num_buckets": num_buckets, "bucket_width": width,
            "num_docs": num_docs, "avg_doc_len": avg}
    with open(os.path.join(out_dir, "meta.json.tmp"), "w") as f:
        json.dump(meta, f)
    os.replace(os.path.join(out_dir, "meta.json.tmp"),
               os.path.join(out_dir, "meta.json"))
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write("ok")
    return out_dir


# --------------------------------------------------------------------------
# partition-local index state
# --------------------------------------------------------------------------

class _OffsetNorms:
    """Global-docid-indexable view over a bucket's norm slice — an
    actor holds O(bucket) floats, never O(num_docs)."""

    __slots__ = ("base", "vals")

    def __init__(self, base: int, vals: np.ndarray) -> None:
        self.base = base
        self.vals = vals

    def __getitem__(self, docs):
        return self.vals[np.asarray(docs, dtype=np.int64) - self.base]


class _LocalWand:
    """WandData-shaped object for one bucket: per-term LOCAL max
    weights (valid, tighter bounds within the bucket) + offset norms."""

    def __init__(self, norms32: _OffsetNorms, norms64: _OffsetNorms,
                 max_term_weight: np.ndarray) -> None:
        self._n32 = norms32
        self._n64 = norms64
        self.max_term_weight = max_term_weight

    def norms(self, dtype=np.float32):
        return self._n32 if dtype is np.float32 else self._n64


class PartitionScorer:
    """Owns ONE doc bucket: decodes its segments once in __init__ into
    flat arrays + pre-scored float32 weights, then serves whole query
    batches.  Global collection stats (df per term, N, avg len) come
    from the build artifacts, so scores equal the single-image path."""

    def __init__(self, index_dir: str, serve_dir: str, bucket: int) -> None:
        from dint_ray.index.build import load_codec_bundle
        from dint_ray.pipelines.serve import SharedScoredIndex
        from dint_ray.scoring import doc_term_weight

        with open(os.path.join(index_dir, "manifest.json")) as f:
            manifest = json.load(f)
        with open(os.path.join(serve_dir, "meta.json")) as f:
            meta = json.load(f)
        self.manifest = manifest
        self.bucket = bucket
        self.num_docs = int(manifest["num_docs"])
        nterms = int(manifest["num_terms"])
        width = int(meta["bucket_width"])
        self.base = bucket * width
        hi = min(self.base + width, self.num_docs)

        # bucket-local doc stats, global df
        sz = pq.read_table(os.path.join(index_dir, "sizes.parquet"))
        sizes = np.zeros(self.num_docs, dtype=np.uint32)
        sizes[sz.column("doc_id").to_numpy().astype(np.int64)] = \
            sz.column("len").to_numpy()
        self.sizes_all_sum = float(np.asarray(sizes, np.float64).sum())
        local_sizes = sizes[self.base:hi]
        avg32 = np.float32(self.sizes_all_sum / self.num_docs)
        n32 = (local_sizes.astype(np.float32) / avg32).astype(np.float32)
        avg64 = self.sizes_all_sum / self.num_docs
        n64 = local_sizes.astype(np.float64) / avg64
        self.local_sizes = local_sizes

        vt = pq.read_table(os.path.join(index_dir, "vocab.parquet"),
                           columns=["term_id", "df"])
        df_global = np.zeros(nterms, dtype=np.int64)
        df_global[vt.column("term_id").to_numpy().astype(np.int64)] = \
            vt.column("df").to_numpy().astype(np.int64)

        docs_codec, freqs_codec = \
            load_codec_bundle(index_dir, manifest["dict_kind"]).codecs()

        from dint_ray.index.layout import PostingListView

        files = sorted(glob.glob(
            os.path.join(serve_dir, f"bucket={bucket}", "*.parquet")))
        starts = np.full(nterms, -1, dtype=np.int64)
        ends = np.zeros(nterms, dtype=np.int64)
        mw = np.zeros(nterms, dtype=np.float32)
        d_parts, f_parts, w_parts = [], [], []
        off = 0
        for path in files:
            t = pq.read_table(path)
            tids = t.column("term_id").to_numpy()
            mws = t.column("max_weight").to_numpy()
            pls = t.column("payload").to_pylist()
            for tid, m, pl in zip(tids, mws, pls):
                v = PostingListView(pl, docs_codec, freqs_codec)
                rel, freqs = v.decode_all()
                docs = rel.astype(np.uint32) + np.uint32(self.base)
                w = doc_term_weight(freqs, n32[rel])
                tid = int(tid)
                starts[tid] = off
                ends[tid] = off + len(docs)
                mw[tid] = m
                d_parts.append(docs)
                f_parts.append(freqs)
                w_parts.append(w)
                off += len(docs)
        e32 = np.empty(0, np.uint32)
        ef = np.empty(0, np.float32)
        self.index = SharedScoredIndex(
            self.num_docs, starts, ends,
            np.concatenate(d_parts) if d_parts else e32,
            np.concatenate(f_parts) if f_parts else e32,
            np.concatenate(w_parts) if w_parts else ef)
        self.index.df_global = df_global
        self.wand = _LocalWand(_OffsetNorms(self.base, n32),
                               _OffsetNorms(self.base, n64), mw)
        self.df_global = df_global
        self._profile: dict[int, int] = {}

    # ---- float32 production scoring ----
    def score_topk(self, qids, terms_list, algo: str, k: int):
        """[(qid, [(doc, score), ...]) ...] — per-bucket top-k."""
        from dint_ray.queries import algorithms as qa

        fn = getattr(qa, algo)
        out = []
        for qid, terms in zip(qids, terms_list):
            res = fn(self.index, self.wand, list(terms), k)
            for t in set(terms):
                if t in self.index:
                    self._profile[t] = self._profile.get(t, 0) + 1
            out.append((int(qid), res))
        return out

    def score_counts(self, qids, terms_list):
        from dint_ray.queries import algorithms as qa

        return [(int(q), qa.and_count(self.index, list(t)),
                 qa.or_count(self.index, list(t)))
                for q, t in zip(qids, terms_list)]

    # ---- quantized conformance scoring (mirrors _ConformanceScorer) ----
    def score_quantized(self, qids, terms_list, mode: str, k: int,
                        check_algo: str | None = None):
        from dint_ray.queries.algorithms import query_freqs

        N = np.float64(self.num_docs)
        avg = np.float64(self.sizes_all_sum / self.num_docs)
        out = []
        for qid, terms in zip(qids, terms_list):
            acc: dict[int, int] = {}
            hits: dict[int, int] = {}
            ndistinct = 0
            for term, qf in query_freqs(list(terms)):
                ndistinct += 1
                if term not in self.index:
                    continue
                docs, freqs = self.index.decode(term)
                df = np.float64(self.df_global[term])    # GLOBAL df
                g = max(np.float64(1e-6),
                        np.log((N - df + 0.5) / (df + 0.5)))
                qtw = np.float64(qf) * g * 2.2
                tf = freqs.astype(np.float64)
                lens = self.local_sizes[docs.astype(np.int64) - self.base] \
                    .astype(np.float64)
                c = qtw * tf / (tf + 1.2 * (0.5 + 0.5 * (lens / avg))) * 1e15
                cu = np.floor(c + 0.5).astype(np.int64)
                for d, v in zip(docs.astype(np.int64), cu):
                    d = int(d)
                    acc[d] = acc.get(d, 0) + int(v)
                    hits[d] = hits.get(d, 0) + 1
            if mode == "ranked_and":
                acc = {d: s for d, s in acc.items() if hits[d] == ndistinct}
            order = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
            if check_algo:
                # cross-check the pruned float64 algorithm on this slice
                # against the quantized exhaustive order (warning-only,
                # as _ConformanceScorer does)
                from dint_ray.queries import algorithms as qa

                got = getattr(qa, check_algo)(
                    self.index, self.wand, list(terms), k, dtype=np.float64)
                if {d for d, _ in got} != {d for d, _ in order}:
                    import logging

                    logging.getLogger(__name__).warning(
                        "%s bucket %d top-k set differs from quantized "
                        "oracle for %s", check_algo, self.bucket, terms)
            out.append((int(qid), order))
        return out

    def block_profile(self):
        """term -> query-touch count for this bucket (the
        block_profiler equivalent, per-actor counters merged by the
        caller — /root/reference/include/ds2i/block_profiler.hpp:9-63)."""
        return dict(self._profile)


# --------------------------------------------------------------------------
# routing
# --------------------------------------------------------------------------

_ACTOR_CACHE: dict[tuple, list] = {}


def partition_actors(index_dir: str, num_buckets: int,
                     num_cpus_each: float = 0.25):
    """Create (or reuse) the P bucket-owner actors.

    The owners are resident state, not schedulable work units: they
    reserve a fractional CPU so a cached actor set never starves later
    Ray Data jobs (hash-shuffle aggregator pools deadlock when
    fully-held CPUs make their minimum pool unschedulable); real CPU
    pressure during a query burst is bounded by the router pool's
    concurrency, which provides the backpressure."""
    import ray

    key = (os.path.abspath(index_dir), num_buckets)
    actors = _ACTOR_CACHE.get(key)
    if actors is None:
        # evict other bucket configurations (their actors hold CPU
        # reservations; two live sets can deadlock a small cluster)
        for old in [k for k in _ACTOR_CACHE if k != key]:
            for a in _ACTOR_CACHE.pop(old):
                ray.kill(a)
        serve_dir = build_serve_partitions(index_dir, num_buckets)
        cls = ray.remote(PartitionScorer).options(num_cpus=num_cpus_each)
        actors = [cls.remote(index_dir, serve_dir, b)
                  for b in range(num_buckets)]
        _ACTOR_CACHE[key] = actors
    return actors


def drop_actors(index_dir: str, num_buckets: int) -> None:
    import ray

    key = (os.path.abspath(index_dir), num_buckets)
    for a in _ACTOR_CACHE.pop(key, []):
        ray.kill(a)


def merge_topk(parts, k: int):
    """parts: per-bucket [(doc, score)] lists -> exact global top-k
    under (score desc, docid asc)."""
    allr = [p for part in parts for p in part]
    allr.sort(key=lambda ds: (-ds[1], ds[0]))
    return allr[:k]


class _Router:
    """Stateless fan-out stage: sends each query batch to all P bucket
    owners and merges per-bucket top-k exactly."""

    def __init__(self, actors, algo: str, k: int, quantized: bool,
                 mode: str | None = None) -> None:
        self.actors = actors
        self.algo = algo
        self.k = k
        self.quantized = quantized
        self.mode = mode or algo

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        qids = batch.column("query_id").to_numpy()
        terms_list = [list(v.as_py()) for v in batch.column("terms")]
        if self.quantized:
            chk = self.algo if self.algo in ("wand", "maxscore",
                                             "block_max_wand") else None
            refs = [a.score_quantized.remote(qids, terms_list, self.mode,
                                             self.k, chk)
                    for a in self.actors]
        else:
            refs = [a.score_topk.remote(qids, terms_list, self.algo, self.k)
                    for a in self.actors]
        parts = ray.get(refs)
        o_q, o_r, o_d, o_s = [], [], [], []
        for i, qid in enumerate(qids):
            merged = merge_topk([p[i][1] for p in parts], self.k)
            for rank, (doc, score) in enumerate(merged):
                o_q.append(int(qid))
                o_r.append(rank + 1 if self.quantized else rank)
                o_d.append(int(doc))
                o_s.append(score)
        if self.quantized:
            return pa.table({
                "query_id": pa.array(o_q, pa.int64()),
                "rank": pa.array(o_r, pa.int64()),
                "doc_id": pa.array(o_d, pa.int64()),
                "score_u": pa.array(o_s, pa.int64()),
            })
        return pa.table({
            "query_id": pa.array(o_q, pa.uint64()),
            "rank": pa.array(o_r, pa.uint32()),
            "doc_id": pa.array(o_d, pa.uint64()),
            "score": pa.array(np.asarray(o_s, np.float32), pa.float32()),
        })


def run_queries_routed(queries_ds, index_dir: str, algo: str = "wand",
                       k: int = 10, num_buckets: int = 8,
                       router_concurrency: int = 4, batch_size: int = 64,
                       quantized: bool = False, mode: str | None = None):
    """queries Dataset -> (query_id, rank, doc_id, score[(_u)]) Dataset
    via the routed doc-partitioned path."""
    actors = partition_actors(index_dir, num_buckets)
    return queries_ds.map_batches(
        _Router,
        fn_constructor_kwargs={"actors": actors, "algo": algo, "k": k,
                               "quantized": quantized, "mode": mode},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=router_concurrency, num_cpus=0.5,
    )


def collect_block_profile(index_dir: str, num_buckets: int) -> dict[int, int]:
    """Merged per-term access counters from all bucket owners."""
    import ray

    key = (os.path.abspath(index_dir), num_buckets)
    actors = _ACTOR_CACHE.get(key, [])
    merged: dict[int, int] = {}
    for prof in ray.get([a.block_profile.remote() for a in actors]):
        for t, c in prof.items():
            merged[t] = merged.get(t, 0) + c
    return merged
