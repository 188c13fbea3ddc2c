"""Distributed BM25 query serving.

Queries are a Dataset of (query_id, terms).  Two paths:

- ROUTED (default, pipelines/partitioned.py): doc-bucket owner actors
  each decode only their slice; async scatter-gather + exact merge.
  The shape that survives 10^12 docs (SURVEY.md §2.6 J3 / §2.8 O1).
- BROADCAST (``broadcast=True``): the whole index is decoded once into
  a shared zero-copy image (SharedScoredIndex) and shipped to a scorer
  actor pool via the object store — lowest latency while the index
  fits one worker's memory (ST2-ST4 in SURVEY.md §2.3; the reference's
  single mmap image, queries.cpp:69-83).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa


ALGOS = ("ranked_or", "ranked_or_fast", "ranked_and", "wand", "maxscore",
         "block_max_wand", "and", "or")


class _ArrayEnumerator:
    """DocumentEnumerator-compatible cursor over a decoded docs array."""

    __slots__ = ("docs", "freqs", "universe", "pos", "n")

    def __init__(self, docs, freqs, universe):
        self.docs = docs
        self.freqs = freqs
        self.universe = universe
        self.pos = 0
        self.n = len(docs)

    @property
    def size(self):
        return self.n

    def docid(self):
        p = self.pos
        return int(self.docs[p]) if p < self.n else self.universe

    def freq(self):
        return int(self.freqs[self.pos])

    def next(self):
        self.pos += 1

    def next_geq(self, lb):
        p = self.pos
        if p < self.n and self.docs[p] < lb:
            self.pos = p + int(np.searchsorted(self.docs[p:], lb, side="left"))

    def move(self, position):
        self.pos = position


class SharedScoredIndex:
    """Decoded, pre-scored index as flat numpy arrays.

    Built ONCE (distributed decode over shards) and shipped to every
    scorer actor via the object store — numpy members are zero-copy on
    ray.get, so N actors share one physical copy instead of each
    decoding + scoring the whole index in its own heap (that per-actor
    warmup made serving throughput FLAT in actor count).  The decode
    path itself stays exercised by the build's verify stage and the
    roundtrip conformance entries."""

    def __init__(self, num_docs, starts, ends, docs_vals, freqs_vals,
                 w32_vals) -> None:
        self.num_docs = num_docs
        self.starts = starts          # int64 per term_id, -1 = absent
        self.ends = ends
        self.docs_vals = docs_vals
        self.freqs_vals = freqs_vals
        self.w32_vals = w32_vals      # float32 doc-term weights (dtw)
        self._dtw64: dict[int, np.ndarray] = {}
        self._norms64 = None

    def __contains__(self, term_id: int) -> bool:
        return 0 <= term_id < len(self.starts) and self.starts[term_id] >= 0

    def _span(self, term_id: int):
        return int(self.starts[term_id]), int(self.ends[term_id])

    def cached_decode(self, term_id: int):
        a, b = self._span(term_id)
        return self.docs_vals[a:b], self.freqs_vals[a:b]

    decode = cached_decode

    def size(self, term_id: int) -> int:
        a, b = self._span(term_id)
        return b - a

    def doc_term_weights(self, term_id: int, norms, dtype):
        a, b = self._span(term_id)
        if dtype is np.float32:
            return self.w32_vals[a:b]
        w = self._dtw64.get(term_id)
        if w is None:
            from dint_ray.scoring import doc_term_weight

            docs, freqs = self.cached_decode(term_id)
            w = doc_term_weight(freqs, norms[docs], dtype)
            self._dtw64[term_id] = w
        return w

    def enumerator(self, term_id: int) -> _ArrayEnumerator:
        docs, freqs = self.cached_decode(term_id)
        return _ArrayEnumerator(docs, freqs, self.num_docs)

    def block_bounds(self, term_id: int, norms, dtype):
        key = (term_id, dtype, "bm")
        r = self._dtw64.get(key)
        if r is None:
            from dint_ray.index.shards import _block_bounds_of

            docs, _ = self.cached_decode(term_id)
            r = _block_bounds_of(docs, self.doc_term_weights(term_id, norms, dtype))
            self._dtw64[key] = r
        return r


_SHARED_CACHE: dict[str, tuple] = {}
_REF_CACHE: dict[str, object] = {}


def build_shared_index(index_dir: str):
    """(SharedScoredIndex, WandData, manifest): distributed decode of
    all shards + per-posting float32 BM25 weights, one pass.

    Cached per index_dir in the driver process — the reference's
    warmup pass (queries.cpp:74-83) amortized the same way."""
    key = os.path.abspath(index_dir)
    if key in _SHARED_CACHE:
        return _SHARED_CACHE[key]
    out = _build_shared_index(index_dir)
    _SHARED_CACHE[key] = out
    return out


def _build_shared_index(index_dir: str):
    import glob
    import json

    import ray
    import ray.data as rd

    from dint_ray.dint.dictionary import load as load_dict
    from dint_ray.index.build import BuiltDicts
    from dint_ray.index.layout import PostingListView
    from dint_ray.scoring import WandData, doc_term_weight

    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    kind = manifest["dict_kind"]
    dict_path = os.path.join(index_dir, f"dicts_{kind}.npz")

    import pyarrow.parquet as pq

    sz = pq.read_table(os.path.join(index_dir, "sizes.parquet"))
    sizes = np.zeros(manifest["num_docs"], dtype=np.uint32)
    sizes[sz.column("doc_id").to_numpy().astype(np.int64)] = sz.column("len").to_numpy()
    avg = np.float32(float(np.asarray(sizes, dtype=np.float64).sum())
                     / manifest["num_docs"])
    norm_lens = (sizes.astype(np.float32) / avg).astype(np.float32)
    norms_ref = ray.put(norm_lens)

    class DecodeShard:
        def __init__(self):
            from dint_ray.index.build import load_codec_bundle

            self.docs_codec, self.freqs_codec = \
                load_codec_bundle(index_dir, kind).codecs()
            self.norms = ray.get(norms_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            # partitioned shard files carry rows in write order — sort
            # by term so the downstream span computation (which expects
            # contiguous per-term runs) stays valid
            tids = batch.column("term_id").to_numpy()
            order = np.argsort(tids, kind="stable")
            tids = tids[order]
            pl_all = batch.column("payload").to_pylist()
            payloads = [pl_all[i] for i in order]
            t_out, d_out, f_out, w_out = [], [], [], []
            for tid, pl in zip(tids, payloads):
                v = PostingListView(pl, self.docs_codec, self.freqs_codec)
                docs, freqs = v.decode_all()
                t_out.append(np.full(len(docs), tid, np.uint32))
                d_out.append(docs)
                f_out.append(freqs)
                w_out.append(doc_term_weight(freqs, self.norms[docs]))
            e32 = np.empty(0, np.uint32)
            if not t_out:
                return pa.table({
                    "term_id": pa.array(e32, pa.uint32()),
                    "doc_id": pa.array(e32, pa.uint32()),
                    "tf": pa.array(e32, pa.uint32()),
                    "w32": pa.array(np.empty(0, np.float32), pa.float32()),
                })
            tids_f = np.concatenate(t_out)
            docs_f = np.concatenate(d_out)
            freqs_f = np.concatenate(f_out)
            w_f = np.concatenate(w_out)
            # duplicate term rows in one batch (block-split fragments)
            # would otherwise form one contiguous run with UNSORTED
            # docs; a (term, doc) lexsort makes every run cursor-valid
            order = np.lexsort((docs_f, tids_f))
            return pa.table({
                "term_id": pa.array(tids_f[order], pa.uint32()),
                "doc_id": pa.array(docs_f[order].astype(np.uint32),
                                   pa.uint32()),
                "tf": pa.array(freqs_f[order].astype(np.uint32),
                               pa.uint32()),
                "w32": pa.array(w_f[order], pa.float32()),
            })

    from dint_ray.index.shards import shard_files as _sf

    shard_files = _sf(index_dir)
    flat = rd.read_parquet(shard_files).map_batches(
        DecodeShard, batch_format="pyarrow", batch_size=None,
        concurrency=(1, max(4, len(shard_files) // 2)), num_cpus=1)
    tabs = [t for t in ray.get(flat.to_arrow_refs()) if t is not None and t.num_rows]
    nterms = manifest["num_terms"]
    starts = np.full(nterms, -1, dtype=np.int64)
    ends = np.zeros(nterms, dtype=np.int64)
    docs_parts, freqs_parts, w_parts = [], [], []
    off = 0
    # spans from contiguous runs: every term is exactly one posting-list
    # row, so its decoded postings form one contiguous run; blocks may
    # coalesce several (individually sorted) batches, so global term
    # order across a block is NOT guaranteed — only run contiguity is
    needs_rebuild = False
    for t in tabs:
        tid = t.column("term_id").to_numpy()
        change = np.flatnonzero(np.diff(tid.astype(np.int64))) + 1
        s_idx = np.concatenate(([0], change))
        e_idx = np.concatenate((change, [len(tid)]))
        run_terms = tid[s_idx].astype(np.int64)
        fresh = starts[run_terms] == -1
        # a term split across consecutive blocks (block splitting of a
        # big row) just extends its end; a NON-contiguous repeat means
        # duplicate list rows (hash-partition output split into blocks
        # upstream) — the run arithmetic can't represent that, so fall
        # back to a global lexsort rebuild below
        if not (fresh | (ends[run_terms] == off + s_idx)).all():
            needs_rebuild = True
        starts[run_terms[fresh]] = off + s_idx[fresh]
        ends[run_terms] = off + e_idx
        docs_parts.append(t.column("doc_id").to_numpy())
        freqs_parts.append(t.column("tf").to_numpy())
        w_parts.append(t.column("w32").to_numpy())
        off += len(tid)
    docs_all = np.concatenate(docs_parts)
    freqs_all = np.concatenate(freqs_parts)
    w_all = np.concatenate(w_parts)
    if needs_rebuild:
        tid_all = np.concatenate(
            [t.column("term_id").to_numpy() for t in tabs]).astype(np.int64)
        order = np.lexsort((docs_all, tid_all))
        tid_all = tid_all[order]
        docs_all, freqs_all, w_all = \
            docs_all[order], freqs_all[order], w_all[order]
        starts.fill(-1)
        ends.fill(0)
        change = np.flatnonzero(np.diff(tid_all)) + 1
        s_idx = np.concatenate(([0], change))
        e_idx = np.concatenate((change, [len(tid_all)]))
        starts[tid_all[s_idx]] = s_idx
        ends[tid_all[s_idx]] = e_idx
    idx = SharedScoredIndex(manifest["num_docs"], starts, ends,
                            docs_all, freqs_all, w_all)

    mw = np.zeros(manifest["num_terms"], dtype=np.float32)
    for shard_tbl in (pq.read_table(f, columns=["term_id", "max_weight"])
                      for f in shard_files):
        t = shard_tbl.column("term_id").to_numpy()
        w = shard_tbl.column("max_weight").to_numpy()
        # duplicate term rows: keep the max (overwrite would understate
        # another fragment's bound)
        np.maximum.at(mw, t, w)
    wand = WandData(norm_lens, mw, sizes=sizes)
    return idx, wand, manifest


class ScorerActor:
    """Each actor holds the index once (ST2-ST4).  Pass either
    ``index_ref`` (a ray.put of the loaded (index, wand) pair — loaded
    once on the driver, shared via the object store, no per-actor file
    I/O) or ``index_dir`` (each actor reads its shards itself — the
    shape that hash-partitions across actors at scale)."""

    def __init__(self, index_dir: str | None = None, algo: str = "wand",
                 k: int = 10, index_ref=None) -> None:
        from dint_ray.queries import algorithms as qa

        assert algo in ALGOS
        if index_ref is not None:
            import ray

            self.index, self.wand = ray.get(index_ref)
            self.manifest = None
        else:
            from dint_ray.pipelines.build import load_built_index

            self.index, self.wand, self.manifest = load_built_index(index_dir)
        self.k = k
        self.algo = algo
        self.qa = qa

    def _run_one(self, terms: list[int]):
        qa = self.qa
        if self.algo == "and":
            return [(qa.and_count(self.index, terms), np.float32(0))]
        if self.algo == "or":
            return [(qa.or_count(self.index, terms), np.float32(0))]
        fn = getattr(qa, self.algo)
        return fn(self.index, self.wand, terms, self.k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch.column("query_id").to_numpy()
        terms_col = batch.column("terms")
        out_qid, out_rank, out_doc, out_score = [], [], [], []
        for i, qid in enumerate(qids):
            terms = [int(t) for t in terms_col[i].as_py()]
            for rank, (doc, score) in enumerate(self._run_one(terms)):
                out_qid.append(int(qid))
                out_rank.append(rank)
                out_doc.append(int(doc))
                out_score.append(float(score))
        return pa.table({
            "query_id": pa.array(out_qid, pa.uint64()),
            "rank": pa.array(out_rank, pa.uint32()),
            "doc_id": pa.array(out_doc, pa.uint64()),
            "score": pa.array(out_score, pa.float32()),
        })


def run_queries_ray(queries_ds, index_dir: str, algo: str = "wand",
                    k: int = 10, concurrency: int = 8, batch_size: int = 64,
                    broadcast: bool = False, num_buckets: int | None = None):
    """queries Dataset -> (query_id, rank, doc_id, score) Dataset.

    Default path is ROUTED doc-partitioned serving (each scorer actor
    owns one doc bucket, decoded locally — pipelines/partitioned.py):
    the shape that survives 10^12 docs.  ``broadcast=True`` keeps the
    single shared-image path (driver decodes once, ships via ray.put) —
    right when the whole index fits one worker's memory and lowest
    latency is wanted at test scale."""
    import dint_ray
    dint_ray.ensure_tuned()
    if not broadcast and algo in ("wand", "maxscore", "block_max_wand",
                                  "ranked_or", "ranked_and"):
        from dint_ray.pipelines.partitioned import run_queries_routed

        # bucket count is a memory decision (fixed by index size);
        # scale throughput with the cluster via replicas + routers.
        # A direct-built index (build_serve_direct) fixed its bucket
        # count at build time — the manifest records it, and the index
        # CANNOT be re-bucketed (the direct build never wrote the
        # whole-list postings checkpoint build_serve_partitions needs),
        # so a mismatched explicit request fails loudly here instead of
        # producing an opaque missing-checkpoint error downstream.
        try:
            with open(os.path.join(index_dir, "manifest.json")) as f:
                m = json.load(f)
        except (OSError, ValueError):
            m = {}
        if m.get("build_mode") == "serve_direct":
            built_buckets = int(m["num_buckets"])
            if num_buckets is not None and num_buckets != built_buckets:
                raise ValueError(
                    f"index at {index_dir} was direct-built with "
                    f"num_buckets={built_buckets} and cannot serve with "
                    f"num_buckets={num_buckets}; rebuild with "
                    f"build_serve_direct(num_buckets={num_buckets}) or "
                    f"drop the explicit bucket count")
            num_buckets = built_buckets
        buckets = num_buckets or min(8, max(2, concurrency // 2))
        replicas = max(1, concurrency // (2 * buckets))
        return run_queries_routed(
            queries_ds, index_dir, algo=algo, k=k, num_buckets=buckets,
            router_concurrency=max(2, concurrency // 2),
            batch_size=batch_size, num_replicas=replicas)
    kwargs = {"algo": algo, "k": k}
    import ray

    key = os.path.abspath(index_dir)
    ref = _REF_CACHE.get(key)
    if ref is None:
        index, wand, _ = build_shared_index(index_dir)
        ref = _REF_CACHE[key] = ray.put((index, wand))
    kwargs["index_ref"] = ref
    return queries_ds.map_batches(
        ScorerActor,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        # fixed pool: all scorers spin up immediately (an autoscaling
        # (1, N) pool ramps from one actor and serializes the burst)
        concurrency=concurrency,
        num_cpus=1,
    )


def queries_to_dataset(queries: list[list[int]]):
    import ray.data as rd

    return rd.from_items([
        {"query_id": i, "terms": q} for i, q in enumerate(queries)
    ])
