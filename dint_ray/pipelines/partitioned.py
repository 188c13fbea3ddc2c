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
- **Routing** (``run_queries_routed``): async scatter-gather — the
  driver streams query batches (one ray.put block ref each, shared by
  every owner on the node), fans each batch to one REPLICA of every
  bucket owner without blocking, and chains one remote vectorized
  merge task per batch under a bounded in-flight window.  Bucket count
  is a memory decision; replica count is the throughput lever (owners
  are read-only).  A synchronous per-batch router was measured at
  ~half the owner ceiling — the round-trip wait serialized it.

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
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


# --------------------------------------------------------------------------
# serve-layout build
# --------------------------------------------------------------------------

def serve_dir_for(index_dir: str, num_buckets: int) -> str:
    return os.path.join(index_dir, f"serve_{num_buckets}")


def build_serve_partitions(index_dir: str, num_buckets: int,
                           concurrency: int = 0) -> str:
    """Split + re-encode the built index into doc-bucket partitions.

    Reads the grouped-postings checkpoint (term_id, docs, freqs) the
    build already wrote, so this is one distributed map over lists —
    no extra shuffle (lists are split columnar-wise per batch).

    concurrency=0 sizes the actor pool to the cluster via
    BuildConfig.pool_bounds — NEVER pass a fixed pool equal to the
    cluster CPU count: a fixed pool reserves every logical CPU before
    processing, so the fused read tasks and the write_parquet operator
    can't schedule and the stage deadlocks (observed at 8 CPUs)."""
    import dint_ray
    dint_ray.ensure_tuned()
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
    avg = float(manifest["avg_doc_len"])
    sizes_path = os.path.join(index_dir, "sizes.parquet")

    dicts = load_codec_bundle(index_dir, manifest["dict_kind"])
    dicts_ref = ray.put(dicts)

    class SplitEncode:
        """Splits whole lists into bucket segments.  Doc norms are
        range-read per bucket (index/docstats.py) with the loop
        bucket-OUTER so one slice serves every list in the batch —
        resident doc stats are O(slice), never O(num_docs)."""

        def __init__(self):
            from dint_ray.index.docstats import DocStats
            from dint_ray.scoring import doc_term_weight

            d = ray.get(dicts_ref)
            self.docs_codec, self.freqs_codec = d.codecs()
            self.stats = DocStats(sizes_path, num_docs, avg,
                                  cache_slices=2)
            self._dtw = doc_term_weight

        def __call__(self, batch: pa.Table) -> pa.Table:
            from dint_ray.index.layout import write_posting_list
            from dint_ray.util import list_views

            tids = batch.column("term_id").to_numpy()
            docs_views = [np.ascontiguousarray(v, dtype=np.uint32)
                          for v in list_views(batch.column("docs"))]
            freqs_views = [np.ascontiguousarray(v, dtype=np.uint32)
                          for v in list_views(batch.column("freqs"))]
            # exactly num_buckets-1 boundaries (clipped): ceil division
            # can make the last bucket(s) empty, so deriving edges from
            # num_docs alone under-counts and cuts[b + 1] walks off the
            # end for e.g. num_docs=9, num_buckets=4 (width 3 -> 3 full
            # buckets).  Empty trailing buckets are skipped below.
            edges = np.minimum(
                np.arange(1, num_buckets, dtype=np.int64) * width,
                num_docs).astype(np.uint32)
            all_cuts = [np.concatenate(
                ([0], np.searchsorted(d, edges), [len(d)]))
                for d in docs_views]
            o_bucket, o_tid, o_df, o_mw, o_pl = [], [], [], [], []
            for b in range(num_buckets):
                base = b * width
                hi_doc = min(base + width, num_docs)
                norms = None
                for tid, docs, freqs, cuts in zip(tids, docs_views,
                                                  freqs_views, all_cuts):
                    lo_i, hi_i = int(cuts[b]), int(cuts[b + 1])
                    if hi_i == lo_i:
                        continue
                    if norms is None:
                        norms = self.stats.range_norms32(base, hi_doc)
                    seg_f = freqs[lo_i:hi_i]
                    rel = (docs[lo_i:hi_i] - np.uint32(base)) \
                        .astype(np.uint32)
                    pl = write_posting_list(rel, seg_f, self.docs_codec,
                                            self.freqs_codec)
                    w = self._dtw(seg_f, norms[rel])
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

    from dint_ray.config import BuildConfig

    lists_ds = rd.read_parquet(os.path.join(index_dir, "postings"))
    (lists_ds.map_batches(SplitEncode, batch_format="pyarrow",
                          batch_size=None,
                          concurrency=BuildConfig().pool_bounds(concurrency),
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
# direct serve-layout build (no whole-list materialization anywhere)
# --------------------------------------------------------------------------

def _segment_rows_block(batch: pa.Table, *, width: int) -> pa.Table:
    """One hash partition of keyed posting rows -> (bucket, term)
    segment rows with bucket-RELATIVE sorted docids, in one vectorized
    kernel (lexsort + boundary slice, postings._lists_by_key)."""
    from dint_ray.postings import _lists_by_key

    if batch.num_rows == 0:
        return pa.table({
            "bucket": pa.array([], pa.uint32()),
            "term_id": pa.array([], pa.uint32()),
            "docs": pa.array([], pa.list_(pa.uint32())),
            "freqs": pa.array([], pa.list_(pa.uint32())),
        })
    term = batch.column("term_id").to_numpy(zero_copy_only=False)
    doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
    tf = batch.column("tf").to_numpy(zero_copy_only=False)
    bucket = doc // width
    rel = doc - bucket * width
    return _lists_by_key([bucket, term, doc], {"docs": rel, "freqs": tf},
                         {"bucket": bucket, "term_id": term})


def _segment_runs_block(batch: pa.Table, *, width: int) -> pa.Table:
    """One hash partition of per-block RUNS (term_id, docs, freqs) ->
    (bucket, term) segment rows with bucket-relative sorted docids.
    Same output as _segment_rows_block; the run-shaped input is the
    map-side-combined exchange (~one list row per (term, block) moves
    instead of one scalar row per posting)."""
    from dint_ray.postings import _lists_by_key

    if batch.num_rows == 0:
        return pa.table({
            "bucket": pa.array([], pa.uint32()),
            "term_id": pa.array([], pa.uint32()),
            "docs": pa.array([], pa.list_(pa.uint32())),
            "freqs": pa.array([], pa.list_(pa.uint32())),
        })
    term = batch.column("term_id").to_numpy(zero_copy_only=False)
    docs_col = batch.column("docs").combine_chunks()
    freqs_col = batch.column("freqs").combine_chunks()
    d_off = docs_col.offsets.to_numpy()
    lens = np.diff(d_off)
    if not len(term) or int(lens.sum()) == 0:
        return pa.table({
            "bucket": pa.array([], pa.uint32()),
            "term_id": pa.array([], pa.uint32()),
            "docs": pa.array([], pa.list_(pa.uint32())),
            "freqs": pa.array([], pa.list_(pa.uint32())),
        })
    term_flat = np.repeat(term, lens)
    doc = docs_col.values.to_numpy(zero_copy_only=False)[
        d_off[0]:d_off[-1]]
    f_off = freqs_col.offsets.to_numpy()
    tf = freqs_col.values.to_numpy(zero_copy_only=False)[
        f_off[0]:f_off[-1]]
    bucket = doc // width
    rel = doc - bucket * width
    return _lists_by_key([bucket, term_flat, doc], {"docs": rel, "freqs": tf},
                         {"bucket": bucket, "term_id": term_flat})


class _EncodeSegments:
    """Actor-pool encode of (bucket, term) segments: DINT payload over
    the RELATIVE docids + the segment-local max BM25 weight.  Norms are
    range-read per bucket from the sorted sizes.parquet
    (index/docstats.py) — the layout keys every batch by bucket, so the
    small LRU slice cache makes this one read per (actor, bucket);
    resident doc stats are O(slice), never O(num_docs)."""

    def __init__(self, sizes_path: str, dicts_ref, width: int,
                 num_docs: int, avg: float) -> None:
        import ray

        from dint_ray.index.docstats import DocStats
        from dint_ray.scoring import doc_term_weight

        d = ray.get(dicts_ref)
        self.docs_codec, self.freqs_codec = d.codecs()
        self.stats = DocStats(sizes_path, num_docs, avg, cache_slices=4)
        self._dtw = doc_term_weight
        self._width = int(width)
        self._num_docs = int(num_docs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from dint_ray.index.layout import write_posting_list
        from dint_ray.util import list_views

        buckets = batch.column("bucket").to_numpy()
        tids = batch.column("term_id").to_numpy()
        docs_views = list_views(batch.column("docs"))
        freqs_views = list_views(batch.column("freqs"))
        o_pl, o_df, o_mw = [], [], []
        for b, rel, freqs in zip(buckets, docs_views, freqs_views):
            rel = np.ascontiguousarray(rel, dtype=np.uint32)
            freqs = np.ascontiguousarray(freqs, dtype=np.uint32)
            o_pl.append(write_posting_list(rel, freqs, self.docs_codec,
                                           self.freqs_codec))
            o_df.append(len(rel))
            base = int(b) * self._width
            norms = self.stats.range_norms32(
                base, min(base + self._width, self._num_docs))
            w = self._dtw(freqs, norms[rel.astype(np.int64)])
            o_mw.append(float(w.max()))
        return pa.table({
            "bucket": pa.array(buckets.astype(np.int32), pa.int32()),
            "term_id": pa.array(tids.astype(np.uint32), pa.uint32()),
            "df_local": pa.array(np.asarray(o_df, np.uint32), pa.uint32()),
            "max_weight": pa.array(np.asarray(o_mw, np.float32), pa.float32()),
            "payload": pa.array(o_pl, pa.binary()),
        })


def build_serve_direct(pages_path: str, out_dir: str,
                       kind: str = "single_packed", num_buckets: int = 8,
                       cfg=None, bcfg=None, from_html: bool = False) -> str:
    """pages parquet -> routed serve layout, never materializing a
    whole posting list anywhere (SURVEY.md §7.4 risk 8 — the 100-TB
    build path; the classic build's per-term list rows bound one task's
    memory by the LONGEST list, this path by one doc bucket's segment).

    Stages (all checkpointed under ``out_dir``):
      tokenize -> rows; vocabulary; doc sizes        (shared with build)
      rows -> term ids -> ONE (bucket, term) hash exchange ->
        vectorized segment slice (bucket-relative docids)
      gap-pattern stats over SEGMENT gap streams -> dictionaries
        (patterns mined from exactly the streams that get encoded)
      segment encode (actor pool, dicts via ray.put) ->
        serve_{P}/bucket=b/ parquet + meta + manifest

    The output directory serves directly via run_queries_routed /
    partition_actors (build_serve_partitions sees the _SUCCESS marker
    and short-circuits).  Global BM25 stats (df, N, avg len) come from
    the vocabulary/sizes artifacts, so scores are rank-identical to the
    classic whole-list index — asserted by the
    ``bm25_wand_routed_direct`` oracle entry and tests.

    Reference behavior mirrored: the end state equals
    create_freq_index + queries' mmap image (queries.cpp:69-83)
    generalized to P owners; the build route is new (the reference
    builds whole lists because it is single-node)."""
    import dint_ray
    dint_ray.ensure_tuned()
    import ray
    import ray.data as rd

    from dint_ray.config import BuildConfig, DintConfig
    from dint_ray.index.shards import write_manifest
    from dint_ray.pipelines.build import (_done, _mark_done,
                                          dicts_from_stats_stage,
                                          mine_stats_ray)
    from dint_ray.postings import (AssignTermId, Vocabulary, _shuffle_width,
                                   build_vocabulary, doc_sizes,
                                   tokenize_rows)

    cfg = cfg or DintConfig()
    bcfg = bcfg or BuildConfig()
    os.makedirs(out_dir, exist_ok=True)
    serve_dir = serve_dir_for(out_dir, num_buckets)
    if os.path.exists(os.path.join(serve_dir, "_SUCCESS")):
        return out_dir

    from dint_ray.pipelines.build import _parquet_num_rows

    num_docs = _parquet_num_rows(pages_path)
    width = (num_docs + num_buckets - 1) // num_buckets
    pages = rd.read_parquet(
        pages_path, columns=["doc_id", "html" if from_html else "text"])

    import time as _time

    stage_secs: dict[str, float] = {}
    _t = _time.time()

    def _tick(name: str) -> None:
        nonlocal _t
        now = _time.time()
        stage_secs[name] = round(now - _t, 2)
        _t = now

    # rows: same checkpoint policy as the classic build (object store
    # below the auto threshold — the parquet roundtrip of the string
    # rows costs more than a re-tokenize at this scale)
    rows_dir = os.path.join(out_dir, "postings_rows")
    ckpt_rows = bcfg.checkpoint_rows
    if ckpt_rows is None:
        ckpt_rows = num_docs > 5_000_000
    if _done(rows_dir):
        rows_ds = rd.read_parquet(rows_dir)
    elif ckpt_rows:
        os.makedirs(rows_dir, exist_ok=True)
        tokenize_rows(pages, bcfg, from_html=from_html).write_parquet(rows_dir)
        _mark_done(rows_dir)
        rows_ds = rd.read_parquet(rows_dir)
    else:
        rows_ds = tokenize_rows(pages, bcfg,
                                from_html=from_html).materialize()
    _tick("tokenize")

    from dint_ray.index.docstats import streaming_len_stats, write_sizes_sorted
    from dint_ray.postings import fused_partials

    vocab_path = os.path.join(out_dir, "vocab.parquet")
    sizes_path = os.path.join(out_dir, "sizes.parquet")
    # one scan of the tokenized rows feeds both partial sets (same
    # fusion as the classic build)
    df_view = sz_view = None
    if not (os.path.exists(vocab_path) and os.path.exists(sizes_path)):
        df_view, sz_view = fused_partials(rows_ds)
    if os.path.exists(vocab_path):
        vocab = Vocabulary(terms=pq.read_table(vocab_path).to_pandas())
    else:
        vocab = build_vocabulary(rows_ds, df_view)
        tmp = vocab_path + ".tmp"
        pq.write_table(pa.Table.from_pandas(vocab.terms, preserve_index=False),
                       tmp)
        os.replace(tmp, vocab_path)
    _tick("vocabulary")

    if not os.path.exists(sizes_path):
        write_sizes_sorted(doc_sizes(rows_ds, partial=sz_view), sizes_path)
    total_len, _ = streaming_len_stats(sizes_path)
    avg = float(total_len) / num_docs
    _tick("doc_sizes")

    # ONE exchange: (bucket, term) co-location, vectorized segment slice
    segs_dir = os.path.join(out_dir, "segments")
    if not _done(segs_dir):
        os.makedirs(segs_dir, exist_ok=True)
        vocab_ref = ray.put(vocab)
        keyed = rows_ds.map_batches(
            AssignTermId,
            fn_constructor_kwargs={
                "vocab_ref": vocab_ref,
                "salt_df_threshold": bcfg.salt_df_threshold,
                "salt_bucket_docs": bcfg.salt_bucket_docs,
                "emit_bucket": False,
                "small_docids": num_docs < 2**32 - 1,
            },
            batch_format="pyarrow",
            concurrency=bcfg.pool_bounds(bcfg.tokenize_concurrency),
            num_cpus=1,
        )

        # key on term_id ALONE: bucket = doc_id // width is derivable,
        # so shipping a bucket column (4 B x every posting) or sorting
        # in the aggregators buys nothing — the segment kernel
        # recomputes the bucket and lexsorts (bucket, term, doc)
        # itself.  Measured: the (bucket, term_id) sorted exchange took
        # 45.8 s at 24 CPUs where the term_id exchange of the same
        # rows took ~19 s.  Rows are map-side combined into per-block
        # runs first (postings.build_posting_lists "single" strategy
        # rationale): ~one list row per (term, block) rides the
        # exchange instead of one scalar row per posting.
        from dint_ray.postings import _merge_rows_block

        runs = keyed.map_batches(_merge_rows_block, batch_format="pyarrow",
                                 batch_size=None)
        (runs.repartition(_shuffle_width(), keys=["term_id"], sort=False)
         .map_batches(_segment_runs_block, fn_kwargs={"width": width},
                      batch_format="pyarrow", batch_size=None)
         .write_parquet(segs_dir))
        _mark_done(segs_dir)
    segs_ds = rd.read_parquet(segs_dir)
    _tick("segments")

    # dictionaries mined from the SEGMENT gap streams (exactly what
    # gets encoded; bounded buffers — never a whole list)
    stats_docs, stats_freqs = mine_stats_ray(
        segs_ds, kind,
        os.path.join(out_dir, "stats_docs.parquet"),
        os.path.join(out_dir, "stats_freqs.parquet"), cfg)
    dicts = dicts_from_stats_stage(stats_docs, stats_freqs, kind,
                                   out_dir, cfg)
    _tick("stats_and_dicts")

    os.makedirs(serve_dir, exist_ok=True)
    dicts_ref = ray.put(dicts)
    (segs_ds.map_batches(
        _EncodeSegments, fn_constructor_kwargs={
            "sizes_path": sizes_path, "dicts_ref": dicts_ref,
            "width": width, "num_docs": num_docs, "avg": avg},
        batch_format="pyarrow",
        batch_size=bcfg.encode_batch_size,
        concurrency=bcfg.pool_bounds(bcfg.encode_concurrency),
        num_cpus=1)
     .write_parquet(serve_dir, partition_cols=["bucket"]))
    _tick("encode_segments")

    meta = {"num_buckets": num_buckets, "bucket_width": width,
            "num_docs": num_docs, "avg_doc_len": avg}
    with open(os.path.join(serve_dir, "meta.json.tmp"), "w") as f:
        json.dump(meta, f)
    os.replace(os.path.join(serve_dir, "meta.json.tmp"),
               os.path.join(serve_dir, "meta.json"))
    write_manifest(out_dir, num_docs=num_docs, num_terms=vocab.size,
                   avg_doc_len=avg, dict_kind=kind, shards=[],
                   extra={"pages_path": os.path.abspath(pages_path),
                          "build_mode": "serve_direct",
                          "num_buckets": num_buckets,
                          "stage_secs": stage_secs})
    with open(os.path.join(serve_dir, "_SUCCESS"), "w") as f:
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


class _QueryLocalIndex:
    """SharedScoredIndex-protocol view over ONLY one query's decoded
    lists — the transient-decode serving mode for compressed owners.

    WAND / MaxScore run in C straight over the raw DINT payloads, but
    the remaining query ops (ranked_and, ranked_or, block_max_wand,
    and/or counts) consume the decoded-array protocol.  Rather than
    hold the whole bucket decoded (what compressed storage exists to
    avoid), the owner decodes just the <=64 lists a query names, wraps
    them in this object, and reuses the SAME algorithm code — so
    results are bit-identical to decoded owners while resident decoded
    memory stays bounded by the decode cache, never the bucket."""

    # _slc is assigned by algorithms._scored_lists (its per-index
    # weight cache); it must be a declared slot or that write raises
    # _slc is assigned by algorithms._scored_lists (its per-index
    # weight cache); it must be a declared slot or that write raises.
    # It dies with this per-query object — the owner-level reuse lives
    # in the decode cache's per-term aux dict instead.
    __slots__ = ("num_docs", "df_global", "_lists", "_slc")

    def __init__(self, num_docs: int, df_global, lists: dict) -> None:
        self.num_docs = num_docs
        self.df_global = df_global
        # term -> (docs_global, freqs, w32, aux) where aux caches
        # per-term derived data (block bounds, float64 dtw) and is
        # evicted together with the arrays by the owner's decode cache
        self._lists = lists

    def __contains__(self, term_id: int) -> bool:
        return term_id in self._lists

    def cached_decode(self, term_id: int):
        e = self._lists[term_id]
        return e[0], e[1]

    decode = cached_decode

    def size(self, term_id: int) -> int:
        return len(self._lists[term_id][0])

    def doc_term_weights(self, term_id: int, norms, dtype):
        docs, freqs, w32, aux = self._lists[term_id]
        if dtype is np.float32:
            return w32
        w = aux.get("dtw64")
        if w is None:
            from dint_ray.scoring import doc_term_weight

            w = aux["dtw64"] = doc_term_weight(freqs, norms[docs], dtype)
        return w

    def enumerator(self, term_id: int):
        from dint_ray.pipelines.serve import _ArrayEnumerator

        docs, freqs = self.cached_decode(term_id)
        return _ArrayEnumerator(docs, freqs, self.num_docs)

    def block_bounds(self, term_id: int, norms, dtype):
        docs, _, _, aux = self._lists[term_id]
        key = ("bm", dtype is np.float32)
        r = aux.get(key)
        if r is None:
            from dint_ray.index.shards import _block_bounds_of

            r = aux[key] = _block_bounds_of(
                docs, self.doc_term_weights(term_id, norms, dtype))
        return r


class PartitionScorer:
    """Owns ONE doc bucket: decodes its segments once in __init__ into
    flat arrays + pre-scored float32 weights, then serves whole query
    batches.  Global collection stats (df per term, N, avg len) come
    from the build artifacts, so scores equal the single-image path.

    ``storage="compressed"`` keeps the bucket's DINT payloads as raw
    bytes instead and runs WAND directly over them with lazy per-block
    C decode (native.CompressedWand) — the reference's own query-time
    model (dict_posting_list.hpp:88-343 never holds decoded lists).
    Per-owner memory drops ~8x (compressed bytes vs 12 B/posting flat
    arrays) and per-query DRAM traffic shrinks to the compressed bytes
    of the blocks actually visited, which is what lets a fixed-memory
    node own a 100-TB-scale bucket.  Results are bit-identical to the
    decoded path (same float32 op order, -ffp-contract=off).  WAND and
    MaxScore run in C over the raw payloads; every other query op
    (ranked_and, ranked_or, block_max_wand, and/or counts) is served
    by transient decode of just the query's lists (_QueryLocalIndex,
    FIFO-bounded decode cache) — so a compressed owner covers the full
    algorithm surface the decoded owners do, like the reference serves
    every query op over every index type (src/queries.cpp:87-111)."""

    def __init__(self, index_dir: str, serve_dir: str, bucket: int,
                 storage: str = "decoded") -> None:
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

        # bucket-local doc stats via a RANGE read of the sorted
        # sizes.parquet (index/docstats.py) — an owner's resident
        # doc-stat arrays are O(bucket), never O(num_docs); the global
        # average comes from the manifest (same float64 value the
        # build computed).  Mirrors wand_data.hpp:17-63, which mmaps
        # one image instead of heap-copying it per thread.
        from dint_ray.index.docstats import DocStats

        avg64 = float(manifest["avg_doc_len"])
        self.avg = avg64
        stats = DocStats(os.path.join(index_dir, "sizes.parquet"),
                         self.num_docs, avg64, cache_slices=1)
        local_sizes = stats.range_lens(self.base, hi)
        avg32 = np.float32(avg64)
        n32 = (local_sizes.astype(np.float32) / avg32).astype(np.float32)
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
        from dint_ray.index.shards import load_merged_rows

        files = sorted(glob.glob(
            os.path.join(serve_dir, f"bucket={bucket}", "*.parquet")))
        self.storage = storage
        self._profile: dict[int, int] = {}
        self._busy = 0.0
        self.df_global = df_global

        # One dedup-merging load pass shared by both storage modes
        # (executor-split fragment rows merged, never overwritten —
        # shards.load_merged_rows; O(bucket) work, load-time only).
        rows = load_merged_rows(
            (pq.read_table(path, columns=["term_id", "max_weight",
                                          "payload"]) for path in files),
            docs_codec, freqs_codec)

        if storage == "compressed":
            if manifest["dict_kind"] not in ("single_packed", "single_rect",
                                             "multi_packed"):
                raise ValueError(
                    "compressed serving supports the DINT kinds "
                    "(single_packed / single_rect / multi_packed), got "
                    f"{manifest['dict_kind']!r}")
            from dint_ray import native as nat

            mw = np.zeros(nterms, dtype=np.float32)
            bufs: list[bytes] = []
            slot_of: dict[int, int] = {}
            lens = []
            for tid, (m, pl) in rows.items():
                slot_of[tid] = len(bufs)
                mw[tid] = m
                bufs.append(pl)
                lens.append(len(pl))
            # one contiguous buffer (+8B guard for the C bit reader's
            # whole-byte loads at a stream's very end)
            self._payload_buf = np.frombuffer(
                b"".join(bufs) + b"\x00" * 8, dtype=np.uint8)
            offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
            base_addr = self._payload_buf.ctypes.data
            ptr_by_slot = base_addr + offs[:-1]
            self._ptr_of = {t: int(ptr_by_slot[s])
                            for t, s in slot_of.items()}
            # byte spans for the transient-decode path (ranked_and /
            # ranked_or / block_max_wand / counts): offset+length into
            # _payload_buf per term, so any algo the decoded owners
            # serve can run here by decoding ONLY the query's lists
            self._span_of = {t: (int(offs[s]), int(offs[s + 1] - offs[s]))
                             for t, s in slot_of.items()}
            self._codecs = (docs_codec, freqs_codec)
            self._dec_cache: dict[int, tuple] = {}
            self._dec_cached_postings = 0
            self._local_mw = mw
            self._universe = hi - self.base
            self.wand = _LocalWand(_OffsetNorms(self.base, n32),
                                   _OffsetNorms(self.base, n64), mw)
            if manifest["dict_kind"] == "single_packed8":
                raise ValueError(
                    "compressed owners: single_packed8 payloads are b=8 "
                    "codeword streams, which the C kernel would read as "
                    "b=16 — serve this kind with decoded owners")
            bundle = load_codec_bundle(index_dir, manifest["dict_kind"])
            self._cw = nat.CompressedWand(bundle.docs_dict,
                                          bundle.freqs_dict, n32)
            self._qcache: dict[tuple, tuple] = {}
            self.n32 = n32
            self._n64 = n64
            return
        starts = np.full(nterms, -1, dtype=np.int64)
        ends = np.zeros(nterms, dtype=np.int64)
        mw = np.zeros(nterms, dtype=np.float32)
        d_parts, f_parts, w_parts = [], [], []
        off = 0
        for tid, (m, pl) in rows.items():
            v = PostingListView(pl, docs_codec, freqs_codec)
            rel, freqs = v.decode_all()
            docs = rel.astype(np.uint32) + np.uint32(self.base)
            w = doc_term_weight(freqs, n32[rel])
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

    def score_topk_arrays(self, qids, terms_list, algo: str, k: int):
        """(counts, docs, scores) flat numpy arrays — the serialization
        shape for the async scatter-gather path (tuple lists cost a
        pickle object per hit at 10^4 q/s)."""
        if self.storage == "compressed":
            return self._score_compressed_arrays(terms_list, algo, k)
        from dint_ray.queries import algorithms as qa

        fn = getattr(qa, algo)
        nq = len(qids)
        counts = np.empty(nq, dtype=np.int32)
        docs_out: list = []
        scores_out: list = []
        prof = self._profile
        for i, terms in enumerate(terms_list):
            res = fn(self.index, self.wand, list(terms), k)
            counts[i] = len(res)
            docs_out.extend(d for d, _ in res)
            scores_out.extend(s for _, s in res)
            for t in set(terms):
                if t in self.index:
                    prof[t] = prof.get(t, 0) + 1
        return (counts, np.asarray(docs_out, dtype=np.int64),
                np.asarray(scores_out, dtype=np.float32))

    def _score_compressed_arrays(self, terms_list, algo: str, k: int):
        """WAND / MaxScore over raw DINT payloads (no decoded arrays
        anywhere).  Identical results to the decoded path: same cursor
        semantics, same float32 weight op order in C, rel-docid
        tie-break equals global (uniform +base shift within the
        bucket)."""
        from dint_ray.queries.algorithms import query_freqs
        from dint_ray.scoring import query_term_weight

        if algo not in ("wand", "maxscore"):
            # every other query op the decoded owners serve runs here
            # via transient decode of just the query's lists
            return self._score_compressed_decoded(terms_list, algo, k)
        nq = len(terms_list)
        counts = np.empty(nq, dtype=np.int32)
        docs_out: list = []
        scores_out: list = []
        cache = self._qcache
        if len(cache) > 100_000:
            cache.clear()
        ptr_of = self._ptr_of
        prof = self._profile
        ptrs = np.empty(64, dtype=np.uint64)
        qws = np.empty(64, dtype=np.float32)
        mws = np.empty(64, dtype=np.float32)
        base = self.base
        for i, terms in enumerate(terms_list):
            nl = 0
            for term, qf in query_freqs(list(terms)):
                hit = cache.get((term, qf))
                if hit is None:
                    ptr = ptr_of.get(term)
                    if ptr is None:
                        hit = cache[(term, qf)] = False
                    else:
                        qw = query_term_weight(
                            qf, int(self.df_global[term]), self.num_docs,
                            np.float32)
                        hit = cache[(term, qf)] = (
                            ptr, qw, np.float32(qw * self._local_mw[term]))
                if hit is False or nl >= 64:
                    continue
                ptrs[nl], qws[nl], mws[nl] = hit
                nl += 1
                prof[term] = prof.get(term, 0) + 1
            if nl == 0:
                counts[i] = 0
                continue
            res = self._cw.query(ptrs[:nl], qws[:nl], mws[:nl],
                                 self._universe, k, algo=algo)
            counts[i] = len(res)
            docs_out.extend(base + d for d, _ in res)
            scores_out.extend(s for _, s in res)
        return (counts, np.asarray(docs_out, dtype=np.int64),
                np.asarray(scores_out, dtype=np.float32))

    # decoded-posting bytes kept resident by the transient-decode path
    # (~12 B/posting); evicted FIFO so a compressed owner's decoded
    # footprint stays bounded no matter the query stream
    DEC_CACHE_MAX_POSTINGS = 4_000_000

    def _decode_term(self, term: int):
        """(docs_global u32, freqs u32, w32, aux) for one term, decoded
        from the raw payload bytes exactly as the decoded-owner load
        does — cached FIFO-bounded; aux holds per-term derived data
        (block bounds, float64 dtw) evicted together with the arrays."""
        hit = self._dec_cache.get(term)
        if hit is not None:
            return hit
        span = self._span_of.get(term)
        if span is None:
            self._dec_cache[term] = False
            return False
        from dint_ray.index.layout import PostingListView
        from dint_ray.scoring import doc_term_weight

        off, ln = span
        pl = self._payload_buf[off:off + ln].tobytes()
        docs_codec, freqs_codec = self._codecs
        rel, freqs = PostingListView(pl, docs_codec, freqs_codec).decode_all()
        docs = rel.astype(np.uint32) + np.uint32(self.base)
        w = doc_term_weight(freqs, self.n32[rel])
        self._dec_cached_postings += len(docs)
        while (self._dec_cached_postings > self.DEC_CACHE_MAX_POSTINGS
               and self._dec_cache):
            old = self._dec_cache.pop(next(iter(self._dec_cache)))
            if old is not False:
                self._dec_cached_postings -= len(old[0])
        hit = self._dec_cache[term] = (docs, freqs, w, {})
        return hit

    def _query_local_index(self, terms) -> "_QueryLocalIndex":
        lists = {}
        for t in set(int(t) for t in terms):
            hit = self._decode_term(t)
            if hit is not False:
                lists[t] = hit
        return _QueryLocalIndex(self.num_docs, self.df_global, lists)

    def _score_compressed_decoded(self, terms_list, algo: str, k: int):
        """ranked_and / ranked_or / block_max_wand on a compressed
        owner: decode only the query's lists (bounded cache), then run
        the SAME algorithm code as decoded owners — bit-identical
        results, resident memory bounded by DEC_CACHE_MAX_POSTINGS."""
        from dint_ray.queries import algorithms as qa

        fn = getattr(qa, algo)
        nq = len(terms_list)
        counts = np.empty(nq, dtype=np.int32)
        docs_out: list = []
        scores_out: list = []
        prof = self._profile
        for i, terms in enumerate(terms_list):
            terms = list(terms)
            idx = self._query_local_index(terms)
            res = fn(idx, self.wand, terms, k)
            counts[i] = len(res)
            docs_out.extend(d for d, _ in res)
            scores_out.extend(s for _, s in res)
            for t in set(terms):
                if t in idx:
                    prof[t] = prof.get(t, 0) + 1
        return (counts, np.asarray(docs_out, dtype=np.int64),
                np.asarray(scores_out, dtype=np.float32))

    def score_block(self, batch: pa.Table, algo: str, k: int):
        """Arrow-block entry: the driver ships ONE ray.put block ref per
        batch to all B owners (plasma-shared on the node); term-list
        extraction happens here, in parallel, not on the driver."""
        t0 = time.perf_counter()
        qids = batch.column("query_id").to_numpy()
        terms_list = [list(v.as_py()) for v in batch.column("terms")]
        out = self.score_topk_arrays(qids, terms_list, algo, k)
        self._busy += time.perf_counter() - t0
        return out

    def busy_seconds(self) -> float:
        """Accumulated in-call scoring time (utilization diagnostics:
        busy / (owners x wall) tells owner- vs feed-bound)."""
        b, self._busy = self._busy, 0.0
        return b

    def score_quantized_block(self, batch: pa.Table, mode: str, k: int,
                              check_algo: str | None = None):
        qids = batch.column("query_id").to_numpy()
        terms_list = [list(v.as_py()) for v in batch.column("terms")]
        return self.score_quantized_arrays(qids, terms_list, mode, k,
                                           check_algo)

    def score_quantized_arrays(self, qids, terms_list, mode: str, k: int,
                               check_algo: str | None = None):
        """Array-shaped variant of score_quantized for the async path."""
        res = self.score_quantized(qids, terms_list, mode, k, check_algo)
        nq = len(qids)
        counts = np.empty(nq, dtype=np.int32)
        docs_out: list = []
        scores_out: list = []
        for i, (_, order) in enumerate(res):
            counts[i] = len(order)
            docs_out.extend(d for d, _ in order)
            scores_out.extend(s for _, s in order)
        return (counts, np.asarray(docs_out, dtype=np.int64),
                np.asarray(scores_out, dtype=np.int64))

    def score_counts(self, qids, terms_list):
        from dint_ray.queries import algorithms as qa

        if self.storage == "compressed":
            out = []
            for q, t in zip(qids, terms_list):
                idx = self._query_local_index(list(t))
                out.append((int(q), qa.and_count(idx, list(t)),
                            qa.or_count(idx, list(t))))
            return out
        return [(int(q), qa.and_count(self.index, list(t)),
                 qa.or_count(self.index, list(t)))
                for q, t in zip(qids, terms_list)]

    # ---- quantized conformance scoring (mirrors _ConformanceScorer) ----
    def score_quantized(self, qids, terms_list, mode: str, k: int,
                        check_algo: str | None = None):
        from dint_ray.queries.algorithms import query_freqs

        N = np.float64(self.num_docs)
        avg = np.float64(self.avg)
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

    def reset_profile(self):
        self._profile.clear()


# --------------------------------------------------------------------------
# routing
# --------------------------------------------------------------------------

_ACTOR_CACHE: dict[tuple, list] = {}


def partition_actors(index_dir: str, num_buckets: int,
                     num_cpus_each: float = 0.25, num_replicas: int = 1,
                     storage: str = "decoded"):
    """Create (or reuse) the P x R bucket-owner actors.

    Returns a list of R replica sets, each a list of P owners.  Bucket
    count is a MEMORY decision (a bucket must fit one worker's heap);
    replica count is a THROUGHPUT decision (owners are read-only, so a
    bigger cluster serves more queries by replicating buckets, not by
    splitting finer — finer splits inflate every query's fan-out).

    The owners are resident state, not schedulable work units: they
    reserve a fractional CPU so a cached actor set never starves later
    Ray Data jobs (hash-shuffle aggregator pools deadlock when
    fully-held CPUs make their minimum pool unschedulable); real CPU
    pressure during a query burst is bounded by the router pool's
    concurrency, which provides the backpressure."""
    import ray

    key = (os.path.abspath(index_dir), num_buckets, num_replicas, storage)
    replicas = _ACTOR_CACHE.get(key)
    if replicas is None:
        # evict other configurations (their actors hold CPU
        # reservations; two live sets can deadlock a small cluster)
        for old in [k for k in _ACTOR_CACHE if k != key]:
            for rs in _ACTOR_CACHE.pop(old):
                for a in rs:
                    ray.kill(a)
        serve_dir = build_serve_partitions(index_dir, num_buckets)
        cls = ray.remote(PartitionScorer).options(num_cpus=num_cpus_each)
        replicas = [[cls.remote(index_dir, serve_dir, b, storage)
                     for b in range(num_buckets)]
                    for _ in range(num_replicas)]
        _ACTOR_CACHE[key] = replicas
    return replicas


def drop_actors(index_dir: str, num_buckets: int,
                num_replicas: int = 1, storage: str = "decoded") -> None:
    import ray

    key = (os.path.abspath(index_dir), num_buckets, num_replicas, storage)
    for rs in _ACTOR_CACHE.pop(key, []):
        for a in rs:
            ray.kill(a)


def release_all_actors() -> None:
    """Kill every cached owner set — call when a serving burst is over
    and the cluster is needed for other pipelines."""
    import ray

    for key in list(_ACTOR_CACHE):
        for rs in _ACTOR_CACHE.pop(key):
            for a in rs:
                ray.kill(a)


def merge_topk(parts, k: int):
    """parts: per-bucket [(doc, score)] lists -> exact global top-k
    under (score desc, docid asc)."""
    allr = [p for part in parts for p in part]
    allr.sort(key=lambda ds: (-ds[1], ds[0]))
    return allr[:k]


def merge_owner_arrays(k: int, quantized: bool, qbatch,
                       *parts) -> pa.Table:
    """Vectorized exact merge of per-owner (counts, docs, scores)
    arrays: one lexsort over (query, -score, doc) + a per-group rank
    cutoff — the cross-bucket equivalent of topk_queue.finalize."""
    qids = (qbatch.column("query_id").to_numpy().astype(np.int64)
            if isinstance(qbatch, pa.Table) else np.asarray(qbatch))
    nq = len(qids)
    qidx_parts, doc_parts, score_parts = [], [], []
    for counts, docs, scores in parts:
        qidx_parts.append(np.repeat(np.arange(nq), counts))
        doc_parts.append(docs)
        score_parts.append(scores)
    qidx = np.concatenate(qidx_parts)
    docs = np.concatenate(doc_parts)
    scores = np.concatenate(score_parts)
    order = np.lexsort((docs, -scores.astype(np.float64), qidx))
    qidx, docs, scores = qidx[order], docs[order], scores[order]
    starts = np.concatenate(([0], np.flatnonzero(np.diff(qidx)) + 1))
    group_start = np.repeat(
        starts, np.diff(np.concatenate((starts, [len(qidx)]))))
    rank = np.arange(len(qidx)) - group_start
    keep = rank < k
    qout = np.asarray(qids, dtype=np.int64)[qidx[keep]]
    if quantized:
        return pa.table({
            "query_id": pa.array(qout, pa.int64()),
            "rank": pa.array(rank[keep] + 1, pa.int64()),
            "doc_id": pa.array(docs[keep], pa.int64()),
            "score_u": pa.array(scores[keep].astype(np.int64), pa.int64()),
        })
    return pa.table({
        "query_id": pa.array(qout.astype(np.uint64), pa.uint64()),
        "rank": pa.array(rank[keep].astype(np.uint32), pa.uint32()),
        "doc_id": pa.array(docs[keep].astype(np.uint64), pa.uint64()),
        "score": pa.array(scores[keep].astype(np.float32), pa.float32()),
    })


_MERGE_REMOTE = None


def _merge_remote():
    global _MERGE_REMOTE
    if _MERGE_REMOTE is None:
        import ray

        _MERGE_REMOTE = ray.remote(num_cpus=0.25)(merge_owner_arrays)
    return _MERGE_REMOTE


def run_queries_routed(queries_ds, index_dir: str, algo: str = "wand",
                       k: int = 10, num_buckets: int = 8,
                       router_concurrency: int = 4, batch_size: int = 64,
                       quantized: bool = False, mode: str | None = None,
                       num_replicas: int = 1, storage: str = "decoded"):
    """queries Dataset -> (query_id, rank, doc_id, score[(_u)]) Dataset
    via the routed doc-partitioned path.

    Async scatter-gather: the driver streams query batches (queries are
    the tiny side — ids + term lists), fans each batch to one replica
    of every bucket owner WITHOUT blocking (a synchronous router stage
    waits a full owner round-trip per batch, which capped throughput at
    ~half the owner ceiling), and chains a remote merge task per batch;
    a bounded in-flight window provides backpressure.  The result is a
    Dataset over the merge outputs — only refs ever live on the
    driver."""
    import dint_ray
    dint_ray.ensure_tuned()
    import ray
    import ray.data as rd

    replicas = partition_actors(index_dir, num_buckets,
                                num_replicas=num_replicas, storage=storage)
    merge = _merge_remote()
    chk = algo if algo in ("wand", "maxscore", "block_max_wand") else None
    window = max(16, router_concurrency * 8)
    out_refs: list = []
    inflight: list = []
    rr = 0
    for batch in queries_ds.iter_batches(batch_size=batch_size,
                                         batch_format="pyarrow"):
        if batch.num_rows == 0:
            continue
        # one plasma copy per batch, shared by all B owners + the merge
        bref = ray.put(batch)
        actors = replicas[rr]
        rr = (rr + 1) % len(replicas)
        if quantized:
            refs = [a.score_quantized_block.remote(bref, mode or algo, k,
                                                   chk) for a in actors]
        else:
            refs = [a.score_block.remote(bref, algo, k) for a in actors]
        r = merge.remote(k, quantized, bref, *refs)
        out_refs.append(r)
        inflight.append(r)
        if len(inflight) >= window:
            done, inflight = ray.wait(
                inflight, num_returns=len(inflight) - window + 1)
    return rd.from_arrow_refs(out_refs)


def reset_block_profile(index_dir: str, num_buckets: int,
                        num_replicas: int = 1,
                        storage: str = "decoded") -> None:
    import ray

    key = (os.path.abspath(index_dir), num_buckets, num_replicas, storage)
    actors = [a for rs in _ACTOR_CACHE.get(key, []) for a in rs]
    ray.get([a.reset_profile.remote() for a in actors])


def collect_block_profile(index_dir: str, num_buckets: int,
                          num_replicas: int = 1,
                          storage: str = "decoded") -> dict[int, int]:
    """Merged per-term access counters from all bucket owners."""
    import ray

    key = (os.path.abspath(index_dir), num_buckets, num_replicas, storage)
    actors = [a for rs in _ACTOR_CACHE.get(key, []) for a in rs]
    merged: dict[int, int] = {}
    for prof in ray.get([a.block_profile.remote() for a in actors]):
        for t, c in prof.items():
            merged[t] = merged.get(t, 0) + c
    return merged
