"""Posting-list construction: the dominant wide step.

The reference assumes this was done upstream by ds2i preprocessing
(/root/reference/README.md:39-55); here it is a first-class Ray Data
pipeline (SURVEY.md §7.3):

    pages -> map_batches(Tokenizer actor pool)       (doc_id, term, tf)
          -> per-batch partial df counts -> groupby(term) -> vocabulary
          -> broadcast vocab (ray.put), assign term_id [+ salt bucket]
          -> single path: groupby(term_id) -> lexsort-slice -> lists
          -> salted path: groupby(term_id, bucket) -> sorted runs
                          -> groupby(term_id) -> merge -> lists

Skew handling (north_rule "explicit skew-aware salting of head
terms"): a term's row count is bounded by df <= num_docs, so the
default ships every posting through ONE exchange and lexsorts each
hash partition whole.  When a head list outgrows one task
(df > chunk_df_threshold), the salted path splits terms with
df > salt_df_threshold into doc_id-range buckets of salt_bucket_docs
docs, so no single groupby task sorts an entire head-term list;
buckets are disjoint ordered doc ranges merged in a second exchange.

Vocabulary key (deterministic, SURVEY.md §7.3): term_id = rank by
(df desc, term asc).  This fixes docID/termID equality between the
distributed pipeline and the single-process oracle.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from dint_ray.config import BuildConfig
from dint_ray.tokenize import Tokenizer, tokens


@dataclass
class Vocabulary:
    terms: pd.DataFrame  # columns: term, df, term_id (sorted by term_id)

    @property
    def size(self) -> int:
        return len(self.terms)

    def to_id_map(self) -> dict[str, int]:
        return dict(zip(self.terms["term"], self.terms["term_id"]))

    def df_array(self) -> np.ndarray:
        return self.terms["df"].to_numpy()


def make_vocabulary(term_df: pd.DataFrame) -> Vocabulary:
    """term_df: columns (term, df) -> add dense term_id by (df desc, term asc)."""
    t = term_df.sort_values(["df", "term"], ascending=[False, True], kind="mergesort")
    t = t.reset_index(drop=True)
    t["term_id"] = np.arange(len(t), dtype=np.uint32)
    return Vocabulary(terms=t)


# --------------------------------------------------------------------------
# Ray pipeline
# --------------------------------------------------------------------------

def _shuffle_width() -> int:
    """Reduce-side width for wide ops: ~one block per core.

    Small inputs produce many tiny blocks whose per-block scheduling
    dominates sort-based shuffles; coalescing to core count first cuts
    that fixed cost.  At scale the streaming executor splits oversized
    blocks again, so this is a floor, not a cap."""
    import ray

    try:
        return max(8, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 8


def _coalesce(ds, width: int | None = None):
    return ds.repartition(width or _shuffle_width(), shuffle=False)


def _exchange_splits() -> int:
    """Output sub-blocks per direct-exchange merge task.

    A direct task exchange at width == CPU count hands the downstream
    actor-pool stages exactly one block per core, so `map_batches`
    schedules one ~N-second task per block and the stage wall is
    quantized at whole-task granularity (measured: 24 encode tasks of
    2.2-3.1 s on a 21-actor pool run in two lopsided waves — 65 s of
    work takes 11.5 s).  Raising the exchange WIDTH instead is a
    measured net loss (posting stage 8.3 -> 15-19.5 s at width 4x24:
    every merge task scans every block), so each merge task keeps its
    full partition but returns `splits` row-interleaved sub-blocks via
    num_returns — downstream pools get ~splits tasks per core to
    load-balance, the exchange itself is unchanged, and the
    interleaving spreads the Zipf head lists across sub-blocks.
    DINT_EXCHANGE_SPLITS overrides for A/B runs ("1" = whole blocks)."""
    env = os.environ.get("DINT_EXCHANGE_SPLITS")
    return max(1, int(env)) if env else 4


def tokenize_rows(pages_ds, cfg: BuildConfig = BuildConfig(), from_html: bool = False):
    """pages Dataset -> (doc_id, term, tf) rows Dataset (actor pool).

    FIXED-size pool: an autoscaling (1, N) pool ramps from one actor
    and upscales only when the queue builds, so short stages finish on
    1-3 actors and the stage wall never drops with more CPUs (measured:
    identical 6 s at 6 and 24 CPUs on 200k docs).  A fixed pool starts
    every actor in parallel — wall cost of ONE startup."""
    import dint_ray

    dint_ray.ensure_tuned()
    return pages_ds.map_batches(
        Tokenizer,
        fn_constructor_kwargs={"from_html": from_html},
        batch_format="pyarrow",
        batch_size=cfg.tokenize_batch_size,
        concurrency=cfg.pool_bounds(cfg.tokenize_concurrency),
        num_cpus=1,
    )


def _partial_df(batch: pa.Table) -> pa.Table:
    """Map-side combine for the df count (one row per term per batch)."""
    g = batch.group_by("term").aggregate([("doc_id", "count")])
    return g.rename_columns(["term", "df_part"])


def _sum_by_key(ds, key: str, val: str, out: str, key_type: pa.DataType,
                driver_limit: int = 20_000_000) -> pa.Table | object:
    """Exact `sum(val) group by key` over a map-side-combined Dataset.

    Never uses ray.data's groupby().aggregate reducer (a per-group
    Python loop — 215 s for an 11 M-row int aggregate, see SURVEY §6):
    small inputs finish with ONE C++ group_by on the driver (returns a
    pa.Table); large inputs hash-repartition by key and run one
    vectorized pyarrow group_by per partition (returns a Dataset whose
    rows are already unique per key)."""
    import ray
    import ray.data as rd

    if ds.count() <= driver_limit:
        tabs = [t for t in ray.get(ds.to_arrow_refs())
                if t is not None and t.num_rows]
        pt = pa.concat_tables(tabs, promote_options="default")
        return (pt.group_by(key).aggregate([(val, "sum")])
                .rename_columns([key, out]))

    # Distributed branch.  A keyed repartition co-locates each key in
    # one hash partition, but the streaming executor may SPLIT an
    # oversized partition into several blocks — a per-block group_by
    # would then emit two rows for one key with partial sums (and the
    # downstream dense rank would mint two term_ids for one term).
    # Splits never MIX partitions, so correctness is restored with our
    # own deterministic bucket column: tag every row with
    # __b = hash(key) % W BEFORE the exchange, shuffle on __b, combine
    # per block (keeping __b), then group the materialized block refs
    # by the __b values they contain and run ONE vectorized reduce
    # task per bucket — every row of a key reaches exactly one task.
    width = _shuffle_width()

    def _tag_bucket(b: pa.Table) -> pa.Table:
        import polars as pl

        if b.num_rows == 0 or key not in b.column_names:
            return pa.table({key: pa.array([], key_type),
                             val: pa.array([], pa.int64()),
                             "__b": pa.array([], pa.uint32())})
        h = (pl.from_arrow(b.select([key]))
             .select((pl.col(key).hash(seed=0) % width).alias("__b"))
             ["__b"].to_numpy())
        return b.append_column("__b", pa.array(h.astype(np.uint32),
                                               pa.uint32()))

    def _block_sum(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({key: pa.array([], key_type),
                             "__b": pa.array([], pa.uint32()),
                             out: pa.array([], pa.int64())})
        return (b.group_by([key, "__b"]).aggregate([(val, "sum")])
                .rename_columns([key, "__b", out]))

    combined = (ds.map_batches(_tag_bucket, batch_format="pyarrow",
                               batch_size=None, num_cpus=1)
                .repartition(width, keys=["__b"], sort=False)
                .map_batches(_block_sum, batch_format="pyarrow",
                             batch_size=None, num_cpus=1)
                .materialize())
    refs = combined.to_arrow_refs()

    def _distinct_b(t: pa.Table) -> list[int]:
        import pyarrow.compute as pc

        # empty shuffle partitions surface as zero-column blocks
        if t.num_rows == 0 or "__b" not in t.column_names:
            return []
        return pc.unique(t.column("__b")).to_pylist()

    def _reduce_bucket(b: int, *tabs: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        parts = [t.filter(pc.equal(t.column("__b"), b)) for t in tabs]
        cat = pa.concat_tables([p for p in parts if p.num_rows],
                               promote_options="default")
        return (cat.group_by(key).aggregate([(out, "sum")])
                .rename_columns([key, out]))

    inspect = ray.remote(num_cpus=0)(_distinct_b)
    by_bucket: dict[int, list] = {}
    for r, bs in zip(refs, ray.get([inspect.remote(r) for r in refs])):
        for b in bs:
            by_bucket.setdefault(int(b), []).append(r)
    if not by_bucket:
        return pa.table({key: pa.array([], key_type),
                         out: pa.array([], pa.int64())})
    reduce_t = ray.remote(num_cpus=1)(_reduce_bucket)
    outs = [reduce_t.remote(b, *rs) for b, rs in sorted(by_bucket.items())]
    return rd.from_arrow_refs(outs)


def df_partials(rows_ds):
    """Map-side-combined per-block df counts (<= one row per (term,
    block)); shared by the driver and Dataset vocabulary builders."""
    return rows_ds.map_batches(_partial_df, batch_format="pyarrow",
                               batch_size=None).materialize()


def build_vocabulary(rows_ds, partial=None) -> Vocabulary:
    """groupby(term) shuffle over per-batch partials -> driver vocabulary.

    Scale note: the shuffle input is <= one row per (term, batch) — the
    partial-aggregation pattern from SURVEY.md §2.7 A1.  The final
    vocabulary (term, df, term_id) is small enough to broadcast below
    cfg.vocab_dataset_threshold; above it, build_vocabulary_ds keeps
    the vocabulary a Dataset end to end.
    """
    if partial is None:
        partial = df_partials(rows_ds)
    res = _sum_by_key(partial, "term", "df_part", "df", pa.string())
    pdf = res.to_pandas()
    pdf["df"] = pdf["df"].astype(np.int64)
    return make_vocabulary(pdf[["term", "df"]])


def build_vocabulary_ds(rows_ds, partial=None):
    """Distributed vocabulary: (term, df, term_id) Dataset — the driver
    never materializes the term table (VERDICT r2 item 2; the web-scale
    term universe does not fit one heap).

    term_id = dense rank by (df desc, term asc), IDENTICAL to
    make_vocabulary's ordering: a distributed sort range-partitions the
    unique (term, df) rows into ordered blocks; each block's rank
    offset is the cumulative row count of its predecessors, so ids are
    assigned per block with no driver pass (driver holds refs + one
    int per block)."""
    import ray
    import ray.data as rd

    if partial is None:
        partial = df_partials(rows_ds)
    agg = _sum_by_key(partial, "term", "df_part", "df", pa.string(),
                      driver_limit=0)  # force the distributed branch
    vds = agg.sort(["df", "term"], descending=[True, False]).materialize()
    refs = vds.to_arrow_refs()

    nrows = ray.remote(num_cpus=0)(lambda t: t.num_rows)
    counts = ray.get([nrows.remote(r) for r in refs])
    offs = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)

    def _with_ids(t: pa.Table, off: int) -> pa.Table:
        tid = np.arange(off, off + t.num_rows, dtype=np.uint32)
        return t.select(["term", "df"]).append_column(
            "term_id", pa.array(tid, pa.uint32()))

    with_ids = ray.remote(num_cpus=0.25)(_with_ids)
    out = [with_ids.remote(r, int(o)) for r, o in zip(refs, offs[:-1])]
    return rd.from_arrow_refs(out)


def write_vocab_parquet(vds, path: str, row_group_size: int = 1 << 20) -> None:
    """Stream a vocabulary Dataset into the vocab.parquet artifact —
    driver memory O(row_group).  (At a true 10^9+-term scale this
    artifact becomes a sharded directory; every in-repo reader already
    goes through pyarrow, which reads both shapes.)"""
    import os

    tmp = path + ".tmp"
    writer = None
    for b in vds.iter_batches(batch_size=row_group_size,
                              batch_format="pyarrow"):
        if writer is None:
            writer = pq.ParquetWriter(tmp, b.schema)
        writer.write_table(b, row_group_size=row_group_size)
    if writer is None:
        pq.write_table(pa.table({"term": pa.array([], pa.string()),
                                 "df": pa.array([], pa.int64()),
                                 "term_id": pa.array([], pa.uint32())}), tmp)
    else:
        writer.close()
    os.replace(tmp, path)


def max_df_of_vocab(path: str) -> int:
    """Head df from the vocab artifact without reading it whole: rows
    are sorted by (df desc, term asc), so it's the first row of the
    first row group."""
    pf = pq.ParquetFile(path)
    if pf.metadata.num_rows == 0:
        return 0
    col = pf.read_row_group(0, columns=["df"]).column("df")
    return int(col[0].as_py())


class AssignTermId:
    """Broadcast-lookup stage: term string -> (term_id[, salt bucket]).

    The vocabulary is shipped once per actor via a ray.put object ref
    (broadcast join on the small side, no shuffle — SURVEY.md §2.6 J3).

    Exchange hygiene: this stage's output is exactly what the wide
    exchange ships, so every column is as narrow as correctness allows
    — term_id u32, tf u32 (tf <= doc length), doc_id u32 when
    num_docs fits (u64 only beyond 2^32 docs), and the salt bucket
    column only exists on the salted path.
    """

    def __init__(self, vocab_ref, salt_df_threshold: int,
                 salt_bucket_docs: int, emit_bucket: bool = True,
                 small_docids: bool = False) -> None:
        import ray

        vocab: Vocabulary = ray.get(vocab_ref)
        # term -> id lookup as an Arrow value_set: batches resolve
        # their (dictionary-encoded) unique terms with ONE pc.index_in
        # C++ hash probe instead of a Python dict loop per unique
        self.terms_arr = pa.array(vocab.terms["term"], pa.string())
        self.ids_arr = vocab.terms["term_id"].to_numpy().astype(np.uint32)
        dfs = vocab.df_array()
        self.salted_arr = np.asarray(
            [tid for tid, df in zip(vocab.terms["term_id"], dfs)
             if df > salt_df_threshold], dtype=np.uint32)
        self.bucket_docs = salt_bucket_docs
        self.emit_bucket = emit_bucket
        self.doc_dtype = np.uint32 if small_docids else np.uint64
        self.doc_pa = pa.uint32() if small_docids else pa.uint64()

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Zipf head: a batch has far fewer unique terms than rows, so
        # dictionary-encode once and look up only the uniques in Python.
        enc = batch.column("term").combine_chunks().dictionary_encode()
        import pyarrow.compute as pc

        pos = pc.index_in(enc.dictionary, value_set=self.terms_arr)
        if pos.null_count:
            missing = enc.dictionary.filter(pc.is_null(pos))[:5].to_pylist()
            raise KeyError(f"terms not in vocabulary: {missing!r}")
        uniq_ids = self.ids_arr[pos.to_numpy(zero_copy_only=False)]
        tids = uniq_ids[enc.indices.to_numpy(zero_copy_only=False)]
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        cols = {"term_id": pa.array(tids, pa.uint32())}
        if self.emit_bucket:
            if len(self.salted_arr):
                salt_mask = np.isin(tids, self.salted_arr)
                buckets = np.where(salt_mask, doc_ids // self.bucket_docs,
                                   0).astype(np.uint32)
            else:
                buckets = np.zeros(len(tids), dtype=np.uint32)
            cols["bucket"] = pa.array(buckets, pa.uint32())
        cols["doc_id"] = pa.array(doc_ids.astype(self.doc_dtype), self.doc_pa)
        cols["tf"] = pa.array(
            batch.column("tf").to_numpy(zero_copy_only=False).astype(np.uint32),
            pa.uint32())
        return pa.table(cols)


def _lists_by_key(sort_keys: list[np.ndarray], payload: dict[str, np.ndarray],
                  key_cols: dict[str, np.ndarray]) -> pa.Table:
    """Vectorized rows -> list-rows: sort, find key-change boundaries,
    build ListArrays straight from offsets.  No per-group Python.

    Sort strategy: when the keys' value ranges fit 64 bits combined
    (term_id and doc_id are u32, buckets/relative ids far narrower, so
    this holds everywhere short of 2^32 docs), all keys are bit-packed
    into ONE uint64 and ordered with a single stable (radix) argsort —
    measured 3.1x faster than the k-key int64 lexsort on the 500k-doc
    scaling corpus (per-partition merge 6.5 -> 2.1 s at 24 CPUs,
    digest-identical).  Wider keys fall back to the lexsort."""
    n = len(sort_keys[0])
    if n == 0:
        cols = {name: pa.array([], pa.uint32()) for name in key_cols}
        cols.update({name: pa.array([], pa.list_(pa.uint32())) for name in payload})
        return pa.table(cols)
    bits = [max(1, int(k.max()).bit_length()) for k in sort_keys]
    change = np.empty(n, dtype=bool)
    change[0] = True
    if sum(bits) <= 64:
        packed = np.zeros(n, dtype=np.uint64)
        shift = 0
        for k, b in zip(reversed(sort_keys), reversed(bits)):
            packed |= k.astype(np.uint64, copy=False) << np.uint64(shift)
            shift += b
        order = np.argsort(packed, kind="stable")
        # group boundary = any non-final key changed = high bits changed
        grp = packed[order] >> np.uint64(bits[-1])
        np.not_equal(grp[1:], grp[:-1], out=change[1:])
    else:
        order = np.lexsort(sort_keys[::-1])  # first key = primary
        change[1:] = False
        for k in sort_keys[:-1]:  # all but doc sort key
            ks = k[order]
            change[1:] |= ks[1:] != ks[:-1]
    starts = np.flatnonzero(change)
    offsets = np.append(starts, n).astype(np.int32)
    sel = order[starts]  # gather group heads only, not full sorted copies
    cols: dict[str, pa.Array] = {}
    for name, arr in key_cols.items():
        cols[name] = pa.array(arr[sel].astype(np.uint32, copy=False),
                              pa.uint32())
    for name, arr in payload.items():
        values = pa.array(arr[order].astype(np.uint32, copy=False),
                          pa.uint32())
        cols[name] = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), values)
    return pa.table(cols)


def _runs_from_block(batch: pa.Table) -> pa.Table:
    """One hash partition of keyed rows -> per-(term_id, bucket) sorted
    run rows.  A group split across blocks just yields extra runs — the
    merge phase re-establishes global docID order per term."""
    term = batch.column("term_id").to_numpy(zero_copy_only=False)
    bucket = batch.column("bucket").to_numpy(zero_copy_only=False)
    doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
    tf = batch.column("tf").to_numpy(zero_copy_only=False)
    return _lists_by_key([term, bucket, doc], {"docs": doc, "freqs": tf},
                         {"term_id": term, "bucket": bucket})


def _runs_from_runs_block(batch: pa.Table) -> pa.Table:
    """(term_id, bucket, docs, freqs) runs — possibly several per
    (term, bucket) group after the keyed exchange — -> ONE sorted run
    per group.  The sort happens HERE, where a group is bounded by
    salt_bucket_docs postings, never over a whole head list."""
    if batch.num_rows == 0:
        return batch
    term = batch.column("term_id").to_numpy(zero_copy_only=False)
    bucket = batch.column("bucket").to_numpy(zero_copy_only=False)
    docs_col = batch.column("docs").combine_chunks()
    freqs_col = batch.column("freqs").combine_chunks()
    d_off = docs_col.offsets.to_numpy()
    lens = np.diff(d_off)
    if int(lens.sum()) == 0:
        return batch.slice(0, 0)
    term_f = np.repeat(term, lens)
    bucket_f = np.repeat(bucket, lens)
    doc = docs_col.values.to_numpy(zero_copy_only=False)[
        d_off[0]:d_off[-1]]
    f_off = freqs_col.offsets.to_numpy()
    tf = freqs_col.values.to_numpy(zero_copy_only=False)[
        f_off[0]:f_off[-1]]
    return _lists_by_key([term_f, bucket_f, doc], {"docs": doc, "freqs": tf},
                         {"term_id": term_f, "bucket": bucket_f})


def _concat_sorted_runs_block(batch: pa.Table) -> pa.Table:
    """One sorted run per (term_id, bucket) -> final posting-list rows
    by ordered CONCAT in (term, first_doc) order — buckets are
    doc-range-disjoint, so no posting is re-sorted.  Any term whose
    concatenated docs are not strictly increasing (duplicate groups
    from an executor-split partition) is rebuilt with the full lexsort
    merge — correctness never rests on the one-run-per-group
    assumption."""
    empty = pa.table({
        "term_id": pa.array([], pa.uint32()),
        "docs": pa.array([], pa.list_(pa.uint32())),
        "freqs": pa.array([], pa.list_(pa.uint32())),
    })
    if batch.num_rows == 0:
        return empty
    term = batch.column("term_id").to_numpy(zero_copy_only=False).astype(np.int64)
    docs_col0 = batch.column("docs").combine_chunks()
    d_off0 = docs_col0.offsets.to_numpy().astype(np.int64)
    if int(d_off0[-1] - d_off0[0]) == 0:
        return empty
    vals0 = docs_col0.values.to_numpy(zero_copy_only=False)
    first = vals0[d_off0[:-1]].astype(np.int64)
    order = np.lexsort((first, term))
    t = batch.take(pa.array(order))
    docs_col = t.column("docs").combine_chunks()
    freqs_col = t.column("freqs").combine_chunks()
    d_off = docs_col.offsets.to_numpy().astype(np.int64)
    f_off = freqs_col.offsets.to_numpy().astype(np.int64)
    dvals = docs_col.values.to_numpy(zero_copy_only=False)[d_off[0]:d_off[-1]]
    fvals = freqs_col.values.to_numpy(zero_copy_only=False)[f_off[0]:f_off[-1]]
    term_s = term[order]
    starts = np.concatenate(([0], np.flatnonzero(np.diff(term_s)) + 1))
    out_terms = term_s[starts]
    g_off = np.concatenate((d_off[starts], [d_off[-1]])) - d_off[0]
    g_off_f = np.concatenate((f_off[starts], [f_off[-1]])) - f_off[0]
    docs_list = pa.ListArray.from_arrays(
        pa.array(g_off, pa.int32()),
        pa.array(dvals.astype(np.uint32), pa.uint32()))
    freqs_list = pa.ListArray.from_arrays(
        pa.array(g_off_f, pa.int32()),
        pa.array(fvals.astype(np.uint32), pa.uint32()))
    out = pa.table({
        "term_id": pa.array(out_terms.astype(np.uint32), pa.uint32()),
        "docs": docs_list,
        "freqs": freqs_list,
    })
    # monotonicity audit: a violation inside a list marks its term
    nd = np.diff(dvals.astype(np.int64))
    viol = np.flatnonzero(nd <= 0)
    if len(viol):
        rows = np.searchsorted(g_off, viol, side="right") - 1
        within = (viol + 1) < g_off[rows + 1]
        bad_rows = np.unique(rows[within])
        if len(bad_rows):
            bad_terms = out_terms[bad_rows]
            good_mask = np.ones(out.num_rows, dtype=bool)
            good_mask[bad_rows] = False
            fixed = _merge_runs_block(
                batch.filter(pa.array(np.isin(term, bad_terms))))
            out = pa.concat_tables(
                [out.filter(pa.array(good_mask)), fixed],
                promote_options="default")
    return out


def _merge_rows_block(batch: pa.Table) -> pa.Table:
    """One hash partition of keyed rows -> final posting-list rows in
    ONE kernel: lexsort (term, doc), slice terms via offsets.  The
    single-exchange merge path (§2.8 O4): the hash shuffle on term_id
    already co-locates every row of a term, so runs+re-merge (a second
    full exchange of the same values) is pure overhead unless a single
    list is too large for one task — see build_posting_lists."""
    if batch.num_rows == 0:
        return pa.table({
            "term_id": pa.array([], pa.uint32()),
            "docs": pa.array([], pa.list_(pa.uint32())),
            "freqs": pa.array([], pa.list_(pa.uint32())),
        })
    term = batch.column("term_id").to_numpy(zero_copy_only=False)
    doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
    tf = batch.column("tf").to_numpy(zero_copy_only=False)
    return _lists_by_key([term, doc], {"docs": doc, "freqs": tf},
                         {"term_id": term})


def _merge_runs_block(batch: pa.Table) -> pa.Table:
    """One hash partition of run rows -> final posting-list rows: flatten
    all runs, lexsort (term, doc), slice terms via offsets (§2.8 O4)."""
    term = batch.column("term_id").to_numpy(zero_copy_only=False)
    docs_col = batch.column("docs").combine_chunks()
    freqs_col = batch.column("freqs").combine_chunks()
    doc_offsets = docs_col.offsets.to_numpy()
    lens = np.diff(doc_offsets)
    if not len(term) or int(lens.sum()) == 0:
        return pa.table({
            "term_id": pa.array([], pa.uint32()),
            "docs": pa.array([], pa.list_(pa.uint32())),
            "freqs": pa.array([], pa.list_(pa.uint32())),
        })
    term_flat = np.repeat(term, lens)
    docs_flat = docs_col.values.to_numpy(zero_copy_only=False)[
        doc_offsets[0]:doc_offsets[-1]]
    f_off = freqs_col.offsets.to_numpy()
    freqs_flat = freqs_col.values.to_numpy(zero_copy_only=False)[
        f_off[0]:f_off[-1]]
    return _lists_by_key([term_flat, docs_flat],
                         {"docs": docs_flat, "freqs": freqs_flat},
                         {"term_id": term_flat})


# --------------------------------------------------------------------------
# vocabulary-as-Dataset term-id assignment (distributed hash join)
# --------------------------------------------------------------------------
#
# Above cfg.vocab_dataset_threshold terms, the broadcast id map
# (AssignTermId) would be the build's memory ceiling.  This path keeps
# the vocabulary a Dataset and assigns ids with ONE keyed exchange,
# fused with the posting-list merge:
#
#   rows -> per-block fragment rows (term, docs, freqs)   [no exchange]
#        ∪  vocabulary rows (term, term_id)
#        -> repartition(keys=[term])  -> per-block kernel:
#             merge fragments per term, attach term_id    [hits]
#             fragments whose vocab row landed in a DIFFERENT block of
#             the same partition (executor block split)   [misses]
#   misses loop back (they are list rows, so each round shrinks a
#   term's row count to its previous block count — convergence in <= 2
#   extra rounds in practice); residual same-term duplicates across
#   blocks are merged by the loaders (index/shards.py
#   merge_fragment_payloads).

_FRAG_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("docs", pa.list_(pa.uint32())),
    ("freqs", pa.list_(pa.uint32())),
])

_JOIN_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("term_id", pa.uint32()),
    ("docs", pa.list_(pa.uint32())),
    ("freqs", pa.list_(pa.uint32())),
    ("kind", pa.int8()),
])


def _empty_lists(n: int) -> pa.ListArray:
    return pa.ListArray.from_arrays(
        pa.array(np.zeros(n + 1, np.int32), pa.int32()),
        pa.array([], pa.uint32()))


def _lists_by_code(codes: np.ndarray, doc: np.ndarray, tf: np.ndarray,
                   dictionary: pa.Array):
    """(term string, docs, freqs) list rows grouped by dictionary code,
    docs sorted within each term — one lexsort, no per-group Python."""
    order = np.lexsort((doc, codes))
    codes_s, doc_s, tf_s = codes[order], doc[order], tf[order]
    change = np.zeros(len(codes_s), dtype=bool)
    change[0] = True
    change[1:] = codes_s[1:] != codes_s[:-1]
    starts = np.flatnonzero(change)
    offsets = np.append(starts, len(codes_s)).astype(np.int32)
    terms = dictionary.take(pa.array(codes_s[starts].astype(np.int32)))
    off_arr = pa.array(offsets, pa.int32())
    docs_col = pa.ListArray.from_arrays(
        off_arr, pa.array(doc_s.astype(np.uint32), pa.uint32()))
    freqs_col = pa.ListArray.from_arrays(
        off_arr, pa.array(tf_s.astype(np.uint32), pa.uint32()))
    return terms, docs_col, freqs_col


def _frag_rows_block(batch: pa.Table) -> pa.Table:
    """Map-side combine: one block of (doc_id, term, tf) rows ->
    per-term FRAGMENT list rows (term, docs, freqs)."""
    if batch.num_rows == 0:
        return _FRAG_SCHEMA.empty_table()
    enc = batch.column("term").combine_chunks().dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    doc = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    tf = batch.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
    terms, docs_col, freqs_col = _lists_by_code(codes, doc, tf,
                                                enc.dictionary)
    return pa.table({"term": terms, "docs": docs_col, "freqs": freqs_col})


def _tag_frags(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    return pa.table({
        "term": batch.column("term").cast(pa.string()),
        "term_id": pa.array(np.zeros(n, np.uint32), pa.uint32()),
        "docs": batch.column("docs"),
        "freqs": batch.column("freqs"),
        "kind": pa.array(np.zeros(n, np.int8), pa.int8()),
    }).cast(_JOIN_SCHEMA)


def _tag_vocab(batch: pa.Table) -> pa.Table:
    n = batch.num_rows
    return pa.table({
        "term": batch.column("term").cast(pa.string()),
        "term_id": batch.column("term_id").cast(pa.uint32()),
        "docs": _empty_lists(n),
        "freqs": _empty_lists(n),
        "kind": pa.array(np.ones(n, np.int8), pa.int8()),
    }).cast(_JOIN_SCHEMA)


def _flatten_lists(batch: pa.Table, sel: np.ndarray):
    """Selected fragment rows -> flat (row_idx, doc, tf) arrays."""
    docs_col = batch.column("docs").combine_chunks()
    freqs_col = batch.column("freqs").combine_chunks()
    d_off = docs_col.offsets.to_numpy()
    f_off = freqs_col.offsets.to_numpy()
    d_vals = docs_col.values.to_numpy(zero_copy_only=False)
    f_vals = freqs_col.values.to_numpy(zero_copy_only=False)
    row_parts, doc_parts, tf_parts = [], [], []
    for i in sel:
        lo, hi = int(d_off[i]), int(d_off[i + 1])
        row_parts.append(np.full(hi - lo, i, np.int64))
        doc_parts.append(d_vals[lo:hi].astype(np.int64))
        flo = int(f_off[i])
        tf_parts.append(f_vals[flo:flo + (hi - lo)].astype(np.int64))
    if not row_parts:
        e = np.empty(0, np.int64)
        return e, e, e
    return (np.concatenate(row_parts), np.concatenate(doc_parts),
            np.concatenate(tf_parts))


def _join_frags_block(batch: pa.Table) -> pa.Table:
    """One hash partition block of (fragments ∪ vocabulary): merge
    fragments per term; terms whose vocab row is present get their
    term_id (hits, miss=false); the rest re-emit as fragments
    (miss=true) for the next round."""
    out_schema = pa.schema([
        ("term_id", pa.uint32()),
        ("docs", pa.list_(pa.uint32())),
        ("freqs", pa.list_(pa.uint32())),
        ("miss_term", pa.string()),
    ])
    if batch.num_rows == 0 or "kind" not in batch.column_names:
        return out_schema.empty_table()
    kind = batch.column("kind").to_numpy()
    terms_all = batch.column("term")
    enc = terms_all.combine_chunks().dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    tid_col = batch.column("term_id").to_numpy(zero_copy_only=False)
    # code -> term_id for vocab rows present in THIS block
    ncodes = len(enc.dictionary)
    code_tid = np.full(ncodes, -1, dtype=np.int64)
    vsel = np.flatnonzero(kind == 1)
    code_tid[codes[vsel]] = tid_col[vsel].astype(np.int64)

    fsel = np.flatnonzero(kind == 0)
    if not len(fsel):
        return out_schema.empty_table()
    row_idx, doc, tf = _flatten_lists(batch, fsel)
    fcodes = codes[row_idx]
    _, docs_col, freqs_col = _lists_by_code(fcodes, doc, tf,
                                            enc.dictionary)
    # group order out of _lists_by_code is ascending code; recover the
    # per-group codes the same way to map each output row to its vocab
    # hit (or miss)
    order = np.argsort(fcodes, kind="stable")
    fc_sorted = fcodes[order]
    change = np.zeros(len(fc_sorted), dtype=bool)
    if len(fc_sorted):
        change[0] = True
        change[1:] = fc_sorted[1:] != fc_sorted[:-1]
    group_codes = fc_sorted[np.flatnonzero(change)]
    tids = code_tid[group_codes]
    hit = tids >= 0
    miss_terms = pa.array(
        [enc.dictionary[int(c)].as_py() if not h else None
         for c, h in zip(group_codes, hit)], pa.string())
    return pa.table({
        "term_id": pa.array(np.where(hit, tids, 0).astype(np.uint32),
                            pa.uint32()),
        "docs": docs_col,
        "freqs": freqs_col,
        "miss_term": miss_terms,
    })


def _take_hits(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    keep = np.flatnonzero(~pc.is_valid(batch.column("miss_term"))
                          .to_numpy(zero_copy_only=False))
    t = batch.take(keep) if len(keep) < batch.num_rows else batch
    return t.select(["term_id", "docs", "freqs"])


def _take_misses(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    valid = pc.is_valid(batch.column("miss_term")) \
        .to_numpy(zero_copy_only=False)
    t = batch.take(np.flatnonzero(valid))
    return pa.table({
        "term": t.column("miss_term").cast(pa.string()),
        "docs": t.column("docs"),
        "freqs": t.column("freqs"),
    })


def build_posting_lists_joined(rows_ds, vocab_ds,
                               cfg: BuildConfig = BuildConfig(),
                               max_rounds: int = 4):
    """(doc_id, term, tf) rows + vocabulary Dataset -> (term_id, docs,
    freqs) Dataset via a distributed hash join on `term` — no driver id
    map, no broadcast (the >threshold path named in build_vocabulary).

    Same exchange count as the `single` strategy: the join key (term)
    co-locates exactly what the merge needs, so id assignment and list
    merge happen in one kernel.  Executor block splits surface as miss
    rows, resolved by <= max_rounds shrinking re-join rounds; residual
    same-term fragment rows (a term whose merged row itself spans
    blocks) are merged by the index loaders."""
    _use_hash_shuffle()
    width = _shuffle_width()
    vocab_tagged = vocab_ds.map_batches(_tag_vocab, batch_format="pyarrow")
    frags = rows_ds.map_batches(_frag_rows_block, batch_format="pyarrow",
                                batch_size=None)
    hit_parts = []
    for _ in range(max_rounds):
        u = (frags.map_batches(_tag_frags, batch_format="pyarrow")
             .union(vocab_tagged)
             .repartition(width, keys=["term"], sort=True))
        joined = u.map_batches(_join_frags_block, batch_format="pyarrow",
                               batch_size=None).materialize()
        hit_parts.append(joined.map_batches(_take_hits,
                                            batch_format="pyarrow"))
        misses = joined.map_batches(_take_misses, batch_format="pyarrow")
        if misses.count() == 0:
            break
        frags = misses
    else:
        raise RuntimeError(
            "term-id join did not converge within "
            f"{max_rounds} rounds — raise max_rounds or inspect skew")
    out = hit_parts[0]
    for p in hit_parts[1:]:
        out = out.union(p)
    return out


# beyond this many (combine block x partition) task-argument refs the
# direct exchange's O(blocks*width) driver-side ref fan-out costs more
# than Ray's hash-shuffle machinery, which is built for that scale
_DIRECT_EXCHANGE_MAX_REFS = 4_000_000


def _multi_node() -> bool:
    try:
        import ray

        return len([n for n in ray.nodes() if n.get("Alive")]) > 1
    except Exception:
        return False


def _exchange_map_split() -> bool:
    """Whether the direct exchange pre-splits each map block into
    per-partition sub-blocks (one ``num_returns=width`` task per block)
    so a merge task fetches ONLY its own partition's bytes.

    On one node the filter-all design is measured faster (the map-side
    compaction pass exceeds the foreign-row scans it saves —
    scripts/profile_postings.py A/B, BASELINE.md run 19), and plasma
    reads are zero-copy, so locality doesn't matter.  On a multi-node
    cluster filter-all ships every block to every merge task's node —
    network bytes ~ width x data — while the pre-split keeps the
    exchange at 1x, which dominates any CPU delta.  Auto-gated on
    cluster size; DINT_EXCHANGE_MAP_SPLIT=0/1 overrides for A/B."""
    env = os.environ.get("DINT_EXCHANGE_MAP_SPLIT")
    if env is not None and env != "auto":
        return env not in ("0", "")
    return _multi_node()


def _exchange_trace(kind: str, nbytes: int) -> None:
    """Best-effort exchange-byte accounting for
    scripts/multinode_demo.py: when DINT_EXCHANGE_TRACE=1 each exchange
    task reports (kind, node_id, bytes-in) to the named
    "dint_exchange_trace" actor (namespace "dint_trace").  Off by
    default, adds one fire-and-forget actor call per exchange task when
    on, and never raises — measurement must not break a build."""
    try:
        import ray

        actor = ray.get_actor("dint_exchange_trace",
                              namespace="dint_trace")
        actor.add.remote(kind,
                         ray.get_runtime_context().get_node_id(),
                         int(nbytes))
    except Exception:
        pass


def _split_block_by_part(tab: pa.Table, width: int):
    """One exchange map block -> ``width`` compacted per-partition
    sub-tables (the ``part`` column is consumed).  take() compacts each
    slice — a pickled zero-copy slice would drag the parent buffers
    into the object store with it."""
    if os.environ.get("DINT_EXCHANGE_TRACE") == "1":
        _exchange_trace("split_in", tab.nbytes)
    if "part" not in tab.column_names:
        # materialize() can surface zero-row blocks with an empty
        # schema; pass them through for the merge side's num_columns
        # filter
        return tuple(tab for _ in range(width))
    part = tab.column("part").to_numpy(zero_copy_only=False)
    order = np.argsort(part, kind="stable")
    bounds = np.searchsorted(part[order], np.arange(width + 1))
    return tuple(
        tab.take(order[bounds[i]:bounds[i + 1]]).drop_columns(["part"])
        for i in range(width))


def _grouped_part_fallback(merge_fn, part_of):
    """Split-safe `fallback` for ``_direct_merge_exchange``: re-tag each
    row with its partition id and hand ``merge_fn`` COMPLETE partitions
    via ``groupby().map_groups`` — Ray's group contract assembles whole
    groups however the exchange chunks its output blocks.  Needed for
    merge kernels that build a lookup from co-partitioned rows (the
    dedup attach joins, the kNN rank finalizer): the hash-shuffle
    aggregator today emits ONE block per partition (its source carries
    a "break down blocks to target size" TODO), so a bare keyed
    repartition + per-batch kernel works — until that TODO lands, at
    which point split partitions silently drop join rows / duplicate
    ranks.  Costs the hash-aggregate machinery the direct exchange
    avoids; acceptable on the >_DIRECT_EXCHANGE_MAX_REFS escape path."""

    def run(ds):
        def _tag(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return b.append_column("__part", pa.array([], pa.uint32()))
            return b.append_column("__part",
                                   pa.array(part_of(b), pa.uint32()))

        def _merge(t: pa.Table) -> pa.Table:
            return merge_fn(t.drop_columns(["__part"]))

        return (ds.map_batches(_tag, batch_format="pyarrow",
                               batch_size=None, num_cpus=1)
                .groupby("__part")
                .map_groups(_merge, batch_format="pyarrow", num_cpus=1))

    return run


def _direct_merge_exchange(runs_ds, width: int, merge_fn, part_of,
                           fallback_keys=("term_id",), fallback=None):
    """Keyed exchange as DIRECT ray tasks instead of a hash
    repartition: the map side tags every run row with its partition
    (part_of: batch -> uint32 array), materializes, and one merge task
    per partition filters its rows from ALL block refs (plasma,
    zero-copy reads — only the selected rows are copied).  Groups are
    complete per task because part is a pure function of the group
    key.  Why: the hash-shuffle operator costs aggregator-actor
    machinery and an extra payload copy-through; measured on the
    500k-doc corpus this halves the posting merge (13.7 -> 8.3 s at 24
    CPUs, 57.9 -> 17.4 s median at 6, digest-identical) and removes
    the narrow-leg's shuffle self-contention variance.  Falls back to
    the keyed repartition above _DIRECT_EXCHANGE_MAX_REFS total task
    refs (ref fan-out is O(blocks x width) on the driver, the regime
    hash shuffle is designed for)."""
    import ray
    import ray.data as rd

    def _add_part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("part", pa.array([], pa.uint32()))
        return b.append_column("part", pa.array(part_of(b), pa.uint32()))

    mat = runs_ds.map_batches(_add_part, batch_format="pyarrow",
                              batch_size=None, num_cpus=1).materialize()
    refs = mat.to_arrow_refs()
    if len(refs) * width > _DIRECT_EXCHANGE_MAX_REFS:
        # `fallback` (if given) must be safe when the executor splits a
        # keyed partition into several blocks — the generic
        # repartition+merge_fn path assumes merge_fn tolerates a group
        # arriving in more than one batch (true for the posting merges,
        # whose duplicate fragments are re-merged at owner load; NOT
        # true for single-row-per-group reductions like dedup's min)
        if fallback is not None:
            return fallback(mat.drop_columns(["part"]))
        return (mat.drop_columns(["part"])
                .repartition(width, keys=list(fallback_keys), sort=False)
                .map_batches(merge_fn, batch_format="pyarrow",
                             batch_size=None))

    # multi-node: pre-split each block so merge task p fetches only its
    # own partition's bytes (1x network instead of width x); single
    # node keeps the measured-faster filter-all design (zero-copy
    # plasma reads, no compaction pass)
    # width 1 has nothing to localize (and Ray would not unpack a
    # num_returns=1 tuple); the filter path is exact there
    map_split = _exchange_map_split() and width > 1
    trace = os.environ.get("DINT_EXCHANGE_TRACE") == "1"
    if map_split:
        splitter = ray.remote(num_cpus=1)(_split_block_by_part)
        per_block = [splitter.options(num_returns=width).remote(r, width)
                     for r in refs]
        part_inputs = [[pb[p] for pb in per_block] for p in range(width)]

    def _merge_part(p: int, *tabs) -> pa.Table:
        import pyarrow.compute as pc

        if trace:
            _exchange_trace("merge_in",
                            sum(t.nbytes for t in tabs
                                if t is not None and t.num_columns))
        avail = [t for t in tabs if t is not None and t.num_columns]
        if not avail:
            # every map block arrived as an empty-schema pass-through
            # (fully-empty input): nothing to merge, nothing to name
            return pa.table({})
        if map_split:
            sel = [t for t in avail if t.num_rows]
            if not sel:
                return merge_fn(avail[0].slice(0, 0))
        else:
            sel = [t.filter(pc.equal(t.column("part"), p))
                   .drop_columns(["part"]) for t in avail if t.num_rows]
            sel = [s for s in sel if s.num_rows]
            if not sel:
                return merge_fn(avail[0].drop_columns(["part"]).slice(0, 0))
        return merge_fn(pa.concat_tables(sel, promote_options="default"))

    def _args_for(p: int):
        return part_inputs[p] if map_split else refs

    splits = _exchange_splits()
    if splits <= 1:
        mt = ray.remote(num_cpus=1)(_merge_part)
        return rd.from_arrow_refs([mt.remote(p, *_args_for(p))
                                   for p in range(width)])

    def _merge_part_split(p: int, *tabs):
        out = _merge_part(p, *tabs)
        n = out.num_rows
        if n == 0:
            return tuple(out for _ in range(splits))
        # row-interleaved sub-blocks: take() compacts each slice (a
        # pickled zero-copy slice can drag the parent buffers into the
        # object store) and the stride spreads the heaviest lists —
        # which sort first within a partition — across sub-blocks
        return tuple(out.take(np.arange(i, n, splits, dtype=np.int64))
                     for i in range(splits))

    mts = ray.remote(num_cpus=1, num_returns=splits)(_merge_part_split)
    return rd.from_arrow_refs([r for p in range(width)
                               for r in mts.remote(p, *_args_for(p))])


def _use_hash_shuffle() -> None:
    """Key-based repartition needs the hash-shuffle strategy; it is also
    the right engine for all of this pipeline's aggregations."""
    import ray.data as rd
    from ray.data.context import ShuffleStrategy

    import dint_ray

    rd.DataContext.get_current().shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    dint_ray.ensure_tuned()


def build_posting_lists(rows_ds, vocab: Vocabulary,
                        cfg: BuildConfig = BuildConfig(),
                        num_docs: int | None = None):
    """(doc_id, term, tf) rows -> (term_id, docs, freqs) Dataset.

    Merge strategy (cfg.merge_strategy):

    - ``single`` — ONE hash exchange on term_id + a vectorized
      lexsort-slice kernel per partition.  The exchange already
      co-locates every row of a term, and a term's row count is
      bounded by its df <= num_docs, so one task handles it.  Default
      whenever the head term fits one task: it ships every posting
      once instead of twice (measured 1.85x faster end-to-end at 24
      CPUs on the 200k-doc fixture, same result hash).
    - ``salted`` — two exchanges: (term_id, bucket) -> sorted runs
      (explicit skew-aware salting: a term with df >
      salt_df_threshold is split into doc_id-range buckets so no
      single task sorts an entire head-term list), then term_id ->
      ordered merge of runs.  This is the scale path for corpora
      whose head lists are too large to lexsort in one task, and the
      building block for chunked block-run encode at 10^12 docs.
    - ``auto`` — ``salted`` iff max df > cfg.chunk_df_threshold.
    """
    import ray

    _use_hash_shuffle()
    strategy = cfg.merge_strategy
    if strategy == "auto":
        max_df = int(vocab.df_array().max()) if vocab.size else 0
        strategy = "salted" if max_df > cfg.chunk_df_threshold else "single"
    small_docids = bool(num_docs and num_docs < 2**32 - 1)
    vocab_ref = ray.put(vocab)
    keyed = rows_ds.map_batches(
        AssignTermId,
        fn_constructor_kwargs={
            "vocab_ref": vocab_ref,
            "salt_df_threshold": cfg.salt_df_threshold,
            "salt_bucket_docs": cfg.salt_bucket_docs,
            "emit_bucket": strategy == "salted",
            "small_docids": small_docids,
        },
        batch_format="pyarrow",
        concurrency=cfg.pool_bounds(cfg.tokenize_concurrency),
        num_cpus=1,
    )
    width = _shuffle_width()
    # map-side combine bundling (see BuildConfig.combine_batch_rows);
    # DINT_COMBINE_BATCH overrides for interleaved A/B measurement
    # ("0"/"none" = per-block, an integer = rows per combine call)
    combine_bs = cfg.combine_batch_rows
    _env = os.environ.get("DINT_COMBINE_BATCH")
    if _env is not None:
        combine_bs = None if _env.lower() in ("0", "none", "") else int(_env)
    if strategy == "single":
        # map-side combine BEFORE the exchange: each input block is
        # collapsed to per-term runs (list rows) by the same
        # lexsort-slice kernel the reduce side uses, so the exchange
        # ships ~one list row per (term, block) instead of one scalar
        # row per posting — same value bytes, ~100x fewer rows through
        # the hash partitioner/aggregators.  Measured on the 500k-doc
        # scaling corpus: 56.6 -> 33.0 s at 6 CPUs, 23.9 -> 19.4 s at
        # 24 (stage wall incl. write), identical output (digest +
        # oracle entries).
        runs = keyed.map_batches(_merge_rows_block, batch_format="pyarrow",
                                 batch_size=combine_bs)

        def _part_of(b: pa.Table) -> np.ndarray:
            tid = b.column("term_id").to_numpy()
            return (tid.astype(np.uint64) % np.uint64(width)).astype(
                np.uint32)

        return _direct_merge_exchange(runs, width, _merge_runs_block,
                                      _part_of)
    # salted, three vectorized hops with NO whole-list sort anywhere:
    #   A. per-block map-side combine into (term, bucket) runs — no
    #      exchange, ~one list row per (term, bucket, block) onward;
    #   B. keyed exchange on (term_id, bucket) + per-group merge — the
    #      only sort, bounded by salt_bucket_docs postings per group;
    #   C. keyed exchange on term_id + ordered CONCAT of the
    #      doc-range-disjoint bucket runs (monotonicity-audited, with
    #      a lexsort repair for executor-split partitions).
    runs0 = keyed.map_batches(_runs_from_block, batch_format="pyarrow",
                              batch_size=combine_bs)
    # Both salted exchanges are direct task exchanges too (same
    # rationale and measurement as the single path above).  The old
    # staging materialize between exchanges B and C is subsumed: each
    # direct exchange materializes its input internally and schedules
    # no shuffle aggregators, so there is nothing left to
    # self-backpressure.

    def _part_bucket(b: pa.Table) -> np.ndarray:
        tid = b.column("term_id").to_numpy().astype(np.uint64)
        bkt = b.column("bucket").to_numpy().astype(np.uint64)
        # mix both keys so one head term's buckets spread over tasks
        return ((tid * np.uint64(0x9E3779B1) + bkt)
                % np.uint64(width)).astype(np.uint32)

    runs = _direct_merge_exchange(runs0, width, _runs_from_runs_block,
                                  _part_bucket,
                                  fallback_keys=("term_id", "bucket"))

    def _part_term(b: pa.Table) -> np.ndarray:
        tid = b.column("term_id").to_numpy()
        return (tid.astype(np.uint64) % np.uint64(width)).astype(np.uint32)

    return _direct_merge_exchange(runs, width, _concat_sorted_runs_block,
                                  _part_term)


def _partial_sizes(batch: pa.Table) -> pa.Table:
    """Map-side combine: per-batch tf sum per doc (a doc usually lands
    in one batch, so the shuffle input shrinks to ~one row per doc)."""
    g = batch.group_by("doc_id").aggregate([("tf", "sum")])
    return g.rename_columns(["doc_id", "len_part"])


def doc_sizes(rows_ds, partial=None):
    """(doc_id, len) Dataset; len = sum of tfs = token count.
    ``partial``: pre-computed (doc_id, len_part) rows (e.g. from
    ``fused_partials``) so the corpus-scale rows aren't re-scanned."""
    import ray.data as rd

    if partial is None:
        partial = rows_ds.map_batches(_partial_sizes,
                                      batch_format="pyarrow",
                                      batch_size=None).materialize()
    res = _sum_by_key(partial, "doc_id", "len_part", "len", pa.int64())
    return rd.from_arrow(res) if isinstance(res, pa.Table) else res


def _fused_partial_block(batch: pa.Table) -> pa.Table:
    """Map-side combine emitting BOTH per-block partials in one pass:
    df rows (kind 0: term, df_part) and doc-length rows (kind 1:
    doc_id, len_part) as a tagged union table — the separate
    df_partials and _partial_sizes passes each re-scanned every
    tokenized row from plasma."""
    df = _partial_df(batch)
    sz = _partial_sizes(batch)
    n_df, n_sz = df.num_rows, sz.num_rows
    return pa.table({
        "kind": pa.array(
            np.concatenate([np.zeros(n_df, np.uint8),
                            np.ones(n_sz, np.uint8)]), pa.uint8()),
        "term": pa.concat_arrays([
            df.column("term").combine_chunks().cast(pa.string()),
            pa.nulls(n_sz, pa.string())]),
        "df_part": pa.concat_arrays([
            df.column("df_part").combine_chunks().cast(pa.int64()),
            pa.nulls(n_sz, pa.int64())]),
        "doc_id": pa.concat_arrays([
            pa.nulls(n_df, pa.int64()),
            sz.column("doc_id").combine_chunks().cast(pa.int64())]),
        "len_part": pa.concat_arrays([
            pa.nulls(n_df, pa.int64()),
            sz.column("len_part").combine_chunks().cast(pa.int64())]),
    })


def fused_partials(rows_ds):
    """ONE scan of the tokenized rows -> (df_partial_view,
    sizes_partial_view): two lazy Datasets over a single materialized
    tagged partial set.  The views re-read only partial-sized blocks
    (<= one df row per (term, block) + ~one length row per doc), not
    the corpus-scale rows."""

    def _take_df(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b.column("kind"), 0))
        return pa.table({"term": f.column("term").cast(pa.string()),
                         "df_part": f.column("df_part")})

    def _take_sizes(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b.column("kind"), 1))
        # dtype parity with the non-fused _partial_sizes path (uint64
        # doc_id from the tokenizer, uint64 sum) so checkpoint schema
        # is not path-dependent
        return pa.table({"doc_id": f.column("doc_id").cast(pa.uint64()),
                         "len_part": f.column("len_part").cast(pa.uint64())})

    fused = rows_ds.map_batches(_fused_partial_block,
                                batch_format="pyarrow",
                                batch_size=None).materialize()
    df_view = fused.map_batches(_take_df, batch_format="pyarrow",
                                batch_size=None)
    sz_view = fused.map_batches(_take_sizes, batch_format="pyarrow",
                                batch_size=None)
    return df_view, sz_view


# --------------------------------------------------------------------------
# single-process oracle (trivially correct; used by tests & conformance)
# --------------------------------------------------------------------------

def oracle_postings(pages: pa.Table, text_col: str = "text",
                    id_col: str = "doc_id"):
    """Returns (postings dict term_id -> (docs, freqs), Vocabulary,
    sizes ndarray, num_docs) computed in one process."""
    from collections import Counter

    texts = pages.column(text_col).to_pylist()
    ids = pages.column(id_col).to_numpy(zero_copy_only=False)
    num_docs = len(texts)
    df_counter: Counter = Counter()
    per_doc: list[Counter] = []
    sizes = np.zeros(int(ids.max()) + 1 if num_docs else 0, dtype=np.uint32)
    for doc_id, text in zip(ids, texts):
        c = Counter(tokens(text))
        per_doc.append(c)
        sizes[doc_id] = sum(c.values())
        df_counter.update(c.keys())
    vocab = make_vocabulary(pd.DataFrame(
        {"term": list(df_counter.keys()), "df": list(df_counter.values())}
    ))
    id_map = vocab.to_id_map()
    lists: dict[int, tuple[list, list]] = {}
    for doc_id, c in zip(ids, per_doc):
        for term, tf in c.items():
            lists.setdefault(id_map[term], ([], []))
            lists[id_map[term]][0].append(int(doc_id))
            lists[id_map[term]][1].append(int(tf))
    out = {}
    for tid, (ds, fs) in lists.items():
        order = np.argsort(ds, kind="stable")
        out[tid] = (np.asarray(ds, dtype=np.uint32)[order],
                    np.asarray(fs, dtype=np.uint32)[order])
    return out, vocab, sizes, num_docs
