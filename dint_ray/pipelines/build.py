"""Distributed index build (create_freq_index lifecycle, SURVEY.md §3.1).

    pages.parquet
      -> tokenize (actor pool)          [checkpoint: postings_rows/]
      -> vocabulary (groupby(term))     [checkpoint: vocab.parquet]
      -> posting lists (salted groupby) [checkpoint: postings/]
      -> doc sizes (groupby(doc_id))    [checkpoint: sizes.parquet]
      -> gap-pattern stats (flat-map + combine + groupby)
                                        [checkpoint: stats_{docs,freqs}.parquet]
      -> DSF dictionaries (driver)      [checkpoint: dict_{docs,freqs}.npz]
      -> DINT encode (actor pool, dictionary broadcast via ray.put)
      -> hash-partitioned shards + manifest with per-partition lineage
                                        [checkpoint: shard-*.parquet, manifest.json]

Resume = every stage checks its checkpoint first (the reference's
file-existence caching, block_statistics.hpp:26-43 /
dict_freq_index.hpp:139-161, generalized to all stages).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from dint_ray.config import BuildConfig, DintConfig
from dint_ray.dint import stats as st
from dint_ray.dint.codec import MultiDintCodec, SingleDintCodec
from dint_ray.dint.dictionary import (
    build_packed_multi,
    build_packed_single,
    load as load_dict,
    save_multi,
    save_single,
)
from dint_ray.index.build import BuiltDicts
from dint_ray.index.layout import write_posting_list
from dint_ray.index.shards import write_manifest, write_shard
from dint_ray.postings import (
    Vocabulary,
    _shuffle_width,
    build_posting_lists,
    build_vocabulary,
    doc_sizes,
    make_vocabulary,
    tokenize_rows,
)
from dint_ray.scoring import max_weight_of_list


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS")) if not path.endswith((".parquet", ".npz", ".json")) else os.path.exists(path)


def _mark_done(path: str) -> None:
    with open(os.path.join(path, "_SUCCESS"), "w") as f:
        f.write("ok")


def _parquet_num_rows(path: str) -> int:
    """Row count from parquet footers only — a file or a directory of
    shard files; never a Ray pass over the data."""
    import glob as _g

    if os.path.isfile(path):
        return pq.read_metadata(path).num_rows
    files = sorted(_g.glob(os.path.join(path, "**", "*.parquet"),
                           recursive=True))
    if files:
        return sum(pq.read_metadata(f).num_rows for f in files)
    import ray.data as rd

    return rd.read_parquet(path).count()


def _read_blocks_floor(path: str) -> int | None:
    """Read-task floor for the pages read: a few blocks per core.

    One parquet file is one read task by default, and the tokenize
    actor pool schedules one task per input BLOCK regardless of
    batch_size — a single-file corpus serializes the stage entirely
    (measured: tokenize wall flat at 6 vs 24 CPUs on one file, see
    bench._scaling_fixture).  Ask for ~splits x CPUs blocks so few-file
    inputs still load-balance; when the input already has more files
    than that (any real crawl — and already at 32 files x 24 CPUs,
    where an interleaved A/B measured this floor neutral), return None
    and keep Ray's file-granular default — coalescing many files into
    few read tasks is the failure mode this floor must never cause."""
    import glob as _g

    from dint_ray.postings import _exchange_splits, _shuffle_width

    if os.environ.get("DINT_READ_FLOOR_OFF"):  # A/B escape hatch
        return None
    target = _shuffle_width() * _exchange_splits()
    if os.path.isfile(path):
        return target
    nfiles = len(_g.glob(os.path.join(path, "**", "*.parquet"),
                         recursive=True))
    return target if nfiles < target else None


def _gap_buffers(batch: pa.Table, stream: str) -> list:
    from dint_ray.util import list_views

    gap = st.docs_gap_buffer if stream == "docs" else st.freqs_gap_buffer
    return [gap(np.asarray(v, dtype=np.uint32))
            for v in list_views(batch.column(stream))]


def collect_stats_batch(batch: pa.Table, *, kind: str) -> pa.Table:
    """Map-side combine for gap-pattern stats: one batch of posting-list
    rows -> (stream, ctx, size, hash, freq) partial-count rows for BOTH
    the docs-gap and freqs streams in one pass (SURVEY.md D1/D2).

    Hash-keyed (stats.py): counting never touches pattern bytes, so the
    combine is pure numpy and the shuffle moves only fixed-width ints.
    Stateless on purpose — runs as a task pool, no actor startup."""
    multi = kind == "multi_packed"
    cols = {"stream": [], "ctx": [], "size": [], "hash": [], "freq": [],
            "total_ints": []}
    for si, stream in enumerate(("docs", "freqs")):
        bufs = _gap_buffers(batch, stream)
        if multi:
            ctxs, sizes, hashes, freqs, total = st.hash_counts_multi(bufs)
        else:
            sizes, hashes, freqs, total = st.hash_counts_single(bufs)
            ctxs = np.zeros(len(sizes), dtype=np.uint8)
        if not len(hashes):
            if total:
                ctxs = np.zeros(1, np.uint8)
                sizes = np.zeros(1, np.uint8)  # size 0 -> dropped at select
                hashes = np.zeros(1, np.uint64)
                freqs = np.zeros(1, np.uint64)
            else:
                continue
        totals = np.zeros(len(hashes), dtype=np.uint64)
        totals[0] = total
        cols["stream"].append(np.full(len(hashes), si, np.uint8))
        cols["ctx"].append(ctxs)
        cols["size"].append(sizes)
        cols["hash"].append(hashes.view(np.int64))
        cols["freq"].append(freqs)
        cols["total_ints"].append(totals)
    if not cols["hash"]:
        return pa.table({
            "stream": pa.array([], pa.uint8()), "ctx": pa.array([], pa.uint8()),
            "size": pa.array([], pa.uint8()), "hash": pa.array([], pa.int64()),
            "freq": pa.array([], pa.uint64()),
            "total_ints": pa.array([], pa.uint64()),
        })
    return pa.table({
        "stream": pa.array(np.concatenate(cols["stream"]), pa.uint8()),
        "ctx": pa.array(np.concatenate(cols["ctx"]), pa.uint8()),
        "size": pa.array(np.concatenate(cols["size"]), pa.uint8()),
        "hash": pa.array(np.concatenate(cols["hash"]), pa.int64()),
        "freq": pa.array(np.concatenate(cols["freq"]), pa.uint64()),
        "total_ints": pa.array(np.concatenate(cols["total_ints"]), pa.uint64()),
    })


def resolve_stats_batch(batch: pa.Table, *, wanted, multi: bool,
                        num_selectors: int) -> pa.Table:
    """Task stage: scan posting lists, emit pattern bytes for winning
    hashes found in this batch (stats.py resolve_patterns).  A task
    pool, not an actor pool: ``wanted`` ({stream: {(ctx,size): sorted
    u64}}) rides in fn_kwargs (put once in the object store), and
    tasks reuse warm workers — actor-pool startup tripled this stage's
    wall time at 24 CPUs."""
    out_stream, out_hash, out_pat = [], [], []
    for si, stream in enumerate(("docs", "freqs")):
        w = wanted.get(si)
        if not w:
            continue
        bufs = _gap_buffers(batch, stream)
        found = st.resolve_patterns(
            bufs, w, num_selectors=num_selectors if multi else None)
        for h, pat in found.items():
            out_stream.append(si)
            out_hash.append(h - (1 << 64) if h >= (1 << 63) else h)
            out_pat.append(pat)
    return pa.table({
        "stream": pa.array(out_stream, pa.uint8()),
        "hash": pa.array(out_hash, pa.int64()),
        "pattern": pa.array(out_pat, pa.binary()),
    })


# above this many partial rows the stats aggregation leaves the driver
# for the packed exchange below (patchable in tests to force the
# distributed path on small fixtures)
STATS_DRIVER_AGG_MAX_ROWS = 4_000_000

_PACKED_STATS_SCHEMA = pa.schema([
    ("part", pa.uint32()),
    ("stream", pa.list_(pa.uint8())),
    ("ctx", pa.list_(pa.uint8())),
    ("size", pa.list_(pa.uint8())),
    ("hash", pa.list_(pa.int64())),
    # u64 on the wire, deliberately: an A/B (bench_runs/ab_r05_*.json)
    # measured the uint32-wire variant +7 s on the 24-CPU
    # exchange_and_agg (21.1 vs 14.5 s, build 70.9 vs 53.3 s) — the
    # checked narrowing cast in pack plus the upcast on unpack cost
    # more CPU than the 4 B/row saves on an intra-host plasma exchange
    # whose reads are zero-copy.  On a real network the byte cut may
    # win; revisit with a cast-free emit (count in u32 from the start).
    ("freq", pa.list_(pa.uint64())),
])


def _collect_pack_block(batch: pa.Table, *, kind: str,
                        width: int) -> pa.Table:
    """Fused map side of the stats mine: hash-count one block of
    posting rows AND bucket-pack the partial rows in the same task.
    The former two passes materialized the ~12 partial rows per
    posting (24M scalar rows at 2M docs) just to re-scan and re-pack
    them — the fused stage materializes only the packed form.

    Rides three tiny meta columns on the FIRST packed row of each
    output (0 elsewhere): per-stream total_ints and the partial-row
    count, so global totals and the driver/distributed branch decision
    need no extra corpus-scale pass.  Splits preserve rows, so
    column sums stay exact under executor re-blocking."""
    partial = collect_stats_batch(batch, kind=kind)
    tot = {0: 0, 1: 0}
    if partial.num_rows:
        st_col = partial.column("stream").to_numpy()
        ti = partial.column("total_ints").to_numpy()
        for si in (0, 1):
            tot[si] = int(ti[st_col == si].sum())
    packed = _pack_stats_block(partial.drop_columns(["total_ints"]),
                               width=width)
    n = packed.num_rows
    td = np.zeros(max(n, 1), np.uint64)
    tf = np.zeros(max(n, 1), np.uint64)
    npart = np.zeros(max(n, 1), np.int64)
    td[0], tf[0], npart[0] = tot[0], tot[1], partial.num_rows
    if n == 0:
        # totals can be nonzero even with no hashable rows only when
        # partial carried the size-0 marker rows — those pack into
        # rows, so n==0 implies empty partial; nothing to carry
        return packed.append_column(
            "tot_docs", pa.array([], pa.uint64())).append_column(
            "tot_freqs", pa.array([], pa.uint64())).append_column(
            "npartial", pa.array([], pa.int64()))
    return (packed.append_column("tot_docs", pa.array(td[:n], pa.uint64()))
            .append_column("tot_freqs", pa.array(tf[:n], pa.uint64()))
            .append_column("npartial", pa.array(npart[:n], pa.int64())))


def _pack_stats_block(batch: pa.Table, *, width: int) -> pa.Table:
    """Bucket one block of scalar partial-stats rows by hash%width and
    emit ONE list row per non-empty bucket.  The stats exchange cost is
    per-row fixed overhead in the hash-shuffle machinery (not payload
    bytes), so shipping width list rows per block instead of millions
    of scalar rows removes ~all of it; the reduce side sees exactly the
    same (stream, ctx, size, hash, freq) multiset."""
    if batch.num_rows == 0:
        return _PACKED_STATS_SCHEMA.empty_table()
    cols = {n: batch.column(n).to_numpy(zero_copy_only=False)
            for n in ("stream", "ctx", "size", "hash", "freq")}
    part = (cols["hash"].view(np.uint64) % np.uint64(width)).astype(np.uint32)
    order = np.argsort(part, kind="stable")
    sorted_part = part[order]
    bucket_vals, starts = np.unique(sorted_part, return_index=True)
    offsets = np.concatenate(
        [starts, [len(sorted_part)]]).astype(np.int32)
    arrays = {"part": pa.array(bucket_vals, pa.uint32())}
    for name, typ in (("stream", pa.uint8()), ("ctx", pa.uint8()),
                      ("size", pa.uint8()), ("hash", pa.int64()),
                      ("freq", pa.uint64())):
        vals = pa.array(cols[name][order], typ)
        arrays[name] = pa.ListArray.from_arrays(pa.array(offsets), vals)
    return pa.table(arrays)


def _flat_list_column(col: pa.ChunkedArray, dtype) -> np.ndarray:
    parts = []
    for chunk in col.chunks if isinstance(col, pa.ChunkedArray) else [col]:
        if len(chunk):
            parts.append(np.asarray(chunk.flatten(), dtype=dtype))
    if not parts:
        return np.empty(0, dtype=dtype)
    return parts[0] if len(parts) == 1 else np.concatenate(parts)


def _agg_packed_block(batch: pa.Table, *, totals, cfg, nctx) -> pa.Table:
    """Unpack one exchanged partition of packed stats rows, aggregate
    freq per (stream, ctx, size, hash) exactly (lexsort + reduceat —
    pyarrow group_by on a rebuilt scalar table costs ~2x), then keep
    only rows that win the per-partition pre-selection so the driver
    ranks candidates, not the full hash universe."""
    out_schema = pa.schema([
        ("stream", pa.uint8()), ("ctx", pa.uint8()), ("size", pa.uint8()),
        ("hash", pa.int64()), ("freq", pa.uint64())])
    if batch.num_rows == 0:
        return out_schema.empty_table()
    streams = _flat_list_column(batch.column("stream"), np.uint8)
    ctxs = _flat_list_column(batch.column("ctx"), np.uint8)
    sizes = _flat_list_column(batch.column("size"), np.uint8)
    hashes = _flat_list_column(batch.column("hash"), np.int64)
    freqs = _flat_list_column(batch.column("freq"), np.uint64)
    if not len(hashes):
        return out_schema.empty_table()
    order = np.lexsort((streams, ctxs, sizes, hashes))
    streams, ctxs, sizes = streams[order], ctxs[order], sizes[order]
    hashes, freqs = hashes[order], freqs[order]
    newgrp = np.empty(len(hashes), dtype=bool)
    newgrp[0] = True
    np.not_equal(hashes[1:], hashes[:-1], out=newgrp[1:])
    for k in (sizes, ctxs, streams):
        newgrp[1:] |= k[1:] != k[:-1]
    starts = np.flatnonzero(newgrp)
    g_stream, g_ctx, g_size = streams[starts], ctxs[starts], sizes[starts]
    g_hash = hashes[starts]
    g_freq = np.add.reduceat(freqs, starts)
    keep_idx = []
    idx = np.arange(len(starts))
    uh = g_hash.view(np.uint64)
    for si in (0, 1):
        for ctx in range(nctx):
            m = (g_stream == si) & (g_ctx == ctx) & (g_size > 0)
            if not m.any():
                continue
            ws, wh, wf = st.select_hash_winners(
                g_size[m], uh[m], g_freq[m], int(totals.get(si, 0)), cfg)
            sub = idx[m]
            # exact winner rows: match on (hash, size) pairs
            pair = uh[m] ^ (g_size[m].astype(np.uint64) << np.uint64(56))
            wpair = wh.astype(np.uint64) ^ (ws.astype(np.uint64) << np.uint64(56))
            keep_idx.append(sub[np.isin(pair, wpair)])
    if not keep_idx:
        return out_schema.empty_table()
    sel = np.sort(np.concatenate(keep_idx))
    return pa.table({
        "stream": pa.array(g_stream[sel], pa.uint8()),
        "ctx": pa.array(g_ctx[sel], pa.uint8()),
        "size": pa.array(g_size[sel], pa.uint8()),
        "hash": pa.array(g_hash[sel], pa.int64()),
        "freq": pa.array(g_freq[sel], pa.uint64()),
    })


def mine_stats_ray(postings_ds, kind: str, docs_path: str, freqs_path: str,
                   cfg: DintConfig = DintConfig(),
                   timings: dict | None = None):
    """Distributed D1/D2 for both streams: ONE hash-count pass + ONE
    exchange, winner selection on the driver, then ONE resolution pass
    mapping winning hashes back to pattern bytes.

    Head keys (zero runs) are collapsed to <= 1 row per batch by the
    map-side combine, so the exchange sees no skew (SURVEY.md §4); keys
    are fixed-width ints, never pattern bytes."""
    import ray
    from ray.data.aggregate import Sum

    if os.path.exists(docs_path) and os.path.exists(freqs_path):
        return pq.read_table(docs_path), pq.read_table(freqs_path)
    # sub-stage wall clocks, surfaced in the manifest's stage_secs as
    # "pattern_stats.<step>" so scaling regressions point at a step,
    # not the whole stage
    subs: dict[str, float] = {}
    _t0 = time.time()

    def _sub(name: str) -> None:
        nonlocal _t0
        now = time.time()
        subs[name] = round(now - _t0, 2)
        _t0 = now

    postings_ds = postings_ds.materialize()  # consumed twice (count + resolve)
    _sub("materialize_postings")
    # ONE fused pass: hash-count + bucket-pack per block (the former
    # separate collect -> materialize(24M scalar rows) -> totals scan
    # -> pack scan -> materialize chain re-read the biggest
    # intermediate twice; only the packed form materializes now)
    width = _shuffle_width()
    packed = postings_ds.map_batches(
        _collect_pack_block, fn_kwargs={"kind": kind, "width": width},
        batch_format="pyarrow", batch_size=None, num_cpus=1,
    ).materialize()
    multi = kind == "multi_packed"
    nctx = cfg.num_selectors if multi else 1
    prefs = [r for r in packed.to_arrow_refs()]
    _sub("hash_count")

    # global totals + partial-row count from the per-block meta columns
    # (num_cpus=0 tasks: locality-scheduled, only the three tiny
    # columns are touched)
    def _meta_of(t: pa.Table):
        if t is None or t.num_rows == 0 or "tot_docs" not in t.column_names:
            return (0, 0, 0)
        return (int(t.column("tot_docs").to_numpy().sum()),
                int(t.column("tot_freqs").to_numpy().sum()),
                int(t.column("npartial").to_numpy().sum()))

    meta_t = ray.remote(num_cpus=0)(_meta_of)
    metas = ray.get([meta_t.remote(r) for r in prefs])
    totals = {0: sum(m[0] for m in metas), 1: sum(m[1] for m in metas)}
    nrows = sum(m[2] for m in metas)
    _sub("totals")

    if nrows <= STATS_DRIVER_AGG_MAX_ROWS:
        # small inputs: one vectorized unpack-aggregate over the whole
        # packed set on the driver — the exchange is pure overhead
        # here.  _agg_packed_block pre-selects winners, which is
        # idempotent under the identical downstream selection (same
        # totals, same cfg), so `agg` holding only winner rows is
        # exact.  Above the threshold the distributed branch wins: the
        # driver aggregate is a SERIAL chunk that grows with hash
        # cardinality (measured 14 s at 28M partial rows / 19M groups,
        # identical at every CPU count — the build's scaling killer).
        live = [t for t in ray.get(prefs)
                if t is not None and t.num_rows]
        agg = _agg_packed_block(
            pa.concat_tables(live, promote_options="default")
            if live else _PACKED_STATS_SCHEMA.empty_table(),
            totals=totals, cfg=cfg, nctx=nctx)
    else:
        # distributed: hash-partition by hash value (all 4 group keys
        # are functions of rows sharing a hash), exact numpy aggregate
        # + a per-partition winner pre-selection inside each partition,
        # so only candidate rows reach the driver.  The exchange moves
        # PACKED rows — one list row per (block, bucket) — because the
        # hash-shuffle cost is per-ROW serde overhead, not bytes
        # (BASELINE.md round-3 A/B: a 37.5%-byte cut moved the posting
        # exchange ~2%; bundling rows cut it 35-45%).
        # The exchange itself is DIRECT ray tasks, not a keyed
        # repartition: moving the ~width x blocks packed rows through
        # the hash-shuffle operator cost ~2 s of aggregator-actor
        # machinery for ~600 rows (profiled).  Every agg task receives
        # all packed block refs (plasma, zero-copy) and filters out
        # exactly its bucket's rows — so each (stream,ctx,size,hash)
        # group is COMPLETE within one task (part = hash % width),
        # sums are exact, and no post-hoc dedup pass is needed, even
        # if the executor split a pack output block (tasks filter by
        # part value, not by block boundary).
        # multi-node locality twin of postings._direct_merge_exchange:
        # pre-split packed blocks per bucket so each agg task fetches
        # only its own rows (1x network); single node keeps filter-all
        from dint_ray.postings import (_exchange_map_split,
                                       _split_block_by_part)

        map_split = _exchange_map_split() and width > 1
        if map_split:
            splitter = ray.remote(num_cpus=1)(_split_block_by_part)
            per_block = [splitter.options(num_returns=width).remote(r, width)
                         for r in prefs]

        trace = os.environ.get("DINT_EXCHANGE_TRACE") == "1"

        def _agg_part(p: int, totals, cfg, nctx, *tabs) -> pa.Table:
            import pyarrow.compute as pc

            if trace:
                from dint_ray.postings import _exchange_trace

                _exchange_trace("merge_in",
                                sum(t.nbytes for t in tabs
                                    if t is not None and t.num_columns))
            if map_split:
                sel = [t for t in tabs
                       if t is not None and t.num_columns and t.num_rows]
            else:
                sel = [t.filter(pc.equal(t.column("part"), p))
                       for t in tabs if t is not None and t.num_rows]
                sel = [s for s in sel if s.num_rows]
            if not sel:
                return _agg_packed_block(
                    _PACKED_STATS_SCHEMA.empty_table(),
                    totals=totals, cfg=cfg, nctx=nctx)
            return _agg_packed_block(
                pa.concat_tables(sel, promote_options="default"),
                totals=totals, cfg=cfg, nctx=nctx)

        agg_t = ray.remote(num_cpus=1)(_agg_part)
        cand = [agg_t.remote(p, totals, cfg, nctx,
                             *([pb[p] for pb in per_block] if map_split
                               else prefs))
                for p in range(width)]
        agg = pa.concat_tables(
            [t for t in ray.get(cand) if t is not None and t.num_rows],
            promote_options="default")
    _sub("exchange_and_agg")

    # winner selection on numpy views of the arrow columns (zero-copy
    # for the fixed-width types; the former pandas round-trip of the
    # multi-million-row candidate table was a serial driver chunk)
    a_stream = agg.column("stream").to_numpy()
    a_ctx = agg.column("ctx").to_numpy()
    a_size = agg.column("size").to_numpy().astype(np.uint8)
    a_hash = agg.column("hash").to_numpy().view(np.uint64)
    a_freq = agg.column("freq").to_numpy().astype(np.uint64)
    winners: dict[int, dict[int, tuple]] = {}   # stream -> ctx -> (ws, wh, wf)
    wanted: dict[int, dict[tuple[int, int], np.ndarray]] = {}
    for si in (0, 1):
        base = (a_stream == si) & (a_size > 0)
        total = int(totals.get(si, 0))
        winners[si] = {}
        wmap: dict[tuple[int, int], list] = {}
        for ctx in range(nctx):
            m = base & (a_ctx == ctx)
            ws, wh, wf = st.select_hash_winners(
                a_size[m], a_hash[m], a_freq[m], total, cfg)
            winners[si][ctx] = (ws, wh, wf)
            for s in np.unique(ws):
                wmap.setdefault((ctx, int(s)), []).append(wh[ws == s])
        wanted[si] = {k: np.sort(np.concatenate(v)) for k, v in wmap.items()}
    _sub("winner_select")

    res = postings_ds.map_batches(
        resolve_stats_batch,
        fn_kwargs={"wanted": wanted, "multi": multi,
                   "num_selectors": cfg.num_selectors},
        batch_format="pyarrow", batch_size=None, num_cpus=1,
    )
    # min-reduce pattern bytes per (stream, hash) as a PARALLEL tree
    # over the task outputs: a frequent winner's bytes are emitted by
    # nearly every block, so pulling all per-block tables to one
    # driver-side group_by was a serial chunk that grew with block
    # count x winner count (the measured reason this sub-stage scaled
    # at 0.42 while the scan pass beside it scaled at 0.58).  Fan-in 8
    # keeps the tree shallow; each merge is the same vectorized arrow
    # group_by min, so collision semantics are unchanged.
    rt = pa.table({"stream": pa.array([], pa.uint8()),
                   "hash": pa.array([], pa.int64()),
                   "pattern": pa.array([], pa.binary())})

    def _min_merge(*tabs: pa.Table) -> pa.Table:
        live = [t for t in tabs if t is not None and t.num_rows]
        if not live:
            return rt
        merged = pa.concat_tables(live, promote_options="default")
        g = merged.group_by(["stream", "hash"]).aggregate(
            [("pattern", "min")])
        return pa.table({"stream": g.column("stream"),
                         "hash": g.column("hash"),
                         "pattern": g.column("pattern_min")})

    rrefs = [r for r in res.to_arrow_refs()]
    if rrefs:
        merge_t = ray.remote(num_cpus=1)(_min_merge)
        while len(rrefs) > 1:
            rrefs = [merge_t.remote(*rrefs[i:i + 8])
                     for i in range(0, len(rrefs), 8)]
        rt = ray.get(rrefs[0])
    resolved: dict[int, dict[int, bytes]] = {0: {}, 1: {}}
    for si, h, pat in zip(rt.column("stream").to_numpy(),
                          rt.column("hash").to_numpy(),
                          rt.column("pattern").to_pylist()):
        hv = int(h) + (1 << 64) if int(h) < 0 else int(h)
        resolved[int(si)][hv] = pat
    _sub("resolve")

    out = []
    for si, path in ((0, docs_path), (1, freqs_path)):
        ctx_col, pat_col, freq_col = [], [], []
        for ctx in range(nctx):
            ws, wh, wf = winners[si][ctx]
            for h, f in zip(wh, wf):
                pat = resolved[si].get(int(h))
                if pat is not None:
                    ctx_col.append(ctx)
                    pat_col.append(pat)
                    freq_col.append(int(f))
        t = pa.table({
            "ctx": pa.array(ctx_col, pa.uint8()),
            "pattern": pa.array(pat_col, pa.binary()),
            "freq": pa.array(np.asarray(freq_col, dtype=np.uint64), pa.uint64()),
            "total_ints_global": pa.array(
                [int(totals.get(si, 0))] * len(ctx_col), pa.uint64()),
        })
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        out.append(t)
    if timings is not None:
        timings.update(subs)
    return out[0], out[1]


def _build_dict_one(table: pa.Table, kind: str, cfg: DintConfig):
    total = int(table.column("total_ints_global")[0].as_py()) if len(table) else 0
    ctx = table.column("ctx").to_numpy()
    pats = table.column("pattern").to_pylist()
    freqs = table.column("freq").to_numpy()
    if kind in ("single_packed", "single_packed8", "single_rect"):
        from dint_ray.dint.dictionary import build_rect_single
        from dint_ray.index.build import cfg_for_kind

        cfg = cfg_for_kind(kind, cfg)
        counts = {p: int(f) for p, f in zip(pats, freqs)}
        builder = (build_rect_single if kind == "single_rect"
                   else build_packed_single)
        return builder(st.select_targets(counts, total, cfg), cfg)
    maps: list[dict[bytes, int]] = [dict() for _ in range(cfg.num_selectors)]
    for c, p, f in zip(ctx, pats, freqs):
        maps[int(c)][p] = int(f)
    return build_packed_multi(st.select_targets_multi(maps, total, cfg), cfg)


def _dicts_from_stats(stats_docs: pa.Table, stats_freqs: pa.Table,
                      kind: str, cfg: DintConfig) -> BuiltDicts:
    # the docs and freqs selections are independent CPU-bound work
    # (~1.4 s each at 64k-pattern stats): run them as two Ray tasks so
    # the stage costs one selection, not two back-to-back (GIL rules
    # out driver threads for this).  Serial fallback keeps the function
    # usable without a live Ray session (unit tests).
    try:
        import ray

        use_ray = ray.is_initialized()
    except Exception:  # pragma: no cover - ray absent
        use_ray = False
    if use_ray:
        one = ray.remote(num_cpus=1)(_build_dict_one)
        d_ref = one.remote(stats_docs, kind, cfg)
        f_ref = one.remote(stats_freqs, kind, cfg)
        return BuiltDicts(kind=kind, docs_dict=ray.get(d_ref),
                          freqs_dict=ray.get(f_ref))
    return BuiltDicts(kind=kind,
                      docs_dict=_build_dict_one(stats_docs, kind, cfg),
                      freqs_dict=_build_dict_one(stats_freqs, kind, cfg))


class EncodeLists:
    """Actor-pool encode stage (ST1): dictionaries shipped once per actor
    via ray.put; per-term max BM25 weight fused in (A5)."""

    def __init__(self, dicts_ref, norm_lens_ref) -> None:
        import ray

        dicts: BuiltDicts = ray.get(dicts_ref)
        self.docs_codec, self.freqs_codec = dicts.codecs()
        self.norm_lens = ray.get(norm_lens_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from dint_ray.util import list_views

        tids = batch.column("term_id").to_numpy()
        docs_views = list_views(batch.column("docs"))
        freqs_views = list_views(batch.column("freqs"))
        payloads, dfs, maxw = [], [], []
        for docs, freqs in zip(docs_views, freqs_views):
            docs = np.ascontiguousarray(docs, dtype=np.uint32)
            freqs = np.ascontiguousarray(freqs, dtype=np.uint32)
            payloads.append(write_posting_list(docs, freqs,
                                               self.docs_codec, self.freqs_codec))
            dfs.append(len(docs))
            maxw.append(float(max_weight_of_list(docs, freqs, self.norm_lens)))
        return pa.table({
            "term_id": pa.array(tids.astype(np.uint32), pa.uint32()),
            "df": pa.array(np.asarray(dfs, dtype=np.uint32), pa.uint32()),
            "max_weight": pa.array(np.asarray(maxw, dtype=np.float32), pa.float32()),
            "payload": pa.array(payloads, pa.binary()),
        })


def dicts_from_stats_stage(stats_docs, stats_freqs, kind: str,
                           out_dir: str, cfg: DintConfig) -> BuiltDicts:
    """Driver-side dictionary selection + crash-safe npz checkpoint
    (shared by the classic whole-list build and the direct serve-layout
    build — both feed gap-pattern stats in, dictionaries out)."""
    dict_path = os.path.join(out_dir, f"dicts_{kind}.npz")
    if (os.path.exists(dict_path + ".docs.npz")
            and os.path.exists(dict_path + ".freqs.npz")):
        return BuiltDicts(kind=kind,
                          docs_dict=load_dict(dict_path + ".docs.npz"),
                          freqs_dict=load_dict(dict_path + ".freqs.npz"))
    dicts = _dicts_from_stats(stats_docs, stats_freqs, kind, cfg)
    saver = save_multi if kind == "multi_packed" else save_single
    # crash-safe: write both to temp paths, then atomically publish
    # (resume gates on BOTH files existing, so a crash between the two
    # replaces never looks done)
    for suffix, d in ((".docs.npz", dicts.docs_dict),
                      (".freqs.npz", dicts.freqs_dict)):
        tmp = dict_path + suffix + ".tmp.npz"
        saver(tmp, d)
        os.replace(tmp, dict_path + suffix)
    return dicts


def build_index_ray(pages_path: str, out_dir: str, kind: str = "single_packed",
                    cfg: DintConfig = DintConfig(),
                    bcfg: BuildConfig = BuildConfig(),
                    num_shards: int = 8, from_html: bool = False,
                    text_col: str = "text", id_col: str = "doc_id") -> dict:
    """Full distributed build; resumable; returns the manifest dict."""
    import ray
    import ray.data as rd

    import dint_ray

    dint_ray.tune_for_cluster()
    from dint_ray.index.build import cfg_for_kind

    cfg = cfg_for_kind(kind, cfg)
    os.makedirs(out_dir, exist_ok=True)
    t_start = time.time()
    manifest_path = os.path.join(out_dir, "manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            return json.load(f)

    # num_docs from parquet footers: no Ray pass just to count rows
    num_docs = _parquet_num_rows(pages_path)
    pages = rd.read_parquet(pages_path,
                            columns=[id_col, "html" if from_html else text_col],
                            override_num_blocks=_read_blocks_floor(pages_path))
    stage_secs: dict[str, float] = {}

    def _tick(name: str, t0: float) -> float:
        now = time.time()
        stage_secs[name] = round(now - t0, 3)
        return now

    t = time.time()
    # --- stage 1: tokenize -> posting rows ---
    # Checkpointing the rows costs a full disk roundtrip of the string
    # rows; below the auto threshold they stay in the (spillable)
    # object store instead and a crash before the postings checkpoint
    # re-tokenizes — the cheap side of that trade flips at scale, where
    # tokenize is a long stage worth its own checkpoint.
    rows_dir = os.path.join(out_dir, "postings_rows")
    vocab_path = os.path.join(out_dir, "vocab.parquet")
    lists_dir = os.path.join(out_dir, "postings")
    sizes_path = os.path.join(out_dir, "sizes.parquet")
    # every consumer of the tokenized rows (vocabulary, posting lists,
    # doc sizes) checkpoints its own output — when all three artifacts
    # exist (a resume, or a sibling-kind build seeded from shared
    # checkpoints), skip tokenization entirely instead of eagerly
    # materializing a dataset nobody reads
    need_rows = not (os.path.exists(vocab_path) and _done(lists_dir)
                     and os.path.exists(sizes_path))
    rows_ds = None
    if need_rows:
        ckpt_rows = bcfg.checkpoint_rows
        if ckpt_rows is None:
            ckpt_rows = num_docs > 5_000_000
        if _done(rows_dir):
            rows_ds = rd.read_parquet(rows_dir)
        elif ckpt_rows:
            os.makedirs(rows_dir, exist_ok=True)
            tokenize_rows(pages, bcfg,
                          from_html=from_html).write_parquet(rows_dir)
            _mark_done(rows_dir)
            rows_ds = rd.read_parquet(rows_dir)
        else:
            rows_ds = tokenize_rows(pages, bcfg,
                                    from_html=from_html).materialize()
    t = _tick("tokenize", t)

    # --- doc sizes (overlapped): depends only on the tokenized rows,
    # so it runs in a driver thread UNDER the vocabulary + posting-list
    # stages (concurrent Dataset executions share the cluster; this
    # pass is ~2 s of width-independent wall that would otherwise sit
    # on the critical path).  Joined before the stats/norms consumers.
    import threading

    from dint_ray.index.docstats import streaming_len_stats, write_sizes_sorted

    # ONE scan of the tokenized rows feeds BOTH the vocabulary df
    # partials and the doc-length partials (fused_partials); the two
    # former passes each re-read every (doc_id, term, tf) row from
    # plasma.  The views below only re-read partial-sized blocks.
    df_part_view = sizes_part_view = None
    if rows_ds is not None and (not os.path.exists(vocab_path)
                                or not os.path.exists(sizes_path)):
        from dint_ray.postings import fused_partials

        df_part_view, sizes_part_view = fused_partials(rows_ds)
        t = _tick("fused_partials", t)

    sizes_thread = None
    sizes_err: list[BaseException] = []
    sizes_wall = [0.0]
    if not os.path.exists(sizes_path):
        def _sizes_job() -> None:
            _ts = time.time()
            try:
                import dint_ray

                dint_ray.ensure_tuned()  # DataContext may be thread-local
                write_sizes_sorted(doc_sizes(rows_ds,
                                             partial=sizes_part_view),
                                   sizes_path)
            except BaseException as e:  # re-raised at join
                sizes_err.append(e)
            finally:
                sizes_wall[0] = time.time() - _ts

        sizes_thread = threading.Thread(target=_sizes_job,
                                        name="doc-sizes", daemon=True)
        sizes_thread.start()

    # --- stage 2: vocabulary (driver dict below the term threshold,
    # Dataset + hash join above it — the driver never holds the term
    # table on the join path) ---
    from dint_ray.postings import (build_posting_lists_joined,
                                   build_vocabulary_ds, df_partials,
                                   max_df_of_vocab, write_vocab_parquet)

    vocab_meta_path = os.path.join(out_dir, "vocab_meta.json")
    use_join = bcfg.vocab_mode == "dataset"
    if not os.path.exists(vocab_path):
        partial = (df_part_view if df_part_view is not None
                   else df_partials(rows_ds))
        if bcfg.vocab_mode == "auto":
            use_join = partial.count() > bcfg.vocab_dataset_threshold
        stage_secs["vocabulary.df_partials"] = round(time.time() - t, 2)
        _tv = time.time()
        if use_join:
            write_vocab_parquet(build_vocabulary_ds(rows_ds, partial),
                                vocab_path)
        else:
            vocab = build_vocabulary(rows_ds, partial)
            tmp = vocab_path + ".tmp"
            pq.write_table(
                pa.Table.from_pandas(vocab.terms, preserve_index=False), tmp)
            os.replace(tmp, vocab_path)
        # persist the path decision: a resume must not re-derive it
        # from a DIFFERENT metric (unique terms vs df-partial rows)
        # and silently flip a large build back onto the
        # driver-broadcast path
        with open(vocab_meta_path + ".tmp", "w") as f:
            json.dump({"use_join": use_join}, f)
        os.replace(vocab_meta_path + ".tmp", vocab_meta_path)
        stage_secs["vocabulary.reduce_write"] = round(time.time() - _tv, 2)
    elif bcfg.vocab_mode == "auto":
        if os.path.exists(vocab_meta_path):
            with open(vocab_meta_path) as f:
                use_join = bool(json.load(f)["use_join"])
        else:  # pre-marker artifact: unique terms is the best proxy
            use_join = pq.read_metadata(vocab_path).num_rows > \
                bcfg.vocab_dataset_threshold
    num_terms = pq.read_metadata(vocab_path).num_rows
    t = _tick("vocabulary", t)

    # --- stage 3: posting lists (salted groupby / fused join-merge).
    # The exchange result is MATERIALIZED (object store, spillable) and
    # the parquet checkpoint write happens in a background thread: the
    # stats and encode stages consume the materialized blocks directly,
    # so neither the checkpoint write nor its re-read sits on the
    # critical path.  Resume still gates on the _SUCCESS marker, which
    # is only written after the background write completes. ---
    ckpt_thread = None
    ckpt_err: list[BaseException] = []
    if not _done(lists_dir):
        os.makedirs(lists_dir, exist_ok=True)
        if use_join:
            if max_df_of_vocab(vocab_path) > bcfg.chunk_df_threshold:
                import logging

                logging.getLogger(__name__).warning(
                    "vocabulary join path merges each term in one task; "
                    "the head df exceeds chunk_df_threshold=%d — combine "
                    "with doc-range salting if a merge task OOMs",
                    bcfg.chunk_df_threshold)
            lists = build_posting_lists_joined(
                rows_ds, rd.read_parquet(vocab_path), bcfg)
        else:
            vocab = Vocabulary(terms=pq.read_table(vocab_path).to_pandas())
            lists = build_posting_lists(rows_ds, vocab, bcfg,
                                        num_docs=num_docs)
        lists_ds = lists.materialize()

        def _ckpt_job() -> None:
            try:
                # Per-block zero-CPU writer TASKS, bounded in flight:
                # `lists_ds.write_parquet` here was a SECOND live
                # streaming execution competing with the pattern-stats
                # exchanges for every task slot — measured at 2M docs /
                # 24 CPUs the stats stage ran 78.8 s overlapped vs
                # 25.8 s standalone (run 21) — and the round-3 fix
                # (driver `ray.get` + write) funneled every postings
                # byte through the driver process: on a cluster,
                # through its NIC.  num_cpus=0 keeps the writers off
                # the executor's task slots (the run-21 property), and
                # Ray's locality-aware scheduling runs each writer on
                # the node that owns the block, so no postings byte
                # crosses the network.  Assumes out_dir is shared
                # storage on a real cluster (same contract as every
                # other checkpoint/shard write in this pipeline).
                import ray as _ray

                def _write_block(tbl, path: str) -> int:
                    if tbl is None or tbl.num_rows == 0:
                        return 0
                    pq.write_table(tbl, path)
                    return 1

                # in-flight cap 2: num_cpus=0 writers are invisible to
                # the scheduler, so a wide window ran ~dozens of
                # concurrent parquet-compression processes UNDER the
                # pattern-stats stage (measured: hash_count 2.7 -> 9.1 s
                # and driver winner_select 0.5 -> 1.8 s at 24 CPUs).
                # The round-3 driver loop was effectively ONE writer;
                # two writer tasks match its throughput without the
                # driver funnel.
                writer = _ray.remote(num_cpus=0)(_write_block)
                pending = []
                for i, ref in enumerate(lists_ds.to_arrow_refs()):
                    pending.append(writer.remote(
                        ref, os.path.join(lists_dir,
                                          f"part-{i:05d}.parquet")))
                    if len(pending) >= 2:
                        ready, pending = _ray.wait(pending, num_returns=1)
                        _ray.get(ready)  # surface writer errors early
                _ray.get(pending)
                _mark_done(lists_dir)
            except BaseException as e:  # re-raised before the manifest
                ckpt_err.append(e)

        ckpt_thread = threading.Thread(target=_ckpt_job,
                                       name="postings-ckpt", daemon=True)
        ckpt_thread.start()
    else:
        lists_ds = rd.read_parquet(lists_dir)
    t = _tick("posting_lists", t)

    # --- stage 4: doc sizes join (pass launched back at stage 1; the
    # file is written SORTED by doc_id with bounded row groups so
    # bucket owners / segment encoders can range-read their slice —
    # index/docstats.py; the driver holds O(row_group), not
    # O(num_docs)) ---
    if sizes_thread is not None:
        sizes_thread.join()
        if sizes_err:
            raise sizes_err[0]
        stage_secs["doc_sizes.thread_wall"] = round(sizes_wall[0], 3)
    total_len, _ = streaming_len_stats(sizes_path)
    t = _tick("doc_sizes", t)

    from dint_ray.index.sequences import SEQ_KINDS

    if kind.startswith("block_") or kind in SEQ_KINDS:
        # plain block-codec index (block_freq_index<T> family) or a
        # whole-list sequence index (ef / partitioned-EF,
        # index_types.hpp:25-37): no dictionary model, stages 5-6 are
        # skipped entirely
        dicts = BuiltDicts(kind=kind)
        t = _tick("pattern_stats", t)
        t = _tick("dictionaries", t)
    else:
        # --- stage 5: gap-pattern stats (the mining shuffle, both streams) ---
        stats_subs: dict[str, float] = {}
        stats_docs, stats_freqs = mine_stats_ray(
            lists_ds, kind,
            os.path.join(out_dir, "stats_docs.parquet"),
            os.path.join(out_dir, "stats_freqs.parquet"), cfg,
            timings=stats_subs)
        stage_secs.update(
            {f"pattern_stats.{k}": v for k, v in stats_subs.items()})
        t = _tick("pattern_stats", t)

        # --- stage 6: dictionaries (driver; stats are tiny) ---
        dicts = dicts_from_stats_stage(stats_docs, stats_freqs, kind,
                                       out_dir, cfg)
        t = _tick("dictionaries", t)

    # --- stage 7: encode + shard write ---
    # exact integer token total / num_docs == the float64 reduction the
    # oracle uses (both exact below 2^53 total tokens)
    avg = float(total_len) / num_docs
    # The classic build encodes WHOLE lists (docs span every bucket),
    # so its max-weight fusion ships one full norm array via ray.put —
    # acceptable for this path (the whole-image/broadcast family); the
    # 10^12-doc route is build_serve_direct, whose segment encoders
    # range-read only their bucket's rows (index/docstats.py).
    sz = pq.read_table(sizes_path)
    sizes = np.zeros(num_docs, dtype=np.uint32)
    sizes[sz.column("doc_id").to_numpy().astype(np.int64)] = \
        sz.column("len").to_numpy()
    norm_lens = (sizes.astype(np.float32) / np.float32(avg)).astype(np.float32)
    dicts_ref = ray.put(dicts)
    norms_ref = ray.put(norm_lens)
    encoded = lists_ds.map_batches(
        EncodeLists,
        fn_constructor_kwargs={"dicts_ref": dicts_ref, "norm_lens_ref": norms_ref},
        batch_format="pyarrow",
        batch_size=bcfg.encode_batch_size,
        # fixed pool: see postings.tokenize_rows (autoscale ramp never
        # widens short stages)
        concurrency=bcfg.pool_bounds(bcfg.encode_concurrency),
        num_cpus=1,
    )

    def add_shard(batch: pa.Table) -> pa.Table:
        shard = (batch.column("term_id").to_numpy() % num_shards).astype(np.uint32)
        return batch.append_column("shard", pa.array(shard, pa.uint32()))

    # partitioned streaming write: one DIRECTORY per shard, many block
    # files — no whole-shard UDF call (round 1 funneled each shard
    # through one groupby().map_groups task, which at 100x means one
    # task holding an entire shard in memory); lineage comes from the
    # written parquet footers
    shards_dir = os.path.join(out_dir, "shards")
    (encoded.map_batches(add_shard, batch_format="pyarrow")
     .write_parquet(shards_dir, partition_cols=["shard"]))
    shards = []
    for sid in range(num_shards):
        part_dir = os.path.join(shards_dir, f"shard={sid}")
        files = sorted(os.listdir(part_dir)) if os.path.isdir(part_dir) else []
        rows = nbytes = 0
        for fn in files:
            fp = os.path.join(part_dir, fn)
            md = pq.read_metadata(fp)
            rows += md.num_rows
            nbytes += os.path.getsize(fp)
        shards.append({
            "path": os.path.join("shards", f"shard={sid}"),
            "shard_id": sid,
            "rows": rows,
            "bytes": nbytes,
            "files": len(files),
            "input": os.path.basename(pages_path),
        })
    _tick("encode_and_shards", t)

    # postings checkpoint must be durable before the manifest declares
    # the build done (resume reads postings/ via its _SUCCESS marker)
    if ckpt_thread is not None:
        _tj = time.time()
        ckpt_thread.join()
        if ckpt_err:
            raise ckpt_err[0]
        stage_secs["posting_ckpt.join_wait"] = round(time.time() - _tj, 3)

    write_manifest(
        out_dir,
        num_docs=num_docs,
        num_terms=num_terms,
        avg_doc_len=avg,
        dict_kind=kind,
        shards=shards,
        extra={
            "pages_path": os.path.abspath(pages_path),
            "num_shards": num_shards,
            "build_wall_sec": round(time.time() - t_start, 3),
            "docs_per_sec": round(num_docs / max(time.time() - t_start, 1e-9), 1),
            "stage_secs": stage_secs,
        },
    )
    with open(manifest_path) as f:
        return json.load(f)


def load_built_index(out_dir: str):
    """(InvertedIndex, WandData, manifest) from a build directory."""
    from dint_ray.index.build import load_codec_bundle
    from dint_ray.index.shards import load_shards
    from dint_ray.scoring import WandData

    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    kind = manifest["dict_kind"]
    docs_codec, freqs_codec = load_codec_bundle(out_dir, kind).codecs()
    idx, max_w, _ = load_shards(out_dir, docs_codec, freqs_codec)
    sz = pq.read_table(os.path.join(out_dir, "sizes.parquet"))
    sizes = np.zeros(manifest["num_docs"], dtype=np.uint32)
    sizes[sz.column("doc_id").to_numpy().astype(np.int64)] = sz.column("len").to_numpy()
    norm_lens = (sizes.astype(np.float32) /
                 np.float32(manifest["avg_doc_len"])).astype(np.float32)
    mw = np.zeros(manifest["num_terms"], dtype=np.float32)
    for t, w in max_w.items():
        mw[t] = w
    wand = WandData(norm_lens, mw, sizes=sizes)
    return idx, wand, manifest
