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


def collect_stats_batch(batch: pa.Table, *, kind: str) -> pa.Table:
    """Map-side combine for gap-pattern stats: one batch of posting-list
    rows -> (stream, ctx, pattern, freq) partial-count rows for BOTH the
    docs-gap and freqs streams in a single pass (SURVEY.md D1/D2).
    Stateless on purpose — runs as a task pool, no actor startup."""
    from dint_ray.util import list_views

    multi = kind == "multi_packed"
    streams, pats, ctxs, freqs, totals = [], [], [], [], []
    for stream in ("docs", "freqs"):
        views = list_views(batch.column(stream))
        gap = st.docs_gap_buffer if stream == "docs" else st.freqs_gap_buffer
        bufs = [gap(np.asarray(v, dtype=np.uint32)) for v in views]
        if multi:
            maps, total = st.collect_multi(bufs)
        else:
            counts, total = st.collect_single(bufs)
            maps = [counts]
        first = True
        for ctx, m in enumerate(maps):
            pats.extend(m.keys())
            freqs.extend(m.values())
            ctxs.extend([ctx] * len(m))
            streams.extend([stream] * len(m))
            # one totals carrier row per (batch, stream)
            if m:
                totals.extend([total if first else 0] + [0] * (len(m) - 1))
                first = False
    return pa.table({
        "stream": pa.array(streams, pa.string()),
        "ctx": pa.array(ctxs, pa.uint8()),
        "pattern": pa.array(pats, pa.binary()),
        "freq": pa.array(np.asarray(freqs, dtype=np.uint64), pa.uint64()),
        "total_ints": pa.array(np.asarray(totals, dtype=np.uint64),
                               pa.uint64()),
    })


def mine_stats_ray(postings_ds, kind: str, docs_path: str, freqs_path: str):
    """Distributed D1/D2 for both streams in ONE pass + ONE shuffle:
    per-batch combine -> groupby((stream, ctx, pattern)).sum.

    The head keys (zero runs) are collapsed to <= 1 row per batch by the
    combine, so the shuffle sees no skew (SURVEY.md §4 skew row)."""
    import ray
    from ray.data.aggregate import Sum

    if os.path.exists(docs_path) and os.path.exists(freqs_path):
        return pq.read_table(docs_path), pq.read_table(freqs_path)
    partial = postings_ds.map_batches(
        collect_stats_batch, fn_kwargs={"kind": kind},
        batch_format="pyarrow", batch_size=256, num_cpus=1,
    ).materialize()  # consumed twice (pattern agg + totals); partials are small
    nrows = partial.count()
    if nrows <= 2_000_000:
        # small enough for one C++ group_by on the driver: a Ray
        # sort-shuffle here is all fixed cost (the map-side combine
        # already collapsed the head keys)
        pt = pa.concat_tables(
            [t for t in ray.get(partial.to_arrow_refs()) if t is not None])
        table = pt.group_by(["stream", "ctx", "pattern"]).aggregate(
            [("freq", "sum")]).rename_columns(["stream", "ctx", "pattern", "freq"])
        tot = pt.group_by("stream").aggregate([("total_ints", "sum")])
        totals = {s.as_py(): int(v.as_py()) for s, v in
                  zip(tot.column("stream"), tot.column("total_ints_sum"))}
    else:
        agg = partial.groupby(["stream", "ctx", "pattern"]).aggregate(
            Sum("freq", alias_name="freq"))
        totals = {r["stream"]: int(r["total"]) for r in
                  partial.groupby("stream").aggregate(
                      Sum("total_ints", alias_name="total")).take_all()}
        table = pa.concat_tables(
            [t for t in ray.get(agg.to_arrow_refs()) if t is not None])
    out = []
    for stream, path in (("docs", docs_path), ("freqs", freqs_path)):
        mask = pa.compute.equal(table.column("stream"), stream)
        t = table.filter(mask).drop_columns(["stream"])
        t = t.append_column("total_ints_global",
                            pa.array([totals.get(stream, 0)] * len(t), pa.uint64()))
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        out.append(t)
    return out[0], out[1]


def _dicts_from_stats(stats_docs: pa.Table, stats_freqs: pa.Table,
                      kind: str, cfg: DintConfig) -> BuiltDicts:
    def build_one(table: pa.Table):
        total = int(table.column("total_ints_global")[0].as_py()) if len(table) else 0
        ctx = table.column("ctx").to_numpy()
        pats = table.column("pattern").to_pylist()
        freqs = table.column("freq").to_numpy()
        if kind == "single_packed":
            counts = {p: int(f) for p, f in zip(pats, freqs)}
            return build_packed_single(st.select_targets(counts, total, cfg), cfg)
        maps: list[dict[bytes, int]] = [dict() for _ in range(cfg.num_selectors)]
        for c, p, f in zip(ctx, pats, freqs):
            maps[int(c)][p] = int(f)
        return build_packed_multi(st.select_targets_multi(maps, total, cfg), cfg)

    return BuiltDicts(kind=kind, docs_dict=build_one(stats_docs),
                      freqs_dict=build_one(stats_freqs))


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


def build_index_ray(pages_path: str, out_dir: str, kind: str = "single_packed",
                    cfg: DintConfig = DintConfig(),
                    bcfg: BuildConfig = BuildConfig(),
                    num_shards: int = 8, from_html: bool = False,
                    text_col: str = "text", id_col: str = "doc_id") -> dict:
    """Full distributed build; resumable; returns the manifest dict."""
    import ray
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    t_start = time.time()
    manifest_path = os.path.join(out_dir, "manifest.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            return json.load(f)

    # num_docs from parquet footers: no Ray pass just to count rows
    num_docs = pq.read_metadata(pages_path).num_rows if os.path.isfile(pages_path) \
        else rd.read_parquet(pages_path).count()
    pages = rd.read_parquet(pages_path, columns=[id_col, "html" if from_html else text_col])
    stage_secs: dict[str, float] = {}

    def _tick(name: str, t0: float) -> float:
        now = time.time()
        stage_secs[name] = round(now - t0, 3)
        return now

    t = time.time()
    # --- stage 1: tokenize -> posting rows (checkpointed parquet) ---
    rows_dir = os.path.join(out_dir, "postings_rows")
    if not _done(rows_dir):
        os.makedirs(rows_dir, exist_ok=True)
        tokenize_rows(pages, bcfg, from_html=from_html).write_parquet(rows_dir)
        _mark_done(rows_dir)
    rows_ds = rd.read_parquet(rows_dir)
    t = _tick("tokenize", t)

    # --- stage 2: vocabulary ---
    vocab_path = os.path.join(out_dir, "vocab.parquet")
    if os.path.exists(vocab_path):
        vocab = Vocabulary(terms=pq.read_table(vocab_path).to_pandas())
    else:
        vocab = build_vocabulary(rows_ds)
        tmp = vocab_path + ".tmp"
        pq.write_table(pa.Table.from_pandas(vocab.terms, preserve_index=False), tmp)
        os.replace(tmp, vocab_path)
    t = _tick("vocabulary", t)

    # --- stage 3: posting lists (salted groupby) ---
    lists_dir = os.path.join(out_dir, "postings")
    if not _done(lists_dir):
        os.makedirs(lists_dir, exist_ok=True)
        build_posting_lists(rows_ds, vocab, bcfg).write_parquet(lists_dir)
        _mark_done(lists_dir)
    lists_ds = rd.read_parquet(lists_dir)
    t = _tick("posting_lists", t)

    # --- stage 4: doc sizes ---
    sizes_path = os.path.join(out_dir, "sizes.parquet")
    if not os.path.exists(sizes_path):
        sz = doc_sizes(rows_ds).to_pandas()
        tmp = sizes_path + ".tmp"
        pq.write_table(pa.Table.from_pandas(sz, preserve_index=False), tmp)
        os.replace(tmp, sizes_path)
    sz = pq.read_table(sizes_path)
    sizes = np.zeros(num_docs, dtype=np.uint32)
    sizes[sz.column("doc_id").to_numpy().astype(np.int64)] = sz.column("len").to_numpy()
    t = _tick("doc_sizes", t)

    # --- stage 5: gap-pattern stats (the mining shuffle, both streams) ---
    stats_docs, stats_freqs = mine_stats_ray(
        lists_ds, kind,
        os.path.join(out_dir, "stats_docs.parquet"),
        os.path.join(out_dir, "stats_freqs.parquet"))
    t = _tick("pattern_stats", t)

    # --- stage 6: dictionaries (driver; stats are tiny) ---
    dict_path = os.path.join(out_dir, f"dicts_{kind}.npz")
    if os.path.exists(dict_path + ".docs.npz"):
        docs_dict = load_dict(dict_path + ".docs.npz")
        freqs_dict = load_dict(dict_path + ".freqs.npz")
        dicts = BuiltDicts(kind=kind, docs_dict=docs_dict, freqs_dict=freqs_dict)
    else:
        dicts = _dicts_from_stats(stats_docs, stats_freqs, kind, cfg)
        saver = save_single if kind == "single_packed" else save_multi
        saver(dict_path + ".docs.npz", dicts.docs_dict)
        saver(dict_path + ".freqs.npz", dicts.freqs_dict)
    t = _tick("dictionaries", t)

    # --- stage 7: encode + shard write ---
    avg = float(np.asarray(sizes, dtype=np.float64).sum() / num_docs)
    norm_lens = (sizes.astype(np.float32) / np.float32(avg)).astype(np.float32)
    dicts_ref = ray.put(dicts)
    norms_ref = ray.put(norm_lens)
    encoded = lists_ds.map_batches(
        EncodeLists,
        fn_constructor_kwargs={"dicts_ref": dicts_ref, "norm_lens_ref": norms_ref},
        batch_format="pyarrow",
        batch_size=bcfg.encode_batch_size,
        concurrency=(1, bcfg.encode_concurrency),
        num_cpus=1,
    )

    def add_shard(batch: pa.Table) -> pa.Table:
        shard = (batch.column("term_id").to_numpy() % num_shards).astype(np.uint32)
        return batch.append_column("shard", pa.array(shard, pa.uint32()))

    def write_one_shard(group: pa.Table) -> pa.Table:
        sid = int(group.column("shard")[0].as_py())
        rows = list(zip(
            group.column("term_id").to_numpy().tolist(),
            group.column("df").to_numpy().tolist(),
            group.column("max_weight").to_numpy().tolist(),
            group.column("payload").to_pylist(),
        ))
        lineage = write_shard(os.path.join(out_dir, f"shard-{sid}.parquet"), rows)
        lineage["shard_id"] = sid
        lineage["input"] = os.path.basename(pages_path)
        return pa.table({"lineage": pa.array([json.dumps(lineage)], pa.string())})

    lineage_rows = (
        encoded.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(write_one_shard, batch_format="pyarrow")
        .take_all()
    )
    shards = sorted((json.loads(r["lineage"]) for r in lineage_rows),
                    key=lambda s: s["shard_id"])
    _tick("encode_and_shards", t)

    write_manifest(
        out_dir,
        num_docs=num_docs,
        num_terms=vocab.size,
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
    from dint_ray.index.shards import load_shards
    from dint_ray.scoring import WandData

    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    kind = manifest["dict_kind"]
    dict_path = os.path.join(out_dir, f"dicts_{kind}.npz")
    docs_dict = load_dict(dict_path + ".docs.npz")
    freqs_dict = load_dict(dict_path + ".freqs.npz")
    dicts = BuiltDicts(kind=kind, docs_dict=docs_dict, freqs_dict=freqs_dict)
    docs_codec, freqs_codec = dicts.codecs()
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
