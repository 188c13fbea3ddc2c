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


class StatsCollector:
    """Map-side combine for gap-pattern stats: one batch of posting-list
    rows -> (ctx, pattern, freq) partial-count rows (SURVEY.md D1/D2)."""

    def __init__(self, stream: str, kind: str) -> None:
        assert stream in ("docs", "freqs")
        self.stream = stream
        self.multi = kind == "multi_packed"

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.stream)
        bufs = []
        for i in range(len(col)):
            vals = np.asarray(col[i].as_py(), dtype=np.uint32)
            if self.stream == "docs":
                bufs.append(st.docs_gap_buffer(vals))
            else:
                bufs.append(st.freqs_gap_buffer(vals))
        if self.multi:
            maps, total = st.collect_multi(bufs)
        else:
            counts, total = st.collect_single(bufs)
            maps = [counts]
        pats, ctxs, freqs = [], [], []
        for ctx, m in enumerate(maps):
            pats.extend(m.keys())
            freqs.extend(m.values())
            ctxs.extend([ctx] * len(m))
        return pa.table({
            "ctx": pa.array(ctxs, pa.uint8()),
            "pattern": pa.array(pats, pa.binary()),
            "freq": pa.array(np.asarray(freqs, dtype=np.uint64), pa.uint64()),
            "total_ints": pa.array(
                [total] + [0] * (len(pats) - 1) if pats else [], pa.uint64()
            ),
        })


def mine_stats_ray(postings_ds, stream: str, kind: str, out_path: str):
    """Distributed D1/D2: per-batch combine -> groupby((ctx, pattern)).sum.

    The head keys (zero runs) are collapsed to <= 1 row per batch by the
    combine, so the shuffle sees no skew (SURVEY.md §4 skew row)."""
    import ray
    from ray.data.aggregate import Sum

    if os.path.exists(out_path):
        return pq.read_table(out_path)
    partial = postings_ds.map_batches(
        StatsCollector, fn_constructor_kwargs={"stream": stream, "kind": kind},
        batch_format="pyarrow", batch_size=256, num_cpus=1,
        concurrency=(1, 8),
    ).materialize()  # consumed twice (agg + total); partials are small
    agg = partial.groupby(["ctx", "pattern"]).aggregate(Sum("freq", alias_name="freq"))
    total = partial.sum("total_ints")
    # stats are small (<= millions of patterns) -> driver-side table
    table = pa.concat_tables([t for t in ray.get(agg.to_arrow_refs()) if t is not None])
    table = table.append_column("total_ints_global",
                                pa.array([total] * len(table), pa.uint64()))
    tmp = out_path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, out_path)
    return table


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
        tids = batch.column("term_id").to_numpy()
        docs_col = batch.column("docs")
        freqs_col = batch.column("freqs")
        payloads, dfs, maxw = [], [], []
        for i in range(len(tids)):
            docs = np.asarray(docs_col[i].as_py(), dtype=np.uint32)
            freqs = np.asarray(freqs_col[i].as_py(), dtype=np.uint32)
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

    pages = rd.read_parquet(pages_path, columns=[id_col, "html" if from_html else text_col])
    num_docs = pages.count()

    # --- stage 1: tokenize -> posting rows (checkpointed parquet) ---
    rows_dir = os.path.join(out_dir, "postings_rows")
    if not _done(rows_dir):
        os.makedirs(rows_dir, exist_ok=True)
        tokenize_rows(pages, bcfg, from_html=from_html).write_parquet(rows_dir)
        _mark_done(rows_dir)
    rows_ds = rd.read_parquet(rows_dir)

    # --- stage 2: vocabulary ---
    vocab_path = os.path.join(out_dir, "vocab.parquet")
    if os.path.exists(vocab_path):
        vocab = Vocabulary(terms=pq.read_table(vocab_path).to_pandas())
    else:
        vocab = build_vocabulary(rows_ds)
        tmp = vocab_path + ".tmp"
        pq.write_table(pa.Table.from_pandas(vocab.terms, preserve_index=False), tmp)
        os.replace(tmp, vocab_path)

    # --- stage 3: posting lists (salted groupby) ---
    lists_dir = os.path.join(out_dir, "postings")
    if not _done(lists_dir):
        os.makedirs(lists_dir, exist_ok=True)
        build_posting_lists(rows_ds, vocab, bcfg).write_parquet(lists_dir)
        _mark_done(lists_dir)
    lists_ds = rd.read_parquet(lists_dir)

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

    # --- stage 5: gap-pattern stats (the mining shuffle) ---
    stats_docs = mine_stats_ray(lists_ds, "docs", kind,
                                os.path.join(out_dir, "stats_docs.parquet"))
    stats_freqs = mine_stats_ray(lists_ds, "freqs", kind,
                                 os.path.join(out_dir, "stats_freqs.parquet"))

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
