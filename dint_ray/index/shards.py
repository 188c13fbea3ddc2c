"""In-memory index over encoded posting-list payloads + shard storage.

The reference freezes one flat memory image and mmaps it
(/root/reference/include/dint/dict_freq_index.hpp:96-100,174-181); our
equivalent is hash-partitioned Parquet shards

    shard-{i}.parquet : term_id:uint32, df:uint32, max_weight:float32,
                        payload:binary       (in-shard sorted by term_id)

plus a JSON manifest (num_docs, avg doc length, dictionary artifact,
per-shard lineage: rows, bytes, wall time).  Query actors load their
shard set once per worker (ST4 in SURVEY.md §2.3).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from dint_ray.index.layout import DocumentEnumerator, PostingListView


def _block_bounds_of(docs: np.ndarray, dtw: np.ndarray, block: int = 256):
    """Per-block (last docID, max weight) arrays for a posting list."""
    n = len(docs)
    nblocks = (n + block - 1) // block
    starts = np.arange(nblocks) * block
    last = docs[np.minimum(starts + block - 1, n - 1)].astype(np.int64)
    bmax = np.maximum.reduceat(dtw, starts) if n else dtw[:0]
    return last, bmax


class InvertedIndex:
    """term_id -> posting payload bytes; decode on demand with caching."""

    def __init__(self, num_docs: int, payloads: dict[int, bytes],
                 docs_codec, freqs_codec) -> None:
        self.num_docs = num_docs
        self.payloads = payloads
        self.docs_codec = docs_codec
        self.freqs_codec = freqs_codec
        self._views: dict[int, PostingListView] = {}
        self._decoded: dict[int, tuple] = {}
        self._dtw: dict[tuple, object] = {}

    def __contains__(self, term_id: int) -> bool:
        return term_id in self.payloads

    def view(self, term_id: int) -> PostingListView:
        v = self._views.get(term_id)
        if v is None:
            v = PostingListView(self.payloads[term_id], self.docs_codec, self.freqs_codec)
            self._views[term_id] = v
        return v

    def enumerator(self, term_id: int):
        v = self.view(term_id)
        if not hasattr(v, "blocks"):
            # sequence-coded list (no block structure): cursor over the
            # cached decoded arrays
            from dint_ray.pipelines.serve import _ArrayEnumerator

            docs, freqs = self.cached_decode(term_id)
            return _ArrayEnumerator(docs, freqs, self.num_docs)
        return DocumentEnumerator(v, self.num_docs)

    def size(self, term_id: int) -> int:
        return self.view(term_id).n

    def decode(self, term_id: int):
        return self.view(term_id).decode_all()

    def cached_decode(self, term_id: int):
        """Decode-once cache: the serving-actor equivalent of the
        reference's page-cache warmup (queries.cpp:74-83).  Bounded by
        the actor's shard set, which is hash-partitioned at scale."""
        r = self._decoded.get(term_id)
        if r is None:
            r = self.view(term_id).decode_all()
            self._decoded[term_id] = r
        return r

    def docs_list(self, term_id: int):
        """Decoded docIDs as a Python int list (cached); the cheap form
        for document-at-a-time pointer loops."""
        r = self._decoded.get((term_id, "list"))
        if r is None:
            r = self.cached_decode(term_id)[0].tolist()
            self._decoded[(term_id, "list")] = r
        return r

    def doc_term_weights(self, term_id: int, norms, dtype):
        """Per-posting BM25 doc-term weights, cached per (term, dtype);
        query-independent so shared across all queries on this actor."""
        key = (term_id, dtype)
        w = self._dtw.get(key)
        if w is None:
            from dint_ray.scoring import doc_term_weight

            docs, freqs = self.cached_decode(term_id)
            w = doc_term_weight(freqs, norms[docs], dtype)
            self._dtw[key] = w
        return w

    def block_bounds(self, term_id: int, norms, dtype):
        """(last_doc, max_dtw) per 256-posting block — the block-max
        metadata for block-max WAND.  The posting layout already stores
        per-block max docIDs (dict_posting_list.hpp:42-53); the score
        maxima are derived from the cached weights, query-independent."""
        key = (term_id, dtype, "bm")
        r = self._dtw.get(key)
        if r is None:
            r = _block_bounds_of(self.cached_decode(term_id)[0],
                                 self.doc_term_weights(term_id, norms, dtype))
            self._dtw[key] = r
        return r


def shard_files(index_dir: str) -> list[str]:
    """Every shard parquet file of a built index — supports both the
    flat legacy layout (shard-N.parquet) and the partitioned streaming
    layout (shards/shard=N/*.parquet)."""
    import glob

    fs = sorted(glob.glob(os.path.join(index_dir, "shard-*.parquet")))
    fs += sorted(glob.glob(os.path.join(index_dir, "shards", "shard=*",
                                        "*.parquet")))
    return fs


def write_shard(path: str, rows: list[tuple[int, int, float, bytes]]) -> dict:
    """rows: (term_id, df, max_weight, payload), any order; written
    sorted by term_id, atomically (temp + rename)."""
    t0 = time.time()
    rows = sorted(rows, key=lambda r: r[0])
    table = pa.table({
        "term_id": pa.array([r[0] for r in rows], pa.uint32()),
        "df": pa.array([r[1] for r in rows], pa.uint32()),
        "max_weight": pa.array([r[2] for r in rows], pa.float32()),
        "payload": pa.array([r[3] for r in rows], pa.binary()),
    })
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return {
        "path": os.path.basename(path),
        "rows": len(rows),
        "bytes": int(table.nbytes),
        "wall_sec": round(time.time() - t0, 4),
    }


def merge_fragment_payloads(payloads: list[bytes], docs_codec,
                            freqs_codec) -> bytes:
    """Merge several payload fragments of ONE posting list into one.

    Duplicate rows for a term arise when the streaming executor splits
    a hash partition's output into multiple blocks: the per-block list
    kernel (postings._merge_rows_block / partitioned._segment_rows_block)
    then emits one row per block for a term straddling the split.
    Fragments carry disjoint doc sets (each posting row exists exactly
    once upstream), so merge = decode, concat, sort by docID, re-encode."""
    parts = [PostingListView(p, docs_codec, freqs_codec).decode_all()
             for p in payloads]
    docs = np.concatenate([d for d, _ in parts])
    freqs = np.concatenate([f for _, f in parts])
    order = np.argsort(docs, kind="stable")
    from dint_ray.index.layout import write_posting_list

    return write_posting_list(docs[order].astype(np.uint32),
                              freqs[order].astype(np.uint32),
                              docs_codec, freqs_codec)


def load_merged_rows(tables, docs_codec, freqs_codec
                     ) -> dict[int, tuple[float, bytes]]:
    """term_id -> (max_weight, payload) over parquet shard tables,
    merging duplicate term rows.  Duplicates are executor-split
    fragments (one row per block for a term straddling a partition
    split); overwriting them would silently drop postings, so the
    fragments are decoded/merged into one payload — the ONE shared
    implementation for every shard/bucket/blob loader.  Tables without
    a max_weight column get weight 0.0 (ignored by those callers)."""
    rows: dict[int, tuple[float, bytes]] = {}
    dup: dict[int, list[bytes]] = {}
    for t in tables:
        tids = t.column("term_id").to_numpy()
        mws = (t.column("max_weight").to_numpy()
               if "max_weight" in t.column_names
               else np.zeros(len(tids), np.float32))
        pls = t.column("payload").to_pylist()
        for tid, mw, pl in zip(tids, mws, pls):
            tid = int(tid)
            prev = rows.get(tid)
            if prev is None:
                rows[tid] = (float(mw), pl)
            else:
                dup.setdefault(tid, [prev[1]]).append(pl)
                rows[tid] = (max(prev[0], float(mw)), prev[1])
    for tid, pls in dup.items():
        rows[tid] = (rows[tid][0],
                     merge_fragment_payloads(pls, docs_codec, freqs_codec))
    return rows


def load_shards(index_dir: str, docs_codec, freqs_codec,
                shard_ids: list[int] | None = None):
    """Load (a subset of) shards -> (InvertedIndex, max_weight dict,
    manifest).  Duplicate term rows (block-split fragments) are merged,
    never overwritten — overwriting silently drops postings."""
    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)

    def _tables():
        for i, shard in enumerate(manifest["shards"]):
            if shard_ids is not None and i not in shard_ids:
                continue
            p = os.path.join(index_dir, shard["path"])
            if os.path.isdir(p):
                import glob as _g

                files = sorted(_g.glob(os.path.join(p, "*.parquet")))
                if not files:
                    continue
                yield pq.read_table(files)
            else:
                yield pq.read_table(p)

    rows = load_merged_rows(_tables(), docs_codec, freqs_codec)
    payloads = {tid: pl for tid, (_, pl) in rows.items()}
    max_w = {tid: mw for tid, (mw, _) in rows.items()}
    idx = InvertedIndex(manifest["num_docs"], payloads, docs_codec, freqs_codec)
    return idx, max_w, manifest


def write_manifest(index_dir: str, *, num_docs: int, num_terms: int,
                   avg_doc_len: float, dict_kind: str, shards: list[dict],
                   extra: dict | None = None) -> None:
    m = {
        "num_docs": num_docs,
        "num_terms": num_terms,
        "avg_doc_len": avg_doc_len,
        "dict_kind": dict_kind,
        "shards": shards,
    }
    if extra:
        m.update(extra)
    tmp = os.path.join(index_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1)
    os.replace(tmp, os.path.join(index_dir, "manifest.json"))
