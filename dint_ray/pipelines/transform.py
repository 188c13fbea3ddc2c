"""Profile-driven mixed-block index transform.

The reference's mixed_block index is "only creatable by transforming an
existing index" (/root/reference/include/ds2i/mixed_block.hpp:153-196
``block_transformer``): every block of every posting list is re-encoded
with the candidate codec chosen on a space/decode-time Pareto frontier,
where predicted decode time is weighted by the block's measured access
count (block_profiler) and the space/time trade-off is a single global
Lagrange multiplier.

Ray-Data shape (no shuffle anywhere — the transform is term-local):

1. driver fits the decode-time predictors once (dint/dectime.py) and
   broadcasts them via ray.put;
2. a SAMPLING pass over the shard rows computes per-block candidate
   (time, space, tag) points for up to ``sample_blocks`` blocks; the
   driver bisects the multiplier on the sample so the projected total
   space meets ``space_budget_ratio`` x the space-optimal total (at
   100 TB the sample stays driver-sized while the decision quality
   follows the block distribution — documented assumption);
3. a map_batches actor pool re-encodes every posting list with the
   chosen multiplier (per-block argmin of time*access + lam*space) and
   writes a new partitioned shards directory + manifest with
   dict_kind="block_mixed" — wire-identical to codecs/mixed.py, so
   every existing reader/serving path works on the output unchanged.

Access counts come from ``collect_block_profile`` (per-term touches,
pipelines/partitioned.py); a term's touches weight all its blocks
equally — the reference profiles individual blocks, ours profiles terms
x blocks (the block_profile oracle), which is the same signal at
per-term granularity (documented deviation).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from dint_ray.config import U32_INVALID
from dint_ray.dint import dectime
from dint_ray.index.layout import BLOCK_SIZE, PostingListView, write_posting_list
from dint_ray.index.shards import shard_files, write_manifest


class _TimeAwareMixed:
    """mixed-wire-format encoder whose per-block choice minimizes
    predicted_decode_ns * access + lam * space (mixed_block.hpp's
    space_time_point consumption)."""

    def __init__(self, predictors, lam: float, access: int) -> None:
        self.predictors = predictors
        self.lam = lam
        self.access = max(1, int(access))

    def encode(self, values: np.ndarray, sum_of_values: int = U32_INVALID) -> bytes:
        from dint_ray.codecs import mixed

        pts = dectime.compute_space_time(values, sum_of_values,
                                         self.predictors, self.access,
                                         block_size=BLOCK_SIZE)
        tag = dectime.select(pts, self.lam)
        for t, mod in mixed._candidates():
            if t == tag:
                return bytes([tag]) + mod.encode(values, sum_of_values)
        raise AssertionError(tag)

    @staticmethod
    def decode(buf, offset, sum_of_values, n):
        from dint_ray.codecs import mixed

        return mixed.decode(buf, offset, sum_of_values, n)


def _list_blocks(docs: np.ndarray, freqs: np.ndarray):
    """(gaps, sum_of_values) per docs block and (tf-1, U32_INVALID) per
    freqs block — the exact streams write_posting_list encodes."""
    n = len(docs)
    docs64 = docs.astype(np.int64, copy=False)
    prev = -1
    block_base = 0
    out = []
    for lo in range(0, n, BLOCK_SIZE):
        hi = min(lo + BLOCK_SIZE, n)
        dblk = docs64[lo:hi]
        gaps = np.empty(hi - lo, dtype=np.int64)
        gaps[0] = dblk[0] - prev - 1
        gaps[1:] = dblk[1:] - dblk[:-1] - 1
        last = int(dblk[-1])
        sov = last - block_base - (hi - lo - 1)
        out.append((gaps.astype(np.uint32), sov))
        out.append(((freqs[lo:hi].astype(np.int64) - 1).astype(np.uint32),
                    U32_INVALID))
        prev = last
        block_base = last + 1
    return out


def _fit_lambda(index_dir: str, predictors, profile: dict[int, int],
                space_budget_ratio: float, sample_blocks: int,
                docs_codec, freqs_codec) -> float:
    """Bisect the multiplier on a sample of block candidate points."""
    import ray
    import ray.data as rd

    preds_ref = ray.put(predictors)
    prof_ref = ray.put(profile or {})

    class Points:
        def __init__(self) -> None:
            self.preds = ray.get(preds_ref)
            self.prof = ray.get(prof_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            tids = batch.column("term_id").to_numpy()
            payloads = batch.column("payload").to_pylist()
            rows = []
            for tid, pl in zip(tids, payloads):
                v = PostingListView(pl, docs_codec, freqs_codec)
                docs, freqs = v.decode_all()
                access = self.prof.get(int(tid), 1)
                for vals, sov in _list_blocks(docs, freqs):
                    pts = dectime.compute_space_time(
                        vals, sov, self.preds, access,
                        block_size=BLOCK_SIZE)
                    rows.append(json.dumps(pts))
            return pa.table({"points": pa.array(rows, pa.string())})

    sampled = (rd.read_parquet(shard_files(index_dir),
                               columns=["term_id", "payload"])
               .map_batches(Points, batch_format="pyarrow",
                            batch_size=None, concurrency=(1, 8), num_cpus=1)
               .limit(sample_blocks).take_all())
    pts = [json.loads(r["points"]) for r in sampled]
    if not pts:
        return 0.0
    min_space = sum(min(s for _, s, _ in p) for p in pts)
    budget = int(space_budget_ratio * min_space)
    _, _, _, lam = dectime.select_budget(pts, budget)
    return lam


def transform_index_mixed(index_dir: str, out_dir: str,
                          space_budget_ratio: float = 1.2,
                          profile: dict[int, int] | None = None,
                          sample_blocks: int = 4096,
                          num_shards: int = 8,
                          concurrency: int = 8) -> dict:
    """Re-encode a built index as block_mixed (see module docstring).

    Returns the new manifest.  ``space_budget_ratio`` >= 1.0 is the
    allowed expansion over the space-optimal mixed encoding; larger
    ratios buy faster predicted decode.
    """
    import dint_ray
    dint_ray.ensure_tuned()
    import ray
    import ray.data as rd

    from dint_ray.index.build import load_codec_bundle

    with open(os.path.join(index_dir, "manifest.json")) as f:
        src = json.load(f)
    docs_codec, freqs_codec = load_codec_bundle(
        index_dir, src["dict_kind"]).codecs()

    predictors = dectime.fit_predictors(block_size=BLOCK_SIZE)
    lam = _fit_lambda(index_dir, predictors, profile or {},
                      space_budget_ratio, sample_blocks,
                      docs_codec, freqs_codec)

    preds_ref = ray.put(predictors)
    prof_ref = ray.put(profile or {})

    class Reencode:
        def __init__(self) -> None:
            self.preds = ray.get(preds_ref)
            self.prof = ray.get(prof_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            tids = batch.column("term_id").to_numpy()
            dfs = batch.column("df").to_numpy()
            mws = batch.column("max_weight").to_numpy()
            payloads = batch.column("payload").to_pylist()
            out = []
            for tid, pl in zip(tids, payloads):
                v = PostingListView(pl, docs_codec, freqs_codec)
                docs, freqs = v.decode_all()
                codec = _TimeAwareMixed(self.preds, lam,
                                        self.prof.get(int(tid), 1))
                out.append(write_posting_list(docs, freqs, codec, codec))
            shard = (tids % num_shards).astype(np.uint32)
            return pa.table({
                "term_id": pa.array(tids.astype(np.int64), pa.int64()),
                "df": pa.array(dfs.astype(np.int64), pa.int64()),
                "max_weight": pa.array(mws.astype(np.float32), pa.float32()),
                "payload": pa.array(out, pa.binary()),
                "shard": pa.array(shard, pa.uint32()),
            })

    os.makedirs(out_dir, exist_ok=True)
    shards_dir = os.path.join(out_dir, "shards")
    shutil.rmtree(shards_dir, ignore_errors=True)
    (rd.read_parquet(shard_files(index_dir),
                     columns=["term_id", "df", "max_weight", "payload"])
     .map_batches(Reencode, batch_format="pyarrow", batch_size=None,
                  concurrency=(1, concurrency), num_cpus=1)
     .write_parquet(shards_dir, partition_cols=["shard"]))

    shards = []
    for sid in range(num_shards):
        part = os.path.join(shards_dir, f"shard={sid}")
        files = sorted(os.listdir(part)) if os.path.isdir(part) else []
        rows = nbytes = 0
        for fn in files:
            md = pq.read_metadata(os.path.join(part, fn))
            rows += md.num_rows
            nbytes += os.path.getsize(os.path.join(part, fn))
        shards.append({"path": os.path.join("shards", f"shard={sid}"),
                       "shard_id": sid, "rows": rows, "bytes": nbytes,
                       "files": len(files), "input": index_dir})

    for aux in ("sizes.parquet", "vocab.parquet"):
        s = os.path.join(index_dir, aux)
        if os.path.exists(s):
            shutil.copyfile(s, os.path.join(out_dir, aux))
    write_manifest(out_dir, num_docs=src["num_docs"],
                   num_terms=src["num_terms"],
                   avg_doc_len=src["avg_doc_len"],
                   dict_kind="block_mixed", shards=shards,
                   extra={"transform": {"source_kind": src["dict_kind"],
                                        "lambda": lam,
                                        "space_budget_ratio":
                                            space_budget_ratio,
                                        "profiled_terms":
                                            len(profile or {})}})
    with open(os.path.join(out_dir, "manifest.json")) as f:
        return json.load(f)
