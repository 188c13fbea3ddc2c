"""Similarity search over an embedding column (list<float>).

- brute-force cosine top-k: query matrix broadcast via ray.put, one
  numpy matmul per batch (the baseline; exact);
- LSH-bucketed variant (random-hyperplane signatures): the scale path —
  each corpus vector lands in a bucket; queries probe their own bucket
  (+ optional multi-probe), so the per-query candidate set shrinks from
  N to N/2^bits on average.  Recall < 1 by design; documented.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_matrix(tbl: pa.Table, id_col="vec_id", vec_col="embedding",
               dtype=np.float64):
    ids = tbl.column(id_col).to_numpy().astype(np.int64)
    mat = np.stack([np.asarray(v, dtype=dtype)
                    for v in tbl.column(vec_col).to_pylist()])
    return ids, mat


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def knn_cosine_ds(emb_ds, query_ids: list[int], k: int = 5,
                  concurrency: int = 8):
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, rank, vec_id) — integer-only output so the
    DuckDB oracle hashes identically.  Self-matches are excluded.
    Tie-break: (similarity desc, vec_id asc), computed in float64 on
    both sides.
    """
    import ray

    tbl = pa.concat_tables([t for t in ray.get(emb_ds.to_arrow_refs())
                            if t is not None])
    ids, mat = _to_matrix(tbl)
    pos = {int(v): i for i, v in enumerate(ids)}
    qm = _normalize(mat[[pos[q] for q in query_ids]])
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), qm))

    class Scorer:
        """Per-batch partial top-k against the broadcast query matrix."""

        def __init__(self):
            self.qids, self.qm = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids, bmat = _to_matrix(batch)
            bmat = _normalize(bmat)
            sims = self.qm @ bmat.T  # (Q, B)
            out_q, out_v, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                row = sims[qi]
                keep = bids != qid
                vv, ss = bids[keep], row[keep]
                if len(vv) > k:
                    cut = np.partition(-ss, k - 1)[k - 1]
                    sel = np.flatnonzero(-ss <= cut)
                    vv, ss = vv[sel], ss[sel]
                out_q.extend([int(qid)] * len(vv))
                out_v.extend(vv.tolist())
                out_s.extend(ss.tolist())
            return pa.table({
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            })

    def final_topk(g):
        import pandas as pd

        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame({
            "query_id": g["query_id"],
            "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            "vec_id": g["vec_id"],
        })

    partial = emb_ds.map_batches(Scorer, batch_format="pyarrow",
                                 batch_size=1024,
                                 concurrency=(1, concurrency), num_cpus=1)
    return partial.groupby("query_id").map_groups(final_topk,
                                                  batch_format="pandas")


def lsh_knn_ds(emb_ds, query_ids: list[int], k: int = 5, bits: int = 4,
               seed: int = 99, concurrency: int = 8):
    """LSH-bucketed ANN: random-hyperplane signature -> groupby(bucket)
    -> exact top-k within the query's bucket.  Approximate (recall < 1);
    rows-only checked."""
    import ray

    tbl = pa.concat_tables([t for t in ray.get(emb_ds.to_arrow_refs())
                            if t is not None])
    ids, mat = _to_matrix(tbl)
    dim = mat.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((bits, dim))
    pos = {int(v): i for i, v in enumerate(ids)}
    qm = _normalize(mat[[pos[q] for q in query_ids]])
    qsig = (qm @ planes.T > 0).astype(np.uint8)
    qbucket = (qsig * (1 << np.arange(bits))).sum(axis=1)
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), qm, qbucket, planes))

    class BucketScorer:
        def __init__(self):
            self.qids, self.qm, self.qbucket, self.planes = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids, bmat = _to_matrix(batch)
            bmat = _normalize(bmat)
            sig = (bmat @ self.planes.T > 0).astype(np.uint8)
            bucket = (sig * (1 << np.arange(sig.shape[1]))).sum(axis=1)
            out_q, out_v, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
                mask = (bucket == self.qbucket[qi]) & (bids != qid)
                if not mask.any():
                    continue
                sims = bmat[mask] @ self.qm[qi]
                vv = bids[mask]
                out_q.extend([int(qid)] * len(vv))
                out_v.extend(vv.tolist())
                out_s.extend(sims.tolist())
            return pa.table({
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            })

    def final_topk(g):
        import pandas as pd

        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        return pd.DataFrame({
            "query_id": g["query_id"],
            "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            "vec_id": g["vec_id"],
        })

    partial = emb_ds.map_batches(BucketScorer, batch_format="pyarrow",
                                 batch_size=1024,
                                 concurrency=(1, concurrency), num_cpus=1)
    return partial.groupby("query_id").map_groups(final_topk,
                                                  batch_format="pandas")
