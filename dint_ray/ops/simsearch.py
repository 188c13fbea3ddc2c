"""Similarity search over an embedding column (list<float>).

- brute-force cosine top-k: exact baseline.  Query vectors are pulled
  by a distributed filter (only the Q query rows ever reach the
  driver), broadcast once via ray.put; each corpus batch does one
  numpy matmul and emits a per-batch partial top-k;
- LSH-bucketed ANN: random-hyperplane signatures; the CORPUS is
  hash-repartitioned by bucket and each partition scores only the
  queries whose bucket it owns — per-query candidate work shrinks
  from N to N/2^bits on average.  Recall < 1 by design; measured
  against the exact path by ``lsh_recall``.

Both finals use one vectorized lexsort-partition top-k kernel per
hash-repartitioned block (no per-group Python: the round-1
``groupby(query_id).map_groups`` called pandas once per query).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_matrix(tbl: pa.Table, id_col="vec_id", vec_col="embedding",
               dtype=np.float64):
    """(ids, (n, d) matrix) from an Arrow list column, zero-copy: the
    list values ARE a flat numeric buffer, so reshape replaces the old
    per-row to_pylist()/np.stack round-trip (this runs per batch in
    every kNN scoring task)."""
    ids = tbl.column(id_col).to_numpy().astype(np.int64)
    arr = tbl.column(vec_col).combine_chunks()
    if isinstance(arr, pa.ChunkedArray):  # older pyarrow
        arr = (arr.chunk(0) if arr.num_chunks == 1
               else pa.concat_arrays(arr.chunks))
    n = len(arr)
    if n and arr.null_count == 0:
        if pa.types.is_fixed_size_list(arr.type):
            flat = arr.flatten()
            d = arr.type.list_size
        else:
            import pyarrow.compute as pc

            lens = pc.list_value_length(arr).to_numpy()
            d = int(lens[0]) if len(lens) else 0
            flat = arr.flatten() if (lens == d).all() else None
        if flat is not None and d:
            vals = flat.to_numpy(zero_copy_only=False)
            return ids, vals.astype(dtype, copy=False).reshape(n, d)
    mat = np.stack([np.asarray(v, dtype=dtype)
                    for v in tbl.column(vec_col).to_pylist()])
    return ids, mat


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def _query_matrix(emb_ds, query_ids: list[int]):
    """(qids, normalized rows) via a distributed filter — only the
    query rows are ever collected (no whole-table driver pull)."""
    wanted = set(int(q) for q in query_ids)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        m = np.isin(ids.astype(np.int64), np.fromiter(wanted, np.int64))
        return batch.filter(pa.array(m))

    rows = emb_ds.map_batches(keep, batch_format="pyarrow").take_all()
    by_id = {int(r["vec_id"]): np.asarray(r["embedding"], np.float64)
             for r in rows}
    qm = _normalize(np.stack([by_id[int(q)] for q in query_ids]))
    return np.asarray(query_ids, dtype=np.int64), qm


def _strip_meta(batch: pa.Table) -> pa.Table:
    """Drop parquet-borne pandas schema metadata: pyarrow Schemas with
    it are unhashable (hash(schema) raises on the metadata dict), which
    makes Ray Data's schema-deduplication log a warning per block."""
    return batch.replace_schema_metadata(None)


def _empty_partial() -> pa.Table:
    return pa.table({
        "query_id": pa.array([], pa.int64()),
        "vec_id": pa.array([], pa.int64()),
        "sim": pa.array([], pa.float64()),
    })


def _final_topk_block(batch: pa.Table, *, k: int) -> pa.Table:
    """Vectorized per-block exact top-k per query: one lexsort over
    (query_id, -sim, vec_id), then a per-group rank cutoff — requires
    all rows of a query co-located (hash repartition upstream)."""
    if batch.num_rows == 0 or "query_id" not in batch.column_names:
        return pa.table({
            "query_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
        })
    q = batch.column("query_id").to_numpy().astype(np.int64)
    v = batch.column("vec_id").to_numpy().astype(np.int64)
    s = batch.column("sim").to_numpy()
    order = np.lexsort((v, -s, q))
    qs, vs = q[order], v[order]
    # rank within query: position minus the query group's start
    change = np.flatnonzero(np.diff(qs)) + 1
    starts = np.concatenate(([0], change))
    group_start = np.repeat(starts, np.diff(np.concatenate((starts,
                                                            [len(qs)]))))
    rank = np.arange(len(qs)) - group_start + 1
    keep = rank <= k
    return pa.table({
        "query_id": pa.array(qs[keep], pa.int64()),
        "rank": pa.array(rank[keep], pa.int64()),
        "vec_id": pa.array(vs[keep], pa.int64()),
    })


def _partial_topk_block(batch: pa.Table, *, k: int) -> pa.Table:
    """Per-block combiner: cut each query's candidate rows to its block-
    local top-k BEFORE the keyed repartition.  Exact (top-k of a union
    is the top-k of per-part top-ks, ties included via the same
    (sim desc, vec_id asc) order), it bounds exchange rows to k per
    (query, upstream block), and it keeps the final stage's one-block-
    per-partition assumption safe at scale: post-combine partitions are
    k x blocks x queries/nparts rows — far below the executor's block-
    split threshold that would otherwise duplicate ranks."""
    if batch.num_rows == 0 or "query_id" not in batch.column_names:
        return _empty_partial()
    q = batch.column("query_id").to_numpy().astype(np.int64)
    v = batch.column("vec_id").to_numpy().astype(np.int64)
    s = batch.column("sim").to_numpy()
    order = np.lexsort((v, -s, q))
    qs = q[order]
    change = np.flatnonzero(np.diff(qs)) + 1
    starts = np.concatenate(([0], change))
    group_start = np.repeat(starts, np.diff(np.concatenate((starts,
                                                            [len(qs)]))))
    keep = (np.arange(len(qs)) - group_start) < k
    sel = order[keep]
    return pa.table({
        "query_id": pa.array(q[sel], pa.int64()),
        "vec_id": pa.array(v[sel], pa.int64()),
        "sim": pa.array(s[sel], pa.float64()),
    })


def _finalize_topk(partial, query_ids, k: int, num_partitions: int):
    """Shared tail of every kNN variant: per-block combine, one DIRECT
    keyed exchange on query_id, then the exact per-query top-k kernel.

    The final kernel ranks 1..k per query, so it needs ALL of a query's
    partial rows in one call — the direct exchange guarantees that by
    construction (one merge task per partition filters its rows from
    every block ref), where the earlier keyed repartition leaned on the
    hash-shuffle aggregator's one-block-per-partition behavior (a
    current-Ray detail its source TODOs away); a split partition there
    would emit duplicate ranks.  Past the ref cap it falls back to a
    groupby().map_groups over the partition id (complete groups by
    Ray's contract)."""
    # each partition should own several queries, or hash gaps leave
    # empty partitions whose schemaless blocks make the executor warn
    nparts = min(num_partitions, max(1, len(query_ids) // 4))
    combined = partial.map_batches(_partial_topk_block, fn_kwargs={"k": k},
                                   batch_format="pyarrow", batch_size=None,
                                   num_cpus=1)

    def _part_of(b: pa.Table) -> np.ndarray:
        q = b.column("query_id").to_numpy().astype(np.uint64)
        return ((q * np.uint64(0x9E3779B1))
                % np.uint64(nparts)).astype(np.uint32)

    def _final(t: pa.Table) -> pa.Table:
        return _final_topk_block(t, k=k)

    from dint_ray.postings import (_direct_merge_exchange,
                                   _grouped_part_fallback)

    return _direct_merge_exchange(
        combined, nparts, _final, _part_of,
        fallback=_grouped_part_fallback(_final, _part_of))


def knn_cosine_ds(emb_ds, query_ids: list[int], k: int = 5,
                  concurrency: int = 8, num_partitions: int = 8):
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, rank, vec_id) — integer-only output so the
    DuckDB oracle hashes identically.  Self-matches are excluded.
    Tie-break: (similarity desc, vec_id asc), computed in float64 on
    both sides.
    """
    import dint_ray
    dint_ray.ensure_tuned()
    import ray

    qids, qm = _query_matrix(emb_ds, query_ids)
    qref = ray.put((qids, qm))

    class Scorer:
        """Per-batch partial top-k against the broadcast query matrix."""

        def __init__(self):
            self.qids, self.qm = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return _empty_partial()
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

    partial = (emb_ds.map_batches(_strip_meta, batch_format="pyarrow")
               .map_batches(Scorer, batch_format="pyarrow",
                            batch_size=1024,
                            concurrency=(1, concurrency), num_cpus=1))
    return _finalize_topk(partial, query_ids, k, num_partitions)


def lsh_knn_ds(emb_ds, query_ids: list[int], k: int = 5, bits: int = 4,
               seed: int = 99, concurrency: int = 8,
               num_partitions: int = 8):
    """Bucket-partitioned ANN: corpus vectors are signed into 2^bits
    hyperplane buckets and hash-repartitioned by bucket; each partition
    scores ONLY the queries whose bucket it holds.  Approximate
    (recall < 1); measured by ``lsh_recall``."""
    import dint_ray
    dint_ray.ensure_tuned()
    import ray

    qids, qm = _query_matrix(emb_ds, query_ids)
    rng = np.random.default_rng(seed)
    # dim from the query rows (no corpus materialization)
    planes = rng.standard_normal((bits, qm.shape[1]))
    qsig = (qm @ planes.T > 0).astype(np.uint8)
    qbucket = (qsig * (1 << np.arange(bits))).sum(axis=1).astype(np.int64)
    qref = ray.put((qids, qm, qbucket))
    planes_ref = ray.put(planes)

    class AddBucket:
        def __init__(self):
            self.planes = ray.get(planes_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch.append_column("bucket",
                                           pa.array([], pa.int64()))
            _, bmat = _to_matrix(batch)
            sig = (_normalize(bmat) @ self.planes.T > 0).astype(np.uint8)
            bucket = (sig * (1 << np.arange(sig.shape[1]))).sum(axis=1)
            return batch.append_column(
                "bucket", pa.array(bucket.astype(np.int64), pa.int64()))

    class BucketScorer:
        """Scores the partition's vectors against ONLY same-bucket
        queries (the partition holds complete buckets)."""

        def __init__(self):
            self.qids, self.qm, self.qbucket = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "bucket" not in batch.column_names:
                return _empty_partial()
            bucket = batch.column("bucket").to_numpy()
            present = np.unique(bucket)
            qsel = np.flatnonzero(np.isin(self.qbucket, present))
            if not len(qsel):
                return _empty_partial()
            bids, bmat = _to_matrix(batch)
            bmat = _normalize(bmat)
            out_q, out_v, out_s = [], [], []
            for qi in qsel:
                qid = int(self.qids[qi])
                m = (bucket == self.qbucket[qi]) & (bids != qid)
                if not m.any():
                    continue
                sims = bmat[m] @ self.qm[qi]
                vv = bids[m]
                out_q.extend([qid] * len(vv))
                out_v.extend(vv.tolist())
                out_s.extend(sims.tolist())
            return pa.table({
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            })

    # materialized between the two keyed repartitions (bucket, then
    # query_id): two hash-shuffle operators in one streaming plan
    # self-backpressure over aggregator CPU reservations (measured
    # 3.1x the staged wall on the MinHash dedup chain, ops/dedup.py).
    # The intermediate is per-bucket candidate scores only.
    partial = (emb_ds.map_batches(_strip_meta, batch_format="pyarrow")
               .map_batches(AddBucket, batch_format="pyarrow",
                            batch_size=1024,
                            concurrency=(1, concurrency), num_cpus=1)
               .repartition(num_partitions, keys=["bucket"], sort=False)
               .map_batches(BucketScorer, batch_format="pyarrow",
                            batch_size=None,
                            concurrency=(1, concurrency), num_cpus=1)
               .materialize())
    return _finalize_topk(partial, query_ids, k, num_partitions)


def _train_centroids(emb_ds, num_centroids: int, seed: int,
                     sample_size: int, iters: int) -> np.ndarray:
    """Deterministic sampled k-means (IVF coarse quantizer training).

    The sample is selected by a fixed multiplicative hash of vec_id (no
    RNG over row order, so the same corpus always yields the same
    centroids) and is O(sample_size x d) on the driver — a fixed-size
    artifact independent of corpus size, like FAISS's train() sample.
    Lloyd iterations run in numpy on the sample only."""
    probe = np.uint64(2654435761)

    def keep_sample(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy().astype(np.uint64)
        key = (ids * probe) & np.uint64(0xFFFFFFFF)
        m = key < np.uint64(0x7FFFFFFF)  # ~50%; thinned below if large
        return batch.filter(pa.array(m))

    rows = (emb_ds.map_batches(_strip_meta, batch_format="pyarrow")
            .map_batches(keep_sample, batch_format="pyarrow")
            .limit(max(sample_size, num_centroids * 4)).take_all())
    sample = _normalize(np.stack(
        [np.asarray(r["embedding"], np.float64) for r in rows]))
    rng = np.random.default_rng(seed)
    # k-means++-lite init: spread starts over the sample
    cent = sample[rng.choice(len(sample), size=num_centroids,
                             replace=len(sample) < num_centroids)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(num_centroids):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_knn_ds(emb_ds, query_ids: list[int], k: int = 5,
               num_centroids: int = 16, nprobe: int = 4, seed: int = 7,
               sample_size: int = 4096, iters: int = 8,
               concurrency: int = 8, num_partitions: int = 8):
    """IVF-flat ANN: sampled k-means centroids partition the corpus into
    cells; each query probes only its ``nprobe`` nearest cells.

    The scale path beside the LSH variant: candidate work per query is
    ~nprobe/num_centroids of the corpus, the corpus moves through ONE
    keyed repartition on ``cell`` (each partition holds complete cells
    and scores only the queries probing them), and the only broadcast
    is the (num_centroids x d) centroid matrix.  ``nprobe ==
    num_centroids`` probes every cell and is EXACT — asserted against
    ``knn_cosine_ds`` in tests; recall at smaller nprobe is measured by
    ``ivf_recall``."""
    import dint_ray
    dint_ray.ensure_tuned()
    import ray

    nprobe = min(nprobe, num_centroids)
    qids, qm = _query_matrix(emb_ds, query_ids)
    cent = _train_centroids(emb_ds, num_centroids, seed, sample_size, iters)
    # top-nprobe cells per query, (Q, nprobe)
    qcells = np.argsort(-(qm @ cent.T), axis=1, kind="stable")[:, :nprobe]
    qref = ray.put((qids, qm, qcells))
    cent_ref = ray.put(cent)

    class AddCell:
        def __init__(self):
            self.cent = ray.get(cent_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch.append_column("cell", pa.array([], pa.int64()))
            _, bmat = _to_matrix(batch)
            cell = np.argmax(_normalize(bmat) @ self.cent.T, axis=1)
            return batch.append_column(
                "cell", pa.array(cell.astype(np.int64), pa.int64()))

    class CellScorer:
        """Scores the partition's vectors against the queries probing
        any cell the partition holds (cells arrive complete)."""

        def __init__(self):
            self.qids, self.qm, self.qcells = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0 or "cell" not in batch.column_names:
                return _empty_partial()
            cell = batch.column("cell").to_numpy()
            present = np.unique(cell)
            probes_here = np.isin(self.qcells, present)  # (Q, nprobe)
            qsel = np.flatnonzero(probes_here.any(axis=1))
            if not len(qsel):
                return _empty_partial()
            bids, bmat = _to_matrix(batch)
            bmat = _normalize(bmat)
            out_q, out_v, out_s = [], [], []
            for qi in qsel:
                qid = int(self.qids[qi])
                m = (np.isin(cell, self.qcells[qi][probes_here[qi]])
                     & (bids != qid))
                if not m.any():
                    continue
                sims = bmat[m] @ self.qm[qi]
                vv = bids[m]
                out_q.extend([qid] * len(vv))
                out_v.extend(vv.tolist())
                out_s.extend(sims.tolist())
            return pa.table({
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "sim": pa.array(out_s, pa.float64()),
            })

    # materialized between the two keyed repartitions (cell, then
    # query_id) — same one-shuffle-per-execution staging as lsh_knn_ds
    partial = (emb_ds.map_batches(_strip_meta, batch_format="pyarrow")
               .map_batches(AddCell, batch_format="pyarrow",
                            batch_size=1024,
                            concurrency=(1, concurrency), num_cpus=1)
               .repartition(num_partitions, keys=["cell"], sort=False)
               .map_batches(CellScorer, batch_format="pyarrow",
                            batch_size=None,
                            concurrency=(1, concurrency), num_cpus=1)
               .materialize())
    return _finalize_topk(partial, query_ids, k, num_partitions)


def ivf_recall(emb_ds, query_ids: list[int], k: int = 5,
               num_centroids: int = 16, nprobe: int = 4,
               seed: int = 7) -> float:
    """Measured recall of the IVF path vs the exact scan."""
    exact = knn_cosine_ds(emb_ds, query_ids, k=k).take_all()
    approx = ivf_knn_ds(emb_ds, query_ids, k=k, num_centroids=num_centroids,
                        nprobe=nprobe, seed=seed).take_all()
    want: dict[int, set] = {}
    for r in exact:
        want.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
    hits = sum(1 for r in approx
               if int(r["vec_id"]) in want.get(int(r["query_id"]), set()))
    return hits / max(1, len(query_ids) * k)


def lsh_recall(emb_ds, query_ids: list[int], k: int = 5, bits: int = 4,
               seed: int = 99) -> float:
    """Measured recall of the LSH path vs the exact scan: |ANN top-k
    that appear in exact top-k| / (Q*k)."""
    exact = knn_cosine_ds(emb_ds, query_ids, k=k).take_all()
    approx = lsh_knn_ds(emb_ds, query_ids, k=k, bits=bits,
                        seed=seed).take_all()
    want: dict[int, set] = {}
    for r in exact:
        want.setdefault(int(r["query_id"]), set()).add(int(r["vec_id"]))
    hits = sum(1 for r in approx
               if int(r["vec_id"]) in want.get(int(r["query_id"]), set()))
    return hits / max(1, len(query_ids) * k)
