"""Distributed BM25 query serving.

Queries are a Dataset of (query_id, terms); scoring runs in an actor
pool where each actor loads the index once in __init__ (ST2-ST4 in
SURVEY.md §2.3) and scores whole query batches.

Placement note (SURVEY.md §2.6 J3): at test scale every scorer holds
all shards (index << RAM) and queries are embarrassingly parallel; at
10^12-doc scale each actor would own `term_id % P` shard sets and a
routing stage would split each query's terms to owners, merging
per-shard top-k exactly (§2.8 O1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


ALGOS = ("ranked_or", "ranked_or_fast", "ranked_and", "wand", "maxscore",
         "and", "or")


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
                    broadcast: bool = True):
    """queries Dataset -> (query_id, rank, doc_id, score) Dataset.

    With ``broadcast`` (default) the index is loaded once on the driver
    and shipped to the actor pool via ray.put — right whenever the
    per-actor shard set fits memory; at 10^12-doc scale switch it off
    and give each actor its hash-partitioned shard subset instead."""
    kwargs = {"algo": algo, "k": k}
    if broadcast:
        import ray

        from dint_ray.pipelines.build import load_built_index

        index, wand, _ = load_built_index(index_dir)
        kwargs["index_ref"] = ray.put((index, wand))
    else:
        kwargs["index_dir"] = index_dir
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
