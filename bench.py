#!/usr/bin/env python
"""Headline benchmark: DINT index build + BM25 serving + training-data ops.

    python bench.py             # one JSON line over $GRAFT_SF_DIR
    python bench.py --scaling   # same job at 8 and 32 CPUs in fresh
                                # processes -> throughputs + efficiency

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32).

Metrics mirror the reference harness (/root/reference/src/queries.cpp:13-61,
src/create_freq_index.cpp:61-98): build docs/sec, query throughput
(queries/sec, float32 WAND top-10), plus per-pipeline wall seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
NUM_QUERIES = 1000
K = 10


def _fresh_dir(tag: str) -> str:
    d = f"/tmp/dint_ray_bench/{tag}"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import numpy as np
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)

    import ray.data as rd

    from dint_ray.fixtures import generate_queries
    from dint_ray.pipelines.build import build_index_ray
    from dint_ray.pipelines.serve import queries_to_dataset, run_queries_ray

    times: dict[str, float] = {}
    extra: dict[str, float] = {}
    docs_path = os.path.join(sf_dir, "documents.parquet")

    import pyarrow.parquet as pq

    num_docs = pq.read_metadata(docs_path).num_rows

    # --- 1. index build (fresh, uncached) --------------------------------
    out_dir = _fresh_dir(f"build_{num_cpus}")
    t0 = time.time()
    manifest = build_index_ray(docs_path, out_dir, kind="single_packed",
                               num_shards=max(8, num_cpus))
    times["index_build"] = time.time() - t0
    extra["build_docs_per_sec"] = round(num_docs / times["index_build"], 1)
    extra["num_docs"] = num_docs
    extra["num_postings"] = int(manifest.get("num_terms", 0))

    # --- 2. BM25 serving -------------------------------------------------
    # Headline: vectorized exact scorer (rank-identical to WAND /
    # MaxScore / exhaustive ranked-OR — asserted in tests); the faithful
    # document-at-a-time WAND and MaxScore are timed as comparison
    # points (on this 31-term dense corpus term bounds cannot prune, so
    # they pay pointer-chasing cost for no skipped postings).
    qlog = generate_queries(NUM_QUERIES, manifest["num_terms"])
    qds = queries_to_dataset(qlog)
    for algo, tag in (("ranked_or_fast", "bm25_serve"),
                      ("wand", "bm25_wand_serve"),
                      ("maxscore", "bm25_maxscore_serve")):
        t0 = time.time()
        res = run_queries_ray(qds, out_dir, algo=algo, k=K,
                              concurrency=num_cpus, batch_size=32)
        nrows = res.count()
        times[tag] = time.time() - t0
        assert nrows > 0
    extra["queries_per_sec"] = round(NUM_QUERIES / times["bm25_serve"], 1)
    extra["wand_queries_per_sec"] = round(
        NUM_QUERIES / times["bm25_wand_serve"], 1)

    # --- 4. training-data ops --------------------------------------------
    def docs_ds():
        return rd.read_parquet(docs_path, columns=["doc_id", "text"])

    from dint_ray.ops.dedup import exact_dedup_ds, minhash_candidates_ds
    from dint_ray.ops.simsearch import knn_cosine_ds
    from dint_ray.ops.textstats import text_stats_ds

    t0 = time.time()
    text_stats_ds(docs_ds(), concurrency=num_cpus).count()
    times["text_stats"] = time.time() - t0

    t0 = time.time()
    exact_dedup_ds(docs_ds()).count()
    times["exact_dedup"] = time.time() - t0

    t0 = time.time()
    minhash_candidates_ds(docs_ds(), concurrency=num_cpus).count()
    times["minhash_lsh"] = time.time() - t0

    emb = rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    t0 = time.time()
    knn_cosine_ds(emb, list(range(10)), k=5, concurrency=num_cpus).count()
    times["knn_cosine"] = time.time() - t0

    total = round(sum(times.values()), 3)
    return {
        "metric": "dint_ray headline pipelines wall time",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in times.items()},
        "sf": sf_dir,
        "num_cpus": num_cpus,
        **{k: v for k, v in extra.items()},
    }


def run_scaling() -> dict:
    """Same job at two parallelism levels in fresh processes (the
    sandbox stand-in for N- vs 4N-node clusters, BASELINE.md)."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=SF_DIR)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner"],
            env=env, capture_output=True, text=True, timeout=1800)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    r8, r32 = results[8], results[32]

    def eff(key):
        thr8 = r8[key]
        thr32 = r32[key]
        return round((thr32 / thr8) / (32 / 8), 3)

    report = {
        "metric": "scaling efficiency 8->32 cpus (throughput ratio / cpu ratio)",
        "value": eff("build_docs_per_sec"),
        "unit": "efficiency",
        "sf": SF_DIR,
        "build_docs_per_sec": {"8": r8["build_docs_per_sec"],
                               "32": r32["build_docs_per_sec"]},
        "queries_per_sec": {"8": r8["queries_per_sec"],
                            "32": r32["queries_per_sec"]},
        "build_efficiency": eff("build_docs_per_sec"),
        "serve_efficiency": eff("queries_per_sec"),
        "runs": {"8": r8, "32": r32},
    }
    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--inner", action="store_true")
    args = ap.parse_args()

    if args.scaling:
        print(json.dumps(run_scaling()))
        return

    import ray

    result = run_bench(SF_DIR, NUM_CPUS)
    print(json.dumps(result))
    ray.shutdown()


if __name__ == "__main__":
    main()
