#!/usr/bin/env python
"""BM25 query serving entry point (the reference's `queries` harness,
/root/reference/src/queries.cpp:118-158, re-expressed over a scorer
actor pool).

    python scripts/serve_queries.py --index /tmp/idx --queries q.txt \
        --algo wand --k 10 --runs 3

Query file format: one query per line, whitespace-separated integer
term ids (/root/reference/include/ds2i/queries.hpp:15-27).  Run 0 is
the untimed warmup pass; per-run wall time and queries/sec are printed
as one JSON line (avg plus per-run seconds).
"""

from __future__ import annotations

import argparse
import json
import sys

import os as _os

# runnable standalone (not just via ray job submit --working-dir):
# the package lives one directory above this script
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--algo", default="wand")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--concurrency", type=int, default=0)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--out", help="optional parquet path for the results")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        import os as _os2

        repo_root = _os2.path.dirname(
            _os2.path.dirname(_os2.path.abspath(__file__)))
        pp = repo_root + _os2.pathsep + _os2.environ.get("PYTHONPATH", "")
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True,
                 runtime_env={"env_vars": {"PYTHONPATH": pp}})

    from dint_ray.pipelines.serve import queries_to_dataset, run_queries_ray

    with open(args.queries) as f:
        qlog = [[int(x) for x in line.split()] for line in f if line.strip()]
    qds = queries_to_dataset(qlog)
    conc = args.concurrency or int(ray.cluster_resources().get("CPU", 8))

    # warmup (pass 0 untimed, queries.cpp:104-111)
    run_queries_ray(qds.limit(min(64, len(qlog))), args.index, algo=args.algo,
                    k=args.k, concurrency=conc).count()
    per_run = []
    res = None
    for _ in range(args.runs):
        t0 = time.time()
        res = run_queries_ray(qds, args.index, algo=args.algo, k=args.k,
                              concurrency=conc, batch_size=args.batch_size)
        if args.out:
            res.write_parquet(args.out)
        else:
            res.count()
        per_run.append(round(time.time() - t0, 3))
    avg = sum(per_run) / len(per_run)
    print(json.dumps({
        "algo": args.algo, "k": args.k, "num_queries": len(qlog),
        "runs_sec": per_run, "avg_sec": round(avg, 3),
        "queries_per_sec": round(len(qlog) / avg, 1),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
