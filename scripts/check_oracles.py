"""Driver-protocol correctness replica.

Runs every ``__ray_entry__.queries()`` entry against its
``oracle_sql()`` DuckDB twin on the same parquet tables and records
per-entry row-count / schema / value-hash matches plus wall time — the
same contract the round driver applies at sf0.01.  Round 3's driver
file came back empty despite the code passing, so this script is the
committed evidence path: run it at round start and end, commit the
JSON (memory: /tmp is wiped between sessions).

Usage:
    python scripts/check_oracles.py [--sf /root/testdata/sf0.01] \
        [--out /root/repo/bench_runs/check_oracles.json] [--only name,...]
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _to_arrow(result):
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pa.Table):
        return result
    if isinstance(result, pd.DataFrame):
        return pa.Table.from_pandas(result, preserve_index=False)
    # ray.data.Dataset
    import ray

    refs = result.to_arrow_refs()
    tabs = [t for t in ray.get(refs) if t is not None and t.num_rows > 0]
    if not tabs:
        # empty result: still need the schema
        sch = result.schema()
        return pa.table({n: pa.array([], t)
                         for n, t in zip(sch.names, sch.types)})
    return pa.concat_tables(tabs, promote_options="default")


def _canon_hash(table) -> tuple[str, int, list[str]]:
    """(value hash, rows, sorted column names).  Columns sorted by name,
    rows sorted by all columns, floats at 12 significant digits —
    mirrors the driver's sort-columns-then-hash compare."""
    import numpy as np
    import pyarrow as pa

    cols = sorted(table.column_names)
    df = table.select(cols).to_pandas()
    if len(df):
        df = df.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    h = hashlib.sha1()
    for c in cols:
        v = df[c]
        if v.dtype.kind == "f":
            vals = ["%.12g" % x if x == x else "nan" for x in v.to_numpy()]
        elif v.dtype == object:
            vals = [repr(x) for x in v]
        else:
            vals = [str(x) for x in v.to_numpy()]
        h.update(c.encode())
        h.update("\x1f".join(vals).encode())
    return h.hexdigest()[:16], len(df), cols


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None,
                    help="comma-separated entry names")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get(
            "RAY_GRAFT_CPUS", "32")), include_dashboard=False,
            ignore_reinit_error=True)

    import duckdb

    import __ray_entry__ as mod

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = mod.queries()
    oracles = mod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    report: dict[str, dict] = {}
    t_all = time.time()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        row: dict = {}
        t0 = time.time()
        try:
            ray_tab = _to_arrow(fn(args.sf))
            rh, rrows, rcols = _canon_hash(ray_tab)
            row.update(rows_ray=rrows, cols_ray=rcols, hash_ray=rh)
            sql = oracles.get(name)
            if sql is None:
                row["status"] = "no_oracle"
            else:
                sql_tab = con.execute(sql).arrow()
                oh, orows, ocols = _canon_hash(sql_tab)
                row.update(rows_sql=orows, cols_sql=ocols, hash_sql=oh)
                row["match_rows"] = rrows == orows
                row["match_schema"] = rcols == ocols
                row["match_hash"] = rh == oh
                row["status"] = ("pass" if rrows == orows and rcols == ocols
                                 and rh == oh else "FAIL")
        except Exception:
            row["status"] = "ERROR"
            row["error"] = traceback.format_exc(limit=8)
        row["secs"] = round(time.time() - t0, 2)
        report[name] = row
        print(f"{name:45s} {row['status']:10s} {row['secs']:7.2f}s",
              flush=True)

    statuses = [r["status"] for r in report.values()]
    summary = {
        "sf": args.sf,
        "total": len(report),
        "pass": statuses.count("pass"),
        "no_oracle": statuses.count("no_oracle"),
        "fail": statuses.count("FAIL"),
        "error": statuses.count("ERROR"),
        "wall_sec": round(time.time() - t_all, 1),
    }
    out = {"summary": summary, "entries": report}
    print(json.dumps(summary))
    if args.out:
        with open(args.out + ".tmp", "w") as f:
            json.dump(out, f, indent=1)
        os.replace(args.out + ".tmp", args.out)
        print(f"wrote {args.out}")
    return 0 if summary["fail"] == 0 and summary["error"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
