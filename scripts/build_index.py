#!/usr/bin/env python
"""Distributed index build entry point.

Single node:
    python scripts/build_index.py --pages pages.parquet --out /tmp/idx

Cluster (the production shape — the script only talks to the Dataset
API, so the same code runs on any cluster size):
    ray job submit --working-dir . -- \
        python scripts/build_index.py --pages s3://bucket/pages --out /mnt/idx

Resumable: every stage checks its checkpoint (postings_rows/, vocab,
postings/, sizes, stats, dicts, shard manifest) and skips finished
work, so a pre-empted job re-submitted with the same --out continues.
"""

from __future__ import annotations

import argparse
import json
import sys

import os as _os

# runnable standalone (not just via ray job submit --working-dir):
# the package lives one directory above this script
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="input pages parquet (file or dir)")
    ap.add_argument("--out", required=True, help="index output directory")
    ap.add_argument("--kind", default="single_packed",
                    choices=["single_packed", "multi_packed"])
    ap.add_argument("--num-shards", type=int, default=32)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--from-html", action="store_true",
                    help="extract text from the html column instead")
    ap.add_argument("--verify", action="store_true",
                    help="decode-replay the built index against the "
                         "tokenized postings (create_freq_index --check)")
    ap.add_argument("--serve-direct", type=int, default=0, metavar="P",
                    help="build the routed serve layout with P doc "
                         "buckets DIRECTLY (no whole posting list in "
                         "any task — the bounded-memory route); the "
                         "output serves via scripts/serve_queries.py")
    ap.add_argument("--export-blobs", action="store_true",
                    help="after the build, export each parquet shard "
                         "as a single mmap-able blob with an Elias-"
                         "Fano endpoint directory (the reference's "
                         "frozen-image layout, dict_freq_index.hpp:96)")
    args = ap.parse_args()

    import os

    import ray

    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS points at the cluster;
        # PYTHONPATH rides in runtime_env so workers import dint_ray
        # no matter where the script is launched from
        repo_root = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
        pp = repo_root + _os.pathsep + os.environ.get("PYTHONPATH", "")
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, ignore_reinit_error=True,
                 runtime_env={"env_vars": {"PYTHONPATH": pp}})

    from dint_ray.pipelines.build import build_index_ray

    if args.serve_direct:
        from dint_ray.pipelines.partitioned import build_serve_direct

        build_serve_direct(args.pages, args.out, kind=args.kind,
                           num_buckets=args.serve_direct,
                           from_html=args.from_html)
        with open(os.path.join(args.out, "manifest.json")) as f:
            print(json.dumps({k: v for k, v in json.load(f).items()
                              if k != "shards"}))
        return 0

    manifest = build_index_ray(
        args.pages, args.out, kind=args.kind, num_shards=args.num_shards,
        from_html=args.from_html, text_col=args.text_col, id_col=args.id_col)
    print(json.dumps({k: v for k, v in manifest.items() if k != "shards"}))

    if args.export_blobs:
        from dint_ray.index.blob import export_shards_to_blobs

        print(json.dumps({"blobs": export_shards_to_blobs(args.out)}))

    if args.verify:
        from dint_ray.pipelines.verify import verify_index_ray

        report = verify_index_ray(args.out)
        print(json.dumps(report))
        if not report["ok"]:
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
