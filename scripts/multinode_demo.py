#!/usr/bin/env python
"""Multi-node demonstration of the exchange locality path.

The direct keyed exchanges (``postings._direct_merge_exchange`` and the
stats exchange in ``pipelines/build.py``) auto-switch to a map-side
per-partition pre-split when the Ray cluster has more than one alive
node (``postings._exchange_map_split``), so each merge task fetches ONLY
its own partition's bytes — 1x network instead of width x.  This
sandbox is one host, so before this script the gate had only ever
flipped via the ``DINT_EXCHANGE_MAP_SPLIT`` test override.  Here we
stand up a REAL multi-node Ray cluster on localhost
(``ray.cluster_utils.Cluster``: one raylet + object store + object
manager per node, inter-node object transfer through the object
managers) and demonstrate end to end:

1. the gate flips WITHOUT the env override (4 alive nodes);
2. the full index build, MinHash near-dup pairs, and exact dedup are
   digest-identical on the 4-node cluster vs a single-node session of
   the same total CPU count;
3. measured exchange bytes on the same 4-node cluster: total merge-task
   input bytes with map-split vs filter-all — the "1x vs width x"
   locality claim as numbers (DINT_EXCHANGE_TRACE=1 byte accounting).

Each phase runs in a fresh subprocess (one Ray session per phase):

    python scripts/multinode_demo.py --out bench_runs/multinode_demo.json
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

NODES = 4
CPUS_PER_NODE = 6
OBJ_STORE_PER_NODE = 4 * 1024**3
DEMO_DIR = "/tmp/dint_ray_multinode"
DEDUP_DOCS = 250_000


def _dedup_demo_fixture() -> str:
    """Small deterministic dedup corpus (8% exact + 4% near dups), 8
    shards — digest parity is the point here, not throughput, so it is
    an order of magnitude smaller than bench.py's 2M-doc corpus."""
    import pyarrow.parquet as pq

    from dint_ray.fixtures import generate_dedup_pages

    path = os.path.join(DEMO_DIR, f"pages_dedup_{DEDUP_DOCS}")
    done = os.path.join(path, "_SUCCESS")
    if not os.path.exists(done):
        os.makedirs(path, exist_ok=True)
        t = generate_dedup_pages(DEDUP_DOCS, vocab_size=30_000, seed=100)
        step = (t.num_rows + 7) // 8
        for i in range(8):
            pq.write_table(t.slice(i * step, step),
                           os.path.join(path, f"part-{i:04d}.parquet"),
                           row_group_size=4096)
        with open(done, "w") as f:
            f.write("ok")
    return path


def _rows_digest(ds, cols) -> tuple[str, int]:
    """Order-independent digest over the given columns (small results:
    dedup pair lists / kept-id lists, never a corpus)."""
    rows = ds.select_columns(list(cols)).take_all()
    keys = sorted(tuple(int(r[c]) for c in cols) for r in rows)
    return (hashlib.md5(repr(keys).encode()).hexdigest(), len(keys))


def _run_pipelines(tag: str) -> dict:
    """Build + MinHash pairs + exact dedup in the CURRENT Ray session;
    returns digests and walls."""
    import ray.data as rd

    import bench
    from dint_ray.ops.dedup import exact_dedup_ds, minhash_dedup_pairs_ds
    from dint_ray.pipelines.build import build_index_ray

    pages = bench._scaling_fixture()
    out_dir = os.path.join(DEMO_DIR, f"build_{tag}")
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    manifest = build_index_ray(pages, out_dir)
    build_sec = round(time.time() - t0, 1)
    index_digest = bench._index_digest(out_dir)

    dpages = _dedup_demo_fixture()
    t0 = time.time()
    mh_digest, mh_pairs = _rows_digest(
        minhash_dedup_pairs_ds(rd.read_parquet(dpages)),
        ("doc_a", "doc_b"))
    minhash_sec = round(time.time() - t0, 1)
    t0 = time.time()
    ex_digest, ex_kept = _rows_digest(
        exact_dedup_ds(rd.read_parquet(dpages)), ("doc_id",))
    exact_sec = round(time.time() - t0, 1)
    return {
        "build_sec": build_sec,
        "build_stage_secs": manifest.get("stage_secs", {}),
        "index_digest": index_digest,
        "minhash_pairs": mh_pairs,
        "minhash_digest": mh_digest,
        "minhash_sec": minhash_sec,
        "exact_kept": ex_kept,
        "exact_digest": ex_digest,
        "exact_sec": exact_sec,
    }


def _start_cluster():
    """Head + (NODES-1) workers, each its own raylet/object store."""
    import ray
    from ray.cluster_utils import Cluster

    cluster = Cluster(
        initialize_head=True, connect=False,
        head_node_args={"num_cpus": CPUS_PER_NODE,
                        "object_store_memory": OBJ_STORE_PER_NODE})
    for _ in range(NODES - 1):
        cluster.add_node(num_cpus=CPUS_PER_NODE,
                         object_store_memory=OBJ_STORE_PER_NODE)
    ray.init(address=cluster.address, include_dashboard=False,
             runtime_env={"env_vars": {
                 k: os.environ[k] for k in
                 ("DINT_EXCHANGE_TRACE", "DINT_EXCHANGE_MAP_SPLIT")
                 if k in os.environ}})
    return cluster


def phase_single() -> dict:
    import ray

    ray.init(address="local", num_cpus=NODES * CPUS_PER_NODE,
             include_dashboard=False)
    from dint_ray.postings import _exchange_map_split, _multi_node

    res = {"phase": "single", "nodes": 1,
           "num_cpus": NODES * CPUS_PER_NODE,
           "multi_node_gate": _multi_node(),
           "map_split_gate": _exchange_map_split()}
    assert not res["map_split_gate"], "single node must use filter-all"
    res.update(_run_pipelines("single"))
    ray.shutdown()
    return res


def phase_cluster() -> dict:
    import ray

    assert "DINT_EXCHANGE_MAP_SPLIT" not in os.environ, \
        "the point is the AUTO gate - unset the override"
    cluster = _start_cluster()
    from dint_ray.postings import _exchange_map_split, _multi_node

    alive = [n for n in ray.nodes() if n.get("Alive")]
    res = {"phase": "cluster", "nodes": len(alive),
           "cpus_per_node": CPUS_PER_NODE,
           "node_ids": sorted(n["NodeID"][:8] for n in alive),
           "multi_node_gate": _multi_node(),
           "map_split_gate": _exchange_map_split()}
    assert len(alive) == NODES, f"expected {NODES} nodes, got {len(alive)}"
    assert res["multi_node_gate"] and res["map_split_gate"], \
        "map-split gate must auto-flip on a multi-node cluster"
    res.update(_run_pipelines("cluster"))
    ray.shutdown()
    cluster.shutdown()
    return res


def phase_bytes() -> dict:
    """Same 4-node cluster, same build, both exchange modes, byte
    accounting via the DINT_EXCHANGE_TRACE hook."""
    import ray

    os.environ["DINT_EXCHANGE_TRACE"] = "1"
    cluster = _start_cluster()

    @ray.remote(num_cpus=0)
    class TraceActor:
        def __init__(self):
            self.rows = []

        def add(self, kind, node, nbytes):
            self.rows.append((kind, node, nbytes))

        def dump(self):
            return self.rows

        def reset(self):
            self.rows = []

    actor = TraceActor.options(name="dint_exchange_trace",
                               namespace="dint_trace").remote()
    ray.get(actor.dump.remote())

    import bench
    from dint_ray.pipelines.build import build_index_ray

    pages = bench._scaling_fixture()
    res: dict = {"phase": "bytes", "nodes": NODES,
                 "cpus_per_node": CPUS_PER_NODE}
    digests = {}
    for mode, env in (("map_split", "1"), ("filter_all", "0")):
        os.environ["DINT_EXCHANGE_MAP_SPLIT"] = env
        ray.get(actor.reset.remote())
        out_dir = os.path.join(DEMO_DIR, f"build_bytes_{mode}")
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        build_index_ray(pages, out_dir)
        wall = round(time.time() - t0, 1)
        time.sleep(2.0)  # drain in-flight fire-and-forget adds
        rows = ray.get(actor.dump.remote())
        digests[mode] = bench._index_digest(out_dir)
        by_kind: dict[str, int] = {}
        nodes_seen = set()
        for kind, node, nbytes in rows:
            by_kind[kind] = by_kind.get(kind, 0) + nbytes
            nodes_seen.add(node[:8])
        res[mode] = {
            "wall_sec": wall,
            "merge_in_bytes": by_kind.get("merge_in", 0),
            "split_in_bytes": by_kind.get("split_in", 0),
            "exchange_tasks": len(rows),
            "task_nodes": sorted(nodes_seen),
        }
        shutil.rmtree(out_dir, ignore_errors=True)
    res["digest_match_modes"] = digests["map_split"] == digests["filter_all"]
    mi_f = res["filter_all"]["merge_in_bytes"]
    mi_s = res["map_split"]["merge_in_bytes"]
    res["merge_in_ratio_filter_over_split"] = (
        round(mi_f / mi_s, 2) if mi_s else None)
    ray.shutdown()
    cluster.shutdown()
    os.environ.pop("DINT_EXCHANGE_TRACE", None)
    os.environ.pop("DINT_EXCHANGE_MAP_SPLIT", None)
    return res


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["single", "cluster", "bytes"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.phase:
        res = {"single": phase_single, "cluster": phase_cluster,
               "bytes": phase_bytes}[args.phase]()
        print("PHASE_JSON:" + json.dumps(res))
        return 0

    os.makedirs(DEMO_DIR, exist_ok=True)
    combined: dict = {
        "nodes": NODES, "cpus_per_node": CPUS_PER_NODE,
        "corpus_docs": int(os.environ.get("DINT_SCALING_DOCS", "500000")),
        "dedup_docs": DEDUP_DOCS}
    for phase in ("single", "cluster", "bytes"):
        print(f"=== phase {phase} ===", flush=True)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", phase],
            cwd=_REPO, capture_output=True, text=True, timeout=3600)
        line = next((ln for ln in p.stdout.splitlines()
                     if ln.startswith("PHASE_JSON:")), None)
        if p.returncode != 0 or line is None:
            sys.stderr.write(p.stdout[-4000:] + "\n" + p.stderr[-4000:])
            raise SystemExit(f"phase {phase} failed rc={p.returncode}")
        combined[phase] = json.loads(line[len("PHASE_JSON:"):])
        print(json.dumps(combined[phase], indent=1), flush=True)

    s, c = combined["single"], combined["cluster"]
    combined["index_digest_match"] = s["index_digest"] == c["index_digest"]
    combined["minhash_digest_match"] = (
        s["minhash_digest"] == c["minhash_digest"])
    combined["exact_digest_match"] = s["exact_digest"] == c["exact_digest"]
    ok = (combined["index_digest_match"] and combined["minhash_digest_match"]
          and combined["exact_digest_match"]
          and c["map_split_gate"] and not s["map_split_gate"]
          and combined["bytes"]["digest_match_modes"])
    combined["ok"] = ok
    if args.out:
        with open(args.out, "w") as f:
            json.dump(combined, f, indent=1)
        print(f"wrote {args.out}")
    print("MULTINODE_DEMO " + ("PASS" if ok else "FAIL"))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
