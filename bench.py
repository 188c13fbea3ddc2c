#!/usr/bin/env python
"""Headline benchmark: DINT index build + BM25 serving + training-data ops.

    python bench.py             # one JSON line over $GRAFT_SF_DIR
    python bench.py --scaling   # same job at 6 and 24 CPUs in fresh
                                # taskset-pinned processes ->
                                # throughputs + efficiency

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
    extra["num_terms"] = int(manifest.get("num_terms", 0))

    # --- 1b. decode throughput + compressed size -------------------------
    # (the reference's vroom decode harness, vroom_env/decode.cpp:74-92,
    # and the bits/int space metric, index_build_utils.hpp:91-118)
    import glob

    import ray

    from dint_ray.pipelines.verify import _ShardFps

    from dint_ray.index.shards import shard_files as _sf

    shard_files = _sf(out_dir)
    stbl = pq.read_table(shard_files, columns=["df", "payload"])
    total_postings = int(np.sum(stbl.column("df").to_numpy()))
    payload_bytes = sum(len(p) for p in stbl.column("payload").to_pylist())
    extra["bits_per_posting_pair"] = round(
        payload_bytes * 8 / max(2 * total_postings, 1), 3)
    extra["num_postings"] = total_postings
    t0 = time.time()
    fps = rd.read_parquet(shard_files).map_batches(
        _ShardFps, fn_constructor_kwargs={"index_dir": out_dir},
        batch_format="pyarrow", batch_size=None,
        concurrency=(1, num_cpus), num_cpus=1)
    rows = fps.take_all()
    decoded = sum(r["n"] for r in rows)
    decode_ns = sum(r["decode_ns"] for r in rows)
    times["decode_all"] = time.time() - t0
    # wall includes parquet read + fingerprints + scheduling; the
    # decode-only rate mirrors the reference harness, which times the
    # decode loop alone (vroom_env/decode.cpp:74-92)
    extra["decode_mints_per_sec"] = round(
        2 * decoded / times["decode_all"] / 1e6, 2)
    extra["decode_mints_per_sec_kernel"] = round(
        2 * decoded / max(decode_ns, 1) * 1e3, 1)
    extra["decode_ns_per_int"] = round(decode_ns / max(2 * decoded, 1), 2)

    # --- 1b. dict_perf analogue (reference src/dict_perf_test.cpp:32-60:
    # avg ns per random-codeword dict.copy()).  Our decode path gathers
    # whole 16-int entries from the (size, 16) matrix, so the measured
    # unit is one vectorized entry copy; 10 runs x 1M draws.
    from dint_ray.index.build import load_codec_bundle

    bundle = load_codec_bundle(out_dir, manifest["dict_kind"])
    if bundle.docs_dict is not None:
        d = bundle.docs_dict
        pd_ = getattr(d, "dicts", [d])[0] if not hasattr(d, "entries16") \
            else d
        rng = np.random.default_rng(7)
        runs, n_draw = 10, 1_000_000
        idx = rng.integers(0, pd_.size, n_draw).astype(np.int64)
        total = 0.0
        for _ in range(runs):
            t0 = time.perf_counter()
            out = pd_.entries16[idx]
            total += time.perf_counter() - t0
            assert out.shape[1] == 16
        extra["dict_copy_ns"] = round(total / runs / n_draw * 1e9, 2)
        extra["dict_entries"] = int(pd_.size)

    # --- 2. BM25 serving -------------------------------------------------
    # Headline: vectorized exact scorer (rank-identical to WAND /
    # MaxScore / exhaustive ranked-OR — asserted in tests); the faithful
    # document-at-a-time WAND and MaxScore are timed as comparison
    # points (on this 31-term dense corpus term bounds cannot prune, so
    # they pay pointer-chasing cost for no skipped postings).
    qlog = generate_queries(NUM_QUERIES, manifest["num_terms"])
    qds = queries_to_dataset(qlog)

    def timed_serve(tag: str, algo: str, bcast: bool, passes: int = 2):
        """Best-of-N timed passes (the reference harness times 10 runs
        after warmup, queries.cpp:104-111, and reports the best for the
        same reason: on a shared host a single pass is contaminated by
        scheduler/teardown transients)."""
        best = float("inf")
        for _ in range(passes):
            t0 = time.time()
            res = run_queries_ray(qds, out_dir, algo=algo, k=K,
                                  concurrency=num_cpus, batch_size=32,
                                  broadcast=bcast)
            nrows = res.count()
            best = min(best, time.time() - t0)
            assert nrows > 0
        times[tag] = best

    # ROUTED runs first: each broadcast run spins up (and then tears
    # down) a fresh Ray Data actor pool, and a dying pool's CPU
    # reservations bleed ~2 s into whatever is timed next — so the
    # routed timed runs happen before any broadcast pool has existed.
    # untimed warmup (the reference's pass 0, queries.cpp:104-111):
    # serve-layout build + bucket-owner init
    run_queries_ray(qds.limit(32), out_dir, algo="wand", k=K,
                    concurrency=num_cpus).count()
    timed_serve("bm25_wand_serve", "wand", False)
    timed_serve("bm25_maxscore_serve", "maxscore", False)
    # untimed broadcast warmup: shared scored image build
    run_queries_ray(qds.limit(32), out_dir, algo="wand", k=K,
                    concurrency=num_cpus, broadcast=True).count()
    timed_serve("bm25_serve", "ranked_or_fast", True)
    timed_serve("bm25_wand_broadcast", "wand", True)
    extra["queries_per_sec"] = round(NUM_QUERIES / times["bm25_serve"], 1)
    extra["wand_queries_per_sec"] = round(
        NUM_QUERIES / times["bm25_wand_serve"], 1)

    # per-query LATENCY distribution (the reference's per-query metric,
    # queries.cpp:13-61: avg/q50/q90/q95 µs): synchronous single-query
    # round trips through the routed path — scatter to one replica of
    # every bucket owner + remote merge, timed end-to-end on the driver.
    from dint_ray.pipelines.partitioned import (
        _ACTOR_CACHE, _merge_remote, release_all_actors)

    if not _ACTOR_CACHE:
        # cache keying/release behavior may change; never abort the
        # whole bench over a missing latency sample (ADVICE r2)
        print("latency section skipped: no cached routed owner sets",
              file=sys.stderr)
    else:
        replicas = next(iter(_ACTOR_CACHE.values()))
        merge = _merge_remote()
        lat_ns = []
        import pyarrow as _pa

        import ray as _ray
        all_owners = [a for rs in replicas for a in rs]

        def _roundtrip(i, q):
            qb = _pa.table({"query_id": _pa.array([i], _pa.int64()),
                            "terms": _pa.array([list(q)],
                                               _pa.list_(_pa.int64()))})
            actors = replicas[i % len(replicas)]
            t0 = time.perf_counter_ns()
            refs = [a.score_block.remote(qb, "wand", K) for a in actors]
            _ray.get(merge.remote(K, False, qb, *refs))
            return time.perf_counter_ns() - t0

        for i, q in enumerate(qlog[:16]):      # untimed: merge-worker spin-up
            _roundtrip(i, q)
        _ray.get([a.busy_seconds.remote() for a in all_owners])
        for i, q in enumerate(qlog[:256]):
            lat_ns.append(_roundtrip(i, q))
        lat = np.sort(np.asarray(lat_ns, dtype=np.float64)) / 1e3
        # end-to-end = scatter to B owners + gather + remote merge (the
        # distributed round trip); service = summed in-owner scoring time
        # per query — the number comparable to the reference's
        # single-process per-query µs (queries.cpp:13-61)
        busy = sum(_ray.get([a.busy_seconds.remote() for a in all_owners]))
        extra["wand_latency_us"] = {
            "avg": round(float(lat.mean()), 1),
            "q50": round(float(lat[int(0.50 * (len(lat) - 1))]), 1),
            "q90": round(float(lat[int(0.90 * (len(lat) - 1))]), 1),
            "q95": round(float(lat[int(0.95 * (len(lat) - 1))]), 1),
            "service_avg": round(busy * 1e6 / max(len(lat_ns), 1), 1),
        }

    # release the resident bucket owners before the ops section so
    # their CPU reservations don't starve the following actor pools
    release_all_actors()

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


# Overridable because the right corpus size is a moving target: each
# kernel round shrinks per-doc compute, and once the wide leg's
# parallel sections fall to a few seconds the ratio measures Ray's
# fixed stage costs, not the engine (run 20: the 500k corpus stopped
# exercising 24 CPUs after the encode/hash kernels landed).
SCALING_DOCS = int(os.environ.get("DINT_SCALING_DOCS", "500000"))
SCALING_VOCAB = 30_000
SCALING_SHARDS = 32
# sized so the 32-CPU leg's timed section is still dominated by owner
# compute (the C-kernel WAND cursors made per-query work ~10x cheaper;
# at 80k queries the fixed scatter/merge costs swamped the wide leg).
# Overridable for larger corpora: per-query work scales with df, so at
# 2M docs (DINT_SCALING_DOCS) the same wall needs ~1/4 the queries.
SCALING_QUERIES = int(os.environ.get("DINT_SCALING_QUERIES", "320000"))
SCALING_DIR = "/tmp/dint_ray_scaling"
# The dedup legs get their own, 4x-larger corpus WITH a controlled
# duplicate population (8% exact copies + 4% near-duplicates): the
# 500k no-duplicate build corpus finished exact dedup in 2.6 s at 24
# CPUs — session/actor fixed costs dominated the ratio — and measured
# only the no-match fast path (0 candidate pairs).  2M docs with real
# duplicates keeps the timed section work-dominated at both widths and
# makes the pair-emission + join stages (the 100-TB-critical parts)
# part of the measurement.
DEDUP_DOCS = 2_000_000
DEDUP_SHARDS = 32
DEDUP_CHUNK = 250_000


def _scaling_fixture() -> str:
    """Deterministic Zipf web-page corpus (no external data), written
    as a DIRECTORY of shard files: one parquet file is ONE Ray read
    task, which serializes the fused read->tokenize pipeline no matter
    how many CPUs the leg has (measured: tokenize wall flat at 6 vs 24
    CPUs on a single file).  Many files is also the only realistic
    shape — a 100 TB crawl is never one parquet."""
    import pyarrow.parquet as pq

    os.makedirs(SCALING_DIR, exist_ok=True)
    path = os.path.join(SCALING_DIR,
                        f"pages_{SCALING_DOCS}_x{SCALING_SHARDS}")
    done = os.path.join(path, "_SUCCESS")
    if not os.path.exists(done):
        from dint_ray.fixtures import generate_pages

        os.makedirs(path, exist_ok=True)
        # chunked like _dedup_fixture so a multi-million-doc corpus
        # (DINT_SCALING_DOCS) never holds more than one chunk's Python
        # strings; doc_offset keeps doc_id / url / warc_ts coherent.
        # At the historical default (<= 500k) a single draw preserves
        # the exact corpus of scaling runs 5-19 (one seed-11 draw).
        chunk = SCALING_DOCS if SCALING_DOCS <= 500_000 else 250_000
        # distribute SCALING_SHARDS across chunks (remainder spread over
        # the head) so the total shard count stays exactly
        # SCALING_SHARDS even when SCALING_DOCS isn't a chunk multiple —
        # floor division drifted the file-level parallelism between
        # corpus sizes (600k docs -> 39 shards, 750k -> 30)
        nchunks = (SCALING_DOCS + chunk - 1) // chunk
        base_spc = max(1, SCALING_SHARDS // nchunks)
        extra = max(0, SCALING_SHARDS - base_spc * nchunks)
        shard = 0
        for ci, off in enumerate(range(0, SCALING_DOCS, chunk)):
            shards_per_chunk = base_spc + (1 if ci < extra else 0)
            t = generate_pages(min(chunk, SCALING_DOCS - off),
                               vocab_size=SCALING_VOCAB,
                               seed=11 + off // chunk, doc_offset=off)
            step = (t.num_rows + shards_per_chunk - 1) // shards_per_chunk
            for i in range(shards_per_chunk):
                part = t.slice(i * step, step)
                if part.num_rows:
                    pq.write_table(
                        part, os.path.join(path, f"part-{shard:04d}.parquet"),
                        row_group_size=4096)
                shard += 1
        with open(done, "w") as f:
            f.write("ok")
    return path


def _dedup_fixture() -> str:
    """Deterministic 2M-doc corpus with injected exact and near
    duplicates (fixtures.generate_dedup_pages), written chunk-by-chunk
    so generation never holds more than 250k rows in memory.  Chunks
    use distinct seeds but globally consistent doc_id / url / warc_ts
    via doc_offset."""
    import pyarrow.parquet as pq

    os.makedirs(SCALING_DIR, exist_ok=True)
    path = os.path.join(SCALING_DIR, f"pages_dedup_{DEDUP_DOCS}")
    done = os.path.join(path, "_SUCCESS")
    if not os.path.exists(done):
        from dint_ray.fixtures import generate_dedup_pages

        os.makedirs(path, exist_ok=True)
        files_per_chunk = DEDUP_SHARDS // (DEDUP_DOCS // DEDUP_CHUNK)
        shard = 0
        for off in range(0, DEDUP_DOCS, DEDUP_CHUNK):
            t = generate_dedup_pages(DEDUP_CHUNK, vocab_size=SCALING_VOCAB,
                                     seed=100 + off // DEDUP_CHUNK,
                                     doc_offset=off)
            step = (t.num_rows + files_per_chunk - 1) // files_per_chunk
            for i in range(files_per_chunk):
                pq.write_table(t.slice(i * step, step),
                               os.path.join(path,
                                            f"part-{shard:04d}.parquet"),
                               row_group_size=4096)
                shard += 1
        with open(done, "w") as f:
            f.write("ok")
    return path


def _index_digest(out_dir: str) -> str:
    """Order-independent digest over shard rows (term_id, payload):
    asserts the salted and single merge strategies build the same
    index bytes."""
    import glob
    import hashlib

    import pyarrow.parquet as pq

    # md5 over the SORTED per-row digests: order-independent like the
    # XOR-combine it replaces, but duplicate rows change the digest
    # (any even number of identical rows XORs away — the exact
    # duplicate-fragment bug class this check exists to catch)
    digests = []
    for f in sorted(glob.glob(os.path.join(out_dir, "shards", "**",
                                           "*.parquet"), recursive=True)):
        t = pq.read_table(f, columns=["term_id", "payload"])
        for tid, pl in zip(t.column("term_id").to_pylist(),
                           t.column("payload").to_pylist()):
            digests.append(
                hashlib.md5(int(tid).to_bytes(4, "little") + pl).digest())
    digests.sort()
    return hashlib.md5(b"".join(digests)).hexdigest()


def run_scaling_inner(cpus: int, only: str = "build,serve,dedup") -> dict:
    """One parallelism level: fresh build + warmed serving throughput.

    ``only`` selects sections ("build", "serve", "dedup") so targeted
    runs — e.g. a build-only leg pair at narrow widths to locate the
    single-host bandwidth ceiling — don't pay the full ~25 min."""
    sections = frozenset(s.strip() for s in only.split(",") if s.strip())
    import time as _t

    import pyarrow as _pa
    import ray

    # pyarrow's internal thread pool ignores Ray's num_cpus; pin it so
    # driver-side arrow kernels (stats group_by etc.) scale with the
    # leg's CPU budget instead of silently using the whole machine
    _pa.set_cpu_count(cpus)
    _pa.set_io_thread_count(max(2, cpus // 2))
    ray.init(address="local", num_cpus=cpus, include_dashboard=False)
    from dint_ray.pipelines.build import build_index_ray

    res: dict = {"num_cpus": cpus,
                 "os_cpus_visible": len(os.sched_getaffinity(0)),
                 "num_docs": SCALING_DOCS,
                 "sections": sorted(sections)}
    # untimed host-ceiling probe (scripts/host_probe.py): aggregate
    # memory-copy bandwidth + L1-resident multiply rate at this leg's
    # process count.  The wide/narrow ratio of mem_bw_gbps is the
    # host's own scaling ceiling for bandwidth-bound stages — it turns
    # the "build efficiency < 1 is the shared-DRAM ceiling, not the
    # engine" attribution in BASELINE.md into a measured number.
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "scripts"))
        from host_probe import host_probe as _host_probe
        res["host_probe"] = _host_probe(cpus)
    except Exception as exc:  # probe is diagnostics, never fail a leg
        res["host_probe"] = {"error": repr(exc)}
    import glob as _glob

    manifest = None
    out_dir = os.path.join(SCALING_DIR, f"build_{cpus}")
    if sections & {"build", "serve"}:
        pages = _scaling_fixture()

        # Untimed warmup build over a 2-shard slice of the corpus — the
        # build-side analogue of the reference's untimed pass 0
        # (queries.cpp:104-111): it spawns the leg's full Ray worker
        # pool, imports numpy/pyarrow in every worker and compiles the
        # native kernels once, so the timed build below measures
        # steady-state throughput rather than process spawn (measured:
        # the first build in a session is ~1.7x the second at 24 CPUs
        # purely from startup).  The input files are also pre-read once
        # so BOTH legs see the same page-cache state (a cluster's hot
        # object store).
        warm_pages = os.path.join(SCALING_DIR, "pages_warmup")
        if not os.path.exists(os.path.join(warm_pages, "_SUCCESS")):
            os.makedirs(warm_pages, exist_ok=True)
            for f in sorted(_glob.glob(os.path.join(pages,
                                                    "*.parquet")))[:2]:
                shutil.copy(f, warm_pages)
            with open(os.path.join(warm_pages, "_SUCCESS"), "w") as fh:
                fh.write("ok")
        warm_out = os.path.join(SCALING_DIR, f"build_warm_{cpus}")
        shutil.rmtree(warm_out, ignore_errors=True)
        build_index_ray(warm_pages, warm_out)
        shutil.rmtree(warm_out, ignore_errors=True)
        for f in sorted(_glob.glob(os.path.join(pages, "*.parquet"))):
            with open(f, "rb") as fh:
                fh.read()

    if "build" in sections:
        # best-of-2 timed builds (the serving legs are best-of-3 for
        # the same reason): single passes on a shared host carry ±15%
        # spread — run 8 recorded a 65.4 s pass at 24 CPUs where runs
        # 5-7 measured 49.7-58.9 s on identical code/input.  Both
        # walls are reported.
        build_runs = []
        for _ in range(2):
            shutil.rmtree(out_dir, ignore_errors=True)
            t0 = _t.time()
            manifest = build_index_ray(pages, out_dir)
            build_runs.append(round(_t.time() - t0, 1))
        build_sec = min(build_runs)

        # salted two-exchange merge: the 10^12-doc skew path (head
        # lists split into doc-range buckets).  merge_strategy="auto"
        # only picks it above chunk_df_threshold, so force it here for
        # a measured number at both widths and assert bit-identity
        # with the single-exchange index (VERDICT r2 item 7).
        from dint_ray.config import BuildConfig

        out_salted = os.path.join(SCALING_DIR, f"build_salted_{cpus}")
        salted_runs = []
        for _ in range(2):
            shutil.rmtree(out_salted, ignore_errors=True)
            t0 = _t.time()
            build_index_ray(pages, out_salted,
                            bcfg=BuildConfig(merge_strategy="salted"))
            salted_runs.append(round(_t.time() - t0, 1))
        salted_sec = min(salted_runs)
        salted_match = _index_digest(out_dir) == _index_digest(out_salted)
        shutil.rmtree(out_salted, ignore_errors=True)
        res.update({
            "build_sec": round(build_sec, 1),
            "build_runs_sec": build_runs,
            "build_docs_per_sec": round(SCALING_DOCS / build_sec, 1),
            "build_salted_sec": round(salted_sec, 1),
            "build_salted_runs_sec": salted_runs,
            "build_salted_docs_per_sec": round(SCALING_DOCS / salted_sec, 1),
            "salted_digest_match": salted_match,
            "stage_secs": manifest.get("stage_secs", {}),
        })
    elif "serve" in sections:
        # serve-only leg still needs an index; one untimed build
        shutil.rmtree(out_dir, ignore_errors=True)
        manifest = build_index_ray(pages, out_dir)

    if "serve" in sections:
        res.update(_serve_section(cpus, out_dir, manifest))
    if "dedup" in sections:
        res.update(_dedup_section(cpus))
    if "components" in sections:
        res.update(_components_section(cpus))
    ray.shutdown()
    return res


def _serve_section(cpus: int, out_dir: str, manifest: dict) -> dict:
    import time as _t

    import ray

    from dint_ray.fixtures import generate_queries
    from dint_ray.pipelines.serve import queries_to_dataset, run_queries_ray

    qlog = generate_queries(SCALING_QUERIES, manifest["num_terms"])
    qds = queries_to_dataset(qlog)
    # untimed warmup passes (the reference's pass 0, queries.cpp:104-111):
    # routed = serve-layout build + owner init; broadcast = shared image
    from dint_ray.pipelines.partitioned import run_queries_routed

    # bucket count is a MEMORY decision and stays fixed across cluster
    # sizes; replicas + batch flow scale with the cluster
    buckets = 4
    replicas = max(1, cpus // 6)
    # batch 512: the driver's per-batch scatter cost (one ray.put +
    # B+1 task submissions) must amortize over enough queries that the
    # owners, not the driver loop, are the throughput ceiling
    run_queries_routed(queries_to_dataset(qlog[:1024]), out_dir, algo="wand",
                       k=K, num_buckets=buckets,
                       num_replicas=replicas, batch_size=512).count()
    run_queries_ray(qds.limit(512), out_dir, algo="ranked_or_fast", k=K,
                    concurrency=cpus, broadcast=True).count()
    # timed runs: best of 3 full passes per algorithm, identically at
    # both widths — the reference harness also repeats timed runs
    # (queries.cpp:104-111, 10 runs + warmup) because single passes on
    # a shared host are contaminated by external load spikes; all runs
    # are reported alongside the best
    from dint_ray.pipelines.partitioned import _ACTOR_CACHE

    serve = {}
    runs_all: dict[str, list] = {"wand": [], "wand_compressed": [],
                                 "ranked_or_fast": []}
    owner_util = []
    loadavg = []
    owners = [a for rs in next(iter(_ACTOR_CACHE.values())) for a in rs]
    for _ in range(3):
        ray.get([a.busy_seconds.remote() for a in owners])
        loadavg.append(round(os.getloadavg()[0], 1))
        t0 = _t.time()
        run_queries_routed(qds, out_dir, algo="wand", k=K,
                           num_buckets=buckets, num_replicas=replicas,
                           batch_size=512,
                           router_concurrency=max(4, cpus // 2)).count()
        wall = _t.time() - t0
        busy = sum(ray.get([a.busy_seconds.remote() for a in owners]))
        runs_all["wand"].append(round(SCALING_QUERIES / wall, 1))
        owner_util.append(round(busy / (len(owners) * wall), 3))
    serve["wand"] = max(runs_all["wand"])
    # compressed-storage owners: WAND directly over DINT payloads with
    # lazy per-block C decode — the fixed-memory-node (100 TB) serving
    # configuration; results bit-identical (asserted in tests)
    run_queries_routed(queries_to_dataset(qlog[:1024]), out_dir, algo="wand",
                       k=K, num_buckets=buckets, num_replicas=replicas,
                       storage="compressed", batch_size=512).count()
    for _ in range(3):
        t0 = _t.time()
        run_queries_routed(qds, out_dir, algo="wand", k=K,
                           num_buckets=buckets, num_replicas=replicas,
                           storage="compressed", batch_size=512,
                           router_concurrency=max(4, cpus // 2)).count()
        runs_all["wand_compressed"].append(
            round(SCALING_QUERIES / (_t.time() - t0), 1))
    serve["wand_compressed"] = max(runs_all["wand_compressed"])
    for _ in range(2):
        t0 = _t.time()
        run_queries_ray(qds, out_dir, algo="ranked_or_fast", k=K,
                        concurrency=cpus, batch_size=256,
                        broadcast=True).count()
        runs_all["ranked_or_fast"].append(
            round(SCALING_QUERIES / (_t.time() - t0), 1))
    serve["ranked_or_fast"] = max(runs_all["ranked_or_fast"])
    # Release serving state before whatever runs next: idle bucket
    # owners reserve 0.25 CPU each and the broadcast image pins plasma
    # memory — a dedup job is its own cluster occupant, so it must
    # measure on a clean session.
    from dint_ray.pipelines import serve as _serve_mod
    from dint_ray.pipelines.partitioned import release_all_actors

    release_all_actors()
    _serve_mod._REF_CACHE.clear()
    import gc as _gc

    _gc.collect()
    return {
        "wand_queries_per_sec": serve["wand"],
        "wand_compressed_queries_per_sec": serve["wand_compressed"],
        "fast_queries_per_sec": serve["ranked_or_fast"],
        "serve_runs": runs_all,
        "owner_utilization": owner_util,
        "loadavg_before_runs": loadavg,
    }


def _dedup_section(cpus: int) -> dict:
    """LLM-ops legs: MinHash-LSH near-dup and digest-keyed exact dedup
    over the dedicated 2M-doc corpus with an injected 8%-exact + 4%-near
    duplicate population — the dedup path is first-class at 100 TB, so
    it gets a scaling number alongside build/serve, and it must measure
    real pair-emission/join work, not the 0-candidate fast path the
    duplicate-free build corpus exercises (run <=15 legs did exactly
    that: exact dedup finished in 2.6 s at 24 CPUs, fixed costs
    dominated, efficiency read 0.42)."""
    import glob as _glob
    import time as _t

    import ray.data as _rd

    pages = _dedup_fixture()
    # same page-cache state at both widths (a cluster's hot object
    # store); generation itself happens once in the parent process
    for f in sorted(_glob.glob(os.path.join(pages, "*.parquet"))):
        with open(f, "rb") as fh:
            fh.read()

    from dint_ray.ops.dedup import exact_dedup_ds, minhash_dedup_pairs_ds

    # best-of-2: the first pass also absorbs Ray worker spawn when the
    # dedup section runs alone in a fresh session
    minhash_runs, exact_runs = [], []
    for _ in range(2):
        t0 = _t.time()
        minhash_pairs = minhash_dedup_pairs_ds(
            _rd.read_parquet(pages)).count()
        minhash_runs.append(round(_t.time() - t0, 1))
        t0 = _t.time()
        exact_kept = exact_dedup_ds(_rd.read_parquet(pages)).count()
        exact_runs.append(round(_t.time() - t0, 1))
    minhash_sec = min(minhash_runs)
    exact_sec = min(exact_runs)
    # components leg: cluster the verified near-dup pairs — the step
    # after pair emission in a real dedup pipeline (pairs alone
    # under-delete A~B~C chains).  Pairs are materialized UNTIMED so
    # the timed section is only the min-label-propagation fixpoint.
    from dint_ray.ops.components import connected_components_ds

    pairs_mat = minhash_dedup_pairs_ds(
        _rd.read_parquet(pages)).materialize()
    n_pairs = pairs_mat.count()
    cc_runs = []
    for _ in range(2):
        t0 = _t.time()
        n_labels = connected_components_ds(pairs_mat).count()
        cc_runs.append(round(_t.time() - t0, 1))
    cc_sec = min(cc_runs)
    return {
        "dedup_num_docs": DEDUP_DOCS,
        "minhash_docs_per_sec": round(DEDUP_DOCS / minhash_sec, 1),
        "minhash_runs_sec": minhash_runs,
        "minhash_pairs": minhash_pairs,
        "exact_dedup_docs_per_sec": round(DEDUP_DOCS / exact_sec, 1),
        "exact_dedup_runs_sec": exact_runs,
        "exact_dedup_kept": exact_kept,
        "components_pairs": n_pairs,
        "components_labels": n_labels,
        "components_runs_sec": cc_runs,
        "components_pairs_per_sec": round(n_pairs / max(cc_sec, 1e-9), 1),
    }


# synthetic component-graph leg: the realistic dedup corpus yields only
# ~269k pairs, whose fixpoint converges in ~0.3 s at EITHER width —
# entirely inside Ray's scheduling floor, so its "efficiency" measures
# nothing (run 17 printed 0.25 on identical 0.3 s walls).  This graph is
# sized so each propagation round does real vectorized work: random
# recursive trees of CC_COMP_SIZE nodes (the shape of a duplicate
# cluster), CC_EDGES edges total, built deterministically from the edge
# index alone so both legs see the identical graph.
CC_EDGES = int(os.environ.get("DINT_CC_EDGES", 8_000_000))
CC_COMP_SIZE = 32


def _cc_synth_edges():
    """Deterministic random-tree pair graph as a Dataset (untimed
    setup for the components scaling leg)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    per_comp = CC_COMP_SIZE - 1  # edges per component (a tree)
    # whole components only: a trailing partial tree would label a
    # fragment of a component and break the exact label-count check
    n_edges = (CC_EDGES // per_comp) * per_comp
    mult = np.uint64(0x9E3779B97F4A7C15)

    def gen(batch) -> "pa.Table":
        j = batch["id"].to_numpy().astype(np.uint64)
        comp = (j // per_comp).astype(np.int64)
        slot = (j % per_comp).astype(np.int64) + 1  # node 1..31
        h = ((j * mult) >> np.uint64(33)).astype(np.int64)
        parent = h % slot  # uniform in [0, slot) -> random recursive tree
        base = comp * CC_COMP_SIZE
        return pa.table({"doc_a": base + slot, "doc_b": base + parent})

    return rd.range(n_edges).map_batches(gen, batch_format="pyarrow",
                                         num_cpus=1)


def _components_section(cpus: int) -> dict:
    """Scaling leg for the connected-components fixpoint itself: edges
    materialized untimed, min-label propagation timed best-of-2."""
    import time as _t

    from dint_ray.ops.components import connected_components_ds

    pairs = _cc_synth_edges().materialize()
    n_pairs = pairs.count()
    n_comps = CC_EDGES // (CC_COMP_SIZE - 1)
    runs, n_labels = [], 0
    for _ in range(2):
        t0 = _t.time()
        n_labels = connected_components_ds(pairs).count()
        runs.append(round(_t.time() - t0, 1))
    sec = min(runs)
    assert n_labels == n_comps * CC_COMP_SIZE, \
        f"expected {n_comps * CC_COMP_SIZE} labeled nodes, got {n_labels}"
    from dint_ray.ops.components import LAST_RUN_INFO

    info = dict(LAST_RUN_INFO)
    return {
        "cc_synth_edges": n_pairs,
        "cc_synth_components": n_comps,
        "cc_synth_labels": n_labels,
        "cc_synth_runs_sec": runs,
        "cc_synth_pairs_per_sec": round(n_pairs / max(sec, 1e-9), 1),
        "cc_synth_rounds": info.get("rounds"),
        "cc_synth_width": info.get("width"),
        "cc_synth_sync_every": info.get("sync_every"),
        "cc_synth_sec_per_round": (
            round(sec / info["rounds"], 3) if info.get("rounds") else None),
    }


# N and 4N parallelism levels.  6/24 rather than 8/32 so the wide leg
# leaves headroom for whatever else runs on the shared sandbox host
# (harness processes, occasional background load — loadavg is recorded
# per timed run as evidence): a 32-CPU leg has zero spare cores, so any
# neighbor activity preempts owners and inflates the wide leg's
# per-event cost ~15% (measured in round 2), which a real 4N-node
# cluster would not see.  At 24 the wide leg fits inside the free cores
# so the ratio measures the ENGINE, not the neighbors.
SCALING_LEGS = (6, 24)


def run_scaling(legs: tuple[int, int] = SCALING_LEGS,
                only: str = "build,serve,dedup") -> dict:
    """Same job at two parallelism levels in fresh processes (the
    sandbox stand-in for N- vs 4N-node clusters, BASELINE.md).

    Each leg is pinned to exactly its CPU budget with `taskset -c
    0-(n-1)` (Ray workers inherit the affinity mask): ray.init(
    num_cpus=n) only caps Ray's TASK SLOTS, not OS threads, so
    without pinning the narrow leg's parquet decompression, Arrow
    group_by threads and Ray system threads silently spread over all
    32 physical cores — inflating the small-"cluster" throughput and
    understating efficiency.  A real 6-core node has 6 cores for
    everything; affinity is the faithful stand-in."""
    sections = frozenset(s.strip() for s in only.split(",") if s.strip())
    # fixtures are generated once here, unpinned, so neither leg pays
    # (or is skewed by) one-time corpus generation
    if sections & {"build", "serve"}:
        _scaling_fixture()
    if "dedup" in sections:
        _dedup_fixture()
    lo, hi = legs
    results = {}
    for cpus in (lo, hi):
        out = subprocess.run(
            ["taskset", "-c", f"0-{cpus - 1}",
             sys.executable, os.path.abspath(__file__), "--scale-inner",
             str(cpus), "--only", only],
            env=dict(os.environ), capture_output=True, text=True, timeout=7200)
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if out.returncode != 0 or not lines:
            sys.stderr.write(out.stderr[-4000:])
            raise RuntimeError(
                f"scale-inner {cpus} failed (rc={out.returncode}, "
                f"{len(lines)} JSON lines) — stderr above")
        results[cpus] = json.loads(lines[-1])
    rlo, rhi = results[lo], results[hi]

    def eff(key):
        return round((rhi[key] / rlo[key]) / (hi / lo), 3)

    res = {
        "metric": f"scaling efficiency {lo}->{hi} cpus "
                  "(throughput ratio / cpu ratio)",
        "unit": "efficiency",
        "corpus": f"{SCALING_DOCS} synthetic web pages, vocab {SCALING_VOCAB}",
        "sections": sorted(sections),
    }
    if "build" in sections:
        res.update({
            "build_docs_per_sec": {str(lo): rlo["build_docs_per_sec"],
                                   str(hi): rhi["build_docs_per_sec"]},
            "build_efficiency": eff("build_docs_per_sec"),
            "build_salted_efficiency": eff("build_salted_docs_per_sec"),
            "salted_digest_match": (rlo["salted_digest_match"]
                                    and rhi["salted_digest_match"]),
        })
    if "serve" in sections:
        res.update({
            "wand_queries_per_sec": {str(lo): rlo["wand_queries_per_sec"],
                                     str(hi): rhi["wand_queries_per_sec"]},
            "wand_compressed_queries_per_sec": {
                str(lo): rlo["wand_compressed_queries_per_sec"],
                str(hi): rhi["wand_compressed_queries_per_sec"]},
            "fast_queries_per_sec": {str(lo): rlo["fast_queries_per_sec"],
                                     str(hi): rhi["fast_queries_per_sec"]},
            "wand_serve_efficiency": eff("wand_queries_per_sec"),
            "wand_compressed_serve_efficiency":
                eff("wand_compressed_queries_per_sec"),
            "fast_serve_efficiency": eff("fast_queries_per_sec"),
        })
    if "dedup" in sections:
        res.update({
            "dedup_corpus": f"{DEDUP_DOCS} pages, 8% exact + 4% near dups",
            "minhash_docs_per_sec": {str(lo): rlo["minhash_docs_per_sec"],
                                     str(hi): rhi["minhash_docs_per_sec"]},
            "minhash_dedup_efficiency": eff("minhash_docs_per_sec"),
            "exact_dedup_docs_per_sec": {
                str(lo): rlo["exact_dedup_docs_per_sec"],
                str(hi): rhi["exact_dedup_docs_per_sec"]},
            "exact_dedup_efficiency": eff("exact_dedup_docs_per_sec"),
        })
        if "components_pairs_per_sec" in rlo:
            res.update({
                "components_pairs_per_sec": {
                    str(lo): rlo["components_pairs_per_sec"],
                    str(hi): rhi["components_pairs_per_sec"]},
                "components_efficiency": eff("components_pairs_per_sec"),
            })
    if "components" in sections:
        res.update({
            "cc_synth_edges": rhi["cc_synth_edges"],
            "cc_synth_pairs_per_sec": {
                str(lo): rlo["cc_synth_pairs_per_sec"],
                str(hi): rhi["cc_synth_pairs_per_sec"]},
            "cc_synth_efficiency": eff("cc_synth_pairs_per_sec"),
        })
    # headline value: serving if measured, else build, else dedup
    for key in ("wand_serve_efficiency", "build_efficiency",
                "minhash_dedup_efficiency"):
        if key in res:
            res["value"] = res[key]
            break
    res["runs"] = {str(lo): rlo, str(hi): rhi}
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--inner", action="store_true")
    ap.add_argument("--scale-inner", type=int, default=0)
    ap.add_argument("--legs", type=int, nargs=2, default=list(SCALING_LEGS),
                    help="lo hi CPU counts for --scaling")
    ap.add_argument("--only", type=str, default="build,serve,dedup",
                    help="comma-set of sections: build,serve,dedup,"
                         "components (components = synthetic 8M-edge "
                         "graph, opt-in: it measures the fixpoint alone)")
    args = ap.parse_args()

    if args.scaling:
        print(json.dumps(run_scaling(tuple(args.legs), args.only)))
        return
    if args.scale_inner:
        print(json.dumps(run_scaling_inner(args.scale_inner, args.only)))
        return

    import ray

    result = run_bench(SF_DIR, NUM_CPUS)
    print(json.dumps(result))
    ray.shutdown()


if __name__ == "__main__":
    main()
