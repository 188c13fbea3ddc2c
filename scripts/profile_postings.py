"""Decompose the posting_lists stage wall at one parallelism level and
A/B candidate exchange/kernel designs without touching the library.

Usage (pinned, like a scaling leg):

    taskset -c 0-5  python scripts/profile_postings.py 6  [modes]
    taskset -c 0-23 python scripts/profile_postings.py 24 [modes]

modes: comma-set of
  filter — the shipped design: every merge task gets ALL block refs and
           filters part == p (O(width x blocks) foreign-row scans)
  split  — map-side partition split: each combined block is pre-sorted
           by part and split into per-part compacted sub-tables by one
           task per block (num_returns=width); merge task p receives
           only its own rows
  fused  — like filter but the merge kernel uses one composite-uint64
           argsort (term<<32|doc) instead of the 2-key int64 lexsort

Prints one JSON line per mode with sub-walls; in-task scan/merge times
are measured INSIDE the tasks and returned out-of-band, so the
attribution is direct, not inferred from totals.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402


def _fused_merge_runs_block(batch: pa.Table) -> pa.Table:
    """_merge_runs_block with a composite-key argsort and no int64
    staging copies (candidate kernel)."""
    term32 = batch.column("term_id").to_numpy(zero_copy_only=False)
    docs_col = batch.column("docs").combine_chunks()
    freqs_col = batch.column("freqs").combine_chunks()
    doc_offsets = docs_col.offsets.to_numpy()
    lens = np.diff(doc_offsets)
    if not len(term32) or int(lens.sum()) == 0:
        return pa.table({
            "term_id": pa.array([], pa.uint32()),
            "docs": pa.array([], pa.list_(pa.uint32())),
            "freqs": pa.array([], pa.list_(pa.uint32())),
        })
    term_flat = np.repeat(term32.astype(np.uint64, copy=False), lens)
    docs_flat = docs_col.values.to_numpy(zero_copy_only=False)[
        doc_offsets[0]:doc_offsets[-1]]
    f_off = freqs_col.offsets.to_numpy()
    freqs_flat = freqs_col.values.to_numpy(zero_copy_only=False)[
        f_off[0]:f_off[-1]]
    key = (term_flat << np.uint64(32)) | docs_flat.astype(np.uint64)
    order = np.argsort(key, kind="stable")
    key_sorted = key[order]
    n = len(key)
    term_sorted = (key_sorted >> np.uint64(32)).astype(np.uint32)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = term_sorted[1:] != term_sorted[:-1]
    starts = np.flatnonzero(change)
    offsets = np.append(starts, n).astype(np.int32)
    doc_vals = (key_sorted & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    freq_vals = freqs_flat.astype(np.uint32, copy=False)[order]
    off_arr = pa.array(offsets, pa.int32())
    return pa.table({
        "term_id": pa.array(term_sorted[starts], pa.uint32()),
        "docs": pa.ListArray.from_arrays(
            off_arr, pa.array(doc_vals, pa.uint32())),
        "freqs": pa.ListArray.from_arrays(
            off_arr, pa.array(freq_vals, pa.uint32())),
    })


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    modes = (sys.argv[2] if len(sys.argv) > 2 else "filter,split,fused").split(",")
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False)
    import ray.data as rd

    import dint_ray
    from dint_ray.config import BuildConfig
    from dint_ray.postings import (AssignTermId, _merge_rows_block,
                                   _merge_runs_block, _shuffle_width,
                                   build_vocabulary, df_partials,
                                   tokenize_rows)

    dint_ray.ensure_tuned()
    pages_dir = os.environ.get(
        "DINT_PROFILE_PAGES", "/tmp/dint_ray_scaling/pages_500000_x32")
    bcfg = BuildConfig()

    # untimed prep: tokenize + vocabulary (mirrors the build stages
    # before posting_lists)
    pages = rd.read_parquet(pages_dir, columns=["doc_id", "text"])
    rows_ds = tokenize_rows(pages, bcfg).materialize()
    vocab = build_vocabulary(rows_ds, df_partials(rows_ds))
    width = _shuffle_width()
    vocab_ref = ray.put(vocab)

    def combined():
        """AssignTermId + map-side combine + part tag, materialized.
        Rebuilt per mode so every mode pays (and times) the same map
        side from the same input state."""
        keyed = rows_ds.map_batches(
            AssignTermId,
            fn_constructor_kwargs={
                "vocab_ref": vocab_ref,
                "salt_df_threshold": bcfg.salt_df_threshold,
                "salt_bucket_docs": bcfg.salt_bucket_docs,
                "emit_bucket": False,
                "small_docids": True,
            },
            batch_format="pyarrow",
            concurrency=bcfg.pool_bounds(bcfg.tokenize_concurrency),
            num_cpus=1,
        )
        runs = keyed.map_batches(_merge_rows_block, batch_format="pyarrow",
                                 batch_size=bcfg.combine_batch_rows)

        def _add_part(b: pa.Table) -> pa.Table:
            tid = b.column("term_id").to_numpy()
            part = (tid.astype(np.uint64) % np.uint64(width)).astype(np.uint32)
            return b.append_column("part", pa.array(part, pa.uint32()))

        return runs.map_batches(_add_part, batch_format="pyarrow",
                                batch_size=None, num_cpus=1).materialize()

    def filter_exchange(refs, merge_kernel):
        def _merge_part_timed(p: int, *tabs):
            import pyarrow.compute as pc

            ts = time.time()
            avail = [t for t in tabs if t is not None and t.num_columns]
            sel = [t.filter(pc.equal(t.column("part"), p))
                   .drop_columns(["part"]) for t in avail if t.num_rows]
            sel = [s for s in sel if s.num_rows]
            scan = time.time() - ts
            ts = time.time()
            if not sel:
                res = merge_kernel(
                    avail[0].drop_columns(["part"]).slice(0, 0))
            else:
                res = merge_kernel(
                    pa.concat_tables(sel, promote_options="default"))
            return res, (p, round(scan, 3), round(time.time() - ts, 3))

        mt = ray.remote(num_cpus=1, num_returns=2)(_merge_part_timed)
        pairs = [mt.remote(p, *refs) for p in range(width)]
        return [r for r, _ in pairs], [t for _, t in pairs]

    def split_exchange(refs, merge_kernel):
        w = width

        def _split_block(t: pa.Table):
            ts = time.time()
            part = t.column("part").to_numpy()
            order = np.argsort(part, kind="stable")
            t = t.take(pa.array(order)).drop_columns(["part"])
            bounds = np.searchsorted(part[order], np.arange(w + 1))
            outs = []
            for i in range(w):
                sl = t.slice(bounds[i], bounds[i + 1] - bounds[i])
                # compact: a pickled zero-copy slice drags parent buffers
                outs.append(sl.combine_chunks() if sl.num_rows else sl)
            return (*outs, time.time() - ts)

        st = ray.remote(num_cpus=1, num_returns=width + 1)(_split_block)
        per_block = [st.remote(r) for r in refs]
        split_secs = [pb[-1] for pb in per_block]

        def _merge_part_timed(p: int, *tabs):
            ts = time.time()
            sel = [t for t in tabs if t.num_rows]
            if not sel:
                res = merge_kernel(tabs[0].slice(0, 0))
            else:
                res = merge_kernel(
                    pa.concat_tables(sel, promote_options="default"))
            return res, (p, 0.0, round(time.time() - ts, 3))

        mt = ray.remote(num_cpus=1, num_returns=2)(_merge_part_timed)
        pairs = [mt.remote(p, *[pb[p] for pb in per_block])
                 for p in range(width)]
        return ([r for r, _ in pairs], [t for _, t in pairs], split_secs)

    results = []
    for mode in modes:
        out = {"mode": mode, "num_cpus": cpus, "width": width}
        t0 = time.time()
        mat = combined()
        out["assign_combine_sec"] = round(time.time() - t0, 2)
        refs = mat.to_arrow_refs()
        out["combined_blocks"] = len(refs)
        out["combined_rows"] = mat.count()
        out["combined_mb"] = round(mat.size_bytes() / 1e6, 1)

        kernel = _fused_merge_runs_block if mode == "fused" \
            else _merge_runs_block
        t0 = time.time()
        split_secs = None
        if mode == "split":
            res_refs, timing_refs, split_secs = split_exchange(refs, kernel)
        else:
            res_refs, timing_refs = filter_exchange(refs, kernel)
        final = rd.from_arrow_refs(res_refs).materialize()
        out["exchange_sec"] = round(time.time() - t0, 2)
        timings = ray.get(timing_refs)
        if split_secs is not None:
            ss = ray.get(split_secs)
            out["task_split_sec"] = round(sum(ss), 2)
            out["task_split_max"] = round(max(ss), 3)
        out["task_scan_sec"] = round(sum(t[1] for t in timings), 2)
        out["task_merge_sec"] = round(sum(t[2] for t in timings), 2)
        out["task_scan_max"] = max(t[1] for t in timings)
        out["task_merge_max"] = max(t[2] for t in timings)
        out["task_walls"] = sorted(round(t[1] + t[2], 2) for t in timings)
        out["final_rows"] = final.count()
        out["final_mb"] = round(final.size_bytes() / 1e6, 1)
        out["posting_total_sec"] = round(
            out["assign_combine_sec"] + out["exchange_sec"], 2)
        # content digest so candidate kernels are checked, not trusted:
        # rows sorted by term_id, then the three value streams hashed
        # column-wise (vectorized — row identity follows because docs
        # lists are sorted within rows and term_ids are unique)
        import hashlib

        ht, hd, hf, hl = (hashlib.sha256() for _ in range(4))
        for b in final.sort("term_id").iter_batches(batch_size=65536,
                                                    batch_format="pyarrow"):
            tid = b.column("term_id").to_numpy(zero_copy_only=False)
            dcol = b.column("docs").combine_chunks()
            fcol = b.column("freqs").combine_chunks()
            do = dcol.offsets.to_numpy()
            fo = fcol.offsets.to_numpy()
            ht.update(np.ascontiguousarray(tid, dtype=np.uint32).tobytes())
            hl.update(np.ascontiguousarray(
                np.diff(do), dtype=np.int64).tobytes())
            hd.update(np.ascontiguousarray(
                dcol.values.to_numpy(zero_copy_only=False)[do[0]:do[-1]],
                dtype=np.uint32).tobytes())
            hf.update(np.ascontiguousarray(
                fcol.values.to_numpy(zero_copy_only=False)[fo[0]:fo[-1]],
                dtype=np.uint32).tobytes())
        out["digest"] = "-".join(h.hexdigest()[:8]
                                 for h in (ht, hl, hd, hf))
        results.append(out)
        print(json.dumps(out), flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
