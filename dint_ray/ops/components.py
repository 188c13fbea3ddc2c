"""Distributed connected components over near-duplicate pairs, and the
canonical-keep dedup built on it.

The dedup family (``ops/dedup.py``) emits near-dup PAIRS — MinHash+LSH,
SimHash, n-gram Jaccard, embedding cosine.  Turning pairs into a kept
corpus needs one more step a 100-TB pipeline can't skip: group the
pairs into duplicate CLUSTERS (connected components of the pair graph)
and keep one canonical member per cluster.  Pairs alone under-delete:
with docs A~B and B~C, dropping "the worse of each pair" keeps either
nothing or two of the three depending on pair order; components keep
exactly min(A,B,C).

Algorithm: delta min-label propagation over hash partitions held
resident in the object store, as raw Ray tasks — this is the one shape
the Dataset API genuinely can't express (an iterative fixpoint over
partitioned state that must NOT re-shuffle the edge set every round),
same escape-hatch rationale as the partition owners in
``pipelines/partitioned.py``.

- Edges are normalized (both directions, self-loops dropped,
  duplicates removed), hash-partitioned by source ONCE, and each
  partition stays in plasma for every round (zero-copy reads).
- Round 0 initializes ``label(v) = min(v, N(v))`` inside each
  partition (no traffic).
- Round r: each partition min-merges its incoming candidate labels,
  then for sources whose label DECREASED this round emits
  ``(dst, new_label)`` candidates pre-split by ``hash(dst)`` — and
  only where ``new_label < dst`` (a candidate ≥ dst can never win).
  Delta propagation means per-round traffic is proportional to labels
  still moving, not to |E|.
- Fixpoint when no label changed anywhere (exact: labels only ever
  decrease, so an unchanged round is terminal).

Rounds needed = component diameter.  Near-dup components are small
cliques/chains (duplicates of one underlying document), so the bound
is tiny and INDEPENDENT of corpus size; for adversarial million-hop
chain graphs a large-star/small-star contraction (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) bounds rounds
at O(log² n) — ``max_rounds`` guards that regime loudly instead of
silently looping.

Scale shape: driver holds O(width²) tiny ObjectRefs per round, never
data; per-task memory is O(|E|/width).  Width scales with the edge
count (~4M edges per partition, floor at the CPU count) up to 512 —
at the cap the per-round ref fan-out is ~262k refs (fine) and a
10^10-edge pair graph still fits ~20M edges per partition; beyond
that, reach for the star-contraction variant rather than more width.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_EMPTY_LABELS = {"doc_id": pa.array([], pa.int64()),
                 "component": pa.array([], pa.int64())}

# diagnostics from the most recent connected_components_ds run
# (rounds to fixpoint, width, batch depth) — read by bench.py for the
# round-latency numbers in BASELINE.md
LAST_RUN_INFO: dict = {}

# Fibonacci multiplicative hash on the node id — same function on the
# split side and the candidate-emit side, or routing breaks.
_HASH_MULT = np.uint64(0x9E3779B97F4A7C15)


def _part_of_nodes(nodes: np.ndarray, width: int) -> np.ndarray:
    h = nodes.astype(np.uint64) * _HASH_MULT
    return ((h >> np.uint64(33)) % np.uint64(width)).astype(np.int64)


# target edges per resident partition when auto-sizing the width; the
# cap bounds the O(width^2) per-round ref fan-out on the driver
_CC_EDGES_PER_PART = 4_000_000
_CC_MAX_WIDTH = 512


def _cc_width(width: int | None, num_edges: int | None = None) -> int:
    if width:
        return int(width)
    try:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    base = max(8, ncpu)
    if num_edges:
        # partition memory is O(|E|/width): grow width with the edge
        # count instead of capping at a constant (the former min(64,·)
        # made partitions ~|E|/64 regardless of graph size)
        need = -(-num_edges // _CC_EDGES_PER_PART)
        return min(_CC_MAX_WIDTH, max(base, need))
    return base


def _make_norm_edges(a_col: str, b_col: str):
    def norm(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        b = batch.column(b_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table({"src": np.concatenate((a, b)),
                         "dst": np.concatenate((b, a))})
    return norm


def _split_edges(width: int, tab: pa.Table):
    """One input block -> width partition slices by hash(src)."""
    if tab.num_rows == 0 or "src" not in tab.column_names:
        # materialize() can surface zero-row blocks with an empty
        # schema; they carry nothing
        empty = pa.table({"src": pa.array([], pa.int64()),
                          "dst": pa.array([], pa.int64())})
        return tuple(empty for _ in range(width))
    src = tab.column("src").to_numpy()
    parts = _part_of_nodes(src, width)
    order = np.argsort(parts, kind="stable")
    sorted_parts = parts[order]
    bounds = np.searchsorted(sorted_parts, np.arange(width + 1))
    taken = tab.take(order)
    return tuple(taken.slice(bounds[q], bounds[q + 1] - bounds[q])
                 .combine_chunks() for q in range(width))


def _assemble_part(*tabs) -> pa.Table:
    """Concat one partition's edge slices, dedupe, sort by (src, dst).

    take() (not slice) so the stored table owns compact buffers."""
    live = [t for t in tabs if t is not None and t.num_rows]
    if not live:
        return pa.table({"src": pa.array([], pa.int64()),
                         "dst": pa.array([], pa.int64())})
    t = pa.concat_tables(live)
    src = t.column("src").to_numpy()
    dst = t.column("dst").to_numpy()
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    uniq = np.empty(len(src), bool)
    uniq[0] = True
    np.logical_or(src[1:] != src[:-1], dst[1:] != dst[:-1], out=uniq[1:])
    return pa.table({"src": src[uniq], "dst": dst[uniq]})


def _cc_round(width: int, epart: pa.Table, lpart: pa.Table | None,
              *incoming):
    """One partition's round: merge incoming candidates (or initialize
    on round 0), emit (dst, label) candidates for sources whose label
    decreased, pre-split by hash(dst).

    Returns (labels_table, changed_count, out_0, ..., out_{width-1})."""
    src = epart.column("src").to_numpy()
    dst = epart.column("dst").to_numpy()

    if lpart is None:
        # round 0: nodes = unique sources (every node of the partition
        # appears as a source — edges are bidirectional), label =
        # min(self, neighbors); "moved" = label beat the node id
        nodes, starts = np.unique(src, return_index=True)
        if len(dst):
            gmin = np.minimum.reduceat(dst, starts)
            labels = np.minimum(nodes, gmin)
        else:
            labels = nodes.copy()
        moved = labels < nodes
    else:
        nodes = lpart.column("doc_id").to_numpy()
        labels = lpart.column("component").to_numpy().copy()
        cand_n = [t.column("doc_id").to_numpy()
                  for t in incoming if t.num_rows]
        if cand_n:
            cn = np.concatenate(cand_n)
            cl = np.concatenate([t.column("component").to_numpy()
                                 for t in incoming if t.num_rows])
            old = labels.copy()
            idx = np.searchsorted(nodes, cn)
            # candidates are routed by the same hash, so every cn is a
            # node of this partition; assert stays cheap and loud
            assert len(nodes) and (nodes[idx] == cn).all(), \
                "mis-routed component candidate"
            np.minimum.at(labels, idx, cl)
            moved = labels < old
        else:
            moved = np.zeros(len(nodes), bool)

    changed = int(moved.sum())
    out_tables = []
    if changed and len(src):
        epos = np.searchsorted(nodes, src)
        sel = moved[epos]
        elab = labels[epos[sel]]
        edst = dst[sel]
        useful = elab < edst
        edst, elab = edst[useful], elab[useful]
        parts = _part_of_nodes(edst, width)
        order = np.argsort(parts, kind="stable")
        sp, edst, elab = parts[order], edst[order], elab[order]
        bounds = np.searchsorted(sp, np.arange(width + 1))
        for q in range(width):
            lo, hi = bounds[q], bounds[q + 1]
            out_tables.append(pa.table({
                "doc_id": edst[lo:hi], "component": elab[lo:hi]}))
    else:
        empty = pa.table(_EMPTY_LABELS)
        out_tables = [empty] * width

    return (pa.table({"doc_id": nodes, "component": labels}),
            changed, *out_tables)


def connected_components_ds(pairs_ds, *, a_col: str = "doc_a",
                            b_col: str = "doc_b",
                            width: int | None = None,
                            max_rounds: int = 64):
    """Pairs Dataset -> (doc_id, component) Dataset, component = the
    smallest doc_id reachable through the pair graph.

    Only nodes that appear in at least one pair are emitted (an
    unpaired doc is trivially its own component; materializing the
    identity rows for 10^12 unpaired docs would be pure waste —
    ``near_dedup_keep_ds`` handles them by absence)."""
    import dint_ray

    dint_ray.ensure_tuned()
    import ray
    import ray.data as rd

    norm = pairs_ds.map_batches(_make_norm_edges(a_col, b_col),
                                batch_format="pyarrow").materialize()
    refs = [r for r in norm.to_arrow_refs()]
    num_edges = norm.count()
    if num_edges == 0:
        return rd.from_arrow(pa.table(_EMPTY_LABELS))
    width = _cc_width(width, num_edges)

    split = ray.remote(num_cpus=1, num_returns=width)(_split_edges)
    slices: list[list] = [[] for _ in range(width)]
    for r in refs:
        outs = split.remote(width, r)
        for q in range(width):
            slices[q].append(outs[q])
    asm = ray.remote(num_cpus=1)(_assemble_part)
    eparts = [asm.remote(*slices[p]) for p in range(width)]

    rnd = ray.remote(num_cpus=1, num_returns=width + 2)(_cc_round)
    lparts: list = [None] * width
    incoming: list[list] = [[] for _ in range(width)]
    # Batched fixpoint check: dispatch `sync_every` rounds of the task
    # graph before ONE driver sync on the LAST round's changed counts —
    # labels only decrease, so changed(r)==0 implies changed(r')==0 for
    # all r'>r and checking the batch tail is exact.  Removes the
    # per-round driver RTT barrier (round latency was driver RTT x
    # diameter); cost is at most sync_every-1 no-op rounds of cheap
    # zero-delta tasks after convergence.  The batch depth is capped by
    # the in-flight ref fan-out (width^2 refs per dispatched round).
    sync_every = 4 if width * width * 4 <= 1_500_000 else 2
    rounds_done = 0
    converged = False
    while rounds_done < max_rounds and not converged:
        last_changed = None
        for _ in range(min(sync_every, max_rounds - rounds_done)):
            changed_refs = []
            nxt: list[list] = [[] for _ in range(width)]
            for p in range(width):
                outs = rnd.remote(width, eparts[p], lparts[p], *incoming[p])
                lparts[p] = outs[0]
                changed_refs.append(outs[1])
                for q in range(width):
                    nxt[q].append(outs[2 + q])
            incoming = nxt
            last_changed = changed_refs
            rounds_done += 1
        converged = sum(ray.get(last_changed)) == 0
    if not converged:
        raise RuntimeError(
            f"connected components did not converge in {max_rounds} "
            "rounds — the pair graph has a component of diameter > "
            f"{max_rounds} (not a near-dup shape); raise max_rounds or "
            "switch to a star-contraction variant")
    LAST_RUN_INFO.clear()
    LAST_RUN_INFO.update({"rounds": rounds_done, "width": width,
                          "sync_every": sync_every,
                          "num_edges": num_edges})
    return rd.from_arrow_refs(lparts)


def near_dedup_keep_ds(docs_ds, pairs_ds, *, id_col: str = "doc_id",
                       a_col: str = "doc_a", b_col: str = "doc_b",
                       width: int | None = None):
    """Canonical-keep dedup: (doc_id) rows of every doc that survives —
    the minimum doc_id of each near-dup component plus every unpaired
    doc.

    Shape: component labels -> drop markers (label < doc_id) ->
    union-tag with the corpus ids -> ONE native groupby max -> filter.
    Native hash aggregation end to end, so it is exact no matter how
    the executor splits blocks, and the only payload on the exchange
    is (int64, int8) rows — the text never moves."""
    import dint_ray

    dint_ray.ensure_tuned()
    from ray.data.aggregate import Max

    labels = connected_components_ds(pairs_ds, a_col=a_col, b_col=b_col,
                                     width=width)

    def _corpus_ids(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).cast(pa.int64())
        return pa.table({"doc_id": ids,
                         "kind": pa.array(
                             np.zeros(b.num_rows, np.int8), pa.int8())})

    def _drop_marks(b: pa.Table) -> pa.Table:
        d = b.column("doc_id").to_numpy(zero_copy_only=False)
        c = b.column("component").to_numpy(zero_copy_only=False)
        dropped = d[c < d]
        return pa.table({"doc_id": dropped,
                         "kind": pa.array(
                             np.ones(len(dropped), np.int8), pa.int8())})

    tagged = (docs_ds.select_columns([id_col])
              .map_batches(_corpus_ids, batch_format="pyarrow")
              .union(labels.map_batches(_drop_marks,
                                        batch_format="pyarrow")))
    agg = tagged.groupby("doc_id").aggregate(Max("kind"))

    def _keep(b: pa.Table) -> pa.Table:
        agg_col = next(c for c in b.column_names if c != "doc_id")
        kept = b.filter(pc.equal(b.column(agg_col).cast(pa.int64()), 0))
        return pa.table({"doc_id": kept.column("doc_id").cast(pa.int64())})

    return agg.map_batches(_keep, batch_format="pyarrow")
