"""Connected components + canonical-keep dedup: exactness vs a Python
union-find on random graphs, convergence on worst-case chains, and the
keep semantics (A~B~C keeps exactly min)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from dint_ray.ops.components import (
    connected_components_ds,
    near_dedup_keep_ds,
)


def _pairs(edges):
    a = [int(x) for x, _ in edges]
    b = [int(y) for _, y in edges]
    return rd.from_arrow(pa.table({
        "doc_a": pa.array(a, pa.int64()),
        "doc_b": pa.array(b, pa.int64()),
    }))


def _union_find(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-of-component labels
    comp = {}
    for n in list(parent):
        comp.setdefault(find(n), []).append(n)
    out = {}
    for root, members in comp.items():
        m = min(members + [root])
        for n in members:
            out[n] = m
    return out


def _labels_dict(ds):
    return {r["doc_id"]: r["component"] for r in ds.take_all()}


@pytest.mark.usefixtures("ray_session")
def test_components_random_graph_matches_union_find():
    rng = np.random.default_rng(42)
    nodes = rng.choice(10_000, size=400, replace=False)
    edges = [(int(nodes[i]), int(nodes[j]))
             for i, j in rng.integers(0, len(nodes), size=(300, 2))
             if i != j]
    got = _labels_dict(connected_components_ds(_pairs(edges), width=8))
    want = _union_find(edges)
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_components_chain_converges():
    # worst-case diameter for its size: a single path graph
    edges = [(i, i + 1) for i in range(60)]
    got = _labels_dict(connected_components_ds(_pairs(edges), width=4))
    assert got == {i: 0 for i in range(61)}


@pytest.mark.usefixtures("ray_session")
def test_components_reversed_and_duplicate_pairs():
    edges = [(5, 3), (3, 5), (5, 3), (9, 9), (7, 8)]
    got = _labels_dict(connected_components_ds(_pairs(edges), width=8))
    # self-loop (9,9) is dropped entirely; unpaired nodes absent
    assert got == {3: 3, 5: 3, 7: 7, 8: 7}


@pytest.mark.usefixtures("ray_session")
def test_components_empty_pairs():
    ds = connected_components_ds(_pairs([]), width=8)
    assert ds.count() == 0
    assert set(ds.schema().names) == {"doc_id", "component"}


@pytest.mark.usefixtures("ray_session")
def test_components_max_rounds_guard():
    edges = [(i, i + 1) for i in range(30)]
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_ds(_pairs(edges), width=4, max_rounds=2)


@pytest.mark.usefixtures("ray_session")
def test_near_dedup_keep_transitive():
    """A~B~C must keep exactly min(A,B,C) — the case pairwise dropping
    gets wrong."""
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(10)), pa.int64()),
        "text": pa.array([f"t{i}" for i in range(10)], pa.string()),
    }))
    pairs = _pairs([(1, 2), (2, 3), (7, 8)])
    kept = sorted(r["doc_id"] for r in
                  near_dedup_keep_ds(docs, pairs).take_all())
    assert kept == [0, 1, 4, 5, 6, 7, 9]


@pytest.mark.usefixtures("ray_session")
def test_near_dedup_keep_no_pairs_keeps_all():
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([4, 7, 9], pa.int64()),
        "text": pa.array(["a", "b", "c"], pa.string()),
    }))
    kept = sorted(r["doc_id"] for r in
                  near_dedup_keep_ds(docs, _pairs([])).take_all())
    assert kept == [4, 7, 9]


def test_cc_width_scales_with_edges():
    from dint_ray.ops.components import (_CC_EDGES_PER_PART,
                                         _CC_MAX_WIDTH, _cc_width)

    explicit = _cc_width(17)
    assert explicit == 17
    base = _cc_width(None)
    assert base >= 8
    # small graphs stay at the CPU-count floor
    assert _cc_width(None, 1_000) == base
    # large graphs grow ~|E| / edges-per-part, capped
    assert _cc_width(None, 100 * _CC_EDGES_PER_PART) == max(base, 100)
    assert _cc_width(None, 10**12) == _CC_MAX_WIDTH


def test_components_wide_width_matches_union_find(ray_session):
    """Correctness is width-independent: force a width far above the
    old 64 cap on a small graph (many empty partitions)."""
    import ray.data as rd

    from dint_ray.ops.components import connected_components_ds

    rng = np.random.default_rng(41)
    edges = [(int(a), int(b)) for a, b in
             rng.integers(0, 300, size=(500, 2)) if a != b]
    got = _labels_dict(connected_components_ds(_pairs(edges), width=97))
    assert got == _union_find(edges)


@pytest.mark.usefixtures("ray_session")
def test_components_batched_sync_records_run_info():
    # the fixpoint checks changed-counts only every sync_every rounds;
    # convergence detection stays exact (labels only decrease) and the
    # run diagnostics are recorded for bench.py's round-latency table
    from dint_ray.ops.components import LAST_RUN_INFO

    edges = [(i, i + 1) for i in range(40)]
    got = _labels_dict(connected_components_ds(_pairs(edges), width=4))
    assert got == {i: 0 for i in range(41)}
    assert 0 < LAST_RUN_INFO["rounds"] <= 64
    assert LAST_RUN_INFO["width"] == 4
    assert LAST_RUN_INFO["sync_every"] >= 1
    assert LAST_RUN_INFO["num_edges"] > 0
