"""Packed stats exchange: the distributed branch of mine_stats_ray
(map-side bucket packing -> keyed exchange of list rows -> exact
numpy unpack-aggregate + winner preselect) must produce byte-identical
pattern-stats tables to the driver group_by branch.  Forced onto the
small fixture by patching STATS_DRIVER_AGG_MAX_ROWS to 0."""

import numpy as np
import pyarrow as pa
import pytest

import dint_ray.pipelines.build as B
from dint_ray.config import BuildConfig, DintConfig
from dint_ray.fixtures import pages_fixture_path
from dint_ray.postings import build_posting_lists, build_vocabulary, tokenize_rows


@pytest.fixture(scope="module")
def plists(ray_session):
    import ray.data as rd

    # serving tests from earlier modules leave cached bucket-owner
    # actors whose CPU reservations can starve this module's build on
    # the 4-CPU test session — release them first (bench.py does the
    # same before its dedup legs)
    from dint_ray.pipelines.partitioned import release_all_actors

    release_all_actors()
    pages_path = pages_fixture_path(400, 300, seed=5)
    ds = rd.read_parquet(pages_path, columns=["doc_id", "text"])
    rows = tokenize_rows(ds, BuildConfig())
    vocab = build_vocabulary(rows)
    return build_posting_lists(rows, vocab).materialize()


@pytest.mark.parametrize("kind", ["single_packed", "multi_packed"])
def test_packed_exchange_matches_driver_branch(plists, tmp_path,
                                               monkeypatch, kind):
    d = tmp_path / kind
    d.mkdir()
    docs_a, freqs_a = B.mine_stats_ray(
        plists, kind, str(d / "a_docs.parquet"), str(d / "a_freqs.parquet"))
    monkeypatch.setattr(B, "STATS_DRIVER_AGG_MAX_ROWS", 0)
    docs_b, freqs_b = B.mine_stats_ray(
        plists, kind, str(d / "b_docs.parquet"), str(d / "b_freqs.parquet"))
    # multi-node locality mode: map-side pre-split per bucket must be
    # byte-identical too
    monkeypatch.setenv("DINT_EXCHANGE_MAP_SPLIT", "1")
    docs_c, freqs_c = B.mine_stats_ray(
        plists, kind, str(d / "c_docs.parquet"), str(d / "c_freqs.parquet"))
    for a, b in ((docs_a, docs_b), (freqs_a, freqs_b),
                 (docs_a, docs_c), (freqs_a, freqs_c)):
        assert a.num_rows == b.num_rows
        assert a.equals(b)


def test_pack_roundtrip_preserves_multiset():
    rng = np.random.default_rng(7)
    n = 5000
    t = pa.table({
        "stream": pa.array(rng.integers(0, 2, n, dtype=np.uint8)),
        "ctx": pa.array(rng.integers(0, 8, n, dtype=np.uint8)),
        "size": pa.array(rng.integers(1, 17, n, dtype=np.uint8)),
        "hash": pa.array(rng.integers(-2**63, 2**63 - 1, n, dtype=np.int64)),
        "freq": pa.array(rng.integers(1, 100, n).astype(np.uint64)),
    })
    packed = B._pack_stats_block(t, width=7)
    assert packed.column("part").to_numpy().dtype == np.uint32
    # every bucket holds only hashes mapping to it
    for row in packed.to_pylist():
        hs = np.asarray(row["hash"], dtype=np.int64).view(np.uint64)
        assert (hs % np.uint64(7) == row["part"]).all()
    # flatten back and compare as sorted multisets
    flat = {name: B._flat_list_column(packed.column(name), dt)
            for name, dt in (("stream", np.uint8), ("ctx", np.uint8),
                             ("size", np.uint8), ("hash", np.int64),
                             ("freq", np.uint64))}
    orig = {name: t.column(name).to_numpy() for name in flat}
    key_a = np.lexsort((orig["freq"], orig["stream"], orig["ctx"],
                        orig["size"], orig["hash"]))
    key_b = np.lexsort((flat["freq"], flat["stream"], flat["ctx"],
                        flat["size"], flat["hash"]))
    for name in flat:
        assert (orig[name][key_a] == flat[name][key_b]).all()


def test_agg_packed_block_exact_sums():
    cfg = DintConfig()
    # duplicate keys across two packed rows -> sums must combine exactly
    t = pa.table({
        "stream": pa.array(np.zeros(6, np.uint8)),
        "ctx": pa.array(np.zeros(6, np.uint8)),
        "size": pa.array(np.array([4, 4, 4, 8, 8, 8], np.uint8)),
        "hash": pa.array(np.array([11, 11, 22, 22, 33, 33], np.int64)),
        "freq": pa.array(np.array([5, 7, 1, 2, 9, 100], np.uint64)),
    })
    packed = B._pack_stats_block(t, width=1)
    out = B._agg_packed_block(packed, totals={0: 1000, 1: 1000},
                              cfg=cfg, nctx=1)
    got = {(int(s), int(h)): int(f) for s, h, f in zip(
        out.column("size").to_pylist(), out.column("hash").to_pylist(),
        out.column("freq").to_pylist())}
    assert got == {(4, 11): 12, (4, 22): 1, (8, 22): 2, (8, 33): 109}
