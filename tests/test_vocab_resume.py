"""Resume keeps the vocabulary path decision: a build that chose the
dataset-join path must not flip to the driver-broadcast path on resume
(the two decisions used different metrics — df-partial rows vs unique
terms — so a resumed large build could silently re-materialize the
term table per actor)."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest

from dint_ray.fixtures import pages_fixture_path

N_DOCS, VOCAB = 400, 60


def _partial_build(tmp_path_factory, mode: str) -> str:
    """Run a build up to the vocabulary checkpoint, then erase the later
    artifacts so the next call resumes from vocab.parquet."""
    import shutil

    from dint_ray.config import BuildConfig
    from dint_ray.pipelines.build import build_index_ray

    out = str(tmp_path_factory.mktemp(f"vres_{mode}"))
    pages = pages_fixture_path(N_DOCS, VOCAB, seed=23)
    build_index_ray(pages, out, kind="single_packed",
                    bcfg=BuildConfig(vocab_mode=mode))
    for name in os.listdir(out):
        if name not in ("vocab.parquet", "vocab_meta.json"):
            p = os.path.join(out, name)
            shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
    return out


@pytest.mark.parametrize("mode,expected", [("dataset", True),
                                           ("driver", False)])
def test_resume_reads_persisted_vocab_decision(ray_session,
                                               tmp_path_factory,
                                               mode, expected):
    from dint_ray.config import BuildConfig
    from dint_ray.pipelines.build import build_index_ray

    out = _partial_build(tmp_path_factory, mode)
    with open(os.path.join(out, "vocab_meta.json")) as f:
        assert json.load(f)["use_join"] is expected

    # resume in auto mode: the marker, not the unique-term count, must
    # pick the path (the tiny fixture is far below any threshold, so
    # without the marker auto would always choose the broadcast path)
    m = build_index_ray(pages_fixture_path(N_DOCS, VOCAB, seed=23), out,
                        kind="single_packed",
                        bcfg=BuildConfig(vocab_mode="auto"))
    assert m["num_docs"] == N_DOCS
    vt = pq.read_table(os.path.join(out, "vocab.parquet"))
    assert m["num_terms"] == vt.num_rows


def test_resumed_join_build_matches_fresh(ray_session, tmp_path_factory):
    """The resumed dataset-path build must produce the same index rows
    as an uninterrupted one."""
    from dint_ray.config import BuildConfig
    from dint_ray.pipelines.build import build_index_ray, load_built_index

    pages = pages_fixture_path(N_DOCS, VOCAB, seed=23)
    resumed_dir = _partial_build(tmp_path_factory, "dataset")
    build_index_ray(pages, resumed_dir, kind="single_packed",
                    bcfg=BuildConfig(vocab_mode="auto"))

    fresh_dir = str(tmp_path_factory.mktemp("vres_fresh"))
    build_index_ray(pages, fresh_dir, kind="single_packed",
                    bcfg=BuildConfig(vocab_mode="dataset"))

    ia, wa, _ = load_built_index(resumed_dir)
    ib, wb, _ = load_built_index(fresh_dir)
    assert set(ia.payloads) == set(ib.payloads)
    for tid in ia.payloads:
        assert ia.payloads[tid] == ib.payloads[tid], tid
