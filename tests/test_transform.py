"""mixed_block transform: an existing index re-encoded block by block
on the space/decode-time frontier (mixed_block.hpp:153-196
block_transformer + dec_time_prediction), driven by per-term access
counts.  The transform must be lossless and wire-compatible with the
block_mixed reader."""

import json
import os

import numpy as np
import pytest

from dint_ray.fixtures import pages_fixture_path
from dint_ray.pipelines.build import build_index_ray, load_built_index
from dint_ray.pipelines.transform import transform_index_mixed

N_DOCS = 300
VOCAB = 200


@pytest.fixture(scope="module")
def source(ray_session, tmp_path_factory):
    pages = pages_fixture_path(N_DOCS, VOCAB, seed=9)
    out = str(tmp_path_factory.mktemp("src_index"))
    build_index_ray(pages, out, kind="single_packed", num_shards=2)
    return out


def test_transform_lossless_and_readable(source, tmp_path):
    out = str(tmp_path / "mixed")
    profile = {0: 50, 1: 10}  # skewed access: hot terms lean to speed
    manifest = transform_index_mixed(source, out, space_budget_ratio=1.3,
                                     profile=profile, sample_blocks=512,
                                     num_shards=2, concurrency=2)
    assert manifest["dict_kind"] == "block_mixed"
    assert manifest["transform"]["source_kind"] == "single_packed"
    assert manifest["transform"]["lambda"] >= 0.0

    src_idx, _, src_m = load_built_index(source)
    mix_idx, _, mix_m = load_built_index(out)
    assert mix_m["num_docs"] == src_m["num_docs"]
    assert set(mix_idx.payloads) == set(src_idx.payloads)
    for tid in src_idx.payloads:
        sd, sf = src_idx.decode(tid)
        md, mf = mix_idx.decode(tid)
        np.testing.assert_array_equal(sd, md)
        np.testing.assert_array_equal(sf, mf)


def test_budget_ratio_bounds_space(source, tmp_path):
    """The tightest ratio (1.0) must not be larger than a loose one,
    and both stay decodable."""
    sizes = {}
    for ratio in (1.0, 4.0):
        out = str(tmp_path / f"mixed_{ratio}")
        transform_index_mixed(source, out, space_budget_ratio=ratio,
                              sample_blocks=512, num_shards=2,
                              concurrency=2)
        with open(os.path.join(out, "manifest.json")) as f:
            m = json.load(f)
        sizes[ratio] = sum(s["bytes"] for s in m["shards"])
        idx, _, _ = load_built_index(out)
        tid = next(iter(idx.payloads))
        assert len(idx.decode(tid)[0]) > 0
    assert sizes[1.0] <= sizes[4.0] * 1.05  # tight <= loose (tolerance: parquet overhead)
