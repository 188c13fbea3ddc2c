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


def test_tokenizer_arrow_equals_python():
    """The vectorized Arrow tokenizer path must produce the same
    (doc_id, term, tf) multiset as the per-doc regex+Counter reference
    path on edge shapes (empty docs, punctuation-only, unicode,
    repeated tokens, leading/trailing separators)."""
    import numpy as np
    import pyarrow as pa

    from dint_ray.tokenize import Tokenizer

    texts = ["Hello, World 42! hello", "", "  --- ", "a b A B 9x9 a a",
             "ümlaut Straße mixé", "0", "x" * 5000,
             "tab\tnewline\nmix 3x 3x"]
    ids = np.arange(len(texts), dtype=np.uint64)
    tok = Tokenizer()
    got = tok._tokenize_arrow(ids, pa.array(texts))
    want = tok._tokenize_python(ids, texts)

    def as_set(t):
        return set(zip(t.column("doc_id").to_pylist(),
                       t.column("term").to_pylist(),
                       t.column("tf").to_pylist()))

    assert as_set(got) == as_set(want)
    assert got.schema == want.schema


def test_tokenizer_arrow_matches_duckdb_lower():
    """On characters where Python str.lower() and SQL lower() diverge
    (e.g. 'İ' -> 'i' + combining dot in Python, plain 'i' in DuckDB and
    Arrow), the production Arrow path must side with the DuckDB oracle
    — the oracle_sql() contract is regexp_extract_all(lower(text),
    '[a-z0-9]+')."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    from dint_ray.tokenize import Tokenizer

    texts = ["İstanbul KAYIĞI", "ĄĆĘ Ł ŃÓŚŹŻ"]
    got = Tokenizer()._tokenize_arrow(
        np.arange(len(texts), dtype=np.uint64), pa.array(texts))
    con = duckdb.connect()
    want = set()
    for i, t in enumerate(texts):
        toks = con.execute(
            "select regexp_extract_all(lower(?), '[a-z0-9]+')", [t]
        ).fetchone()[0]
        for tok in set(toks):
            want.add((i, tok, toks.count(tok)))
    have = set(zip(got.column("doc_id").to_pylist(),
                   got.column("term").to_pylist(),
                   got.column("tf").to_pylist()))
    assert have == want
