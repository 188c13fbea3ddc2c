"""Decode-time prediction model (mixed_block's learned selector).

Mirrors what the reference pins about its time-prediction library
(/root/reference/include/ds2i/dec_time_prediction.hpp,
mixed_block.hpp:119-150): feature extraction semantics, the linear
predictor, space-time point computation per candidate, and the
Lagrangian budget selection.
"""

import numpy as np

from dint_ray.config import U32_INVALID
from dint_ray.dint import dectime


def test_values_statistics_hand_computed():
    # sorted: [0, 0, 3, 3, 3, 7] -> groups {0:2, 3:3, 7:1}
    v = np.array([3, 0, 7, 3, 0, 3], dtype=np.uint32)
    f = dectime.values_statistics(v)
    assert f["n"] == 6
    assert f["nonzeros"] == 4
    assert f["max_b"] == 3  # 7 needs 3 bits
    want_entropy = 2 * np.log2(6 / 2) + 3 * np.log2(6 / 3) + 1 * np.log2(6)
    assert abs(f["entropy"] - want_entropy) < 1e-9
    want_sol = 2 * np.log2(1) + 3 * np.log2(4) + 1 * np.log2(8)
    assert abs(f["sum_of_logs"] - want_sol) < 1e-9


def test_predictor_linear_form():
    p = dectime.Predictor({"n": 2.0, "max_b": 0.5}, bias=10.0)
    assert p({"n": 256.0, "max_b": 8.0}) == 10.0 + 512.0 + 4.0


def test_pfor_features_match_encoder_state():
    from dint_ray.codecs import optpfor

    rng = np.random.default_rng(3)
    v = rng.integers(0, 1 << 10, size=256).astype(np.uint32)
    b, exc = optpfor.block_stats(v)
    f = dectime.block_features(v, tag=1, encoded_size=123)
    assert f["pfor_b"] == float(b)
    assert f["pfor_exceptions"] == float(exc)
    assert f["size"] == 123.0


def test_fit_and_space_time_points():
    preds = dectime.fit_predictors(block_size=256)
    rng = np.random.default_rng(11)
    v = rng.integers(0, 1 << 8, size=256).astype(np.uint32)
    pts = dectime.compute_space_time(v, int(v.sum()), preds,
                                     access_count=1)
    tags = {t for _, _, t in pts}
    assert tags == {0, 1, 2, 3}
    # partial block: no time prediction (reference predicts full blocks
    # only), and interpolative skipped when the sum is unknown
    short = v[:100]
    pts_s = dectime.compute_space_time(short, U32_INVALID, preds)
    assert all(t != 0 for _, _, t in pts_s)
    assert all(p[0] == 0.0 for p in pts_s)
    # access_count scales predicted time linearly
    p1 = dectime.compute_space_time(v, int(v.sum()), preds, access_count=1)
    p5 = dectime.compute_space_time(v, int(v.sum()), preds, access_count=5)
    for a, b in zip(p1, p5):
        assert abs(b[0] - 5 * a[0]) < 1e-6


def test_select_corners_and_budget():
    # per block: tag 2 is fast+big, tag 1 slow+small; the slow penalty
    # grows with block index so the multiplier can mix the selection
    points = [[(100.0 * (i + 1), 50, 1), (10.0, 200, 2)]
              for i in range(4)]
    assert dectime.select(points[0], lam=0.0) == 2      # speed corner
    assert dectime.select(points[0], lam=1e9) == 1      # space corner
    # budget 500 admits at most 2 fast blocks (k*200 + (4-k)*50 <= 500)
    # and the Lagrangian keeps fast the blocks with the WORST slow time
    tags, space, tm, lam = dectime.select_budget(points, space_budget=500)
    assert space <= 500
    assert tags == [1, 1, 2, 2]
    # generous budget -> all fast
    tags, space, _, _ = dectime.select_budget(points, space_budget=10_000)
    assert tags == [2, 2, 2, 2]


def test_budget_selection_on_real_blocks():
    preds = dectime.fit_predictors(block_size=256)
    rng = np.random.default_rng(21)
    blocks = [rng.integers(0, 1 << m, size=256).astype(np.uint32)
              for m in (2, 6, 10, 16)]
    pts = [dectime.compute_space_time(v, int(v.sum()), preds)
           for v in blocks]
    min_space = sum(min(s for _, s, _ in p) for p in pts)
    tags, space, _, _ = dectime.select_budget(pts, space_budget=min_space)
    assert space <= min_space  # tightest budget reachable -> space corner
    for p, tag in zip(pts, tags):
        assert tag in {t for _, _, t in p}
