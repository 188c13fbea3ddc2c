"""Decode-time prediction for the mixed per-block codec.

Mirrors the reference's time-prediction library
(/root/reference/include/ds2i/dec_time_prediction.hpp:13-160 and
mixed_block::compute_space_time, mixed_block.hpp:119-150):

- ``values_statistics`` extracts the same feature vector over a block's
  sorted values: n, size (bytes, filled after encode), sum_of_logs,
  entropy, nonzeros, max_b — plus optpfor's pfor_b / pfor_exceptions
  when the candidate is pfor;
- ``Predictor`` is the same linear model (bias + w . features);
- ``fit_predictors`` replaces the reference's offline profiling run
  (its weights file is produced on the target machine by timing block
  decodes): synthetic blocks across magnitudes are encoded per
  candidate, decode wall-time is measured, and per-candidate weights
  come from a least-squares fit;
- ``compute_space_time`` returns (predicted_time*access_count, space,
  tag) points per candidate, and ``select`` / ``select_budget``
  implement the Pareto consumption: per-block argmin of
  ``time + lam * space``, with ``select_budget`` bisecting the
  Lagrange multiplier until the summed space meets a budget (the
  transform the reference applies with block_profiler access counts).

Candidate tags match dint_ray.codecs.mixed's wire format, so a
selection produced here can be written through the same decoder.
"""

from __future__ import annotations

import time

import numpy as np

from dint_ray.config import U32_INVALID

FEATURES = ("n", "size", "sum_of_logs", "entropy", "nonzeros", "max_b",
            "pfor_b", "pfor_exceptions")


def values_statistics(values: np.ndarray) -> dict[str, float]:
    """Reference's values_statistics (dec_time_prediction.hpp:108-142):
    run-length grouped stats over the SORTED values."""
    f = dict.fromkeys(FEATURES, 0.0)
    v = np.sort(np.asarray(values, dtype=np.uint64))
    f["n"] = float(len(v))
    if not len(v):
        return f
    uniq, counts = np.unique(v, return_counts=True)
    cf = counts.astype(np.float64)
    f["entropy"] = float(np.sum(cf * np.log2(len(v) / cf)))
    f["sum_of_logs"] = float(np.sum(cf * np.log2(uniq.astype(np.float64) + 1)))
    f["nonzeros"] = float(np.sum(counts[uniq != 0]))
    f["max_b"] = float(int(uniq[-1]).bit_length())
    return f


class Predictor:
    """bias + w . features (dec_time_prediction.hpp:74-105)."""

    def __init__(self, weights: dict[str, float] | None = None,
                 bias: float = 0.0) -> None:
        self.bias = bias
        self.weights = dict.fromkeys(FEATURES, 0.0)
        if weights:
            self.weights.update(weights)

    def __call__(self, features: dict[str, float]) -> float:
        return self.bias + sum(self.weights[k] * features.get(k, 0.0)
                               for k in FEATURES)


def _candidates():
    from dint_ray.codecs import mixed

    return mixed._candidates()


def _pfor_features(values: np.ndarray, f: dict[str, float]) -> None:
    from dint_ray.codecs import optpfor

    b, exceptions = optpfor.block_stats(values)
    f["pfor_b"] = float(b)
    f["pfor_exceptions"] = float(exceptions)


def block_features(values: np.ndarray, tag: int,
                   encoded_size: int) -> dict[str, float]:
    f = values_statistics(values)
    f["size"] = float(encoded_size)
    if tag == 1:  # pfor candidate gets its encoder stats
        _pfor_features(values, f)
    return f


def _measure_decode_ns(mod, blob: bytes, sov: int, n: int,
                       repeats: int = 9) -> float:
    buf = np.frombuffer(blob, dtype=np.uint8)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter_ns()
        mod.decode(buf, 0, sov, n)
        best = min(best, float(time.perf_counter_ns() - t0))
    return best


def _sample_blocks(block_size: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    blocks = []
    for mag in (1, 2, 4, 6, 8, 12, 16, 20, 24):
        for _ in range(3):
            blocks.append(rng.integers(
                0, 1 << mag, size=block_size).astype(np.uint32))
    # runs of equal values and zero-heavy blocks (entropy/nonzeros axes)
    blocks.append(np.zeros(block_size, dtype=np.uint32))
    blocks.append(np.repeat(
        rng.integers(0, 256, size=block_size // 8).astype(np.uint32), 8))
    return blocks


def fit_predictors(block_size: int = 256,
                   seed: int = 7) -> dict[int, Predictor]:
    """Per-candidate least-squares fit of decode-time (ns) on this
    machine — the runtime equivalent of the reference's profiled
    weights file."""
    preds: dict[int, Predictor] = {}
    blocks = _sample_blocks(block_size, seed)
    for tag, mod in _candidates():
        rows, times = [], []
        for v in blocks:
            sov = int(v.sum())
            blob = mod.encode(v, sov)
            f = block_features(v, tag, len(blob))
            rows.append([1.0] + [f[k] for k in FEATURES])
            times.append(_measure_decode_ns(mod, blob, sov, len(v)))
        X = np.asarray(rows, dtype=np.float64)
        y = np.asarray(times, dtype=np.float64)
        w, *_ = np.linalg.lstsq(X, y, rcond=None)
        preds[tag] = Predictor(dict(zip(FEATURES, w[1:])), bias=float(w[0]))
    return preds


def compute_space_time(values: np.ndarray, sum_of_values: int,
                       predictors: dict[int, Predictor],
                       access_count: int = 1,
                       block_size: int = 256):
    """(predicted_ns, space_bytes, tag) per viable candidate — the
    mirror of mixed_block::compute_space_time (mixed_block.hpp:119-150).
    Time is predicted only for full blocks, as in the reference."""
    points = []
    for tag, mod in _candidates():
        if tag == 0 and sum_of_values == U32_INVALID:
            continue
        blob = mod.encode(values, sum_of_values)
        t = 0.0
        if len(values) == block_size:
            t = predictors[tag](block_features(values, tag, len(blob))) \
                * access_count
        points.append((t, len(blob) + 1, tag))  # +1: the type tag byte
    return points


def select(points, lam: float) -> int:
    """Per-block choice: argmin time + lam * space (ties -> smaller
    space, then smaller tag — deterministic)."""
    return min(points, key=lambda p: (p[0] + lam * p[1], p[1], p[2]))[2]


def select_budget(points_per_block: list, space_budget: int,
                  iters: int = 40):
    """Bisect the Lagrange multiplier until total space fits the
    budget; returns (tags, total_space, total_time, lam).  lam=0 is the
    pure-speed corner; lam->inf the pure-space corner (what the plain
    ``mixed`` codec ships)."""

    def run(lam: float):
        tags = [select(p, lam) for p in points_per_block]
        space = sum(next(s for t, s, g in p if g == tag)
                    for p, tag in zip(points_per_block, tags))
        tm = sum(next(t for t, s, g in p if g == tag)
                 for p, tag in zip(points_per_block, tags))
        return tags, space, tm

    lo, hi = 0.0, 1.0
    tags, space, tm = run(lo)
    if space <= space_budget:
        return tags, space, tm, lo
    while run(hi)[1] > space_budget and hi < 1e12:
        hi *= 16
    for _ in range(iters):
        mid = (lo + hi) / 2
        if run(mid)[1] > space_budget:
            lo = mid
        else:
            hi = mid
    tags, space, tm = run(hi)
    return tags, space, tm, hi
