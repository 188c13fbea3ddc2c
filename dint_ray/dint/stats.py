"""Gap-pattern frequency statistics (DINT dictionary mining).

Re-expresses /root/reference/include/dint/statistics_collectors.hpp
(adjusted::collect, :82-119) and block_statistics.hpp:16-359:

- single-dict stats: for each target size s in {16,8,4,2,1}, count every
  *aligned* s-gram of each list's gap buffer (truncated to n//s*s);
- multi-dict stats: only complete 256-blocks are counted; each block's
  s-grams go to the context map chosen by the block-max selector
  (ceil_log2(ceil_log2(max+1)));
- selection: keep pattern iff saving = freq*(48*len - 16)/total_ints >
  eps/1000 (dictionary_builders.hpp:15-53) OR len == 1 (singletons,
  block_statistics.hpp:87-95); sort by (freq desc, len desc).

Determinism fix (SURVEY.md §7.4.6): the reference's sort input comes
from unordered_map iteration, so ties are nondeterministic there.  We
use the total order (freq desc, len desc, pattern lex asc) everywhere.

Distribution (SURVEY.md §2.5 D1): the per-buffer kernel here is the
map-side combine; partial counts are tiny (pattern, ctx, freq) rows
and the global groupby((ctx, pattern)).sum is the only shuffle.  The
extreme-skew head keys (all-zero runs) are already collapsed to one
row per batch by the combine.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from dint_ray.config import RESERVED, DintConfig
from dint_ray.util import selector_codes

TARGET_SIZES = (16, 8, 4, 2, 1)
BLOCK_SIZE = 256


def docs_gap_buffer(docs: np.ndarray) -> np.ndarray:
    """d-gaps with prev starting at -1 (block_statistics.hpp:68-76)."""
    d = docs.astype(np.int64, copy=False)
    g = np.empty(len(d), dtype=np.int64)
    g[0] = d[0]
    g[1:] = d[1:] - d[:-1] - 1
    return g.astype(np.uint32)


def freqs_gap_buffer(freqs: np.ndarray) -> np.ndarray:
    """freq - 1 (compute_gaps=false path: value - 0 - 1)."""
    return (freqs.astype(np.int64, copy=False) - 1).astype(np.uint32)


def _count_aligned(buf: np.ndarray, counts: dict) -> None:
    """Aligned s-gram counting for all target sizes into counts[bytes]."""
    for s in TARGET_SIZES:
        m = len(buf) // s * s
        if not m:
            continue
        win = np.ascontiguousarray(buf[:m].reshape(-1, s).astype("<u4"))
        flat = win.view(np.dtype((np.void, 4 * s))).ravel()
        uniq, c = np.unique(flat, return_counts=True)
        for pat, n in zip(uniq, c):
            key = pat.tobytes()
            counts[key] = counts.get(key, 0) + int(n)


def collect_single(buffers) -> tuple[dict[bytes, int], int]:
    """Single-dict stats over an iterable of gap buffers.

    Returns ({pattern_bytes: freq}, total_integers)."""
    counts: dict[bytes, int] = {}
    total = 0
    for buf in buffers:
        if len(buf) == 0:
            continue
        total += len(buf)
        _count_aligned(buf, counts)
    return counts, total


def collect_multi(buffers, num_selectors: int = 6) -> tuple[list[dict[bytes, int]], int]:
    """Multi-dict stats: complete 256-blocks only, per-context maps."""
    maps: list[dict[bytes, int]] = [dict() for _ in range(num_selectors)]
    total = 0
    for buf in buffers:
        if len(buf) == 0:
            continue
        total += len(buf)
        nblocks = len(buf) // BLOCK_SIZE
        if not nblocks:
            continue
        blocks = buf[: nblocks * BLOCK_SIZE].reshape(nblocks, BLOCK_SIZE)
        ctxs = selector_codes(blocks.max(axis=1))
        for ctx in np.unique(ctxs):
            sel = np.ascontiguousarray(blocks[ctxs == ctx]).ravel()
            _count_aligned(sel, maps[int(ctx)])
    return maps, total


def merge_counts(parts: list[dict[bytes, int]]) -> dict[bytes, int]:
    out: dict[bytes, int] = defaultdict(int)
    for p in parts:
        for k, v in p.items():
            out[k] += v
    return dict(out)


def select_targets(counts: dict[bytes, int], total_integers: int,
                   cfg: DintConfig = DintConfig()) -> list[np.ndarray]:
    """Cost filter + (freq desc, len desc, lex asc) sort + top-K.

    saving(freq, len) = freq * (3*b*len - b) / total, b = 16 bits
    (dictionary_builders.hpp:15-33: initial_bpi = 3*log2(num_entries))."""
    cw_bits = float(cfg.log2_num_entries)
    initial_bpi = 3.0 * cw_bits
    thr = cfg.dsf_filter_threshold
    kept = []
    for pat, freq in counts.items():
        ln = len(pat) // 4
        saving = freq * (initial_bpi * ln - cw_bits) / max(total_integers, 1)
        if saving > thr or ln == 1:
            kept.append((freq, ln, pat))
    kept.sort(key=lambda t: (-t[0], -t[1], t[2]))
    top = kept[: cfg.num_entries - RESERVED]
    return [np.frombuffer(pat, dtype="<u4").copy() for _, _, pat in top]


def select_targets_multi(maps: list[dict[bytes, int]], total_integers: int,
                         cfg: DintConfig = DintConfig()) -> list[list[np.ndarray]]:
    return [select_targets(m, total_integers, cfg) for m in maps]
