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


# --------------------------------------------------------------------------
# hash-keyed counting (the scale path)
#
# The reference's collectors key their frequency maps by murmur64 of the
# pattern (statistics_collectors.hpp:66-80, hash_utils.hpp:7-80); we take
# the same stance end-to-end: count by 64-bit window hash (pure numpy,
# no per-window Python), select winners on (freq desc, len desc, hash
# asc), then RESOLVE only the winning hashes back to pattern bytes in a
# second scan.  A hash collision merges two patterns' counts — same
# failure mode as the reference's maps; resolution takes the
# lexicographically smallest colliding pattern, deterministically.
# --------------------------------------------------------------------------

def aligned_hashes(buf: np.ndarray, s: int) -> np.ndarray:
    """64-bit hash of every aligned s-gram of ``buf`` (C kernel when
    available — value-identical, asserted in tests — else numpy)."""
    from dint_ray import native

    got = native.aligned_hashes(buf, s)
    if got is not None:
        return got
    from dint_ray.util import _M, _finalize

    m = len(buf) // s * s
    if not m:
        return np.empty(0, dtype=np.uint64)
    w = buf[:m].reshape(-1, s).astype(np.uint64)
    h = np.zeros(len(w), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(s):
            h = h * _M + w[:, j]
    return _finalize(h, s)


def _concat_aligned(buffers, s: int) -> np.ndarray:
    """Concatenate each buffer's aligned prefix (len//s*s).  Every
    piece's length is a multiple of s, so window alignment within each
    buffer is preserved in the flat array — one vectorized hash pass
    replaces one pass per buffer (the per-list numpy-call overhead was
    the resolve stage's entire cost at 24 CPUs)."""
    pieces = [b[: len(b) // s * s] for b in buffers if len(b) >= s]
    if not pieces:
        return np.empty(0, dtype=np.uint32)
    return pieces[0] if len(pieces) == 1 else np.concatenate(pieces)


def _all_blocks(buffers) -> np.ndarray:
    """All complete 256-blocks of all buffers as one (n, 256) matrix."""
    pieces = [b[: (len(b) // BLOCK_SIZE) * BLOCK_SIZE]
              for b in buffers if len(b) >= BLOCK_SIZE]
    if not pieces:
        return np.empty((0, BLOCK_SIZE), dtype=np.uint32)
    return np.concatenate(pieces).reshape(-1, BLOCK_SIZE)


def hash_counts_single(buffers):
    """-> (sizes u8, hashes u64, freqs u64, total_integers)."""
    total = sum(len(b) for b in buffers)
    acc: dict[tuple[int, int], list] = {}
    for s in TARGET_SIZES:
        h = aligned_hashes(_concat_aligned(buffers, s), s)
        if len(h):
            acc[(0, s)] = [h]
    return (*_unique_per_key(acc)[1:], total)


def hash_counts_multi(buffers, num_selectors: int = 6):
    """-> (ctxs u8, sizes u8, hashes u64, freqs u64, total_integers).

    Blocks are grouped by selector context ACROSS buffers: windows
    never cross block boundaries (256 % s == 0 for every target size),
    so the multiset of counted windows per (ctx, s) is identical to
    the per-buffer loop."""
    total = sum(len(b) for b in buffers)
    blocks = _all_blocks(buffers)
    acc: dict[tuple[int, int], list] = {}
    if len(blocks):
        ctxs = selector_codes(blocks.max(axis=1))
        for ctx in np.unique(ctxs):
            sel = np.ascontiguousarray(blocks[ctxs == ctx]).ravel()
            for s in TARGET_SIZES:
                h = aligned_hashes(sel, s)
                if len(h):
                    acc[(int(ctx), s)] = [h]
    return (*_unique_per_key(acc), total)


def _unique_per_key(acc: dict[tuple[int, int], list]):
    ctx_out, size_out, hash_out, freq_out = [], [], [], []
    for (ctx, s), parts in sorted(acc.items()):
        if not parts:
            continue
        u, c = np.unique(np.concatenate(parts), return_counts=True)
        ctx_out.append(np.full(len(u), ctx, np.uint8))
        size_out.append(np.full(len(u), s, np.uint8))
        hash_out.append(u)
        freq_out.append(c.astype(np.uint64))
    if not hash_out:
        e8, e64 = np.empty(0, np.uint8), np.empty(0, np.uint64)
        return e8, e8, e64, e64
    return (np.concatenate(ctx_out), np.concatenate(size_out),
            np.concatenate(hash_out), np.concatenate(freq_out))


def select_hash_winners(sizes: np.ndarray, hashes: np.ndarray,
                        freqs: np.ndarray, total_integers: int,
                        cfg: DintConfig = DintConfig()):
    """Cost filter + (freq desc, size desc, hash asc) top-K -> the
    winner (sizes, hashes, freqs) arrays.  Same saving model as
    select_targets; hash replaces pattern-lex as the deterministic
    tie-break (the reference's own tie-break was unordered-map order)."""
    if not len(hashes):
        return sizes, hashes, freqs
    cw_bits = float(cfg.log2_num_entries)
    initial_bpi = 3.0 * cw_bits
    ln = sizes.astype(np.float64)
    saving = freqs.astype(np.float64) * (initial_bpi * ln - cw_bits) \
        / max(total_integers, 1)
    keep = (saving > cfg.dsf_filter_threshold) | (sizes == 1)
    s2, h2, f2 = sizes[keep], hashes[keep], freqs[keep]
    K = cfg.num_entries - RESERVED
    # top-K by (freq desc, size desc, hash asc).  A full 3-key lexsort
    # of the candidate table costs ~8 s per 4M rows on the DRIVER (the
    # build's worst serial chunk); an O(n) partition on the composite
    # (freq << 5 | size) key plus a sort of only the boundary tie-group
    # selects the identical set, then the final K rows get the exact
    # deterministic order.
    if len(f2) > K and int(f2.max(initial=0)) < (1 << 59):
        key = (f2.astype(np.uint64) << np.uint64(5)) | s2.astype(np.uint64)
        kth = np.partition(key, len(key) - K)[len(key) - K]
        above = np.flatnonzero(key > kth)
        slots = K - len(above)
        eq_idx = np.flatnonzero(key == kth)
        eq_pick = eq_idx[np.argsort(h2[eq_idx], kind="stable")[:slots]]
        sel = np.concatenate([above, eq_pick])
        order = np.lexsort((h2[sel], -s2[sel].astype(np.int64),
                            -f2[sel].astype(np.int64)))
        sel = sel[order]
        return s2[sel], h2[sel], f2[sel]
    order = np.lexsort((h2, -s2.astype(np.int64), -f2.astype(np.int64)))
    top = order[:K]
    return s2[top], h2[top], f2[top]


def resolve_patterns(buffers, wanted_by_key: dict,
                     num_selectors: int | None = None) -> dict[int, bytes]:
    """Scan buffers; for every still-unresolved winning hash, extract
    its pattern bytes (min bytes under collision — deterministic).

    ``wanted_by_key``: {(ctx, size): sorted u64 array}; pass
    ``num_selectors=None`` for single-dict (ctx ignored, always 0).

    One vectorized scan per (ctx, size) over the batch's concatenated
    aligned buffers (alignment preserved per piece, see
    ``_concat_aligned``); under a 64-bit collision the batch
    contributes its first occurrence and the caller min-reduces bytes
    across batches — same deterministic-min semantics as before."""
    probe = {k: np.sort(v) for k, v in wanted_by_key.items() if len(v)}
    found: dict[int, bytes] = {}

    def scan(key, flat_buf):
        arr = probe.get(key)
        if arr is None:
            return
        s = key[1]
        m = len(flat_buf) // s * s
        if not m:
            return
        w = flat_buf[:m].reshape(-1, s)
        h = aligned_hashes(flat_buf, s)
        u, idx = np.unique(h, return_index=True)
        pos = np.searchsorted(arr, u)
        pos[pos >= len(arr)] = len(arr) - 1
        hit = np.flatnonzero(arr[pos] == u)
        for j in hit.tolist():
            hv = int(u[j])
            pat = np.ascontiguousarray(w[idx[j]].astype("<u4")).tobytes()
            prev = found.get(hv)
            if prev is None or pat < prev:
                found[hv] = pat

    if num_selectors is None:
        for s in TARGET_SIZES:
            scan((0, s), _concat_aligned(buffers, s))
    else:
        blocks = _all_blocks(buffers)
        if len(blocks):
            ctxs = selector_codes(blocks.max(axis=1))
            for ctx in np.unique(ctxs):
                sel = np.ascontiguousarray(blocks[ctxs == ctx]).ravel()
                for s in TARGET_SIZES:
                    scan((int(ctx), s), sel)
    return found


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
