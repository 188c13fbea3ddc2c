"""Simple16 word-aligned block codec.

Behavior of the reference's ``simple16_block``
(/root/reference/include/ds2i/block_codecs.hpp:404-433, backed by
FastPFor's Simple16): each 32-bit output word carries a 4-bit selector
plus 28 payload bits holding as many values as the densest applicable
configuration allows.  The 16 configurations below follow the standard
Simple16 table (counts x bit-widths, in order); the bit layout is an
internal contract of this engine (roundtrip-exact), not a byte-level
clone of the vendored SIMD library.
"""

from __future__ import annotations

import numpy as np

from dint_ray.config import U32_INVALID

# (count, width) runs per selector; payload bits sum to <= 28
CONFIGS: list[list[tuple[int, int]]] = [
    [(28, 1)],
    [(7, 2), (14, 1)],
    [(14, 1), (7, 2)],
    [(14, 2)],
    [(1, 4), (8, 3)],
    [(1, 3), (4, 4), (3, 3)],
    [(7, 4)],
    [(4, 5), (2, 4)],
    [(2, 4), (4, 5)],
    [(3, 6), (2, 5)],
    [(2, 5), (3, 6)],
    [(4, 7)],
    [(1, 10), (2, 9)],
    [(2, 14)],
    [(1, 28)],
    [(1, 28)],  # selector 15: same as 14 (escape slot)
]

_WIDTHS = [[w for c, w in cfg for _ in range(c)] for cfg in CONFIGS]
_COUNTS = [len(ws) for ws in _WIDTHS]


def _fits(values: np.ndarray, start: int, sel: int) -> int:
    """How many values from ``start`` fit config ``sel`` (all or 0)."""
    ws = _WIDTHS[sel]
    n = min(len(ws), len(values) - start)
    if n == 0:
        return 0
    for i in range(n):
        if int(values[start + i]) >= (1 << ws[i]):
            return 0
    return n


def encode(values: np.ndarray, sum_of_values: int = U32_INVALID) -> bytes:
    v = np.asarray(values, dtype=np.uint64)
    if (v >= (1 << 28)).any():
        raise ValueError("simple16 requires values < 2^28")
    words = []
    pos = 0
    n = len(v)
    while pos < n:
        for sel in range(16):
            # a config applies if it packs min(remaining, count) values
            # (trailing slots of the last word are wasted, as usual)
            take = min(_COUNTS[sel], n - pos)
            ok = True
            ws = _WIDTHS[sel]
            for i in range(take):
                if int(v[pos + i]) >= (1 << ws[i]):
                    ok = False
                    break
            if ok:
                word = sel << 28
                shift = 28
                for i in range(take):
                    shift -= ws[i]
                    word |= int(v[pos + i]) << shift
                words.append(word)
                pos += take
                break
        else:  # pragma: no cover - selector 14 always fits < 2^28
            raise AssertionError("no simple16 selector applied")
    return np.asarray(words, dtype="<u4").tobytes()


def decode(buf: np.ndarray, offset: int, sum_of_values: int, n: int):
    out = np.empty(n, dtype=np.uint32)
    got = 0
    off = offset
    while got < n:
        word = int(buf[off : off + 4].view("<u4")[0])
        off += 4
        sel = word >> 28
        ws = _WIDTHS[sel]
        take = min(len(ws), n - got)
        shift = 28
        for i in range(take):
            shift -= ws[i]
            out[got + i] = (word >> shift) & ((1 << ws[i]) - 1)
        got += take
    return out, off
