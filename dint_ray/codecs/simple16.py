"""Simple16 word-aligned block codec (published s16 wire format).

Mirrors the behavior of the reference's ``simple16_block``
(/root/reference/include/ds2i/block_codecs.hpp:404-433), which wraps
FastPFor's ``Simple16<false>`` — itself the s16 scheme of Zhang, Long
& Suel (WWW'08).  This module implements the published s16 reference
format directly:

- each 32-bit little-endian word carries a 4-bit selector in its top
  bits plus 28 payload bits;
- the selector indexes the canonical 16-row table below (counts x
  bit-widths, in order); values are packed LSB-first (the first value
  of a word occupies its lowest payload bits), exactly like the
  published s16 encoder;
- encoding greedily picks the first selector (from 0) whose widths
  fit the next ``min(count, remaining)`` values; trailing slots of the
  final word are left zero and the decoder stops after ``n`` values.

The vendored FastPFor sources are not present in the reference
checkout (empty submodule), so unlike qmx.py this cannot be pinned
byte-for-byte against a compiled reference; the layout here follows
the published s16 code, validated by hand-built vectors in
tests/test_codecs.py.
"""

from __future__ import annotations

import numpy as np

from dint_ray.config import U32_INVALID

# canonical s16 table: (count, width) runs per selector, 28 bits each
CONFIGS: list[list[tuple[int, int]]] = [
    [(28, 1)],
    [(7, 2), (14, 1)],
    [(7, 1), (7, 2), (7, 1)],
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
]

_WIDTHS = [[w for c, w in cfg for _ in range(c)] for cfg in CONFIGS]
_COUNTS = [len(ws) for ws in _WIDTHS]


def encode(values: np.ndarray, sum_of_values: int = U32_INVALID) -> bytes:
    v = np.asarray(values, dtype=np.uint64)
    if (v >= (1 << 28)).any():
        raise ValueError("simple16 requires values < 2^28")
    words = []
    pos = 0
    n = len(v)
    while pos < n:
        for sel in range(16):
            # a selector applies if it packs min(remaining, count)
            # values (trailing slots of the last word stay zero)
            take = min(_COUNTS[sel], n - pos)
            ok = True
            ws = _WIDTHS[sel]
            for i in range(take):
                if int(v[pos + i]) >= (1 << ws[i]):
                    ok = False
                    break
            if ok:
                word = sel << 28
                shift = 0
                for i in range(take):
                    word |= int(v[pos + i]) << shift
                    shift += ws[i]
                words.append(word)
                pos += take
                break
        else:  # pragma: no cover - selector 15 always fits < 2^28
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
        shift = 0
        for i in range(take):
            out[got + i] = (word >> shift) & ((1 << ws[i]) - 1)
            shift += ws[i]
        got += take
    return out, off
