"""MaskedVByte block codec.

Behavior of the reference's ``maskedvbyte_block``
(/root/reference/include/ds2i/block_codecs.hpp:459-481; format from the
published Masked VByte scheme, Plaisance-Kurz-Lemire 2015): classic
LEB128-style varint — 7-bit groups least-significant first with the
*continuation* bit (0x80) set on every byte except the last of each
value.  This is the opposite stop-bit convention of TightVariableByte
(varbyte.py); the reference decodes it with SIMD masks, here both
directions are vectorized numpy over whole arrays.
"""

from __future__ import annotations

import numpy as np

from dint_ray.config import U32_INVALID

_THRESH = np.array([1 << 7, 1 << 14, 1 << 21, 1 << 28], dtype=np.uint64)


def encode(values: np.ndarray, sum_of_values: int = U32_INVALID) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if len(v) == 0:
        return b""
    nbytes = np.select(
        [v < _THRESH[0], v < _THRESH[1], v < _THRESH[2], v < _THRESH[3]],
        [1, 2, 3, 4],
        default=5,
    )
    ends = np.cumsum(nbytes)
    out = np.zeros(int(ends[-1]), dtype=np.uint8)
    starts = ends - nbytes
    for j in range(5):
        sel = nbytes > j
        if not sel.any():
            break
        shifted = (v[sel] >> np.uint64(7 * j)) & np.uint64(0x7F)
        # continuation bit on every byte that is NOT the value's last
        cont = np.where(nbytes[sel] > j + 1, 0x80, 0).astype(np.uint8)
        out[starts[sel] + j] = shifted.astype(np.uint8) | cont
    return out.tobytes()


def decode(buf: np.ndarray, offset: int, sum_of_values: int, n: int):
    if n == 0:
        return np.empty(0, dtype=np.uint32), offset
    window = buf[offset:]
    # a value ends at every byte WITHOUT the continuation bit
    stops = np.flatnonzero((window & 0x80) == 0)
    ends = stops[:n] + 1
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1]
    nbytes = ends - starts
    vals = np.zeros(n, dtype=np.uint64)
    for j in range(int(nbytes.max())):
        sel = nbytes > j
        vals[sel] |= (window[starts[sel] + j].astype(np.uint64)
                      & np.uint64(0x7F)) << np.uint64(7 * j)
    return vals.astype(np.uint32), offset + int(ends[-1])
