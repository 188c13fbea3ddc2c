"""Tight variable-byte codec.

Behavior-compatible with the reference's ``TightVariableByte``
(/root/reference/include/ds2i/block_codecs.hpp:20-102): 7-bit groups,
least-significant first, and the *stop bit set on the last byte* of each
value (note: opposite of LEB128's continuation convention).  Encode and
decode are vectorized over whole arrays.
"""

from __future__ import annotations

import numpy as np

from dint_ray.config import U32_INVALID

_THRESH = np.array([1 << 7, 1 << 14, 1 << 21, 1 << 28], dtype=np.uint64)


def encode_array(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if len(v) == 0:
        return b""
    # bytes per value: 1..5
    nbytes = 1 + np.searchsorted(_THRESH, v, side="right").astype(np.int64)
    # correction: searchsorted gives #thresholds <= v; val < 128 -> 1 byte
    nbytes = np.select(
        [v < _THRESH[0], v < _THRESH[1], v < _THRESH[2], v < _THRESH[3]],
        [1, 2, 3, 4],
        default=5,
    )
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    out = np.zeros(total, dtype=np.uint8)
    starts = ends - nbytes
    # fill byte position j of every value that has > j bytes
    for j in range(5):
        sel = nbytes > j
        if not sel.any():
            break
        shifted = (v[sel] >> np.uint64(7 * j)) & np.uint64(0x7F)
        out[starts[sel] + j] = shifted.astype(np.uint8)
    out[ends - 1] |= 0x80  # stop bit on the last byte of each value
    return out.tobytes()


def encode_single(value: int) -> bytes:
    return encode_array(np.array([value], dtype=np.uint64))


def decode_array(buf: np.ndarray, offset: int, n: int) -> tuple[np.ndarray, int]:
    """Decode ``n`` values from uint8 array ``buf`` starting at offset."""
    if n == 0:
        return np.empty(0, dtype=np.uint32), offset
    window = buf[offset:]
    stops = np.flatnonzero(window & 0x80)
    ends = stops[:n] + 1
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1]
    nbytes = ends - starts
    vals = np.zeros(n, dtype=np.uint64)
    for j in range(int(nbytes.max())):
        sel = nbytes > j
        vals[sel] |= (window[starts[sel] + j].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * j)
    return vals.astype(np.uint32), offset + int(ends[-1])


def decode_single(buf: np.ndarray, offset: int) -> tuple[int, int]:
    vals, off = decode_array(buf, offset, 1)
    return int(vals[0]), off


# --- block-codec interface (vbyte_block, block_codecs.hpp:357-375) ---

def encode(values: np.ndarray, sum_of_values: int = U32_INVALID) -> bytes:
    return encode_array(values)


def decode(buf: np.ndarray, offset: int, sum_of_values: int, n: int):
    return decode_array(buf, offset, n)
