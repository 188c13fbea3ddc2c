"""StreamVByte block codec.

Behavior of the reference's ``streamvbyte_block``
(/root/reference/include/ds2i/block_codecs.hpp:435-457; format from the
published StreamVByte scheme, Lemire-Kurz-Rupp 2018): all control
bytes first — 2 bits per value (byte length - 1), 4 values per control
byte — then all value bytes little-endian, so decode is one branchless
gather per value.  Encode and decode are fully vectorized numpy.
"""

from __future__ import annotations

import numpy as np

from dint_ray.config import U32_INVALID


def encode(values: np.ndarray, sum_of_values: int = U32_INVALID) -> bytes:
    v = np.asarray(values, dtype=np.uint32)
    n = len(v)
    if n == 0:
        return b""
    lens = np.ones(n, dtype=np.int64)
    lens += (v >= (1 << 8)).astype(np.int64)
    lens += (v >= (1 << 16)).astype(np.int64)
    lens += (v >= (1 << 24)).astype(np.int64)
    codes = (lens - 1).astype(np.uint8)
    ctrl = np.zeros((n + 3) // 4, dtype=np.uint8)
    np.bitwise_or.at(ctrl, np.arange(n) >> 2,
                     (codes << ((np.arange(n) & 3) * 2)).astype(np.uint8))
    # data: scatter each value's bytes at its cumulative offset
    starts = np.concatenate(([0], np.cumsum(lens)))
    data = np.zeros(int(starts[-1]), dtype=np.uint8)
    vb = v.view(np.uint8).reshape(n, 4)      # little-endian lanes
    for b in range(4):
        m = lens > b
        data[starts[:-1][m] + b] = vb[m, b]
    return ctrl.tobytes() + data.tobytes()


def decode(buf: np.ndarray, offset: int, sum_of_values: int, n: int):
    if n == 0:
        return np.empty(0, dtype=np.uint32), offset
    nctrl = (n + 3) // 4
    ctrl = buf[offset:offset + nctrl]
    off = offset + nctrl
    idx = np.arange(n)
    codes = (ctrl[idx >> 2] >> ((idx & 3) * 2).astype(np.uint8)) & 3
    lens = codes.astype(np.int64) + 1
    starts = np.concatenate(([0], np.cumsum(lens)))
    total = int(starts[-1])
    data = buf[off:off + total]
    out_b = np.zeros((n, 4), dtype=np.uint8)
    for b in range(4):
        m = lens > b
        out_b[m, b] = data[starts[:-1][m] + b]
    return out_b.view(np.uint32).ravel(), off + total
