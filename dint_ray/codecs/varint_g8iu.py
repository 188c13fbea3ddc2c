"""Varint-G8IU block codec.

Behavior of the reference's ``varint_G8IU_block``
(/root/reference/include/ds2i/block_codecs.hpp:232-318; scheme from
Stepanov et al., "SIMD-based decoding of posting lists", CIKM 2011):
fixed 9-byte groups — one descriptor byte + 8 data bytes.  Values are
packed little-endian into the data bytes; descriptor bit i is SET when
data byte i terminates a value; a value never spans two groups (the
group is padded when the next value does not fit).
"""

from __future__ import annotations

import numpy as np

from dint_ray.config import U32_INVALID


def _byte_len(x: int) -> int:
    if x < (1 << 8):
        return 1
    if x < (1 << 16):
        return 2
    if x < (1 << 24):
        return 3
    return 4


def encode(values: np.ndarray, sum_of_values: int = U32_INVALID) -> bytes:
    v = np.asarray(values, dtype=np.uint64)
    out = bytearray()
    i = 0
    n = len(v)
    while i < n:
        desc = 0
        data = bytearray()
        while i < n:
            L = _byte_len(int(v[i]))
            if len(data) + L > 8:
                break
            data += int(v[i]).to_bytes(L, "little")
            desc |= 1 << (len(data) - 1)
            i += 1
        data += b"\x00" * (8 - len(data))
        out.append(desc)
        out += data
    return bytes(out)


def decode(buf: np.ndarray, offset: int, sum_of_values: int, n: int):
    out = np.empty(n, dtype=np.uint32)
    got = 0
    off = int(offset)
    while got < n:
        desc = int(buf[off])
        data = buf[off + 1:off + 9]
        off += 9
        start = 0
        for b in range(8):
            if desc & (1 << b):
                out[got] = int.from_bytes(bytes(data[start:b + 1]), "little")
                start = b + 1
                got += 1
                if got == n:
                    break
    return out, off
