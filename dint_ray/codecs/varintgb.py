"""Group-varint (VarintGB) block codec.

Behavior of the reference's ``varintgb_block``
(/root/reference/include/ds2i/varintgb.h, block_codecs.hpp:483-506):
groups of 4 values share one control byte (2 bits per value giving the
byte length - 1), followed by the little-endian value bytes.  A final
partial group encodes only the remaining values (control bits for the
missing slots are zero).
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
    for g in range(0, len(v), 4):
        grp = v[g : g + 4]
        lens = [_byte_len(int(x)) for x in grp]
        ctrl = 0
        for i, L in enumerate(lens):
            ctrl |= (L - 1) << (2 * i)
        out.append(ctrl)
        for x, L in zip(grp, lens):
            out.extend(int(x).to_bytes(L, "little"))
    return bytes(out)


def decode(buf: np.ndarray, offset: int, sum_of_values: int, n: int):
    out = np.empty(n, dtype=np.uint32)
    off = int(offset)
    got = 0
    mv = buf
    while got < n:
        ctrl = int(mv[off])
        off += 1
        take = min(4, n - got)
        for i in range(take):
            L = ((ctrl >> (2 * i)) & 3) + 1
            out[got + i] = int.from_bytes(bytes(mv[off : off + L]), "little")
            off += L
        got += take
    return out, off
