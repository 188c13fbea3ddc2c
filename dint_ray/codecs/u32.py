"""Raw 4-byte little-endian block codec.

Behavior of the reference's ``u32_block``
(/root/reference/include/ds2i/block_codecs.hpp:377-402).
"""

from __future__ import annotations

import numpy as np

from dint_ray.config import U32_INVALID


def encode(values: np.ndarray, sum_of_values: int = U32_INVALID) -> bytes:
    return np.ascontiguousarray(values, dtype="<u4").tobytes()


def decode(buf: np.ndarray, offset: int, sum_of_values: int, n: int):
    vals = buf[offset : offset + 4 * n].view("<u4").copy()
    return vals, offset + 4 * n
