"""Binary interpolative coding.

Behavior-compatible with the reference's bit-level format
(/root/reference/include/ds2i/interpolative_coding.hpp:10-157 and the
``interpolative_block`` wrapper, block_codecs.hpp:104-151):

- bit stream is little-endian (first-written bits are least significant
  in increasing byte order);
- integers are written with centered minimal binary codes:
  ``b = floor_log2(u)``, ``m = 2^(b+1) - u``; values < m take b bits,
  others take b+1 bits split as (high b bits, low 1 bit);
- a block of n gaps is prefix-summed; the last prefix sum is the
  (possibly implicit) universe; the first n-1 prefix sums are coded by
  midpoint recursion in [0, universe].

Every partial DINT block (< 256 ints) uses this codec
(/root/reference/include/dint/dint_codecs.hpp:17-19,60-63), so it is a
conformance requirement, not an optional extra.
"""

from __future__ import annotations

import numpy as np

from dint_ray.codecs import varbyte
from dint_ray.config import U32_INVALID


class _BitWriter:
    __slots__ = ("acc", "pos")

    def __init__(self) -> None:
        self.acc = 0
        self.pos = 0

    def write(self, bits: int, length: int) -> None:
        if length:
            self.acc |= bits << self.pos
            self.pos += length

    def write_int(self, val: int, u: int) -> None:
        # centered minimal binary code; val in [0, u)
        b = u.bit_length() - 1
        m = (1 << (b + 1)) - u
        if val < m:
            self.write(val, b)
        else:
            val += m
            self.write(val >> 1, b)
            self.write(val & 1, 1)

    def write_interpolative(self, arr, lo: int, n: int, low: int, high: int) -> None:
        if not n:
            return
        h = n // 2
        val = arr[lo + h]
        self.write_int(val - low, high - low + 1)
        self.write_interpolative(arr, lo, h, low, val)
        self.write_interpolative(arr, lo + h + 1, n - h - 1, val, high)

    def tobytes(self) -> bytes:
        nbytes = (self.pos + 7) // 8
        return self.acc.to_bytes(nbytes, "little")


class _BitReader:
    __slots__ = ("acc", "pos")

    def __init__(self, data: bytes) -> None:
        self.acc = int.from_bytes(data, "little")
        self.pos = 0

    def read(self, length: int) -> int:
        if not length:
            return 0
        val = (self.acc >> self.pos) & ((1 << length) - 1)
        self.pos += length
        return val

    def read_int(self, u: int) -> int:
        b = u.bit_length() - 1
        m = (1 << (b + 1)) - u
        val = self.read(b)
        if val >= m:
            val = (val << 1) + self.read(1) - m
        return val

    def read_interpolative(self, out, lo: int, n: int, low: int, high: int) -> None:
        h = n // 2
        val = low + self.read_int(high - low + 1)
        out[lo + h] = val
        if n == 1:
            return
        if h:
            self.read_interpolative(out, lo, h, low, val)
        if n - h - 1:
            self.read_interpolative(out, lo + h + 1, n - h - 1, val, high)


def encode(values: np.ndarray, sum_of_values: int = U32_INVALID) -> bytes:
    """Encode a block of non-negative gaps (uint32).

    Hot path is the C kernel (native.interp_encode, byte-identical —
    asserted in tests): every partial DINT block and every short
    (bucket, term) segment of the direct serve build pays this encoder,
    and the Python bit writer measured 0.89 Mints/s vs ~26 Mints/s."""
    n = len(values)
    assert n >= 1
    from dint_ray import native

    # Overflow guard for the self-described u32 varbyte sum (matching
    # the reference wrapper, block_codecs.hpp:117-121, whose uint32
    # sum_of_values silently WRAPS past 2^32-2 and decodes garbage):
    # the C kernel checks inside its prefix-sum loop and raises through
    # interp_encode, so only the pure-Python fallback pays a separate
    # numpy sum here (the guard measured 3.4us/call, 24% of a partial-
    # block encode, when it ran unconditionally).  Unreachable for real
    # d-gap blocks, whose sums are bounded by the u32 docID universe.
    enc = native.interp_encode(values, sum_of_values)
    if enc is not None:
        return enc
    if sum_of_values == U32_INVALID:
        total = int(values.astype(np.uint64, copy=False).sum())
        if total >= U32_INVALID:
            raise ValueError(
                f"interpolative self-described sum {total} exceeds the "
                "u32 wire format (reference block_codecs.hpp:117 wraps "
                "here); pass an explicit universe or split the block")
    prefix = np.cumsum(values.astype(np.uint64)).tolist()
    header = b""
    if sum_of_values == U32_INVALID:
        sum_of_values = int(prefix[-1])
        header = varbyte.encode_single(sum_of_values)
    bw = _BitWriter()
    bw.write_interpolative(prefix, 0, n - 1, 0, sum_of_values)
    return header + bw.tobytes()


def decode(buf: np.ndarray, offset: int, sum_of_values: int, n: int):
    """Decode n gaps; returns (uint32 array, new offset)."""
    if sum_of_values == U32_INVALID:
        sum_of_values, offset = varbyte.decode_single(buf, offset)
    out = [0] * n
    out[n - 1] = sum_of_values
    consumed = 0
    if n > 1:
        # worst case bits: (n-1) * (bit_length(universe)+1)
        max_bytes = ((n - 1) * (max(1, sum_of_values).bit_length() + 1) + 7) // 8 + 8
        window = buf[offset : offset + max_bytes]
        br = _BitReader(window.tobytes())
        br.read_interpolative(out, 0, n - 1, 0, sum_of_values)
        consumed = (br.pos + 7) // 8
        arr = np.asarray(out, dtype=np.uint32)
        arr[1:] -= arr[:-1].copy()
        return arr, offset + consumed
    return np.asarray(out, dtype=np.uint32), offset
