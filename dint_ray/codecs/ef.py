"""Compact Elias-Fano encoding of sorted integer sequences.

Re-derivation (from the published construction: Elias 1974 / Fano 1971;
the quasi-succinct form of Vigna 2013 used by ds2i) of the reference's
compact_elias_fano (/root/reference/include/ds2i/compact_elias_fano.hpp:12-420):

    n values v_0 <= ... <= v_{n-1} in [0, universe)
    l = max(0, floor(log2(universe / n)))
    low  bits: n * l bits, the low l bits of each value, LSB-packed
    high bits: a bitvector of n + (universe >> l) + 1 bits with bit
               (v_i >> l) + i set for every i  (unary-coded gaps of the
               high parts)

The byte layout here is our own (numpy-word-aligned, little-endian):
    varbyte(n) varbyte(universe) u8(l) lows[ceil(n*l/8)] highs[...]

Everything is vectorized: encode = two fancy-indexed bit scatters,
decode = one flatnonzero over the high bitvector + one gather.
"""

from __future__ import annotations

import numpy as np

from dint_ray.codecs import varbyte


def _pack_bits(values: np.ndarray, width: int) -> np.ndarray:
    """LSB-first pack of `width` low bits per value into a uint8 array."""
    n = len(values)
    if width == 0 or n == 0:
        return np.empty(0, dtype=np.uint8)
    total = n * width
    bitpos = (np.arange(n, dtype=np.int64)[:, None] * width
              + np.arange(width, dtype=np.int64)[None, :])
    bits = ((values[:, None] >> np.arange(width, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.uint8)
    out = np.zeros((total + 7) // 8, dtype=np.uint8)
    np.bitwise_or.at(out, bitpos.ravel() >> 3,
                     (bits.ravel() << (bitpos.ravel() & 7)).astype(np.uint8))
    return out


def _unpack_bits(buf: np.ndarray, n: int, width: int) -> np.ndarray:
    """Inverse of _pack_bits -> uint64 values."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    bitpos = (np.arange(n, dtype=np.int64)[:, None] * width
              + np.arange(width, dtype=np.int64)[None, :])
    bits = (buf[bitpos >> 3] >> (bitpos & 7).astype(np.uint8)) & 1
    weights = (np.uint64(1) << np.arange(width, dtype=np.uint64))
    return (bits.astype(np.uint64) * weights[None, :]).sum(axis=1,
                                                           dtype=np.uint64)


def ef_low_bits(n: int, universe: int) -> int:
    if n == 0 or universe <= n:
        return 0
    return max(0, int(np.floor(np.log2(universe / n))))


def ef_bit_cost(n: int, universe: int) -> int:
    """Encoded size in BITS (lows + highs), excluding the header —
    the cost model partitioned sequences optimize over."""
    if n == 0:
        return 0
    l = ef_low_bits(n, universe)
    return n * l + n + (universe >> l) + 1


def ef_encode(values: np.ndarray, universe: int) -> bytes:
    """Sorted (non-decreasing) values in [0, universe) -> bytes."""
    v = np.asarray(values, dtype=np.uint64)
    n = len(v)
    out = bytearray(varbyte.encode_single(n))
    out += varbyte.encode_single(universe)
    if n == 0:
        return bytes(out)
    l = ef_low_bits(n, universe)
    out.append(l)
    lows = _pack_bits(v, l)
    highs_len = n + (universe >> l) + 1
    high_pos = (v >> np.uint64(l)).astype(np.int64) + np.arange(n,
                                                                dtype=np.int64)
    hb = np.zeros((highs_len + 7) // 8, dtype=np.uint8)
    np.bitwise_or.at(hb, high_pos >> 3,
                     (1 << (high_pos & 7)).astype(np.uint8))
    out += lows.tobytes()
    out += hb.tobytes()
    return bytes(out)


def ef_decode(buf, offset: int = 0):
    """-> (values uint64 array, new_offset)."""
    buf = np.frombuffer(buf, dtype=np.uint8) if isinstance(
        buf, (bytes, bytearray, memoryview)) else buf
    n, offset = varbyte.decode_single(buf, offset)
    universe, offset = varbyte.decode_single(buf, offset)
    if n == 0:
        return np.empty(0, dtype=np.uint64), offset
    l = int(buf[offset])
    offset += 1
    lows_bytes = (n * l + 7) // 8
    lows = _unpack_bits(buf[offset:offset + lows_bytes], n, l)
    offset += lows_bytes
    highs_len = n + (universe >> l) + 1
    highs_bytes = (highs_len + 7) // 8
    hb = buf[offset:offset + highs_bytes]
    offset += highs_bytes
    setpos = np.flatnonzero(np.unpackbits(hb, bitorder="little")[:highs_len])
    highs = (setpos - np.arange(n, dtype=np.int64)).astype(np.uint64)
    return (highs << np.uint64(l)) | lows, offset
