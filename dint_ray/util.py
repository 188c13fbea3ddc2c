"""Bit utilities and vectorized pattern hashing.

The reference hashes gap patterns with a murmur-style 64-bit byte hash
(/root/reference/include/dint/hash_utils.hpp:7-80) and relies on
hash-only lookup (no equality verification —
single_dictionary.hpp:163-171).  We keep the hash-only contract but use
a polynomial rolling hash so that *all window hashes of every target
size* can be computed with a handful of numpy ops per buffer, instead of
one hash call per window.  Length is mixed in so equal-content prefixes
of different lengths don't collide (the zero-run entries of sizes
256..16 are all-zero patterns differing only in length).
"""

from __future__ import annotations

import numpy as np

_M = np.uint64(0x9E3779B97F4A7C15)        # odd multiplier (golden-ratio)
_LEN_MIX = np.uint64(0xC2B2AE3D27D4EB4F)
_MIX1 = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def _finalize(h: np.ndarray | np.uint64, length: int):
    """splitmix64-style finalizer, vectorized."""
    with np.errstate(over="ignore"):
        h = np.uint64(h) + _LEN_MIX * np.uint64(length)
        h ^= h >> np.uint64(30)
        h *= _MIX1
        h ^= h >> np.uint64(27)
        h *= _MIX2
        h ^= h >> np.uint64(31)
    return h


def hash_pattern(values) -> int:
    """64-bit hash of one uint32 pattern (scalar path, dict building)."""
    v = np.asarray(values, dtype=np.uint64)
    h = np.uint64(0)
    with np.errstate(over="ignore"):
        for x in v:
            h = h * _M + x
    return int(_finalize(h, len(v)))


def window_hashes(buf: np.ndarray, length: int) -> np.ndarray:
    """Hashes of every window ``buf[i:i+length]``, i in [0, n-length].

    Returns an array of n-length+1 uint64 hashes computed with `length`
    vectorized ops (no per-window Python loop).
    """
    v = buf.astype(np.uint64, copy=False)
    n = len(v)
    if n < length:
        return np.empty(0, dtype=np.uint64)
    out = np.zeros(n - length + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(length):
            out *= _M
            out += v[j : j + n - length + 1]
    return _finalize(out, length)


def ceil_log2(x: int) -> int:
    """util.hpp:67-70: ceil(log2(x)), with ceil_log2(1) == 0."""
    if x <= 1:
        return 0
    return int(x - 1).bit_length()


def floor_log2(x: int) -> int:
    return max(0, int(x).bit_length() - 1)


def _bit_length(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length; exact for values < 2^53 (we use uint32)."""
    _, e = np.frexp(np.asarray(x, dtype=np.float64))
    return e.astype(np.int64)


def selector_codes(block_maxes: np.ndarray) -> np.ndarray:
    """Vectorized multi-dict context selector.

    statistics_collectors.hpp:21-40: code = ceil_log2(ceil_log2(max+1))
    when max > 1, else 0.  ceil_log2(y) == bit_length(y-1), so
    inner = bit_length(max); for max > 1 inner >= 2 and
    code = bit_length(inner - 1).  uint32 inputs -> code in [0, 6).
    """
    m = np.asarray(block_maxes, dtype=np.int64)
    inner = _bit_length(np.maximum(m, 1))
    code = _bit_length(np.maximum(inner - 1, 1))
    return np.where(m > 1, code, 0).astype(np.uint8)


def list_views(col):
    """Numpy views of each list in an Arrow list column (no per-row
    ``as_py``): one flattened values array + offset slicing."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    values = col.values.to_numpy(zero_copy_only=False)
    offsets = col.offsets.to_numpy()
    return [values[offsets[i]:offsets[i + 1]] for i in range(len(col))]
