"""OptPFor(-delta) block codec — patched frame-of-reference with an
exhaustive deterministic width search.

Behavior of the reference's ``optpfor_block``
(/root/reference/include/ds2i/block_codecs.hpp:153-230, which wraps
FastPFor's OPTPFor with a deterministic ``findBestB`` override; scheme
from Zukowski et al. 2006 / Yan-Ding-Suel 2009): pick the bit width b
that minimizes the encoded size when every value needing more than b
bits becomes a patch ("exception") stored out of band.

Byte layout (our own, deterministic):
    u8 b
    varbyte(num_exceptions)
    packed low b bits of every value (LSB-first)
    per exception: varbyte(position delta) varbyte(value >> b)
findBestB scans every b in 0..32 and takes the smallest total BYTE
cost, lowest b on ties — fully deterministic, no heuristics.
"""

from __future__ import annotations

import numpy as np

from dint_ray.codecs import varbyte
from dint_ray.codecs.ef import _pack_bits, _unpack_bits
from dint_ray.config import U32_INVALID


def _vb_len(x: np.ndarray) -> np.ndarray:
    """varbyte encoded length per value."""
    out = np.ones(len(x), dtype=np.int64)
    for k in (7, 14, 21, 28):
        out += (x >= (1 << k)).astype(np.int64)
    return out


def _cost_bytes(v: np.ndarray, b: int) -> int:
    n = len(v)
    exc = v >> np.uint64(b) if b < 64 else np.zeros(n, np.uint64)
    m = exc != 0
    ne = int(m.sum())
    bits = n * b
    cost = 1 + len(varbyte.encode_single(ne)) + (bits + 7) // 8
    if ne:
        pos = np.flatnonzero(m)
        deltas = np.diff(pos, prepend=-1) - 1
        cost += int(_vb_len(deltas.astype(np.uint64)).sum())
        cost += int(_vb_len(exc[m]).sum())
    return cost


def _find_best_b(v: np.ndarray) -> int:
    maxbits = int(v.max()).bit_length() if len(v) else 0
    best_b, best_cost = 0, None
    for b in range(0, maxbits + 1):
        c = _cost_bytes(v, b)
        if best_cost is None or c < best_cost:
            best_b, best_cost = b, c
    return best_b


def block_stats(values: np.ndarray) -> tuple[int, int]:
    """(chosen b, exception count) — the encoder state the reference's
    time model reads as pfor_b / pfor_exceptions features
    (dec_time_prediction.hpp feature list)."""
    v = np.asarray(values, dtype=np.uint64)
    if len(v) == 0:
        return 0, 0
    b = _find_best_b(v)
    exc = v >> np.uint64(b) if b < 64 else np.zeros(len(v), np.uint64)
    return b, int(np.count_nonzero(exc))


def encode(values: np.ndarray, sum_of_values: int = U32_INVALID) -> bytes:
    v = np.asarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    b = _find_best_b(v)
    exc = v >> np.uint64(b) if b < 64 else np.zeros(n, np.uint64)
    m = exc != 0
    out = bytearray([b])
    out += varbyte.encode_single(int(m.sum()))
    mask = np.uint64((1 << b) - 1)
    out += _pack_bits(v & mask, b).tobytes()
    if m.any():
        pos = np.flatnonzero(m)
        deltas = np.diff(pos, prepend=-1) - 1
        for d, e in zip(deltas, exc[m]):
            out += varbyte.encode_single(int(d))
            out += varbyte.encode_single(int(e))
    return bytes(out)


def decode(buf: np.ndarray, offset: int, sum_of_values: int, n: int):
    if n == 0:
        return np.empty(0, dtype=np.uint32), offset
    b = int(buf[offset])
    offset += 1
    ne, offset = varbyte.decode_single(buf, offset)
    nbytes = (n * b + 7) // 8
    vals = _unpack_bits(buf[offset:offset + nbytes], n, b)
    offset += nbytes
    pos = -1
    for _ in range(ne):
        d, offset = varbyte.decode_single(buf, offset)
        e, offset = varbyte.decode_single(buf, offset)
        pos += d + 1
        vals[pos] |= np.uint64(e) << np.uint64(b)
    return vals.astype(np.uint32), offset
