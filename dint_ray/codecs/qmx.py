"""QMX block codec (semantic reimplementation, own bit layout).

Behavior of the reference's ``qmx_block``
(/root/reference/include/ds2i/block_codecs.hpp:320-355; scheme from
Trotman 2014 "Compression, SIMD, and Postings Lists"): full blocks are
packed into 128-bit payload words, each word holding ``floor(128/w)``
values at a common bit width ``w`` drawn from a fixed selector table;
selectors carry a 4-bit width index plus a 4-bit run length so
consecutive same-width words share one selector byte.  Partial blocks
(n < block_size) fall back to binary interpolative coding exactly like
the reference wrapper does, and the QMX body is preceded by a
TightVariableByte length prefix as in the reference.

The reference's vendored SIMD implementation (qmx_codec.hpp) defines
the wire layout it emits; this module keeps the quantities/widths/
run-length *semantics* but uses its own deterministic little-endian
layout (like simple16.py does for Simple16).
"""

from __future__ import annotations

import numpy as np

from dint_ray.codecs import interpolative, varbyte
from dint_ray.config import U32_INVALID

BLOCK_SIZE = 256
_WIDTHS = (1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 16, 21, 32)  # 13 selectors
_WORD_BITS = 128


def _bits(v: np.ndarray) -> np.ndarray:
    """bit width needed per value (0 -> 1)."""
    return np.maximum(1, np.ceil(np.log2(
        np.maximum(v.astype(np.uint64), 1) + 1)).astype(np.int64))


def _encode_full(v: np.ndarray) -> bytes:
    need = _bits(v)
    n = len(v)
    words: list[tuple[int, int]] = []  # (width_idx, count packed)
    payload = bytearray()
    i = 0
    while i < n:
        best = None  # (count, -width) maximized
        for wi, w in enumerate(_WIDTHS):
            c = min(_WORD_BITS // w, n - i)
            if int(need[i:i + c].max()) <= w:
                key = (c, -w)
                if best is None or key > best[0]:
                    best = (key, wi, c)
        _, wi, c = best
        w = _WIDTHS[wi]
        acc = 0
        for j in range(c):
            acc |= int(v[i + j]) << (j * w)
        payload += acc.to_bytes(16, "little")
        words.append((wi, c))
        i += c
    # selector run-length bytes: 4-bit width idx + 4-bit (run-1); the
    # decoder infers each word's value count from its width, clamped by
    # the remaining n (only the final word can be partial)
    sels = bytearray()
    k = 0
    while k < len(words):
        wi = words[k][0]
        run = 1
        while (k + run < len(words) and words[k + run][0] == wi
               and run < 16):
            run += 1
        sels.append(wi | ((run - 1) << 4))
        k += run
    body = varbyte.encode_single(len(sels)) + bytes(sels) + bytes(payload)
    return varbyte.encode_single(len(body)) + body


def _decode_full(buf: np.ndarray, offset: int, n: int):
    body_len, off = varbyte.decode_single(buf, offset)
    end = off + body_len
    nsel, off = varbyte.decode_single(buf, off)
    sels = buf[off:off + nsel]
    off += nsel
    out = np.empty(n, dtype=np.uint32)
    got = 0
    for sb in sels:
        wi = int(sb) & 0xF
        run = (int(sb) >> 4) + 1
        w = _WIDTHS[wi]
        cap = _WORD_BITS // w
        mask = (1 << w) - 1
        for _ in range(run):
            acc = int.from_bytes(buf[off:off + 16].tobytes(), "little")
            c = min(cap, n - got)
            for j in range(c):
                out[got + j] = (acc >> (j * w)) & mask
            got += c
            off += 16
    return out, end


def encode(values: np.ndarray, sum_of_values: int = U32_INVALID) -> bytes:
    v = np.asarray(values, dtype=np.uint32)
    if len(v) < BLOCK_SIZE:
        return interpolative.encode(v, sum_of_values)
    return _encode_full(v)


def decode(buf: np.ndarray, offset: int, sum_of_values: int, n: int):
    if n < BLOCK_SIZE:
        return interpolative.decode(buf, offset, sum_of_values, n)
    return _decode_full(buf, offset, n)
