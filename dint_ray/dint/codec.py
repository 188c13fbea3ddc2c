"""DINT block encode/decode kernels.

Re-expresses /root/reference/include/dint/dint_codecs.hpp:

- ``dint_block::decode`` (:9-50): a stream of b-bit codewords; codeword
  0 -> next 2 bytes are a literal, 1 -> next 4 bytes are a literal,
  2..6 -> zero runs of 256/128/64/32/16, >=7 -> copy dictionary entry.
- ``greedy_dint_single_dict_block::encode`` (:52-139): longest zero-run
  codeword (>=16), else longest dictionary hit over sizes 16,8,4,2,1,
  else exception escape.
- ``opt_dint_single_dict_block::encode`` (:141-283): shortest-path DP
  over positions 0..n, edge costs in b-bit units: dict hit / run = 1,
  2-byte exception = 2, 4-byte exception = 3; ties keep the earlier
  relaxation (strict ``>``).
- ``opt_dint_multi_dict_block::encode`` (:285-519): all 6 dictionaries
  x {b=16, b=8} = 12 DP encodings, smallest wins (b=8 wins ties within
  a selector via ``<=``; earlier selector wins ties across selectors
  via strict ``<``), emitted after a 1-byte selector code.

Blocks shorter than 256 ints use binary interpolative coding
(dint_codecs.hpp:17-19,60-63).

The decode path here is vectorized: runs of dictionary codewords
between exceptions are expanded with numpy gathers, so cost scales with
the number of *exceptions*, not codewords.
"""

from __future__ import annotations

import numpy as np

from dint_ray.codecs import interpolative
from dint_ray.config import EXCEPTIONS, INVALID_INDEX, RESERVED, U32_INVALID
from dint_ray.dint.dictionary import LookupTable, MultiPackedDict, PackedDict
from dint_ray.util import window_hashes

BLOCK_SIZE = 256
TARGET_SIZES = (16, 8, 4, 2, 1)


# --------------------------------------------------------------------------
# hit precomputation shared by greedy / opt / multi encoders
# --------------------------------------------------------------------------

def _zero_run_lengths(buf: np.ndarray) -> np.ndarray:
    """z[i] = length of the zero run starting at i (capped at n - i)."""
    n = len(buf)
    z = np.zeros(n, dtype=np.int64)
    nz = np.flatnonzero(buf)
    # next nonzero index at or after i
    nxt = np.full(n, n, dtype=np.int64)
    if len(nz):
        nxt[nz] = nz
        np.minimum.accumulate(nxt[::-1], out=nxt[::-1])
    z = nxt - np.arange(n)
    return z


def _precompute_hashes(buf: np.ndarray) -> dict[int, np.ndarray]:
    """Window hashes for each target size + every tail length < 16."""
    n = len(buf)
    h: dict[int, np.ndarray] = {}
    for s in TARGET_SIZES:
        h[s] = window_hashes(buf, s)
    # tail windows buf[n-L:] for L in 1..15 (lookups of truncated length
    # at the end of the DP, dint_codecs.hpp:190 min(sub_block_size, n-i))
    from dint_ray.util import hash_pattern

    tails = {}
    for L in range(1, min(16, n + 1)):
        if L in h and len(h[L]):
            tails[L] = int(h[L][n - L])
        else:
            tails[L] = hash_pattern(buf[n - L :])
    return h, tails


def _hits_for(lookup: LookupTable, hashes: dict[int, np.ndarray],
              tails: dict[int, int], n: int):
    """hits[s] = codeword array over start positions (full windows);
    tail_cw[L] = codeword for the final window of length L."""
    hits = {s: lookup.lookup_many(hashes[s]) for s in TARGET_SIZES}
    tail_keys = np.array(sorted(tails), dtype=np.int64)
    tail_h = np.array([tails[int(k)] for k in tail_keys], dtype=np.uint64)
    tail_vals = lookup.lookup_many(tail_h)
    tail_cw = {int(k): int(v) for k, v in zip(tail_keys, tail_vals)}
    return hits, tail_cw


# --------------------------------------------------------------------------
# encoders
# --------------------------------------------------------------------------

def encode_block_greedy(buf: np.ndarray, d: PackedDict) -> bytes:
    """greedy_dint_single_dict_block::encode (b=16 only)."""
    n = len(buf)
    out = bytearray()
    z = _zero_run_lengths(buf)
    hashes, tails = _precompute_hashes(buf)
    hits, tail_cw = _hits_for(d.lookup, hashes, tails, n)
    i = 0
    while i < n:
        run = min(int(z[i]), 256)
        if run >= 16:
            k, index = 256, EXCEPTIONS
            while run < k and k > 16:
                index += 1
                k //= 2
            out += int(index).to_bytes(2, "little")
            i += k
            continue
        emitted = False
        for s in TARGET_SIZES:
            ln = min(s, n - i)
            cw = int(hits[s][i]) if i + s <= n else tail_cw[ln]
            if cw != INVALID_INDEX:
                out += cw.to_bytes(2, "little")
                i += ln
                emitted = True
                break
        if not emitted:
            v = int(buf[i])
            if v < 65536:
                out += b"\x00\x00" + v.to_bytes(2, "little")
            else:
                out += b"\x01\x00" + v.to_bytes(4, "little")
            i += 1
    return bytes(out)


def _opt_encode_core(buf: np.ndarray, lookup: LookupTable, b: int,
                     hashes, tails) -> bytes:
    """opt_dint DP (dint_codecs.hpp:147-283), parameterized by codeword
    width b in {8, 16} and the lookup table (selects the dictionary)."""
    n = len(buf)
    hits, tail_cw = _hits_for(lookup, hashes, tails, n)
    z = _zero_run_lengths(buf)

    parent = list(range(-1, n))    # parent[i+? ] default chain
    codeword = [1] * (n + 1)
    cost = [3 * i for i in range(n + 1)]
    parent[0], codeword[0], cost[0] = 0, 1, 0

    hit_arrays = [hits[s] for s in TARGET_SIZES]
    buf_int = buf.tolist()

    for i in range(n):
        ci = cost[i]
        run = int(z[i])
        if run >= 16:
            k, index = 256, EXCEPTIONS
            while run < k and k > 16:
                k //= 2
                index += 1
            while k >= 16:
                c = ci + 1
                j = i + k
                if cost[j] > c:
                    parent[j], codeword[j], cost[j] = i, index, c
                k //= 2
                index += 1
        for sidx, s in enumerate(TARGET_SIZES):
            ln = s if i + s <= n else n - i
            cw = int(hit_arrays[sidx][i]) if i + s <= n else tail_cw[ln]
            if cw != INVALID_INDEX:
                c = ci + 1
                j = i + ln
                if cost[j] > c:
                    parent[j], codeword[j], cost[j] = i, cw, c
            elif s == 1:
                v = buf_int[i]
                if v < 65536:
                    c, cw0 = ci + 2, 0
                else:
                    c, cw0 = ci + 3, 1
                if cost[i + 1] > c:
                    parent[i + 1], codeword[i + 1], cost[i + 1] = i, cw0, c

    # backtrack: segments (start, codeword)
    segs = []
    i = n
    while i != 0:
        p = parent[i]
        segs.append((p, codeword[i]))
        i = p
    segs.reverse()

    out = bytearray()
    nbytes = b // 8
    for start, cw in segs:
        if cw > 1:
            out += int(cw).to_bytes(nbytes, "little")
        else:
            v = buf_int[start]
            if cw == 0:
                out += (b"\x00\x00" if b == 16 else b"\x00") + v.to_bytes(2, "little")
            else:
                out += (b"\x01\x00" if b == 16 else b"\x01") + v.to_bytes(4, "little")
    return bytes(out)


def _opt_encode(buf: np.ndarray, lookup: LookupTable, b: int,
                hashed=None) -> bytes:
    """C kernel when available (byte-identical, asserted in tests),
    else the pure-Python DP.  ``hashed`` carries the (hashes, tails)
    precompute for the Python path so multi-dict reuses one pass."""
    from dint_ray import native

    enc = native.opt_encode(buf, lookup, b)
    if enc is not None:
        return enc
    hashes, tails = hashed if hashed is not None else _precompute_hashes(buf)
    return _opt_encode_core(buf, lookup, b, hashes, tails)


def encode_block_opt(buf: np.ndarray, d: PackedDict, b: int = 16) -> bytes:
    """opt_dint_single_dict_block::encode with codeword width ``b``
    (16, or 8 for the comment-compiled single_packed8 variant of
    dint_configuration.hpp:6-29 — a 256-entry dictionary whose stream
    is single bytes)."""
    return _opt_encode(buf, d.lookup, b)


def encode_block_multi(buf: np.ndarray, m: MultiPackedDict) -> bytes:
    """opt_dint_multi_dict_block::encode: 12-way best-of, control byte.

    With the C kernel each run hashes windows in-kernel; on the Python
    path the window hashes are computed once and shared across all 12
    DP runs (the mitigation noted in SURVEY.md §7.4.4).
    """
    from dint_ray import native

    hashed = None if native.available() else _precompute_hashes(buf)
    best: bytes | None = None
    best_sc = 0
    for s in range(m.num_dictionaries):
        e16 = _opt_encode(buf, m.dicts[s].lookup, 16, hashed)
        e8 = _opt_encode(buf, m.small_lookups[s], 8, hashed)
        if len(e8) <= len(e16):
            smallest, sc = e8, s + m.num_dictionaries
        else:
            smallest, sc = e16, s
        if best is None or len(smallest) < len(best):
            best, best_sc = smallest, sc
    return bytes([best_sc]) + best


# full-block wrappers (partial blocks -> interpolative)

def encode_single(buf: np.ndarray, sum_of_values: int, d: PackedDict,
                  greedy: bool = False, b: int = 16) -> bytes:
    if len(buf) < BLOCK_SIZE:
        return interpolative.encode(buf, sum_of_values)
    return encode_block_greedy(buf, d) if greedy \
        else encode_block_opt(buf, d, b)


def encode_multi(buf: np.ndarray, sum_of_values: int, m: MultiPackedDict) -> bytes:
    if len(buf) < BLOCK_SIZE:
        return interpolative.encode(buf, sum_of_values)
    return encode_block_multi(buf, m)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

def _decode_codeword_stream(codes: np.ndarray, n: int, d: PackedDict,
                            wide: bool) -> tuple[np.ndarray, int]:
    """Decode n ints from a codeword array (uint16 if wide else uint8).

    Returns (values, number of code units consumed).  Vectorized per
    run-of-dict-codewords; exceptions handled scalar (they are rare).
    """
    out = np.zeros(n, dtype=np.uint32)
    lengths = d.lengths
    entries16 = d.entries16
    produced = 0
    cpos = 0
    total_codes = len(codes)
    while produced < n:
        remaining = n - produced
        # each codeword yields >= 1 int, so at most `remaining` codewords
        # belong to this block — never scan past that (the bytes beyond
        # the stream's true end belong to the next list/block).
        window = codes[cpos : cpos + remaining]
        exc_rel = np.flatnonzero(window < EXCEPTIONS)
        seg_end = int(exc_rel[0]) if len(exc_rel) else len(window)
        seg = window[:seg_end]
        if len(seg):
            # clamp the gather: positions past the stream's true end may
            # hold arbitrary bytes, but the cut below lands at or before
            # the true end, so their (wrong) lengths are never used
            lens = lengths[np.minimum(seg, len(lengths) - 1)]
            cum = np.cumsum(lens)
            # cut the segment where it completes this block's n ints
            ncw = int(np.searchsorted(cum, remaining, side="left")) + 1
            if ncw < len(seg):
                seg = seg[:ncw]
                lens = lens[:ncw]
                cum = cum[:ncw]
            elif cum[-1] > remaining:
                raise ValueError("corrupt DINT stream: overshoot")
            starts = produced + cum - lens
            norm = seg >= RESERVED
            if norm.any():
                cws = seg[norm].astype(np.int64)
                ls = lens[norm].astype(np.int64)
                st = starts[norm].astype(np.int64)
                tot = int(ls.sum())
                rep_st = np.repeat(st, ls)
                cum_ex = np.cumsum(ls) - ls
                within = np.arange(tot) - np.repeat(cum_ex, ls)
                out[rep_st + within] = entries16[np.repeat(cws, ls), within]
            # runs (2..6) decode to zeros: already zero-initialized
            produced += int(cum[-1])
            cpos += len(seg)
            continue
        # exception at cpos
        c = int(codes[cpos])
        if wide:
            if c == 0:
                out[produced] = int(codes[cpos + 1])
                cpos += 2
            else:
                out[produced] = int(codes[cpos + 1]) | (int(codes[cpos + 2]) << 16)
                cpos += 3
        else:
            if c == 0:
                out[produced] = int(codes[cpos + 1]) | (int(codes[cpos + 2]) << 8)
                cpos += 3
            else:
                out[produced] = (int(codes[cpos + 1]) | (int(codes[cpos + 2]) << 8)
                                 | (int(codes[cpos + 3]) << 16) | (int(codes[cpos + 4]) << 24))
                cpos += 5
        produced += 1
        if cpos > total_codes:
            raise ValueError("corrupt DINT stream: ran past end")
    return out, cpos


def decode_single(buf: np.ndarray, offset: int, sum_of_values: int, n: int,
                  d: PackedDict, b: int = 16) -> tuple[np.ndarray, int]:
    """dint_block::decode (b=16, or b=8 single-byte codewords) with
    interpolative fallback."""
    if n < BLOCK_SIZE:
        return interpolative.decode(buf, offset, sum_of_values, n)
    if b == 8:
        vals, used = _decode_codeword_stream(buf[offset:], n, d, wide=False)
        return vals, offset + used
    avail = (len(buf) - offset) // 2
    codes = buf[offset : offset + 2 * avail].view("<u2")
    vals, used = _decode_codeword_stream(codes, n, d, wide=True)
    return vals, offset + 2 * used


def decode_multi(buf: np.ndarray, offset: int, sum_of_values: int, n: int,
                 m: MultiPackedDict) -> tuple[np.ndarray, int]:
    """opt_dint_multi_dict_block::decode: control byte then b-bit stream."""
    if n < BLOCK_SIZE:
        return interpolative.decode(buf, offset, sum_of_values, n)
    sc = int(buf[offset])
    offset += 1
    if sc < m.num_dictionaries:
        avail = (len(buf) - offset) // 2
        codes = buf[offset : offset + 2 * avail].view("<u2")
        vals, used = _decode_codeword_stream(codes, n, m.dicts[sc], wide=True)
        return vals, offset + 2 * used
    d = m.dicts[sc - m.num_dictionaries]
    codes = buf[offset:]
    vals, used = _decode_codeword_stream(codes, n, d, wide=False)
    return vals, offset + used


# --------------------------------------------------------------------------
# codec adapters for the posting-list layout (index/layout.py)
# --------------------------------------------------------------------------

class SingleDintCodec:
    """encode/decode interface bound to one PackedDict (docs OR freqs).
    ``b`` is the codeword width: 16 (default), or 8 for single_packed8
    (256-entry dictionary, single-byte codeword stream)."""

    def __init__(self, d: PackedDict, greedy: bool = False,
                 b: int = 16) -> None:
        self.d = d
        self.greedy = greedy
        self.b = b

    def encode(self, values: np.ndarray, sum_of_values: int) -> bytes:
        return encode_single(values, sum_of_values, self.d,
                             greedy=self.greedy, b=self.b)

    def decode(self, buf: np.ndarray, offset: int, sum_of_values: int, n: int):
        return decode_single(buf, offset, sum_of_values, n, self.d,
                             b=self.b)


class MultiDintCodec:
    """encode/decode interface bound to one MultiPackedDict."""

    def __init__(self, m: MultiPackedDict) -> None:
        self.m = m

    def encode(self, values: np.ndarray, sum_of_values: int) -> bytes:
        return encode_multi(values, sum_of_values, self.m)

    def decode(self, buf: np.ndarray, offset: int, sum_of_values: int, n: int):
        return decode_multi(buf, offset, sum_of_values, n, self.m)
