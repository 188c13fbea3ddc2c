"""Block-partitioned posting-list layout.

Re-expresses /root/reference/include/dint/dict_posting_list.hpp:10-343:

    varbyte(n)
    block_maxs   : uint32 LE per block   (max docID of the block)
    endpoints    : uint32 LE per block except the last (byte offset of
                   the *end* of block b, relative to the payload start)
    payload      : per block, docs-coded bytes then freqs-coded bytes

- docID blocks store d-gaps ``doc - prev - 1`` (prev starts at -1), and
  the docs coder receives ``sum_of_values = block_max - block_base -
  (block_size - 1)`` (the exact gap sum, dict_posting_list.hpp:44-47);
- freq blocks store ``freq - 1`` with unknown sum (self-described).

The enumerator supports ``next`` / ``next_geq`` / ``move`` with
block-max skipping, mirroring document_enumerator (:88-343).
"""

from __future__ import annotations

import numpy as np

from dint_ray.codecs import varbyte
from dint_ray.config import U32_INVALID

BLOCK_SIZE = 256


class Codec:
    """Protocol: encode(gaps, sum_of_values) -> bytes;
    decode(buf, offset, sum_of_values, n) -> (gaps, new_offset)."""


def write_posting_list(docs: np.ndarray, freqs: np.ndarray, docs_codec, freqs_codec) -> bytes:
    if getattr(docs_codec, "whole_list", False):
        # sequence index kinds (ef / partitioned-EF) encode the whole
        # list, not 256-int blocks (index/sequences.py)
        from dint_ray.index.sequences import write_sequence_list

        return write_sequence_list(docs, freqs, docs_codec.kind)
    n = len(docs)
    assert n >= 1 and len(freqs) == n
    # single-dict DINT pair: whole list in one C call (byte-identical
    # twin, tests/test_dint.py; per-block Python staging dominated the
    # encode stage once the DP itself was fast)
    from dint_ray.dint.codec import SingleDintCodec

    if (type(docs_codec) is SingleDintCodec
            and type(freqs_codec) is SingleDintCodec
            and not docs_codec.greedy and not freqs_codec.greedy
            # the C whole-list writer emits b=16 streams only; the
            # single_packed8 variant stays on the Python encoder
            and docs_codec.b == 16 and freqs_codec.b == 16):
        from dint_ray import native

        enc = native.write_list(docs, freqs, BLOCK_SIZE,
                                docs_codec.d.lookup, freqs_codec.d.lookup)
        if enc is not None:
            return enc
    blocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    out = bytearray(varbyte.encode_single(n))
    maxs_at = len(out)
    out += b"\x00" * (4 * blocks)          # block maxs placeholder
    endp_at = len(out)
    out += b"\x00" * (4 * (blocks - 1))    # endpoints placeholder
    payload_at = len(out)

    docs64 = docs.astype(np.int64, copy=False)
    freqs64 = freqs.astype(np.int64, copy=False)
    prev = -1
    block_base = 0
    maxs = np.empty(blocks, dtype="<u4")
    endpoints = np.empty(max(blocks - 1, 0), dtype="<u4")
    for b in range(blocks):
        lo = b * BLOCK_SIZE
        hi = min(lo + BLOCK_SIZE, n)
        size = hi - lo
        dblk = docs64[lo:hi]
        gaps = np.empty(size, dtype=np.int64)
        gaps[0] = dblk[0] - prev - 1
        gaps[1:] = dblk[1:] - dblk[:-1] - 1
        last_doc = int(dblk[-1])
        maxs[b] = last_doc
        sum_of_values = last_doc - block_base - (size - 1)
        out += docs_codec.encode(gaps.astype(np.uint32), sum_of_values)
        out += freqs_codec.encode((freqs64[lo:hi] - 1).astype(np.uint32), U32_INVALID)
        if b != blocks - 1:
            endpoints[b] = len(out) - payload_at
        prev = last_doc
        block_base = last_doc + 1
    out[maxs_at : maxs_at + 4 * blocks] = maxs.tobytes()
    if blocks > 1:
        out[endp_at : endp_at + 4 * (blocks - 1)] = endpoints.tobytes()
    return bytes(out)


class PostingListView:
    """Parsed header over one posting list's bytes.

    Constructing with a sequence-kind codec bundle returns a
    SequenceListView instead (same decode_all surface), so every call
    site reads any index kind through this one name."""

    __slots__ = ("buf", "n", "blocks", "maxs", "endpoints", "payload_at", "docs_codec", "freqs_codec")

    def __new__(cls, data, docs_codec=None, freqs_codec=None):
        if getattr(docs_codec, "whole_list", False):
            from dint_ray.index.sequences import SequenceListView

            return SequenceListView(data)
        return super().__new__(cls)

    def __init__(self, data: bytes | np.ndarray, docs_codec, freqs_codec) -> None:
        buf = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray, memoryview)) else data
        self.buf = buf
        self.docs_codec = docs_codec
        self.freqs_codec = freqs_codec
        n, off = varbyte.decode_single(buf, 0)
        self.n = n
        blocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
        self.blocks = blocks
        self.maxs = buf[off : off + 4 * blocks].view("<u4")
        off += 4 * blocks
        self.endpoints = buf[off : off + 4 * (blocks - 1)].view("<u4")
        off += 4 * (blocks - 1)
        self.payload_at = off

    def block_bounds(self, b: int) -> tuple[int, int, int]:
        """(start_offset, size, block_base) of block b."""
        start = self.payload_at + (int(self.endpoints[b - 1]) if b else 0)
        size = BLOCK_SIZE if (b + 1) * BLOCK_SIZE <= self.n else self.n - b * BLOCK_SIZE
        base = int(self.maxs[b - 1]) + 1 if b else 0
        return start, size, base

    def decode_block(self, b: int, want_freqs: bool = True):
        start, size, base = self.block_bounds(b)
        last = int(self.maxs[b])
        sum_docs = last - base - (size - 1)
        gaps, off = self.docs_codec.decode(self.buf, start, sum_docs, size)
        docs = np.cumsum(gaps.astype(np.int64) + 1) + (base - 1)
        freqs = None
        if want_freqs:
            fgaps, _ = self.freqs_codec.decode(self.buf, off, U32_INVALID, size)
            freqs = fgaps.astype(np.int64) + 1
        return docs, freqs

    def decode_all(self) -> tuple[np.ndarray, np.ndarray]:
        ds, fs = [], []
        for b in range(self.blocks):
            d, f = self.decode_block(b)
            ds.append(d)
            fs.append(f)
        return np.concatenate(ds), np.concatenate(fs)


class DocumentEnumerator:
    """Skip-capable cursor (document_enumerator semantics)."""

    __slots__ = ("view", "universe", "_cur_block", "_docs", "_freqs",
                 "_pos_in_block", "_cur_docid", "_exhausted")

    def __init__(self, view: PostingListView, universe: int) -> None:
        self.view = view
        self.universe = universe
        self._exhausted = False
        self._decode_block(0)

    @property
    def size(self) -> int:
        return self.view.n

    def _decode_block(self, b: int) -> None:
        self._cur_block = b
        self._docs, self._freqs = self.view.decode_block(b)
        self._pos_in_block = 0
        self._cur_docid = int(self._docs[0])

    def docid(self) -> int:
        return self.universe if self._exhausted else self._cur_docid

    def freq(self) -> int:
        return int(self._freqs[self._pos_in_block])

    def position(self) -> int:
        return self._cur_block * BLOCK_SIZE + self._pos_in_block

    def next(self) -> None:
        if self._exhausted:
            return
        self._pos_in_block += 1
        if self._pos_in_block == len(self._docs):
            if self._cur_block + 1 == self.view.blocks:
                self._exhausted = True
                return
            self._decode_block(self._cur_block + 1)
        else:
            self._cur_docid = int(self._docs[self._pos_in_block])

    def next_geq(self, lower_bound: int) -> None:
        if self._exhausted:
            return
        if lower_bound > int(self.view.maxs[self._cur_block]):
            # find the first block whose max >= lower_bound
            b = int(np.searchsorted(self.view.maxs, lower_bound, side="left"))
            if b == self.view.blocks:
                self._exhausted = True
                return
            self._decode_block(b)
        pos = int(np.searchsorted(self._docs[self._pos_in_block:], lower_bound, side="left"))
        self._pos_in_block += pos
        self._cur_docid = int(self._docs[self._pos_in_block])

    def move(self, position: int) -> None:
        if position >= self.view.n:
            self._exhausted = True
            return
        b = position // BLOCK_SIZE
        if b != self._cur_block:
            self._decode_block(b)
        self._pos_in_block = position % BLOCK_SIZE
        self._cur_docid = int(self._docs[self._pos_in_block])
