"""Whole-list sequence encodings: Elias-Fano and partitioned EF.

Re-expresses the reference's non-block index family
(/root/reference/include/index_types.hpp:25-37):

- ``ef``          — one compact Elias-Fano sequence per posting list
                    (compact_elias_fano.hpp:12-420);
- ``pef_uniform`` — fixed-size partitions, per-partition best-of-3
                    representation (uniform_partitioned_sequence.hpp:14-318);
- ``pef_opt``     — partition boundaries chosen by a cost-model DP
                    (partitioned_sequence.hpp:16-349 +
                    optimal_partition.hpp:13-122).

Per-partition representation (indexed_sequence.hpp:12-165 dispatch):
    0 = Elias-Fano over (value - base) in [0, span)
    1 = plain bitvector of span bits
    2 = all-ones run (no payload: values are base..base+m-1)
chosen by encoded bit cost; partitions are relative so each starts at
its own base.

Deviation (documented): the reference's optimal_partition implements
the (1+eps)-approximate DP with doubling cost windows; we quantize cut
candidates to CAND_STEP positions and run the exact DP over those
nodes — deterministic, near-optimal, O((n/step)^2) with a window cap.
Freqs are encoded as a positive_sequence (EF over prefix sums,
positive_sequence.hpp:9-80).

Layout (our own, little-endian):
    docs:  varbyte(num_partitions)
           per partition: varbyte(m) varbyte(base) varbyte(span) u8(tag)
                          [payload]
    freqs: compact EF over cumsum(freqs) with universe sum+1
"""

from __future__ import annotations

import numpy as np

from dint_ray.codecs import varbyte
from dint_ray.codecs.ef import ef_bit_cost, ef_decode, ef_encode

CAND_STEP = 64          # cut-candidate quantum for the pef_opt DP
MAX_PART = 4096         # cap partition length (keeps DP windows small)
PART_OVERHEAD_BITS = 64  # per-partition header estimate for the DP
UNIFORM_PART = 128      # reference default partition size (uniform)


def _part_cost_bits(m: int, span: int) -> int:
    """Best-of-3 representation cost in bits for one partition."""
    if m == span:
        return 8                       # all-ones: tag only
    return 8 + min(ef_bit_cost(m, span), span)


def _encode_partition(rel: np.ndarray, span: int) -> tuple[int, bytes]:
    """(tag, payload) for values rel[0..m) in [0, span)."""
    m = len(rel)
    if m == span:
        return 2, b""
    ef_bits = ef_bit_cost(m, span)
    if span < ef_bits:
        bv = np.zeros((span + 7) // 8, dtype=np.uint8)
        pos = rel.astype(np.int64)
        np.bitwise_or.at(bv, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return 1, bv.tobytes()
    return 0, ef_encode(rel, span)


def _decode_partition(tag: int, buf: np.ndarray, offset: int, m: int,
                      span: int):
    if tag == 2:
        return np.arange(m, dtype=np.uint64), offset
    if tag == 1:
        nbytes = (span + 7) // 8
        bits = np.unpackbits(buf[offset:offset + nbytes],
                             bitorder="little")[:span]
        return np.flatnonzero(bits).astype(np.uint64), offset + nbytes
    vals, off = ef_decode(buf, offset)
    return vals, off


def _partition_points_uniform(n: int) -> np.ndarray:
    return np.arange(UNIFORM_PART, n, UNIFORM_PART, dtype=np.int64)


def _partition_points_opt(docs: np.ndarray, universe: int) -> np.ndarray:
    """Quantized-candidate DP minimizing total encoded bits."""
    n = len(docs)
    cands = list(range(CAND_STEP, n, CAND_STEP))
    nodes = [0] + cands + [n]
    nn = len(nodes)
    INF = float("inf")
    best = [INF] * nn
    prev = [0] * nn
    best[0] = 0.0
    max_span_nodes = max(1, MAX_PART // CAND_STEP)
    for j in range(1, nn):
        lo_i = max(0, j - max_span_nodes)
        for i in range(lo_i, j):
            a, b = nodes[i], nodes[j]
            base = int(docs[a])
            hi = int(docs[b - 1])
            span = hi - base + 1
            c = best[i] + PART_OVERHEAD_BITS + _part_cost_bits(b - a, span)
            if c < best[j]:
                best[j] = c
                prev[j] = i
    cuts = []
    j = nn - 1
    while j > 0:
        i = prev[j]
        if nodes[i] != 0:
            cuts.append(nodes[i])
        j = i
    return np.asarray(sorted(cuts), dtype=np.int64)


def write_docs_sequence(docs: np.ndarray, universe: int, kind: str) -> bytes:
    docs = np.asarray(docs, dtype=np.uint64)
    n = len(docs)
    if kind == "ef":
        cuts = np.empty(0, dtype=np.int64)
    elif kind == "pef_uniform":
        cuts = _partition_points_uniform(n)
    else:
        cuts = _partition_points_opt(docs, universe)
    bounds = np.concatenate(([0], cuts, [n])).astype(np.int64)
    out = bytearray(varbyte.encode_single(len(bounds) - 1))
    for p in range(len(bounds) - 1):
        a, b = int(bounds[p]), int(bounds[p + 1])
        base = int(docs[a])
        span = int(docs[b - 1]) - base + 1
        rel = (docs[a:b] - np.uint64(base)).astype(np.uint64)
        tag, payload = _encode_partition(rel, span)
        out += varbyte.encode_single(b - a)
        out += varbyte.encode_single(base)
        out += varbyte.encode_single(span)
        out.append(tag)
        out += payload
    return bytes(out)


def read_docs_sequence(buf: np.ndarray, offset: int = 0):
    nparts, offset = varbyte.decode_single(buf, offset)
    parts = []
    for _ in range(nparts):
        m, offset = varbyte.decode_single(buf, offset)
        base, offset = varbyte.decode_single(buf, offset)
        span, offset = varbyte.decode_single(buf, offset)
        tag = int(buf[offset])
        offset += 1
        rel, offset = _decode_partition(tag, buf, offset, m, span)
        parts.append(rel + np.uint64(base))
    vals = np.concatenate(parts) if parts else np.empty(0, np.uint64)
    return vals, offset


def write_freqs_sequence(freqs: np.ndarray) -> bytes:
    """positive_sequence: EF over the prefix sums (freqs >= 1 so the
    sums are strictly increasing)."""
    f = np.asarray(freqs, dtype=np.uint64)
    csum = np.cumsum(f, dtype=np.uint64)
    universe = int(csum[-1]) + 1 if len(csum) else 1
    return ef_encode(csum, universe)


def read_freqs_sequence(buf: np.ndarray, offset: int = 0):
    csum, offset = ef_decode(buf, offset)
    f = np.diff(csum, prepend=np.uint64(0)).astype(np.uint32)
    return f, offset


SEQ_KINDS = ("ef", "pef_uniform", "pef_opt")


class SequenceCodecs:
    """Codec-bundle stand-in for sequence index kinds: write/open whole
    lists instead of 256-int blocks (index/layout.py dispatches on
    ``whole_list``)."""

    whole_list = True

    def __init__(self, kind: str) -> None:
        assert kind in SEQ_KINDS
        self.kind = kind


def write_sequence_list(docs: np.ndarray, freqs: np.ndarray, kind: str,
                        universe: int | None = None) -> bytes:
    u = int(docs[-1]) + 1 if universe is None else universe
    out = bytearray(varbyte.encode_single(len(docs)))
    out += varbyte.encode_single(u)
    out += write_docs_sequence(docs, u, kind)
    out += write_freqs_sequence(freqs)
    return bytes(out)


class SequenceListView:
    """PostingListView-shaped reader over a sequence-coded list."""

    __slots__ = ("buf", "n", "universe", "_decoded", "_docs_off")

    def __init__(self, data, kind: str | None = None) -> None:
        buf = np.frombuffer(data, dtype=np.uint8) if isinstance(
            data, (bytes, bytearray, memoryview)) else data
        self.buf = buf
        n, off = varbyte.decode_single(buf, 0)
        self.n = n
        self.universe, self._docs_off = varbyte.decode_single(buf, off)
        self._decoded = None

    def decode_all(self):
        if self._decoded is None:
            docs, off = read_docs_sequence(self.buf, self._docs_off)
            freqs, _ = read_freqs_sequence(self.buf, off)
            self._decoded = (docs.astype(np.uint32), freqs)
        return self._decoded
