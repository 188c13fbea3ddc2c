"""ds2i binary collection format reader/writer (SURVEY.md S1/S2/S4/S5).

The reference consumes collections as flat files of little-endian
uint32 words, back-to-back sequences each prefixed by its 32-bit
length (/root/reference/include/ds2i/binary_collection.hpp:13-157,
format documented in /root/reference/README.md:39-55):

- `<base>.docs`:  singleton [num_docs] first, then one sorted docID
  sequence per term (binary_freq_collection.hpp:18-23);
- `<base>.freqs`: one frequency sequence per term, positionally
  aligned with .docs;
- `<base>.sizes`: a single sequence of per-document lengths;
- query log: text, one query per line of whitespace-separated
  integer term ids (queries.hpp:15-27).

These are interchange adapters only — the engine's own storage is
Parquet; this module lets a ds2i-prepared corpus (or the reference's
own bundled test data) flow into the Ray pipeline and back out.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def read_sequences(path: str) -> list[np.ndarray]:
    """All length-prefixed uint32 sequences of a file, in order.
    Zero-length sequences are preserved here (the reference's iterator
    skips them at a higher level, binary_collection.hpp:138)."""
    raw = np.fromfile(path, dtype="<u4")
    out = []
    i = 0
    while i < len(raw):
        n = int(raw[i])
        out.append(raw[i + 1 : i + 1 + n].copy())
        i += 1 + n
    if i != len(raw):
        raise ValueError(f"{path}: truncated sequence stream")
    return out


def write_sequences(path: str, seqs) -> None:
    parts = []
    for s in seqs:
        s = np.asarray(s, dtype="<u4")
        parts.append(np.asarray([len(s)], dtype="<u4"))
        parts.append(s)
    np.concatenate(parts).tofile(path)


def read_freq_collection(basename: str):
    """(num_docs, postings) where postings = {term_id: (docs, freqs)};
    binary_freq_collection semantics (binary_freq_collection.hpp:11-99):
    .docs leads with the singleton [num_docs]."""
    docs_seqs = read_sequences(basename + ".docs")
    freqs_seqs = read_sequences(basename + ".freqs")
    if not docs_seqs or len(docs_seqs[0]) != 1:
        raise ValueError("missing leading [num_docs] singleton")
    num_docs = int(docs_seqs[0][0])
    docs_seqs = docs_seqs[1:]
    if len(docs_seqs) != len(freqs_seqs):
        raise ValueError(".docs/.freqs sequence counts differ")
    postings = {tid: (d, f)
                for tid, (d, f) in enumerate(zip(docs_seqs, freqs_seqs))}
    return num_docs, postings


def write_freq_collection(basename: str, num_docs: int, postings) -> None:
    tids = sorted(postings)
    write_sequences(basename + ".docs",
                    [np.asarray([num_docs])] + [postings[t][0] for t in tids])
    write_sequences(basename + ".freqs", [postings[t][1] for t in tids])


def read_sizes(path: str) -> np.ndarray:
    """Per-document lengths (src/create_wand_data.cpp:22-25): the file
    is a single sequence."""
    seqs = read_sequences(path)
    if len(seqs) != 1:
        raise ValueError(f"{path}: expected exactly one sequence")
    return seqs[0]


def read_query_log(path: str) -> list[list[int]]:
    """(queries.hpp:15-27): one query per line, whitespace-separated
    integer term ids; blank lines skipped."""
    out = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if parts:
                out.append([int(x) for x in parts])
    return out


def postings_to_table(postings) -> pa.Table:
    """ds2i postings -> the engine's grouped Arrow form
    (term_id, docs, freqs)."""
    tids = sorted(postings)
    return pa.table({
        "term_id": pa.array(tids, pa.uint32()),
        "docs": pa.array([postings[t][0].tolist() for t in tids],
                         pa.list_(pa.uint32())),
        "freqs": pa.array([postings[t][1].tolist() for t in tids],
                          pa.list_(pa.uint32())),
    })


def read_blocks_collection(path: str) -> list[tuple[int, np.ndarray]]:
    """binary_blocks_collection (SURVEY.md S3): precomputed block
    statistics as flat little-endian uint32 words — a [num_blocks]
    header word, then per block ``[n][freq][v0..v_{n-1}]`` where n is
    the value count (freq excluded); zero-length n words are skipped
    (binary_blocks_collection.hpp:27-31,121-137).  Returns
    [(freq, values)] in file order."""
    raw = np.fromfile(path, dtype="<u4")
    if len(raw) == 0 or raw[0] == 0:
        raise ValueError(f"{path}: number of blocks must not be 0")
    num_blocks = int(raw[0])
    out: list[tuple[int, np.ndarray]] = []
    i = 1
    while i < len(raw):
        n = int(raw[i]); i += 1
        if n == 0:          # skip empty seqs, as the reference iterator does
            continue
        # file might be truncated (hpp:129)
        n = min(n, len(raw) - i - 1)
        out.append((int(raw[i]), raw[i + 1 : i + 1 + n].copy()))
        i += 1 + n
    if len(out) != num_blocks:
        raise ValueError(
            f"{path}: header says {num_blocks} blocks, parsed {len(out)}")
    return out


def write_blocks_collection(path: str, blocks) -> None:
    """Inverse of :func:`read_blocks_collection`; ``blocks`` is an
    iterable of (freq, values)."""
    parts = [np.asarray([len(blocks)], dtype="<u4")]
    for freq, vals in blocks:
        vals = np.asarray(vals, dtype="<u4")
        parts.append(np.asarray([len(vals), freq], dtype="<u4"))
        parts.append(vals)
    np.concatenate(parts).tofile(path)


def blocks_to_table(blocks) -> pa.Table:
    """Block statistics -> the engine's hash-keyed stats shape
    (size, freq, values), mirroring how dictionary_builders.hpp
    consumes a blocks collection as (pattern, frequency) pairs."""
    return pa.table({
        "size": pa.array([len(v) for _, v in blocks], pa.uint32()),
        "freq": pa.array([f for f, _ in blocks], pa.uint64()),
        "values": pa.array([np.asarray(v, np.uint32).tolist()
                            for _, v in blocks], pa.list_(pa.uint32())),
    })
