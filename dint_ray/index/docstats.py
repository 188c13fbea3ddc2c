"""Range-sliced document statistics (the `.sizes` / wand_data norms).

The reference mmaps one `.sizes` image and shares it between threads
(/root/reference/include/ds2i/wand_data.hpp:17-63).  The distributed
equivalent must NOT give every bucket owner / segment encoder an
O(num_docs) resident array (a ~4 TB heap copy per actor at 10^12
docs).  Instead:

- ``write_sizes_sorted`` persists the (doc_id, len) table SORTED by
  doc_id with bounded row groups, so row-group statistics make any
  doc_id range readable without scanning the file;
- ``DocStats`` serves ``[lo, hi)`` slices via predicate reads
  (row-group pruning) with a small LRU slice cache — an actor's
  resident doc-stat memory is O(slice x cache), never O(num_docs).

At even larger scale the artifact shards into one sorted file per doc
range; every reader here goes through pyarrow dataset filters, which
work identically over a directory of sorted parts.
"""

from __future__ import annotations

import os
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ROW_GROUP_DOCS = 262_144


def write_sizes_sorted(sizes, path: str,
                       row_group_size: int = ROW_GROUP_DOCS) -> None:
    """Persist doc sizes sorted by doc_id, atomically.

    ``sizes`` is a pyarrow Table (small inputs: the driver-side
    group_by result) or a ray Dataset (large inputs: stays distributed
    through the sort; the driver then streams row groups out, holding
    O(row_group) memory, never the table)."""
    tmp = path + ".tmp"
    if isinstance(sizes, pa.Table):
        order = np.argsort(sizes.column("doc_id").to_numpy(
            zero_copy_only=False), kind="stable")
        pq.write_table(sizes.take(order), tmp, row_group_size=row_group_size)
    else:
        writer = None
        for b in (sizes.sort("doc_id")
                  .iter_batches(batch_size=row_group_size,
                                batch_format="pyarrow")):
            if writer is None:
                writer = pq.ParquetWriter(tmp, b.schema)
            writer.write_table(b, row_group_size=row_group_size)
        if writer is None:  # empty corpus: still publish a valid file
            empty = pa.table({"doc_id": pa.array([], pa.uint64()),
                              "len": pa.array([], pa.int64())})
            pq.write_table(empty, tmp)
        else:
            writer.close()
    os.replace(tmp, path)


def streaming_len_stats(path: str) -> tuple[int, int]:
    """(sum(len), row count) via one row-group-at-a-time scan —
    O(row_group) driver memory.  The integer sum is exact, unlike a
    float64 reduction over a materialized array."""
    pf = pq.ParquetFile(path)
    total = rows = 0
    for i in range(pf.num_row_groups):
        col = pf.read_row_group(i, columns=["len"]).column("len")
        s = pc.sum(col).as_py()
        total += int(s or 0)
        rows += len(col)
    return total, rows


class DocStats:
    """Doc-range slices of a sorted sizes parquet, LRU-cached.

    ``range_lens(lo, hi)`` / ``range_norms32(lo, hi)`` return dense
    arrays over ``[lo, hi)`` (docs with no tokens -> len 0), read via
    predicate pushdown so only the covering row groups are scanned.
    ``cache_slices`` bounds resident memory to O(cache x slice)."""

    def __init__(self, path: str, num_docs: int, avg: float,
                 cache_slices: int = 4) -> None:
        self.path = path
        self.num_docs = int(num_docs)
        self.avg = float(avg)
        self._avg32 = np.float32(avg)
        self._cache: OrderedDict[tuple[int, int], np.ndarray] = OrderedDict()
        self._cache_slices = cache_slices
        self.rows_read = 0  # diagnostics: total rows materialized

    def range_lens(self, lo: int, hi: int) -> np.ndarray:
        """uint32 lens for docs in [lo, hi)."""
        key = (lo, hi)
        hit = self._cache.get(key)
        if hit is not None:
            self._cache.move_to_end(key)
            return hit
        t = pq.read_table(self.path,
                          filters=[("doc_id", ">=", lo),
                                   ("doc_id", "<", hi)])
        out = np.zeros(hi - lo, dtype=np.uint32)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        out[ids.astype(np.int64) - lo] = \
            t.column("len").to_numpy(zero_copy_only=False)
        self.rows_read += len(ids)
        self._cache[key] = out
        while len(self._cache) > self._cache_slices:
            self._cache.popitem(last=False)
        return out

    def range_norms32(self, lo: int, hi: int) -> np.ndarray:
        """float32 len/avg norms for docs in [lo, hi) — the exact
        float32 op order of the full-array path (len32 / avg32).
        Cached alongside the len slices (same LRU budget)."""
        key = ("n32", lo, hi)
        hit = self._cache.get(key)
        if hit is not None:
            self._cache.move_to_end(key)
            return hit
        n = (self.range_lens(lo, hi).astype(np.float32) /
             self._avg32).astype(np.float32)
        self._cache[key] = n
        while len(self._cache) > self._cache_slices:
            self._cache.popitem(last=False)
        return n
