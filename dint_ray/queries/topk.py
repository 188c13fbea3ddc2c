"""Bounded top-k queue.

Re-expresses topk_queue (/root/reference/include/ds2i/queries.hpp:150-188)
with the deterministic tie-break mandated by SURVEY.md §2.11: the heap
keeps (score, docid) pairs and the selection order is
(score desc, docid asc).  Because every query algorithm inserts
candidates in ascending docid order, the reference's strict
``score > min`` insertion already keeps the smallest-docid ties; we
make the same outcome explicit (and evict the largest docid among tied
minimum scores).
"""

from __future__ import annotations

import heapq


class TopK:
    __slots__ = ("k", "_heap")

    def __init__(self, k: int) -> None:
        self.k = k
        self._heap: list[tuple[float, int]] = []  # (score, -docid) min-heap

    def clear(self) -> None:
        self._heap.clear()

    def insert(self, score: float, docid: int) -> bool:
        if len(self._heap) < self.k:
            heapq.heappush(self._heap, (score, -docid))
            return True
        if score > self._heap[0][0]:
            heapq.heapreplace(self._heap, (score, -docid))
            return True
        return False

    def would_enter(self, score: float) -> bool:
        return len(self._heap) < self.k or score > self._heap[0][0]

    def finalize(self) -> list[tuple[int, float]]:
        """[(docid, score)] sorted by (score desc, docid asc)."""
        return [(-nd, s) for s, nd in sorted(self._heap, key=lambda e: (-e[0], -e[1]))]
