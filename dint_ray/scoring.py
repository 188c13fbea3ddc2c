"""BM25 scoring + WAND metadata.

The constants and float32 evaluation order are the rank-identity
contract (/root/reference/include/ds2i/bm25.hpp:7-25):
    k1 = 1.2, b = 0.5
    doc_term_weight(f, nl)  = f / (f + k1*(1 - b + b*nl))
    query_term_weight(qf, df, N) =
        qf * max(1e-6, ln((N - df + 0.5)/(df + 0.5))) * (1 + k1)

WAND metadata (/root/reference/include/ds2i/wand_data.hpp:17-53):
norm_lens[doc] = len/avg_len; max_term_weight[term] = max BM25
doc-term weight over the list — term-level bounds (classic WAND).
"""

from __future__ import annotations

import numpy as np

F32 = np.float32
K1 = F32(1.2)
B = F32(0.5)
EPS = F32(1.0e-6)
ONE = F32(1.0)
HALF = F32(0.5)


def doc_term_weight(freq, norm_len, dtype=np.float32):
    """Vectorized BM25 document-term weight.

    dtype=float32 is the reference-parity contract (bm25.hpp evaluates
    in float); float64 exists for the DuckDB oracle entries, where the
    comparison target computes in double."""
    f = np.asarray(freq, dtype=dtype)
    nl = np.asarray(norm_len, dtype=dtype)
    k1, b, one = dtype(1.2), dtype(0.5), dtype(1.0)
    return f / (f + k1 * (one - b + b * nl))


def query_term_weight(query_freq: int, df: int, num_docs: int, dtype=np.float32):
    f = dtype(query_freq)
    fdf = dtype(df)
    half = dtype(0.5)
    idf = dtype(np.log((dtype(num_docs) - fdf + half) / (fdf + half)))
    return f * max(dtype(1.0e-6), idf) * (dtype(1.0) + dtype(1.2))


class WandData:
    """norm_lens per doc + max doc-term weight per term.

    ``sizes`` (raw doc lengths) may be attached so the float64 oracle
    path can recompute norms exactly (len / (sum(len)/N) in double, the
    same arithmetic DuckDB's avg() uses) instead of widening the
    float32-rounded norms."""

    def __init__(self, norm_lens: np.ndarray, max_term_weight: np.ndarray,
                 sizes: np.ndarray | None = None) -> None:
        self.norm_lens = norm_lens.astype(np.float32)
        self.max_term_weight = max_term_weight.astype(np.float32)
        self.sizes = sizes
        self._norms64 = None

    def norms(self, dtype=np.float32) -> np.ndarray:
        if dtype is np.float32:
            return self.norm_lens
        if self._norms64 is None:
            if self.sizes is not None:
                sz = np.asarray(self.sizes, dtype=np.float64)
                self._norms64 = sz / (sz.sum() / len(sz))
            else:
                self._norms64 = self.norm_lens.astype(np.float64)
        return self._norms64

    @classmethod
    def from_sizes(cls, sizes: np.ndarray, postings_iter) -> "WandData":
        """sizes[doc] = length; postings_iter yields (term_id, docs, freqs)
        in term_id order (wand_data.hpp:17-53: avg over num_docs in
        float64, then float32 divide; per-list max of doc_term_weight)."""
        num_docs = len(sizes)
        avg = np.float32(float(np.asarray(sizes, dtype=np.float64).sum()) / num_docs)
        norm_lens = (sizes.astype(np.float32) / avg).astype(np.float32)
        max_w: dict[int, float] = {}
        for term_id, docs, freqs in postings_iter:
            w = doc_term_weight(freqs, norm_lens[docs])
            max_w[int(term_id)] = float(w.max()) if len(w) else 0.0
        arr = np.zeros(max(max_w) + 1 if max_w else 0, dtype=np.float32)
        for t, w in max_w.items():
            arr[t] = w
        return cls(norm_lens, arr)


def max_weight_of_list(docs: np.ndarray, freqs: np.ndarray,
                       norm_lens: np.ndarray) -> np.float32:
    """Per-term max BM25 weight, computed where the list is materialized
    (fused into shard build — SURVEY.md §2.7 A5, no extra shuffle)."""
    if len(docs) == 0:
        return np.float32(0.0)
    return doc_term_weight(freqs, norm_lens[docs]).max()
