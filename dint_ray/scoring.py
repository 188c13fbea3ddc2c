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


def doc_term_weight(freq, norm_len):
    """Vectorized float32 BM25 document-term weight."""
    f = np.asarray(freq, dtype=np.float32)
    nl = np.asarray(norm_len, dtype=np.float32)
    return f / (f + K1 * (ONE - B + B * nl))


def query_term_weight(query_freq: int, df: int, num_docs: int) -> np.float32:
    f = F32(query_freq)
    fdf = F32(df)
    idf = F32(np.log((F32(num_docs) - fdf + HALF) / (fdf + HALF)))
    return f * max(EPS, idf) * (ONE + K1)


class WandData:
    """norm_lens per doc + max doc-term weight per term."""

    def __init__(self, norm_lens: np.ndarray, max_term_weight: np.ndarray) -> None:
        self.norm_lens = norm_lens.astype(np.float32)
        self.max_term_weight = max_term_weight.astype(np.float32)

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
