"""Query algorithms over the inverted index.

Faithful re-expressions of /root/reference/include/ds2i/queries.hpp:
``and_query`` (:34-84), ``or_query`` (:86-130), ``ranked_and_query``
(:309-385), ``ranked_or_query`` (:387-457), ``wand_query`` (:190-307),
``maxscore_query`` (:459-573), plus a vectorized ranked-OR fast path
(dense float32 accumulator) that is bit-identical to the faithful one
because both accumulate per-doc contributions in ascending term_id
order.

Determinism fixes (documented deviations, SURVEY.md §2.11/§7.4):
- top-k total order is (score desc, docid asc) — see queries/topk.py;
- per-doc float32 contributions are summed in ascending term_id order
  in *every* algorithm (the reference sums in enumerator order, which
  is unspecified for equal docids / equal list sizes);
- query terms missing from the index are skipped (the reference
  assumes all query term-ids exist).
"""

from __future__ import annotations

import numpy as np

from dint_ray.queries.topk import TopK
from dint_ray.scoring import WandData, doc_term_weight, query_term_weight


def remove_duplicate_terms(terms: list[int]) -> list[int]:
    return sorted(set(terms))


def query_freqs(terms: list[int]) -> list[tuple[int, int]]:
    """(term, multiplicity) pairs, term-sorted (queries.hpp:135-148)."""
    out: dict[int, int] = {}
    for t in sorted(terms):
        out[t] = out.get(t, 0) + 1
    return list(out.items())


def _present(index, terms):
    return [t for t in terms if t in index]


# --------------------------------------------------------------------------
# boolean
# --------------------------------------------------------------------------

def and_count(index, terms: list[int]) -> int:
    terms = _present(index, remove_duplicate_terms(terms))
    if not terms:
        return 0
    enums = [index.enumerator(t) for t in terms]
    enums.sort(key=lambda e: e.size)
    num_docs = index.num_docs
    results = 0
    candidate = enums[0].docid()
    i = 1
    while candidate < num_docs:
        while i < len(enums):
            enums[i].next_geq(candidate)
            if enums[i].docid() != candidate:
                candidate = enums[i].docid()
                i = 0
                break
            i += 1
        else:
            results += 1
            enums[0].next()
            candidate = enums[0].docid()
            i = 1
    return results


def and_docs(index, terms: list[int]) -> list[int]:
    """Leapfrog intersection emitting the matched docIDs (the
    pair_wise_intersect harness shape,
    /root/reference/src/pair_wise_intersect.cpp:28-59)."""
    terms = _present(index, remove_duplicate_terms(terms))
    if not terms:
        return []
    enums = [index.enumerator(t) for t in terms]
    enums.sort(key=lambda e: e.size)
    num_docs = index.num_docs
    out: list[int] = []
    candidate = enums[0].docid()
    i = 1
    while candidate < num_docs:
        while i < len(enums):
            enums[i].next_geq(candidate)
            if enums[i].docid() != candidate:
                candidate = enums[i].docid()
                i = 0
                break
            i += 1
        else:
            out.append(int(candidate))
            enums[0].next()
            candidate = enums[0].docid()
            i = 1
    return out


def or_count(index, terms: list[int]) -> int:
    terms = _present(index, remove_duplicate_terms(terms))
    if not terms:
        return 0
    enums = [index.enumerator(t) for t in terms]
    num_docs = index.num_docs
    results = 0
    cur = min(e.docid() for e in enums)
    while cur < num_docs:
        results += 1
        nxt = num_docs
        for e in enums:
            if e.docid() == cur:
                e.next()
            if e.docid() < nxt:
                nxt = e.docid()
        cur = nxt
    return results


# --------------------------------------------------------------------------
# ranked
# --------------------------------------------------------------------------

class _ScoredEnum:
    __slots__ = ("term", "enum", "q_weight", "max_weight")

    def __init__(self, term, enum, q_weight, max_weight=0.0):
        self.term = term
        self.enum = enum
        self.q_weight = q_weight
        self.max_weight = max_weight


def _scored_enums(index, wdata: WandData, terms, with_bounds=False, dtype=np.float32):
    enums = []
    for term, qf in query_freqs(terms):
        if term not in index:
            continue
        en = index.enumerator(term)
        qw = query_term_weight(qf, en.size, index.num_docs, dtype)
        if with_bounds:
            if dtype is np.float32:
                mw = np.float32(qw * wdata.max_term_weight[term])
            else:
                # recompute the term bound in f64 so it stays an upper bound
                docs, freqs = index.decode(term)
                mw = dtype(qw * doc_term_weight(freqs, wdata.norms(dtype)[docs], dtype).max())
        else:
            mw = dtype(0.0)
        enums.append(_ScoredEnum(term, en, qw, mw))
    return enums


def _sum_term_order(contribs, dtype=np.float32):
    s = dtype(0.0)
    for _, c in sorted(contribs, key=lambda x: x[0]):
        s = dtype(s + c)
    return s


def ranked_or(index, wdata: WandData, terms: list[int], k: int = 10, dtype=np.float32):
    """Exhaustive BM25 union — the oracle for the pruned algorithms."""
    topk = TopK(k)
    enums = _scored_enums(index, wdata, terms, dtype=dtype)
    if not enums:
        return []
    num_docs = index.num_docs
    norms = wdata.norms(dtype)
    cur = min(se.enum.docid() for se in enums)
    while cur < num_docs:
        score = dtype(0.0)
        norm_len = norms[cur]
        nxt = num_docs
        for se in enums:  # ascending term order by construction
            if se.enum.docid() == cur:
                w = dtype(se.q_weight * doc_term_weight(se.enum.freq(), norm_len, dtype))
                score = dtype(score + w)
                se.enum.next()
            if se.enum.docid() < nxt:
                nxt = se.enum.docid()
        topk.insert(float(score), cur)
        cur = nxt
    return topk.finalize()


def ranked_or_fast(index, wdata: WandData, terms: list[int], k: int = 10, dtype=np.float32):
    """Dense vectorized ranked-OR: float32-identical to ranked_or
    (same per-doc accumulation order: ascending term_id)."""
    num_docs = index.num_docs
    scores = np.zeros(num_docs, dtype=dtype)
    touched = np.zeros(num_docs, dtype=bool)
    any_term = False
    for term, qf in query_freqs(terms):
        if term not in index:
            continue
        any_term = True
        docs, freqs = index.decode(term)
        qw = query_term_weight(qf, index.size(term), num_docs, dtype)
        w = dtype(qw) * doc_term_weight(freqs, wdata.norms(dtype)[docs], dtype)
        scores[docs] += w.astype(dtype)
        touched[docs] = True
    if not any_term:
        return []
    cand = np.flatnonzero(touched)
    sub = scores[cand]
    if len(cand) > k:
        # top-k by (score desc, docid asc): partition to the kth score,
        # then exact sort over everything at or above it (tie-safe)
        kth = np.partition(-sub, k - 1)[k - 1]
        sel = np.flatnonzero(-sub <= kth)
        order = np.lexsort((cand[sel], -sub[sel].astype(np.float64)))
        pick = sel[order][:k]
        return [(int(cand[i]), float(sub[i])) for i in pick]
    order = np.lexsort((cand, -sub.astype(np.float64)))
    return [(int(cand[i]), float(sub[i])) for i in order]


def ranked_and(index, wdata: WandData, terms: list[int], k: int = 10, dtype=np.float32):
    topk = TopK(k)
    enums = _scored_enums(index, wdata, terms, dtype=dtype)
    if not enums:
        return []
    enums_sz = sorted(enums, key=lambda se: se.enum.size)
    num_docs = index.num_docs
    candidate = enums_sz[0].enum.docid()
    i = 1
    while candidate < num_docs:
        while i < len(enums_sz):
            enums_sz[i].enum.next_geq(candidate)
            if enums_sz[i].enum.docid() != candidate:
                candidate = enums_sz[i].enum.docid()
                i = 0
                break
            i += 1
        else:
            norm_len = wdata.norms(dtype)[candidate]
            contribs = [
                (se.term, dtype(se.q_weight * doc_term_weight(se.enum.freq(), norm_len, dtype)))
                for se in enums_sz
            ]
            topk.insert(float(_sum_term_order(contribs, dtype)), candidate)
            enums_sz[0].enum.next()
            candidate = enums_sz[0].enum.docid()
            i = 1
    return topk.finalize()


def wand(index, wdata: WandData, terms: list[int], k: int = 10, dtype=np.float32):
    topk = TopK(k)
    enums = _scored_enums(index, wdata, terms, with_bounds=True, dtype=dtype)
    if not enums:
        return []
    num_docs = index.num_docs
    ordered = sorted(enums, key=lambda se: se.enum.docid())
    while True:
        upper_bound = dtype(0.0)
        pivot = None
        for idx, se in enumerate(ordered):
            if se.enum.docid() >= num_docs:
                break
            upper_bound = dtype(upper_bound + se.max_weight)
            if topk.would_enter(float(upper_bound)):
                pivot = idx
                break
        if pivot is None:
            break
        pivot_id = ordered[pivot].enum.docid()
        if pivot_id == ordered[0].enum.docid():
            norm_len = wdata.norms(dtype)[pivot_id]
            contribs = []
            for se in ordered:
                if se.enum.docid() != pivot_id:
                    break
                contribs.append((se.term, dtype(
                    se.q_weight * doc_term_weight(se.enum.freq(), norm_len, dtype))))
                se.enum.next()
            topk.insert(float(_sum_term_order(contribs, dtype)), pivot_id)
            ordered.sort(key=lambda se: se.enum.docid())
        else:
            nxt = pivot
            while ordered[nxt].enum.docid() == pivot_id:
                nxt -= 1
            ordered[nxt].enum.next_geq(pivot_id)
            j = nxt + 1
            while j < len(ordered) and ordered[j].enum.docid() < ordered[j - 1].enum.docid():
                ordered[j], ordered[j - 1] = ordered[j - 1], ordered[j]
                j += 1
    return topk.finalize()


def maxscore(index, wdata: WandData, terms: list[int], k: int = 10, dtype=np.float32):
    topk = TopK(k)
    enums = _scored_enums(index, wdata, terms, with_bounds=True, dtype=dtype)
    if not enums:
        return []
    num_docs = index.num_docs
    ordered = sorted(enums, key=lambda se: se.max_weight)
    ub = np.zeros(len(ordered), dtype=dtype)
    ub[0] = ordered[0].max_weight
    for i in range(1, len(ordered)):
        ub[i] = dtype(ub[i - 1] + ordered[i].max_weight)
    non_essential = 0
    cur = min(se.enum.docid() for se in enums)
    norms = wdata.norms(dtype)
    while non_essential < len(ordered) and cur < num_docs:
        norm_len = norms[cur]
        contribs = []
        running = dtype(0.0)
        nxt = num_docs
        for i in range(non_essential, len(ordered)):
            se = ordered[i]
            if se.enum.docid() == cur:
                w = dtype(se.q_weight * doc_term_weight(se.enum.freq(), norm_len, dtype))
                contribs.append((se.term, w))
                running = dtype(running + w)
                se.enum.next()
            if se.enum.docid() < nxt:
                nxt = se.enum.docid()
        for i in range(non_essential - 1, -1, -1):
            if not topk.would_enter(float(dtype(running + ub[i]))):
                break
            se = ordered[i]
            se.enum.next_geq(cur)
            if se.enum.docid() == cur:
                w = dtype(se.q_weight * doc_term_weight(se.enum.freq(), norm_len, dtype))
                contribs.append((se.term, w))
                running = dtype(running + w)
        if topk.insert(float(_sum_term_order(contribs, dtype)), cur):
            while (non_essential < len(ordered)
                   and not topk.would_enter(float(ub[non_essential]))):
                non_essential += 1
        cur = nxt
    return topk.finalize()
