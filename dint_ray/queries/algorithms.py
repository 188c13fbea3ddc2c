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
- OR-family algorithms skip query terms missing from the index (the
  reference assumes all query term-ids exist); AND-family algorithms
  (``and_count``/``and_docs``/``ranked_and``) return empty when ANY
  distinct query term is absent — a document cannot contain a term
  with no posting list, so the conjunction is unsatisfiable.  This
  matches the SQL oracles (nhit = count of ALL distinct query terms).
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


def _all_present(index, terms):
    """Distinct terms if every one has a posting list, else None (the
    conjunction is unsatisfiable when any term is absent)."""
    distinct = remove_duplicate_terms(terms)
    if any(t not in index for t in distinct):
        return None
    return distinct


# --------------------------------------------------------------------------
# boolean
# --------------------------------------------------------------------------

def and_count(index, terms: list[int]) -> int:
    terms = _all_present(index, terms)
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
    terms = _all_present(index, terms)
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

class _ScoredList:
    """Positional cursor over a decoded, pre-scored posting list.

    The per-posting float32 BM25 weight ``w[i] = qw * dtw[i]`` is
    precomputed as one vector op (dtw is cached on the index per term —
    query-independent), so the document-at-a-time loops below do array
    lookups instead of per-posting scoring calls.  Identical arithmetic
    to scoring each posting scalar-wise: IEEE elementwise ops.

    ``dptr``/``wptr`` carry the raw array addresses for the C kernels
    (filled by the per-(term, qf) cache: ``arr.ctypes.data`` costs a
    ctypes object per access, measurable at 10^5 queries/sec)."""

    __slots__ = ("term", "docs", "w", "pos", "n", "universe",
                 "max_weight", "size", "cur", "dptr", "wptr")

    def __init__(self, term, docs, w, universe, max_weight):
        self.dptr = None
        self.wptr = None
        self.term = term
        self.docs = docs        # uint32 ndarray; stays numpy so decoded
        self.w = w              # lists shared via the object store are
        self.n = len(docs)      # zero-copy across scorer actors
        self.pos = 0
        self.universe = universe
        self.max_weight = max_weight
        self.size = self.n
        # cur caches docs[pos] as a Python int: the document-at-a-time
        # loops read it millions of times per query batch
        self.cur = int(docs[0]) if self.n else universe

    def docid(self):
        return self.cur

    def weight(self):
        return self.w[self.pos]

    def next(self):
        p = self.pos + 1
        self.pos = p
        self.cur = int(self.docs[p]) if p < self.n else self.universe

    def next_geq(self, lb):
        if self.cur < lb:
            # docs are globally sorted: one whole-array binary search
            # (the ndarray method, skipping numpy's dispatch wrapper)
            p = int(self.docs.searchsorted(lb, "left"))
            self.pos = p
            self.cur = int(self.docs[p]) if p < self.n else self.universe


def _df_of(index, term, docs):
    """Collection-level document frequency: the local list length on a
    whole-collection index, or the GLOBAL df carried by a
    doc-partitioned slice (partitioned.py) so qw matches everywhere."""
    dfg = getattr(index, "df_global", None)
    return int(dfg[term]) if dfg is not None else len(docs)


def _scored_lists(index, wdata: WandData, terms, with_bounds=False, dtype=np.float32):
    """Per-query cursor construction.

    The heavy parts — the qw*dtw weight vector, the term bound, and the
    raw array addresses for the C kernels — are query-independent given
    (term, qf), so they are cached on the index object: at serving rate
    the same few thousand query terms recur millions of times and the
    rebuild cost dominates the (C-kerneled) scoring itself."""
    lists = []
    norms = wdata.norms(dtype)
    num_docs = index.num_docs
    cache = getattr(index, "_slc", None)
    if cache is None:
        cache = index._slc = {}
    elif len(cache) > 100_000:   # bound per-actor weight-cache memory
        cache.clear()
    for term, qf in query_freqs(terms):
        key = (term, qf, with_bounds, dtype is np.float32)
        hit = cache.get(key)
        if hit is None:
            if term not in index:
                cache[key] = False
                continue
            docs, _ = index.cached_decode(term)
            qw = query_term_weight(qf, _df_of(index, term, docs), num_docs,
                                   dtype)
            dtw = index.doc_term_weights(term, norms, dtype)
            w = (dtype(qw) * dtw).astype(dtype, copy=False)
            if with_bounds:
                if dtype is np.float32:
                    mw = np.float32(qw * wdata.max_term_weight[term])
                else:
                    # recompute the bound in f64 so it stays an upper bound
                    mw = dtype(qw * dtw.max())
            else:
                mw = dtype(0.0)
            dptr = wptr = None
            if (dtype is np.float32 and docs.dtype == np.uint32
                    and docs.flags.c_contiguous and w.flags.c_contiguous):
                dptr = docs.ctypes.data
                wptr = w.ctypes.data
            hit = cache[key] = (docs, w, mw, dptr, wptr)
        elif hit is False:
            continue
        docs, w, mw, dptr, wptr = hit
        L = _ScoredList(term, docs, w, num_docs, mw)
        L.dptr = dptr
        L.wptr = wptr
        lists.append(L)
    return lists


def _sum_term_order(contribs, dtype=np.float32):
    s = dtype(0.0)
    for _, c in sorted(contribs, key=lambda x: x[0]):
        s = dtype(s + c)
    return s


def ranked_or(index, wdata: WandData, terms: list[int], k: int = 10, dtype=np.float32):
    """Exhaustive BM25 union — the oracle for the pruned algorithms."""
    topk = TopK(k)
    lists = _scored_lists(index, wdata, terms, dtype=dtype)
    if not lists:
        return []
    num_docs = index.num_docs
    cur = min(L.cur for L in lists)
    while cur < num_docs:
        score = dtype(0.0)
        nxt = num_docs
        for L in lists:  # ascending term order by construction
            if L.cur == cur:
                score = dtype(score + L.weight())
                L.next()
            d = L.cur
            if d < nxt:
                nxt = d
        topk.insert(float(score), cur)
        cur = nxt
    return topk.finalize()


def ranked_or_fast(index, wdata: WandData, terms: list[int], k: int = 10, dtype=np.float32):
    """Dense vectorized ranked-OR: float32-identical to ranked_or
    (same per-doc accumulation order: ascending term_id)."""
    num_docs = index.num_docs
    scores = np.zeros(num_docs, dtype=dtype)
    touched = np.zeros(num_docs, dtype=bool)
    norms = wdata.norms(dtype)
    any_term = False
    for term, qf in query_freqs(terms):
        if term not in index:
            continue
        any_term = True
        docs, _ = index.cached_decode(term)
        qw = query_term_weight(qf, len(docs), num_docs, dtype)
        w = dtype(qw) * index.doc_term_weights(term, norms, dtype)
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
    if _all_present(index, terms) is None:
        return []
    lists = _scored_lists(index, wdata, terms, dtype=dtype)
    if not lists:
        return []
    lists_sz = sorted(lists, key=lambda L: L.size)
    num_docs = index.num_docs
    candidate = lists_sz[0].cur
    i = 1
    while candidate < num_docs:
        while i < len(lists_sz):
            lists_sz[i].next_geq(candidate)
            if lists_sz[i].cur != candidate:
                candidate = lists_sz[i].cur
                i = 0
                break
            i += 1
        else:
            contribs = [(L.term, L.weight()) for L in lists_sz]
            topk.insert(float(_sum_term_order(contribs, dtype)), candidate)
            lists_sz[0].next()
            candidate = lists_sz[0].cur
            i = 1
    return topk.finalize()


def wand(index, wdata: WandData, terms: list[int], k: int = 10, dtype=np.float32,
         native: bool | None = None):
    topk = TopK(k)
    lists = _scored_lists(index, wdata, terms, with_bounds=True, dtype=dtype)
    if not lists:
        return []
    if native is not False and dtype is np.float32:
        from dint_ray import native as nat

        res = nat.run_topk("wand", lists, k, index.num_docs)
        if res is not None:
            return res
    num_docs = index.num_docs
    ordered = sorted(lists, key=lambda L: L.cur)
    while True:
        upper_bound = dtype(0.0)
        pivot = None
        for idx, L in enumerate(ordered):
            if L.cur >= num_docs:
                break
            upper_bound = dtype(upper_bound + L.max_weight)
            if topk.would_enter(float(upper_bound)):
                pivot = idx
                break
        if pivot is None:
            break
        pivot_id = ordered[pivot].cur
        if pivot_id == ordered[0].cur:
            contribs = []
            for L in ordered:
                if L.cur != pivot_id:
                    break
                contribs.append((L.term, L.weight()))
                L.next()
            topk.insert(float(_sum_term_order(contribs, dtype)), pivot_id)
            ordered.sort(key=lambda L: L.cur)
        else:
            nxt = pivot
            while ordered[nxt].cur == pivot_id:
                nxt -= 1
            ordered[nxt].next_geq(pivot_id)
            j = nxt + 1
            while j < len(ordered) and ordered[j].cur < ordered[j - 1].cur:
                ordered[j], ordered[j - 1] = ordered[j - 1], ordered[j]
                j += 1
    return topk.finalize()


def maxscore(index, wdata: WandData, terms: list[int], k: int = 10,
             dtype=np.float32, native: bool | None = None):
    topk = TopK(k)
    lists = _scored_lists(index, wdata, terms, with_bounds=True, dtype=dtype)
    if not lists:
        return []
    if native is not False and dtype is np.float32:
        from dint_ray import native as nat

        res = nat.run_topk("maxscore", lists, k, index.num_docs)
        if res is not None:
            return res
    num_docs = index.num_docs
    ordered = sorted(lists, key=lambda L: L.max_weight)
    ub = np.zeros(len(ordered), dtype=dtype)
    ub[0] = ordered[0].max_weight
    for i in range(1, len(ordered)):
        ub[i] = dtype(ub[i - 1] + ordered[i].max_weight)
    non_essential = 0
    cur = min(L.cur for L in lists)
    while non_essential < len(ordered) and cur < num_docs:
        contribs = []
        running = dtype(0.0)
        nxt = num_docs
        for i in range(non_essential, len(ordered)):
            L = ordered[i]
            if L.cur == cur:
                w = L.weight()
                contribs.append((L.term, w))
                running = dtype(running + w)
                L.next()
            d = L.cur
            if d < nxt:
                nxt = d
        for i in range(non_essential - 1, -1, -1):
            if not topk.would_enter(float(dtype(running + ub[i]))):
                break
            L = ordered[i]
            L.next_geq(cur)
            if L.cur == cur:
                w = L.weight()
                contribs.append((L.term, w))
                running = dtype(running + w)
        if topk.insert(float(_sum_term_order(contribs, dtype)), cur):
            while (non_essential < len(ordered)
                   and not topk.would_enter(float(ub[non_essential]))):
                non_essential += 1
        cur = nxt
    return topk.finalize()


def block_max_wand(index, wdata: WandData, terms: list[int], k: int = 10,
                   dtype=np.float32, native: bool | None = None):
    """Block-max WAND (Ding & Suel 2011) over per-256-block score
    maxima — the tighter pruning layer the north star names on top of
    the reference's classic term-bound WAND (queries.hpp:190-307).

    Exact: a pivot survives only after BOTH the term-level bound check
    (identical to ``wand``) and the block-level refinement; when the
    block bound fails, the cursor jumps to the first docID where any
    block (or the next list's current doc) changes, so no document
    whose true score could enter the heap is ever skipped.  Scoring and
    tie-breaks are shared with the other algorithms — rank-identical
    to exhaustive ranked-OR."""
    topk = TopK(k)
    lists = _scored_lists(index, wdata, terms, with_bounds=True, dtype=dtype)
    if not lists:
        return []
    norms = wdata.norms(dtype)
    num_docs = index.num_docs
    qf_of = dict(query_freqs(terms))
    # per-list query-scaled block maxima: qw * max(dtw) per block, with
    # qw computed exactly as in _scored_lists
    blocks = {}
    for L in lists:
        last, bmax = index.block_bounds(L.term, norms, dtype)
        qw = query_term_weight(qf_of[L.term], _df_of(index, L.term, L.docs),
                               num_docs, dtype)
        blocks[L.term] = (last, (dtype(qw) * bmax).astype(dtype, copy=False))

    if native is not False and dtype is np.float32:
        from dint_ray import native as nat

        res = nat.run_topk("block_max_wand", lists, k, num_docs,
                           blocks=[blocks[L.term] for L in lists])
        if res is not None:
            return res

    ordered = sorted(lists, key=lambda L: L.cur)
    while True:
        upper_bound = dtype(0.0)
        pivot = None
        for idx_, L in enumerate(ordered):
            if L.cur >= num_docs:
                break
            upper_bound = dtype(upper_bound + L.max_weight)
            if topk.would_enter(float(upper_bound)):
                pivot = idx_
                break
        if pivot is None:
            break
        pivot_id = ordered[pivot].cur

        # the pivot group: every list whose current doc IS pivot_id
        # contributes to it and must join the block refinement
        end = pivot
        while end + 1 < len(ordered) and ordered[end + 1].cur == pivot_id:
            end += 1

        block_ub = dtype(0.0)
        jump = num_docs
        for L in ordered[: end + 1]:
            last, bw = blocks[L.term]
            b = int(np.searchsorted(last, pivot_id, side="left"))
            if b < len(bw):
                block_ub = dtype(block_ub + bw[b])
                nb = int(last[b]) + 1
                if nb < jump:
                    jump = nb
        if end + 1 < len(ordered) and ordered[end + 1].cur < jump:
            jump = ordered[end + 1].cur

        if not topk.would_enter(float(block_ub)):
            # no doc in [pivot_id, jump) can enter: advance every list
            # sitting below the jump target
            target = max(jump, pivot_id + 1)
            for L in ordered:
                if L.cur < target:
                    L.next_geq(target)
            ordered.sort(key=lambda L: L.cur)
            continue

        if pivot_id == ordered[0].cur:
            contribs = []
            for L in ordered:
                if L.cur != pivot_id:
                    break
                contribs.append((L.term, L.weight()))
                L.next()
            topk.insert(float(_sum_term_order(contribs, dtype)), pivot_id)
            ordered.sort(key=lambda L: L.cur)
        else:
            nxt = pivot
            while ordered[nxt].cur == pivot_id:
                nxt -= 1
            ordered[nxt].next_geq(pivot_id)
            j = nxt + 1
            while j < len(ordered) and ordered[j].cur < ordered[j - 1].cur:
                ordered[j], ordered[j - 1] = ordered[j - 1], ordered[j]
                j += 1
    return topk.finalize()
