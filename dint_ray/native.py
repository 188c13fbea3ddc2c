"""Optional C kernels for the document-at-a-time query loops.

The pure-Python algorithms in queries/algorithms.py are the semantic
reference (and the conformance/float64 path); these kernels replicate
them operation-for-operation in C for the float32 production path:

- same float32 accumulation order (per-doc contributions summed in
  ascending term_id order; upper bounds accumulated in cursor order);
- same top-k semantics (min-heap keyed (score asc, docid desc), strict
  ``score > min`` entry, final order (score desc, docid asc));
- same cursor moves (whole-array lower_bound for next_geq, stable
  re-sorts of the cursor array).

Built lazily with the system C compiler into a per-source-hash cache
dir under /tmp; loaded via cffi's ABI mode (no Python headers needed).
Everything degrades to the Python path when a compiler is unavailable
— tests assert C == Python exactly on random corpora.

Reference behavior mirrored: wand_query/maxscore_query
(/root/reference/include/ds2i/queries.hpp:190-307,459-573) and the
topk_queue (:150-188).
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import tempfile

import numpy as np

MAX_LISTS = 64

_SRC = r"""
#include <stdint.h>
#include <stddef.h>
#include <string.h>

typedef struct {
    const uint32_t *docs;
    const float    *w;
    int64_t         n;
    int64_t         pos;
    uint32_t        cur;
    float           max_weight;
    int32_t         term_idx;     /* ascending-term original index */
    const uint32_t *blast;        /* per-block last docid (may be NULL) */
    const float    *bw;           /* per-block score bound (query-scaled) */
    int64_t         nblocks;
} List;

typedef struct { float score; uint32_t doc; } Entry;

typedef struct { Entry h[4096]; int size; int k; } Heap;

/* min-heap: top = smallest score, ties -> LARGEST docid on top so the
   smallest-docid tie survives eviction (topk.py keeps (score, -docid)) */
static int entry_lt(Entry a, Entry b) {
    if (a.score != b.score) return a.score < b.score;
    return a.doc > b.doc;
}

static void heap_init(Heap *hp, int k) { hp->size = 0; hp->k = k; }

static int heap_would_enter(const Heap *hp, float score) {
    return hp->size < hp->k || score > hp->h[0].score;
}

static void heap_sift_down(Heap *hp, int i) {
    for (;;) {
        int l = 2 * i + 1, r = l + 1, m = i;
        if (l < hp->size && entry_lt(hp->h[l], hp->h[m])) m = l;
        if (r < hp->size && entry_lt(hp->h[r], hp->h[m])) m = r;
        if (m == i) break;
        Entry t = hp->h[i]; hp->h[i] = hp->h[m]; hp->h[m] = t;
        i = m;
    }
}

static int heap_insert(Heap *hp, float score, uint32_t doc) {
    if (hp->size < hp->k) {
        int i = hp->size++;
        hp->h[i].score = score; hp->h[i].doc = doc;
        while (i > 0) {
            int p = (i - 1) / 2;
            if (entry_lt(hp->h[i], hp->h[p])) {
                Entry t = hp->h[i]; hp->h[i] = hp->h[p]; hp->h[p] = t;
                i = p;
            } else break;
        }
        return 1;
    }
    if (score > hp->h[0].score) {
        hp->h[0].score = score; hp->h[0].doc = doc;
        heap_sift_down(hp, 0);
        return 1;
    }
    return 0;
}

/* (score desc, docid asc) */
static int64_t heap_finalize(Heap *hp, int64_t *out_docs, float *out_scores) {
    for (int i = 1; i < hp->size; i++) {
        Entry e = hp->h[i];
        int j = i - 1;
        while (j >= 0 && (hp->h[j].score < e.score ||
               (hp->h[j].score == e.score && hp->h[j].doc > e.doc))) {
            hp->h[j + 1] = hp->h[j];
            j--;
        }
        hp->h[j + 1] = e;
    }
    for (int i = 0; i < hp->size; i++) {
        out_docs[i] = (int64_t)hp->h[i].doc;
        out_scores[i] = hp->h[i].score;
    }
    return hp->size;
}

/* whole-array lower_bound, as numpy searchsorted(lb, 'left') */
static void next_geq(List *L, uint32_t lb, uint32_t universe) {
    if (L->cur >= lb) return;
    int64_t lo = 0, hi = L->n;
    const uint32_t *d = L->docs;
    while (lo < hi) {
        int64_t mid = (lo + hi) / 2;
        if (d[mid] < lb) lo = mid + 1; else hi = mid;
    }
    L->pos = lo;
    L->cur = lo < L->n ? d[lo] : universe;
}

static void advance(List *L, uint32_t universe) {
    L->pos += 1;
    L->cur = L->pos < L->n ? L->docs[L->pos] : universe;
}

/* stable insertion sort of the cursor array by (cur) */
static void sort_by_cur(List **a, int n) {
    for (int i = 1; i < n; i++) {
        List *e = a[i];
        int j = i - 1;
        while (j >= 0 && a[j]->cur > e->cur) { a[j + 1] = a[j]; j--; }
        a[j + 1] = e;
    }
}

/* sum contributions in ascending term_idx order, float32 accumulate */
static float sum_term_order(int32_t *terms, float *ws, int n) {
    for (int i = 1; i < n; i++) {
        int32_t t = terms[i]; float w = ws[i];
        int j = i - 1;
        while (j >= 0 && terms[j] > t) {
            terms[j + 1] = terms[j]; ws[j + 1] = ws[j]; j--;
        }
        terms[j + 1] = t; ws[j + 1] = w;
    }
    float s = 0.0f;
    for (int i = 0; i < n; i++) s = s + ws[i];
    return s;
}

static void init_lists(List *ls, int n, const uint64_t *docs_ptrs,
                       const uint64_t *w_ptrs, const int64_t *lens,
                       const float *max_weights, uint32_t universe,
                       const uint64_t *blast_ptrs, const uint64_t *bw_ptrs,
                       const int64_t *nblocks) {
    for (int i = 0; i < n; i++) {
        ls[i].docs = (const uint32_t *)(uintptr_t)docs_ptrs[i];
        ls[i].w = (const float *)(uintptr_t)w_ptrs[i];
        ls[i].n = lens[i];
        ls[i].pos = 0;
        ls[i].cur = lens[i] > 0 ? ls[i].docs[0] : universe;
        ls[i].max_weight = max_weights[i];
        ls[i].term_idx = i;
        if (blast_ptrs) {
            ls[i].blast = (const uint32_t *)(uintptr_t)blast_ptrs[i];
            ls[i].bw = (const float *)(uintptr_t)bw_ptrs[i];
            ls[i].nblocks = nblocks[i];
        } else {
            ls[i].blast = 0; ls[i].bw = 0; ls[i].nblocks = 0;
        }
    }
}

int64_t wand_query(int n_lists, const uint64_t *docs_ptrs,
                   const uint64_t *w_ptrs, const int64_t *lens,
                   const float *max_weights, uint32_t universe, int k,
                   int64_t *out_docs, float *out_scores) {
    List ls[64];
    List *ordered[64];
    init_lists(ls, n_lists, docs_ptrs, w_ptrs, lens, max_weights, universe,
               0, 0, 0);
    for (int i = 0; i < n_lists; i++) ordered[i] = &ls[i];
    sort_by_cur(ordered, n_lists);
    Heap hp; heap_init(&hp, k);
    int32_t cterms[64]; float cws[64];
    for (;;) {
        float ub = 0.0f;
        int pivot = -1;
        for (int idx = 0; idx < n_lists; idx++) {
            if (ordered[idx]->cur >= universe) break;
            ub = ub + ordered[idx]->max_weight;
            if (heap_would_enter(&hp, ub)) { pivot = idx; break; }
        }
        if (pivot < 0) break;
        uint32_t pivot_id = ordered[pivot]->cur;
        if (pivot_id == ordered[0]->cur) {
            int nc = 0;
            for (int i = 0; i < n_lists; i++) {
                if (ordered[i]->cur != pivot_id) break;
                cterms[nc] = ordered[i]->term_idx;
                cws[nc] = ordered[i]->w[ordered[i]->pos];
                nc++;
                advance(ordered[i], universe);
            }
            heap_insert(&hp, sum_term_order(cterms, cws, nc), pivot_id);
            sort_by_cur(ordered, n_lists);
        } else {
            int nxt = pivot;
            while (ordered[nxt]->cur == pivot_id) nxt--;
            next_geq(ordered[nxt], pivot_id, universe);
            int j = nxt + 1;
            while (j < n_lists && ordered[j]->cur < ordered[j - 1]->cur) {
                List *t = ordered[j]; ordered[j] = ordered[j - 1];
                ordered[j - 1] = t;
                j++;
            }
        }
    }
    return heap_finalize(&hp, out_docs, out_scores);
}

int64_t block_max_wand_query(int n_lists, const uint64_t *docs_ptrs,
                             const uint64_t *w_ptrs, const int64_t *lens,
                             const float *max_weights,
                             const uint64_t *blast_ptrs,
                             const uint64_t *bw_ptrs, const int64_t *nblocks,
                             uint32_t universe, int k,
                             int64_t *out_docs, float *out_scores) {
    List ls[64];
    List *ordered[64];
    init_lists(ls, n_lists, docs_ptrs, w_ptrs, lens, max_weights, universe,
               blast_ptrs, bw_ptrs, nblocks);
    for (int i = 0; i < n_lists; i++) ordered[i] = &ls[i];
    sort_by_cur(ordered, n_lists);
    Heap hp; heap_init(&hp, k);
    int32_t cterms[64]; float cws[64];
    for (;;) {
        float ub = 0.0f;
        int pivot = -1;
        for (int idx = 0; idx < n_lists; idx++) {
            if (ordered[idx]->cur >= universe) break;
            ub = ub + ordered[idx]->max_weight;
            if (heap_would_enter(&hp, ub)) { pivot = idx; break; }
        }
        if (pivot < 0) break;
        uint32_t pivot_id = ordered[pivot]->cur;

        int end = pivot;
        while (end + 1 < n_lists && ordered[end + 1]->cur == pivot_id) end++;

        float block_ub = 0.0f;
        uint32_t jump = universe;
        for (int i = 0; i <= end; i++) {
            List *L = ordered[i];
            /* lower_bound over blast for pivot_id */
            int64_t lo = 0, hi = L->nblocks;
            while (lo < hi) {
                int64_t mid = (lo + hi) / 2;
                if (L->blast[mid] < pivot_id) lo = mid + 1; else hi = mid;
            }
            if (lo < L->nblocks) {
                block_ub = block_ub + L->bw[lo];
                uint32_t nb = L->blast[lo] + 1;
                if (nb < jump) jump = nb;
            }
        }
        if (end + 1 < n_lists && ordered[end + 1]->cur < jump)
            jump = ordered[end + 1]->cur;

        if (!heap_would_enter(&hp, block_ub)) {
            uint32_t target = jump > pivot_id + 1 ? jump : pivot_id + 1;
            for (int i = 0; i < n_lists; i++)
                if (ordered[i]->cur < target)
                    next_geq(ordered[i], target, universe);
            sort_by_cur(ordered, n_lists);
            continue;
        }

        if (pivot_id == ordered[0]->cur) {
            int nc = 0;
            for (int i = 0; i < n_lists; i++) {
                if (ordered[i]->cur != pivot_id) break;
                cterms[nc] = ordered[i]->term_idx;
                cws[nc] = ordered[i]->w[ordered[i]->pos];
                nc++;
                advance(ordered[i], universe);
            }
            heap_insert(&hp, sum_term_order(cterms, cws, nc), pivot_id);
            sort_by_cur(ordered, n_lists);
        } else {
            int nxt = pivot;
            while (ordered[nxt]->cur == pivot_id) nxt--;
            next_geq(ordered[nxt], pivot_id, universe);
            int j = nxt + 1;
            while (j < n_lists && ordered[j]->cur < ordered[j - 1]->cur) {
                List *t = ordered[j]; ordered[j] = ordered[j - 1];
                ordered[j - 1] = t;
                j++;
            }
        }
    }
    return heap_finalize(&hp, out_docs, out_scores);
}

int64_t maxscore_query(int n_lists, const uint64_t *docs_ptrs,
                       const uint64_t *w_ptrs, const int64_t *lens,
                       const float *max_weights, uint32_t universe, int k,
                       int64_t *out_docs, float *out_scores) {
    List ls[64];
    List *ordered[64];
    init_lists(ls, n_lists, docs_ptrs, w_ptrs, lens, max_weights, universe,
               0, 0, 0);
    for (int i = 0; i < n_lists; i++) ordered[i] = &ls[i];
    /* stable sort by max_weight ascending (python sorted is stable) */
    for (int i = 1; i < n_lists; i++) {
        List *e = ordered[i];
        int j = i - 1;
        while (j >= 0 && ordered[j]->max_weight > e->max_weight) {
            ordered[j + 1] = ordered[j]; j--;
        }
        ordered[j + 1] = e;
    }
    float ub[64];
    ub[0] = ordered[0]->max_weight;
    for (int i = 1; i < n_lists; i++)
        ub[i] = ub[i - 1] + ordered[i]->max_weight;
    Heap hp; heap_init(&hp, k);
    int32_t cterms[64]; float cws[64];
    int non_essential = 0;
    uint32_t cur = universe;
    for (int i = 0; i < n_lists; i++)
        if (ordered[i]->cur < cur) cur = ordered[i]->cur;
    while (non_essential < n_lists && cur < universe) {
        int nc = 0;
        float running = 0.0f;
        uint32_t nxt = universe;
        for (int i = non_essential; i < n_lists; i++) {
            List *L = ordered[i];
            if (L->cur == cur) {
                float w = L->w[L->pos];
                cterms[nc] = L->term_idx; cws[nc] = w; nc++;
                running = running + w;
                advance(L, universe);
            }
            if (L->cur < nxt) nxt = L->cur;
        }
        for (int i = non_essential - 1; i >= 0; i--) {
            if (!heap_would_enter(&hp, running + ub[i])) break;
            List *L = ordered[i];
            next_geq(L, cur, universe);
            if (L->cur == cur) {
                float w = L->w[L->pos];
                cterms[nc] = L->term_idx; cws[nc] = w; nc++;
                running = running + w;
            }
        }
        if (heap_insert(&hp, sum_term_order(cterms, cws, nc), cur)) {
            while (non_essential < n_lists &&
                   !heap_would_enter(&hp, ub[non_essential]))
                non_essential++;
        }
        cur = nxt;
    }
    return heap_finalize(&hp, out_docs, out_scores);
}

/* ======================================================================
   Compressed-posting cursors: WAND directly over the DINT posting-list
   layout (index/layout.py write_posting_list), no decoded flat arrays.

   Per 256-int block: DINT single-dict b=16 codeword stream
   (dint/codec.py _decode_codeword_stream semantics); partial tail
   blocks (and whole lists < 256) are binary-interpolative
   (codecs/interpolative.py).  Docs store d-gaps doc-prev-1; freqs
   store freq-1 with a self-described varbyte sum.  BM25 weights are
   computed on the fly in the exact float32 op order of
   scoring.doc_term_weight, so results are bit-identical to the
   decoded path (compile with -ffp-contract=off).

   Mirrors the reference's query-time behavior: the C++ engine always
   decodes per block at query time (dict_posting_list.hpp:88-343);
   the decoded-flat mode is the extra single-node fast path.
   ====================================================================== */

static inline uint16_t ld16u(const uint8_t *p) {
    return (uint16_t)(p[0] | ((uint16_t)p[1] << 8));
}
static inline uint32_t ld32u(const uint8_t *p) {
    return (uint32_t)p[0] | ((uint32_t)p[1] << 8) |
           ((uint32_t)p[2] << 16) | ((uint32_t)p[3] << 24);
}

/* TightVariableByte single value: 7-bit groups LSB-first, stop bit SET
   on the last byte (codecs/varbyte.py) */
static uint64_t vb_read(const uint8_t *p, int64_t *off) {
    uint64_t v = 0; int shift = 0;
    for (;;) {
        uint8_t b = p[*off]; (*off)++;
        v |= (uint64_t)(b & 0x7F) << shift;
        if (b & 0x80) break;
        shift += 7;
    }
    return v;
}

typedef struct { const uint8_t *p; int64_t pos; } BitRd;

static uint32_t br_read(BitRd *r, int nbits) {
    if (!nbits) return 0;
    int64_t byte = r->pos >> 3;
    int shift = (int)(r->pos & 7);
    uint64_t acc = 0;
    int need = (shift + nbits + 7) >> 3;
    for (int i = 0; i < need; i++)
        acc |= (uint64_t)r->p[byte + i] << (8 * i);
    r->pos += nbits;
    return (uint32_t)((acc >> shift) &
                      ((nbits >= 32) ? 0xFFFFFFFFULL : ((1ULL << nbits) - 1)));
}

/* centered minimal binary code, u >= 1 (interpolative.py read_int) */
static uint32_t br_read_int(BitRd *r, uint64_t u) {
    int b = 63 - __builtin_clzll(u);
    uint64_t m = (1ULL << (b + 1)) - u;
    uint64_t val = br_read(r, b);
    if (val >= m) val = (val << 1) + br_read(r, 1) - m;
    return (uint32_t)val;
}

static void br_read_interp(BitRd *r, uint32_t *out, int lo, int n,
                           uint32_t low, uint32_t high) {
    int h = n / 2;
    uint32_t val = low + br_read_int(r, (uint64_t)(high - low) + 1);
    out[lo + h] = val;
    if (n == 1) return;
    if (h) br_read_interp(r, out, lo, h, low, val);
    if (n - h - 1) br_read_interp(r, out, lo + h + 1, n - h - 1, val, high);
}

/* decode n interpolative-coded gaps; returns bytes consumed */
static int64_t interp_decode(const uint8_t *p, uint32_t sum_known,
                             int have_sum, int n, uint32_t *out) {
    int64_t off = 0;
    uint32_t sum = sum_known;
    if (!have_sum) sum = (uint32_t)vb_read(p, &off);
    out[n - 1] = sum;
    if (n > 1) {
        BitRd r = { p + off, 0 };
        br_read_interp(&r, out, 0, n - 1, 0, sum);
        off += (r.pos + 7) >> 3;
        for (int i = n - 1; i >= 1; i--) out[i] -= out[i - 1];
    }
    return off;
}

/* ---- interpolative ENCODE (interpolative.py encode; byte-identical
   bit layout: little-endian bit order, centered minimal binary) ---- */

typedef struct { uint8_t *p; int64_t pos; } BitWr;

static void bw_write(BitWr *w, uint64_t bits, int nbits) {
    /* bits may exceed 32 significant bits: the recursion's midpoint
       values are bounded by the block SUM, which the unknown-sum
       (varbyte-header) path does not cap at 2^32 */
    if (!nbits) return;
    int64_t byte = w->pos >> 3;
    int shift = (int)(w->pos & 7);
    unsigned __int128 acc = (unsigned __int128)bits << shift;
    int need = (shift + nbits + 7) >> 3;
    for (int i = 0; i < need; i++) w->p[byte + i] |= (uint8_t)(acc >> (8 * i));
    w->pos += nbits;
}

static void bw_write_int(BitWr *w, uint64_t val, uint64_t u) {
    int b = 63 - __builtin_clzll(u);
    uint64_t m = (1ULL << (b + 1)) - u;
    if (val < m) bw_write(w, val, b);
    else {
        val += m;
        bw_write(w, val >> 1, b);
        bw_write(w, val & 1, 1);
    }
}

static void bw_write_interp(BitWr *w, const uint64_t *arr, int lo, int n,
                            uint64_t low, uint64_t high) {
    if (!n) return;
    int h = n / 2;
    uint64_t val = arr[lo + h];
    bw_write_int(w, val - low, high - low + 1);
    bw_write_interp(w, arr, lo, h, low, val);
    bw_write_interp(w, arr, lo + h + 1, n - h - 1, val, high);
}

/* TightVariableByte encode_single (varbyte.py) */
static int64_t vb_write(uint8_t *out, uint64_t v) {
    int64_t i = 0;
    while (v >= 128) { out[i++] = (uint8_t)(v & 127); v >>= 7; }
    out[i++] = (uint8_t)(v | 128);
    return i;
}

/* encode n gaps; out must be ZEROED and >= 10 + 5*n bytes.  have_sum:
   sum_of_values known to both sides (no varbyte header).  -1 on n too
   large; -2 when a self-described sum overflows the u32 wire header
   (the reference wrapper, block_codecs.hpp:117, silently WRAPS here
   and decodes garbage — callers raise instead).  Byte-identical to
   interpolative.py encode (tests assert). */
int64_t interp_encode(const uint32_t *gaps, int n, uint64_t sum_known,
                      int have_sum, uint8_t *out) {
    uint64_t prefix[4096];
    uint64_t s = 0;
    if (n > 4096 || n < 1) return -1;
    for (int i = 0; i < n; i++) { s += gaps[i]; prefix[i] = s; }
    if (!have_sum && s >= 0xFFFFFFFFULL) return -2;
    int64_t off = 0;
    uint64_t sum = have_sum ? sum_known : s;
    if (!have_sum) off = vb_write(out, sum);
    BitWr w = { out + off, 0 };
    bw_write_interp(&w, prefix, 0, n - 1, 0, sum);
    return off + ((w.pos + 7) >> 3);
}

typedef struct {
    const int32_t  *lengths;   /* ints produced per codeword */
    const int32_t  *offs;      /* masked table offsets */
    const uint32_t *table;     /* padded flat entry table */
} CDict;

/* DINT codeword stream decode (codec.py _decode_codeword_stream):
   cw 0 -> u16 literal, 1 -> u32 literal, 2..6 -> zero run (lengths
   256..16), >= 7 -> copy dictionary entry.  wide selects the codeword
   width (b=16 vs b=8); exception literals are byte-LE either way.
   Returns BYTES consumed. */
static int64_t dint_decode(const uint8_t *p, int n, const CDict *d,
                           int wide, uint32_t *out) {
    /* Fixed-width pattern copy (the reference's core decode trick,
       single_dictionary.hpp: copy a full 16-int pattern, advance by its
       size): entry copies are an unconditional 64-byte memcpy — callers
       provide >=16 ints of slack past out[n], and dict_c_arrays pads
       every table with 16 trailing ints so the overcopy never reads
       past the allocation.  Positions beyond an entry's true length get
       garbage that the NEXT codeword's own write overwrites (every
       branch writes its full range), so no upfront zeroing is needed. */
    int produced = 0; int64_t pos = 0;
    while (produced < n) {
        uint32_t cw = wide ? (uint32_t)ld16u(p + pos) : (uint32_t)p[pos];
        pos += wide ? 2 : 1;
        if (cw >= 7) {
            memcpy(out + produced, d->table + d->offs[cw],
                   16 * sizeof(uint32_t));
            produced += d->lengths[cw];
        } else if (cw >= 2) {
            int len = d->lengths[cw];    /* zero run: 256/128/64/32/16 */
            memset(out + produced, 0, (size_t)len * sizeof(uint32_t));
            produced += len;
        } else if (cw == 0) {
            out[produced++] = ld16u(p + pos);
            pos += 2;
        } else {
            out[produced++] = ld32u(p + pos);
            pos += 4;
        }
    }
    return pos;
}

/* one stream codec: single dict (no control byte) or multi-dict
   (leading selector byte: sc < ndicts -> b=16 stream over dicts[sc],
   else b=8 over dicts[sc - ndicts] — dint/codec.py decode_multi) */
typedef struct { CDict dicts[8]; int ndicts; int multi; } CCodec;

static void codec_init(CCodec *c, int multi, int nd, const uint64_t *lens,
                       const uint64_t *offs, const uint64_t *tabs) {
    c->multi = multi;
    c->ndicts = nd > 8 ? 8 : nd;   /* never beyond the initialized slots */
    for (int i = 0; i < nd && i < 8; i++) {
        c->dicts[i].lengths = (const int32_t *)(uintptr_t)lens[i];
        c->dicts[i].offs = (const int32_t *)(uintptr_t)offs[i];
        c->dicts[i].table = (const uint32_t *)(uintptr_t)tabs[i];
    }
}

static int64_t codec_decode(const uint8_t *p, int n, const CCodec *c,
                            uint32_t *out) {
    if (!c->multi)
        return dint_decode(p, n, &c->dicts[0], 1, out);
    uint8_t sc = p[0];
    int64_t used;
    if (sc < c->ndicts)
        used = dint_decode(p + 1, n, &c->dicts[sc], 1, out);
    else
        used = dint_decode(p + 1, n, &c->dicts[sc - c->ndicts], 0, out);
    return used + 1;
}

typedef struct {
    const uint8_t *maxs_p;     /* u32 LE per block (unaligned) */
    const uint8_t *endp_p;     /* u32 LE per block except last */
    const uint8_t *body;       /* payload blocks */
    int64_t n, nblocks;
    /* decoded-block cache */
    int64_t blk;
    int     blk_size;
    const uint8_t *fstart;     /* freq part of current block */
    uint32_t docs[256];
    float    w[256];
    int      w_ready;
    /* cursor */
    int64_t pos;
    int     ipos;
    uint32_t cur;
    float max_weight;
    float qw;
    int32_t term_idx;
} CList;

static void cl_load_block(CList *L, int64_t b, const CCodec *dd) {
    int size = (b == L->nblocks - 1) ? (int)(L->n - b * 256) : 256;
    if (size == 0) size = 256;             /* n a multiple of 256 */
    int64_t start = b == 0 ? 0 : (int64_t)ld32u(L->endp_p + 4 * (b - 1));
    const uint8_t *p = L->body + start;
    uint32_t bmax = ld32u(L->maxs_p + 4 * b);
    int64_t prev = b == 0 ? -1 : (int64_t)ld32u(L->maxs_p + 4 * (b - 1));
    uint32_t gaps[272];            /* 16-int slack for the overcopy */
    int64_t used;
    if (size == 256) {
        used = codec_decode(p, 256, dd, gaps);
    } else {
        uint32_t sum = (uint32_t)((int64_t)bmax - (prev + 1) - (size - 1));
        used = interp_decode(p, sum, 1, size, gaps);
    }
    int64_t run = prev;
    for (int i = 0; i < size; i++) {
        run += 1 + (int64_t)gaps[i];
        L->docs[i] = (uint32_t)run;
    }
    L->fstart = p + used;
    L->blk = b; L->blk_size = size; L->w_ready = 0;
}

static void cl_load_weights(CList *L, const CCodec *fd, const float *norms) {
    uint32_t fr[272];              /* 16-int slack for the overcopy */
    if (L->blk_size == 256) (void)codec_decode(L->fstart, 256, fd, fr);
    else (void)interp_decode(L->fstart, 0, 0, L->blk_size, fr);
    for (int i = 0; i < L->blk_size; i++) {
        float f = (float)(fr[i] + 1);
        float nl = norms[L->docs[i]];
        float dtw = f / (f + 1.2f * (0.5f + 0.5f * nl));
        L->w[i] = L->qw * dtw;
    }
    L->w_ready = 1;
}

static void cl_open(CList *L, const uint8_t *payload, float qw,
                    float max_weight, int32_t term_idx, const CCodec *dd,
                    uint32_t universe) {
    int64_t off = 0;
    L->n = (int64_t)vb_read(payload, &off);
    L->nblocks = (L->n + 255) >> 8;
    L->maxs_p = payload + off;
    L->endp_p = L->maxs_p + 4 * L->nblocks;
    L->body = L->endp_p + 4 * (L->nblocks - 1);
    L->blk = -1; L->w_ready = 0;
    L->qw = qw; L->max_weight = max_weight; L->term_idx = term_idx;
    if (L->n > 0) {
        cl_load_block(L, 0, dd);
        L->pos = 0; L->ipos = 0; L->cur = L->docs[0];
    } else {
        L->pos = 0; L->ipos = 0; L->cur = universe;
    }
}

static void cl_advance(CList *L, const CCodec *dd, uint32_t universe) {
    int64_t pos = L->pos + 1;
    if (pos >= L->n) { L->pos = L->n; L->cur = universe; return; }
    int64_t b = pos >> 8;
    if (b != L->blk) cl_load_block(L, b, dd);
    L->pos = pos; L->ipos = (int)(pos & 255);
    L->cur = L->docs[L->ipos];
}

static void cl_next_geq(CList *L, uint32_t lb, const CCodec *dd,
                        uint32_t universe) {
    if (L->cur >= lb) return;
    int64_t b = L->pos >> 8;
    int from = L->ipos;
    if (ld32u(L->maxs_p + 4 * b) < lb) {
        int64_t lo = b + 1, hi = L->nblocks;
        while (lo < hi) {
            int64_t mid = (lo + hi) / 2;
            if (ld32u(L->maxs_p + 4 * mid) < lb) lo = mid + 1; else hi = mid;
        }
        if (lo >= L->nblocks) { L->pos = L->n; L->cur = universe; return; }
        cl_load_block(L, lo, dd);
        b = lo; from = 0;
    } else if (b != L->blk) {
        cl_load_block(L, b, dd);
    }
    int lo2 = from, hi2 = L->blk_size;
    while (lo2 < hi2) {
        int mid = (lo2 + hi2) / 2;
        if (L->docs[mid] < lb) lo2 = mid + 1; else hi2 = mid;
    }
    L->ipos = lo2; L->pos = b * 256 + lo2; L->cur = L->docs[lo2];
}

static float cl_weight(CList *L, const CCodec *fd, const float *norms) {
    if (!L->w_ready) cl_load_weights(L, fd, norms);
    return L->w[L->ipos];
}

static void cl_sort_by_cur(CList **a, int n) {
    for (int i = 1; i < n; i++) {
        CList *e = a[i];
        int j = i - 1;
        while (j >= 0 && a[j]->cur > e->cur) { a[j + 1] = a[j]; j--; }
        a[j + 1] = e;
    }
}

/* full-list decode for conformance tests / replay.  d_multi/f_multi
   select single (no control byte) vs multi-dict (selector byte)
   layouts; *_lens/offs/tabs are arrays of ndicts pointer values. */
int64_t decode_list_compressed(
        const uint8_t *payload,
        int d_multi, int d_nd, const uint64_t *d_lens,
        const uint64_t *d_offs, const uint64_t *d_tabs,
        int f_multi, int f_nd, const uint64_t *f_lens,
        const uint64_t *f_offs, const uint64_t *f_tabs,
        uint32_t *out_docs, uint32_t *out_freqs) {
    CCodec dd, fd;
    codec_init(&dd, d_multi, d_nd, d_lens, d_offs, d_tabs);
    codec_init(&fd, f_multi, f_nd, f_lens, f_offs, f_tabs);
    int64_t off = 0;
    int64_t n = (int64_t)vb_read(payload, &off);
    int64_t nblocks = (n + 255) >> 8;
    const uint8_t *maxs_p = payload + off;
    const uint8_t *endp_p = maxs_p + 4 * nblocks;
    const uint8_t *body = endp_p + 4 * (nblocks - 1);
    int64_t prev = -1;
    for (int64_t b = 0; b < nblocks; b++) {
        int size = (b == nblocks - 1) ? (int)(n - b * 256) : 256;
        if (size == 0) size = 256;
        int64_t start = b == 0 ? 0 : (int64_t)ld32u(endp_p + 4 * (b - 1));
        const uint8_t *p = body + start;
        uint32_t bmax = ld32u(maxs_p + 4 * b);
        uint32_t gaps[272], fr[272];   /* 16-int slack for the overcopy */
        int64_t used;
        if (size == 256) used = codec_decode(p, 256, &dd, gaps);
        else {
            uint32_t sum = (uint32_t)((int64_t)bmax - (prev + 1) - (size - 1));
            used = interp_decode(p, sum, 1, size, gaps);
        }
        if (size == 256) (void)codec_decode(p + used, 256, &fd, fr);
        else (void)interp_decode(p + used, 0, 0, size, fr);
        int64_t run = prev;
        for (int i = 0; i < size; i++) {
            run += 1 + (int64_t)gaps[i];
            out_docs[b * 256 + i] = (uint32_t)run;
            out_freqs[b * 256 + i] = fr[i] + 1;
        }
        prev = run;
    }
    return n;
}

int64_t wand_compressed_query(
        int n_lists, const uint64_t *payload_ptrs, const float *qws,
        const float *max_weights,
        int d_multi, int d_nd, const uint64_t *d_lens,
        const uint64_t *d_offs, const uint64_t *d_tabs,
        int f_multi, int f_nd, const uint64_t *f_lens,
        const uint64_t *f_offs, const uint64_t *f_tabs,
        const float *norms, uint32_t universe, int k,
        int64_t *out_docs, float *out_scores) {
    CCodec dd, fd;
    codec_init(&dd, d_multi, d_nd, d_lens, d_offs, d_tabs);
    codec_init(&fd, f_multi, f_nd, f_lens, f_offs, f_tabs);
    CList ls[64];
    CList *ordered[64];
    for (int i = 0; i < n_lists; i++) {
        cl_open(&ls[i], (const uint8_t *)(uintptr_t)payload_ptrs[i], qws[i],
                max_weights[i], i, &dd, universe);
        ordered[i] = &ls[i];
    }
    cl_sort_by_cur(ordered, n_lists);
    Heap hp; heap_init(&hp, k);
    int32_t cterms[64]; float cws[64];
    for (;;) {
        float ub = 0.0f;
        int pivot = -1;
        for (int idx = 0; idx < n_lists; idx++) {
            if (ordered[idx]->cur >= universe) break;
            ub = ub + ordered[idx]->max_weight;
            if (heap_would_enter(&hp, ub)) { pivot = idx; break; }
        }
        if (pivot < 0) break;
        uint32_t pivot_id = ordered[pivot]->cur;
        if (pivot_id == ordered[0]->cur) {
            int nc = 0;
            for (int i = 0; i < n_lists; i++) {
                if (ordered[i]->cur != pivot_id) break;
                cterms[nc] = ordered[i]->term_idx;
                cws[nc] = cl_weight(ordered[i], &fd, norms);
                nc++;
                cl_advance(ordered[i], &dd, universe);
            }
            heap_insert(&hp, sum_term_order(cterms, cws, nc), pivot_id);
            cl_sort_by_cur(ordered, n_lists);
        } else {
            int nxt = pivot;
            while (ordered[nxt]->cur == pivot_id) nxt--;
            cl_next_geq(ordered[nxt], pivot_id, &dd, universe);
            int j = nxt + 1;
            while (j < n_lists && ordered[j]->cur < ordered[j - 1]->cur) {
                CList *t = ordered[j]; ordered[j] = ordered[j - 1];
                ordered[j - 1] = t;
                j++;
            }
        }
    }
    return heap_finalize(&hp, out_docs, out_scores);
}

/* maxscore over compressed cursors: operation-for-operation twin of
   maxscore_query (essential/non-essential split, queries.hpp:459-573)
   with lazy per-block decode — same float32 op order, bit-identical to
   the decoded path. */
int64_t maxscore_compressed_query(
        int n_lists, const uint64_t *payload_ptrs, const float *qws,
        const float *max_weights,
        int d_multi, int d_nd, const uint64_t *d_lens,
        const uint64_t *d_offs, const uint64_t *d_tabs,
        int f_multi, int f_nd, const uint64_t *f_lens,
        const uint64_t *f_offs, const uint64_t *f_tabs,
        const float *norms, uint32_t universe, int k,
        int64_t *out_docs, float *out_scores) {
    CCodec dd, fd;
    codec_init(&dd, d_multi, d_nd, d_lens, d_offs, d_tabs);
    codec_init(&fd, f_multi, f_nd, f_lens, f_offs, f_tabs);
    CList ls[64];
    CList *ordered[64];
    for (int i = 0; i < n_lists; i++) {
        cl_open(&ls[i], (const uint8_t *)(uintptr_t)payload_ptrs[i], qws[i],
                max_weights[i], i, &dd, universe);
        ordered[i] = &ls[i];
    }
    /* stable sort by max_weight ascending (python sorted is stable) */
    for (int i = 1; i < n_lists; i++) {
        CList *e = ordered[i];
        int j = i - 1;
        while (j >= 0 && ordered[j]->max_weight > e->max_weight) {
            ordered[j + 1] = ordered[j]; j--;
        }
        ordered[j + 1] = e;
    }
    float ub[64];
    ub[0] = ordered[0]->max_weight;
    for (int i = 1; i < n_lists; i++)
        ub[i] = ub[i - 1] + ordered[i]->max_weight;
    Heap hp; heap_init(&hp, k);
    int32_t cterms[64]; float cws[64];
    int non_essential = 0;
    uint32_t cur = universe;
    for (int i = 0; i < n_lists; i++)
        if (ordered[i]->cur < cur) cur = ordered[i]->cur;
    while (non_essential < n_lists && cur < universe) {
        int nc = 0;
        float running = 0.0f;
        uint32_t nxt = universe;
        for (int i = non_essential; i < n_lists; i++) {
            CList *L = ordered[i];
            if (L->cur == cur) {
                float w = cl_weight(L, &fd, norms);
                cterms[nc] = L->term_idx; cws[nc] = w; nc++;
                running = running + w;
                cl_advance(L, &dd, universe);
            }
            if (L->cur < nxt) nxt = L->cur;
        }
        for (int i = non_essential - 1; i >= 0; i--) {
            if (!heap_would_enter(&hp, running + ub[i])) break;
            CList *L = ordered[i];
            cl_next_geq(L, cur, &dd, universe);
            if (L->cur == cur) {
                float w = cl_weight(L, &fd, norms);
                cterms[nc] = L->term_idx; cws[nc] = w; nc++;
                running = running + w;
            }
        }
        if (heap_insert(&hp, sum_term_order(cterms, cws, nc), cur)) {
            while (non_essential < n_lists &&
                   !heap_would_enter(&hp, ub[non_essential]))
                non_essential++;
        }
        cur = nxt;
    }
    return heap_finalize(&hp, out_docs, out_scores);
}

/* ---- DINT opt DP encoder ------------------------------------------------
   Mirrors dint/codec.py _opt_encode_core exactly (same window hashing
   as util.py window_hashes/_finalize, same DP update order, same
   tie-breaking, same byte emission) so C output == Python output
   byte-for-byte.  Reference semantics: opt_dint block encode,
   /root/reference/include/dint/dint_codecs.hpp:147-283. */

#define ENC_M      0x9E3779B97F4A7C15ULL
#define ENC_LENMIX 0xC2B2AE3D27D4EB4FULL
#define ENC_MIX1   0xBF58476D1CE4E5B9ULL
#define ENC_MIX2   0x94D049BB133111EBULL
#define ENC_INVALID 0xFFFFFFFFu

static uint64_t enc_hash(const uint32_t *v, int64_t len) {
    uint64_t h = 0;
    for (int64_t i = 0; i < len; i++) h = h * ENC_M + (uint64_t)v[i];
    h += ENC_LENMIX * (uint64_t)len;
    h ^= h >> 30; h *= ENC_MIX1;
    h ^= h >> 27; h *= ENC_MIX2;
    h ^= h >> 31;
    return h;
}

/* Open-addressing probe table over the sorted (hash, codeword) pairs:
   slots[2i] = key, slots[2i+1] = codeword (ENC_INVALID when empty), so
   one 16-byte slot is one cache line touch per probe.  The encode DP
   issues ~1280 lookups per 256-int block; the former binary search
   over the 0.5 MB sorted-hash array cost 17 dependent cache misses
   per lookup and dominated the whole build's encode stage (measured
   166 us/block raw; the DP itself is a few us).  Hashes are already
   avalanche-finalized, so h & mask distributes well; load factor is
   kept <= 0.25 by the table builder. */
static uint32_t enc_lookup(const uint64_t *slots, uint64_t mask, uint64_t h) {
    uint64_t s = h & mask;
    for (;;) {
        const uint64_t *p = slots + 2 * s;
        if (p[1] == 0xFFFFFFFFULL) return ENC_INVALID;
        if (p[0] == h) return (uint32_t)p[1];
        s = (s + 1) & mask;
    }
}

/* Build the probe table from the sorted unique (th, tc) arrays.
   tsize must be a power of two with tsize > m (enforced caller-side;
   load <= 0.25 in practice).  Insertion order over unique keys is
   irrelevant to lookup results. */
void dint_probe_build(const uint64_t *th, const uint32_t *tc, int64_t m,
                      uint64_t *slots, int64_t tsize) {
    uint64_t mask = (uint64_t)tsize - 1;
    for (int64_t i = 0; i < tsize; i++) {
        slots[2 * i] = 0;
        slots[2 * i + 1] = 0xFFFFFFFFULL;
    }
    for (int64_t i = 0; i < m; i++) {
        uint64_t h = th[i];
        uint64_t s = h & mask;
        while (slots[2 * s + 1] != 0xFFFFFFFFULL) s = (s + 1) & mask;
        slots[2 * s] = h;
        slots[2 * s + 1] = (uint64_t)tc[i];
    }
}

/* n <= 4096; returns bytes written, or -1 if n too large.
   b is the codeword width in bits (8 or 16). */
int64_t dint_opt_encode(const uint32_t *buf, int64_t n,
                        const uint64_t *slots, uint64_t mask,
                        int32_t b, uint8_t *out) {
    if (n <= 0 || n > 4096) return -1;
    static const int SIZES[5] = {16, 8, 4, 2, 1};
    int32_t z[4096];                 /* zero-run length starting at i */
    int32_t parent[4097];
    uint32_t codeword[4097];
    int32_t cost[4097];
    {
        int32_t run = 0;
        for (int64_t i = n - 1; i >= 0; i--) {
            run = buf[i] ? 0 : run + 1;
            z[i] = run;
        }
    }
    for (int64_t j = 0; j <= n; j++) {
        parent[j] = (int32_t)j - 1;
        codeword[j] = 1;
        cost[j] = (int32_t)(3 * j);
    }
    parent[0] = 0; codeword[0] = 1; cost[0] = 0;

    for (int64_t i = 0; i < n; i++) {
        int32_t ci = cost[i];
        int32_t run = z[i];
        if (run >= 16) {
            int32_t k = 256;
            uint32_t index = 2;       /* EXCEPTIONS */
            while (run < k && k > 16) { k >>= 1; index++; }
            while (k >= 16) {
                int32_t c = ci + 1;
                int64_t j = i + k;
                if (cost[j] > c) {
                    parent[j] = (int32_t)i; codeword[j] = index; cost[j] = c;
                }
                k >>= 1; index++;
            }
        }
        for (int si = 0; si < 5; si++) {
            int32_t s = SIZES[si];
            int64_t ln = (i + s <= n) ? s : n - i;
            uint32_t cw = enc_lookup(slots, mask, enc_hash(buf + i, ln));
            if (cw != ENC_INVALID) {
                int32_t c = ci + 1;
                int64_t j = i + ln;
                if (cost[j] > c) {
                    parent[j] = (int32_t)i; codeword[j] = cw; cost[j] = c;
                }
            } else if (s == 1) {
                uint32_t v = buf[i];
                int32_t c; uint32_t cw0;
                if (v < 65536u) { c = ci + 2; cw0 = 0; }
                else            { c = ci + 3; cw0 = 1; }
                if (cost[i + 1] > c) {
                    parent[i + 1] = (int32_t)i;
                    codeword[i + 1] = cw0; cost[i + 1] = c;
                }
            }
        }
    }

    /* backtrack into a start-position stack, then emit forward */
    int32_t starts[4097]; uint32_t cws[4097]; int64_t nseg = 0;
    int64_t i = n;
    while (i != 0) {
        starts[nseg] = parent[i];
        cws[nseg] = codeword[i];
        nseg++;
        i = parent[i];
    }
    uint8_t *p = out;
    int nbytes = b / 8;
    for (int64_t si = nseg - 1; si >= 0; si--) {
        uint32_t cw = cws[si];
        if (cw > 1) {
            *p++ = (uint8_t)(cw & 0xFF);
            if (nbytes == 2) *p++ = (uint8_t)(cw >> 8);
        } else {
            *p++ = (uint8_t)cw;
            if (nbytes == 2) *p++ = 0;
            uint32_t v = buf[starts[si]];
            *p++ = (uint8_t)(v & 0xFF);
            *p++ = (uint8_t)((v >> 8) & 0xFF);
            if (cw == 1) {
                *p++ = (uint8_t)((v >> 16) & 0xFF);
                *p++ = (uint8_t)((v >> 24) & 0xFF);
            }
        }
    }
    return p - out;
}

/* 64-bit polynomial hash of every ALIGNED s-gram of buf — the exact
   twin of dint/stats.py aligned_hashes (same enc_hash constants and
   finalizer; tests assert equality).  The numpy version pays one
   strided u64 pass per window position plus a per-size astype; this
   loop is one linear scan.  nwin = n // s windows, out gets nwin. */
void aligned_window_hashes(const uint32_t *buf, int64_t nwin, int64_t s,
                           uint64_t *out) {
    for (int64_t w = 0; w < nwin; w++) {
        const uint32_t *v = buf + w * s;
        uint64_t h = 0;
        for (int64_t i = 0; i < s; i++) h = h * ENC_M + (uint64_t)v[i];
        h += ENC_LENMIX * (uint64_t)s;
        h ^= h >> 30; h *= ENC_MIX1;
        h ^= h >> 27; h *= ENC_MIX2;
        h ^= h >> 31;
        out[w] = h;
    }
}

/* Whole-posting-list payload for the single-dict DINT layout — the
   C twin of index/layout.py write_posting_list for the
   SingleDintCodec/SingleDintCodec case (byte-identical, asserted in
   tests).  One call per list replaces ~2 Python->C crossings plus
   numpy gap staging PER BLOCK:
     [varbyte n][maxs u32 x blocks][endpoints u32 x (blocks-1)]
     [per block: docs DP-or-interpolative, freqs-1 DP-or-interpolative]
   Returns bytes written; -1 unsupported shape; -2 interp overflow
   (caller falls back to the Python path, which raises the
   contract error). */
int64_t dint_write_list(const uint32_t *docs, const uint32_t *freqs,
                        int64_t n, int64_t bsz,
                        const uint64_t *dslots, uint64_t dmask,
                        const uint64_t *fslots, uint64_t fmask,
                        uint8_t *out) {
    if (n <= 0 || bsz <= 0 || bsz > 4096) return -1;
    int64_t blocks = (n + bsz - 1) / bsz;
    uint8_t *p = out;
    p += vb_write(p, (uint64_t)n);
    uint8_t *maxs_at = p;  p += 4 * blocks;
    uint8_t *endp_at = p;  p += 4 * (blocks - 1);
    uint8_t *payload_at = p;
    int64_t prev = -1, block_base = 0;
    uint32_t gaps[4096];
    for (int64_t b = 0; b < blocks; b++) {
        int64_t lo = b * bsz;
        int64_t hi = lo + bsz < n ? lo + bsz : n;
        int64_t size = hi - lo;
        gaps[0] = (uint32_t)((int64_t)docs[lo] - prev - 1);
        for (int64_t j = 1; j < size; j++)
            gaps[j] = docs[lo + j] - docs[lo + j - 1] - 1;
        int64_t last_doc = (int64_t)docs[hi - 1];
        maxs_at[4 * b]     = (uint8_t)(last_doc & 0xFF);
        maxs_at[4 * b + 1] = (uint8_t)((last_doc >> 8) & 0xFF);
        maxs_at[4 * b + 2] = (uint8_t)((last_doc >> 16) & 0xFF);
        maxs_at[4 * b + 3] = (uint8_t)((last_doc >> 24) & 0xFF);
        uint64_t sum = (uint64_t)(last_doc - block_base - (size - 1));
        int64_t got;
        if (size < bsz) {
            /* the interpolative bit writer ORs into its output and
               needs zeroed bytes (its standalone wrapper allocates
               with np.zeros); zero its worst-case span here */
            for (int64_t q = 0; q < 10 + 5 * size; q++) p[q] = 0;
            got = interp_encode(gaps, (int)size, sum,
                                sum != 0xFFFFFFFFULL, p);
        } else
            got = dint_opt_encode(gaps, size, dslots, dmask, 16, p);
        if (got < 0) return got;
        p += got;
        for (int64_t j = 0; j < size; j++) gaps[j] = freqs[lo + j] - 1;
        if (size < bsz) {
            for (int64_t q = 0; q < 10 + 5 * size; q++) p[q] = 0;
            got = interp_encode(gaps, (int)size, 0, 0, p);
        } else
            got = dint_opt_encode(gaps, size, fslots, fmask, 16, p);
        if (got < 0) return got;
        p += got;
        if (b != blocks - 1) {
            int64_t e = p - payload_at;
            endp_at[4 * b]     = (uint8_t)(e & 0xFF);
            endp_at[4 * b + 1] = (uint8_t)((e >> 8) & 0xFF);
            endp_at[4 * b + 2] = (uint8_t)((e >> 16) & 0xFF);
            endp_at[4 * b + 3] = (uint8_t)((e >> 24) & 0xFF);
        }
        prev = last_doc;
        block_base = last_doc + 1;
    }
    return p - out;
}

/* ---- batched MD5 (RFC 1321) --------------------------------------
   One call hashes every string of a batch: `data` is the
   concatenation, `offsets` (n+1) delimit the strings, `out` receives
   16 digest bytes per string.  Used by the dedup operators, whose
   per-shingle hashlib round-trips dominate MinHash signature cost
   (one Python call + object churn per 20-byte shingle).  The round
   constants are derived at call time from the spec's own formula
   K[i] = floor(abs(sin(i+1)) * 2^32), so there is no table to
   mistranscribe. */
#include <math.h>
#include <string.h>

static uint32_t md5_rotl(uint32_t x, int c) {
    return (x << c) | (x >> (32 - c));
}

static void md5_block(const uint8_t *p, uint32_t *st, const uint32_t *K) {
    static const int S[64] = {
        7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
        5,  9, 14, 20, 5,  9, 14, 20, 5,  9, 14, 20, 5,  9, 14, 20,
        4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
        6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21};
    uint32_t M[16];
    int i;
    for (i = 0; i < 16; i++)
        M[i] = (uint32_t)p[4 * i] | ((uint32_t)p[4 * i + 1] << 8)
             | ((uint32_t)p[4 * i + 2] << 16)
             | ((uint32_t)p[4 * i + 3] << 24);
    uint32_t A = st[0], B = st[1], C = st[2], D = st[3];
    for (i = 0; i < 64; i++) {
        uint32_t F;
        int g;
        if (i < 16)      { F = (B & C) | (~B & D); g = i; }
        else if (i < 32) { F = (D & B) | (~D & C); g = (5 * i + 1) & 15; }
        else if (i < 48) { F = B ^ C ^ D;          g = (3 * i + 5) & 15; }
        else             { F = C ^ (B | ~D);       g = (7 * i) & 15; }
        F += A + K[i] + M[g];
        A = D; D = C; C = B;
        B += md5_rotl(F, S[i]);
    }
    st[0] += A; st[1] += B; st[2] += C; st[3] += D;
}

void md5_batch(const uint8_t *data, const int64_t *offsets, int64_t n,
               uint8_t *out) {
    uint32_t K[64];
    int i;
    for (i = 0; i < 64; i++)
        K[i] = (uint32_t)(fabs(sin((double)(i + 1))) * 4294967296.0);
    int64_t r;
    for (r = 0; r < n; r++) {
        const uint8_t *msg = data + offsets[r];
        uint64_t len = (uint64_t)(offsets[r + 1] - offsets[r]);
        uint32_t st[4] = {0x67452301u, 0xefcdab89u,
                          0x98badcfeu, 0x10325476u};
        uint64_t full = len / 64, b;
        for (b = 0; b < full; b++)
            md5_block(msg + 64 * b, st, K);
        uint8_t tail[128];
        uint64_t rem = len - full * 64;
        memset(tail, 0, sizeof(tail));
        memcpy(tail, msg + full * 64, rem);
        tail[rem] = 0x80;
        int tlen = rem < 56 ? 64 : 128;
        uint64_t bits = len * 8;
        for (i = 0; i < 8; i++)
            tail[tlen - 8 + i] = (uint8_t)(bits >> (8 * i));
        md5_block(tail, st, K);
        if (tlen == 128)
            md5_block(tail + 64, st, K);
        for (i = 0; i < 4; i++) {
            out[16 * r + i]      = (uint8_t)(st[0] >> (8 * i));
            out[16 * r + 4 + i]  = (uint8_t)(st[1] >> (8 * i));
            out[16 * r + 8 + i]  = (uint8_t)(st[2] >> (8 * i));
            out[16 * r + 12 + i] = (uint8_t)(st[3] >> (8 * i));
        }
    }
}

/* CRC-32 (ISO-HDLC: poly 0xEDB88320, init/xorout 0xFFFFFFFF) over every
   slice of data delimited by offsets — bit-identical to zlib.crc32, so
   dedup digests keep matching the Python fallback path.  Slicing-by-8
   (8 lookup tables, 8 bytes per step): byte-at-a-time measured
   0.38 GB/s vs zlib's ~1.5; this closes the gap without a zlib link. */
void crc32_batch(const uint8_t *data, const int64_t *offsets, int64_t n,
                 uint32_t *out) {
    uint32_t tab[8][256];
    uint32_t c;
    int i, j, k;
    for (i = 0; i < 256; i++) {
        c = (uint32_t)i;
        for (j = 0; j < 8; j++)
            c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : (c >> 1);
        tab[0][i] = c;
    }
    for (k = 1; k < 8; k++)
        for (i = 0; i < 256; i++)
            tab[k][i] = (tab[k - 1][i] >> 8) ^ tab[0][tab[k - 1][i] & 0xFFu];
    int64_t r;
    for (r = 0; r < n; r++) {
        const uint8_t *p = data + offsets[r];
        int64_t len = offsets[r + 1] - offsets[r];
        c = 0xFFFFFFFFu;
        while (len >= 8) {
            uint32_t lo = (uint32_t)p[0] | ((uint32_t)p[1] << 8)
                        | ((uint32_t)p[2] << 16) | ((uint32_t)p[3] << 24);
            uint32_t hi = (uint32_t)p[4] | ((uint32_t)p[5] << 8)
                        | ((uint32_t)p[6] << 16) | ((uint32_t)p[7] << 24);
            lo ^= c;
            c = tab[7][lo & 0xFFu] ^ tab[6][(lo >> 8) & 0xFFu]
              ^ tab[5][(lo >> 16) & 0xFFu] ^ tab[4][lo >> 24]
              ^ tab[3][hi & 0xFFu] ^ tab[2][(hi >> 8) & 0xFFu]
              ^ tab[1][(hi >> 16) & 0xFFu] ^ tab[0][hi >> 24];
            p += 8; len -= 8;
        }
        while (len-- > 0)
            c = tab[0][(c ^ *p++) & 0xFFu] ^ (c >> 8);
        out[r] = c ^ 0xFFFFFFFFu;
    }
}

/* MinHash signatures over per-doc shingle-id slices: doc d's ids are
   sid[offsets[d] .. offsets[d+1]); out[d*nh + h] = min over ids x of
   (a[h]*x + b[h]) mod (2^31 - 1).  The modulus is Mersenne, so the
   reduction is two fold steps + one conditional subtract — exact
   (bit-identical to the %-based numpy/SQL arithmetic, asserted in
   tests) and division-free.  Bounds: x < 2^32 and a,b < 2^31-1, so
   a*x+b < 2^63 + 2^31 fits uint64; after fold one v < 2^32 + 2^31,
   after fold two v < P + 4 < 2P.  Empty docs keep the UINT64_MAX
   sentinel rows (same as the Python path). */
void minhash_sigs(const uint64_t *sid, const int64_t *offsets,
                  int64_t ndocs, const uint64_t *a, const uint64_t *b,
                  int nh, uint64_t *out) {
    const uint64_t P = 2147483647ULL;
    int64_t d, i;
    int h;
    for (d = 0; d < ndocs; d++) {
        uint64_t *row = out + d * (int64_t)nh;
        for (h = 0; h < nh; h++) row[h] = UINT64_MAX;
        for (i = offsets[d]; i < offsets[d + 1]; i++) {
            uint64_t x = sid[i];
            for (h = 0; h < nh; h++) {
                uint64_t v = a[h] * x + b[h];
                v = (v & P) + (v >> 31);
                v = (v & P) + (v >> 31);
                if (v >= P) v -= P;
                if (v < row[h]) row[h] = v;
            }
        }
    }
}
"""

_CDEF = """
void dint_probe_build(const uint64_t *th, const uint32_t *tc, int64_t m,
                      uint64_t *slots, int64_t tsize);
void aligned_window_hashes(const uint32_t *buf, int64_t nwin, int64_t s,
                           uint64_t *out);
int64_t dint_opt_encode(const uint32_t *buf, int64_t n,
                        const uint64_t *slots, uint64_t mask,
                        int32_t b, uint8_t *out);
int64_t dint_write_list(const uint32_t *docs, const uint32_t *freqs,
                        int64_t n, int64_t bsz,
                        const uint64_t *dslots, uint64_t dmask,
                        const uint64_t *fslots, uint64_t fmask,
                        uint8_t *out);
int64_t interp_encode(const uint32_t *gaps, int n, uint64_t sum_known,
                      int have_sum, uint8_t *out);
int64_t wand_query(int n_lists, const uint64_t *docs_ptrs,
                   const uint64_t *w_ptrs, const int64_t *lens,
                   const float *max_weights, uint32_t universe, int k,
                   int64_t *out_docs, float *out_scores);
int64_t block_max_wand_query(int n_lists, const uint64_t *docs_ptrs,
                             const uint64_t *w_ptrs, const int64_t *lens,
                             const float *max_weights,
                             const uint64_t *blast_ptrs,
                             const uint64_t *bw_ptrs, const int64_t *nblocks,
                             uint32_t universe, int k,
                             int64_t *out_docs, float *out_scores);
int64_t maxscore_query(int n_lists, const uint64_t *docs_ptrs,
                       const uint64_t *w_ptrs, const int64_t *lens,
                       const float *max_weights, uint32_t universe, int k,
                       int64_t *out_docs, float *out_scores);
int64_t decode_list_compressed(
        const uint8_t *payload,
        int d_multi, int d_nd, const uint64_t *d_lens,
        const uint64_t *d_offs, const uint64_t *d_tabs,
        int f_multi, int f_nd, const uint64_t *f_lens,
        const uint64_t *f_offs, const uint64_t *f_tabs,
        uint32_t *out_docs, uint32_t *out_freqs);
int64_t wand_compressed_query(
        int n_lists, const uint64_t *payload_ptrs, const float *qws,
        const float *max_weights,
        int d_multi, int d_nd, const uint64_t *d_lens,
        const uint64_t *d_offs, const uint64_t *d_tabs,
        int f_multi, int f_nd, const uint64_t *f_lens,
        const uint64_t *f_offs, const uint64_t *f_tabs,
        const float *norms, uint32_t universe, int k,
        int64_t *out_docs, float *out_scores);
int64_t maxscore_compressed_query(
        int n_lists, const uint64_t *payload_ptrs, const float *qws,
        const float *max_weights,
        int d_multi, int d_nd, const uint64_t *d_lens,
        const uint64_t *d_offs, const uint64_t *d_tabs,
        int f_multi, int f_nd, const uint64_t *f_lens,
        const uint64_t *f_offs, const uint64_t *f_tabs,
        const float *norms, uint32_t universe, int k,
        int64_t *out_docs, float *out_scores);
void md5_batch(const uint8_t *data, const int64_t *offsets, int64_t n,
               uint8_t *out);
void crc32_batch(const uint8_t *data, const int64_t *offsets, int64_t n,
                 uint32_t *out);
void minhash_sigs(const uint64_t *sid, const int64_t *offsets,
                  int64_t ndocs, const uint64_t *a, const uint64_t *b,
                  int nh, uint64_t *out);
"""

_lib = None
_ffi = None
_tried = False
DISABLE = os.environ.get("DINT_RAY_NO_NATIVE", "") == "1"


def _build_and_load():
    import cffi

    # flags are part of the key: a flag change with unchanged source
    # must not reuse the previously compiled artifact
    flags = os.environ.get("DINT_RAY_CFLAGS", "-O3 -march=native")
    src_hash = hashlib.sha1(
        (_SRC + "|" + flags).encode()).hexdigest()[:12]
    cache_dir = f"/tmp/dint_ray_native/{src_hash}"
    so_path = os.path.join(cache_dir, "libdintkern.so")
    if not os.path.exists(so_path):
        os.makedirs(cache_dir, exist_ok=True)
        c_path = os.path.join(cache_dir, "kernels.c")
        with open(c_path + ".tmp", "w") as f:
            f.write(_SRC)
        os.replace(c_path + ".tmp", c_path)
        # unique temp output + atomic rename: concurrent actor processes
        # race benignly (identical artifacts)
        fd, tmp_so = tempfile.mkstemp(dir=cache_dir, suffix=".so")
        os.close(fd)
        # -ffp-contract=off: the on-the-fly BM25 weights in the
        # compressed kernel must round exactly like numpy float32
        # (no fused multiply-add), or scores drift from the
        # decoded/Python paths.
        # -O3 -march=native: compiled on each worker host at import
        # time, so native tuning is safe; float semantics stay exact
        # (gcc never reassociates FP without -ffast-math, and
        # -ffp-contract=off forbids FMA) so scores remain bit-identical
        # to the numpy float32 paths.  Retry without -march=native for
        # toolchains that reject it.
        opt = os.environ.get("DINT_RAY_CFLAGS", "-O3 -march=native").split()
        base = ["cc", "-ffp-contract=off", "-shared", "-fPIC",
                "-o", tmp_so, c_path, "-lm"]
        try:
            subprocess.run(base[:1] + opt + base[1:],
                           check=True, capture_output=True)
        except subprocess.CalledProcessError:
            # toolchains that reject the tuning flags (-march=native)
            subprocess.run(base[:1] + ["-O2"] + base[1:],
                           check=True, capture_output=True)
        os.replace(tmp_so, so_path)
    ffi = cffi.FFI()
    ffi.cdef(_CDEF)
    return ffi, ffi.dlopen(so_path)


def get_lib():
    """(ffi, lib) or (None, None) when compilation is unavailable."""
    global _lib, _ffi, _tried
    if DISABLE:
        return None, None
    if not _tried:
        _tried = True
        try:
            _ffi, _lib = _build_and_load()
        except Exception:
            _ffi, _lib = None, None
    return _ffi, _lib


def available() -> bool:
    return get_lib()[1] is not None


def _ptr_arrays(ffi, lists):
    n = len(lists)
    docs_ptrs = np.empty(n, dtype=np.uint64)
    w_ptrs = np.empty(n, dtype=np.uint64)
    lens = np.empty(n, dtype=np.int64)
    mws = np.empty(n, dtype=np.float32)
    for i, L in enumerate(lists):
        # dptr/wptr are pre-validated addresses from the scored-list
        # cache; computing arr.ctypes.data per call costs a ctypes
        # object per access
        dp = getattr(L, "dptr", None)
        if dp is None:
            if (L.docs.dtype != np.uint32 or not L.docs.flags.c_contiguous
                    or L.w.dtype != np.float32
                    or not L.w.flags.c_contiguous):
                return None
            dp = L.docs.ctypes.data
            wp = L.w.ctypes.data
            try:
                L.dptr = dp
                L.wptr = wp
            except AttributeError:
                pass
        else:
            wp = L.wptr
        docs_ptrs[i] = dp
        w_ptrs[i] = wp
        lens[i] = L.n
        mws[i] = L.max_weight
    return docs_ptrs, w_ptrs, lens, mws


def _as(ffi, ctype, arr):
    return ffi.cast(ctype, arr.ctypes.data)


_OUT_CACHE: dict[int, tuple] = {}


def _out_buffers(ffi, k: int):
    """Reusable per-process output buffers + their casts (one query is
    scored at a time per actor process)."""
    got = _OUT_CACHE.get(k)
    if got is None:
        out_docs = np.empty(k, dtype=np.int64)
        out_scores = np.empty(k, dtype=np.float32)
        got = _OUT_CACHE[k] = (
            out_docs, out_scores,
            ffi.cast("int64_t *", out_docs.ctypes.data),
            ffi.cast("float *", out_scores.ctypes.data))
    return got


def probe_table(lookup):
    """(slots ndarray, slots_ptr, mask) open-addressing table for a
    dictionary.LookupTable, built once in C and cached on the lookup
    object (one build per actor per dictionary).  Slot i is the 16-byte
    pair (key, codeword-or-empty); load factor <= 0.25 so the encode
    DP's ~1280 lookups per block average ~1.4 probes instead of the 17
    dependent cache misses of a binary search over the sorted array."""
    pt = getattr(lookup, "_probe", None)
    if pt is not None:
        return pt
    ffi, lib = get_lib()
    th = lookup.hashes
    tc = lookup.codewords
    if not (th.flags.c_contiguous and tc.flags.c_contiguous):
        th = np.ascontiguousarray(th)
        tc = np.ascontiguousarray(tc)
    m = len(th)
    tsize = 1
    while tsize < 4 * max(m, 1):
        tsize <<= 1
    slots = np.empty(2 * tsize, dtype=np.uint64)
    lib.dint_probe_build(
        ffi.cast("uint64_t *", th.ctypes.data),
        ffi.cast("uint32_t *", tc.ctypes.data), m,
        ffi.cast("uint64_t *", slots.ctypes.data), tsize)
    # cache only picklable state (an ffi pointer on the object would
    # break ray.put / checkpoint pickling of the dictionary bundle)
    pt = (slots, tsize - 1)
    lookup._probe = pt
    return pt


def opt_encode(buf: np.ndarray, lookup, b: int) -> bytes | None:
    """C twin of dint/codec.py _opt_encode_core (byte-identical output;
    asserted in tests).  ``lookup`` is a dictionary.LookupTable; its
    (hash -> codeword) map is served from the cached probe_table and
    window hashing happens in C too, so the Python caller skips
    _precompute_hashes entirely.  None -> Python path."""
    ffi, lib = get_lib()
    if lib is None or len(buf) == 0 or len(buf) > 4096:
        return None
    buf = np.ascontiguousarray(buf, dtype=np.uint32)
    slots, mask = probe_table(lookup)
    out = np.empty(6 * len(buf) + 16, dtype=np.uint8)
    got = lib.dint_opt_encode(
        ffi.cast("uint32_t *", buf.ctypes.data), len(buf),
        ffi.cast("uint64_t *", slots.ctypes.data), mask,
        b, ffi.cast("uint8_t *", out.ctypes.data))
    if got < 0:
        return None
    return out[:got].tobytes()


def aligned_hashes(buf: np.ndarray, s: int) -> np.ndarray | None:
    """C twin of dint/stats.py aligned_hashes (value-identical;
    asserted in tests).  None -> numpy path.

    uint32 inputs only: the kernel hashes 32-bit windows, while the
    numpy twin promotes wider dtypes to uint64 without truncation —
    route anything wider back to the numpy path instead of silently
    truncating."""
    ffi, lib = get_lib()
    if lib is None:
        return None
    # unsigned only: a signed int32 negative wraps mod 2^32 in the C
    # kernel but promotes sign-extended to uint64 in the numpy twin —
    # the two paths would diverge, so route signed inputs to numpy
    if buf.dtype.itemsize > 4 or buf.dtype.kind != "u":
        return None
    nwin = len(buf) // s
    if nwin == 0:
        return np.empty(0, dtype=np.uint64)
    buf = np.ascontiguousarray(buf, dtype=np.uint32)
    out = np.empty(nwin, dtype=np.uint64)
    lib.aligned_window_hashes(
        ffi.cast("uint32_t *", buf.ctypes.data), nwin, s,
        ffi.cast("uint64_t *", out.ctypes.data))
    return out


def write_list(docs: np.ndarray, freqs: np.ndarray, block_size: int,
               docs_lookup, freqs_lookup) -> bytes | None:
    """C twin of index/layout.py write_posting_list for the
    single-dict DINT codec pair (byte-identical output; asserted in
    tests).  One crossing per LIST instead of two per block.  None ->
    caller runs the per-block Python composition (which also owns the
    interpolative-overflow contract error)."""
    ffi, lib = get_lib()
    n = len(docs)
    if lib is None or n == 0 or block_size > 4096:
        return None
    docs = np.ascontiguousarray(docs, dtype=np.uint32)
    freqs = np.ascontiguousarray(freqs, dtype=np.uint32)
    dslots, dmask = probe_table(docs_lookup)
    fslots, fmask = probe_table(freqs_lookup)
    blocks = (n + block_size - 1) // block_size
    # worst case: 6 B/int per stream (b=16 exception literals) for full
    # blocks, 10 + 5*size per stream for the partial block, + header
    out = np.empty(12 * n + 8 * blocks + 64, dtype=np.uint8)
    got = lib.dint_write_list(
        ffi.cast("uint32_t *", docs.ctypes.data),
        ffi.cast("uint32_t *", freqs.ctypes.data), n, block_size,
        ffi.cast("uint64_t *", dslots.ctypes.data), dmask,
        ffi.cast("uint64_t *", fslots.ctypes.data), fmask,
        ffi.cast("uint8_t *", out.ctypes.data))
    if got < 0:
        return None
    return out[:got].tobytes()


def interp_encode(gaps: np.ndarray, sum_of_values: int) -> bytes | None:
    """C twin of codecs/interpolative.py encode (byte-identical output;
    asserted in tests).  sum_of_values == U32_INVALID writes the
    varbyte sum header, any other value is the caller-known sum.
    None -> Python path (no compiler / oversized block)."""
    ffi, lib = get_lib()
    n = len(gaps)
    if lib is None or n == 0 or n > 4096:
        return None
    gaps = np.ascontiguousarray(gaps, dtype=np.uint32)
    out = np.zeros(10 + 5 * n, dtype=np.uint8)
    have = sum_of_values != 0xFFFFFFFF
    got = lib.interp_encode(
        ffi.cast("uint32_t *", gaps.ctypes.data), n,
        sum_of_values if have else 0, 1 if have else 0,
        ffi.cast("uint8_t *", out.ctypes.data))
    if got == -2:
        # kernel-side twin of the Python fallback's overflow guard —
        # checked here (the prefix-sum loop already has the total) so
        # the hot path needn't pay a separate numpy sum per block
        raise ValueError(
            "interpolative self-described sum exceeds the u32 wire "
            "format (reference block_codecs.hpp:117 wraps here); pass "
            "an explicit universe or split the block")
    if got < 0:
        return None
    return out[:got].tobytes()


def crc32_batch(data, offsets: np.ndarray) -> np.ndarray | None:
    """zlib-identical CRC-32 for every slice of ``data`` (any buffer,
    e.g. an Arrow string value buffer) delimited by ``offsets`` (int64,
    len n+1), as a uint32 array.  None -> no compiler; callers fall
    back to zlib.crc32 per slice."""
    ffi, lib = get_lib()
    if lib is None:
        return None
    n = len(offsets) - 1
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    out = np.empty(n, dtype=np.uint32)
    lib.crc32_batch(
        ffi.cast("const uint8_t *", ffi.from_buffer(data)),
        ffi.cast("const int64_t *", offsets.ctypes.data), n,
        ffi.cast("uint32_t *", out.ctypes.data))
    return out


def md5_batch(data, offsets: np.ndarray) -> np.ndarray | None:
    """16-byte MD5 digests for every slice of ``data`` delimited by
    ``offsets`` (int64, len n+1), as an (n, 16) uint8 array.  Output is
    bit-identical to hashlib.md5 per slice (asserted in tests) — the
    dedup operators' DuckDB md5() oracles keep matching.  None -> no
    compiler; callers fall back to hashlib."""
    ffi, lib = get_lib()
    if lib is None:
        return None
    n = len(offsets) - 1
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    out = np.empty((n, 16), dtype=np.uint8)
    lib.md5_batch(
        ffi.cast("const uint8_t *", ffi.from_buffer(data)),
        ffi.cast("const int64_t *", offsets.ctypes.data), n,
        ffi.cast("uint8_t *", out.ctypes.data))
    return out


def minhash_sigs(sid: np.ndarray, offsets: np.ndarray, a: np.ndarray,
                 b: np.ndarray) -> np.ndarray | None:
    """(ndocs, nh) MinHash signature matrix over concatenated per-doc
    shingle ids (uint64 < 2^32) sliced by ``offsets`` (int64, len
    ndocs+1): out[d, h] = min over doc d's ids of (a[h]*x + b[h]) mod
    (2^31-1), bit-identical to the %-based numpy path (Mersenne-fold
    reduction, asserted in tests).  None -> no compiler."""
    ffi, lib = get_lib()
    if lib is None:
        return None
    ndocs = len(offsets) - 1
    nh = len(a)
    sid = np.ascontiguousarray(sid, dtype=np.uint64)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    a = np.ascontiguousarray(a, dtype=np.uint64)
    b = np.ascontiguousarray(b, dtype=np.uint64)
    out = np.empty((ndocs, nh), dtype=np.uint64)
    lib.minhash_sigs(
        ffi.cast("const uint64_t *", sid.ctypes.data),
        ffi.cast("const int64_t *", offsets.ctypes.data), ndocs,
        ffi.cast("const uint64_t *", a.ctypes.data),
        ffi.cast("const uint64_t *", b.ctypes.data), nh,
        ffi.cast("uint64_t *", out.ctypes.data))
    return out


def run_topk(algo: str, lists, k: int, universe: int, blocks=None):
    """lists: _ScoredList-shaped objects (contiguous uint32 .docs /
    float32 .w / float .max_weight), in ascending term order.  blocks:
    for block_max_wand, aligned [(last:uint32[], bw:float32[])].
    Returns [(docid, score)] or None when the kernel can't run."""
    ffi, lib = get_lib()
    if lib is None or len(lists) > MAX_LISTS:
        return None
    ptrs = _ptr_arrays(ffi, lists)
    if ptrs is None:
        return None
    docs_ptrs, w_ptrs, lens, mws = ptrs
    out_docs, out_scores, out_docs_c, out_scores_c = _out_buffers(ffi, k)
    n = len(lists)
    if algo == "wand":
        cnt = lib.wand_query(
            n, _as(ffi, "uint64_t *", docs_ptrs), _as(ffi, "uint64_t *", w_ptrs),
            _as(ffi, "int64_t *", lens), _as(ffi, "float *", mws),
            universe, k, out_docs_c, out_scores_c)
    elif algo == "maxscore":
        cnt = lib.maxscore_query(
            n, _as(ffi, "uint64_t *", docs_ptrs), _as(ffi, "uint64_t *", w_ptrs),
            _as(ffi, "int64_t *", lens), _as(ffi, "float *", mws),
            universe, k, out_docs_c, out_scores_c)
    elif algo == "block_max_wand":
        assert blocks is not None and len(blocks) == n
        keep = []  # hold refs so arrays outlive the call
        blast_ptrs = np.empty(n, dtype=np.uint64)
        bw_ptrs = np.empty(n, dtype=np.uint64)
        nblocks = np.empty(n, dtype=np.int64)
        for i, (last, bw) in enumerate(blocks):
            last = np.ascontiguousarray(last, dtype=np.uint32)
            bw = np.ascontiguousarray(bw, dtype=np.float32)
            keep.append((last, bw))
            blast_ptrs[i] = last.ctypes.data
            bw_ptrs[i] = bw.ctypes.data
            nblocks[i] = len(last)
        cnt = lib.block_max_wand_query(
            n, _as(ffi, "uint64_t *", docs_ptrs), _as(ffi, "uint64_t *", w_ptrs),
            _as(ffi, "int64_t *", lens), _as(ffi, "float *", mws),
            _as(ffi, "uint64_t *", blast_ptrs), _as(ffi, "uint64_t *", bw_ptrs),
            _as(ffi, "int64_t *", nblocks),
            universe, k, out_docs_c, out_scores_c)
    else:
        return None
    return [(int(out_docs[i]), float(out_scores[i])) for i in range(cnt)]


# --------------------------------------------------------------------------
# compressed-posting serving (WAND directly over DINT payloads)
# --------------------------------------------------------------------------

def dict_c_arrays(d):
    """Contiguous (lengths:int32, offsets:int32, table:uint32) views of a
    PackedDict for the C decoder (kept alive by the caller)."""
    lengths = np.ascontiguousarray(d.lengths, dtype=np.int32)
    offs = np.ascontiguousarray(
        (d.offsets.astype(np.int64) & 0xFFFFFF).astype(np.int32))
    # 16 trailing pad ints: dint_decode copies a fixed 16-int window from
    # every entry start, so the last entry's overcopy must stay in-bounds
    table = np.ascontiguousarray(
        np.concatenate([np.asarray(d.table, dtype=np.uint32),
                        np.zeros(16, dtype=np.uint32)]))
    return lengths, offs, table


def _codec_c_args(ffi, d):
    """(keep, flat cffi args) for one stream codec: a PackedDict
    (single layout, no control byte) or a MultiPackedDict (selector
    byte, b=16/b=8 streams — dint/codec.py decode_multi)."""
    multi = hasattr(d, "dicts")
    dl = d.dicts if multi else [d]
    if len(dl) > 8:
        # CCodec holds a fixed dicts[8]; a larger ndicts would pass the
        # `sc < ndicts` selector check and dereference uninitialized
        # slots (DintConfig.num_selectors > 8 is unvalidated upstream)
        raise ValueError(
            f"C kernels support at most 8 dictionaries, got {len(dl)} "
            "(num_selectors too large) — use the Python decode path")
    keep = [dict_c_arrays(x) for x in dl]
    lp = np.array([k[0].ctypes.data for k in keep], dtype=np.uint64)
    op = np.array([k[1].ctypes.data for k in keep], dtype=np.uint64)
    tp = np.array([k[2].ctypes.data for k in keep], dtype=np.uint64)
    keep.extend((lp, op, tp))
    args = (int(multi), len(dl),
            ffi.cast("uint64_t *", lp.ctypes.data),
            ffi.cast("uint64_t *", op.ctypes.data),
            ffi.cast("uint64_t *", tp.ctypes.data))
    return keep, args


class CompressedWand:
    """Per-process handle: casts the dictionary / norm arrays once, then
    serves wand/maxscore compressed queries over raw payload pointers.
    Supports single-dict (single_packed / single_rect) AND multi-dict
    (multi_packed) payload layouts.

    Lists MUST be passed in ascending term order (term_idx = position,
    used for the float32 contribution-accumulation order)."""

    def __init__(self, docs_dict, freqs_dict, norms: np.ndarray) -> None:
        ffi, lib = get_lib()
        if lib is None:
            raise RuntimeError("C kernels unavailable")
        self.ffi, self.lib = ffi, lib
        # keep the arrays alive for the lifetime of the handle
        dk, dargs = _codec_c_args(ffi, docs_dict)
        fk, fargs = _codec_c_args(ffi, freqs_dict)
        self._keep = [dk, fk]
        self._dict_args = dargs + fargs
        self.norms = np.ascontiguousarray(norms, dtype=np.float32)
        self._norms_c = ffi.cast("float *", self.norms.ctypes.data)

    def query(self, payload_ptrs: np.ndarray, qws: np.ndarray,
              mws: np.ndarray, universe: int, k: int,
              algo: str = "wand"):
        """[(rel_doc, score)] exact per-bucket top-k (wand / maxscore)."""
        ffi = self.ffi
        fn = self.lib.wand_compressed_query if algo == "wand" \
            else self.lib.maxscore_compressed_query
        out_docs, out_scores, out_docs_c, out_scores_c = _out_buffers(ffi, k)
        cnt = fn(
            len(payload_ptrs), _as(ffi, "uint64_t *", payload_ptrs),
            _as(ffi, "float *", qws), _as(ffi, "float *", mws),
            *self._dict_args, self._norms_c, universe, k,
            out_docs_c, out_scores_c)
        return [(int(out_docs[i]), float(out_scores[i])) for i in range(cnt)]

    def decode_list(self, payload: np.ndarray, n: int):
        """(docs, freqs) full decode via the C path (conformance)."""
        ffi = self.ffi
        docs = np.empty(n, dtype=np.uint32)
        freqs = np.empty(n, dtype=np.uint32)
        got = self.lib.decode_list_compressed(
            _as(ffi, "uint8_t *", payload), *self._dict_args,
            _as(ffi, "uint32_t *", docs), _as(ffi, "uint32_t *", freqs))
        assert got == n, f"decoded {got} != {n}"
        return docs, freqs
