"""Text extraction + tokenization.

The reference consumes an already-tokenized collection
(/root/reference/README.md:39-55); this stage recreates the implied
upstream ds2i preprocessing over Common-Crawl-style pages
(BASELINE.json input_hint).  The per-row invariant is *byte-identical
extracted text per url* between the distributed pipeline and the
single-process oracle — both call these exact functions.

Tokenizer contract (kept deliberately regex-simple so DuckDB can
express the identical tokenization in oracle SQL):
    tokens(text) = re.findall('[a-z0-9]+', text.lower())
which matches DuckDB's  regexp_extract_all(lower(text), '[a-z0-9]+').
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa

_TAG = re.compile(rb"<[^>]*>")
_TOKEN = re.compile(r"[a-z0-9]+")
_FALLBACK_WARNED = False


def extract_text(html: bytes) -> str:
    """Deterministic tag-stripping extraction (fixture htmls are simple
    well-formed markup; anything between tags is kept verbatim)."""
    return _TAG.sub(b"", html).decode("utf-8")


def tokens(text: str) -> list[str]:
    return _TOKEN.findall(text.lower())


class Tokenizer:
    """Actor-pool stage: pages batch -> flattened (doc_id, term, tf) rows.

    Stateful-stage shape per the north_star: compiled regexes live in
    __init__ (once per actor), __call__ is per batch.  Zero-copy Arrow
    in; Arrow out.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 from_html: bool = False) -> None:
        self.text_col = text_col
        self.id_col = id_col
        self.from_html = from_html
        self.token_re = re.compile(r"[a-z0-9]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        if self.from_html:
            texts = pa.array(
                [extract_text(h) for h in batch.column("html").to_pylist()])
        else:
            texts = batch.column(self.text_col)
        try:
            return self._tokenize_arrow(ids, texts)
        except (pa.ArrowNotImplementedError, AttributeError):
            # The Python fallback differs from the Arrow kernel on
            # Unicode case-folding edges (e.g. 'İ'), which would break
            # the DuckDB lower() oracle contract silently on old
            # pyarrow — warn once per worker so the build signals it.
            global _FALLBACK_WARNED
            if not _FALLBACK_WARNED:
                _FALLBACK_WARNED = True
                import logging

                logging.getLogger(__name__).warning(
                    "pyarrow tokenizer kernel unavailable; falling back "
                    "to the Python tokenizer (case-folding edge cases "
                    "may differ from pc.utf8_lower)")
            return self._tokenize_python(ids, texts.to_pylist())

    def _tokenize_arrow(self, ids: np.ndarray, texts) -> pa.Table:
        """Vectorized path: split on the token-class COMPLEMENT (same
        token multiset as re.findall('[a-z0-9]+', lower) once empties
        are dropped — equivalence pinned in tests), dictionary-encode
        tokens, count (doc, code) pairs with one np.unique.  No
        per-document Python."""
        import pyarrow.compute as pc

        toks = pc.split_pattern_regex(pc.utf8_lower(texts),
                                      pattern="[^a-z0-9]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = np.asarray(toks.offsets)
        vals = toks.values
        doc_idx = np.repeat(np.arange(len(ids)), np.diff(offs))
        keep = np.asarray(pc.binary_length(vals)) > 0
        vals = vals.filter(pa.array(keep))
        doc_idx = doc_idx[keep]
        if len(doc_idx) == 0:
            return pa.table({
                "doc_id": pa.array([], pa.uint64()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.uint32()),
            })
        enc = vals.dictionary_encode()
        codes = np.asarray(enc.indices).astype(np.int64)
        key = (doc_idx.astype(np.int64) << 32) | codes
        uk, tf = np.unique(key, return_counts=True)
        return pa.table({
            "doc_id": pa.array(ids[(uk >> 32)].astype(np.uint64),
                               pa.uint64()),
            "term": enc.dictionary.take(
                pa.array((uk & 0xFFFFFFFF).astype(np.int32))),
            "tf": pa.array(tf.astype(np.uint32), pa.uint32()),
        })

    def _tokenize_python(self, ids: np.ndarray, texts: list) -> pa.Table:
        """Reference per-doc path (also the semantic spec for tests)."""
        out_ids: list[np.ndarray] = []
        out_terms: list[str] = []
        out_tfs: list[np.ndarray] = []
        findall = self.token_re.findall
        for doc_id, text in zip(ids, texts):
            c = Counter(findall(text.lower()))
            if not c:
                continue
            out_terms.extend(c.keys())
            out_tfs.append(np.fromiter(c.values(), dtype=np.uint32, count=len(c)))
            out_ids.append(np.full(len(c), doc_id, dtype=np.uint64))
        if not out_ids:
            return pa.table({
                "doc_id": pa.array([], pa.uint64()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.uint32()),
            })
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_ids), pa.uint64()),
            "term": pa.array(out_terms, pa.string()),
            "tf": pa.array(np.concatenate(out_tfs), pa.uint32()),
        })


def doc_lengths_batch(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """(doc_id, len) per row; len = token count (the `.sizes` equivalent,
    /root/reference/src/create_wand_data.cpp:22).  Same Arrow kernel and
    fallback pair as the Tokenizer: token count == number of non-empty
    complement-class splits == len(findall), the equivalence the
    tokenizer tests pin."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    try:
        import pyarrow.compute as pc

        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column(text_col)), pattern="[^a-z0-9]+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = np.asarray(toks.offsets)
        keep = (np.asarray(pc.binary_length(toks.values)) > 0).astype(np.int64)
        csum = np.concatenate(([0], np.cumsum(keep)))
        lens = (csum[offs[1:]] - csum[offs[:-1]]).astype(np.uint32)
    except (pa.ArrowNotImplementedError, AttributeError):
        texts = batch.column(text_col).to_pylist()
        # null text -> len 0, matching the Arrow path (which yields an
        # empty split for nulls) so doc lengths are path-independent
        lens = np.fromiter(
            (0 if t is None else len(_TOKEN.findall(t.lower()))
             for t in texts),
            dtype=np.uint32, count=len(texts))
    return pa.table({
        "doc_id": pa.array(ids.astype(np.uint64), pa.uint64()),
        "len": pa.array(lens, pa.uint32()),
    })
