"""Text analysis operators over a documents table.

All formulas are deliberately expressible in ANSI SQL (DuckDB) so the
driver's oracle can check them value-for-value; outputs stick to
integers/strings to avoid float-hash mismatches.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa

TOKEN_RE = r"[a-z0-9]+"
# "BPE-ish" pre-tokenizer: letter runs, digit runs, single punctuation
BPE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"
# tiny stopword list shared with the SQL oracle
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "for")


class TextStats:
    """Actor-pool stage: (doc_id, text) -> quality/size statistics.

    Emits only integer features so the DuckDB oracle hashes identically:
    n_tokens, n_unique, stopword_count, bpe_tokens, max_token_len.
    """

    def __init__(self) -> None:
        self.tok = re.compile(TOKEN_RE)
        self.bpe = re.compile(BPE_RE)
        self.stop = set(STOPWORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        n_tok, n_uniq, n_stop, n_bpe, max_len = [], [], [], [], []
        for t in texts:
            low = t.lower()
            toks = self.tok.findall(low)
            n_tok.append(len(toks))
            n_uniq.append(len(set(toks)))
            n_stop.append(sum(1 for w in toks if w in self.stop))
            n_bpe.append(len(self.bpe.findall(low)))
            max_len.append(max((len(w) for w in toks), default=0))
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "n_unique": pa.array(n_uniq, pa.int64()),
            "stopword_count": pa.array(n_stop, pa.int64()),
            "bpe_tokens": pa.array(n_bpe, pa.int64()),
            "max_token_len": pa.array(max_len, pa.int64()),
        })


class LangId:
    """Heuristic language ID: a doc is 'en' iff it contains at least
    min_hits distinct stopwords from STOPWORDS, else 'other'.  Simple
    enough that DuckDB expresses the identical rule."""

    def __init__(self, min_hits: int = 1) -> None:
        self.tok = re.compile(TOKEN_RE)
        self.stop = set(STOPWORDS)
        self.min_hits = min_hits

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        preds = []
        for t in texts:
            hits = len(self.stop & set(self.tok.findall(t.lower())))
            preds.append("en" if hits >= self.min_hits else "other")
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
            "pred_lang": pa.array(preds, pa.string()),
        })


class Fingerprint:
    """Document fingerprinting over the normalized token stream: crc32
    (rolling-hash family, the cheap in-pipeline key) plus an md5 hex
    digest that DuckDB computes identically, so the operator is
    exactly oracle-checkable."""

    def __init__(self) -> None:
        self.tok = re.compile(TOKEN_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        norm = [" ".join(self.tok.findall(t.lower())) for t in texts]
        fps = [zlib.crc32(s.encode()) for s in norm]
        md5s = [hashlib.md5(s.encode()).hexdigest() for s in norm]
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
            "fingerprint": pa.array(np.asarray(fps, dtype=np.int64), pa.int64()),
            "fingerprint_md5": pa.array(md5s, pa.string()),
        })


def text_stats_ds(docs_ds, concurrency: int = 8):
    import dint_ray
    dint_ray.ensure_tuned()
    from dint_ray.ops import project_columns

    return project_columns(docs_ds).map_batches(TextStats, batch_format="pyarrow",
                               batch_size=1024, concurrency=(1, concurrency),
                               num_cpus=1)


def lang_id_ds(docs_ds, concurrency: int = 8):
    import dint_ray
    dint_ray.ensure_tuned()
    from dint_ray.ops import project_columns

    return project_columns(docs_ds).map_batches(LangId, batch_format="pyarrow",
                               batch_size=1024, concurrency=(1, concurrency),
                               num_cpus=1)


def fingerprint_ds(docs_ds, concurrency: int = 8):
    import dint_ray
    dint_ray.ensure_tuned()
    from dint_ray.ops import project_columns

    return project_columns(docs_ds).map_batches(Fingerprint, batch_format="pyarrow",
                               batch_size=1024, concurrency=(1, concurrency),
                               num_cpus=1)
