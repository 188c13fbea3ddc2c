"""Deterministic synthetic fixtures (FIXTURES.md F1/F4).

Generates, with fixed seeds and no external data:
- a Common-Crawl-style Parquet pages table with the BASELINE.json
  input_hint schema (url, warc_ts, html, text, lang);
- a query log of term-id lists mirroring the reference's 500-query
  format (/root/reference/test/test_data/queries: 1-8 ids per line).

Text is drawn from a Zipf-ish distribution over a `t{k}` vocabulary so
posting lists have the head/tail skew the reference's corpora have.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE_TS = np.datetime64("2024-01-01T00:00:00", "us")


def generate_pages(num_docs: int, vocab_size: int = 2000, seed: int = 42,
                   zipf_s: float = 1.07, mean_len: float = 120.0,
                   doc_offset: int = 0) -> pa.Table:
    """doc_offset shifts url / warc_ts / doc_id so disjoint chunks
    generated with different seeds form one coherent corpus (used by
    the chunked multi-million-doc dedup fixture, which would not fit
    in one table draw)."""
    rng = np.random.default_rng(seed)
    # Zipf-ish rank probabilities
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = ranks ** (-zipf_s)
    probs /= probs.sum()
    # doc lengths ~ lognormal clipped to [8, 2048]
    lens = np.clip(
        rng.lognormal(mean=np.log(mean_len), sigma=0.6, size=num_docs), 8, 2048
    ).astype(np.int64)
    vocab = np.array([f"t{k}" for k in range(vocab_size)])
    # one vectorized draw for every token of every doc, then per-doc joins
    all_ids = rng.choice(vocab_size, size=int(lens.sum()), p=probs)
    all_toks = vocab[all_ids]
    bounds = np.concatenate([[0], np.cumsum(lens)])
    en_mask = rng.random(num_docs) > 0.02
    urls, htmls, texts, langs = [], [], [], []
    ts = np.empty(num_docs, dtype="datetime64[us]")
    for i in range(num_docs):
        g = doc_offset + i
        text = " ".join(all_toks[bounds[i]:bounds[i + 1]])
        urls.append(f"https://host{g % 97}.example/p/{g}")
        texts.append(text)
        htmls.append(b"<html><body>" + text.encode() + b"</body></html>")
        langs.append("en" if en_mask[i] else "xx")
        ts[i] = BASE_TS + np.timedelta64(g, "s")
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        # docID = rank of url in deterministic generation order (FIXTURES.md F1)
        "doc_id": pa.array(
            np.arange(doc_offset, doc_offset + num_docs, dtype=np.uint64),
            pa.uint64()),
    })


def generate_dedup_pages(num_docs: int, vocab_size: int = 2000,
                         seed: int = 42, doc_offset: int = 0,
                         dup_frac: float = 0.08,
                         near_frac: float = 0.04) -> pa.Table:
    """Pages chunk with a controlled duplicate population: dup_frac of
    rows are EXACT text copies of an earlier row in the chunk (distinct
    url / doc_id — the crawl-revisit shape), near_frac are copies with
    ~2% of tokens substituted (high-Jaccard near-duplicates for the
    MinHash/SimHash band paths).  A dedup benchmark over a corpus with
    no duplicates only measures the no-match fast path; this fixture
    makes the pair-emission and join stages do real work."""
    t = generate_pages(num_docs, vocab_size, seed, doc_offset=doc_offset)
    rng = np.random.default_rng(seed + 1_000_003)
    texts = t.column("text").to_pylist()
    n_dup = int(num_docs * dup_frac)
    n_near = int(num_docs * near_frac)
    # victims are the tail half so every source index precedes its copy
    victims = rng.choice(np.arange(num_docs // 2, num_docs),
                         size=n_dup + n_near, replace=False)
    sources = rng.integers(0, num_docs // 2, size=n_dup + n_near)
    for v, s in zip(victims[:n_dup], sources[:n_dup]):
        texts[int(v)] = texts[int(s)]
    for v, s in zip(victims[n_dup:], sources[n_dup:]):
        toks = texts[int(s)].split(" ")
        step = max(2, len(toks) // max(1, int(len(toks) * 0.02)))
        for j in range(0, len(toks), step):
            toks[j] = f"t{int(rng.integers(0, vocab_size))}"
        texts[int(v)] = " ".join(toks)
    htmls = [b"<html><body>" + s.encode() + b"</body></html>"
             for s in texts]
    return (t.set_column(t.schema.get_field_index("text"), "text",
                         pa.array(texts, pa.string()))
             .set_column(t.schema.get_field_index("html"), "html",
                         pa.array(htmls, pa.binary())))


def generate_queries(num_queries: int, num_terms: int, seed: int = 7) -> list[list[int]]:
    """1-8 term ids per query, mixing head and tail terms; duplicates
    allowed (dedup is part of the query operator contract,
    /root/reference/include/ds2i/queries.hpp:29-32)."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(num_queries):
        k = int(rng.integers(1, 9))
        head = rng.integers(0, max(2, num_terms // 20), size=(k + 1) // 2)
        tail = rng.integers(0, num_terms, size=k // 2)
        q = np.concatenate([head, tail])[:k]
        out.append([int(x) for x in q])
    return out


def pages_fixture_path(num_docs: int, vocab_size: int = 2000, seed: int = 42,
                       root: str = "/tmp/dint_ray_fixtures") -> str:
    """Materialize (once) and return the path of a pages parquet file."""
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, f"pages_n{num_docs}_v{vocab_size}_s{seed}.parquet")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        pq.write_table(generate_pages(num_docs, vocab_size, seed), tmp)
        os.replace(tmp, path)
    return path
