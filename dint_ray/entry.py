"""Driver-contract query/oracle implementations.

Each public ``q_*`` function takes an ``sf_dir`` containing the
driver's parquet tables (``documents``, ``embeddings``, ...) and runs a
Ray Data pipeline; the matching ``SQL_*`` string is the ANSI-SQL oracle
DuckDB runs on the same tables.  Column names and dtypes match on both
sides (the driver sorts columns by name and value-hashes).

Conformance-scoring note (BM25 entries): the engine's rank-identity
contract is float32 in the reference's evaluation order
(/root/reference/include/ds2i/bm25.hpp:7-25, tested in
tests/test_index_queries.py).  A SQL oracle cannot reproduce float32
bit patterns, so the driver-facing BM25 entries quantize each
double-precision term contribution to an integer
(``floor(x*1e15+0.5)``) and sum exactly; Python mirrors the SQL's
operation order so both sides produce identical BIGINTs.  The float
path stays the production scorer.
"""

from __future__ import annotations

import hashlib
import os
import pathlib

import numpy as np
import pyarrow as pa

import dint_ray
from dint_ray.queries.algorithms import query_freqs, remove_duplicate_terms

TOKEN_RE = "[a-z0-9]+"
K = 10          # top-k for ranked entries (reference default, queries.cpp)
KNN_K = 5
KNN_QUERY_IDS = list(range(10))
EMB_DUP_THRESHOLD = 0.4   # sf-fixture sims top out ~0.51; 0.95 is the API default
JACCARD_K = 3
JACCARD_THRESHOLD = 0.5


# --------------------------------------------------------------------------
# fixed query log (embedded identically in the SQL oracles)
# --------------------------------------------------------------------------

def _gen_query_log(num: int = 24, vocab: int = 31, seed: int = 7) -> list[list[int]]:
    """Deterministic multi-term term-id queries, 1-5 terms, duplicates
    allowed (mirrors the reference's 500-query log shape,
    /root/reference/include/ds2i/queries.hpp:15-27)."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(num):
        k = int(rng.integers(1, 6))
        out.append([int(t) for t in rng.integers(0, vocab, size=k)])
    return out


QUERY_LOG = _gen_query_log()


def _query_triples() -> list[tuple[int, int, int]]:
    """(query_id, term_id, qf) rows, distinct per (query, term)."""
    rows = []
    for qid, terms in enumerate(QUERY_LOG):
        for term, qf in query_freqs(terms):
            rows.append((qid, term, qf))
    return rows


def _qlog_values_sql() -> str:
    return ", ".join(f"({q}, {t}, {f})" for q, t, f in _query_triples())


# --------------------------------------------------------------------------
# shared SQL prelude: tokenize -> postings -> vocab -> sizes -> stats
# (mirrors dint_ray.tokenize / dint_ray.postings exactly)
# --------------------------------------------------------------------------

def _sql_prelude(with_queries: bool = False) -> str:
    q = f",\nqlog(query_id, term_id, qf) AS (VALUES {_qlog_values_sql()})" if with_queries else ""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
  FROM documents
),
postings AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term
),
vocab AS (
  SELECT term, count(*)::BIGINT AS df,
         (row_number() OVER (ORDER BY count(*) DESC, term ASC) - 1)::BIGINT AS term_id
  FROM postings GROUP BY term
),
tpost AS (
  SELECT v.term_id, p.doc_id, p.tf FROM postings p JOIN vocab v USING (term)
),
sizes AS (
  SELECT doc_id, count(*)::BIGINT AS len FROM toks GROUP BY doc_id
),
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n_docs,
         (SELECT sum(len) FROM sizes)::DOUBLE
           / (SELECT count(*) FROM documents) AS avg_len
){q}
"""


_BM25_CONTRIB_SQL = """
contrib AS (
  SELECT q.query_id, t.doc_id,
         CAST(FLOOR(
           q.qf
           * GREATEST(1e-6, LN((s.n_docs - v.df + 0.5) / (v.df + 0.5)))
           * 2.2
           * t.tf / (t.tf + 1.2 * (0.5 + 0.5 * (z.len / s.avg_len)))
           * 1e15 + 0.5
         ) AS BIGINT) AS cu
  FROM qlog q
  JOIN vocab v ON v.term_id = q.term_id
  JOIN tpost t ON t.term_id = q.term_id
  JOIN sizes z ON z.doc_id = t.doc_id
  CROSS JOIN stats s
),
qn AS (
  SELECT query_id, count(*)::BIGINT AS nt FROM qlog GROUP BY query_id
),
scores AS (
  SELECT query_id, doc_id, sum(cu)::BIGINT AS score_u, count(*)::BIGINT AS nhit
  FROM contrib GROUP BY query_id, doc_id
)
"""


def _sql_ranked(mode: str) -> str:
    where = "WHERE s.nhit = qn.nt" if mode == "and" else ""
    return (_sql_prelude(with_queries=True) + "," + _BM25_CONTRIB_SQL + f"""
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank,
       doc_id::BIGINT AS doc_id, score_u
FROM (
  SELECT s.query_id, s.doc_id, s.score_u,
         row_number() OVER (PARTITION BY s.query_id
                            ORDER BY s.score_u DESC, s.doc_id ASC) AS rank
  FROM scores s JOIN qn ON qn.query_id = s.query_id {where}
) WHERE rank <= {K}
""")


SQL_TOKENIZE = _sql_prelude() + """
SELECT doc_id::BIGINT AS doc_id, term, tf FROM postings
"""

SQL_DOC_SIZES = _sql_prelude() + """
SELECT doc_id::BIGINT AS doc_id, len FROM sizes
"""

SQL_VOCABULARY = _sql_prelude() + """
SELECT term, df, term_id FROM vocab
"""

SQL_POSTING_LISTS = _sql_prelude() + """
SELECT term_id, doc_id::BIGINT AS doc_id, tf FROM tpost
"""

SQL_RANKED_OR = _sql_ranked("or")
SQL_RANKED_AND = _sql_ranked("and")

# docids-only ranked view for the float32 compressed-serving entry:
# its scores are float32 (not the quantized-BIGINT conformance unit),
# so the oracle checks the ranked (query, rank, doc) triples
SQL_RANKED_OR_DOCS = (_sql_prelude(with_queries=True) + "," +
                      _BM25_CONTRIB_SQL + f"""
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank,
       doc_id::BIGINT AS doc_id
FROM (
  SELECT s.query_id, s.doc_id,
         row_number() OVER (PARTITION BY s.query_id
                            ORDER BY s.score_u DESC, s.doc_id ASC) AS rank
  FROM scores s JOIN qn ON qn.query_id = s.query_id
) WHERE rank <= {K}
""")

# same docids-only view for the ranked-AND compressed entry
SQL_RANKED_AND_DOCS = (_sql_prelude(with_queries=True) + "," +
                       _BM25_CONTRIB_SQL + f"""
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank,
       doc_id::BIGINT AS doc_id
FROM (
  SELECT s.query_id, s.doc_id,
         row_number() OVER (PARTITION BY s.query_id
                            ORDER BY s.score_u DESC, s.doc_id ASC) AS rank
  FROM scores s JOIN qn ON qn.query_id = s.query_id
  WHERE s.nhit = qn.nt
) WHERE rank <= {K}
""")

SQL_BOOL_COUNTS = _sql_prelude(with_queries=True) + """,
qn AS (SELECT query_id, count(*)::BIGINT AS nt FROM qlog GROUP BY query_id),
hits AS (
  SELECT q.query_id, t.doc_id, count(*)::BIGINT AS k
  FROM qlog q JOIN tpost t ON t.term_id = q.term_id
  GROUP BY q.query_id, t.doc_id
),
andc AS (
  SELECT h.query_id, count(*)::BIGINT AS n
  FROM hits h JOIN qn ON qn.query_id = h.query_id
  WHERE h.k = qn.nt GROUP BY h.query_id
),
orc AS (SELECT query_id, count(*)::BIGINT AS n FROM hits GROUP BY query_id)
SELECT q.query_id::BIGINT AS query_id,
       coalesce(a.n, 0)::BIGINT AS and_count,
       coalesce(o.n, 0)::BIGINT AS or_count
FROM qn q
LEFT JOIN andc a ON a.query_id = q.query_id
LEFT JOIN orc o ON o.query_id = q.query_id
"""

SQL_PAIRWISE_INTERSECT = _sql_prelude(with_queries=True) + """,
pairs(pair_id, term_a, term_b) AS (VALUES (0, 0, 1), (1, 2, 3), (2, 1, 4),
                                          (3, 0, 5), (4, 6, 7), (5, 2, 9))
SELECT p.pair_id::BIGINT AS pair_id, a.doc_id::BIGINT AS doc_id
FROM pairs p
JOIN tpost a ON a.term_id = p.term_a
JOIN tpost b ON b.term_id = p.term_b AND b.doc_id = a.doc_id
"""

PAIRWISE_PAIRS = [(0, 1), (2, 3), (1, 4), (0, 5), (6, 7), (2, 9)]

_STOPLIST_SQL = "['the','a','of','to','and','in','is','for']"

SQL_TEXT_STATS = f"""
SELECT doc_id::BIGINT AS doc_id,
  len(tl)::BIGINT AS n_tokens,
  len(list_distinct(tl))::BIGINT AS n_unique,
  len(list_filter(tl, t -> list_contains({_STOPLIST_SQL}, t)))::BIGINT AS stopword_count,
  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))::BIGINT AS bpe_tokens,
  coalesce(list_max(list_transform(tl, t -> len(t))), 0)::BIGINT AS max_token_len
FROM (SELECT doc_id, text, regexp_extract_all(lower(text), '{TOKEN_RE}') AS tl
      FROM documents)
"""

SQL_LANG_ID = f"""
SELECT doc_id::BIGINT AS doc_id,
  CASE WHEN len(list_intersect(
         list_distinct(regexp_extract_all(lower(text), '{TOKEN_RE}')),
         {_STOPLIST_SQL})) >= 1
       THEN 'en' ELSE 'other' END AS pred_lang
FROM documents
"""

SQL_EXACT_DEDUP = """
SELECT min(doc_id)::BIGINT AS doc_id FROM documents GROUP BY text
"""

SQL_FINGERPRINT = f"""
SELECT doc_id::BIGINT AS doc_id,
       md5(array_to_string(regexp_extract_all(lower(text), '{TOKEN_RE}'), ' '))
         AS fingerprint_md5
FROM documents
"""

# one LE u32 word = sum of 4 hex-pair bytes of the sha256 digest
SQL_MEDIA_FEATURES = """
WITH h AS (
  SELECT doc_id::BIGINT AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
         octet_length(encode(text))::BIGINT AS n_bytes,
         sha256(text) AS hx
  FROM documents
)
SELECT media_id, kind, n_bytes, {words}
FROM h
""".format(words=", ".join(
    " + ".join(f"('0x' || substr(hx, {8 * i + 2 * j + 1}, 2))::BIGINT"
               f" * {256 ** j}" for j in range(4)) + f" AS w{i}"
    for i in range(8)))

# Real-decode oracles: the media payloads are genuine PNG/WAV/DVID
# bytes synthesized from closed-form integer formulas
# (ops/multimodal.py), so DuckDB recomputes the DECODED statistics
# exactly with generate_series — verifying the whole encode->decode
# pipeline, not a hash of the bytes.
SQL_IMAGE_DECODE = """
SELECT d.doc_id::BIGINT AS media_id,
       (24 + d.doc_id % 9)::BIGINT AS width,
       (16 + d.doc_id % 7)::BIGINT AS height,
       SUM((x.x*(3+c.c) + y.y*(5+2*c.c) + d.doc_id*(7+11*c.c)) % 256
           )::BIGINT AS pix_sum
FROM documents d,
     generate_series(0, 31) x(x),
     generate_series(0, 21) y(y),
     generate_series(0, 2) c(c)
WHERE d.doc_id % 3 = 0
  AND x.x < 24 + d.doc_id % 9 AND y.y < 16 + d.doc_id % 7
GROUP BY 1, 2, 3
"""

SQL_AUDIO_DECODE = """
SELECT d.doc_id::BIGINT AS media_id,
       (1024 + d.doc_id % 512)::BIGINT AS n_samples,
       SUM(ABS(((i.i*((d.doc_id % 31)+3) + d.doc_id) % 509) - 254)
           )::BIGINT AS abs_sum,
       SUM(CASE WHEN i.i > 0 AND
             ((((i.i*((d.doc_id % 31)+3) + d.doc_id) % 509) - 254 >= 0) !=
              ((((i.i-1)*((d.doc_id % 31)+3) + d.doc_id) % 509) - 254 >= 0))
           THEN 1 ELSE 0 END)::BIGINT AS zero_cross
FROM documents d, generate_series(0, 1535) i(i)
WHERE d.doc_id % 3 = 1 AND i.i < 1024 + d.doc_id % 512
GROUP BY 1, 2
"""

SQL_VIDEO_DECODE = """
WITH v AS (
  SELECT doc_id::BIGINT AS media_id, (3 + doc_id % 4)::BIGINT AS nf,
         (24 + doc_id % 9)::BIGINT AS w, (16 + doc_id % 7)::BIGINT AS h
  FROM documents WHERE doc_id % 3 = 2
),
s AS (
  SELECT media_id, nf, w, h,
         unnest(list_distinct([0, nf // 2, nf - 1])) AS f
  FROM v
),
px AS (
  SELECT s.media_id, s.nf, s.f,
         SUM((x.x*(3+c.c) + y.y*(5+2*c.c)
              + (s.media_id*1000 + s.f)*(7+11*c.c)) % 256) AS fsum
  FROM s,
       generate_series(0, 31) x(x),
       generate_series(0, 21) y(y),
       generate_series(0, 2) c(c)
  WHERE x.x < s.w AND y.y < s.h
  GROUP BY s.media_id, s.nf, s.f
)
SELECT media_id, nf AS n_frames, COUNT(*)::BIGINT AS n_sampled,
       SUM(fsum)::BIGINT AS pix_sum
FROM px
GROUP BY media_id, nf
"""

# n-gram Jaccard pair CTEs, shared by the pair entry and the
# components/keep entries built on top of the same pair set
_NGRAM_PAIR_CTES = f"""toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS tl FROM documents
),
sh AS (
  SELECT doc_id, unnest(list_transform(range(1, greatest(len(tl) - {JACCARD_K - 1}, 0) + 1),
         i -> tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2])) AS s
  FROM toks
),
shd AS (SELECT DISTINCT doc_id, s FROM sh),
card AS (SELECT doc_id, count(*)::BIGINT AS c FROM shd GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*)::BIGINT AS i
  FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
njpairs AS (
  SELECT da::BIGINT AS doc_a, db::BIGINT AS doc_b
  FROM inter
  JOIN card ca ON ca.doc_id = da
  JOIN card cb ON cb.doc_id = db
  WHERE i::DOUBLE / (ca.c + cb.c - i) >= {JACCARD_THRESHOLD}
)"""

SQL_NGRAM_JACCARD = f"""
WITH {_NGRAM_PAIR_CTES}
SELECT doc_a, doc_b FROM njpairs
"""

# transitive closure of the undirected pair graph (set-semantics
# recursive CTE terminates on cycles); component = min reachable id —
# the oracle for the distributed min-label-propagation in
# ops/components.py
_COMPONENT_CTES = f"""{_NGRAM_PAIR_CTES},
ccedges AS (
  SELECT doc_a AS a, doc_b AS b FROM njpairs
  UNION
  SELECT doc_b, doc_a FROM njpairs
),
reach(src, dst) AS (
  SELECT a, b FROM ccedges
  UNION
  SELECT r.src, e.b FROM reach r JOIN ccedges e ON r.dst = e.a
),
cclabels AS (
  SELECT src::BIGINT AS doc_id,
         least(src, min(dst))::BIGINT AS component
  FROM reach GROUP BY src
)"""

SQL_DEDUP_COMPONENTS = f"""
WITH RECURSIVE {_COMPONENT_CTES}
SELECT doc_id, component FROM cclabels
"""

SQL_NEAR_DEDUP_KEEP = f"""
WITH RECURSIVE {_COMPONENT_CTES}
SELECT d.doc_id::BIGINT AS doc_id FROM documents d
WHERE d.doc_id NOT IN
      (SELECT doc_id FROM cclabels WHERE component < doc_id)
"""

def _mh_params_sql() -> str:
    from dint_ray.ops.dedup import _mh_params

    a, b = _mh_params(64)
    return ", ".join(f"({i}, {int(a[i])}, {int(b[i])})" for i in range(64))


# Exact SQL twin of ops/dedup.py's MinHash+LSH+verify pipeline: same
# md5-prefix shingle ids, same (a*x+b) mod 2^31-1 minhash (exact BIGINT
# arithmetic), same 16x4 band keys, same shingle-set Jaccard >= t on
# candidates.  Docs with < k tokens collapse to ONE whole-text shingle
# (the _shingles padding rule); docs with no tokens drop out entirely.
SQL_MINHASH_VERIFIED = f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS tl
  FROM documents
),
shl AS (
  SELECT doc_id,
    CASE WHEN len(tl) >= {JACCARD_K}
         THEN list_transform(range(1, len(tl) - {JACCARD_K - 1} + 1),
                             i -> tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2])
         WHEN len(tl) > 0 THEN [array_to_string(tl, ' ')]
         ELSE [] END AS sl
  FROM toks
),
shd AS (SELECT DISTINCT doc_id, unnest(sl) AS s FROM shl),
sid AS (
  SELECT doc_id,
         ('0x' || substr(md5(s), 1, 15))::BIGINT AS sid60,
         ('0x' || substr(md5(s), 1, 8))::BIGINT AS sid32
  FROM shd
),
s60 AS (SELECT DISTINCT doc_id, sid60 FROM sid),
s32 AS (SELECT DISTINCT doc_id, sid32 FROM sid),
params(i, a, b) AS (VALUES {_mh_params_sql()}),
minh AS (
  SELECT s.doc_id, p.i, min((p.a * s.sid32 + p.b) % 2147483647) AS h
  FROM s32 s CROSS JOIN params p GROUP BY s.doc_id, p.i
),
bandkey AS (
  SELECT doc_id, i // 4 AS band,
         string_agg(h::VARCHAR, '_' ORDER BY i) AS bk
  FROM minh GROUP BY doc_id, i // 4
),
cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM bandkey a JOIN bandkey b
    ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id
),
card AS (SELECT doc_id, count(*)::BIGINT AS c FROM s60 GROUP BY doc_id),
inter AS (
  SELECT c.da, c.db, count(*)::BIGINT AS i
  FROM cand c
  JOIN s60 x ON x.doc_id = c.da
  JOIN s60 y ON y.doc_id = c.db AND y.sid60 = x.sid60
  GROUP BY c.da, c.db
)
SELECT c.da::BIGINT AS doc_a, c.db::BIGINT AS doc_b
FROM cand c
JOIN card ca ON ca.doc_id = c.da
JOIN card cb ON cb.doc_id = c.db
LEFT JOIN inter i ON i.da = c.da AND i.db = c.db
WHERE coalesce(i.i, 0)::DOUBLE
      / (ca.c + cb.c - coalesce(i.i, 0)) >= {JACCARD_THRESHOLD}
"""


_KNN_IDS_SQL = ", ".join(str(i) for i in KNN_QUERY_IDS)

SQL_KNN_COSINE = f"""
WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id IN ({_KNN_IDS_SQL})),
s AS (
  SELECT q.vec_id AS query_id, e.vec_id AS vid,
         list_cosine_similarity(q.embedding, e.embedding) AS sim
  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.vec_id
),
r AS (
  SELECT query_id, vid,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vid ASC) AS rnk
  FROM s
)
SELECT query_id::BIGINT AS query_id, vid::BIGINT AS vec_id FROM r WHERE rnk <= {KNN_K}
"""

SQL_EMBEDDING_DUPS = f"""
SELECT a.vec_id::BIGINT AS vec_a, b.vec_id::BIGINT AS vec_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= {EMB_DUP_THRESHOLD}
"""


# --------------------------------------------------------------------------
# index build cache (checkpointed under /tmp, keyed by code fingerprint)
# --------------------------------------------------------------------------

def _code_sig() -> str:
    h = hashlib.sha1()
    root = pathlib.Path(os.path.dirname(dint_ray.__file__))
    for p in sorted(root.rglob("*.py")):
        h.update(p.read_bytes())
    return h.hexdigest()[:10]


_SIG = None


def _data_sig(sf_dir: str) -> str:
    """Cheap input fingerprint (file size + mtime of documents.parquet)
    so a regenerated-in-place fixture never hits a stale cached index."""
    p = os.path.join(sf_dir, "documents.parquet")
    try:
        st_ = os.stat(p)
        return f"{st_.st_size}_{int(st_.st_mtime)}"
    except OSError:
        return "nodata"


def index_dir_for(sf_dir: str, kind: str) -> str:
    global _SIG
    if _SIG is None:
        _SIG = _code_sig()
    tag = os.path.abspath(sf_dir).strip("/").replace("/", "_")
    return f"/tmp/dint_ray_entry/{_SIG}/{tag}_{_data_sig(sf_dir)}/{kind}"


# kind-independent build checkpoints, shared across the 16 index kinds
# the roundtrip entries build over the SAME corpus: tokenize/vocab/
# postings/sizes depend only on the input, and the pattern-stats
# checkpoint only on the single/multi dictionary family — re-deriving
# them 16x was most of the driver-visible cold-start wall.
_SHARED_FILES = ("vocab.parquet", "vocab_meta.json", "sizes.parquet")
_SHARED_DIRS = ("postings",)


def _stats_family(kind: str) -> str | None:
    """Stats-checkpoint sharing family, or None for block/sequence kinds
    (which mine no dictionary stats).  collect_stats_batch branches
    only on kind == 'multi_packed', but winner SELECTION depends on the
    dictionary capacity too, so the 256-entry single_packed8 gets its
    own family."""
    if kind.startswith("block_") or kind in ("ef", "pef_opt", "pef_uniform"):
        return None
    if kind == "single_packed8":
        return "single8"
    return "multi" if kind == "multi_packed" else "single"


def _shared_ckpt_dir(sf_dir: str) -> str:
    return os.path.join(os.path.dirname(index_dir_for(sf_dir, "x")),
                        "_shared")


def _seed_shared(sf_dir: str, out: str, kind: str,
                 files_only: bool = False) -> None:
    """Symlink already-published kind-independent checkpoints into a
    fresh kind directory so build_index_ray resumes past them.
    ``files_only`` seeds just vocab/sizes — for the serve_direct path,
    whose stats are mined from SEGMENT gap streams (not shareable with
    whole-list stats) and which has no postings/ checkpoint."""
    shared = _shared_ckpt_dir(sf_dir)
    fam = None if files_only else _stats_family(kind)
    pairs = [(n, n) for n in
             (_SHARED_FILES if files_only else _SHARED_FILES + _SHARED_DIRS)]
    if fam:
        pairs += [(f"stats_{s}.{fam}.parquet", f"stats_{s}.parquet")
                  for s in ("docs", "freqs")]
    for sname, dname in pairs:
        src, dst = os.path.join(shared, sname), os.path.join(out, dname)
        if not os.path.exists(src) or os.path.lexists(dst):
            continue
        if dname in _SHARED_DIRS and not os.path.exists(
                os.path.join(src, "_SUCCESS")):
            continue
        try:
            os.symlink(src, dst)
        except OSError:
            pass  # concurrent seeder; the build re-derives regardless


def _publish_shared(sf_dir: str, out: str, kind: str,
                    files_only: bool = False) -> None:
    """Hardlink this build's kind-independent checkpoints into the
    shared directory (atomic per artifact; races are benign — builds
    only ever write checkpoint files via tmp+rename, never in place)."""
    shared = _shared_ckpt_dir(sf_dir)
    os.makedirs(shared, exist_ok=True)
    fam = None if files_only else _stats_family(kind)
    pairs = [(n, n) for n in _SHARED_FILES]
    if fam:
        pairs += [(f"stats_{s}.parquet", f"stats_{s}.{fam}.parquet")
                  for s in ("docs", "freqs")]
    for sname, dname in pairs:
        src, dst = os.path.join(out, sname), os.path.join(shared, dname)
        if not os.path.exists(src) or os.path.exists(dst):
            continue
        tmp = dst + f".tmp{os.getpid()}"
        try:
            os.link(os.path.realpath(src), tmp)
            os.rename(tmp, dst)
        except OSError:
            if os.path.exists(tmp):
                os.unlink(tmp)
    for name in () if files_only else _SHARED_DIRS:
        src, dst = os.path.join(out, name), os.path.join(shared, name)
        if (not os.path.isdir(src) or os.path.islink(src)
                or os.path.exists(dst)
                or not os.path.exists(os.path.join(src, "_SUCCESS"))):
            continue
        tmpd = dst + f".tmp{os.getpid()}"
        try:
            os.makedirs(tmpd)
            for fn in os.listdir(src):
                os.link(os.path.join(src, fn), os.path.join(tmpd, fn))
            os.rename(tmpd, dst)
        except OSError:
            import shutil

            shutil.rmtree(tmpd, ignore_errors=True)


def ensure_index(sf_dir: str, kind: str = "single_packed",
                 num_shards: int = 4) -> str:
    """Build (or resume) the index for sf_dir/documents.parquet,
    sharing kind-independent checkpoints across sibling kinds."""
    from dint_ray.pipelines.build import build_index_ray

    out = index_dir_for(sf_dir, kind)
    os.makedirs(out, exist_ok=True)
    _seed_shared(sf_dir, out, kind)
    build_index_ray(os.path.join(sf_dir, "documents.parquet"), out, kind=kind,
                    num_shards=num_shards)
    _publish_shared(sf_dir, out, kind)
    return out


# --------------------------------------------------------------------------
# Ray-side entries
# --------------------------------------------------------------------------

def _docs_ds(sf_dir: str, columns=("doc_id", "text")):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=list(columns))


def _emb_ds(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _cast_cols(types: dict[str, pa.DataType]):
    def cast(batch: pa.Table) -> pa.Table:
        cols = {name: batch.column(name).cast(t) for name, t in types.items()}
        return pa.table(cols)

    return cast


def q_tokenize(sf_dir: str):
    """Distributed tokenize -> (doc_id, term, tf) rows (SURVEY.md M-row
    'upstream implied'; actor-pool Tokenizer)."""
    from dint_ray.postings import tokenize_rows

    rows = tokenize_rows(_docs_ds(sf_dir))
    return rows.map_batches(
        _cast_cols({"doc_id": pa.int64(), "term": pa.string(), "tf": pa.int64()}),
        batch_format="pyarrow")


def q_doc_sizes(sf_dir: str):
    """groupby(doc_id).sum(tf) — the `.sizes` equivalent (SURVEY.md S4)."""
    from dint_ray.postings import doc_sizes, tokenize_rows

    sz = doc_sizes(tokenize_rows(_docs_ds(sf_dir)))
    return sz.map_batches(_cast_cols({"doc_id": pa.int64(), "len": pa.int64()}),
                          batch_format="pyarrow")


def q_vocabulary(sf_dir: str):
    """Distributed df-count shuffle -> deterministic dense term ids
    (SURVEY.md §7.3 vocabulary key: rank by (df desc, term asc))."""
    from dint_ray.postings import build_vocabulary, tokenize_rows

    vocab = build_vocabulary(tokenize_rows(_docs_ds(sf_dir)))
    t = vocab.terms
    return pa.table({
        "term": pa.array(t["term"], pa.string()),
        "df": pa.array(t["df"].to_numpy().astype(np.int64), pa.int64()),
        "term_id": pa.array(t["term_id"].to_numpy().astype(np.int64), pa.int64()),
    })


def q_vocabulary_ds(sf_dir: str):
    """The >threshold vocabulary path FORCED ON: the term table stays a
    Dataset (distributed rank by (df desc, term asc)); must be
    value-identical to the driver vocabulary (same oracle SQL)."""
    from dint_ray.postings import build_vocabulary_ds, tokenize_rows

    vds = build_vocabulary_ds(tokenize_rows(_docs_ds(sf_dir)))
    return vds.map_batches(
        _cast_cols({"term": pa.string(), "df": pa.int64(),
                    "term_id": pa.int64()}),
        batch_format="pyarrow")


def _explode_lists(batch: pa.Table) -> pa.Table:
    tids, docs, tfs = [], [], []
    tcol = batch.column("term_id")
    dcol = batch.column("docs")
    fcol = batch.column("freqs")
    for i in range(len(tcol)):
        d = np.asarray(dcol[i].as_py(), dtype=np.int64)
        f = np.asarray(fcol[i].as_py(), dtype=np.int64)
        tids.append(np.full(len(d), int(tcol[i].as_py()), dtype=np.int64))
        docs.append(d)
        tfs.append(f)
    e = np.empty(0, dtype=np.int64)
    return pa.table({
        "term_id": pa.array(np.concatenate(tids) if tids else e, pa.int64()),
        "doc_id": pa.array(np.concatenate(docs) if docs else e, pa.int64()),
        "tf": pa.array(np.concatenate(tfs) if tfs else e, pa.int64()),
    })


def q_posting_lists(sf_dir: str):
    """Full posting-list construction (salted groupby shuffle,
    SURVEY.md §7.3) flattened back to (term_id, doc_id, tf) rows."""
    from dint_ray.postings import build_posting_lists, build_vocabulary, tokenize_rows

    from dint_ray.config import BuildConfig

    rows = tokenize_rows(_docs_ds(sf_dir))
    vocab = build_vocabulary(rows)
    # low salt threshold + forced salted strategy so that path is
    # exercised (and oracle-checked) at sf scale; index_roundtrip_*
    # entries cover the default single-exchange merge
    cfg = BuildConfig(salt_df_threshold=64, salt_bucket_docs=128,
                      merge_strategy="salted")
    lists = build_posting_lists(rows, vocab, cfg)
    return lists.map_batches(_explode_lists, batch_format="pyarrow")


def q_posting_lists_joined(sf_dir: str):
    """Posting lists via the vocabulary-as-Dataset hash join FORCED ON
    (no driver id map, one keyed exchange fused with the merge) —
    flattened to rows; same oracle as posting_lists."""
    from dint_ray.postings import (build_posting_lists_joined,
                                   build_vocabulary_ds, tokenize_rows)

    rows = tokenize_rows(_docs_ds(sf_dir)).materialize()
    lists = build_posting_lists_joined(rows, build_vocabulary_ds(rows))
    return lists.map_batches(_explode_lists, batch_format="pyarrow")


class _DecodeShard:
    """Actor: DINT-decode every posting list of a shard back to rows.

    The dictionaries load once per actor (ST2 in SURVEY.md §2.3)."""

    def __init__(self, index_dir: str) -> None:
        import json

        from dint_ray.index.build import load_codec_bundle

        with open(os.path.join(index_dir, "manifest.json")) as f:
            kind = json.load(f)["dict_kind"]
        self.docs_codec, self.freqs_codec = \
            load_codec_bundle(index_dir, kind).codecs()

    def __call__(self, batch: pa.Table) -> pa.Table:
        from dint_ray.index.layout import PostingListView

        tids, docs, tfs = [], [], []
        tcol = batch.column("term_id").to_numpy()
        pcol = batch.column("payload").to_pylist()
        for tid, payload in zip(tcol, pcol):
            v = PostingListView(payload, self.docs_codec, self.freqs_codec)
            d, f = v.decode_all()
            tids.append(np.full(len(d), int(tid), dtype=np.int64))
            docs.append(d.astype(np.int64))
            tfs.append(f.astype(np.int64))
        e = np.empty(0, dtype=np.int64)
        return pa.table({
            "term_id": pa.array(np.concatenate(tids) if tids else e, pa.int64()),
            "doc_id": pa.array(np.concatenate(docs) if docs else e, pa.int64()),
            "tf": pa.array(np.concatenate(tfs) if tfs else e, pa.int64()),
        })


def q_index_roundtrip(sf_dir: str, kind: str = "single_packed"):
    """End-to-end conformance: distributed build -> DINT-encoded shards
    -> distributed decode -> must equal the tokenize-derived postings
    (the reference's --check / verify_collection replay,
    /root/reference/include/ds2i/verify_collection.hpp:7-53)."""
    import ray.data as rd

    idir = ensure_index(sf_dir, kind)
    import glob

    from dint_ray.index.shards import shard_files as _sf

    shard_files = _sf(idir)
    shards = rd.read_parquet(shard_files, columns=["term_id", "payload"])
    return shards.map_batches(
        _DecodeShard, fn_constructor_kwargs={"index_dir": idir},
        batch_format="pyarrow", batch_size=64, concurrency=(1, 4), num_cpus=1)


def q_index_roundtrip_blob(sf_dir: str):
    """Blob-export conformance: parquet shards -> single-blob shard
    images with Elias-Fano term-id/endpoint directories (the
    reference's frozen-image layout, dict_freq_index.hpp:96-100) ->
    decode every payload back out of the mmap views -> must equal the
    tokenize-derived postings (same replay oracle as the parquet
    roundtrip)."""
    import glob

    import ray
    import ray.data as rd

    idir = ensure_index(sf_dir, "single_packed")
    blob_dir = os.path.join(idir, "blobs")
    if not glob.glob(os.path.join(blob_dir, "*.blob")):
        from dint_ray.index.blob import export_shards_to_blobs

        export_shards_to_blobs(idir)

    @ray.remote(num_cpus=1)
    def _rows(path: str) -> pa.Table:
        from dint_ray.index.blob import BlobView

        v = BlobView(path)
        return pa.table({
            "term_id": pa.array(v.term_ids.astype(np.uint32), pa.uint32()),
            "payload": pa.array([bytes(v.payload(i)) for i in range(len(v))],
                                pa.binary()),
        })

    files = sorted(glob.glob(os.path.join(blob_dir, "*.blob")))
    shards = rd.from_arrow_refs([_rows.remote(f) for f in files])
    return shards.map_batches(
        _DecodeShard, fn_constructor_kwargs={"index_dir": idir},
        batch_format="pyarrow", batch_size=64, concurrency=(1, 4), num_cpus=1)


def q_index_transform_mixed(sf_dir: str):
    """mixed_block the way the reference creates it: transform an
    existing index (mixed_block.hpp:153-196 block_transformer), with
    per-term access counts from the block profiler weighting the
    decode-time side of each block's codec choice.  The oracle is the
    same postings replay — the transform must be lossless."""
    import ray.data as rd

    from dint_ray.pipelines.partitioned import (collect_block_profile,
                                                partition_actors,
                                                run_queries_routed)
    from dint_ray.pipelines.transform import transform_index_mixed

    src = ensure_index(sf_dir, "single_packed")
    out = src.rstrip("/") + "_mixed"
    if not os.path.exists(os.path.join(out, "manifest.json")):
        partition_actors(src, 4)
        run_queries_routed(_query_ds(QUERY_LOG), src, algo="ranked_or",
                           k=K, num_buckets=4).count()
        profile = collect_block_profile(src, 4)
        transform_index_mixed(src, out, space_budget_ratio=1.2,
                              profile=profile, num_shards=4)
    from dint_ray.index.shards import shard_files as _sf

    shards = rd.read_parquet(_sf(out), columns=["term_id", "payload"])
    return shards.map_batches(
        _DecodeShard, fn_constructor_kwargs={"index_dir": out},
        batch_format="pyarrow", batch_size=64, concurrency=(1, 4), num_cpus=1)


class _ConformanceScorer:
    """Actor: quantized-BM25 top-k per query over the compressed index.

    Decodes postings from the DINT payloads (exercising the full decode
    path), computes double-precision contributions in the exact
    operation order of the SQL oracle, quantizes to BIGINT and sums
    exactly.  For mode 'wand'/'maxscore' the float64 algorithm also
    runs (pruned execution path) and its result is cross-checked."""

    def __init__(self, index_dir: str, mode: str, k: int = K) -> None:
        from dint_ray.pipelines.build import load_built_index

        assert mode in ("ranked_or", "ranked_and", "wand", "maxscore",
                        "block_max_wand", "counts", "intersect")
        self.index, self.wand, self.manifest = load_built_index(index_dir)
        self.mode = mode
        self.k = k
        self.N = np.float64(self.manifest["num_docs"])
        sizes = np.asarray(self.wand.sizes, dtype=np.float64)
        self.lens = sizes
        self.avg = np.float64(sizes.sum() / self.manifest["num_docs"])

    def _contribs(self, terms):
        """{(doc): (score_u, nhit)} accumulated over present query terms.

        ``ndistinct`` counts ALL distinct query terms (present or not),
        matching the SQL oracle's ``qn.nt`` — a query with any
        out-of-vocabulary term has an unsatisfiable AND."""
        acc: dict[int, int] = {}
        hits: dict[int, int] = {}
        ndistinct = 0
        for term, qf in query_freqs(terms):
            ndistinct += 1
            if term not in self.index:
                continue
            docs, freqs = self.index.decode(term)
            df = np.float64(len(docs))
            g = max(np.float64(1e-6), np.log((self.N - df + 0.5) / (df + 0.5)))
            qtw = np.float64(qf) * g * 2.2
            tf = freqs.astype(np.float64)
            lens = self.lens[docs]
            c = qtw * tf / (tf + 1.2 * (0.5 + 0.5 * (lens / self.avg))) * 1e15
            cu = np.floor(c + 0.5).astype(np.int64)
            for d, v in zip(docs.astype(np.int64), cu):
                d = int(d)
                acc[d] = acc.get(d, 0) + int(v)
                hits[d] = hits.get(d, 0) + 1
        return acc, hits, ndistinct

    def _topk_rows(self, qid, terms):
        acc, hits, ndistinct = self._contribs(terms)
        if self.mode == "ranked_and":
            acc = {d: s for d, s in acc.items() if hits[d] == ndistinct}
        order = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[: self.k]
        if self.mode in ("wand", "maxscore", "block_max_wand"):
            from dint_ray.queries import algorithms as qa

            algo = getattr(qa, self.mode)
            got = algo(self.index, self.wand, terms, self.k, dtype=np.float64)
            want = {d for d, _ in order}
            have = {d for d, _ in got}
            if want != have:  # pragma: no cover - float64-vs-quantized tie
                import logging

                logging.getLogger(__name__).warning(
                    "%s top-k set differs from quantized oracle for %s",
                    self.mode, terms)
        return [(qid, r + 1, d, s) for r, (d, s) in enumerate(order)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch.column("query_id").to_numpy()
        terms_col = batch.column("terms")
        if self.mode == "counts":
            from dint_ray.queries import algorithms as qa

            a_out, o_out = [], []
            for i in range(len(qids)):
                terms = [int(t) for t in terms_col[i].as_py()]
                a_out.append(qa.and_count(self.index, terms))
                o_out.append(qa.or_count(self.index, terms))
            return pa.table({
                "query_id": pa.array(qids.astype(np.int64), pa.int64()),
                "and_count": pa.array(a_out, pa.int64()),
                "or_count": pa.array(o_out, pa.int64()),
            })
        if self.mode == "intersect":
            from dint_ray.queries import algorithms as qa

            p_out, d_out = [], []
            for i in range(len(qids)):
                terms = [int(t) for t in terms_col[i].as_py()]
                for d in qa.and_docs(self.index, terms):
                    p_out.append(int(qids[i]))
                    d_out.append(int(d))
            return pa.table({
                "pair_id": pa.array(p_out, pa.int64()),
                "doc_id": pa.array(d_out, pa.int64()),
            })
        rows = []
        for i in range(len(qids)):
            terms = [int(t) for t in terms_col[i].as_py()]
            rows.extend(self._topk_rows(int(qids[i]), terms))
        return pa.table({
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "rank": pa.array([r[1] for r in rows], pa.int64()),
            "doc_id": pa.array([r[2] for r in rows], pa.int64()),
            "score_u": pa.array([r[3] for r in rows], pa.int64()),
        })


def _query_ds(queries: list[list[int]]):
    import ray.data as rd

    return rd.from_items([{"query_id": i, "terms": q}
                          for i, q in enumerate(queries)])


def _run_conformance(sf_dir: str, mode: str, queries=None):
    idir = ensure_index(sf_dir, "single_packed")
    qds = _query_ds(QUERY_LOG if queries is None else queries)
    return qds.map_batches(
        _ConformanceScorer,
        fn_constructor_kwargs={"index_dir": idir, "mode": mode},
        batch_format="pyarrow", batch_size=16, concurrency=(1, 4), num_cpus=1)


def q_ranked_or(sf_dir: str):
    return _run_conformance(sf_dir, "ranked_or")


def q_ranked_and(sf_dir: str):
    return _run_conformance(sf_dir, "ranked_and")


def q_wand(sf_dir: str):
    return _run_conformance(sf_dir, "wand")


def q_maxscore(sf_dir: str):
    return _run_conformance(sf_dir, "maxscore")


def q_block_max_wand(sf_dir: str):
    return _run_conformance(sf_dir, "block_max_wand")


def _run_routed(sf_dir: str, algo: str, mode: str, num_buckets: int = 4):
    """Routed doc-partitioned conformance serving: every bucket owner
    scores its own slice (quantized-BIGINT math, global df/N/avg), the
    router merges per-bucket top-k exactly — no whole-index actor
    anywhere (SURVEY.md §2.6 J3; pipelines/partitioned.py)."""
    from dint_ray.pipelines.partitioned import run_queries_routed

    idir = ensure_index(sf_dir, "single_packed")
    qds = _query_ds(QUERY_LOG)
    return run_queries_routed(qds, idir, algo=algo, k=K,
                              num_buckets=num_buckets, quantized=True,
                              mode=mode)


def q_wand_routed(sf_dir: str):
    return _run_routed(sf_dir, "wand", "ranked_or")


def q_wand_routed_compressed(sf_dir: str):
    """float32 WAND over RAW DINT payloads in the bucket owners (lazy
    per-block C decode, native.wand_compressed_query) — the
    fixed-memory-node serving configuration.  Scores are float32, so
    the oracle checks the ranked doc triples; score equality with the
    decoded path is asserted bit-exactly in tests."""
    import ray.data as rd

    from dint_ray import native as nat
    from dint_ray.pipelines.partitioned import run_queries_routed

    idir = ensure_index(sf_dir, "single_packed")
    qds = _query_ds(QUERY_LOG)
    storage = "compressed" if nat.available() else "decoded"
    out = run_queries_routed(qds, idir, algo="wand", k=K, num_buckets=4,
                             storage=storage)
    def strip(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "query_id": b.column("query_id").cast(pa.int64()),
            # the float routed path ranks from 0; the oracle (and the
            # quantized entries) rank from 1
            "rank": pc.add(b.column("rank").cast(pa.int64()), 1),
            "doc_id": b.column("doc_id").cast(pa.int64()),
        })

    return out.map_batches(strip, batch_format="pyarrow")


def q_wand_routed_direct(sf_dir: str):
    """Routed WAND over a serve layout built by the DIRECT path
    (pipelines/partitioned.build_serve_direct): pages -> (bucket, term)
    segments -> dictionaries mined from segment gaps -> per-bucket
    encode, with no whole posting list materialized in any task — the
    100-TB build route.  Rank-identity with the classic whole-list
    index is what the oracle checks (same SQL ranked-OR triples)."""
    from dint_ray.pipelines.partitioned import (build_serve_direct,
                                                run_queries_routed)

    idir = index_dir_for(sf_dir, "serve_direct")
    os.makedirs(idir, exist_ok=True)
    # vocab/sizes derive identically to the classic build — share them;
    # stats stay per-path (segment gaps differ from whole-list gaps)
    _seed_shared(sf_dir, idir, "serve_direct", files_only=True)
    build_serve_direct(os.path.join(sf_dir, "documents.parquet"), idir,
                       kind="single_packed", num_buckets=4)
    _publish_shared(sf_dir, idir, "serve_direct", files_only=True)
    qds = _query_ds(QUERY_LOG)
    out = run_queries_routed(qds, idir, algo="wand", k=K, num_buckets=4)

    def strip(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "query_id": b.column("query_id").cast(pa.int64()),
            "rank": pc.add(b.column("rank").cast(pa.int64()), 1),
            "doc_id": b.column("doc_id").cast(pa.int64()),
        })

    return out.map_batches(strip, batch_format="pyarrow")


def q_maxscore_routed(sf_dir: str):
    return _run_routed(sf_dir, "maxscore", "ranked_or")


def q_maxscore_routed_compressed(sf_dir: str):
    """MaxScore over RAW DINT payloads in the bucket owners (lazy
    per-block C decode, native.maxscore_compressed_query) — extends the
    compressed fixed-memory serving configuration beyond WAND
    (VERDICT r3; reference serves every query op over every index
    type, src/queries.cpp:87-111).  Bit-identity with decoded owners is
    asserted in tests; the oracle checks the ranked doc triples."""
    from dint_ray import native as nat
    from dint_ray.pipelines.partitioned import run_queries_routed

    idir = ensure_index(sf_dir, "single_packed")
    qds = _query_ds(QUERY_LOG)
    storage = "compressed" if nat.available() else "decoded"
    out = run_queries_routed(qds, idir, algo="maxscore", k=K,
                             num_buckets=4, storage=storage)

    def strip(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "query_id": b.column("query_id").cast(pa.int64()),
            "rank": pc.add(b.column("rank").cast(pa.int64()), 1),
            "doc_id": b.column("doc_id").cast(pa.int64()),
        })

    return out.map_batches(strip, batch_format="pyarrow")


def q_ranked_and_routed(sf_dir: str):
    return _run_routed(sf_dir, "ranked_and", "ranked_and")


def q_ranked_or_routed(sf_dir: str):
    return _run_routed(sf_dir, "ranked_or", "ranked_or")


def q_block_max_wand_routed(sf_dir: str):
    """block-max WAND over decoded bucket owners, rank-identity-checked
    in-owner against the quantized exhaustive ranked-OR (chk protocol,
    same as the wand/maxscore routed entries)."""
    return _run_routed(sf_dir, "block_max_wand", "ranked_or")


def _run_routed_compressed_float(sf_dir: str, algo: str):
    """float32 routed serving over compressed owners for the
    transient-decode algos (ranked_and / ranked_or / block_max_wand):
    the owner decodes only the query's lists (_QueryLocalIndex) and
    reuses the decoded algorithm code — full query-op surface on the
    fixed-memory configuration (reference serves every op over every
    index type, src/queries.cpp:87-111).  Scores are float32, so the
    oracle checks the ranked doc triples; bit-identity with decoded
    owners is asserted in tests."""
    from dint_ray import native as nat
    from dint_ray.pipelines.partitioned import run_queries_routed

    idir = ensure_index(sf_dir, "single_packed")
    qds = _query_ds(QUERY_LOG)
    storage = "compressed" if nat.available() else "decoded"
    out = run_queries_routed(qds, idir, algo=algo, k=K, num_buckets=4,
                             storage=storage)

    def strip(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "query_id": b.column("query_id").cast(pa.int64()),
            "rank": pc.add(b.column("rank").cast(pa.int64()), 1),
            "doc_id": b.column("doc_id").cast(pa.int64()),
        })

    return out.map_batches(strip, batch_format="pyarrow")


def q_ranked_and_routed_compressed(sf_dir: str):
    return _run_routed_compressed_float(sf_dir, "ranked_and")


def q_ranked_or_routed_compressed(sf_dir: str):
    return _run_routed_compressed_float(sf_dir, "ranked_or")


def q_block_max_wand_routed_compressed(sf_dir: str):
    return _run_routed_compressed_float(sf_dir, "block_max_wand")


SQL_BLOCK_PROFILE = _sql_prelude(with_queries=True) + """,
nd AS (SELECT count(*)::BIGINT AS n FROM documents),
w AS (SELECT ((n + 3) // 4)::BIGINT AS width FROM nd),
tb AS (
  SELECT t.term_id, count(DISTINCT t.doc_id // w.width)::BIGINT AS nb
  FROM tpost t CROSS JOIN w GROUP BY t.term_id
),
qt AS (SELECT DISTINCT query_id, term_id FROM qlog),
qc AS (SELECT term_id, count(*)::BIGINT AS nq FROM qt GROUP BY term_id)
SELECT qc.term_id::BIGINT AS term_id, (qc.nq * tb.nb)::BIGINT AS touches
FROM qc JOIN tb ON tb.term_id = qc.term_id
"""


def q_block_profile(sf_dir: str):
    """block_profiler equivalent: per-term access counters kept inside
    every bucket owner during serving, merged at collect time
    (/root/reference/include/ds2i/block_profiler.hpp:9-63).  A term is
    touched once per query per bucket that holds any of its postings —
    exactly what the SQL oracle counts."""
    from dint_ray.pipelines.partitioned import (collect_block_profile,
                                                partition_actors,
                                                reset_block_profile,
                                                run_queries_routed)

    idir = ensure_index(sf_dir, "single_packed")
    partition_actors(idir, 4)
    reset_block_profile(idir, 4)
    run_queries_routed(_query_ds(QUERY_LOG), idir, algo="ranked_or", k=K,
                       num_buckets=4).count()
    prof = collect_block_profile(idir, 4)
    items = sorted(prof.items())
    return pa.table({
        "term_id": pa.array([t for t, _ in items], pa.int64()),
        "touches": pa.array([c for _, c in items], pa.int64()),
    })


def q_bool_counts(sf_dir: str):
    return _run_conformance(sf_dir, "counts")


def q_pairwise_intersect(sf_dir: str):
    """2-term leapfrog intersections emitting matched docIDs
    (/root/reference/src/pair_wise_intersect.cpp:28-59)."""
    return _run_conformance(sf_dir, "intersect",
                            queries=[list(p) for p in PAIRWISE_PAIRS])


# --- training-data ops ----------------------------------------------------

def q_text_stats(sf_dir: str):
    from dint_ray.ops.textstats import text_stats_ds

    return text_stats_ds(_docs_ds(sf_dir))


def q_lang_id(sf_dir: str):
    from dint_ray.ops.textstats import lang_id_ds

    return lang_id_ds(_docs_ds(sf_dir))


def q_fingerprint(sf_dir: str):
    from dint_ray.ops.textstats import fingerprint_ds

    ds = fingerprint_ds(_docs_ds(sf_dir))
    # the md5 column is what the SQL oracle reproduces exactly; the
    # crc32 column stays the in-pipeline dedup key
    return ds.select_columns(["doc_id", "fingerprint_md5"])


def q_exact_dedup(sf_dir: str):
    from dint_ray.ops.dedup import exact_dedup_ds

    ds = exact_dedup_ds(_docs_ds(sf_dir))
    return ds.map_batches(_cast_cols({"doc_id": pa.int64()}),
                          batch_format="pyarrow")


def q_ngram_jaccard(sf_dir: str):
    from dint_ray.ops.dedup import ngram_jaccard_pairs_ds

    return ngram_jaccard_pairs_ds(_docs_ds(sf_dir), k=JACCARD_K,
                                  threshold=JACCARD_THRESHOLD)


def _ngram_pairs(sf_dir: str):
    from dint_ray.ops.dedup import ngram_jaccard_pairs_ds

    return ngram_jaccard_pairs_ds(_docs_ds(sf_dir), k=JACCARD_K,
                                  threshold=JACCARD_THRESHOLD)


def q_dedup_components(sf_dir: str):
    """Connected components of the n-gram-Jaccard pair graph —
    component = min reachable doc_id (delta min-label propagation over
    resident hash partitions, ops/components.py)."""
    from dint_ray.ops.components import connected_components_ds

    return connected_components_ds(_ngram_pairs(sf_dir))


def q_near_dedup_keep(sf_dir: str):
    """Canonical-keep dedup over near-dup components: every unpaired
    doc plus the min doc_id of each component."""
    from dint_ray.ops.components import near_dedup_keep_ds

    return near_dedup_keep_ds(_docs_ds(sf_dir), _ngram_pairs(sf_dir))


def q_minhash_pairs(sf_dir: str):
    """MinHash+LSH near-dup pairs, exact-Jaccard verified via
    distributed joins (no corpus broadcast).  The full pipeline —
    md5-prefix shingle ids, (a*x+b) mod 2^31-1 minhash, band-tuple
    candidate keys, shingle-set Jaccard — is deterministic and
    reproduced term-for-term by SQL_MINHASH_VERIFIED."""
    from dint_ray.ops.dedup import minhash_dedup_pairs_ds

    ds = minhash_dedup_pairs_ds(_docs_ds(sf_dir), threshold=JACCARD_THRESHOLD)
    return ds.map_batches(_cast_cols({"doc_a": pa.int64(), "doc_b": pa.int64()}),
                          batch_format="pyarrow")


def q_simhash_pairs(sf_dir: str):
    from dint_ray.ops.dedup import simhash_pairs_ds

    ds = simhash_pairs_ds(_docs_ds(sf_dir), max_hamming=8)
    return ds.map_batches(
        _cast_cols({"doc_a": pa.int64(), "doc_b": pa.int64(),
                    "hamming": pa.int64()}), batch_format="pyarrow")


def q_knn_cosine(sf_dir: str):
    from dint_ray.ops.simsearch import knn_cosine_ds

    ds = knn_cosine_ds(_emb_ds(sf_dir), KNN_QUERY_IDS, k=KNN_K)
    return ds.map_batches(
        _cast_cols({"query_id": pa.int64(), "vec_id": pa.int64()}),
        batch_format="pyarrow")


def q_lsh_knn(sf_dir: str):
    from dint_ray.ops.simsearch import lsh_knn_ds

    return lsh_knn_ds(_emb_ds(sf_dir), KNN_QUERY_IDS, k=KNN_K)


def q_lsh_recall(sf_dir: str):
    """Measured ANN quality: recall of the LSH bucketed path against
    the exact scan, as integer percent (rows-only check — the metric
    depends on the hyperplane seed, not SQL-expressible)."""
    from dint_ray.ops.simsearch import lsh_recall

    r = lsh_recall(_emb_ds(sf_dir), KNN_QUERY_IDS, k=KNN_K)
    return pa.table({
        "k": pa.array([KNN_K], pa.int64()),
        "num_queries": pa.array([len(KNN_QUERY_IDS)], pa.int64()),
        "recall_pct": pa.array([int(round(r * 100))], pa.int64()),
    })


def q_ivf_knn(sf_dir: str):
    from dint_ray.ops.simsearch import ivf_knn_ds

    return ivf_knn_ds(_emb_ds(sf_dir), KNN_QUERY_IDS, k=KNN_K)


def q_ivf_recall(sf_dir: str):
    """Measured ANN quality: recall of the IVF-flat path (sampled
    k-means cells, nprobe probing) against the exact scan, as integer
    percent (rows-only check — depends on the training sample/seed,
    not SQL-expressible)."""
    from dint_ray.ops.simsearch import ivf_recall

    r = ivf_recall(_emb_ds(sf_dir), KNN_QUERY_IDS, k=KNN_K)
    return pa.table({
        "k": pa.array([KNN_K], pa.int64()),
        "num_queries": pa.array([len(KNN_QUERY_IDS)], pa.int64()),
        "recall_pct": pa.array([int(round(r * 100))], pa.int64()),
    })


def q_embedding_dups(sf_dir: str):
    from dint_ray.ops.dedup import embedding_dup_pairs_ds

    ds = embedding_dup_pairs_ds(_emb_ds(sf_dir), threshold=EMB_DUP_THRESHOLD)
    return ds.map_batches(
        _cast_cols({"vec_a": pa.int64(), "vec_b": pa.int64()}),
        batch_format="pyarrow")


def q_media_features(sf_dir: str):
    """Multimodal plumbing (decode stubbed; schema/actor layout real).

    Oracle-checkable view: the fake decoder's float feature is a
    bijection of the first 8 little-endian u32 words of
    sha256(payload); the entry returns those words (w0..w7, int64)
    so DuckDB recomputes them exactly from the same text bytes."""
    import ray.data as rd

    from dint_ray.ops.multimodal import media_features_ds, synthesize_media_table

    import pyarrow.parquet as pq

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    media = rd.from_arrow(synthesize_media_table(docs))
    out = media_features_ds(media, emit_words=True)
    return out.select_columns(["media_id", "kind", "n_bytes"] +
                              [f"w{i}" for i in range(8)])


def _real_media_ds(sf_dir: str):
    import pyarrow.parquet as pq
    import ray.data as rd

    from dint_ray.ops.multimodal import synthesize_real_media

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    return rd.from_arrow(synthesize_real_media(docs))


def q_image_decode(sf_dir: str):
    """REAL image decode: per-doc PNG payloads (zlib, per-row filters,
    CRC-checked chunks — ops/media_codecs.py) decoded in an actor pool;
    integer pixel stats recomputed in closed form by the oracle."""
    from dint_ray.ops.multimodal import decode_features_ds

    return decode_features_ds(_real_media_ds(sf_dir), "image")


def q_audio_decode(sf_dir: str):
    """REAL audio decode: RIFF/PCM16 WAV payloads parsed to samples;
    abs-sum + zero-crossing stats oracle-recomputed."""
    from dint_ray.ops.multimodal import decode_features_ds

    return decode_features_ds(_real_media_ds(sf_dir), "audio")


def q_video_decode(sf_dir: str):
    """REAL video frame-sampling: DVID containers (length-prefixed PNG
    frames), decode ONLY first/middle/last frames via the length
    directory; sampled-pixel sums oracle-recomputed."""
    from dint_ray.ops.multimodal import decode_features_ds

    return decode_features_ds(_real_media_ds(sf_dir), "video")


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

def registry():
    """name -> (callable, oracle_sql | None)."""
    return {
        "tokenize_postings": (q_tokenize, SQL_TOKENIZE),
        "doc_sizes": (q_doc_sizes, SQL_DOC_SIZES),
        "vocabulary": (q_vocabulary, SQL_VOCABULARY),
        "vocabulary_ds": (q_vocabulary_ds, SQL_VOCABULARY),
        "posting_lists": (q_posting_lists, SQL_POSTING_LISTS),
        "posting_lists_joined": (q_posting_lists_joined, SQL_POSTING_LISTS),
        "index_roundtrip_single": (
            lambda sf: q_index_roundtrip(sf, "single_packed"), SQL_POSTING_LISTS),
        "index_roundtrip_single8": (
            lambda sf: q_index_roundtrip(sf, "single_packed8"),
            SQL_POSTING_LISTS),
        "index_roundtrip_multi": (
            lambda sf: q_index_roundtrip(sf, "multi_packed"), SQL_POSTING_LISTS),
        "index_roundtrip_rect": (
            lambda sf: q_index_roundtrip(sf, "single_rect"), SQL_POSTING_LISTS),
        "index_roundtrip_block_vbyte": (
            lambda sf: q_index_roundtrip(sf, "block_vbyte"), SQL_POSTING_LISTS),
        "index_roundtrip_block_simple16": (
            lambda sf: q_index_roundtrip(sf, "block_simple16"), SQL_POSTING_LISTS),
        "index_roundtrip_block_streamvbyte": (
            lambda sf: q_index_roundtrip(sf, "block_streamvbyte"),
            SQL_POSTING_LISTS),
        "index_roundtrip_block_optpfor": (
            lambda sf: q_index_roundtrip(sf, "block_optpfor"),
            SQL_POSTING_LISTS),
        "index_roundtrip_block_varint_g8iu": (
            lambda sf: q_index_roundtrip(sf, "block_varint_g8iu"),
            SQL_POSTING_LISTS),
        "index_roundtrip_block_mixed": (
            lambda sf: q_index_roundtrip(sf, "block_mixed"),
            SQL_POSTING_LISTS),
        "index_roundtrip_block_maskedvbyte": (
            lambda sf: q_index_roundtrip(sf, "block_maskedvbyte"),
            SQL_POSTING_LISTS),
        "index_roundtrip_block_qmx": (
            lambda sf: q_index_roundtrip(sf, "block_qmx"),
            SQL_POSTING_LISTS),
        "index_roundtrip_blob": (q_index_roundtrip_blob,
                                 SQL_POSTING_LISTS),
        "index_transform_mixed": (q_index_transform_mixed,
                                  SQL_POSTING_LISTS),
        "index_roundtrip_ef": (
            lambda sf: q_index_roundtrip(sf, "ef"), SQL_POSTING_LISTS),
        "index_roundtrip_pef": (
            lambda sf: q_index_roundtrip(sf, "pef_opt"), SQL_POSTING_LISTS),
        "index_roundtrip_pef_uniform": (
            lambda sf: q_index_roundtrip(sf, "pef_uniform"), SQL_POSTING_LISTS),
        "bm25_ranked_or": (q_ranked_or, SQL_RANKED_OR),
        "bm25_ranked_and": (q_ranked_and, SQL_RANKED_AND),
        "bm25_wand": (q_wand, SQL_RANKED_OR),
        "bm25_maxscore": (q_maxscore, SQL_RANKED_OR),
        "bm25_block_max_wand": (q_block_max_wand, SQL_RANKED_OR),
        "bm25_wand_routed": (q_wand_routed, SQL_RANKED_OR),
        "bm25_wand_routed_compressed": (q_wand_routed_compressed,
                                        SQL_RANKED_OR_DOCS),
        "bm25_wand_routed_direct": (q_wand_routed_direct,
                                    SQL_RANKED_OR_DOCS),
        "bm25_maxscore_routed": (q_maxscore_routed, SQL_RANKED_OR),
        "bm25_maxscore_routed_compressed": (q_maxscore_routed_compressed,
                                            SQL_RANKED_OR_DOCS),
        "bm25_ranked_and_routed": (q_ranked_and_routed, SQL_RANKED_AND),
        "bm25_ranked_or_routed": (q_ranked_or_routed, SQL_RANKED_OR),
        "bm25_ranked_or_routed_compressed": (
            q_ranked_or_routed_compressed, SQL_RANKED_OR_DOCS),
        "bm25_block_max_wand_routed": (q_block_max_wand_routed,
                                       SQL_RANKED_OR),
        "bm25_ranked_and_routed_compressed": (
            q_ranked_and_routed_compressed, SQL_RANKED_AND_DOCS),
        "bm25_block_max_wand_routed_compressed": (
            q_block_max_wand_routed_compressed, SQL_RANKED_OR_DOCS),
        "bool_counts": (q_bool_counts, SQL_BOOL_COUNTS),
        "block_profile": (q_block_profile, SQL_BLOCK_PROFILE),
        "pairwise_intersect": (q_pairwise_intersect, SQL_PAIRWISE_INTERSECT),
        "text_stats": (q_text_stats, SQL_TEXT_STATS),
        "lang_id": (q_lang_id, SQL_LANG_ID),
        "doc_fingerprint": (q_fingerprint, SQL_FINGERPRINT),
        "exact_dedup": (q_exact_dedup, SQL_EXACT_DEDUP),
        "ngram_jaccard_dedup": (q_ngram_jaccard, SQL_NGRAM_JACCARD),
        "dedup_components": (q_dedup_components, SQL_DEDUP_COMPONENTS),
        "near_dedup_keep": (q_near_dedup_keep, SQL_NEAR_DEDUP_KEEP),
        "minhash_lsh_dedup": (q_minhash_pairs, SQL_MINHASH_VERIFIED),
        "simhash_dedup": (q_simhash_pairs, None),
        "knn_cosine": (q_knn_cosine, SQL_KNN_COSINE),
        "knn_lsh": (q_lsh_knn, None),
        "knn_ivf": (q_ivf_knn, None),
        "knn_ivf_recall": (q_ivf_recall, None),
        "embedding_dups": (q_embedding_dups, SQL_EMBEDDING_DUPS),
        "media_features": (q_media_features, SQL_MEDIA_FEATURES),
        "image_decode": (q_image_decode, SQL_IMAGE_DECODE),
        "audio_decode": (q_audio_decode, SQL_AUDIO_DECODE),
        "video_decode": (q_video_decode, SQL_VIDEO_DECODE),
        "knn_lsh_recall": (q_lsh_recall, None),
    }


def flagship_entry():
    """Flagship: build the DINT index over sf0.001 pages and serve the
    query log with float32 WAND top-10 (the production path)."""
    from dint_ray.pipelines.serve import queries_to_dataset, run_queries_ray

    sf = "/root/testdata/sf0.001"
    idir = ensure_index(sf, "single_packed")
    qds = queries_to_dataset(QUERY_LOG)
    return run_queries_ray(qds, idir, algo="wand", k=K, concurrency=4)
