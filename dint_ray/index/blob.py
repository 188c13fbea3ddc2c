"""Single-blob shard image with an Elias-Fano endpoint directory.

The reference's frozen index stores every posting list back-to-back in
one bit stream and keeps the list ENDPOINTS as a compact-Elias-Fano
sequence (/root/reference/include/dint/dict_freq_index.hpp:96-100:
``compact_elias_fano::write(bvb, m_endpoints...)`` over the per-list
offsets).  The parquet shard layout this engine builds keeps one binary
cell per list instead — equivalent information, but each cell pays
parquet framing.  This module is the mmap-serving export of a shard:

    [header varbyte(n_lists)] [EF(term_ids)] [EF(endpoints)] [payload blob]

- ``term_ids``: strictly increasing uint32 list ids present in the
  shard (EF over universe max_id+1);
- ``endpoints``: cumulative END byte offset of each list's payload in
  the blob (EF over universe total_bytes+1 — the reference encodes the
  same cumulative form);
- the blob is the raw concatenation of the DINT payloads, unframed —
  list i is ``blob[endpoints[i-1]:endpoints[i]]``.

``BlobView`` memory-maps the file and decodes ONLY the two EF
directories eagerly (O(n_lists) ints); payload access is a zero-copy
memoryview slice, so a serving worker touches exactly the bytes of the
lists a query visits — the mmap behavior queries.cpp:69-83 relies on.
"""

from __future__ import annotations

import os

import numpy as np

from dint_ray.codecs import varbyte
from dint_ray.codecs.ef import ef_decode, ef_encode


def write_blob(path: str, term_ids: np.ndarray, payloads: list[bytes]) -> dict:
    """Write (term_ids, payloads) as one blob + EF directories.

    term_ids must be strictly increasing (the parquet shards are
    written sorted by term_id).  Atomic via temp + rename."""
    term_ids = np.asarray(term_ids, dtype=np.uint64)
    n = len(term_ids)
    assert n == len(payloads)
    if n > 1:
        assert (np.diff(term_ids.astype(np.int64)) > 0).all(), \
            "term_ids must be strictly increasing"
    lens = np.fromiter((len(p) for p in payloads), dtype=np.uint64, count=n)
    ends = np.cumsum(lens)
    total = int(ends[-1]) if n else 0
    head = bytearray(varbyte.encode_single(n))
    tid_dir = ef_encode(term_ids, int(term_ids[-1]) + 1 if n else 1)
    end_dir = ef_encode(ends, total + 1)
    head += varbyte.encode_single(len(tid_dir))
    head += tid_dir
    head += varbyte.encode_single(len(end_dir))
    head += end_dir
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(bytes(head))
        for p in payloads:
            f.write(p)
    os.replace(tmp, path)
    return {"n_lists": n, "blob_bytes": total,
            "directory_bytes": len(head),
            "directory_bits_per_list": round(8 * len(head) / max(n, 1), 2)}


class BlobView:
    """mmap view over a blob file: EF directories decoded once,
    payloads served as zero-copy memoryview slices."""

    __slots__ = ("_mm", "term_ids", "_ends", "_base")

    def __init__(self, path: str) -> None:
        self._mm = np.memmap(path, dtype=np.uint8, mode="r")
        buf = self._mm
        n, off = varbyte.decode_single(buf, 0)
        tid_len, off = varbyte.decode_single(buf, off)
        tids, _ = ef_decode(buf[off:off + tid_len])
        off += tid_len
        end_len, off = varbyte.decode_single(buf, off)
        ends, _ = ef_decode(buf[off:off + end_len])
        off += end_len
        assert len(tids) == n and len(ends) == n
        self.term_ids = tids.astype(np.uint32)
        self._ends = ends.astype(np.int64)
        self._base = off

    def __len__(self) -> int:
        return len(self.term_ids)

    def payload(self, i: int) -> memoryview:
        """Payload bytes of the i-th list (by position, not term_id)."""
        lo = self._base + (int(self._ends[i - 1]) if i else 0)
        hi = self._base + int(self._ends[i])
        return memoryview(self._mm.data)[lo:hi]

    def payload_of_term(self, term_id: int) -> memoryview | None:
        i = int(np.searchsorted(self.term_ids, term_id))
        if i == len(self.term_ids) or self.term_ids[i] != term_id:
            return None
        return self.payload(i)


def export_shards_to_blobs(index_dir: str, out_dir: str | None = None) -> list[dict]:
    """Convert every parquet shard of a built index into a blob file
    (``blobs/shard-<i>.blob``).  Duplicate term rows (executor-split
    fragments) are merged first, so each blob has one list per term."""
    import json

    import pyarrow.parquet as pq

    from dint_ray.index.build import load_codec_bundle
    from dint_ray.index.shards import load_merged_rows

    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    bundle = load_codec_bundle(index_dir, manifest["dict_kind"])
    docs_codec, freqs_codec = bundle.codecs()
    out_dir = out_dir or os.path.join(index_dir, "blobs")
    os.makedirs(out_dir, exist_ok=True)
    stats = []
    for i, shard in enumerate(manifest["shards"]):
        p = os.path.join(index_dir, shard["path"])
        if os.path.isdir(p):
            import glob as _g

            files = sorted(_g.glob(os.path.join(p, "*.parquet")))
            t = pq.read_table(files, columns=["term_id", "payload"])
        else:
            t = pq.read_table(p, columns=["term_id", "payload"])
        rows = load_merged_rows([t], docs_codec, freqs_codec)
        order = sorted(rows)
        payloads = [rows[tid][1] for tid in order]
        st = write_blob(os.path.join(out_dir, f"shard-{i}.blob"),
                        np.asarray(order, dtype=np.uint64), payloads)
        st["shard"] = i
        stats.append(st)
    return stats
