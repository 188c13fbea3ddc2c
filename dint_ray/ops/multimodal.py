"""Multimodal column plumbing (image/audio/video as opaque binary).

The decode libraries are not available in this container, so the
decode kernel is STUBBED behind a deterministic fake (task spec); the
Ray-side plumbing — schema, actor signature, batch sizing, output
layout — is real and tested:

- media rows: (media_id, kind, payload:binary, meta_json);
- MediaDecode actor pool: small batch_size (large binary payloads),
  one CPU per actor, decode in __call__;
- output: fixed-width feature vector + integer metadata columns.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),       # "image" | "audio" | "video"
    ("payload", pa.binary()),
    ("meta_json", pa.string()),
])


def synthesize_media_table(docs_tbl: pa.Table) -> pa.Table:
    """Deterministic fake media derived from the documents table (no
    external data): payload = utf-8 text bytes, kind cycles."""
    ids = docs_tbl.column("doc_id").to_numpy().astype(np.int64)
    texts = docs_tbl.column("text").to_pylist()
    kinds = [("image", "audio", "video")[int(i) % 3] for i in ids]
    payloads = [t.encode() for t in texts]
    metas = [json.dumps({"bytes": len(p)}, sort_keys=True) for p in payloads]
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "meta_json": pa.array(metas, pa.string()),
    })


class MediaDecode:
    """Actor-pool decode/feature-extract stage.

    Real decoders (PIL / torchaudio / pyav) are absent in this
    container; ``real_decoder=True`` raises NotImplementedError at the
    exact seam where they would plug in.  The deterministic fake
    produces a 8-dim feature from the payload bytes so downstream
    plumbing (schema, batching, aggregation) is fully exercised.
    """

    FEATURE_DIM = 8

    def __init__(self, real_decoder: bool = False,
                 emit_words: bool = False) -> None:
        self.real_decoder = real_decoder
        # emit_words adds the raw little-endian u32 digest words
        # (w0..w7, int64) the float feature is derived from — a
        # bijective view that a SQL oracle can recompute exactly
        self.emit_words = emit_words

    def _decode_one(self, kind: str, payload: bytes) -> np.ndarray:
        if self.real_decoder:
            raise NotImplementedError(
                "image/audio decode libraries are not available in this "
                "environment; plug PIL/torchaudio/pyav in here")
        digest = hashlib.sha256(payload).digest()
        feat = np.frombuffer(digest[: self.FEATURE_DIM * 4], dtype="<u4")
        return (feat.astype(np.float32) / np.float32(2**32)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats = [self._decode_one(k, p) for k, p in zip(kinds, payloads)]
        cols = {
            "media_id": pa.array(ids.astype(np.int64), pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32(), MediaDecode.FEATURE_DIM)),
        }
        if self.emit_words:
            words = np.stack([
                np.frombuffer(hashlib.sha256(p).digest()[:32], dtype="<u4")
                for p in payloads]) if payloads else np.empty((0, 8), "<u4")
            for i in range(MediaDecode.FEATURE_DIM):
                cols[f"w{i}"] = pa.array(words[:, i].astype(np.int64),
                                         pa.int64())
        return pa.table(cols)


def media_features_ds(media_ds, concurrency: int = 4,
                      emit_words: bool = False):
    """Small batches + actor pool: binary payloads are heavy per row."""
    return media_ds.map_batches(MediaDecode, batch_format="pyarrow",
                                fn_constructor_kwargs={
                                    "emit_words": emit_words},
                                batch_size=64, concurrency=(1, concurrency),
                                num_cpus=1)
