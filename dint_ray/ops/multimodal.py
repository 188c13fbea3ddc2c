"""Multimodal column plumbing (image/audio/video as opaque binary).

Two tiers:

1. REAL decode (media_codecs.py): PNG images, WAV PCM16 audio, and
   DVID frame-containers are fully decoded in pure stdlib+numpy — the
   decode stage is a real decoder, not a stub.  Synthetic media is
   generated from closed-form integer formulas so a DuckDB oracle can
   recompute the decoded pixel/sample statistics exactly
   (`generate_series` cross joins) — end-to-end encode→decode→feature
   is oracle-checked.
2. Formats needing external libs (JPEG/MP3/H.264) still raise
   NotImplementedError at the same seam (MediaDecode(real_decoder=True)
   on an unknown payload).

Plumbing invariants (task spec): media rows (media_id, kind,
payload:binary, meta_json); actor-pool map_batches with small
batch_size (binary payloads are heavy per row); fixed output schema
per kind.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa

from dint_ray.ops.media_codecs import (
    dvid_encode,
    dvid_extract,
    dvid_frame_count,
    png_decode,
    png_encode,
    video_sample_indices,
    wav_decode,
    wav_encode,
)

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
    import dint_ray
    dint_ray.ensure_tuned()
    return media_ds.map_batches(MediaDecode, batch_format="pyarrow",
                                fn_constructor_kwargs={
                                    "emit_words": emit_words},
                                batch_size=64, concurrency=(1, concurrency),
                                num_cpus=1)


# --------------------------------------------------------------------------
# Real media: closed-form synthesis + real PNG/WAV/DVID decode
# --------------------------------------------------------------------------
#
# Every formula below is integer arithmetic on the media seed, so the
# driver's DuckDB oracle recomputes the DECODED statistics exactly —
# the encode (zlib/filters/CRC) and decode are genuinely round-tripped
# on the Ray side and verified end-to-end on the SQL side.

def _image_dims(seed: int) -> tuple[int, int]:
    return 24 + seed % 9, 16 + seed % 7      # (width, height)


def _synth_image(seed: int) -> np.ndarray:
    """pixel(y, x, c) = (x*(3+c) + y*(5+2c) + seed*(7+11c)) % 256."""
    w, h = _image_dims(seed)
    x = np.arange(w, dtype=np.int64)[None, :, None]
    y = np.arange(h, dtype=np.int64)[:, None, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    return ((x * (3 + c) + y * (5 + 2 * c) + seed * (7 + 11 * c)) % 256
            ).astype(np.uint8)


def _synth_audio(seed: int) -> np.ndarray:
    """s[i] = ((i*((seed%31)+3) + seed) % 509) - 254, int16."""
    n = 1024 + seed % 512
    i = np.arange(n, dtype=np.int64)
    return (((i * ((seed % 31) + 3) + seed) % 509) - 254).astype(np.int16)


def _synth_video_frames(seed: int) -> list[np.ndarray]:
    """3 + seed%4 frames sharing the seed's dims; frame f's pixels use
    seed*1000 + f — every frame is a distinct real PNG.  (%4, not %3:
    kind selection already fixes seed%3, which would collapse the
    frame-count variety.)"""
    w, h = _image_dims(seed)
    frames = []
    for f in range(3 + seed % 4):
        fs = seed * 1000 + f
        x = np.arange(w, dtype=np.int64)[None, :, None]
        y = np.arange(h, dtype=np.int64)[:, None, None]
        c = np.arange(3, dtype=np.int64)[None, None, :]
        frames.append(((x * (3 + c) + y * (5 + 2 * c) + fs * (7 + 11 * c))
                       % 256).astype(np.uint8))
    return frames


def synthesize_real_media(docs_tbl: pa.Table) -> pa.Table:
    """Deterministic REAL media per doc (kind = doc_id % 3): encoded
    PNG / WAV / DVID payloads, not text bytes."""
    ids = docs_tbl.column("doc_id").to_numpy().astype(np.int64)
    kinds, payloads, metas = [], [], []
    for d in ids:
        d = int(d)
        k = ("image", "audio", "video")[d % 3]
        if k == "image":
            p = png_encode(_synth_image(d))
        elif k == "audio":
            p = wav_encode(_synth_audio(d))
        else:
            p = dvid_encode(_synth_video_frames(d))
        kinds.append(k)
        payloads.append(p)
        metas.append(json.dumps({"bytes": len(p)}, sort_keys=True))
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "meta_json": pa.array(metas, pa.string()),
    })


class DecodeFeatures:
    """Actor-pool REAL decode + integer feature extraction for one kind.

    Output schemas (all int64, exactly recomputable in SQL):
      image: media_id, width, height, pix_sum
      audio: media_id, n_samples, abs_sum, zero_cross
      video: media_id, n_frames, n_sampled, pix_sum (sampled frames)
    """

    def __init__(self, kind: str) -> None:
        self.kind = kind

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.equal(batch.column("kind"), self.kind))
        ids = batch.column("media_id").to_numpy().astype(np.int64)
        payloads = batch.column("payload").to_pylist()
        if self.kind == "image":
            w_, h_, s_ = [], [], []
            for p in payloads:
                img = png_decode(p)
                h, w = img.shape[:2]
                w_.append(w)
                h_.append(h)
                s_.append(int(img.astype(np.int64).sum()))
            return pa.table({
                "media_id": pa.array(ids, pa.int64()),
                "width": pa.array(w_, pa.int64()),
                "height": pa.array(h_, pa.int64()),
                "pix_sum": pa.array(s_, pa.int64()),
            })
        if self.kind == "audio":
            n_, a_, z_ = [], [], []
            for p in payloads:
                s, _rate = wav_decode(p)
                s = s.astype(np.int64)
                n_.append(len(s))
                a_.append(int(np.abs(s).sum()))
                nn = (s >= 0).astype(np.int8)
                z_.append(int((nn[1:] != nn[:-1]).sum()))
            return pa.table({
                "media_id": pa.array(ids, pa.int64()),
                "n_samples": pa.array(n_, pa.int64()),
                "abs_sum": pa.array(a_, pa.int64()),
                "zero_cross": pa.array(z_, pa.int64()),
            })
        if self.kind == "video":
            f_, k_, s_ = [], [], []
            for p in payloads:
                nf = dvid_frame_count(p)
                idx = video_sample_indices(nf)
                frames = dvid_extract(p, idx)
                f_.append(nf)
                k_.append(len(idx))
                s_.append(int(sum(fr.astype(np.int64).sum()
                                  for fr in frames)))
            return pa.table({
                "media_id": pa.array(ids, pa.int64()),
                "n_frames": pa.array(f_, pa.int64()),
                "n_sampled": pa.array(k_, pa.int64()),
                "pix_sum": pa.array(s_, pa.int64()),
            })
        raise ValueError(f"unknown media kind {self.kind!r}")


def decode_features_ds(media_ds, kind: str, concurrency: int = 4):
    """Real-decode one kind with an actor pool (the kind filter runs
    inside the stage — one pass, stable output schema; small batches:
    payloads are the heavy column)."""
    import dint_ray
    dint_ray.ensure_tuned()
    return media_ds.map_batches(
        DecodeFeatures, batch_format="pyarrow",
        fn_constructor_kwargs={"kind": kind},
        batch_size=64, concurrency=(1, concurrency), num_cpus=1)
