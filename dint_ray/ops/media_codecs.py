"""Real media codecs in pure stdlib + numpy (no PIL/torchaudio/pyav).

The container has no image/audio libraries, but PNG and WAV are fully
specified formats decodable with ``zlib`` + ``struct`` + numpy — so the
multimodal decode stage (SURVEY task spec "multimodal columns") can be a
REAL decoder rather than a stub for these formats:

- PNG: 8-bit gray / RGB / RGBA, non-interlaced; encoder emits every
  filter type (row ``y % 5``) so decode exercises None/Sub/Up/Average/
  Paeth; CRC-checked chunks.
- WAV: RIFF/PCM16, mono or interleaved multi-channel.
- DVID: our deterministic video container (magic + frame count + one
  length-prefixed PNG per frame) supporting frame *sampling*: seek by
  the length prefixes and decode only the requested frames — the
  "frame-sample without full decode" pattern a 100-TB video pipeline
  needs.

Formats we cannot decode here (JPEG/MP3/H.264...) still raise
NotImplementedError at the same seam (multimodal.MediaDecode).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# --------------------------------------------------------------------------
# PNG (RFC 2083): 8-bit depth, color types 0 (gray), 2 (RGB), 6 (RGBA)
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}          # channels -> color type
_CHANNELS = {0: 1, 2: 3, 6: 4}            # color type -> channels


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def _paeth(left: np.ndarray, up: np.ndarray, upleft: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (all operands int16 arrays)."""
    p = left + up - upleft
    pa_ = np.abs(p - left)
    pb = np.abs(p - up)
    pc = np.abs(p - upleft)
    out = np.where((pa_ <= pb) & (pa_ <= pc), left,
                   np.where(pb <= pc, up, upleft))
    return out


def png_encode(img: np.ndarray) -> bytes:
    """HxW or HxWxC uint8 -> PNG bytes.  Filter type cycles ``y % 5`` so
    every filter path is exercised (and round-trip-tested) on decode."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {c}")
    bpp = c  # bytes per pixel at bit depth 8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    raw = img.reshape(h, w * c).astype(np.int16)
    prior = np.zeros(w * c, dtype=np.int16)
    lines = []
    for y in range(h):
        row = raw[y]
        left = np.concatenate([np.zeros(bpp, np.int16), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int16), prior[:-bpp]])
        ft = y % 5
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row - left
        elif ft == 2:
            filt = row - prior
        elif ft == 3:
            filt = row - ((left + prior) >> 1)
        else:
            filt = row - _paeth(left, prior, upleft)
        lines.append(bytes([ft]) + (filt & 0xFF).astype(np.uint8).tobytes())
        prior = row
    idat = zlib.compress(b"".join(lines), 6)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> HxWxC uint8 (C=1 returned as HxW).  Supports 8-bit
    gray/RGB/RGBA, non-interlaced, all five filter types, multi-IDAT."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        if pos + 12 + length > len(data):
            raise ValueError("truncated PNG chunk")
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"unsupported PNG (depth={depth}, interlace={interlace})")
    if ctype not in _CHANNELS:
        raise NotImplementedError(f"unsupported PNG color type {ctype}")
    c = _CHANNELS[ctype]
    stride = w * c
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    buf = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.int16)
    prior = np.zeros(stride, dtype=np.int16)
    bpp = c
    for y in range(h):
        ft = int(buf[y, 0])
        row = buf[y, 1:].astype(np.int16)
        if ft == 0:
            rec = row
        elif ft == 2:
            rec = (row + prior) & 0xFF
        elif ft in (1, 3, 4):
            # sequential along x: reconstruct pixel-group-at-a-time
            # (bpp-wide vector ops; width iterations of tiny numpy work —
            # real decoders use SIMD here, same dependence structure)
            rec = np.zeros(stride, dtype=np.int16)
            upleft = np.concatenate([np.zeros(bpp, np.int16), prior[:-bpp]])
            for x0 in range(0, stride, bpp):
                left = rec[x0 - bpp:x0] if x0 else np.zeros(bpp, np.int16)
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + prior[x0:x0 + bpp]) >> 1
                else:
                    pred = _paeth(left, prior[x0:x0 + bpp],
                                  upleft[x0:x0 + bpp])
                rec[x0:x0 + bpp] = (row[x0:x0 + bpp] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        rec = rec & 0xFF
        out[y] = rec
        prior = rec
    img = out.astype(np.uint8).reshape(h, w, c)
    return img[:, :, 0] if c == 1 else img


# --------------------------------------------------------------------------
# WAV (RIFF / PCM 16-bit LE)
# --------------------------------------------------------------------------

def wav_encode(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """int16 samples (n,) mono or (n, ch) interleaved -> WAV bytes."""
    samples = np.asarray(samples, dtype="<i2")
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    pcm = samples.reshape(-1).tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples int16 (n,) or (n, ch), sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF header)")
    pos = 12
    rate = ch = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        if pos + 8 + length > len(data):
            raise ValueError("truncated WAV chunk")
        body = data[pos + 8:pos + 8 + length]
        if tag == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV fmt chunk")
            audio_fmt, ch, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError("only PCM16 WAV supported")
        elif tag == b"data":
            pcm = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(pcm, dtype="<i2")
    if ch > 1:
        samples = samples.reshape(-1, ch)
    return samples, rate


# --------------------------------------------------------------------------
# DVID: deterministic video container (length-prefixed PNG frames)
# --------------------------------------------------------------------------

_DVID_MAGIC = b"DVID1\x00"


def dvid_encode(frames: list[np.ndarray]) -> bytes:
    """List of HxWxC uint8 frames -> container bytes (PNG per frame)."""
    parts = [_DVID_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        png = png_encode(f)
        parts.append(struct.pack("<I", len(png)))
        parts.append(png)
    return b"".join(parts)


def dvid_frame_count(data: bytes) -> int:
    if data[:6] != _DVID_MAGIC:
        raise ValueError("not a DVID container")
    return struct.unpack_from("<I", data, 6)[0]


def dvid_extract(data: bytes, indices: list[int]) -> list[np.ndarray]:
    """Decode ONLY the requested frames: skip others via the length
    prefixes (no decompression of unsampled frames)."""
    n = dvid_frame_count(data)
    want = sorted(set(i for i in indices if 0 <= i < n))
    pos = 10
    out: dict[int, np.ndarray] = {}
    for i in range(n):
        (length,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if i in want:
            out[i] = png_decode(data[pos:pos + length])
        pos += length
        if len(out) == len(want):
            break
    return [out[i] for i in want]


def video_sample_indices(num_frames: int) -> list[int]:
    """Deterministic frame-sampling policy: first / middle / last."""
    return sorted({0, num_frames // 2, num_frames - 1})


# --------------------------------------------------------------------------
# Resize (area average — the thumbnail / feature-extract kernel)
# --------------------------------------------------------------------------

def resize_area(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic area-average resize of HxW[xC] uint8: each source
    pixel is binned to target cell ((y*out_h)//h, (x*out_w)//w); cell
    value = floor(mean).  Pure integer accumulation — reproducible
    across platforms."""
    img = np.asarray(img)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    h, w, c = img.shape
    ty = (np.arange(h, dtype=np.int64) * out_h) // h
    tx = (np.arange(w, dtype=np.int64) * out_w) // w
    cell = (ty[:, None] * out_w + tx[None, :]).reshape(-1)
    flat = img.reshape(h * w, c).astype(np.int64)
    sums = np.zeros((out_h * out_w, c), dtype=np.int64)
    np.add.at(sums, cell, flat)
    counts = np.bincount(cell, minlength=out_h * out_w)[:, None]
    out = (sums // np.maximum(counts, 1)).astype(np.uint8)
    out = out.reshape(out_h, out_w, c)
    return out[:, :, 0] if squeeze else out
