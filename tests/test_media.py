"""Real media codecs (ops/media_codecs.py) + the decode-feature stages.

The PNG/WAV/DVID codecs are full implementations; these tests pin
exact roundtrips across dims/channels/filter paths, frame sampling
without full decode, and the integer features the SQL oracles
recompute (entry.py image/audio/video_decode)."""

import numpy as np
import pytest

from dint_ray.ops.media_codecs import (
    dvid_encode,
    dvid_extract,
    dvid_frame_count,
    png_decode,
    png_encode,
    resize_area,
    video_sample_indices,
    wav_decode,
    wav_encode,
)
from dint_ray.ops.multimodal import (
    _synth_audio,
    _synth_image,
    _synth_video_frames,
    synthesize_real_media,
)

rng = np.random.default_rng(12345)


class TestPng:
    @pytest.mark.parametrize("channels", [1, 3, 4])
    @pytest.mark.parametrize("h,w", [(1, 1), (1, 7), (6, 1), (5, 5),
                                     (7, 31), (23, 17)])
    def test_roundtrip_random(self, channels, h, w):
        shape = (h, w) if channels == 1 else (h, w, channels)
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = png_decode(png_encode(img))
        np.testing.assert_array_equal(out, img)

    def test_all_filter_types_exercised(self):
        # encoder cycles filters y % 5 -> >=5 rows covers None/Sub/Up/
        # Average/Paeth; extreme values stress the mod-256 arithmetic
        img = rng.integers(0, 256, size=(11, 13, 3), dtype=np.uint8)
        img[0, :, :] = 255
        img[1, :, :] = 0
        out = png_decode(png_encode(img))
        np.testing.assert_array_equal(out, img)

    def test_gradients_and_constants(self):
        for img in (
            np.zeros((8, 8, 3), np.uint8),
            np.full((8, 8), 255, np.uint8),
            np.tile(np.arange(256, dtype=np.uint8), (5, 1)),
        ):
            np.testing.assert_array_equal(png_decode(png_encode(img)), img)

    def test_crc_detects_corruption(self):
        data = bytearray(png_encode(np.zeros((4, 4, 3), np.uint8)))
        data[40] ^= 0xFF  # flip a byte inside IDAT
        with pytest.raises(ValueError, match="CRC"):
            png_decode(bytes(data))

    def test_rejects_non_png(self):
        with pytest.raises(ValueError, match="signature"):
            png_decode(b"not a png at all........")


class TestWav:
    def test_roundtrip_mono(self):
        s = rng.integers(-32768, 32768, size=999, dtype=np.int16)
        out, rate = wav_decode(wav_encode(s, rate=8000))
        assert rate == 8000
        np.testing.assert_array_equal(out, s)

    def test_roundtrip_stereo(self):
        s = rng.integers(-32768, 32768, size=(256, 2), dtype=np.int16)
        out, rate = wav_decode(wav_encode(s))
        assert rate == 16_000 and out.shape == (256, 2)
        np.testing.assert_array_equal(out, s)

    def test_rejects_non_wav(self):
        with pytest.raises(ValueError, match="RIFF"):
            wav_decode(b"RIFX....WAVE")


class TestDvid:
    def test_frame_sampling_roundtrip(self):
        frames = [rng.integers(0, 256, size=(9, 11, 3), dtype=np.uint8)
                  for _ in range(5)]
        blob = dvid_encode(frames)
        assert dvid_frame_count(blob) == 5
        got = dvid_extract(blob, [0, 2, 4])
        for g, want in zip(got, [frames[0], frames[2], frames[4]]):
            np.testing.assert_array_equal(g, want)

    def test_sample_indices_policy(self):
        assert video_sample_indices(3) == [0, 1, 2]
        assert video_sample_indices(4) == [0, 2, 3]
        assert video_sample_indices(5) == [0, 2, 4]
        assert video_sample_indices(1) == [0]

    def test_out_of_range_indices_ignored(self):
        blob = dvid_encode([np.zeros((2, 2, 3), np.uint8)])
        assert len(dvid_extract(blob, [0, 7, -1])) == 1


class TestResize:
    def test_block_mean_exact(self):
        img = np.arange(16, dtype=np.uint8).reshape(4, 4)
        out = resize_area(img, 2, 2)
        # 2x2 blocks: mean of [0,1,4,5]=2, [2,3,6,7]=4, ...
        np.testing.assert_array_equal(out, [[2, 4], [10, 12]])

    def test_shapes_and_determinism(self):
        img = rng.integers(0, 256, size=(23, 31, 3), dtype=np.uint8)
        a = resize_area(img, 16, 16)
        b = resize_area(img, 16, 16)
        assert a.shape == (16, 16, 3)
        np.testing.assert_array_equal(a, b)


class TestSynthFormulas:
    """The decode features must equal the closed-form values the SQL
    oracles compute (entry.py)."""

    @pytest.mark.parametrize("d", [0, 3, 6, 33, 123, 999])
    def test_image_pix_sum(self, d):
        img = _synth_image(d)
        w, h = 24 + d % 9, 16 + d % 7
        assert img.shape == (h, w, 3)
        direct = sum(
            (x * (3 + c) + y * (5 + 2 * c) + d * (7 + 11 * c)) % 256
            for x in range(w) for y in range(h) for c in range(3))
        assert int(img.astype(np.int64).sum()) == direct
        np.testing.assert_array_equal(png_decode(png_encode(img)), img)

    @pytest.mark.parametrize("d", [1, 4, 31, 100, 511])
    def test_audio_stats(self, d):
        s = _synth_audio(d)
        assert len(s) == 1024 + d % 512
        vals = [((i * ((d % 31) + 3) + d) % 509) - 254
                for i in range(len(s))]
        assert s.tolist() == vals
        out, _ = wav_decode(wav_encode(s))
        np.testing.assert_array_equal(out, s)

    @pytest.mark.parametrize("d", [2, 5, 77])
    def test_video_frames(self, d):
        frames = _synth_video_frames(d)
        assert len(frames) == 3 + d % 4
        blob = dvid_encode(frames)
        idx = video_sample_indices(len(frames))
        got = dvid_extract(blob, idx)
        for g, i in zip(got, idx):
            np.testing.assert_array_equal(g, frames[i])


class TestRayStages:
    def test_decode_features_match_direct(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from dint_ray.ops.multimodal import decode_features_ds

        docs = pa.table({"doc_id": pa.array(range(24), pa.int64()),
                         "text": pa.array(["x"] * 24)})
        media = synthesize_real_media(docs)
        ds = rd.from_arrow(media)
        img = decode_features_ds(ds, "image").to_pandas() \
            .sort_values("media_id").reset_index(drop=True)
        assert (img["media_id"] % 3 == 0).all()
        for _, r in img.iterrows():
            d = int(r["media_id"])
            arr = _synth_image(d)
            assert (r["width"], r["height"]) == (arr.shape[1], arr.shape[0])
            assert r["pix_sum"] == int(arr.astype(np.int64).sum())
        aud = decode_features_ds(ds, "audio").to_pandas()
        for _, r in aud.iterrows():
            s = _synth_audio(int(r["media_id"])).astype(np.int64)
            assert r["abs_sum"] == int(np.abs(s).sum())
            nn = (s >= 0).astype(np.int8)
            assert r["zero_cross"] == int((nn[1:] != nn[:-1]).sum())
        vid = decode_features_ds(ds, "video").to_pandas()
        for _, r in vid.iterrows():
            d = int(r["media_id"])
            frames = _synth_video_frames(d)
            idx = video_sample_indices(len(frames))
            want = sum(int(frames[i].astype(np.int64).sum()) for i in idx)
            assert (r["n_frames"], r["n_sampled"]) == (len(frames), len(idx))
            assert r["pix_sum"] == want
