"""From-scratch WAV codec and MJPEG-AVI container: round-trips,
hand-built byte fixtures, and the real decode paths of decode_audio /
audio_features / sample_video_frames."""

import struct

import numpy as np
import pandas as pd
import pytest

from geograypher_spark.functions import avi as AVI
from geograypher_spark.functions import wav as WAV


class TestWavRoundTrip:
    @pytest.mark.parametrize("dtype,ch", [
        (np.uint8, 1), (np.int16, 1), (np.int16, 2), (np.int32, 2),
        (np.float32, 1), (np.float64, 2),
    ])
    def test_encode_decode_identity(self, dtype, ch):
        rng = np.random.default_rng(hash((str(dtype), ch)) % 2**31)
        if np.issubdtype(dtype, np.integer):
            info = np.iinfo(dtype)
            s = rng.integers(info.min, info.max, size=(211, ch),
                             endpoint=True).astype(dtype)
        else:
            s = (rng.random((211, ch)) * 2 - 1).astype(dtype)
        if ch == 1:
            s = s[:, 0]
        out, rate = WAV.decode_wav(WAV.encode_wav(s, 8000))
        assert rate == 8000
        assert out.dtype == s.dtype and out.shape == s.shape
        assert np.array_equal(out, s)

    def test_rejects(self):
        assert not WAV.is_wav(b"RIFFxxxxAVI ")
        with pytest.raises(ValueError):
            WAV.decode_wav(b"not audio")
        with pytest.raises(ValueError):
            # RIFF/WAVE but no fmt/data chunks
            WAV.decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


class TestWavByteFixtures:
    def test_24bit_sign_extension(self):
        vals = [0, 1, -1, 8388607, -8388608, 300000]
        raw = b"".join(
            (v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
        fmt = struct.pack("<HHIIHH", 1, 1, 44100, 44100 * 3, 3, 24)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
                + b"data" + struct.pack("<I", len(raw)) + raw)
        payload = b"RIFF" + struct.pack("<I", len(body)) + body
        out, rate = WAV.decode_wav(payload)
        assert rate == 44100 and out.dtype == np.int32
        assert out.tolist() == vals

    def test_extensible_format_tag(self):
        s = np.arange(-50, 50, dtype=np.int16)
        base = WAV.encode_wav(s, 16000)
        # rebuild with WAVE_FORMAT_EXTENSIBLE wrapping PCM
        # 16-byte base + cbSize(22) + validBits + channelMask + GUID
        # whose first two bytes carry the real tag (PCM = 1)
        ext = (struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 32000, 2, 16)
               + struct.pack("<HHI", 22, 16, 0)
               + struct.pack("<H", 1) + b"\x00" * 14)
        raw = s.astype("<i2").tobytes()
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(ext)) + ext
                + b"data" + struct.pack("<I", len(raw)) + raw)
        out, rate = WAV.decode_wav(
            b"RIFF" + struct.pack("<I", len(body)) + body)
        assert np.array_equal(out, s)

    def test_unknown_chunks_skipped(self):
        s = np.array([1, -2, 3], dtype=np.int16)
        base = WAV.encode_wav(s, 8000)
        # splice a LIST/INFO chunk between header and fmt
        junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
        spliced = base[:12] + junk + base[12:]
        spliced = spliced[:4] + struct.pack(
            "<I", len(spliced) - 8) + spliced[8:]
        out, _ = WAV.decode_wav(spliced)
        assert np.array_equal(out, s)

    def test_samples_to_float_ranges(self):
        assert WAV.samples_to_float(
            np.array([0, 128, 255], np.uint8)).tolist() == [-1.0, 0.0, 127 / 128]
        assert WAV.samples_to_float(
            np.array([-32768, 0], np.int16)).tolist() == [-1.0, 0.0]
        f = np.array([0.25, -0.5], np.float32)
        assert WAV.samples_to_float(f).tolist() == [0.25, -0.5]


def _flat_frames(n=5, h=24, w=16):
    """Flat-color RGB frames — JPEG at q95 reproduces them near-exactly,
    so container round-trips can assert tight tolerances."""
    return [np.full((h, w, 3), (i * 37 + 20) % 200, dtype=np.uint8)
            for i in range(n)]


class TestAvi:
    def test_parse_meta_and_frames(self):
        frames = _flat_frames(4)
        data = AVI.encode_mjpeg_avi(frames, fps=12, quality=95)
        assert AVI.is_avi(data)
        parsed = AVI.parse_avi(data)
        m = parsed["meta"]
        assert m["total_frames"] == 4
        assert (m["width"], m["height"]) == (16, 24)
        assert m["compression"] == "MJPG"
        assert m["us_per_frame"] == 1_000_000 // 12
        assert len(parsed["frames"]) == 4

    def test_decode_all_frames_near_exact(self):
        frames = _flat_frames(3)
        data = AVI.encode_mjpeg_avi(frames, quality=95)
        out = list(AVI.decode_mjpeg_frames(data))
        assert [i for i, _ in out] == [0, 1, 2]
        for (_, dec), src in zip(out, frames):
            assert dec.shape == src.shape
            assert np.max(np.abs(dec.astype(int) - src.astype(int))) <= 3

    def test_every_nth_skips_jpeg_work(self):
        frames = _flat_frames(7)
        data = AVI.encode_mjpeg_avi(frames, quality=95)
        out = list(AVI.decode_mjpeg_frames(data, every_nth=3))
        assert [i for i, _ in out] == [0, 3, 6]

    def test_non_mjpeg_raises(self):
        frames = _flat_frames(2)
        data = AVI.encode_mjpeg_avi(frames)
        data = data.replace(b"MJPG", b"H264")
        with pytest.raises(ValueError):
            list(AVI.decode_mjpeg_frames(data))
        with pytest.raises(ValueError):
            AVI.parse_avi(b"RIFF\x04\x00\x00\x00WAVE")


class TestSparkIntegration:
    def _media(self, spark, rows):
        from geograypher_spark.operators import multimodal as MM

        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["media_ref", "kind", "payload",
                                        "meta"]),
            schema=MM.MEDIA_SCHEMA)

    def test_audio_features_real_wav(self, spark):
        from geograypher_spark.functions.wav import samples_to_float
        from geograypher_spark.operators import multimodal as MM

        rng = np.random.default_rng(3)
        clips = {
            "a16": rng.integers(-3000, 3000, size=400).astype(np.int16),
            "st32": (rng.random((300, 2)) * 0.5 - 0.25).astype(np.float32),
        }
        media = self._media(spark, [
            (k, "audio", WAV.encode_wav(v, 8000), {})
            for k, v in clips.items()])
        rows = {r["media_ref"]: r
                for r in MM.audio_features(media, fake=False).collect()}
        assert set(rows) == set(clips)
        for k, v in clips.items():
            mono = samples_to_float(v)
            if mono.ndim == 2:
                mono = mono.mean(axis=1)
            r = rows[k]
            assert r["sample_rate"] == 8000
            assert r["n_samples"] == len(mono)
            assert r["channels"] == (1 if v.ndim == 1 else v.shape[1])
            assert r["duration_s"] == pytest.approx(len(mono) / 8000)
            assert r["rms"] == pytest.approx(float(np.sqrt(np.mean(mono**2))))
            assert r["peak"] == pytest.approx(float(np.abs(mono).max()))

    def test_sample_video_frames_real_avi(self, spark):
        from geograypher_spark.operators import multimodal as MM

        frames = _flat_frames(6, h=16, w=16)
        media = self._media(spark, [
            ("v1", "video", AVI.encode_mjpeg_avi(frames, quality=95), {}),
            ("skip", "image", b"png-ish", {}),
        ])
        rows = sorted(
            MM.sample_video_frames(media, every_nth=2, n_frames=6,
                                   fake=False).collect(),
            key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in rows] == [0, 2, 4]
        for r in rows:
            assert (r["height"], r["width"]) == (16, 16)
            arr = np.frombuffer(bytes(r["frame"]), np.uint8).reshape(16, 16, 3)
            src = frames[r["frame_idx"]]
            assert np.max(np.abs(arr.astype(int) - src.astype(int))) <= 3

    def test_fake_paths_still_work(self, spark):
        from geograypher_spark.operators import multimodal as MM

        media = self._media(spark, [("m", "audio", b"mp3-ish", {}),
                                    ("v", "video", b"h264-ish", {})])
        a = MM.audio_features(media, n=64, fake=True).collect()
        assert len(a) == 1 and a[0]["n_samples"] == 64
        v = MM.sample_video_frames(media, every_nth=10, n_frames=30,
                                   h=8, w=8, fake=True).collect()
        assert len(v) == 3
        assert all(len(bytes(r["frame"])) == 8 * 8 * 3 for r in v)
        with pytest.raises(Exception):
            MM.audio_features(media, fake=False).collect()
