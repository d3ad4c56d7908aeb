"""From-scratch PNG codec: round-trips, all five scanline filters
(hand-filtered fixtures, since no reference encoder exists in this
container), palette expansion, and the real-decode path of
decode_image / image_features."""

import struct
import zlib

import numpy as np
import pandas as pd
import pytest

from geograypher_spark.functions import png as PNG


def _rand_img(shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


class TestRoundTrip:
    @pytest.mark.parametrize("shape", [
        (1, 1), (7, 5), (32, 48),            # grayscale
        (7, 5, 2),                           # gray+alpha
        (16, 16, 3), (9, 13, 3),             # RGB
        (8, 8, 4),                           # RGBA
    ])
    def test_encode_decode_identity(self, shape):
        img = _rand_img(shape, seed=sum(shape))
        out = PNG.decode_png(PNG.encode_png(img))
        assert out.shape == img.shape
        assert np.array_equal(out, img)

    def test_signature_and_rejects(self):
        img = _rand_img((4, 4, 3))
        data = PNG.encode_png(img)
        assert PNG.is_png(data)
        assert not PNG.is_png(b"JFIF....")
        with pytest.raises(ValueError):
            PNG.decode_png(b"not a png at all")


def _build_png(img: np.ndarray, filter_types: list[int]) -> bytes:
    """Independent mini-encoder for the test: applies the REQUESTED filter
    per scanline (forward direction per the PNG spec), so decode_png's
    un-filtering is checked against a source the codec didn't write."""
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = img.reshape(h, w * ch).astype(np.int32)
    out_rows = []
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        f = filter_types[y % len(filter_types)]
        filt = np.zeros(w * ch, dtype=np.int32)
        for x in range(w * ch):
            left = int(cur[x - ch]) if x >= ch else 0
            up = int(prev[x])
            ul = int(prev[x - ch]) if x >= ch else 0
            if f == 0:
                filt[x] = cur[x]
            elif f == 1:
                filt[x] = cur[x] - left
            elif f == 2:
                filt[x] = cur[x] - up
            elif f == 3:
                filt[x] = cur[x] - ((left + up) >> 1)
            elif f == 4:
                filt[x] = cur[x] - PNG._paeth(left, up, ul)
        out_rows.append(bytes([f]) + bytes((filt & 0xFF).astype(np.uint8)))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(out_rows))
    return (b"\x89PNG\r\n\x1a\n" + PNG._chunk(b"IHDR", ihdr)
            + PNG._chunk(b"IDAT", idat) + PNG._chunk(b"IEND", b""))


class TestFilters:
    @pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4],
                                         [0, 1, 2, 3, 4], [4, 3, 1]])
    def test_unfilter_matches_hand_filtered(self, filters):
        img = _rand_img((11, 6, 3), seed=len(filters))
        out = PNG.decode_png(_build_png(img, filters))
        assert np.array_equal(out, img)

    def test_unfilter_grayscale_paeth(self):
        img = _rand_img((9, 9, 1), seed=7)
        out = PNG.decode_png(_build_png(img, [4]))
        assert np.array_equal(out, img[:, :, 0])


class TestPalette:
    def test_palette_expands_to_rgb(self):
        plte = _rand_img((5, 3), seed=2)           # 5-color palette
        idx = _rand_img((6, 4, 1), seed=3) % 5
        ihdr = struct.pack(">IIBBBBB", 4, 6, 8, 3, 0, 0, 0)
        rows = b"".join(b"\x00" + bytes(idx[y, :, 0]) for y in range(6))
        data = (b"\x89PNG\r\n\x1a\n" + PNG._chunk(b"IHDR", ihdr)
                + PNG._chunk(b"PLTE", plte.tobytes())
                + PNG._chunk(b"IDAT", zlib.compress(rows))
                + PNG._chunk(b"IEND", b""))
        out = PNG.decode_png(data)
        assert out.shape == (6, 4, 3)
        assert np.array_equal(out, plte[idx[:, :, 0]])


class TestDecodeImageIntegration:
    def test_decode_image_real_png(self):
        from geograypher_spark.operators.multimodal import decode_image

        img = _rand_img((24, 16, 3), seed=9)
        out = decode_image(PNG.encode_png(img))
        assert np.array_equal(out, img)

    def test_non_png_still_raises(self):
        from geograypher_spark.operators.multimodal import decode_image

        with pytest.raises(NotImplementedError):
            decode_image(b"\xff\xd8\xff\xe0 fake jpeg")

    def test_image_features_on_real_png(self, spark):
        from geograypher_spark.operators import multimodal as MM

        imgs = {f"png://{i}": _rand_img((32, 32, 3), seed=i)
                for i in range(4)}
        media = spark.createDataFrame(pd.DataFrame({
            "media_ref": list(imgs),
            "kind": ["image"] * 4,
            "payload": [PNG.encode_png(v) for v in imgs.values()],
            "meta": [{} for _ in imgs]}), schema=MM.MEDIA_SCHEMA)
        rows = {r["media_ref"]: r
                for r in MM.image_features(media, fake=False).collect()}
        assert len(rows) == 4
        for ref, img in imgs.items():
            r = rows[ref]
            assert (r["height"], r["width"]) == (32, 32)
            m = img.reshape(-1, 3).mean(axis=0)
            assert r["mean_r"] == pytest.approx(float(m[0]))
            assert r["mean_b"] == pytest.approx(float(m[2]))
            assert len(r["feature"]) == 4 * 4 * 3
