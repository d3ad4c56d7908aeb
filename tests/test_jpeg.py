"""Baseline JPEG codec (functions/jpeg.py): spec-derived fixtures,
encoder→decoder round trips, format-feature coverage, error paths.

The container has no libjpeg/Pillow, so independence of the decode check
comes from HAND-DERIVED fixtures: minimal JPEGs assembled byte-by-byte
from the T.81 spec (standard Annex-K tables, hand-Huffman-coded entropy
bits) whose pixel values follow in closed form from the DCT definition —
if the decoder disagrees with those, the decoder is wrong, not the
encoder."""

import struct

import numpy as np
import pytest

from geograypher_spark.functions import jpeg as J


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.clip(128 + 80 * np.sin(yy / 9.0) + 60 * np.cos(xx / 11.0),
                   0, 255).astype(np.uint8)


def _rgb(h, w):
    g = _gradient(h, w)
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([g, g[::-1], ((yy + xx) % 200 + 20).astype(np.uint8)],
                    axis=2)


def _minimal_gray_jpeg(entropy: bytes, quant=None) -> bytes:
    """8×8 single-component baseline JPEG with Annex-K luma tables and
    caller-supplied hand-coded entropy bytes."""
    q = J.STD_QUANT_LUMA if quant is None else quant
    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(struct.pack(">HH", 0xFF00 | marker, len(body) + 2))
        out.extend(body)

    seg(0xDB, bytes([0]) + q[J.ZIGZAG].astype(np.uint8).tobytes())
    seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    seg(0xC4, bytes([0x00]) + bytes(J._DC_LUMA_BITS)
        + bytes(J._DC_LUMA_VALS))
    seg(0xC4, bytes([0x10]) + bytes(J._AC_LUMA_BITS)
        + bytes(J._AC_LUMA_VALS))
    seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
    out.extend(entropy)
    out.extend(b"\xff\xd9")
    return bytes(out)


class TestSpecFixtures:
    def test_flat_midgray_block(self):
        """DC diff 0 (luma cat-0 code '00') + EOB ('1010'), padded with
        1s → 0b00101011 = 0x2B. All coefficients zero → every pixel is
        the level-shift value 128."""
        img = J.decode_jpeg(_minimal_gray_jpeg(b"\x2b"))
        assert img.shape == (8, 8)
        assert (img == 128).all()

    def test_dc_only_block(self):
        """DC diff 3 → category 2 (luma code '011'), magnitude bits '11',
        EOB '1010' → 0b011111010 + 1-pad → 0x7D 0x7F. Dequantized DC =
        3·16 = 48; the orthonormal IDCT of a DC-only block is constant
        48/8 = 6 → pixels 134."""
        img = J.decode_jpeg(_minimal_gray_jpeg(b"\x7d\x7f"))
        assert (img == 134).all()

    def test_single_ac_coefficient(self):
        """DC 0 ('00'), then AC zigzag-1 = +1: run/size symbol 0x01
        (luma AC code '00'), magnitude bit '1', EOB '1010' → bits
        00+00+1+1010 + pad → 0b00001101·0b01111111 → 0x0D 0x7F.
        Coefficient (0,1) = 1·11 = 11 → pixel (y, x) value =
        round(11·C₀·C₁·cos((2x+1)π/16)) + 128, constant per column."""
        img = J.decode_jpeg(_minimal_gray_jpeg(b"\x0d\x7f"))
        c0, c1 = np.sqrt(1 / 8), 0.5
        x = np.arange(8)
        want = np.clip(np.round(
            11 * c0 * c1 * np.cos((2 * x + 1) * np.pi / 16)) + 128,
            0, 255).astype(np.uint8)
        assert (img == want[None, :]).all()


class TestRoundTrip:
    def test_gray_q100_near_lossless(self):
        a = _gradient(45, 62)
        dec = J.decode_jpeg(J.encode_jpeg(a, quality=100))
        assert dec.shape == a.shape
        assert np.abs(dec.astype(int) - a.astype(int)).max() <= 2

    def test_gray_noise_q100(self):
        rng = np.random.default_rng(7)
        a = rng.integers(0, 256, (33, 41), dtype=np.uint8)
        dec = J.decode_jpeg(J.encode_jpeg(a, quality=100))
        assert np.abs(dec.astype(int) - a.astype(int)).max() <= 2

    def test_rgb_444(self):
        a = _rgb(45, 62)
        dec = J.decode_jpeg(J.encode_jpeg(a, quality=95))
        assert dec.shape == a.shape
        assert np.abs(dec.astype(int) - a.astype(int)).max() <= 6

    def test_rgb_420_subsampled(self):
        a = _rgb(40, 56)
        dec = J.decode_jpeg(J.encode_jpeg(a, quality=95, subsample=True))
        assert dec.shape == a.shape
        # chroma is box-averaged then replicated: tolerant compare
        assert np.abs(dec.astype(int) - a.astype(int)).mean() < 4
        assert np.abs(dec.astype(int) - a.astype(int)).max() <= 24

    def test_restart_markers(self):
        a = _rgb(45, 62)
        enc = J.encode_jpeg(a, quality=92, restart_interval=3)
        assert b"\xff\xd0" in enc or b"\xff\xd1" in enc
        dec = J.decode_jpeg(enc)
        assert np.abs(dec.astype(int) - a.astype(int)).max() <= 10

    def test_odd_dimensions_and_tiny(self):
        for shape in [(1, 1), (7, 9), (8, 8), (17, 3)]:
            a = _gradient(*shape)
            dec = J.decode_jpeg(J.encode_jpeg(a, quality=100))
            assert dec.shape == shape
            assert np.abs(dec.astype(int) - a.astype(int)).max() <= 2

    def test_quality_monotone_size(self):
        a = _rgb(64, 64)
        sizes = [len(J.encode_jpeg(a, quality=q)) for q in (30, 60, 95)]
        assert sizes == sorted(sizes)


class TestErrors:
    def test_not_jpeg(self):
        with pytest.raises(ValueError):
            J.decode_jpeg(b"\x89PNG\r\n")

    def test_progressive_raises(self):
        enc = bytearray(J.encode_jpeg(_gradient(8, 8)))
        i = enc.find(b"\xff\xc0")
        enc[i + 1] = 0xC2
        with pytest.raises(NotImplementedError, match="progressive"):
            J.decode_jpeg(bytes(enc))

    def test_truncated_entropy(self):
        enc = J.encode_jpeg(_gradient(64, 64), quality=100)
        with pytest.raises(ValueError):
            J.decode_jpeg(enc[: len(enc) // 2])

    def test_12bit_raises(self):
        enc = bytearray(J.encode_jpeg(_gradient(8, 8)))
        i = enc.find(b"\xff\xc0")
        enc[i + 4] = 12   # precision byte inside SOF
        with pytest.raises(NotImplementedError):
            J.decode_jpeg(bytes(enc))


class TestDecodeImageDispatch:
    def test_jpeg_payload_routes_to_codec(self):
        from geograypher_spark.operators.multimodal import decode_image

        a = _gradient(24, 24)
        dec = decode_image(J.encode_jpeg(a, quality=100))
        assert dec.shape == (24, 24)
        assert np.abs(dec.astype(int) - a.astype(int)).max() <= 2

    def test_unknown_format_still_raises(self):
        from geograypher_spark.operators.multimodal import decode_image

        with pytest.raises(NotImplementedError):
            decode_image(b"RIFFxxxxWAVE")
