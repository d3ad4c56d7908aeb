"""Minimal GeoTIFF encoder/decoder — pure struct packing, no libtiff.

The reference writes real GTiff rasters via rasterio
(``predictors/ortho_segmentor.py:330-431``); this container has no GDAL,
so S10 gets a from-scratch encoder for the exact subset the sink needs:
single-band uint8, uncompressed, one strip, little-endian, with the three
GeoTIFF tags (pixel scale, tiepoint, GeoKey directory carrying the
projected EPSG code) plus GDAL's nodata tag. Readable by GDAL/QGIS/
rasterio (baseline TIFF 6.0 + GeoTIFF 1.1 keys).

A matching ``read_geotiff`` decodes exactly this subset — used by tests
for byte-level round-trip verification and by downstream consumers that
need to re-open the sink's own tiles.
"""

from __future__ import annotations

import struct

import numpy as np

# TIFF tag ids
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SAMPLES_PER_PIXEL = 277
_ROWS_PER_STRIP = 278
_STRIP_BYTE_COUNTS = 279
_MODEL_PIXEL_SCALE = 33550
_MODEL_TIEPOINT = 33922
_GEO_KEY_DIRECTORY = 34735
_GDAL_NODATA = 42113

_TYPE_SHORT = 3       # uint16
_TYPE_LONG = 4        # uint32
_TYPE_ASCII = 2
_TYPE_DOUBLE = 12


def encode_geotiff(
    img: np.ndarray, origin_x: float, origin_y: float, gsd: float,
    epsg: int = 32610, nodata: int | None = 255,
) -> bytes:
    """uint8 (h, w) image + affine (north-up, square pixels) → GeoTIFF
    bytes. ``origin_x/origin_y`` = OUTER corner of pixel (0, 0) (GeoTIFF
    PixelIsArea raster space, y decreasing southward)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape
    pixel_data = img.tobytes()

    # GeoKeyDirectory: version 1.1.0, 3 keys
    geokeys = [
        (1, 1, 0, 3),
        (1024, 0, 1, 1),        # GTModelTypeGeoKey = projected
        (1025, 0, 1, 1),        # GTRasterTypeGeoKey = PixelIsArea
        (3072, 0, 1, epsg),     # ProjectedCSTypeGeoKey
    ]
    geokey_shorts = [v for row in geokeys for v in row]
    pixel_scale = (float(gsd), float(gsd), 0.0)
    tiepoint = (0.0, 0.0, 0.0, float(origin_x), float(origin_y), 0.0)
    nodata_ascii = (f"{nodata}\x00".encode("ascii") if nodata is not None else b"")

    entries = []  # (tag, type, count, value_or_payload)
    entries.append((_IMAGE_WIDTH, _TYPE_LONG, 1, w))
    entries.append((_IMAGE_LENGTH, _TYPE_LONG, 1, h))
    entries.append((_BITS_PER_SAMPLE, _TYPE_SHORT, 1, 8))
    entries.append((_COMPRESSION, _TYPE_SHORT, 1, 1))          # none
    entries.append((_PHOTOMETRIC, _TYPE_SHORT, 1, 1))          # BlackIsZero
    entries.append((_STRIP_OFFSETS, _TYPE_LONG, 1, 8))         # data @ 8
    entries.append((_SAMPLES_PER_PIXEL, _TYPE_SHORT, 1, 1))
    entries.append((_ROWS_PER_STRIP, _TYPE_LONG, 1, h))
    entries.append((_STRIP_BYTE_COUNTS, _TYPE_LONG, 1, len(pixel_data)))
    entries.append((_MODEL_PIXEL_SCALE, _TYPE_DOUBLE, 3, pixel_scale))
    entries.append((_MODEL_TIEPOINT, _TYPE_DOUBLE, 6, tiepoint))
    entries.append((_GEO_KEY_DIRECTORY, _TYPE_SHORT, len(geokey_shorts),
                    geokey_shorts))
    if nodata_ascii:
        entries.append((_GDAL_NODATA, _TYPE_ASCII, len(nodata_ascii),
                        nodata_ascii))
    entries.sort(key=lambda e: e[0])  # TIFF requires ascending tag order

    ifd_offset = 8 + len(pixel_data)
    ifd_size = 2 + 12 * len(entries) + 4
    ext_offset = ifd_offset + ifd_size  # external payloads after the IFD

    def pack_value(typ, count, value):
        """→ (12-byte entry value field, external payload bytes or b'')."""
        if typ == _TYPE_SHORT and count == 1:
            return struct.pack("<HH", value, 0), b""
        if typ == _TYPE_LONG and count == 1:
            return struct.pack("<I", value), b""
        if typ == _TYPE_SHORT:
            payload = struct.pack(f"<{count}H", *value)
        elif typ == _TYPE_DOUBLE:
            payload = struct.pack(f"<{count}d", *value)
        elif typ == _TYPE_ASCII:
            payload = value
        else:  # pragma: no cover
            raise ValueError(typ)
        if len(payload) <= 4:
            return payload.ljust(4, b"\x00"), b""
        return None, payload  # offset patched below

    ext_payloads = []
    packed = []
    cursor = ext_offset
    for tag, typ, count, value in entries:
        field, payload = pack_value(typ, count, value)
        if payload:
            field = struct.pack("<I", cursor)
            ext_payloads.append(payload)
            cursor += len(payload)
        packed.append(struct.pack("<HHI", tag, typ, count) + field)

    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_offset)
    out += pixel_data
    out += struct.pack("<H", len(entries))
    out += b"".join(packed)
    out += struct.pack("<I", 0)  # next IFD = none
    out += b"".join(ext_payloads)
    return bytes(out)


def read_geotiff(buf: bytes):
    """Decode the subset ``encode_geotiff`` writes (any baseline
    single-strip uint8 little-endian TIFF with the same tags). Returns
    (img, meta) with meta = {origin_x, origin_y, gsd, epsg, nodata}."""
    byte_order, magic, ifd_offset = struct.unpack_from("<2sHI", buf, 0)
    if byte_order != b"II" or magic != 42:
        raise ValueError("not a little-endian TIFF")
    (n_entries,) = struct.unpack_from("<H", buf, ifd_offset)
    tags = {}
    for k in range(n_entries):
        off = ifd_offset + 2 + 12 * k
        tag, typ, count = struct.unpack_from("<HHI", buf, off)
        fields = {_TYPE_SHORT: ("H", 2), _TYPE_LONG: ("I", 4),
                  _TYPE_DOUBLE: ("d", 8), _TYPE_ASCII: ("s", 1)}
        fmt, size = fields[typ]
        total = size * count
        voff = off + 8 if total <= 4 else struct.unpack_from("<I", buf, off + 8)[0]
        if typ == _TYPE_ASCII:
            tags[tag] = buf[voff:voff + count].rstrip(b"\x00").decode("ascii")
        else:
            vals = struct.unpack_from(f"<{count}{fmt}", buf, voff)
            tags[tag] = vals[0] if count == 1 else vals
    w, h = tags[_IMAGE_WIDTH], tags[_IMAGE_LENGTH]
    data_off = tags[_STRIP_OFFSETS]
    n = tags[_STRIP_BYTE_COUNTS]
    img = np.frombuffer(buf[data_off:data_off + n], dtype=np.uint8).reshape(h, w)
    scale = tags.get(_MODEL_PIXEL_SCALE, (1.0, 1.0, 0.0))
    tie = tags.get(_MODEL_TIEPOINT, (0.0,) * 6)
    geokeys = tags.get(_GEO_KEY_DIRECTORY, ())
    epsg = None
    for k in range(4, len(geokeys), 4):
        if geokeys[k] == 3072:
            epsg = geokeys[k + 3]
    nodata = tags.get(_GDAL_NODATA)
    return img, {
        "origin_x": tie[3], "origin_y": tie[4], "gsd": scale[0],
        "epsg": epsg, "nodata": int(nodata) if nodata is not None else None,
    }
