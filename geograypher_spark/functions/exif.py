"""Pure-Python EXIF GPS extraction from JPEG bytes — no image codec.

Reference S7 (``utils/image.py:10-26``) reads GPS EXIF tags via PIL. PIL
is absent here, but EXIF is just a TIFF structure embedded in the JPEG
APP1 segment: walk JPEG markers to APP1 "Exif\\0\\0", parse the TIFF IFD
chain for the GPSInfo sub-IFD, decode the latitude/longitude/altitude
rationals. Handles both byte orders; ignores everything else (no pixel
decode, so no codec needed).
"""

from __future__ import annotations

import struct

# TIFF tag ids
_GPS_IFD_POINTER = 0x8825
_GPS_LAT_REF = 1
_GPS_LAT = 2
_GPS_LON_REF = 3
_GPS_LON = 4
_GPS_ALT_REF = 5
_GPS_ALT = 6

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def _parse_ifd(buf: bytes, off: int, bo: str) -> dict[int, tuple[int, int, int]]:
    """→ {tag: (type, count, value_offset)}; value_offset points at the
    value bytes (inline or external)."""
    out = {}
    if off < 0 or off + 2 > len(buf):
        return out
    (n,) = struct.unpack_from(bo + "H", buf, off)
    for k in range(n):
        e = off + 2 + 12 * k
        if e + 12 > len(buf):
            break
        tag, typ, count = struct.unpack_from(bo + "HHI", buf, e)
        size = _TYPE_SIZES.get(typ, 1) * count
        voff = e + 8 if size <= 4 else struct.unpack_from(bo + "I", buf, e + 8)[0]
        # drop entries whose value bytes fall outside the block: a
        # truncated/malformed EXIF must degrade to "no GPS", not crash
        # the executor mid-mapInPandas
        if voff + size > len(buf):
            continue
        out[tag] = (typ, count, voff)
    return out


def _rationals(buf: bytes, bo: str, typ: int, count: int, voff: int) -> list[float]:
    vals = []
    for i in range(count):
        num, den = struct.unpack_from(bo + ("II" if typ == 5 else "ii"),
                                      buf, voff + 8 * i)
        vals.append(num / den if den else float("nan"))
    return vals


def _ascii(buf: bytes, count: int, voff: int) -> str:
    return buf[voff:voff + count].rstrip(b"\x00").decode("ascii", "replace")


def parse_tiff_gps(tiff: bytes) -> dict | None:
    """GPS dict from a TIFF/EXIF block (the APP1 payload after Exif\\0\\0).
    Never raises on malformed input — returns None (one corrupt image in a
    100 TB scan must not fail the job)."""
    try:
        return _parse_tiff_gps_strict(tiff)
    except (struct.error, IndexError, ValueError, ZeroDivisionError):
        return None


def _parse_tiff_gps_strict(tiff: bytes) -> dict | None:
    if len(tiff) < 8:
        return None
    if tiff[:2] == b"II":
        bo = "<"
    elif tiff[:2] == b"MM":
        bo = ">"
    else:
        return None
    (ifd0_off,) = struct.unpack_from(bo + "I", tiff, 4)
    ifd0 = _parse_ifd(tiff, ifd0_off, bo)
    if _GPS_IFD_POINTER not in ifd0:
        return None
    typ, count, voff = ifd0[_GPS_IFD_POINTER]
    (gps_off,) = struct.unpack_from(bo + "I", tiff, voff)
    gps = _parse_ifd(tiff, gps_off, bo)
    if _GPS_LAT not in gps or _GPS_LON not in gps:
        return None

    def dms_to_deg(tag, ref_tag, neg_refs):
        typ_, cnt, vo = gps[tag]
        parts = _rationals(tiff, bo, typ_, cnt, vo)
        if not parts:
            return None
        deg = parts[0] + (parts[1] if len(parts) > 1 else 0.0) / 60.0 \
            + (parts[2] if len(parts) > 2 else 0.0) / 3600.0
        if ref_tag in gps:
            t_, c_, v_ = gps[ref_tag]
            if _ascii(tiff, c_, v_).upper() in neg_refs:
                deg = -deg
        return deg

    lat = dms_to_deg(_GPS_LAT, _GPS_LAT_REF, ("S",))
    lon = dms_to_deg(_GPS_LON, _GPS_LON_REF, ("W",))
    if lat is None or lon is None:
        return None
    out = {"lat": lat, "lon": lon}
    if _GPS_ALT in gps:
        typ_, cnt, vo = gps[_GPS_ALT]
        alts = _rationals(tiff, bo, typ_, cnt, vo)
        if alts:
            alt = alts[0]
            if _GPS_ALT_REF in gps:
                t_, c_, v_ = gps[_GPS_ALT_REF]
                if v_ < len(tiff) and tiff[v_] == 1:  # below sea level
                    alt = -alt
            out["alt"] = alt
    return out


def parse_jpeg_gps(data: bytes) -> dict | None:
    """{lat, lon[, alt]} from JPEG bytes, or None if no GPS EXIF. Also
    accepts a bare TIFF/EXIF block (drone pipelines sometimes strip the
    JPEG container). Never raises on malformed input."""
    if not data or len(data) < 4:
        return None
    if data[:2] in (b"II", b"MM"):
        return parse_tiff_gps(data)
    if data[:2] != b"\xff\xd8":
        return None
    off = 2
    while off + 4 <= len(data):
        if data[off] != 0xFF:
            return None
        # any number of 0xFF fill bytes may pad a marker (JPEG spec);
        # treating the pad as the marker desyncs the walk
        while off + 2 <= len(data) and data[off + 1] == 0xFF:
            off += 1
        if off + 4 > len(data):
            return None
        marker = data[off + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            off += 2
            continue
        if marker == 0xDA:      # start of scan — no more metadata
            return None
        (seg_len,) = struct.unpack_from(">H", data, off + 2)
        if seg_len < 2:          # malformed length would loop forever
            return None
        if marker == 0xE1 and data[off + 4:off + 10] == b"Exif\x00\x00":
            return parse_tiff_gps(data[off + 10:off + 2 + seg_len])
        off += 2 + seg_len
    return None


def build_exif_jpeg(
    lat: float, lon: float, alt: float | None = None,
    lat_dms: "list[tuple[int, int]] | None" = None,
    lon_dms: "list[tuple[int, int]] | None" = None,
) -> bytes:
    """Minimal JPEG container holding ONLY a GPS EXIF APP1 segment — the
    writer twin used by tests (and available to sinks that must tag chips
    with their geolocation). ``lat_dms``/``lon_dms`` take explicit
    (num, den) rational triples verbatim — callers that need an exact
    on-disk representation (e.g. the ``exif_gps`` contract oracle) bypass
    the float DMS decomposition, whose trunc-of-float can be off by one
    LSB; ``lat``/``lon`` then contribute only their hemisphere sign."""
    def rat(x, scale=1_000_000):
        return int(round(abs(x) * scale)), scale

    def dms(x):
        x = abs(x)
        d = int(x)
        m = int((x - d) * 60)
        s = (x - d - m / 60) * 3600
        return [(d, 1), (m, 1), rat(s, 10_000)]

    gps_entries = [
        (_GPS_LAT_REF, 2, (b"N\x00" if lat >= 0 else b"S\x00")),
        (_GPS_LAT, 5, lat_dms if lat_dms is not None else dms(lat)),
        (_GPS_LON_REF, 2, (b"E\x00" if lon >= 0 else b"W\x00")),
        (_GPS_LON, 5, lon_dms if lon_dms is not None else dms(lon)),
    ]
    if alt is not None:
        gps_entries.append((_GPS_ALT_REF, 1, bytes([0 if alt >= 0 else 1, 0, 0, 0])))
        gps_entries.append((_GPS_ALT, 5, [rat(alt, 1000)]))
    gps_entries.sort(key=lambda e: e[0])

    # layout: ifd0 @8 (1 entry), gps ifd after, then external payloads
    ifd0_off = 8
    gps_off = ifd0_off + 2 + 12 + 4
    ext_off = gps_off + 2 + 12 * len(gps_entries) + 4
    ext = bytearray()
    entries_bin = bytearray()
    for tag, typ, val in gps_entries:
        if typ == 2 or typ == 1:       # ascii / byte, inline (≤4)
            count = len(val) if typ == 2 else 1
            field = bytes(val).ljust(4, b"\x00")
        else:                          # rationals, external
            count = len(val)
            field = struct.pack("<I", ext_off + len(ext))
            for num, den in val:
                ext += struct.pack("<II", num, den)
        entries_bin += struct.pack("<HHI", tag, typ, count) + field
    tiff = bytearray()
    tiff += struct.pack("<2sHI", b"II", 42, ifd0_off)
    tiff += struct.pack("<H", 1)
    tiff += struct.pack("<HHI", _GPS_IFD_POINTER, 4, 1) + struct.pack("<I", gps_off)
    tiff += struct.pack("<I", 0)
    tiff += struct.pack("<H", len(gps_entries)) + entries_bin + struct.pack("<I", 0)
    tiff += ext
    app1 = b"Exif\x00\x00" + bytes(tiff)
    return (b"\xff\xd8"
            + b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
            + b"\xff\xd9")
