"""Minimal AVI (RIFF) container parser + writer for MJPEG video.

An MJPEG AVI is just RIFF framing around independent JPEG frames, so
with the from-scratch baseline-JPEG codec (``functions/jpeg.py``)
already in the tree, video frame-sampling becomes REAL for this
container with nothing but chunk walking: no inter-frame state, no
bitstream beyond what the JPEG decoder owns. Inter-frame codecs
(H.264/VP9/AV1) remain declared stubs in ``operators/multimodal.py``.

Layout handled: RIFF 'AVI ' → LIST hdrl (avih + one LIST strl per
stream with strh/strf) → LIST movi with '##dc'/'##db' frame chunks,
optionally nested in LIST 'rec ' groups; idx1 ignored (frames are
walked in stream order). Word-aligned chunks per RIFF.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np


def is_avi(payload: bytes) -> bool:
    return (len(payload) >= 12 and payload[:4] == b"RIFF"
            and payload[8:12] == b"AVI ")


def _walk(payload: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        cc = payload[pos:pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        ds = pos + 8
        if ds + ln > end:
            ln = max(0, end - ds)
        yield cc, ds, ln
        pos = ds + ln + (ln & 1)


def parse_avi(payload: bytes) -> dict:
    """AVI bytes → {"meta": {...}, "frames": [(stream_no, fourcc,
    start, length), ...]} without copying frame bytes. ``meta`` carries
    avih fields (width/height/total_frames/us_per_frame) and the video
    stream's strh handler / strf compression fourccs when present."""
    if not is_avi(payload):
        raise ValueError("not an AVI (bad RIFF/AVI header)")
    meta: dict = {}
    frames: list[tuple[int, bytes, int, int]] = []
    vid_stream = None
    stream_no = 0

    def walk_list(start: int, end: int) -> None:
        nonlocal vid_stream, stream_no
        for cc, ds, ln in _walk(payload, start, end):
            if cc == b"LIST":
                ltype = payload[ds:ds + 4]
                if ltype in (b"hdrl", b"movi", b"rec ", b"strl"):
                    if ltype == b"strl":
                        _parse_strl(ds + 4, ds + ln)
                        stream_no += 1
                    else:
                        walk_list(ds + 4, ds + ln)
            elif cc == b"avih" and ln >= 32:
                us, _rate, _pad, _flags, total, _init, _streams, _bufsz = \
                    struct.unpack("<8I", payload[ds:ds + 32])
                meta["us_per_frame"] = us
                meta["total_frames"] = total
                if ln >= 40:
                    w, h = struct.unpack("<2I", payload[ds + 32:ds + 40])
                    meta["width"], meta["height"] = w, h
            elif len(cc) == 4 and cc[2:4] in (b"dc", b"db") \
                    and cc[:2].isdigit():
                frames.append((int(cc[:2]), cc[2:4], ds, ln))

    def _parse_strl(start: int, end: int) -> None:
        nonlocal vid_stream
        for cc, ds, ln in _walk(payload, start, end):
            if cc == b"strh" and ln >= 8:
                fcc_type = payload[ds:ds + 4]
                handler = payload[ds + 4:ds + 8]
                if fcc_type == b"vids" and vid_stream is None:
                    vid_stream = stream_no
                    meta["video_stream"] = stream_no
                    meta["handler"] = handler.decode("ascii", "replace")
            elif cc == b"strf" and ln >= 20 \
                    and meta.get("video_stream") == stream_no:
                meta["compression"] = payload[ds + 16:ds + 20].decode(
                    "ascii", "replace")

    walk_list(12, len(payload))
    meta.setdefault("video_stream", 0)
    return {"meta": meta, "frames": frames}


def decode_mjpeg_frames(
    payload: bytes, every_nth: int = 1, max_frames: int | None = None,
) -> Iterator[tuple[int, np.ndarray]]:
    """AVI bytes → (frame_idx, decoded RGB/gray array) for every
    ``every_nth`` video frame, decoding only the sampled frames (the
    skip is a pointer walk, no JPEG work). Raises if the video stream
    isn't MJPEG."""
    from . import jpeg as JPEG

    parsed = parse_avi(payload)
    meta = parsed["meta"]
    comp = (meta.get("compression") or meta.get("handler") or "").upper()
    if comp not in ("MJPG", "MJPEG", "JPEG"):
        raise ValueError(
            f"AVI video stream is {comp or 'unknown'!r}, not MJPEG — "
            "inter-frame codecs have no decoder in this environment")
    vs = meta["video_stream"]
    emitted = 0
    idx = 0
    for sn, _kind, ds, ln in parsed["frames"]:
        if sn != vs:
            continue
        if idx % every_nth == 0:
            frame = payload[ds:ds + ln]
            if not JPEG.is_jpeg(frame):
                raise ValueError(f"frame {idx} is not a JPEG stream")
            yield idx, JPEG.decode_jpeg(frame)
            emitted += 1
            if max_frames is not None and emitted >= max_frames:
                return
        idx += 1


def encode_mjpeg_avi(
    frames: "list[np.ndarray]", fps: int = 10, quality: int = 90,
) -> bytes:
    """uint8 frames (h, w[, 3]) → MJPEG AVI bytes (via encode_jpeg).
    All frames must share one shape."""
    from . import jpeg as JPEG

    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    blobs = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("frames differ in shape")
        blobs.append(JPEG.encode_jpeg(f, quality=quality))

    def chunk(cc: bytes, data: bytes) -> bytes:
        return cc + struct.pack("<I", len(data)) + data \
            + (b"\x00" if len(data) & 1 else b"")

    def lst(ltype: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", ltype + data)

    max_sz = max(len(b) for b in blobs)
    avih = struct.pack("<14I", 1_000_000 // fps, max_sz * fps, 0, 0x10,
                       len(blobs), 0, 1, max_sz, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHH8I", 0, 0, 0, 0,
            1, fps, 0, len(blobs), max_sz, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_items = b"".join(chunk(b"00dc", b) for b in blobs)
    movi = lst(b"movi", movi_items)
    # idx1: offsets relative to the start of the movi list's type fourcc
    idx_entries = []
    off = 4
    for b in blobs:
        idx_entries.append(struct.pack("<4sII I", b"00dc", 0x10, off,
                                       len(b)))
        off += 8 + len(b) + (len(b) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
