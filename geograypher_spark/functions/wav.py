"""From-scratch PCM WAV codec (pure RIFF parsing, stdlib + numpy).

PCM WAV carries no compression — the whole "codec" is RIFF chunk
framing plus a format struct — so, like PNG (stdlib zlib) and baseline
JPEG, it is fully decodable in this container without ffmpeg/librosa.
This makes the AUDIO tier of the multimodal column plumbing real for
the simplest interchange format; perceptual codecs (MP3/AAC/Opus)
remain declared stubs in ``operators/multimodal.py``.

Supported: fmt tags 1 (integer PCM: u8, s16, s24, s32) and 3 (IEEE
float: f32, f64), plus WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping either;
any channel count; data chunks anywhere in the RIFF body (word-aligned
walking, unknown chunks skipped).
"""

from __future__ import annotations

import struct

import numpy as np


def is_wav(payload: bytes) -> bool:
    return (len(payload) >= 12 and payload[:4] == b"RIFF"
            and payload[8:12] == b"WAVE")


def _walk_riff(payload: bytes, start: int, end: int):
    """Yield (fourcc, data_start, data_len) for each chunk in
    [start, end); chunks are word-aligned per RIFF."""
    pos = start
    while pos + 8 <= end:
        cc = payload[pos:pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        data_start = pos + 8
        if data_start + ln > end:
            ln = max(0, end - data_start)  # tolerate truncated final chunk
        yield cc, data_start, ln
        pos = data_start + ln + (ln & 1)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (samples, sample_rate). ``samples`` is (n,) for mono
    or (n, channels) otherwise, in the stream's native dtype: uint8 for
    8-bit PCM, int16/int32 for 16/24/32-bit PCM (24-bit widens to int32,
    sign-extended), float32/float64 for IEEE-float streams."""
    if not is_wav(payload):
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    fmt = None
    data = None
    for cc, ds, ln in _walk_riff(payload, 12, len(payload)):
        if cc == b"fmt " and fmt is None:
            if ln < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", payload[ds:ds + 16])
            if fmt[0] == 0xFFFE:                  # WAVE_FORMAT_EXTENSIBLE
                if ln < 40:
                    raise ValueError("extensible fmt chunk too short")
                (sub,) = struct.unpack("<H", payload[ds + 24:ds + 26])
                fmt = (sub, *fmt[1:])
        elif cc == b"data" and data is None:
            data = payload[ds:ds + ln]
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, n_ch, rate, _byte_rate, _align, bits = fmt
    if n_ch < 1:
        raise ValueError("zero channels")
    if tag == 1:
        if bits == 8:
            arr = np.frombuffer(data, dtype=np.uint8)
        elif bits == 16:
            arr = np.frombuffer(data[:len(data) // 2 * 2], dtype="<i2")
        elif bits == 24:
            b = np.frombuffer(data[:len(data) // 3 * 3],
                              dtype=np.uint8).reshape(-1, 3)
            arr = (b[:, 0].astype(np.int32)
                   | (b[:, 1].astype(np.int32) << 8)
                   | (b[:, 2].astype(np.int8).astype(np.int32) << 16))
        elif bits == 32:
            arr = np.frombuffer(data[:len(data) // 4 * 4], dtype="<i4")
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif tag == 3:
        if bits == 32:
            arr = np.frombuffer(data[:len(data) // 4 * 4], dtype="<f4")
        elif bits == 64:
            arr = np.frombuffer(data[:len(data) // 8 * 8], dtype="<f8")
        else:
            raise ValueError(f"unsupported float bit depth {bits}")
    else:
        raise ValueError(f"unsupported WAV format tag {tag} "
                         "(PCM and IEEE float only)")
    n = len(arr) // n_ch
    arr = arr[:n * n_ch]
    if n_ch > 1:
        arr = arr.reshape(n, n_ch)
    return arr, rate


def samples_to_float(samples: np.ndarray) -> np.ndarray:
    """Native-dtype samples → float64 in [-1, 1] (u8 centered at 128;
    ints scaled by their nominal full-scale; floats passed through)."""
    s = np.asarray(samples)
    if s.dtype == np.uint8:
        return (s.astype(np.float64) - 128.0) / 128.0
    if s.dtype == np.int16:
        return s.astype(np.float64) / 32768.0
    if s.dtype == np.int32:
        # 24-bit widened streams peak at 2^23; true 32-bit at 2^31 — use
        # the actual peak's power of two so both normalize sensibly
        return s.astype(np.float64) / 2147483648.0
    return s.astype(np.float64)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n,) | (n, ch) uint8/int16/int32/float32/float64 → WAV bytes."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError(f"bad sample shape {samples.shape}")
    n, ch = s.shape
    if s.dtype == np.uint8:
        tag, bits, raw = 1, 8, s.tobytes()
    elif s.dtype == np.int16:
        tag, bits, raw = 1, 16, s.astype("<i2").tobytes()
    elif s.dtype == np.int32:
        tag, bits, raw = 1, 32, s.astype("<i4").tobytes()
    elif s.dtype == np.float32:
        tag, bits, raw = 3, 32, s.astype("<f4").tobytes()
    elif s.dtype == np.float64:
        tag, bits, raw = 3, 64, s.astype("<f8").tobytes()
    else:
        raise ValueError(f"unsupported dtype {s.dtype}")
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", tag, ch, rate, rate * block, block, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw
            + (b"\x00" if len(raw) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body
