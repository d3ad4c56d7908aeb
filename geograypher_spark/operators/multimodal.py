"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns + typed metadata structs; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
stages. Real from-scratch codecs cover each tier's codec-free format:
``decode_image`` decodes PNG (``functions/png.py``, all legal depths +
Adam7) and baseline JPEG (``functions/jpeg.py``) — the reference's two
actual imagery formats; ``decode_audio`` decodes PCM/float WAV
(``functions/wav.py``); ``sample_video_frames`` walks MJPEG AVI
containers (``functions/avi.py``, frames through the JPEG codec).
Perceptual/inter-frame codecs (MP3/AAC, H.264/VP9 — ffmpeg territory)
stay declared stubs: the call raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder (seeded from
the payload hash) produces stable arrays so the Spark-side plumbing —
schema, partitioning, UDF signature, batch shape — is real and tested
end to end for every format.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType()),
    T.StructField("kind", T.StringType()),          # image | audio | video
    T.StructField("payload", T.BinaryType()),       # opaque encoded bytes
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])


def _fake_decode(payload: bytes, h: int, w: int) -> np.ndarray:
    """Deterministic fake 'decoder': uint8 (h, w, 3) derived from the md5
    of the payload via a closed-form integer recurrence — stable across
    executors/runs AND expressible in plain SQL (pixel p =
    (s*(p+1) + p*p) mod 256 with s = first 8 md5 hex chars as int), so the
    DuckDB oracle can verify pooled features exactly. STUB for the real
    codec."""
    s = int(hashlib.md5(payload).hexdigest()[:8], 16)
    p = np.arange(h * w * 3, dtype=np.int64)
    vals = (s * (p + 1) + p * p) % 256
    return vals.reshape(h, w, 3).astype(np.uint8)


def decode_image(payload: bytes, h: int = 64, w: int = 64, fake: bool = False) -> np.ndarray:
    """PNG and baseline JPEG payloads decode for real
    (``functions/png.py`` / ``functions/jpeg.py`` — the reference's two
    actual imagery formats, ``geograypher/utils/image.py:10-26``);
    anything else needs ``fake=True`` (deterministic stub). ``h``/``w``
    only parameterize the fake decoder — real decodes return the image's
    own dimensions as (h, w[, c]) uint8."""
    if fake:
        return _fake_decode(payload, h, w)
    from ..functions import jpeg as JPEG
    from ..functions import png as PNG

    if PNG.is_png(bytes(payload)):
        return PNG.decode_png(bytes(payload))
    if JPEG.is_jpeg(bytes(payload)):
        return JPEG.decode_jpeg(bytes(payload))
    raise NotImplementedError(
        "only PNG and baseline JPEG decode natively in this environment "
        "(functions/png.py, functions/jpeg.py); pass fake=True for the "
        "deterministic stub decoder")


def _fake_audio(payload: bytes, n: int, rate: int) -> tuple[np.ndarray, int]:
    """Deterministic fake audio 'decoder': int16 mono derived from the
    payload md5 via the same closed-form recurrence as ``_fake_decode``
    (value v = ((s*(i+1) + i*i) mod 65536) - 32768). STUB for
    perceptual codecs."""
    s = int(hashlib.md5(payload).hexdigest()[:8], 16)
    i = np.arange(n, dtype=np.int64)
    vals = (s * (i + 1) + i * i) % 65536 - 32768
    return vals.astype(np.int16), rate


def decode_audio(
    payload: bytes, n: int = 16000, rate: int = 16000, fake: bool = False,
) -> tuple[np.ndarray, int]:
    """→ (samples, sample_rate). PCM / IEEE-float WAV decodes for real
    (``functions/wav.py`` — native dtype, (n,) mono or (n, ch));
    perceptual codecs (MP3/AAC/Opus) need ``fake=True`` (deterministic
    int16 stub parameterized by ``n``/``rate``)."""
    if fake:
        return _fake_audio(payload, n, rate)
    from ..functions import wav as WAV

    if WAV.is_wav(bytes(payload)):
        return WAV.decode_wav(bytes(payload))
    raise NotImplementedError(
        "only PCM/IEEE-float WAV decodes natively in this environment "
        "(functions/wav.py); pass fake=True for the deterministic stub")


AUDIO_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),          # of [-1,1]-normalized mono mix
    T.StructField("peak", T.DoubleType()),
    T.StructField("zero_crossings", T.LongType()),
])


def audio_features(
    media: DataFrame, n: int = 16000, rate: int = 16000, fake: bool = True,
) -> DataFrame:
    """decode → normalized mono mix → scalar features, one mapInPandas
    pass over ``kind == 'audio'`` rows (mirror of ``image_features``)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.wav import samples_to_float

        for pdf in batches:
            out = {k: [] for k in ("media_ref", "sample_rate", "n_samples",
                                   "channels", "duration_s", "rms", "peak",
                                   "zero_crossings")}
            for _, row in pdf.iterrows():
                samples, sr = decode_audio(bytes(row["payload"]), n, rate,
                                           fake=fake)
                ch = 1 if samples.ndim == 1 else samples.shape[1]
                mono = samples_to_float(samples)
                if mono.ndim == 2:
                    mono = mono.mean(axis=1)
                nz = mono[mono != 0.0]
                out["media_ref"].append(row["media_ref"])
                out["sample_rate"].append(int(sr))
                out["n_samples"].append(len(mono))
                out["channels"].append(ch)
                out["duration_s"].append(len(mono) / sr if sr else 0.0)
                out["rms"].append(
                    float(np.sqrt(np.mean(mono ** 2))) if len(mono) else 0.0)
                out["peak"].append(
                    float(np.abs(mono).max()) if len(mono) else 0.0)
                out["zero_crossings"].append(
                    int(np.sum(np.signbit(nz[1:]) != np.signbit(nz[:-1]))))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").mapInPandas(
        gen, schema=AUDIO_FEATURE_SCHEMA)


FEATURE_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("mean_g", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),  # pooled embedding
])


def image_features(
    media: DataFrame, h: int = 64, w: int = 64, pool: int = 4, fake: bool = True,
) -> DataFrame:
    """decode → resize(h,w) → grid-pooled feature vector, one mapInPandas
    pass. Batch shape: one decoded image at a time inside a vectorized
    postprocess (the decode itself is the stub)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_ref", "height", "width",
                                   "mean_r", "mean_g", "mean_b", "feature")}
            for _, row in pdf.iterrows():
                img = decode_image(bytes(row["payload"]), h, w, fake=fake)
                out["media_ref"].append(row["media_ref"])
                out["height"].append(img.shape[0])
                out["width"].append(img.shape[1])
                m = img.reshape(-1, 3).mean(axis=0)
                out["mean_r"].append(float(m[0]))
                out["mean_g"].append(float(m[1]))
                out["mean_b"].append(float(m[2]))
                # pool x pool grid mean per channel → flat feature
                ph, pw = img.shape[0] // pool, img.shape[1] // pool
                pooled = img[:ph * pool, :pw * pool].reshape(
                    pool, ph, pool, pw, 3).mean(axis=(1, 3))
                out["feature"].append(pooled.ravel().astype(np.float32))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(gen, schema=FEATURE_SCHEMA)


def exif_lonlat(media: DataFrame, parse_payload: bool = True) -> DataFrame:
    """S7: lon/lat per image (reference ``utils/image.py:10-26``). Two
    sources, meta map first: ingest pipelines that already surfaced
    ``exif_lon``/``exif_lat`` keys win; otherwise the GPS EXIF tags are
    parsed straight from the JPEG payload bytes by the pure-Python TIFF
    walker (``functions/exif.py`` — no image codec involved, so this works
    in codec-less environments and never decodes pixels)."""
    meta_path = media.select(
        "media_ref",
        F.element_at("meta", "exif_lon").cast("double").alias("lon"),
        F.element_at("meta", "exif_lat").cast("double").alias("lat"),
    )
    if not parse_payload:
        return meta_path.filter(
            F.col("lon").isNotNull() & F.col("lat").isNotNull())

    from ..functions.exif import parse_jpeg_gps

    schema = T.StructType([
        T.StructField("media_ref", T.StringType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_ref": [], "lon": [], "lat": []}
            for _, row in pdf.iterrows():
                meta = row["meta"] or {}
                lon, lat = meta.get("exif_lon"), meta.get("exif_lat")
                if lon is not None and lat is not None:
                    lon, lat = float(lon), float(lat)
                else:
                    gps = parse_jpeg_gps(bytes(row["payload"] or b""))
                    if gps is None:
                        continue
                    lon, lat = gps["lon"], gps["lat"]
                out["media_ref"].append(row["media_ref"])
                out["lon"].append(lon)
                out["lat"].append(lat)
            yield pd.DataFrame(out)

    return media.mapInPandas(gen, schema=schema)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_ref", T.StringType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),       # raw uint8 h*w*3
])


def sample_video_frames(
    media: DataFrame, every_nth: int = 10, n_frames: int = 30,
    h: int = 32, w: int = 32, fake: bool = True,
) -> DataFrame:
    """video → every-nth frame rows (frame as raw uint8 RGB bytes).
    MJPEG AVI payloads decode for real (``functions/avi.py`` container
    walk + the JPEG codec; only sampled frames pay JPEG work, and
    ``n_frames`` caps the emitted rows per video); inter-frame codecs
    need ``fake=True`` (deterministic stub sized by ``h``/``w``). The
    row-explosion plumbing — one media row → many frame rows,
    partition-friendly — is identical on both paths."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import avi as AVI

        for pdf in batches:
            out = {"media_ref": [], "frame_idx": [], "height": [],
                   "width": [], "frame": []}

            def emit(ref, idx, frame):
                if frame.ndim == 2:               # gray JPEG → stack to RGB
                    frame = np.repeat(frame[:, :, None], 3, axis=2)
                out["media_ref"].append(ref)
                out["frame_idx"].append(idx)
                out["height"].append(frame.shape[0])
                out["width"].append(frame.shape[1])
                out["frame"].append(np.ascontiguousarray(frame).tobytes())

            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                if fake:
                    for i in range(0, n_frames, every_nth):
                        emit(row["media_ref"], i,
                             _fake_decode(payload + i.to_bytes(4, "little"),
                                          h, w))
                elif AVI.is_avi(payload):
                    for i, frame in AVI.decode_mjpeg_frames(
                            payload, every_nth=every_nth,
                            max_frames=max(1, -(-n_frames // every_nth))):
                        emit(row["media_ref"], i, frame)
                else:
                    raise NotImplementedError(
                        "only MJPEG AVI decodes natively in this "
                        "environment (functions/avi.py); pass fake=True "
                        "for the deterministic stub")
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(gen, schema=FRAME_SCHEMA)
