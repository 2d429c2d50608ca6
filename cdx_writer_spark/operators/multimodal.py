"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed through Arrow ``mapInPandas`` stages.

The decode kernels are STUBS in this container (no PIL/ffmpeg/librosa —
see the clearly marked ``_decode_*`` functions, which raise or produce a
deterministic fake).  Everything Spark-side is real and tested: schemas,
batch iteration shape, partition sizing, metadata propagation — swap the
kernel body for the real library call on a production image.

Batch-size note: media payloads are MBs, so these stages rely on the small
``spark.sql.execution.arrow.maxRecordsPerBatch`` set in session.py and
iterate `mapInPandas` batches incrementally (never materialize a whole
partition of decoded frames).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

__all__ = ["IMAGE_META_SCHEMA", "image_features", "audio_frames",
           "video_keyframes",
           "synth_media"]

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("format", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def _decode_image_stub(payload: bytes) -> tuple[int, int, str, list[float]]:
    """STUB — image decoding requires PIL/libjpeg, absent in this
    container.  Produces a deterministic fake (header-derived dims + a
    16-dim byte-histogram 'feature') so the Spark plumbing is testable.
    Production: replace the body with PIL.Image.open(BytesIO(payload))."""
    if payload is None:
        raise NotImplementedError("image decode: payload missing")
    w = 1 + payload[0] if payload else 1
    h = 1 + (payload[1] if len(payload) > 1 else 0)
    hist = [0.0] * 16
    for b in payload[:4096]:
        hist[b >> 4] += 1.0
    s = sum(hist) or 1.0
    return w, h, "stub/raw", [v / s for v in hist]


def image_features(media: DataFrame, id_col: str = "media_id",
                   payload_col: str = "payload") -> DataFrame:
    """binary image column -> (dims, format, feature vector) via Arrow
    batches.  Real plumbing, stubbed kernel (see module docstring)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, fmt, feat = _decode_image_stub(
                    bytes(payload) if payload is not None else None)
                rows.append((mid, w, h, fmt, feat))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              IMAGE_META_SCHEMA.fields])
    return media.select(id_col, payload_col).mapInPandas(
        run, IMAGE_META_SCHEMA)


AUDIO_FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("energy", T.DoubleType()),
])


def audio_frames(media: DataFrame, id_col: str = "media_id",
                 payload_col: str = "payload",
                 frame_bytes: int = 1024) -> DataFrame:
    """Frame-sampling shape: one input row fans out to N frame rows
    (mapInPandas can change cardinality — the video/audio pattern).
    Energy per frame is a stub (sum of bytes); production swaps in a real
    PCM/spectrogram kernel."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "energy": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                for i in range(0, max(len(b), 1), frame_bytes):
                    fr = b[i: i + frame_bytes]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i // frame_bytes)
                    out["energy"].append(float(sum(fr)) / (len(fr) or 1))
            yield pd.DataFrame(out)
    return media.select(id_col, payload_col).mapInPandas(
        run, AUDIO_FRAME_SCHEMA)


VIDEO_KEYFRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("ts_ms", T.LongType()),
    T.StructField("thumb", T.BinaryType()),
])


def video_keyframes(media: DataFrame, id_col: str = "media_id",
                    payload_col: str = "payload", every_n: int = 4,
                    frame_bytes: int = 1024, fps: float = 25.0
                    ) -> DataFrame:
    """Keyframe sampling: every ``every_n``-th frame of each video row
    becomes an output row with its timestamp and a thumbnail payload —
    the decode step is a STUB (ffmpeg/PyAV absent in this container:
    frames are fixed-size byte windows, the "thumbnail" is the frame's
    first 64 bytes); the Spark plumbing — cardinality-changing
    mapInPandas fan-out, bounded Arrow batches, deterministic
    (media_id, frame_idx) keys, timestamp arithmetic — is the real
    production shape and is what the tests pin."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "ts_ms": [],
                   "thumb": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                n_frames = max((len(b) + frame_bytes - 1) // frame_bytes, 1)
                for i in range(0, n_frames, every_n):
                    fr = b[i * frame_bytes: (i + 1) * frame_bytes]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(int(i * 1000.0 / fps))
                    out["thumb"].append(fr[:64])
            yield pd.DataFrame(out)
    return media.select(id_col, payload_col).mapInPandas(
        run, VIDEO_KEYFRAME_SCHEMA)


def synth_media(spark, n: int, payload_kb: int = 4) -> DataFrame:
    """Deterministic fake binary media table (media_id, payload, kind)."""
    rep = payload_kb * 1024 // 64  # sha2-256 hex is 64 chars per repeat
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.repeat(F.sha2(F.col("id").cast("string"), 256), rep)
        .cast("binary").alias("payload"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col("id") % 3 + 1).cast("int")).alias("kind"))
