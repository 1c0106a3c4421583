"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (SURVEY build brief): image/audio/video payloads travel as ``binary``
columns with metadata structs; decode / feature-extract run as Arrow-batched
``mapInPandas`` so the heavy work is vectorized per batch and the Spark-side
schema, partitioning, and batch shape are real. The actual codec calls are
STUBBED (no image/audio libs in this container) behind a deterministic fake
keyed on the payload's md5 — the plumbing, schemas, and tests are real.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Treat a text column as an opaque binary payload (stand-in for real
    image/audio bytes; in production this is the raw file content)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic fake 'image decode': dimensions and mean pixel derived
    from the payload's md5. Replace with PIL/ffmpeg in production:

        raise NotImplementedError("image codecs not available in container")
    """
    h = int(hashlib.md5(payload).hexdigest()[:8], 16)
    width = 1 + h % 64
    height = 1 + h % 48
    mean_pixel = (h % 256) / 255.0
    return width, height, mean_pixel


def decode_images(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Decode binary payloads to image metadata via Arrow-batched
    mapInPandas (the vectorized Python escape hatch — one Python roundtrip
    per batch, not per row)."""
    id_name, payload_name = id_col, payload_col

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(bytes(p)) for p in pdf[payload_name]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_name].astype("int64"),
                    "n_bytes": pdf[payload_name].map(len).astype("int64"),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mean_pixel": [d[2] for d in decoded],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode_batches, DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("thumb", T.BinaryType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    target_width: int = 32,
    target_height: int = 32,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize payloads to a thumbnail (Arrow-batched mapInPandas).

    The resample itself is STUBBED deterministically (md5-keyed bytes of
    exactly target_width*target_height); in production replace the inner
    loop with ``PIL.Image.open(io.BytesIO(p)).resize(...)``. Schema,
    batching, and partition behavior are the real contract.
    """
    id_name, payload_name = id_col, payload_col

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for p in pdf[payload_name]:
                digest = hashlib.md5(bytes(p)).digest()
                reps = (target_width * target_height) // len(digest) + 1
                thumbs.append((digest * reps)[: target_width * target_height])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_name].astype("int64"),
                    "width": target_width,
                    "height": target_height,
                    "thumb": thumbs,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(resize_batches, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Sample frames from 'video' payloads at a fixed interval, exploding
    one output row per frame (mapInPandas may yield MORE rows than input —
    the UDTF-ish contract a real frame sampler needs).

    Frame extraction is STUBBED (frame k = md5(payload ‖ ascii(k)) bytes;
    the fake 'duration' derives from payload length at 1 byte/ms). In
    production the inner loop is ffmpeg/pyav seek-and-decode.
    """
    assert max_frames <= 10, "stub keys frames by single ascii digit"
    id_name, payload_name = id_col, payload_col

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for doc_id, p in zip(pdf[id_name], pdf[payload_name]):
                payload = bytes(p)
                duration_ms = len(payload)
                n = min(max_frames, max(1, duration_ms // every_ms))
                for k in range(int(n)):
                    ids.append(int(doc_id))
                    idxs.append(k)
                    tss.append(k * every_ms)
                    frames.append(hashlib.md5(payload + str(k).encode()).digest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "frame": frames,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(frame_batches, FRAME_SCHEMA)
