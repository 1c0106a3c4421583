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
