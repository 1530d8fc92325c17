"""Multimodal (image/audio/video) columns for training-data pipelines.

Design: media is an opaque ``binary`` column with typed metadata columns
beside it — the Spark-native pattern for 100 TB multimodal sets (bytes
stay columnar, metadata prunes/filters push down, partitioning is by
metadata not by blob).  Decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` so bytes cross to Python once per
batch, not per row.

The actual codec work is STUBBED (no PIL/ffmpeg in this environment):
``decode_image_meta`` parses real PNG/JPEG/GIF headers with pure Python
(deterministic, tested); ``extract_features`` computes a deterministic
byte-histogram signature standing in for a real embedding model.  The
Spark-side plumbing — schema, batching, partition behaviour — is real.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id bigint, kind string, content binary, "
                "source string")


def _parse_image_header(b: bytes) -> tuple[str, int, int]:
    """Pure-python PNG/JPEG/GIF header parse; ('unknown', -1, -1) otherwise."""
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        w, h = struct.unpack(">II", b[16:24])
        return "png", w, h
    if b[:3] == b"GIF" and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return "gif", w, h
    if b[:2] == b"\xff\xd8":  # JPEG: walk segments for SOF0/2
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker in (0xC0, 0xC2):
                h, w = struct.unpack(">HH", b[i + 5:i + 9])
                return "jpeg", w, h
            seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
            i += 2 + seg_len
    return "unknown", -1, -1


def decode_image_meta(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Arrow-batched header decode → (format, width, height, n_bytes).

    A real pipeline swaps ``_parse_image_header`` for PIL decode; the
    mapInPandas shape (schema, batching) is what matters at scale.
    """
    from pyspark.sql.types import (
        IntegerType, LongType, StringType, StructField, StructType,
    )

    # StructType.add mutates in place — always build a fresh copy, never
    # extend df.schema directly.
    out_schema = StructType(list(df.schema.fields) + [
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ])

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = [_parse_image_header(b or b"") for b in pdf[content_col]]
            pdf = pdf.copy()
            pdf["format"] = [m[0] for m in meta]
            pdf["width"] = np.int32([m[1] for m in meta])
            pdf["height"] = np.int32([m[2] for m in meta])
            pdf["n_bytes"] = [len(b or b"") for b in pdf[content_col]]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def extract_features(df: DataFrame, content_col: str = "content",
                     dim: int = 16) -> DataFrame:
    """Deterministic byte-histogram 'embedding' (stub for a model pass).

    Real deployments broadcast model weights and run the forward pass here
    — the Arrow batch boundary and output schema are identical.
    """
    from pyspark.sql.types import (
        ArrayType, FloatType, StructField, StructType,
    )

    out_schema = StructType(list(df.schema.fields)
                            + [StructField("features",
                                           ArrayType(FloatType()))])

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for b in pdf[content_col]:
                arr = np.frombuffer(b or b"\x00", dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
                total = max(int(hist.sum()), 1)
                feats.append((hist / total).astype(np.float32).tolist())
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def frame_sample_plan(df: DataFrame, n_frames_col: str = "n_frames",
                      every: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode a frame-index plan per clip
    (decode itself would run in a later mapInPandas).  Pure column ops —
    the plan fan-out happens executor-side."""
    idx = F.sequence(F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)),
                     F.lit(every))
    return df.withColumn("frame_idx", F.explode(idx))


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize placeholder: annotates target dims; raises on execute-decode
    (no image libs in this container) if actually asked to produce pixels."""
    return (df.withColumn("target_w", F.lit(width))
            .withColumn("target_h", F.lit(height)))
