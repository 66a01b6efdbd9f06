"""Multimodal column plumbing — image/audio/video as opaque binary columns
with typed metadata (graft extras; NOT in the reference).

The Spark-side machinery (schema, partition-preserving mapInPandas, Arrow
batch shapes, metadata extraction, PSNR validation) is real and tested with
the deterministic sandbox codecs (codec.py).  Real decoders (libjpeg,
ffmpeg) are absent from this container and are stubbed behind
NotImplementedError at exactly one call site (codec.decode_real), so
swapping them in changes no plumbing.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from lshdedup.codec import decode_image, decode_real, encode_image, phash64

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("mean_luma", DoubleType()),
        StructField("std_luma", DoubleType()),
        StructField("phash", LongType()),
    ]
)


def _decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt in ("raw", "qnt"):
        return decode_image(data)
    return decode_real(data, fmt)  # stub → NotImplementedError here


def image_features(df: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Decode + feature-extract over the binary column via mapInPandas —
    one partition-parallel pass; only (id, bytes, fmt) are read."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, data, fmt in zip(pdf[id_col], pdf["bytes"], pdf["fmt"]):
                px = _decode(bytes(data), fmt)
                rows.append(
                    (
                        rid,
                        int(px.shape[1]),
                        int(px.shape[0]),
                        float(px.mean()),
                        float(px.std()),
                        phash64(px),
                    )
                )
            yield pd.DataFrame(rows, columns=IMAGE_FEATURES_SCHEMA.fieldNames())

    return df.select(id_col, "bytes", "fmt").mapInPandas(extract, IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
    ]
)


def resize_images(df: DataFrame, target: int, id_col: str = "image_id") -> DataFrame:
    """Block-sample resize to target×target, re-encoded lossless."""

    def rsz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, data, fmt in zip(pdf[id_col], pdf["bytes"], pdf["fmt"]):
                px = _decode(bytes(data), fmt)
                h, w = px.shape
                ys = (np.arange(target) * h // target).clip(0, h - 1)
                xs = (np.arange(target) * w // target).clip(0, w - 1)
                out = px[np.ix_(ys, xs)]
                rows.append((rid, bytearray(encode_image(out, "raw")), target, target, "raw"))
            yield pd.DataFrame(rows, columns=RESIZED_SCHEMA.fieldNames())

    return df.select(id_col, "bytes", "fmt").mapInPandas(rsz, RESIZED_SCHEMA)


def sample_video_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling — STUB.  The plumbing contract is identical to
    image_features (binary column in, exploded per-frame rows out); an
    ffmpeg-backed decoder replaces the raise on a real cluster."""

    schema = StructType(
        [
            StructField("video_id", StringType()),
            StructField("frame_idx", IntegerType()),
            StructField("bytes", BinaryType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "video decode requires ffmpeg, absent from this sandbox; "
            "plumbing (schema/batching) is in place — see multimodal.py"
        )
        yield  # pragma: no cover

    return df.mapInPandas(sample, schema)
