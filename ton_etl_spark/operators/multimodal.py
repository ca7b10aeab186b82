"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed through `mapInPandas` stages.

The Spark-side mechanics (schemas, Arrow batch shapes, partition-size
control for fat binary rows) are real and tested; the actual
image/audio codecs are NOT available in this environment, so the decode
kernels are stubbed: `strict=True` raises NotImplementedError at the
point a real codec would run, and the default path computes
deterministic fake features derived from the bytes (clearly flagged by
`is_fake_decode=true`) so the pipeline shape is exercisable end-to-end.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),       # image|audio|video
        T.StructField("format", T.StringType()),     # png|wav|mp4 (claimed)
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("data", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("is_fake_decode", T.BooleanType()),
    ]
)


def synthesize_media(documents: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Deterministic fake media rows from the documents table (binary
    payload = zlib(text)); used by tests and the bench to exercise the
    binary-column path without external data."""

    @F.pandas_udf(T.BinaryType())
    def pack(s: pd.Series) -> pd.Series:
        return s.map(lambda t: zlib.compress(t.encode(), 1) if t else b"")

    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return documents.select(
        F.col(id_col).alias("media_id"),
        kinds.alias("kind"),
        F.lit("raw-zlib").alias("format"),
        (F.col(id_col) % 640 + 16).cast("int").alias("width"),
        (F.col(id_col) % 480 + 16).cast("int").alias("height"),
        (F.col(id_col) % 90000).cast("int").alias("duration_ms"),
        pack(F.col(text_col)).alias("data"),
    )


def extract_features(
    media: DataFrame, feature_dim: int = 8, strict: bool = False,
    batch_rows: int = 256,
) -> DataFrame:
    """Decode + feature-extract via mapInPandas. The working-set bound
    for fat binary rows is enforced INSIDE the kernel: each incoming
    Arrow batch is processed in `batch_rows`-row slices and yielded
    incrementally, so peak memory per python worker is one slice of
    decoded output regardless of the session's
    arrow.maxRecordsPerBatch. (Setting that conf here and restoring it
    in a finally block would be a silent no-op — mapInPandas is lazy and
    the conf is read at ACTION time, after restore.) This is the knob
    you tune for 100 MB media blobs at cluster scale, cf. the reference
    raising Kafka limits to 200 MB for mega account states
    (README.md:30-39)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "real image/audio/video codecs are not available in "
                    "this environment; install PIL/ffmpeg and replace "
                    "this kernel"
                )
            for lo in range(0, len(pdf), batch_rows):
                sl = pdf.iloc[lo : lo + batch_rows]
                out = {
                    "media_id": sl["media_id"],
                    "kind": sl["kind"],
                    "n_bytes": sl["data"].map(lambda b: len(b or b"")),
                    "content_sha": sl["data"].map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": sl["data"].map(
                        lambda b: _fake_feature(b, feature_dim)
                    ),
                    "is_fake_decode": True,
                }
                yield pd.DataFrame(out)

    return media.mapInPandas(run, FEATURE_SCHEMA)


def _fake_feature(b: bytes, dim: int) -> list[float]:
    h = hashlib.sha256(b or b"").digest()
    arr = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=">u4")
    return (arr.astype(np.float64) / 2**32).astype(np.float32).tolist()


def sample_frames(media: DataFrame, every_ms: int = 10_000,
                  strict: bool = False) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    offset (explode on a JVM-computed sequence); the frame-decode kernel
    is the stub."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ms"),
        "data",
    )
    if strict:
        raise NotImplementedError("frame decode requires ffmpeg")
    return frames.select(
        "media_id",
        "frame_ms",
        F.sha2(F.concat(F.col("data"), F.col("frame_ms").cast("binary")), 256)
        .alias("frame_sha"),
    )
