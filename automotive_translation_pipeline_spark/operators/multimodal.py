"""Multimodal columns (BASELINE.json extension surface).

Contract: media rides as an opaque ``binary`` column + a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages so raw bytes never round-trip
through the driver and each partition processes its media locally.

The actual codecs (PIL/ffmpeg/soundfile) are NOT in this container, so
the decode kernels are stubbed: ``decode_stub=True`` (default) produces
deterministic fake features so the Spark-side plumbing — schema,
partitioning, batch shapes, null handling — is real and tested;
``decode_stub=False`` raises NotImplementedError at the exact point a
real codec plugs in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 8

_FEATURES_SCHEMA = (
    "media_id long, media_type string, n_bytes long, feature array<float>"
)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests: content bytes are
    a function of media_id, so every feature downstream is replayable."""
    rows = []
    for i in range(n):
        mtype = ("image", "audio", "video")[i % 3]
        content = hashlib.sha256(str(i).encode()).digest() * (i % 5 + 1)
        rows.append(
            (
                i,
                mtype,
                bytearray(content),
                (64 + i % 512, 48 + i % 384, 1000 * (i % 90 + 1), "synthetic"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _stub_feature(content: bytes | None, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic fake embedding: normalized byte histogram buckets.
    Replace with a real model call when codecs are available."""
    if not content:
        return [0.0] * dim
    buckets = [0] * dim
    for b in content:
        buckets[b % dim] += 1
    total = float(len(content))
    return [round(x / total, 6) for x in buckets]


def extract_features(
    media: DataFrame, decode_stub: bool = True, batch_hint: int | None = None
) -> DataFrame:
    """Decode + feature-extract as a mapInPandas stage.

    Arrow streams (media_id, media_type, content) batches into Python;
    each batch yields fixed-width feature vectors. Binary payloads never
    touch the driver; partition count controls decode parallelism.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg; not in this container"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(
                        lambda c: len(c) if c is not None else 0
                    ),
                    "feature": pdf["content"].map(_stub_feature),
                }
            )

    cols = media.select("media_id", "media_type", "content")
    return cols.mapInPandas(run, _FEATURES_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000, decode_stub: bool = True
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame offset.
    The offsets come from metadata (duration), so the plan — explode to
    frame rows, then decode per frame — is exact even with the stubbed
    decoder."""
    frames = (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_offset_ms"),
        )
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real frame decode requires ffmpeg")
            pdf = pdf.copy()
            # Stub: frame fingerprint derived from (id, offset).
            pdf["frame_sha"] = [
                hashlib.sha256(f"{m}:{o}".encode()).hexdigest()[:16]
                for m, o in zip(pdf["media_id"], pdf["frame_offset_ms"])
            ]
            yield pdf

    return frames.mapInPandas(
        decode, "media_id long, frame_offset_ms long, frame_sha string"
    )


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224, decode_stub: bool = True
) -> DataFrame:
    """Image resize stage: binary in → binary out, metadata updated.
    Stub keeps bytes verbatim but rewrites metadata, exercising the
    binary round-trip through Arrow."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real resize requires PIL")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": pdf["content"],
                    "width": width,
                    "height": height,
                }
            )

    imgs = media.filter(F.col("media_type") == "image").select("media_id", "content")
    return imgs.mapInPandas(
        run, "media_id long, content binary, width int, height int"
    )
