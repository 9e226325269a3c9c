"""Multimodal (image/audio/video) column pipeline.

Beyond-reference capability (per the build brief): treat media as
opaque ``binary`` columns with typed metadata, and run decode /
feature-extract / resize / frame-sample as Arrow-batched kernels over
``mapInPandas``. The Spark-side plumbing — schemas, batch iteration,
partition sizing — is real and tested; the actual codec calls are
STUBBED (this container ships no image/audio libraries): decode
raises NotImplementedError unless ``fake=True`` installs a
deterministic fake decoder (bytes -> pseudo-pixels) so the dataflow is
testable end-to-end.

Schema conventions:
  media(asset_id long, kind string, payload binary,
        meta struct<width int, height int, sample_rate int,
                    n_frames int, codec string>)
  features(asset_id long, kind string, feature array<float>, dim int)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("n_frames", IntegerType()),
                    StructField("codec", StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("dim", IntegerType()),
    ]
)


def _fake_decode(payload: bytes, meta) -> list[float]:
    """Deterministic fake 'decode': a rolling byte histogram — stands in
    for a real image/audio decoder with the same batch shape."""
    if payload is None:
        return []
    acc = [0.0] * 16
    for i, b in enumerate(payload):
        acc[b % 16] += 1.0
    n = max(1, len(payload))
    return [v / n for v in acc]


def extract_features(
    media: DataFrame,
    fake: bool = False,
    dim: int = 16,
) -> DataFrame:
    """Decode + featurize each asset via mapInPandas (one Arrow batch
    of payloads per call — the batch shape a real codec needs). With
    fake=False this raises NotImplementedError at execution time, by
    design: install a codec-backed decoder in a real deployment."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "no media codecs in this environment; pass fake=True "
                    "for the deterministic test decoder"
                )
            rows = []
            for aid, kind, payload, meta in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                feat = _fake_decode(payload, meta)
                rows.append((int(aid), kind, feat, len(feat)))
            yield pd.DataFrame(
                rows, columns=["asset_id", "kind", "feature", "dim"]
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    fake: bool = False,
) -> DataFrame:
    """Resize each image/video asset to (width, height) via mapInPandas
    — same stub contract as extract_features: the Arrow batch plumbing
    and output schema are real; the pixel resample is a deterministic
    fake (byte stream truncated/padded to w*h) unless a codec-backed
    resampler replaces it. Audio rows pass through untouched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "no media codecs in this environment; pass fake=True "
                    "for the deterministic test resampler"
                )
            rows = []
            for aid, kind, payload, meta in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                meta = dict(meta) if meta is not None else {}
                if kind != "audio" and payload is not None:
                    buf = bytes(payload)
                    out = (buf * (target // max(1, len(buf)) + 1))[:target]
                    payload = out
                    meta["width"] = width
                    meta["height"] = height
                rows.append((int(aid), kind, payload, meta))
            yield pd.DataFrame(
                rows, columns=["asset_id", "kind", "payload", "meta"]
            )

    return media.mapInPandas(run, MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame,
    every_n: int = 10,
) -> DataFrame:
    """Frame sampling plan: one output row per sampled frame index,
    derived from meta.n_frames — pure SQL (sequence + explode), no
    decode. The downstream decode of individual frames would plug into
    extract_features."""
    return media.select(
        "asset_id",
        "kind",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_index"),
    )


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fixture media table (binary payloads derived from
    the asset id)."""
    rows = []
    for i in range(n):
        payload = bytes((i * 7 + j * 13) % 256 for j in range(64 + (i % 32)))
        kind = ["image", "audio", "video"][i % 3]
        meta = (64, 48, 16000, 30 + i % 60, "fake")
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
