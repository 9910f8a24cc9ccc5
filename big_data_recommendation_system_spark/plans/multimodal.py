"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libraries in this container):
``decode_media_batch`` routes to a clearly-marked NotImplementedError for
real codecs and falls back to a deterministic fake feature extractor
(pure function of the byte payload). Everything Spark-side — binary
schema, partition-preserving mapInPandas, Arrow batch shapes, metadata
struct — is real and oracle-tested, so swapping in a real decoder is a
one-function change.

At 100 TB the shape matters: mapInPandas streams Arrow batches without
materializing the partition, the binary column is never shuffled (feature
extraction is a map stage), and column pruning drops the payload as soon
as features are extracted.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sources.tables import load_table

REAL_CODECS_AVAILABLE = False  # flip when PIL/ffmpeg-style libs exist

MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("mean_luma", DoubleType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in for a real decoder: features derived purely
    from the payload length and bytes, mirrored exactly in the oracle."""
    n = len(payload)
    width = 64 + (n % 192)
    height = 64 + ((n * 7) % 192)
    n_frames = 1 + (n % 16)
    mean_luma = (sum(payload[:64]) % 256) / 255.0 if n else 0.0
    return width, height, n_frames, mean_luma


def decode_media_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: binary payload -> typed media features."""
    if REAL_CODECS_AVAILABLE:
        raise NotImplementedError(
            "real image/audio decode goes here (PIL / torchaudio / pyav); "
            "not available in this container"
        )
    for pdf in batches:
        feats = [_fake_decode(p) for p in pdf["payload"]]
        out = pd.DataFrame(
            feats, columns=["width", "height", "n_frames", "mean_luma"]
        )
        out.insert(0, "n_bytes", [len(p) for p in pdf["payload"]])
        out.insert(0, "media_type", pdf["media_type"].values)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline on synthesized payloads: documents'
    text bytes stand in for image blobs (binary column + metadata),
    features extracted via Arrow-batched mapInPandas."""
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.lit("image")).otherwise(F.lit("audio")).alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    return media.mapInPandas(decode_media_batch, MEDIA_FEATURES_SCHEMA)


# Oracle mirror of the deterministic fake decoder. The first-64-bytes luma
# sum is expressed over the UTF-8 text prefix (ASCII corpus → byte == char
# code, computed via a unicode codepoint sum in both engines).
MEDIA_FEATURES_SQL = """
WITH m AS (
  SELECT doc_id,
    CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
    encode(text) AS payload,
    text
  FROM documents
)
SELECT doc_id, media_type,
  CAST(octet_length(payload) AS INT) AS n_bytes,
  CAST(64 + (octet_length(payload) % 192) AS INT) AS width,
  CAST(64 + ((octet_length(payload) * 7) % 192) AS INT) AS height,
  CAST(1 + (octet_length(payload) % 16) AS INT) AS n_frames,
  CASE WHEN octet_length(payload) = 0 THEN 0.0 ELSE
    (list_sum(list_transform(string_split(substr(text, 1, 64), ''), c -> unicode(c))) % 256) / 255.0
  END AS mean_luma
FROM m
"""


# --- preprocessing plan: resize + frame sampling ----------------------------

TARGET_EDGE = 224  # ML-preprocessing target resolution (longest edge)
MAX_SAMPLED_FRAMES = 4


def media_preprocess_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The preprocessing PLAN a multimodal training pipeline executes per
    media item: aspect-preserving resize to a 224 longest edge and an
    evenly-strided frame sample (≤4 frames) — one output row per
    (doc_id, frame). The actual pixel work is the stubbed decode step;
    the plan (dims, strides, batch shapes) is the real Spark-side
    contract a decoder plugs into.

    All arithmetic is integer (DIV), so the plan is bit-identical across
    engines; the frame explode is ``explode(sequence())`` — linear
    output, no shuffle before the final sort."""
    # Frameless media (n_frames <= 0, possible once a real decoder lands)
    # must emit zero rows: without the filter Spark's sequence(0, -1)
    # descends to [0, -1] and i*n_frames DIV k null-divides, while the
    # SQL mirror's WHERE i < k emits nothing — a silent divergence.
    feats = media_features(spark, sf_dir).filter(F.col("n_frames") > 0)
    long_edge = F.greatest("width", "height")
    k = F.least(F.col("n_frames"), F.lit(MAX_SAMPLED_FRAMES))
    plan = feats.select(
        "doc_id",
        "media_type",
        "width",
        "height",
        "n_frames",
        F.expr(f"CAST(width * {TARGET_EDGE} AS BIGINT) DIV greatest(width, height)")
        .cast("int")
        .alias("out_w"),
        F.expr(f"CAST(height * {TARGET_EDGE} AS BIGINT) DIV greatest(width, height)")
        .cast("int")
        .alias("out_h"),
        k.alias("k"),
        F.explode(
            F.expr(f"sequence(0, least(n_frames, {MAX_SAMPLED_FRAMES}) - 1)")
        ).alias("i"),
    )
    return (
        plan.select(
            "doc_id",
            "media_type",
            "out_w",
            "out_h",
            F.expr("CAST(i * n_frames AS BIGINT) DIV k").cast("int").alias(
                "frame_idx"
            ),
        )
        .orderBy("doc_id", "frame_idx")
    )


MEDIA_PREPROCESS_PLAN_SQL = f"""
WITH feats AS ({MEDIA_FEATURES_SQL}),
plan AS (
  SELECT doc_id, media_type, width, height, n_frames,
    CAST((width * {TARGET_EDGE}) // greatest(width, height) AS INT) AS out_w,
    CAST((height * {TARGET_EDGE}) // greatest(width, height) AS INT) AS out_h,
    least(n_frames, {MAX_SAMPLED_FRAMES}) AS k
  FROM feats
)
SELECT doc_id, media_type, out_w, out_h,
  CAST((i * n_frames) // k AS INT) AS frame_idx
FROM plan CROSS JOIN range(0, {MAX_SAMPLED_FRAMES}) t(i)
WHERE i < k
ORDER BY doc_id, frame_idx
"""
