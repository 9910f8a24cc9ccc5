"""Kafka source/sink adapters (reference: the kafka-python consumer loop
ingestion/stream-processor/kafka_streams_processor.py:13-47 and the JSON
producer base_producer.py:16-37).

No broker exists in the test container, so the *wire-format* codec —
the part with actual logic — is a pure DataFrame transform over the
standard Kafka source schema (key/value binary, topic, partition,
offset, timestamp) and is unit-tested against synthesized frames.
``read_kafka_stream``/``write_kafka_stream`` are thin, documented
assemblies of those tested pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.schemas import TOPIC_SCHEMAS


def decode_kafka_batch(df: DataFrame, topic: str) -> DataFrame:
    """Kafka wire format → typed rows: utf-8 key, JSON value parsed with
    the topic's declared schema (PERMISSIVE: bad payloads yield nulls in
    all fields rather than failing the batch — the reference's
    per-message try/except json.loads). Kafka metadata is kept as
    lineage (`_kafka_partition`, `_kafka_offset`, `_kafka_ts`)."""
    schema = TOPIC_SCHEMAS[topic]
    return df.select(
        F.col("key").cast("string").alias("_kafka_key"),
        F.col("partition").alias("_kafka_partition"),
        F.col("offset").alias("_kafka_offset"),
        F.col("timestamp").alias("_kafka_ts"),
        F.from_json(F.col("value").cast("string"), schema).alias("v"),
    ).select("_kafka_key", "_kafka_partition", "_kafka_offset", "_kafka_ts", "v.*")


def encode_kafka_batch(df: DataFrame, key_col: str) -> DataFrame:
    """Typed rows → Kafka wire format: key = utf-8 of ``key_col``,
    value = JSON of all columns (base_producer.py:25-26 serializers)."""
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"),
    )


def read_kafka_stream(
    spark: SparkSession, brokers: str, topic: str, starting: str = "earliest"
) -> DataFrame:
    """Streaming Kafka source → decoded rows (S2). Requires a broker +
    the spark-sql-kafka package; codec logic is decode_kafka_batch."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting)
        .load()
    )
    return decode_kafka_batch(raw, topic)


def write_kafka_stream(df: DataFrame, brokers: str, topic: str, key_col: str, checkpoint: str):
    """Streaming Kafka sink (S1): JSON values, keyed, checkpointed."""
    return (
        encode_kafka_batch(df, key_col)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
