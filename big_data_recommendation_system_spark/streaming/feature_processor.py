"""Structured Streaming feature processor — the Spark-native replacement
for the reference's single-process Kafka consumer loop
(ingestion/stream-processor/kafka_streams_processor.py:53-253).

Reference behavior → Spark mapping (SURVEY.md §2.11):

- R1 unbounded per-user session dict  → ``session_window`` with a 30-min
  gap + watermark (we ADD the state bound the reference lacks)
- R2 per-product running counters     → streaming groupBy, update mode
- R3 trailing 1-hour view window      → sliding ``window(ts, 1h, 5m)``
- R4 no late-data policy              → explicit ``withWatermark``
- R5 per-event derived features       → ``applyInPandasWithState``
  (Arrow-batched, bounded state with processing-time timeout)
- R6 multi-sink routing               → ``foreachBatch`` writing 3 sinks
- R7 at-least-once + downstream dedup → checkpoint + dropDuplicates

Source-agnostic: every builder takes a (possibly streaming) events
DataFrame, so the same code runs on a Kafka source
(``readStream.format("kafka")`` + from_json) in production and a file /
memory source in tests.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..config import SESSION_GAP_MINUTES, WATERMARK_DELAY


def session_features(events: DataFrame, watermark: str = WATERMARK_DELAY) -> DataFrame:
    """Gap-based session aggregates per user (R1 with bounded state).
    Events later than the watermark are dropped — the explicit lateness
    policy the reference never defined (R4)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", f"{SESSION_GAP_MINUTES} minutes"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("events_in_session"),
            F.sum("event_weight").alias("session_engagement"),
            F.collect_list("event_type").alias("event_sequence"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "events_in_session",
            "session_engagement",
            F.slice(F.reverse("event_sequence"), 1, 5).alias("recent_events"),
        )
    )


def sliding_hourly_counts(events: DataFrame) -> DataFrame:
    """R3: trailing-1-hour activity, re-evaluated every 5 minutes."""
    return (
        events.withWatermark("ts", WATERMARK_DELAY)
        .groupBy(F.window("ts", "1 hour", "5 minutes"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


# --- R5: per-event enrichment with explicit keyed state ---------------------

_STATE_SCHEMA = StructType(
    [
        StructField("event_count", LongType()),
        StructField("total_weight", LongType()),
        StructField("last_ts_us", LongType()),
    ]
)

_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("user_event_count", LongType()),
        StructField("user_total_weight", LongType()),
        StructField("secs_since_last", DoubleType()),
    ]
)


def _enrich_user_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Stateful per-user enrichment (reference extract_features,
    kafka_streams_processor.py:118-178) — with a 30-min processing-time
    timeout so state is bounded, unlike the reference."""
    if state.hasTimedOut:
        state.remove()
        return
    (user_id,) = key
    count, weight, last_us = state.get if state.exists else (0, 0, None)
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        out = []
        for row in pdf.itertuples(index=False):
            ts_us = int(row.ts.value // 1000)
            secs = (ts_us - last_us) / 1e6 if last_us is not None else None
            count += 1
            weight += int(row.event_weight)
            out.append(
                (user_id, row.event_id, row.ts, row.event_type, count, weight, secs)
            )
            last_us = ts_us
        yield pd.DataFrame(
            out,
            columns=[
                "user_id",
                "event_id",
                "ts",
                "event_type",
                "user_event_count",
                "user_total_weight",
                "secs_since_last",
            ],
        )
    state.update((count, weight, last_us))
    state.setTimeoutDuration(SESSION_GAP_MINUTES * 60 * 1000)


def stateful_user_features(events: DataFrame) -> DataFrame:
    """Per-event running user features via applyInPandasWithState."""
    return (
        events.select("user_id", "event_id", "ts", "event_type", "event_weight")
        .groupBy("user_id")
        .applyInPandasWithState(
            _enrich_user_group,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def route_to_sinks(events: DataFrame, base_dir: str, checkpoint_dir: str):
    """R6 multi-sink routing in one query: every event lands in
    user-features; purchase/signup events also land in
    recommendation-signals; per-k product stats land in product-features.
    One foreachBatch (single source scan per micro-batch, three writes)."""

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            batch.write.mode("append").parquet(os.path.join(base_dir, "user-features"))
            batch.filter(F.col("event_type").isin("purchase", "signup")).write.mode(
                "append"
            ).parquet(os.path.join(base_dir, "recommendation-signals"))
            (
                batch.groupBy("prop_k")
                .agg(
                    F.count(F.lit(1)).alias("n_events"),
                    F.sum("event_weight").alias("engagement"),
                )
                .write.mode("append")
                .parquet(os.path.join(base_dir, "product-features"))
            )
        finally:
            batch.unpersist()

    return (
        events.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
