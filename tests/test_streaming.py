"""Streaming feature-processor tests: file-source micro-batches through
session windows, stateful enrichment, and 3-sink routing — the Spark
replacement for the reference's consumer loop + connector + watcher."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from big_data_recommendation_system_spark.plans.silver import clean_events, silver_events
from big_data_recommendation_system_spark.sources.tables import load_table
from big_data_recommendation_system_spark.streaming.feature_processor import (
    route_to_sinks,
    session_features,
    sliding_hourly_counts,
    stateful_user_features,
)


@pytest.fixture(scope="module")
def stream_env(spark, sf_dir_small):
    """Write cleaned sf0.001 events as a 4-file parquet dir to stream from."""
    tmp = tempfile.mkdtemp(prefix="bdrs_stream_")
    src = os.path.join(tmp, "source")
    silver = silver_events(spark, sf_dir_small)
    silver.repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema
    yield {"tmp": tmp, "src": src, "schema": schema, "silver_count": silver.count()}
    shutil.rmtree(tmp, ignore_errors=True)


def _read_stream(spark, env):
    return (
        spark.readStream.schema(env["schema"])
        .option("maxFilesPerTrigger", 2)
        .parquet(env["src"])
    )


def test_session_window_stream(spark, stream_env):
    stream = _read_stream(spark, stream_env)
    q = (
        session_features(stream)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM sessions_out")
    assert out.count() > 0
    row = out.first()
    assert row.events_in_session >= 1 and len(row.recent_events) <= 5


def test_sliding_window_stream(spark, stream_env):
    stream = _read_stream(spark, stream_env)
    q = (
        sliding_hourly_counts(stream)
        .writeStream.format("memory")
        .queryName("sliding_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM sliding_out")
    assert out.count() > 0
    # every trailing-1h window must contain 12 x 5-min slides
    w = out.first()
    assert (w.window_end - w.window_start).total_seconds() == 3600


def test_stateful_user_features(spark, stream_env):
    stream = _read_stream(spark, stream_env)
    q = (
        stateful_user_features(stream)
        .writeStream.format("memory")
        .queryName("stateful_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.sql("SELECT * FROM stateful_out")
    # one enriched row per input event, and running counts reach each
    # user's total across micro-batches (state survived the batches)
    assert out.count() == stream_env["silver_count"]
    totals = out.groupBy("user_id").agg(
        F.max("user_event_count").alias("max_count"), F.count("*").alias("n")
    )
    assert totals.filter(F.col("max_count") != F.col("n")).count() == 0


def test_multi_sink_routing(spark, stream_env):
    stream = _read_stream(spark, stream_env)
    sinks = os.path.join(stream_env["tmp"], "sinks")
    ckpt = os.path.join(stream_env["tmp"], "ckpt")
    q = route_to_sinks(stream, sinks, ckpt).start()
    q.awaitTermination(120)
    uf = spark.read.parquet(os.path.join(sinks, "user-features"))
    rs = spark.read.parquet(os.path.join(sinks, "recommendation-signals"))
    pf = spark.read.parquet(os.path.join(sinks, "product-features"))
    assert uf.count() == stream_env["silver_count"]
    assert (
        rs.count()
        == uf.filter(F.col("event_type").isin("purchase", "signup")).count()
    )
    assert pf.count() > 0


def test_streaming_dedup_within_watermark(spark, stream_env):
    """X1 streaming: duplicate event_ids across micro-batches are dropped
    by dropDuplicatesWithinWatermark (at-least-once source → exactly-once
    downstream, SURVEY §2.11 R7)."""
    import json

    dup_src = os.path.join(stream_env["tmp"], "dup_source")
    os.makedirs(dup_src, exist_ok=True)
    rows = [
        {"event_id": i, "ts": f"2024-01-01T00:0{i}:00", "user_id": 1,
         "event_type": "view", "value": 1.0, "event_weight": 1}
        for i in range(3)
    ]
    # the same 3 events land twice (two files → two micro-batches)
    for fname in ["a.json", "b.json"]:
        with open(os.path.join(dup_src, fname), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, event_weight int"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(dup_src)
    )
    q = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT count(*) c FROM dedup_out").first().c == 3


def test_session_window_matches_batch_sessionize(spark, stream_env, sf_dir_small):
    """The streaming session_window (30-min gap) and the batch
    gap-and-island sessionize must agree on session count and event
    totals per user — one semantics, two execution models.

    Real streams have bounded disorder, so the source here is written in
    event-time order (range-partitioned files with increasing mtimes) and
    a final sentinel event advances the watermark past every real
    session so append mode flushes them all."""
    import time as _time

    from big_data_recommendation_system_spark.operators.windows import user_sessions

    silver = silver_events(spark, sf_dir_small)
    src = os.path.join(stream_env["tmp"], "ordered_source")
    (
        silver.repartitionByRange(4, F.col("ts"))
        .sortWithinPartitions("ts")
        .write.parquet(src)
    )
    files = sorted(
        (f for f in os.listdir(src) if f.endswith(".parquet")),
        key=lambda f: spark.read.parquet(os.path.join(src, f))
        .agg(F.min("ts"))
        .first()[0],
    )
    now = _time.time()
    for i, f in enumerate(files):
        os.utime(os.path.join(src, f), (now + i, now + i))
    # sentinel: one far-future event for a user id outside the data
    max_ts = silver.agg(F.max("ts")).first()[0]
    sentinel = silver.limit(1).select(
        F.lit(10**9).alias("event_id"),
        F.lit(max_ts).cast("timestamp") + F.expr("INTERVAL 10 DAYS"),
        F.lit(999999).alias("user_id"),
        *[F.col(c) for c in silver.columns if c not in ("event_id", "ts", "user_id")],
    ).toDF(*silver.columns)
    sentinel_path = os.path.join(src, "zz-sentinel.parquet")
    sentinel.coalesce(1).write.parquet(sentinel_path + "_dir")
    part = [f for f in os.listdir(sentinel_path + "_dir") if f.endswith(".parquet")][0]
    shutil.move(os.path.join(sentinel_path + "_dir", part), sentinel_path)
    shutil.rmtree(sentinel_path + "_dir")
    os.utime(sentinel_path, (now + 100, now + 100))

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src)
    )
    q = (
        session_features(stream)
        .writeStream.format("memory")
        .queryName("sessions_cmp")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in spark.sql(
            "SELECT user_id, count(*) n_sessions, sum(events_in_session) n_events "
            "FROM sessions_cmp WHERE user_id != 999999 GROUP BY user_id"
        ).collect()
    }
    batch = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in user_sessions(spark, sf_dir_small)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
        .collect()
    }
    assert streamed == batch


def test_kafka_wire_format_roundtrip(spark):
    """S1/S2 codec: typed rows → Kafka wire format → decoded rows, with
    bad payloads degrading to nulls (not batch failure)."""
    import json as _json

    from big_data_recommendation_system_spark.streaming.kafka import (
        decode_kafka_batch,
        encode_kafka_batch,
    )

    rows = [
        {"event_id": "e1", "event_type": "view", "user_id": "u1",
         "product_id": "p1", "session_id": "s1",
         "timestamp": "2025-09-05T12:00:00Z"},
        {"event_id": "e2", "event_type": "purchase", "user_id": "u2",
         "product_id": "p2", "session_id": "s2",
         "timestamp": "2025-09-05T12:01:00Z"},
    ]
    typed = spark.createDataFrame(rows)
    wire = encode_kafka_batch(typed, "user_id")
    w = wire.collect()
    assert {r.key for r in w} == {"u1", "u2"}
    assert all(_json.loads(r.value)["event_id"] in ("e1", "e2") for r in w)

    # simulate the full Kafka source schema incl. one corrupt payload
    kafka_rows = [
        ("u1", bytearray(w[0].value.encode()), 0, 100, None),
        ("zz", bytearray(b"NOT JSON"), 0, 101, None),
    ]
    kafka_df = spark.createDataFrame(
        kafka_rows, "key string, value binary, partition int, offset long, timestamp timestamp"
    )
    decoded = decode_kafka_batch(kafka_df, "clickstream").collect()
    good = [r for r in decoded if r.event_id is not None]
    bad = [r for r in decoded if r.event_id is None]
    assert len(good) == 1 and len(bad) == 1
    assert good[0]._kafka_offset == 100 and good[0].user_id in ("u1", "u2")
