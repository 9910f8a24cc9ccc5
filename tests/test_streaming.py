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
    stateful_product_features,
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


def _ordered_stream_src(spark, stream_env, sf_dir_small, name):
    """Single time-ordered parquet file so the stream's processing order
    equals event-time order (deterministic state replay)."""
    import shutil as _sh

    silver = silver_events(spark, sf_dir_small)
    src = os.path.join(stream_env["tmp"], name)
    tmp_dir = src + "_dir"
    silver.orderBy("ts", "event_id").coalesce(1).write.parquet(tmp_dir)
    os.makedirs(src, exist_ok=True)
    part = [f for f in os.listdir(tmp_dir) if f.endswith(".parquet")][0]
    _sh.move(os.path.join(tmp_dir, part), os.path.join(src, "data.parquet"))
    _sh.rmtree(tmp_dir)
    return src


def _replay_user_features(rows, gap_us):
    """Pure-Python replay of the reference's per-event loop
    (kafka_streams_processor.py:88-178) over time-ordered events —
    independent oracle for the vectorized stateful operator."""
    cats = ["electronics", "books", "home_garden", "toys", "sports", "unknown"]
    state = {}
    out = {}
    for r in rows:
        s = state.setdefault(
            r.user_id,
            {
                "count": 0, "weight": 0, "last": None, "sess_start": None,
                "sess_n": 0, "cat": {}, "seen": set(), "types": [], "prods": [],
            },
        )
        ts_us = int(r.ts.timestamp() * 1_000_000)
        secs = (ts_us - s["last"]) / 1e6 if s["last"] is not None else None
        if s["last"] is None or ts_us - s["last"] > gap_us:
            s.update({"sess_start": ts_us, "sess_n": 0, "cat": {}, "seen": set(),
                      "types": [], "prods": []})
        s["count"] += 1
        s["weight"] += r.event_weight
        s["sess_n"] += 1
        prop = r.prop_k if r.prop_k is not None else -1
        cat = cats[prop % 5] if prop >= 0 else "unknown"
        s["cat"][cat] = s["cat"].get(cat, 0) + 1
        if r.event_type in ("view", "click") and prop >= 0:
            s["seen"].add(prop)
        s["types"].append(r.event_type)
        s["prods"].append(prop)
        top = sorted(s["cat"].items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        returning = prop >= 0 and prop in s["prods"][-5:-1]
        out[r.event_id] = {
            "user_event_count": s["count"],
            "user_total_weight": s["weight"],
            "secs_since_last": secs,
            "session_start_us": s["sess_start"],
            "session_duration_seconds": (ts_us - s["sess_start"]) / 1e6,
            "events_in_session": s["sess_n"],
            "categories_explored": len(s["cat"]),
            "products_viewed_count": len(s["seen"]),
            "preferred_categories": ",".join(k for k, _ in top),
            "recent_event_sequence": ",".join(s["types"][-5:]),
            "is_returning_to_product": returning,
        }
        s["last"] = ts_us
    return out


def test_stateful_user_features_full_replay(spark, stream_env, sf_dir_small):
    """The full R5 feature set must match an independent per-event Python
    replay of the reference loop, row for row, across micro-batches."""
    from big_data_recommendation_system_spark.streaming.feature_processor import (
        _GAP_US,
        _OUTPUT_SCHEMA,
    )

    src = _ordered_stream_src(spark, stream_env, sf_dir_small, "ordered_user_src")
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stateful_user_features(stream)
        .writeStream.format("memory")
        .queryName("r5_full_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM r5_full_out").collect()
    assert {f.name for f in _OUTPUT_SCHEMA.fields} == set(got[0].asDict())

    silver_rows = (
        silver_events(spark, sf_dir_small).orderBy("ts", "event_id").collect()
    )
    expect = _replay_user_features(silver_rows, _GAP_US)
    assert len(got) == len(expect)
    for r in got:
        e = expect[r.event_id]
        assert r.user_event_count == e["user_event_count"], r
        assert r.user_total_weight == e["user_total_weight"], r
        if e["secs_since_last"] is None:
            assert r.secs_since_last is None or r.secs_since_last != r.secs_since_last
        else:
            assert abs(r.secs_since_last - e["secs_since_last"]) < 1e-6, r
        assert int(r.session_start.timestamp() * 1e6) == e["session_start_us"], r
        assert abs(r.session_duration_seconds - e["session_duration_seconds"]) < 1e-6
        assert r.events_in_session == e["events_in_session"], r
        assert r.categories_explored == e["categories_explored"], r
        assert r.products_viewed_count == e["products_viewed_count"], r
        assert r.preferred_categories == e["preferred_categories"], r
        assert r.recent_event_sequence == e["recent_event_sequence"], r
        assert r.is_returning_to_product == e["is_returning_to_product"], r
        assert r.hour_of_day == r.ts.hour and r.is_weekend == (r.ts.weekday() >= 5)


def test_stateful_product_features_replay(spark, stream_env, sf_dir_small):
    """Product-keyed R5 half: running views/conversion/cart rates and the
    trailing-hour view count vs a direct Python replay."""
    src = _ordered_stream_src(spark, stream_env, sf_dir_small, "ordered_prod_src")
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stateful_product_features(stream)
        .writeStream.format("memory")
        .queryName("r5_prod_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM r5_prod_out").collect()

    state = {}
    expect = {}
    rows = (
        silver_events(spark, sf_dir_small)
        .filter(F.col("prop_k").isNotNull())
        .orderBy("ts", "event_id")
        .collect()
    )
    # Peers-inclusive like the operator itself: feature_processor.py
    # computes `recent` via searchsorted(side="right") over ALL view
    # timestamps in the batch, so same-(product, ts) view ties count for
    # each other regardless of event_id order. Replaying sequentially
    # would miss later-processed ties — count against the full list.
    all_vts: dict = {}
    for r in rows:
        if r.event_type in ("view", "click"):
            all_vts.setdefault(r.prop_k, []).append(
                int(r.ts.timestamp() * 1_000_000)
            )
    for r in rows:
        s = state.setdefault(r.prop_k, {"v": 0, "c": 0, "b": 0})
        ts_us = int(r.ts.timestamp() * 1_000_000)
        if r.event_type in ("view", "click"):
            s["v"] += 1
        elif r.event_type == "signup":
            s["c"] += 1
        elif r.event_type == "purchase":
            s["b"] += 1
        denom = max(s["v"], 1)
        recent = sum(
            1
            for t in all_vts.get(r.prop_k, [])
            if ts_us - 3_600_000_000 < t <= ts_us
        )
        expect[r.event_id] = (
            s["v"],
            recent,
            int(s["b"] / denom * 10000 + 0.5) / 100,
            int(s["c"] / denom * 10000 + 0.5) / 100,
        )
    assert len(got) == len(expect)
    for r in got:
        e = expect[r.event_id]
        assert (
            r.product_total_views,
            r.product_recent_views,
            r.product_conversion_rate,
            r.product_cart_rate,
        ) == e, (r, e)


def test_user_features_batch_twin_matches_replay(spark, sf_dir_small):
    """The registered batch twin (streaming/feature_twins.py) must compute
    the same R5 user-feature math as the per-event reference replay — the
    link that makes the twin's DuckDB hash row vouch for the streaming
    operator's feature definitions."""
    from big_data_recommendation_system_spark.streaming.feature_processor import (
        _GAP_US,
    )
    from big_data_recommendation_system_spark.streaming.feature_twins import (
        user_features_batch,
    )

    got = user_features_batch(spark, sf_dir_small).collect()
    silver_rows = (
        silver_events(spark, sf_dir_small).orderBy("ts", "event_id").collect()
    )
    expect = _replay_user_features(silver_rows, _GAP_US)
    assert len(got) == len(expect)
    for r in got:
        e = expect[r.event_id]
        assert r.user_event_count == e["user_event_count"], r
        assert r.user_total_weight == e["user_total_weight"], r
        if e["secs_since_last"] is None:
            assert r.secs_since_last is None  # twin: NULL (stream emits NaN)
        else:
            assert abs(r.secs_since_last - e["secs_since_last"]) < 1e-6, r
        assert int(r.session_start.timestamp() * 1e6) == e["session_start_us"], r
        assert abs(r.session_duration_seconds - e["session_duration_seconds"]) < 1e-6
        assert r.events_in_session == e["events_in_session"], r
        assert r.categories_explored == e["categories_explored"], r
        assert r.products_viewed_count == e["products_viewed_count"], r
        assert r.preferred_categories == e["preferred_categories"], r
        assert r.recent_event_sequence == e["recent_event_sequence"], r
        assert r.is_returning_to_product == e["is_returning_to_product"], r


def test_product_features_batch_twin_matches_replay(spark, sf_dir_small):
    """Product-keyed batch twin vs the same Python replay used for the
    streaming operator."""
    from big_data_recommendation_system_spark.streaming.feature_twins import (
        product_features_batch,
    )

    got = product_features_batch(spark, sf_dir_small).collect()
    state = {}
    expect = {}
    rows = (
        silver_events(spark, sf_dir_small)
        .filter(F.col("prop_k").isNotNull())
        .orderBy("ts", "event_id")
        .collect()
    )
    # The twin's trailing-hour count is a peers-inclusive RANGE window:
    # every view in (ts-1h, ts] counts, INCLUDING other views at exactly
    # the same (product, ts). A sequential prefix would miss same-ts
    # peers processed later, so compute `recent` against the full
    # per-product view-timestamp list instead of the running state.
    all_vts: dict = {}
    for r in rows:
        if r.event_type in ("view", "click"):
            all_vts.setdefault(r.prop_k, []).append(
                int(r.ts.timestamp() * 1_000_000)
            )
    for r in rows:
        s = state.setdefault(r.prop_k, {"v": 0, "c": 0, "b": 0})
        ts_us = int(r.ts.timestamp() * 1_000_000)
        if r.event_type in ("view", "click"):
            s["v"] += 1
        elif r.event_type == "signup":
            s["c"] += 1
        elif r.event_type == "purchase":
            s["b"] += 1
        denom = max(s["v"], 1)
        recent = sum(
            1
            for t in all_vts.get(r.prop_k, [])
            if ts_us - 3_600_000_000 < t <= ts_us
        )
        expect[r.event_id] = (
            s["v"],
            recent,
            int(s["b"] / denom * 10000 + 0.5) / 100,
            int(s["c"] / denom * 10000 + 0.5) / 100,
        )
    assert len(got) == len(expect)
    for r in got:
        assert (
            r.product_total_views,
            r.product_recent_views,
            r.product_conversion_rate,
            r.product_cart_rate,
        ) == expect[r.event_id], r


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


def test_streaming_exact_dedup_matches_batch_twin(spark, stream_env, sf_dir_small):
    """X1 streaming twin (VERDICT r7 item 7): the REAL silver events
    replayed as an at-least-once feed — every event delivered twice
    across two micro-batches — through withWatermark +
    dropDuplicatesWithinWatermark must equal the batch
    ``dedup_exact_events`` operator per key. The watermark delay is the
    dedup horizon: it exceeds the replayed table's timestamp span here,
    so no key's state evicts mid-replay (a production deployment sizes
    it to the at-least-once redelivery window, not the corpus span)."""
    import json

    from big_data_recommendation_system_spark.operators.dedup import (
        dedup_exact_events,
    )
    from big_data_recommendation_system_spark.plans.silver import silver_events

    rows = (
        silver_events(spark, sf_dir_small)
        .select("event_id", "user_id", "event_type", "ts")
        .collect()
    )
    src = os.path.join(stream_env["tmp"], "x1_dedup_src")
    os.makedirs(src, exist_ok=True)
    # the same full event set lands twice (two files -> two micro-batches)
    for fname in ["replay_a.json", "replay_b.json"]:
        with open(os.path.join(src, fname), "w") as f:
            for r in rows:
                f.write(
                    json.dumps(
                        {
                            "event_id": r.event_id,
                            "user_id": r.user_id,
                            "event_type": r.event_type,
                            "ts": r.ts.isoformat(),
                        }
                    )
                    + "\n"
                )
    schema = "event_id long, user_id long, event_type string, ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        stream.withWatermark("ts", "3650 days")
        .dropDuplicatesWithinWatermark(["event_id"])
        .writeStream.format("memory")
        .queryName("x1_dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(
        map(
            tuple,
            spark.sql(
                "SELECT event_id, user_id, event_type FROM x1_dedup_out"
            ).collect(),
        )
    )
    want = sorted(map(tuple, dedup_exact_events(spark, sf_dir_small).collect()))
    assert got == want


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
    # Full per-session equivalence, not just per-user counts: every
    # session's start, end, event count AND engagement must match the
    # batch gap-and-island rollup. session_window's end is
    # last-event + gap, the batch twin's is last-event — normalize by
    # adding the 30-min gap to the batch end.
    streamed = {
        (r.user_id, r.session_start): (
            r.session_end,
            r.events_in_session,
            float(r.session_engagement),
        )
        for r in spark.sql(
            "SELECT * FROM sessions_cmp WHERE user_id != 999999"
        ).collect()
    }
    batch = {
        (r.user_id, r.session_start): (
            r.session_end_plus_gap,
            r.n_events,
            float(r.session_engagement),
        )
        for r in user_sessions(spark, sf_dir_small)
        .withColumn(
            "session_end_plus_gap",
            F.col("session_end") + F.expr("INTERVAL 30 MINUTES"),
        )
        .collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


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


def test_stream_stream_attribution_join(spark, stream_env):
    """Watermarked stream-stream join (view→purchase attribution) over
    multiple micro-batches must equal the same join run as one batch.
    The source is range-partitioned by ts so later micro-batches only
    carry newer events — watermark eviction then never drops a
    legitimate pair (which is exactly how a time-ordered production
    source behaves)."""
    from big_data_recommendation_system_spark.streaming.attribution import (
        attribution_join,
    )

    import glob
    import time

    tmp = stream_env["tmp"]
    src = os.path.join(tmp, "source_by_ts")
    if not os.path.exists(src):
        spark.read.parquet(stream_env["src"]).repartitionByRange(
            4, "ts"
        ).write.parquet(src)
        # FileStreamSource orders batches by file MTIME, not path; stamp
        # strictly increasing mtimes so arrival order == event-time order
        # (all four part files otherwise share one timestamp and the
        # arrival order would be arbitrary — old files arriving after
        # the watermark advanced would be dropped as late, correctly).
        now = time.time()
        for i, f in enumerate(sorted(glob.glob(os.path.join(src, "part-*")))):
            os.utime(f, (now + i, now + i))
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        attribution_join(stream)
        .writeStream.format("memory")
        .queryName("attr_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM attr_out")
    expected = attribution_join(spark.read.parquet(src))
    n_got, n_expected = got.count(), expected.count()
    assert n_expected > 0
    assert n_got == n_expected
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_incremental_near_dup_streaming_batches(spark, stream_env, sf_dir_small):
    """Continuous-ingestion form of incremental_near_dup: incoming docs
    arrive across micro-batches; each batch's band keys join the STATIC
    index band table (with corpus-wide stop-bucket statistics, i.e. the
    maintained index state) and candidates are verified with the same
    signature-agreement + exact-jaccard rule. The union over batches must
    reproduce the batch operator's dup report exactly — one semantics,
    two execution models."""
    import json

    from big_data_recommendation_system_spark.operators import text_dedup as td
    from big_data_recommendation_system_spark.sources.tables import load_table

    is_batch = (
        F.col("doc_id") % td.INCREMENTAL_BATCH_MOD == td.INCREMENTAL_BATCH_REM
    )
    # static state a production deployment would maintain: shingles,
    # signatures, capped band table (stats over the full corpus)
    d = td._shingled_docs(spark, sf_dir_small).cache()
    sigs = td.minhash_signatures(d).cache()
    bands = td.lsh_band_keys(sigs).cache()
    small = (
        bands.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") <= td.MAX_BUCKET_SIZE)
        .select("band", "band_key")
    )
    fband = bands.join(F.broadcast(small), ["band", "band_key"]).cache()
    index_bands = fband.filter(~is_batch).cache()
    index_bands.count()  # materialize the static state once

    incoming_ids = sorted(
        r.doc_id
        for r in load_table(spark, sf_dir_small, "documents")
        .filter(is_batch)
        .select("doc_id")
        .collect()
    )
    half = len(incoming_ids) // 2
    src = os.path.join(stream_env["tmp"], "inc_dedup_src")
    os.makedirs(src, exist_ok=True)
    for fname, ids in [("b0.json", incoming_ids[:half]), ("b1.json", incoming_ids[half:])]:
        with open(os.path.join(src, fname), "w") as f:
            for i in ids:
                f.write(json.dumps({"doc_id": i}) + "\n")

    found: list[tuple[int, int, float]] = []

    def handle(batch_df, _bid):
        batch_bands = fband.join(
            F.broadcast(batch_df.select("doc_id")), "doc_id"
        )
        cand = (
            batch_bands.alias("x")
            .join(
                index_bands.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.band_key") == F.col("y.band_key")),
            )
            .select(
                F.col("x.doc_id").alias("doc_id"),
                F.col("y.doc_id").alias("match_id"),
            )
            .distinct()
        )
        sa = sigs.select("doc_id", F.col("sig").alias("sig_a"))
        sb = sigs.select(
            F.col("doc_id").alias("match_id"), F.col("sig").alias("sig_b")
        )
        agreement = sum(
            (F.element_at("sig_a", i + 1) == F.element_at("sig_b", i + 1)).cast(
                "int"
            )
            for i in range(td.NUM_PERMS)
        )
        da = d.select("doc_id", F.col("sh").alias("sh_a"))
        db = d.select(F.col("doc_id").alias("match_id"), F.col("sh").alias("sh_b"))
        inter = F.size(F.array_intersect("sh_a", "sh_b"))
        union = F.size(F.array_union("sh_a", "sh_b"))
        rows = (
            cand.join(F.broadcast(sa), "doc_id")
            .join(F.broadcast(sb), "match_id")
            .filter(agreement >= td.MIN_SIG_AGREEMENT)
            .join(da, "doc_id")
            .join(db, "match_id")
            .withColumn("jaccard", inter.cast("double") / union)
            .filter(F.col("jaccard") >= td.JACCARD_THRESHOLD)
            .select("doc_id", "match_id", "jaccard")
            .collect()
        )
        found.extend((r.doc_id, r.match_id, r.jaccard) for r in rows)

    q = (
        spark.readStream.schema("doc_id long")
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # roll the streamed pairs up like the operator and compare exactly
    per_doc: dict[int, list[tuple[int, float]]] = {}
    for doc, match, jac in found:
        per_doc.setdefault(doc, []).append((match, jac))
    got = {}
    for doc, matches in per_doc.items():
        best = sorted(matches, key=lambda m: (-m[1], m[0]))[0]
        got[doc] = (len(matches), best[0], best[1])

    want = {
        r.doc_id: (r.n_matches, r.best_match_id, r.best_jaccard)
        for r in td.incremental_near_dup(spark, sf_dir_small).collect()
        if r.is_dup
    }
    assert got == want


def test_streaming_burst_matches_batch(spark, stream_env, sf_dir_small):
    """Ordered replay: the stateful streaming burst operator's FINAL
    emission per (event_type, day) must equal the batch window scoring
    (burst_scores) of the same daily rollup — state must carry prior-day
    counts across micro-batches."""
    import shutil as _sh

    from big_data_recommendation_system_spark.plans.timeseries import (
        burst_scores,
    )
    from big_data_recommendation_system_spark.streaming.burst import (
        streaming_burst_flags,
    )

    silver = silver_events(spark, sf_dir_small)
    # time-ordered source split into 3 sequential files → 3 micro-batches
    src = os.path.join(stream_env["tmp"], "burst_src")
    os.makedirs(src, exist_ok=True)
    rows = silver.select("event_type", "ts").orderBy("ts", "event_id")
    pdf = rows.toPandas()
    n = len(pdf)
    bounds = [0, n // 3, 2 * n // 3, n]
    for i in range(3):
        chunk_dir = os.path.join(stream_env["tmp"], f"burst_chunk_{i}")
        spark.createDataFrame(pdf.iloc[bounds[i] : bounds[i + 1]]).coalesce(
            1
        ).write.parquet(chunk_dir)
        part = [f for f in os.listdir(chunk_dir) if f.endswith(".parquet")][0]
        dst = os.path.join(src, f"data_{i:03d}.parquet")
        _sh.move(os.path.join(chunk_dir, part), dst)
        _sh.rmtree(chunk_dir)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_burst_flags(stream)
        .writeStream.format("memory")
        .queryName("burst_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.sql("SELECT * FROM burst_out").toPandas()
    assert len(out) > 0
    # final emission per day = the one with the complete (max) count
    final = (
        out.sort_values("n_events")
        .groupby(["event_type", "day"], as_index=False)
        .last()
    )
    daily = silver.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    expected = burst_scores(daily).toPandas()
    assert len(final) == len(expected)
    merged = final.merge(
        expected, on=["event_type", "day"], suffixes=("_s", "_b")
    )
    assert len(merged) == len(expected)
    assert (merged["n_events_s"] == merged["n_events_b"]).all()
    assert (merged["trail_days_s"] == merged["trail_days_b"]).all()
    assert (merged["trail_sum_s"] == merged["trail_sum_b"]).all()
    import numpy as np

    zs, zb = merged["burst_z_s"], merged["burst_z_b"]
    both_nan = zs.isna() & zb.isna()
    close = np.isclose(zs.astype(float), zb.astype(float), rtol=1e-12, atol=0)
    assert (both_nan | close).all()


def test_incremental_srp_vector_index_streaming(spark, stream_env, sf_dir_small):
    """Continuous-ingestion form of srp_incremental_pairs: incoming
    vectors arrive across micro-batches; each batch's SRP band keys join
    the STATIC index band table (stop-bucket stats maintained over the
    full corpus) and candidates go through the same two-phase cosine
    verification (double prefilter, exact DECIMAL fold). The union over
    batches must reproduce the batch operator's dup rows exactly — one
    semantics, two execution models, embedding-space twin of the
    incremental near-dup streaming test above."""
    import json

    from big_data_recommendation_system_spark.operators import srp
    from big_data_recommendation_system_spark.sources.tables import load_table

    is_batch = F.col("vec_id") % srp.SRP_BATCH_MOD == srp.SRP_BATCH_REM
    sig = srp._srp_sig(spark, sf_dir_small).cache()
    bands = sig.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"b{b}").alias("key"))
                    for b in range(srp.SRP_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    stop = (
        bands.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > srp.SRP_MAX_BUCKET)
        .select("band", "key")
    )
    fband = bands.join(F.broadcast(stop), ["band", "key"], "left_anti").cache()
    index_bands = fband.filter(~is_batch).cache()
    index_bands.count()  # materialize the static index state once

    dacc = "decimal(30,12)"
    fold = (
        f"CAST(aggregate(zip_with({{a}}, {{b}}, (x, y) -> CAST(x * y AS {dacc})), "
        f"CAST(0 AS {dacc}), (acc, v) -> CAST(acc + v AS {dacc})) AS DOUBLE)"
    )
    dfold = (
        "aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    emb = load_table(spark, sf_dir_small, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("e")
    )
    emb_n = emb.withColumn("nrm", F.sqrt(F.expr(fold.format(a="e", b="e")))).cache()
    emb_n.count()

    incoming_ids = sorted(
        r.vec_id
        for r in load_table(spark, sf_dir_small, "embeddings")
        .filter(is_batch)
        .select("vec_id")
        .collect()
    )
    half = len(incoming_ids) // 2
    src = os.path.join(stream_env["tmp"], "inc_srp_src")
    os.makedirs(src, exist_ok=True)
    for fname, ids in [
        ("b0.json", incoming_ids[:half]),
        ("b1.json", incoming_ids[half:]),
    ]:
        with open(os.path.join(src, fname), "w") as f:
            for i in ids:
                f.write(json.dumps({"vec_id": i}) + "\n")

    found: list[tuple[int, int, float]] = []

    def handle(batch_df, _bid):
        batch_bands = fband.join(F.broadcast(batch_df.select("vec_id")), "vec_id")
        cand = (
            batch_bands.alias("x")
            .join(
                index_bands.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.key") == F.col("y.key")),
            )
            .select(
                F.col("x.vec_id").alias("vec_id"),
                F.col("y.vec_id").alias("match_id"),
            )
            .distinct()
        )
        ena = emb_n.select("vec_id", F.col("e").alias("qa"), F.col("nrm").alias("na"))
        enb = emb_n.select(
            F.col("vec_id").alias("match_id"),
            F.col("e").alias("qb"),
            F.col("nrm").alias("nb"),
        )
        rows = (
            F.broadcast(cand)
            .join(ena, "vec_id")
            .join(enb, "match_id")
            .withColumn(
                "cos_fast",
                F.expr(dfold.format(a="qa", b="qb")) / (F.col("na") * F.col("nb")),
            )
            .filter(F.col("cos_fast") >= srp.SRP_TAU - 1e-9)
            .withColumn(
                "cosine",
                F.expr(fold.format(a="qa", b="qb")) / (F.col("na") * F.col("nb")),
            )
            .filter(F.col("cosine") >= srp.SRP_TAU)
            .select("vec_id", "match_id", "cosine")
            .collect()
        )
        found.extend((r.vec_id, r.match_id, r.cosine) for r in rows)

    q = (
        spark.readStream.schema("vec_id long")
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    per_vec: dict[int, list[tuple[int, float]]] = {}
    for vec, match, cos in found:
        per_vec.setdefault(vec, []).append((match, cos))
    got = {}
    for vec, matches in per_vec.items():
        best = sorted(matches, key=lambda m: (-m[1], m[0]))[0]
        got[vec] = (len(matches), best[0], best[1])

    want = {
        r.vec_id: (r.n_matches, r.best_match_id, r.best_cosine)
        for r in srp.srp_incremental_pairs(spark, sf_dir_small).collect()
        if r.is_dup
    }
    assert got == want
    assert want, "sf0.001 embeddings must contain cross-boundary matches"


def test_streaming_media_decode_matches_batch(spark, stream_env, sf_dir_small):
    """Multimodal plumbing under Structured Streaming: real BMP/WAV
    payloads (binary column) ingested as file micro-batches and decoded
    with the SAME Arrow mapInPandas worker as the batch pipeline must
    reproduce media_decoded_features row-for-row — the continuous-
    ingestion shape of a production media feed (decode is a stateless
    map stage, so it composes with readStream unchanged)."""
    from big_data_recommendation_system_spark.plans.multimodal import (
        MEDIA_DECODED_SCHEMA,
        _MEDIA_BINARY_SCHEMA,
        decode_real_media_batch,
        media_decoded_features,
        synthesize_media_batch,
    )
    from big_data_recommendation_system_spark.sources.tables import load_table

    src = os.path.join(stream_env["tmp"], "media_src")
    docs = load_table(spark, sf_dir_small, "documents").select("doc_id")
    docs.mapInPandas(synthesize_media_batch, _MEDIA_BINARY_SCHEMA).repartition(
        3
    ).write.parquet(src)

    stream = (
        spark.readStream.schema(_MEDIA_BINARY_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.mapInPandas(decode_real_media_batch, MEDIA_DECODED_SCHEMA)
        .writeStream.format("memory")
        .queryName("media_decoded_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM media_decoded_stream").collect())
    )
    want = sorted(
        map(tuple, media_decoded_features(spark, sf_dir_small).collect())
    )
    assert got == want

def test_streaming_model_serving_matches_batch(spark, stream_env, sf_dir_small):
    """Production model-serving shape: documents arrive as file
    micro-batches and each batch is scored inside foreachBatch against
    the FROZEN NB classifier and n-gram LM (the qm:* session substrates,
    trained once per corpus snapshot). Scoring is per-document
    independent, so the union over micro-batches must reproduce the
    batch scorers row-for-row — one serving algebra
    (quality_models.nb_score_docs / lm_score_docs), two execution
    models."""
    from big_data_recommendation_system_spark.functions.text import tokens
    from big_data_recommendation_system_spark.plans import quality_models as qm

    # frozen model state, trained once on the snapshot
    nb = qm.nb_model_table(spark, sf_dir_small)
    bi = qm.lm_bigram_table(spark, sf_dir_small)
    uni = qm.lm_unigram_table(spark, sf_dir_small)
    ratios = qm.dsir_ratio_table(spark, sf_dir_small)
    log_ratios = qm.dsir_log_ratio_table(spark, sf_dir_small)

    src = os.path.join(stream_env["tmp"], "qm_serving_src")
    load_table(spark, sf_dir_small, "documents").select(
        "doc_id", "text"
    ).repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema

    nb_rows: list[tuple] = []
    lm_rows: list[tuple] = []
    dw_rows: list[tuple] = []
    lw_rows: list[tuple] = []
    batch_ids: list[int] = []

    def handle(batch_df, _bid):
        batch_ids.append(_bid)
        tok = batch_df.select("doc_id", tokens(F.col("text")).alias("tok"))
        nb_rows.extend(map(tuple, qm.nb_score_docs(tok, nb).collect()))
        lm_rows.extend(map(tuple, qm.lm_score_docs(tok, bi, uni).collect()))
        dw_rows.extend(map(tuple, qm.dsir_weight_docs(tok, ratios).collect()))
        lw_rows.extend(
            map(tuple, qm.dsir_log_weight_docs(tok, log_ratios).collect())
        )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    lab = qm.labeled_docs_table(spark, sf_dir_small)
    assert sorted(nb_rows) == sorted(
        map(tuple, qm.nb_score_docs(lab, nb).collect())
    )
    assert sorted(lm_rows) == sorted(
        map(tuple, qm.lm_score_docs(lab, bi, uni).collect())
    )
    assert sorted(dw_rows) == sorted(
        map(tuple, qm.dsir_weight_docs(lab, ratios).collect())
    )
    assert sorted(lw_rows) == sorted(
        map(tuple, qm.dsir_log_weight_docs(lab, log_ratios).collect())
    )
    # the stream really was incremental, not one big batch
    assert len(batch_ids) > 1
    assert len(nb_rows) == len(set(r[0] for r in nb_rows))


def test_incremental_dup_spans_streaming_batches(spark, stream_env, sf_dir_small):
    """Continuous-ingestion form of incremental_dup_spans: incoming docs
    arrive across micro-batches; each batch's gram positions semi-join
    the STATIC index gram set (the maintained substring index state) and
    the surviving anchors merge into maximal spans with the same
    gaps-and-islands helper. The union over batches must reproduce the
    batch operator's span plan exactly — one semantics, two execution
    models (a document's grams arrive wholly within its batch, so
    per-batch merging is lossless)."""
    import json

    from big_data_recommendation_system_spark.operators.text_dedup import (
        INCREMENTAL_BATCH_MOD,
        INCREMENTAL_BATCH_REM,
    )
    from big_data_recommendation_system_spark.plans import packing as pk

    is_batch = (
        F.col("doc_id") % INCREMENTAL_BATCH_MOD == INCREMENTAL_BATCH_REM
    )
    # static state a production deployment maintains: the distinct gram
    # set of the indexed corpus
    grams = pk._gram_positions(spark, sf_dir_small).cache()
    index_set = grams.filter(~is_batch).select("gh").distinct().cache()
    index_set.count()  # materialize once

    incoming_ids = sorted(
        r.doc_id
        for r in load_table(spark, sf_dir_small, "documents")
        .filter(is_batch)
        .select("doc_id")
        .collect()
    )
    half = len(incoming_ids) // 2
    src = os.path.join(stream_env["tmp"], "inc_span_src")
    os.makedirs(src, exist_ok=True)
    for fname, ids in [
        ("b0.json", incoming_ids[:half]),
        ("b1.json", incoming_ids[half:]),
    ]:
        with open(os.path.join(src, fname), "w") as f:
            for i in ids:
                f.write(json.dumps({"doc_id": i}) + "\n")

    found: list[tuple[int, int, int, int, int]] = []

    def handle(batch_df, _bid):
        anchors = (
            grams.join(F.broadcast(batch_df.select("doc_id")), "doc_id")
            .join(index_set, "gh", "left_semi")
            .select("doc_id", "pos")
        )
        for r in pk._merge_anchor_spans(anchors).collect():
            found.append(
                (r.doc_id, r.span_id, r.span_start, r.span_end, r.n_anchors)
            )

    q = (
        spark.readStream.schema("doc_id long")
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    want = {
        (r.doc_id, r.span_id, r.span_start, r.span_end, r.n_anchors)
        for r in pk.incremental_dup_spans(spark, sf_dir_small).collect()
    }
    assert set(found) == want and want
    grams.unpersist()
    index_set.unpersist()


def test_incremental_semdedup_streaming_batches(spark, stream_env, sf_dir_small):
    """Continuous-ingestion form of semdedup_incremental — the FOURTH
    incremental granularity's streaming twin (document/vector/substring
    have one each above): incoming vectors arrive across micro-batches;
    each batch assigns to the frozen IVF centroids and scores against
    the STATIC indexed members only via semdedup_incremental_for. Keep
    decisions are per-vector independent, so the union over
    micro-batches must reproduce the batch operator row-for-row."""
    import json

    from big_data_recommendation_system_spark.operators.similarity import (
        semdedup_incremental,
        semdedup_incremental_for,
    )
    from big_data_recommendation_system_spark.operators.srp import (
        SRP_BATCH_MOD,
        SRP_BATCH_REM,
    )
    from big_data_recommendation_system_spark.sources.tables import load_table

    incoming_ids = sorted(
        r.vec_id
        for r in load_table(spark, sf_dir_small, "embeddings")
        .filter(F.col("vec_id") % SRP_BATCH_MOD == SRP_BATCH_REM)
        .select("vec_id")
        .collect()
    )
    half = len(incoming_ids) // 2
    src = os.path.join(stream_env["tmp"], "inc_semdedup_src")
    os.makedirs(src, exist_ok=True)
    for fname, ids in [
        ("b0.json", incoming_ids[:half]),
        ("b1.json", incoming_ids[half:]),
    ]:
        with open(os.path.join(src, fname), "w") as f:
            for i in ids:
                f.write(json.dumps({"vec_id": i}) + "\n")

    found = []

    def handle(batch_df, _bid):
        found.extend(
            semdedup_incremental_for(spark, sf_dir_small, batch_df).collect()
        )

    q = (
        spark.readStream.schema("vec_id long")
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def key(rows):
        return {
            r.vec_id: (
                r.centroid_id,
                r.centroid_cos,
                r.n_matches,
                r.best_match_id,
                r.best_match_cos,
                r.is_dup,
                r.keep,
            )
            for r in rows
        }

    got = key(found)
    want = key(semdedup_incremental(spark, sf_dir_small).collect())
    assert got == want
    assert any(v[5] for v in want.values()), "slice should exercise matches"


def test_incremental_winnow_streaming_batches(spark, stream_env, sf_dir_small):
    """Continuous-ingestion form of incremental_winnow_matches: incoming
    docs arrive across micro-batches; each batch's winnowed postings
    join the STATIC df-capped index posting list (corpus-wide
    stop-fingerprint statistics = the maintained index state). The union
    over batches must reproduce the batch operator's match report
    exactly — one semantics, two execution models."""
    import json

    from big_data_recommendation_system_spark.operators import text_dedup as td
    from big_data_recommendation_system_spark.plans import text_analysis as ta
    from big_data_recommendation_system_spark.sources.tables import load_table

    is_batch = (
        F.col("doc_id") % td.INCREMENTAL_BATCH_MOD == td.INCREMENTAL_BATCH_REM
    )
    fps = ta.winnow_fps_table(spark, sf_dir_small).cache()
    kept = fps.join(
        fps.groupBy("fp_hash")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= ta.WINNOW_MAX_DF)
        .select("fp_hash"),
        "fp_hash",
    ).cache()
    n_fp = fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_fp")
    ).cache()
    index_side = kept.filter(~is_batch).cache()
    index_side.count()  # materialize the static state once

    incoming_ids = sorted(
        r.doc_id
        for r in load_table(spark, sf_dir_small, "documents")
        .filter(is_batch)
        .select("doc_id")
        .collect()
    )
    half = len(incoming_ids) // 2
    src = os.path.join(stream_env["tmp"], "inc_winnow_src")
    os.makedirs(src, exist_ok=True)
    for fname, ids in [
        ("b0.json", incoming_ids[:half]),
        ("b1.json", incoming_ids[half:]),
    ]:
        with open(os.path.join(src, fname), "w") as f:
            for i in ids:
                f.write(json.dumps({"doc_id": i}) + "\n")

    found: list[tuple[int, int, int, float]] = []

    def handle(batch_df, _bid):
        batch_post = kept.join(F.broadcast(batch_df.select("doc_id")), "doc_id")
        rows = (
            batch_post.alias("x")
            .join(index_side.alias("y"), F.col("x.fp_hash") == F.col("y.fp_hash"))
            .groupBy(
                F.col("x.doc_id").alias("doc_id"),
                F.col("y.doc_id").alias("match_id"),
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
            .filter(F.col("n_shared") >= ta.WINNOW_MIN_SHARED)
            .join(n_fp.select("doc_id", F.col("n_fp").alias("na")), "doc_id")
            .join(
                n_fp.select(
                    F.col("doc_id").alias("match_id"), F.col("n_fp").alias("nb")
                ),
                "match_id",
            )
            .withColumn(
                "overlap",
                F.col("n_shared").cast("double")
                / F.least("na", "nb").cast("double"),
            )
            .select("doc_id", "match_id", "n_shared", "overlap")
            .collect()
        )
        found.extend(
            (r.doc_id, r.match_id, r.n_shared, r.overlap) for r in rows
        )

    q = (
        spark.readStream.schema("doc_id long")
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    per_doc: dict[int, list[tuple[int, int, float]]] = {}
    for doc, match, shared, ov in found:
        per_doc.setdefault(doc, []).append((match, shared, ov))
    got = {}
    for doc, matches in per_doc.items():
        best = sorted(matches, key=lambda m: (-m[1], m[0]))[0]
        got[doc] = (len(matches), best[0], best[1], best[2])

    want = {
        r.doc_id: (r.n_matches, r.best_match_id, r.best_shared, r.best_overlap)
        for r in td.incremental_winnow_matches(spark, sf_dir_small).collect()
        if r.is_dup
    }
    assert got == want and want  # non-vacuous: the detector fires
