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
    ArrayType,
    BooleanType,
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
#
# Full reference feature set (extract_features,
# kafka_streams_processor.py:118-178), split into TWO keyed operators the
# way Spark scales state: the reference's single-process loop couples a
# user-keyed dict and a product-keyed dict in one thread; here each state
# domain is its own applyInPandasWithState over its natural key, so both
# shards across executors independently.
#
# Reference semantics preserved: state is updated BEFORE features are
# emitted (kafka_streams_processor.py:88-99), so every feature includes
# the current event; recent-sequence is the trailing 5 including current;
# is_returning checks the previous 4 events' products (:171).
#
# Deviations (all bounds the reference lacks): 30-min processing-time
# timeout evicts idle user state; a >30-min EVENT-time gap inside the
# data resets the session scope (the deterministic batch equivalent of
# the reference's idle-cleanup thread); the session distinct-product set
# is capped at _MAX_SEEN products.

_GAP_US = SESSION_GAP_MINUTES * 60 * 1_000_000
_MAX_SEEN = 4096  # session distinct-product set bound
_CATEGORIES = ["electronics", "books", "home_garden", "toys", "sports", "unknown"]
_VIEW_TYPES = ("view", "click")  # reference: page_view / product_click

_STATE_SCHEMA = StructType(
    [
        StructField("event_count", LongType()),
        StructField("total_weight", LongType()),
        StructField("last_ts_us", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_events", LongType()),
        StructField("cat_counts", ArrayType(LongType())),
        StructField("seen_products", ArrayType(LongType())),
        StructField("recent_types", ArrayType(StringType())),
        StructField("recent_products", ArrayType(LongType())),
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
        StructField("session_start", TimestampType()),
        StructField("session_duration_seconds", DoubleType()),
        StructField("events_in_session", LongType()),
        StructField("categories_explored", LongType()),
        StructField("products_viewed_count", LongType()),
        StructField("preferred_categories", StringType()),
        StructField("recent_event_sequence", StringType()),
        StructField("is_returning_to_product", BooleanType()),
        StructField("hour_of_day", IntegerType()),
        StructField("is_weekend", BooleanType()),
    ]
)


def _trailing_join(ext: pd.Series, n_carry: int) -> pd.Series:
    """Comma-joined trailing-5 values of ``ext`` (carry rows prepended),
    returned for the non-carry rows only. Vectorized: five shifted string
    columns concatenated, then leading separators stripped."""
    parts = [ext.shift(k).fillna("") for k in range(4, -1, -1)]
    joined = parts[0].str.cat(parts[1:], sep=",")
    return joined.str.replace(r"^,+", "", regex=True).iloc[n_carry:]


def _enrich_user_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Stateful per-user enrichment — the reference's extract_features
    (kafka_streams_processor.py:118-178) as vectorized pandas: arange /
    cumsum / shift per session segment, no per-row Python loop."""
    import numpy as np

    if state.hasTimedOut:
        state.remove()
        return
    (user_id,) = key
    if state.exists:
        (
            count,
            weight,
            last_us,
            sess_start_us,
            sess_events,
            cat_counts,
            seen_products,
            recent_types,
            recent_products,
        ) = state.get
        cat_counts = np.asarray(cat_counts, dtype="int64")
        seen = set(seen_products)
    else:
        count, weight, last_us = 0, 0, None
        sess_start_us, sess_events = None, 0
        cat_counts = np.zeros(len(_CATEGORIES), dtype="int64")
        seen = set()
        recent_types, recent_products = [], []

    pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(["ts", "event_id"])
    n = len(pdf)
    ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
    prod = (
        pdf["prop_k"].fillna(-1).astype("int64").to_numpy()
        if "prop_k" in pdf
        else np.full(n, -1, dtype="int64")
    )
    cat_idx = np.where(prod >= 0, prod % 5, len(_CATEGORIES) - 1)
    types = pdf["event_type"].to_numpy()

    # lifetime running features (never reset within the state's lifetime)
    user_event_count = count + np.arange(1, n + 1)
    user_total_weight = weight + pdf["event_weight"].astype("int64").cumsum().to_numpy()
    prev_us = np.concatenate(([last_us if last_us is not None else -1], ts_us[:-1]))
    secs = np.where(prev_us >= 0, (ts_us - prev_us) / 1e6, np.nan)

    # session segments: a >30-min event-time gap starts a fresh session
    gap = np.zeros(n, dtype=bool)
    gap[0] = last_us is None or (ts_us[0] - last_us) > _GAP_US
    gap[1:] = (ts_us[1:] - ts_us[:-1]) > _GAP_US
    seg = np.cumsum(gap)  # 0 = continuation of the state's open session

    out_cols: dict[str, list] = {
        c: []
        for c in (
            "session_start_us",
            "events_in_session",
            "categories_explored",
            "products_viewed_count",
            "preferred_categories",
            "recent_event_sequence",
            "is_returning_to_product",
        )
    }
    cat_names = np.array(_CATEGORIES)
    for s in np.unique(seg):
        m = seg == s
        k = int(m.sum())
        if s == 0:
            c_cat, c_seen = cat_counts, seen
            c_types, c_prods = list(recent_types), list(recent_products)
            c_events, c_start = sess_events, sess_start_us
        else:
            c_cat = np.zeros(len(_CATEGORIES), dtype="int64")
            c_seen, c_types, c_prods = set(), [], []
            c_events, c_start = 0, None
        seg_ts, seg_types, seg_prod = ts_us[m], types[m], prod[m]
        seg_cat = cat_idx[m]
        start = c_start if c_start is not None else int(seg_ts[0])
        out_cols["session_start_us"].append(np.full(k, start, dtype="int64"))
        out_cols["events_in_session"].append(c_events + np.arange(1, k + 1))

        # running category counts: one-hot cumsum + carried offsets
        onehot = np.zeros((k, len(_CATEGORIES)), dtype="int64")
        onehot[np.arange(k), seg_cat] = 1
        run = onehot.cumsum(axis=0) + c_cat
        out_cols["categories_explored"].append((run > 0).sum(axis=1))
        # top-3 by count desc, name asc (vocab is name-sorted after argsort
        # stability); zero-count categories excluded like the reference's
        # dict of observed categories
        name_order = np.argsort(cat_names, kind="stable")
        run_sorted = run[:, name_order]
        order = np.argsort(-run_sorted, axis=1, kind="stable")
        top = cat_names[name_order][order[:, :3]]
        topc = np.take_along_axis(run_sorted, order[:, :3], axis=1)
        labels = np.where(topc > 0, top, "")
        pref = pd.Series(
            [",".join(x for x in row if x) for row in labels], dtype="object"
        )
        out_cols["preferred_categories"].append(pref.to_numpy())

        # session-distinct products over view-type events
        qual = np.isin(seg_types, _VIEW_TYPES) & (seg_prod >= 0)
        pq = pd.Series(np.where(qual, seg_prod, -1))
        new = qual & ~pq.duplicated().to_numpy() & ~pq.isin(list(c_seen)).to_numpy()
        out_cols["products_viewed_count"].append(len(c_seen) + new.cumsum())

        # trailing-5 sequence + returning flag via carry-prepended shifts
        text = pd.Series(
            c_types + list(seg_types), dtype="object"
        )
        out_cols["recent_event_sequence"].append(
            _trailing_join(text, len(c_types)).to_numpy()
        )
        pext = pd.Series(c_prods + list(seg_prod), dtype="int64")
        ret = np.zeros(len(pext), dtype=bool)
        for sh in range(1, 5):
            shifted = pext.shift(sh, fill_value=-1).to_numpy()
            ret |= (pext.to_numpy() == shifted) & (shifted >= 0)
        out_cols["is_returning_to_product"].append(ret[len(c_prods) :])

        # roll segment state forward
        if len(c_seen) < _MAX_SEEN:
            c_seen.update(int(p) for p in seg_prod[new])
        cat_counts, seen = run[-1], c_seen
        recent_types = (c_types + list(seg_types))[-4:]
        recent_products = [int(p) for p in (c_prods + list(seg_prod))[-4:]]
        sess_start_us, sess_events = start, int(c_events + k)

    ts_col = pdf["ts"].reset_index(drop=True)
    out = pd.DataFrame(
        {
            "user_id": np.full(n, user_id, dtype="int64"),
            "event_id": pdf["event_id"].to_numpy(),
            "ts": ts_col,
            "event_type": types,
            "user_event_count": user_event_count,
            "user_total_weight": user_total_weight,
            "secs_since_last": secs,
            "session_start_us": np.concatenate(out_cols["session_start_us"]),
            "events_in_session": np.concatenate(out_cols["events_in_session"]),
            "categories_explored": np.concatenate(out_cols["categories_explored"]),
            "products_viewed_count": np.concatenate(
                out_cols["products_viewed_count"]
            ),
            "preferred_categories": np.concatenate(
                out_cols["preferred_categories"]
            ),
            "recent_event_sequence": np.concatenate(
                out_cols["recent_event_sequence"]
            ),
            "is_returning_to_product": np.concatenate(
                out_cols["is_returning_to_product"]
            ),
        }
    )
    out["session_start"] = pd.to_datetime(out.pop("session_start_us"), unit="us")
    out["session_duration_seconds"] = (
        ts_us - out["session_start"].astype("int64").to_numpy() // 1000
    ) / 1e6
    out["hour_of_day"] = ts_col.dt.hour.astype("int32")
    out["is_weekend"] = ts_col.dt.dayofweek >= 5
    yield out[[f.name for f in _OUTPUT_SCHEMA.fields]]

    state.update(
        (
            int(user_event_count[-1]),
            int(user_total_weight[-1]),
            int(ts_us[-1]),
            int(sess_start_us),
            int(sess_events),
            [int(x) for x in cat_counts],
            sorted(int(p) for p in seen),
            list(recent_types),
            list(recent_products),
        )
    )
    state.setTimeoutDuration(SESSION_GAP_MINUTES * 60 * 1000)


def stateful_user_features(events: DataFrame) -> DataFrame:
    """Per-event running user features via applyInPandasWithState
    (full R5 feature set; see _enrich_user_group)."""
    cols = ["user_id", "event_id", "ts", "event_type", "event_weight"]
    if "prop_k" in events.columns:
        cols.append("prop_k")
    return (
        events.select(*cols)
        .groupBy("user_id")
        .applyInPandasWithState(
            _enrich_user_group,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


# --- R5 product side: per-product conversion/cart/recent-view state --------

_PRODUCT_STATE_SCHEMA = StructType(
    [
        StructField("view_count", LongType()),
        StructField("cart_adds", LongType()),
        StructField("purchases", LongType()),
        StructField("view_ts_us", ArrayType(LongType())),
    ]
)

_PRODUCT_OUTPUT_SCHEMA = StructType(
    [
        StructField("prop_k", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("product_total_views", LongType()),
        StructField("product_recent_views", LongType()),
        StructField("product_conversion_rate", DoubleType()),
        StructField("product_cart_rate", DoubleType()),
    ]
)

_MAX_VIEW_TS = 1000  # reference deque(maxlen=1000), kafka_streams_processor.py:73


def _enrich_product_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Product-keyed half of extract_features: running view/cart/purchase
    counters, trailing-1h view count (searchsorted over the bounded view-ts
    buffer — reference deque maxlen 1000), conversion/cart rates ×100
    rounded to 2 (kafka_streams_processor.py:136-139)."""
    import numpy as np

    if state.hasTimedOut:
        state.remove()
        return
    (prop_k,) = key
    views, carts, purchases, view_ts = (
        state.get if state.exists else (0, 0, 0, [])
    )
    pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(["ts", "event_id"])
    n = len(pdf)
    ts_us = (pdf["ts"].astype("int64") // 1000).to_numpy()
    types = pdf["event_type"].to_numpy()

    is_view = np.isin(types, _VIEW_TYPES)
    is_cart = types == "signup"  # maps the reference's add_to_cart bump
    is_buy = types == "purchase"
    v = views + is_view.cumsum()
    c = carts + is_cart.cumsum()
    b = purchases + is_buy.cumsum()

    all_views = np.concatenate(
        [np.asarray(view_ts, dtype="int64"), ts_us[is_view]]
    )
    lo = np.searchsorted(all_views, ts_us - 3_600_000_000, side="right")
    hi = np.searchsorted(all_views, ts_us, side="right")
    recent = hi - lo

    denom = np.maximum(v, 1)
    conv = np.floor(b / denom * 100 * 100 + 0.5) / 100
    cart = np.floor(c / denom * 100 * 100 + 0.5) / 100
    yield pd.DataFrame(
        {
            "prop_k": np.full(n, prop_k, dtype="int64"),
            "event_id": pdf["event_id"].to_numpy(),
            "ts": pdf["ts"].reset_index(drop=True),
            "event_type": types,
            "product_total_views": v,
            "product_recent_views": recent,
            "product_conversion_rate": conv,
            "product_cart_rate": cart,
        }
    )
    state.update(
        (
            int(v[-1]),
            int(c[-1]),
            int(b[-1]),
            [int(x) for x in all_views[-_MAX_VIEW_TS:]],
        )
    )
    state.setTimeoutDuration(60 * 60 * 1000)


def stateful_product_features(events: DataFrame) -> DataFrame:
    """Per-event running product features (conversion/cart rates,
    trailing-hour views) via applyInPandasWithState keyed on the item."""
    return (
        events.filter(F.col("prop_k").isNotNull())
        .select("prop_k", "event_id", "ts", "event_type")
        .groupBy("prop_k")
        .applyInPandasWithState(
            _enrich_product_group,
            outputStructType=_PRODUCT_OUTPUT_SCHEMA,
            stateStructType=_PRODUCT_STATE_SCHEMA,
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
