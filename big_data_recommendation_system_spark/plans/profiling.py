"""Table profiling: per-column row/null/distinct counts and min/max
(the ``describe``/profiling rollup a pipeline runs before trusting a
new drop of data — the data-quality rule engine in quality/ consumes
exactly these signals to pick thresholds).

Shape (r12): one aggregation PER COLUMN over a single-column
projection, unioned into the long one-row-per-column frame. Each
branch's scan prunes to its own column (total I/O = one table read
spread across parallel stages) and its partial distinct aggregate
combines map-side; the previous one-wide-agg form paid a Catalyst
Expand of (k+1)× the input rows to host k distinct aggregates in one
Aggregate node.

At 100 TB the exact per-column countDistinct is the expensive part;
``profile_columns(df, approx=True)`` swaps in ``approx_count_distinct``
(HLL, no distinct shuffle) — the oracle-checked registry query uses the
exact form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

# (column, profile-kind): num -> min/max as double, str -> min/max as
# string, none -> counts only (timestamps: micro-truncation semantics are
# loader-defined, so min/max stay out of the cross-engine contract)
EVENTS_PROFILE_COLS: list[tuple[str, str]] = [
    ("event_id", "num"),
    ("ts", "none"),
    ("user_id", "num"),
    ("event_type", "str"),
    ("value", "num"),
    ("props", "str"),
]


def profile_columns(
    df: DataFrame,
    cols: list[tuple[str, str]],
    approx: bool = False,
) -> DataFrame:
    """Profile ``cols`` of ``df``; returns one row per column:
    (col_name, n_rows, n_nulls, n_distinct, min_num, max_num, min_str,
    max_str).

    r12 (guide §2.3): the exact form previously computed every column's
    countDistinct in ONE wide aggregation — Catalyst plans k distinct
    aggregates as an Expand to (k+1)× the input rows before the partial
    aggregate, so a 6-column profile pushed 7 copies of the table
    through the first stage. One aggregation per column instead, each
    over a single-column projection (the scan prunes to that column, so
    total I/O is still one table read) unioned into the long shape —
    the same plan the DuckDB oracle runs. No Expand; each branch's
    partial distinct aggregate combines map-side; the branches run as
    parallel stages of one job. Values are identical (same aggregates,
    same rows)."""
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    branches = []
    for c, kind in cols:
        distinct = (
            F.approx_count_distinct(c) if approx else F.countDistinct(c)
        )
        aggs: list[Column] = [
            F.count(F.lit(1)).alias("__n_rows"),
            F.count(c).alias("__nn"),
            distinct.alias("__nd"),
        ]
        if kind == "num":
            aggs.append(F.min(F.col(c).cast("double")).alias("__mn"))
            aggs.append(F.max(F.col(c).cast("double")).alias("__mx"))
        elif kind == "str":
            aggs.append(F.min(c).alias("__mn"))
            aggs.append(F.max(c).alias("__mx"))
        b = df.select(c).agg(*aggs).select(
            F.lit(c).alias("col_name"),
            F.col("__n_rows").alias("n_rows"),
            (F.col("__n_rows") - F.col("__nn")).alias("n_nulls"),
            F.col("__nd").alias("n_distinct"),
            (F.col("__mn") if kind == "num" else null_d).alias("min_num"),
            (F.col("__mx") if kind == "num" else null_d).alias("max_num"),
            (F.col("__mn") if kind == "str" else null_s).alias("min_str"),
            (F.col("__mx") if kind == "str" else null_s).alias("max_str"),
        )
        branches.append(b)
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out.orderBy("col_name")


def profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact profile of the raw events table (all six columns)."""
    return profile_columns(
        load_table(spark, sf_dir, "events"), EVENTS_PROFILE_COLS
    )


def _profile_events_sql() -> str:
    selects = []
    for c, kind in EVENTS_PROFILE_COLS:
        if kind == "num":
            mn, mx = f"CAST(MIN({c}) AS DOUBLE)", f"CAST(MAX({c}) AS DOUBLE)"
            ms, xs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
        elif kind == "str":
            mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            ms, xs = f"MIN({c})", f"MAX({c})"
        else:
            mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            ms, xs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
        selects.append(
            f"SELECT '{c}' AS col_name, COUNT(*) AS n_rows, "
            f"COUNT(*) - COUNT({c}) AS n_nulls, "
            f"COUNT(DISTINCT {c}) AS n_distinct, "
            f"{mn} AS min_num, {mx} AS max_num, "
            f"{ms} AS min_str, {xs} AS max_str FROM events"
        )
    return "\nUNION ALL\n".join(selects) + "\nORDER BY col_name"


PROFILE_EVENTS_SQL = _profile_events_sql()


def value_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p25/p50/p90 of event value per event type. Spark's
    ``percentile`` and DuckDB's ``quantile_cont`` share the same linear
    interpolation on doubles (verified bit-identical incl. ulp tails),
    so the exact form is oracle-checkable. At 100 TB swap in
    ``percentile_approx`` (t-digest sketch, bounded memory, no per-group
    sort buffer) — the exact version buffers each group's values."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.expr("percentile(value, 0.25)").alias("p25"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
        )
        .orderBy("event_type")
    )


VALUE_PERCENTILES_SQL = """
SELECT event_type,
  COUNT(*) AS n_values,
  quantile_cont(value, 0.25) AS p25,
  quantile_cont(value, 0.5) AS p50,
  quantile_cont(value, 0.9) AS p90
FROM events
WHERE value IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""


# --- IQR outlier report ------------------------------------------------------

# Tukey fence multiplier: values outside [q1 - K*iqr, q3 + K*iqr] are
# outliers. 1.5 is the standard inner fence.
IQR_FENCE_K = 1.5


def value_outliers_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier report per event type: exact quartiles, the
    derived [q1 - 1.5*IQR, q3 + 1.5*IQR] fences, and how many values
    fall outside them — the distribution-drift signal a DQ pipeline
    publishes next to the percentile profile.

    Two aggregation passes over events (quartiles, then fence counts)
    with the per-type fence frame broadcast back — the quartile frame
    has |event_type| rows, so the join never shuffles the fact side.
    Fence arithmetic is IEEE ops on identical interpolated quartiles,
    deterministic across engines; at 100 TB swap the exact percentile
    for percentile_approx exactly as value_percentiles_by_type
    documents."""
    events = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    fences = (
        events.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.25)").alias("q1"),
            F.expr("percentile(value, 0.75)").alias("q3"),
        )
        .select(
            "event_type",
            "q1",
            "q3",
            (F.col("q1") - IQR_FENCE_K * (F.col("q3") - F.col("q1"))).alias(
                "lo_fence"
            ),
            (F.col("q3") + IQR_FENCE_K * (F.col("q3") - F.col("q1"))).alias(
                "hi_fence"
            ),
        )
    )
    return (
        events.join(F.broadcast(fences), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.first("q1").alias("q1"),
            F.first("q3").alias("q3"),
            F.first("lo_fence").alias("lo_fence"),
            F.first("hi_fence").alias("hi_fence"),
            F.sum(
                (
                    (F.col("value") < F.col("lo_fence"))
                    | (F.col("value") > F.col("hi_fence"))
                ).cast("long")
            ).alias("n_outliers"),
        )
        .select(
            "event_type",
            "n_values",
            "q1",
            "q3",
            "lo_fence",
            "hi_fence",
            "n_outliers",
            (F.col("n_outliers") / F.col("n_values")).alias("outlier_ratio"),
        )
        .orderBy("event_type")
    )


VALUE_OUTLIERS_SQL = f"""
WITH fences AS (
  SELECT event_type,
    quantile_cont(value, 0.25) AS q1,
    quantile_cont(value, 0.75) AS q3,
    quantile_cont(value, 0.25)
      - {IQR_FENCE_K} * (quantile_cont(value, 0.75) - quantile_cont(value, 0.25))
      AS lo_fence,
    quantile_cont(value, 0.75)
      + {IQR_FENCE_K} * (quantile_cont(value, 0.75) - quantile_cont(value, 0.25))
      AS hi_fence
  FROM events WHERE value IS NOT NULL GROUP BY event_type
)
SELECT e.event_type,
  CAST(COUNT(*) AS BIGINT) AS n_values,
  ANY_VALUE(f.q1) AS q1,
  ANY_VALUE(f.q3) AS q3,
  ANY_VALUE(f.lo_fence) AS lo_fence,
  ANY_VALUE(f.hi_fence) AS hi_fence,
  CAST(SUM(CASE WHEN e.value < f.lo_fence OR e.value > f.hi_fence
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
  CAST(SUM(CASE WHEN e.value < f.lo_fence OR e.value > f.hi_fence
                THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS outlier_ratio
FROM events e JOIN fences f ON e.event_type = f.event_type
WHERE e.value IS NOT NULL
GROUP BY e.event_type
ORDER BY e.event_type
"""


# --- exact distributed correlation ------------------------------------------


def price_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs extended price per return
    flag, computed from exact integer moment sums:
    corr = (n·Σxy − Σx·Σy) / √((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²)).
    Inputs quantize once (quantity integral; price to exact cents), all
    five moments are map-side-combined integer aggregates riding
    DECIMAL(38,0) against overflow, and the only float ops are the final
    casts, one multiply, one sqrt and one division — bit-deterministic
    under any partitioning, unlike a naive AVG/STDDEV composition (and
    unlike built-in CORR, whose streaming accumulation is
    partition-order-dependent).

    The pattern generalizes: any co-moment statistic over 100 TB is one
    narrow-key pass when expressed as integer moment sums."""
    li = load_table(spark, sf_dir, "lineitem")
    q = li.select(
        "l_returnflag",
        F.round(F.col("l_quantity")).cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = q.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        dec(F.sum("x")).alias("sx"),
        dec(F.sum("y")).alias("sy"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
        F.sum(dec(F.col("y")) * dec(F.col("y"))).alias("syy"),
        F.sum(dec(F.col("x") * F.col("y"))).alias("sxy"),
    )
    n = dec(F.col("n_items"))
    num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    d1 = n * F.col("sxx") - F.col("sx") * F.col("sx")
    d2 = n * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.when(
        (d1 > 0) & (d2 > 0),
        num.cast("double")
        / F.sqrt(d1.cast("double") * d2.cast("double")),
    )
    return agg.select(
        "l_returnflag", "n_items", corr.alias("corr_qty_price")
    ).orderBy("l_returnflag")


PRICE_QUANTITY_CORR_SQL = """
WITH q AS (
  SELECT l_returnflag,
    CAST(round(l_quantity) AS BIGINT) AS x,
    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
),
m AS (
  SELECT l_returnflag,
    CAST(COUNT(*) AS BIGINT) AS n_items,
    CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
    CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
    CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx,
    CAST(SUM(CAST(y AS DECIMAL(19,0)) * y) AS DECIMAL(38,0)) AS syy,
    CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy
  FROM q GROUP BY l_returnflag
)
SELECT l_returnflag, n_items,
  CASE WHEN n_items * sxx - sx * sx > 0 AND n_items * syy - sy * sy > 0 THEN
    CAST(n_items * sxy - sx * sy AS DOUBLE)
      / sqrt(CAST(n_items * sxx - sx * sx AS DOUBLE)
             * CAST(n_items * syy - sy * sy AS DOUBLE))
  END AS corr_qty_price
FROM m
ORDER BY l_returnflag
"""


# --- approx percentiles (the 100 TB path) -----------------------------------

APPROX_PCT_ACCURACY = 10000  # rank error <= n / accuracy


def approx_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The percentile_approx flip for ``value_percentiles_by_type`` — the
    sketch every 100 TB run would use (bounded memory per group, no
    per-group sort buffer). Registered WITHOUT an oracle: the sketch's
    chosen representative differs across engines, so no hash is
    possible; instead every row carries its own RANK certificate (the
    approx_distinct_daily pattern): for each quantile q, the fraction of
    group values strictly below the returned value must not exceed
    q + 1%, and the fraction at-or-below must reach q - 1% —
    rank-correctness verified against the data itself, engine-free.
    The pytest suite additionally pins every certificate true and the
    medians against the exact form.

    Scale shape: one sketch aggregation (map-side combinable), then the
    tiny |types| x quantile frame broadcasts back for ONE certificate
    counting pass — two linear scans total, no sort."""
    q = [0.25, 0.5, 0.9]
    events = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    ap = (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_values"),
            F.percentile_approx(
                "value", q, APPROX_PCT_ACCURACY
            ).alias("aq"),
        )
        .select(
            "event_type",
            "n_values",
            *[F.col("aq").getItem(i).alias(f"p{int(qq * 100)}_approx") for i, qq in enumerate(q)],
        )
    )
    j = events.join(F.broadcast(ap), "event_type")
    certs = j.groupBy("event_type").agg(
        *[
            F.sum((F.col("value") < F.col(f"p{int(qq * 100)}_approx")).cast("long")).alias(
                f"lt{int(qq * 100)}"
            )
            for qq in q
        ],
        *[
            F.sum((F.col("value") <= F.col(f"p{int(qq * 100)}_approx")).cast("long")).alias(
                f"le{int(qq * 100)}"
            )
            for qq in q
        ],
    )
    out = ap.join(certs, "event_type")
    tol = 0.01
    for qq in q:
        k = int(qq * 100)
        out = out.withColumn(
            f"p{k}_rank_ok",
            (F.col(f"lt{k}") / F.col("n_values") <= qq + tol)
            & (F.col(f"le{k}") / F.col("n_values") >= qq - tol),
        )
    return out.select(
        "event_type",
        "n_values",
        *[c for qq in q for c in (f"p{int(qq * 100)}_approx", f"p{int(qq * 100)}_rank_ok")],
    ).orderBy("event_type")


def approx_percentile_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable companion to the rows-only
    ``approx_percentiles_by_type`` (the cosine_topk_agreement pattern,
    r9 VERDICT item 6): per event type the EXACT value count — recomputed
    by the DuckDB twin — plus the three rank certificates as 1/0
    columns. The sketch's chosen representatives stay un-hashed (they
    legitimately differ across engines); the certificates assert
    rank-correctness of the engine's own sketch against the data itself
    (frac-below <= q+1%, frac-at-or-below >= q-1%), so a
    percentile_approx regression flips the value hash. No extra scans —
    a projection of the parent query."""
    ap = approx_percentiles_by_type(spark, sf_dir)
    return ap.select(
        "event_type",
        F.col("n_values").cast("long").alias("n_values"),
        *[
            F.col(f"p{k}_rank_ok").cast("long").alias(f"p{k}_rank_ok")
            for k in (25, 50, 90)
        ],
    ).orderBy("event_type")


APPROX_PERCENTILE_AGREEMENT_SQL = """
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_values,
  CAST(1 AS BIGINT) AS p25_rank_ok,
  CAST(1 AS BIGINT) AS p50_rank_ok,
  CAST(1 AS BIGINT) AS p90_rank_ok
FROM events
WHERE value IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""
