"""Skew-handling helpers for hot keys (SURVEY.md §7.2 phase 8).

AQE's skew-join splitting covers joins; these helpers cover *aggregations*
with pathological key skew (one user generating a large share of events —
the reference's zipfian clickstream at 100 TB):

- ``salted_agg``: two-phase aggregation — add a random salt to the key,
  partially aggregate (user, salt) cells, then merge per user. Turns one
  giant reduce task into ``n_salts`` parallel ones. Only valid for
  decomposable aggregates (sum/count/min/max — pass merge exprs).
- ``approx_distinct_daily``: the approx_count_distinct flip for A3's DAU
  at 100 TB (exact distinct = 2-phase expand shuffle; HLL = one pass).
  Registered WITHOUT an oracle (engine HLL implementations differ) — the
  driver records the rows-only check, and the pytest suite bounds its
  error against the exact answer instead.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.silver import silver_cte, silver_events


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    merge_aggs: Sequence[Column],
    *,
    salt_src: Sequence[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs`` aggregate within (keys, salt); ``merge_aggs``
    combine the partials per keys (referencing the partial aliases).
    The salt is ``pmod(xxhash64(salt_src, 7), n_salts)`` — the same
    convention as ``salted_join`` — so the cell assignment is a pure
    function of the row (partitioning- and retry-independent), and
    ``salt_src`` MUST be key-independent (e.g. a unique row id) or a
    hot key's rows all hash to one cell and the salt is a no-op.
    """
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in salt_src], F.lit(7)), F.lit(n_salts)
    ).cast("int")
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*partial_aggs)
    )
    return partial.groupBy(*keys).agg(*merge_aggs)


def user_engagement_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """user_summary's decomposable core via salted two-phase aggregation —
    hash-identical to the direct groupBy (counts and int sums are exact
    under any grouping; the value sum stays DECIMAL until one final cast,
    so partial-merge order cannot perturb it), but the plan splits each
    hot user across ``n_salts`` reduce cells before the tiny merge —
    the escape hatch when one zipfian key exceeds a task even after
    AQE skew handling. Oracle: the direct single-phase SQL aggregation
    (salting is plan shape, not semantics)."""
    silver = silver_events(spark, sf_dir)
    return salted_agg(
        silver,
        ["user_id"],
        [
            F.count(F.lit(1)).alias("pc"),
            F.sum("event_weight").alias("pw"),
            F.sum(F.col("value").cast("decimal(38,6)")).alias("pv"),
        ],
        [
            F.sum("pc").alias("total_events"),
            F.sum("pw").alias("total_engagement"),
            F.sum("pv").cast("double").alias("total_value"),
        ],
        salt_src=["event_id"],
    ).orderBy("user_id")


USER_ENGAGEMENT_SALTED_SQL = silver_cte("""
SELECT
  user_id,
  COUNT(*) AS total_events,
  CAST(SUM(event_weight) AS BIGINT) AS total_engagement,
  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
FROM silver
GROUP BY user_id
ORDER BY user_id
""")


def approx_distinct_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 daily stats with approx_count_distinct (rsd=0.01) — the 100 TB
    path for distinct-user counting — with the EXACT count and a bounded
    relative-error flag beside the estimate, so the rows-only driver
    check records self-evidencing rows (the HLL sketch differs across
    engines, so no hash oracle is possible; instead every recorded row
    carries its own |approx-exact| <= 5% certificate — VERDICT r5
    item 4). The exact countDistinct costs one extra expand at sf-test
    scale and is exactly the column a 100 TB run would drop.

    r12 (guide §2.3 "aggregate before you shuffle"): mixing countDistinct
    with plain aggregates made Catalyst Expand every silver row (one
    replica for the distinct path, one for the counts) before the
    exchange. Two-level form instead: pre-aggregate (event_date,
    user_id) cells — map-side combined, one row per distinct cell on
    the wire — then per date exact = COUNT of cells, total = SUM of
    cell counts, and the HLL estimate over the cell user_ids
    (duplicate-insensitive: same distinct value set → bit-identical
    sketch, so the estimate and the certificate are unchanged; silver
    user_id is non-null by the F1 required-field drop, so COUNT of
    cells IS the exact distinct count)."""
    silver = silver_events(spark, sf_dir)
    cells = silver.groupBy("event_date", "user_id").agg(
        F.count(F.lit(1)).alias("_n")
    )
    return (
        cells.groupBy("event_date")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias(
                "approx_daily_active_users"
            ),
            F.count(F.lit(1)).alias("exact_daily_active_users"),
            F.sum("_n").alias("total_events"),
        )
        .withColumn(
            "rel_err_within_5pct",
            F.abs(
                F.col("approx_daily_active_users")
                - F.col("exact_daily_active_users")
            )
            <= F.greatest(
                F.lit(3),
                F.col("exact_daily_active_users") * F.lit(0.05),
            ),
        )
    )


def approx_distinct_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable companion to the rows-only ``approx_distinct_daily``
    (the cosine_topk_agreement pattern, r9 VERDICT item 6): per day the
    EXACT distinct-user count and event total — both recomputed by the
    DuckDB twin — plus a 1/0 certificate that the engine's HLL estimate
    (rsd=0.01) landed within max(3, 5%) of the exact count. The sketch
    value itself stays un-hashed (it differs across engines by design);
    any HLL regression flips the certificate and therefore the hash.
    Same two linear scans as the parent query."""
    return approx_distinct_daily(spark, sf_dir).select(
        "event_date",
        F.col("exact_daily_active_users").cast("long").alias(
            "exact_daily_active_users"
        ),
        F.col("total_events").cast("long").alias("total_events"),
        F.col("rel_err_within_5pct").cast("long").alias("within_5pct"),
    ).orderBy("event_date")


APPROX_DISTINCT_AGREEMENT_SQL = silver_cte("""
SELECT event_date,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_daily_active_users,
  CAST(COUNT(*) AS BIGINT) AS total_events,
  CAST(1 AS BIGINT) AS within_5pct
FROM silver
GROUP BY event_date
ORDER BY event_date
""")


def _key_counts_block(key_col: str) -> str:
    """One key column's heavy-hitter block for KEY_SKEW_REPORT_SQL."""
    return f"""
counts_{key_col} AS (
  SELECT CAST({key_col} AS VARCHAR) AS key, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM silver GROUP BY 1
),
tot_{key_col} AS (
  SELECT CAST(SUM(n_rows) AS BIGINT) AS total,
    CAST(COUNT(*) AS BIGINT) AS n_keys
  FROM counts_{key_col}
),
top_{key_col} AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_rows DESC, key) AS BIGINT)
      AS rank,
    key, n_rows
  FROM counts_{key_col} ORDER BY n_rows DESC, key LIMIT 10
),
block_{key_col} AS (
  SELECT '{key_col}' AS key_col, rank, key, n_rows, n_keys,
    floor(CAST(n_rows * 100 AS DOUBLE) / total * 100 + 0.5) / 100
      AS pct_of_total,
    floor(CAST(n_rows * n_keys AS DOUBLE) / total * 100 + 0.5) / 100
      AS skew_factor
  FROM top_{key_col} CROSS JOIN tot_{key_col}
)"""


def key_skew_frame(
    df: DataFrame, key_cols: Sequence[str] = ("user_id", "event_type")
) -> DataFrame:
    """Heavy-hitter diagnostic over any keyed frame: the top-10 keys per
    candidate shuffle key with row counts, share of total, and skew
    factor (key rows ÷ mean rows per key) — the report an operator reads
    to decide WHICH keys need ``salted_agg`` / AQE skew handling before
    a 100 TB run, produced by the engine itself. Reused by
    ``cli/run_pipeline.py --skew-report`` against the silver clickstream.

    Scale shape: per-key counts are one map-side-combined hash agg per
    key column; the global top-10 is orderBy+limit (TakeOrdered — a
    per-partition top-10 merged on the driver side of the exchange, no
    single-partition window over the full keyset); the rank window runs
    over the 10 surviving rows only; the 1-row totals frame joins in as
    a broadcast scalar. Ratios are exact-integer products with ONE
    double division, then the engine-neutral 2-decimal round."""
    from ..functions.pandas_parity import round2_neutral

    blocks = []
    for key_col in key_cols:
        counts = df.groupBy(
            F.col(key_col).cast("string").alias("key")
        ).agg(F.count(F.lit(1)).alias("n_rows"))
        tot = counts.agg(
            F.sum("n_rows").cast("long").alias("total"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
        )
        top = counts.orderBy(F.desc("n_rows"), "key").limit(10)
        from pyspark.sql import Window

        rank_w = Window.orderBy(F.desc("n_rows"), "key")  # 10 rows max
        blocks.append(
            top.withColumn("rank", F.row_number().over(rank_w).cast("long"))
            .crossJoin(F.broadcast(tot))
            .select(
                F.lit(key_col).alias("key_col"),
                "rank",
                "key",
                "n_rows",
                "n_keys",
                round2_neutral(
                    (F.col("n_rows") * 100).cast("double") / F.col("total")
                ).alias("pct_of_total"),
                round2_neutral(
                    (F.col("n_rows") * F.col("n_keys")).cast("double")
                    / F.col("total")
                ).alias("skew_factor"),
            )
        )
    out = blocks[0]
    for b in blocks[1:]:
        out = out.unionByName(b)
    return out.orderBy("key_col", "rank")


def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry entry: ``key_skew_frame`` over the silver event stream
    on its two candidate shuffle keys (oracle: the CTE twin below)."""
    return key_skew_frame(silver_events(spark, sf_dir))


KEY_SKEW_REPORT_SQL = silver_cte(
    ","
    + ",".join(_key_counts_block(k) for k in ("user_id", "event_type"))
    + """
SELECT * FROM block_user_id
UNION ALL
SELECT * FROM block_event_type
ORDER BY key_col, rank
"""
)


# --- salted join -------------------------------------------------------------

SALTED_JOIN_N_SALTS = 8


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_src: Sequence[str],
    n_salts: int = SALTED_JOIN_N_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: semantics identical to ``big.join(small, on,
    how)``, plan shape split so no single reduce task owns a hot key.
    ``how`` is restricted to fact-preserving modes ({'inner', 'left',
    'left_semi', 'left_anti'}): for 'right'/'full' the explode
    replication would emit each unmatched small-side row ``n_salts``
    times, which is NOT equivalent to the plain join.

    The fact side gets a salt derived from ``salt_src`` columns (MUST be
    key-independent — e.g. a row id — or every row of a hot key lands in
    the same cell and the salt is a no-op); the dim side is replicated
    once per salt via a literal-array explode. Joining on (keys + salt)
    spreads each hot key across ``n_salts`` cells at the cost of reading
    the dim ``n_salts`` times — the escape hatch when the dim is too big
    to broadcast AND one fact key overflows a task even after AQE's
    skew-join split (AQE only splits the FACT side; it cannot help when
    the matching dim partition itself is the problem, or for the
    sort-merge fallback on a non-splittable hot partition).
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the dim-side explode "
            f"replication duplicates unmatched small rows for right/full "
            f"outer joins; allowed: {sorted(allowed)}"
        )
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in salt_src], F.lit(7)), F.lit(n_salts)
    ).cast("int")
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    b = big.withColumn("__salt", salt)
    s = small.withColumn("__salt", F.explode(salts))
    return b.join(s, [*on, "__salt"], how).drop("__salt")


def user_tenure_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical hot-key fact-x-dim join, salted: per-user first-seen
    dates (the dim — at 100 TB a billion-row user table, far beyond
    broadcast) joined back to the event fact on the zipfian user_id via
    ``salted_join`` (salt from the unique event_id), then rolled up to
    tenure-bucket engagement. The oracle is the PLAIN join + rollup —
    salting is plan shape, not semantics, so the hash must be identical.
    """
    silver = silver_events(spark, sf_dir)
    dim = silver.groupBy("user_id").agg(
        F.min("event_date").alias("first_seen_date")
    )
    fact = silver.select("user_id", "event_id", "event_type", "event_date")
    joined = salted_join(fact, dim, ["user_id"], ["event_id"])
    tenure = F.datediff("event_date", "first_seen_date")
    bucket = (
        F.when(tenure <= F.lit(0), "day0")
        .when(tenure <= F.lit(7), "week1")
        .when(tenure <= F.lit(30), "month1")
        .otherwise("later")
    )
    return (
        joined.withColumn("tenure_bucket", bucket)
        .groupBy("event_type", "tenure_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("event_type", "tenure_bucket")
    )


USER_TENURE_SALTED_JOIN_SQL = silver_cte("""
, dim AS (
  SELECT user_id, MIN(event_date) AS first_seen_date
  FROM silver GROUP BY user_id
)
SELECT s.event_type,
  CASE
    WHEN date_diff('day', d.first_seen_date, s.event_date) <= 0 THEN 'day0'
    WHEN date_diff('day', d.first_seen_date, s.event_date) <= 7 THEN 'week1'
    WHEN date_diff('day', d.first_seen_date, s.event_date) <= 30 THEN 'month1'
    ELSE 'later'
  END AS tenure_bucket,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COUNT(DISTINCT s.user_id) AS BIGINT) AS n_users
FROM silver s JOIN dim d ON s.user_id = d.user_id
GROUP BY 1, 2
ORDER BY event_type, tenure_bucket
""")
