"""DQ reporting queries (reference: quality-stats rollup
data_quality.py:512-539 and the per-run validity metric
main_pipeline.py:174-178).

The DuckDB oracle predicates are GENERATED from the same rule table the
Spark compiler consumes, so the two sides cannot drift.

Plan shape: one wide aggregation row (every rule counted in a single
scan, map-side combined) then ``stack`` to unpivot — the A5 stats never
shuffle more than one row per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .compiler import _EMAIL_PATTERN, _URL_PATTERN, compile_rule, with_quality
from .rules import EVENTS_RULES, Rule, Severity


def _sql_pass_predicate(rule: Rule) -> str:
    """DuckDB SQL mirror of compiler.compile_rule (True = pass) — covers
    all 11 rule types the reference declares (data_quality.py:57-217)."""
    c, p, t = rule.column, rule.params, rule.rule_type
    if t == "required":
        return f"({c} IS NOT NULL AND CAST({c} AS VARCHAR) != '')"
    if t == "format":
        ok = f"regexp_matches({c}, '{p['pattern']}')"
        if "min_len" in p:
            ok = f"({ok} AND length({c}) BETWEEN {p['min_len']} AND {p['max_len']})"
        return f"({c} IS NULL OR {ok})"
    if t == "enum":
        vals = ", ".join(f"'{v}'" for v in p["allowed"])
        return f"({c} IS NULL OR {c} IN ({vals}))"
    if t == "numeric_range":
        d = f"TRY_CAST({c} AS DOUBLE)"
        return (
            f"({c} IS NULL OR ({d} IS NOT NULL AND {d} BETWEEN {p['min']} AND {p['max']}))"
        )
    if t == "timestamp_valid":
        return (
            f"({c} IS NULL OR TRY_CAST(CAST({c} AS VARCHAR) AS TIMESTAMP) IS NOT NULL)"
        )
    if t == "timestamp_range":
        return (
            f"({c} IS NULL OR CAST({c} AS TIMESTAMP) BETWEEN "
            f"TIMESTAMP '{p['min']}' AND TIMESTAMP '{p['max']}')"
        )
    if t == "conditional_required":
        trigger = f"({p['when_column']} > {p['threshold']})"
        return f"(NOT {trigger} OR ({c} IS NOT NULL AND CAST({c} AS VARCHAR) != ''))"
    if t == "url_valid":
        return f"({c} IS NULL OR regexp_matches({c}, '{_URL_PATTERN}'))"
    if t == "email_valid":
        return f"({c} IS NULL OR regexp_matches({c}, '{_EMAIL_PATTERN}'))"
    if t == "country_code":
        vals = ", ".join(f"'{v}'" for v in p["allowed"])
        return f"({c} IS NULL OR UPPER({c}) IN ({vals}))"
    if t == "string_length":
        return f"({c} IS NULL OR length({c}) BETWEEN {p['min']} AND {p['max']})"
    raise ValueError(f"no SQL mirror for rule type {t}")


# Deterministic derived columns so the email/url/country/ts-string rule
# types have something to validate on the events table; Spark and SQL
# forms are mirrored expression-for-expression.
_DQ_COUNTRIES = ["US", "gb", "DE", "XX", "FR", "JP"]  # 'XX' fails, 'gb' passes
_DQ_COUNTRIES_SQL = ", ".join(f"'{c}'" for c in _DQ_COUNTRIES)


def derive_dq_columns(df: DataFrame) -> DataFrame:
    eid = F.col("event_id")
    return (
        df.withColumn(
            "contact_email",
            F.when(eid % 7 == 0, F.lit("not-an-email")).otherwise(
                F.concat(
                    F.lit("user"), F.col("user_id").cast("string"), F.lit("@example.com")
                )
            ),
        )
        .withColumn(
            "referrer_url",
            F.when(eid % 11 == 0, F.lit("notaurl")).otherwise(
                F.concat(F.lit("https://shop.example.com/"), F.col("event_type"))
            ),
        )
        .withColumn(
            "country",
            F.element_at(
                F.array(*[F.lit(c) for c in _DQ_COUNTRIES]),
                (eid % 6 + 1).cast("int"),
            ),
        )
        .withColumn(
            "ts_str",
            F.when(eid % 13 == 0, F.lit("2024-99-99 00:00:00")).otherwise(
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
            ),
        )
    )


_EVENTS_CTE = f"""WITH raw AS (
  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props,
    CASE WHEN event_id % 7 = 0 THEN 'not-an-email'
         ELSE 'user' || CAST(user_id AS VARCHAR) || '@example.com' END AS contact_email,
    CASE WHEN event_id % 11 = 0 THEN 'notaurl'
         ELSE 'https://shop.example.com/' || event_type END AS referrer_url,
    ([{_DQ_COUNTRIES_SQL}])[CAST(event_id % 6 + 1 AS INT)] AS country,
    CASE WHEN event_id % 13 = 0 THEN '2024-99-99 00:00:00'
         ELSE strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') END AS ts_str
  FROM events)"""


def dq_rule_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per rule: fail_count + fail_pct over the raw events table.
    Single scan: every rule is a conditional sum in one aggregate."""
    raw = derive_dq_columns(load_table(spark, sf_dir, "events"))
    rules = EVENTS_RULES
    agg = raw.agg(
        F.count(F.lit(1)).alias("_total"),
        *[
            F.sum(F.when(~compile_rule(r), 1).otherwise(0)).alias(r.name)
            for r in rules
        ],
    )
    stack_args = ", ".join(f"'{r.name}', {r.name}" for r in rules)
    unpivoted = agg.selectExpr(
        "_total", f"stack({len(rules)}, {stack_args}) AS (rule, fail_count)"
    )
    severity = F.lit(None).cast("string")
    for r in rules:
        severity = F.when(F.col("rule") == r.name, F.lit(r.severity.value)).otherwise(
            severity
        )
    return unpivoted.select(
        "rule",
        severity.alias("severity"),
        "fail_count",
        (F.col("fail_count") * 100.0 / F.col("_total")).alias("fail_pct"),
    )


def _rule_stats_sql() -> str:
    rules = EVENTS_RULES
    sums = ",\n    ".join(
        f"CAST(SUM(CASE WHEN NOT {_sql_pass_predicate(r)} THEN 1 ELSE 0 END) AS BIGINT) AS {r.name}"
        for r in rules
    )
    selects = "\nUNION ALL\n".join(
        f"SELECT '{r.name}' AS rule, '{r.severity.value}' AS severity, "
        f"{r.name} AS fail_count, {r.name} * 100.0 / _total AS fail_pct FROM agg"
        for r in rules
    )
    return f"{_EVENTS_CTE}, agg AS (\n  SELECT COUNT(*) AS _total,\n    {sums}\n  FROM raw\n)\n{selects}"


DQ_RULE_STATS_SQL = _rule_stats_sql()


def dq_daily_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day validity rollup (A6-style trend input): total/valid/invalid,
    validity rate, mean quality score."""
    raw = derive_dq_columns(load_table(spark, sf_dir, "events"))
    scored = with_quality(raw, EVENTS_RULES)
    return (
        scored.groupBy(F.to_date("ts").alias("event_date"))
        .agg(
            F.count(F.lit(1)).alias("total_records"),
            F.sum(F.when(F.col("is_valid"), 1).otherwise(0)).alias("valid_records"),
            F.sum(F.when(~F.col("is_valid"), 1).otherwise(0)).alias("invalid_records"),
            F.avg(F.col("quality_score").cast("long")).alias("avg_quality_score"),
        )
        .withColumn(
            "validity_rate",
            F.col("valid_records").cast("double") / F.col("total_records"),
        )
    )


def _daily_validity_sql() -> str:
    error_rules = [
        r for r in EVENTS_RULES if r.severity in (Severity.ERROR, Severity.CRITICAL)
    ]
    critical_fails = " + ".join(
        f"(CASE WHEN NOT {_sql_pass_predicate(r)} THEN 1 ELSE 0 END)"
        for r in EVENTS_RULES
        if r.severity == Severity.CRITICAL
    )
    error_fails = " + ".join(
        f"(CASE WHEN NOT {_sql_pass_predicate(r)} THEN 1 ELSE 0 END)"
        for r in EVENTS_RULES
        if r.severity == Severity.ERROR
    )
    valid = " AND ".join(_sql_pass_predicate(r) for r in error_rules)
    return f"""{_EVENTS_CTE}, scored AS (
  SELECT CAST(ts AS DATE) AS event_date,
         ({valid}) AS is_valid,
         GREATEST(100 - 10 * ({critical_fails}) - 5 * ({error_fails}), 0) AS quality_score
  FROM raw
)
SELECT event_date,
  COUNT(*) AS total_records,
  CAST(SUM(CASE WHEN is_valid THEN 1 ELSE 0 END) AS BIGINT) AS valid_records,
  CAST(SUM(CASE WHEN NOT is_valid THEN 1 ELSE 0 END) AS BIGINT) AS invalid_records,
  AVG(quality_score) AS avg_quality_score,
  CAST(SUM(CASE WHEN is_valid THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS validity_rate
FROM scored
GROUP BY event_date
"""


DQ_DAILY_VALIDITY_SQL = _daily_validity_sql()


# --- A6 trend classification + recommendations -----------------------------

_REC_CRITICAL = "CRITICAL: Address critical data quality issues before proceeding"
_REC_HIGH = "HIGH: Significant data quality issues detected, review data sources"
_REC_MEDIUM = "MEDIUM: Minor data quality issues, monitor and improve data collection"
_REC_GOOD = "GOOD: Data quality is acceptable"


def dq_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 (data_quality.py:592-608 + :563-573): per-day quality trend over
    a trailing 7-day window — average validity, improving/declining verdict
    (last > first, strictly — ties decline, as in the reference), stability
    (population std, np.std parity) — plus the reference's recommendation
    string from critical/error/total issue counts.

    The trailing window is unpartitioned by design: its input is one row
    per calendar day (bounded by the calendar, ~4k rows/decade no matter
    the data volume), the same bounded-metadata argument as
    engagement_metrics' share-of-total. Stability uses the explicit
    E[x²]−E[x]² form rather than stddev_pop so Spark and DuckDB run the
    identical IEEE operation sequence."""
    raw = derive_dq_columns(load_table(spark, sf_dir, "events"))
    scored = with_quality(raw, EVENTS_RULES)
    daily = (
        scored.groupBy(F.to_date("ts").alias("event_date"))
        .agg(
            (
                F.sum(F.when(F.col("is_valid"), 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
            ).alias("validity_rate"),
            F.sum("dq_criticals").alias("critical_issues"),
            F.sum("dq_errors").alias("error_issues"),
            F.sum(
                F.col("dq_criticals") + F.col("dq_errors") + F.col("dq_warnings")
            ).alias("total_issues"),
        )
    )
    w = Window.orderBy("event_date").rowsBetween(-6, 0)
    rate = F.col("validity_rate")
    avg_rate = F.avg(rate).over(w)
    avg_sq = F.avg(rate * rate).over(w)
    return daily.select(
        "event_date",
        "validity_rate",
        "critical_issues",
        "error_issues",
        "total_issues",
        avg_rate.alias("avg_validity_rate_7d"),
        F.sqrt(F.greatest(avg_sq - avg_rate * avg_rate, F.lit(0.0))).alias(
            "stability_7d"
        ),
        F.when(rate > F.first(rate).over(w), F.lit("improving"))
        .otherwise(F.lit("declining"))
        .alias("validity_trend"),
        F.when(F.col("critical_issues") > 0, F.lit(_REC_CRITICAL))
        .when(F.col("error_issues") > F.col("total_issues") * 0.1, F.lit(_REC_HIGH))
        .when(F.col("error_issues") > 0, F.lit(_REC_MEDIUM))
        .otherwise(F.lit(_REC_GOOD))
        .alias("recommendation"),
    )


def _trend_sql() -> str:
    crit = " + ".join(
        f"(CASE WHEN NOT {_sql_pass_predicate(r)} THEN 1 ELSE 0 END)"
        for r in EVENTS_RULES
        if r.severity == Severity.CRITICAL
    )
    err = " + ".join(
        f"(CASE WHEN NOT {_sql_pass_predicate(r)} THEN 1 ELSE 0 END)"
        for r in EVENTS_RULES
        if r.severity == Severity.ERROR
    )
    warn = " + ".join(
        f"(CASE WHEN NOT {_sql_pass_predicate(r)} THEN 1 ELSE 0 END)"
        for r in EVENTS_RULES
        if r.severity in (Severity.WARNING, Severity.INFO)
    )
    valid = " AND ".join(
        _sql_pass_predicate(r)
        for r in EVENTS_RULES
        if r.severity in (Severity.ERROR, Severity.CRITICAL)
    )
    return f"""{_EVENTS_CTE}, scored AS (
  SELECT CAST(ts AS DATE) AS event_date,
         ({valid}) AS is_valid,
         ({crit}) AS n_crit, ({err}) AS n_err, ({warn}) AS n_warn
  FROM raw
), daily AS (
  SELECT event_date,
    CAST(SUM(CASE WHEN is_valid THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS validity_rate,
    CAST(SUM(n_crit) AS BIGINT) AS critical_issues,
    CAST(SUM(n_err) AS BIGINT) AS error_issues,
    CAST(SUM(n_crit + n_err + n_warn) AS BIGINT) AS total_issues
  FROM scored GROUP BY event_date
)
SELECT event_date, validity_rate, critical_issues, error_issues, total_issues,
  AVG(validity_rate) OVER w AS avg_validity_rate_7d,
  sqrt(GREATEST(AVG(validity_rate * validity_rate) OVER w
                - AVG(validity_rate) OVER w * AVG(validity_rate) OVER w, 0)) AS stability_7d,
  CASE WHEN validity_rate > FIRST_VALUE(validity_rate) OVER w
       THEN 'improving' ELSE 'declining' END AS validity_trend,
  CASE WHEN critical_issues > 0 THEN '{_REC_CRITICAL}'
       WHEN error_issues > total_issues * 0.1e0 THEN '{_REC_HIGH}'
       WHEN error_issues > 0 THEN '{_REC_MEDIUM}'
       ELSE '{_REC_GOOD}' END AS recommendation
FROM daily
WINDOW w AS (ORDER BY event_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


DQ_TREND_SQL = _trend_sql()
