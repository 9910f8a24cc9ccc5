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

from ..sources.tables import load_table
from .compiler import compile_rule, with_quality
from .rules import EVENTS_RULES, Rule, Severity


def _sql_pass_predicate(rule: Rule) -> str:
    """DuckDB SQL mirror of compiler.compile_rule (True = pass)."""
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
    if t == "timestamp_range":
        return (
            f"({c} IS NULL OR CAST({c} AS TIMESTAMP) BETWEEN "
            f"TIMESTAMP '{p['min']}' AND TIMESTAMP '{p['max']}')"
        )
    if t == "conditional_required":
        trigger = f"({p['when_column']} > {p['threshold']})"
        return f"(NOT {trigger} OR ({c} IS NOT NULL AND CAST({c} AS VARCHAR) != ''))"
    raise ValueError(f"no SQL mirror for rule type {t}")


_EVENTS_CTE = (
    "WITH raw AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, "
    "event_type, value, props FROM events)"
)


def dq_rule_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per rule: fail_count + fail_pct over the raw events table.
    Single scan: every rule is a conditional sum in one aggregate."""
    raw = load_table(spark, sf_dir, "events")
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
    raw = load_table(spark, sf_dir, "events")
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
