"""Rule → Column compiler (reference: the per-record Python evaluator at
data_quality.py:219-510, re-expressed as one vectorized pass).

Each rule compiles to a boolean pass/fail Column; ``with_quality`` attaches
per-row severity counters and a quality score, all inside whole-stage
codegen — no UDFs, no per-record Python, one scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .rules import SCORE_CRITICAL_PENALTY, SCORE_ERROR_PENALTY, Rule, Severity

_URL_PATTERN = r"^https?://[^\s/$.?#].[^\s]*$"
_EMAIL_PATTERN = r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"


def compile_rule(rule: Rule) -> Column:
    """True where the row PASSES the rule. Null-handling follows the
    reference: ``required`` fails on null/empty, every other rule passes
    nulls through (data_quality.py:283-510)."""
    c = F.col(rule.column)
    p = rule.params
    t = rule.rule_type

    if t == "required":
        return c.isNotNull() & (c.cast("string") != "")
    if t == "format":
        ok = c.rlike(p["pattern"])
        if "min_len" in p:
            ok = ok & F.length(c).between(p["min_len"], p["max_len"])
        return c.isNull() | ok
    if t == "enum":
        return c.isNull() | c.isin(p["allowed"])
    if t == "numeric_range":
        d = c.try_cast("double")
        return c.isNull() | (d.isNotNull() & d.between(p["min"], p["max"]))
    if t == "timestamp_valid":
        return c.isNull() | F.try_to_timestamp(c.cast("string")).isNotNull()
    if t == "timestamp_range":
        ts = c.try_cast("timestamp")
        return c.isNull() | ts.between(
            F.lit(p["min"]).cast("timestamp"), F.lit(p["max"]).cast("timestamp")
        )
    if t == "conditional_required":
        # intended semantics of the reference's broken rule
        # (data_quality.py:427-438): when <when_column> <op> <threshold>,
        # <column> must be non-null/non-empty. The trigger is coalesced so
        # a NULL when_column means not-required in BOTH with_quality and
        # validity_column (a raw NULL would pass one and drop in the other).
        cond = F.col(p["when_column"])
        raw = cond > p["threshold"] if p.get("op", "gt") == "gt" else cond.isin(
            p.get("values", [])
        )
        trigger = F.coalesce(raw, F.lit(False))
        return ~trigger | (c.isNotNull() & (c.cast("string") != ""))
    if t == "url_valid":
        return c.isNull() | c.rlike(_URL_PATTERN)
    if t == "email_valid":
        return c.isNull() | c.rlike(_EMAIL_PATTERN)
    if t == "country_code":
        return c.isNull() | F.upper(c).isin(p["allowed"])
    if t == "string_length":
        return c.isNull() | F.length(c).between(p["min"], p["max"])
    raise ValueError(f"unknown rule type: {t}")


def _severity_count(rules: list[Rule], severities: set[Severity]) -> Column:
    cols = [
        F.when(~compile_rule(r), 1).otherwise(0)
        for r in rules
        if r.severity in severities
    ]
    if not cols:
        return F.lit(0)
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out


def with_quality(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Attach per-row DQ columns: one ``dq_<rule>`` boolean per rule,
    severity counters, ``is_valid`` (drop iff any ERROR/CRITICAL failed,
    data_quality.py:237-242) and ``quality_score`` (data_quality.py:560)."""
    out = df
    for r in rules:
        out = out.withColumn(f"dq_{r.name}", compile_rule(r))
    n_critical = _severity_count(rules, {Severity.CRITICAL})
    n_error = _severity_count(rules, {Severity.ERROR})
    n_warning = _severity_count(rules, {Severity.WARNING, Severity.INFO})
    score = (
        F.lit(100)
        - F.lit(SCORE_CRITICAL_PENALTY) * n_critical
        - F.lit(SCORE_ERROR_PENALTY) * n_error
    )
    return (
        out.withColumn("dq_criticals", n_critical)
        .withColumn("dq_errors", n_error)
        .withColumn("dq_warnings", n_warning)
        .withColumn("is_valid", (n_critical + n_error) == 0)
        .withColumn("quality_score", F.greatest(score, F.lit(0)))
    )


def validity_column(rules: list[Rule]) -> Column:
    """Single boolean: row survives (no ERROR/CRITICAL failure)."""
    out = F.lit(True)
    for r in rules:
        if r.severity in (Severity.ERROR, Severity.CRITICAL):
            out = out & compile_rule(r)
    return out
