"""Declarative data-quality rule tables (reference spec:
processing/utils/data_quality.py:57-217 — required/format/enum/
numeric_range/timestamp_valid/timestamp_range/url/email/country_code/
string_length rules with WARNING vs ERROR severities).

The reference evaluates rules per record in a Python loop
(data_quality.py:219-253); here every rule compiles to a boolean Column
(quality/compiler.py) so the whole table validates in one codegen'd pass.

Note the reference's ``conditional_required`` is buggy (it reads
``parameters['field']`` that is never set, data_quality.py:435); we
implement the *intended* semantics.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from .countries import ISO2_COUNTRY_CODES


class Severity(str, Enum):
    INFO = "INFO"
    WARNING = "WARNING"
    ERROR = "ERROR"
    CRITICAL = "CRITICAL"


@dataclass(frozen=True)
class Rule:
    name: str
    column: str
    rule_type: str  # required | format | enum | numeric_range | timestamp_valid | timestamp_range | conditional_required | url_valid | email_valid | country_code | string_length
    severity: Severity = Severity.ERROR
    params: dict = field(default_factory=dict)


# Rule table for the driver testdata ``events`` table, exercising the same
# rule types the reference declares for its clickstream topic
# (data_quality.py:57-123).
EVENTS_RULES: list[Rule] = [
    Rule("user_id_required", "user_id", "required", Severity.CRITICAL),
    Rule("event_type_required", "event_type", "required", Severity.ERROR),
    Rule("ts_required", "ts", "required", Severity.ERROR),
    Rule(
        "event_type_enum",
        "event_type",
        "enum",
        Severity.ERROR,
        {"allowed": ["view", "click", "purchase", "signup"]},
    ),
    Rule(
        "value_range",
        "value",
        "numeric_range",
        Severity.ERROR,
        {"min": 0.000001, "max": 1000.0},
    ),
    Rule(
        "ts_range",
        "ts",
        "timestamp_range",
        Severity.WARNING,
        {"min": "2024-01-01 00:00:00", "max": "2024-12-31 23:59:59"},
    ),
    Rule(
        "props_format",
        "props",
        "format",
        Severity.WARNING,
        {"pattern": r'^\{"k":\s*\d+\}$', "min_len": 5, "max_len": 20},
    ),
    Rule(
        "high_value_needs_purchase",
        "event_type",
        "conditional_required",
        Severity.INFO,
        {"when_column": "value", "op": "gt", "threshold": 400.0},
    ),
    # The remaining five rule types run against columns derived
    # deterministically from events (quality/report.py::derive_dq_columns,
    # mirrored in the oracle CTE) so every rule type the reference declares
    # (data_quality.py:57-217) is exercised under the hard oracle check.
    Rule("email_format", "contact_email", "email_valid", Severity.WARNING),
    Rule("url_format", "referrer_url", "url_valid", Severity.WARNING),
    Rule(
        "country_iso2",
        "country",
        "country_code",
        Severity.WARNING,
        {"allowed": ISO2_COUNTRY_CODES},
    ),
    Rule(
        "props_length",
        "props",
        "string_length",
        Severity.WARNING,
        {"min": 9, "max": 16},  # single-digit props payloads fail, 2-digit pass
    ),
    Rule("ts_str_valid", "ts_str", "timestamp_valid", Severity.WARNING),
]

# Per-record quality score (data_quality.py:560):
# max(0, 100 - 10*criticals - 5*errors); WARNING/INFO don't reduce it.
SCORE_CRITICAL_PENALTY = 10
SCORE_ERROR_PENALTY = 5
