"""PII detection and redaction over the ``documents`` table — the
scrub step every training-data pipeline runs before tokenization.

Three detector families, all expressed as engine-neutral regexes (the
subset of syntax Java's regex and DuckDB's RE2 implement identically:
no lookaround, no backreferences, ASCII ``\\b`` / ``\\d`` classes):

- email addresses → ``<EMAIL>``
- North-American phone numbers (optional ``+CC`` prefix) → ``<PHONE>``
- dotted-quad IPv4 addresses → ``<IP>``

Counts are taken BEFORE redaction via ``regexp_extract_all`` (leftmost,
non-overlapping in both engines); redaction applies in a fixed order
(email → phone → ip) so a pattern can never match inside another's
replacement token. Pure map stage: no shuffle, no Python — scales
linearly and runs inside whole-stage codegen.

The synthetic ``documents`` corpus contains no real PII, so the query
injects deterministic PII spans (keyed on ``doc_id`` residues, the same
trick plans/clickstream.py uses for bad-row fixtures) before scrubbing —
identical injection on the Spark and oracle sides, giving the hash check
non-trivial counts and redactions to disagree about.

Reference parity: none (clickstream reference has no scrub stage); this
is a "beyond the reference" LLM-pipeline operator per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

# Engine-neutral patterns (Java regex ∩ RE2). \b sits only where a word
# char is adjacent (a boundary next to '+' or '.' never fires in either
# engine, so we avoid it there).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"(\+\d{1,2} )?\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}(\.\d{1,3}){3}\b"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IP_TOKEN = "<IP>"


def _inject_spark(docs: DataFrame) -> DataFrame:
    """Deterministically append PII spans to a residue-keyed subset of
    docs: doc_id%7==0 → an email, %11==0 → a phone, %13==0 → an IPv4
    (residues overlap, so some docs carry several kinds)."""
    d = F.col("doc_id")
    email = F.when(
        d % 7 == 0,
        F.concat(
            F.lit(" contact user"), d.cast("string"), F.lit("@example.com")
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        d % 11 == 0,
        F.concat(
            F.lit(" call +1 555-"),
            F.lpad((d % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((d % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        d % 13 == 0,
        F.concat(
            F.lit(" from 10.0."),
            (d % 256).cast("string"),
            F.lit("."),
            (d % 254 + 1).cast("string"),
        ),
    ).otherwise(F.lit(""))
    return docs.select(
        "doc_id", F.concat(F.col("text"), email, phone, ip).alias("text")
    )


def _count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0))).cast(
        "long"
    )


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc PII counts + fully-redacted text: (doc_id, n_emails,
    n_phones, n_ipv4, pii_total, has_pii, redacted), ordered by doc_id."""
    docs = _inject_spark(load_table(spark, sf_dir, "documents"))
    t = F.col("text")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, EMAIL_TOKEN), PHONE_RE, PHONE_TOKEN
        ),
        IPV4_RE,
        IP_TOKEN,
    )
    out = docs.select(
        "doc_id",
        _count(t, EMAIL_RE).alias("n_emails"),
        _count(t, PHONE_RE).alias("n_phones"),
        _count(t, IPV4_RE).alias("n_ipv4"),
        redacted.alias("redacted"),
    )
    total = F.col("n_emails") + F.col("n_phones") + F.col("n_ipv4")
    return out.select(
        "doc_id",
        "n_emails",
        "n_phones",
        "n_ipv4",
        total.alias("pii_total"),
        (total > 0).alias("has_pii"),
        "redacted",
    ).orderBy("doc_id")


# DuckDB twin. regexp_replace needs the 'g' flag (default replaces only
# the FIRST match — a classic cross-engine trap); standard '...' strings
# keep backslashes literal, so the patterns paste in unchanged.
PII_SCRUB_SQL = f"""
WITH injected AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 7 = 0
         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
         ELSE '' END
    || CASE WHEN doc_id % 11 = 0
         THEN ' call +1 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
              || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         ELSE '' END
    || CASE WHEN doc_id % 13 = 0
         THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
              || '.' || CAST(doc_id % 254 + 1 AS VARCHAR)
         ELSE '' END AS text
  FROM documents
),
counted AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
    CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT) AS n_phones,
    CAST(len(regexp_extract_all(text, '{IPV4_RE}')) AS BIGINT) AS n_ipv4,
    regexp_replace(
      regexp_replace(
        regexp_replace(text, '{EMAIL_RE}', '{EMAIL_TOKEN}', 'g'),
        '{PHONE_RE}', '{PHONE_TOKEN}', 'g'),
      '{IPV4_RE}', '{IP_TOKEN}', 'g') AS redacted
  FROM injected
)
SELECT doc_id, n_emails, n_phones, n_ipv4,
  n_emails + n_phones + n_ipv4 AS pii_total,
  (n_emails + n_phones + n_ipv4) > 0 AS has_pii,
  redacted
FROM counted
ORDER BY doc_id
"""
