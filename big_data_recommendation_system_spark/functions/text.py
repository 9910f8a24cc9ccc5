"""Text-analysis column builders with engine-neutral semantics.

Every helper comes in two flavors that are kept adjacent so they cannot
drift: a Spark Column builder and a DuckDB SQL fragment builder. The
hashing primitive is md5-of-string (identical hex output in both engines,
verified), so MinHash signatures, LSH band keys and fingerprints are
bit-identical between Spark and the oracle.

These are the building blocks for the training-data pipeline operators
(language ID, quality scoring, token stats, fingerprinting, MinHash/LSH
near-dup detection) — all pure Column expressions, zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT = r"\W+"

# Tiny per-language stopword tables for the heuristic language classifier.
# Deterministic and mirrored into SQL; tie-break = alphabetical language id,
# zero hits = 'unknown'.
LANG_STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "en": ["the", "a", "of", "and", "to", "is", "in"],
    "es": ["el", "la", "de", "y", "que", "los", "una"],
    "fr": ["le", "la", "de", "et", "est", "les", "une"],
    "zh": ["de", "shi", "le", "zai", "he", "bu", "wo"],
}


# --- Spark side -------------------------------------------------------------


def tokens(text: Column) -> Column:
    """Lowercased word tokens, empty strings removed."""
    return F.filter(F.split(F.lower(F.trim(text)), TOKEN_SPLIT), lambda t: t != "")


def shingles(toks_name: str, n: int) -> Column:
    """Distinct word n-grams (space-joined) over a *named* token column
    (expr-based because slice() needs a column start index).

    Inputs shorter than ``n`` tokens yield an empty array: Spark's
    ``sequence(1, 0)`` DESCENDS to ``[1, 0]`` (it does not produce an
    empty list like DuckDB's ``range(1, 1)``), so the transform must be
    guarded or a short doc would emit a bogus index-0 slice."""
    if n == 1:
        return F.array_distinct(F.col(toks_name))
    return F.array_distinct(
        F.expr(
            f"CASE WHEN size({toks_name}) >= {n} THEN "
            f"transform(sequence(1, size({toks_name}) - {n - 1}), "
            f"i -> array_join(slice({toks_name}, i, {n}), ' ')) "
            f"ELSE CAST(array() AS array<string>) END"
        )
    )


def stopword_hits(toks: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def token_count(toks: Column) -> Column:
    return F.size(toks)


def punct_ratio(text: Column) -> Column:
    """Non-alphanumeric, non-whitespace chars / total chars."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.length(stripped).cast("double") / F.length(text)


def hash_bucket(col: Column, n_buckets: int) -> Column:
    """Deterministic 0..n_buckets-1 bucket from the first four md5 hex
    digits parsed as a uniform 0..65535 integer — the same construction
    as plans/corpus_prep.split_bucket, parameterized on the modulus.
    Power-of-two bucket counts divide 65536 exactly, so there is ZERO
    residual mod bias (prefer them for feature hashing)."""
    h = F.md5(col.cast("string"))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % n_buckets


def md5_str(col: Column) -> Column:
    return F.md5(col.cast("string"))


# --- DuckDB SQL mirrors -----------------------------------------------------

TOKENS_SQL = (
    "list_filter(regexp_split_to_array(lower(trim({text})), '\\W+'), x -> x != '')"
)


def tokens_sql(text: str = "text") -> str:
    return TOKENS_SQL.format(text=text)


def shingles_sql(toks: str, n: int) -> str:
    if n == 1:
        return f"list_distinct({toks})"
    return (
        f"list_distinct(list_transform(range(1, greatest(len({toks}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' ')))"
    )


def ngrams(toks_name: str, n: int) -> Column:
    """ALL word n-grams in order (NOT deduplicated — occurrence counts
    need the repeats that ``shingles`` collapses). Docs with fewer than
    ``n`` tokens yield an empty array (see ``shingles`` for why the
    guard is required on the Spark side — DuckDB's range(1,1) is empty,
    Spark's sequence(1,0) is [1, 0] and slice(toks, 0, n) throws)."""
    if n == 1:
        return F.col(toks_name)
    return F.expr(
        f"CASE WHEN size({toks_name}) >= {n} THEN "
        f"transform(sequence(1, size({toks_name}) - {n - 1}), "
        f"i -> array_join(slice({toks_name}, i, {n}), ' ')) "
        f"ELSE CAST(array() AS array<string>) END"
    )


def ngrams_sql(toks: str, n: int) -> str:
    if n == 1:
        return toks
    return (
        f"list_transform(range(1, greatest(len({toks}) - {n - 1}, 0) + 1), "
        f"i -> array_to_string({toks}[i:i+{n - 1}], ' '))"
    )


def stopword_hits_sql(toks: str, words: list[str]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({toks}, t -> t IN ({lst})))"


def punct_ratio_sql(text: str = "text") -> str:
    return (
        f"CAST(length(regexp_replace({text}, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)"
        f" / length({text})"
    )


_HEX_DIGITS = "0123456789abcdef"


def hash_bucket_sql(col: str, n_buckets: int) -> str:
    """DuckDB mirror of :func:`hash_bucket` — no conv(), so the 4 hex
    digits are parsed positionally (exact same 0..65535 integer)."""
    h = f"md5(CAST({col} AS VARCHAR))"
    terms = " + ".join(
        f"(strpos('{_HEX_DIGITS}', substr({h},{i + 1},1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"(({terms}) % {n_buckets})"
