"""Bloom-filter pre-filtered decontamination — the 100 TB scale path.

The registered ``decontamination_report`` / ``train_contamination_scan``
queries join train shingles against a broadcast of the DISTINCT eval
shingle strings. That is exact and fine while the eval set is small, but
the broadcast grows with eval-shingle count × string width; at corpus
scale the standard trick is to broadcast a Bloom BITMAP instead (a few
MB regardless of string widths), pre-filter the train side map-side,
and run the exact string join only on the Bloom positives — the same
shape Spark itself uses for runtime row-group skipping
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) and what
``DataFrameStatFunctions.bloomFilter`` builds driver-side.

This module implements that shape DECLARATIVELY so it is value-checkable
cross-engine: the bitmap is a (word, bits) DataFrame packed with
``bit_or`` — at ``BLOOM_M`` bits / ``WORD_BITS`` per row it is ~8.7k
rows ≈ a few hundred KB broadcast, independent of how many strings the
eval side holds. Membership = all ``BLOOM_K`` probe positions set.
Hashing is the repo's engine-neutral md5-hex primitive (functions/text
module docstring) with Kirsch–Mitzenmacher double hashing
(pos_i = (h1 + i·h2) mod M, h2 forced odd), so Spark and DuckDB compute
bit-identical bitmaps and the whole pipeline — pack, probe, exact
verify — hash-matches.

The report quantifies exactly what matters operationally: per source,
how many distinct train shingles there are, how many survive the Bloom
pre-filter (the only rows the exact join must touch), how many are true
eval hits, and the false-positive overhead the bitmap size buys.

Reference: the decontamination direction mirrors the reference's
aspirational data-prep layer (README.md:62-75); the Bloom mechanics are
public Spark/Parquet practice, not reference code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import shingles, shingles_sql, tokens, tokens_sql
from ..sources.tables import load_table
from .corpus_prep import (
    DECON_NGRAM,
    _HEX,
    _split_bucket_sql,
    _split_label_sql,
    split_bucket,
    split_label,
)

# Bitmap size in bits. 2^18 ≈ 262k bits for the test corpora (~8 bits
# per eval shingle at sf0.1 → FPR ≈ (1-e^(-k/8))^k ≈ 5%); production
# scales M with the eval-shingle count — the broadcast stays M/WORD_BITS
# rows no matter how large the eval STRINGS are.
BLOOM_M = 1 << 18
# Probes per key (Kirsch–Mitzenmacher: pos_i = (h1 + i*h2) mod M).
BLOOM_K = 2
# Bits packed per bitmap row. 30 (not 32/64) keeps every shift strictly
# inside a signed 32-bit lane so neither engine hits shift-overflow
# semantics (Spark shiftleft wraps, DuckDB errors).
WORD_BITS = 30


def _h1(s: Column) -> Column:
    """First 32 md5 bits as a bigint (engine-neutral, see split_bucket)."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def _h2(s: Column) -> Column:
    """Second 32 md5 bits, forced odd so the double-hash probe sequence
    never degenerates to a single position mod the power-of-two M."""
    h = F.conv(F.substring(F.md5(s), 9, 8), 16, 10).cast("long")
    return h - (h % 2) + 1


def _positions(s: Column) -> Column:
    """Array of the BLOOM_K probe positions for a shingle."""
    h1, h2 = _h1(s), _h2(s)
    return F.array(
        *[(h1 + F.lit(i) * h2) % F.lit(BLOOM_M) for i in range(BLOOM_K)]
    )


def _word(pos: Column) -> Column:
    return F.floor(pos / WORD_BITS).cast("long").alias("word")


def _mask() -> Column:
    # expr, not F.shiftleft: the python API takes numBits as an int
    # literal only; the SQL function accepts a column
    return F.expr(
        f"CAST(shiftleft(1, CAST(pos % {WORD_BITS} AS INT)) AS BIGINT)"
    ).alias("mask")


def bloom_bitmap(keys: DataFrame, col: str) -> DataFrame:
    """Pack a string column's Bloom bitmap: (word, bits) with
    word = pos ÷ WORD_BITS and bits = bit_or of the position masks.
    ≤ BLOOM_M / WORD_BITS rows — the broadcastable filter."""
    pos = keys.select(F.explode(_positions(F.col(col))).alias("pos"))
    return (
        pos.select(_word(F.col("pos")), _mask())
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_decon_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Bloom-prefilter report over the train/eval shingle
    decontamination join: distinct train shingles, Bloom positives (the
    only rows the exact join touches), true eval hits, false positives.

    Scale shape: the shingle scan is computed once (cached; production
    writes it as a substrate table) and feeds both sides; the eval side
    packs to a ≤8.7k-row bitmap — the plan's only hinted broadcast; the
    train side probes it map-side after one (source, shingle) distinct;
    the exact string join runs ONLY on the Bloom positives, so its
    input is FPR-bounded and carries no hint (AQE picks the strategy).
    No corpus-sized broadcast anywhere.
    """
    from ..operators.substrate import session_frame

    def build_labeled() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        return docs.select(
            "doc_id",
            "source",
            split_label(split_bucket(F.col("doc_id"))).alias("split"),
            tokens(F.col("text")).alias("tok"),
        ).select(
            "source",
            "split",
            F.explode(shingles("tok", DECON_NGRAM)).alias("s"),
        )

    # session-registered: tokenize+shingle once; four branches read it
    # (a bare per-call cache leaked a CacheManager entry per invocation)
    labeled = session_frame(spark, sf_dir, "bloom:shingled", build_labeled)

    eval_s = labeled.filter(F.col("split") != "train").select("s").distinct()
    bitmap = bloom_bitmap(eval_s, "s")

    train_s = (
        labeled.filter(F.col("split") == "train")
        .select("source", "s")
        .distinct()
    )
    # Probe shape kept deliberately (r12 audit): explode the K probe
    # positions, broadcast-join the bitmap, AND the bit tests back
    # together with a groupBy (source, s). The groupBy exchange looks
    # removable (K chained per-probe broadcast joins need no shuffle),
    # but it only carries the rows that PASS the bit filter — true hits
    # + the ~FPR tail — while the chained-join variant re-derives the
    # md5 probe positions per probe column and drags the shingle string
    # through K joins: measured 2x SLOWER (4.0 s vs 8.1 s steady-state
    # A/B, OPTIMIZATION_r12.md).
    probes = train_s.select(
        "source",
        "s",
        F.explode(_positions(F.col("s"))).alias("pos"),
    ).select("source", "s", _word(F.col("pos")), _mask())
    bloom_pos = (
        probes.join(F.broadcast(bitmap), "word")
        .filter(F.col("bits").bitwiseAND(F.col("mask")) != 0)
        .groupBy("source", "s")
        .agg(F.count(F.lit(1)).alias("n_set"))
        .filter(F.col("n_set") == BLOOM_K)
        .select("source", "s")
    )
    exact = bloom_pos.join(eval_s, "s").select("source", "s")

    base = train_s.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_train_shingles")
    )
    bp = bloom_pos.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_bloom_pos")
    )
    ex = exact.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact_hits")
    )
    return (
        base.join(bp, "source", "left")
        .join(ex, "source", "left")
        .select(
            "source",
            "n_train_shingles",
            F.coalesce("n_bloom_pos", F.lit(0)).cast("long").alias("n_bloom_pos"),
            F.coalesce("n_exact_hits", F.lit(0))
            .cast("long")
            .alias("n_exact_hits"),
            (
                F.coalesce("n_bloom_pos", F.lit(0))
                - F.coalesce("n_exact_hits", F.lit(0))
            )
            .cast("long")
            .alias("n_false_pos"),
        )
        .orderBy("source")
    )


def _hex_int_sql(h: str, start: int, n: int) -> str:
    """DuckDB twin of Spark conv(substring(md5, start, n), 16, 10) —
    positional hex-digit parse (DuckDB has no conv). strpos returns
    BIGINT so the 16^7 multiplies never overflow an INTEGER lane."""
    terms = " + ".join(
        f"(strpos('{_HEX}', substr({h},{start + i},1)) - 1) * {16 ** (n - 1 - i)}"
        for i in range(n)
    )
    return f"({terms})"


def _bloom_sql() -> str:
    h1 = _hex_int_sql("hx", 1, 8)
    h2 = f"({_hex_int_sql('hx', 9, 8)} - ({_hex_int_sql('hx', 9, 8)} % 2) + 1)"
    pos_list = "[" + ", ".join(
        f"(h1 + {i} * h2) % {BLOOM_M}" for i in range(BLOOM_K)
    ) + "]"
    return f"""
WITH labeled AS (
  SELECT source,
    {_split_label_sql(_split_bucket_sql("doc_id"))} AS split,
    {tokens_sql()} AS tok
  FROM documents
),
sh AS (
  SELECT source, split, unnest({shingles_sql("tok", DECON_NGRAM)}) AS s
  FROM labeled
),
eval_s AS MATERIALIZED (
  SELECT DISTINCT s FROM sh WHERE split != 'train'
),
ehh AS (
  SELECT {h1} AS h1, {h2} AS h2 FROM (SELECT md5(s) AS hx FROM eval_s)
),
bitmap AS (
  SELECT pos // {WORD_BITS} AS word,
    bit_or(1 << CAST(pos % {WORD_BITS} AS INTEGER)) AS bits
  FROM (SELECT unnest({pos_list}) AS pos FROM ehh)
  GROUP BY word
),
train_s AS MATERIALIZED (
  SELECT DISTINCT source, s FROM sh WHERE split = 'train'
),
probes AS (
  SELECT source, s, pos // {WORD_BITS} AS word,
    1 << CAST(pos % {WORD_BITS} AS INTEGER) AS mask
  FROM (
    SELECT source, s, unnest({pos_list}) AS pos
    FROM (
      SELECT source, s, {h1} AS h1, {h2} AS h2
      FROM (SELECT source, s, md5(s) AS hx FROM train_s)
    )
  )
),
bloom_pos AS MATERIALIZED (
  SELECT source, s
  FROM probes JOIN bitmap USING (word)
  WHERE (bits & mask) != 0
  GROUP BY source, s
  HAVING COUNT(*) = {BLOOM_K}
),
exact AS (
  SELECT source, s FROM bloom_pos JOIN eval_s USING (s)
),
base AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_train_shingles
  FROM train_s GROUP BY source
),
bp AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_bloom_pos
  FROM bloom_pos GROUP BY source
),
ex AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_exact_hits
  FROM exact GROUP BY source
)
SELECT base.source, n_train_shingles,
  CAST(COALESCE(n_bloom_pos, 0) AS BIGINT) AS n_bloom_pos,
  CAST(COALESCE(n_exact_hits, 0) AS BIGINT) AS n_exact_hits,
  CAST(COALESCE(n_bloom_pos, 0) - COALESCE(n_exact_hits, 0) AS BIGINT)
    AS n_false_pos
FROM base
LEFT JOIN bp USING (source)
LEFT JOIN ex USING (source)
ORDER BY source
"""


BLOOM_DECON_PREFILTER_SQL = _bloom_sql()
