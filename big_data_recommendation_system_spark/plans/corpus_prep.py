"""Corpus-preparation operators for training-data pipelines over the
``documents`` table: deterministic train/val/test splitting, Gopher-style
repetition quality signals, and the composed filter → dedup → split
pipeline rollup.

Everything is engine-neutral and oracle-checked:

- The split bucket is derived from md5 hex digits via ``ascii()`` —
  identical in Spark and DuckDB (no reliance on either engine's internal
  ``hash()``), so the same document always lands in the same split on any
  engine, any partitioning, any cluster size. That reproducibility is the
  whole point of hash-based splitting (vs ``rand()`` seeds, which are
  partitioning-dependent in a distributed engine).
- Repetition stats use explode + two-level aggregation rather than
  per-row O(n·distinct) array scans, so a pathological 100k-token
  document costs O(n log n) shuffle work, not O(n²) CPU in one task.

Reference parity: the reference has no corpus-prep stage (it is a
clickstream pipeline); these are the §"beyond the reference" LLM-pipeline
operators the engine adds, built on the same tokenizer as
plans/text_analysis.py (functions/text.py:tokens).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import shingles, shingles_sql, tokens, tokens_sql
from ..sources.tables import load_table

# split fractions: 80% train / 10% validation / 10% test
TRAIN_UPPER = 80
VAL_UPPER = 90


# Hex alphabet for positional md5-digit parses — canonical copy lives in
# functions/text.py; re-exported here for plans.packing / plans.bloom.
from ..functions.text import _HEX_DIGITS as _HEX  # noqa: E402


def split_bucket(col: Column) -> Column:
    """Deterministic 0..99 bucket from the first four md5 hex digits,
    parsed as a uniform 0..65535 integer (conv base-16). Residual mod
    bias is 1/655 per bucket — negligible. NOT ascii()-arithmetic on the
    hex chars: their codepoints are non-contiguous, which skews the mod
    distribution by several percent. Delegates to the shared
    parameterized primitive (functions/text.hash_bucket) so the tricky
    engine-parity hex parse lives in exactly one place."""
    from ..functions.text import hash_bucket

    return hash_bucket(col, 100)


def _split_bucket_sql(col: str) -> str:
    # DuckDB has no conv(); the shared helper parses the 4 hex digits
    # positionally — exact same 0..65535 value as Spark's conv(.., 16, 10)
    from ..functions.text import hash_bucket_sql

    return hash_bucket_sql(col, 100)


def split_label(bucket: Column) -> Column:
    return (
        F.when(bucket < TRAIN_UPPER, F.lit("train"))
        .when(bucket < VAL_UPPER, F.lit("validation"))
        .otherwise(F.lit("test"))
    )


def _split_label_sql(bucket: str) -> str:
    return (
        f"CASE WHEN {bucket} < {TRAIN_UPPER} THEN 'train' "
        f"WHEN {bucket} < {VAL_UPPER} THEN 'validation' ELSE 'test' END"
    )


def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document deterministic split assignment. Pure map stage — no
    shuffle, scales linearly; the assignment is stable under reordering,
    repartitioning, and incremental corpus growth (new docs never move
    old docs between splits, unlike fraction-based randomSplit)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = split_bucket(F.col("doc_id")).cast("long")
    return docs.select(
        "doc_id",
        "lang",
        bucket.alias("bucket"),
        split_label(F.col("bucket")).alias("split"),
    ).orderBy("doc_id")


CORPUS_SPLIT_SQL = f"""
SELECT doc_id, lang, bucket, {_split_label_sql("bucket")} AS split
FROM (
  SELECT doc_id, lang,
    CAST({_split_bucket_sql("doc_id")} AS BIGINT) AS bucket
  FROM documents
)
ORDER BY doc_id
"""


def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals per document: distinct-word ratio,
    most-frequent-word share, most-frequent-bigram share. High top-word /
    top-bigram ratios flag boilerplate and degenerate generations; low
    distinct ratio flags keyword stuffing.

    Scale shape: explode → (doc_id, token) partial-combined count →
    per-doc max. Both aggregations hash on doc_id-prefixed keys, so the
    heavy first phase combines map-side and the second reuses the same
    partitioning. No per-row quadratic array scans."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens(F.col("text")).alias("tok"))
    base = t.select(
        "doc_id",
        F.size("tok").cast("long").alias("total_words"),
        F.size(F.array_distinct("tok")).cast("long").alias("distinct_words"),
        "tok",
    )

    top_word = (
        t.select("doc_id", F.explode("tok").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_word_count"))
    )

    bigrams = F.when(
        F.size("tok") >= 2,
        F.expr(
            "transform(sequence(1, size(tok) - 1), "
            "i -> concat(element_at(tok, i), ' ', element_at(tok, i + 1)))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    top_bigram = (
        t.select("doc_id", F.explode(bigrams).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_count"))
    )

    zero = F.lit(0).cast("long")
    return (
        base.drop("tok")
        .join(top_word, "doc_id", "left")
        .join(top_bigram, "doc_id", "left")
        .select(
            "doc_id",
            "total_words",
            "distinct_words",
            (F.col("distinct_words").cast("double") / F.col("total_words")).alias(
                "distinct_ratio"
            ),
            F.coalesce("top_word_count", zero).alias("top_word_count"),
            (
                F.coalesce("top_word_count", zero).cast("double")
                / F.col("total_words")
            ).alias("top_word_ratio"),
            F.coalesce("top_bigram_count", zero).alias("top_bigram_count"),
            F.when(
                F.col("total_words") >= 2,
                F.coalesce("top_bigram_count", zero).cast("double")
                / (F.col("total_words") - 1),
            ).alias("top_bigram_ratio"),
        )
        .orderBy("doc_id")
    )


DOC_REPETITION_STATS_SQL = f"""
WITH t AS (SELECT doc_id, {tokens_sql()} AS tok FROM documents),
base AS (
  SELECT doc_id, len(tok) AS total_words,
    len(list_distinct(tok)) AS distinct_words
  FROM t
),
w AS (SELECT doc_id, unnest(tok) AS w FROM t),
wc AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY doc_id, w),
tw AS (SELECT doc_id, MAX(c) AS top_word_count FROM wc GROUP BY doc_id),
bg AS (
  SELECT doc_id, unnest(
    CASE WHEN len(tok) >= 2
      THEN list_transform(generate_series(1, len(tok) - 1),
                          i -> tok[i] || ' ' || tok[i + 1])
      ELSE CAST([] AS VARCHAR[]) END) AS b
  FROM t
),
bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b),
tb AS (SELECT doc_id, MAX(c) AS top_bigram_count FROM bc GROUP BY doc_id)
SELECT base.doc_id, total_words, distinct_words,
  CAST(distinct_words AS DOUBLE) / total_words AS distinct_ratio,
  COALESCE(top_word_count, 0) AS top_word_count,
  CAST(COALESCE(top_word_count, 0) AS DOUBLE) / total_words AS top_word_ratio,
  COALESCE(top_bigram_count, 0) AS top_bigram_count,
  CASE WHEN total_words >= 2
    THEN CAST(COALESCE(top_bigram_count, 0) AS DOUBLE) / (total_words - 1)
    ELSE NULL END AS top_bigram_ratio
FROM base
LEFT JOIN tw ON base.doc_id = tw.doc_id
LEFT JOIN tb ON base.doc_id = tb.doc_id
ORDER BY base.doc_id
"""


# quality gates for the composed pipeline (engine constants, mirrored in SQL)
MIN_WORDS = 20
MAX_WORDS = 1000
MIN_DISTINCT_RATIO = 0.3


def corpus_prep_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus-prep pipeline as one declarative plan:
    quality filter (length + distinct-ratio gates) → exact content dedup
    (keep lowest doc_id per md5) → deterministic split → per-(split,
    lang) doc/token counts. This is the "corpus card" a training run
    starts from.

    Scale: filter is a map stage; dedup shuffles once on content_hash
    (a window over the hash key — bounded groups); the final rollup is a
    tiny-key aggregation. One wide shuffle total at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    tok = tokens(F.col("text"))
    base = docs.select(
        "doc_id",
        "lang",
        F.md5("text").alias("content_hash"),
        F.size(tok).cast("long").alias("n_words"),
        F.size(F.array_distinct(tok)).cast("long").alias("n_distinct"),
    )
    qual = base.filter(
        F.col("n_words").between(MIN_WORDS, MAX_WORDS)
        & (
            F.col("n_distinct").cast("double") / F.col("n_words")
            > MIN_DISTINCT_RATIO
        )
    )
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    kept = qual.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    bucket = split_bucket(F.col("doc_id"))
    return (
        kept.select(
            split_label(bucket).alias("split"), "lang", "n_words"
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_words"),
        )
        .orderBy("split", "lang")
    )


CORPUS_PREP_SUMMARY_SQL = f"""
WITH base AS (
  SELECT doc_id, lang, md5(text) AS content_hash,
    len({tokens_sql()}) AS n_words,
    len(list_distinct({tokens_sql()})) AS n_distinct
  FROM documents
),
qual AS (
  SELECT * FROM base
  WHERE n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS}
    AND CAST(n_distinct AS DOUBLE) / n_words > {MIN_DISTINCT_RATIO}
),
kept AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
    FROM qual
  ) WHERE rn = 1
)
SELECT {_split_label_sql(_split_bucket_sql("doc_id"))} AS split,
  lang, COUNT(*) AS n_docs, CAST(SUM(n_words) AS BIGINT) AS total_words
FROM kept
GROUP BY split, lang
ORDER BY split, lang
"""


# --- train/eval decontamination ---------------------------------------------

# n-gram size for the contamination check. Real pipelines use 8-13-word
# n-grams (GPT-3 appendix C used 13-gram collision; Dolma/FineWeb use
# similar); the synthetic corpus has short documents over a small
# vocabulary, so 3-grams keep the check meaningful at test scale. The
# operator shape is n-independent.
DECON_NGRAM = 3
# an eval doc is contaminated when this fraction of its distinct n-grams
# also appears anywhere in the train split
DECON_TAU = 0.5


def decontamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→eval contamination check: for every validation/test document,
    the fraction of its distinct word n-grams that also occur anywhere in
    the train split, plus the ≥ DECON_TAU contamination flag.

    This is the standard eval-decontamination pass of an LLM data
    pipeline (n-gram collision against the training corpus). Scale
    shape: both sides reduce to DISTINCT n-gram keys before the join —
    the train side collapses to its unique-shingle set (one hash
    aggregation, map-side combined), the eval side stays (doc_id,
    shingle) — and the overlap is a shingle-keyed shuffle join followed
    by a per-doc count. Nothing is quadratic; the join key at 100 TB
    would be the md5 of the shingle rather than the raw string to keep
    shuffle rows narrow (same collision behavior as the MinHash
    machinery, functions/text.py).
    """
    from ..operators.substrate import session_frame

    def build_shingled() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            split_label(split_bucket(F.col("doc_id"))).alias("split"),
            tokens(F.col("text")).alias("tok"),
        )
        return docs.select(
            "doc_id", "split", shingles("tok", DECON_NGRAM).alias("sh")
        )

    # session-registered: the shingled frame feeds BOTH the train-side
    # distinct and the eval side — without materialization the
    # tokenize+shingle scan runs twice; a bare per-call cache leaked a
    # CacheManager entry per invocation
    shingled = session_frame(spark, sf_dir, "decon:shingled", build_shingled)
    train_sh = (
        shingled.filter(F.col("split") == "train")
        .select(F.explode("sh").alias("s"))
        .distinct()
    )
    eval_sh = shingled.filter(F.col("split") != "train").select(
        "doc_id", "split", F.size("sh").cast("long").alias("n_shingles"), "sh"
    )
    hits = (
        eval_sh.select("doc_id", F.explode("sh").alias("s"))
        .join(train_sh, "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    ratio = F.col("n_overlap") / F.col("n_shingles")
    return (
        eval_sh.drop("sh")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "split",
            "n_shingles",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            F.when(F.col("n_shingles") > 0, F.coalesce(ratio, F.lit(0.0)))
            .otherwise(F.lit(0.0))
            .alias("overlap_ratio"),
            (
                F.when(F.col("n_shingles") > 0, F.coalesce(ratio, F.lit(0.0)))
                .otherwise(F.lit(0.0))
                >= DECON_TAU
            ).alias("is_contaminated"),
        )
        .orderBy("doc_id")
    )


DECONTAMINATION_SQL = f"""
WITH labeled AS (
  SELECT doc_id,
    {_split_label_sql(_split_bucket_sql("doc_id"))} AS split,
    {tokens_sql()} AS tok
  FROM documents
), shingled AS (
  SELECT doc_id, split, {shingles_sql("tok", DECON_NGRAM)} AS sh FROM labeled
), train_sh AS (
  SELECT DISTINCT s
  FROM (SELECT unnest(sh) AS s FROM shingled WHERE split = 'train')
), eval_docs AS (
  SELECT doc_id, split, CAST(len(sh) AS BIGINT) AS n_shingles, sh
  FROM shingled WHERE split != 'train'
), hits AS (
  SELECT e.doc_id, COUNT(*) AS n_overlap
  FROM (SELECT doc_id, unnest(sh) AS s FROM eval_docs) e
  JOIN train_sh t ON e.s = t.s
  GROUP BY e.doc_id
)
SELECT d.doc_id, d.split, d.n_shingles,
  CAST(COALESCE(h.n_overlap, 0) AS BIGINT) AS n_overlap,
  CASE WHEN d.n_shingles > 0
       THEN CAST(COALESCE(h.n_overlap, 0) AS DOUBLE) / d.n_shingles
       ELSE 0.0 END AS overlap_ratio,
  (CASE WHEN d.n_shingles > 0
        THEN CAST(COALESCE(h.n_overlap, 0) AS DOUBLE) / d.n_shingles
        ELSE 0.0 END) >= {DECON_TAU} AS is_contaminated
FROM eval_docs d LEFT JOIN hits h ON d.doc_id = h.doc_id
ORDER BY d.doc_id
"""


def train_contamination_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REVERSE decontamination direction: for every TRAIN document,
    how many of its distinct word n-grams appear anywhere in the eval
    (validation/test) splits, with the any-hit contamination flag — the
    pass that decides which training documents to DROP so the model
    never sees eval content (decontamination_report answers the audit
    question 'is eval clean of train'; this answers the actionable one
    'which train docs must go').

    Scale shape: at 100 TB the train side is the corpus and the eval
    side is a fixed benchmark set (MBs of n-grams), so the distinct
    eval-shingle set carries the broadcast hint and the corpus-sized
    exploded train frame streams through a broadcast hash join — the
    same runtime-filter discipline as the SRP verification joins. One
    hash aggregation per side; nothing quadratic."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        split_label(split_bucket(F.col("doc_id"))).alias("split"),
        "text",
    )
    hits = train_eval_hits_from(docs)
    ratio = F.col("n_eval_hits") / F.col("n_shingles")
    return (
        hits.select(
            "doc_id",
            "n_shingles",
            "n_eval_hits",
            F.when(F.col("n_shingles") > 0, F.coalesce(ratio, F.lit(0.0)))
            .otherwise(F.lit(0.0))
            .alias("hit_ratio"),
            (F.col("n_eval_hits") > 0).alias("is_contaminated"),
        )
        .orderBy("doc_id")
    )


def train_eval_hits_from(docs: DataFrame) -> DataFrame:
    """Frame-level core of the contamination scan: ``docs`` is
    (doc_id, split, text); returns one row per TRAIN document with
    (doc_id, n_shingles, n_eval_hits), ``n_eval_hits`` coalesced to 0.
    The eval side is every row with ``split != 'train'``. Shared by
    :func:`train_contamination_scan` (raw corpus) and
    ``cli/run_corpus.py`` (which applies it to the post-filter corpus —
    the documents that actually ship to training)."""
    from ..operators.substrate import scoped_materialized

    toked = docs.select(
        "doc_id", "split", tokens(F.col("text")).alias("tok")
    )
    # scoped (eager localCheckpoint, GC-reclaimed — no per-call cache
    # leak): ``docs`` is caller-supplied, so there is no stable
    # (session, corpus) key to register a shared substrate under
    shingled = scoped_materialized(
        toked.select(
            "doc_id", "split", shingles("tok", DECON_NGRAM).alias("sh")
        )
    )
    eval_sh = (
        shingled.filter(F.col("split") != "train")
        .select(F.explode("sh").alias("s"))
        .distinct()
    )
    train_docs = shingled.filter(F.col("split") == "train").select(
        "doc_id", F.size("sh").cast("long").alias("n_shingles"), "sh"
    )
    hits = (
        train_docs.select("doc_id", F.explode("sh").alias("s"))
        .join(F.broadcast(eval_sh), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_eval_hits"))
    )
    return train_docs.drop("sh").join(hits, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce("n_eval_hits", F.lit(0)).cast("long").alias("n_eval_hits"),
    )


TRAIN_CONTAMINATION_SQL = f"""
WITH labeled AS (
  SELECT doc_id,
    {_split_label_sql(_split_bucket_sql("doc_id"))} AS split,
    {tokens_sql()} AS tok
  FROM documents
), shingled AS (
  SELECT doc_id, split, {shingles_sql("tok", DECON_NGRAM)} AS sh FROM labeled
), eval_sh AS (
  SELECT DISTINCT s
  FROM (SELECT unnest(sh) AS s FROM shingled WHERE split != 'train')
), train_docs AS (
  SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_shingles, sh
  FROM shingled WHERE split = 'train'
), hits AS (
  SELECT t.doc_id, COUNT(*) AS n_eval_hits
  FROM (SELECT doc_id, unnest(sh) AS s FROM train_docs) t
  JOIN eval_sh e ON t.s = e.s
  GROUP BY t.doc_id
)
SELECT d.doc_id, d.n_shingles,
  CAST(COALESCE(h.n_eval_hits, 0) AS BIGINT) AS n_eval_hits,
  CASE WHEN d.n_shingles > 0
       THEN CAST(COALESCE(h.n_eval_hits, 0) AS DOUBLE) / d.n_shingles
       ELSE 0.0 END AS hit_ratio,
  COALESCE(h.n_eval_hits, 0) > 0 AS is_contaminated
FROM train_docs d LEFT JOIN hits h ON d.doc_id = h.doc_id
ORDER BY d.doc_id
"""


# --- deterministic corpus shuffle (training order) ---------------------------

_SHUFFLE_SALT = "epoch0"


def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudorandom training order: every document gets a
    shuffle key (salted md5) and its global 1-based rank in key order —
    the order a training run would read the corpus in. Changing the salt
    re-shuffles (one salt per epoch); the assignment is stable under any
    partitioning, unlike ``orderBy(rand(seed))``, which is not
    reproducible across cluster layouts.

    The rank comes from operators/ranking.py's range-repartition machinery
    — no single-task global sort at any corpus size."""
    from ..operators.ranking import RANK_COL, with_global_rank

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.concat(F.lit(_SHUFFLE_SALT), F.col("doc_id").cast("string"))).alias(
            "shuffle_key"
        ),
    )
    ranked = with_global_rank(docs, ["shuffle_key", "doc_id"])
    return ranked.select(
        "doc_id", "shuffle_key", F.col(RANK_COL).alias("shuffle_rank")
    ).orderBy("shuffle_rank")


CORPUS_SHUFFLE_SQL = f"""
SELECT doc_id, shuffle_key,
  ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) AS shuffle_rank
FROM (
  SELECT doc_id, md5('{_SHUFFLE_SALT}' || CAST(doc_id AS VARCHAR)) AS shuffle_key
  FROM documents
)
ORDER BY shuffle_rank
"""


# --- token-budget subcorpus draw --------------------------------------------

SAMPLE_TOKEN_BUDGET = 10_000


def token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Draw a deterministic subcorpus of ~SAMPLE_TOKEN_BUDGET tokens:
    walk the corpus in the salted-shuffle order (corpus_shuffle) and keep
    every document whose exclusive token prefix sum is still under the
    budget — i.e. "the first N tokens' worth of the shuffled corpus".
    The last kept document may straddle the budget (document-granular
    draw; the loader truncates), mirroring sequence_packing's convention.

    This is how a pinned-size training subcorpus ("a 10B-token slice")
    is drawn reproducibly at 100 TB: no count(), no limit(), no driver
    round-trip — membership is a pure function of (shuffle_key,
    prefix_sum), both partitioning-independent. The prefix sum runs on
    the range-repartition machinery (operators/ranking.py), so there is
    no single-task window at any corpus size."""
    from ..operators.ranking import PREFIX_COL, with_global_prefix_sum

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(
            F.concat(F.lit(_SHUFFLE_SALT), F.col("doc_id").cast("string"))
        ).alias("shuffle_key"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    pref = with_global_prefix_sum(docs, ["shuffle_key", "doc_id"], "n_tokens")
    return (
        pref.filter(F.col(PREFIX_COL) < SAMPLE_TOKEN_BUDGET)
        .select(
            "doc_id",
            "shuffle_key",
            "n_tokens",
            F.col(PREFIX_COL).alias("tokens_before"),
        )
        .orderBy("doc_id")
    )


TOKEN_BUDGET_SAMPLE_SQL = f"""
WITH t AS (
  SELECT doc_id,
    md5('{_SHUFFLE_SALT}' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
    CAST(len({tokens_sql()}) AS BIGINT) AS n_tokens
  FROM documents
),
p AS (
  SELECT doc_id, shuffle_key, n_tokens,
    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY shuffle_key, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS tokens_before
  FROM t
)
SELECT doc_id, shuffle_key, n_tokens, tokens_before
FROM p WHERE tokens_before < {SAMPLE_TOKEN_BUDGET}
ORDER BY doc_id
"""


# --- curriculum ordering -----------------------------------------------------

# quality_score cutoffs (easy -> hard phases); scores come from
# text_analysis.text_stats' composite heuristic
CURRICULUM_CUTOFFS = [90.0, 70.0, 50.0]


def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum training order: documents bucketed into quality phases
    (highest-quality first), deterministically shuffled WITHIN each
    phase by a salted hash, and assigned a global 1-based training
    position. The composition a curriculum-learning data loader
    consumes directly.

    Scale shape: the total order (phase, shuffle_key, doc_id) goes
    through the scalable exact ranker (range repartition + local
    row_number + broadcast prefix offsets, operators/ranking.py) — NO
    single-partition global window; the DuckDB oracle uses the plain
    ROW_NUMBER form over the same total order."""
    from ..operators.ranking import RANK_COL, TOTAL_COL, with_global_rank
    from .text_analysis import text_stats

    stats = text_stats(spark, sf_dir).select("doc_id", "quality_score")
    phase = F.lit(len(CURRICULUM_CUTOFFS))
    for i, cut in reversed(list(enumerate(CURRICULUM_CUTOFFS))):
        phase = F.when(F.col("quality_score") >= cut, F.lit(i)).otherwise(phase)
    keyed = stats.select(
        "doc_id",
        phase.cast("int").alias("phase"),
        F.md5(F.concat(F.lit("curr:"), F.col("doc_id").cast("string"))).alias(
            "shuffle_key"
        ),
    )
    ranked = with_global_rank(keyed, ["phase", "shuffle_key", "doc_id"])
    return (
        ranked.select(
            "doc_id",
            "phase",
            "shuffle_key",
            F.col(RANK_COL).alias("position"),
        )
        .orderBy("position")
    )


def _curriculum_phase_sql() -> str:
    arms = " ".join(
        f"WHEN quality_score >= {cut} THEN {i}"
        for i, cut in enumerate(CURRICULUM_CUTOFFS)
    )
    return f"CASE {arms} ELSE {len(CURRICULUM_CUTOFFS)} END"


def _curriculum_sql() -> str:
    from .text_analysis import TEXT_STATS_SQL

    return f"""
WITH stats AS ({TEXT_STATS_SQL}),
keyed AS (
  SELECT doc_id,
    CAST({_curriculum_phase_sql()} AS INT) AS phase,
    md5('curr:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
  FROM stats
)
SELECT doc_id, phase, shuffle_key,
  CAST(ROW_NUMBER() OVER (ORDER BY phase, shuffle_key, doc_id) AS BIGINT)
    AS position
FROM keyed
ORDER BY position
"""


CURRICULUM_ORDER_SQL = _curriculum_sql()
