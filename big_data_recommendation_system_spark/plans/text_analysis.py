"""Text-analysis plans over the ``documents`` table — the per-document
stages of a large-scale training-data pipeline: token statistics, quality
scoring, heuristic language ID, content fingerprinting.

All pure Column expressions (whole-stage codegen, no shuffle — these are
embarrassingly parallel map stages that scale linearly with executors).
Oracle SQL is generated from the same stopword/weight tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    LANG_STOPWORDS,
    ngrams,
    ngrams_sql,
    punct_ratio,
    punct_ratio_sql,
    shingles,
    shingles_sql,
    stopword_hits,
    stopword_hits_sql,
    tokens,
    tokens_sql,
)
from ..sources.tables import load_table

_DOCS_TOK_CTE = f"WITH t AS (SELECT doc_id, text, lang, source, n_chars, {tokens_sql()} AS tok FROM documents)"


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality scoring (length/punct/stopword ratios)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.withColumn("tok", tokens(F.col("text")))
    n_tokens = F.size("tok")
    sw = stopword_hits(F.col("tok"), LANG_STOPWORDS["en"])
    token_chars = F.aggregate(
        F.transform(F.col("tok"), F.length), F.lit(0), lambda a, x: a + x
    )
    out = t.select(
        "doc_id",
        "source",
        F.length("text").cast("long").alias("n_chars_measured"),
        n_tokens.cast("long").alias("n_tokens"),
        (token_chars.cast("double") / n_tokens).alias("avg_token_len"),
        punct_ratio(F.col("text")).alias("punct_ratio"),
        (sw.cast("double") / n_tokens).alias("stopword_ratio"),
    )
    # composite quality score: favor mid-length docs with low punctuation —
    # an engine-defined heuristic, mirrored exactly in SQL
    quality = (
        F.lit(100.0) * F.least(F.col("n_tokens").cast("double") / 50.0, F.lit(1.0))
        - F.lit(50.0) * F.col("punct_ratio")
        + F.lit(10.0) * F.col("stopword_ratio")
    )
    return out.withColumn("quality_score", quality)


TEXT_STATS_SQL = f"""{_DOCS_TOK_CTE}
SELECT
  doc_id,
  source,
  n_chars_measured,
  n_tokens,
  avg_token_len,
  punct_ratio,
  stopword_ratio,
  100.0 * LEAST(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
    - 50.0 * punct_ratio + 10.0 * stopword_ratio AS quality_score
FROM (
  SELECT doc_id, source,
    length(text) AS n_chars_measured,
    len(tok) AS n_tokens,
    CAST(list_sum(list_transform(tok, x -> length(x))) AS DOUBLE) / len(tok) AS avg_token_len,
    {punct_ratio_sql()} AS punct_ratio,
    CAST({stopword_hits_sql("tok", LANG_STOPWORDS["en"])} AS DOUBLE) / len(tok) AS stopword_ratio
  FROM t
)
"""


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic stopword-table language classifier; deterministic
    tie-break = alphabetically-first language, zero hits = 'unknown'."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.withColumn("tok", tokens(F.col("text")))
    hit_cols = {
        lang: stopword_hits(F.col("tok"), words).alias(f"hits_{lang}")
        for lang, words in sorted(LANG_STOPWORDS.items())
    }
    t = t.select("doc_id", F.col("lang").alias("labeled_lang"), *hit_cols.values())
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in sorted(LANG_STOPWORDS)])
    pred = F.lit("unknown")
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        pred = F.when(
            (best > 0) & (F.col(f"hits_{lang}") == best), F.lit(lang)
        ).otherwise(pred)
    return t.select(
        "doc_id",
        "labeled_lang",
        pred.alias("predicted_lang"),
        (pred == F.col("labeled_lang")).alias("is_correct"),
    )


def _lang_id_sql() -> str:
    langs = sorted(LANG_STOPWORDS)
    hits = ",\n    ".join(
        f"{stopword_hits_sql('tok', LANG_STOPWORDS[lang])} AS hits_{lang}"
        for lang in langs
    )
    best = f"GREATEST({', '.join('hits_' + lang for lang in langs)})"
    case = " ".join(
        f"WHEN hits_{lang} = best THEN '{lang}'" for lang in langs
    )
    return f"""{_DOCS_TOK_CTE}
, h AS (SELECT doc_id, lang AS labeled_lang, {hits} FROM t)
, p AS (
  SELECT doc_id, labeled_lang,
    CASE WHEN best = 0 THEN 'unknown' {case} ELSE 'unknown' END AS predicted_lang
  FROM (SELECT *, {best} AS best FROM h)
)
SELECT doc_id, labeled_lang, predicted_lang,
       predicted_lang = labeled_lang AS is_correct
FROM p
"""


LANG_ID_SQL = _lang_id_sql()


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting: md5 of the normalized token stream plus a
    min-hash-of-shingles rolling fingerprint (bottom-1 sketch)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.withColumn("tok", tokens(F.col("text"))).withColumn(
        "sh3", shingles("tok", 3)
    )
    return t.select(
        "doc_id",
        F.md5(F.array_join("tok", " ")).alias("content_hash"),
        F.array_min(F.transform(F.col("sh3"), lambda s: F.md5(s))).alias(
            "min_shingle_hash"
        ),
        F.size("sh3").cast("long").alias("n_shingles"),
    )


DOC_FINGERPRINTS_SQL = f"""{_DOCS_TOK_CTE}
SELECT doc_id,
  md5(array_to_string(tok, ' ')) AS content_hash,
  list_min(list_transform({shingles_sql("tok", 3)}, s -> md5(s))) AS min_shingle_hash,
  len({shingles_sql("tok", 3)}) AS n_shingles
FROM t
"""


# --- BPE-ish regex tokenization --------------------------------------------

# GPT-2-style pre-tokenizer pattern restricted to the Java-regex ∩ RE2
# common subset (no lookahead — the original's trailing-space lookahead
# is dropped; both engines run leftmost-FIRST alternation, so segment
# boundaries agree token-for-token): contraction suffixes, then
# optionally-space-prefixed letter runs, digit runs, punctuation runs,
# then residual whitespace.
BPE_SPLIT_PATTERN = (
    r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token counts under the BPE-ish pre-tokenizer vs the plain
    whitespace split — the fertility-style ratio training pipelines use
    for sizing and mixture decisions. Pure map stage, one regex pass,
    whole-stage codegen; no shuffle but the output orderBy."""
    docs = load_table(spark, sf_dir, "documents")
    pieces = F.regexp_extract_all("text", F.lit(BPE_SPLIT_PATTERN), F.lit(0))
    # whitespace tokens: split on runs of whitespace, drop empties
    ws = F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != "")
    n_bpe = F.size(
        F.filter(pieces, lambda p: F.trim(p) != "")
    )  # whitespace runs segment but are not tokens
    return docs.select(
        "doc_id",
        n_bpe.cast("long").alias("n_bpe_tokens"),
        F.size(ws).cast("long").alias("n_ws_tokens"),
        (
            n_bpe.cast("double") / F.greatest(F.size(ws), F.lit(1))
        ).alias("fertility"),
        (F.length("text").cast("double") / F.greatest(n_bpe, F.lit(1))).alias(
            "chars_per_token"
        ),
    ).orderBy("doc_id")


_BPE_SQL_PAT = BPE_SPLIT_PATTERN.replace("'", "''")

BPE_TOKEN_STATS_SQL = f"""
SELECT doc_id, n_bpe_tokens, n_ws_tokens,
  CAST(n_bpe_tokens AS DOUBLE) / GREATEST(n_ws_tokens, 1) AS fertility,
  CAST(length(text) AS DOUBLE) / GREATEST(n_bpe_tokens, 1) AS chars_per_token
FROM (
  SELECT doc_id, text,
    CAST(len(list_filter(regexp_extract_all(text, '{_BPE_SQL_PAT}'),
                         p -> trim(p) != '')) AS BIGINT) AS n_bpe_tokens,
    CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         t -> t != '')) AS BIGINT) AS n_ws_tokens
  FROM documents
)
ORDER BY doc_id
"""


# --- vocabulary / document-frequency stats ----------------------------------

VOCAB_TOP_K = 100


def vocab_df_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: the VOCAB_TOP_K most document-frequent
    tokens with collection frequency, document frequency and the exact
    smoothed inverse-df ratio (N+1)/(df+1) — downstream idf is
    ln(ratio)+1, kept OUT of the compared output because ln() is not
    bit-identical across math libraries (division is IEEE-exact).

    Shape: explode → (token) agg with map-side combine (array_distinct
    per doc first, so df counts each doc once); N rides the plan as a
    broadcast scalar agg — no driver-side count mid-plan; the top-k cut
    is a tiny sort over |vocab| rows, not a data-sized window. Ties
    broken by token text for determinism."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens(F.col("text")).alias("tok"))
    n = t.agg(F.count(F.lit(1)).alias("n_docs"))
    cf = (
        t.select(F.explode("tok").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("collection_freq"))
    )
    df_ = (
        t.select("doc_id", F.explode(F.array_distinct("tok")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    out = cf.join(df_, "token").crossJoin(F.broadcast(n))
    return (
        out.select(
            "token",
            "collection_freq",
            "doc_freq",
            (
                (F.col("n_docs").cast("double") + 1.0)
                / (F.col("doc_freq") + 1.0)
            ).alias("inv_doc_freq"),
        )
        .orderBy(F.col("doc_freq").desc(), F.col("token").asc())
        .limit(VOCAB_TOP_K)
    )


VOCAB_DF_STATS_SQL = f"""{_DOCS_TOK_CTE}
, cfa AS (
  SELECT token, COUNT(*) AS collection_freq
  FROM (SELECT unnest(tok) AS token FROM t) GROUP BY token
),
dfa AS (
  SELECT token, COUNT(*) AS doc_freq FROM (
    SELECT doc_id, unnest(list_distinct(tok)) AS token FROM t
  ) GROUP BY token
),
n AS (SELECT COUNT(*) AS n_docs FROM t)
SELECT cfa.token, collection_freq, doc_freq,
  (CAST(n_docs AS DOUBLE) + 1.0) / (doc_freq + 1.0) AS inv_doc_freq
FROM cfa JOIN dfa ON cfa.token = dfa.token CROSS JOIN n
ORDER BY doc_freq DESC, cfa.token ASC
LIMIT {VOCAB_TOP_K}
"""


# --- corpus-frequency quality score ------------------------------------------

# Corpus frequency at or below this marks a token "rare" — the
# rare-token-ratio gate a CCNet-style quality pass applies in place of a
# full LM perplexity score (the LM itself needs external model weights;
# the corpus's own unigram statistics are the model here).
RARE_CF_MAX = 2


def rare_token_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram-statistics quality score: join every token to
    its corpus collection frequency and report token count, rare-token
    count/ratio and mean token frequency. Low mean frequency or a high
    rare ratio flags gibberish / OCR noise / wrong-tokenization docs —
    the corpus-side stand-in for the CCNet perplexity gate (reference has
    no text pipeline; this extends the engine's quality family).

    Scale shape: one explode, one token-keyed count (map-side combined),
    one hash join back on token, one doc-keyed rollup. All compared
    ratios are single divisions of exact BIGINT aggregates, so the result
    hash-matches the oracle at any partitioning (no float-sum ordering
    anywhere)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    )
    cf = words.groupBy("token").agg(F.count(F.lit(1)).alias("cf"))
    return (
        words.join(cf, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum((F.col("cf") <= RARE_CF_MAX).cast("long")).alias(
                "n_rare_tokens"
            ),
            F.sum("cf").alias("cf_sum"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_rare_tokens",
            (F.col("n_rare_tokens") / F.col("n_tokens")).alias("rare_ratio"),
            (F.col("cf_sum") / F.col("n_tokens")).alias("avg_token_cf"),
        )
        .orderBy("doc_id")
    )


RARE_TOKEN_QUALITY_SQL = f"""{_DOCS_TOK_CTE}
, w AS (SELECT doc_id, unnest(tok) AS token FROM t),
cf AS (SELECT token, COUNT(*) AS cf FROM w GROUP BY token)
SELECT w.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(CASE WHEN cf.cf <= {RARE_CF_MAX} THEN 1 ELSE 0 END) AS BIGINT)
    AS n_rare_tokens,
  CAST(SUM(CASE WHEN cf.cf <= {RARE_CF_MAX} THEN 1 ELSE 0 END) AS DOUBLE)
    / COUNT(*) AS rare_ratio,
  CAST(SUM(cf.cf) AS DOUBLE) / COUNT(*) AS avg_token_cf
FROM w JOIN cf ON w.token = cf.token
GROUP BY w.doc_id
ORDER BY w.doc_id
"""


# --- language-ID confusion matrix --------------------------------------------


def lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the heuristic language classifier against the
    declared ``lang`` column: per (labeled, predicted) pair, document
    count and share within the labeled language — the calibration
    artifact a pipeline publishes before trusting lang-ID routing.

    The window runs over the already-aggregated matrix (at most
    |langs|+1 squared rows), so the share computation is driver-trivial
    at any corpus size; counts are exact longs, the share a single
    division."""
    from pyspark.sql import Window

    li = lang_id(spark, sf_dir)
    counts = li.groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy("labeled_lang")
    return (
        counts.withColumn("labeled_total", F.sum("n_docs").over(w))
        .select(
            "labeled_lang",
            "predicted_lang",
            "n_docs",
            (F.col("n_docs") / F.col("labeled_total")).alias("share_of_labeled"),
        )
        .orderBy("labeled_lang", "predicted_lang")
    )


LANG_CONFUSION_SQL = f"""
SELECT labeled_lang, predicted_lang,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(*) AS DOUBLE)
    / SUM(COUNT(*)) OVER (PARTITION BY labeled_lang) AS share_of_labeled
FROM ({LANG_ID_SQL}) li
GROUP BY labeled_lang, predicted_lang
ORDER BY labeled_lang, predicted_lang
"""


# --- per-document TF-IDF keywords --------------------------------------------

TFIDF_TOP_K = 5


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: the TFIDF_TOP_K terms with the
    highest tf * (N+1)/(df+1) score — the smoothed-idf variant whose
    ratio form is IEEE-exact (same reasoning as vocab_df_stats: ln() is
    not bit-stable across math libraries, the rational score is; the
    ranking is identical either way since ln is monotone).

    Scale shape: one explode -> (doc, token) counts (map-side combined),
    a distinct-doc df rollup on the token key, a token-keyed hash join,
    and a per-doc top-k window over |doc's distinct tokens| rows — never
    over the corpus. Ties break score desc, then token asc, so the
    output is deterministic and the window rank is hash-stable."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", tokens(F.col("text")).alias("tok"))
    tf = (
        t.select("doc_id", F.explode("tok").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    n = t.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.col("tf")
            * ((F.col("n_docs") + F.lit(1)).cast("double") / (F.col("doc_freq") + 1)),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("token")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("term_rank") <= TFIDF_TOP_K)
        .select("doc_id", "term_rank", "token", "tf", "doc_freq", "score")
        .orderBy("doc_id", "term_rank")
    )


TFIDF_TOP_TERMS_SQL = f"""{_DOCS_TOK_CTE}
, tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(tok) AS token FROM t)
  GROUP BY doc_id, token
),
dfr AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS doc_freq FROM tf GROUP BY token),
n AS (SELECT COUNT(*) AS n_docs FROM t),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfr.doc_freq,
    tf.tf * (CAST(n_docs + 1 AS DOUBLE) / (dfr.doc_freq + 1)) AS score
  FROM tf JOIN dfr ON tf.token = dfr.token CROSS JOIN n
)
SELECT doc_id, term_rank, token, tf, doc_freq, score
FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY score DESC, token ASC
  ) AS BIGINT) AS term_rank
  FROM scored
)
WHERE term_rank <= {TFIDF_TOP_K}
ORDER BY doc_id, term_rank
"""


# --- corpus-wide frequent n-gram mining -------------------------------------

FREQ_NGRAM_N = 3
FREQ_NGRAM_TOP_K = 100
FREQ_NGRAM_MIN_OCC = 2


def frequent_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide repeated-phrase mining: total occurrences (within-doc
    repeats included — the signal `doc_repetition_stats` deliberately
    collapses) and document frequency for every word 3-gram, top 100 by
    occurrence count. The boilerplate/template detector of a
    training-data pipeline (memorization-risk phrases, licence headers,
    navigation chrome).

    Scale shape: one explode linear in corpus tokens, a hash groupBy on
    the gram (count is map-side combined; the distinct-doc count is
    Spark's standard two-phase partial distinct), then TakeOrdered for
    the global top-k — no full sort, no quadratic stage. A hot gram
    skews its reduce key only after massive map-side collapse."""
    docs = load_table(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    g = (
        docs.withColumn("tok", tokens(F.col("text")))
        .select("doc_id", F.explode(ngrams("tok", FREQ_NGRAM_N)).alias("gram"))
    )
    return (
        g.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_occ") >= FREQ_NGRAM_MIN_OCC)
        .orderBy(F.desc("n_occ"), F.desc("n_docs"), F.asc("gram"))
        .limit(FREQ_NGRAM_TOP_K)
    )


FREQUENT_NGRAMS_SQL = f"""{_DOCS_TOK_CTE}
, g AS (
  SELECT doc_id, unnest({ngrams_sql("tok", FREQ_NGRAM_N)}) AS gram FROM t
)
SELECT gram, CAST(COUNT(*) AS BIGINT) AS n_occ,
  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM g
GROUP BY gram
HAVING COUNT(*) >= {FREQ_NGRAM_MIN_OCC}
ORDER BY n_occ DESC, n_docs DESC, gram ASC
LIMIT {FREQ_NGRAM_TOP_K}
"""


# --- filter-calibration threshold sweep -------------------------------------

QUALITY_SWEEP_THRESHOLDS = [0.0, 10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0, 90.0]


def quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-calibration curve: for each candidate quality-score
    threshold, how many documents and tokens survive. This is the sweep
    a pipeline runs BEFORE committing to a cutoff — picking a threshold
    from one aggregate run instead of re-scanning the corpus per guess.

    Scale shape: the per-doc stats pass runs once; the tiny threshold
    grid cross-joins against the aggregated doc frame (N×10 rows,
    map-side combined down to 10). Nothing rescans the corpus."""
    stats = text_stats(spark, sf_dir).select("n_tokens", "quality_score")
    grid = spark.createDataFrame(
        [(t,) for t in QUALITY_SWEEP_THRESHOLDS], "threshold double"
    )
    survives = F.col("quality_score") >= F.col("threshold")
    return (
        stats.crossJoin(F.broadcast(grid))
        .groupBy("threshold")
        .agg(
            F.sum(survives.cast("long")).alias("n_docs_surviving"),
            F.sum(F.when(survives, F.col("n_tokens")).otherwise(F.lit(0))).alias(
                "n_tokens_surviving"
            ),
            (F.sum(survives.cast("long")).cast("double") / F.count(F.lit(1))).alias(
                "doc_share"
            ),
        )
        .orderBy("threshold")
    )


_SWEEP_GRID_SQL = ", ".join(repr(t) for t in QUALITY_SWEEP_THRESHOLDS)

QUALITY_THRESHOLD_SWEEP_SQL = f"""
WITH stats AS ({TEXT_STATS_SQL}),
grid AS (SELECT unnest([{_SWEEP_GRID_SQL}]) AS threshold)
SELECT threshold,
  CAST(SUM(CASE WHEN quality_score >= threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_surviving,
  CAST(SUM(CASE WHEN quality_score >= threshold THEN n_tokens ELSE 0 END) AS BIGINT) AS n_tokens_surviving,
  CAST(SUM(CASE WHEN quality_score >= threshold THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS doc_share
FROM stats CROSS JOIN grid
GROUP BY threshold
ORDER BY threshold
"""


# --- BPE merge-step pair counting -------------------------------------------

BPE_PAIR_TOP_K = 50


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The counting phase of one BPE tokenizer-training step: corpus
    word frequencies, words split to character symbols, adjacent-pair
    counts weighted by word frequency, top 50 merge candidates. The
    full training loop repeats this after each merge; the per-step
    map-reduce here (explode → groupBy word → explode pairs → groupBy
    pair) is the distributed form that scales to corpus size.

    Scale shape: word-frequency rollup first (the corpus collapses to
    its vocabulary — orders of magnitude smaller), pair explode runs
    over the VOCAB weighted by freq, not over raw tokens."""
    docs = load_table(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    words = (
        docs.withColumn("tok", tokens(F.col("text")))
        .select(F.explode("tok").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # Single-char words contribute no pairs. The guard is load-bearing on
    # the Spark side: sequence(1, 0) DESCENDS to [1, 0] (unlike DuckDB's
    # empty range(1, 1)) and substring(word, 0, 1) silently reads index 1,
    # which would emit phantom 'x x' / 'x ' pairs weighted by freq('x').
    pairs = words.select(
        "freq",
        F.explode(
            F.expr(
                "CASE WHEN length(word) >= 2 THEN "
                "transform(sequence(1, length(word) - 1), "
                "i -> concat(substring(word, i, 1), ' ', substring(word, i + 1, 1))) "
                "ELSE CAST(array() AS array<string>) END"
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("freq").alias("n_weighted"),
            F.count(F.lit(1)).alias("n_vocab_positions"),
        )
        .orderBy(F.desc("n_weighted"), F.asc("pair"))
        .limit(BPE_PAIR_TOP_K)
    )


BPE_PAIR_COUNTS_SQL = f"""{_DOCS_TOK_CTE}
, words AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(tok) AS word FROM t)
  GROUP BY word
),
pairs AS (
  SELECT freq,
    unnest(list_transform(range(1, greatest(length(word) - 1, 0) + 1),
      i -> word[i] || ' ' || word[i + 1])) AS pair
  FROM words
)
SELECT pair, CAST(SUM(freq) AS BIGINT) AS n_weighted,
  CAST(COUNT(*) AS BIGINT) AS n_vocab_positions
FROM pairs
GROUP BY pair
ORDER BY n_weighted DESC, pair ASC
LIMIT {BPE_PAIR_TOP_K}
"""


# --- per-source vocabulary drift --------------------------------------------

VOCAB_DRIFT_TOP_K = 50


def source_vocab_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary drift: chi-square statistic of each source's
    token distribution against the corpus distribution over the corpus's
    top-50 tokens — the monitoring view that flags a feed whose content
    shifted (new boilerplate, language drift, template change) before it
    poisons a training mix.

    chi2_s = Σ_t (o_st − n_s·p_t)² / (n_s·p_t), with p_t the corpus
    share of token t and n_s the source's top-K token total. Counts are
    exact BIGINTs; each term is one deterministic IEEE expression from
    those ints; the 50-term sum runs through DECIMAL(38,12) so it is
    order-independent and hash-stable cross-engine.

    Scale shape: one (token) hash agg for the corpus top-K (map-side
    combined), broadcast of the 50-row top-K table, one (source, token)
    hash agg, one per-source rollup. Linear; nothing wide."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("token")
    )
    corpus = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c_tok"))
    topk = (
        corpus.orderBy(F.desc("c_tok"), F.asc("token"))
        .limit(VOCAB_DRIFT_TOP_K)
    )
    c_tot = topk.agg(F.sum("c_tok").alias("c_tot"))
    st = (
        toks.join(F.broadcast(topk.select("token")), "token")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    n_s = st.groupBy("source").agg(F.sum("o").alias("n_s"))
    full = (
        st.join(F.broadcast(topk), "token")
        .join(F.broadcast(n_s), "source")
        .crossJoin(F.broadcast(c_tot))
    )
    expected = F.col("n_s") * F.col("c_tok") / F.col("c_tot")
    term = (F.col("o") - expected) * (F.col("o") - expected) / expected
    return (
        full.groupBy("source")
        .agg(
            F.max("n_s").alias("n_topk_tokens"),
            F.sum(term.cast("decimal(38,12)")).cast("double").alias("chi2"),
        )
        .orderBy("source")
    )


SOURCE_VOCAB_DIVERGENCE_SQL = f"""{_DOCS_TOK_CTE}
, toks AS (
  SELECT source, unnest(tok) AS token FROM t
), corpus AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS c_tok
  FROM toks GROUP BY token
), topk AS (
  SELECT token, c_tok FROM corpus
  ORDER BY c_tok DESC, token ASC LIMIT {VOCAB_DRIFT_TOP_K}
), ctot AS (
  SELECT CAST(SUM(c_tok) AS BIGINT) AS c_tot FROM topk
), st AS (
  SELECT source, tk.token, CAST(COUNT(*) AS BIGINT) AS o
  FROM toks JOIN topk tk ON tk.token = toks.token
  GROUP BY source, tk.token
), ns AS (
  SELECT source, CAST(SUM(o) AS BIGINT) AS n_s FROM st GROUP BY source
)
SELECT st.source,
  CAST(MAX(ns.n_s) AS BIGINT) AS n_topk_tokens,
  CAST(SUM(CAST(
    (st.o - ns.n_s * topk.c_tok / ctot.c_tot)
    * (st.o - ns.n_s * topk.c_tok / ctot.c_tot)
    / (ns.n_s * topk.c_tok / ctot.c_tot) AS DECIMAL(38,12))) AS DOUBLE) AS chi2
FROM st
JOIN topk ON topk.token = st.token
JOIN ns ON ns.source = st.source
CROSS JOIN ctot
GROUP BY st.source
ORDER BY st.source
"""


def _round4(col):
    """Engine-neutral 4-decimal round-half-up (same IEEE-only construction
    as functions.pandas_parity.round2_neutral, one more digit — these are
    small fractions where 2 decimals would collapse the signal)."""
    return F.floor(col * 10000 + F.lit(0.5)) / 10000


_ROUND4_SQL = "floor(({x}) * 10000 + 0.5) / 10000"


# --- BPE merge learning (tokenizer training loop) ---------------------------

BPE_MERGE_STEPS = 3
# The trainer's alphabet: restricting the vocabulary to [a-z0-9] words keeps
# every symbol-string comparison and the deterministic (count DESC, pair ASC)
# tie-break in plain ASCII, where Spark's UTF-16 and DuckDB's UTF-8 collation
# agree byte-for-byte. Real byte-level BPE trainers impose the same kind of
# closed alphabet; non-alphabet words simply don't vote on merges.
_BPE_WORD_RE = "^[a-z0-9]+$"


def _bpe_merge_step(vocab: DataFrame, step: int) -> tuple[DataFrame, DataFrame]:
    """One BPE training iteration over the (word, freq, syms) vocabulary:
    count adjacent symbol pairs weighted by word frequency, pick THE top
    merge (count DESC, pair ASC), apply it with canonical greedy
    left-to-right non-overlapping semantics, and emit a one-row report.

    TOTAL: when the vocabulary has no adjacent symbol pair left (every
    word fully merged), ``top1`` is empty and the LEFT join below passes
    every symbol through unchanged — the step returns the vocabulary
    as-is plus a report row with NULL pair and zero merges, so callers
    may raise ``BPE_MERGE_STEPS`` past the pair supply without the
    vocabulary emptying (the r7 crossJoin precondition is gone).

    The greedy overlap rule (``aaaa`` + merge ``a a`` -> ``aa aa``, never
    ``a aa a``) is expressed declaratively as a per-word array fold
    (aggregate() higher-order function): scan symbols left to right,
    merge when the accumulator's last element is ``pa`` and the incoming
    symbol is ``pb`` — leftmost-non-overlapping by construction, no
    per-row Python. (A merged token can never re-match ``pa`` in the
    same pass: concat(pa, pb) = pa would require an empty pb.)

    Scale shape: everything runs over the VOCABULARY (corpus collapsed to
    distinct words), not raw tokens; the chosen merge is a one-row frame
    broadcast back, so each step is ONE small shuffle (the map-side-
    combined pair count) — the merge application itself is a narrow
    per-row map, no window, no regroup. A production trainer would
    materialize the vocab between steps exactly like the dedup substrate;
    here the 3-step chain stays lazy so the oracle sees one plan.
    """
    # r12 OPTIMIZATION (guide §1.2 step 1 + §2.4): the step previously
    # posexploded the vocabulary to one row per symbol and ran THREE
    # word-partitioned sort windows (lead, run-grouping row_numbers, lag)
    # plus a collect_list regroup shuffle to apply the merge. Both halves
    # are expressible without any window or regroup:
    #   - pair counting explodes adjacent (sym, nxt) structs straight
    #     from each word's array (one hash-agg shuffle, map-side
    #     combined);
    #   - the greedy left-to-right non-overlapping merge is a per-row
    #     array fold (aggregate() higher-order function) — leftmost
    #     match wins, a merged token never re-matches pa in the same
    #     pass (concat(pa, pb) = pa would need pb = ''), which is
    #     exactly the consecutive-run every-other-start rule the window
    #     version encoded (overlap is only possible between CONSECUTIVE
    #     start positions, i.e. pa = pb runs).
    # Per step this removes 3 sort windows + 1 regroup shuffle + the
    # posexplode; values are bit-identical (strict sweep + oracle gate).
    pc = vocab.select(
        "freq",
        F.explode(
            F.expr(
                "CASE WHEN size(syms) >= 2 THEN "
                "transform(slice(syms, 1, size(syms) - 1), "
                "(s, i) -> struct(s AS sym, syms[i + 1] AS nxt)) "
                "ELSE CAST(array() AS array<struct<sym:string,nxt:string>>) END"
            )
        ).alias("pr"),
    )
    top1 = (
        pc.groupBy(
            F.col("pr.sym").alias("sym"), F.col("pr.nxt").alias("nxt")
        )
        .agg(F.sum("freq").alias("n_weighted"))
        .withColumn("pair", F.concat_ws(" ", "sym", "nxt"))
        .orderBy(F.desc("n_weighted"), F.asc("pair"))
        .limit(1)
        .select(
            F.col("sym").alias("pa"),
            F.col("nxt").alias("pb"),
            "pair",
            F.col("n_weighted").cast("long").alias("n_weighted"),
        )
    )
    # LEFT join on TRUE (not crossJoin): an empty top1 yields NULL
    # pa/pb, the fold's guard passes syms through unchanged, and the
    # report row survives with NULL pair — the step stays total.
    j = (
        vocab.join(F.broadcast(top1), F.lit(True), "left")
        .withColumn(
            "new_syms",
            F.expr(
                "CASE WHEN pa IS NULL THEN syms ELSE "
                "aggregate("
                "  slice(syms, 2, size(syms) - 1), "
                "  array(syms[0]), "
                "  (acc, x) -> CASE "
                "    WHEN element_at(acc, -1) = pa AND x = pb "
                "    THEN concat(slice(acc, 1, size(acc) - 1), "
                "                array(concat(pa, pb))) "
                "    ELSE concat(acc, array(x)) END) "
                "END"
            ),
        )
        .withColumn("n_merges", F.size("syms") - F.size("new_syms"))
    )
    vocab2 = j.select("word", "freq", F.col("new_syms").alias("syms"))
    rep = j.agg(
        F.first("pair").alias("pair"),
        F.first("n_weighted").alias("n_weighted"),
        F.sum("n_merges").cast("long").alias("n_vocab_merges"),
        F.sum(F.col("freq") * F.col("n_merges"))
        .cast("long")
        .alias("n_weighted_merges"),
    ).select(
        F.lit(step).alias("step"),
        "pair",
        "n_weighted",
        "n_vocab_merges",
        "n_weighted_merges",
    )
    return vocab2, rep


def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING: run ``BPE_MERGE_STEPS`` merge-learning
    iterations over the corpus vocabulary and report, per step, the merge
    that was learned (pair, weighted count when chosen, how many vocab
    positions / corpus tokens it collapsed). ``bpe_pair_counts`` is the
    counting half of one step; this is the full loop — the operator a
    tokenizer-training pipeline actually runs.

    Fully declarative on both engines: the arg-max merge of each step is
    an ORDER BY/LIMIT 1 one-row frame broadcast back into the vocabulary
    (no driver .collect(), no Python in the loop), and the greedy merge
    application is window algebra (see _bpe_merge_step). The DuckDB
    oracle unrolls the same three steps as CTE blocks.

    Reference scope: the reference computes token statistics per document
    (processing/data_quality.py's text metrics); merge learning is part of
    this engine's training-data extension surface (SURVEY.md §2 text
    family), same as bpe_pair_counts.
    """
    _, reports = _bpe_trained(spark, sf_dir)
    return reports.orderBy("step")


def _bpe_train(
    docs: DataFrame,
) -> tuple[DataFrame, list[DataFrame], list[DataFrame]]:
    """Run the full ``BPE_MERGE_STEPS`` training loop over a documents
    frame; returns (final vocabulary with each word's merged symbol
    list, per-step report frames, per-step intermediate caches — the
    caller unpersists these once the finals are materialized). Shared
    by the merge-learning report (``bpe_learn_merges``) and the corpus
    encoder (``bpe_apply_merges``)."""
    vocab = (
        docs.withColumn("tok", tokens(F.col("text")))
        .select(F.explode("tok").alias("word"))
        .filter(F.col("word").rlike(_BPE_WORD_RE))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "syms",
            F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
        )
    )
    reports = []
    intermediates = []
    for step in range(1, BPE_MERGE_STEPS + 1):
        # cache the evolving vocabulary between steps: inside one step,
        # `sy` feeds the pair count, the merge-start detection AND the
        # rewrite, so an uncached chain re-executes each prior step's
        # full lineage per consumer (~4x per step, compounding). The
        # cache is pure materialization — values identical, the oracle
        # unrolls the same algebra — and is the local analogue of the
        # vocab table a production trainer persists between iterations.
        # The caller unpersists these once the final artifacts are
        # materialized (r8 ADVICE: per-call caches must not accumulate).
        vocab = vocab.cache()
        intermediates.append(vocab)
        vocab, rep = _bpe_merge_step(vocab, step)
        reports.append(rep)
    return vocab, reports, intermediates


def _bpe_trained(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Session substrates for the trained tokenizer: the final
    vocabulary (word -> merged symbol list) and the per-step merge
    report, each persisted once per (session, corpus) and shared by the
    learner report, the corpus encoder, and the fertility rollup — the
    artifacts a production trainer writes beside the corpus. ONE
    training run feeds both registrations (the per-step intermediate
    caches of _bpe_train now happen once per session instead of once
    per query call)."""
    from ..operators.substrate import materialized, session_frame

    cell: dict[str, DataFrame] = {}

    def train() -> dict[str, DataFrame]:
        if "vocab" not in cell:
            vocab, reports, inter = _bpe_train(
                load_table(spark, sf_dir, "documents")
            )
            out = reports[0]
            for r in reports[1:]:
                out = out.unionByName(r)
            # materialize BOTH finals before releasing the per-step
            # training caches (the finals' lineage runs through them);
            # session_frame then sees already-persisted frames (no-op)
            cell["vocab"] = materialized(vocab)
            cell["reports"] = materialized(out)
            for f in inter:
                f.unpersist()
        return cell

    v = session_frame(spark, sf_dir, "bpe:vocab", lambda: train()["vocab"])
    rep = session_frame(spark, sf_dir, "bpe:reports", lambda: train()["reports"])
    return v, rep


def _bpe_sql_step(k: int) -> str:
    """One unrolled merge-step CTE block (DuckDB), mirroring
    _bpe_merge_step: vocab{k-1} -> sy{k}/top{k}/st{k}/sel{k}/m{k} ->
    vocab{k} + rep{k}."""
    p = k - 1
    return f"""
sy{k} AS (
  SELECT word, freq, pos, sym,
    lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
  FROM (
    SELECT word, freq,
      unnest(range(1, len(syms) + 1)) AS pos,
      unnest(syms) AS sym
    FROM vocab{p}
  )
),
top{k} AS (
  SELECT sym AS pa, nxt AS pb, sym || ' ' || nxt AS pair,
    CAST(SUM(freq) AS BIGINT) AS n_weighted
  FROM sy{k} WHERE nxt IS NOT NULL
  GROUP BY sym, nxt
  ORDER BY n_weighted DESC, pair ASC
  LIMIT 1
),
st{k} AS (
  SELECT s.word, s.pos,
    row_number() OVER (PARTITION BY s.word ORDER BY s.pos) AS rn
  FROM sy{k} s, top{k} t
  WHERE s.sym = t.pa AND s.nxt = t.pb
),
sel{k} AS (
  SELECT word, pos FROM (
    SELECT word, pos,
      row_number() OVER (PARTITION BY word, pos - rn ORDER BY pos) AS k2
    FROM st{k}
  ) WHERE k2 % 2 = 1
),
m{k} AS (
  SELECT g.*, coalesce(
      lag(sel) OVER (PARTITION BY word ORDER BY pos), FALSE) AS sel_prev
  FROM (
    SELECT y.word, y.freq, y.pos,
      CASE WHEN s.pos IS NOT NULL THEN t.pa || t.pb ELSE y.sym END AS sym,
      s.pos IS NOT NULL AS sel
    FROM sy{k} y
    CROSS JOIN top{k} t
    LEFT JOIN sel{k} s ON y.word = s.word AND y.pos = s.pos
  ) g
),
vocab{k} AS (
  SELECT word, freq, list(sym ORDER BY pos) AS syms
  FROM m{k} WHERE NOT sel_prev
  GROUP BY word, freq
),
rep{k} AS (
  SELECT {k} AS step, t.pair, t.n_weighted,
    CAST((SELECT COUNT(*) FROM m{k} WHERE sel) AS BIGINT) AS n_vocab_merges,
    CAST((SELECT SUM(freq) FROM m{k} WHERE sel) AS BIGINT)
      AS n_weighted_merges
  FROM top{k} t
)"""


BPE_LEARN_MERGES_SQL = (
    f"""{_DOCS_TOK_CTE}
, vocab0 AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
    list_transform(range(1, length(word) + 1), i -> word[i]) AS syms
  FROM (SELECT unnest(tok) AS word FROM t)
  WHERE regexp_matches(word, '{_BPE_WORD_RE}')
  GROUP BY word
),"""
    + ",".join(_bpe_sql_step(k) for k in range(1, BPE_MERGE_STEPS + 1))
    + "\n"
    + "\nUNION ALL\n".join(
        f"SELECT * FROM rep{k}" for k in range(1, BPE_MERGE_STEPS + 1)
    )
    + "\nORDER BY step"
)


def bpe_apply_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION — the missing half of the tokenizer
    loop (VERDICT r7 item 3): encode every document with the merges
    ``bpe_learn_merges`` trained and report, per document, the
    whitespace token count, the LEARNED-tokenizer token count, and the
    compression ratio. These are the counts an actual training run
    budgets with — ``sequence_packing``/``token_budget_sample`` count
    whitespace tokens; this operator supplies the learned-tokenizer
    equivalent.

    Application is a lookup, not a re-merge: training ran over the FULL
    corpus vocabulary, so the trained vocabulary's symbol list for a
    word IS the result of applying the ordered merge list to that word
    (greedy left-to-right non-overlapping, per _bpe_merge_step). Words
    outside the trainer's [a-z0-9] alphabet never vote on or receive
    merges and fall back to character-level encoding (length(word)
    symbols), the byte-fallback convention of real BPE tokenizers.

    Scale shape: the trained vocabulary is |distinct alphabet words| —
    corpus-sublinear; the encode pass is one keyed join of exploded doc
    tokens against it (AQE broadcasts when it fits) plus one per-doc
    hash agg. Nothing wider than word/doc_id shuffles."""
    return _bpe_encoded_table(spark, sf_dir).orderBy("doc_id")


def _bpe_encoded_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session substrate: the per-document encoded-token-count frame
    (doc_id, source, n_tokens_ws, n_tokens_bpe, compression_ratio),
    shared by the registered encoder query and the per-source fertility
    rollup."""
    from ..operators.substrate import session_frame

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        vocab, _ = _bpe_trained(spark, sf_dir)
        dtok = docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("word")
        )
        enc = dtok.join(
            vocab.select("word", F.size("syms").alias("n_syms")), "word", "left"
        )
        per_doc = enc.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens_ws"),
            F.sum(F.coalesce("n_syms", F.length("word")))
            .cast("long")
            .alias("n_tokens_bpe"),
        )
        ratio = F.col("n_tokens_bpe").cast("double") / F.col("n_tokens_ws")
        return (
            docs.select("doc_id", "source")
            .join(per_doc, "doc_id", "left")
            .select(
                "doc_id",
                "source",
                F.coalesce("n_tokens_ws", F.lit(0))
                .cast("long")
                .alias("n_tokens_ws"),
                F.coalesce("n_tokens_bpe", F.lit(0))
                .cast("long")
                .alias("n_tokens_bpe"),
                F.when(F.col("n_tokens_ws") > 0, _round4(ratio)).alias(
                    "compression_ratio"
                ),
            )
        )

    return session_frame(spark, sf_dir, "bpe:encoded", build)


BPE_APPLY_MERGES_SQL = (
    f"""{_DOCS_TOK_CTE}
, vocab0 AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
    list_transform(range(1, length(word) + 1), i -> word[i]) AS syms
  FROM (SELECT unnest(tok) AS word FROM t)
  WHERE regexp_matches(word, '{_BPE_WORD_RE}')
  GROUP BY word
),"""
    + ",".join(_bpe_sql_step(k) for k in range(1, BPE_MERGE_STEPS + 1))
    + f""",
doc_tok AS (
  SELECT doc_id, unnest(tok) AS word FROM t
),
enc AS (
  SELECT d.doc_id,
    CASE WHEN v.word IS NOT NULL THEN len(v.syms)
         ELSE length(d.word) END AS n
  FROM doc_tok d LEFT JOIN vocab{BPE_MERGE_STEPS} v ON v.word = d.word
),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens_ws,
    CAST(SUM(n) AS BIGINT) AS n_tokens_bpe
  FROM enc GROUP BY doc_id
)
SELECT t.doc_id, t.source,
  COALESCE(p.n_tokens_ws, 0) AS n_tokens_ws,
  COALESCE(p.n_tokens_bpe, 0) AS n_tokens_bpe,
  CASE WHEN COALESCE(p.n_tokens_ws, 0) > 0 THEN
    {_ROUND4_SQL.format(x="CAST(p.n_tokens_bpe AS DOUBLE) / p.n_tokens_ws")}
  END AS compression_ratio
FROM t LEFT JOIN per_doc p USING (doc_id)
ORDER BY t.doc_id
"""
)


def tokenizer_fertility_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source learned-tokenizer cost: the fertility (encoded tokens
    per whitespace token) a tokenizer owner reads before fixing a
    mixture — a source with outlier fertility (different script,
    markup-heavy, OOV-dense) eats training budget disproportionately
    and is the first candidate for tokenizer retraining or
    reallocation. Pure rollup of ``bpe_apply_merges``; the division is
    one IEEE op on exact BIGINT sums (order-independent)."""
    enc = _bpe_encoded_table(spark, sf_dir)
    fert = F.col("n_tokens_bpe").cast("double") / F.col("n_tokens_ws")
    return (
        enc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens_ws").cast("long").alias("n_tokens_ws"),
            F.sum("n_tokens_bpe").cast("long").alias("n_tokens_bpe"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens_ws",
            "n_tokens_bpe",
            F.when(F.col("n_tokens_ws") > 0, _round4(fert)).alias("fertility"),
        )
        .orderBy("source")
    )


TOKENIZER_FERTILITY_BY_SOURCE_SQL = f"""
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_tokens_ws) AS BIGINT) AS n_tokens_ws,
  CAST(SUM(n_tokens_bpe) AS BIGINT) AS n_tokens_bpe,
  CASE WHEN SUM(n_tokens_ws) > 0 THEN
    {_ROUND4_SQL.format(x="CAST(SUM(n_tokens_bpe) AS DOUBLE) / SUM(n_tokens_ws)")}
  END AS fertility
FROM ({BPE_APPLY_MERGES_SQL})
GROUP BY source
ORDER BY source
"""


# --- Gopher-style repetition quality rules ----------------------------------
# Word-level adaptation of the Rae et al. (2021, "Scaling Language Models:
# Gopher") repetition filters. The reference has no text-quality layer at
# all; these are part of the §2.13 training-data extension family. The
# corpus here is single-line synthetic text, so the line-based Gopher rules
# (duplicate-line fraction, bullet/ellipsis line ratios) are degenerate and
# the n-gram family carries the signal:
#   top_unigram_frac      occurrences of the most frequent token / n_tokens
#   dup_unigram_frac      occurrences of tokens appearing >= 2 times / n_tokens
#   top_2gram_char_frac   chars covered by the most frequent 2-gram
#                         (count x gram length) / length(text)
#   dup_3gram_char_frac   chars covered by 3-grams appearing >= 2 times
#                         (sum of count x gram length) / length(text)
# Ties on "most frequent" break deterministically to the alphabetically
# first gram (count DESC, gram ASC) in both engines.

GOPHER_TOP_UNIGRAM_MAX = 0.30
GOPHER_TOP_2GRAM_MAX = 0.20
GOPHER_DUP_3GRAM_MAX = 0.18


def gopher_repetition_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition diagnostics + pass/fail flags (the Gopher
    repetition filter family, word-level — see block comment above).

    Scale shape: ONE union of 1/2/3-gram explodes -> one hash agg on
    (doc_id, n, gram) -> one hash agg back to doc_id (conditional
    aggregates per gram order, argmax via min-struct so no window over
    the gram stream) -> broadcast-sized left join back to the documents
    base. Linear in total gram occurrences; no self-joins, no windows."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        F.length("text").cast("long").alias("n_chars_doc"),
        tokens(F.col("text")).alias("tok"),
    )
    base = t.select(
        "doc_id", "source", "n_chars_doc", F.size("tok").cast("long").alias("n_tokens")
    )
    grams = None
    for n in (1, 2, 3):
        g = t.select(
            "doc_id",
            F.lit(n).alias("n"),
            F.explode(ngrams("tok", n)).alias("gram"),
        )
        grams = g if grams is None else grams.unionByName(g)
    counts = grams.groupBy("doc_id", "n", "gram").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    # argmax-by-(c DESC, gram ASC) without a window: min over
    # struct(-c, gram) — smallest negated count = largest count, then
    # the alphabetically first gram among ties
    sel = F.struct((-F.col("c")).alias("negc"), F.col("gram").alias("gram"))
    per = counts.groupBy("doc_id").agg(
        F.min(F.when(F.col("n") == 1, sel)).alias("s1"),
        F.min(F.when(F.col("n") == 2, sel)).alias("s2"),
        F.sum(
            F.when((F.col("n") == 1) & (F.col("c") >= 2), F.col("c")).otherwise(0)
        )
        .cast("long")
        .alias("dup_tok"),
        F.sum(
            F.when(
                (F.col("n") == 3) & (F.col("c") >= 2),
                F.col("c") * F.length("gram"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("dup3_chars"),
    )
    j = base.join(per, "doc_id", "left")
    top1_c = F.coalesce(-F.col("s1.negc"), F.lit(0))
    top2_chars = F.coalesce(
        -F.col("s2.negc") * F.length(F.col("s2.gram")), F.lit(0)
    )
    dup_tok = F.coalesce("dup_tok", F.lit(0))
    dup3 = F.coalesce("dup3_chars", F.lit(0))
    nz = F.col("n_tokens") > 0
    nzc = F.col("n_chars_doc") > 0  # empty text would divide by zero
    top_uni = F.when(nz, _round4(top1_c.cast("double") / F.col("n_tokens"))).otherwise(0.0)
    dup_uni = F.when(nz, _round4(dup_tok.cast("double") / F.col("n_tokens"))).otherwise(0.0)
    top_2g = F.when(
        nzc, _round4(top2_chars.cast("double") / F.col("n_chars_doc"))
    ).otherwise(0.0)
    dup_3g = F.when(
        nzc, _round4(dup3.cast("double") / F.col("n_chars_doc"))
    ).otherwise(0.0)
    return j.select(
        "doc_id",
        "source",
        "n_tokens",
        top_uni.alias("top_unigram_frac"),
        dup_uni.alias("dup_unigram_frac"),
        top_2g.alias("top_2gram_char_frac"),
        dup_3g.alias("dup_3gram_char_frac"),
        (
            (top_uni <= GOPHER_TOP_UNIGRAM_MAX)
            & (top_2g <= GOPHER_TOP_2GRAM_MAX)
            & (dup_3g <= GOPHER_DUP_3GRAM_MAX)
        ).alias("passes_repetition_rules"),
    )


def _ngram_counts_cte() -> str:
    return f"""{_DOCS_TOK_CTE}
, g AS (
  SELECT doc_id, 1 AS n, unnest(tok) AS gram FROM t
  UNION ALL
  SELECT doc_id, 2 AS n, unnest({ngrams_sql("tok", 2)}) AS gram FROM t
  UNION ALL
  SELECT doc_id, 3 AS n, unnest({ngrams_sql("tok", 3)}) AS gram FROM t
), c AS (
  SELECT doc_id, n, gram, CAST(COUNT(*) AS BIGINT) AS c
  FROM g GROUP BY 1, 2, 3
)"""


GOPHER_REPETITION_RULES_SQL = f"""{_ngram_counts_cte()}
, p1 AS (
  SELECT doc_id,
    FIRST(c ORDER BY c DESC, gram ASC) AS top1_c,
    CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup_tok
  FROM c WHERE n = 1 GROUP BY doc_id
), p2 AS (
  SELECT doc_id,
    FIRST(c * length(gram) ORDER BY c DESC, gram ASC) AS top2_chars
  FROM c WHERE n = 2 GROUP BY doc_id
), p3 AS (
  SELECT doc_id,
    CAST(SUM(CASE WHEN c >= 2 THEN c * length(gram) ELSE 0 END) AS BIGINT)
      AS dup3_chars
  FROM c WHERE n = 3 GROUP BY doc_id
), f AS (
  SELECT t.doc_id, t.source,
    CAST(len(tok) AS BIGINT) AS n_tokens,
    CASE WHEN len(tok) > 0
      THEN {_ROUND4_SQL.format(x="CAST(COALESCE(p1.top1_c, 0) AS DOUBLE) / len(tok)")}
      ELSE 0.0 END AS top_unigram_frac,
    CASE WHEN len(tok) > 0
      THEN {_ROUND4_SQL.format(x="CAST(COALESCE(p1.dup_tok, 0) AS DOUBLE) / len(tok)")}
      ELSE 0.0 END AS dup_unigram_frac,
    CASE WHEN length(t.text) > 0
      THEN {_ROUND4_SQL.format(x="CAST(COALESCE(p2.top2_chars, 0) AS DOUBLE) / length(t.text)")}
      ELSE 0.0 END AS top_2gram_char_frac,
    CASE WHEN length(t.text) > 0
      THEN {_ROUND4_SQL.format(x="CAST(COALESCE(p3.dup3_chars, 0) AS DOUBLE) / length(t.text)")}
      ELSE 0.0 END AS dup_3gram_char_frac
  FROM t
  LEFT JOIN p1 ON p1.doc_id = t.doc_id
  LEFT JOIN p2 ON p2.doc_id = t.doc_id
  LEFT JOIN p3 ON p3.doc_id = t.doc_id
)
SELECT *,
  top_unigram_frac <= {GOPHER_TOP_UNIGRAM_MAX}
    AND top_2gram_char_frac <= {GOPHER_TOP_2GRAM_MAX}
    AND dup_3gram_char_frac <= {GOPHER_DUP_3GRAM_MAX}
    AS passes_repetition_rules
FROM f
"""


# --- unigram-LM token rarity ------------------------------------------------


def token_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token rarity against the corpus unigram distribution —
    the log-free stand-in for a unigram-LM perplexity quality signal
    (rare-vocabulary docs score high, boilerplate scores low). Everything
    stays exact-integer until ONE double division per output column:

      freq_weight     sum over token positions of the corpus count c_t
      mean_token_freq freq_weight / n_tokens
      rarity_score    n_tokens * C / freq_weight   (C = corpus positions)

    rarity is the reciprocal of the doc's mean token probability; log/exp
    are deliberately avoided because libm rounding differs between the
    JVM and DuckDB, which would break hash parity.

    Scale shape: one explode -> vocab hash agg -> keyed join back on
    token (vocab is a distinct-keyed dim; hot tokens join against ONE
    dim row each, so no skew blowup) -> per-doc hash agg; the corpus
    total rides along as a broadcast 1-row frame."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "source", tokens(F.col("text")).alias("tok"))
    tk = t.select("doc_id", F.explode("tok").alias("token"))
    vocab = tk.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = vocab.agg(F.sum("c").cast("long").alias("corpus_total"))
    per_doc = (
        tk.join(vocab, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("c").cast("long").alias("freq_weight"),
        )
    )
    base = t.select("doc_id", "source")
    return (
        base.join(per_doc, "doc_id", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "source",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("freq_weight", F.lit(0)).cast("long").alias("freq_weight"),
            F.when(
                F.coalesce("n_tokens", F.lit(0)) > 0,
                _round4(
                    F.col("freq_weight").cast("double") / F.col("n_tokens")
                ),
            )
            .otherwise(0.0)
            .alias("mean_token_freq"),
            F.when(
                F.coalesce("freq_weight", F.lit(0)) > 0,
                _round4(
                    F.col("n_tokens").cast("double")
                    * F.col("corpus_total")
                    / F.col("freq_weight")
                ),
            )
            .otherwise(0.0)
            .alias("rarity_score"),
        )
    )


TOKEN_RARITY_SCORE_SQL = f"""{_DOCS_TOK_CTE}
, tk AS (SELECT doc_id, unnest(tok) AS token FROM t)
, v AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM tk GROUP BY 1)
, tot AS (SELECT CAST(SUM(c) AS BIGINT) AS corpus_total FROM v)
, pd AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
    CAST(SUM(c) AS BIGINT) AS freq_weight
  FROM tk JOIN v USING (token) GROUP BY doc_id
)
SELECT t.doc_id, t.source,
  COALESCE(pd.n_tokens, 0) AS n_tokens,
  COALESCE(pd.freq_weight, 0) AS freq_weight,
  CASE WHEN COALESCE(pd.n_tokens, 0) > 0
    THEN {_ROUND4_SQL.format(x="CAST(pd.freq_weight AS DOUBLE) / pd.n_tokens")}
    ELSE 0.0 END AS mean_token_freq,
  CASE WHEN COALESCE(pd.freq_weight, 0) > 0
    THEN {_ROUND4_SQL.format(x="CAST(pd.n_tokens AS DOUBLE) * tot.corpus_total / pd.freq_weight")}
    ELSE 0.0 END AS rarity_score
FROM t LEFT JOIN pd ON pd.doc_id = t.doc_id CROSS JOIN tot
"""


# --- corpus report card -----------------------------------------------------


# Registered queries reading the text_analysis session substrates (the
# trained BPE vocabulary/report/encoded frames and the report card) —
# bench harnesses group these with the other substrate families so a
# blanket clearCache between queries doesn't evict shared state.
TA_SUBSTRATE_CONSUMERS = frozenset(
    {
        "bpe_learn_merges",
        "bpe_apply_merges",
        "tokenizer_fertility_by_source",
        "corpus_report_card",
        "mixture_weights_by_quality",
        "corpus_assembly_weighted",
        # r12: the winnow family reads the winnow:picks / winnow:fps
        # session substrates
        "winnowing_dup_pairs",
        "dup_detector_overlap",
        "incremental_winnow_matches",
        "winnowing_fingerprints",
    }
)


def corpus_report_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health dashboard — the one query an operator
    reads before deciding mixture weights: volume (docs/tokens), mean
    heuristic quality, Gopher-repetition pass rate, mean unigram rarity,
    and the exact-duplicate rate (excess md5 copies within the source).
    Composes the REGISTERED per-doc signals (text_stats,
    gopher_repetition_rules, token_rarity_score) so this rollup can
    never drift from their hash-verified semantics.

    Determinism: double-valued signals are cast to DECIMAL(38,6) before
    the cross-row SUM (order-independent), with ONE double division at
    the end; counts stay BIGINT.

    Scale shape: three narrow doc_id-keyed frames joined once against
    the md5 base (same shape as the assembly funnel), one hash agg to
    |sources| rows. Each signal is itself linear. Served from a session
    substrate: the |sources|-row card is persisted once per (session,
    corpus) and shared with mixture_weights_by_quality and the weighted
    assembly (the measure->decide->assemble consumers)."""
    from ..operators.substrate import session_frame

    return session_frame(
        spark, sf_dir, "rc:card", lambda: _report_card_compute(spark, sf_dir)
    )


def _report_card_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select("doc_id", "source", F.md5("text").alias("h"))
    ts = text_stats(spark, sf_dir).select("doc_id", "n_tokens", "quality_score")
    gr = gopher_repetition_rules(spark, sf_dir).select(
        "doc_id", "passes_repetition_rules"
    )
    rs = token_rarity_score(spark, sf_dir).select("doc_id", "rarity_score")
    j = h.join(ts, "doc_id").join(gr, "doc_id").join(rs, "doc_id")
    n = F.count(F.lit(1))
    dec = "decimal(38,6)"
    return (
        j.groupBy("source")
        .agg(
            n.cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.floor(
                F.sum("n_tokens").cast("double") / n * 100 + F.lit(0.5)
            ).alias("_mt"),
            F.floor(
                F.sum(F.col("quality_score").cast(dec)).cast("double") / n * 100
                + F.lit(0.5)
            ).alias("_mq"),
            F.floor(
                F.sum(F.col("passes_repetition_rules").cast("int")).cast("double")
                / n
                * 10000
                + F.lit(0.5)
            ).alias("_pr"),
            F.floor(
                F.sum(F.col("rarity_score").cast(dec)).cast("double") / n * 10000
                + F.lit(0.5)
            ).alias("_mr"),
            (n - F.countDistinct("h")).cast("long").alias("n_exact_dup_copies"),
            F.floor(
                (n - F.countDistinct("h")) / n.cast("double") * 10000 + F.lit(0.5)
            ).alias("_dr"),
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            (F.col("_mt") / 100).alias("mean_tokens"),
            (F.col("_mq") / 100).alias("mean_quality"),
            (F.col("_pr") / 10000).alias("pass_repetition_rate"),
            (F.col("_mr") / 10000).alias("mean_rarity"),
            "n_exact_dup_copies",
            (F.col("_dr") / 10000).alias("exact_dup_rate"),
        )
        .orderBy("source")
    )


def _report_card_sql() -> str:
    return f"""WITH ts AS (SELECT * FROM ({TEXT_STATS_SQL})),
gr AS (SELECT * FROM ({GOPHER_REPETITION_RULES_SQL})),
rs AS (SELECT * FROM ({TOKEN_RARITY_SCORE_SQL})),
h AS (SELECT doc_id, source, md5(text) AS h FROM documents)
SELECT h.source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(ts.n_tokens) AS BIGINT) AS total_tokens,
  floor(CAST(SUM(ts.n_tokens) AS DOUBLE) / COUNT(*) * 100 + 0.5) / 100
    AS mean_tokens,
  floor(CAST(SUM(CAST(ts.quality_score AS DECIMAL(38,6))) AS DOUBLE)
    / COUNT(*) * 100 + 0.5) / 100 AS mean_quality,
  floor(CAST(SUM(CASE WHEN gr.passes_repetition_rules THEN 1 ELSE 0 END) AS DOUBLE)
    / COUNT(*) * 10000 + 0.5) / 10000 AS pass_repetition_rate,
  floor(CAST(SUM(CAST(rs.rarity_score AS DECIMAL(38,6))) AS DOUBLE)
    / COUNT(*) * 10000 + 0.5) / 10000 AS mean_rarity,
  CAST(COUNT(*) - COUNT(DISTINCT h.h) AS BIGINT) AS n_exact_dup_copies,
  floor((COUNT(*) - COUNT(DISTINCT h.h)) / CAST(COUNT(*) AS DOUBLE) * 10000 + 0.5)
    / 10000 AS exact_dup_rate
FROM h
JOIN ts ON ts.doc_id = h.doc_id
JOIN gr ON gr.doc_id = h.doc_id
JOIN rs ON rs.doc_id = h.doc_id
GROUP BY h.source
ORDER BY h.source
"""


CORPUS_REPORT_CARD_SQL = _report_card_sql()


# --- pairwise source vocabulary overlap -------------------------------------


def source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary jaccard between sources — the signal for
    grouping sources before cross-source dedup and for spotting
    mirrored/scraped-twice feeds, complementing ``source_vocab_divergence``
    (each-vs-global chi-square) with each-vs-each overlap.

    Scale shape: one (source, token) DISTINCT (hash agg), pair counts via
    a keyed self-join on token (a token joins at most |sources| rows per
    side, so no hot-key blowup), and the |sources|^2 completion frame is
    a broadcast crossJoin of the tiny per-source sizes. Jaccard =
    shared / (a + b - shared), exact integers with one double division."""
    docs = load_table(spark, sf_dir, "documents")
    st = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("token"))
        .distinct()
    )
    sizes = st.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n"))
    shared = (
        st.alias("a")
        .join(
            st.alias("b"),
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared_tokens"))
    )
    allp = (
        sizes.select(F.col("source").alias("source_a"), F.col("n").alias("vocab_a"))
        .crossJoin(
            F.broadcast(
                sizes.select(
                    F.col("source").alias("source_b"), F.col("n").alias("vocab_b")
                )
            )
        )
        .filter(F.col("source_a") < F.col("source_b"))
    )
    j = allp.join(shared, ["source_a", "source_b"], "left").withColumn(
        "shared_tokens", F.coalesce("shared_tokens", F.lit(0))
    )
    union_n = F.col("vocab_a") + F.col("vocab_b") - F.col("shared_tokens")
    return j.select(
        "source_a",
        "source_b",
        "vocab_a",
        "vocab_b",
        "shared_tokens",
        _round4(F.col("shared_tokens").cast("double") / union_n).alias("jaccard"),
    ).orderBy("source_a", "source_b")


SOURCE_VOCAB_OVERLAP_SQL = f"""{_DOCS_TOK_CTE}
, st AS (SELECT DISTINCT source, unnest(tok) AS token FROM t)
, sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM st GROUP BY source)
, shared AS (
  SELECT a.source AS source_a, b.source AS source_b,
    CAST(COUNT(*) AS BIGINT) AS shared_tokens
  FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
  GROUP BY 1, 2
)
SELECT sa.source AS source_a, sb.source AS source_b,
  sa.n AS vocab_a, sb.n AS vocab_b,
  COALESCE(sh.shared_tokens, 0) AS shared_tokens,
  {_ROUND4_SQL.format(x="CAST(COALESCE(sh.shared_tokens, 0) AS DOUBLE) / (sa.n + sb.n - COALESCE(sh.shared_tokens, 0))")}
    AS jaccard
FROM sizes sa
JOIN sizes sb ON sa.source < sb.source
LEFT JOIN shared sh ON sh.source_a = sa.source AND sh.source_b = sb.source
ORDER BY source_a, source_b
"""


# --- Winnowing fingerprints (Schleimer et al. 2003) --------------------------

WINNOW_K = 3  # token k-gram size
WINNOW_W = 4  # window of consecutive k-gram hashes per fingerprint pick


def _winnow_hashes(docs: DataFrame) -> DataFrame:
    """Positional k-gram hashes (doc_id, pos, h) over a (doc_id, tok)
    frame — the linear substrate both the fingerprint report and the
    pair detector winnow from."""
    return docs.select(
        "doc_id",
        F.posexplode(ngrams("tok", WINNOW_K)).alias("pos", "g"),
    ).select("doc_id", "pos", F.md5("g").alias("h"))


def _winnow_picks_from(hashes: DataFrame) -> DataFrame:
    """The winnowed selection (doc_id, fp_pos, fp_hash): per-window
    minimum, rightmost position on ties (Schleimer et al. 2003 robust
    rule). Doc-partitioned ROWS window + one w-bounded self-band-join —
    never global."""
    from pyspark.sql import Window

    wnd = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(WINNOW_W - 1), 0)
    )
    # windows are complete once pos >= W-1 (the paper slides one window
    # per new hash; shorter prefixes are not windows)
    wmins = (
        hashes.withColumn("wmin", F.min("h").over(wnd))
        .filter(F.col("pos") >= WINNOW_W - 1)
        .select("doc_id", F.col("pos").alias("wend"), "wmin")
    )
    return (
        wmins.alias("w")
        .join(
            hashes.alias("x"),
            (F.col("x.doc_id") == F.col("w.doc_id"))
            & (F.col("x.pos") <= F.col("w.wend"))
            & (F.col("x.pos") >= F.col("w.wend") - (WINNOW_W - 1))
            & (F.col("x.h") == F.col("w.wmin")),
        )
        .groupBy(
            F.col("w.doc_id").alias("doc_id"),
            F.col("w.wend").alias("wend"),
            F.col("w.wmin").alias("fp_hash"),
        )
        .agg(F.max("x.pos").alias("fp_pos"))
        .select("doc_id", "fp_pos", "fp_hash")
        .distinct()
    )


def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003, the MOSS
    algorithm): hash every token 3-gram, slide a window of 4 consecutive
    hashes, and in each window select the minimum hash — rightmost
    position on ties (the paper's robust rule) — guaranteeing that any
    shared run of >= w+k-1 tokens yields at least one shared
    fingerprint, at ~2/(w+1) selection density. Complements the
    bottom-1 sketch in doc_fingerprints (global min) with the
    position-coupled LOCAL minima an overlap detector matches on.

    One row per document: gram/fingerprint counts, the realized
    selection density (one exact division), and an md5 digest of the
    ordered (pos:hash) fingerprint sequence — the whole selected set
    sits under the driver's value hash without emitting
    O(corpus-positions) rows.

    Scale shape: positional gram hashes (linear explode); the window
    minimum is a per-doc ROWS frame over pos (doc-partitioned — never
    global); the rightmost-min pick is one w-bounded self-band-join +
    per-window max; the digest is a per-doc bounded
    sort_array(collect_list) like event_sequences."""
    # r12 OPTIMIZATION (guide §1.2): the positional picks come from the
    # winnow:picks session substrate (no per-call re-run of the
    # md5-gram explode + window-min + band join), and the per-doc gram
    # count is computed directly as size(ngrams(tok, K)) — provably the
    # row count the old hashes-explode groupBy produced (posexplode
    # emits exactly one row per array element; the empty-array guard
    # yields 0 for short docs, identical to the left join's
    # coalesce(n_grams, 0)).
    picks = winnow_picks_table(spark, sf_dir)
    per_doc = picks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_fingerprints"),
        F.md5(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("fp_pos", "fp_hash"))),
                    lambda s: F.concat_ws(":", s["fp_pos"], s["fp_hash"]),
                ),
                "|",
            )
        ).alias("fp_digest"),
    )
    base = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", tokens(F.col("text")).alias("_tok_w"))
        .select(
            "doc_id",
            F.size(ngrams("_tok_w", WINNOW_K)).cast("long").alias("n_grams"),
        )
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_fingerprints", F.lit(0))
            .cast("long")
            .alias("n_fingerprints"),
            F.when(
                F.col("n_grams") >= WINNOW_W,
                F.col("n_fingerprints").cast("double") / F.col("n_grams"),
            ).alias("density"),
            F.coalesce("fp_digest", F.lit("")).alias("fp_digest"),
        )
        .orderBy("doc_id")
    )


# Shared winnowing CTE chain through the selected fingerprints —
# composed by both WINNOWING_FINGERPRINTS_SQL and
# WINNOWING_DUP_PAIRS_SQL (picks MATERIALIZED: the pair twin references
# it several times and DuckDB would otherwise inline the whole chain
# per reference).
_WINNOW_PICKS_CTE = f"""{_DOCS_TOK_CTE},
hashes AS (
  SELECT doc_id,
    unnest(range(0, greatest(len(tok) - {WINNOW_K - 1}, 0))) AS pos,
    unnest(list_transform(
      range(1, greatest(len(tok) - {WINNOW_K - 1}, 0) + 1),
      i -> md5(array_to_string(tok[i:i+{WINNOW_K - 1}], ' ')))) AS h
  FROM t
),
wmins AS (
  SELECT doc_id, pos AS wend,
    MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN {WINNOW_W - 1} PRECEDING AND CURRENT ROW) AS wmin
  FROM hashes
  QUALIFY pos >= {WINNOW_W - 1}
),
picks AS MATERIALIZED (
  SELECT DISTINCT doc_id, fp_pos, fp_hash FROM (
    SELECT w.doc_id, w.wend, w.wmin AS fp_hash, MAX(x.pos) AS fp_pos
    FROM wmins w
    JOIN hashes x ON x.doc_id = w.doc_id
      AND x.pos <= w.wend AND x.pos >= w.wend - {WINNOW_W - 1}
      AND x.h = w.wmin
    GROUP BY w.doc_id, w.wend, w.wmin
  )
)"""

WINNOWING_FINGERPRINTS_SQL = f"""{_WINNOW_PICKS_CTE},
per_doc AS (
  SELECT doc_id,
    CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
    md5(string_agg(fp_pos || ':' || fp_hash, '|' ORDER BY fp_pos, fp_hash))
      AS fp_digest
  FROM picks GROUP BY doc_id
),
ng AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
  FROM hashes GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(COALESCE(ng.n_grams, 0) AS BIGINT) AS n_grams,
  CAST(COALESCE(p.n_fingerprints, 0) AS BIGINT) AS n_fingerprints,
  CASE WHEN COALESCE(ng.n_grams, 0) >= {WINNOW_W} THEN
    CAST(p.n_fingerprints AS DOUBLE) / ng.n_grams
  END AS density,
  COALESCE(p.fp_digest, '') AS fp_digest
FROM (SELECT doc_id FROM t) d
LEFT JOIN ng USING (doc_id)
LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
"""


# --- winnowing pair detector -------------------------------------------------
#
# The fifth near-dup detector (MinHash-LSH, SimHash, n-gram Jaccard,
# embedding-cosine, and now winnowing): join documents on SHARED
# SELECTED FINGERPRINTS — the Schleimer et al. use-case the fingerprint
# report computes digests for. Because winnowing guarantees any shared
# token run of >= w+k-1 yields at least one shared fingerprint, this
# detector is sensitive to LOCAL verbatim overlap (clone/quote
# detection) where the global sketches need whole-document similarity.

# fingerprint hashes shared by more docs than this are boilerplate
# ("stop fingerprints") — dropped from the inverted index, same
# df-capping as CONTAINMENT_SHINGLE_MAX_DF so no fingerprint fans out
# quadratically
WINNOW_MAX_DF = 64
# pairs must share at least this many distinct selected fingerprints
WINNOW_MIN_SHARED = 2


def winnow_picks_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session substrate ``winnow:picks``: the positional winnowed
    selection (doc_id, fp_pos, fp_hash), built once per (session,
    corpus). r12 OPTIMIZATION (guide §1.2: remove repeated passes): the
    fingerprint report and the posting-list substrate each re-ran the
    full md5-gram explode + window-min + rightmost-pick band join; the
    selection is deterministic per corpus snapshot, so it is computed
    once and both derive from it."""
    from ..operators.substrate import session_frame

    def build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", tokens(F.col("text")).alias("tok")
        )
        return _winnow_picks_from(_winnow_hashes(docs))

    return session_frame(spark, sf_dir, "winnow:picks", build)


def winnow_fps_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session substrate: the distinct winnowed posting list
    (doc_id, fp_hash), built once per (session, corpus) — shared by the
    pair detector and the cross-detector overlap report. Derived from
    the positional winnow:picks substrate (r12)."""
    from ..operators.substrate import session_frame

    def build() -> DataFrame:
        return (
            winnow_picks_table(spark, sf_dir)
            .select("doc_id", "fp_hash")
            .distinct()
        )

    return session_frame(spark, sf_dir, "winnow:fps", build)


def winnowing_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs from the winnowed fingerprint inverted
    index: (doc_a, doc_b, n_shared, n_fp_a, n_fp_b, overlap) for pairs
    sharing >= WINNOW_MIN_SHARED distinct selected fingerprints after
    the df-cap; overlap = n_shared / min(n_fp_a, n_fp_b) (containment
    over the winnowed sketch — one exact division).

    Scale shape: linear winnow substrate → distinct (doc, fp) posting
    list → df-capped inverted index (every fingerprint fans out to at
    most WINNOW_MAX_DF docs, so the self-join is bounded per key like
    the shingle-containment path) → hash-agg on the pair key. Cites
    reference parity: no counterpart (clone detection absent from the
    reference); Schleimer et al. 2003 §3."""
    fps = winnow_fps_table(spark, sf_dir)
    n_fp = fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_fp")
    )
    kept = fps.join(
        fps.groupBy("fp_hash")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= WINNOW_MAX_DF)
        .select("fp_hash"),
        "fp_hash",
    )
    pairs = (
        kept.alias("a")
        .join(
            kept.alias("b"),
            (F.col("a.fp_hash") == F.col("b.fp_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
    )
    return (
        pairs.join(
            n_fp.select(
                F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("n_fp_a")
            ),
            "doc_a",
        )
        .join(
            n_fp.select(
                F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("n_fp_b")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            "n_fp_a",
            "n_fp_b",
            (
                F.col("n_shared").cast("double")
                / F.least("n_fp_a", "n_fp_b").cast("double")
            ).alias("overlap"),
        )
        .orderBy("doc_a", "doc_b")
    )


WINNOWING_DUP_PAIRS_SQL = f"""{_WINNOW_PICKS_CTE},
fps AS MATERIALIZED (
  SELECT DISTINCT doc_id, fp_hash FROM picks
),
nfp AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_fp FROM fps GROUP BY doc_id
),
kept AS MATERIALIZED (
  SELECT f.doc_id, f.fp_hash
  FROM fps f JOIN (
    SELECT fp_hash FROM fps GROUP BY fp_hash
    HAVING COUNT(*) <= {WINNOW_MAX_DF}
  ) d USING (fp_hash)
),
pr AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM kept a JOIN kept b
    ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING COUNT(*) >= {WINNOW_MIN_SHARED}
)
SELECT pr.doc_a, pr.doc_b, pr.n_shared,
  na.n_fp AS n_fp_a, nb.n_fp AS n_fp_b,
  CAST(pr.n_shared AS DOUBLE) / CAST(LEAST(na.n_fp, nb.n_fp) AS DOUBLE)
    AS overlap
FROM pr
JOIN nfp na ON na.doc_id = pr.doc_a
JOIN nfp nb ON nb.doc_id = pr.doc_b
ORDER BY pr.doc_a, pr.doc_b
"""
