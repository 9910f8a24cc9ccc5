"""Model-based quality filtering and importance resampling over the
``documents`` table — the three *trained* data-curation passes a
large-scale LLM pipeline runs after the heuristic filters:

1. **Naive-Bayes quality classifier** (the CCNet / fastText "quality
   classifier" stage, Wenzek et al. 2020): pseudo-label documents from
   the engine's own deterministic quality score, train token class
   counts on the hash-split train partition, and score EVERY document —
   a closed measure→train→score loop with a held-out confusion rollup.
2. **Stupid-backoff n-gram LM scoring** (Brants et al. 2007, the
   KenLM-style fluency filter): train bigram/unigram counts on the
   train split and score every document's bigram stream with
   ``S(w2|w1) = c(w1 w2)/c(w1)`` backing off to ``0.4 · c(w2)/N``.
3. **DSIR importance resampling** (Xie et al. 2023): hashed n-gram
   features, per-bucket target/raw likelihood ratios (target = the
   quality-seed-positive documents), per-document importance weights
   and a top-share sampling plan through the scalable exact ranker.

Engine-neutral float discipline (the repo-wide rule — see
plans/text_analysis.py vocab_df_stats): ``ln()`` is not bit-stable
across math libraries, so NOTHING here emits a log. Where the published
technique scores in log space, the engine uses the equivalent *rational*
form with a fixed expression tree — every emitted double is produced by
a short, explicitly-ordered chain of IEEE-exact casts/multiplies/divides
that both engines round identically, and every *aggregated* score is a
fixed-point BIGINT (``floor(p · scale)`` of a bit-identical double — the
same trick as the graph PageRank's fixed-point ranks), so sums are exact
integer arithmetic regardless of aggregation order. The NB "log-odds
weight" becomes the sign vote of the Laplace-smoothed odds comparison
(Bernoulli-NB-with-binarized-weights — the comparison
``(c_hi+1)(T_lo+V) vs (c_lo+1)(T_hi+V)`` is two fixed-order products of
exactly-cast integers); the LM "mean log-prob" becomes the fixed-point
mean probability (ln is monotone per token but the *sum* differs — the
probability-space statistics n_hits/n_backoff/n_oov/mean-prob are the
filterable signal, and a consumer that wants perplexity applies ln
downstream of the hash-compared columns); DSIR's log-likelihood-ratio
sum becomes a fixed-point *linear* ratio sum — an explicit engine-defined
APPROXIMATION of the paper's sum of log-ratios, NOT rank-equivalent in
general (a single large-ratio bucket dominates linearly where it would
contribute only its log under DSIR proper; the orderings coincide only
when per-doc bucket ratios are narrowly spread). We keep it because it
is deterministic, exact-integer-summable under any partitioning, and
preserves the target-preference property the pytest pins verify; the
registered ``dsir_log_weights`` (§3b below) IS the paper-fidelity
form — the same join shape with a precomputed fixed-point log-ratio
lookup (a Python-literal geometric level table), so both rankings are
available and both hash-match their oracles.

Scale shape (100 TB): every stage is explode → hash-aggregate on a
token/pair/bucket key with map-side combine; model frames are
vocabulary-bounded (NOT corpus-bounded) session substrates built once
per corpus snapshot; scoring is one keyed hash join from per-doc
(token, occ) counts to the model (AQE broadcasts it when the vocab head
is small, shuffle-hash otherwise); the DSIR bucket-ratio table is
exactly ``DSIR_BUCKETS`` rows (broadcast); the only global ordering (the
DSIR sample rank) goes through operators/ranking.with_global_rank — no
single-partition window anywhere.

Reference parity: the reference is a clickstream pipeline with no
model-based curation stage; these are §"beyond the reference"
LLM-pipeline operators (same charter as plans/corpus_prep.py), built on
the shared tokenizer (functions/text.py:tokens) and the hash-split /
quality-score substrate the rest of the engine already verifies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import (
    hash_bucket,
    hash_bucket_sql,
    ngrams,
    ngrams_sql,
    tokens,
    tokens_sql,
)
from ..operators.substrate import session_frame
from ..sources.tables import load_table
from .corpus_prep import TRAIN_UPPER, _split_bucket_sql, split_bucket
from .text_analysis import TEXT_STATS_SQL, text_stats

# Pseudo-label threshold on the deterministic quality score (text_stats):
# ~64% of the synthetic corpus lands "hi" at 85.0, so both classes are
# well-populated at every sf. A production run replaces this with human
# or LM labels; the training algebra is identical.
NB_SEED_THRESHOLD = 85.0
NB_TOP_K = 100

LM_ALPHA = 0.4  # stupid-backoff discount (Brants et al. 2007)
LM_FP_SCALE = 1_000_000_000_000.0  # probability fixed-point: floor(p * 1e12)

DSIR_BUCKETS = 1024  # power of two: zero mod bias from the 16-bit hash
DSIR_FP_SCALE = 1_000_000.0  # ratio fixed-point: floor(r * 1e6)
DSIR_KEEP_SHARE = 0.25

# Queries sharing the qm:* session substrates (bench.py groups them so a
# blanket clearCache between queries doesn't evict the shared frames).
QM_SUBSTRATE_CONSUMERS = {
    "nb_quality_model",
    "nb_classifier_scores",
    "nb_classifier_eval",
    "ngram_lm_scores",
    "dsir_importance_sample",
    "model_gate_report",
    "nb_calibration_sweep",
    "ccnet_perplexity_buckets",
    "dsir_log_weights",
    "doremi_domain_weights",
    "model_gate_disagreement",
    "doremi_mixture_sample",
    # packing.py planners that ride the qm:labeled substrate (r12)
    "unimax_mixture_plan",
    "unimax_budget_draw",
}


# --- shared labeled-corpus substrate -----------------------------------------


def labeled_docs_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, tok, n_tokens, quality_score, seed_hi, is_train):
    the tokenized corpus with the quality pseudo-label and the
    deterministic md5 train-split flag (same bucket function as
    corpus_split, so "train" means the same documents everywhere in the
    engine). Built once per (session, corpus) — one linear pass."""

    def build() -> DataFrame:
        stats = text_stats(spark, sf_dir).select(
            "doc_id", "n_tokens", "quality_score"
        )
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", tokens(F.col("text")).alias("tok")
        )
        return docs.join(stats, "doc_id").select(
            "doc_id",
            "source",
            "tok",
            "n_tokens",
            "quality_score",
            (F.col("quality_score") >= F.lit(NB_SEED_THRESHOLD)).alias("seed_hi"),
            (split_bucket(F.col("doc_id")) < TRAIN_UPPER).alias("is_train"),
        )

    return session_frame(spark, sf_dir, "qm:labeled", build)


# The SQL twin of the substrate, shared by every oracle below.
_LAB_CTE = f"""WITH stats AS ({TEXT_STATS_SQL}),
toks AS (SELECT doc_id, source, {tokens_sql()} AS tok FROM documents),
lab AS (
  SELECT t.doc_id, t.source, t.tok, s.n_tokens, s.quality_score,
         s.quality_score >= {NB_SEED_THRESHOLD} AS seed_hi,
         ({_split_bucket_sql("t.doc_id")}) < {TRAIN_UPPER} AS is_train
  FROM toks t JOIN stats s ON t.doc_id = s.doc_id
)"""


# --- 1. Naive-Bayes quality classifier ---------------------------------------


def nb_model_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained classifier = per-token class counts over the TRAIN split
    plus the derived vote/odds columns. Vocabulary-bounded (one row per
    distinct train token); the class-total/vocab scalars ride the plan
    as a broadcast 1-row aggregate — no driver-side count.

    Exactness: ``hi_mass = double(cnt_hi+1) · double(tot_lo+V)`` and
    ``lo_mass`` are each ONE int-exact addition, ONE correctly-rounded
    int→double cast pair and ONE IEEE multiply — bit-identical in Spark
    and DuckDB — so the sign vote, the odds ratio (one division) and the
    discriminativeness (one division, branch chosen by an exact
    comparison) are all hash-stable."""

    def build() -> DataFrame:
        lab = labeled_docs_table(spark, sf_dir)
        tok = lab.filter(F.col("is_train")).select(
            "seed_hi", F.explode("tok").alias("token")
        )
        counts = tok.groupBy("token").agg(
            F.sum(F.when(F.col("seed_hi"), 1).otherwise(0))
            .cast("long")
            .alias("cnt_hi"),
            F.sum(F.when(F.col("seed_hi"), 0).otherwise(1))
            .cast("long")
            .alias("cnt_lo"),
        )
        tot = counts.agg(
            F.sum("cnt_hi").cast("long").alias("tot_hi"),
            F.sum("cnt_lo").cast("long").alias("tot_lo"),
            F.count(F.lit(1)).alias("vocab_n"),
        )
        m = counts.crossJoin(F.broadcast(tot))
        hi_mass = (F.col("cnt_hi") + 1).cast("double") * (
            F.col("tot_lo") + F.col("vocab_n")
        ).cast("double")
        lo_mass = (F.col("cnt_lo") + 1).cast("double") * (
            F.col("tot_hi") + F.col("vocab_n")
        ).cast("double")
        return m.select(
            "token",
            "cnt_hi",
            "cnt_lo",
            F.when(hi_mass > lo_mass, 1)
            .when(hi_mass < lo_mass, -1)
            .otherwise(0)
            .cast("long")
            .alias("vote"),
            (hi_mass / lo_mass).alias("odds"),
            F.when(hi_mass >= lo_mass, hi_mass / lo_mass)
            .otherwise(lo_mass / hi_mass)
            .alias("disc"),
        )

    return session_frame(spark, sf_dir, "qm:nb_model", build)


_NB_MODEL_CTE = """
, tr_tok AS (SELECT seed_hi, unnest(tok) AS token FROM lab WHERE is_train),
nb_counts AS (
  SELECT token,
    CAST(SUM(CASE WHEN seed_hi THEN 1 ELSE 0 END) AS BIGINT) AS cnt_hi,
    CAST(SUM(CASE WHEN seed_hi THEN 0 ELSE 1 END) AS BIGINT) AS cnt_lo
  FROM tr_tok GROUP BY token
),
nb_tot AS (
  SELECT SUM(cnt_hi) AS tot_hi, SUM(cnt_lo) AS tot_lo, COUNT(*) AS vocab_n
  FROM nb_counts
),
nb_mass AS (
  SELECT token, cnt_hi, cnt_lo,
    CAST(cnt_hi + 1 AS DOUBLE) * CAST(tot_lo + vocab_n AS DOUBLE) AS hi_mass,
    CAST(cnt_lo + 1 AS DOUBLE) * CAST(tot_hi + vocab_n AS DOUBLE) AS lo_mass
  FROM nb_counts CROSS JOIN nb_tot
),
nb_model AS (
  SELECT token, cnt_hi, cnt_lo,
    CAST(CASE WHEN hi_mass > lo_mass THEN 1
              WHEN hi_mass < lo_mass THEN -1 ELSE 0 END AS BIGINT) AS vote,
    hi_mass / lo_mass AS odds,
    CASE WHEN hi_mass >= lo_mass THEN hi_mass / lo_mass
         ELSE lo_mass / hi_mass END AS disc
  FROM nb_mass
)"""


def nb_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classifier's head: the NB_TOP_K most discriminative tokens
    (largest odds ratio in either direction, Laplace-smoothed), with
    class counts, sign vote and exact rational odds. This is the
    inspectable model artifact a curation team reviews before enabling
    the filter. Top-k = TakeOrdered over the vocab-bounded model frame
    (never corpus-sized); ties break on token text."""
    m = nb_model_table(spark, sf_dir)
    return m.orderBy(F.desc("disc"), F.asc("token")).limit(NB_TOP_K)


NB_QUALITY_MODEL_SQL = f"""{_LAB_CTE}{_NB_MODEL_CTE}
SELECT token, cnt_hi, cnt_lo, vote, odds, disc
FROM nb_model
ORDER BY disc DESC, token ASC
LIMIT {NB_TOP_K}
"""


def nb_score_docs(tok_docs: DataFrame, model: DataFrame) -> DataFrame:
    """Serve the frozen classifier over ANY (doc_id, tok) frame — batch
    or a streaming micro-batch inside foreachBatch (scoring is per-doc
    independent, so per-micro-batch results union to the batch result
    exactly). Returns (doc_id, vote_sum, n_scored, n_oov, predicted_hi).

    Scale: per-doc (token, occ) counts via explode + hash agg, ONE
    token-keyed hash join to the vocab-bounded model, one doc-keyed
    rollup — a single map-join pass at corpus scale."""
    occ = (
        tok_docs.select("doc_id", F.explode("tok").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    return (
        occ.join(model.select("token", "vote"), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("occ") * F.coalesce(F.col("vote"), F.lit(0)))
            .cast("long")
            .alias("vote_sum"),
            F.sum(F.when(F.col("vote").isNotNull(), F.col("occ")).otherwise(0))
            .cast("long")
            .alias("n_scored"),
            F.sum(F.when(F.col("vote").isNull(), F.col("occ")).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .withColumn("predicted_hi", F.col("vote_sum") > 0)
    )


def nb_scores_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session substrate: the served NB score frame (doc_id, vote_sum,
    n_scored, n_oov, predicted_hi), built once per (session, corpus) —
    r12: previously nb_classifier_scores, nb_calibration_sweep and the
    two model-gate queries each re-ran the token explode + model join
    per call; a production pipeline scores the snapshot once and every
    report reads the score table (the same argument as qm:dsir_sample).
    The DuckDB oracles keep the full inline serving pipeline, so parity
    still checks the computation, not the cache."""

    def build() -> DataFrame:
        return nb_score_docs(
            labeled_docs_table(spark, sf_dir), nb_model_table(spark, sf_dir)
        )

    return session_frame(spark, sf_dir, "qm:nb_scores", build)


def nb_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the trained classifier to EVERY document (train and held
    out): multinomial vote sum = Σ occurrences · token-vote over the
    document's tokens, OOV tokens (absent from the train vocabulary)
    vote 0 and are counted. predicted_hi = vote_sum > 0 (tie → lo, the
    majority-free deterministic default). Serving algebra in
    :func:`nb_score_docs` (shared with the streaming foreachBatch
    twin)."""
    lab = labeled_docs_table(spark, sf_dir)
    sc = nb_scores_table(spark, sf_dir)
    return (
        lab.select("doc_id", "source", "is_train", "seed_hi")
        .join(sc, "doc_id")
        .select(
            "doc_id",
            "source",
            "is_train",
            "seed_hi",
            "vote_sum",
            "n_scored",
            "n_oov",
            "predicted_hi",
            (F.col("predicted_hi") == F.col("seed_hi")).alias("is_correct"),
        )
        .orderBy("doc_id")
    )


_NB_SCORES_CTE = """
, occ AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS occ
  FROM (SELECT doc_id, unnest(tok) AS token FROM lab)
  GROUP BY doc_id, token
),
nb_sc AS (
  SELECT o.doc_id,
    CAST(SUM(o.occ * COALESCE(m.vote, 0)) AS BIGINT) AS vote_sum,
    CAST(SUM(CASE WHEN m.token IS NOT NULL THEN o.occ ELSE 0 END) AS BIGINT) AS n_scored,
    CAST(SUM(CASE WHEN m.token IS NULL THEN o.occ ELSE 0 END) AS BIGINT) AS n_oov
  FROM occ o LEFT JOIN nb_model m ON o.token = m.token
  GROUP BY o.doc_id
),
nb_scores AS (
  SELECT l.doc_id, l.source, l.is_train, l.seed_hi,
         s.vote_sum, s.n_scored, s.n_oov,
         s.vote_sum > 0 AS predicted_hi,
         (s.vote_sum > 0) = l.seed_hi AS is_correct
  FROM lab l JOIN nb_sc s ON l.doc_id = s.doc_id
)"""

NB_CLASSIFIER_SCORES_SQL = f"""{_LAB_CTE}{_NB_MODEL_CTE}{_NB_SCORES_CTE}
SELECT doc_id, source, is_train, seed_hi, vote_sum, n_scored, n_oov,
       predicted_hi, is_correct
FROM nb_scores
ORDER BY doc_id
"""


def nb_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion rollup of the classifier by split — the held-out rows
    (is_train = false) are the generalization check a pipeline gates the
    filter on. share_of_split = cell count / split total (window over
    ≤ 8 grouped rows, partitioned by is_train — not a corpus window)."""
    sc = nb_classifier_scores(spark, sf_dir)
    g = sc.groupBy("is_train", "seed_hi", "predicted_hi").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy("is_train")
    return g.select(
        "is_train",
        "seed_hi",
        "predicted_hi",
        "n_docs",
        (
            F.col("n_docs").cast("double")
            / F.sum("n_docs").over(w).cast("double")
        ).alias("share_of_split"),
    ).orderBy("is_train", "seed_hi", "predicted_hi")


NB_CLASSIFIER_EVAL_SQL = f"""{_LAB_CTE}{_NB_MODEL_CTE}{_NB_SCORES_CTE}
SELECT is_train, seed_hi, predicted_hi,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(*) AS DOUBLE)
    / CAST(SUM(COUNT(*)) OVER (PARTITION BY is_train) AS DOUBLE) AS share_of_split
FROM nb_scores
GROUP BY is_train, seed_hi, predicted_hi
ORDER BY is_train, seed_hi, predicted_hi
"""


# --- 2. stupid-backoff n-gram LM scoring -------------------------------------


def lm_unigram_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(token, c1) unigram counts over the TRAIN split — vocab-bounded."""

    def build() -> DataFrame:
        lab = labeled_docs_table(spark, sf_dir)
        return (
            lab.filter(F.col("is_train"))
            .select(F.explode("tok").alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).cast("long").alias("c1"))
        )

    return session_frame(spark, sf_dir, "qm:lm_uni", build)


def lm_bigram_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(pair, c2, c1_w1) bigram counts over the TRAIN split with the
    context (first-word) unigram count pre-joined, so serving needs no
    second lookup on the hit path. Bounded by distinct train bigrams."""

    def build() -> DataFrame:
        lab = labeled_docs_table(spark, sf_dir)
        uni = lm_unigram_table(spark, sf_dir)
        bi = (
            lab.filter(F.col("is_train"))
            .select(F.explode(ngrams("tok", 2)).alias("pair"))
            .groupBy("pair")
            .agg(F.count(F.lit(1)).cast("long").alias("c2"))
        )
        return bi.join(
            uni.select(F.col("token").alias("_w1"), F.col("c1").alias("c1_w1")),
            F.substring_index(F.col("pair"), " ", 1) == F.col("_w1"),
        ).select("pair", "c2", "c1_w1")

    return session_frame(spark, sf_dir, "qm:lm_bi", build)


def lm_score_docs(
    tok_docs: DataFrame, bi: DataFrame, uni: DataFrame
) -> DataFrame:
    """Serve the frozen LM over ANY (doc_id, tok) frame — batch or a
    streaming micro-batch inside foreachBatch (per-doc independent, so
    micro-batch results union to the batch result exactly). Returns
    (doc_id, n_bigrams, n_bigram_hits, n_unigram_backoff, n_oov,
    lm_score_fp, mean_bigram_prob); docs with fewer than two tokens
    produce no row (they have no bigrams to score)."""
    n_train = uni.agg(F.sum("c1").cast("long").alias("n_train_tokens"))
    pairs = (
        tok_docs.select("doc_id", F.explode(ngrams("tok", 2)).alias("pair"))
        .groupBy("doc_id", "pair")
        .agg(F.count(F.lit(1)).alias("occ"))
    )
    scored = (
        pairs.join(bi, "pair", "left")
        .join(
            uni.select(F.col("token").alias("_w2"), F.col("c1").alias("c1_w2")),
            F.substring_index(F.col("pair"), " ", -1) == F.col("_w2"),
            "left",
        )
        .crossJoin(F.broadcast(n_train))
    )
    p = (
        F.when(
            F.col("c2").isNotNull(),
            F.col("c2").cast("double") / F.col("c1_w1").cast("double"),
        )
        .when(
            F.col("c1_w2").isNotNull(),
            F.lit(LM_ALPHA)
            * (F.col("c1_w2").cast("double") / F.col("n_train_tokens").cast("double")),
        )
        .otherwise(F.lit(0.0))
    )
    scored = scored.select(
        "doc_id",
        "occ",
        F.col("c2").isNotNull().alias("is_hit"),
        (F.col("c2").isNull() & F.col("c1_w2").isNotNull()).alias("is_backoff"),
        (F.col("c2").isNull() & F.col("c1_w2").isNull()).alias("is_oov"),
        F.floor(p * F.lit(LM_FP_SCALE)).alias("p_fp"),
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("occ").cast("long").alias("n_bigrams"),
        F.sum(F.when(F.col("is_hit"), F.col("occ")).otherwise(0))
        .cast("long")
        .alias("n_bigram_hits"),
        F.sum(F.when(F.col("is_backoff"), F.col("occ")).otherwise(0))
        .cast("long")
        .alias("n_unigram_backoff"),
        F.sum(F.when(F.col("is_oov"), F.col("occ")).otherwise(0))
        .cast("long")
        .alias("n_oov"),
        F.sum(F.col("occ") * F.col("p_fp")).cast("long").alias("lm_score_fp"),
    )
    mean_prob = (
        F.col("lm_score_fp").cast("double") / F.col("n_bigrams").cast("double")
    ) / F.lit(LM_FP_SCALE)
    return agg.withColumn(
        "mean_bigram_prob", F.when(F.col("n_bigrams") > 0, mean_prob)
    )


def lm_scores_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session substrate: the served LM score frame (doc_id, n_bigrams,
    n_bigram_hits, n_unigram_backoff, n_oov, lm_score_fp,
    mean_bigram_prob), built once per (session, corpus) — r12: the
    bigram explode + two model joins previously re-ran per consumer
    (ngram_lm_scores, both model-gate queries, both DoReMi planners,
    transitively ccnet); score once per snapshot, read everywhere. The
    DuckDB oracles keep the inline pipeline."""

    def build() -> DataFrame:
        lab = labeled_docs_table(spark, sf_dir)
        return lm_score_docs(
            lab, lm_bigram_table(spark, sf_dir), lm_unigram_table(spark, sf_dir)
        )

    return session_frame(spark, sf_dir, "qm:lm_scores", build)


def ngram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document's bigram stream against the train-split LM:
    per occurrence, ``S = c2/c1(w1)`` if the bigram was seen in training,
    else ``0.4 · c1(w2)/N`` (stupid backoff), else OOV (S = 0, counted).
    Emitted per document: occurrence totals per branch, the exact
    fixed-point score sum (Σ occ · floor(S · 1e12), integer arithmetic)
    and the mean bigram probability — the fluency signal a
    perplexity-style filter thresholds (ln is monotone per token and
    applied downstream of the hash-compared columns; see module
    docstring).

    Scale: per-doc (pair, occ) hash agg → one pair-keyed left join to
    the bigram model + one token-keyed left join to the unigram model
    (both vocabulary-bounded) → doc-keyed rollup."""
    lab = labeled_docs_table(spark, sf_dir)
    agg = lm_scores_table(spark, sf_dir)
    return (
        lab.select("doc_id", "source", "is_train")
        .join(agg, "doc_id")
        .select(
            "doc_id",
            "source",
            "is_train",
            "n_bigrams",
            "n_bigram_hits",
            "n_unigram_backoff",
            "n_oov",
            "lm_score_fp",
            "mean_bigram_prob",
        )
        .orderBy("doc_id")
    )


_LM_CTE = f"""
, tr_bi AS (SELECT unnest({ngrams_sql("tok", 2)}) AS pair FROM lab WHERE is_train),
lm_bi AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS c2 FROM tr_bi GROUP BY pair),
tr_uni AS (SELECT unnest(tok) AS token FROM lab WHERE is_train),
lm_uni AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c1 FROM tr_uni GROUP BY token),
lm_n AS (SELECT SUM(c1) AS n_train_tokens FROM lm_uni),
lm_bic AS (
  SELECT b.pair, b.c2, u.c1 AS c1_w1
  FROM lm_bi b JOIN lm_uni u ON split_part(b.pair, ' ', 1) = u.token
),
pairs AS (
  SELECT doc_id, pair, CAST(COUNT(*) AS BIGINT) AS occ
  FROM (SELECT doc_id, unnest({ngrams_sql("tok", 2)}) AS pair FROM lab)
  GROUP BY doc_id, pair
),
lm_scored AS (
  SELECT p.doc_id, p.occ,
    b.c2 IS NOT NULL AS is_hit,
    b.c2 IS NULL AND u2.c1 IS NOT NULL AS is_backoff,
    b.c2 IS NULL AND u2.c1 IS NULL AS is_oov,
    CAST(FLOOR((CASE
      WHEN b.c2 IS NOT NULL THEN CAST(b.c2 AS DOUBLE) / CAST(b.c1_w1 AS DOUBLE)
      WHEN u2.c1 IS NOT NULL THEN {LM_ALPHA} * (CAST(u2.c1 AS DOUBLE) / CAST(n_train_tokens AS DOUBLE))
      ELSE 0.0 END) * {LM_FP_SCALE!r}) AS BIGINT) AS p_fp
  FROM pairs p
  LEFT JOIN lm_bic b ON p.pair = b.pair
  LEFT JOIN lm_uni u2 ON split_part(p.pair, ' ', 2) = u2.token
  CROSS JOIN lm_n
),
lm_agg AS (
  SELECT doc_id,
    CAST(SUM(occ) AS BIGINT) AS n_bigrams,
    CAST(SUM(CASE WHEN is_hit THEN occ ELSE 0 END) AS BIGINT) AS n_bigram_hits,
    CAST(SUM(CASE WHEN is_backoff THEN occ ELSE 0 END) AS BIGINT) AS n_unigram_backoff,
    CAST(SUM(CASE WHEN is_oov THEN occ ELSE 0 END) AS BIGINT) AS n_oov,
    CAST(SUM(occ * p_fp) AS BIGINT) AS lm_score_fp
  FROM lm_scored GROUP BY doc_id
)"""

NGRAM_LM_SCORES_SQL = f"""{_LAB_CTE}{_LM_CTE}
SELECT l.doc_id, l.source, l.is_train,
  a.n_bigrams, a.n_bigram_hits, a.n_unigram_backoff, a.n_oov, a.lm_score_fp,
  CASE WHEN a.n_bigrams > 0 THEN
    (CAST(a.lm_score_fp AS DOUBLE) / CAST(a.n_bigrams AS DOUBLE)) / {LM_FP_SCALE!r}
  END AS mean_bigram_prob
FROM lab l JOIN lm_agg a ON l.doc_id = a.doc_id
ORDER BY l.doc_id
"""


# --- 3. DSIR importance resampling -------------------------------------------


def dsir_ratio_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket, ratio_fp): the Laplace-smoothed target/raw likelihood
    ratio per hashed feature bucket, fixed-pointed to an exact BIGINT.
    Raw distribution = the whole corpus's hashed unigram+bigram
    occurrences; target distribution = the quality-seed-positive
    documents' occurrences (DSIR's "target domain" exemplar).

    DENSE over all ``DSIR_BUCKETS`` buckets (exactly 1024 rows): buckets
    the training snapshot never observed still get their Laplace default
    ratio (cnt_t = cnt_r = 0), so the frozen-model serving join
    (:func:`dsir_weight_docs`, and the ``run_curation score`` path over
    a LATER snapshot) can never drop a feature whose bucket was unseen
    at train time — the review finding that motivated densification.
    Broadcast at serving time."""

    def build() -> DataFrame:
        lab = labeled_docs_table(spark, sf_dir)
        # r12 OPTIMIZATION (guide §1.2: remove repeated passes): the
        # hashed feature counts come from the shared qm:dsir_feats
        # substrate instead of re-running the tokenize→explode→md5 pass
        # here (the ratio table, the linear manifest and the log-weight
        # ranking each paid it separately — 3 corpus explodes → 1).
        dfeat = dsir_feats_table(spark, sf_dir)
        rawc = dfeat.groupBy("bucket").agg(F.sum("occ").cast("long").alias("cnt_r"))
        tgtc = (
            dfeat.join(lab.select("doc_id", "seed_hi"), "doc_id")
            .filter(F.col("seed_hi"))
            .groupBy("bucket")
            .agg(F.sum("occ").cast("long").alias("cnt_t"))
        )
        tot_r = rawc.agg(F.sum("cnt_r").cast("long").alias("tot_r"))
        tot_t = tgtc.agg(
            F.coalesce(F.sum("cnt_t"), F.lit(0)).cast("long").alias("tot_t")
        )
        dense = spark.range(DSIR_BUCKETS).select(F.col("id").alias("bucket"))
        joined = (
            dense.join(rawc, "bucket", "left")
            .join(tgtc, "bucket", "left")
            .crossJoin(F.broadcast(tot_r))
            .crossJoin(F.broadcast(tot_t))
        )
        num = (F.coalesce(F.col("cnt_t"), F.lit(0)) + 1).cast("double") * (
            F.col("tot_r") + F.lit(DSIR_BUCKETS)
        ).cast("double")
        den = (F.coalesce(F.col("cnt_r"), F.lit(0)) + 1).cast("double") * (
            F.col("tot_t") + F.lit(DSIR_BUCKETS)
        ).cast("double")
        return joined.select(
            "bucket",
            F.floor((num / den) * F.lit(DSIR_FP_SCALE)).alias("ratio_fp"),
        )

    return session_frame(spark, sf_dir, "qm:dsir_ratios", build)


def _doc_feats(tok_docs: DataFrame) -> DataFrame:
    """(doc_id, bucket, occ): hashed unigram+bigram feature counts for
    ANY (doc_id, tok) frame — the shared DSIR feature expression (one
    tokenize→explode→md5-bucket pass + one hash agg)."""
    feats = tok_docs.select(
        "doc_id",
        F.explode(F.concat(F.col("tok"), ngrams("tok", 2))).alias("feat"),
    ).select("doc_id", hash_bucket(F.col("feat"), DSIR_BUCKETS).alias("bucket"))
    return feats.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("occ")
    )


def dsir_feats_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session substrate ``qm:dsir_feats``: the corpus snapshot's hashed
    feature counts (doc_id, bucket, occ) — the ONE corpus
    tokenize→explode→md5 pass every DSIR artifact rides. r12
    OPTIMIZATION (guide §1.2: remove repeated passes): previously the
    ratio table, the linear resample manifest and the log-weight
    ranking EACH re-ran this explode over the corpus (the md5 bucket
    hash per token+bigram occurrence is the dominant per-row cost);
    now it is computed once per (session, corpus) — the table a
    production pipeline would persist beside the corpus snapshot.

    Cache-footprint note (r12 ADVICE): this is the widest qm-family
    substrate — one row per distinct doc×bucket, i.e. ~min(n_tokens,
    doc_len·2) rows per document vs one row per doc for the score
    tables. At corpora where it would dominate executor storage memory
    and evict sibling substrates (materialized() then re-persists them
    on next touch — thrash), persist it MEMORY_AND_DISK_SER or write it
    beside the snapshot instead of caching; at the test SFs it is a few
    hundred KB and default MEMORY_AND_DISK is right."""
    return session_frame(
        spark,
        sf_dir,
        "qm:dsir_feats",
        lambda: _doc_feats(labeled_docs_table(spark, sf_dir)),
    )


def _dsir_weights_from(dfeat: DataFrame, ratios: DataFrame) -> DataFrame:
    """Linear DSIR weights from a prebuilt (doc_id, bucket, occ) frame."""
    return (
        dfeat.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("occ").cast("long").alias("n_features"),
            F.sum(F.col("occ") * F.col("ratio_fp")).cast("long").alias("weight_fp"),
        )
    )


def dsir_weight_docs(tok_docs: DataFrame, ratios: DataFrame) -> DataFrame:
    """Per-document DSIR importance weights over ANY (doc_id, tok) frame
    against a frozen bucket-ratio table — batch or a streaming
    micro-batch (per-doc independent). Returns (doc_id, n_features,
    weight_fp); weights are exact BIGINT sums."""
    return _dsir_weights_from(_doc_feats(tok_docs), ratios)


def dsir_sample_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session substrate: the full DSIR resample manifest (weights,
    global rank, selection flag), built once per (session, corpus) —
    shared by the registered sampling query and the composed
    model_gate_report (which otherwise re-runs the feature explode and
    the exact-ranker materialization per call)."""

    def build() -> DataFrame:
        from ..operators.ranking import RANK_COL, TOTAL_COL, with_global_rank

        lab = labeled_docs_table(spark, sf_dir)
        # r12: weights from the shared qm:dsir_feats substrate (no
        # re-explode — see dsir_feats_table)
        dw = _dsir_weights_from(
            dsir_feats_table(spark, sf_dir), dsir_ratio_table(spark, sf_dir)
        )
        ranked = with_global_rank(
            lab.select("doc_id", "source", "seed_hi")
            .join(dw, "doc_id")
            .withColumn("_neg_w", -F.col("weight_fp")),
            ["_neg_w", "doc_id"],
        )
        keep_n = F.ceil(F.lit(DSIR_KEEP_SHARE) * F.col(TOTAL_COL))
        return ranked.select(
            "doc_id",
            "source",
            "seed_hi",
            "n_features",
            "weight_fp",
            F.col(RANK_COL).alias("dsir_rank"),
            (F.col(RANK_COL) <= keep_n).alias("selected"),
        )

    return session_frame(spark, sf_dir, "qm:dsir_sample", build)


def dsir_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR sampling plan: per-document importance weight = Σ feature
    occurrences · bucket ratio_fp (exact BIGINT), globally ranked
    (weight desc, doc_id asc) through the scalable exact ranker, keeping
    the top DSIR_KEEP_SHARE of documents. The output is the resample
    manifest a downstream assembly stage consumes — served from the
    session substrate (shared with model_gate_report)."""
    return dsir_sample_table(spark, sf_dir).orderBy("dsir_rank")


_DSIR_CTE = f"""
, dfeat AS (
  SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS occ FROM (
    SELECT doc_id, ({hash_bucket_sql("feat", DSIR_BUCKETS)}) AS bucket
    FROM (SELECT doc_id, unnest(tok || {ngrams_sql("tok", 2)}) AS feat FROM lab)
  ) GROUP BY doc_id, bucket
),
rawc AS (SELECT bucket, CAST(SUM(occ) AS BIGINT) AS cnt_r FROM dfeat GROUP BY bucket),
tgtc AS (
  SELECT bucket, CAST(SUM(occ) AS BIGINT) AS cnt_t
  FROM dfeat d JOIN lab l ON d.doc_id = l.doc_id
  WHERE l.seed_hi GROUP BY bucket
),
tots AS (
  SELECT (SELECT CAST(SUM(cnt_r) AS BIGINT) FROM rawc) AS tot_r,
         (SELECT CAST(COALESCE(SUM(cnt_t), 0) AS BIGINT) FROM tgtc) AS tot_t
),
dense AS (SELECT i AS bucket FROM range({DSIR_BUCKETS}) tt(i)),
ratios AS (
  SELECT d.bucket,
    CAST(FLOOR(((CAST(COALESCE(t.cnt_t, 0) + 1 AS DOUBLE) * CAST(tot_r + {DSIR_BUCKETS} AS DOUBLE))
      / (CAST(COALESCE(r.cnt_r, 0) + 1 AS DOUBLE) * CAST(tot_t + {DSIR_BUCKETS} AS DOUBLE)))
      * {DSIR_FP_SCALE!r}) AS BIGINT) AS ratio_fp
  FROM dense d
  LEFT JOIN rawc r ON d.bucket = r.bucket
  LEFT JOIN tgtc t ON d.bucket = t.bucket
  CROSS JOIN tots
),
dw AS (
  SELECT d.doc_id, CAST(SUM(d.occ) AS BIGINT) AS n_features,
         CAST(SUM(d.occ * ratio_fp) AS BIGINT) AS weight_fp
  FROM dfeat d JOIN ratios USING (bucket) GROUP BY d.doc_id
),
ranked AS (
  SELECT l.doc_id, l.source, l.seed_hi, dw.n_features, dw.weight_fp,
    CAST(ROW_NUMBER() OVER (ORDER BY dw.weight_fp DESC, l.doc_id ASC) AS BIGINT) AS dsir_rank,
    COUNT(*) OVER () AS n_docs
  FROM lab l JOIN dw ON l.doc_id = dw.doc_id
)"""

DSIR_IMPORTANCE_SAMPLE_SQL = f"""{_LAB_CTE}{_DSIR_CTE}
SELECT doc_id, source, seed_hi, n_features, weight_fp, dsir_rank,
       dsir_rank <= CEIL({DSIR_KEEP_SHARE} * n_docs) AS selected
FROM ranked
ORDER BY dsir_rank
"""


# --- composed model-gate report ----------------------------------------------

# Fluency floor for the LM gate: mean bigram probability >= 1e-4,
# expressed as the EXACT integer comparison
#   lm_score_fp >= n_bigrams * LM_GATE_MIN_FP_PER_BIGRAM
# (1e-4 · the 1e12 fixed-point scale) — no doubles anywhere in the gate.
LM_GATE_MIN_FP_PER_BIGRAM = 100_000_000


# Which DSIR ranking serves the gate's third axis: "linear" (the
# registered fast path — fixed-point linear ratio sum, what the oracled
# model_gate_report/disagreement rows pin) or "log" (the paper-fidelity
# Σ occ·ln(ratio) ranking of dsir_log_weights). Identical serving shape
# either way — the swap is which 1024-row broadcast table rides the
# join; the log form is unit-pinned (test_units) rather than re-oracled
# because it would duplicate two heavy registered queries for a
# one-table swap.
DSIR_GATE_FORM = "linear"


def _gate_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_tokens, nb_pass, lm_pass, dsir_pass) for EVERY
    document — the shared serving frame behind model_gate_report and
    model_gate_disagreement. Unscoreable docs fail the affected gate
    (left joins + coalesce-to-false); all three scorers read the qm:*
    session substrates. The DSIR axis serves whichever ranking
    DSIR_GATE_FORM selects."""
    lab = labeled_docs_table(spark, sf_dir)
    nb = nb_scores_table(spark, sf_dir).select("doc_id", "predicted_hi")
    lm = lm_scores_table(spark, sf_dir).select(
        "doc_id", "n_bigrams", "lm_score_fp"
    )
    dsir_plan = (
        dsir_log_weights if DSIR_GATE_FORM == "log" else dsir_importance_sample
    )
    ds = dsir_plan(spark, sf_dir).select("doc_id", "selected")
    lm_pass = (F.col("n_bigrams") > 0) & (
        F.col("lm_score_fp")
        >= F.col("n_bigrams") * F.lit(LM_GATE_MIN_FP_PER_BIGRAM)
    )
    return (
        lab.select("doc_id", "source", "n_tokens")
        .join(nb, "doc_id", "left")
        .join(lm, "doc_id", "left")
        .join(ds, "doc_id", "left")
        .select(
            "source",
            "n_tokens",
            F.coalesce(F.col("predicted_hi"), F.lit(False)).alias("nb_pass"),
            F.coalesce(lm_pass, F.lit(False)).alias("lm_pass"),
            F.coalesce(F.col("selected"), F.lit(False)).alias("dsir_pass"),
        )
    )


def model_gate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone of the model-curation loop: every document served
    through ALL THREE trained gates — NB classifier (predicted_hi),
    n-gram-LM fluency floor (exact fixed-point integer comparison, see
    LM_GATE_MIN_FP_PER_BIGRAM) and DSIR selection — rolled up per
    source: how the trained filters reshape the corpus mix, which is
    what a curation team reviews before pointing the assembly stage at
    the gated corpus. pass-all tokens are the budget actually available
    downstream. Documents too short to score (no tokens → no NB/DSIR
    row; fewer than two tokens → no LM row) stay in the denominator and
    FAIL the affected gate (left joins + coalesce-to-false), so a
    source's pass rate is never computed over a silently smaller doc
    count.

    Scale: three substrate-fed serving passes (each one keyed hash join,
    audited above) + one |sources|-grain rollup; the DSIR global rank is
    the exact ranker. Nothing here rescans the corpus beyond the serving
    joins."""
    j = _gate_flags(spark, sf_dir)
    all_pass = F.col("nb_pass") & F.col("lm_pass") & F.col("dsir_pass")
    g = j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("nb_pass").cast("long")).cast("long").alias("n_nb_pass"),
        F.sum(F.col("lm_pass").cast("long")).cast("long").alias("n_lm_pass"),
        F.sum(F.col("dsir_pass").cast("long")).cast("long").alias("n_dsir_pass"),
        F.sum(all_pass.cast("long")).cast("long").alias("n_pass_all"),
        F.sum(F.when(all_pass, F.col("n_tokens")).otherwise(0))
        .cast("long")
        .alias("n_tokens_pass_all"),
    )
    rate = (
        F.floor(
            F.col("n_pass_all").cast("double")
            / F.col("n_docs").cast("double")
            * 10000
            + F.lit(0.5)
        )
        / 10000
    )
    return g.select(
        "source",
        "n_docs",
        "n_nb_pass",
        "n_lm_pass",
        "n_dsir_pass",
        "n_pass_all",
        "n_tokens_pass_all",
        rate.alias("pass_all_rate"),
    ).orderBy("source")


MODEL_GATE_REPORT_SQL = f"""{_LAB_CTE}{_NB_MODEL_CTE}{_NB_SCORES_CTE}{_LM_CTE}{_DSIR_CTE}
, dsir_sel AS (
  SELECT doc_id, dsir_rank <= CEIL({DSIR_KEEP_SHARE} * n_docs) AS selected
  FROM ranked
),
gates AS (
  SELECT l.source, l.n_tokens,
    COALESCE(nb.predicted_hi, FALSE) AS nb_pass,
    COALESCE(a.n_bigrams > 0
             AND a.lm_score_fp >= a.n_bigrams * {LM_GATE_MIN_FP_PER_BIGRAM},
             FALSE) AS lm_pass,
    COALESCE(d.selected, FALSE) AS dsir_pass
  FROM lab l
  LEFT JOIN nb_scores nb ON nb.doc_id = l.doc_id
  LEFT JOIN lm_agg a ON a.doc_id = l.doc_id
  LEFT JOIN dsir_sel d ON d.doc_id = l.doc_id
)
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN nb_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_nb_pass,
  CAST(SUM(CASE WHEN lm_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_lm_pass,
  CAST(SUM(CASE WHEN dsir_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_dsir_pass,
  CAST(SUM(CASE WHEN nb_pass AND lm_pass AND dsir_pass THEN 1 ELSE 0 END) AS BIGINT)
    AS n_pass_all,
  CAST(SUM(CASE WHEN nb_pass AND lm_pass AND dsir_pass THEN n_tokens ELSE 0 END)
    AS BIGINT) AS n_tokens_pass_all,
  floor(CAST(SUM(CASE WHEN nb_pass AND lm_pass AND dsir_pass THEN 1 ELSE 0 END) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE) * 10000 + 0.5) / 10000 AS pass_all_rate
FROM gates
GROUP BY source
ORDER BY source
"""


def model_gate_disagreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The joint NB×LM×DSIR cell breakdown model_gate_report's marginals
    hide: per (source, nb_pass, lm_pass, dsir_pass) cell, the doc and
    token counts. The disagreement cells (exactly one or two gates
    passing) are where a curation team spends labeling budget — a
    document all three gates agree on teaches nothing, one they split
    on localizes which model is miscalibrated for that source. Same
    serving passes as model_gate_report (the shared _gate_flags frame);
    the rollup key just keeps the gate bits instead of collapsing them.

    Scale: identical to model_gate_report plus a ≤8×|sources|-row
    output; nothing rescans the corpus."""
    return (
        _gate_flags(spark, sf_dir)
        .groupBy("source", "nb_pass", "lm_pass", "dsir_pass")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .withColumn(
            "n_gates_passed",
            (
                F.col("nb_pass").cast("int")
                + F.col("lm_pass").cast("int")
                + F.col("dsir_pass").cast("int")
            ).cast("long"),
        )
        .orderBy("source", "nb_pass", "lm_pass", "dsir_pass")
    )


MODEL_GATE_DISAGREEMENT_SQL = f"""{_LAB_CTE}{_NB_MODEL_CTE}{_NB_SCORES_CTE}{_LM_CTE}{_DSIR_CTE}
, dsir_sel AS (
  SELECT doc_id, dsir_rank <= CEIL({DSIR_KEEP_SHARE} * n_docs) AS selected
  FROM ranked
),
gates AS (
  SELECT l.source, l.n_tokens,
    COALESCE(nb.predicted_hi, FALSE) AS nb_pass,
    COALESCE(a.n_bigrams > 0
             AND a.lm_score_fp >= a.n_bigrams * {LM_GATE_MIN_FP_PER_BIGRAM},
             FALSE) AS lm_pass,
    COALESCE(d.selected, FALSE) AS dsir_pass
  FROM lab l
  LEFT JOIN nb_scores nb ON nb.doc_id = l.doc_id
  LEFT JOIN lm_agg a ON a.doc_id = l.doc_id
  LEFT JOIN dsir_sel d ON d.doc_id = l.doc_id
)
SELECT source, nb_pass, lm_pass, dsir_pass,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
  CAST((CASE WHEN nb_pass THEN 1 ELSE 0 END)
     + (CASE WHEN lm_pass THEN 1 ELSE 0 END)
     + (CASE WHEN dsir_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_gates_passed
FROM gates
GROUP BY source, nb_pass, lm_pass, dsir_pass
ORDER BY source, nb_pass, lm_pass, dsir_pass
"""


# --- classifier calibration sweep --------------------------------------------

# Mean-vote thresholds as exact rationals num/NB_CAL_DEN: a document
# passes iff vote_sum · NB_CAL_DEN > num · n_scored — pure BIGINT
# arithmetic, length-normalized (raw vote_sum scales with doc length).
NB_CAL_DEN = 20
NB_CAL_NUMS = [-10, -5, -2, 0, 2, 5, 10]  # mean-vote cutoffs -0.5 .. 0.5


def nb_calibration_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-calibration curve for the TRAINED classifier, measured on
    the HELD-OUT split only (the honest view — train-split numbers are
    optimistic): for each mean-vote cutoff, how many documents pass and
    the accuracy / precision / recall against the seed label. This is
    the sweep a pipeline runs before committing to a classifier cutoff,
    the model-based sibling of quality_threshold_sweep.

    Exactness: the pass predicate is exact integer arithmetic (see
    NB_CAL_NUMS); each emitted metric is ONE division of exact integer
    counts. All-OOV convention: a held-out doc none of whose tokens were
    scored (n_scored = 0, vote_sum = 0) fails EVERY cutoff including the
    negative ones (``0 > cut_num * 0`` is false) — undefined mean-vote
    deliberately counts as reject-at-all-thresholds, the conservative
    choice for a quality gate, and both engines agree on it. Scale: the
    serving pass runs once; the 7-row grid cross-joins the per-doc score
    frame and collapses by map-side combine — nothing rescans the corpus
    per cutoff."""
    lab = labeled_docs_table(spark, sf_dir)
    sc = nb_scores_table(spark, sf_dir)
    held = (
        lab.select("doc_id", "is_train", "seed_hi")
        .join(sc.select("doc_id", "vote_sum", "n_scored"), "doc_id")
        .filter(~F.col("is_train"))
    )
    grid = spark.createDataFrame([(n,) for n in NB_CAL_NUMS], "cut_num int")
    passed = (
        F.col("vote_sum") * F.lit(NB_CAL_DEN)
        > F.col("cut_num").cast("long") * F.col("n_scored")
    )
    g = (
        held.crossJoin(F.broadcast(grid))
        .groupBy("cut_num")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval_docs"),
            F.sum(passed.cast("long")).cast("long").alias("n_pass"),
            F.sum((passed & F.col("seed_hi")).cast("long"))
            .cast("long")
            .alias("n_true_pass"),
            F.sum(F.col("seed_hi").cast("long")).cast("long").alias("n_seed_hi"),
            F.sum((passed == F.col("seed_hi")).cast("long"))
            .cast("long")
            .alias("n_correct"),
        )
    )
    return g.select(
        (F.col("cut_num").cast("double") / F.lit(float(NB_CAL_DEN))).alias(
            "mean_vote_cutoff"
        ),
        "n_eval_docs",
        "n_pass",
        (F.col("n_correct").cast("double") / F.col("n_eval_docs").cast("double")).alias(
            "accuracy"
        ),
        F.when(
            F.col("n_pass") > 0,
            F.col("n_true_pass").cast("double") / F.col("n_pass").cast("double"),
        ).alias("precision"),
        F.when(
            F.col("n_seed_hi") > 0,
            F.col("n_true_pass").cast("double") / F.col("n_seed_hi").cast("double"),
        ).alias("recall"),
    ).orderBy("mean_vote_cutoff")


_NB_CAL_GRID = ", ".join(str(n) for n in NB_CAL_NUMS)

NB_CALIBRATION_SWEEP_SQL = f"""{_LAB_CTE}{_NB_MODEL_CTE}{_NB_SCORES_CTE}
, held AS (
  SELECT s.doc_id, s.seed_hi, s.vote_sum, s.n_scored
  FROM nb_scores s WHERE NOT s.is_train
),
grid AS (SELECT unnest([{_NB_CAL_GRID}]) AS cut_num),
sw AS (
  SELECT cut_num,
    CAST(COUNT(*) AS BIGINT) AS n_eval_docs,
    CAST(SUM(CASE WHEN vote_sum * {NB_CAL_DEN} > cut_num * n_scored
      THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
    CAST(SUM(CASE WHEN vote_sum * {NB_CAL_DEN} > cut_num * n_scored AND seed_hi
      THEN 1 ELSE 0 END) AS BIGINT) AS n_true_pass,
    CAST(SUM(CASE WHEN seed_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_seed_hi,
    CAST(SUM(CASE WHEN (vote_sum * {NB_CAL_DEN} > cut_num * n_scored) = seed_hi
      THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
  FROM held CROSS JOIN grid
  GROUP BY cut_num
)
SELECT CAST(cut_num AS DOUBLE) / {float(NB_CAL_DEN)!r} AS mean_vote_cutoff,
  n_eval_docs, n_pass,
  CAST(n_correct AS DOUBLE) / CAST(n_eval_docs AS DOUBLE) AS accuracy,
  CASE WHEN n_pass > 0 THEN CAST(n_true_pass AS DOUBLE) / CAST(n_pass AS DOUBLE) END
    AS precision,
  CASE WHEN n_seed_hi > 0 THEN CAST(n_true_pass AS DOUBLE) / CAST(n_seed_hi AS DOUBLE) END
    AS recall
FROM sw
ORDER BY mean_vote_cutoff
"""


# --- 4. CCNet-style perplexity bucketing -------------------------------------

CCNET_BUCKETS = 3  # head / middle / tail (Wenzek et al. 2020)


def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's per-source LM-fluency terciles (Wenzek et al. 2020): rank
    every scored document within its source by the stupid-backoff LM's
    mean bigram probability (descending — most fluent ≈ lowest
    perplexity first; ln is monotone, so probability ordering IS
    perplexity ordering) and split each source into head/middle/tail.
    ``kept`` marks head+middle, CCNet's usual retention rule. Ordering
    is hash-stable: the mean is ONE division of exact integers
    (bit-identical across engines — the same column ngram_lm_scores
    hashes) with doc_id tiebreak.

    Scale shape: the scoring pass is the shared LM substrate serving;
    the per-source rank goes through operators/ranking.with_global_rank
    ordered by (source, -mean, doc_id) — range-repartitioned, NO
    per-source single-task window — then each source's rank rebases by
    its broadcast (min-rank, count) row and NTILE arithmetic assigns
    the tercile (ntile_from_rank matches SQL NTILE exactly)."""
    from ..operators.ranking import (
        RANK_COL,
        ntile_from_rank,
        with_global_rank,
    )

    scores = ngram_lm_scores(spark, sf_dir).select(
        "doc_id",
        "source",
        "n_bigrams",
        "mean_bigram_prob",
        (-F.coalesce(F.col("mean_bigram_prob"), F.lit(-1.0))).alias("_negm"),
    )
    ranked = with_global_rank(scores, ["source", "_negm", "doc_id"])
    src = ranked.groupBy("source").agg(
        F.min(RANK_COL).alias("_base"),
        F.count(F.lit(1)).cast("long").alias("_n_src"),
    )
    srank = F.col(RANK_COL) - F.col("_base") + 1
    b = ntile_from_rank(srank, F.col("_n_src"), CCNET_BUCKETS)
    label = (
        F.when(b == 1, F.lit("head"))
        .when(b == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        ranked.join(F.broadcast(src), "source")
        .select(
            "doc_id",
            "source",
            "n_bigrams",
            "mean_bigram_prob",
            srank.cast("long").alias("source_rank"),
            label.alias("bucket"),
            (b != CCNET_BUCKETS).alias("kept"),
        )
        .orderBy("doc_id")
    )


CCNET_PERPLEXITY_BUCKETS_SQL = f"""{_LAB_CTE}{_LM_CTE},
m AS (
  SELECT l.doc_id, l.source, a.n_bigrams,
    CASE WHEN a.n_bigrams > 0 THEN
      (CAST(a.lm_score_fp AS DOUBLE) / CAST(a.n_bigrams AS DOUBLE))
        / {LM_FP_SCALE!r}
    END AS mean_bigram_prob
  FROM lab l JOIN lm_agg a USING (doc_id)
),
r AS (
  SELECT *,
    ROW_NUMBER() OVER (
      PARTITION BY source
      ORDER BY COALESCE(mean_bigram_prob, -1) DESC, doc_id
    ) AS source_rank,
    NTILE({CCNET_BUCKETS}) OVER (
      PARTITION BY source
      ORDER BY COALESCE(mean_bigram_prob, -1) DESC, doc_id
    ) AS b
  FROM m
)
SELECT doc_id, source, n_bigrams, mean_bigram_prob,
  CAST(source_rank AS BIGINT) AS source_rank,
  CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
  b != {CCNET_BUCKETS} AS kept
FROM r ORDER BY doc_id
"""


# --- 3b. DSIR paper-fidelity log-ratio weights --------------------------------
#
# dsir_importance_sample above keeps the engine's original *linear*
# ratio sum (documented approximation, see the module docstring).
# dsir_log_weights is the paper-fidelity form: per-document weight =
# Σ occ · ln(ratio) exactly as Xie et al. 2023 prescribe, realized
# without either engine ever calling a libm log. The trick (third
# application of the lsh_band_tuning_report pattern): every
# transcendental value is a PYTHON-LITERAL integer constant. The
# data-dependent per-bucket ratio_fp (an exact BIGINT) is mapped to a
# fixed-point ln through a precomputed geometric level table —
# integer boundaries ceil(2^(k/16)) with the level's midpoint ln as a
# fixed-point literal — broadcast-joined on an integer range predicate.
# Both engines therefore compute ONLY integer compares/multiplies/sums:
# bit-stable under any partitioning or aggregation order.
#
# ln quantization: levels are 1/16 of an octave wide, so the looked-up
# ln is within ±ln(2)/32 ≈ ±0.0217 of the true ln(ratio) — a DETERMINED
# rounding (same for both engines and every run), monotone in the ratio.
# Rankings agree with exact-ln DSIR except where two documents' log-sums
# differ by less than the accumulated quantization — the regime where
# exact DSIR's own hashed-feature noise (Xie et al. §3: buckets stand in
# for n-grams) already dominates.

LOG_FP_SCALE = 1_000_000  # ln fixed-point: round(ln(ratio) * 1e6)
_LOG_LEVELS_PER_OCTAVE = 16
_LOG_CLAMP_MAX = (1 << 62) - 1  # ratio_fp clamp; floor() can emit 0 → clamp to 1


def _log_level_table() -> list[tuple[int, int, int]]:
    """[(lo, hi, ln_fp)] geometric levels covering clamped ratio_fp in
    [1, 2^62): integer boundaries ``ceil(2^(k/16))`` (deduped), ln_fp =
    fixed-point ln of the level's geometric midpoint MINUS ln(1e6) —
    i.e. the ln of the RATIO the fixed-point integer encodes. ~990 rows
    of pure Python literals, computed once at import."""
    import math

    bounds: list[int] = []
    k = 0
    while True:
        b = math.ceil(2 ** (k / _LOG_LEVELS_PER_OCTAVE))
        if not bounds or b > bounds[-1]:
            bounds.append(b)
        if b > _LOG_CLAMP_MAX:
            break
        k += 1
    out = []
    for lo, hi in zip(bounds, bounds[1:]):
        ln_mid = 0.5 * (math.log(lo) + math.log(hi)) - math.log(
            DSIR_FP_SCALE
        )
        out.append((lo, hi, round(ln_mid * LOG_FP_SCALE)))
    return out


_LOG_LEVELS = _log_level_table()


def dsir_log_ratio_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket, log_ratio_fp): fixed-point ln of each DSIR bucket's
    Laplace-smoothed likelihood ratio, via the literal level table.
    1024 rows out; the range join is 1024 ratio rows × ~990 broadcast
    level rows — trivial, and NEVER touches corpus-scale data."""
    levels = spark.createDataFrame(
        _LOG_LEVELS, "lo: bigint, hi: bigint, ln_fp: bigint"
    )
    rfp = F.greatest(
        F.least(F.col("ratio_fp"), F.lit(_LOG_CLAMP_MAX)), F.lit(1)
    )
    return (
        dsir_ratio_table(spark, sf_dir)
        .select("bucket", rfp.alias("_rfp"))
        .join(
            F.broadcast(levels),
            (F.col("_rfp") >= F.col("lo")) & (F.col("_rfp") < F.col("hi")),
        )
        .select("bucket", F.col("ln_fp").alias("log_ratio_fp"))
    )


def _dsir_log_weights_from(dfeat: DataFrame, log_ratios: DataFrame) -> DataFrame:
    """Log DSIR weights from a prebuilt (doc_id, bucket, occ) frame."""
    return (
        dfeat.join(F.broadcast(log_ratios), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("occ").cast("long").alias("n_features"),
            F.sum(F.col("occ") * F.col("log_ratio_fp"))
            .cast("long")
            .alias("log_weight_fp"),
        )
    )


def dsir_log_weight_docs(tok_docs: DataFrame, log_ratios: DataFrame) -> DataFrame:
    """Per-document paper-fidelity DSIR log-weights over ANY (doc_id,
    tok) frame against a frozen (bucket, log_ratio_fp) table — batch or
    a streaming micro-batch (per-doc independent). Returns (doc_id,
    n_features, log_weight_fp); weights are exact BIGINT sums (possibly
    negative: ln of a sub-1 ratio)."""
    return _dsir_log_weights_from(_doc_feats(tok_docs), log_ratios)


def dsir_log_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR sampling plan, paper-fidelity ranking (Xie et al. 2023):
    per-document weight = Σ occ · fixed-point ln(bucket ratio), globally
    ranked (log-weight desc, doc_id asc) through the scalable exact
    ranker, keeping the top DSIR_KEEP_SHARE. Identical join shape to
    dsir_importance_sample — the log form swaps ONE broadcast 1024-row
    table; the linear form stays registered as the documented fast path.

    Scale: the corpus-scale passes are the same explode → hash-agg →
    broadcast-join as dsir_weight_docs; the level lookup happens on the
    1024-row ratio table only."""
    from ..operators.ranking import RANK_COL, TOTAL_COL, with_global_rank

    lab = labeled_docs_table(spark, sf_dir)
    # r12: log weights from the shared qm:dsir_feats substrate (no
    # re-explode — see dsir_feats_table)
    dw = _dsir_log_weights_from(
        dsir_feats_table(spark, sf_dir), dsir_log_ratio_table(spark, sf_dir)
    )
    ranked = with_global_rank(
        lab.select("doc_id", "source", "seed_hi")
        .join(dw, "doc_id")
        .withColumn("_neg_w", -F.col("log_weight_fp")),
        ["_neg_w", "doc_id"],
    )
    keep_n = F.ceil(F.lit(DSIR_KEEP_SHARE) * F.col(TOTAL_COL))
    return (
        ranked.select(
            "doc_id",
            "source",
            "seed_hi",
            "n_features",
            "log_weight_fp",
            F.col(RANK_COL).alias("dsir_log_rank"),
            (F.col(RANK_COL) <= keep_n).alias("selected"),
        )
        .orderBy("dsir_log_rank")
    )


def _log_level_values_sql() -> str:
    rows = ", ".join(f"({lo},{hi},{lnfp})" for lo, hi, lnfp in _LOG_LEVELS)
    return (
        "SELECT CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi, "
        f"CAST(ln_fp AS BIGINT) AS ln_fp FROM (VALUES {rows}) t(lo, hi, ln_fp)"
    )


DSIR_LOG_WEIGHTS_SQL = f"""{_LAB_CTE}{_DSIR_CTE},
lvl AS ({_log_level_values_sql()}),
lratios AS (
  SELECT bucket, l.ln_fp AS log_ratio_fp
  FROM ratios r JOIN lvl l
    ON GREATEST(LEAST(r.ratio_fp, {_LOG_CLAMP_MAX}), 1) >= l.lo
   AND GREATEST(LEAST(r.ratio_fp, {_LOG_CLAMP_MAX}), 1) < l.hi
),
ldw AS (
  SELECT d.doc_id, CAST(SUM(d.occ) AS BIGINT) AS n_features,
         CAST(SUM(d.occ * log_ratio_fp) AS BIGINT) AS log_weight_fp
  FROM dfeat d JOIN lratios USING (bucket) GROUP BY d.doc_id
),
lranked AS (
  SELECT l.doc_id, l.source, l.seed_hi, w.n_features, w.log_weight_fp,
    CAST(ROW_NUMBER() OVER (ORDER BY w.log_weight_fp DESC, l.doc_id ASC) AS BIGINT)
      AS dsir_log_rank,
    COUNT(*) OVER () AS n_docs
  FROM lab l JOIN ldw w ON l.doc_id = w.doc_id
)
SELECT doc_id, source, seed_hi, n_features, log_weight_fp, dsir_log_rank,
       dsir_log_rank <= CEIL({DSIR_KEEP_SHARE} * n_docs) AS selected
FROM lranked ORDER BY dsir_log_rank
"""


# --- 4. DoReMi-style domain reweighting ---------------------------------------
#
# DoReMi (Xie et al. 2023, "Doremi: Optimizing Data Mixtures Speeds Up
# Language Model Pretraining") computes domain mixture weights by
# upweighting domains with high EXCESS LOSS under a proxy model via
# multiplicative weights: alpha_i ∝ baseline_share_i · exp(eta ·
# excess_i). The engine's deterministic instantiation ("DoReMi-lite"):
# the proxy is the already-trained stupid-backoff LM; a domain's loss
# proxy is its mean bigram probability shortfall vs the corpus mean
# (harder domain ⇒ lower mean probability ⇒ positive excess ⇒
# upweighted — the paper's direction); one multiplicative-weights round
# from the baseline token shares, eta = 1 on the probability scale.
# exp() is engine-unstable, so — the ln-table trick in reverse
# (dsir_log_weights §3b) — exp comes from a PYTHON-LITERAL 256-level
# linear table over the clamped excess range: integer boundaries,
# midpoint exp as a fixed-point literal, broadcast range-join. Both
# engines do only integer compares/multiplies/sums + ONE final
# division of two exact BIGINTs per domain.

DOREMI_EXP_FP_SCALE = 1_000_000  # exp fixed point: round(exp(x) * 1e6)
_DOREMI_EXP_LEVELS_PER_OCTAVE = 16
# excess is measured in LM rate units (floor(mean_prob * LM_FP_SCALE));
# the full possible range is [-LM_FP_SCALE, LM_FP_SCALE] = exp arg in
# [-1, 1] at eta = 1
_DOREMI_CLAMP = int(LM_FP_SCALE)


def _exp_level_table() -> list[tuple[int, int, int]]:
    """[(lo, hi, exp_fp)] SYMMETRIC GEOMETRIC levels covering clamped
    excess_fp in [-CLAMP, CLAMP): boundary magnitudes ceil(1e6 ·
    2^(j/16)) mirrored around a [-1e6, 1e6) center level, exp_fp =
    fixed-point exp(level midpoint / CLAMP). Geometric spacing makes
    the exp-argument quantization PROPORTIONAL to |excess| (≈ ±2.2% of
    the argument; ±1e-6 absolute at the center), so close-to-corpus-mean
    domains still get distinct weights — a uniform grid wasted its
    resolution on the rarely-hit extremes. ~640 rows of Python
    literals, identical in both engines."""
    import math

    mags = [_DOREMI_CLAMP // 1_000_000]  # center half-width: 1e-6 of the arg range
    while mags[-1] < _DOREMI_CLAMP:
        nxt = math.ceil(mags[-1] * 2 ** (1 / _DOREMI_EXP_LEVELS_PER_OCTAVE))
        mags.append(min(_DOREMI_CLAMP, nxt))
    bounds = [-m for m in reversed(mags)] + mags
    out = []
    for lo, hi in zip(bounds, bounds[1:]):
        mid = (lo + hi) / 2 / _DOREMI_CLAMP
        out.append((lo, hi, round(math.exp(mid) * DOREMI_EXP_FP_SCALE)))
    return out


_EXP_LEVELS = _exp_level_table()


def _doremi_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Internal per-source weighted frame behind both DoReMi queries:
    one row per source carrying the EXACT integer substrate of the
    posterior — (source, n_docs, n_tokens, domain_rate_fp, excess_fp,
    exp_w_fp, _w, _tot_w) where _w = n_tokens·exp_w_fp and _tot_w =
    Σ_w, both DECIMAL(38,0) so the products survive 100 TB token
    counts. ``doremi_domain_weights`` divides once for the published
    weight; ``doremi_mixture_sample`` turns the same integers into
    per-source keep rates without ever touching the double."""
    levels = spark.createDataFrame(
        _EXP_LEVELS, "lo: bigint, hi: bigint, exp_fp: bigint"
    )
    lab = labeled_docs_table(spark, sf_dir)
    lm = lm_scores_table(spark, sf_dir).select(
        "doc_id", "n_bigrams", "lm_score_fp"
    )
    src = lab.select("doc_id", "source", "n_tokens").join(lm, "doc_id", "left")
    dom = src.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum(F.coalesce("n_bigrams", F.lit(0))).cast("long").alias("_sum_big"),
        F.sum(F.coalesce("lm_score_fp", F.lit(0)))
        .cast("long")
        .alias("_sum_fp"),
    )
    corp = dom.agg(
        F.expr("CAST(sum(_sum_fp) div sum(_sum_big) AS BIGINT)").alias(
            "_corpus_rate_fp"
        )
    )
    rate = F.when(
        F.col("_sum_big") > 0, F.expr("_sum_fp div _sum_big")
    ).otherwise(F.lit(0))
    ex = (
        dom.crossJoin(F.broadcast(corp))
        .withColumn("domain_rate_fp", rate.cast("long"))
        .withColumn(
            "excess_fp",
            (F.col("_corpus_rate_fp") - F.col("domain_rate_fp")).cast("long"),
        )
    )
    clamped = F.greatest(
        F.least(F.col("excess_fp"), F.lit(_DOREMI_CLAMP - 1)),
        F.lit(-_DOREMI_CLAMP),
    )
    wtd = (
        ex.withColumn("_cl", clamped)
        .join(
            F.broadcast(levels),
            (F.col("_cl") >= F.col("lo")) & (F.col("_cl") < F.col("hi")),
        )
        .withColumn("exp_w_fp", F.col("exp_fp").cast("long"))
        # n_tokens*exp_fp can exceed int64 at 100 TB scale (~1e13 tokens x
        # exp_fp up to ~2.7e6): fold the products and their sum through
        # DECIMAL(38,0) — the same exactness pattern the dot products use —
        # before the single final double division.
        .withColumn(
            "_w",
            F.col("n_tokens").cast("decimal(38,0)") * F.col("exp_w_fp"),
        )
    )
    tot = wtd.agg(F.sum("_w").cast("decimal(38,0)").alias("_tot_w"))
    return wtd.crossJoin(F.broadcast(tot))


def doremi_domain_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source DoReMi-lite mixture weights: (source, n_docs,
    n_tokens, domain_rate_fp, excess_fp, exp_w_fp, doremi_weight) —
    domain_rate_fp = integer-division mean bigram probability (LM fixed
    point) over ALL the domain's bigrams, excess_fp = corpus rate −
    domain rate, exp_w_fp = the literal-table exp of the clamped
    excess, doremi_weight = n_tokens·exp_w_fp normalized over domains
    (the multiplicative-weights posterior a mixture_plan consumes
    instead of hand-set target shares).

    Documents too short to score (no bigrams) contribute 0 to the
    domain's sums but their tokens still count in the baseline share —
    a domain of unscorable docs gets rate 0 (hardest), matching the
    fail-closed convention of model_gate_report.

    Scale shape: one LM serving pass (keyed hash join against the
    vocabulary-bounded model substrates), one |sources|-grain rollup,
    then literal-table lookups on |sources| rows. Nothing beyond the
    serving join touches corpus-scale data."""
    return (
        _doremi_weighted(spark, sf_dir)
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "domain_rate_fp",
            "excess_fp",
            "exp_w_fp",
            (F.col("_w").cast("double") / F.col("_tot_w").cast("double")).alias(
                "doremi_weight"
            ),
        )
        .orderBy("source")
    )


def _exp_level_values_sql() -> str:
    rows = ", ".join(f"({lo},{hi},{ef})" for lo, hi, ef in _EXP_LEVELS)
    return (
        "SELECT CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi, "
        f"CAST(exp_fp AS BIGINT) AS exp_fp FROM (VALUES {rows}) t(lo, hi, exp_fp)"
    )


# The shared doremi CTE chain (through the decimal-weighted wtd/dtot
# frames) — composed by both DOREMI_DOMAIN_WEIGHTS_SQL and
# DOREMI_MIXTURE_SAMPLE_SQL, mirroring _doremi_weighted on the Spark
# side.
_DOREMI_WTD_CTE = f""",
dsrc AS (
  SELECT l.source, l.n_tokens,
         COALESCE(a.n_bigrams, 0) AS n_bigrams,
         COALESCE(a.lm_score_fp, 0) AS lm_score_fp
  FROM lab l LEFT JOIN lm_agg a ON a.doc_id = l.doc_id
),
dom AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
    CAST(SUM(n_bigrams) AS BIGINT) AS sum_big,
    CAST(SUM(lm_score_fp) AS BIGINT) AS sum_fp
  FROM dsrc GROUP BY source
),
corp AS (
  SELECT CAST(CAST(SUM(sum_fp) AS BIGINT) // CAST(SUM(sum_big) AS BIGINT)
              AS BIGINT) AS corpus_rate_fp
  FROM dom
),
ex AS (
  SELECT d.*, corpus_rate_fp,
    CAST(CASE WHEN sum_big > 0 THEN sum_fp // sum_big ELSE 0 END AS BIGINT)
      AS domain_rate_fp
  FROM dom d CROSS JOIN corp
),
lvl AS ({_exp_level_values_sql()}),
wtd AS (
  SELECT e.source, e.n_docs, e.n_tokens, e.domain_rate_fp,
    CAST(e.corpus_rate_fp - e.domain_rate_fp AS BIGINT) AS excess_fp,
    l.exp_fp AS exp_w_fp,
    CAST(e.n_tokens AS DECIMAL(38,0)) * l.exp_fp AS w
  FROM ex e JOIN lvl l
    ON GREATEST(LEAST(e.corpus_rate_fp - e.domain_rate_fp,
                      {_DOREMI_CLAMP - 1}), {-_DOREMI_CLAMP}) >= l.lo
   AND GREATEST(LEAST(e.corpus_rate_fp - e.domain_rate_fp,
                      {_DOREMI_CLAMP - 1}), {-_DOREMI_CLAMP}) < l.hi
),
dtot AS (SELECT CAST(SUM(w) AS DECIMAL(38,0)) AS tot_w FROM wtd)"""

DOREMI_DOMAIN_WEIGHTS_SQL = f"""{_LAB_CTE}{_LM_CTE}{_DOREMI_WTD_CTE}
SELECT source, n_docs, n_tokens, domain_rate_fp, excess_fp, exp_w_fp,
  CAST(w AS DOUBLE) / CAST(tot_w AS DOUBLE) AS doremi_weight
FROM wtd CROSS JOIN dtot ORDER BY source
"""


# --- DoReMi posterior → deterministic document draw ---------------------------
#
# Closes the measure→decide→assemble loop for the data-derived mixture
# planner: where plans/packing.mixture_sample draws per-LANGUAGE documents
# from the HAND-SET MIXTURE_RATES map, this draws per-SOURCE documents at
# rates derived from doremi_domain_weights' posterior — same salted-md5
# bucket gate (reproducible under any partitioning/cluster size; a new
# doc never flips an old doc's keep decision), rates computed in exact
# integer arithmetic from the planner's own BIGINT/DECIMAL substrate so
# the draw is hash-identical on both engines.

DOREMI_BUDGET_NUM = 1  # sample budget = corpus tokens × NUM/DEN
DOREMI_BUDGET_DEN = 2
_DMIX_SALT = "dmix:"
_DMIX_BUCKETS = 10_000


def doremi_sample_rates_from(weights: DataFrame) -> DataFrame:
    """Per-source fixed-point keep rates (source, n_tokens, rate_fp in
    0..10000) from a DoReMi planner frame. Needs only the EXACT integer
    columns (source, n_tokens, exp_w_fp) — all present in the WRITTEN
    ``doremi_weights`` artifact (cli/run_curation.py mix), so the CLI
    manifest and the inline query share this derivation verbatim:

        w_s       = n_tokens_s · exp_w_fp_s          (DECIMAL(38,0))
        budget    = Σ n_tokens × NUM div DEN          (BIGINT)
        target_s  = (budget · w_s) div Σ w            (BIGINT)
        rate_fp_s = min(10000, target_s·10000 div max(n_tokens_s, 1))

    so the expected kept-token mass per source matches the posterior's
    share of the budget, saturating at keep-everything. All floor
    divisions of non-negative integers — engine-neutral."""
    w = weights.select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        (
            F.col("n_tokens").cast("decimal(38,0)") * F.col("exp_w_fp")
        ).alias("_w"),
    )
    tot = w.agg(
        F.sum("_w").cast("decimal(38,0)").alias("_tot_w"),
        F.expr(
            f"CAST(sum(n_tokens) * {DOREMI_BUDGET_NUM} div "
            f"{DOREMI_BUDGET_DEN} AS BIGINT)"
        ).alias("_budget"),
    )
    target = F.expr(
        "CAST((CAST(_budget AS DECIMAL(38,0)) * _w) div _tot_w AS BIGINT)"
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .withColumn("_target", target)
        .select(
            "source",
            "n_tokens",
            F.least(
                F.lit(_DMIX_BUCKETS),
                F.expr(
                    f"CAST((_target * {_DMIX_BUCKETS}) div "
                    "greatest(n_tokens, 1) AS BIGINT)"
                ),
            )
            .cast("long")
            .alias("rate_fp"),
        )
    )


def doremi_mixture_sample_from(docs: DataFrame, weights: DataFrame) -> DataFrame:
    """Apply the DoReMi-derived rates to a document frame: keep a doc iff
    its salted md5 bucket (0..9999) falls under its source's rate_fp.
    ``docs`` needs (doc_id, source); ``weights`` is a planner frame per
    :func:`doremi_sample_rates_from`. One broadcast join (|sources|
    rows) over a pure map stage — no shuffle on corpus data, linear
    scan, same scale shape as packing.mixture_sample."""
    from .packing import _mix_bucket_spark

    rates = doremi_sample_rates_from(weights)
    bucket = _mix_bucket_spark(F.col("doc_id"), _DMIX_SALT)
    return (
        docs.select("doc_id", "source", bucket.alias("mix_bucket"))
        .join(F.broadcast(rates.select("source", "rate_fp")), "source")
        .filter(F.col("mix_bucket") < F.col("rate_fp"))
        .select(
            "doc_id",
            "source",
            "mix_bucket",
            "rate_fp",
            (
                F.lit(float(_DMIX_BUCKETS)) / F.col("rate_fp").cast("double")
            ).alias("sample_weight"),
        )
        .orderBy("doc_id")
    )


def doremi_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: the deterministic per-source document draw under
    the data-derived DoReMi posterior — (doc_id, source, mix_bucket,
    rate_fp, sample_weight). The planner grid (doremi_domain_weights) is
    an INPUT here, not a leaf: this is the same consumption path
    mixture_sample provides for the hand-set plan, so the
    measure→decide→assemble loop is closed for the multiplicative-
    weights planner. sample_weight = 10000/rate_fp (Horvitz-Thompson,
    one division)."""
    docs = load_table(spark, sf_dir, "documents")
    return doremi_mixture_sample_from(docs, _doremi_weighted(spark, sf_dir))


def _dmix_bucket_sql() -> str:
    from .packing import _mix_bucket_sql

    return _mix_bucket_sql(_DMIX_SALT)


DOREMI_MIXTURE_SAMPLE_SQL = f"""{_LAB_CTE}{_LM_CTE}{_DOREMI_WTD_CTE},
bud AS (
  SELECT CAST(SUM(n_tokens) * {DOREMI_BUDGET_NUM} // {DOREMI_BUDGET_DEN}
              AS BIGINT) AS budget
  FROM wtd
),
rates AS (
  SELECT w.source,
    CAST(LEAST({_DMIX_BUCKETS},
      (CAST((CAST(b.budget AS HUGEINT) * CAST(w.w AS HUGEINT))
            // CAST(d.tot_w AS HUGEINT) AS BIGINT) * {_DMIX_BUCKETS})
        // GREATEST(w.n_tokens, 1)) AS BIGINT) AS rate_fp
  FROM wtd w CROSS JOIN dtot d CROSS JOIN bud b
)
SELECT doc_id, source, mix_bucket, rate_fp,
  CAST({_DMIX_BUCKETS} AS DOUBLE) / CAST(rate_fp AS DOUBLE) AS sample_weight
FROM (
  SELECT doc_id, source, CAST({{DMIX_BUCKET}} AS BIGINT) AS mix_bucket
  FROM documents
) d JOIN rates USING (source)
WHERE mix_bucket < rate_fp
ORDER BY doc_id
"""

# late-bound to keep the packing import function-local (same pattern as
# _dmix_bucket_sql itself)
DOREMI_MIXTURE_SAMPLE_SQL = DOREMI_MIXTURE_SAMPLE_SQL.replace(
    "{DMIX_BUCKET}", _dmix_bucket_sql()
)
