"""Sequence packing and deterministic mixture sampling over the
``documents`` table — the two remaining corpus-assembly steps between a
cleaned corpus (plans/corpus_prep.py) and a training run.

- **Sequence packing**: assign documents, in a deterministic total
  order, to fixed token-budget training sequences ("packs"). The
  assignment is a pure function of the exclusive global prefix sum of
  token counts: ``pack_id = floor(prefix / BUDGET)`` — document-level
  next-fit where a doc that straddles a boundary belongs to the pack it
  starts in (the downstream loader truncates/continues; the engine's job
  is the deterministic, partitioning-independent assignment). The prefix
  sum uses operators/ranking.py's range-repartition + triangular-offset
  machinery, so there is NO unpartitioned window even at 10^9 docs; the
  DuckDB oracle uses the plain ordered-window form, which is
  bit-identical on integral token counts.

- **Mixture sampling**: per-language sampling rates applied via a
  salted md5 bucket (same engine-neutral construction as
  corpus_prep.split_bucket, different salt so the sample is independent
  of the train/val/test split). Hash-gated sampling is reproducible
  under any partitioning and any cluster size — ``df.sample()``'s
  seeded Bernoulli is partitioning-dependent and cannot be
  oracle-checked. Each kept row carries ``sample_weight = 1/rate`` so
  downstream token counts stay unbiased (Horvitz-Thompson).

Reference parity: the reference (a clickstream pipeline) has no corpus
assembly stage; these are "beyond the reference" LLM-pipeline operators
per the build brief, sharing the tokenizer with plans/text_analysis.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens, tokens_sql
from ..operators.ranking import PREFIX_COL, with_global_prefix_sum
from ..plans.corpus_prep import _HEX
from ..sources.tables import load_table

# token budget per training sequence (4k-context run with headroom)
PACK_BUDGET = 2048

# per-language mixture rates (languages absent from the map are dropped —
# rate 0.0 — which is itself a mixture decision, kept explicit here)
MIXTURE_RATES: dict[str, float] = {
    "en": 1.0,
    "zh": 0.50,
    "es": 0.40,
    "de": 0.30,
    "fr": 0.20,
}
_MIX_SALT = "mix:"


# --- sequence packing -------------------------------------------------------


def _doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens")
    )


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document pack assignment: (doc_id, n_tokens, start_offset,
    pack_id, offset_in_pack), ordered by doc_id. start_offset is the
    exclusive prefix sum of tokens in doc_id order; a doc starting at
    offset o lands in pack floor(o / BUDGET) at in-pack offset
    o mod BUDGET."""
    t = _doc_tokens(spark, sf_dir)
    pref = with_global_prefix_sum(t, ["doc_id"], "n_tokens")
    return pref.select(
        "doc_id",
        "n_tokens",
        F.col(PREFIX_COL).alias("start_offset"),
        F.floor(F.col(PREFIX_COL) / PACK_BUDGET).cast("long").alias("pack_id"),
        (F.col(PREFIX_COL) % PACK_BUDGET).cast("long").alias("offset_in_pack"),
    ).orderBy("doc_id")


_PACKING_BASE_SQL = f"""
  SELECT doc_id, n_tokens,
    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_offset
  FROM (SELECT doc_id, len({tokens_sql()}) AS n_tokens FROM documents)
"""

SEQUENCE_PACKING_SQL = f"""
SELECT doc_id, n_tokens, start_offset,
  CAST(FLOOR(start_offset / {PACK_BUDGET}) AS BIGINT) AS pack_id,
  start_offset % {PACK_BUDGET} AS offset_in_pack
FROM ({_PACKING_BASE_SQL})
ORDER BY doc_id
"""


def packing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pack rollup of the assignment above: how many docs start in
    each pack, their token mass, and the fill ratio of the budget
    (straddling docs overflow into the next pack, so fill can exceed 1
    for the pack they start in — the loader-side truncation signal)."""
    t = _doc_tokens(spark, sf_dir)
    pref = with_global_prefix_sum(t, ["doc_id"], "n_tokens")
    pack = F.floor(F.col(PREFIX_COL) / PACK_BUDGET).cast("long")
    return (
        pref.select(
            pack.alias("pack_id"),
            "doc_id",
            "n_tokens",
            F.col(PREFIX_COL).alias("start_offset"),
        )
        .groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
        .select(
            "pack_id",
            "n_docs",
            "pack_tokens",
            "first_doc_id",
            "last_doc_id",
            (F.col("pack_tokens").cast("double") / PACK_BUDGET).alias(
                "fill_ratio"
            ),
        )
        .orderBy("pack_id")
    )


PACKING_SUMMARY_SQL = f"""
SELECT CAST(FLOOR(start_offset / {PACK_BUDGET}) AS BIGINT) AS pack_id,
  COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
  MIN(doc_id) AS first_doc_id,
  MAX(doc_id) AS last_doc_id,
  CAST(SUM(n_tokens) AS DOUBLE) / {PACK_BUDGET} AS fill_ratio
FROM ({_PACKING_BASE_SQL})
GROUP BY 1
ORDER BY pack_id
"""


# --- mixture sampling -------------------------------------------------------


def _mix_bucket_spark(doc_id: Column, salt: str = _MIX_SALT) -> Column:
    h = F.md5(F.concat(F.lit(salt), doc_id.cast("string")))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % 10_000


def _mix_bucket_sql(salt: str = _MIX_SALT) -> str:
    h = f"md5('{salt}' || CAST(doc_id AS VARCHAR))"
    digit = "(strpos('{hex}', substr({h},{i},1)) - 1)"
    terms = " + ".join(
        digit.format(hex=_HEX, h=h, i=i + 1) + f" * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"(({terms}) % 10000)"


def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language downsampling: keep a doc iff its salted
    md5 bucket (0..9999) falls under rate*10000 for its language. Pure
    map stage — no shuffle, linear scan, stable under corpus growth (a
    new doc never flips an old doc's keep decision)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = _mix_bucket_spark(F.col("doc_id"))
    rate = F.lit(None).cast("double")
    for lang, r in sorted(MIXTURE_RATES.items()):
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    out = docs.select(
        "doc_id",
        "lang",
        bucket.alias("mix_bucket"),
        F.coalesce(rate, F.lit(0.0)).alias("rate"),
    ).filter(F.col("mix_bucket") < F.col("rate") * 10_000)
    return out.select(
        "doc_id",
        "lang",
        "mix_bucket",
        "rate",
        (F.lit(1.0) / F.col("rate")).alias("sample_weight"),
    ).orderBy("doc_id")


_RATE_CASE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN lang = '{lang}' THEN {r!r}"
        for lang, r in sorted(MIXTURE_RATES.items())
    )
    + " ELSE 0.0 END"
)

MIXTURE_SAMPLE_SQL = f"""
SELECT doc_id, lang, mix_bucket, rate, 1.0 / rate AS sample_weight
FROM (
  SELECT doc_id, lang,
    CAST({_mix_bucket_sql()} AS BIGINT) AS mix_bucket,
    {_RATE_CASE_SQL} AS rate
  FROM documents
)
WHERE mix_bucket < rate * 10000
ORDER BY doc_id
"""


# --- document chunking ------------------------------------------------------

# fixed-size character chunks with overlap (RAG / embedding prep)
CHUNK_SIZE = 400
CHUNK_OVERLAP = 80
_STRIDE = CHUNK_SIZE - CHUNK_OVERLAP


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode each document into overlapping fixed-size character
    chunks (size 400, stride 320): (doc_id, chunk_idx, chunk_start,
    chunk_len, chunk_hash). Chunk count is integer-exact on both
    engines: greatest(1, ceil((len - overlap) / stride)) via int
    arithmetic. One narrow map + explode — no shuffle but the output
    order; chunk text is carried as md5 so the oracle checks exact
    content without hashing megabytes of repeated substrings."""
    docs = load_table(spark, sf_dir, "documents")
    ln = F.length("text")
    n_chunks = F.greatest(
        F.lit(1),
        F.floor((ln - CHUNK_OVERLAP + _STRIDE - 1) / F.lit(_STRIDE)),
    ).cast("int")
    c = docs.select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = (F.col("chunk_idx") * _STRIDE + 1).cast("int")
    chunk = F.col("text").substr(start, F.lit(CHUNK_SIZE))
    return c.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        start.cast("long").alias("chunk_start"),
        F.length(chunk).cast("long").alias("chunk_len"),
        F.md5(chunk).alias("chunk_hash"),
    ).orderBy("doc_id", "chunk_idx")


CHUNK_DOCUMENTS_SQL = f"""
WITH n AS (
  SELECT doc_id, text,
    GREATEST(1, (length(text) - {CHUNK_OVERLAP} + {_STRIDE} - 1) // {_STRIDE})
      AS n_chunks
  FROM documents
),
c AS (
  SELECT doc_id, text, CAST(gs.i AS BIGINT) AS chunk_idx
  FROM n CROSS JOIN LATERAL unnest(generate_series(0, n_chunks - 1)) AS gs(i)
)
SELECT doc_id, chunk_idx,
  chunk_idx * {_STRIDE} + 1 AS chunk_start,
  CAST(length(substr(text, CAST(chunk_idx * {_STRIDE} + 1 AS INT), {CHUNK_SIZE}))
       AS BIGINT) AS chunk_len,
  md5(substr(text, CAST(chunk_idx * {_STRIDE} + 1 AS INT), {CHUNK_SIZE}))
    AS chunk_hash
FROM c
ORDER BY doc_id, chunk_idx
"""


# --- balanced per-key sampling ----------------------------------------------

SAMPLE_K = 5
_BS_SALT = "bs:"


def balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic K-docs-per-source sample (eval-set construction):
    rank docs within each source by a salted md5 and keep the first K.
    One shuffle on source; equivalent to per-key reservoir sampling but
    reproducible on any engine/partitioning."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit(_BS_SALT), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "source", F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= SAMPLE_K)
        .orderBy("source", "sample_rank")
    )


BALANCED_SAMPLE_SQL = f"""
SELECT doc_id, source, sample_rank
FROM (
  SELECT doc_id, source,
    ROW_NUMBER() OVER (
      PARTITION BY source
      ORDER BY md5('{_BS_SALT}' || CAST(doc_id AS VARCHAR)), doc_id
    ) AS sample_rank
  FROM documents
)
WHERE sample_rank <= {SAMPLE_K}
ORDER BY source, sample_rank
"""


# --- cross-document span dedup ----------------------------------------------

# Minimum chunk length for a shared-span match to count. Overlapping-chunk
# hashing approximates suffix-array substring dedup (Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better") at chunk
# granularity; unfiltered short tail chunks (a few chars) would match
# trivially across documents and inflate the signal.
SPAN_MIN_LEN = 100
SPAN_HEAVY_TAU = 0.5


def span_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: how much of it is copy-pasted from elsewhere in the
    corpus — the fraction of its (overlapping, fixed-stride) chunks whose
    exact content also occurs in at least one OTHER document, plus a
    boilerplate-heavy flag at SPAN_HEAVY_TAU.

    Scale shape: one map+explode to chunk hashes, one hash-keyed
    aggregation for distinct-doc counts (map-side combined), one join
    back, one per-doc rollup — all shuffles on narrow (hash | doc_id)
    keys. The chunk-hash frame is the same one chunk_documents emits, so
    a materialized chunk table can serve both queries at corpus scale."""
    chunks = chunk_documents(spark, sf_dir).select(
        "doc_id", "chunk_len", "chunk_hash"
    )
    hash_docs = chunks.groupBy("chunk_hash").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    flagged = chunks.join(hash_docs, "chunk_hash").withColumn(
        "shared",
        (F.col("n_docs") >= 2) & (F.col("chunk_len") >= SPAN_MIN_LEN),
    )
    ratio = F.col("n_shared_chunks") / F.col("n_chunks")
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.col("shared").cast("long")).alias("n_shared_chunks"),
        )
        .select(
            "doc_id",
            F.col("n_chunks").cast("long").alias("n_chunks"),
            F.col("n_shared_chunks").cast("long").alias("n_shared_chunks"),
            ratio.alias("shared_ratio"),
            (ratio >= SPAN_HEAVY_TAU).alias("is_boilerplate_heavy"),
        )
        .orderBy("doc_id")
    )


SPAN_DEDUP_STATS_SQL = f"""
WITH n AS (
  SELECT doc_id, text,
    GREATEST(1, (length(text) - {CHUNK_OVERLAP} + {_STRIDE} - 1) // {_STRIDE})
      AS n_chunks
  FROM documents
),
c AS (
  SELECT doc_id, text, CAST(gs.i AS BIGINT) AS chunk_idx
  FROM n CROSS JOIN LATERAL unnest(generate_series(0, n_chunks - 1)) AS gs(i)
),
ch AS (
  SELECT doc_id,
    CAST(length(substr(text, CAST(chunk_idx * {_STRIDE} + 1 AS INT), {CHUNK_SIZE}))
         AS BIGINT) AS chunk_len,
    md5(substr(text, CAST(chunk_idx * {_STRIDE} + 1 AS INT), {CHUNK_SIZE}))
      AS chunk_hash
  FROM c
),
hd AS (
  SELECT chunk_hash, COUNT(DISTINCT doc_id) AS n_docs FROM ch GROUP BY chunk_hash
)
SELECT ch.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_chunks,
  CAST(SUM(CASE WHEN hd.n_docs >= 2 AND ch.chunk_len >= {SPAN_MIN_LEN}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_chunks,
  CAST(SUM(CASE WHEN hd.n_docs >= 2 AND ch.chunk_len >= {SPAN_MIN_LEN}
                THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS shared_ratio,
  (CAST(SUM(CASE WHEN hd.n_docs >= 2 AND ch.chunk_len >= {SPAN_MIN_LEN}
                 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)) >= {SPAN_HEAVY_TAU}
    AS is_boilerplate_heavy
FROM ch JOIN hd ON ch.chunk_hash = hd.chunk_hash
GROUP BY ch.doc_id
ORDER BY ch.doc_id
"""


# --- corpus filter funnel ----------------------------------------------------

# top-word share above this flags degenerate repetition (Gopher-style gate)
FUNNEL_TOP_WORD_MAX = 0.2

_FUNNEL_GATES = [
    "length",          # word count outside [MIN_WORDS, MAX_WORDS]
    "distinct_ratio",  # distinct-word ratio <= MIN_DISTINCT_RATIO
    "top_word",        # most-frequent-word share > FUNNEL_TOP_WORD_MAX
    "lang",            # language outside the known set
    "boilerplate",     # cross-document shared-span ratio >= SPAN_HEAVY_TAU
    "kept",
]


def funnel_doc_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality-gate verdict (doc_id, gate): the FIRST gate
    each document fails (length → distinct_ratio → top_word → lang →
    boilerplate), or 'kept'. Frame-level core shared by
    :func:`filter_funnel_report` (which rolls it up per gate) and
    ``cli/run_corpus.py`` (which keeps the 'kept' rows).

    One tokenize pass feeds the word gates; the top-word share is the
    explode + two-level aggregation of doc_repetition_stats; the
    boilerplate share joins the chunk-hash rollup. The wide work is
    three hash-keyed aggregations at any corpus size."""
    from ..functions.text import LANG_STOPWORDS
    from .corpus_prep import MAX_WORDS, MIN_DISTINCT_RATIO, MIN_WORDS

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "lang", tokens(F.col("text")).alias("tok"))
    base = t.select(
        "doc_id",
        "lang",
        F.size("tok").alias("n_words"),
        F.size(F.array_distinct("tok")).alias("n_distinct"),
    )
    top_word = (
        t.select("doc_id", F.explode("tok").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_word_count"))
    )
    spans = span_dedup_stats(spark, sf_dir).select("doc_id", "shared_ratio")
    known_langs = sorted(LANG_STOPWORDS)
    joined = (
        base.join(top_word, "doc_id", "left")
        .join(spans, "doc_id", "left")
        .select(
            "doc_id",
            F.when(
                ~F.col("n_words").between(MIN_WORDS, MAX_WORDS), F.lit("length")
            )
            .when(
                F.col("n_distinct").cast("double") / F.col("n_words")
                <= MIN_DISTINCT_RATIO,
                F.lit("distinct_ratio"),
            )
            .when(
                F.coalesce("top_word_count", F.lit(0)).cast("double")
                / F.col("n_words")
                > FUNNEL_TOP_WORD_MAX,
                F.lit("top_word"),
            )
            .when(~F.col("lang").isin(known_langs), F.lit("lang"))
            .when(
                F.coalesce("shared_ratio", F.lit(0.0)) >= SPAN_HEAVY_TAU,
                F.lit("boilerplate"),
            )
            .otherwise(F.lit("kept"))
            .alias("gate"),
        )
    )
    return joined


def filter_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-filter funnel: documents per first-failed quality gate
    — the monitoring artifact a production filtering pipeline publishes
    per snapshot. Rollup of :func:`funnel_doc_gates`; one tiny row per
    gate."""
    joined = funnel_doc_gates(spark, sf_dir)
    stage = F.lit(None).cast("long")
    for i, g in enumerate(reversed(_FUNNEL_GATES)):
        stage = F.when(F.col("gate") == g, F.lit(len(_FUNNEL_GATES) - i)).otherwise(
            stage
        )
    return (
        joined.groupBy("gate")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .select(stage.cast("long").alias("stage"), "gate", "n_docs")
        .orderBy("stage")
    )


def _funnel_gates_sql() -> str:
    """Per-document (doc_id, gate) twin of :func:`funnel_doc_gates` —
    a self-contained subquery, shared by FILTER_FUNNEL_SQL's rollup and
    the corpus-assembly oracle (plans/assembly.py)."""
    from ..functions.text import LANG_STOPWORDS
    from .corpus_prep import MAX_WORDS, MIN_DISTINCT_RATIO, MIN_WORDS

    langs = ", ".join(f"'{lang}'" for lang in sorted(LANG_STOPWORDS))
    return f"""
WITH t AS (SELECT doc_id, lang, {tokens_sql()} AS tok FROM documents),
base AS (
  SELECT doc_id, lang, len(tok) AS n_words,
    len(list_distinct(tok)) AS n_distinct
  FROM t
),
w AS (SELECT doc_id, unnest(tok) AS w FROM t),
wc AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY doc_id, w),
tw AS (SELECT doc_id, MAX(c) AS top_word_count FROM wc GROUP BY doc_id),
n AS (
  SELECT doc_id, text,
    GREATEST(1, (length(text) - {CHUNK_OVERLAP} + {_STRIDE} - 1) // {_STRIDE})
      AS n_chunks
  FROM documents
),
c AS (
  SELECT doc_id, text, CAST(gs.i AS BIGINT) AS chunk_idx
  FROM n CROSS JOIN LATERAL unnest(generate_series(0, n_chunks - 1)) AS gs(i)
),
ch AS (
  SELECT doc_id,
    CAST(length(substr(text, CAST(chunk_idx * {_STRIDE} + 1 AS INT), {CHUNK_SIZE}))
         AS BIGINT) AS chunk_len,
    md5(substr(text, CAST(chunk_idx * {_STRIDE} + 1 AS INT), {CHUNK_SIZE}))
      AS chunk_hash
  FROM c
),
hd AS (
  SELECT chunk_hash, COUNT(DISTINCT doc_id) AS n_docs FROM ch GROUP BY chunk_hash
),
spans AS (
  SELECT ch.doc_id,
    CAST(SUM(CASE WHEN hd.n_docs >= 2 AND ch.chunk_len >= {SPAN_MIN_LEN}
                  THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS shared_ratio
  FROM ch JOIN hd ON ch.chunk_hash = hd.chunk_hash
  GROUP BY ch.doc_id
),
flags AS (
  SELECT base.doc_id,
    CASE
      WHEN NOT (n_words BETWEEN {MIN_WORDS} AND {MAX_WORDS}) THEN 'length'
      WHEN CAST(n_distinct AS DOUBLE) / n_words <= {MIN_DISTINCT_RATIO}
        THEN 'distinct_ratio'
      WHEN CAST(COALESCE(top_word_count, 0) AS DOUBLE) / n_words
           > {FUNNEL_TOP_WORD_MAX} THEN 'top_word'
      WHEN lang NOT IN ({langs}) THEN 'lang'
      WHEN COALESCE(shared_ratio, 0.0) >= {SPAN_HEAVY_TAU} THEN 'boilerplate'
      ELSE 'kept'
    END AS gate
  FROM base
  LEFT JOIN tw ON tw.doc_id = base.doc_id
  LEFT JOIN spans ON spans.doc_id = base.doc_id
)
SELECT doc_id, gate FROM flags
"""


def _funnel_sql() -> str:
    stage_case = "CASE " + " ".join(
        f"WHEN gate = '{g}' THEN {i + 1}" for i, g in enumerate(_FUNNEL_GATES)
    ) + " END"
    return f"""
SELECT CAST({stage_case} AS BIGINT) AS stage, gate, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM ({_funnel_gates_sql()}) GROUP BY gate ORDER BY stage
"""


FILTER_FUNNEL_SQL = _funnel_sql()


# --- sentence-level exact dedup ----------------------------------------------

# Minimum normalized sentence length for a cross-document match to count
# (short fragments like "yes" would collide everywhere and drown the
# signal — same reasoning as SPAN_MIN_LEN for chunk spans).
SENT_MIN_CHARS = 20


def sentence_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style sentence-granular exact dedup report: split every
    document into sentences (``[.!?]+`` terminators), normalize
    (lower/trim, length >= SENT_MIN_CHARS), and report per document how
    many of its sentences also occur verbatim in at least one OTHER
    document — the signal C4's three-sentence-span rule and news
    boilerplate filters act on. Complements span_dedup_stats, which works
    on fixed-stride character chunks; sentences catch natural-boundary
    copying (quotes, licenses, navigation text) that stride chunks
    straddle.

    Scale shape identical to span_dedup_stats: explode to (md5 | doc_id)
    rows, one hash-keyed distinct-doc count, one join back, one per-doc
    rollup — narrow keys end to end, no window, no skew hazard beyond
    stop-sentences which the length gate already prunes."""
    docs = load_table(spark, sf_dir, "documents")
    sents = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.col("text"), r"[.!?]+")).alias("raw"),
        )
        .select("doc_id", F.lower(F.trim(F.col("raw"))).alias("s"))
        .filter(F.length("s") >= SENT_MIN_CHARS)
        .select("doc_id", F.md5(F.col("s")).alias("sent_hash"))
    )
    hash_docs = sents.groupBy("sent_hash").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    ratio = F.col("n_dup_sentences") / F.col("n_sentences")
    return (
        sents.join(hash_docs, "sent_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sentences"),
            F.sum((F.col("n_docs") >= 2).cast("long")).alias("n_dup_sentences"),
        )
        .select(
            "doc_id",
            "n_sentences",
            "n_dup_sentences",
            ratio.alias("dup_sentence_ratio"),
        )
        .orderBy("doc_id")
    )


SENTENCE_DEDUP_STATS_SQL = f"""
WITH s AS (
  SELECT doc_id, md5(sent) AS sent_hash FROM (
    SELECT doc_id, lower(trim(part)) AS sent
    FROM documents,
      LATERAL unnest(regexp_split_to_array(text, '[.!?]+')) AS u(part)
  ) WHERE length(sent) >= {SENT_MIN_CHARS}
),
hd AS (
  SELECT sent_hash, COUNT(DISTINCT doc_id) AS n_docs FROM s GROUP BY sent_hash
)
SELECT s.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_sentences,
  CAST(SUM(CASE WHEN hd.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_dup_sentences,
  CAST(SUM(CASE WHEN hd.n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
    AS dup_sentence_ratio
FROM s JOIN hd ON s.sent_hash = hd.sent_hash
GROUP BY s.doc_id
ORDER BY s.doc_id
"""


# --- epoch repetition (upsampling mixture) ----------------------------------

# Epochs per language for the training mix — >1 boosts low-resource
# languages by repetition (the upsampling complement of MIXTURE_RATES'
# downsampling); fractional parts are realized per-document by salted
# hash, so expectation matches the weight exactly and the decision is
# deterministic and stable under corpus growth.
EPOCH_WEIGHTS: dict[str, float] = {
    "en": 1.0,
    "zh": 2.5,
    "es": 1.25,
    "de": 3.0,
    "fr": 2.0,
}
_EPOCH_SALT = "epoch:"


def _epoch_bucket_spark(doc_id: Column) -> Column:
    h = F.md5(F.concat(F.lit(_EPOCH_SALT), doc_id.cast("string")))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % 10_000


def _epoch_bucket_sql() -> str:
    h = f"md5('{_EPOCH_SALT}' || CAST(doc_id AS VARCHAR))"
    digit = "(strpos('{hex}', substr({h},{i},1)) - 1)"
    terms = " + ".join(
        digit.format(hex=_HEX, h=h, i=i + 1) + f" * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"({terms}) % 10000"


def epoch_repeat_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition plan for a weighted training mix: a doc
    with language weight w appears floor(w) times, plus one more iff its
    salted hash bucket falls under frac(w)·10000 — so every language's
    expected epoch count equals its weight exactly, per-doc decisions
    are deterministic (reproducible dataset builds), and adding new
    documents never flips an existing doc's count. Weights are INTEGER
    tenths under the hood (frac·10000 is exact), so no float threshold
    comparison exists to drift between engines. Pure map stage; the
    multiplied corpus materializes later via explode(sequence()) exactly
    like chunk_documents."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.lit(None).cast("double")
    for lang, r in sorted(EPOCH_WEIGHTS.items()):
        w = F.when(F.col("lang") == lang, F.lit(r)).otherwise(w)
    w = F.coalesce(w, F.lit(1.0))
    base = F.floor(w).cast("long")
    frac_tenk = F.round(w * 10_000).cast("long") - base * 10_000
    bucket = _epoch_bucket_spark(F.col("doc_id"))
    n_repeats = base + (bucket < frac_tenk).cast("long")
    return docs.select(
        "doc_id",
        "lang",
        bucket.alias("epoch_bucket"),
        w.alias("epoch_weight"),
        n_repeats.alias("n_repeats"),
    ).orderBy("doc_id")


_EPOCH_W_CASE = (
    "CASE "
    + " ".join(
        f"WHEN lang = '{lang}' THEN {r!r}"
        for lang, r in sorted(EPOCH_WEIGHTS.items())
    )
    + " ELSE 1.0 END"
)

EPOCH_REPEAT_PLAN_SQL = f"""
SELECT doc_id, lang, epoch_bucket, epoch_weight,
  CAST(floor(epoch_weight) AS BIGINT)
    + CASE WHEN epoch_bucket <
        CAST(round(epoch_weight * 10000) AS BIGINT)
          - CAST(floor(epoch_weight) AS BIGINT) * 10000
      THEN 1 ELSE 0 END AS n_repeats
FROM (
  SELECT doc_id, lang,
    CAST({_epoch_bucket_sql()} AS BIGINT) AS epoch_bucket,
    {_EPOCH_W_CASE} AS epoch_weight
  FROM documents
)
ORDER BY doc_id
"""


# --- mixture planning (target shares -> sampling rates) ----------------------

# target language shares for the training mix the pipeline is asked to
# assemble; the PLAN op below converts these into per-language sampling
# rates given what the corpus actually contains
TARGET_MIX: dict[str, float] = {
    "en": 0.40,
    "zh": 0.20,
    "es": 0.15,
    "de": 0.15,
    "fr": 0.10,
}


def mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The planning half of mixture construction: given TARGET_MIX
    shares and the corpus's actual per-language token supply, compute
    the largest downsampling-only corpus hitting the target mix and the
    per-language sampling rate that builds it. budget = min over
    languages of avail_tokens/share (the binding language samples at
    rate 1.0); rate_l = share_l·budget/avail_l ≤ 1 by construction;
    planned_tokens_l = floor(share_l·budget). ``mixture_sample``
    executes rates like these; this op derives them from data instead
    of hard-coding.

    Scale shape: one token-count rollup keyed on lang (map-side
    combined), a broadcast 1-row min, pure arithmetic after. Exact
    BIGINT token counts; the divisions are identical single IEEE
    expressions in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    share = F.lit(None).cast("double")
    for lang, s in sorted(TARGET_MIX.items()):
        share = F.when(F.col("lang") == lang, F.lit(s)).otherwise(share)
    per_lang = (
        docs.select("lang", F.size(tokens(F.col("text"))).alias("n_tok"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("avail_tokens"),
        )
        .withColumn("target_share", F.coalesce(share, F.lit(0.0)))
    )
    budget = (
        per_lang.filter(F.col("target_share") > 0)
        .agg(
            F.min(
                F.col("avail_tokens").cast("double") / F.col("target_share")
            ).alias("budget")
        )
    )
    rate = F.when(
        F.col("target_share") > 0,
        F.col("target_share") * F.col("budget") / F.col("avail_tokens"),
    ).otherwise(F.lit(0.0))
    return (
        per_lang.crossJoin(F.broadcast(budget))
        .select(
            "lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("avail_tokens").cast("long").alias("avail_tokens"),
            "target_share",
            rate.alias("sample_rate"),
            F.floor(F.col("target_share") * F.col("budget"))
            .cast("long")
            .alias("planned_tokens"),
        )
        .orderBy("lang")
    )


_TARGET_SHARE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN lang = '{lang}' THEN {s!r}"
        for lang, s in sorted(TARGET_MIX.items())
    )
    + " ELSE 0.0 END"
)

MIXTURE_PLAN_SQL = f"""
WITH per_lang AS (
  SELECT lang,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(len({tokens_sql()})) AS BIGINT) AS avail_tokens,
    {_TARGET_SHARE_SQL} AS target_share
  FROM documents
  GROUP BY lang
), budget AS (
  SELECT MIN(CAST(avail_tokens AS DOUBLE) / target_share) AS budget
  FROM per_lang WHERE target_share > 0
)
SELECT lang, n_docs, avail_tokens, target_share,
  CASE WHEN target_share > 0
       THEN target_share * budget / avail_tokens ELSE 0.0 END AS sample_rate,
  CAST(floor(target_share * budget) AS BIGINT) AS planned_tokens
FROM per_lang CROSS JOIN budget
ORDER BY lang
"""


# --- sequence-length histogram ----------------------------------------------

# Right-closed token-count buckets for pack-budget planning: the report an
# operator reads to choose PACK_BUDGET / CHUNK_SIZE before a packing run
# (e.g. "95% of tokens live in docs <= 128 tokens" => budget 2048 packs
# ~16+ docs per sequence).
LENGTH_BUCKET_EDGES = [16, 32, 64, 128]


def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of document token counts over right-closed buckets:
    per bucket, doc and token counts plus doc/token share and the
    cumulative token share. Scale shape: one map + one hash agg to
    |buckets| rows; the share window and the totals broadcast both run
    over the <= 5-row aggregate, never the corpus."""
    from pyspark.sql import Window

    from ..functions.pandas_parity import round2_neutral

    t = _doc_tokens(spark, sf_dir)
    edges = LENGTH_BUCKET_EDGES
    bucket_id = F.lit(len(edges))
    label = F.lit(f"gt_{edges[-1]}")
    for i in reversed(range(len(edges))):
        lo = 0 if i == 0 else edges[i - 1]
        bucket_id = F.when(F.col("n_tokens") <= edges[i], F.lit(i)).otherwise(
            bucket_id
        )
        label = F.when(
            F.col("n_tokens") <= edges[i], F.lit(f"{lo + 1}_{edges[i]}")
        ).otherwise(label)
    agg = (
        t.select(bucket_id.cast("long").alias("bucket_id"), label.alias("bucket"), "n_tokens")
        .groupBy("bucket_id", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )
    tot = agg.agg(
        F.sum("n_docs").cast("long").alias("all_docs"),
        F.sum("total_tokens").cast("long").alias("all_tokens"),
    )
    w = Window.orderBy("bucket_id").rowsBetween(Window.unboundedPreceding, 0)
    return (
        agg.crossJoin(F.broadcast(tot))
        .withColumn("cum_tokens", F.sum("total_tokens").over(w))
        .select(
            "bucket_id",
            "bucket",
            "n_docs",
            "total_tokens",
            round2_neutral(
                F.col("n_docs").cast("double") * 100 / F.col("all_docs")
            ).alias("pct_docs"),
            round2_neutral(
                F.col("total_tokens").cast("double") * 100 / F.col("all_tokens")
            ).alias("pct_tokens"),
            round2_neutral(
                F.col("cum_tokens").cast("double") * 100 / F.col("all_tokens")
            ).alias("cum_pct_tokens"),
        )
        .orderBy("bucket_id")
    )


def _length_bucket_sql() -> tuple[str, str]:
    edges = LENGTH_BUCKET_EDGES
    bid = f"{len(edges)}"
    lbl = f"'gt_{edges[-1]}'"
    for i in reversed(range(len(edges))):
        lo = 0 if i == 0 else edges[i - 1]
        bid = f"CASE WHEN n_tokens <= {edges[i]} THEN {i} ELSE {bid} END"
        lbl = f"CASE WHEN n_tokens <= {edges[i]} THEN '{lo + 1}_{edges[i]}' ELSE {lbl} END"
    return bid, lbl


_BID_SQL, _LBL_SQL = _length_bucket_sql()

DOC_LENGTH_HISTOGRAM_SQL = f"""
WITH t AS (SELECT doc_id, len({tokens_sql()}) AS n_tokens FROM documents),
b AS (
  SELECT CAST({_BID_SQL} AS BIGINT) AS bucket_id, {_LBL_SQL} AS bucket, n_tokens
  FROM t
),
agg AS (
  SELECT bucket_id, bucket,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
  FROM b GROUP BY 1, 2
),
tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS all_docs,
    CAST(SUM(total_tokens) AS BIGINT) AS all_tokens
  FROM agg
)
SELECT bucket_id, bucket, n_docs, total_tokens,
  floor(CAST(n_docs AS DOUBLE) * 100 / all_docs * 100 + 0.5) / 100 AS pct_docs,
  floor(CAST(total_tokens AS DOUBLE) * 100 / all_tokens * 100 + 0.5) / 100 AS pct_tokens,
  floor(CAST(SUM(total_tokens) OVER (ORDER BY bucket_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
    * 100 / all_tokens * 100 + 0.5) / 100 AS cum_pct_tokens
FROM agg CROSS JOIN tot
ORDER BY bucket_id
"""


# --- quality-weighted mixture -----------------------------------------------

# Token budget the quality-weighted mixture allocates across sources.
QW_BUDGET = 100_000


def mixture_weights_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Close the measure→decide loop for mixtures: derive per-source
    sampling weights FROM the corpus report card and turn them into a
    token allocation. weight_raw = max(mean_quality, 0) x
    pass_repetition_rate x (1 - exact_dup_rate); share = weight_raw /
    total; alloc_tokens = floor(QW_BUDGET x share). oversubscribed flags
    sources whose allocation exceeds the tokens they actually have
    (epoch_repeat_plan handles those downstream).

    Determinism: weight_raw multiplies three already-rounded doubles
    (IEEE-identical across engines); the cross-source total goes through
    DECIMAL(38,12) so summation order cannot perturb it; ONE double
    division + floor at the end.

    Scale shape: everything downstream of the report card operates on
    |sources| rows — the report card itself is the linear pass."""
    from .text_analysis import corpus_report_card

    rc = corpus_report_card(spark, sf_dir)
    w = (
        F.greatest(F.col("mean_quality"), F.lit(0.0))
        * F.col("pass_repetition_rate")
        * (F.lit(1.0) - F.col("exact_dup_rate"))
    )
    dec = "decimal(38,12)"
    wd = rc.select(
        "source", "total_tokens", w.cast(dec).alias("w")
    )
    tot = wd.agg(F.sum("w").alias("wtot"))
    share = F.col("w").cast("double") / F.col("wtot").cast("double")
    return (
        wd.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "total_tokens",
            (F.floor(share * 10000 + F.lit(0.5)) / 10000).alias("quality_weight"),
            F.floor(share * QW_BUDGET).cast("long").alias("alloc_tokens"),
            (F.floor(share * QW_BUDGET) > F.col("total_tokens")).alias(
                "oversubscribed"
            ),
        )
        .orderBy("source")
    )


def _mixture_weights_sql() -> str:
    from .text_analysis import CORPUS_REPORT_CARD_SQL

    return f"""WITH rc AS (SELECT * FROM ({CORPUS_REPORT_CARD_SQL})),
wd AS (
  SELECT source, total_tokens,
    CAST(GREATEST(mean_quality, 0.0) * pass_repetition_rate
         * (1.0 - exact_dup_rate) AS DECIMAL(38,12)) AS w
  FROM rc
),
tot AS (SELECT SUM(w) AS wtot FROM wd)
SELECT source, total_tokens,
  floor(CAST(w AS DOUBLE) / CAST(wtot AS DOUBLE) * 10000 + 0.5) / 10000
    AS quality_weight,
  CAST(floor(CAST(w AS DOUBLE) / CAST(wtot AS DOUBLE) * {QW_BUDGET}) AS BIGINT)
    AS alloc_tokens,
  floor(CAST(w AS DOUBLE) / CAST(wtot AS DOUBLE) * {QW_BUDGET}) > total_tokens
    AS oversubscribed
FROM wd CROSS JOIN tot
ORDER BY source
"""


MIXTURE_WEIGHTS_BY_QUALITY_SQL = _mixture_weights_sql()


# --- Exact duplicated-substring removal plan ---------------------------------
# Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
# Better") remove every duplicated substring above a length threshold.
# The scalable approximation of their suffix-array pass is n-gram
# anchoring: a token position is "duplicated" when the DUP_SPAN_NGRAM
# gram starting there occurs in >= DUP_SPAN_MIN_DOCS documents; maximal
# removable spans are the merged unions of overlapping/adjacent anchor
# windows (gaps-and-islands per document). Unlike span_dedup_stats /
# sentence_dedup_stats (which REPORT shared content), this emits the
# actionable removal plan: exact token ranges a scrub pass deletes.

DUP_SPAN_NGRAM = 6
DUP_SPAN_MIN_DOCS = 2


def dup_span_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session substrate ``spans:dup``: one row per maximal duplicated
    token span — (doc_id, span_id, span_start, span_end, span_tokens,
    n_anchors), span_id numbering spans 1..n within each doc in order.

    Scale shape: posexplode to (doc_id, pos, gram-hash) — linear in
    corpus tokens; one hash-keyed distinct-doc count with map-side
    combine + HAVING >= 2 (the shared-gram set is the small side); one
    join back; then the island merge runs per-doc over DUP ANCHORS ONLY
    (a window over the tiny flagged subset, partitioned by doc_id — no
    global window). All copies are marked, matching the paper's
    remove-every-occurrence rule."""
    from ..operators.substrate import session_frame

    def build() -> DataFrame:
        grams = _gram_positions(spark, sf_dir)
        shared = (
            grams.groupBy("gh")
            .agg(F.countDistinct("doc_id").alias("nd"))
            .filter(F.col("nd") >= DUP_SPAN_MIN_DOCS)
            .select("gh")
        )
        dup = grams.join(shared, "gh").select("doc_id", "pos")
        return _merge_anchor_spans(dup)

    return session_frame(spark, sf_dir, "spans:dup", build)


def _gram_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, gh): 64-bit hash of the DUP_SPAN_NGRAM gram starting
    at each token position — the shared anchor frame of the full and
    incremental span detectors. The hash is INTERNAL (it keys the
    shared-gram agg and the join-back; it never reaches an output
    column), so each engine may use its own: Spark takes xxhash64 — a
    BIGINT key shuffles/aggregates far cheaper than a 32-char md5 hex
    string — while the DuckDB twin keeps md5. Cross-engine agreement
    only needs both pipelines to be SELF-consistent; a disagreement
    would require a 64-bit collision among one corpus's distinct grams
    (~2^-64 per pair, negligible at any realistic gram count)."""
    from ..functions.text import ngrams

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("tok")
    )
    return docs.select(
        "doc_id",
        F.posexplode(ngrams("tok", DUP_SPAN_NGRAM)).alias("pos", "g"),
    ).select("doc_id", "pos", F.xxhash64("g").alias("gh"))


def _merge_anchor_spans(dup: DataFrame) -> DataFrame:
    """Gaps-and-islands merge of duplicated anchor positions into maximal
    spans (per-doc window over the flagged subset only)."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    lag = F.lag("pos").over(w)
    isl = dup.withColumn(
        "brk",
        F.when(
            lag.isNull() | (F.col("pos") > lag + DUP_SPAN_NGRAM), 1
        ).otherwise(0),
    ).withColumn("span_id", F.sum("brk").over(w))
    return (
        isl.groupBy("doc_id", "span_id")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + DUP_SPAN_NGRAM - 1).cast("long").alias("span_end"),
            F.count(F.lit(1)).cast("long").alias("n_anchors"),
        )
        .select(
            "doc_id",
            F.col("span_id").cast("long").alias("span_id"),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("long")
            .alias("span_tokens"),
            "n_anchors",
        )
    )


def incremental_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-vs-corpus duplicated-substring detection — the O(batch)
    incremental form of :func:`dup_span_removal_plan`, completing the
    third dedup granularity's incremental story (document level:
    incremental_near_dup; vector level: srp_incremental_pairs;
    substring level: this). The batch is the incremental_near_dup
    convention (doc_id % INCREMENTAL_BATCH_MOD == INCREMENTAL_BATCH_REM,
    shared constants); an anchor fires when the batch gram occurs
    ANYWHERE in the indexed corpus, and anchors merge into maximal
    spans exactly as in the full detector.

    Scale shape: the join is ASYMMETRIC — batch gram positions ⋈ the
    distinct index gram set (semi join keyed on the gram hash), so
    per-batch work is O(batch grams); at production the index side is
    the written gram index a snapshot maintains. The island merge runs
    over batch anchors only."""
    from ..operators.text_dedup import (
        INCREMENTAL_BATCH_MOD,
        INCREMENTAL_BATCH_REM,
    )

    grams = _gram_positions(spark, sf_dir)
    is_batch = (
        F.col("doc_id") % INCREMENTAL_BATCH_MOD == INCREMENTAL_BATCH_REM
    )
    index_set = grams.filter(~is_batch).select("gh").distinct()
    dup = (
        grams.filter(is_batch)
        .join(index_set, "gh", "left_semi")
        .select("doc_id", "pos")
    )
    return _merge_anchor_spans(dup).orderBy("doc_id", "span_start")


def dup_span_removal_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered removal-plan query: every maximal duplicated token
    range, ordered (doc_id, span_start)."""
    return dup_span_frame(spark, sf_dir).orderBy("doc_id", "span_start")


# positions and gram hashes zip positionally via parallel unnest; the
# island merge mirrors the Spark window exactly
_DUP_SPAN_CTES = f"""
WITH tokd AS (
  SELECT doc_id, source, {tokens_sql()} AS tok FROM documents
),
grams AS (
  SELECT doc_id,
    unnest(range(0, greatest(len(tok) - {DUP_SPAN_NGRAM - 1}, 0))) AS pos,
    unnest(list_transform(
      range(1, greatest(len(tok) - {DUP_SPAN_NGRAM - 1}, 0) + 1),
      i -> md5(array_to_string(tok[i:i+{DUP_SPAN_NGRAM - 1}], ' ')))) AS gh
  FROM tokd
),
shared AS (
  SELECT gh FROM grams GROUP BY gh
  HAVING COUNT(DISTINCT doc_id) >= {DUP_SPAN_MIN_DOCS}
),
dup AS (SELECT doc_id, pos FROM grams JOIN shared USING (gh)),
isl AS (
  SELECT doc_id, pos,
    CASE WHEN LAG(pos) OVER w IS NULL
              OR pos > LAG(pos) OVER w + {DUP_SPAN_NGRAM}
         THEN 1 ELSE 0 END AS brk
  FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
spans0 AS (
  SELECT doc_id, pos,
    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
  FROM isl
),
spans AS (
  SELECT doc_id, CAST(span_id AS BIGINT) AS span_id,
    CAST(MIN(pos) AS BIGINT) AS span_start,
    CAST(MAX(pos) + {DUP_SPAN_NGRAM - 1} AS BIGINT) AS span_end,
    CAST(MAX(pos) + {DUP_SPAN_NGRAM} - MIN(pos) AS BIGINT) AS span_tokens,
    CAST(COUNT(*) AS BIGINT) AS n_anchors
  FROM spans0 GROUP BY doc_id, span_id
)"""

DUP_SPAN_REMOVAL_PLAN_SQL = f"""{_DUP_SPAN_CTES}
SELECT doc_id, span_id, span_start, span_end, span_tokens, n_anchors
FROM spans ORDER BY doc_id, span_start
"""


def span_savings_from(spans: DataFrame, docs: DataFrame) -> DataFrame:
    """Per-source rollup of a removal-plan frame (works on the session
    substrate OR a written dup_spans snapshot — the same
    build-once/report-from-disk split as retention_plan_from).
    ``docs`` = (doc_id, source, n_tok). Merged spans never overlap
    within a doc, so the removable sum is exact.
    share = floor(x*10000+0.5)/10000 — the engine-neutral 4-decimal
    rounding used by the mixture plans."""
    per_doc = (
        spans
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum("span_tokens").cast("long").alias("removable"),
        )
    )
    agg = (
        docs.join(per_doc, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tokens"),
            F.sum((F.col("n_spans").isNotNull()).cast("long"))
            .cast("long")
            .alias("docs_with_spans"),
            F.coalesce(F.sum("n_spans"), F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce(F.sum("removable"), F.lit(0))
            .cast("long")
            .alias("removable_tokens"),
        )
    )
    share = (
        F.floor(
            F.col("removable_tokens").cast("double")
            / F.col("total_tokens")
            * 10000
            + F.lit(0.5)
        )
        / 10000
    )
    return agg.select(
        "source",
        "n_docs",
        "total_tokens",
        "docs_with_spans",
        "n_spans",
        "removable_tokens",
        F.when(F.col("total_tokens") > 0, share).alias("removable_share"),
    ).orderBy("source")


def dup_span_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: :func:`span_savings_from` over the session
    spans substrate."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
    )
    return span_savings_from(dup_span_frame(spark, sf_dir), docs)


DUP_SPAN_SAVINGS_SQL = f"""{_DUP_SPAN_CTES},
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
    CAST(SUM(span_tokens) AS BIGINT) AS removable
  FROM spans GROUP BY doc_id
),
src AS (
  SELECT t.source,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(len(t.tok)) AS BIGINT) AS total_tokens,
    CAST(SUM(CASE WHEN p.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS docs_with_spans,
    CAST(COALESCE(SUM(p.n_spans), 0) AS BIGINT) AS n_spans,
    CAST(COALESCE(SUM(p.removable), 0) AS BIGINT) AS removable_tokens
  FROM tokd t LEFT JOIN per_doc p USING (doc_id)
  GROUP BY t.source
)
SELECT source, n_docs, total_tokens, docs_with_spans, n_spans,
  removable_tokens,
  CASE WHEN total_tokens > 0 THEN
    floor(CAST(removable_tokens AS DOUBLE) / total_tokens * 10000 + 0.5)
      / 10000
  END AS removable_share
FROM src ORDER BY source
"""


# bench grouping: both queries share the spans:dup session substrate
SPAN_SUBSTRATE_CONSUMERS = frozenset(
    {
        "dup_span_removal_plan",
        "dup_span_savings",
        "scrub_dup_spans",
        # r11: the calibration grid reuses spans:dup for its n=6 column
        "dup_span_calibration",
    }
)


def scrub_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the removal plan (the bpe_learn→bpe_apply pattern for
    dedup): reconstruct every document with its duplicated spans deleted
    — (doc_id, n_tokens, n_removed_tokens, n_kept_tokens,
    scrubbed_text). Documents without spans pass through verbatim (in
    token-normalized form); a fully-duplicated document scrubs to ''.

    Scale shape: positions explode once (linear); surviving positions
    come from ONE left-anti range join against the spans substrate
    (equi-keyed on doc_id — spans ride the same hash partitioning, and
    per-doc span counts are small, so the extra range predicate is a
    per-row filter, not a blowup); reassembly is a per-doc
    sort_array(collect_list(struct(pos, tok))) — bounded by document
    length, the same shape as event_sequences' trailing arrays."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("tok")
    )
    return scrub_from(dup_span_frame(spark, sf_dir), docs)


def scrub_from(spans: DataFrame, docs: DataFrame) -> DataFrame:
    """Frame-level scrub (session substrate OR a written dup_spans
    snapshot): ``docs`` = (doc_id, tok array). See
    :func:`scrub_dup_spans` for semantics and the scale shape."""
    tokpos = docs.select(
        "doc_id", F.posexplode("tok").alias("pos", "tk")
    )
    spans = spans.select(
        F.col("doc_id").alias("s_doc"), "span_start", "span_end"
    )
    kept = tokpos.join(
        spans,
        (F.col("doc_id") == F.col("s_doc"))
        & (F.col("pos") >= F.col("span_start"))
        & (F.col("pos") <= F.col("span_end")),
        "left_anti",
    )
    ka = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tk"))),
                lambda s: s["tk"],
            ),
        ).alias("scrubbed_text"),
    )
    return (
        docs.join(ka, "doc_id", "left")
        .select(
            "doc_id",
            F.size("tok").cast("long").alias("n_tokens"),
            (F.size("tok") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed_tokens"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept_tokens"),
            F.coalesce("scrubbed_text", F.lit("")).alias("scrubbed_text"),
        )
        .orderBy("doc_id")
    )


SCRUB_DUP_SPANS_SQL = f"""{_DUP_SPAN_CTES},
tokpos AS (
  SELECT doc_id,
    unnest(range(0, len(tok))) AS pos,
    unnest(tok) AS tk
  FROM tokd
),
kept AS (
  SELECT t.doc_id, t.pos, t.tk
  FROM tokpos t
  WHERE NOT EXISTS (
    SELECT 1 FROM spans s
    WHERE s.doc_id = t.doc_id
      AND t.pos BETWEEN s.span_start AND s.span_end
  )
),
ka AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
    string_agg(tk, ' ' ORDER BY pos) AS scrubbed_text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(len(d.tok) AS BIGINT) AS n_tokens,
  CAST(len(d.tok) - COALESCE(ka.n_kept, 0) AS BIGINT) AS n_removed_tokens,
  CAST(COALESCE(ka.n_kept, 0) AS BIGINT) AS n_kept_tokens,
  COALESCE(ka.scrubbed_text, '') AS scrubbed_text
FROM tokd d LEFT JOIN ka USING (doc_id)
ORDER BY d.doc_id
"""


def _incremental_dup_spans_sql() -> str:
    from ..operators.text_dedup import (
        INCREMENTAL_BATCH_MOD as _M,
        INCREMENTAL_BATCH_REM as _R,
    )

    # reuses the full detector's tokd/grams CTEs; the symmetric
    # shared/dup/spans chain stays defined but unreferenced (DuckDB
    # prunes unreferenced non-materialized CTEs)
    return f"""{_DUP_SPAN_CTES},
idx AS (
  SELECT DISTINCT gh FROM grams WHERE NOT (doc_id % {_M} = {_R})
),
dup2 AS (
  SELECT g.doc_id, g.pos FROM grams g JOIN idx USING (gh)
  WHERE g.doc_id % {_M} = {_R}
),
isl2 AS (
  SELECT doc_id, pos,
    CASE WHEN LAG(pos) OVER w2 IS NULL
              OR pos > LAG(pos) OVER w2 + {DUP_SPAN_NGRAM}
         THEN 1 ELSE 0 END AS brk
  FROM dup2 WINDOW w2 AS (PARTITION BY doc_id ORDER BY pos)
),
sp2 AS (
  SELECT doc_id, pos,
    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
  FROM isl2
)
SELECT doc_id, CAST(span_id AS BIGINT) AS span_id,
  CAST(MIN(pos) AS BIGINT) AS span_start,
  CAST(MAX(pos) + {DUP_SPAN_NGRAM - 1} AS BIGINT) AS span_end,
  CAST(MAX(pos) + {DUP_SPAN_NGRAM} - MIN(pos) AS BIGINT) AS span_tokens,
  CAST(COUNT(*) AS BIGINT) AS n_anchors
FROM sp2 GROUP BY doc_id, span_id
ORDER BY doc_id, span_start
"""


INCREMENTAL_DUP_SPANS_SQL = _incremental_dup_spans_sql()


# --- dup-span threshold calibration ------------------------------------------
#
# The measure-then-choose companion the span family lacked (r10 VERDICT
# next-round #6, mirroring lsh_band_tuning_report / key_skew_report):
# before a 100 TB scrub commits to an (anchor n-gram size, minimum span
# length) policy, ONE calibration pass reports what each candidate cell
# would scrub — spans, affected docs, scrubbed tokens — so
# DUP_SPAN_NGRAM=6 becomes a measured choice, not a hard-coded one
# (Lee et al. 2022 use 50-token spans; the right n/L depends on the
# corpus's duplication texture).

SPAN_CAL_NGRAMS = (4, 6, 8)
SPAN_CAL_MIN_LENS = (10, 25, 50, 100)


def dup_span_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ngram_n, min_span_len, n_spans, docs_affected, scrubbed_tokens,
    total_tokens) for every cell of the SPAN_CAL_NGRAMS ×
    SPAN_CAL_MIN_LENS grid — scrub cost if spans were anchored on
    ngram_n-grams and only spans of >= min_span_len tokens removed.

    Scale shape: the production n's column comes straight from the
    persisted spans:dup substrate (zero recompute — the unit test
    proves the equality); only the OTHER grid n's gram streams are
    extracted, as (n, pos, gram) struct arrays over ONE tokenization
    concatenated and exploded in a single generator (a per-n union
    would re-scan documents once per n per side). The whole plan reads
    the corpus 3×: the fresh-n gram frame's two consumers (shared-gram
    detection + the join-back — the dup_span_frame trade: re-scanning
    beats materializing the exploded gram frame) and the total-token
    agg. Gram keys are internal xxhash64 BIGINTs (see _gram_positions).
    Everything downstream runs
    exactly as dup_span_frame but keyed (ngram_n, doc_id) — the window
    still covers DUP ANCHORS ONLY. The min-length dimension NEVER
    rescans: merged spans join a broadcast literal threshold list on
    span_tokens >= min_span_len and aggregate per cell; empty cells are
    restored by a left join from the literal grid. Output = |grid| rows."""
    from pyspark.sql import Window

    from ..functions.text import ngrams

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("tok")
    )
    # ONE corpus scan: per-n (n, pos, gram) struct arrays built from the
    # same tokenization, concatenated and exploded ONCE (a per-n union
    # would re-scan + re-tokenize documents |grid_n| times — 3 corpus
    # passes for nothing at 100 TB)
    def _tagger(n: int):
        def tag(g, i):  # noqa: ANN001 — Column lambda (2-arg transform)
            return F.struct(
                F.lit(n).cast("long").alias("n"),
                i.cast("long").alias("pos"),
                g.alias("g"),
            )

        return tag

    fresh_ns = [n for n in SPAN_CAL_NGRAMS if n != DUP_SPAN_NGRAM]
    tagged = [F.transform(ngrams("tok", n), _tagger(n)) for n in fresh_ns]
    grams = docs.select(
        "doc_id", F.explode(F.concat(*tagged)).alias("s")
    ).select(
        F.col("s.n").alias("ngram_n"),
        "doc_id",
        F.col("s.pos").alias("pos"),
        F.xxhash64(F.col("s.g")).alias("gh"),  # internal key — see
        # _gram_positions for the xxhash64-vs-md5 argument
    )
    shared = (
        grams.groupBy("ngram_n", "gh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= DUP_SPAN_MIN_DOCS)
        .select("ngram_n", "gh")
    )
    dup = grams.join(shared, ["ngram_n", "gh"]).select(
        "ngram_n", "doc_id", "pos"
    )
    w = Window.partitionBy("ngram_n", "doc_id").orderBy("pos")
    lag = F.lag("pos").over(w)
    spans = (
        dup.withColumn(
            "brk",
            F.when(lag.isNull() | (F.col("pos") > lag + F.col("ngram_n")), 1)
            .otherwise(0),
        )
        .withColumn("span_id", F.sum("brk").over(w))
        .groupBy("ngram_n", "doc_id", "span_id")
        .agg(
            (F.max("pos") + F.first("ngram_n") - F.min("pos"))
            .cast("long")
            .alias("span_tokens")
        )
        .select("ngram_n", "doc_id", "span_tokens")
    )
    if DUP_SPAN_NGRAM in SPAN_CAL_NGRAMS:
        # the production n's spans ARE the persisted spans:dup substrate
        # (proven equal by the calibration unit test) — reuse it instead
        # of re-extracting that n's grams
        spans = spans.unionByName(
            dup_span_frame(spark, sf_dir).select(
                F.lit(DUP_SPAN_NGRAM).cast("long").alias("ngram_n"),
                "doc_id",
                "span_tokens",
            )
        )
    cells = spark.createDataFrame(
        [(n, l) for n in SPAN_CAL_NGRAMS for l in SPAN_CAL_MIN_LENS],
        "ngram_n: bigint, min_span_len: bigint",
    )
    agg = (
        spans.join(
            F.broadcast(cells),
            (spans.ngram_n == cells.ngram_n)
            & (spans.span_tokens >= cells.min_span_len),
        )
        .drop(cells.ngram_n)
        .groupBy("ngram_n", "min_span_len")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.countDistinct("doc_id").cast("long").alias("docs_affected"),
            F.sum("span_tokens").cast("long").alias("scrubbed_tokens"),
        )
    )
    total = docs.agg(
        F.sum(F.size("tok")).cast("long").alias("total_tokens")
    )
    return (
        cells.join(agg, ["ngram_n", "min_span_len"], "left")
        .crossJoin(F.broadcast(total))
        .select(
            "ngram_n",
            "min_span_len",
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("docs_affected", F.lit(0))
            .cast("long")
            .alias("docs_affected"),
            F.coalesce("scrubbed_tokens", F.lit(0))
            .cast("long")
            .alias("scrubbed_tokens"),
            "total_tokens",
        )
        .orderBy("ngram_n", "min_span_len")
    )


def _span_calibration_sql() -> str:
    gram_selects = []
    for n in SPAN_CAL_NGRAMS:
        gram_selects.append(
            f"""SELECT CAST({n} AS BIGINT) AS ngram_n, doc_id,
    unnest(range(0, greatest(len(tok) - {n - 1}, 0))) AS pos,
    unnest(list_transform(
      range(1, greatest(len(tok) - {n - 1}, 0) + 1),
      i -> md5(array_to_string(tok[i:i+{n - 1}], ' ')))) AS gh
  FROM tokd"""
        )
    cell_rows = ", ".join(
        f"(CAST({n} AS BIGINT), CAST({l} AS BIGINT))"
        for n in SPAN_CAL_NGRAMS
        for l in SPAN_CAL_MIN_LENS
    )
    return f"""
WITH tokd AS (
  SELECT doc_id, {tokens_sql()} AS tok FROM documents
),
grams AS (
  {" UNION ALL ".join(gram_selects)}
),
shared AS (
  SELECT ngram_n, gh FROM grams GROUP BY ngram_n, gh
  HAVING COUNT(DISTINCT doc_id) >= {DUP_SPAN_MIN_DOCS}
),
dup AS (
  SELECT g.ngram_n, doc_id, pos FROM grams g JOIN shared USING (ngram_n, gh)
),
isl AS (
  SELECT ngram_n, doc_id, pos,
    CASE WHEN LAG(pos) OVER w IS NULL
              OR pos > LAG(pos) OVER w + ngram_n
         THEN 1 ELSE 0 END AS brk
  FROM dup WINDOW w AS (PARTITION BY ngram_n, doc_id ORDER BY pos)
),
spans0 AS (
  SELECT ngram_n, doc_id, pos,
    SUM(brk) OVER (PARTITION BY ngram_n, doc_id ORDER BY pos) AS span_id
  FROM isl
),
spans AS (
  SELECT ngram_n, doc_id,
    CAST(MAX(pos) + ngram_n - MIN(pos) AS BIGINT) AS span_tokens
  FROM spans0 GROUP BY ngram_n, doc_id, span_id
),
cells AS (SELECT * FROM (VALUES {cell_rows}) t(ngram_n, min_span_len)),
tot AS (SELECT CAST(SUM(len(tok)) AS BIGINT) AS total_tokens FROM tokd),
agg AS (
  SELECT s.ngram_n, c.min_span_len,
    CAST(COUNT(*) AS BIGINT) AS n_spans,
    CAST(COUNT(DISTINCT s.doc_id) AS BIGINT) AS docs_affected,
    CAST(SUM(s.span_tokens) AS BIGINT) AS scrubbed_tokens
  FROM spans s JOIN cells c
    ON s.ngram_n = c.ngram_n AND s.span_tokens >= c.min_span_len
  GROUP BY s.ngram_n, c.min_span_len
)
SELECT c.ngram_n, c.min_span_len,
  CAST(COALESCE(a.n_spans, 0) AS BIGINT) AS n_spans,
  CAST(COALESCE(a.docs_affected, 0) AS BIGINT) AS docs_affected,
  CAST(COALESCE(a.scrubbed_tokens, 0) AS BIGINT) AS scrubbed_tokens,
  total_tokens
FROM cells c LEFT JOIN agg a USING (ngram_n, min_span_len) CROSS JOIN tot
ORDER BY ngram_n, min_span_len
"""


DUP_SPAN_CALIBRATION_SQL = _span_calibration_sql()


# --- UniMax budget allocation -------------------------------------------------
#
# UniMax (Chung et al. 2023, "UniMax: Fairer and More Effective Language
# Sampling for Large-Scale Multilingual Pretraining"): given a total
# token budget, allocate it as UNIFORMLY as possible across sources,
# except no source may repeat more than N epochs — small sources get
# capped at N·their size and the leftover budget waterfills uniformly
# over the rest. The third published member of the mixture family
# (mixture_plan: hand-set target shares; doremi_domain_weights:
# excess-loss multiplicative weights; this: epoch-capped uniform).
#
# Exact-integer waterfilling, closed-form via one sort: with caps
# sorted ascending, the capped set is a PREFIX — source at rank r is
# capped iff cap_r · (m - r + 1) <= budget - prefix_cap_{<r} (its cap
# fits under the uniform share of the remaining budget). Everything is
# BIGINT arithmetic over |sources| rows; the only double is the final
# epochs ratio (one division).

UNIMAX_MAX_EPOCHS = 2
UNIMAX_BUDGET_NUM = 1  # budget = corpus tokens × NUM/DEN (exact integer)
UNIMAX_BUDGET_DEN = 2


def unimax_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_tokens, cap_tokens, capped, alloc_tokens,
    epochs): the UniMax allocation of an integer token budget
    (corpus_tokens // 2) across sources with a 2-epoch repeat cap.
    Capped sources receive exactly cap_tokens; uncapped sources split
    the remaining budget evenly (floor division — the sub-|sources|
    remainder is deliberately unallocated and recoverable as
    budget − Σ alloc).

    Scale shape: ONE token-count rollup keyed on source (map-side
    combined); the waterfill is window arithmetic over |sources| rows
    (a broadcast-size frame — the single-partition window is on ~20
    rows, not corpus data)."""
    return _unimax_plan_from(_unimax_per_src(spark, sf_dir))


def _unimax_per_src(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12 OPTIMIZATION (guide §1.2: remove repeated passes): the rollup
    # reads the tokenized qm:labeled substrate (its n_tokens IS
    # size(tokens(text)) — text_stats computes the same expression)
    # instead of re-tokenizing the corpus; unimax_budget_draw previously
    # tokenized documents TWICE per call (once here, once for the
    # prefix sum).
    from .quality_models import labeled_docs_table

    lab = labeled_docs_table(spark, sf_dir)
    return (
        lab.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .withColumn(
            "cap_tokens",
            (F.lit(UNIMAX_MAX_EPOCHS) * F.col("n_tokens")).cast("long"),
        )
    )


def _unimax_plan_from(per_src: DataFrame) -> DataFrame:
    """The closed-form waterfill over a (source, n_docs, n_tokens,
    cap_tokens) rollup — split out so ``unimax_budget_draw`` and the
    CLI artifact share the exact allocation arithmetic."""
    from pyspark.sql import Window

    budget = per_src.agg(
        F.expr(
            f"CAST(sum(n_tokens) * {UNIMAX_BUDGET_NUM} div "
            f"{UNIMAX_BUDGET_DEN} AS BIGINT)"
        ).alias("_budget")
    )
    w = Window.orderBy("cap_tokens", "source")
    ranked = (
        per_src.crossJoin(F.broadcast(budget))
        .withColumn("_r", F.row_number().over(w))
        .withColumn("_m", F.count(F.lit(1)).over(Window.partitionBy()))
        .withColumn(
            "_prefix_cap",
            F.coalesce(
                F.sum("cap_tokens").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .withColumn(
            "_fits",
            F.col("cap_tokens") * (F.col("_m") - F.col("_r") + 1)
            <= F.col("_budget") - F.col("_prefix_cap"),
        )
    )
    # the capped set is the maximal all-fits prefix: a rank is capped
    # iff EVERY rank up to and including it fits (min-over-prefix of
    # the fits flag — guards the non-monotone edge where a later cap
    # fits only because an earlier one was skipped)
    ranked = ranked.withColumn(
        "capped",
        F.min(F.col("_fits").cast("int"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        == 1,
    )
    spent = ranked.agg(
        F.sum(F.when(F.col("capped"), F.col("cap_tokens")).otherwise(0))
        .cast("long")
        .alias("_spent"),
        F.sum(F.when(F.col("capped"), 0).otherwise(1))
        .cast("long")
        .alias("_n_uncapped"),
    )
    alloc = F.when(F.col("capped"), F.col("cap_tokens")).otherwise(
        F.expr("(_budget - _spent) div greatest(_n_uncapped, 1)")
    )
    return (
        ranked.crossJoin(F.broadcast(spent))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "cap_tokens",
            "capped",
            alloc.cast("long").alias("alloc_tokens"),
            (
                alloc.cast("double") / F.col("n_tokens").cast("double")
            ).alias("epochs"),
        )
        .orderBy("source")
    )


_UNIMAX_CTE = f"""
WITH per_src AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(len({tokens_sql()})) AS BIGINT) AS n_tokens,
    CAST({UNIMAX_MAX_EPOCHS} * SUM(len({tokens_sql()})) AS BIGINT) AS cap_tokens
  FROM documents GROUP BY source
),
bud AS (
  SELECT CAST(SUM(n_tokens) * {UNIMAX_BUDGET_NUM} // {UNIMAX_BUDGET_DEN}
              AS BIGINT) AS budget
  FROM per_src
),
ranked AS (
  SELECT p.*, budget,
    ROW_NUMBER() OVER w AS r,
    COUNT(*) OVER () AS m,
    CAST(COALESCE(SUM(cap_tokens) OVER (
      w ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS prefix_cap
  FROM per_src p CROSS JOIN bud
  WINDOW w AS (ORDER BY cap_tokens, source)
),
flagged AS (
  SELECT *,
    MIN(CASE WHEN cap_tokens * (m - r + 1) <= budget - prefix_cap
             THEN 1 ELSE 0 END)
      OVER (ORDER BY cap_tokens, source
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1 AS capped
  FROM ranked
),
sp AS (
  SELECT CAST(SUM(CASE WHEN capped THEN cap_tokens ELSE 0 END) AS BIGINT)
           AS spent,
         CAST(SUM(CASE WHEN capped THEN 0 ELSE 1 END) AS BIGINT)
           AS n_uncapped
  FROM flagged
)"""

UNIMAX_MIXTURE_PLAN_SQL = f"""{_UNIMAX_CTE}
SELECT source, n_docs, n_tokens, cap_tokens, capped,
  CAST(CASE WHEN capped THEN cap_tokens
       ELSE (budget - spent) // GREATEST(n_uncapped, 1) END AS BIGINT)
    AS alloc_tokens,
  CAST(CASE WHEN capped THEN cap_tokens
       ELSE (budget - spent) // GREATEST(n_uncapped, 1) END AS DOUBLE)
    / CAST(n_tokens AS DOUBLE) AS epochs
FROM flagged CROSS JOIN sp ORDER BY source
"""


# --- UniMax allocation → deterministic document draw --------------------------
#
# Closes the measure→decide→assemble loop for the epoch-capped planner:
# where corpus_prep.token_budget_sample draws "the first N tokens' worth"
# of the shuffled corpus against ONE hand-set budget, this draws each
# source's slice against ITS UniMax allocation — walk each source's docs
# in salted-shuffle order and keep every doc whose per-source exclusive
# token prefix sum is still under alloc_tokens (document-granular; the
# last kept doc may straddle, the loader truncates — the
# token_budget_sample / sequence_packing convention). For capped sources
# alloc = 2 epochs ≥ corpus, so every doc is kept once and the loader
# repeats — the draw is the single-pass membership set.

_UNIMAX_SALT = "unimax0"


def unimax_budget_draw_from(docs: DataFrame, plan: DataFrame) -> DataFrame:
    """Apply a UniMax plan to a document frame. ``docs`` needs (doc_id,
    source, text); ``plan`` needs the EXACT integer columns (source,
    alloc_tokens) — both present in the WRITTEN ``unimax_plan`` artifact
    (cli/run_curation.py mix), so the CLI manifest and the inline query
    share this derivation verbatim.

    Scale shape: the per-source prefix sum rides the range-repartition
    machinery (operators/ranking.py) over the total order (source,
    shuffle_key, doc_id) — NO per-source window, so a 10 TB source never
    funnels through one WindowExec task; the per-source base offsets and
    the plan join are |sources|-row broadcasts."""
    t = docs.select(
        "doc_id",
        "source",
        F.md5(
            F.concat(F.lit(_UNIMAX_SALT), F.col("doc_id").cast("string"))
        ).alias("shuffle_key"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    return _unimax_draw_from_tokens(t, plan)


def _unimax_draw_from_tokens(t: DataFrame, plan: DataFrame) -> DataFrame:
    """The draw over a prebuilt (doc_id, source, shuffle_key, n_tokens)
    frame — shared by the generic text-frame entry point above and the
    substrate-riding registered query."""
    pref = with_global_prefix_sum(
        t, ["source", "shuffle_key", "doc_id"], "n_tokens"
    )
    src_tot = t.groupBy("source").agg(
        F.sum("n_tokens").cast("long").alias("_src_tok")
    )
    # per-source base = tokens of all sources ordered strictly before —
    # triangular self-join over |sources| rows (same no-window trick as
    # the ranking machinery's partition offsets)
    base = (
        src_tot.alias("a")
        .join(
            src_tot.alias("b"),
            F.col("b.source") < F.col("a.source"),
            "left",
        )
        .groupBy(F.col("a.source").alias("source"))
        .agg(
            F.coalesce(F.sum("b._src_tok"), F.lit(0))
            .cast("long")
            .alias("_base")
        )
    )
    return (
        pref.join(F.broadcast(base), "source")
        .withColumn(
            "tokens_before",
            (F.col(PREFIX_COL) - F.col("_base")).cast("long"),
        )
        .join(
            F.broadcast(plan.select("source", "alloc_tokens")), "source"
        )
        .filter(F.col("tokens_before") < F.col("alloc_tokens"))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "tokens_before",
            "alloc_tokens",
        )
        .orderBy("doc_id")
    )


def unimax_budget_draw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: (doc_id, source, n_tokens, tokens_before,
    alloc_tokens) — the deterministic per-source document draw under the
    UniMax allocation. The planner grid (unimax_mixture_plan) is an
    INPUT here, not a leaf: the same consumption path
    token_budget_sample provides for the hand-set budget, closing the
    measure→decide→assemble loop for the epoch-capped planner."""
    # r12: ride the tokenized qm:labeled substrate — (doc_id, source,
    # n_tokens) with the salted shuffle key derived here, instead of
    # re-tokenizing documents (see _unimax_per_src); values identical
    # (same n_tokens expression, same key derivation).
    from .quality_models import labeled_docs_table

    t = labeled_docs_table(spark, sf_dir).select(
        "doc_id",
        "source",
        F.md5(
            F.concat(F.lit(_UNIMAX_SALT), F.col("doc_id").cast("string"))
        ).alias("shuffle_key"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )
    return _unimax_draw_from_tokens(t, unimax_mixture_plan(spark, sf_dir))


UNIMAX_BUDGET_DRAW_SQL = f"""{_UNIMAX_CTE},
alloc AS (
  SELECT source,
    CAST(CASE WHEN capped THEN cap_tokens
         ELSE (budget - spent) // GREATEST(n_uncapped, 1) END AS BIGINT)
      AS alloc_tokens
  FROM flagged CROSS JOIN sp
),
t AS (
  SELECT doc_id, source,
    md5('{_UNIMAX_SALT}' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
    CAST(len({tokens_sql()}) AS BIGINT) AS n_tokens
  FROM documents
),
p AS (
  SELECT doc_id, source, n_tokens,
    CAST(COALESCE(SUM(n_tokens) OVER (
      PARTITION BY source ORDER BY shuffle_key, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS tokens_before
  FROM t
)
SELECT p.doc_id, p.source, p.n_tokens, p.tokens_before, a.alloc_tokens
FROM p JOIN alloc a USING (source)
WHERE p.tokens_before < a.alloc_tokens
ORDER BY doc_id
"""
