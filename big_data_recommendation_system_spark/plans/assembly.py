"""Composed corpus-assembly plan — the full training-data funnel as ONE
declarative query, hash-checked cross-engine.

This is the composition the reference's aspirational pipeline implies
(README.md:62-75's "recommendation data preparation") re-imagined for
LLM corpus assembly: exact dedup → MinHash/LSH near-dup pruning →
quality gates → train/eval decontamination → per-split sequence
packing. ``cli/run_corpus.py`` materializes the same frames to parquet;
the registered ``corpus_assembly_funnel`` query rolls the staged drop
decisions into the per-stage document/token counts, and its DuckDB twin
recomputes the ENTIRE pipeline — including the recursive
connected-component clustering and the post-filter contamination scan —
in SQL, so every stage's interaction is value-verified, not just each
stage alone.

Scale shape: every per-stage signal (content hash rank, cluster
retention, quality gates, eval-shingle hits) is a narrow doc_id-keyed
frame joined once at the end; the near-dup substrate is session-cached
(or read from its written snapshot). The final rollup groups ≤9 reason
rows. The contamination threshold compares with integer-times-constant
(``n_eval_hits >= DECON_TAU * n_shingles``) so no cross-engine division
rounding exists on the boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens, tokens_sql
from ..operators.ranking import PREFIX_COL, with_global_prefix_sum
from ..operators.text_dedup import (
    DEDUP_RETENTION_PLAN_SQL,
    dup_clusters,
    retention_plan_from,
)
from ..sources.tables import load_table
from .corpus_prep import (
    DECON_NGRAM,
    DECON_TAU,
    _split_bucket_sql,
    _split_label_sql,
    split_bucket,
    split_label,
    train_eval_hits_from,
)
from .packing import PACK_BUDGET, _funnel_gates_sql, funnel_doc_gates
from ..functions.text import shingles_sql

# funnel attribution order (first drop wins); 'kept' closes the funnel
FUNNEL_STAGES = [
    "exact_dup",
    "near_dup",
    "length",
    "distinct_ratio",
    "top_word",
    "lang",
    "boilerplate",
    "contaminated",
    "kept",
]

# the SemDeDup-extended funnel (r9 VERDICT item 4): the embedding-side
# semantic-dup drop slots into the dedup family, right after the text
# near-dup stage, so both detector families feed one assembly decision
FUNNEL_SEM_STAGES = FUNNEL_STAGES[:2] + ["semantic_dup"] + FUNNEL_STAGES[2:]


def staged_docs(
    spark: SparkSession, sf_dir: str, dedup_dir: str | None = None
) -> DataFrame:
    """One row per input document: (doc_id, source, lang, split,
    n_tokens, drop_reason) with drop_reason ∈ FUNNEL_STAGES. See the
    module docstring for stage semantics; ``dedup_dir`` points at a
    cli/run_dedup.py snapshot to reuse its written dup_clusters instead
    of recomputing the substrate."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "source",
        "lang",
        F.md5("text").alias("content_hash"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )

    w = Window.partitionBy("content_hash").orderBy("doc_id")
    exact = (
        base.select("doc_id", "content_hash")
        .withColumn("rn", F.row_number().over(w))
        .select("doc_id", (F.col("rn") > 1).alias("is_exact_dup"))
    )

    clusters_path = dedup_dir and os.path.join(dedup_dir, "dup_clusters")
    if clusters_path and os.path.isdir(clusters_path):
        clusters = spark.read.parquet(clusters_path)
    else:
        clusters = dup_clusters(spark, sf_dir)
    plan = retention_plan_from(clusters, docs.select("doc_id", "n_chars"))
    near = plan.select("doc_id", (~F.col("keep")).alias("is_near_dup"))

    gates = funnel_doc_gates(spark, sf_dir)  # (doc_id, gate)

    staged = (
        base.join(exact, "doc_id")
        .join(near, "doc_id", "left")
        .join(gates, "doc_id")
        .withColumn("split", split_label(split_bucket(F.col("doc_id"))))
        .withColumn("is_near_dup", F.coalesce("is_near_dup", F.lit(False)))
    )

    # decontamination runs on the corpus that survived stages 1-3 — the
    # documents that would actually ship; the eval side is likewise the
    # post-filter eval splits. Ratio rule, not any-hit: boilerplate
    # n-grams (and the synthetic corpus's tiny vocabulary) make single
    # collisions pervasive; DECON_TAU is the same threshold
    # decontamination_report applies in the eval direction.
    survivors_13 = staged.filter(
        ~F.col("is_exact_dup")
        & ~F.col("is_near_dup")
        & (F.col("gate") == "kept")
    ).select("doc_id", "split")
    hits = train_eval_hits_from(
        docs.select("doc_id", "text").join(survivors_13, "doc_id")
    )
    contaminated = hits.filter(
        (F.col("n_shingles") > 0)
        & (
            F.col("n_eval_hits")
            >= F.lit(DECON_TAU) * F.col("n_shingles")
        )
    ).select("doc_id", F.lit(True).alias("is_contaminated"))

    drop_reason = (
        F.when(F.col("is_exact_dup"), F.lit("exact_dup"))
        .when(F.col("is_near_dup"), F.lit("near_dup"))
        .when(F.col("gate") != "kept", F.col("gate"))
        .when(F.coalesce("is_contaminated", F.lit(False)), F.lit("contaminated"))
        .otherwise(F.lit("kept"))
    )
    return staged.join(contaminated, "doc_id", "left").select(
        "doc_id",
        "source",
        "lang",
        "split",
        "n_tokens",
        drop_reason.alias("drop_reason"),
    )


def pack_survivors(staged: DataFrame) -> DataFrame:
    """Per-split sequence-pack assignment over the kept documents: one
    global (split, doc_id)-ordered exclusive prefix sum
    (operators/ranking — no single-partition window), then each split's
    base offset (its first document's running total, a 3-row broadcast)
    rebases the counter so packs number from 0 within every split."""
    kept = staged.filter(F.col("drop_reason") == "kept").select(
        "doc_id", "source", "lang", "split", "n_tokens"
    )
    pref = with_global_prefix_sum(kept, ["split", "doc_id"], "n_tokens")
    split_base = pref.groupBy("split").agg(F.min(PREFIX_COL).alias("_split_base"))
    off = F.col(PREFIX_COL) - F.col("_split_base")
    return pref.join(F.broadcast(split_base), "split").select(
        "doc_id",
        "source",
        "lang",
        "split",
        "n_tokens",
        off.cast("long").alias("start_offset"),
        F.floor(off / PACK_BUDGET).cast("long").alias("pack_id"),
        (off % PACK_BUDGET).cast("long").alias("offset_in_pack"),
    )


def funnel_rollup(staged: DataFrame, stages: list[str] | None = None) -> DataFrame:
    """Stage-ordered (stage, drop_reason, n_docs, n_tokens) rollup of a
    :func:`staged_docs` frame. Shared by the registered query and
    cli/run_corpus.py's written funnel report. ``stages`` defaults to
    the base funnel; the SemDeDup-extended query passes
    ``FUNNEL_SEM_STAGES``."""
    stages = FUNNEL_STAGES if stages is None else stages
    stage_idx = F.lit(None).cast("long")
    for i, s in enumerate(reversed(stages)):
        stage_idx = F.when(
            F.col("drop_reason") == s, F.lit(len(stages) - 1 - i)
        ).otherwise(stage_idx)
    return (
        staged.groupBy("drop_reason")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .select(stage_idx.alias("stage"), "drop_reason", "n_docs", "n_tokens")
        .orderBy("stage")
    )


def staged_docs_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session substrate: the per-document staged funnel decisions
    (:func:`staged_docs` with the session dedup substrate), persisted
    once per (session, corpus) and shared by the funnel rollup and the
    quality-weighted assembly — the same frame ``cli/run_corpus.py``
    writes once per snapshot in production."""
    from ..operators.substrate import session_frame

    return session_frame(
        spark, sf_dir, "asm:staged", lambda: staged_docs(spark, sf_dir)
    )


def corpus_assembly_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents and tokens dropped per assembly stage — the one-line
    health report of the whole corpus pipeline, and the registered
    query whose DuckDB oracle replays every stage (recursive CC
    clustering included) in SQL."""
    return funnel_rollup(staged_docs_table(spark, sf_dir))


def corpus_assembly_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel with BOTH detector families (r9 VERDICT item 4): the
    embedding-side SemDeDup keep decision (similarity.semdedup_plan —
    keep-the-centroid-outlier per semantic dup group) overlays the
    staged funnel as a ``semantic_dup`` stage between the text near-dup
    stage and the quality gates. First-drop-wins attribution is
    preserved: a document that is a text dup stays attributed to its
    text stage; a text-unique document whose EMBEDDING sits in a
    semantic dup group and is not that group's kept outlier becomes
    ``semantic_dup``; later stages (gates, decontamination) keep their
    base attribution — decontamination is computed on the pre-SemDeDup
    survivor set, which stays valid because removing additional train
    documents can only reduce eval leakage, never add it.

    Scale shape: ONE extra keyed left join of the |audit-slice|-row
    SemDeDup keep frame onto the persisted staged substrate — every
    other input is an already-persisted session substrate. The DuckDB
    twin chains the full recursive-CC + centroid-cosine SemDeDup
    statement as a subquery of the staged CTE chain, so the cross-family
    interaction is value-verified end-to-end."""
    from ..operators.similarity import semdedup_plan

    staged = staged_docs_table(spark, sf_dir)
    sem = semdedup_plan(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), "is_kept"
    )
    overlaid = staged.join(sem, "doc_id", "left").select(
        "n_tokens",
        F.when(
            F.col("drop_reason").isin("exact_dup", "near_dup"),
            F.col("drop_reason"),
        )
        .when(
            F.coalesce(~F.col("is_kept"), F.lit(False)), F.lit("semantic_dup")
        )
        .otherwise(F.col("drop_reason"))
        .alias("drop_reason"),
    )
    return funnel_rollup(overlaid, stages=FUNNEL_SEM_STAGES)


def _staged_ctes() -> str:
    """The WITH chain through ``reason`` (one row per document with its
    funnel drop_reason) — shared by the funnel rollup and the weighted
    assembly oracle."""
    # AS MATERIALIZED on the expensive stage CTEs: DuckDB inlines
    # single-reference CTEs by default, which re-evaluates the embedded
    # recursive-CC retention plan and the gate scan wherever the
    # composition references them (measured 299 s -> 42 s at sf0.01).
    # Spark needs no analogue: the session-persisted dup_clusters
    # substrate plays the same role there.
    return f"""
WITH docs0 AS MATERIALIZED (
  SELECT doc_id, source, md5(text) AS content_hash,
    CAST(len({tokens_sql()}) AS BIGINT) AS n_tokens,
    {_split_label_sql(_split_bucket_sql("doc_id"))} AS split
  FROM documents
),
exact AS MATERIALIZED (
  SELECT doc_id,
    ROW_NUMBER() OVER (PARTITION BY content_hash ORDER BY doc_id) > 1
      AS is_exact_dup
  FROM docs0
),
near AS MATERIALIZED (
  SELECT doc_id, NOT keep AS is_near_dup FROM ({DEDUP_RETENTION_PLAN_SQL})
),
gates AS MATERIALIZED ({_funnel_gates_sql()}),
staged AS MATERIALIZED (
  SELECT b.doc_id, b.source, b.split, b.n_tokens,
    e.is_exact_dup,
    COALESCE(nd.is_near_dup, FALSE) AS is_near_dup,
    g.gate
  FROM docs0 b
  JOIN exact e USING (doc_id)
  LEFT JOIN near nd USING (doc_id)
  JOIN gates g USING (doc_id)
),
surv13 AS (
  SELECT doc_id, split FROM staged
  WHERE NOT is_exact_dup AND NOT is_near_dup AND gate = 'kept'
),
stok AS (
  SELECT d.doc_id, s.split, {tokens_sql()} AS tok
  FROM documents d JOIN surv13 s USING (doc_id)
),
ssh AS MATERIALIZED (
  SELECT doc_id, split, {shingles_sql("tok", DECON_NGRAM)} AS sh FROM stok
),
eval_sh AS (
  SELECT DISTINCT s
  FROM (SELECT unnest(sh) AS s FROM ssh WHERE split != 'train')
),
tr AS (
  SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_shingles, sh
  FROM ssh WHERE split = 'train'
),
hits AS (
  SELECT t.doc_id, COUNT(*) AS n_eval_hits
  FROM (SELECT doc_id, unnest(sh) AS s FROM tr) t
  JOIN eval_sh e ON t.s = e.s
  GROUP BY t.doc_id
),
contaminated AS (
  SELECT tr.doc_id
  FROM tr LEFT JOIN hits ON tr.doc_id = hits.doc_id
  WHERE tr.n_shingles > 0
    AND COALESCE(hits.n_eval_hits, 0) >= {DECON_TAU} * tr.n_shingles
),
reason AS (
  SELECT st.doc_id, st.source, st.n_tokens,
    CASE
      WHEN st.is_exact_dup THEN 'exact_dup'
      WHEN st.is_near_dup THEN 'near_dup'
      WHEN st.gate != 'kept' THEN st.gate
      WHEN c.doc_id IS NOT NULL THEN 'contaminated'
      ELSE 'kept'
    END AS drop_reason
  FROM staged st LEFT JOIN contaminated c ON st.doc_id = c.doc_id
)"""


def _assembly_sql() -> str:
    stage_case = "CASE " + " ".join(
        f"WHEN drop_reason = '{s}' THEN {i}"
        for i, s in enumerate(FUNNEL_STAGES)
    ) + " END"
    return f"""{_staged_ctes()}
SELECT CAST({stage_case} AS BIGINT) AS stage, drop_reason,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM reason GROUP BY drop_reason ORDER BY stage
"""


CORPUS_ASSEMBLY_FUNNEL_SQL = _assembly_sql()


def _assembly_semdedup_sql() -> str:
    from ..operators.similarity import SEMDEDUP_PLAN_SQL

    stage_case = "CASE " + " ".join(
        f"WHEN drop_reason = '{s}' THEN {i}"
        for i, s in enumerate(FUNNEL_SEM_STAGES)
    ) + " END"
    return f"""{_staged_ctes()},
sem AS MATERIALIZED (
  SELECT vec_id AS doc_id, is_kept FROM ({SEMDEDUP_PLAN_SQL})
),
reason2 AS (
  SELECT r.doc_id, r.n_tokens,
    CASE
      WHEN r.drop_reason IN ('exact_dup', 'near_dup') THEN r.drop_reason
      WHEN s.doc_id IS NOT NULL AND NOT s.is_kept THEN 'semantic_dup'
      ELSE r.drop_reason
    END AS drop_reason
  FROM reason r LEFT JOIN sem s USING (doc_id)
)
SELECT CAST({stage_case} AS BIGINT) AS stage, drop_reason,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM reason2 GROUP BY drop_reason ORDER BY stage
"""


CORPUS_ASSEMBLY_SEMDEDUP_SQL = _assembly_semdedup_sql()


def corpus_assembly_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Close the measure→decide→ASSEMBLE loop (VERDICT r7 item 4): the
    funnel's kept documents are drawn per source according to the
    QUALITY-DERIVED token allocation ``mixture_weights_by_quality``
    computed (report card → weights → alloc_tokens), instead of a
    static mixture plan. Per source, documents are taken in
    deterministic (source, doc_id) order while the source's EXCLUSIVE
    running token total stays below its allocation — the boundary
    document is included, the same greedy take-while as sequence
    packing. One row per source: availability, allocation, and the
    realized draw with its fill rate.

    Scale shape: the staged funnel and the report card are the linear
    passes (both already registered queries sharing the session dedup
    substrate); the draw itself is one global range-partitioned prefix
    sum (operators/ranking — no single-partition window, no per-source
    window task) plus broadcast joins of the |sources|-row frames."""
    from .packing import mixture_weights_by_quality

    staged = staged_docs_table(spark, sf_dir)
    kept = staged.filter(F.col("drop_reason") == "kept").select(
        "doc_id", "source", "n_tokens"
    )
    pref = with_global_prefix_sum(kept, ["source", "doc_id"], "n_tokens")
    base = pref.groupBy("source").agg(F.min(PREFIX_COL).alias("_src_base"))
    w = mixture_weights_by_quality(spark, sf_dir).select(
        "source", "quality_weight", "alloc_tokens", "oversubscribed"
    )
    off = (F.col(PREFIX_COL) - F.col("_src_base")).cast("long")
    drawn = (
        pref.join(F.broadcast(base), "source")
        .join(F.broadcast(w.select("source", "alloc_tokens")), "source")
        .withColumn("drawn", off < F.col("alloc_tokens"))
    )
    stats = drawn.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept_docs"),
        F.sum("n_tokens").cast("long").alias("n_kept_tokens"),
        F.sum(F.when(F.col("drawn"), 1).otherwise(0))
        .cast("long")
        .alias("n_drawn_docs"),
        F.sum(F.when(F.col("drawn"), F.col("n_tokens")).otherwise(0))
        .cast("long")
        .alias("n_drawn_tokens"),
    )
    fill = (
        F.floor(
            F.col("n_drawn_tokens").cast("double")
            / F.col("alloc_tokens")
            * 10000
            + F.lit(0.5)
        )
        / 10000
    )
    return (
        w.join(stats, "source", "left")
        .select(
            "source",
            "quality_weight",
            F.col("alloc_tokens").cast("long").alias("alloc_tokens"),
            "oversubscribed",
            F.coalesce("n_kept_docs", F.lit(0)).cast("long").alias("n_kept_docs"),
            F.coalesce("n_kept_tokens", F.lit(0))
            .cast("long")
            .alias("n_kept_tokens"),
            F.coalesce("n_drawn_docs", F.lit(0))
            .cast("long")
            .alias("n_drawn_docs"),
            F.coalesce("n_drawn_tokens", F.lit(0))
            .cast("long")
            .alias("n_drawn_tokens"),
            F.when(
                F.col("alloc_tokens") > 0,
                F.coalesce(fill, F.lit(0.0)),
            ).alias("fill_rate"),
        )
        .orderBy("source")
    )


def _assembly_weighted_sql() -> str:
    from .packing import MIXTURE_WEIGHTS_BY_QUALITY_SQL

    return f"""{_staged_ctes()},
kept AS (
  SELECT doc_id, source, n_tokens FROM reason WHERE drop_reason = 'kept'
),
pref AS (
  SELECT *, COALESCE(SUM(n_tokens) OVER (
    PARTITION BY source ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM kept
),
wts AS (
  SELECT source, quality_weight, alloc_tokens, oversubscribed
  FROM ({MIXTURE_WEIGHTS_BY_QUALITY_SQL})
),
stats AS (
  SELECT p.source,
    CAST(COUNT(*) AS BIGINT) AS n_kept_docs,
    CAST(SUM(p.n_tokens) AS BIGINT) AS n_kept_tokens,
    CAST(SUM(CASE WHEN p.off < w.alloc_tokens THEN 1 ELSE 0 END) AS BIGINT)
      AS n_drawn_docs,
    CAST(SUM(CASE WHEN p.off < w.alloc_tokens THEN p.n_tokens ELSE 0 END)
      AS BIGINT) AS n_drawn_tokens
  FROM pref p JOIN wts w USING (source)
  GROUP BY p.source
)
SELECT w.source, w.quality_weight,
  CAST(w.alloc_tokens AS BIGINT) AS alloc_tokens,
  w.oversubscribed,
  CAST(COALESCE(s.n_kept_docs, 0) AS BIGINT) AS n_kept_docs,
  CAST(COALESCE(s.n_kept_tokens, 0) AS BIGINT) AS n_kept_tokens,
  CAST(COALESCE(s.n_drawn_docs, 0) AS BIGINT) AS n_drawn_docs,
  CAST(COALESCE(s.n_drawn_tokens, 0) AS BIGINT) AS n_drawn_tokens,
  CASE WHEN w.alloc_tokens > 0 THEN
    floor(CAST(COALESCE(s.n_drawn_tokens, 0) AS DOUBLE)
          / w.alloc_tokens * 10000 + 0.5) / 10000
  END AS fill_rate
FROM wts w LEFT JOIN stats s USING (source)
ORDER BY w.source
"""


CORPUS_ASSEMBLY_WEIGHTED_SQL = _assembly_weighted_sql()
