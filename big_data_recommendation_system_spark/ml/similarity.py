"""MLlib-native near-duplicate detection: HashingTF → MinHashLSH →
approxSimilarityJoin (the SURVEY §7.2 phase-7 building block).

This is the library alternative to the hand-rolled, oracle-exact LSH in
operators/text_dedup.py. MLlib's hash families are seeded internally, so
results are not reproducible in DuckDB — the query is registered without
an oracle (rows-only driver check) and its recall is instead validated
in pytest against the exact-jaccard baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..operators.text_dedup import (
    EXACT_PAIRS_MAX_DOC_ID,
    JACCARD_THRESHOLD,
    SHINGLE_N,
    _shingled_docs,
    ngram_jaccard_pairs,
)


def mllib_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs via MLlib MinHashLSH, verified with exact
    jaccard (same threshold as the hand-rolled operator).

    Bounded to the same audit slice as the exact-jaccard baseline it
    cross-checks (its recall is measured against that slice in pytest):
    this is the library CROSS-CHECK, not the production dedup path — the
    hand-rolled bucketed LSH (operators/text_dedup.py) covers the full
    corpus ~4× cheaper and oracle-checked, so the cross-check shouldn't
    dominate bench wall time."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    from ..operators.substrate import scoped_materialized

    # scoped materialization (MinHashLSH fit + both approxSimilarityJoin
    # sides read it) — no per-call CacheManager leak
    d = scoped_materialized(
        _shingled_docs(spark, sf_dir).filter(
            F.col("doc_id") < EXACT_PAIRS_MAX_DOC_ID
        )
    )
    tf = HashingTF(
        inputCol="sh", outputCol="features", numFeatures=1 << 18, binary=True
    )
    feats = tf.transform(d).filter(F.expr("size(sh) > 0"))
    # 4 OR-ed tables: P(miss) <= (1-J)^4 = 0.2^4 at the 0.8 threshold —
    # recall stays >= the pytest gate while approxSimilarityJoin's
    # per-table explode (the dominant bench cost of this cross-check)
    # halves vs the previous 8.
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=4, seed=42)
    model = lsh.fit(feats)
    # approxSimilarityJoin distance = jaccard DISTANCE (1 - similarity)
    joined = model.approxSimilarityJoin(
        feats, feats, 1.0 - JACCARD_THRESHOLD, distCol="jaccard_dist"
    )
    pairs = joined.filter(
        F.col("datasetA.doc_id") < F.col("datasetB.doc_id")
    ).select(
        F.col("datasetA.doc_id").alias("doc_a"),
        F.col("datasetB.doc_id").alias("doc_b"),
        (1.0 - F.col("jaccard_dist")).alias("jaccard"),
    )
    # exact-verify like the hand-rolled path (HashingTF collisions can
    # slightly inflate similarity)
    da = d.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    db = d.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    exact = (
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_union("sh_a", "sh_b"))
    )
    return (
        pairs.join(da, "doc_a")
        .join(db, "doc_b")
        .withColumn("jaccard", exact)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )


# Recall floor for the driver-visible agreement row, as an exact integer
# comparison (DEN * n_common >= NUM * n_exact) — same 0.9 floor the
# pytest pin enforces (tests/test_scale_paths.py).
MINHASH_AGREE_RECALL_NUM = 9
MINHASH_AGREE_RECALL_DEN = 10


def mllib_minhash_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable correctness row for the MLlib MinHashLSH path —
    third application of the agreement-companion trick
    (cosine_topk_agreement, als_topk_agreement): the seeded-internals
    query itself stays rows-only, but its AGREEMENT with the
    hash-verified exact baseline is a constant-shape, SQL-expressible
    row.

        n_exact_pairs    — |exact jaccard>=τ pairs| on the audit slice
                           (SQL-expressible: the ngram_jaccard_pairs
                           oracle count — hashes real data);
        recall_ge_90pct  — 1 iff 10·|mllib ∩ exact| >= 9·|exact|
                           (exact integer comparison, no division);
        verified_subset  — 1 iff every mllib pair IS an exact pair
                           (the post-join exact-jaccard verification
                           guarantees no false positives — a broken
                           verify filter drives this to 0).

    A wrong hash family, a broken approxSimilarityJoin explode, or a
    dropped verification filter flips a certificate to 0 and fails the
    driver hash; a legitimately-noisy LSH draw below the 0.9 floor also
    flags (documented tolerance-breach semantics, README "Verification
    model").

    Scale shape: both inputs are audit-slice bounded (EXACT_PAIRS_MAX_
    DOC_ID); the agreement join is pair-key equi-join on the slice's
    pair set — this is a cross-check row, not a production path."""
    truth = ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    got = (
        mllib_minhash_pairs(spark, sf_dir).select("doc_a", "doc_b").distinct()
    )
    n_exact = truth.agg(F.count(F.lit(1)).cast("long").alias("n_exact_pairs"))
    n_got = got.agg(F.count(F.lit(1)).cast("long").alias("_n_got"))
    n_common = (
        got.join(truth, ["doc_a", "doc_b"])
        .agg(F.count(F.lit(1)).cast("long").alias("_n_common"))
    )
    return (
        n_exact.crossJoin(F.broadcast(n_got))
        .crossJoin(F.broadcast(n_common))
        .select(
            "n_exact_pairs",
            (
                F.lit(MINHASH_AGREE_RECALL_DEN) * F.col("_n_common")
                >= F.lit(MINHASH_AGREE_RECALL_NUM) * F.col("n_exact_pairs")
            )
            .cast("long")
            .alias("recall_ge_90pct"),
            (F.col("_n_got") == F.col("_n_common"))
            .cast("long")
            .alias("verified_subset"),
        )
    )


def _minhash_agreement_sql() -> str:
    from ..operators.text_dedup import NGRAM_JACCARD_PAIRS_SQL

    return f"""WITH exact_pairs AS ({NGRAM_JACCARD_PAIRS_SQL})
SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs,
       CAST(1 AS BIGINT) AS recall_ge_90pct,
       CAST(1 AS BIGINT) AS verified_subset
FROM exact_pairs
"""


MLLIB_MINHASH_AGREEMENT_SQL = _minhash_agreement_sql()
