"""Recommendation layer — the reference's north-star ML scope
(reference README.md:62-75, project_structure.txt:92-103: ALS
collaborative filtering + item similarity; never implemented there).

- ``als_recommendations`` — MLlib ALS on the implicit-feedback matrix
  (user_id × item, rating = summed event weight, the D5 weight map as
  specified by main_pipeline.py:230-235). Iterative → no SQL oracle; the
  driver records the weaker rows-only check.
- ``item_cooccurrence`` — item-based CF neighborhood: co-engagement
  counts + cosine lift between items, fully SQL-expressible and
  oracle-checked. At scale this is the classic two-shuffle plan
  (user-item dedup, then item-pair self-join within user baskets) with a
  basket-size cap to bound the quadratic blowup of power users.

The events table has no product dimension, so the JSON prop ``k``
(0..99) serves as the item id — same shapes, same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.silver import silver_cte, silver_events

MAX_BASKET = 200  # cap per-user basket to bound the pair blowup (skew guard)


def user_item_matrix(silver: DataFrame) -> DataFrame:
    """(user_id, item_id, rating): implicit feedback = summed event weight."""
    return (
        silver.filter(F.col("prop_k").isNotNull())
        .groupBy("user_id", F.col("prop_k").alias("item_id"))
        .agg(F.sum("event_weight").alias("rating"))
    )


# The three registered ALS queries (recommendations, offline eval,
# serving agreement) all read ONE fitted model per (session, corpus) —
# the production shape (train once per snapshot, serve/evaluate many) —
# so bench harnesses group them behind the "als:model" builder.
ALS_CONSUMERS = frozenset(
    {"als_recommendations", "als_eval_metrics", "als_topk_agreement"}
)


def als_model(spark: SparkSession, sf_dir: str):
    """Session-registered fitted ALS model (implicit, seeded): trained
    once per (session, corpus) and shared by every ALS query. The
    factor DataFrames are model-owned (not SQL-cache entries), so an
    external clearCache() cannot invalidate them."""
    from pyspark.ml.recommendation import ALS

    from ..operators.substrate import session_object

    def build():
        ratings = user_item_matrix(silver_events(spark, sf_dir))
        als = ALS(
            rank=8,
            maxIter=5,
            regParam=0.1,
            implicitPrefs=True,
            alpha=1.0,
            seed=42,
            userCol="user_id",
            itemCol="item_id",
            ratingCol="rating",
            coldStartStrategy="drop",
        )
        return als.fit(ratings)

    return session_object(spark, sf_dir, "als:model", build)


def als_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 item recommendations per user from ALS (implicit, seeded)."""
    model = als_model(spark, sf_dir)
    recs = model.recommendForAllUsers(5)
    return recs.select(
        "user_id",
        F.posexplode("recommendations").alias("pos", "rec"),
    ).select(
        "user_id",
        (F.col("pos") + 1).alias("rank"),
        F.col("rec.item_id").alias("item_id"),
        F.col("rec.rating").cast("double").alias("score"),
    )


def cap_baskets(ui: DataFrame, max_basket: int = MAX_BASKET) -> DataFrame:
    """Skew guard for the pair self-join: drop users whose basket exceeds
    ``max_basket`` distinct items. A single power user with 50k items would
    otherwise emit ~1.25B pair rows in one key group — the quadratic
    blowup that kills the zipfian tail at 100 TB. Whole-partition count
    window: one shuffle on user_id, reused by the self-join that follows."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id")
    return (
        ui.withColumn("_basket_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_basket_n") <= max_basket)
        .drop("_basket_n")
    )


def item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-occurrence with cosine normalization, top-5 neighbors
    per item (deterministic tie-breaks). Baskets larger than MAX_BASKET
    are excluded before the self-join (see cap_baskets); item user-counts
    are computed over the same capped frame so cosine stays consistent."""
    from pyspark.sql.window import Window

    silver = silver_events(spark, sf_dir)
    ui = cap_baskets(
        silver.filter(F.col("prop_k").isNotNull())
        .select("user_id", F.col("prop_k").alias("item_id"))
        .distinct()
    )
    item_counts = ui.groupBy("item_id").agg(F.count(F.lit(1)).alias("n_users"))
    a = ui.alias("a")
    b = ui.alias("b")
    pairs = (
        a.join(b, (F.col("a.user_id") == F.col("b.user_id")) & (F.col("a.item_id") < F.col("b.item_id")))
        .groupBy(F.col("a.item_id").alias("item_a"), F.col("b.item_id").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("co_count"))
    )
    na = item_counts.select(
        F.col("item_id").alias("item_a"), F.col("n_users").alias("n_a")
    )
    nb = item_counts.select(
        F.col("item_id").alias("item_b"), F.col("n_users").alias("n_b")
    )
    scored = (
        pairs.join(F.broadcast(na), "item_a")
        .join(F.broadcast(nb), "item_b")
        .withColumn(
            "cosine", F.col("co_count") / F.sqrt(F.col("n_a").cast("double") * F.col("n_b"))
        )
    )
    w = Window.partitionBy("item_a").orderBy(
        F.desc("cosine"), F.desc("co_count"), F.asc("item_b")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("item_a", "item_b", "co_count", "cosine", "rank")
    )


ITEM_COOCCURRENCE_SQL = silver_cte(f"""
, ui0 AS (
  SELECT DISTINCT user_id, prop_k AS item_id FROM silver WHERE prop_k IS NOT NULL
), ui AS (
  SELECT user_id, item_id FROM ui0
  QUALIFY COUNT(*) OVER (PARTITION BY user_id) <= {MAX_BASKET}
), ic AS (
  SELECT item_id, COUNT(*) AS n_users FROM ui GROUP BY item_id
), pairs AS (
  SELECT a.item_id AS item_a, b.item_id AS item_b, COUNT(*) AS co_count
  FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item_id < b.item_id
  GROUP BY a.item_id, b.item_id
)
SELECT item_a, item_b, co_count, cosine, rank FROM (
  SELECT item_a, item_b, co_count,
    co_count / sqrt(CAST(na.n_users AS DOUBLE) * nb.n_users) AS cosine,
    ROW_NUMBER() OVER (
      PARTITION BY item_a
      ORDER BY co_count / sqrt(CAST(na.n_users AS DOUBLE) * nb.n_users) DESC,
               co_count DESC, item_b ASC
    ) AS rank
  FROM pairs
  JOIN ic na ON na.item_id = item_a
  JOIN ic nb ON nb.item_id = item_b
)
WHERE rank <= 5
""")


def als_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline evaluation row for the ALS layer (VERDICT r3 item 8): per
    the classic implicit-feedback protocol, compare ALS top-5 hit rate
    against the global-popularity top-5 baseline on the engaged
    (user, item) matrix. One output row:

      n_users, als_hits, als_hit_rate, pop_hits, pop_hit_rate, lift

    ALS is iterative (seeded but not SQL-expressible), so this stays a
    rows-only driver entry — the value of the row is the pytest-pinned
    invariant (hit rate floor + stable shape), which catches a broken
    model pipeline (wrong matrix, wrong explode, cold-start regression)
    even without a value hash.

    Scale shape: recs ⋈ matrix on (user, item) — both keyed, linear;
    the popularity baseline is a broadcast 5-row frame."""
    silver = silver_events(spark, sf_dir)
    ui = (
        silver.filter(F.col("prop_k").isNotNull())
        .select("user_id", F.col("prop_k").alias("item_id"))
        .distinct()
    )
    recs = als_recommendations(spark, sf_dir).select("user_id", "item_id")
    als_hits = (
        recs.join(ui, ["user_id", "item_id"])
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    pop5 = (
        ui.groupBy("item_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("item_id"))
        .limit(5)
        .select("item_id")
    )
    pop_hits = (
        ui.join(F.broadcast(pop5), "item_id")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    users = ui.select("user_id").distinct()
    joined = (
        users.join(
            als_hits.withColumnRenamed("hits", "als_h"), "user_id", "left"
        )
        .join(pop_hits.withColumnRenamed("hits", "pop_h"), "user_id", "left")
        .select(
            F.coalesce("als_h", F.lit(0)).alias("als_h"),
            F.coalesce("pop_h", F.lit(0)).alias("pop_h"),
        )
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("als_h").alias("als_hits"),
        (F.sum("als_h").cast("double") / (F.count(F.lit(1)) * 5)).alias(
            "als_hit_rate"
        ),
        F.sum("pop_h").alias("pop_hits"),
        (F.sum("pop_h").cast("double") / (F.count(F.lit(1)) * 5)).alias(
            "pop_hit_rate"
        ),
        (
            F.sum("als_h").cast("double")
            / F.greatest(F.sum("pop_h"), F.lit(1)).cast("double")
        ).alias("lift"),
    )


def als_input_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic implicit-feedback (user_id, item_id, rating)
    matrix that FEEDS ALS — registered with a DuckDB oracle so the
    nondeterministic-factorization family gains a hash-checked anchor
    upstream of the model fit (VERDICT r6 item 7): a wrong weight map,
    broken JSON prop extraction, or a filter regression now fails the
    value hash here rather than only nudging the pytest lift floor.

    Scale shape: one map-side-combined hash aggregation over silver on
    (user_id, item_id) — exactly the matrix ALS partitions by user/item
    blocks downstream; linear, no skew beyond what salted_agg handles."""
    return (
        user_item_matrix(silver_events(spark, sf_dir))
        .select(
            "user_id",
            F.col("item_id").cast("int").alias("item_id"),
            F.col("rating").cast("long").alias("rating"),
        )
        .orderBy("user_id", "item_id")
    )


ALS_INPUT_MATRIX_SQL = silver_cte("""
SELECT user_id,
  CAST(prop_k AS INT) AS item_id,
  CAST(SUM(event_weight) AS BIGINT) AS rating
FROM silver
WHERE prop_k IS NOT NULL
GROUP BY 1, 2
ORDER BY user_id, item_id
""")


# --- serving-path agreement anchor (driver-hashable despite ALS) -------------

ALS_AGREE_K = 5
# Margin absorbs float32-vs-float64 summation-order ulps at the top-k
# boundary: every MLlib top-5 item must appear in the explicit top-8.
ALS_AGREE_MARGIN = 3


def als_topk_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable correctness row for the ALS SERVING path (the
    cosine_topk_agreement trick, operators/similarity.py): train once,
    then compare MLlib's ``recommendForAllUsers(k)`` against an explicit
    factor-matrix top-(k+margin) computed in DataFrame algebra from the
    SAME trained factors. When the serving path is correct every user's
    intersection is exactly k, so the output row

        (n_users, min_common, max_common) = (|users|, k, k)

    is a CONSTANT despite the nondeterministic factorization — n_users
    is SQL-expressible from the ratings matrix, making this family's
    serving path value-hashable (the factors themselves stay covered by
    the pytest lift pin). A transposed factor join, wrong dot fold, or
    broken explode drives min_common toward 0 and fails the hash.

    Scale shape: the explicit check is user x item with the item-factor
    frame broadcast — the same O(U x I) class as recommendForAllUsers
    itself; at production scale both run over a sampled user set."""
    from pyspark.sql.window import Window

    model = als_model(spark, sf_dir)
    recs = model.recommendForAllUsers(ALS_AGREE_K).select(
        "user_id", F.explode("recommendations.item_id").alias("item_id")
    )
    uf = model.userFactors.select(
        F.col("id").alias("user_id"), F.col("features").alias("u_f")
    )
    itf = model.itemFactors.select(
        F.col("id").alias("item_id"), F.col("features").alias("i_f")
    )
    scored = uf.join(F.broadcast(itf), F.lit(True)).withColumn(
        "score",
        F.expr(
            "aggregate(zip_with(u_f, i_f, (x, y) -> CAST(x AS DOUBLE) * y),"
            " 0D, (acc, v) -> acc + v)"
        ),
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("score"), F.asc("item_id"))
    explicit = (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= ALS_AGREE_K + ALS_AGREE_MARGIN)
        .select("user_id", "item_id")
    )
    common = (
        recs.join(explicit, ["user_id", "item_id"])
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    # left join from the recommended users so a fully-broken path yields
    # min_common = 0, not a silently shrunken row set
    per_user = (
        recs.select("user_id")
        .distinct()
        .join(common, "user_id", "left")
        .select(F.coalesce("n_common", F.lit(0)).alias("n_common"))
    )
    return per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.min("n_common").cast("long").alias("min_common"),
        F.max("n_common").cast("long").alias("max_common"),
    )


ALS_TOPK_AGREEMENT_SQL = silver_cte(f"""
SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST({ALS_AGREE_K} AS BIGINT) AS min_common,
       CAST({ALS_AGREE_K} AS BIGINT) AS max_common
FROM silver WHERE prop_k IS NOT NULL
""")
