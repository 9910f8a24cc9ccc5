"""Similarity search over an embedding column (array<float>).

Two implementations of cosine top-k:

- ``ann_cosine_topk`` — brute-force baseline, *oracle-exact*: dot products
  and norms accumulate as DECIMAL over position-exploded rows, so the
  result is order-independent and identical between Spark and DuckDB.
- ``cosine_topk_fast`` — production path: array-native ``F.zip_with`` +
  ``F.aggregate`` fold (single JVM pass per pair, no explode). Same
  semantics up to float-summation order; used by bench.
- ``ann_ivf_topk`` — the 100 TB scale path: coarse quantization (assign
  every vector to its nearest of K centroids), then search only the
  query's cell. Turns the O(N·Q) cross product into O(N·K + per-cell),
  the standard IVF trade-off. Also oracle-exact (deterministic
  centroids = lowest vec_ids, decimal accumulation, deterministic
  tie-breaks everywhere).

At real scale the explode-based exact variants shuffle (pair, pos) rows —
use cosine_topk_fast + IVF; the exact ones are the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .emb_substrate import emb_dims, emb_norms, emb_table, session_frame

TOP_K = 5
N_QUERIES = 10  # queries = vec_id < 10
IVF_CENTROIDS = 8  # centroids = vec_id < 8

_DEC = "decimal(38,12)"


def _dims(df: DataFrame, id_alias: str) -> DataFrame:
    """(id, pos, x:double) position-exploded embedding. The input is
    spread first: the 64x explode and every decimal fold chained onto it
    would otherwise run on the single-row-group scan's one partition
    (see sources.tables.spread_small_scan)."""
    from ..sources.tables import spread_small_scan

    return spread_small_scan(df).select(
        F.col("vec_id").alias(id_alias),
        F.posexplode(F.col("embedding")),
    ).select(id_alias, F.col("pos"), F.col("col").cast("double").alias("x"))


def _norms_from_dims(dims: DataFrame, id_col: str, norm_alias: str) -> DataFrame:
    return dims.groupBy(id_col).agg(
        F.sqrt(F.sum((F.col("x") * F.col("x")).cast(_DEC)).cast("double")).alias(
            norm_alias
        )
    )


def _norms(df: DataFrame, id_alias: str, norm_alias: str) -> DataFrame:
    return _norms_from_dims(_dims(df, id_alias), id_alias, norm_alias)


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for query vectors vec_id < 10.

    Reads the session substrates (operators/emb_substrate.py): the
    persisted position-explode feeds both dot sides and the persisted
    norms feed both norm joins — shared with the whole similarity
    family instead of the per-query .cache() of rounds ≤7."""
    dims = emb_dims(spark, sf_dir)
    norms = emb_norms(spark, sf_dir)
    qd = dims.filter(F.col("vid") < N_QUERIES).select(
        F.col("vid").alias("query_id"), "pos", F.col("x").alias("qx")
    )
    cd = dims.select(
        F.col("vid").alias("neighbor_id"), "pos", F.col("x").alias("cx")
    )
    dots = (
        F.broadcast(qd)
        .join(cd, "pos")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum((F.col("qx") * F.col("cx")).cast(_DEC)).cast("double").alias("dot"))
    )
    qn = norms.filter(F.col("vid") < N_QUERIES).select(
        F.col("vid").alias("query_id"), F.col("nrm").alias("qnorm")
    )
    cn = norms.select(
        F.col("vid").alias("neighbor_id"), F.col("nrm").alias("cnorm")
    )
    scored = (
        dots.join(F.broadcast(qn), "query_id")
        .join(cn, "neighbor_id")
        .withColumn("cosine", F.col("dot") / (F.col("qnorm") * F.col("cnorm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


ANN_COSINE_TOPK_SQL = f"""
WITH dims AS (
  SELECT vec_id, i AS pos, CAST(embedding[i + 1] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(64) r(i)
), norms AS (
  SELECT vec_id, sqrt(CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
  FROM dims GROUP BY vec_id
), dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(SUM(CAST(q.x * c.x AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM dims q JOIN dims c ON q.pos = c.pos
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id != c.vec_id
  GROUP BY q.vec_id, c.vec_id
), scored AS (
  SELECT query_id, neighbor_id, dot / (qn.nrm * cn.nrm) AS cosine
  FROM dots JOIN norms qn ON qn.vec_id = query_id JOIN norms cn ON cn.vec_id = neighbor_id
)
SELECT query_id, neighbor_id, rank, cosine
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
"""


def cosine_topk_fast(
    emb: DataFrame, queries: DataFrame, k: int = TOP_K
) -> DataFrame:
    """Array-native brute-force cosine top-k (bench/production path):
    broadcast the queries, fold dot products JVM-side, no explode."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))
    pairs = c.crossJoin(F.broadcast(q)).filter(
        F.col("query_id") != F.col("neighbor_id")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    scored = pairs.withColumn(
        "cosine",
        dot(F.col("qe"), F.col("ce"))
        / (F.sqrt(dot(F.col("qe"), F.col("qe"))) * F.sqrt(dot(F.col("ce"), F.col("ce")))),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def cosine_topk_fast_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry/bench wrapper for the PRODUCTION brute-force path: same
    query set as ann_cosine_topk (vec_id < 10) so the bench reports the
    array-native plan as the headline brute-force number. Rows-only driver
    check (scores hit double-accumulation-order ulps); neighbor-set
    agreement vs the oracle-exact path is asserted in pytest
    (test_fast_cosine_matches_exact). Reads the session substrate's raw
    float arrays, so semantics are byte-identical to a direct scan."""
    emb = emb_table(spark, sf_dir).select("vec_id", "embedding")
    return cosine_topk_fast(emb, emb.filter(F.col("vec_id") < 10))


def cosine_topk_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable correctness row for the PRODUCTION ANN path: per
    query, the size of the intersection between the array-native fold's
    top-k neighbor set (cosine_topk_fast) and the oracle-exact explode
    path's. The oracle asserts n_common = TOP_K for every query, so any
    fast-path regression — wrong fold, wrong tie-break, dropped
    self-pair filter — shows up as a hash mismatch even though the fast
    path's raw cosine doubles (summation-order ulps) can't be hashed
    directly."""
    emb = emb_table(spark, sf_dir).select("vec_id", "embedding")
    fast = cosine_topk_fast(emb, emb.filter(F.col("vec_id") < N_QUERIES))
    exact = ann_cosine_topk(spark, sf_dir)
    return (
        fast.select("query_id", "neighbor_id")
        .join(
            exact.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .orderBy("query_id")
    )


COSINE_TOPK_AGREEMENT_SQL = f"""
WITH dims AS (
  SELECT vec_id, i AS pos, CAST(embedding[i + 1] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(64) r(i)
), norms AS (
  SELECT vec_id, sqrt(CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
  FROM dims GROUP BY vec_id
), dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(SUM(CAST(q.x * c.x AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM dims q JOIN dims c ON q.pos = c.pos
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id != c.vec_id
  GROUP BY q.vec_id, c.vec_id
), scored AS (
  SELECT query_id, neighbor_id, dot / (qn.nrm * cn.nrm) AS cosine
  FROM dots JOIN norms qn ON qn.vec_id = query_id JOIN norms cn ON cn.vec_id = neighbor_id
)
SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_common
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
GROUP BY query_id
ORDER BY query_id
"""


def _ivf_assignments(
    emb: DataFrame,
    dims: DataFrame | None = None,
    norms: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, centroid_id): every vector assigned to its nearest of the
    deterministic centroids (vec_id < IVF_CENTROIDS) by cosine, ties to
    the lowest centroid id. Callers that already hold the exploded
    ``(vid, pos, x)`` frame / the ``(vid, nrm)`` norms pass them in
    (cached), so the table isn't re-exploded for the assignment pass."""
    if dims is None:
        dims = _dims(emb, "vid")
    if norms is None:
        norms = _norms_from_dims(dims, "vid", "nrm")
    cd = dims.filter(F.col("vid") < IVF_CENTROIDS).select(
        F.col("vid").alias("centroid_id"), "pos", F.col("x").alias("cx")
    )
    cn = norms.filter(F.col("vid") < IVF_CENTROIDS).select(
        F.col("vid").alias("centroid_id"), F.col("nrm").alias("cnorm")
    )
    vd = dims.select(F.col("vid").alias("vec_id2"), "pos", F.col("x").alias("x"))
    vn = norms.select(F.col("vid").alias("vec_id2"), F.col("nrm").alias("vnorm"))
    sims = (
        vd.join(F.broadcast(cd), "pos")
        .groupBy("vec_id2", "centroid_id")
        .agg(F.sum((F.col("x") * F.col("cx")).cast(_DEC)).cast("double").alias("dot"))
        .join(F.broadcast(cn), "centroid_id")
        .join(vn, "vec_id2")
        .withColumn("cos_c", F.col("dot") / (F.col("vnorm") * F.col("cnorm")))
    )
    # (cos DESC, centroid ASC) argmax as a row_number window. NOT a
    # min(struct(...)) aggregation: Min over a struct buffer cannot use
    # HashAggregate and silently plans as SortAggregate — sort by
    # vec_id2 on BOTH sides of the exchange, strictly worse than this
    # window's one exchange + one sort (measured 1.3-1.5x slower in the
    # r12 A/B; see OPTIMIZATION_r12.md "min(struct) postmortem").
    wc = Window.partitionBy("vec_id2").orderBy(F.desc("cos_c"), F.asc("centroid_id"))
    return (
        sims.withColumn("r", F.row_number().over(wc))
        .filter(F.col("r") == 1)
        .select(F.col("vec_id2").alias("vec_id"), "centroid_id")
    )


def ivf_assign_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session substrate: the FULL-corpus IVF assignment (vec_id,
    centroid_id), built once from the persisted dims/norms substrates
    and shared by every cell-probing query (ann_ivf_topk,
    knn_label_eval, ivf_probe_sweep, embedding_near_dup_pairs). Each
    vector's assignment depends only on the vector and the 8
    deterministic centroids, so audit-slice consumers FILTER this frame
    rather than re-assigning a sliced table — identical rows by
    construction. This is the coarse-quantizer index a production
    deployment materializes beside the corpus."""
    return session_frame(
        spark,
        sf_dir,
        "ivf_assign",
        lambda: _ivf_assignments(
            None, emb_dims(spark, sf_dir), emb_norms(spark, sf_dir)
        ),
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: assign all vectors to nearest of 8 deterministic
    centroids (vec_id < 8), then exact top-5 within the query's cell only.

    The persisted dims/norms/assignment substrates feed the assignment
    pass, both dot sides and both norm joins (previously per-query
    caches; before that, 4 independent explodes of the table)."""
    dims = emb_dims(spark, sf_dir)
    nrm = emb_norms(spark, sf_dir)
    assign = ivf_assign_table(spark, sf_dir)
    vd2 = dims.join(assign.withColumnRenamed("vec_id", "vid"), "vid")
    qd = vd2.filter(F.col("vid") < N_QUERIES).select(
        F.col("vid").alias("query_id"),
        F.col("centroid_id").alias("cell"),
        "pos",
        F.col("x").alias("qx"),
    )
    cdd = vd2.select(
        F.col("vid").alias("neighbor_id"),
        F.col("centroid_id").alias("cell"),
        "pos",
        F.col("x").alias("cx"),
    )
    dots = (
        F.broadcast(qd)
        .join(cdd, ["cell", "pos"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum((F.col("qx") * F.col("cx")).cast(_DEC)).cast("double").alias("dot"))
    )
    scored = (
        dots.join(
            F.broadcast(
                nrm.withColumnRenamed("vid", "query_id").withColumnRenamed(
                    "nrm", "qnorm"
                )
            ),
            "query_id",
        )
        .join(
            nrm.withColumnRenamed("vid", "neighbor_id").withColumnRenamed(
                "nrm", "cnorm"
            ),
            "neighbor_id",
        )
        .withColumn("cosine", F.col("dot") / (F.col("qnorm") * F.col("cnorm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


ANN_IVF_TOPK_SQL = f"""
WITH dims AS (
  SELECT vec_id, i AS pos, CAST(embedding[i + 1] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(64) r(i)
), norms AS (
  SELECT vec_id, sqrt(CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
  FROM dims GROUP BY vec_id
), cdots AS (
  SELECT v.vec_id, c.vec_id AS centroid_id,
         CAST(SUM(CAST(v.x * c.x AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM dims v JOIN dims c ON v.pos = c.pos
  WHERE c.vec_id < {IVF_CENTROIDS}
  GROUP BY v.vec_id, c.vec_id
), assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT cd.vec_id, cd.centroid_id,
      ROW_NUMBER() OVER (
        PARTITION BY cd.vec_id
        ORDER BY cd.dot / (vn.nrm * cn.nrm) DESC, cd.centroid_id ASC
      ) AS r
    FROM cdots cd
    JOIN norms vn ON vn.vec_id = cd.vec_id
    JOIN norms cn ON cn.vec_id = cd.centroid_id
  ) WHERE r = 1
), dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(SUM(CAST(q.x * c.x AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM dims q
  JOIN assign qa ON qa.vec_id = q.vec_id
  JOIN assign ca ON qa.centroid_id = ca.centroid_id
  JOIN dims c ON c.vec_id = ca.vec_id AND q.pos = c.pos
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id != c.vec_id
  GROUP BY q.vec_id, c.vec_id
)
SELECT query_id, neighbor_id, rank, cosine
FROM (
  SELECT query_id, neighbor_id,
    dot / (qn.nrm * cn.nrm) AS cosine,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dot / (qn.nrm * cn.nrm) DESC, neighbor_id ASC) AS rank
  FROM dots JOIN norms qn ON qn.vec_id = query_id JOIN norms cn ON cn.vec_id = neighbor_id
)
WHERE rank <= {TOP_K}
"""


# --- embedding near-duplicate pairs (cell-blocked cosine threshold) ---------

NEAR_DUP_TAU = 0.4
NEAR_DUP_MAX_VEC_ID = 500  # oracle audit-slice bound (exact explode path)


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query form of the cell-blocked embedding near-dup
    pairs — served from the session substrate (shared with
    embedding_clusters and the text-side dup_detector_overlap)."""
    return emb_near_dup_pairs_table(spark, sf_dir)


def emb_near_dup_pairs_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session substrate over :func:`_embedding_near_dup_compute` —
    three registered queries read these pairs; computing them once per
    (session, corpus) mirrors the text side's dup_pairs substrate."""
    return session_frame(
        spark,
        sf_dir,
        "nd_pairs",
        lambda: _embedding_near_dup_compute(spark, sf_dir),
    )


def _embedding_near_dup_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection as a first-class pair
    query: all pairs (a < b) in the SAME IVF cell with cosine >= tau.

    This is the blocked-dedup shape that scales: candidate pairs are
    generated only inside coarse-quantization cells (the same trade-off
    as LSH banding — cross-cell near-dups are the documented recall
    loss; raise IVF_CENTROIDS with corpus size so cells stay bounded).
    Within each cell the scoring is exact decimal accumulation, so the
    query is fully oracle-checkable.

    Like the exact n-gram jaccard baseline, the REGISTERED query is an
    audit slice (vec_id < NEAR_DUP_MAX_VEC_ID — the whole table at
    sf<=0.01, ~1.5 s at any sf): position-exploded decimal accumulation is the oracle
    shape, not the throughput shape. The production variant is the same
    cell-blocked plan with the array-native fold of cosine_topk_fast
    (identical pairs up to summation-order ulps)."""
    return (
        _in_cell_cosines(spark, sf_dir)
        .filter(F.col("cosine") >= NEAR_DUP_TAU)
        .select("vec_a", "vec_b", "cosine")
    )


def _in_cell_cosines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session substrate: ALL in-cell pairs (a < b) of the audit slice
    with their exact cosine — the unfiltered frame behind the near-dup
    pairs (>= tau cut applied by the caller) and the contrastive-triplet
    miner (which also needs the sub-tau neighbors). Built once per
    (session, corpus); cell-blocked, never all-pairs."""

    def build() -> DataFrame:
        return _in_cell_cosines_compute(spark, sf_dir)

    return session_frame(spark, sf_dir, "allcos", build)


def in_cell_cosines_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Public builder for the in-cell cosine session substrate (bench
    attribution + any external consumer — the stable name for what
    :func:`_in_cell_cosines` registers)."""
    return _in_cell_cosines(spark, sf_dir)


def _in_cell_cosines_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    dims = emb_dims(spark, sf_dir).filter(F.col("vid") < NEAR_DUP_MAX_VEC_ID)
    nrm = emb_norms(spark, sf_dir).filter(F.col("vid") < NEAR_DUP_MAX_VEC_ID)
    # per-vector independence: the full-corpus assignment substrate
    # filtered to the slice equals assigning the sliced table (see
    # ivf_assign_table docstring)
    assign = ivf_assign_table(spark, sf_dir).filter(
        F.col("vec_id") < NEAR_DUP_MAX_VEC_ID
    )
    # both sides of the in-cell self-join re-join the PERSISTED dims and
    # assignment substrates — cheap rebuilds, no per-query cache
    vd = dims.join(assign.withColumnRenamed("vec_id", "vid"), "vid")
    a = vd.select(
        F.col("vid").alias("vec_a"),
        F.col("centroid_id").alias("cell"),
        "pos",
        F.col("x").alias("ax"),
    )
    b = vd.select(
        F.col("vid").alias("vec_b"),
        F.col("centroid_id").alias("cell"),
        "pos",
        F.col("x").alias("bx"),
    )
    dots = (
        a.join(b, ["cell", "pos"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .groupBy("vec_a", "vec_b")
        .agg(F.sum((F.col("ax") * F.col("bx")).cast(_DEC)).cast("double").alias("dot"))
    )
    return (
        dots.join(
            nrm.withColumnRenamed("vid", "vec_a").withColumnRenamed("nrm", "na"),
            "vec_a",
        )
        .join(
            nrm.withColumnRenamed("vid", "vec_b").withColumnRenamed("nrm", "nb"),
            "vec_b",
        )
        .withColumn("cosine", F.col("dot") / (F.col("na") * F.col("nb")))
        .select("vec_a", "vec_b", "cosine")
    )


_EMBEDDING_NEAR_DUP_CTE = f"""
WITH dims AS (
  SELECT vec_id, i AS pos, CAST(embedding[i + 1] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(64) r(i)
  WHERE vec_id < {NEAR_DUP_MAX_VEC_ID}
), norms AS (
  SELECT vec_id, sqrt(CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
  FROM dims GROUP BY vec_id
), cdots AS (
  SELECT v.vec_id, c.vec_id AS centroid_id,
         CAST(SUM(CAST(v.x * c.x AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM dims v JOIN dims c ON v.pos = c.pos
  WHERE c.vec_id < {IVF_CENTROIDS}
  GROUP BY v.vec_id, c.vec_id
), assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT cd.vec_id, cd.centroid_id,
      ROW_NUMBER() OVER (
        PARTITION BY cd.vec_id
        ORDER BY cd.dot / (vn.nrm * cn.nrm) DESC, cd.centroid_id ASC
      ) AS r
    FROM cdots cd
    JOIN norms vn ON vn.vec_id = cd.vec_id
    JOIN norms cn ON cn.vec_id = cd.centroid_id
  ) WHERE r = 1
), pdots AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         CAST(SUM(CAST(a.x * b.x AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM dims a
  JOIN assign aa ON aa.vec_id = a.vec_id
  JOIN assign ab ON ab.centroid_id = aa.centroid_id
  JOIN dims b ON b.vec_id = ab.vec_id AND b.pos = a.pos
  WHERE a.vec_id < b.vec_id
  GROUP BY 1, 2
), pairs AS (
  SELECT vec_a, vec_b, dot / (na.nrm * nb.nrm) AS cosine
  FROM pdots
  JOIN norms na ON na.vec_id = vec_a
  JOIN norms nb ON nb.vec_id = vec_b
  WHERE dot / (na.nrm * nb.nrm) >= {NEAR_DUP_TAU}
)
"""

EMBEDDING_NEAR_DUP_SQL = (
    _EMBEDDING_NEAR_DUP_CTE + "\nSELECT vec_a, vec_b, cosine FROM pairs"
)


def embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster assignment over embedding space: connected
    components (operators/text_dedup.connected_components — the same
    reusable min-label-propagation loop as the text LSH clusters) on the
    IVF-cell-blocked cosine pairs. Every vector in the audit slice gets
    cluster_id = min reachable vec_id, cluster_size, and the
    is_canonical keep/drop flag. Served from the session substrate —
    the union-detector clustering also seeds its CC from these labels."""
    return emb_clusters_table(spark, sf_dir)


def emb_clusters_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session substrate: CC labels over the embedding near-dup pairs,
    computed once per (session, corpus) — shared by the registered
    cluster query and ``cross_detector_dup_clusters`` (which seeds the
    union-graph CC with these labels: each is the min vec_id of an
    embedding component, a subset of the union component, so min-label
    monotonicity is preserved and union convergence only has to merge
    ACROSS detectors)."""

    def build() -> DataFrame:
        from .text_dedup import connected_components

        pairs = emb_near_dup_pairs_table(spark, sf_dir).select(
            F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
        )
        nodes = (
            emb_table(spark, sf_dir)
            .filter(F.col("vec_id") < NEAR_DUP_MAX_VEC_ID)
            .select(F.col("vec_id").alias("doc_id"))
        )
        return connected_components(nodes, pairs).select(
            F.col("doc_id").alias("vec_id"),
            "cluster_id",
            "cluster_size",
            "is_canonical",
        )

    return session_frame(spark, sf_dir, "nd_clusters", build)


# Recursive-CC fragment over the `pairs` CTE — shared verbatim by the
# cluster oracle and the SemDeDup oracle so the CC labeling rule cannot
# drift between them.
_CC_CTE = f"""
, edges AS (
  SELECT vec_a AS u, vec_b AS v FROM pairs
  UNION
  SELECT vec_b AS u, vec_a AS v FROM pairs
)
, reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
)
, labels AS (
  SELECT ee.vec_id,
    LEAST(ee.vec_id, COALESCE(MIN(r.v), ee.vec_id)) AS cluster_id
  FROM (SELECT vec_id FROM embeddings WHERE vec_id < {NEAR_DUP_MAX_VEC_ID}) ee
  LEFT JOIN reach r ON r.u = ee.vec_id
  GROUP BY ee.vec_id
)
, csizes AS (
  SELECT cluster_id, COUNT(*) AS cluster_size FROM labels GROUP BY cluster_id
)"""

EMBEDDING_CLUSTERS_SQL = (
    _EMBEDDING_NEAR_DUP_CTE.replace("WITH ", "WITH RECURSIVE ", 1)
    + _CC_CTE
    + """
SELECT l.vec_id, l.cluster_id, s.cluster_size,
  l.vec_id = l.cluster_id AS is_canonical
FROM labels l JOIN csizes s ON l.cluster_id = s.cluster_id
ORDER BY l.vec_id
"""
)


def _centroid_cosines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, centroid_id, centroid_cos) over the audit slice: each
    vector's exact cosine to its ASSIGNED IVF centroid — decimal-folded
    dot cast double once, divided by one IEEE product of the two norms
    (bit-identical across engines). Shared by :func:`semdedup_plan` and
    :func:`semdedup_incremental`; all inputs are persisted substrates,
    the new work is one pos-keyed join against 8 broadcast centroid
    rows."""
    dims = emb_dims(spark, sf_dir).filter(F.col("vid") < NEAR_DUP_MAX_VEC_ID)
    nrm = emb_norms(spark, sf_dir).filter(F.col("vid") < NEAR_DUP_MAX_VEC_ID)
    assign = ivf_assign_table(spark, sf_dir).filter(
        F.col("vec_id") < NEAR_DUP_MAX_VEC_ID
    )
    cdims = emb_dims(spark, sf_dir).filter(F.col("vid") < IVF_CENTROIDS)
    dots = (
        dims.join(assign.withColumnRenamed("vec_id", "vid"), "vid")
        .join(
            F.broadcast(
                cdims.select(
                    F.col("vid").alias("centroid_id"),
                    "pos",
                    F.col("x").alias("cx"),
                )
            ),
            ["centroid_id", "pos"],
        )
        .groupBy("vid", "centroid_id")
        .agg(F.sum((F.col("x") * F.col("cx")).cast(_DEC)).cast("double").alias("dot"))
    )
    return (
        dots.join(nrm.withColumnRenamed("nrm", "vnrm"), "vid")
        .join(
            F.broadcast(
                nrm.filter(F.col("vid") < IVF_CENTROIDS).select(
                    F.col("vid").alias("centroid_id"), F.col("nrm").alias("cnrm")
                )
            ),
            "centroid_id",
        )
        .select(
            F.col("vid").alias("vec_id"),
            "centroid_id",
            (F.col("dot") / (F.col("vnrm") * F.col("cnrm"))).alias("centroid_cos"),
        )
    )


def semdedup_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) semantic-dedup retention plan: the
    corpus is coarse-clustered by k-means (the IVF assignment — SemDeDup
    step 1), near-identical embeddings within a cluster form dup groups
    (the cell-blocked cosine pairs + connected components the engine
    already maintains — step 2), and within each dup group the member
    KEPT is the one with the LOWEST cosine to its assigned k-means
    centroid (step 3 — the paper's keep-the-outlier rule, which retains
    the most diverse representative instead of an arbitrary id).
    Singletons are their own group and always kept. Tie-break: lowest
    vec_id.

    Output per vector: dup-cluster id/size, assigned centroid, exact
    centroid cosine, and the keep flag. The dropped-row share is the
    semantic-dedup savings a curation run books.

    Exactness: centroid cosine = (decimal-folded dot, cast double once)
    / one IEEE product of the two norms — bit-identical across engines,
    so the per-group ordering (cos asc, vec_id asc) is hash-stable.
    Scale: all inputs are persisted substrates (pairs, CC labels, IVF
    assignment, dims/norms); the only new work is one (vec × assigned
    centroid) dot — a pos-keyed join against 8 broadcast centroid rows —
    and a per-dup-group window (groups are near-dup components, small by
    construction; a degenerate giant component is the documented CC
    caveat, not a window regression)."""
    clusters = emb_clusters_table(spark, sf_dir)
    ccos = _centroid_cosines(spark, sf_dir)
    # row_number window, not a min(struct) rollup: Min over a struct
    # buffer falls back to SortAggregate (no HashAggregate for complex
    # buffers), and the rollup+join-back variant measured 1.7x slower
    # in the r12 A/B (see OPTIMIZATION_r12.md "min(struct) postmortem").
    w = Window.partitionBy("cluster_id").orderBy(
        F.asc("centroid_cos"), F.asc("vec_id")
    )
    return (
        clusters.join(ccos, "vec_id")
        .select(
            "vec_id",
            "cluster_id",
            "cluster_size",
            "centroid_id",
            "centroid_cos",
            (F.row_number().over(w) == 1).alias("is_kept"),
        )
        .orderBy("vec_id")
    )


SEMDEDUP_PLAN_SQL = (
    _EMBEDDING_NEAR_DUP_CTE.replace("WITH ", "WITH RECURSIVE ", 1)
    + _CC_CTE
    + """
, ccos AS (
  SELECT a.vec_id, a.centroid_id,
         cd.dot / (vn.nrm * cn.nrm) AS centroid_cos
  FROM assign a
  JOIN cdots cd ON cd.vec_id = a.vec_id AND cd.centroid_id = a.centroid_id
  JOIN norms vn ON vn.vec_id = a.vec_id
  JOIN norms cn ON cn.vec_id = a.centroid_id
)
SELECT l.vec_id, l.cluster_id, s.cluster_size, c.centroid_id, c.centroid_cos,
  ROW_NUMBER() OVER (
    PARTITION BY l.cluster_id ORDER BY c.centroid_cos ASC, l.vec_id ASC
  ) = 1 AS is_kept
FROM labels l
JOIN csizes s ON l.cluster_id = s.cluster_id
JOIN ccos c ON c.vec_id = l.vec_id
ORDER BY l.vec_id
"""
)


def semdedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SemDeDup — the semantic-group member of the engine's
    O(batch) incremental family (document level: incremental_near_dup;
    vector level: srp_incremental_pairs; substring level:
    incremental_dup_spans; THIS closes the fourth granularity). Batch
    vectors (the SRP batch convention, vec_id % SRP_BATCH_MOD ==
    SRP_BATCH_REM) are assigned to the PERSISTED IVF centroids, cosine-
    scored against INDEXED same-cell members only (never batch × batch,
    never cross-cell — the same recall trade the full plan documents),
    and kept/dropped by the frozen-index centroid-outlier rule: a batch
    vector is dropped iff some indexed near-match (cosine >= tau) sits
    closer to the group's outlier position — (centroid_cos, vec_id)
    strictly below the batch vector's. Dropping is SOUND w.r.t. the
    full plan: a direct match shares the batch vector's CC group there,
    so an outranking match means the batch vector cannot be that
    group's row_number-1 keeper (pinned in pytest on the cross-boundary
    slice).

    Per batch vector: assigned centroid + exact centroid cosine, match
    stats (count, best match by cosine desc / id asc — NULL when
    clean), is_dup, keep.

    Scale shape: the batch side assigns via one pos-keyed join against
    8 broadcast centroid rows; the scoring join is ASYMMETRIC (batch
    dims ⋈ indexed dims on (cell, pos)) so per-batch work is O(batch ×
    cell occupancy); at production the indexed side reads the persisted
    assignment/dims snapshot. All decimal-exact, fully oracled."""
    return _semdedup_incremental_impl(spark, sf_dir, None)


def semdedup_incremental_for(
    spark: SparkSession, sf_dir: str, incoming: DataFrame
) -> DataFrame:
    """Frame-level incremental SemDeDup over an EXPLICIT incoming-id
    frame (vec_id column) — the streaming micro-batch entry point: the
    same asymmetric joins as :func:`semdedup_incremental`, restricted to
    the given vectors. Decisions are per-vector independent (each batch
    vector only ever compares against the FROZEN index), so the union
    over micro-batches equals the batch operator exactly — pinned by the
    streaming e2e twin."""
    return _semdedup_incremental_impl(spark, sf_dir, incoming)


def _semdedup_incremental_impl(
    spark: SparkSession, sf_dir: str, incoming: DataFrame | None
) -> DataFrame:
    from .srp import SRP_BATCH_MOD, SRP_BATCH_REM

    def is_batch(c):  # noqa: ANN001 — Column predicate
        return c % SRP_BATCH_MOD == SRP_BATCH_REM

    dims = emb_dims(spark, sf_dir).filter(F.col("vid") < NEAR_DUP_MAX_VEC_ID)
    nrm = emb_norms(spark, sf_dir).filter(F.col("vid") < NEAR_DUP_MAX_VEC_ID)
    assign = ivf_assign_table(spark, sf_dir).filter(
        F.col("vec_id") < NEAR_DUP_MAX_VEC_ID
    )
    vd = dims.join(assign.withColumnRenamed("vec_id", "vid"), "vid")
    b = vd.filter(is_batch(F.col("vid"))).select(
        F.col("vid").alias("vec_id"),
        F.col("centroid_id").alias("cell"),
        "pos",
        F.col("x").alias("bx"),
    )
    if incoming is not None:
        b = b.join(F.broadcast(incoming.select("vec_id")), "vec_id")
    ix = vd.filter(~is_batch(F.col("vid"))).select(
        F.col("vid").alias("match_id"),
        F.col("centroid_id").alias("cell"),
        "pos",
        F.col("x").alias("mx"),
    )
    pdots = (
        b.join(ix, ["cell", "pos"])
        .groupBy("vec_id", "match_id")
        .agg(
            F.sum((F.col("bx") * F.col("mx")).cast(_DEC))
            .cast("double")
            .alias("dot")
        )
    )
    matches = (
        pdots.join(
            nrm.select(F.col("vid").alias("vec_id"), F.col("nrm").alias("bn")),
            "vec_id",
        )
        .join(
            nrm.select(
                F.col("vid").alias("match_id"), F.col("nrm").alias("mn")
            ),
            "match_id",
        )
        .withColumn("cosine", F.col("dot") / (F.col("bn") * F.col("mn")))
        .filter(F.col("cosine") >= NEAR_DUP_TAU)
        .select("vec_id", "match_id", "cosine")
    )
    ccos = _centroid_cosines(spark, sf_dir)
    enriched = matches.join(
        ccos.select("vec_id", F.col("centroid_cos").alias("b_cos")), "vec_id"
    ).join(
        F.broadcast(
            ccos.select(
                F.col("vec_id").alias("match_id"),
                F.col("centroid_cos").alias("m_cos"),
            )
        ),
        "match_id",
    )
    # (cosine DESC, match_id ASC) best-match via row_number + one
    # grouped rollup. NOT min(struct(...)): struct buffers force a
    # SortAggregate fallback — slower than this window in the r12 A/B
    # (OPTIMIZATION_r12.md "min(struct) postmortem").
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cosine"), F.asc("match_id")
    )
    outranks = (F.col("m_cos") < F.col("b_cos")) | (
        (F.col("m_cos") == F.col("b_cos"))
        & (F.col("match_id") < F.col("vec_id"))
    )
    agg = (
        enriched.withColumn("_rn", F.row_number().over(w))
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matches"),
            F.max(F.when(F.col("_rn") == 1, F.col("match_id")))
            .cast("long")
            .alias("best_match_id"),
            F.max(F.when(F.col("_rn") == 1, F.col("cosine"))).alias(
                "best_match_cos"
            ),
            F.max(outranks.cast("int")).cast("long").alias("_outranked"),
        )
    )
    batch_cc = ccos.filter(is_batch(F.col("vec_id")))
    if incoming is not None:
        batch_cc = batch_cc.join(F.broadcast(incoming.select("vec_id")), "vec_id")
    return (
        batch_cc.join(F.broadcast(agg), "vec_id", "left")
        .select(
            "vec_id",
            "centroid_id",
            "centroid_cos",
            F.coalesce("n_matches", F.lit(0)).cast("long").alias("n_matches"),
            "best_match_id",
            "best_match_cos",
            (F.coalesce("n_matches", F.lit(0)) > 0).alias("is_dup"),
            (F.coalesce("_outranked", F.lit(0)) == 0).alias("keep"),
        )
        .orderBy("vec_id")
    )


def _semdedup_incremental_sql() -> str:
    from .srp import SRP_BATCH_MOD, SRP_BATCH_REM

    mod, rem = SRP_BATCH_MOD, SRP_BATCH_REM
    return (
        _EMBEDDING_NEAR_DUP_CTE
        + f"""
, ccos AS (
  SELECT a.vec_id, a.centroid_id,
         cd.dot / (vn.nrm * cn.nrm) AS centroid_cos
  FROM assign a
  JOIN cdots cd ON cd.vec_id = a.vec_id AND cd.centroid_id = a.centroid_id
  JOIN norms vn ON vn.vec_id = a.vec_id
  JOIN norms cn ON cn.vec_id = a.centroid_id
),
inc AS (
  SELECT
    CASE WHEN vec_a % {mod} = {rem} THEN vec_a ELSE vec_b END AS vec_id,
    CASE WHEN vec_a % {mod} = {rem} THEN vec_b ELSE vec_a END AS match_id,
    cosine
  FROM pairs
  WHERE (vec_a % {mod} = {rem}) != (vec_b % {mod} = {rem})
),
enriched AS (
  SELECT i.vec_id, i.match_id, i.cosine,
         bc.centroid_cos AS b_cos, mc.centroid_cos AS m_cos
  FROM inc i
  JOIN ccos bc ON bc.vec_id = i.vec_id
  JOIN ccos mc ON mc.vec_id = i.match_id
),
agg AS (
  SELECT vec_id,
    CAST(COUNT(*) AS BIGINT) AS n_matches,
    CAST(FIRST(match_id ORDER BY cosine DESC, match_id ASC) AS BIGINT)
      AS best_match_id,
    FIRST(cosine ORDER BY cosine DESC, match_id ASC) AS best_match_cos,
    CAST(MAX(CASE WHEN m_cos < b_cos
                    OR (m_cos = b_cos AND match_id < vec_id)
             THEN 1 ELSE 0 END) AS BIGINT) AS outranked
  FROM enriched GROUP BY vec_id
)
SELECT c.vec_id, c.centroid_id, c.centroid_cos,
  COALESCE(a.n_matches, 0) AS n_matches,
  a.best_match_id,
  a.best_match_cos,
  COALESCE(a.n_matches, 0) > 0 AS is_dup,
  COALESCE(a.outranked, 0) = 0 AS keep
FROM ccos c LEFT JOIN agg a ON a.vec_id = c.vec_id
WHERE c.vec_id % {mod} = {rem}
ORDER BY c.vec_id
"""
    )


SEMDEDUP_INCREMENTAL_SQL = _semdedup_incremental_sql()


def contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mine (anchor, positive, hard-negative) training triplets for an
    embedding model from the structures the dedup stack already
    maintains: POSITIVES are the near-dup pairs (in-cell cosine >= tau,
    the pair substrate), and the HARD NEGATIVE for each anchor is its
    highest-cosine in-cell neighbor BELOW tau (the classic
    hardest-negative-outside-the-positive-set mining rule; ties break to
    the lowest vec_id). One row per positive pair, anchored at the
    smaller id; anchors whose cell has no sub-tau neighbor yield no
    triplet (nothing to contrast against).

    This is the training-data-generation op a retrieval/embedding
    fine-tune consumes (mined in-batch negatives) — built entirely from
    the persisted dims/norms/assignment substrates with exact decimal
    cosines, so the triplet set is hash-stable. Scale: the candidate
    space is cell-blocked like every ANN query (never all-pairs); the
    per-anchor argmax is a keyed window over in-cell neighbors."""
    allc = _in_cell_cosines(spark, sf_dir)
    pos = allc.filter(F.col("cosine") >= NEAR_DUP_TAU).select(
        F.col("vec_a").alias("anchor_id"),
        F.col("vec_b").alias("positive_id"),
        F.col("cosine").alias("pos_cos"),
    )
    neigh = allc.select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst"), "cosine"
    ).unionByName(
        allc.select(
            F.col("vec_b").alias("src"), F.col("vec_a").alias("dst"), "cosine"
        )
    )
    # (cosine DESC, dst ASC) argmax as a row_number window — see the
    # min(struct) postmortem in OPTIMIZATION_r12.md (struct aggregation
    # buffers force SortAggregate; the window is faster).
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    neg = (
        neigh.filter(F.col("cosine") < NEAR_DUP_TAU)
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(
            F.col("src").alias("anchor_id"),
            F.col("dst").alias("negative_id"),
            F.col("cosine").alias("neg_cos"),
        )
    )
    return (
        pos.join(neg, "anchor_id")
        .select("anchor_id", "positive_id", "pos_cos", "negative_id", "neg_cos")
        .orderBy("anchor_id", "positive_id")
    )


CONTRASTIVE_TRIPLETS_SQL = (
    _EMBEDDING_NEAR_DUP_CTE
    + f"""
, allcos AS (
  SELECT vec_a, vec_b, dot / (na.nrm * nb.nrm) AS cosine
  FROM pdots
  JOIN norms na ON na.vec_id = vec_a
  JOIN norms nb ON nb.vec_id = vec_b
)
, neigh AS (
  SELECT vec_a AS src, vec_b AS dst, cosine FROM allcos
  UNION ALL
  SELECT vec_b AS src, vec_a AS dst, cosine FROM allcos
)
, neg AS (
  SELECT src AS anchor_id, dst AS negative_id, cosine AS neg_cos
  FROM (
    SELECT src, dst, cosine,
      ROW_NUMBER() OVER (PARTITION BY src ORDER BY cosine DESC, dst ASC) AS r
    FROM neigh WHERE cosine < {NEAR_DUP_TAU}
  ) WHERE r = 1
)
SELECT p.vec_a AS anchor_id, p.vec_b AS positive_id, p.cosine AS pos_cos,
       n.negative_id, n.neg_cos
FROM pairs p JOIN neg n ON n.anchor_id = p.vec_a
ORDER BY anchor_id, positive_id
"""
)


# --- kNN label-classification eval ------------------------------------------

# Eval slice: vec_id < 100 play the query set. The per-query in-cell
# scoring is the cheap part — the IVF assignment pass over the full
# corpus dominates this query's cost and is query-count-independent.
KNN_EVAL_QUERIES = 100
KNN_K = 5


def knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality eval: predict each eval vector's ``label`` by
    majority vote over its K nearest in-cell neighbors (IVF cell probe,
    exact decimal scoring inside the cell), and report the prediction
    against the true label.

    This is the standard "does the embedding space cluster by label"
    check a training-data pipeline runs after (re)embedding a corpus —
    the kNN-classifier accuracy proxy. Vote ties break to the lowest
    label id; neighbor ranking ties to the lowest vec_id (same
    determinism discipline as the ANN queries, so the DuckDB twin
    hash-matches). Scale shape identical to ann_ivf_topk: the cross
    product is cell-blocked, the persisted substrates feed every
    consumer."""
    dims = emb_dims(spark, sf_dir)
    nrm = emb_norms(spark, sf_dir)
    assign = ivf_assign_table(spark, sf_dir)
    vd2 = dims.join(assign.withColumnRenamed("vec_id", "vid"), "vid")
    qd = vd2.filter(F.col("vid") < KNN_EVAL_QUERIES).select(
        F.col("vid").alias("query_id"),
        F.col("centroid_id").alias("cell"),
        "pos",
        F.col("x").alias("qx"),
    )
    cdd = vd2.select(
        F.col("vid").alias("neighbor_id"),
        F.col("centroid_id").alias("cell"),
        "pos",
        F.col("x").alias("cx"),
    )
    dots = (
        F.broadcast(qd)
        .join(cdd, ["cell", "pos"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum((F.col("qx") * F.col("cx")).cast(_DEC)).cast("double").alias("dot"))
    )
    scored = (
        dots.join(
            F.broadcast(
                nrm.withColumnRenamed("vid", "query_id").withColumnRenamed(
                    "nrm", "qnorm"
                )
            ),
            "query_id",
        )
        .join(
            nrm.withColumnRenamed("vid", "neighbor_id").withColumnRenamed(
                "nrm", "cnorm"
            ),
            "neighbor_id",
        )
        .withColumn("cosine", F.col("dot") / (F.col("qnorm") * F.col("cnorm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    topk = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= KNN_K
    )
    labels = emb_table(spark, sf_dir).select(
        F.col("vec_id"), F.col("label").cast("long").alias("label")
    )
    votes = (
        topk.join(
            labels.withColumnRenamed("vec_id", "neighbor_id").withColumnRenamed(
                "label", "n_label"
            ),
            "neighbor_id",
        )
        .groupBy("query_id", "n_label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    # (votes DESC, label ASC) argmax as a row_number window over the
    # tiny (queries x labels) vote frame — see the min(struct)
    # postmortem in OPTIMIZATION_r12.md.
    wv = Window.partitionBy("query_id").orderBy(F.desc("n_votes"), F.asc("n_label"))
    pred = (
        votes.withColumn("_r", F.row_number().over(wv))
        .filter(F.col("_r") == 1)
        .select(
            "query_id",
            F.col("n_label").alias("predicted_label"),
            F.col("n_votes").cast("long").alias("n_votes"),
        )
    )
    return (
        labels.filter(F.col("vec_id") < KNN_EVAL_QUERIES)
        .withColumnRenamed("vec_id", "query_id")
        .join(pred, "query_id")
        .select(
            "query_id",
            "label",
            "predicted_label",
            "n_votes",
            (F.col("label") == F.col("predicted_label")).alias("correct"),
        )
        .orderBy("query_id")
    )


KNN_LABEL_EVAL_SQL = f"""
WITH dims AS (
  SELECT vec_id, i AS pos, CAST(embedding[i + 1] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(64) r(i)
), norms AS (
  SELECT vec_id, sqrt(CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
  FROM dims GROUP BY vec_id
), cdots AS (
  SELECT v.vec_id, c.vec_id AS centroid_id,
         CAST(SUM(CAST(v.x * c.x AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM dims v JOIN dims c ON v.pos = c.pos
  WHERE c.vec_id < {IVF_CENTROIDS}
  GROUP BY v.vec_id, c.vec_id
), assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT cd.vec_id, cd.centroid_id,
      ROW_NUMBER() OVER (
        PARTITION BY cd.vec_id
        ORDER BY cd.dot / (vn.nrm * cn.nrm) DESC, cd.centroid_id ASC
      ) AS r
    FROM cdots cd
    JOIN norms vn ON vn.vec_id = cd.vec_id
    JOIN norms cn ON cn.vec_id = cd.centroid_id
  ) WHERE r = 1
), dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(SUM(CAST(q.x * c.x AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM dims q
  JOIN assign qa ON qa.vec_id = q.vec_id
  JOIN assign ca ON qa.centroid_id = ca.centroid_id
  JOIN dims c ON c.vec_id = ca.vec_id AND q.pos = c.pos
  WHERE q.vec_id < {KNN_EVAL_QUERIES} AND q.vec_id != c.vec_id
  GROUP BY q.vec_id, c.vec_id
), topk AS (
  SELECT query_id, neighbor_id
  FROM (
    SELECT query_id, neighbor_id,
      ROW_NUMBER() OVER (
        PARTITION BY query_id
        ORDER BY dot / (qn.nrm * cn.nrm) DESC, neighbor_id ASC
      ) AS rank
    FROM dots JOIN norms qn ON qn.vec_id = query_id JOIN norms cn ON cn.vec_id = neighbor_id
  ) WHERE rank <= {KNN_K}
), votes AS (
  SELECT t.query_id, CAST(e.label AS BIGINT) AS n_label, COUNT(*) AS n_votes
  FROM topk t JOIN embeddings e ON e.vec_id = t.neighbor_id
  GROUP BY t.query_id, e.label
), pred AS (
  SELECT query_id, n_label AS predicted_label, CAST(n_votes AS BIGINT) AS n_votes
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY n_votes DESC, n_label ASC
    ) AS _r
    FROM votes
  ) WHERE _r = 1
)
SELECT e.vec_id AS query_id, CAST(e.label AS BIGINT) AS label,
       p.predicted_label, p.n_votes,
       CAST(e.label AS BIGINT) = p.predicted_label AS correct
FROM embeddings e
JOIN pred p ON p.query_id = e.vec_id
WHERE e.vec_id < {KNN_EVAL_QUERIES}
ORDER BY e.vec_id
"""


# --- int8 embedding quantization ---------------------------------------------

# Symmetric per-vector int8 range: q = round(x / scale), scale = max|x|/127.
QUANT_LEVELS = 127


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding column —
    the 4x compression pass a vector store applies before indexing —
    plus per-vector reconstruction-error stats to monitor quality drift.

    Pure map stage: every output value is computed per row from the
    vector alone (array max for the scale, element-wise round for the
    codes, an ordered array fold for the L1 error), so the operator
    scales linearly and shuffles nothing. The codes are emitted as a
    comma-joined string (concat_ws / array_to_string) rather than a raw
    array column: the correctness harness canonicalizes rows via pandas
    sort_values, which cannot order list cells — every registered query
    keeps its output schema scalar-only (see
    tests/test_oracle_queries.py::test_oracled_query_schemas_are_scalar_only).
    Vectors are assumed non-empty (fixed EMBED_DIM fixtures): on a
    zero-length array Spark's concat_ws yields '' while DuckDB's
    array_to_string yields NULL — the oracle wraps it in coalesce(.., '')
    so even that degenerate case agrees.
    Hash-discipline notes: scale
    and max_abs_err are single IEEE ops on identical float32 inputs
    (bit-identical across engines); the L1 sum is a per-row left
    fold whose order is the array order on both engines (bit-identical
    IEEE accumulation); round() ties away from zero in both Spark
    (HALF_UP) and DuckDB."""
    emb = emb_table(spark, sf_dir)
    xd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(xd, F.abs)) / F.lit(float(QUANT_LEVELS))
    q = F.when(F.col("scale") == 0.0, F.transform(F.col("xd"), lambda x: F.lit(0).cast("long"))).otherwise(
        F.transform(F.col("xd"), lambda x: F.round(x / F.col("scale")).cast("long"))
    )
    # per-row array fold: the accumulation order is the array order on
    # both engines (F.aggregate / list_reduce are left folds), so a plain
    # IEEE double sum is bit-deterministic here — no partition-order
    # hazard, unlike cross-row double sums which must go through decimal
    err = F.aggregate(
        F.col("xd"),
        F.lit(0.0),
        lambda acc, x: acc
        + F.abs(x - F.round(x / F.col("scale")) * F.col("scale")),
    )
    return (
        emb.select("vec_id", "embedding")
        .withColumn("xd", xd)
        .withColumn("scale", scale)
        .withColumn("quantized", q)
        .withColumn(
            "l1_err",
            F.when(F.col("scale") == 0.0, F.lit(0.0)).otherwise(err),
        )
        .withColumn(
            "max_abs_err",
            F.when(F.col("scale") == 0.0, F.lit(0.0)).otherwise(
                F.array_max(
                    F.transform(
                        F.col("xd"),
                        lambda x: F.abs(
                            x - F.round(x / F.col("scale")) * F.col("scale")
                        ),
                    )
                )
            ),
        )
        .select(
            "vec_id",
            F.size("quantized").cast("long").alias("n_dims"),
            "scale",
            # serialize the codes: concat_ws stringifies the bigint
            # elements, so "-3,0,5,..." is byte-identical across engines
            F.concat_ws(",", F.col("quantized")).alias("quantized"),
            "l1_err",
            "max_abs_err",
        )
        .orderBy("vec_id")
    )


EMBEDDING_QUANTIZE_SQL = f"""
WITH base AS (
  SELECT vec_id,
    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd,
    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / {QUANT_LEVELS}.0
      AS scale
  FROM embeddings
)
SELECT vec_id,
  CAST(len(xd) AS BIGINT) AS n_dims,
  scale,
  coalesce(array_to_string(
    CASE WHEN scale = 0.0
      THEN list_transform(xd, x -> CAST(0 AS BIGINT))
      ELSE list_transform(xd, x -> CAST(round(x / scale) AS BIGINT))
    END, ','), '') AS quantized,
  CASE WHEN scale = 0.0 THEN 0.0 ELSE
    list_reduce(
      list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(xd, x -> abs(x - round(x / scale) * scale))),
      (acc, x) -> acc + x)
  END AS l1_err,
  CASE WHEN scale = 0.0 THEN 0.0 ELSE
    list_max(list_transform(xd, x -> abs(x - round(x / scale) * scale)))
  END AS max_abs_err
FROM base
ORDER BY vec_id
"""


# --- k-means (Lloyd) over embeddings -----------------------------------------

# The IVF build path: refine the deterministic seed centroids (vectors
# vec_id < IVF_CENTROIDS, the same seeds _ivf_assignments probes) with
# Lloyd iterations. KMEANS_ITERS is small and fixed — at corpus scale
# each iteration is one broadcast join + two hash aggregations.
KMEANS_ITERS = 3


def _kmeans_assign(dims: DataFrame, cdims: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: (vid, cid, dist_fp) with squared-L2
    accumulated in 1e-12 fixed point — per-term round() ties away from
    zero in BOTH engines (Spark HALF_UP, DuckDB round-half-away), unlike
    double->DECIMAL casts which tie HALF_UP in Spark but HALF_EVEN in
    DuckDB and flipped centroid hashes by 1 ulp. Integer sums are exact
    and order-independent; ties break to the lowest centroid id."""
    d = dims.join(F.broadcast(cdims), "pos")
    sq = (F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))
    dist = d.groupBy("vid", "cid").agg(
        F.sum(F.round(sq * F.lit(1e12)).cast("long")).alias("dist_fp")
    )
    # argmin via ONE plain min() over the packed key dist_fp * 8 + cid:
    # cid < IVF_CENTROIDS = 8, so the packing is lexicographic
    # (dist_fp ASC, cid ASC) — the same tie-break as the former
    # row_number window — and a primitive BIGINT min IS a map-side-
    # combinable HashAggregate (a min over struct(dist_fp, cid) would
    # fall back to SortAggregate: complex aggregation buffers are not
    # hash-aggregable — the r12 A/B measured that variant SLOWER than
    # the window; see OPTIMIZATION_r12.md). Overflow headroom: dist_fp
    # = sum of 64 round(sq*1e12) terms stays packable while per-dim
    # |x - cx| <= ~1.3e2 (dist_fp*8 < 2^63 needs dist_fp < 1.15e18);
    # test embeddings and any unit-normalized production space sit
    # orders of magnitude below that.
    return dist.groupBy("vid").agg(
        F.min(F.col("dist_fp") * 8 + F.col("cid")).alias("_p")
    ).select(
        "vid",
        F.expr("_p % 8").cast("long").alias("cid"),
        F.expr("_p DIV 8").alias("dist_fp"),
    )


def _kmeans_new_centroids(assign: DataFrame, dims: DataFrame) -> DataFrame:
    """Per-cluster mean in each dimension, 1e-12 fixed point: exact
    integer sum, one double division chain at the end (deterministic
    across engines and partition orders)."""
    return (
        assign.select("vid", "cid")
        .join(dims, "vid")
        .groupBy("cid", "pos")
        .agg(
            (
                F.sum(F.round(F.col("x") * F.lit(1e12)).cast("long")).cast(
                    "double"
                )
                / F.count(F.lit(1))
                / F.lit(1e12)
            ).alias("cx")
        )
    )


def _kmeans_stats(assign: DataFrame) -> DataFrame:
    """Per-cluster member count + objective. The per-vid dist_fp longs
    ride a DECIMAL(38,0) sum (integral input, so no rounding ambiguity;
    plain BIGINT could overflow at corpus scale)."""
    return assign.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members"),
        (
            F.sum(F.col("dist_fp").cast("decimal(38,0)")).cast("double")
            / F.lit(1e12)
        ).alias("objective"),
    )


def kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE Lloyd iteration from the deterministic IVF seed centroids,
    fully oracle-checked: per (cluster, dimension), the recomputed
    centroid coordinate, plus the cluster's member count and squared-L2
    objective (both in 1e-12 fixed point). This is the hash-verified
    core the iterative kmeans_refine loop reuses — the assignment join,
    the argmin tie-break, and the mean arithmetic are identical there.

    Scale shape: centroid frame is K x dims rows (broadcast); the wide
    work is one groupBy(vid, cid) distance aggregation and one
    groupBy(cid, pos) mean — both map-side combined, shuffle keys
    narrow."""
    dims = emb_dims(spark, sf_dir)
    cdims = dims.filter(F.col("vid") < IVF_CENTROIDS).select(
        F.col("vid").alias("cid"), "pos", F.col("x").alias("cx")
    )
    assign = _kmeans_assign(dims, cdims)
    stats = _kmeans_stats(assign)
    return (
        _kmeans_new_centroids(assign, dims)
        .join(F.broadcast(stats), "cid")
        .select(
            F.col("cid").alias("cluster_id"),
            "pos",
            F.col("cx").alias("centroid_val"),
            "n_members",
            "objective",
        )
        .orderBy("cluster_id", "pos")
    )


KMEANS_STEP_SQL = f"""
WITH dims AS (
  SELECT vec_id AS vid, i AS pos, CAST(embedding[i + 1] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(64) r(i)
), cdims AS (
  SELECT vid AS cid, pos, x AS cx FROM dims WHERE vid < {IVF_CENTROIDS}
), dist AS (
  SELECT d.vid, c.cid,
    SUM(CAST(round((d.x - c.cx) * (d.x - c.cx) * 1e12) AS BIGINT)) AS dist_fp
  FROM dims d JOIN cdims c ON d.pos = c.pos
  GROUP BY d.vid, c.cid
), assign AS (
  SELECT vid, cid, dist_fp FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vid ORDER BY dist_fp ASC, cid ASC
    ) AS _r FROM dist
  ) WHERE _r = 1
), stats AS (
  SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_members,
    CAST(SUM(CAST(dist_fp AS DECIMAL(38,0))) AS DOUBLE) / 1e12 AS objective
  FROM assign GROUP BY cid
), centroids AS (
  SELECT a.cid, d.pos,
    CAST(SUM(CAST(round(d.x * 1e12) AS BIGINT)) AS DOUBLE) / COUNT(*) / 1e12
      AS cx
  FROM assign a JOIN dims d ON d.vid = a.vid
  GROUP BY a.cid, d.pos
)
SELECT c.cid AS cluster_id, c.pos, c.cx AS centroid_val,
       s.n_members, s.objective
FROM centroids c JOIN stats s ON s.cid = c.cid
ORDER BY cluster_id, pos
"""


def _kmeans_refine_sql() -> str:
    """Unrolled KMEANS_ITERS-iteration Lloyd twin (the pagerank-unroll
    trick): every iteration's assignment/means reuse the exact
    fixed-point algebra of KMEANS_STEP_SQL, chained through CTEs, so
    the per-iteration descent report hash-matches the Spark loop."""
    parts = [
        f"""WITH dims AS (
  SELECT vec_id AS vid, i AS pos, CAST(embedding[i + 1] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(64) r(i)
), c0 AS (
  SELECT vid AS cid, pos, x AS cx FROM dims WHERE vid < {IVF_CENTROIDS}
)"""
    ]
    for i in range(1, KMEANS_ITERS + 1):
        parts.append(
            f""", dist{i} AS (
  SELECT d.vid, c.cid,
    SUM(CAST(round((d.x - c.cx) * (d.x - c.cx) * 1e12) AS BIGINT)) AS dist_fp
  FROM dims d JOIN c{i - 1} c ON d.pos = c.pos
  GROUP BY d.vid, c.cid
), assign{i} AS (
  SELECT vid, cid, dist_fp FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vid ORDER BY dist_fp ASC, cid ASC
    ) AS _r FROM dist{i}
  ) WHERE _r = 1
), rep{i} AS (
  SELECT CAST({i} AS BIGINT) AS iteration,
    CAST(COUNT(DISTINCT cid) AS BIGINT) AS n_clusters,
    CAST(COUNT(*) AS BIGINT) AS n_members,
    CAST(SUM(CAST(dist_fp AS DECIMAL(38,0))) AS DOUBLE) / 1e12
      AS total_objective
  FROM assign{i}
), c{i} AS (
  SELECT a.cid, d.pos,
    CAST(SUM(CAST(round(d.x * 1e12) AS BIGINT)) AS DOUBLE) / COUNT(*) / 1e12
      AS cx
  FROM assign{i} a JOIN dims d ON d.vid = a.vid
  GROUP BY a.cid, d.pos
)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM rep{i}" for i in range(1, KMEANS_ITERS + 1)
    )
    return (
        "".join(parts)
        + f""", reps AS ({union})
SELECT iteration, n_clusters, n_members, total_objective,
  COALESCE(
    total_objective
      <= LAG(total_objective) OVER (ORDER BY iteration) + 1e-9,
    TRUE
  ) AS descended
FROM reps
ORDER BY iteration
"""
    )


KMEANS_REFINE_SQL = _kmeans_refine_sql()


def kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMEANS_ITERS Lloyd iterations from the IVF seed centroids; returns
    a descent report: one row per iteration with the total squared-L2
    objective, member count, and a ``descended`` flag (objective <=
    previous iteration's, Lloyd's invariant). FULLY hash-oracled as of
    r9 (previously rows-only): the total objective is the DECIMAL-exact
    sum of the fixed-point assignment distances divided ONCE (no
    cross-row double sum anywhere), and every iteration's centroid
    means are exact-integer-sum/count divisions — so the unrolled
    3-iteration DuckDB twin (KMEANS_REFINE_SQL) reproduces the report
    bit for bit. Iterative like connected_components/ALS: the loop is a
    fixed small number of rounds, each round localCheckpoints the
    K x dims centroid frame to truncate lineage (the frame is tiny —
    K*64 rows — so the checkpoint cost is negligible while keeping the
    plan depth constant). Monotone descent additionally pinned in
    pytest."""
    dims = emb_dims(spark, sf_dir)
    cdims = dims.filter(F.col("vid") < IVF_CENTROIDS).select(
        F.col("vid").alias("cid"), "pos", F.col("x").alias("cx")
    )
    iter_reports = []
    for i in range(KMEANS_ITERS):
        # persist the assignment so the iteration report and the new
        # centroids share ONE computation of it. r13 OPTIMIZATION
        # (r12 VERDICT #3; guide §1.2 fewer passes): the report agg and
        # the centroid agg are UNIONED into one frame and materialized
        # by ONE eager localCheckpoint, so each Lloyd round runs ONE
        # Spark job instead of two (report job + centroid job) — on
        # tiny iterative frames the per-round job/stage floor was the
        # measured cost (the r12 8-core run beat 32-core on this
        # query). Values are bit-identical: the two aggregations are
        # unchanged, only co-materialized, and the filter/select split
        # below re-separates the disjoint row kinds.
        assign = _kmeans_assign(dims, cdims).persist()
        rep = assign.agg(
            F.lit(i + 1).cast("long").alias("iteration"),
            F.countDistinct("cid").cast("long").alias("n_clusters"),
            F.count(F.lit(1)).cast("long").alias("n_members"),
            (
                F.sum(F.col("dist_fp").cast("decimal(38,0)")).cast("double")
                / F.lit(1e12)
            ).alias("total_objective"),
        ).select(
            F.lit("r").alias("_k"),
            "iteration",
            "n_clusters",
            "n_members",
            "total_objective",
            F.lit(None).cast("long").alias("cid"),
            F.lit(None).cast("int").alias("pos"),
            F.lit(None).cast("double").alias("cx"),
        )
        cent = _kmeans_new_centroids(assign, dims).select(
            F.lit("c").alias("_k"),
            F.lit(None).cast("long").alias("iteration"),
            F.lit(None).cast("long").alias("n_clusters"),
            F.lit(None).cast("long").alias("n_members"),
            F.lit(None).cast("double").alias("total_objective"),
            "cid",
            "pos",
            "cx",
        )
        both = rep.unionByName(cent).localCheckpoint(eager=True)
        iter_reports.append(
            both.filter(F.col("_k") == "r").select(
                "iteration", "n_clusters", "n_members", "total_objective"
            )
        )
        cdims = both.filter(F.col("_k") == "c").select("cid", "pos", "cx")
        assign.unpersist()
    report = iter_reports[0]
    for extra in iter_reports[1:]:
        report = report.unionByName(extra)
    w = Window.orderBy("iteration")  # KMEANS_ITERS rows — single partition OK
    return (
        report.withColumn(
            "descended",
            F.coalesce(
                F.col("total_objective")
                <= F.lag("total_objective").over(w) + F.lit(1e-9),
                F.lit(True),
            ),
        )
        .orderBy("iteration")
    )


# --- cluster quality: label purity ------------------------------------------


def cluster_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-quality evaluation against the labeled embeddings:
    assign every vector to its nearest seed centroid (the deterministic
    step-1 assignment shared with kmeans_step — same fixed-point argmin,
    same tie-break) and report per cluster the size, the majority label
    (ties to the lowest label id) and the purity share. The standard
    'does the vector space separate the classes' check run before
    trusting embeddings for dedup or sampling decisions.

    Scale shape: one broadcast-centroid distance agg (map-side combined)
    + two narrow rollups on (cid,label)/(cid); nothing wider than the
    assignment shuffle already paid by kmeans_step."""
    dims = emb_dims(spark, sf_dir)
    cdims = dims.filter(F.col("vid") < IVF_CENTROIDS).select(
        F.col("vid").alias("cid"), "pos", F.col("x").alias("cx")
    )
    assign = _kmeans_assign(dims, cdims).select("vid", "cid")
    lab = emb_table(spark, sf_dir).select(F.col("vec_id").alias("vid"), "label")
    counts = (
        assign.join(lab, "vid")
        .groupBy("cid", "label")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    major = (
        counts.groupBy("cid")
        .agg(
            F.max(
                F.struct(F.col("cnt"), (-F.col("label")).alias("neg_label"))
            ).alias("m"),
            F.sum("cnt").alias("n_members"),
        )
        .select(
            F.col("cid").alias("cluster_id"),
            "n_members",
            (-F.col("m.neg_label")).cast("int").alias("majority_label"),
            F.col("m.cnt").alias("n_majority"),
            (F.col("m.cnt").cast("double") / F.col("n_members")).alias(
                "purity"
            ),
        )
    )
    return major.orderBy("cluster_id")


CLUSTER_LABEL_PURITY_SQL = f"""
WITH dims AS (
  SELECT vec_id AS vid, i AS pos, CAST(embedding[i + 1] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(64) r(i)
), cdims AS (
  SELECT vid AS cid, pos, x AS cx FROM dims WHERE vid < {IVF_CENTROIDS}
), dist AS (
  SELECT d.vid, c.cid,
    SUM(CAST(round((d.x - c.cx) * (d.x - c.cx) * 1e12) AS BIGINT)) AS dist_fp
  FROM dims d JOIN cdims c ON d.pos = c.pos
  GROUP BY d.vid, c.cid
), assign AS (
  SELECT vid, cid FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vid ORDER BY dist_fp ASC, cid ASC
    ) AS _r FROM dist
  ) WHERE _r = 1
), counts AS (
  SELECT a.cid, e.label, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM assign a JOIN embeddings e ON e.vec_id = a.vid
  GROUP BY a.cid, e.label
), ranked AS (
  SELECT cid, label, cnt,
    ROW_NUMBER() OVER (PARTITION BY cid ORDER BY cnt DESC, label ASC) AS _r,
    SUM(cnt) OVER (PARTITION BY cid) AS n_members
  FROM counts
)
SELECT cid AS cluster_id, CAST(n_members AS BIGINT) AS n_members,
  CAST(label AS INTEGER) AS majority_label, cnt AS n_majority,
  CAST(cnt AS DOUBLE) / n_members AS purity
FROM ranked WHERE _r = 1
ORDER BY cluster_id
"""


# --- product quantization (PQ) + asymmetric-distance top-k -------------------

# 64-dim embeddings split into PQ_SUBS subspaces of PQ_SUBDIM dims; each
# subvector is coded as its nearest (exact L2, decimal-accumulated) of
# PQ_CENTROIDS deterministic codebook entries — the subvectors of the
# lowest vec_ids, same convention as the IVF coarse centroids. The
# corpus is then 8 small ints per vector (the classic PQ memory win:
# the ADC search never touches the raw corpus vectors).
PQ_SUBS = 8
PQ_SUBDIM = 8
PQ_CENTROIDS = 16
# ADC is a shortlist generator, not the final ranking: the re-rank stage
# computes exact distances for the top-PQ_SHORTLIST ADC candidates only.
PQ_SHORTLIST = 50


def _pq_sub_dims(dims: DataFrame) -> DataFrame:
    """(vid, s, pos, x): position-exploded embedding with subspace id,
    derived from a ``(vid, pos, x)`` dims frame (the persisted
    ``emb_dims`` substrate in the registered queries)."""
    return dims.select(
        "vid",
        F.floor(F.col("pos") / PQ_SUBDIM).cast("int").alias("s"),
        "pos",
        "x",
    )


def _pq_codes_frame(sub: DataFrame) -> DataFrame:
    """(vec_id, s, code): each vector's nearest codebook entry per
    subspace — exact L2 via decimal accumulation, ties to the lowest
    centroid id, so the assignment is order-independent and identical
    in the DuckDB twin."""
    cent = sub.filter(F.col("vid") < PQ_CENTROIDS).select(
        F.col("vid").alias("centroid_id"), "pos", F.col("x").alias("cx")
    )
    d = (
        sub.join(F.broadcast(cent), "pos")
        .groupBy("vid", "s", "centroid_id")
        .agg(
            F.sum(
                ((F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))).cast(
                    _DEC
                )
            ).alias("d")
        )
    )
    # (d ASC, centroid ASC) argmin as a row_number window — d is a
    # DECIMAL sum, so the min(struct)/packed-min alternatives either
    # fall back to SortAggregate or need a lossy re-scale; the window's
    # one exchange + sort was faster in the r12 A/B (OPTIMIZATION_r12.md
    # "min(struct) postmortem").
    w = Window.partitionBy("vid", "s").orderBy(
        F.asc("d"), F.asc("centroid_id")
    )
    return (
        d.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(
            F.col("vid").alias("vec_id"),
            "s",
            F.col("centroid_id").alias("code"),
            "d",
        )
    )


def pq_codes_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session substrate: the (vec_id, s, code, d) PQ code assignment,
    built once from the persisted dims substrate and shared by the code
    report and the ADC search — the compressed index a production
    vector store materializes once per corpus snapshot."""
    return session_frame(
        spark,
        sf_dir,
        "pq_codes",
        lambda: _pq_codes_frame(_pq_sub_dims(emb_dims(spark, sf_dir))),
    )


def pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector PQ code string (8 comma-joined centroid ids) plus the
    total quantization error — the compressed corpus representation ADC
    searches against. Serialized to a scalar string for the driver's
    hash (array columns are unhashable — see embedding_quantize).

    Scale shape: one explode of the corpus, one broadcast of the
    16x64-value codebook, one (vec, subspace, centroid) partial-agg
    shuffle, one keyed argmin window — all linear in corpus size; the
    output is ~8 bytes/vector where the input was 256."""
    codes = pq_codes_table(spark, sf_dir)
    return (
        codes.groupBy("vec_id")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("s", "code"))),
                    lambda t: t["code"].cast("string"),
                ),
            ).alias("pq_code"),
            F.sum("d").cast("double").alias("quant_err"),
        )
        .orderBy("vec_id")
    )


def pq_topk_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage PQ search vs exact L2 top-k, one row PER QUERY with the
    intersection size of each stage — the driver-checkable correctness
    row for the PQ path, extending the cosine_topk_agreement pattern.

    Stage 1 (ADC): each query precomputes its distance to every codebook
    entry per subspace (a Q x PQ_SUBS x PQ_CENTROIDS = 1280-row
    broadcast table); a corpus vector's approximate distance is the sum
    of 8 table lookups joined on its codes — the raw corpus vectors are
    never touched. Stage 2 (re-rank): exact decimal L2 for the
    top-PQ_SHORTLIST ADC candidates ONLY (the production pattern: the
    exact pass is shortlist-bounded, not corpus-bounded). Both stages
    and the exact baseline accumulate as DECIMAL, so ranks and both
    intersections are bit-identical cross-engine. PQ loss makes
    n_common_adc < k legitimate (measured ~0.2 recall on the isotropic
    synthetic embeddings — PQ's worst case); the re-rank lifts it to the
    shortlist's coverage (~0.7 at sf0.01). What the hash pins is that
    both engines agree on WHICH neighbors at every stage."""
    dims = emb_dims(spark, sf_dir)
    sub = _pq_sub_dims(dims)
    codes = pq_codes_table(spark, sf_dir)

    qsub = sub.filter(F.col("vid") < N_QUERIES).select(
        F.col("vid").alias("query_id"), "s", "pos", F.col("x").alias("qx")
    )
    cent = sub.filter(F.col("vid") < PQ_CENTROIDS).select(
        F.col("vid").alias("centroid_id"), "pos", F.col("x").alias("cx")
    )
    qdist = (
        qsub.join(F.broadcast(cent), "pos")
        .groupBy("query_id", "s", "centroid_id")
        .agg(
            F.sum(
                ((F.col("qx") - F.col("cx")) * (F.col("qx") - F.col("cx"))).cast(
                    _DEC
                )
            ).alias("qd")
        )
    )
    adc = (
        codes.select("vec_id", "s", F.col("code").alias("centroid_id"))
        .join(F.broadcast(qdist), ["s", "centroid_id"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("qd").alias("approx_dist"))
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.asc("approx_dist"), F.asc("neighbor_id")
    )
    adc_ranked = adc.withColumn("rank", F.row_number().over(wa))
    adc_top = adc_ranked.filter(F.col("rank") <= TOP_K).select(
        "query_id", "neighbor_id"
    )
    shortlist = adc_ranked.filter(F.col("rank") <= PQ_SHORTLIST).select(
        "query_id", "neighbor_id"
    )

    qd = dims.filter(F.col("vid") < N_QUERIES).select(
        F.col("vid").alias("query_id"), "pos", F.col("x").alias("qx")
    )

    # exact re-rank of the shortlist only: per-pair distances touch
    # PQ_SHORTLIST x 64 rows per query, never the full corpus
    rerank = (
        shortlist.join(
            dims.select(
                F.col("vid").alias("neighbor_id"), "pos", F.col("x").alias("x")
            ),
            "neighbor_id",
        )
        .join(F.broadcast(qd), ["query_id", "pos"])
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.sum(
                ((F.col("qx") - F.col("x")) * (F.col("qx") - F.col("x"))).cast(
                    _DEC
                )
            ).alias("rdist")
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.asc("rdist"), F.asc("neighbor_id")
    )
    rerank_top = (
        rerank.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id")
    )

    exact = (
        F.broadcast(qd)
        .join(
            dims.select(
                F.col("vid").alias("neighbor_id"), "pos", F.col("x").alias("x")
            ),
            "pos",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.sum(
                ((F.col("qx") - F.col("x")) * (F.col("qx") - F.col("x"))).cast(
                    _DEC
                )
            ).alias("dist")
        )
    )
    we = Window.partitionBy("query_id").orderBy(
        F.asc("dist"), F.asc("neighbor_id")
    )
    exact_top = (
        exact.withColumn("rank", F.row_number().over(we))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id")
    )

    def _n_common(top: DataFrame, alias: str) -> DataFrame:
        return (
            top.join(exact_top, ["query_id", "neighbor_id"])
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    queries = adc.select("query_id").distinct()
    return (
        queries.join(_n_common(adc_top, "n_common_adc"), "query_id", "left")
        .join(_n_common(rerank_top, "n_common_rerank"), "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_common_adc", F.lit(0))
            .cast("long")
            .alias("n_common_adc"),
            F.coalesce("n_common_rerank", F.lit(0))
            .cast("long")
            .alias("n_common_rerank"),
        )
        .orderBy("query_id")
    )


_PQ_CODES_CTE = f"""
sub AS (
  SELECT vec_id AS vid, CAST(i // {PQ_SUBDIM} AS INT) AS s, i AS pos,
    CAST(embedding[i + 1] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(64) r(i)
),
cent AS (
  SELECT vid AS centroid_id, pos, x AS cx FROM sub
  WHERE vid < {PQ_CENTROIDS}
),
cdist AS (
  SELECT v.vid, v.s, c.centroid_id,
    SUM(CAST((v.x - c.cx) * (v.x - c.cx) AS DECIMAL(38,12))) AS d
  FROM sub v JOIN cent c ON v.pos = c.pos
  GROUP BY v.vid, v.s, c.centroid_id
),
codes AS (
  SELECT vid AS vec_id, s, centroid_id AS code, d
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY vid, s ORDER BY d ASC, centroid_id ASC) AS r
    FROM cdist
  ) WHERE r = 1
)"""


PQ_CODES_SQL = f"""
WITH {_PQ_CODES_CTE}
SELECT vec_id,
  string_agg(CAST(code AS VARCHAR), ',' ORDER BY s) AS pq_code,
  CAST(SUM(d) AS DOUBLE) AS quant_err
FROM codes
GROUP BY vec_id
ORDER BY vec_id
"""


PQ_TOPK_AGREEMENT_SQL = f"""
WITH {_PQ_CODES_CTE},
qdist AS (
  SELECT q.vid AS query_id, q.s, c.centroid_id,
    SUM(CAST((q.x - c.cx) * (q.x - c.cx) AS DECIMAL(38,12))) AS qd
  FROM sub q JOIN cent c ON q.pos = c.pos
  WHERE q.vid < {N_QUERIES}
  GROUP BY q.vid, q.s, c.centroid_id
),
adc AS (
  SELECT qdist.query_id, codes.vec_id AS neighbor_id,
    SUM(qd) AS approx_dist
  FROM codes JOIN qdist
    ON qdist.s = codes.s AND qdist.centroid_id = codes.code
  WHERE qdist.query_id != codes.vec_id
  GROUP BY qdist.query_id, codes.vec_id
),
adc_ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY approx_dist ASC, neighbor_id ASC) AS rank
  FROM adc
),
adc_top AS (
  SELECT query_id, neighbor_id FROM adc_ranked WHERE rank <= {TOP_K}
),
shortlist AS (
  SELECT query_id, neighbor_id FROM adc_ranked WHERE rank <= {PQ_SHORTLIST}
),
rerank AS (
  SELECT sl.query_id, sl.neighbor_id,
    SUM(CAST((q.x - c.x) * (q.x - c.x) AS DECIMAL(38,12))) AS rdist
  FROM shortlist sl
  JOIN sub c ON c.vid = sl.neighbor_id
  JOIN sub q ON q.vid = sl.query_id AND q.pos = c.pos
  GROUP BY sl.query_id, sl.neighbor_id
),
rerank_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY rdist ASC, neighbor_id ASC) AS rank
    FROM rerank
  ) WHERE rank <= {TOP_K}
),
edist AS (
  SELECT q.vid AS query_id, c.vid AS neighbor_id,
    SUM(CAST((q.x - c.x) * (q.x - c.x) AS DECIMAL(38,12))) AS dist
  FROM sub q JOIN sub c ON q.pos = c.pos
  WHERE q.vid < {N_QUERIES} AND q.vid != c.vid
  GROUP BY q.vid, c.vid
),
exact_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY dist ASC, neighbor_id ASC) AS rank
    FROM edist
  ) WHERE rank <= {TOP_K}
),
na AS (
  SELECT a.query_id, CAST(COUNT(*) AS BIGINT) AS n_common_adc
  FROM adc_top a JOIN exact_top e
    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY a.query_id
),
nr AS (
  SELECT r.query_id, CAST(COUNT(*) AS BIGINT) AS n_common_rerank
  FROM rerank_top r JOIN exact_top e
    ON r.query_id = e.query_id AND r.neighbor_id = e.neighbor_id
  GROUP BY r.query_id
)
SELECT q.query_id,
  CAST(COALESCE(n_common_adc, 0) AS BIGINT) AS n_common_adc,
  CAST(COALESCE(n_common_rerank, 0) AS BIGINT) AS n_common_rerank
FROM (SELECT DISTINCT query_id FROM adc) q
LEFT JOIN na USING (query_id)
LEFT JOIN nr USING (query_id)
ORDER BY q.query_id
"""


# --- IVF probe sweep --------------------------------------------------------

# nprobe settings to measure: 1 = single-cell (the ann_ivf_topk setting),
# up to IVF_CENTROIDS = exhaustive (recall 1.0 by construction, the sanity
# anchor row).
IVF_PROBE_SET = [1, 2, 4, IVF_CENTROIDS]


def ivf_probe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall/cost curve for the IVF index on THIS corpus: for each
    nprobe (number of closest cells a query searches), the measured
    candidate volume and recall@k against the exact top-k — the
    measure-then-choose companion to ``lsh_band_tuning_report`` for the
    embedding side (pick nprobe from the knee of this curve before a
    100 TB run).

    The trick that keeps this ONE pass: candidates are ranked by the
    same cosine in every sweep setting, so the probed top-k is exactly
    the exact-top-k members whose cell rank <= nprobe — recall needs no
    per-config window, just a conditional count over (cell_rank,
    exact_rank). Scale shape: one query x corpus scored-pair frame
    (bounded by N_QUERIES), one global-per-query window over it, one
    conditional aggregation; centroid/assignment frames are broadcast.

    Columns: nprobe, n_candidates, mean_candidates, hits,
    mean_recall_at_k (denominator N_QUERIES*TOP_K)."""
    dims = emb_dims(spark, sf_dir)
    nrm = emb_norms(spark, sf_dir)
    # per-query cell ranking (full ranking, not just the argmax cell)
    cd = dims.filter(F.col("vid") < IVF_CENTROIDS).select(
        F.col("vid").alias("centroid_id"), "pos", F.col("x").alias("cx")
    )
    cn = nrm.filter(F.col("vid") < IVF_CENTROIDS).select(
        F.col("vid").alias("centroid_id"), F.col("nrm").alias("cnorm")
    )
    qd = dims.filter(F.col("vid") < N_QUERIES)
    qsims = (
        qd.join(F.broadcast(cd), "pos")
        .groupBy("vid", "centroid_id")
        .agg(F.sum((F.col("x") * F.col("cx")).cast(_DEC)).cast("double").alias("dot"))
        .join(F.broadcast(cn), "centroid_id")
        .join(F.broadcast(nrm.filter(F.col("vid") < N_QUERIES)), "vid")
        .withColumn("cos_c", F.col("dot") / (F.col("nrm") * F.col("cnorm")))
    )
    wq = Window.partitionBy("vid").orderBy(F.desc("cos_c"), F.asc("centroid_id"))
    crank = qsims.select(
        F.col("vid").alias("query_id"),
        "centroid_id",
        F.row_number().over(wq).alias("cell_rank"),
    )
    assign = ivf_assign_table(spark, sf_dir)
    # query x corpus exact cosines (bounded by N_QUERIES)
    qdd = qd.select(F.col("vid").alias("query_id"), "pos", F.col("x").alias("qx"))
    ndd = dims.select(F.col("vid").alias("neighbor_id"), "pos", "x")
    dots = (
        F.broadcast(qdd)
        .join(ndd, "pos")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum((F.col("qx") * F.col("x")).cast(_DEC)).cast("double").alias("dot"))
    )
    scored = (
        dots.join(
            F.broadcast(
                nrm.filter(F.col("vid") < N_QUERIES)
                .withColumnRenamed("vid", "query_id")
                .withColumnRenamed("nrm", "qnorm")
            ),
            "query_id",
        )
        .join(
            nrm.withColumnRenamed("vid", "neighbor_id").withColumnRenamed(
                "nrm", "nnorm"
            ),
            "neighbor_id",
        )
        .withColumn("cosine", F.col("dot") / (F.col("qnorm") * F.col("nnorm")))
        .join(
            F.broadcast(
                assign.withColumnRenamed("vec_id", "neighbor_id")
            ),
            "neighbor_id",
        )
        .join(F.broadcast(crank), ["query_id", "centroid_id"])
    )
    w_all = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    scored = scored.withColumn("exact_rank", F.row_number().over(w_all))
    sweep = scored.select(
        "query_id",
        "cell_rank",
        "exact_rank",
        F.explode(F.array(*[F.lit(p) for p in IVF_PROBE_SET])).alias("nprobe"),
    ).filter(F.col("cell_rank") <= F.col("nprobe"))
    denom_q = float(N_QUERIES)
    denom_r = float(N_QUERIES * TOP_K)
    return (
        sweep.groupBy("nprobe")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.sum((F.col("exact_rank") <= TOP_K).cast("int"))
            .cast("long")
            .alias("hits"),
        )
        .select(
            F.col("nprobe").cast("long").alias("nprobe"),
            "n_candidates",
            (F.floor(F.col("n_candidates") / F.lit(denom_q) * 100 + F.lit(0.5)) / 100).alias(
                "mean_candidates"
            ),
            "hits",
            (F.floor(F.col("hits") / F.lit(denom_r) * 10000 + F.lit(0.5)) / 10000).alias(
                "mean_recall_at_k"
            ),
        )
        .orderBy("nprobe")
    )


IVF_PROBE_SWEEP_SQL = f"""
WITH dims AS (
  SELECT vec_id, i AS pos, CAST(embedding[i + 1] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN range(64) r(i)
), norms AS (
  SELECT vec_id, sqrt(CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
  FROM dims GROUP BY vec_id
), cdots AS (
  SELECT v.vec_id, c.vec_id AS centroid_id,
         CAST(SUM(CAST(v.x * c.x AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM dims v JOIN dims c ON v.pos = c.pos
  WHERE c.vec_id < {IVF_CENTROIDS}
  GROUP BY v.vec_id, c.vec_id
), assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT cd.vec_id, cd.centroid_id,
      ROW_NUMBER() OVER (
        PARTITION BY cd.vec_id
        ORDER BY cd.dot / (vn.nrm * cn.nrm) DESC, cd.centroid_id ASC
      ) AS r
    FROM cdots cd
    JOIN norms vn ON vn.vec_id = cd.vec_id
    JOIN norms cn ON cn.vec_id = cd.centroid_id
  ) WHERE r = 1
), crank AS (
  SELECT cd.vec_id AS query_id, cd.centroid_id,
    ROW_NUMBER() OVER (
      PARTITION BY cd.vec_id
      ORDER BY cd.dot / (vn.nrm * cn.nrm) DESC, cd.centroid_id ASC
    ) AS cell_rank
  FROM cdots cd
  JOIN norms vn ON vn.vec_id = cd.vec_id
  JOIN norms cn ON cn.vec_id = cd.centroid_id
  WHERE cd.vec_id < {N_QUERIES}
), dots AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(SUM(CAST(q.x * c.x AS DECIMAL(38,12))) AS DOUBLE) AS dot
  FROM dims q JOIN dims c ON q.pos = c.pos
  WHERE q.vec_id < {N_QUERIES} AND q.vec_id != c.vec_id
  GROUP BY q.vec_id, c.vec_id
), scored AS (
  SELECT d.query_id, d.neighbor_id,
    ck.cell_rank,
    ROW_NUMBER() OVER (
      PARTITION BY d.query_id
      ORDER BY d.dot / (qn.nrm * nn.nrm) DESC, d.neighbor_id ASC
    ) AS exact_rank
  FROM dots d
  JOIN norms qn ON qn.vec_id = d.query_id
  JOIN norms nn ON nn.vec_id = d.neighbor_id
  JOIN assign a ON a.vec_id = d.neighbor_id
  JOIN crank ck ON ck.query_id = d.query_id AND ck.centroid_id = a.centroid_id
), sweep AS (
  SELECT s.query_id, s.cell_rank, s.exact_rank, p.nprobe
  FROM scored s CROSS JOIN (VALUES {", ".join(f"({p})" for p in IVF_PROBE_SET)}) p(nprobe)
  WHERE s.cell_rank <= p.nprobe
)
SELECT CAST(nprobe AS BIGINT) AS nprobe,
  CAST(COUNT(*) AS BIGINT) AS n_candidates,
  floor(COUNT(*) / {float(N_QUERIES)} * 100 + 0.5) / 100 AS mean_candidates,
  CAST(SUM(CASE WHEN exact_rank <= {TOP_K} THEN 1 ELSE 0 END) AS BIGINT) AS hits,
  floor(SUM(CASE WHEN exact_rank <= {TOP_K} THEN 1 ELSE 0 END) / {float(N_QUERIES * TOP_K)} * 10000 + 0.5) / 10000
    AS mean_recall_at_k
FROM sweep GROUP BY nprobe ORDER BY nprobe
"""
