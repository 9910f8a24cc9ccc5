"""Graph analytics over the near-duplicate similarity graph — the
centrality/topology views a corpus pipeline uses on top of pair
detection (which documents are duplication HUBS, how connected the
duplication structure is).

Both operators run on the LSH pair set (sparse — at 100 TB the paired
subgraph is orders of magnitude smaller than the corpus, same argument
as connected_components). PageRank is the classic iterative message
pass: contributions shuffle on the destination key per round, exactly
the shape GraphX/Pregel executes; three fixed iterations keep it
SQL-expressible (DuckDB oracle unrolls them as chained CTEs).

Determinism discipline (SCALE.md): ranks ride 1e-12 fixed-point BIGINTs
end-to-end. Contributions use integer floor division (exact under any
partitioning and summation order); the damping multiply is one
double×integer product + round() per node per round (ties away from
zero in both engines). No cross-row double sums anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text_dedup import minhash_lsh_pairs, minhash_pairs_cte

PAGERANK_ITERS = 3
PAGERANK_DAMP = 0.85
_FP = 10**12


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected edge list over the dup-pairs substrate — itself a
    session substrate (shared by pagerank and the degree report, and
    reused across repeat calls instead of re-registering a per-call
    cache)."""
    from .substrate import session_frame

    def build() -> DataFrame:
        pairs = minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
        return pairs.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        ).union(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )

    return session_frame(spark, sf_dir, "graph:edges", build)


def graph_edges_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Public builder for the ``graph:edges`` session substrate (bench
    attribution + any external consumer)."""
    return _edges(spark, sf_dir)


def graph_edges_deg_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session substrate ``graph:edges_deg``: the edge list annotated
    with the source node's out-degree — the per-round join input of the
    PageRank message pass."""
    from .substrate import session_frame

    edges = _edges(spark, sf_dir)

    def build() -> DataFrame:
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
        return edges.join(deg, "src")

    return session_frame(spark, sf_dir, "graph:edges_deg", build)


def graph_nodes_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session substrate ``graph:nodes``: distinct nodes of the near-dup
    graph (teleport + final-join input)."""
    from .substrate import session_frame

    edges = _edges(spark, sf_dir)
    return session_frame(
        spark,
        sf_dir,
        "graph:nodes",
        lambda: edges.select(F.col("src").alias("node")).distinct(),
    )


def _pagerank_round(
    ed: DataFrame, ranks: DataFrame, teleport_fp: F.Column
) -> DataFrame:
    """ONE PageRank message round, pre-checkpoint: contributions keyed on
    dst (integer floor division per edge, map-side-combined sum) + the
    damped-teleport update. Factored out (r12 ADVICE) so the production
    loop and cli/capture_internal_plans.py build the SAME frame — the
    captured 'internal' plan evidence cannot desynchronize from the
    operator."""
    return (
        ed.join(ranks, ed.src == ranks.node)
        .select("dst", F.expr("fp DIV out_deg").alias("c"))
        .groupBy("dst")
        .agg(F.sum("c").alias("s"))
        .select(
            F.col("dst").alias("node"),
            (
                teleport_fp
                + F.round(F.lit(PAGERANK_DAMP) * F.col("s")).cast("long")
            ).alias("fp"),
        )
    )


def dup_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 iterations, damping 0.85) over the undirected near-dup
    graph, restricted to documents that appear in at least one pair —
    the duplication-hub score (a template copied with variations by many
    documents outranks an isolated mutual pair). Undirected edges mean
    every node has out-degree ≥ 1, so there is no dangling mass.

    Scale shape per round: one join of the rank frame onto the edge list
    (both keyed on src — co-partitioned after the first shuffle) and one
    sum keyed on dst, map-side combined. Rank state is two narrow
    columns; lineage is truncated per round with localCheckpoint like
    the connected-components loop."""
    # (src, dst, out_deg) reused per round; nodes feeds teleport + the
    # final join — both session substrates (repeat calls reuse ONE
    # persisted copy instead of re-registering per-call caches)
    ed = graph_edges_deg_table(spark, sf_dir)
    nodes = graph_nodes_table(spark, sf_dir)
    # The node count is one cheap action on the PERSISTED nodes substrate
    # (before the substrate existed this had to stay a broadcast 1-row
    # frame — a driver-side count would have re-executed the whole LSH
    # pipeline). The two fixed-point scalars are then computed by a
    # 1-row SPARK query so the rounding semantics are exactly the
    # engine's own round() — the same expression the DuckDB oracle
    # evaluates — and every iteration drops its crossJoin+broadcast
    # scaffolding (4 fewer stages per bench run on a tiny rank frame;
    # at scale, one fewer broadcast per round).
    n_nodes = nodes.count()
    consts = (
        spark.range(1)
        .select(
            F.round(F.lit(0.15) * F.lit(float(_FP)) / F.lit(n_nodes))
            .cast("long")
            .alias("t"),
            F.round(F.lit(float(_FP)) / F.lit(n_nodes)).cast("long").alias("r0"),
        )
        .first()
        if n_nodes
        else None
    )
    teleport_fp = F.lit(consts.t if consts else 0)
    init_fp = F.lit(consts.r0 if consts else 0)
    # lazy localCheckpoints: lineage/attribute-id isolation per round
    # without an eager materialization job each — the iteration count is
    # FIXED (no convergence action), so the whole 3-round DAG executes
    # as one job at the final action. The convergence-checked CC loop
    # can't do this (it needs a result per round); a fixed-round message
    # pass can.
    ranks = nodes.select("node", init_fp.alias("fp")).localCheckpoint(
        eager=False
    )
    # r12 OPTIMIZATION (guide §2.4: remove shuffles outright): the
    # per-round left join of `nodes` onto the contribution sums is
    # provably the identity projection. The edge list is SYMMETRIC
    # (every pair appears in both directions) and `nodes` is exactly
    # the set of endpoints, so every node has >= 1 incoming edge whose
    # src carries a rank (ranks covers all nodes by induction from the
    # init frame) — contribs therefore has EXACTLY one row per node,
    # none of the coalesce(s, 0) arms can fire, and
    # nodes ⟕ contribs == contribs. Dropping the join removes one
    # join + one exchange of the rank frame per round (3 per query);
    # values are bit-identical (oracle gate + strict sweep).
    for _ in range(PAGERANK_ITERS):
        ranks = _pagerank_round(ed, ranks, teleport_fp).localCheckpoint(
            eager=False
        )
    return ranks.select(
        F.col("node").alias("doc_id"),
        (F.col("fp").cast("double") / F.lit(float(_FP))).alias("pagerank"),
    ).orderBy(F.desc("pagerank"), F.asc("doc_id"))


def _pagerank_sql() -> str:
    rounds = []
    prev = "r0"
    for i in range(1, PAGERANK_ITERS + 1):
        rounds.append(
            f"""c{i} AS (
  SELECT e.dst AS node, SUM(r.fp // d.out_deg) AS s
  FROM edges e JOIN {prev} r ON r.node = e.src JOIN deg d ON d.src = e.src
  GROUP BY e.dst
), r{i} AS (
  SELECT nd.node,
    CAST(round(0.15 * 1e12 / n_nodes) AS BIGINT)
      + CAST(round({PAGERANK_DAMP} * COALESCE(c.s, 0)) AS BIGINT) AS fp
  FROM nodes nd CROSS JOIN n LEFT JOIN c{i} c ON c.node = nd.node
)"""
        )
        prev = f"r{i}"
    chain = ",\n".join(rounds)
    return f"""{minhash_pairs_cte()},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
deg AS (SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS node FROM edges),
n AS (SELECT COUNT(*) AS n_nodes FROM nodes),
r0 AS (
  SELECT node, CAST(round(1e12 / n_nodes) AS BIGINT) AS fp
  FROM nodes CROSS JOIN n
),
{chain}
SELECT node AS doc_id, CAST(fp AS DOUBLE) / 1e12 AS pagerank
FROM {prev}
ORDER BY pagerank DESC, doc_id
"""


DUP_GRAPH_PAGERANK_SQL = _pagerank_sql()


def dup_graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the near-dup graph: how many documents have k
    near-duplicate neighbors. The shape separates pairwise duplication
    (degree 1-2) from template explosions (high degree) at a glance.
    Two narrow hash aggs over the pair list."""
    edges = _edges(spark, sf_dir)
    deg = edges.groupBy(F.col("src").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("degree")
    )


DUP_GRAPH_DEGREES_SQL = f"""{minhash_pairs_cte()},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS degree FROM edges GROUP BY src)
SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM deg GROUP BY degree ORDER BY degree
"""
