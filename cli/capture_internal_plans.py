"""Capture `.explain("formatted")` for operator pipelines whose
registered queries read a PERSISTED session substrate (so the query plan
itself is just an InMemoryScan): the connected-components loop's final
assembly, the BPE training step, and the assignment argmins. Writes
plans/r12/<name>_<tag>.txt. Measurement tooling only.

    python cli/capture_internal_plans.py TAG [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from big_data_recommendation_system_spark.operators import (  # noqa: E402
    similarity as sim,
    text_dedup as td,
)
from big_data_recommendation_system_spark.plans import (  # noqa: E402
    text_analysis as ta,
)
from big_data_recommendation_system_spark.session import get_spark  # noqa: E402
from big_data_recommendation_system_spark.sources.tables import (  # noqa: E402
    load_table,
)


def explain_str(df) -> str:  # noqa: ANN001
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    tag = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    round_dir = sys.argv[3] if len(sys.argv) > 3 else "r13"
    spark = get_spark("capture-plans")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        round_dir,
    )
    os.makedirs(out_dir, exist_ok=True)

    targets = {}

    # CC final assembly over the text dup pairs (the loop body itself is
    # iterative; this captures the edge symmetrization + the post-loop
    # size/label assembly, where the r12 changes live)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = td.dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    targets["cc_assembly_internal"] = td.connected_components(docs, pairs)

    # one BPE merge step over the initial vocabulary (pre-materialization)
    vocab = (
        load_table(spark, sf_dir, "documents")
        .withColumn("tok", ta.tokens(F.col("text")))
        .select(F.explode("tok").alias("word"))
        .filter(F.col("word").rlike(ta._BPE_WORD_RE))  # noqa: SLF001
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "syms",
            F.expr(
                "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
            ),
        )
    )
    v2, rep = ta._bpe_merge_step(vocab, 1)  # noqa: SLF001
    targets["bpe_merge_step_vocab_internal"] = v2
    targets["bpe_merge_step_report_internal"] = rep

    # one CC propagation round, pre-checkpoint (the query-level explain
    # stops at the lazy localCheckpoint's LogicalRDD boundary, so the
    # round fusion — one aggregation over union(messages, labels)
    # instead of groupBy + left join back — is only visible here).
    # Built by the SAME helper the production loop calls (r12 ADVICE:
    # no hand-copied round bodies in the capture path).
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    labels0 = edges.select(F.col("doc_a").alias("doc_id")).distinct().select(
        "doc_id", F.col("doc_id").alias("cluster_id")
    )
    targets["cc_round_internal"] = td._cc_round(edges, labels0)  # noqa: SLF001

    # one PageRank round, pre-checkpoint (same boundary argument),
    # built by the production round helper — teleport constant is the
    # only capture-side literal (its value is plan-shape-irrelevant)
    from big_data_recommendation_system_spark.operators import graph as gr

    ed = gr.graph_edges_deg_table(spark, sf_dir)
    nodes = gr.graph_nodes_table(spark, sf_dir)
    ranks0 = nodes.select("node", F.lit(1_000_000).alias("fp"))
    targets["pagerank_round_internal"] = gr._pagerank_round(  # noqa: SLF001
        ed, ranks0, F.lit(1)
    )

    # kmeans assignment argmin
    dims = sim.emb_dims(spark, sf_dir)
    cdims = dims.filter(F.col("vid") < sim.IVF_CENTROIDS).select(
        F.col("vid").alias("cid"), "pos", F.col("x").alias("cx")
    )
    targets["kmeans_assign_internal"] = sim._kmeans_assign(dims, cdims)  # noqa: SLF001

    # IVF assignment argmax
    targets["ivf_assign_internal"] = sim._ivf_assignments(
        None, sim.emb_dims(spark, sf_dir), sim.emb_norms(spark, sf_dir)
    )

    # PQ code argmin
    targets["pq_codes_internal"] = sim._pq_codes_frame(  # noqa: SLF001
        sim._pq_sub_dims(sim.emb_dims(spark, sf_dir))  # noqa: SLF001
    )

    for name, df in targets.items():
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(explain_str(df))
        print(f"wrote {name}_{tag}.txt")


if __name__ == "__main__":
    main()
