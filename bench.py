"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries": {name: sec},
"sf", "passes"}.

Each query is fully materialized through the noop sink (count() would let
Catalyst prune the derived columns and under-report).

Per-query time = MIN over two timed passes. This sandbox runs on shared
hardware where identical code measured 101-199 s total in runs 25 minutes
apart (noisy-neighbor CPU steal, swings up to 6x on individual queries);
min-of-2 reports steady-state execution rather than whichever pass caught
a noisy window. The pass count is recorded in the JSON.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_recommendation_system_spark.operators.emb_substrate import (  # noqa: E402
    EMB_SUBSTRATE_CONSUMERS,
)
from big_data_recommendation_system_spark.operators.text_dedup import (  # noqa: E402
    SUBSTRATE_CONSUMERS as TEXT_SUBSTRATE_CONSUMERS,
)
from big_data_recommendation_system_spark.plans.text_analysis import (  # noqa: E402
    TA_SUBSTRATE_CONSUMERS,
)
from big_data_recommendation_system_spark.plans.quality_models import (  # noqa: E402
    QM_SUBSTRATE_CONSUMERS,
)
from big_data_recommendation_system_spark.plans.packing import (  # noqa: E402
    SPAN_SUBSTRATE_CONSUMERS,
)

# All substrate families (text pair/cluster tables; embeddings+norms and
# the derived IVF/PQ/SRP index structures; the trained BPE artifacts and
# the per-source report card) group together so a blanket clearCache
# between queries doesn't evict the frames they share.
from big_data_recommendation_system_spark.ml.recommend import (  # noqa: E402
    ALS_CONSUMERS,
)
from big_data_recommendation_system_spark.operators.linalg import (  # noqa: E402
    LINALG_SUBSTRATE_CONSUMERS,
)

SUBSTRATE_CONSUMERS = (
    TEXT_SUBSTRATE_CONSUMERS
    | EMB_SUBSTRATE_CONSUMERS
    | TA_SUBSTRATE_CONSUMERS
    | ALS_CONSUMERS
    | QM_SUBSTRATE_CONSUMERS
    | SPAN_SUBSTRATE_CONSUMERS
    | LINALG_SUBSTRATE_CONSUMERS
)
from big_data_recommendation_system_spark.registry import QUERIES  # noqa: E402
from big_data_recommendation_system_spark.session import get_spark  # noqa: E402

# Multi-consumer session substrates, in dependency order. Built (and
# timed) explicitly at the start of the substrate-consumer group so the
# bench JSON attributes build cost to the substrate, not to whichever
# consumer happens to run first alphabetically (r8 VERDICT: the 8.2 s
# recorded for cross_detector_dup_clusters was ~mostly first-touch
# absorption of the embedding pair substrate). Single-consumer
# substrates stay first-touch inside their one query — already honest.
from big_data_recommendation_system_spark.operators import (  # noqa: E402
    emb_substrate as _emb,
    graph as _graph,
    linalg as _linalg,
    similarity as _sim,
    srp as _srp,
    text_dedup as _td,
)
from big_data_recommendation_system_spark.plans import (  # noqa: E402
    assembly as _asm,
    packing as _pk,
    quality_models as _qm,
    text_analysis as _ta,
)

from big_data_recommendation_system_spark.ml import recommend as _rec  # noqa: E402

SUBSTRATE_BUILDERS = [
    ("als:model", _rec.als_model),
    ("emb:table", _emb.emb_table),
    ("emb:dims", _emb.emb_dims),
    ("emb:ivf_assign", _sim.ivf_assign_table),
    ("emb:allcos", _sim.in_cell_cosines_table),
    ("emb:nd_pairs", _sim.emb_near_dup_pairs_table),
    ("emb:nd_clusters", _sim.emb_clusters_table),
    ("emb:pq_codes", _sim.pq_codes_table),
    # r12: the covariance matrix became a substrate (one Gram pass,
    # three readers — embedding_covariance / pca_invariants /
    # pca_explained_variance)
    ("emb:cov", _linalg.cov_table),
    ("emb:srp_sigs", _srp.srp_sig_table),
    ("emb:srp_cand", _srp._srp_cand_table),
    ("text:shingles", _td.shingled_docs_table),
    ("text:minhash_sigs", _td.minhash_sig_table),
    ("text:bands", _td.lsh_bands_table),
    ("text:pairs", _td.dup_pairs),
    ("text:clusters", _td.dup_clusters),
    ("text:union_pairs", _td._union_pairs_table),
    ("text:union_clusters", _td._union_clusters_table),
    # dup-graph substrates (r9 VERDICT: their first-touch builds were
    # absorbed into dup_graph_pagerank's consume time)
    ("graph:edges", _graph.graph_edges_table),
    ("graph:edges_deg", _graph.graph_edges_deg_table),
    ("graph:nodes", _graph.graph_nodes_table),
    ("winnow:picks", _ta.winnow_picks_table),
    ("winnow:fps", _ta.winnow_fps_table),
    ("bpe:trained", lambda spark, sf: _ta._bpe_trained(spark, sf)[0]),
    ("bpe:encoded", _ta._bpe_encoded_table),
    ("rc:card", _ta.corpus_report_card),
    ("asm:staged", _asm.staged_docs_table),
    ("qm:labeled", _qm.labeled_docs_table),
    ("qm:nb_model", _qm.nb_model_table),
    ("qm:lm_uni", _qm.lm_unigram_table),
    ("qm:lm_bi", _qm.lm_bigram_table),
    # r12: the served score frames became substrates (score the snapshot
    # once, every report reads the table) — time their builds here so
    # consumer numbers stay pure consume
    ("qm:nb_scores", _qm.nb_scores_table),
    ("qm:lm_scores", _qm.lm_scores_table),
    ("qm:dsir_feats", _qm.dsir_feats_table),
    ("qm:dsir_ratios", _qm.dsir_ratio_table),
    ("qm:dsir_sample", _qm.dsir_sample_table),
    ("spans:dup", _pk.dup_span_frame),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bdrs-bench")

    # Substrate-consumer queries run LAST as a contiguous group with no
    # clearCache between them: they deliberately share one materialized
    # pair/cluster table (the production shape writes it once per corpus
    # snapshot), so the group's first query pays the build and the rest
    # read it — evicting it per query would re-time the same pipeline 6x.
    ordered = sorted(QUERIES, key=lambda n: (n in SUBSTRATE_CONSUMERS, n))

    # JVM/codegen warmup: run EVERY query once at the smallest sf so the
    # timed pass measures steady-state execution, not whole-stage-codegen
    # compilation of each plan shape (first compile of the wide synth/clean
    # projections costs ~10-25 s once per JVM and amortizes to zero on a
    # real cluster run).
    for name in ordered:
        try:
            QUERIES[name](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            # surfaces again in the timed pass; name it here so a
            # warmup-only failure isn't silently invisible
            print(
                f"warmup failed: {name}: {type(exc).__name__}: {exc}",
                file=sys.stderr,
            )
        if name not in SUBSTRATE_CONSUMERS:
            spark.catalog.clearCache()

    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    timings: dict[str, float] = {}
    sub_timings: dict[str, float] = {}
    # Machine-drift canary (r10 VERDICT next-round #4): one fixed
    # constant-input aggregation, identical across rounds and sf dirs,
    # never registry-registered. Its min-over-passes time calibrates
    # this box's speed so future rounds can normalize query deltas
    # against noisy-neighbor CPU steal (this sandbox has recorded 6x
    # swings on identical code). 200M-row range sum: big enough to be
    # CPU-bound across all 32 threads, small enough to add <1 s.
    drift_probe_sec: float | None = None
    for _ in range(passes):
        t0 = time.perf_counter()
        spark.range(0, 200_000_000, 1, 32).selectExpr(
            "sum(id * 3 + 1) AS s"
        ).write.format("noop").mode("overwrite").save()
        probe = round(time.perf_counter() - t0, 3)
        drift_probe_sec = (
            probe if drift_probe_sec is None else min(drift_probe_sec, probe)
        )
        spark.catalog.clearCache()  # each pass starts cold
        built = False
        for name in ordered:
            if not built and name in SUBSTRATE_CONSUMERS:
                # the substrate-consumer group starts here: build every
                # shared substrate with its OWN timing so consumer
                # numbers are pure consume (see SUBSTRATE_BUILDERS).
                # FIRST-pass timings only: that is the cold
                # build-once-per-snapshot cost. Later passes re-persist
                # frames the harness's clearCache evicted (a harness
                # artifact) or find session objects still registered
                # (the ALS model survives clearCache), so a min over
                # passes would under-report the real build.
                for sname, fn in SUBSTRATE_BUILDERS:
                    t0 = time.perf_counter()
                    fn(spark, sf_dir)
                    el = round(time.perf_counter() - t0, 3)
                    sub_timings.setdefault(sname, el)
                built = True
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            elapsed = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, elapsed), elapsed)
            # queries may cache small intermediates; drop them so timings
            # are independent and memory doesn't accumulate across the run
            # — except inside the substrate group (see above)
            if name not in SUBSTRATE_CONSUMERS:
                spark.catalog.clearCache()

    # Field order matters: the driver preserves only the TAIL of this
    # line in BENCH_r{N}.json, so the per-query map (which exceeds the
    # truncation budget) goes FIRST and every summary total goes LAST —
    # the surviving fragment then always carries the headline numbers.
    payload = {
        "queries": timings,
        # shared-substrate build cost, split out per substrate
        # (consumer timings above are consume-only as of r9;
        # "value" still includes builds, so totals stay
        # comparable across rounds)
        "substrates": sub_timings,
        "metric": "total_query_wall_seconds",
        "value": round(
            sum(timings.values()) + sum(sub_timings.values()), 3
        ),
        "unit": "sec",
        # the registry grows every round — normalize before
        # comparing totals across rounds
        "n_queries": len(timings),
        "avg_query_sec": round(
            sum(timings.values()) / max(len(timings), 1), 3
        ),
        "substrate_build_sec": round(sum(sub_timings.values()), 3),
        # fixed-workload machine-speed canary (min over passes);
        # divide a round's avg_query_sec by the ratio of probe
        # times to normalize out box drift before comparing
        "drift_probe_sec": drift_probe_sec,
        # r12 VERDICT "What's wrong #5": avg_query_sec is flattered
        # whenever work relocates from consumers into newly-timed
        # substrate builds (six substrates moved ~10 s that round
        # alone) — "value" (consume + all substrate builds, r9+) is
        # the only total comparable across rounds; normalize it by
        # n_queries and drift_probe_sec when registries/boxes differ.
        "comparable_note": (
            "compare rounds on value (consume + substrate builds, "
            "r9+), normalized by n_queries and drift_probe_sec; "
            "avg_query_sec is consume-only and is flattered when "
            "work moves into substrates"
        ),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "passes": passes,
    }
    line = json.dumps(payload)
    # The driver's BENCH_r{N}.json truncates this line to its tail (r11's
    # preserved only 33 of 190 per-query entries), which forced
    # round-over-round forensics onto a common-subset geomean. Also write
    # the COMPLETE line to bench_last.json so the full per-query map can
    # be committed each round as BENCH_LOCAL_r{N}.json (r11 VERDICT
    # next-round #3).
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_last.json"
    )
    try:
        with open(out_path, "w") as fh:
            fh.write(line + "\n")
    except OSError as exc:
        print(f"bench_last.json write failed: {exc}", file=sys.stderr)
    print(line)


if __name__ == "__main__":
    main()
