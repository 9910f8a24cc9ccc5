"""Dedup-substrate materialization CLI — the production shape of the
near-dup pipeline: compute the verified pair table and its connected-
component clusters ONCE per corpus snapshot, WRITE them as Parquet, and
run every downstream report off the written tables instead of
recomputing the shingle→minhash→band→verify pipeline per report.

    python cli/run_dedup.py build  --sf-dir SF --out-dir OUT
    python cli/run_dedup.py report --sf-dir SF --out-dir OUT

``build`` writes OUT/dup_pairs, OUT/dup_clusters, OUT/retention_plan and
OUT/dup_spans — the substring-granularity removal plan — plus, with
``--scrub``, OUT/scrubbed_docs (the plan APPLIED), with
``--calibration``, OUT/span_calibration (the (ngram n, min span len)
policy grid), and run metadata in OUT/_pipeline_runs. ``report`` READS those tables back (never recomputes
them) and writes OUT/reports/{dedup_rate_by_source,dedup_token_savings,
cluster_size_histogram,dup_span_savings}; the report logic is the same
frame-level builders the registered queries use
(operators/text_dedup.py::retention_plan_from / rate_by_source_from /
token_savings_from, plans/packing.py::span_savings_from / scrub_from),
so CLI output and driver-hashed query output agree by construction.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_recommendation_system_spark.functions.text import tokens
from big_data_recommendation_system_spark.operators.text_dedup import (
    cluster_histogram_from,
    dup_clusters,
    dup_pairs,
    rate_by_source_from,
    retention_plan_from,
    token_savings_from,
)
from big_data_recommendation_system_spark.session import get_spark
from big_data_recommendation_system_spark.sources.sinks import record_run
from big_data_recommendation_system_spark.sources.tables import load_table


def run_build(args: argparse.Namespace) -> None:
    spark = get_spark("bdrs-dedup-build")
    t0 = time.time()
    pairs = dup_pairs(spark, args.sf_dir)
    pairs.write.mode("overwrite").parquet(os.path.join(args.out_dir, "dup_pairs"))
    n_pairs = pairs.count()
    clusters = dup_clusters(spark, args.sf_dir)
    clusters.write.mode("overwrite").parquet(
        os.path.join(args.out_dir, "dup_clusters")
    )
    n_clustered = clusters.count()
    docs = load_table(spark, args.sf_dir, "documents").select("doc_id", "n_chars")
    plan = retention_plan_from(clusters, docs)
    plan.write.mode("overwrite").parquet(
        os.path.join(args.out_dir, "retention_plan")
    )
    n_planned = plan.count()
    # substring-granularity artifacts beside the document-level ones:
    # the maximal duplicated-span plan and (optionally applied) scrub
    from big_data_recommendation_system_spark.plans.packing import (
        dup_span_frame,
        scrub_from,
    )

    spans = dup_span_frame(spark, args.sf_dir)
    spans.write.mode("overwrite").parquet(
        os.path.join(args.out_dir, "dup_spans")
    )
    n_spans = spans.count()
    if getattr(args, "scrub", False):
        scrub_from(
            spans,
            load_table(spark, args.sf_dir, "documents").select(
                "doc_id", tokens(F.col("text")).alias("tok")
            ),
        ).write.mode("overwrite").parquet(
            os.path.join(args.out_dir, "scrubbed_docs")
        )
        print(f"scrubbed docs -> {args.out_dir}/scrubbed_docs")
    if getattr(args, "tuning_report", False):
        # Parameter-tuning artifact beside the snapshot: the measured
        # bucket structure / candidate cost per (bands, rows) choice —
        # the operator reads this before re-running with different LSH
        # constants (it reuses the signature substrate this build
        # already materialized, so the marginal cost is one small agg).
        from big_data_recommendation_system_spark.operators.text_dedup import (
            lsh_band_tuning_report,
        )

        lsh_band_tuning_report(spark, args.sf_dir).write.mode(
            "overwrite"
        ).parquet(os.path.join(args.out_dir, "lsh_band_tuning"))
        print(f"band tuning report -> {args.out_dir}/lsh_band_tuning")
    if getattr(args, "calibration", False):
        # Span-policy calibration artifact: what each (anchor n-gram
        # size, min span length) cell would scrub — read this before
        # committing DUP_SPAN_NGRAM / a min-length policy for the next
        # snapshot (one extra multi-n gram pass over the corpus).
        from big_data_recommendation_system_spark.plans.packing import (
            dup_span_calibration,
        )

        dup_span_calibration(spark, args.sf_dir).write.mode(
            "overwrite"
        ).parquet(os.path.join(args.out_dir, "span_calibration"))
        print(f"span calibration grid -> {args.out_dir}/span_calibration")
    info = {
        "stage": "dedup_build",
        "sf_dir": os.path.abspath(args.sf_dir),
        "n_pairs": n_pairs,
        "n_clustered_docs": n_clustered,
        "n_planned_docs": n_planned,
        "n_dup_spans": n_spans,
        "sec": round(time.time() - t0, 2),
    }
    record_run(spark, os.path.join(args.out_dir, "_pipeline_runs"), info)
    print(
        f"dedup build: {n_pairs} pairs, {n_clustered} clustered docs, "
        f"{n_planned} plan rows ({info['sec']}s)"
    )


def run_report(args: argparse.Namespace) -> None:
    spark = get_spark("bdrs-dedup-report")
    t0 = time.time()
    # READ the snapshot tables back — reports never recompute the pipeline
    plan = spark.read.parquet(
        os.path.join(args.out_dir, "retention_plan")
    ).select("doc_id", "keep")
    clusters = spark.read.parquet(os.path.join(args.out_dir, "dup_clusters"))
    docs = load_table(spark, args.sf_dir, "documents")
    from big_data_recommendation_system_spark.plans.packing import (
        span_savings_from,
    )

    reports = {
        "dedup_rate_by_source": rate_by_source_from(
            plan, docs.select("doc_id", "source")
        ),
        "dedup_token_savings": token_savings_from(
            plan,
            docs.select(
                "doc_id", "source", F.size(tokens(F.col("text"))).alias("n_tok")
            ),
        ),
        "cluster_size_histogram": cluster_histogram_from(clusters),
    }
    # substring granularity, from the WRITTEN dup_spans snapshot — only
    # present for builds made at r10+ (pre-r10 snapshots have no
    # dup_spans table; skip with a warning instead of a raw read error)
    spans_path = os.path.join(args.out_dir, "dup_spans")
    if os.path.isdir(spans_path):
        reports["dup_span_savings"] = span_savings_from(
            spark.read.parquet(spans_path),
            docs.select(
                "doc_id",
                "source",
                F.size(tokens(F.col("text"))).cast("long").alias("n_tok"),
            ),
        )
    else:
        print(
            f"warning: {spans_path} not found (snapshot written by a "
            "pre-dup-span build?); skipping the dup_span_savings report",
            file=sys.stderr,
        )
    for name, df in reports.items():
        out = os.path.join(args.out_dir, "reports", name)
        df.write.mode("overwrite").parquet(out)
        print(f"{name}: {df.count()} rows -> {out}")
    record_run(
        spark,
        os.path.join(args.out_dir, "_pipeline_runs"),
        {"stage": "dedup_report", "sec": round(time.time() - t0, 2)},
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="stage", required=True)
    b = sub.add_parser("build")
    b.add_argument("--sf-dir", required=True)
    b.add_argument("--out-dir", required=True)
    b.add_argument(
        "--tuning-report",
        action="store_true",
        help="also write the LSH band-parameter tuning report",
    )
    b.add_argument(
        "--scrub",
        action="store_true",
        help="also apply the dup-span plan and write scrubbed_docs",
    )
    b.add_argument(
        "--calibration",
        action="store_true",
        help="also write the (ngram n, min span len) span-policy grid",
    )
    b.set_defaults(fn=run_build)
    r = sub.add_parser("report")
    r.add_argument("--sf-dir", required=True)
    r.add_argument("--out-dir", required=True)
    r.set_defaults(fn=run_report)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
