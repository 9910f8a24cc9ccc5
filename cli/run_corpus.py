"""End-to-end training-corpus assembly CLI — the production pipeline a
training run starts from (the corpus-side counterpart of
cli/run_pipeline.py's event pipeline, reference main_pipeline.py:1-40's
bronze→silver→gold staging re-expressed over documents):

    python cli/run_corpus.py build  --sf-dir SF --out-dir OUT [--dedup-dir D]
    python cli/run_corpus.py report --sf-dir SF --out-dir OUT

``build`` runs the assembly funnel and writes OUT/corpus_manifest
(one row per surviving document with split + pack assignment,
partitioned by split) and OUT/funnel (documents and tokens dropped per
stage). ``report`` READS the manifest back (never recomputes the
funnel) and writes OUT/reports/{corpus_card,packing_stats}.

Funnel stages, in order — each document is attributed to the FIRST
stage that drops it:

1. ``exact_dup``    — exact content dedup, keep lowest doc_id per
                      md5(text) (same rule as corpus_prep_summary).
2. ``near_dup``     — MinHash/LSH near-dup clusters; the cluster
                      representative (longest doc, tie-break lowest
                      doc_id — operators/text_dedup.retention_plan_from)
                      survives, the rest drop. Reads ``--dedup-dir``'s
                      written dup_clusters parquet when given (the
                      run_dedup.py snapshot); otherwise computes the
                      substrate in-session.
3. quality gates    — plans/packing.funnel_doc_gates: ``length``,
                      ``distinct_ratio``, ``top_word``, ``lang``,
                      ``boilerplate`` (first failed gate names the
                      stage).
4. ``contaminated`` — TRAIN documents whose distinct word n-grams
                      overlap the post-filter eval splits by >=
                      DECON_TAU drop
                      (plans/corpus_prep.train_eval_hits_from applied
                      to the corpus that actually ships — the
                      registered train_contamination_scan query is the
                      same core over the raw corpus, reporting the
                      stricter any-hit flag for auditing).
5. ``kept``         — survivors get a deterministic split
                      (corpus_prep.split_bucket) and a per-split
                      sequence-pack assignment (exclusive token prefix
                      sum → pack_id = floor(offset / PACK_BUDGET),
                      plans/packing semantics) via the scalable exact
                      prefix machinery (operators/ranking) — no
                      single-partition window anywhere.

Scale shape: every signal (content hash, gates, cluster table, eval
hits) is a narrow doc_id-keyed frame; the funnel is one final join
chain on doc_id. The near-dup substrate is computed once per snapshot
(or read from its written parquet); the prefix sum is the same
range-repartition + broadcast-offsets machinery the packing queries
use. Nothing quadratic, no driver-side loops.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_recommendation_system_spark.plans.assembly import (
    funnel_rollup,
    pack_survivors,
    staged_docs,
)
from big_data_recommendation_system_spark.plans.packing import PACK_BUDGET
from pyspark.sql import functions as F

from big_data_recommendation_system_spark.session import get_spark
from big_data_recommendation_system_spark.sources.sinks import record_run


def run_build(args: argparse.Namespace) -> None:
    spark = get_spark("bdrs-corpus-build")
    t0 = time.time()
    staged = staged_docs(spark, args.sf_dir, getattr(args, "dedup_dir", None))
    funnel = funnel_rollup(staged)
    funnel.write.mode("overwrite").parquet(os.path.join(args.out_dir, "funnel"))

    manifest = pack_survivors(staged)
    (
        manifest.write.mode("overwrite")
        .partitionBy("split")
        .parquet(os.path.join(args.out_dir, "corpus_manifest"))
    )

    counts = {r.drop_reason: r.n_docs for r in funnel.collect()}
    n_in = sum(counts.values())
    n_kept = counts.get("kept", 0)
    info = {
        "stage": "corpus_build",
        "sf_dir": os.path.abspath(args.sf_dir),
        "n_input_docs": n_in,
        "n_kept_docs": n_kept,
        "sec": round(time.time() - t0, 2),
    }
    record_run(spark, os.path.join(args.out_dir, "_pipeline_runs"), info)
    dropped = {k: v for k, v in counts.items() if k != "kept"}
    print(
        f"corpus build: {n_in} docs in -> {n_kept} kept "
        f"(drops: {dropped}) ({info['sec']}s)"
    )


def run_report(args: argparse.Namespace) -> None:
    spark = get_spark("bdrs-corpus-report")
    t0 = time.time()
    # READ the manifest back — reports never recompute the funnel
    manifest = spark.read.parquet(
        os.path.join(args.out_dir, "corpus_manifest")
    )
    reports = {
        # the corpus card a training run starts from
        "corpus_card": (
            manifest.groupBy("split", "lang")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_tokens").cast("long").alias("total_tokens"),
            )
            .orderBy("split", "lang")
        ),
        # packing efficiency per split: utilization = tokens per pack /
        # budget (the last, partially-filled pack drags it below 1.0)
        "packing_stats": (
            manifest.groupBy("split")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_tokens").cast("long").alias("total_tokens"),
                (F.max("pack_id") + 1).cast("long").alias("n_packs"),
            )
            .withColumn(
                "utilization",
                F.col("total_tokens")
                / (F.col("n_packs") * F.lit(PACK_BUDGET)),
            )
            .orderBy("split")
        ),
    }
    for name, df in reports.items():
        out = os.path.join(args.out_dir, "reports", name)
        df.write.mode("overwrite").parquet(out)
        print(f"{name}: {df.count()} rows -> {out}")
    record_run(
        spark,
        os.path.join(args.out_dir, "_pipeline_runs"),
        {"stage": "corpus_report", "sec": round(time.time() - t0, 2)},
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="stage", required=True)
    b = sub.add_parser("build")
    b.add_argument("--sf-dir", required=True)
    b.add_argument("--out-dir", required=True)
    b.add_argument("--dedup-dir", default=None)
    b.set_defaults(fn=run_build)
    r = sub.add_parser("report")
    r.add_argument("--sf-dir", required=True)
    r.add_argument("--out-dir", required=True)
    r.set_defaults(fn=run_report)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
