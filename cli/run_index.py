"""Vector-index materialization CLI — the production shape of the
similarity stack: compute the embedding index artifacts ONCE per corpus
snapshot, WRITE them as Parquet, and run index-health reports off the
written tables instead of recomputing folds per report. The written
artifacts are the on-disk twins of the session substrates
(operators/emb_substrate.py, operators/similarity.py, operators/srp.py)
— same frames, same determinism discipline, so CLI output and
driver-hashed query output agree by construction.

    python cli/run_index.py build  --sf-dir SF --out-dir OUT
    python cli/run_index.py report --sf-dir SF --out-dir OUT

``build`` writes OUT/emb_norms (vec_id, nrm), OUT/ivf_assign (vec_id,
centroid_id), OUT/pq_codes (vec_id, s, code, d) and OUT/srp_signatures
(vec_id, b0..b{bands-1}), plus run metadata in OUT/_pipeline_runs.
``report`` READS those tables back (never recomputes them) and writes
OUT/reports/{ivf_cell_sizes,pq_code_usage,srp_bucket_stats} — the skew
diagnostics an operator checks before pointing a 100 TB search job at
the index (an oversized IVF cell or SRP bucket is the hot-task
precursor; a starved PQ code wastes codebook capacity).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_recommendation_system_spark.operators.emb_substrate import (
    emb_norms,
)
from big_data_recommendation_system_spark.operators.similarity import (
    ivf_assign_table,
    pq_codes_table,
)
from big_data_recommendation_system_spark.operators.srp import (
    SRP_BANDS,
    srp_sig_table,
)
from big_data_recommendation_system_spark.session import get_spark
from big_data_recommendation_system_spark.sources.sinks import record_run

ARTIFACTS = ("emb_norms", "ivf_assign", "pq_codes", "srp_signatures")


def run_build(args: argparse.Namespace) -> None:
    spark = get_spark("bdrs-index-build")
    t0 = time.time()
    frames = {
        "emb_norms": emb_norms(spark, args.sf_dir).withColumnRenamed(
            "vid", "vec_id"
        ),
        "ivf_assign": ivf_assign_table(spark, args.sf_dir),
        "pq_codes": pq_codes_table(spark, args.sf_dir),
        "srp_signatures": srp_sig_table(spark, args.sf_dir),
    }
    for name, df in frames.items():
        df.write.mode("overwrite").parquet(os.path.join(args.out_dir, name))
        print(f"{name}: {df.count()} rows")
    record_run(
        spark,
        os.path.join(args.out_dir, "_pipeline_runs"),
        {"stage": "index_build", "sf_dir": args.sf_dir},
    )
    print(f"index build: {time.time() - t0:.1f}s -> {args.out_dir}")


def run_report(args: argparse.Namespace) -> None:
    spark = get_spark("bdrs-index-report")
    read = lambda n: spark.read.parquet(os.path.join(args.out_dir, n))  # noqa: E731
    rep_dir = os.path.join(args.out_dir, "reports")

    cell_sizes = (
        read("ivf_assign")
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
        .orderBy("centroid_id")
    )
    code_usage = (
        read("pq_codes")
        .groupBy("s", "code")
        .agg(F.count(F.lit(1)).cast("long").alias("n_vectors"))
        .orderBy("s", "code")
    )
    sigs = read("srp_signatures")
    bands = sigs.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"b{b}").alias("key"))
                    for b in range(SRP_BANDS)
                ]
            )
        ).alias("bk")
    ).select("bk.band", "bk.key")
    bucket_stats = (
        bands.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.max("n").cast("long").alias("max_bucket"),
            F.sum((F.col("n") * (F.col("n") - 1) / 2).cast("long")).alias(
                "candidate_pairs"
            ),
        )
        .orderBy("band")
    )
    for name, df in (
        ("ivf_cell_sizes", cell_sizes),
        ("pq_code_usage", code_usage),
        ("srp_bucket_stats", bucket_stats),
    ):
        df.write.mode("overwrite").parquet(os.path.join(rep_dir, name))
        print(f"reports/{name}: {df.count()} rows")
    record_run(
        spark,
        os.path.join(args.out_dir, "_pipeline_runs"),
        {"stage": "index_report", "sf_dir": args.sf_dir},
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="stage", required=True)
    b = sub.add_parser("build")
    b.add_argument("--sf-dir", required=True)
    b.add_argument("--out-dir", required=True)
    r = sub.add_parser("report")
    r.add_argument("--sf-dir", required=True)
    r.add_argument("--out-dir", required=True)
    args = ap.parse_args()
    if args.stage == "build":
        run_build(args)
    else:
        run_report(args)


if __name__ == "__main__":
    main()
