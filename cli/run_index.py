"""Vector-index materialization CLI — the production shape of the
similarity stack: compute the embedding index artifacts ONCE per corpus
snapshot, WRITE them as Parquet, and run index-health reports off the
written tables instead of recomputing folds per report. The written
artifacts are the on-disk twins of the session substrates
(operators/emb_substrate.py, operators/similarity.py, operators/srp.py)
— same frames, same determinism discipline, so CLI output and
driver-hashed query output agree by construction.

    python cli/run_index.py build  --sf-dir SF --out-dir OUT
    python cli/run_index.py update --sf-dir SF --out-dir OUT --batch-min-vec-id N
    python cli/run_index.py report --sf-dir SF --out-dir OUT

``build`` writes OUT/emb_norms (vec_id, nrm), OUT/ivf_assign (vec_id,
centroid_id), OUT/pq_codes (vec_id, s, code, d) and OUT/srp_signatures
(vec_id, b0..b{bands-1}), plus run metadata in OUT/_pipeline_runs.
``update`` is INCREMENTAL index maintenance — the continuous-ingestion
shape the streaming e2es prove in-memory (srp_incremental_pairs /
incremental_near_dup): vectors with vec_id >= N are the incoming batch;
their artifacts are computed batch-only (every artifact is per-vector
given the FIXED model parameters — IVF/PQ centroid vectors live at the
low vec_ids of the base corpus, SRP planes are data-independent md5
constants) and APPENDED to the existing tables, then the skew reports
are re-emitted. build(full) == build(prefix) + update(suffix) frame-for-
frame (pinned by tests/test_units.py); cost is O(batch), never a corpus
re-index.
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


def run_update(args: argparse.Namespace) -> None:
    """Append artifacts for the vec_id >= N batch to the existing index.

    The batch's dims are unioned with the CENTROID vectors' dims (the
    model parameters — IVF coarse centroids are vec_id < IVF_CENTROIDS,
    PQ codebook entries vec_id < PQ_CENTROIDS) so the assignment joins
    see the same codebooks as a full build, then the output is filtered
    back to the batch before the append. Same DECIMAL-exact folds as
    the build path, so appended rows are bit-identical to a rebuild's."""
    from big_data_recommendation_system_spark.operators.emb_substrate import (
        _NORM_FOLD,
    )
    from big_data_recommendation_system_spark.operators.similarity import (
        IVF_CENTROIDS,
        PQ_CENTROIDS,
        _ivf_assignments,
        _norms_from_dims,
        _pq_codes_frame,
        _pq_sub_dims,
    )
    from big_data_recommendation_system_spark.operators.srp import (
        E_SCALE,
        srp_sig_frame,
    )
    from big_data_recommendation_system_spark.sources.tables import load_table

    spark = get_spark("bdrs-index-update")
    t0 = time.time()
    n = args.batch_min_vec_id
    n_model = max(IVF_CENTROIDS, PQ_CENTROIDS)
    if n <= n_model:
        sys.exit(
            f"--batch-min-vec-id must exceed the model-parameter id range "
            f"(centroids live at vec_id < {n_model}); got {n}"
        )
    # double-append guard: refuse if the index already holds batch ids
    existing = spark.read.parquet(os.path.join(args.out_dir, "emb_norms"))
    dup = existing.filter(F.col("vec_id") >= n).count()
    if dup:
        sys.exit(
            f"index already contains {dup} rows with vec_id >= {n}; "
            "refusing to double-append"
        )
    emb = load_table(spark, args.sf_dir, "embeddings")
    batch = emb.filter(F.col("vec_id") >= n)
    model = emb.filter(F.col("vec_id") < n_model)
    e = batch.unionByName(model).select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("e"),
    )
    dims = e.select(F.col("vec_id").alias("vid"), F.posexplode("e")).select(
        "vid", "pos", F.col("col").alias("x")
    )
    is_batch = F.col("vec_id") >= n
    frames = {
        "emb_norms": e.filter(is_batch).select(
            "vec_id", F.sqrt(F.expr(_NORM_FOLD)).alias("nrm")
        ),
        "ivf_assign": _ivf_assignments(
            None, dims, _norms_from_dims(dims, "vid", "nrm")
        ).filter(is_batch),
        "pq_codes": _pq_codes_frame(_pq_sub_dims(dims)).filter(is_batch),
        "srp_signatures": srp_sig_frame(
            e.filter(is_batch).select(
                "vec_id",
                F.expr(
                    f"transform(e, x -> CAST(round(x * {E_SCALE}) AS BIGINT))"
                ).alias("q"),
            )
        ),
    }
    for name, df in frames.items():
        df.write.mode("append").parquet(os.path.join(args.out_dir, name))
        print(f"{name}: +{df.count()} rows appended")
    record_run(
        spark,
        os.path.join(args.out_dir, "_pipeline_runs"),
        {
            "stage": "index_update",
            "sf_dir": args.sf_dir,
            "batch_min_vec_id": str(n),
        },
    )
    print(f"index update: {time.time() - t0:.1f}s -> {args.out_dir}")
    # skew diagnostics reflect the post-update index
    run_report(args)


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
    u = sub.add_parser("update")
    u.add_argument("--sf-dir", required=True)
    u.add_argument("--out-dir", required=True)
    u.add_argument("--batch-min-vec-id", type=int, required=True)
    r = sub.add_parser("report")
    r.add_argument("--sf-dir", required=True)
    r.add_argument("--out-dir", required=True)
    args = ap.parse_args()
    if args.stage == "build":
        run_build(args)
    elif args.stage == "update":
        run_update(args)
    else:
        run_report(args)


if __name__ == "__main__":
    main()
