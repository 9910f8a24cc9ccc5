"""Model-curation materialization CLI — the production shape of the
trained-filter stack (plans/quality_models.py): TRAIN the curation
models once per corpus snapshot, WRITE them as Parquet, then SERVE
every document from the written models without retraining. The written
artifacts are the on-disk twins of the qm:* session substrates — same
frames, same determinism discipline, so CLI output and driver-hashed
query output agree by construction (pinned by
tests/test_units.py::test_run_curation_cli_end_to_end).

    python cli/run_curation.py train --sf-dir SF --out-dir OUT
    python cli/run_curation.py score --sf-dir SF --out-dir OUT
    python cli/run_curation.py mix   --sf-dir SF --out-dir OUT

``train`` writes OUT/nb_model (token, cnt_hi, cnt_lo, vote, odds,
disc), OUT/lm_unigrams (token, c1), OUT/lm_bigrams (pair, c2, c1_w1),
OUT/dsir_ratios (bucket, ratio_fp) and OUT/dsir_log_ratios (bucket,
log_ratio_fp — the paper-fidelity fixed-point companion), plus run
metadata in OUT/_pipeline_runs. ``score`` READS those models back
(never retrains — the frozen-model serving path, the same algebra the
streaming foreachBatch e2e proves over micro-batches) and writes
per-document OUT/nb_scores, OUT/lm_scores, OUT/dsir_weights,
OUT/dsir_log_weights and the joined OUT/curation_scores manifest a
downstream mixture/assembly stage consumes. ``mix`` writes the two
data-derived mixture planners (OUT/doremi_weights, OUT/unimax_plan).

Scale: training is explode → hash-agg (model frames are
vocabulary-bounded, written once); serving is one keyed hash join per
model over per-doc feature counts — O(corpus) with no global barrier,
so `score` re-runs cheaply on every new snapshot while `train`
amortizes across them.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_recommendation_system_spark.functions.text import tokens
from big_data_recommendation_system_spark.plans.quality_models import (
    dsir_ratio_table,
    dsir_weight_docs,
    lm_bigram_table,
    lm_score_docs,
    lm_unigram_table,
    nb_model_table,
    nb_score_docs,
)
from big_data_recommendation_system_spark.session import get_spark
from big_data_recommendation_system_spark.sources.sinks import record_run
from big_data_recommendation_system_spark.sources.tables import load_table

MODEL_ARTIFACTS = ("nb_model", "lm_unigrams", "lm_bigrams", "dsir_ratios")


def run_train(args: argparse.Namespace) -> None:
    spark = get_spark("bdrs-curation")
    t0 = time.time()
    from big_data_recommendation_system_spark.plans.quality_models import (
        dsir_log_ratio_table,
    )

    frames = {
        "nb_model": nb_model_table(spark, args.sf_dir),
        "lm_unigrams": lm_unigram_table(spark, args.sf_dir),
        "lm_bigrams": lm_bigram_table(spark, args.sf_dir),
        "dsir_ratios": dsir_ratio_table(spark, args.sf_dir),
        # paper-fidelity DSIR companion: the fixed-point log-ratio table
        # (1024 rows) — a frozen model artifact like the linear ratios
        "dsir_log_ratios": dsir_log_ratio_table(spark, args.sf_dir),
    }
    sizes = {}
    for name, df in frames.items():
        df.write.mode("overwrite").parquet(os.path.join(args.out_dir, name))
        sizes[f"n_{name}"] = spark.read.parquet(
            os.path.join(args.out_dir, name)
        ).count()
    record_run(
        spark,
        os.path.join(args.out_dir, "_pipeline_runs"),
        {"stage": "curation_train", "sf_dir": args.sf_dir,
         "elapsed_sec": round(time.time() - t0, 3), **sizes},
    )


def run_score(args: argparse.Namespace) -> None:
    spark = get_spark("bdrs-curation")
    t0 = time.time()
    # frozen models from disk — no session substrate, no retraining
    nb = spark.read.parquet(os.path.join(args.out_dir, "nb_model"))
    uni = spark.read.parquet(os.path.join(args.out_dir, "lm_unigrams"))
    bi = spark.read.parquet(os.path.join(args.out_dir, "lm_bigrams"))
    ratios = spark.read.parquet(os.path.join(args.out_dir, "dsir_ratios"))

    docs = load_table(spark, args.sf_dir, "documents").select(
        "doc_id", "source", tokens(F.col("text")).alias("tok")
    )
    from big_data_recommendation_system_spark.plans.quality_models import (
        dsir_log_weight_docs,
    )

    log_ratios = spark.read.parquet(
        os.path.join(args.out_dir, "dsir_log_ratios")
    )
    nb_sc = nb_score_docs(docs, nb)
    lm_sc = lm_score_docs(docs, bi, uni)
    dw = dsir_weight_docs(docs, ratios)
    lw = dsir_log_weight_docs(docs, log_ratios)
    nb_sc.write.mode("overwrite").parquet(os.path.join(args.out_dir, "nb_scores"))
    lm_sc.write.mode("overwrite").parquet(os.path.join(args.out_dir, "lm_scores"))
    dw.write.mode("overwrite").parquet(os.path.join(args.out_dir, "dsir_weights"))
    lw.write.mode("overwrite").parquet(
        os.path.join(args.out_dir, "dsir_log_weights")
    )

    # the joined per-document manifest a mixture/assembly stage consumes;
    # read the just-written tables back so the manifest provably derives
    # from the on-disk artifacts (same rule as run_index's report stage).
    # LEFT joins: a document too short to score (no tokens → no NB/DSIR
    # row; fewer than two tokens → no LM row) must still appear in the
    # manifest with NULL scores — dropping it would hide it from the
    # downstream stage entirely (review finding)
    manifest = (
        docs.select("doc_id", "source")
        .join(
            spark.read.parquet(os.path.join(args.out_dir, "nb_scores")).select(
                "doc_id", "vote_sum", "predicted_hi"
            ),
            "doc_id",
            "left",
        )
        .join(
            spark.read.parquet(os.path.join(args.out_dir, "lm_scores")).select(
                "doc_id", "n_bigrams", "n_oov", "mean_bigram_prob"
            ),
            "doc_id",
            "left",
        )
        .join(
            spark.read.parquet(
                os.path.join(args.out_dir, "dsir_weights")
            ).select("doc_id", "weight_fp"),
            "doc_id",
            "left",
        )
    )
    manifest.write.mode("overwrite").parquet(
        os.path.join(args.out_dir, "curation_scores")
    )
    n = spark.read.parquet(os.path.join(args.out_dir, "curation_scores")).count()
    record_run(
        spark,
        os.path.join(args.out_dir, "_pipeline_runs"),
        {"stage": "curation_score", "sf_dir": args.sf_dir,
         "elapsed_sec": round(time.time() - t0, 3), "n_docs_scored": n},
    )


def run_mix(args: argparse.Namespace) -> None:
    """Write the corpus-level mixture planners beside the model
    artifacts: the DoReMi-lite multiplicative-weights posterior and the
    UniMax epoch-capped uniform allocation — the two data-derived
    alternatives to hand-set target shares that a downstream sampling
    stage (mixture_sample / token_budget_sample) consumes. Both are the
    registered (oracle-hashed) queries, so the written grids equal the
    driver-checked outputs by construction.

    The planner grids are then CONSUMED, not left as leaves: the per-doc
    sampling manifests (doremi_sample, unimax_draw) are derived by
    reading the WRITTEN grids back and feeding them through the same
    ``_from`` helpers the registered sampling queries use inline — the
    frozen-planner serving path, mirroring how ``score`` reads the
    written models (written == inline pinned by the CLI e2e test)."""
    from big_data_recommendation_system_spark.plans.packing import (
        unimax_budget_draw_from,
        unimax_mixture_plan,
    )
    from big_data_recommendation_system_spark.plans.quality_models import (
        doremi_mixture_sample_from,
        doremi_domain_weights,
    )
    from big_data_recommendation_system_spark.sources.tables import load_table

    spark = get_spark("bdrs-curation")
    t0 = time.time()
    outputs = {
        "doremi_weights": doremi_domain_weights(spark, args.sf_dir),
        "unimax_plan": unimax_mixture_plan(spark, args.sf_dir),
    }
    sizes = {}
    for name, df in outputs.items():
        df.write.mode("overwrite").parquet(os.path.join(args.out_dir, name))
        sizes[f"n_{name}"] = spark.read.parquet(
            os.path.join(args.out_dir, name)
        ).count()
    docs = load_table(spark, args.sf_dir, "documents")
    manifests = {
        "doremi_sample": doremi_mixture_sample_from(
            docs,
            spark.read.parquet(os.path.join(args.out_dir, "doremi_weights")),
        ),
        "unimax_draw": unimax_budget_draw_from(
            docs,
            spark.read.parquet(os.path.join(args.out_dir, "unimax_plan")),
        ),
    }
    for name, df in manifests.items():
        df.write.mode("overwrite").parquet(os.path.join(args.out_dir, name))
        sizes[f"n_{name}"] = spark.read.parquet(
            os.path.join(args.out_dir, name)
        ).count()
    record_run(
        spark,
        os.path.join(args.out_dir, "_pipeline_runs"),
        {"stage": "curation_mix", "sf_dir": args.sf_dir,
         "elapsed_sec": round(time.time() - t0, 3), **sizes},
    )


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    for cmd, fn in (
        ("train", run_train),
        ("score", run_score),
        ("mix", run_mix),
    ):
        s = sub.add_parser(cmd)
        s.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        s.add_argument("--out-dir", required=True)
        s.set_defaults(fn=fn)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
