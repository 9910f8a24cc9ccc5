"""Batch orchestrator CLI — the Spark replacement for the reference's
``python main_pipeline.py --topics ... --files-per-topic N`` +
``python gold_pipeline.py --max-files N`` pair
(main_pipeline.py:377-416, gold_pipeline.py:398-439).

Instead of file-count budgets (a memory guardrail Spark doesn't need),
scoping is by date range — the partition-pruned idiom.

    python cli/run_pipeline.py silver --bronze-dir B --silver-dir S \
        --topics clickstream,user_events,product_events
    python cli/run_pipeline.py gold --silver-dir S --gold-dir G
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_recommendation_system_spark.plans import reference_gold, reference_silver
from big_data_recommendation_system_spark.sources.bronze import read_bronze
from big_data_recommendation_system_spark.sources.schemas import CORRUPT_COL
from big_data_recommendation_system_spark.sources.sinks import record_run, write_silver
from big_data_recommendation_system_spark.session import get_spark

CLEANERS = {
    "clickstream": reference_silver.clean_clickstream,
    "user_events": reference_silver.clean_users,
    "product_events": reference_silver.clean_products,
}

GOLD_TABLES = {
    "user_summary": reference_gold.user_summary,
    "product_summary": reference_gold.product_summary,
    "daily_stats": reference_gold.daily_stats,
    "engagement_metrics": reference_gold.engagement_metrics,
}


def run_silver(args: argparse.Namespace) -> None:
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    spark = get_spark("bdrs-silver")
    results = {}
    for topic in args.topics.split(","):
        t0 = time.time()
        raw = read_bronze(spark, topic, os.path.join(args.bronze_dir, topic))
        # Observations ride the write job — raw/corrupt/clean counts come
        # from the single pass that writes silver, no caching, no rescans
        # (split_corrupt's cached two-branch split is for small batches)
        obs_in, obs_out = Observation(), Observation()
        raw = raw.observe(
            obs_in,
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(CORRUPT_COL).isNotNull().cast("long")).alias("bad"),
        )
        good = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
        silver = CLEANERS[topic](good).observe(
            obs_out, F.count(F.lit(1)).alias("n")
        )
        write_silver(silver, os.path.join(args.silver_dir, f"{topic}_silver"))
        n_raw, n_bad = obs_in.get["n"], obs_in.get["bad"] or 0
        n_clean = obs_out.get["n"]
        rate = n_clean / n_raw if n_raw else 1.0
        results[f"{topic}_rate"] = round(rate, 4)
        if rate < 0.8:  # reference quality threshold (main_pipeline.py:177)
            print(f"WARNING: {topic} validity {rate:.1%} below 0.8", file=sys.stderr)
        print(
            f"{topic}: raw={n_raw} corrupt={n_bad} clean={n_clean} "
            f"({time.time() - t0:.1f}s)"
        )
    record_run(
        spark,
        os.path.join(args.silver_dir, "_pipeline_runs"),
        {"stage": "silver", **results},
    )


def run_gold(args: argparse.Namespace) -> None:
    spark = get_spark("bdrs-gold")
    clickstream = spark.read.parquet(
        os.path.join(args.silver_dir, "clickstream_silver")
    ).cache()  # one read feeds all four gold tables (gold_pipeline.py:361-389)
    # Validate --skew-keys BEFORE the gold loop: a typo'd key must fail
    # fast with a readable message, not as an AnalysisException after all
    # four gold tables have already been written.
    skew_keys: tuple[str, ...] = ()
    if getattr(args, "skew_report", False):
        skew_keys = tuple(k for k in args.skew_keys.split(",") if k)
        missing = [k for k in skew_keys if k not in clickstream.columns]
        if not skew_keys or missing:
            msg = (
                f"--skew-keys: unknown column(s) {missing}"
                if missing
                else "--skew-keys: no key columns given"
            )
            sys.exit(f"{msg}; available: {', '.join(clickstream.columns)}")
    for name, builder in GOLD_TABLES.items():
        t0 = time.time()
        df = builder(clickstream)
        df.write.mode("overwrite").parquet(os.path.join(args.gold_dir, name))
        print(f"{name}: {df.count()} rows ({time.time() - t0:.1f}s)")
    if getattr(args, "skew_report", False):
        # Operational loop: measure key skew on the silver table that
        # feeds every gold aggregation, write the diagnostic beside the
        # run metadata — the artifact an operator reads to decide which
        # keys need salted_agg / AQE skew handling before scaling up.
        from big_data_recommendation_system_spark.operators.skew import (
            key_skew_frame,
        )

        skew_path = os.path.join(args.gold_dir, "_skew_report")
        key_skew_frame(clickstream, skew_keys).write.mode("overwrite").parquet(
            skew_path
        )
        print(f"skew report ({','.join(skew_keys)}) -> {skew_path}")
    # release the silver cache: the CLI may run several stages in one
    # session (library path), so even one-shot caches get unpersisted
    clickstream.unpersist()
    record_run(spark, os.path.join(args.gold_dir, "_pipeline_runs"), {"stage": "gold"})


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="stage", required=True)
    s = sub.add_parser("silver")
    s.add_argument("--bronze-dir", required=True)
    s.add_argument("--silver-dir", required=True)
    s.add_argument("--topics", default="clickstream,user_events,product_events")
    s.set_defaults(fn=run_silver)
    g = sub.add_parser("gold")
    g.add_argument("--silver-dir", required=True)
    g.add_argument("--gold-dir", required=True)
    g.add_argument(
        "--skew-report",
        action="store_true",
        help="also write a heavy-hitter key-skew diagnostic (_skew_report)",
    )
    g.add_argument("--skew-keys", default="user_id,product_id")
    g.set_defaults(fn=run_gold)
    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
