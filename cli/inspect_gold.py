"""Gold-layer inspection CLI — the Spark analogue of the reference's
``view_gold_data.py`` (processing/gold/view_gold_data.py:17-111) and
``check_gold_layer.py`` (processing/silver-to-gold/check_gold_layer.py:27-107):
list the gold tables, show per-table record counts / schemas / samples, and
the per-table "insights" blocks (activity-level histogram, popularity
tiers, daily actives, engagement shares).

Where the reference pulls whole parquet objects into pandas one file at a
time, this runs each summary as a Spark aggregation — counts and
histograms are jobs, samples are ``limit(n)``, nothing materializes the
full table on the driver.

    python cli/inspect_gold.py --gold-dir G          # written gold layer
    python cli/inspect_gold.py --sf-dir /root/testdata/sf0.01   # from source
"""

from __future__ import annotations

import argparse
import os
import sys
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_recommendation_system_spark.session import get_spark

GOLD_TABLE_NAMES = [
    "user_summary",
    "product_summary",
    "daily_stats",
    "engagement_metrics",
]

SAMPLE_ROWS = 3


def _histogram(df: DataFrame, col: str) -> dict[str, int]:
    return {
        r[col]: r["n"]
        for r in df.groupBy(col).agg(F.count(F.lit(1)).alias("n")).collect()
    }


def _insights(name: str, df: DataFrame) -> list[str]:
    """Per-table insight lines, mirroring view_gold_data.py:63-96 — each is
    one aggregation job, not a driver-side pandas scan."""
    cols = set(df.columns)
    out: list[str] = []
    if name == "user_summary" and {"activity_level", "total_events"} <= cols:
        agg = df.agg(
            F.avg("total_events").alias("avg_ev"),
            F.max("total_events").alias("max_ev"),
        ).first()
        out.append(f"  Activity levels: {_histogram(df, 'activity_level')}")
        out.append(f"  Avg events per user: {agg['avg_ev']:.1f}")
        out.append(f"  Most active user: {agg['max_ev']} events")
    elif name == "product_summary" and "popularity_tier" in cols:
        out.append(f"  Popularity tiers: {_histogram(df, 'popularity_tier')}")
        if "unique_viewers" in cols:
            agg = df.agg(
                F.avg("unique_viewers").alias("avg_v"),
                F.max("unique_viewers").alias("max_v"),
            ).first()
            out.append(f"  Avg viewers per product: {agg['avg_v']:.1f}")
            out.append(f"  Top product: {agg['max_v']} viewers")
    elif name == "daily_stats" and "daily_active_users" in cols:
        agg = df.agg(
            F.avg("daily_active_users").alias("dau"),
            F.sum("total_events").alias("ev"),
        ).first()
        out.append(f"  Avg daily active users: {agg['dau']:.1f}")
        out.append(f"  Total events across days: {agg['ev']}")
    elif name == "engagement_metrics" and {"event_type", "total_events"} <= cols:
        for r in df.orderBy(F.desc("total_events")).collect():
            pct = r["event_pct"] if "event_pct" in cols else 0.0
            out.append(
                f"    {r['event_type']}: {r['total_events']} events ({pct:.1f}%)"
            )
    return out


def _show(name: str, df: DataFrame) -> int:
    n = df.count()
    print(f"\n{name.upper()}")
    print("-" * 40)
    print(f"Records: {n}")
    print(f"Columns: {df.columns}")
    for line in _insights(name, df):
        print(line)
    print(f"Sample ({SAMPLE_ROWS} rows):")
    df.show(SAMPLE_ROWS, truncate=40)
    return n


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--gold-dir", help="gold layer written by run_pipeline.py")
    src.add_argument("--sf-dir", help="compute gold in-memory from testdata")
    args = ap.parse_args()

    spark = get_spark("bdrs-inspect")
    print("GOLD LAYER SUMMARY")
    print("=" * 50)

    total = 0
    found = 0
    if args.gold_dir:
        for name in GOLD_TABLE_NAMES:
            path = os.path.join(args.gold_dir, name)
            if not os.path.exists(path):
                print(f"\n{name.upper()}: not present at {path}")
                continue
            found += 1
            total += _show(name, spark.read.parquet(path))
    else:
        from big_data_recommendation_system_spark.registry import QUERIES

        for name in GOLD_TABLE_NAMES:
            found += 1
            total += _show(name, QUERIES[name](spark, args.sf_dir))

    print("\nOVERALL")
    print("=" * 50)
    print(f"Tables: {found}/{len(GOLD_TABLE_NAMES)}")
    print(f"Total records: {total}")
    print(
        "Checked:",
        datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S UTC"),
    )


if __name__ == "__main__":
    main()
