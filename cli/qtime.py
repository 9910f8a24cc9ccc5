"""Per-query measurement helper for optimization work (guide §1):

    python cli/qtime.py q1 q2 ... [--sf DIR] [--passes N] [--explain TAG]
    python cli/qtime.py --substrate name ...   # time substrate builders

Times each named query through the noop sink (full materialization, same
methodology as bench.py), labels the job in the UI, prints min/all pass
seconds, and with --explain TAG writes `.explain("formatted")` to
plans/r12/<query>_<TAG>.txt. Substrate mode builds the named substrates
from a cold session and times the build.

Measurement-only tooling: never used by the driver contract or bench.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_recommendation_system_spark.registry import QUERIES  # noqa: E402
from big_data_recommendation_system_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--explain", default=None, metavar="TAG")
    ap.add_argument(
        "--substrate",
        action="store_true",
        help="names are SUBSTRATE_BUILDERS keys from bench.py, not queries",
    )
    ap.add_argument(
        "--no-warm",
        action="store_true",
        help="skip the sf0.001 codegen warmup pass",
    )
    args = ap.parse_args()
    import bench  # noqa: E402  (repo root on path; for consumer grouping)

    consumers = bench.SUBSTRATE_CONSUMERS
    spark = get_spark("qtime")
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )

    if args.substrate:
        builders = dict(bench.SUBSTRATE_BUILDERS)
        for name in args.names:
            fn = builders[name]
            t0 = time.perf_counter()
            fn(spark, args.sf)
            print(f"{name:35s} build {time.perf_counter() - t0:7.3f}s")
        return

    if not args.no_warm:
        for name in args.names:
            QUERIES[name](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
            if name not in consumers:
                spark.catalog.clearCache()

    for name in args.names:
        if args.explain:
            os.makedirs(plans_dir, exist_ok=True)
            df = QUERIES[name](spark, args.sf)
            with open(
                os.path.join(plans_dir, f"{name}_{args.explain}.txt"), "w"
            ) as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                    df._jdf.queryExecution(), "formatted"
                ))
        times = []
        for _ in range(args.passes):
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.perf_counter()
            QUERIES[name](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            # mirror bench.py: substrate consumers share the persisted
            # substrate across passes; everything else starts cold
            if name not in consumers:
                spark.catalog.clearCache()
        joined = " ".join(f"{t:6.3f}" for t in times)
        print(f"{name:35s} min {min(times):7.3f}s  [{joined}]")


if __name__ == "__main__":
    main()
