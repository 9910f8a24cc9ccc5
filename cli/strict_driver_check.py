"""Driver-emulating strictness sweep: for every query in the driver's
50-entry hash-check window, run the Spark query and the DuckDB oracle at a
given sf and flag *dtype-kind* drift (int64 vs float64 and friends) that
the pytest oracle harness deliberately canonicalizes away but the driver's
value hash counts as a mismatch (the round-2 q12 failure class).

Usage: python cli/strict_driver_check.py [sf_dir] [n_queries | name,name,...]
Prints one line per query: OK / KIND-DRIFT / ERROR. The second argument
may be a comma-separated query-name list to narrow the sweep to touched
queries (r12 optimization workflow).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_recommendation_system_spark.registry import ORACLES, QUERIES  # noqa: E402
from big_data_recommendation_system_spark.session import get_spark  # noqa: E402
from tests.oracle import canon_rows, duckdb_run  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sel = sys.argv[2] if len(sys.argv) > 2 else "50"
    if sel.isdigit():
        names = list(QUERIES)[: int(sel)]
    else:
        names = sel.split(",")
    n = len(names)
    spark = get_spark("strict-check")
    bad = 0
    for name in names:
        if name not in ORACLES:
            print(f"{name:35s} SKIP (rows-only)")
            continue
        try:
            spark_pd = QUERIES[name](spark, sf_dir).toPandas()
            duck_pd = duckdb_run(ORACLES[name], sf_dir)
            spark.catalog.clearCache()
        except Exception as exc:  # noqa: BLE001
            print(f"{name:35s} ERROR {type(exc).__name__}: {exc}")
            bad += 1
            continue
        drift = []
        s_k = {c: spark_pd[c].dtype.kind for c in spark_pd.columns}
        d_k = {c: duck_pd[c].dtype.kind for c in duck_pd.columns}
        for c in sorted(set(s_k) & set(d_k)):
            a, b = s_k[c], d_k[c]
            # numeric kinds must agree exactly; 'O' (object) columns are
            # value-compared below and tolerated here (strings, lists,
            # DuckDB decimal → object)
            if a != b and not ("O" in (a, b)):
                drift.append(f"{c}:{a}!={b}")
        cols_ok = sorted(spark_pd.columns) == sorted(duck_pd.columns)
        rows_ok = len(spark_pd) == len(duck_pd)
        vals_ok = cols_ok and rows_ok and canon_rows(spark_pd) == canon_rows(duck_pd)
        if drift or not vals_ok:
            print(
                f"{name:35s} {'KIND-DRIFT ' + ','.join(drift) if drift else ''}"
                f"{'' if cols_ok else ' COLS'}{'' if rows_ok else ' ROWS'}"
                f"{'' if vals_ok else ' VALUES'}"
            )
            bad += 1
        else:
            print(f"{name:35s} OK")
    print(f"\n{bad} queries flagged out of {n}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
