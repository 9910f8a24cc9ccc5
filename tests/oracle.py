"""DuckDB-oracle comparison harness mirroring the driver's t2 check:
row-count + schema(column names) + order-insensitive value equality.

Values are canonicalized (timestamps → ISO strings, NaN → None, floats →
repr) and rows sorted, so the comparison is order-insensitive and exact.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb
import numpy as np
import pandas as pd

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con.sql(sql).df()


def _canon_value(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float) and math.isnan(v):
        return "\x00NULL"
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, (np.integer,)):
        v = int(v)
    if isinstance(v, (np.bool_,)):
        v = bool(v)
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return "\x00NULL"
        # midnight == plain date (duckdb's pandas bridge turns DATE into
        # datetime64; Spark returns datetime.date)
        return v.isoformat().removesuffix("T00:00:00")
    if isinstance(v, datetime):
        return v.isoformat().removesuffix("T00:00:00")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"f:{int(v)}"
        return f"f:{v!r}"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        # unified numeric form so int64 vs float64 dtype drift doesn't matter
        return f"f:{v}"
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_canon_value(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    """Assert spark_df matches the DuckDB oracle (exact comparison —
    floats canonicalized via repr, by design; no tolerance knob).
    Raises AssertionError with a readable diff on mismatch."""
    spark_pd = spark_df.toPandas()
    duck_pd = duckdb_run(oracle_sql, sf_dir)

    s_cols, d_cols = sorted(spark_pd.columns), sorted(duck_pd.columns)
    assert s_cols == d_cols, f"column mismatch: spark={s_cols} duckdb={d_cols}"
    assert len(spark_pd) == len(duck_pd), (
        f"row count mismatch: spark={len(spark_pd)} duckdb={len(duck_pd)}"
    )

    s_rows, d_rows = canon_rows(spark_pd), canon_rows(duck_pd)
    if s_rows == d_rows:
        return
    mismatches = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
    msg = [f"{len(mismatches)}/{len(s_rows)} canonical rows differ; first 5:"]
    for i, a, b in mismatches[:5]:
        msg.append(f"  row {i} (cols {s_cols}):\n    spark : {a}\n    duckdb: {b}")
    raise AssertionError("\n".join(msg))
