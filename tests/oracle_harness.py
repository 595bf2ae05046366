"""Local oracle-differential harness mirroring the driver's t2 check:
run the Spark query and the DuckDB oracle SQL on the same parquet tables,
compare row count, column names, and an order-insensitive value multiset
(with normalization for floats/timestamps/dates/decimals).
"""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

import duckdb

from delta_unity_duckdb_spark.sources.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # full precision — the exact-DECIMAL strategy must agree bit-for-bit
        return f"{v:.17g}"
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    try:  # decimal
        import decimal

        if isinstance(v, decimal.Decimal):
            return f"{float(v):.17g}"
    except ImportError:
        pass
    return v


def df_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


def compare(spark_df, con, sql: str) -> dict:
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]
    duck = con.execute(sql)
    duck_cols = [d[0] for d in duck.description]
    duck_rows = duck.fetchall()

    result = {
        "rows_match": len(spark_rows) == len(duck_rows),
        "cols_match": sorted(spark_cols) == sorted(duck_cols),
        "spark_rows": len(spark_rows),
        "duck_rows": len(duck_rows),
        "spark_cols": spark_cols,
        "duck_cols": duck_cols,
    }
    if result["rows_match"] and result["cols_match"]:
        ms_s = df_multiset(spark_rows, spark_cols)
        ms_d = df_multiset(duck_rows, duck_cols)
        result["values_match"] = ms_s == ms_d
        if not result["values_match"]:
            only_s = list((ms_s - ms_d).items())[:3]
            only_d = list((ms_d - ms_s).items())[:3]
            result["diff_sample"] = {"spark_only": only_s, "duck_only": only_d}
    else:
        result["values_match"] = False
    return result
