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


# ---------------------------------------------------------------- strict
# driver-mirror comparison: the per-round driver canonicalizes through
# pandas (spark_df.toPandas() vs duckdb .df()) and hashes TYPE-sensitively
# — int64 662 != float64 662.0, decimal.Decimal objects never equal floats,
# and list-valued cells crash pandas sort_values. cell_sig tags each cell;
# tags ending in '!' violate the output convention (BIGINT / DOUBLE /
# STRING / BOOL / DATE-as-TIMESTAMP only) even when values agree.


def cell_sig(v):
    import decimal as _dec
    import json as _json

    import numpy as np
    import pandas as pd

    if v is None:
        return ("null",)
    if isinstance(v, bool) or type(v).__name__ == "bool_":
        return ("bool", bool(v))
    if isinstance(v, (int,)) or isinstance(v, np.integer):
        return ("int", int(v))
    if isinstance(v, float) or isinstance(v, np.floating):
        f = float(v)
        if math.isnan(f):
            return ("float", "nan")
        return ("float", f.hex())
    if isinstance(v, _dec.Decimal):
        return ("decimal!", str(v))
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return ("null",)
        return ("ts", v.isoformat())
    if isinstance(v, dt.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, dt.date):
        # object-dtype date: DuckDB surfaces DATE as datetime64 — spark-side
        # date objects hash differently; convention says emit TIMESTAMP
        return ("date!", v.isoformat())
    if isinstance(v, str):
        return ("str", v)
    if isinstance(v, (list, tuple, dict)) or isinstance(v, np.ndarray):
        return ("array!", _json.dumps(v, default=str))
    if v is pd.NaT:
        return ("null",)
    return (type(v).__name__ + "!", str(v))


def _canon_sigs(pdf):
    from collections import Counter as _Counter

    cols = sorted(pdf.columns)
    sigs = _Counter()
    violations = set()
    for row in pdf[cols].itertuples(index=False, name=None):
        rs = tuple(cell_sig(v) for v in row)
        for s in rs:
            if s[0].endswith("!"):
                violations.add(s[0])
        sigs[rs] += 1
    return sigs, violations


def strict_compare(spark_df, con, sql: str) -> dict:
    """Pandas-level, type-sensitive mirror of the driver's correctness
    check. ``hash_match`` + empty ``violations`` here predicts a
    driver-green CORRECTNESS row."""
    spdf = spark_df.toPandas()
    ddf = con.execute(sql).df()
    out = {
        "rows_match": len(spdf) == len(ddf),
        "cols_match": sorted(spdf.columns) == sorted(ddf.columns),
        "spark_rows": len(spdf),
        "duck_rows": len(ddf),
        "spark_cols": list(spdf.columns),
        "duck_cols": list(ddf.columns),
    }
    ss, sv = _canon_sigs(spdf)
    ds, dv = _canon_sigs(ddf)
    out["violations"] = sorted(sv | {f"duck:{x}" for x in dv})
    out["hash_match"] = bool(
        out["rows_match"] and out["cols_match"] and ss == ds
    )
    if not out["hash_match"] and out["rows_match"] and out["cols_match"]:
        out["diff_sample"] = {
            "spark_only": [list(map(list, k)) for k in list((ss - ds).keys())[:3]],
            "duck_only": [list(map(list, k)) for k in list((ds - ss).keys())[:3]],
        }
    return out


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
