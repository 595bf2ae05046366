from delta_unity_duckdb_spark.functions.numeric import (
    dec,
    dsum,
    davg,
    sql_dsum,
    sql_davg,
)
from delta_unity_duckdb_spark.functions.predicates import nullsafe_changed

__all__ = ["dec", "dsum", "davg", "sql_dsum", "sql_davg", "nullsafe_changed"]
