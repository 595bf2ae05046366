"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (reference README.md:133 top-k
group count) on sf0.001. ``queries()``/``oracle_sql()`` expose the full
operator inventory from SURVEY.md §2 via the workload registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

from delta_unity_duckdb_spark.workload import ORACLE, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["topk_group_count"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each hash-checkable query."""
    return dict(ORACLE)
