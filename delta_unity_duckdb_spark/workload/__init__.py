"""Workload registry — importing the submodules populates QUERIES/ORACLE."""

from delta_unity_duckdb_spark.workload import (  # noqa: F401
    events,
    graphq,
    llm,
    media,
    relational,
    scd,
    streamq,
    tpch_shapes,
)
from delta_unity_duckdb_spark.workload.registry import ORACLE, QUERIES

__all__ = ["QUERIES", "ORACLE"]
