"""Registry mapping operator names → (PySpark callable, DuckDB oracle SQL).

Every operator claimed in SURVEY.md §2 registers here; ``__spark_entry__``
re-exports the two dicts. Callables take ``(spark, sf_dir)`` and return a
DataFrame. Oracle SQL runs on DuckDB views named after the fixture tables.
Operators whose semantics aren't SQL-expressible register with
``oracle=None`` (driver records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
