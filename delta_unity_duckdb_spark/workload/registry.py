"""Registry mapping operator names → (PySpark callable, DuckDB oracle SQL).

Every operator claimed in SURVEY.md §2 registers here; ``__spark_entry__``
re-exports the two dicts. Callables take ``(spark, sf_dir)`` and return a
DataFrame. Oracle SQL runs on DuckDB views named after the fixture tables.
Operators whose semantics aren't SQL-expressible register with
``oracle=None`` (driver records a rows-only check).
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as ST

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}
# Pairing-honesty tags (round-6 verdict item): queries whose DuckDB
# "oracle" does not perform equivalent work — e.g. the codec queries,
# where DuckDB has no WAV/PNG/JPEG decoder so the oracle REPLAYS the
# fixture's closed-form waveform/pixel math instead of decoding bytes.
# Correctness pairing stays valid (same values); PERF ratios do not —
# bench tools report matched totals with and without these.
ORACLE_KIND: dict[str, str] = {}


def normalize_output(df: DataFrame) -> DataFrame:
    """Enforce the driver-hashable output convention at the edge of every
    registered query: final columns are only BIGINT / DOUBLE / STRING /
    BOOL / DATE / TIMESTAMP.

    Rationale (round-1 finding): the driver compares Spark results to
    DuckDB oracles through pandas, where Spark's DECIMAL surfaces as
    ``decimal.Decimal`` objects but DuckDB's DECIMAL/HUGEINT surface as
    float64 — value-equal results hash differently — and array-typed cells
    crash pandas ``sort_values`` outright. Internal aggregation stays
    exact-DECIMAL (functions/numeric.py); only the output representation
    changes, to the correctly-rounded double both engines agree on
    bit-for-bit (both use round-half-even decimal→double conversion).
    Arrays/maps/structs leave as deterministic strings.
    """
    cols = []
    changed = False
    for f in df.schema.fields:
        c = F.col(f.name)
        t = f.dataType
        if isinstance(t, ST.DecimalType):
            cols.append(c.cast("double").alias(f.name))
            changed = True
        elif isinstance(t, ST.ArrayType) and isinstance(
            t.elementType, (ST.StringType, ST.IntegralType)
        ):
            cols.append(
                F.array_join(c.cast("array<string>"), ",").alias(f.name)
            )
            changed = True
        elif isinstance(t, (ST.ArrayType, ST.MapType, ST.StructType)):
            cols.append(F.to_json(c).alias(f.name))
            changed = True
        elif isinstance(t, (ST.ByteType, ST.ShortType, ST.IntegerType)):
            cols.append(c.cast("bigint").alias(f.name))
            changed = True
        elif isinstance(t, ST.FloatType):
            cols.append(c.cast("double").alias(f.name))
            changed = True
        elif isinstance(t, ST.BinaryType):
            cols.append(F.hex(c).alias(f.name))
            changed = True
        elif isinstance(t, ST.DateType):
            # DuckDB's pandas conversion maps DATE to datetime64 (midnight)
            # while Spark surfaces datetime.date objects — normalize to
            # TIMESTAMP so both engines hand the driver datetime64
            cols.append(c.cast("timestamp").alias(f.name))
            changed = True
        else:
            cols.append(c)
    return df.select(*cols) if changed else df


def query(
    name: str, oracle: str | None = None, oracle_kind: str | None = None
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            return normalize_output(fn(spark, sf_dir))

        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE[name] = oracle
        if oracle_kind is not None:
            ORACLE_KIND[name] = oracle_kind
        return fn

    return deco
