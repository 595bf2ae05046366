"""Engine-portable string hashing.

``xxhash64`` is Spark-only — an operator built on it can never be
oracle-differentialed against another engine. These helpers derive integer
hashes from ``md5`` (available in Spark, DuckDB, Postgres, Trino, …) so
MinHash / SimHash / fingerprint operators produce IDENTICAL values on any
engine: Spark evaluates ``conv(substr(md5(s),1,15),16,10)`` and DuckDB
evaluates ``CAST('0x'||substr(md5(s),1,15) AS BIGINT)`` — both are the
first 60 bits of the md5 digest, verified bit-equal cross-engine.

md5 costs more than xxhash64 (~3-4× per call) but both are JVM-side,
codegen-friendly, and linear in input bytes; for 100 TB dedup runs the
shuffle dominates, not the hash. Each ``*_sql`` twin returns the DuckDB
expression string so the Spark operator and its oracle share one
definition.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH31_MOD = 1 << 31


def hash60(col: Column) -> Column:
    """First 60 bits of md5 as a non-negative BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def hash31(col: Column) -> Column:
    """Portable 31-bit hash: small enough that ``a*h + b`` of two 31-bit
    values never overflows a signed 64-bit long (universal-hash input)."""
    return F.pmod(hash60(col), F.lit(HASH31_MOD))


def hash31_sql(expr: str) -> str:
    return f"({hash60_sql(expr)} % {HASH31_MOD})"


def hash32_words(col: Column) -> tuple[Column, Column]:
    """(hi, lo) 32-bit words of the md5 head — a portable 64-bit hash kept
    as two non-negative longs so bit extraction needs no unsigned type."""
    hi = F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(F.md5(col), 9, 8), 16, 10).cast("long")
    return hi, lo


def hash32_words_sql(expr: str) -> tuple[str, str]:
    hi = f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"
    lo = f"CAST(('0x' || substr(md5({expr}), 9, 8)) AS BIGINT)"
    return hi, lo
