"""Property-based SCD2 testing (hypothesis): for ANY sequence of source
batches, the SCD2 invariants hold and the current snapshot equals the
last-write-wins fold of the batches."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from delta_unity_duckdb_spark.operators.scd2 import (
    scd2_apply,
    scd2_invariant_violations,
)

KEYS = ["k"]
TRACKED = ["v"]

# Small domains force key collisions and value repeats — the interesting cases.
row = st.tuples(st.integers(0, 4), st.one_of(st.none(), st.sampled_from(["a", "b", "c"])))
batch = st.lists(row, min_size=0, max_size=6)
batches = st.lists(batch, min_size=1, max_size=4)


def _spark():
    # session-scoped fixture isn't visible to @given; reuse the active session
    from pyspark.sql import SparkSession

    return SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(batches=batches)
def test_scd2_invariants_hold_for_any_batch_sequence(spark, batches):
    sp = spark
    state = None
    expected_current: dict[int, str | None] = {}
    for i, b in enumerate(batches):
        src = sp.createDataFrame(b, "k long, v string") if b else sp.createDataFrame([], "k long, v string")
        state = scd2_apply(
            state, src, KEYS, TRACKED, F.lit(f"2024-0{i + 1}-01 00:00:00").cast("timestamp")
        )
        # model: first row per key under the engine's dedup order
        # (ascending, NULLS FIRST — Spark orderBy default)
        seen = {}
        for k, v in sorted(b, key=lambda r: (r[0], r[1] is not None, r[1] or "")):
            seen.setdefault(k, v)
        expected_current.update(seen)
        state = state.localCheckpoint(eager=True)  # keep lineage flat

    viol = scd2_invariant_violations(state, KEYS)
    assert viol == {"duplicate_current_keys": 0, "end_date_mismatches": 0}

    got = {
        r["k"]: r["v"] for r in state.filter(F.col("is_current")).collect()
    }
    assert got == expected_current
