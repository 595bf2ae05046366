"""Light checks for the multi-process cluster-sim harness (the heavy
end-to-end run is tools/cluster_sim.py itself, executed out-of-band like
the scale benches — these pin its wiring so drift fails fast in CI)."""

from __future__ import annotations


def test_default_subset_registered_and_oracled():
    from delta_unity_duckdb_spark.workload import ORACLE, QUERIES
    from tools.cluster_sim import DEFAULT_SUBSET

    missing = [n for n in DEFAULT_SUBSET if n not in QUERIES]
    unoracled = [n for n in DEFAULT_SUBSET if n not in ORACLE]
    assert not missing and not unoracled, (missing, unoracled)
    # no streaming twins: their temp-dir file sinks are process-local
    assert not [n for n in DEFAULT_SUBSET if n.startswith("stream_")]


def test_master_env_reaches_session(monkeypatch):
    """SPARK_GRAFT_MASTER must be the session's master resolver default —
    asserted by calling get_spark's actual resolver, no cluster needed."""
    from delta_unity_duckdb_spark.session import resolve_master

    monkeypatch.setenv("SPARK_GRAFT_MASTER", "spark://127.0.0.1:1")
    assert resolve_master() == "spark://127.0.0.1:1"
    # Explicit argument beats the env override.
    assert resolve_master("local[2]") == "local[2]"
    # Without the env var, falls back to local[$SPARK_GRAFT_CPUS].
    monkeypatch.delenv("SPARK_GRAFT_MASTER")
    monkeypatch.setenv("SPARK_GRAFT_CPUS", "7")
    assert resolve_master() == "local[7]"


def test_max_result_cap_stays_under_driver_heap():
    """The maxResultSize default must track the resolved driver heap
    (min(8g, heap/2)) — a fixed 8g on a small host exceeds the heap and
    a big collect OOMs the JVM instead of raising the clean
    maxResultSize error."""
    from delta_unity_duckdb_spark.session import _default_max_result, _mem_bytes

    assert _mem_bytes("8g") == 8 * 1024**3
    assert _mem_bytes("512m") == 512 * 1024**2
    assert _mem_bytes("1048576") == 1048576
    # big host: 24g heap -> capped at 8g
    assert _default_max_result("24g") == f"{8 * 1024}m"
    # small host: 1g heap -> half of it, never above it
    assert _mem_bytes(_default_max_result("1g")) == 512 * 1024**2
    for heap in ("1g", "2g", "4g", "12g", "24g"):
        assert _mem_bytes(_default_max_result(heap)) <= _mem_bytes(heap) // 2
