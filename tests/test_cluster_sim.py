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
    # round 8: the flagship streaming twins ARE in the subset — their
    # feeds/checkpoints relocate to SPARK_GRAFT_STREAM_DIR (the shared-
    # storage contract), which cluster_sim points at its workdir
    streams = [n for n in DEFAULT_SUBSET if n.startswith("stream_")]
    assert set(streams) == {
        "stream_tumbling_window",
        "stream_scd2_sync",
        "stream_late_data_drop",
    }


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


def test_stream_scratch_dir_env_relocation(monkeypatch, tmp_path):
    """SPARK_GRAFT_STREAM_DIR relocates every streaming feed/stage/
    checkpoint allocation (the multi-host shared-storage contract);
    unset, allocation falls back to the process temp dir."""
    from delta_unity_duckdb_spark.streaming.events import stream_scratch_dir

    shared = tmp_path / "shared_stream"
    monkeypatch.setenv("SPARK_GRAFT_STREAM_DIR", str(shared))
    d = stream_scratch_dir("feed_test_")
    assert d.startswith(str(shared))
    import os

    assert os.path.isdir(d)
    monkeypatch.delenv("SPARK_GRAFT_STREAM_DIR")
    import tempfile

    d2 = stream_scratch_dir("feed_test_")
    assert d2.startswith(tempfile.gettempdir())
