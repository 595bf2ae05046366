#!/usr/bin/env python
"""Multi-process standalone-cluster simulator (scale hardening).

``local[N]`` shares one JVM between driver and executors, which hides
the failure modes a real 1000-executor deployment meets: closure and
Arrow-batch SERIALIZATION across process boundaries, per-executor python
workers with their own (empty) import environment, task result
transport, and multi-executor scheduling. This tool launches a REAL
Spark standalone cluster on this machine — one master + W worker
JVMs, each backing a separate executor process — and then drives the
UNCHANGED engine entry points against it via ``SPARK_GRAFT_MASTER``:

  * a strict driver-mirror correctness sweep (tests.oracle_harness
    strict_compare vs the DuckDB oracles) over a representative query
    subset spanning every kernel family — relational codegen, window,
    sketches, LSH dedup, Arrow mapInPandas codecs (WAV/PNG decode),
    k-means/PCA iterative artifacts, streaming twins excluded (their
    temp-dir sinks are process-local by design, noted in output);
  * a timed pass so the multi-process arm has a tracked wall-clock.

Everything the executors run ships BY VALUE (cloudpickle closures from
the kernel factories) — the workers get NO PYTHONPATH to the repo, so a
kernel that secretly depends on a module-level import fails loudly here.
That is the point of the exercise.

Usage:
  python tools/cluster_sim.py [--out FILE] [sf_dir] [workers]
                              [cores_per_worker] [name ...]
Defaults: /root/testdata/sf0.01, 3 workers, 4 cores each; a built-in
representative subset when no names are given. Pass the single name
``all`` to sweep EVERY oracle-paired query in the registry — including
the streaming twins: their micro-batch feeds are driver-written temp
dirs and their sinks are memory sinks, both of which are valid on a
standalone cluster whose driver and executors share one host
filesystem (the contract this harness documents and verifies — a
multi-HOST deployment would need the feed dirs on shared storage,
which is exactly how a real crawl feed would arrive). ``--out FILE``
additionally writes the summary JSON to FILE for per-round artifacts.

Prints one JSON line:
  {"metric": "cluster_sim", "workers": W, "ok": [...], "bad": [...],
   "wall_sec": {...}, ...}
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Every kernel family, one representative each. Streaming twins run with
# SPARK_GRAFT_STREAM_DIR pointed at the cluster's shared workdir — the
# same mechanism a multi-host deployment uses (NFS/object-store mount),
# so their feeds/checkpoints no longer assume the driver's private /tmp.
DEFAULT_SUBSET = [
    "stream_tumbling_window", # flagship streaming twin (windowed agg)
    "stream_scd2_sync",       # staged-feed streaming MERGE flagship
    "stream_late_data_drop",  # watermark drop semantics over staged feed

    "pricing_summary",        # fixed-point partial aggregation
    "multiway_join_topk",     # broadcast join + TakeOrdered
    "window_rank",            # window functions
    "topk_group_count",       # flagship relational shape
    "dedup_exact",            # keyed survivor dedup
    "minhash_near_dups",      # shingle -> minhash -> banded LSH join
    "similarity_topk",        # embedding cosine (HOF / Arrow kernel)
    "hll_distinct_groups",    # portable sketch merge
    "bm25_topk",              # integer BM25 + narrow checkpoint
    "kmeans_clusters",        # iterative fit artifact reuse
    "pca_top_component",      # distributed Gram + driver eigensolve
    "graph_kcore",            # iterated pruning (+ small-tier probe)
    "scd2_sync",              # MERGE flagship
    "media_ingest_decode",    # binaryFile ingest -> WAV/PNG codecs
    "token_budget_mixture",   # sharded prefix windows
]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _wait_port(port: int, timeout: float = 30.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=1):
                return
        except OSError:
            time.sleep(0.3)
    raise RuntimeError(f"port {port} never came up")


def launch_cluster(workers: int, cores: int, mem_gb: int, workdir: str):
    """Start master + worker JVMs straight from the pyspark wheel's jars
    (no sbin scripts needed). Returns (master_url, [Popen...])."""
    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars", "*")
    port = _free_port()
    url = f"spark://127.0.0.1:{port}"
    env = dict(os.environ)
    env["SPARK_LOCAL_IP"] = "127.0.0.1"
    # The worker JVM re-builds each executor's java command through
    # spark-launcher's AbstractCommandBuilder, which (a) resolves jars
    # relative to SPARK_HOME and (b) requires SPARK_SCALA_VERSION when
    # launched outside bin/spark-class (load-spark-env.sh normally sets
    # it; without it getScalaVersion() dies with "Cannot find any build
    # directories"). Point both at the wheel so the whole cluster runs
    # one artifact set.
    env["SPARK_HOME"] = os.path.dirname(pyspark.__file__)
    env.setdefault("SPARK_SCALA_VERSION", "2.13")
    # Executors' python workers: same interpreter, NO repo on the path —
    # by-value closure shipping is part of what this harness verifies.
    env["PYSPARK_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)
    procs = []

    def jvm(cls: str, *args: str, log: str):
        # The child dups the fd at spawn, so the parent's handle can (and
        # must) close immediately — leaving it open leaks one descriptor
        # per process for the life of the run.
        with open(os.path.join(workdir, log), "w") as fh:
            return subprocess.Popen(
                ["java", "-cp", jars, "-Xmx1g", cls, *args],
                env=env,
                stdout=fh,
                stderr=subprocess.STDOUT,
            )

    procs.append(
        jvm(
            "org.apache.spark.deploy.master.Master",
            "--host", "127.0.0.1", "--port", str(port),
            "--webui-port", "0",
            log="master.log",
        )
    )
    _wait_port(port)
    for i in range(workers):
        procs.append(
            jvm(
                "org.apache.spark.deploy.worker.Worker",
                url,
                "--cores", str(cores),
                "--memory", f"{mem_gb}g",
                "--webui-port", "0",
                "--work-dir", os.path.join(workdir, f"worker{i}"),
                log=f"worker{i}.log",
            )
        )
    return url, procs


def main() -> None:
    argv = list(sys.argv[1:])
    out_path = None
    # Accept --out anywhere in argv (not just first): a trailing
    # '... 3 4 --out f.json all' must not silently treat '--out' as a
    # query name and report it in bad[].
    while "--out" in argv:
        i = argv.index("--out")
        if i + 1 >= len(argv):
            raise SystemExit("--out requires a FILE argument")
        out_path = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    workers = int(argv[1]) if len(argv) > 1 else 3
    cores = int(argv[2]) if len(argv) > 2 else 4
    names = argv[3:] or list(DEFAULT_SUBSET)

    workdir = tempfile.mkdtemp(prefix="cluster_sim_")
    url, procs = launch_cluster(workers, cores, mem_gb=4, workdir=workdir)
    ok, bad, walls = [], [], {}
    try:
        os.environ["SPARK_GRAFT_MASTER"] = url
        os.environ.setdefault("SPARK_GRAFT_EXECUTOR_MEM", "3g")
        # Streaming feeds/checkpoints on the cluster-shared workdir (the
        # multi-host contract: every node must see this path; here that
        # is the standalone cluster's own work directory).
        os.environ["SPARK_GRAFT_STREAM_DIR"] = os.path.join(workdir, "stream")
        from pyspark.sql import SparkSession

        from delta_unity_duckdb_spark.workload import ORACLE, QUERIES
        from tests.oracle_harness import duck_connection, strict_compare

        if names == ["all"]:
            # Full-registry sweep, streaming twins included (single-host
            # shared filesystem — see module docstring for the contract).
            names = [n for n in QUERIES if n in ORACLE]

        spark = (
            SparkSession.builder.master(url)
            .appName("cluster-sim")
            .config("spark.driver.memory", "8g")
            .config("spark.sql.shuffle.partitions", str(workers * cores))
            .config(
                "spark.executor.memory",
                os.environ["SPARK_GRAFT_EXECUTOR_MEM"],
            )
            .config("spark.ui.enabled", "false")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.legacy.parquet.nanosAsLong", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .getOrCreate()
        )
        # Prove we are actually multi-process: >1 distinct executor pid.
        pids = (
            spark.sparkContext.parallelize(range(workers * cores * 4), workers * cores)
            .map(lambda _: __import__("os").getpid())
            .distinct()
            .collect()
        )
        con = duck_connection(sf_dir)
        for name in names:
            t0 = time.time()
            try:
                r = strict_compare(QUERIES[name](spark, sf_dir), con, ORACLE[name])
                good = r["hash_match"] and not r["violations"]
            except Exception as e:  # noqa: BLE001
                good, r = False, {"violations": [f"ERR:{type(e).__name__}:{e}"]}
            walls[name] = round(time.time() - t0, 2)
            (ok if good else bad).append(name)
            print(
                json.dumps({"name": name, "ok": good, "wall": walls[name]}),
                file=sys.stderr,
                flush=True,
            )
        spark.stop()
        summary = {
            "metric": "cluster_sim",
            "sf_dir": sf_dir,
            "master": url,
            "workers": workers,
            "cores_per_worker": cores,
            "n_executor_pids": len(set(pids)),
            "n_run": len(names),
            "n_ok": len(ok),
            "bad": bad,
            "wall_sec": walls,
            "note": (
                "strict driver-mirror compare vs DuckDB oracles on a "
                "real multi-process standalone cluster; executors have "
                "NO repo PYTHONPATH (by-value closures verified). "
                "Streaming twins run with feeds/checkpoints on the "
                "cluster-shared SPARK_GRAFT_STREAM_DIR (the multi-host "
                "mechanism: point it at NFS/object storage); memory "
                "sinks are driver-side by Spark's design."
            ),
        }
        print(json.dumps(summary))
        if out_path:
            with open(out_path, "w") as fh:
                json.dump(summary, fh, indent=1)
    finally:
        os.environ.pop("SPARK_GRAFT_MASTER", None)
        for p in procs[::-1]:
            p.terminate()
        for p in procs[::-1]:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()
    sys.exit(0 if not bad else 1)


if __name__ == "__main__":
    main()
