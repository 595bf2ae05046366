"""Z-order clustering: the layout must improve BOTH-column skipping vs a
single-column sort, measured with real per-file parquet min/max stats."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from delta_unity_duckdb_spark.operators.zorder import zorder_write
from delta_unity_duckdb_spark.sources.tables import load_table

N_FILES = 8


def _file_ranges(path, col):
    out = []
    for f in sorted(glob.glob(path + "/*.parquet")):
        vals = pq.read_table(f, columns=[col])[col].to_pylist()
        out.append((min(vals), max(vals)))
    return out


def _files_hit(ranges, point):
    return sum(1 for lo, hi in ranges if lo <= point <= hi)


def test_zorder_skips_on_both_dimensions(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")

    zorder_write(li, zpath, ["l_orderkey", "l_partkey"], n_files=N_FILES)
    # baseline: sorted by first column only
    (
        li.repartitionByRange(N_FILES, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(spath)
    )

    # probe several point lookups on EACH dimension; a file "hits" if its
    # min/max range cannot exclude the point
    probes_ok = {"l_orderkey": 0, "l_partkey": 0}
    for col in probes_ok:
        stats = li.agg(
            F.min(col).alias("lo"), F.max(col).alias("hi")
        ).collect()[0]
        points = [
            int(stats.lo + (stats.hi - stats.lo) * f) for f in (0.2, 0.5, 0.8)
        ]
        z_hits = sum(_files_hit(_file_ranges(zpath, col), p) for p in points)
        s_hits = sum(_files_hit(_file_ranges(spath, col), p) for p in points)
        if col == "l_orderkey":
            # single-column sort is optimal on its own column; z-order may
            # be worse there but must still skip SOMETHING (< all files)
            assert z_hits < 3 * N_FILES
        else:
            # on the second column z-order must beat the single-column sort
            assert z_hits < s_hits
        probes_ok[col] = (z_hits, s_hits)


def test_zorder_preserves_rows(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    zpath = str(tmp_path / "zr")
    zorder_write(li, zpath, ["l_orderkey", "l_partkey"], n_files=4)
    back = spark.read.parquet(zpath)
    assert back.count() == li.count()
    assert sorted(back.columns) == ["l_orderkey", "l_partkey"]
    # zkey/bounds helper columns must not leak
    assert not [c for c in back.columns if c.startswith("__")]


def test_zorder_key_is_deterministic_morton(spark):
    from delta_unity_duckdb_spark.operators.zorder import zorder_key

    df = spark.createDataFrame([(1, 2), (3, 1)], "a long, b long")
    got = df.select(
        zorder_key([F.col("a"), F.col("b")], bits=2).alias("z")
    ).collect()
    # a=1(01),b=2(10): interleave → b1 a1 b0 a0 = 1 0 0 1 = 9
    # a=3(11),b=1(01): b1 a1 b0 a0 = 0 1 1 1 = 7
    assert [r.z for r in got] == [9, 7]
