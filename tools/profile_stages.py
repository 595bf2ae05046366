#!/usr/bin/env python
"""Stage-sliced wall-clock attribution for the heavy headline queries
(guide §1: measure first, via the noop sink so the sink cost never
pollutes the number). Each slice rebuilds its DataFrame per iteration —
same honest protocol as bench.py — and reports min-of-N.

Usage: python tools/profile_stages.py [--sf-dir DIR] [--iters N] [slice ...]
With no slice names, runs every registered slice.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SLICES: dict[str, callable] = {}


def profslice(name):
    def deco(fn):
        SLICES[name] = fn
        return fn

    return deco


# ---------------------------------------------------------------- simhash
@profslice("simhash.shingle_hash")
def _simhash_shingle(spark, sf_dir):
    from pyspark.sql import functions as F

    from delta_unity_duckdb_spark.functions.hashing import hash32_words
    from delta_unity_duckdb_spark.operators.dedup import shingle_rows
    from delta_unity_duckdb_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    sh = shingle_rows(d, "doc_id", "text", 2, distinct=True)
    hi, lo = hash32_words(F.col("s"))
    return sh.select("id", hi.alias("hi"), lo.alias("lo"))


@profslice("simhash.fingerprints")
def _simhash_fps(spark, sf_dir):
    from delta_unity_duckdb_spark.operators.dedup import simhash_fingerprints
    from delta_unity_duckdb_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    return simhash_fingerprints(d, "doc_id", "text")


@profslice("simhash.full")
def _simhash_full(spark, sf_dir):
    from delta_unity_duckdb_spark.workload import QUERIES

    return QUERIES["simhash_near_dups"](spark, sf_dir)


# ---------------------------------------------------------------- minhash
@profslice("minhash.shingle_hash31")
def _minhash_shingle(spark, sf_dir):
    from pyspark.sql import functions as F

    from delta_unity_duckdb_spark.functions.hashing import hash31
    from delta_unity_duckdb_spark.operators.dedup import shingle_rows
    from delta_unity_duckdb_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    sh = shingle_rows(d, "doc_id", "text", 3, distinct=True)
    return sh.select("id", hash31(F.col("s")).alias("h"))


@profslice("minhash.signatures")
def _minhash_sigs(spark, sf_dir):
    from delta_unity_duckdb_spark.operators.dedup import minhash_signatures_wide
    from delta_unity_duckdb_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    return minhash_signatures_wide(d, "doc_id", "text", 32, 3)


@profslice("minhash.band_buckets")
def _minhash_bands(spark, sf_dir):
    from delta_unity_duckdb_spark.operators.dedup import minhash_band_buckets
    from delta_unity_duckdb_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    return minhash_band_buckets(d, "doc_id", "text", 32, 8)


@profslice("minhash.full_pairs")
def _minhash_full(spark, sf_dir):
    from delta_unity_duckdb_spark.workload import QUERIES

    return QUERIES["minhash_near_dups"](spark, sf_dir)


# ------------------------------------------------------------ composites
@profslice("near_dup_clusters.full")
def _ndc_full(spark, sf_dir):
    from delta_unity_duckdb_spark.workload import QUERIES

    return QUERIES["near_dup_clusters"](spark, sf_dir)


@profslice("leakage_safe_split.full")
def _lss_full(spark, sf_dir):
    from delta_unity_duckdb_spark.workload import QUERIES

    return QUERIES["leakage_safe_split"](spark, sf_dir)


@profslice("llm_pipeline.ex_stage")
def _llm_ex(spark, sf_dir):
    # scan -> inject -> redact -> tokenize -> quality gate -> exact dedup
    from pyspark.sql import functions as F

    from delta_unity_duckdb_spark.operators import dedup as D
    from delta_unity_duckdb_spark.sources.tables import load_table
    from delta_unity_duckdb_spark.workload.curation import _P_EMAIL, _P_PHONE

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    recrawl = d.filter(F.col("doc_id") % 20 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    base = d.unionByName(recrawl)
    dirty = base.select(
        "doc_id",
        "lang",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    red = dirty.select(
        "doc_id",
        "lang",
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _P_EMAIL, "<EMAIL>"),
            _P_PHONE,
            "<PHONE>",
        ).alias("text"),
    )
    tw = (
        red.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = tw.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tok"), F.max("c").alias("max_tf")
    )
    qual = (
        red.join(stats, "doc_id")
        .filter(
            F.col("n_tok").between(20, 200)
            & (F.expr("(max_tf * 1000000) DIV n_tok") < 250000)
        )
        .select("doc_id", "lang", "text", "n_tok")
    )
    return D.dedup_exact(qual, ["text"], "doc_id")


@profslice("llm_pipeline.full")
def _llm_full(spark, sf_dir):
    from delta_unity_duckdb_spark.workload import QUERIES

    return QUERIES["llm_pipeline_end_to_end"](spark, sf_dir)


# ---------------------------------------------------------------- kcore
@profslice("graph_kcore.edge_build")
def _kcore_edges(spark, sf_dir):
    from pyspark.sql import functions as F

    from delta_unity_duckdb_spark.functions.hashing import hash60
    from delta_unity_duckdb_spark.sources.tables import load_table

    op = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    pair_key = F.concat(
        F.col("a.p").cast("string"), F.lit("-"), F.col("b.p").cast("string")
    )
    return (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(
            F.col("a.p").alias("src"),
            F.col("b.p").alias("dst"),
            hash60(pair_key).alias("_hk"),
        )
        .filter(F.pmod(F.col("_hk"), F.lit(10)) == 0)
        .select("src", "dst")
        .distinct()
    )


@profslice("graph_kcore.op_distinct")
def _kcore_distinct(spark, sf_dir):
    from pyspark.sql import functions as F

    from delta_unity_duckdb_spark.sources.tables import load_table

    return (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )


@profslice("graph_kcore.full")
def _kcore_full(spark, sf_dir):
    from delta_unity_duckdb_spark.workload import QUERIES

    return QUERIES["graph_kcore"](spark, sf_dir)


# ------------------------------------------------------------ hash kernels
@profslice("kernel.md5_only")
def _kernel_md5(spark, sf_dir):
    from pyspark.sql import functions as F

    from delta_unity_duckdb_spark.operators.dedup import shingle_rows
    from delta_unity_duckdb_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    sh = shingle_rows(d, "doc_id", "text", 3, distinct=True)
    return sh.select("id", F.md5(F.col("s")).alias("m"))


@profslice("kernel.shingles_only")
def _kernel_shingles(spark, sf_dir):
    from delta_unity_duckdb_spark.operators.dedup import shingle_rows
    from delta_unity_duckdb_spark.sources.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    return shingle_rows(d, "doc_id", "text", 3, distinct=True)


@profslice("kernel.scan_only")
def _kernel_scan(spark, sf_dir):
    from delta_unity_duckdb_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    total_bytes = sum(
        os.path.getsize(os.path.join(args.sf_dir, f))
        for f in os.listdir(args.sf_dir)
        if f.endswith(".parquet")
    )
    if total_bytes < 1 << 30:
        os.environ.setdefault("SPARK_GRAFT_AQE", "false")
        os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "16")

    from delta_unity_duckdb_spark.session import get_spark
    from delta_unity_duckdb_spark.workload import QUERIES

    spark = get_spark(app_name="profile-stages")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["count_star"](spark, args.sf_dir).collect()

    names = args.names or list(SLICES)
    out = {}
    for name in names:
        fn = SLICES[name]
        spark.sparkContext.setJobDescription(name)
        best = float("inf")
        for _ in range(args.iters + 1):  # first run = warmup/codegen
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        print(f"[prof] {name}: {out[name]}", file=sys.stderr, flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
