"""SCD2 workload query: two-batch sync on the customer dimension
(FIXTURES.md §2), with a FULL value-level DuckDB oracle.

Batch 1 = customer snapshot at t1. Batch 2 = same snapshot with
``c_mktsegment`` mutated to 'ALTERED' for every 10th key. The reference
semantics (delta_to_postgres_scd.py:242-261) yield exactly:

- unchanged keys: one current row effective t1;
- mutated keys: a closed t1 row (end_date=t2) + a current t2 row.

That final state is closed-form SQL, so the flagship operator gets a real
hash-checked oracle rather than a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from delta_unity_duckdb_spark.operators.scd2 import scd2_apply
from delta_unity_duckdb_spark.sources.tables import load_table
from delta_unity_duckdb_spark.workload.registry import query
from delta_unity_duckdb_spark.functions.frames import CKPT_DESER

T1 = "2024-06-01 00:00:00"
T2 = "2024-06-02 00:00:00"

# Closed-form final state of the two-batch sync — shared by the batch
# flagship (scd2_sync) and its streaming twin (stream_scd2_sync), which
# MUST converge to the identical table.
SCD2_FINAL_STATE_SQL = f"""
    WITH state AS (
      SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
             TIMESTAMP '{T1}' AS effective_date,
             CASE WHEN c_custkey % 10 = 0 THEN TIMESTAMP '{T2}' END AS end_date,
             (c_custkey % 10 <> 0) AS is_current
      FROM customer
      UNION ALL
      SELECT c_custkey, c_name, 'ALTERED', c_acctbal,
             TIMESTAMP '{T2}', NULL, TRUE
      FROM customer WHERE c_custkey % 10 = 0
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY c_custkey, effective_date) AS BIGINT) AS scd_id,
           c_custkey, c_name, c_mktsegment, c_acctbal,
           effective_date, end_date, is_current
    FROM state
    """


@query("scd2_sync", oracle=SCD2_FINAL_STATE_SQL)
def scd2_sync(spark, sf_dir):
    """Flagship SCD2 merge (A21): apply two batches, emit the final state
    with the deterministic surrogate key."""
    cust = load_table(spark, sf_dir, "customer")
    keys = ["c_custkey"]
    tracked = ["c_name", "c_mktsegment", "c_acctbal"]

    state1 = scd2_apply(None, cust, keys, tracked, F.lit(T1).cast("timestamp"))
    batch2 = cust.withColumn(
        "c_mktsegment",
        F.when(F.col("c_custkey") % 10 == 0, F.lit("ALTERED")).otherwise(
            F.col("c_mktsegment")
        ),
    )
    state2 = scd2_apply(state1, batch2, keys, tracked, F.lit(T2).cast("timestamp"))

    # Sharded surrogate-key assignment: a plain Window.orderBy row_number
    # funnels the ENTIRE final state through one task (the sort-to-a-
    # single-partition shape that dies first at 100 TB). Instead shard by
    # a monotone bucket of the leading sort key (cheap MAX over the raw
    # dimension bounds it), rank within each shard, and add the exact
    # count of rows in all lower shards — associativity of the prefix sum
    # makes the result bit-identical to the global row_number while no
    # task ever holds more than ~1/64 of the table.
    n_shards = 64
    maxk = cust.agg(F.max("c_custkey")).collect()[0][0]
    sharded = state2.withColumn(
        "_shard",
        F.least(
            F.lit(n_shards - 1),
            (F.col("c_custkey") * n_shards / F.lit(int(maxk) + 1)).cast("int"),
        ),
    ).localCheckpoint(eager=False, storageLevel=CKPT_DESER)  # both consumers share one materialization
    cum_before = (
        sharded.groupBy("_shard")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(
            "_shard",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_shard").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("_cum"),
        )
    )
    w = Window.partitionBy("_shard").orderBy("c_custkey", "effective_date")
    return sharded.join(F.broadcast(cum_before), "_shard").select(
        (F.col("_cum") + F.row_number().over(w)).cast("long").alias("scd_id"),
        "c_custkey",
        "c_name",
        "c_mktsegment",
        "c_acctbal",
        "effective_date",
        "end_date",
        "is_current",
    )


@query(
    "snapshot_diff_orders",
    oracle="""
    WITH old AS (
      SELECT o_orderkey AS k, o_orderpriority AS prio, o_totalprice AS price
      FROM orders WHERE o_orderkey % 3 <> 0),
    new AS (
      SELECT o_orderkey AS k, o_orderpriority AS prio,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0 ELSE o_totalprice END AS price
      FROM orders WHERE o_orderkey % 5 <> 0)
    SELECT k,
           CASE WHEN o.k IS NULL THEN n.prio  WHEN n.k IS NULL THEN o.prio  ELSE n.prio  END AS prio,
           CASE WHEN o.k IS NULL THEN n.price WHEN n.k IS NULL THEN o.price ELSE n.price END AS price,
           CASE WHEN o.k IS NULL THEN 'insert'
                WHEN n.k IS NULL THEN 'delete'
                WHEN n.price IS DISTINCT FROM o.price OR n.prio IS DISTINCT FROM o.prio THEN 'update'
           END AS change_type
    FROM new n FULL OUTER JOIN old o USING (k)
    WHERE (o.k IS NULL) OR (n.k IS NULL)
       OR n.price IS DISTINCT FROM o.price OR n.prio IS DISTINCT FROM o.prio
    """,
)
def snapshot_diff_orders(spark, sf_dir):
    """CDC snapshot diff (operators/cdc.py) over two deterministic order
    snapshots — rows only in old (deletes), only in new (inserts), and
    price-bumped rows (updates) — hash-checked against DuckDB's
    IS DISTINCT FROM full-outer formulation. One co-partitioned shuffle."""
    from delta_unity_duckdb_spark.operators.cdc import snapshot_diff
    from delta_unity_duckdb_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").alias("price"),
    )
    old = o.filter(F.col("k") % 3 != 0)
    new = o.filter(F.col("k") % 5 != 0).withColumn(
        "price",
        F.when(F.col("k") % 7 == 0, F.col("price") + 1.0).otherwise(F.col("price")),
    )
    return snapshot_diff(old, new, ["k"])
