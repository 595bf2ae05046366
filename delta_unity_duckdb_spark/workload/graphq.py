"""Graph workload queries (SURVEY.md §2-D) — counts + 1-hop traversal with
full DuckDB oracles over the same derived orders→lineitem hierarchy."""

from __future__ import annotations

from delta_unity_duckdb_spark.operators.graph import build_graph, graph_counts, one_hop
from delta_unity_duckdb_spark.workload.registry import query


@query(
    "graph_counts",
    oracle="""
    SELECT (SELECT COUNT(*) FROM orders) + (SELECT COUNT(*) FROM lineitem) AS n_vertices,
           (SELECT COUNT(*) FROM lineitem) AS n_edges
    """,
)
def graph_counts_q(spark, sf_dir):
    """Node/edge counts (load_memgraph.py:82-89 verification queries)."""
    v, e = build_graph(spark, sf_dir)
    return graph_counts(v, e)


@query(
    "graph_one_hop",
    oracle="""
    SELECT 'O' || CAST(o_orderkey AS VARCHAR) AS parent_id,
           o_orderpriority AS parent_title,
           'L' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)
               || '-' || CAST(l_partkey AS VARCHAR) || '-' || CAST(l_suppkey AS VARCHAR) AS child_id,
           l_returnflag AS child_title
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ORDER BY child_id LIMIT 10
    """,
)
def graph_one_hop_q(spark, sf_dir):
    """1-hop parent→child traversal (load_memgraph.py:92-95) as two hash joins."""
    v, e = build_graph(spark, sf_dir)
    return one_hop(v, e, limit=10)
