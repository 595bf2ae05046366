"""Cypher corpus parser tests (reference load_memgraph.py semantics)."""

from __future__ import annotations

from delta_unity_duckdb_spark.operators.cypher import (
    corpus_to_graph,
    parse_statements,
    synthetic_corpus,
)
from delta_unity_duckdb_spark.operators.graph import graph_counts, one_hop


BLOCK = (
    "MERGE (parent:Mission {id:'523490'}) SET parent.mission_number = '00001', "
    "parent.title = 'Arturo Abreu to SEOC for Logs Support', parent.comments = []\n"
    "MERGE (child:Mission {id:'523491'}) SET child.mission_number = '00002', "
    "child.title = 'Hotel for Art Abreu', child.comments = ['Opened under Helene', "
    "'Assigned to Logs']\n"
    "MERGE (parent:Mission {id:'523490'}) MERGE (child:Mission {id:'523491'}) "
    "MERGE (parent)-[:IS_PARENT_TO]->(child)"
)


def test_parse_statements_nodes_and_edge():
    stmts = parse_statements(BLOCK)
    kinds = [s["kind"] for s in stmts]
    assert kinds == ["v", "v", "e"]
    parent, child, edge = stmts
    assert parent["id"] == "523490" and parent["comments"] == []
    assert child["mission_number"] == "00002"
    assert child["comments"] == ["Opened under Helene", "Assigned to Logs"]
    assert (edge["src"], edge["dst"]) == ("523490", "523491")


def test_parse_handles_apostrophes_in_values():
    block = (
        "MERGE (parent:Mission {id:'1'}) SET parent.mission_number = '9', "
        "parent.title = 'Gov''s generator, FHP''s bus', parent.comments = "
        "['don''t demobilize', 'POC''s call']"
    )
    (v,) = parse_statements(block)
    assert "Gov''s generator" in v["title"]
    assert len(v["comments"]) == 2


def test_corpus_to_graph_counts_and_upsert(spark):
    corpus = synthetic_corpus(spark, n_chains=10, chain_len=4)
    vertices, edges = corpus_to_graph(corpus)
    # chain of 4 → 4 unique nodes, 3 edges per chain; middle nodes appear
    # as both parent and child (MERGE upsert dedup)
    assert vertices.count() == 10 * 4
    assert edges.count() == 10 * 3
    assert vertices.select("id").distinct().count() == 40
    counts = graph_counts(vertices, edges).collect()[0]
    assert (counts["n_vertices"], counts["n_edges"]) == (40, 30)


def test_one_hop_over_parsed_graph(spark):
    corpus = synthetic_corpus(spark, n_chains=5, chain_len=3)
    vertices, edges = corpus_to_graph(corpus)
    v = vertices.withColumnRenamed("title", "title_full").selectExpr(
        "id", "title_full as title"
    )
    hops = one_hop(v, edges, limit=5).collect()
    assert len(hops) == 5
    assert all(r["parent_id"] and r["child_id"] for r in hops)


def test_last_set_wins(spark):
    rows = [
        {
            "block_id": 0,
            "cypher": "MERGE (parent:Mission {id:'7'}) SET parent.mission_number = '1', "
            "parent.title = 'first', parent.comments = []",
        },
        {
            "block_id": 1,
            "cypher": "MERGE (parent:Mission {id:'7'}) SET parent.mission_number = '2', "
            "parent.title = 'second', parent.comments = []",
        },
    ]
    corpus = spark.createDataFrame(rows, "block_id long, cypher string")
    vertices, _ = corpus_to_graph(corpus)
    out = vertices.collect()
    assert len(out) == 1
    assert out[0]["title"] == "second"
