#!/usr/bin/env python
"""Adversarial-values fixture: the FOURTH stress regime (round 6:
verbatim duplication; round 7: zipf hot keys; round 8: high-cardinality
keys; this: the VALUES themselves — NULLs, empty strings, whitespace-
pathological text, and boundary numerics that the pristine driver
fixtures never contain).

Both engines read the SAME mutated parquet, so every strict mismatch is
a real cross-engine semantics divergence (the class hypothesis fuzzing
already caught once: Java regex \\s includes \\x0B, DuckDB RE2's does
not — operators/text.py WS). Mutations are md5-deterministic per id:

  documents: 8% text -> NULL, 4% text -> '', 4% text -> whitespace-
    pathological rewrite (leading/trailing/run spaces + tab/VT/FF
    injections), 2% lang -> NULL, 3% source -> NULL
  events: 4% value -> NULL, 2% event_type -> NULL, 2% props -> NULL,
    2% ts -> NULL (an event with no timestamp: time_bucket/F.window
    divergence class — Spark's window expression silently FILTERS
    NULL-ts rows while DuckDB's time_bucket(NULL) forms a NULL group)
  orders: 2% o_totalprice -> NULL
  embeddings: 2% embedding -> NULL (a row with no vector: every vector
    operator must consider only rows WITH a vector, mirrored)
  lineitem: 2% l_extendedprice -> NULL   (l_quantity stays non-NULL:
    fx bounds treat NULL as skip on both engines, but the +0.5d recipe
    domain contract is per-row non-null by TPC-H)

Everything else hardlinked. Usage:
  python tools/gen_adversarial_sf.py [src_dir] [dst_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def h(col: str, salt: str) -> str:
    return (
        f"(CAST(('0x' || substr(md5('{salt}:' || CAST({col} AS VARCHAR)), 1, 8))"
        " AS BIGINT) % 100)"
    )


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/root/repo/.scale_data/sf0.01_adversarial"
    )
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order = false")

    hd = h("doc_id", "adv")
    con.execute(f"""
        COPY (
          SELECT doc_id,
                 CASE
                   WHEN {hd} < 8 THEN NULL
                   WHEN {hd} < 12 THEN ''
                   WHEN {hd} < 16 THEN
                     '  ' || replace(replace(text, ' slow ', '   slow' || chr(9) || ' '),
                                    ' fast ', ' ' || chr(11) || 'fast' || chr(12) || ' ') || ' '
                   ELSE text
                 END AS text,
                 CASE WHEN {h("doc_id", "lg")} < 2 THEN NULL ELSE lang END AS lang,
                 CASE WHEN {h("doc_id", "sc")} < 3 THEN NULL ELSE source END AS source,
                 n_chars
          FROM read_parquet('{src}/documents.parquet')
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
    """)
    he = h("event_id", "ev")
    con.execute(f"""
        COPY (
          SELECT event_id,
                 CASE WHEN {h("event_id", "ts")} < 2 THEN NULL ELSE ts END AS ts,
                 user_id,
                 CASE WHEN {h("event_id", "et")} < 2 THEN NULL ELSE event_type END AS event_type,
                 CASE WHEN {he} < 4 THEN NULL ELSE value END AS value,
                 CASE WHEN {h("event_id", "pr")} < 2 THEN NULL ELSE props END AS props
          FROM read_parquet('{src}/events.parquet')
        ) TO '{dst}/events.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT o_orderkey, o_custkey, o_orderstatus,
                 CASE WHEN {h("o_orderkey", "tp")} < 2 THEN NULL ELSE o_totalprice END AS o_totalprice,
                 o_orderdate, o_orderpriority
          FROM read_parquet('{src}/orders.parquet')
        ) TO '{dst}/orders.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
                 CASE WHEN {h("l_orderkey * 10 + l_linenumber", "ep")} < 2
                      THEN NULL ELSE l_extendedprice END AS l_extendedprice,
                 l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
          FROM read_parquet('{src}/lineitem.parquet')
        ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
        COPY (
          SELECT vec_id,
                 CASE WHEN {h("vec_id", "em")} < 2 THEN NULL ELSE embedding
                 END AS embedding,
                 * EXCLUDE (vec_id, embedding)
          FROM read_parquet('{src}/embeddings.parquet')
        ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
    """)
    for t in ALL_TABLES:
        if t in ("documents", "events", "orders", "lineitem", "embeddings"):
            continue
        link = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(link):
            os.link(os.path.join(src, f"{t}.parquet"), link)
    stats = con.execute(f"""
        SELECT COUNT(*)-COUNT(text), SUM(CASE WHEN text='' THEN 1 ELSE 0 END),
               COUNT(*)-COUNT(lang), COUNT(*)-COUNT(source)
        FROM read_parquet('{dst}/documents.parquet')
    """).fetchone()
    print(f"documents null-text/empty-text/null-lang/null-source: {stats}",
          file=sys.stderr)
    print(dst)


if __name__ == "__main__":
    main()
