#!/usr/bin/env python
"""High-cardinality-key adversarial fixture: the THIRD at-scale stress
regime (round 6: verbatim duplication; round 7: zipf hot keys; this:
the opposite tail — keys so numerous the aggregate state itself is the
scale problem). Takes an existing fixture dir and writes a variant
where:

  * events.user_id becomes ~UNIQUE per row: a 59-bit md5-derived value
    of the event id, so a 100M-row events table carries ~10^8 distinct
    grouping keys scattered over the full int64 range (no dense-id
    locality for a hash table to exploit). Every per-user aggregate,
    window, sketch, and join now materializes state per ROW: map-side
    partial aggregation stops helping (nothing combines), shuffle
    volume equals input volume, and hash tables spill or thrash.
  * documents.source becomes high-cardinality: 'src' || (h % 2,000,000)
    — ~2M distinct sources over the 5M-doc corpus (mean group size
    ~2.5), stressing the per-source mixture/budget/manifest family
    whose plans were tuned for tens of sources (broadcasting a
    per-source rollup stops being free at 2M rows).

Deterministic (md5 of ids — identical bytes every run); all other
tables HARDLINKED from the source dir, so the full registry and
strict_check run against the highcard dir unchanged, and perf is
measured by pointing bench_pair / bench_cluster_scale at it.

Usage: python tools/gen_highcard_sf.py [src_dir] [dst_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale_data/sf100"
    dst = (
        sys.argv[2]
        if len(sys.argv) > 2
        else "/root/repo/.scale_data/sf100_highcard"
    )
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order = false")
    con.execute("SET memory_limit = '24GB'")
    con.execute(f"SET temp_directory = '{dst}/.duckdb_tmp'")

    # 59-bit md5-derived key (same portable-hash family as
    # functions/hashing.py): ~zero birthday collisions at 1e8 draws from
    # 2^59, so user_id is effectively one-key-per-event.
    h_evt = (
        "(CAST(('0x' || substr(md5('hc:' || CAST(event_id AS VARCHAR)), 1, 15))"
        " AS BIGINT) % 576460752303423488)"
    )
    con.execute(f"""
        COPY (
          SELECT event_id, ts, {h_evt} AS user_id,
                 event_type, value, props
          FROM read_parquet('{src}/events.parquet')
        ) TO '{dst}/events.parquet' (FORMAT PARQUET)
    """)
    h_doc = (
        "(CAST(('0x' || substr(md5('hc:' || CAST(doc_id AS VARCHAR)), 1, 8))"
        " AS BIGINT))"
    )
    con.execute(f"""
        COPY (
          SELECT doc_id, text, lang,
                 'src' || CAST({h_doc} % 2000000 AS VARCHAR) AS source,
                 n_chars
          FROM read_parquet('{src}/documents.parquet')
        ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
    """)
    for t in ALL_TABLES:
        if t in ("events", "documents"):
            continue
        link = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(link):
            os.link(os.path.join(src, f"{t}.parquet"), link)

    card = con.execute(f"""
        SELECT COUNT(*) AS rows,
               COUNT(DISTINCT user_id) AS distinct_users
        FROM read_parquet('{dst}/events.parquet')
    """).fetchall()
    srcs = con.execute(f"""
        SELECT COUNT(*) AS docs, COUNT(DISTINCT source) AS distinct_sources
        FROM read_parquet('{dst}/documents.parquet')
    """).fetchall()
    print(f"events rows/distinct users: {card}", file=sys.stderr)
    print(f"docs rows/distinct sources: {srcs}", file=sys.stderr)
    print(dst)


if __name__ == "__main__":
    main()
