#!/usr/bin/env python
"""Skewed-key adversarial fixture: the SECOND at-scale stress regime
(round 6 was verbatim duplication; this is hot keys). Takes an existing
fixture dir and writes a variant where:

  * events.user_id is zipf-shaped at ROW level: ~25% of all events land
    on user 0, another ~25% spread over users 1..9, the rest keep their
    original id — deterministic (md5 of event_id), so re-runs produce
    identical data. Exercises every per-user grouping/window/join path:
    one grouping key now owns a quarter of a 100M-row table.
  * documents.source is 90% one source ('src0'), the remainder keeping
    their original label — exercises the per-source mixture/budget/
    profile family where one group dominates.

All other tables are HARDLINKED from the source dir (same bytes, no
disk cost), so the full registry — and strict_check, whose oracles run
the same SQL on the same files — works against the skewed dir
unchanged: correctness under skew is checked by the ordinary gate, and
perf is measured by pointing bench_pair / bench_cluster_scale at it.

Usage: python tools/gen_skewed_sf.py [src_dir] [dst_dir]
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
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale_data/sf100_skew"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order = false")
    con.execute("SET memory_limit = '24GB'")
    con.execute(f"SET temp_directory = '{dst}/.duckdb_tmp'")

    # md5-derived row hash — engine-portable determinism, same family as
    # functions/hashing.py (no rand(): identical bytes on every run).
    h_evt = "(CAST(('0x' || substr(md5('sk:' || CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT))"
    con.execute(f"""
        COPY (
          SELECT event_id, ts,
                 CASE WHEN {h_evt} % 1000 < 250 THEN 0
                      WHEN {h_evt} % 1000 < 500 THEN 1 + {h_evt} % 9
                      ELSE user_id END AS user_id,
                 event_type, value, props
          FROM read_parquet('{src}/events.parquet')
        ) TO '{dst}/events.parquet' (FORMAT PARQUET)
    """)
    h_doc = "(CAST(('0x' || substr(md5('sk:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT))"
    con.execute(f"""
        COPY (
          SELECT doc_id, text, lang,
                 CASE WHEN {h_doc} % 10 < 9 THEN 'src0' ELSE source END
                   AS source,
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

    top = con.execute(f"""
        SELECT user_id, COUNT(*) AS n,
               ROUND(COUNT(*) / (SELECT CAST(COUNT(*) AS DOUBLE)
                                 FROM read_parquet('{dst}/events.parquet')), 4)
                 AS share
        FROM read_parquet('{dst}/events.parquet')
        GROUP BY user_id ORDER BY n DESC LIMIT 3
    """).fetchall()
    srcs = con.execute(f"""
        SELECT source, COUNT(*) FROM read_parquet('{dst}/documents.parquet')
        GROUP BY source ORDER BY 2 DESC LIMIT 2
    """).fetchall()
    print(f"top event keys: {top}", file=sys.stderr)
    print(f"top doc sources: {srcs}", file=sys.stderr)
    print(dst)


if __name__ == "__main__":
    main()
