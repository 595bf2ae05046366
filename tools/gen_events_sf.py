#!/usr/bin/env python
"""Events-only scale ladder: replicate ONE fixture's events table N× and
hardlink every other table — the cheap way to extend the events-family
amortization ladder past what full-fixture replication can fit on disk.

Why this exists (round 8): the window/rollup family's same-window ratios
at sf100 sit at 1.5-2.5× against DuckDB oracles that take 0.5-1.0 s —
a regime where Spark's ~1 s per-query constant (plan build + stage
scheduling + generated-class JIT) is the majority of its wall clock.
The honest way to show that constant AMORTIZES is to measure the same
queries where the oracle does 3-5 s of real work: events at sf500 is
~13 GB (fits) where a full sf500 fixture (3 B lineitem rows) does not.
Only events-family queries are meaningful against the result — every
other table is the SOURCE fixture's copy at its original scale.

Each copy i shifts event_id and user_id by i·offset (offset = next
power of 10 above the source max), exactly like gen_scaled_sf.py, and
shifts ts by i seconds so replicated rows are near-identical in time
distribution (window bucket counts scale; session/funnel structure per
user is preserved since user_ids are disjoint across copies).

Usage: python tools/gen_events_sf.py src_dir dst_dir copies
"""

from __future__ import annotations

import os
import sys

import duckdb

ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def next_pow10(n: int) -> int:
    p = 1
    while p <= n:
        p *= 10
    return p


def main() -> None:
    src, dst, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order = false")
    con.execute("SET memory_limit = '24GB'")
    con.execute(f"SET temp_directory = '{dst}/.duckdb_tmp'")
    mx = con.execute(
        f"SELECT MAX(event_id), MAX(user_id) FROM "
        f"read_parquet('{src}/events.parquet')"
    ).fetchone()
    e_off, u_off = next_pow10(int(mx[0])), next_pow10(int(mx[1]))
    selects = " UNION ALL ".join(
        f"SELECT event_id + {i * e_off} AS event_id, "
        f"ts + INTERVAL {i} SECOND AS ts, "
        f"user_id + {i * u_off} AS user_id, event_type, value, props "
        f"FROM read_parquet('{src}/events.parquet')"
        for i in range(copies)
    )
    con.execute(f"COPY ({selects}) TO '{dst}/events.parquet' (FORMAT PARQUET)")
    for t in ALL_TABLES:
        if t == "events":
            continue
        link = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(link):
            os.link(os.path.join(src, f"{t}.parquet"), link)
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{dst}/events.parquet')"
    ).fetchone()[0]
    print(f"events rows: {n}", file=sys.stderr)
    print(dst)


if __name__ == "__main__":
    main()
