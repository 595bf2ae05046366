#!/usr/bin/env python
"""Documents-only scale ladder: replicate ONE fixture's documents table
N× and hardlink every other table — the gen_events_sf.py move for the
text/tokenize family (sequence_packing, token_budget_mixture,
source_mixture_weights, lang_profile…), whose sf100 same-window ratios
sit against 1-4 s oracles where Spark's per-query constant is a large
fraction of its wall clock.

Each copy i shifts doc_id by i·offset (offset = next power of 10 above
the source max) and leaves text/lang/source/n_chars verbatim —
replicated text is exactly the heavy-duplication crawl shape the dedup
family already measures at sf100, and for the tokenize-family queries
only the totals scale. Only documents-family queries are meaningful
against the result.

Usage: python tools/gen_docs_sf.py src_dir dst_dir copies
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
        f"SELECT MAX(doc_id) FROM read_parquet('{src}/documents.parquet')"
    ).fetchone()[0]
    off = next_pow10(int(mx))
    selects = " UNION ALL ".join(
        f"SELECT doc_id + {i * off} AS doc_id, text, lang, source, n_chars "
        f"FROM read_parquet('{src}/documents.parquet')"
        for i in range(copies)
    )
    con.execute(
        f"COPY ({selects}) TO '{dst}/documents.parquet' (FORMAT PARQUET)"
    )
    for t in ALL_TABLES:
        if t == "documents":
            continue
        link = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(link):
            os.link(os.path.join(src, f"{t}.parquet"), link)
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{dst}/documents.parquet')"
    ).fetchone()[0]
    print(f"documents rows: {n}", file=sys.stderr)
    print(dst)


if __name__ == "__main__":
    main()
