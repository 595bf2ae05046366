"""Generate a larger synthetic SF by FK-consistent replication of an
existing fixture directory (scale hardening: the per-round driver tops
out at sf0.1 ≈ 17 MB, where Spark's ~0.2s/job scheduling floor dominates
sub-second queries; a 10× corpus starts to show the constants
amortizing, and pushes the orders→lineitem graph past
SMALL_GRAPH_EDGES so graph queries exercise their distributed arms).

Each copy i shifts every key column by i·offset (offset = next power of
10 above the key's max), so joins, seeds (vid < k only in copy 0), and
id-arithmetic (doc_id % 7, +500000 increment ids) stay well-defined.
region/nation are dimensions and copy once. Text/embedding payloads are
replicated verbatim — cross-copy exact duplicates are fine for a
matched Spark-vs-DuckDB comparison (both engines see identical files)
and stress the dedup operators' bucket caps the way a crawl with heavy
duplication would.

Usage: python tools/gen_scaled_sf.py [src_sf_dir] [dst_dir] [copies]
"""

from __future__ import annotations

import os
import sys

import duckdb

# key column -> which offset domain it draws from
DOMAINS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {
        "l_orderkey": "order",
        "l_partkey": "part",
        "l_suppkey": "supp",
    },
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
DOMAIN_SOURCE = {  # domain -> (table, key col) whose max sizes the offset
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}
COPY_ONCE = ["region", "nation"]


def next_pow10(n: int) -> int:
    p = 1
    while p <= n:
        p *= 10
    return p


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale_data/sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    # COPY materializes the ENTIRE result before writing when insertion
    # order must be preserved (78 GB RSS observed on the 600M-row sf100
    # lineitem before this); fixture row order is irrelevant — every
    # query is order-insensitive and both engines read the same files —
    # so stream instead, with a hard memory ceiling + disk spill.
    con.execute("SET preserve_insertion_order = false")
    con.execute("SET memory_limit = '32GB'")
    # A single-hop 1000-copy run builds a 1000-branch UNION ALL, which
    # trips DuckDB's default max_expression_depth of 1000.
    con.execute(f"SET max_expression_depth TO {max(1000, copies * 4)}")
    con.execute(f"SET temp_directory = '{dst}/.duckdb_tmp'")

    offsets = {}
    for dom, (tbl, col) in DOMAIN_SOURCE.items():
        mx = con.execute(
            f"SELECT MAX({col}) FROM read_parquet('{src}/{tbl}.parquet')"
        ).fetchone()[0]
        offsets[dom] = next_pow10(int(mx))

    for tbl in COPY_ONCE:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{tbl}.parquet')) "
            f"TO '{dst}/{tbl}.parquet' (FORMAT PARQUET)"
        )
    for tbl, keymap in DOMAINS.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{tbl}.parquet')"
            ).fetchall()
        ]
        selects = []
        for i in range(copies):
            exprs = [
                f"{c} + {i * offsets[keymap[c]]} AS {c}" if c in keymap else c
                for c in cols
            ]
            selects.append(
                f"SELECT {', '.join(exprs)} "
                f"FROM read_parquet('{src}/{tbl}.parquet')"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) "
            f"TO '{dst}/{tbl}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}/{tbl}.parquet')"
        ).fetchone()[0]
        print(f"{tbl}: {n} rows", file=sys.stderr)

    # Scaled on-disk media fixture (real WAV/PNG files for the binaryFile
    # ingest→decode path): asset count scales with copies, capped so the
    # driver-side one-time generation stays minutes-bounded — decode
    # throughput at the cap is already thousands of assets, and
    # tools/bench_media_scale.py regenerates/validates any count on
    # demand via its closed-form referee.
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from delta_unity_duckdb_spark.operators.multimodal import (
        write_media_fixture_dir,
    )

    n_media = min(120 * copies, 2400)
    write_media_fixture_dir(
        os.path.join(dst, "media"), n_wav=n_media, n_png=n_media,
        n_jpeg=n_media,
    )
    print(f"media: {3 * n_media} assets", file=sys.stderr)
    print(f"wrote {dst} ({copies}x {src})", file=sys.stderr)


if __name__ == "__main__":
    main()
