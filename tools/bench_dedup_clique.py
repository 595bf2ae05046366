#!/usr/bin/env python
"""Near-dup dedup under EXTREME duplication (the sf100 fixture: every
document exists as 1000 verbatim copies).

What this demonstrates — and why a plain bench_pair run cannot: the
candidate-PAIR output of any near-duplicate detector is inherently
Θ(clique²) per duplicate clique, so at 1000 copies/doc the registered
`minhash_near_dups` query's ANSWER is ~2.5e9 rows (5k originals ×
1000·999/2 pairs). Both engines face that output; it is a property of
the fixture + the pair-emission CONTRACT, not of either plan (the sf100
run that exhausted 55 GB of spill disk was Spark faithfully producing
the quadratic answer). Production crawl dedup bounds this in one of two
ways, both implemented here and both measured by this tool:

  arm A  cap < clique: `max_bucket_size` below the duplication factor
         drops the degenerate buckets LOUDLY (census counts reported),
         and everything that remains — tokenize, shingle, signature,
         banding, census — is linear. This is the knob the operator has
         carried since round 2, doing exactly its job.
  arm B  exact-first pipeline order: hash-exact dedup (keyed
         window, linear, no pair join) collapses the 1000-cliques to
         one survivor each; near-dup with the ORIGINAL cap then runs on
         the ~5k survivors and recovers the true near-dup pairs of the
         base corpus. Linear end-to-end, answer preserved.

Usage: python tools/bench_dedup_clique.py [sf_dir] [cap_a]
Defaults: .scale_data/sf100, 512. Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale_data/sf100"
    cap_a = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    from pyspark.sql import functions as F

    from delta_unity_duckdb_spark.operators import dedup as D
    from delta_unity_duckdb_spark.session import get_spark

    spark = get_spark(app_name="bench-dedup-clique")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()

    # --- arm A: cap below the duplication factor --------------------
    t0 = time.perf_counter()
    pairs_a = D.minhash_near_dups(
        docs, "doc_id", "text", num_perm=32, bands=8, max_bucket_size=cap_a
    ).count()
    wall_a = round(time.perf_counter() - t0, 2)
    # census of what the cap dropped (same banding, reported not silent)
    banded = D.minhash_band_buckets(
        docs, "doc_id", "text", num_perm=32, bands=8
    )
    sizes = banded.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("sz")
    )
    dropped = sizes.filter(F.col("sz") > cap_a).agg(
        F.count(F.lit(1)).alias("buckets"),
        F.sum("sz").alias("memberships"),
        F.max("sz").alias("largest"),
    ).collect()[0]

    # --- arm B: exact-first pipeline order --------------------------
    t0 = time.perf_counter()
    survivors = D.dedup_exact(docs, ["text"], "doc_id")
    pairs_b = D.minhash_near_dups(
        survivors, "doc_id", "text", num_perm=32, bands=8,
        max_bucket_size=1000,
    ).count()
    n_survivors = survivors.count()
    wall_b = round(time.perf_counter() - t0, 2)

    print(
        json.dumps(
            {
                "metric": "dedup_clique_sf100",
                "unit": "sec",
                "sf_dir": sf_dir,
                "n_docs": n_docs,
                "arm_a": {
                    "cap": cap_a,
                    "wall": wall_a,
                    "pairs": pairs_a,
                    "dropped_buckets": dropped["buckets"],
                    "dropped_memberships": int(dropped["memberships"] or 0),
                    "largest_bucket": dropped["largest"],
                },
                "arm_b": {
                    "order": "exact_dedup -> minhash(cap=1000)",
                    "wall": wall_b,
                    "survivors": n_survivors,
                    "pairs": pairs_b,
                },
                "note": (
                    "pair output is inherently quadratic per duplicate "
                    "clique; the registered query's 2.5e9-row answer at "
                    "1000x verbatim duplication is the fixture's doing. "
                    "Arm A bounds it with the operator's census cap; arm "
                    "B restores the production pipeline order."
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
