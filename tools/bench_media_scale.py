#!/usr/bin/env python
"""Decode-throughput bench for the on-disk multimodal path at ANY asset
count, with a closed-form referee so the measurement is also a
correctness check (a codec or plumbing bug at scale value-mismatches
instead of silently "benchmarking" garbage).

Generates (idempotently) a deterministic WAV/PNG/JPEG directory of
``n_per_modality`` assets per modality via
``operators.multimodal.write_media_fixture_dir`` — the same closed-form
payloads the 360-asset oracle query uses, just more of them — then times
``workload.media.ingest_decode_rollup`` (binaryFile listing → typed
ingest → hash-respread → all three real decode arms → 3-row rollup) and
verifies every output cell against a numpy regeneration of the closed
forms.

Usage: python tools/bench_media_scale.py [dir] [n_per_modality] [iters]
Defaults: .scale_data/media_scale_1200, 1200, 3.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def referee(n: int) -> dict[str, tuple[int, int, int, int, int]]:
    """Closed-form per-modality (n_assets, units_total, value_sum,
    value_lo, value_hi) — numpy over the fixture formulas, no codecs."""
    import numpy as np

    wav_v, wav_units = [], 0
    for i in range(n):
        ns = 4000 + 250 * (i % 8)
        step = 13 + (i % 7)
        s = (np.arange(ns, dtype=np.int64) * step) % 2048 - 1024
        wav_v.append(int((s * s).sum()))
        wav_units += ns
    img_v, img_units = [], 0
    for i in range(n):
        w = 32 + 8 * (i % 5)
        h = 24 + 8 * (i % 3)
        px = (
            7 * np.arange(w, dtype=np.int64)[:, None, None]
            + 13 * np.arange(h, dtype=np.int64)[None, :, None]
            + 29 * np.arange(3, dtype=np.int64)[None, None, :]
            + 31 * i
        ) % 256
        img_v.append(int(px.sum()))
        img_units += w * h * 3
    jpg_v, jpg_units = [], 0
    for i in range(n):
        w = 8 * (2 + (i % 3))
        h = 8 * (1 + (i % 2))
        x = np.arange(w, dtype=np.int64)[None, :]
        y = np.arange(h, dtype=np.int64)[:, None]
        s4x = np.where(np.isin(x % 8, (0, 3, 4, 7)), 1, -1)
        s4y = np.where(np.isin(y % 8, (0, 3, 4, 7)), 1, -1)
        bx, by = x // 8, y // 8
        px = 128 + 2 * (
            ((bx + 2 * by + 3 * i) % 7 - 3)
            + ((bx + i) % 5 - 2) * s4x
            + ((by + 2 * i) % 5 - 2) * s4y
            + ((bx + by + i) % 3 - 1) * s4x * s4y
        )
        jpg_v.append(int(px.sum()))
        jpg_units += w * h
    return {
        "audio": (n, wav_units, sum(wav_v), min(wav_v), max(wav_v)),
        "image_jpeg": (n, jpg_units, sum(jpg_v), min(jpg_v), max(jpg_v)),
        "image_png": (n, img_units, sum(img_v), min(img_v), max(img_v)),
    }


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else ".scale_data/media_scale_1200"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1200
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from delta_unity_duckdb_spark.operators.multimodal import (
        write_media_fixture_dir,
    )
    from delta_unity_duckdb_spark.session import get_spark
    from delta_unity_duckdb_spark.workload.media import ingest_decode_rollup

    t0 = time.time()
    write_media_fixture_dir(path, n_wav=n, n_png=n, n_jpeg=n)
    gen_sec = round(time.time() - t0, 2)
    total_bytes = sum(
        os.path.getsize(os.path.join(path, f)) for f in os.listdir(path)
    )

    spark = get_spark(app_name="bench_media_scale")
    spark.sparkContext.setLogLevel("ERROR")

    def run():
        return {
            r["modality"]: (
                r["n_assets"], r["units_total"], r["value_sum"],
                r["value_lo"], r["value_hi"],
            )
            for r in ingest_decode_rollup(spark, path).collect()
        }

    t0 = time.time()
    got = run()
    cold = round(time.time() - t0, 3)
    times = []
    for _ in range(iters):
        t0 = time.time()
        got = run()
        times.append(round(time.time() - t0, 3))
    warm = min(times)

    exp = referee(n)
    match = got == exp
    print(
        json.dumps(
            {
                "metric": "media_decode_scale",
                "unit": "sec",
                "dir": path,
                "n_assets": 3 * n,
                "total_mb": round(total_bytes / 1e6, 1),
                "fixture_gen_sec": gen_sec,
                "spark_cold": cold,
                "spark_warm_runs": times,
                "spark_warm": warm,
                "assets_per_sec": round(3 * n / warm, 1),
                "decoded_mb_per_sec": round(total_bytes / 1e6 / warm, 1),
                "match": match,
                **(
                    {}
                    if match
                    else {"expected": str(exp), "got": str(got)}
                ),
            }
        )
    )
    spark.stop()
    sys.exit(0 if match else 1)


if __name__ == "__main__":
    main()
