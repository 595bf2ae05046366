#!/usr/bin/env python
"""Blind re-bench: measure a SEEDED RANDOM sample of the oracle-paired
registry under the matched-pair protocol — the anti-cherry-picking gate.

Per-round perf artifacts naturally focus on the queries the builder just
worked on; a measurement protocol stays honest only if an arbitrary
slice of the registry holds up too. The sample here is deterministic
given the seed (md5-ranked query names), so a judge can re-derive the
exact same pick list from the seed and verify nothing was hand-chosen,
then re-run it and compare.

Usage:
  python tools/blind_rebench.py SEED [N] [bench_pair args...]

e.g.  python tools/blind_rebench.py r08 10 --sf-dir /root/testdata/sf0.1 --iters 3

Prints the pick list to stderr, then execs tools/bench_pair.py on it
(one JSON line on stdout, same schema as every pair artifact).
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pick(seed: str, n: int) -> list[str]:
    from delta_unity_duckdb_spark.workload import ORACLE

    return sorted(
        sorted(ORACLE),
        key=lambda q: hashlib.md5(f"{seed}:{q}".encode()).hexdigest(),
    )[:n]


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    seed = sys.argv[1]
    rest = sys.argv[2:]
    n = 10
    if rest and rest[0].isdigit():
        n = int(rest[0])
        rest = rest[1:]
    names = pick(seed, n)
    print(f"[blind_rebench] seed={seed} n={n}: {names}", file=sys.stderr)
    tool = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_pair.py")
    os.execv(sys.executable, [sys.executable, tool, *rest, *names])


if __name__ == "__main__":
    main()
