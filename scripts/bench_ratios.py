#!/usr/bin/env python
"""Per-query scale ratios between two bench records.

Usage: python scripts/bench_ratios.py BASE.json SCALED.json [decades]

Reads the two one-line bench JSONs (bench.py format), joins per-query
timings, and prints a table sorted by per-decade ratio:
    query  base_s  scaled_s  ratio  per_decade
``per_decade = ratio ** (1/decades)`` (default decades=2, the sf0.1->sf10
jump).  Queries present in only one record are listed separately.
Linear scaling is per_decade == 10 for total work on a fixed box; the
interesting print is per-QUERY wall on a parallel box, where flat (1x) to
10x per decade spans healthy and sub-linear plans need no excuse.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    base_p, scaled_p = sys.argv[1], sys.argv[2]
    decades = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    base = json.loads(open(base_p).read().strip().splitlines()[-1])
    scaled = json.loads(open(scaled_p).read().strip().splitlines()[-1])
    bq, sq = base["queries"], scaled["queries"]
    rows = []
    for name in sorted(set(bq) & set(sq)):
        b, s = bq[name], sq[name]
        if b <= 0:
            continue
        ratio = s / b
        rows.append((ratio ** (1.0 / decades), ratio, b, s, name))
    rows.sort(reverse=True)
    print(f"{'query':34s} {'base_s':>8s} {'scaled_s':>9s} {'ratio':>8s} {'per_dec':>8s}")
    for pd, ratio, b, s, name in rows:
        print(f"{name:34s} {b:8.2f} {s:9.2f} {ratio:8.2f} {pd:8.2f}")
    only_b = sorted(set(bq) - set(sq))
    only_s = sorted(set(sq) - set(bq))
    if only_b:
        print("only in base:", ", ".join(only_b))
    if only_s:
        print("only in scaled:", ", ".join(only_s))
    import statistics

    pds = [pd for pd, *_ in rows]
    print(
        f"# n={len(rows)} per-decade median={statistics.median(pds):.2f} "
        f"p90={sorted(pds)[int(0.9 * len(pds))]:.2f} max={pds[0]:.2f} "
        f"sum base={sum(r[2] for r in rows):.1f}s scaled={sum(r[3] for r in rows):.1f}s"
    )


if __name__ == "__main__":
    main()
