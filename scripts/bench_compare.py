#!/usr/bin/env python
"""Compare two bench audit records query-by-query.

Usage: python scripts/bench_compare.py BEFORE.json AFTER.json [min_base_sec]
Prints total/geomean ratios and per-query ratios sorted worst-first,
restricted to queries with base >= min_base_sec (default 1.0).
"""

from __future__ import annotations

import json
import math
import sys


def main() -> None:
    before = json.load(open(sys.argv[1]))["queries"]
    after = json.load(open(sys.argv[2]))["queries"]
    min_base = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
    common = sorted(set(before) & set(after))
    tb = sum(before[q] for q in common)
    ta = sum(after[q] for q in common)
    ratios = {q: after[q] / before[q] for q in common if before[q] > 0}
    geo = math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios))
    print(f"common={len(common)} total {tb:.1f}s -> {ta:.1f}s (x{ta/tb:.3f}) "
          f"geomean x{geo:.3f}")
    big = [(r, q) for q, r in ratios.items() if before[q] >= min_base]
    big.sort(reverse=True)
    print(f"-- per-query (base >= {min_base}s), worst first --")
    for r, q in big:
        print(f"{q:32s} {before[q]:8.2f} -> {after[q]:8.2f}  x{r:.3f}")


if __name__ == "__main__":
    main()
