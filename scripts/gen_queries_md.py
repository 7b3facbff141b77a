#!/usr/bin/env python
"""Regenerate QUERIES.md from the live registry (run after adding queries)."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as e  # noqa: E402

HEADER = """# QUERIES — contract-query index

Every entry in `__spark_entry__.queries()`, in driver-gate order (the
driver correctness-checks the first 50 each round; never-driver-checked
queries are front-loaded).  `oracle` = value-hash-compared against DuckDB
at sf0.01 — as of round 4 every query has one (the BPE/multimodal
pipelines DuckDB cannot express carry python-twin literal oracles from
oracle_twins.py).

| # | query | check | what it pins |
|---|---|---|---|"""


def render() -> str:
    """The full QUERIES.md content for the live registry — pure, so a
    pytest can assert the committed file hasn't drifted from queries()."""
    names = list(e.queries())
    oracles = set(e._ORACLES)
    lines = [HEADER]
    for i, n in enumerate(names, 1):
        doc = re.sub(r"\s+", " ", (e._QUERIES[n].__doc__ or "").strip())
        doc = doc[:170] + ("..." if len(doc) > 170 else "")
        check = "oracle" if n in oracles else "rows-only"
        lines.append(f"| {i} | `{n}` | {check} | {doc} |")
    return "\n".join(lines) + "\n"


def main() -> None:
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "QUERIES.md")
    with open(path, "w") as f:
        f.write(render())
    names = list(e.queries())
    unchecked = [n for n in names
                 if n not in (e._DRIVER_GREEN - e._REWRITTEN_SINCE_GREEN)]
    print(f"{len(names)} queries; {len(unchecked)} front-loaded")


if __name__ == "__main__":
    main()
