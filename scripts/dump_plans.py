#!/usr/bin/env python
"""Dump .explain("formatted") for named contract queries to files.

Usage:
    python scripts/dump_plans.py OUTDIR SUFFIX q1 [q2 ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each query, using the bench shape
(store materialized, $SPARK_GRAFT_SF_DIR data).  Run from the tree whose
plans you want: the repo root is resolved relative to this file, so a copy
placed in an older worktree's scripts/ dumps THAT tree's plans.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    import __spark_entry__ as entrymod
    from biggraphite_spark.session import get_spark

    spark = get_spark("dump-plans")
    if not os.environ.get("SPARK_GRAFT_NO_STORE"):
        entrymod.materialize_store(spark, SF_DIR)
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
