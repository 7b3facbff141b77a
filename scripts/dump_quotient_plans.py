#!/usr/bin/env python
"""Dump the _twin_quotient membership sub-plan with localCheckpoint no-op'd.

The quotient's membership/class_pairs are lazily checkpointed, so a query's
final explain shows only ``Scan ExistingRDD`` where the quotient build sits
— the window partition keys (the r11 scalar-key fix) are invisible in the
committed query plans.  This dump disables checkpointing for explain only
and prints the full membership plan over the capped near-dup pair graph
(doc_pagerank_capped's in-graph detection path — the hot consumer).

Usage: python scripts/dump_quotient_plans.py OUTFILE
Run from the tree whose plan you want (path resolution is file-relative).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    outfile = sys.argv[1]
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    from pyspark.sql import functions as F

    from biggraphite_spark.session import get_spark

    # explain-only: keep the full lineage visible.  Spark 4 instantiates
    # pyspark.sql.classic.dataframe.DataFrame, which overrides the base
    # class's methods — patch the concrete class, not the facade.
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pre-4.0 layout
        from pyspark.sql import DataFrame
    DataFrame.localCheckpoint = lambda self, eager=True: self  # type: ignore[assignment]

    from biggraphite_spark.operators.dedup import cap_pair_fanout, lsh_near_dups
    from biggraphite_spark.operators.graph import _twin_quotient

    spark = get_spark("dump-quotient-plans")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    pairs = cap_pair_fanout(lsh_near_dups(docs, threshold=0.5), 16)
    sym = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    sym = sym.unionByName(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
    membership, class_pairs = _twin_quotient(sym, True, 0.8)
    buf = io.StringIO()
    with redirect_stdout(buf):
        print("== membership ==")
        membership.explain("formatted")
        print("== class_pairs ==")
        class_pairs.explain("formatted")
    with open(outfile, "w") as fh:
        fh.write(buf.getvalue())
    print(f"wrote {outfile}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
