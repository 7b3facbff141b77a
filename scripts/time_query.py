#!/usr/bin/env python
"""Time individual contract queries in THIS process's fresh JVM, mimicking
bench.py's exact measurement shape (warm-ups, optional store
materialization, noop sink).  Usage:

    python scripts/time_query.py q1 [q2 ...]          # store-backed (bench shape)
    SPARK_GRAFT_NO_STORE=1 python scripts/time_query.py q1   # recompute-from-raw (r1 shape)
    SPARK_GRAFT_REPEAT=3 python scripts/time_query.py q1     # repeat to see JIT settle

Prints one JSON line per query: {"query": ..., "runs": [sec, ...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    import __spark_entry__ as entrymod
    from biggraphite_spark.session import get_spark

    spark = get_spark("time-query")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: (pdf for pdf in it), "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    if not os.environ.get("SPARK_GRAFT_NO_STORE"):
        t0 = time.time()
        entrymod.materialize_store(spark, SF_DIR)
        print(json.dumps({"materialize_sec": round(time.time() - t0, 3)}))

    repeat = int(os.environ.get("SPARK_GRAFT_REPEAT", "1"))
    qs = entrymod.queries()
    for name in sys.argv[1:]:
        runs = []
        for _ in range(repeat):
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        print(json.dumps({"query": name, "runs": runs}))


if __name__ == "__main__":
    main()
