#!/usr/bin/env python
"""Streaming-ingest bench: sustained micro-batch points/s with rollup
maintenance ON.

The reference sizes a carbon ingest instance at ~200k points/s
(plugins/carbon.py:93-95).  This measures the Spark Structured Streaming
equivalent end-to-end: a rate source feeding ``generic_partials`` at
stage0, foreachBatch appending epoch-stamped partials to a PointStore AND
refreshing the dirtied coarse-stage day partitions after every batch (the
freshness e2e's exact wiring, tests/test_streaming_freshness.py) — i.e.
the number includes the LWW upsert write and the incremental rollup, not
just the narrow map.

Prints ONE JSON line: sustained points/s = rows ingested / wall between
first-batch start and last-batch end, plus per-batch stats.

Env: SPARK_GRAFT_STREAM_SECONDS (default 45), SPARK_GRAFT_STREAM_RATE
(default 400_000 rows/s offered), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUN_S = int(os.environ.get("SPARK_GRAFT_STREAM_SECONDS", "45"))
RATE = int(os.environ.get("SPARK_GRAFT_STREAM_RATE", "400000"))
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_METRICS = 100_000  # a realistic per-instance metric population


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .appName("bench_streaming")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from biggraphite_spark.model import Retention
    from biggraphite_spark.storage import PointStore
    from biggraphite_spark.streaming.ingest import (
        fan_out_sink,
        generic_partials,
        rollup_maintenance_sink,
    )

    retention = Retention.from_string("2678400*1s:1000*3600s")
    stage0, coarse = retention.stages[0], retention.stages[1]

    workdir = tempfile.mkdtemp(prefix="bgspark_stream_bench_")
    store = PointStore(os.path.join(workdir, "store"))

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", RATE)
        .option("numPartitions", 8)
        .load()
    )
    pts = stream.select(
        F.concat(
            F.lit("bg.stream.m"), (F.col("value") % N_METRICS).cast("string")
        ).alias("name"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 1000).cast("double").alias("value"),
    )
    partials = generic_partials(pts, stage0)

    def append0(batch_df, epoch_id):
        store.write(
            batch_df.withColumn("epoch", F.lit(epoch_id)), stage0, mode="append"
        )

    q = (
        partials.writeStream.outputMode("update")
        .foreachBatch(
            fan_out_sink(append0, rollup_maintenance_sink(store, stage0, [coarse]))
        )
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .start()
    )
    try:
        time.sleep(RUN_S)
    finally:
        q.stop()
        q.awaitTermination()

    progress = [
        json.loads(p.json if hasattr(p, "json") else p)
        for p in q.recentProgress
    ]
    batches = [p for p in progress if p.get("numInputRows", 0) > 0]
    rows_in = sum(p["numInputRows"] for p in batches)
    if batches:
        t0 = min(p["timestamp"] for p in batches)
        # wall = first batch trigger -> last batch completion
        last = max(batches, key=lambda p: p["timestamp"])
        import datetime as dt

        def ts(s):
            return dt.datetime.fromisoformat(s.replace("Z", "+00:00")).timestamp()

        wall = (
            ts(last["timestamp"])
            + last["batchDuration"] / 1000.0
            - ts(t0)
        )
    else:
        wall = float("nan")
    durations = sorted(p["batchDuration"] / 1000.0 for p in batches)
    out = {
        "metric": "streaming_ingest",
        "value": int(rows_in / wall) if batches else 0,
        "unit": "points/s",
        "sf": f"rate={RATE}/s metrics={N_METRICS}",
        "rows_ingested": rows_in,
        "wall_s": round(wall, 2),
        "batches": len(batches),
        "batch_s_median": round(durations[len(durations) // 2], 2) if durations else None,
        "batch_s_max": round(durations[-1], 2) if durations else None,
        "rollup_maintenance": "on (coarse=3600s, per-batch dirty-day refresh)",
    }
    print(json.dumps(out))
    shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
