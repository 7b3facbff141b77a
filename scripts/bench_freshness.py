#!/usr/bin/env python
"""Streaming end-to-end FRESHNESS bench: event-time -> queryable latency
percentiles, per stage, under the full rollup-maintenance wiring.

Throughput is already recorded (scripts/bench_streaming.py: 4.3M points/s
sustained); this measures the other axis — how long after a point's event
time it becomes READABLE, (a) in the stage0 store (epoch-stamped partial
landed) and (b) in the coarse rollup (dirty-day refresh completed).  The
wiring is exactly tests/test_streaming_freshness.py's: rate source ->
generic_partials -> fan_out_sink(stage0 append, rollup_maintenance_sink).

Method: the sink wrapper records, per micro-batch, the wall-clock instants
after the stage0 append and after the coarse refresh, plus the batch's
per-second event-time histogram (groupBy ts on the 1s-bucketed partials,
weighted by point count — a tiny agg on the already-persisted batch).
Per-point latency = t_readable - event_ts; pooling the histograms across
batches gives exact percentiles at 1 s resolution (the stage0 bucket
quantization, noted in the record).

Prints ONE JSON line per offered rate with p50/p90/p99 per stage.

Env: SPARK_GRAFT_STREAM_SECONDS (default 45), SPARK_GRAFT_FRESH_RATES
(default "100000,1000000"), SPARK_GRAFT_CPUS.
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
RATES = [
    int(r)
    for r in os.environ.get(
        "SPARK_GRAFT_FRESH_RATES", "100000,1000000"
    ).split(",")
]
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_METRICS = 100_000


def _pooled_percentiles(hist: dict[float, int], qs=(0.5, 0.9, 0.99)):
    """Exact percentiles from a {latency_s: weight} histogram."""
    if not hist:
        return {q: None for q in qs}
    items = sorted(hist.items())
    total = sum(w for _, w in items)
    out = {}
    for q in qs:
        target = q * total
        acc = 0
        for lat, w in items:
            acc += w
            if acc >= target:
                out[q] = round(lat, 3)
                break
    return out


def run_rate(spark, rate: int) -> dict:
    from pyspark.sql import functions as F

    from biggraphite_spark.model import Retention
    from biggraphite_spark.storage import PointStore, dirty_rollup_days
    from biggraphite_spark.streaming.ingest import generic_partials

    retention = Retention.from_string("2678400*1s:1000*3600s")
    stage0, coarse = retention.stages[0], retention.stages[1]

    workdir = tempfile.mkdtemp(prefix="bgspark_fresh_bench_")
    store = PointStore(os.path.join(workdir, "store"))

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rate)
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

    # per-batch: (event-ts histogram, t_after_stage0, t_after_coarse)
    batch_stats: list[tuple[dict[int, int], float, float]] = []

    def sink(batch_df, epoch_id):
        batch_df.persist()
        try:
            hist = {
                int(r["ts"]): int(r["pts"])
                for r in batch_df.groupBy("ts")
                .agg(F.sum("count").alias("pts"))
                .collect()
            }
            store.write(
                batch_df.withColumn("epoch", F.lit(epoch_id)),
                stage0,
                mode="append",
            )
            t_stage0 = time.time()
            days = dirty_rollup_days(batch_df, coarse)
            if days:
                store.refresh_rollup(
                    batch_df.sparkSession, stage0, coarse, days
                )
            t_coarse = time.time()
            if hist:
                batch_stats.append((hist, t_stage0, t_coarse))
        finally:
            batch_df.unpersist()

    q = (
        partials.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(workdir, "ckpt"))
        .start()
    )
    try:
        time.sleep(RUN_S)
    finally:
        q.stop()
        q.awaitTermination()

    # pool per-point latencies across batches (1 s event-time resolution)
    lat0: dict[float, int] = {}
    lat1: dict[float, int] = {}
    n_points = 0
    for hist, t_stage0, t_coarse in batch_stats:
        for ts_s, w in hist.items():
            n_points += w
            l0 = round(t_stage0 - ts_s, 1)
            l1 = round(t_coarse - ts_s, 1)
            lat0[l0] = lat0.get(l0, 0) + w
            lat1[l1] = lat1.get(l1, 0) + w
    p0 = _pooled_percentiles(lat0)
    p1 = _pooled_percentiles(lat1)
    shutil.rmtree(workdir, ignore_errors=True)
    return {
        "metric": "streaming_freshness",
        "unit": "sec event-time -> readable",
        "offered_rate": rate,
        "run_s": RUN_S,
        "batches": len(batch_stats),
        "points": n_points,
        "stage0_p50": p0[0.5],
        "stage0_p90": p0[0.9],
        "stage0_p99": p0[0.99],
        "coarse_p50": p1[0.5],
        "coarse_p90": p1[0.9],
        "coarse_p99": p1[0.99],
        "note": "1s event-time quantization (stage0 bucket width); "
        "coarse = after dirty-day rollup refresh",
    }


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .appName("bench_freshness")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        for rate in RATES:
            print(json.dumps(run_rate(spark, rate)), flush=True)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
