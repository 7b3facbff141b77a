#!/usr/bin/env python
"""Fill BASELINE.md's "measurable baseline" table with recorded numbers.

The four rows promised since round 1 (BASELINE.md "Measurable baseline for
this repo"), measured against the driver testdata at $SPARK_GRAFT_SF_DIR:

1. ingest + downsample throughput — raw point stream -> ALL retention
   stages (the batch downsampling job), points/s
2. glob find latency — per-pattern wall clock over the derived catalog,
   pattern shapes modeled on the reference metadata test corpus
   (tests/drivers/base_test_metadata.py:29-157: exact names, component
   globs, char classes, brace groups)
3. fetch + aggregate latency — a 2,000-point window per metric (the
   reference's _EXPECTED_POINTS_PER_READ, drivers/cassandra.py:641-643),
   single metric and a 100-metric batch
4. maintenance job runtime — clean (expired + empty dirs) and repair
   (orphans + missing parents) over the full catalog

Prints ONE JSON line (bench.py convention).  Timings are min-of-N on a
warmed plan (N=3 for the sub-second rows, 2 for the job rows).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _timed(fn, n: int = 3) -> float:
    fn()  # warm codegen/broadcast on the identical plan
    return min(_once(fn) for _ in range(n))


def _once(fn) -> float:
    t0 = time.monotonic()
    fn()
    return time.monotonic() - t0


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .appName("bench_baseline")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from biggraphite_spark.cli import build_engine
    from biggraphite_spark.operators.downsample import downsample_all
    from biggraphite_spark.sources.events import (
        NOW,
        RETENTION,
        load_catalog,
        load_stage0,
    )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    catalog = load_catalog(spark, SF_DIR).cache()
    n_metrics = catalog.count()
    points0 = load_stage0(spark, SF_DIR)
    n_points = points0.count()
    rows: dict = {"sf_dir": SF_DIR, "n_metrics": n_metrics, "n_points": n_points}

    # -- 1. ingest + downsample throughput --------------------------------
    stages = list(RETENTION.stages)

    def run_downsample():
        for df in downsample_all(points0, catalog, stages).values():
            noop(df)

    wall = _timed(run_downsample, n=2)
    rows["ingest_downsample"] = {
        "wall_s": round(wall, 3),
        "points_per_s": int(n_points / wall),
        "stages": [str(s) for s in stages],
    }

    # -- 2. glob find latency ----------------------------------------------
    engine = build_engine(spark, SF_DIR)
    sample = [r["name"] for r in catalog.orderBy("name").limit(120).collect()]
    exact = sample[0]
    patterns = {
        "exact": exact,
        "all_metrics": "bg.*.*",
        "leaf_star": "bg.click.*",
        "prefix_star": "bg.click.u1*",
        "brace_group": "bg.{click,view}.u*2",
        "char_question": "bg.click.u??",
        "two_globs": "bg.*.u*7",
    }
    find_rows = {}
    for label, pat in patterns.items():
        def run(pat=pat):
            engine.find(pat).collect()

        w = _timed(run, n=3)
        find_rows[label] = {
            "pattern": pat,
            "wall_s": round(w, 4),
            "matched": engine.find(pat).count(),
        }
    rows["glob_find"] = find_rows

    # -- 3. fetch + aggregate latency (2,000-point window) -----------------
    # stage0 is 1s precision, so a 2,000s window = the reference's
    # expected 2,000 points per read
    window = 2000
    one = exact

    def read_one():
        engine.read(one, NOW - window, NOW).series.collect()

    batch = sample[:100]

    def read_batch():
        engine.read_names(batch, NOW - window, NOW).series.collect()

    w1 = _timed(read_one, n=3)
    w100 = _timed(read_batch, n=3)
    rows["fetch_aggregate"] = {
        "window_points": window,
        "single_metric_s": round(w1, 4),
        "batch_100_s": round(w100, 4),
        "batch_100_per_metric_s": round(w100 / len(batch), 5),
    }

    # -- 4. maintenance clean / repair -------------------------------------
    import __spark_entry__ as entry

    def clean():
        noop(entry._QUERIES["bg_clean"](spark, SF_DIR))

    def repair():
        noop(entry._QUERIES["bg_repair"](spark, SF_DIR))

    rows["maintenance"] = {
        "clean_s": round(_timed(clean, n=2), 3),
        "repair_s": round(_timed(repair, n=2), 3),
    }

    print(json.dumps({
        "metric": "baseline_table",
        "value": rows["ingest_downsample"]["points_per_s"],
        "unit": "points/s",
        "sf": SF_DIR,
        "rows": rows,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
