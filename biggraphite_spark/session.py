"""SparkSession builder tuned for this engine.

Local test/bench defaults come from env (SPARK_GRAFT_CPUS, SPARK_GRAFT_SHUFFLE);
on a real cluster the caller owns the session and just passes it in — every
operator in this package takes an explicit SparkSession/DataFrame and never
creates one behind the caller's back.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "biggraphite-spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a local session with the engine's recommended conf.

    UTC session timezone is load-bearing: the DuckDB oracle compares
    timestamps as UTC-naive.  AQE is on so skewed metric keys and small
    partitions get re-planned at runtime (matters at real scale; harmless
    locally).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE", str(max(cpus, 4)))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local mode: the driver JVM hosts all executor threads, so it needs
        # a real heap — 8g with 32 threads + cached relations GC-thrashes
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # dozens of distinct codegen-heavy plans in one JVM overflow the
        # default 240m JIT code cache; once full, hot generated code runs
        # interpreted and individual queries degrade 10-20x intermittently
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_GRAFT_DRIVER_JAVA_OPTS",
                "-XX:ReservedCodeCacheSize=2g -XX:+UseCodeCacheFlushing "
                # a moderate bump over the default 2-3 C2 threads keeps the
                # compile queue drained without starving executors.  NOTE:
                # the round-2 combination (CICompilerCount=16 +
                # -XX:-DontCompileHugeMethods) is actively harmful past
                # ~80 distinct plans: force-compiling multi-MB generated
                # methods on 16 compiler threads eats half the cores and
                # late-suite queries degrade 3-5x (PERF.md finding 18;
                # measured 235s -> 184s suite total by reverting it)
                "-XX:CICompilerCount=8",
            ),
        )
        # UI off by default (port + heap overhead per test session); the
        # shuffle-volume audit (scripts/shuffle_audit.py) flips it on to
        # read stage metrics from the REST surface
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # the driver-generated events.parquet carries TIMESTAMP(NANOS), which
        # the vectorized reader only accepts as int64 via this flag
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
