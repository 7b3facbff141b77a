#!/usr/bin/env python
"""Per-query SHUFFLE-VOLUME audit: exchange bytes/records from Spark's
app-status store, attributed per contract query.

The plan-lint gate (tests/test_plan_lint.py) checks operator SHAPES —
no cartesians, no row-at-a-time Python — but not VOLUMES: a plan can be
shape-clean and still shuffle the corpus where a map-side partial
aggregation should have collapsed it first.  This records, for each named
query, the total shuffle write/read bytes and records across the stages
the query ran, by diffing the status store's stage list around each
execution (same JVM, stage ids are monotonic).

Usage: python scripts/shuffle_audit.py [q1 q2 ...]   # default: top set
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_REUSE_STORE / SPARK_GRAFT_NO_STORE as in bench.py.

Prints one JSON line per query:
  {"query": ..., "shuffle_write_mb": ..., "shuffle_write_records": ...,
   "shuffle_read_mb": ..., "stages": N, "input_mb": ...}
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: default audit set: the queries whose sf10 cost ranked highest in the
#: round-7/8 records (graph fixpoints, pair builders, downsample family)
DEFAULT_QUERIES = [
    "doc_pagerank", "doc_representatives", "doc_quality_propagation",
    "doc_dup_clusters", "doc_dup_clusters_star", "doc_split_leakage_free",
    "bg_downsample_1d", "bg_downsample_1h", "bg_copy_2h", "doc_edit_verify",
]


def stage_metrics(spark) -> dict[int, tuple[int, int, int, int, int]]:
    """stageId -> (shuffle_write_bytes, shuffle_write_records,
    shuffle_read_bytes, shuffle_read_records, input_bytes), via the UI
    REST API (the stable surface for stage metrics — the py4j
    AppStatusStore path needs Scala default-arg plumbing)."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ) as resp:
        stages = json.load(resp)
    out = {}
    for s in stages:
        out[s["stageId"]] = (
            s.get("shuffleWriteBytes", 0),
            s.get("shuffleWriteRecords", 0),
            s.get("shuffleReadBytes", 0),
            s.get("shuffleReadRecords", 0),
            s.get("inputBytes", 0),
        )
    return out


def audit_query(spark, fn, name: str) -> dict:
    before = set(stage_metrics(spark))
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    after = stage_metrics(spark)
    new = [m for sid, m in after.items() if sid not in before]
    swb = sum(m[0] for m in new)
    swr = sum(m[1] for m in new)
    srb = sum(m[2] for m in new)
    srr = sum(m[3] for m in new)
    inb = sum(m[4] for m in new)
    spark.catalog.clearCache()
    return {
        "query": name,
        "shuffle_write_mb": round(swb / 1e6, 2),
        "shuffle_write_records": swr,
        "shuffle_read_mb": round(srb / 1e6, 2),
        "shuffle_read_records": srr,
        "input_mb": round(inb / 1e6, 2),
        "stages": len(new),
    }


def downsample_selftest(spark) -> dict:
    """The partial-agg-before-exchange bound for the downsample family,
    on CONTROLLED dense data: 100k points over 50 names x 24 hourly
    buckets (~83 points per group).  Map-side partial aggregation means
    the exchange carries at most one row per (group x map partition) —
    orders of magnitude below the point count.  A window- or
    regroup-shaped implementation would shuffle every point and blow the
    bound."""
    from pyspark.sql import functions as F

    from biggraphite_spark.model import Stage
    from biggraphite_spark.operators.downsample import downsample_stage0

    n_parts = 8
    pts = (
        spark.range(0, 100_000, 1, n_parts)
        .select(
            F.concat(F.lit("bg.dense.m"), (F.col("id") % 50).cast("string")).alias("name"),
            (F.col("id") % (24 * 3600)).cast("long").alias("ts"),
            (F.col("id") % 97).cast("double").alias("value"),
            F.lit("average").alias("aggregator"),
        )
    )
    stage = Stage(points=1000, precision=3600)
    before = set(stage_metrics(spark))
    downsample_stage0(pts, stage).write.format("noop").mode("overwrite").save()
    after = stage_metrics(spark)
    new = [m for sid, m in after.items() if sid not in before]
    swr = sum(m[1] for m in new)
    groups = 50 * 24
    return {
        "selftest": "downsample_partial_agg",
        "points": 100_000,
        "groups": groups,
        "map_partitions": n_parts,
        "shuffle_write_records": swr,
        "bound": groups * n_parts,
        "pass": bool(0 < swr <= groups * n_parts),
    }


def main() -> None:
    os.environ["SPARK_GRAFT_UI"] = "true"  # stage metrics come from the UI REST API

    import __spark_entry__ as entrymod
    from biggraphite_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark("shuffle-audit")
    if names == ["selftest-downsample"]:
        print(json.dumps(downsample_selftest(spark)), flush=True)
        return
    if not os.environ.get("SPARK_GRAFT_NO_STORE"):
        entrymod.materialize_store(spark, SF_DIR)
    qs = entrymod.queries()
    for name in names:
        print(json.dumps(audit_query(spark, qs[name], name)), flush=True)


if __name__ == "__main__":
    main()
