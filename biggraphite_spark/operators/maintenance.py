"""Maintenance & ops jobs: clean / repair / du / stats.

Reference surface (SURVEY §2.4 J3, §2.3 A6): each maintenance pass is a
token-range scan + per-row callbacks in the reference
(drivers/cassandra.py:2691-3260); in Spark each one collapses to a single
anti-join or aggregation over the catalog — the scan sharding
(shard/nshards, accessor.py:324-351) is just partitioning, for free.

Scale notes: every job here touches only the *catalog* (rows ~ metric
count, millions at most), never the points data — all joins are
sort-merge-or-broadcast on `name`/`parent`, one shuffle each.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..model import Retention

#: bytes per stored point, the reference's disk cost model
#: (cli/command_du.py:24)
BYTES_PER_POINT = 24


def directories_from_names(catalog: DataFrame) -> DataFrame:
    """Derive the directories view: every proper prefix of every metric name.

    The reference materializes a directories table
    (CASSANDRA_DESIGN.md:108-112); ES derives it from names
    (drivers/elasticsearch.py:587-629).  We derive: explode each name's
    prefixes (depth 1..depth), distinct.
    """
    parts = F.split(F.col("name"), r"\.")
    # sequence(1, 0) would generate a DESCENDING [1, 0] in Spark, so
    # single-component names must short-circuit to no prefixes
    prefixes = F.when(
        F.size(parts) > 1,
        F.transform(
            F.sequence(F.lit(1), F.size(parts) - 1),
            lambda i: F.array_join(F.slice(parts, F.lit(1), i), "."),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        catalog.select(F.explode(prefixes).alias("directory"))
        .distinct()
    )


def expired_metrics(catalog: DataFrame, cutoff: int) -> DataFrame:
    """Metrics not updated since ``cutoff`` — the clean-expiry pass
    (reference: drivers/cassandra.py:3162-3260, cutoff on updated_on)."""
    return catalog.filter(F.col("updated_on") < F.lit(cutoff))


def empty_directories(catalog: DataFrame, live: DataFrame) -> DataFrame:
    """Directories with no live metric below them — delete candidates.

    Reference: empty-directory clean (drivers/cassandra.py:2936-3050), a
    left anti-join of directories against metric name prefixes.
    """
    all_dirs = directories_from_names(catalog)
    live_dirs = directories_from_names(live)
    return all_dirs.join(live_dirs, "directory", "left_anti")


def missing_parent_metrics(catalog: DataFrame, directories: DataFrame) -> DataFrame:
    """Metrics whose parent directory row is absent — repair candidates
    (reference: missing-directory repair, drivers/cassandra.py:2844-2935)."""
    return catalog.join(
        directories.withColumnRenamed("directory", "parent"), "parent", "left_anti"
    )


def orphan_metrics(metrics: DataFrame, metadata: DataFrame) -> DataFrame:
    """Metrics present in the names table but missing metadata — delete
    candidates (reference: invalid-metrics repair,
    drivers/cassandra.py:2734-2843)."""
    return metrics.join(metadata.select("name"), "name", "left_anti")


def du(catalog: DataFrame, group: Column | None = None) -> DataFrame:
    """Disk usage per namespace: retention points x 24 bytes per metric
    (reference: cli/command_du.py:47-74)."""
    if group is None:
        group = F.col("parent")
    pts = retention_points_col(F.col("retention"))
    return (
        catalog.groupBy(group.alias("namespace"))
        .agg(
            F.count("*").alias("n_metrics"),
            F.sum(pts).alias("points"),
            (F.sum(pts) * F.lit(BYTES_PER_POINT)).alias("bytes"),
        )
    )


def retention_points_col(retention: Column) -> Column:
    """Total stored points of a retention string, as a Column.

    ``"86400*1s:10080*60s"`` -> 86400 + 10080: sum of the ``points`` factor
    of each stage (reference: Retention.points used by du).
    """
    stages = F.split(retention, ":")
    return F.aggregate(
        F.transform(stages, lambda s: F.split(s, r"\*").getItem(0).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def stats(catalog: DataFrame, classifier: list[tuple[str, str]], default: str = "other") -> DataFrame:
    """Metric/point counts per regex-classified namespace
    (reference: cli/command_stats.py:96-403, classifier :54-94 — a chained
    first-match regex list)."""
    ns: Column = F.lit(default)
    expr = None
    for pattern, label in classifier:
        cond = F.col("name").rlike(pattern)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    ns = expr.otherwise(default) if expr is not None else ns
    return (
        catalog.groupBy(ns.alias("namespace"))
        .agg(
            F.count("*").alias("n_metrics"),
            F.sum("point_count").alias("points"),
        )
    )
