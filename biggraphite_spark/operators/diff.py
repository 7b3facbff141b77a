"""Cluster diff + carbonlink merge: the reference's join-shaped reads.

- ``series_dissymmetry``: align two clusters' series per (name, ts), compute
  the per-point relative gap, report per-series percentiles (reference:
  cli/clusters_diff.py:137-247; ``measure_dissymmetry`` :165-181, percentile
  report :231-247).
- ``merge_with_cache``: left-merge DB series with the carbon cache's hot
  points; the cache wins per graphite ``merge_with_cache``
  (reference: plugins/graphite.py:118-139,185-206).

Scale notes: both are single equi-joins on (name, ts) — sort-merge at scale,
broadcast when one side is a small hot window; the percentile step uses
exact interpolated percentiles per series (a single groupBy), matching what
the reference computes driver-side over collected lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_gap(a: F.Column, b: F.Column) -> F.Column:
    """Relative per-point gap: |a-b| / (|a|+|b|); a point present on one side
    only counts as full dissymmetry (1.0); equal-and-zero counts 0."""
    return (
        F.when(a.isNull() | b.isNull(), F.lit(1.0))
        .otherwise(
            F.coalesce(
                F.abs(a - b) / F.nullif(F.abs(a) + F.abs(b), F.lit(0.0)), F.lit(0.0)
            )
        )
    )


def series_dissymmetry(
    cluster_a: DataFrame, cluster_b: DataFrame, percentiles: tuple[float, ...] = (0.5, 0.9)
) -> DataFrame:
    """Per-series dissymmetry percentiles between two (name, ts, value) sets."""
    a = cluster_a.select("name", "ts", F.col("value").alias("va"))
    b = cluster_b.select("name", "ts", F.col("value").alias("vb"))
    joined = a.join(b, ["name", "ts"], "full_outer").select(
        "name", "ts", point_gap(F.col("va"), F.col("vb")).alias("gap")
    )
    aggs = [
        F.expr(f"percentile(gap, {p})").alias(f"p{int(p * 100)}") for p in percentiles
    ]
    return joined.groupBy("name").agg(*aggs, F.count("*").alias("n_points"))


def merge_with_cache(db: DataFrame, cache: DataFrame) -> DataFrame:
    """Full-outer merge of fetched DB buckets with hot cache buckets on
    (name, ts); cached values win (plugins/graphite.py:118-139)."""
    d = db.select("name", "ts", F.col("value").alias("db_value"))
    c = cache.select("name", "ts", F.col("value").alias("cache_value"))
    return d.join(c, ["name", "ts"], "full_outer").select(
        "name",
        "ts",
        F.coalesce("cache_value", "db_value").alias("value"),
        F.when(F.col("cache_value").isNotNull(), "cache").otherwise("db").alias("source"),
    )
