"""Read path: ranged point fetch + read-time regroup (PointGrouper).

Reference lifecycle (SURVEY §3.1 steps 4-5): align the window and pick a
stage (plan-time, biggraphite/metric.py:593-623 — implemented in
``model.Retention.align_time_window``), scan ``[start, end)`` for the matched
metrics (drivers/cassandra.py:1846-1919), regroup rows into target-stage
buckets applying each metric's aggregator (accessor.py:413-584).

Spark mapping: the per-partition SELECT fan-out becomes one filtered scan —
partition pruning on the points table's (stage, time_bucket) layout does what
``_fetch_points_make_selects`` did by hand; the regroup is a windowed
aggregation.  Replica selection (accessor.py:468-505) is dropped: Spark's
single-logical-writer tables don't need it (SURVEY §2.3 A4).

Scale notes: the metric filter is a broadcast semi-join (small matched set
against a huge points table, SURVEY §2.4 J2); time filters prune partitions
before any shuffle; the single shuffle is the (name, bucket) aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.aggregators import final_value_expr, partial_count_expr, partial_value_expr
from ..model import Stage
from .downsample import bucket_col


def time_slice(points: DataFrame, start: int, end: int) -> DataFrame:
    """``[start, end)`` — end exclusive per the accessor contract
    (accessor.py:203-236)."""
    return points.filter((F.col("ts") >= F.lit(start)) & (F.col("ts") < F.lit(end)))


def restrict_to_metrics(points: DataFrame, metrics: DataFrame) -> DataFrame:
    """Keep points of the matched metrics (broadcast left-semi join)."""
    return points.join(F.broadcast(metrics.select("name")), "name", "left_semi")


def fetch_points(
    points: DataFrame,
    metrics: DataFrame,
    start: int,
    end: int,
    target: Stage,
    aggregated: bool = True,
    source_is_raw: bool = False,
) -> DataFrame:
    """Fetch + regroup one window into target-stage buckets.

    ``points``: a stage table — raw (name, ts, value) when ``source_is_raw``
    else aggregated partials (name, ts, value, count, aggregator).
    ``metrics``: matched catalog rows (must carry ``aggregator``).

    ``aggregated=True`` returns final scalars (accessor ``aggregated=True``,
    accessor.py:203-236); ``False`` returns merged partials (value, count) —
    the reference's merge mode used when copying between retentions.
    """
    sliced = restrict_to_metrics(time_slice(points, start, end), metrics)
    if source_is_raw:
        sliced = sliced.join(F.broadcast(metrics.select("name", "aggregator")), "name")
        count_col = None
    else:
        count_col = None  # bound below, after `sliced` is final

    # dataset-bound references (sliced[...]), NOT F.col: a stage table built
    # by joining the SAME catalog object that `metrics` derives from makes a
    # by-name `aggregator` ambiguous under the analyzer's self-join dedup —
    # binding to `sliced` pins every reference to the left side
    if not source_is_raw:
        count_col = sliced["count"]

    # aggregator joins the grouping key (functionally dependent on name, so
    # the groups are unchanged) instead of riding a first() aggregate: a
    # string agg buffer would demote the regroup to SortAggregate, and this
    # is the read path's one shuffle — see downsample_stage0
    agg = sliced["aggregator"]
    grouped = sliced.groupBy(
        sliced["name"],
        agg.alias("aggregator"),
        bucket_col(sliced["ts"], target.precision).alias("ts"),
    )
    if aggregated:
        return grouped.agg(
            final_value_expr(agg, sliced["value"], count_col if count_col is not None else F.lit(1), sliced["ts"]).alias("value")
        ).select("name", "ts", "value")
    return grouped.agg(
        partial_value_expr(agg, sliced["value"], sliced["ts"]).alias("value"),
        partial_count_expr(sliced["value"], count_col).alias("count"),
    ).select("name", "ts", "value", "count")
