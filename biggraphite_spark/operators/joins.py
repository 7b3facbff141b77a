"""Temporal joins Spark's built-ins lack: as-of join and interval range join.

Both are beyond-reference operators (the brief's canonical examples of
"operators the engine should have that Spark doesn't ship"), implemented
as compositions of existing DataFrame ops — no pandas stage, no driver
loop — so they inherit whole-stage codegen and AQE.

As-of join (pandas ``merge_asof`` / kdb ``aj`` semantics): for every left
row, the single most recent right row at-or-before the left timestamp,
per key.  The classic Spark spelling — a windowed inequality join — is
quadratic in per-key row count; the implementation here is the
sort-merge "union trick": tag both sides, union them, and let one window
per key carry the latest right payload forward.  ONE shuffle on the key,
zero joins, linear work.

Range join (points-in-intervals): match each point to every interval
containing it.  The naive spelling is a non-equi join, which Spark
executes as BroadcastNestedLoop — O(points x intervals).  The scale path
chunks time into fixed-width buckets: intervals explode to the buckets
they cover, points map to exactly one bucket, and the match becomes an
equi-join on (bucket, keys) plus an exact containment filter.  Join
volume is points x avg-intervals-per-bucket instead of points x
intervals.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: each left row gains the most recent right row with
    ``right_ts <= left_ts`` (ties included), matched per ``on`` key.

    Every non-key right column comes back ``<col><suffix>``; the matched
    right timestamp comes back ``<right_ts><suffix>``.  Unmatched left
    rows keep nulls (left-join semantics — filter on the matched ts for
    inner).  ``tolerance`` (same unit as the timestamps) voids matches
    older than ``left_ts - tolerance``, like pandas ``merge_asof``.

    Right rows should be unique per (key, ts); when they are not, the
    highest-sorting payload wins deterministically (rows are ordered by
    the full right payload tuple within equal timestamps).

    Scale shape: one Exchange on ``on`` + one window sort — the same cost
    as a single sort-merge join, regardless of how many right rows
    precede each left row.  No inequality join, nothing quadratic.
    """
    on = list(on)
    left_payload = [c for c in left.columns if c not in on and c != left_ts]
    right_payload = [c for c in right.columns if c not in on and c != right_ts]

    lhs = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left_payload],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in right_payload
        ],
    )
    rhs = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_payload],
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    )

    # Right rows sort before left rows at equal ts (side 0 < 1) so a
    # same-timestamp right row is visible to the left row — the >= contract.
    # Equal-ts right duplicates then order by payload; last() takes the max.
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side", *[f"__r_{c}" for c in right_payload])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [F.last("__rts", ignorenulls=True).over(w).alias("__m_ts")] + [
        F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}")
        for c in right_payload
    ]
    matched = lhs.unionByName(rhs).select("*", *carried).filter(F.col("__side") == 1)

    m_ts: Column = F.col("__m_ts")
    if tolerance is not None:
        in_tol = F.col("__ts") - m_ts <= F.lit(tolerance)
        void = lambda c: F.when(in_tol, c)  # noqa: E731
    else:
        void = lambda c: c  # noqa: E731

    return matched.select(
        *on,
        F.col("__ts").alias(left_ts),
        *[F.col(c) for c in left_payload],
        void(m_ts).alias(f"{right_ts}{suffix}"),
        *[void(F.col(f"__m_{c}")).alias(f"{c}{suffix}") for c in right_payload],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start: str = "start",
    end: str = "end",
    on: Sequence[str] = (),
    bucket: int = 3600,
) -> DataFrame:
    """Match each point to every interval with ``start <= ts <= end``
    (optionally also equi-matched on ``on`` keys).  Returns the full
    point row joined with the full interval row.

    Implementation: explode each interval onto the fixed-width time
    buckets it covers (``sequence`` of ``bucket``-sized steps), map each
    point to its single bucket, equi-join on (bucket, *on), then apply
    the exact containment predicate.  A point lies in exactly one bucket,
    so no post-join distinct is needed.

    Scale shape: the bucket key turns BroadcastNestedLoop into a hash
    join whose volume is sum over buckets of points_b x intervals_b.
    Pick ``bucket`` near the typical interval length: shorter buckets
    shrink false candidates, longer ones shrink the interval explosion
    (an interval emits ``len/bucket + 1`` rows).  Skewed buckets (one hot
    hour) are AQE-splittable since the join is a plain equi-join.
    """
    on = list(on)
    b = F.lit(int(bucket))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.col(start) / b).cast("long"), (F.col(end) / b).cast("long")
            )
        ),
    )
    pt = points.withColumn("__bucket", (F.col(point_ts) / b).cast("long"))
    return (
        pt.join(iv, ["__bucket", *on])
        .filter((F.col(point_ts) >= F.col(start)) & (F.col(point_ts) <= F.col(end)))
        .drop("__bucket")
    )
