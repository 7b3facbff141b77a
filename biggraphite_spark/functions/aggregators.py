"""Spark Column expressions for the 5 aggregators, in both modes.

This is the hot-path form of :class:`biggraphite_spark.model.Aggregator`
(reference: biggraphite/metric.py:197-370).  Everything stays JVM-side
(built-in aggregate functions inside whole-stage codegen) — no UDFs.

Semantics encoded here (the identities SURVEY §7.3 calls out as risks):

- ``average`` partials are carried as (sum, count); the division happens only
  in final mode (CASSANDRA_DESIGN.md:43, metric.py:237-241).  A naive
  ``avg(value)`` over aggregated stages would be wrong when bucket counts
  differ.
- ``last`` picks the newest non-null value (metric.py:243-249) — ``max_by``
  with a null-masked ordering key so null values never win.
- nulls are skipped everywhere; an all-null bucket aggregates to null (the
  engine normalizes the reference's NaN sentinel to null at ingest,
  SURVEY §1.5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

AGGREGATOR_NAMES = ("average", "total", "minimum", "maximum", "last")


def _last_expr(value: Column, ts: Column) -> Column:
    # newest non-null value; masking ts keeps null values out of the argmax
    return F.max_by(value, F.when(value.isNotNull(), ts))


def partial_value_expr(aggregator: Column, value: Column, ts: Column) -> Column:
    """Merge raw/partial values of one bucket into the stored partial *value*.

    For stage0 -> aggregated-stage downsampling (reference Downsampler,
    drivers/_downsampling.py:232-316) and for aggregated -> coarser merges
    (Aggregator.merge, metric.py:218-261) the expression is the same; only
    the ``count`` differs (see :func:`partial_count_expr`).
    """
    return (
        F.when(aggregator.isin("average", "total"), F.sum(value))
        .when(aggregator == "minimum", F.min(value))
        .when(aggregator == "maximum", F.max(value))
        .otherwise(_last_expr(value, ts))
    )


def partial_count_expr(value: Column, count: Column | None = None) -> Column:
    """Contributing-point count of a bucket (sums prior counts when merging)."""
    if count is None:
        return F.count(value)
    return F.sum(F.when(value.isNotNull(), count).otherwise(F.lit(0)))


def final_value_expr(aggregator: Column, value: Column, count: Column, ts: Column) -> Column:
    """Collapse (value, count) partials of one bucket to the read-time scalar.

    Reference Aggregator.aggregate (metric.py:263-304): average divides the
    carried sum by the carried count; the others coincide with their partial.
    """
    total_count = partial_count_expr(value, count)
    return (
        F.when(
            aggregator == "average",
            F.sum(value) / F.nullif(total_count.cast("double"), F.lit(0.0)),
        )
        .when(aggregator == "total", F.sum(value))
        .when(aggregator == "minimum", F.min(value))
        .when(aggregator == "maximum", F.max(value))
        .otherwise(_last_expr(value, ts))
    )


def xff_filter_expr(known: Column, capacity: Column, xff: Column) -> Column:
    """True when a bucket has enough known points to be reported.

    xFilesFactor semantics (reference stores/propagates it, metric.py:653-656;
    graphite-web applies it): keep the bucket iff known/capacity >= xff.
    """
    return (known.cast("double") / capacity.cast("double")) >= xff
