"""Write-time rollup (downsampling): stage0 -> aggregated stages.

Spark-first replacement for the reference's incremental Downsampler
(drivers/_downsampling.py:29-349).  The reference keeps a per-metric ring
buffer and re-emits updated (ts, value, count) partials per batch; in batch
Spark the idempotent equivalent is a deterministic recompute: one windowed
aggregation per stage (SURVEY §2.3 A3, §7.3 risk 4 — recompute-from-raw is
preferred over upsert state).

Scale notes (100 TB):
- one shuffle per stage, keyed on (name, bucket) — partial aggregation
  (map-side combine) happens before the exchange because every expression is
  a built-in hash aggregate;
- the aggregator lookup join is a broadcast of the catalog (name ->
  aggregator), i.e. no extra shuffle of the points; for catalogs too big to
  broadcast, pass ``broadcast_catalog=False`` to fall back to a shuffled
  join that AQE can still convert at runtime;
- cascading stages (1h -> 1d) roll up from the *previous* stage's partials,
  not from raw — the same (sum,count)-carrying merge the reference does
  (metric.py:218-261) — so each coarser stage shuffles orders of magnitude
  fewer rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.aggregators import partial_count_expr, partial_value_expr
from ..model import Retention, Stage


def bucket_col(ts: F.Column, precision: int) -> F.Column:
    """Align unix-second timestamps down to a stage bucket (metric.py:469-475)."""
    return (ts - (ts % F.lit(precision))).alias("ts")


def normalize_stage0(points0: DataFrame, stage0: Stage, arrival_col: str | None = None) -> DataFrame:
    """Stage0 slot semantics: one point per (metric, stage0 step), newest
    timestamp wins, emitted at the slot-aligned timestamp.

    This is the batch equivalent of the reference's stage0 ring buffer
    (drivers/_downsampling.py:128-189): a point lands in its step's slot and
    replaces the stored one only when its timestamp is newer (the goldens in
    tests/drivers/test_drivers_downsampling.py:133-185 pin this: feeding
    (0,1),(1,2) into a 10s stage keeps 2; out-of-order (101,42),(100,84)
    keeps 42).  Coarser stages aggregate these deduped slot points, so this
    must run before :func:`downsample_stage0` whenever the raw feed can
    carry several points per slot.

    Two points with the *same* timestamp are ordered by ``arrival_col`` when
    given (the reference's last-arrival-wins); without one the tie is
    arbitrary — batch recomputes have no arrival order.
    """
    order = F.col("ts") if arrival_col is None else F.struct(F.col("ts"), F.col(arrival_col))
    return (
        points0.groupBy("name", bucket_col(F.col("ts"), stage0.precision).alias("ts"))
        .agg(F.max_by("value", order).alias("value"))
    )


def with_aggregator(points: DataFrame, catalog: DataFrame, broadcast_catalog: bool = True) -> DataFrame:
    """Attach each point's aggregator from the catalog (metadata->data join,
    SURVEY §2.4 J2 — broadcast hash join, no shuffle of the big side)."""
    dims = catalog.select("name", "aggregator")
    if broadcast_catalog:
        dims = F.broadcast(dims)
    return points.join(dims, "name")


def downsample_stage0(
    points0_with_agg: DataFrame, stage: Stage
) -> DataFrame:
    """Roll raw points up into one aggregated stage's (value, count) partials.

    Input:  name, ts (unix s), value, aggregator
    Output: name, ts (bucket start), value (partial), count

    For ``average`` the stored value is the bucket *sum* and count the point
    count — division is deferred to read time (CASSANDRA_DESIGN.md:43).

    ``aggregator`` is a GROUPING key, not a ``first()`` aggregate: it is
    functionally dependent on ``name`` so the result is identical, but a
    string-typed aggregation buffer would force the whole rollup into
    SortAggregate (per-partition sort of every raw point); with it in the
    key the buffer is all fixed-width numerics and Spark plans
    HashAggregate — the difference between sorting and hashing 100 TB.
    """
    return (
        points0_with_agg.groupBy(
            "name", "aggregator", bucket_col(F.col("ts"), stage.precision).alias("ts")
        )
        .agg(
            partial_value_expr(F.col("aggregator"), F.col("value"), F.col("ts")).alias("value"),
            partial_count_expr(F.col("value")).alias("count"),
        )
        .select("name", "ts", "value", "count", "aggregator")
    )


def rollup_partials(stage_df: DataFrame, target: Stage) -> DataFrame:
    """Merge a finer aggregated stage's partials into a coarser stage.

    Same-stage merge semantics (Aggregator.merge, metric.py:218-261):
    (sum,count) partials add; min/max keep extrema; last keeps the newest.
    Input/output shape: name, ts, value, count, aggregator.  ``aggregator``
    is a grouping key for the same HashAggregate reason as
    :func:`downsample_stage0`.
    """
    return (
        stage_df.groupBy(
            "name", "aggregator", bucket_col(F.col("ts"), target.precision).alias("ts")
        )
        .agg(
            partial_value_expr(F.col("aggregator"), F.col("value"), F.col("ts")).alias("value"),
            partial_count_expr(F.col("value"), F.col("count")).alias("count"),
        )
        .select("name", "ts", "value", "count", "aggregator")
    )


def copy_to_retention(
    stage_tables: dict[str, DataFrame],
    src_retention: "Retention",
    dst_retention: "Retention",
) -> dict[str, DataFrame]:
    """``bgutil copy`` with a retention override (cli/command_copy.py:31-110):
    rebuild every destination stage by re-aggregating the finest compatible
    source stage's partials (merge mode — no raw points needed).

    A destination stage is servable when some source aggregated stage's
    precision divides it; incompatible stages are skipped (the reference
    copies stage-by-stage under the same constraint).
    """
    out: dict[str, DataFrame] = {}
    src_stages = [s for s in src_retention.stages if not s.stage0]
    for dst in dst_retention.stages:
        if dst.stage0:
            continue
        compatible = [
            s for s in src_stages
            if dst.precision % s.precision == 0 and s.as_string() in stage_tables
        ]
        if not compatible:
            continue
        src = min(compatible, key=lambda s: s.precision)
        out[dst.as_string()] = rollup_partials(stage_tables[src.as_string()], dst)
    return out


def downsample_all(
    points0: DataFrame,
    catalog: DataFrame,
    stages: list[Stage],
    arrival_col: str | None = None,
    dedup_slots: bool = True,
) -> dict[str, DataFrame]:
    """Produce every aggregated stage, cascading coarser from finer.

    Returns {stage_string: DataFrame(name, ts, value, count, aggregator)}.

    When ``stages`` includes a stage0, raw points are first normalized to
    the reference's slot semantics (:func:`normalize_stage0` — one point
    per stage0 step, newest wins), so a feed carrying resent/corrected
    values aggregates the correction only, exactly like the reference's
    ring buffer (drivers/_downsampling.py:128-189).  This costs one extra
    (name, slot)-keyed exchange before the first stage's aggregation;
    pass ``dedup_slots=False`` only when the feed guarantees at most one
    point per slot (e.g. a deterministic batch recompute from a deduped
    store), which restores the single-shuffle plan.
    """
    out: dict[str, DataFrame] = {}
    stage0 = next((s for s in stages if s.stage0), None)
    if dedup_slots and stage0 is not None:
        points0 = normalize_stage0(points0, stage0, arrival_col)
    enriched = with_aggregator(points0, catalog)
    prev: DataFrame | None = None
    for st in stages:
        if st.stage0:
            continue
        if prev is None:
            cur = downsample_stage0(enriched, st)
        else:
            cur = rollup_partials(prev, st)
        out[st.as_string()] = cur
        prev = cur
    return out


def rollup_generic_partials(stage_df: DataFrame, target: Stage) -> DataFrame:
    """Merge aggregator-AGNOSTIC partials into a coarser stage — the
    streaming-shape twin of :func:`rollup_partials`.

    Input/output: name, ts, sum, count, min, max, last (the
    ``streaming/ingest.generic_partials`` schema, which defers the
    aggregator choice to read time).  Merge algebra per Aggregator.merge
    (metric.py:218-261): sums/counts add, extrema keep, ``last`` follows
    the newest fine bucket — the struct-max trick keeps it a plain
    streaming-safe aggregate.
    """
    newest = F.max(F.struct(F.col("ts"), F.col("last")))
    return (
        stage_df.groupBy(
            "name", bucket_col(F.col("ts"), target.precision).alias("ts")
        )
        .agg(
            F.sum("sum").alias("sum"),
            F.sum("count").alias("count"),
            F.min("min").alias("min"),
            F.max("max").alias("max"),
            newest.getField("last").alias("last"),
        )
    )
