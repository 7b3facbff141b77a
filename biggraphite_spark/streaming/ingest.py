"""Structured Streaming ingest: the carbon write path as a streaming job.

Reference semantics mapped (SURVEY §2.9):
- T1 tumbling per-stage windows  -> ``groupBy(window(ts, precision))``
- T2 out-of-order tolerance 15min -> ``withWatermark("ts", "15 minutes")``
  (drivers/cassandra.py:638-640)
- T3 re-emitted buckets           -> update-mode aggregation; the sink
  upserts re-emitted (name, bucket) partials (foreachBatch + PointStore
  append/overwrite; Delta MERGE on a real lakehouse)
- T4 state TTL                    -> watermark-driven state eviction
- T5 slow-stage coalescing        -> trigger interval per stage

The streaming aggregate stores *generic partials* — (sum, count, min, max,
newest (ts,value)) — rather than per-aggregator values: every aggregator's
final value is derivable at read time, streaming state stays
aggregator-agnostic, and `max_by`-style ordering comes from max-of-struct
(structs order by leading field), which streaming supports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import OUT_OF_ORDER_S, Stage


def generic_partials(points_stream: DataFrame, stage: Stage,
                     watermark_s: int = OUT_OF_ORDER_S) -> DataFrame:
    """Streaming windowed rollup to aggregator-agnostic partials.

    ``points_stream`` must carry (name, ts timestamp, value double).
    Output: name, ts (bucket start, unix s), sum, count, min, max, last.
    """
    wm = points_stream.withWatermark("ts", f"{watermark_s} seconds")
    win = F.window("ts", f"{stage.precision} seconds")
    agg = (
        wm.groupBy(win.alias("w"), "name")
        .agg(
            F.sum("value").alias("sum"),
            F.count("value").alias("count"),
            F.min("value").alias("min"),
            F.max("value").alias("max"),
            # newest (ts, value): structs compare by leading field, so plain
            # max() is a streaming-safe max_by(value, ts)
            F.max(F.struct(F.col("ts"), F.col("value"))).alias("newest"),
        )
    )
    return agg.select(
        "name",
        F.unix_timestamp(F.col("w.start")).alias("ts"),
        "sum",
        "count",
        "min",
        "max",
        F.col("newest.value").alias("last"),
    )


def finalize_partials(partials: DataFrame, aggregator_col: F.Column) -> F.Column:
    """Read-time final value from generic partials, per the metric's
    aggregator (same identities as functions/aggregators.py)."""
    return (
        F.when(aggregator_col == "average", F.col("sum") / F.col("count"))
        .when(aggregator_col == "total", F.col("sum"))
        .when(aggregator_col == "minimum", F.col("min"))
        .when(aggregator_col == "maximum", F.col("max"))
        .otherwise(F.col("last"))
    )


def fan_out_sink(*writers):
    """MultiDatabase-style fan-out (SURVEY §2.7 U4, plugins/carbon.py:372-456:
    the whisper+biggraphite double-write): one foreachBatch callback that
    hands each micro-batch to every registered writer.  The batch DataFrame
    is persisted across writers so the upstream aggregation runs once."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.persist()
        try:
            for w in writers:
                w(batch_df, epoch_id)
        finally:
            batch_df.unpersist()

    return sink


def stream_events_to_store(points_stream: DataFrame, stage: Stage, store,
                           checkpoint_dir: str, trigger_seconds: int | None = None):
    """Wire the rollup to a PointStore sink via foreachBatch (exactly-once by
    checkpoint + idempotent partition overwrite)."""
    partials = generic_partials(points_stream, stage)

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        store.write(batch_df, stage, mode="append")

    writer = (
        partials.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
