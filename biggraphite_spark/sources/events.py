"""events -> time-series derivation: stage0 points + metric catalog.

The driver's ``events`` table stands in for the carbon point stream
(FIXTURES.md §5).  The mapping is fixed and deterministic so the DuckDB
oracle can reproduce it verbatim:

- metric name:  ``bg.<event_type>.u<user_id>``
- point:        (name, ts as unix seconds, value)
- aggregator:   cycled through the 5 functions by ``user_id % 5``
  (FIXTURES.md §5: "a per-name aggregator cycled through all 5")
- retention:    31d @ 1s : 1000h @ 1h : 100d @ 1d — chosen so the 30-day
  event span sits inside stage0 and both coarser stages produce non-trivial
  rollups
- ``now``:      2024-02-01 00:00:00 UTC, exactly 31 days after the first
  event — a fixed reference point so stage selection is deterministic.

Oracle-parity contract: any change here must be mirrored in the SQL
fragments below (ORACLE_*), which the correctness harness embeds in its
DuckDB queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.names import with_name_structure
from ..model import DEFAULT_XFILESFACTOR, Retention

#: deterministic "wall clock" for stage selection / alignment
NOW = 1706745600  # 2024-02-01 00:00:00 UTC

#: 31d@1s : ~41.7d@1h : 100d@1d (durations strictly increase; precisions multiply)
RETENTION_STR = "2678400*1s:1000*3600s:100*86400s"
RETENTION = Retention.from_string(RETENTION_STR)

AGG_CYCLE = ("average", "total", "minimum", "maximum", "last")

# -- DuckDB-SQL fragments the oracle embeds (keep in lockstep with the
#    Column expressions below) ------------------------------------------------
ORACLE_NAME = "concat('bg.', event_type, '.u', CAST(user_id AS VARCHAR))"
# integer ns -> s (exact; floor(epoch()) would go through a double)
ORACLE_TS = "(epoch_ns(ts) // 1000000000)"
ORACLE_AGG = (
    "CASE user_id % 5 WHEN 0 THEN 'average' WHEN 1 THEN 'total' "
    "WHEN 2 THEN 'minimum' WHEN 3 THEN 'maximum' ELSE 'last' END"
)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read events.parquet, tolerating its TIMESTAMP(NANOS) physical type.

    What ``ts`` lands as is version-dependent: Spark 4.1.2 ignores the
    ``nanosAsLong`` legacy conf entirely and reads nano parquet as
    TIMESTAMP_NTZ (micro-truncated — lossless for this data, every stamp is
    whole micros); older readers honor the conf and yield int64 nanos.  We
    still set the conf defensively, but NO consumer may assume a dtype:
    always go through the ``event_ts_*`` dispatchers below.
    """
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # NOTE: deliberately NOT repartitioned (unlike testdata.load_parallel for
    # documents/embeddings): the events derivations are plain columnar
    # aggregations whose single-split partial agg is cheaper than an extra
    # exchange in every downstream plan; the heavy-per-row tables are the
    # ones that need the fan-out.
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def event_ts_seconds(events: DataFrame) -> F.Column:
    """Event time as unix seconds, whatever physical type ``ts`` landed as.

    Integer ``div`` (not ``/``) — double division on int64 nanos would lose
    precision past 2^53.
    """
    if dict(events.dtypes)["ts"] in ("bigint", "long"):
        return F.expr("ts div 1000000000")
    return F.unix_timestamp("ts")


def event_ts_nanos(events: DataFrame) -> F.Column:
    """Event time as int64 unix NANOseconds, whatever type ``ts`` landed as.

    Parity contract with the DuckDB oracle's ``epoch_ns(ts)``: the driver's
    parquet stamps are whole microseconds (verified: ``epoch_ns % 1000 == 0``
    for every row), so the TIMESTAMP_NTZ branch (micros * 1000) reconstructs
    the oracle's value exactly; nothing is lost to the NTZ read's
    micro-truncation.  The cast to ``timestamp`` is identity under the UTC
    session timezone every query pins (``_utc``).
    """
    if dict(events.dtypes)["ts"] in ("bigint", "long"):
        return F.col("ts")
    return F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000)


def event_ts_timestamp(events: DataFrame) -> F.Column:
    """Event time as a (session-tz) TIMESTAMP for streaming windows/watermarks.

    Structured Streaming's file source resolves the nano parquet to
    TIMESTAMP_NTZ regardless of any legacy conf, while a hypothetical int64
    feed needs the div-and-cast; dispatching here keeps callers (tests, the
    streaming ingest examples) independent of which physical type the source
    yields.
    """
    if dict(events.dtypes)["ts"] in ("bigint", "long"):
        return F.expr("ts div 1000000000").cast("timestamp")
    return F.col("ts").cast("timestamp")


def metric_name_col() -> F.Column:
    return F.concat(
        F.lit("bg."), F.col("event_type"), F.lit(".u"), F.col("user_id").cast("string")
    )


def aggregator_col() -> F.Column:
    c = F.col("user_id") % 5
    expr = F.when(c == 0, AGG_CYCLE[0])
    for i in range(1, 4):
        expr = expr.when(c == i, AGG_CYCLE[i])
    return expr.otherwise(AGG_CYCLE[4])


def stage0_points(events: DataFrame) -> DataFrame:
    """Raw points: (name, ts unix-seconds, value), NaN normalized to null.

    Reference point shape: accessor.py:273-297.  ``nanvl``-style
    normalization implements the NaN-sentinel -> null mapping of SURVEY §1.5
    so every downstream aggregate can rely on null-skipping built-ins.
    """
    return events.select(
        metric_name_col().alias("name"),
        event_ts_seconds(events).alias("ts"),
        F.when(F.isnan("value"), None).otherwise(F.col("value")).alias("value"),
    )


def metric_catalog(events: DataFrame, n_components: int = 4) -> DataFrame:
    """Derive the metrics-catalog DataFrame from the event stream.

    One row per distinct metric with metadata + name-structure columns
    (FIXTURES.md §1).  Lifecycle timestamps come from the stream itself:
    created_on/updated_on = first/last point seen (the reference maintains
    these on create/touch, metric.py:47-72).
    """
    sec = event_ts_seconds(events)
    base = (
        events.groupBy(
            metric_name_col().alias("name"),
            aggregator_col().alias("aggregator"),
        )
        .agg(
            F.min(sec).alias("created_on"),
            F.max(sec).alias("updated_on"),
            F.count("*").alias("point_count"),
        )
        .withColumn("id", F.sha2(F.col("name"), 256))
        .withColumn("retention", F.lit(RETENTION_STR))
        .withColumn("xfilesfactor", F.lit(DEFAULT_XFILESFACTOR))
        .withColumn("read_on", F.lit(None).cast("long"))
    )
    return with_name_structure(base, "name", n_components)


def load_stage0(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stage0_points(load_events(spark, sf_dir))


def load_catalog(spark: SparkSession, sf_dir: str, n_components: int = 4) -> DataFrame:
    return metric_catalog(load_events(spark, sf_dir), n_components)
