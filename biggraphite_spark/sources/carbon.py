"""Carbon plaintext line-protocol source: ``<name> <value> <timestamp>``.

The reference ingests this via its carbon plugin (plugins/carbon.py:178-230);
here it's a DataFrame transform usable on any text source (files,
socket/Kafka readStream) — SURVEY §2.1 S5.

Semantics kept:
- malformed lines are rejected, not fatal (carbon drops bad lines);
- names are sanitized (empty components stripped, metric.py:181-194);
- ``create-on-miss``: new names are discovered with a left-anti join against
  the catalog (the reference's rate-limited creation queue collapses to a
  batch anti-join, SURVEY §3.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.names import sanitize_name_col

#: ^name value ts$ with arbitrary spacing; value/ts validated numerically
_LINE_RE = r"^\s*(\S+)\s+(\S+)\s+(\d+)\s*$"


def parse_lines(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """Parse a text DataFrame (one line per row) into (name, ts, value).

    Invalid lines (wrong field count, non-numeric value/ts) are dropped.
    """
    src = F.col(line_col)
    parsed = lines.select(
        F.regexp_extract(src, _LINE_RE, 1).alias("raw_name"),
        F.regexp_extract(src, _LINE_RE, 2).alias("raw_value"),
        F.regexp_extract(src, _LINE_RE, 3).alias("raw_ts"),
    )
    return (
        parsed.filter(F.col("raw_name") != "")
        .select(
            sanitize_name_col(F.col("raw_name")).alias("name"),
            # try_cast: ANSI mode makes plain cast throw on malformed lines,
            # which must be dropped, not fatal
            F.col("raw_ts").try_cast("long").alias("ts"),
            F.col("raw_value").try_cast("double").alias("value"),
        )
        .filter(F.col("value").isNotNull() & F.col("ts").isNotNull() & (F.col("name") != ""))
    )


def new_metrics(points: DataFrame, catalog: DataFrame) -> DataFrame:
    """Names present in the batch but absent from the catalog — the
    create-on-miss set (plugins/carbon.py:310-369 as one anti-join)."""
    return points.select("name").distinct().join(catalog.select("name"), "name", "left_anti")


def carbon_socket_stream(spark, host: str, port: int) -> DataFrame:
    """Streaming carbon ingest over a TCP socket — the transport the
    reference's carbon plugin actually listens on (plaintext line
    protocol, one metric per line).

    Structured Streaming's socket source delivers one line per row; the
    same :func:`parse_lines` transform then applies, so file, Kafka and
    socket transports share one parser.  The stream carries ``ts`` as a
    timestamp so it can feed ``streaming.ingest.generic_partials``
    (watermarks need an event-time column) directly.
    """
    lines = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    pts = parse_lines(lines)
    return pts.select(
        "name", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
