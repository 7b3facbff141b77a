"""Prometheus/OpenMetrics exposition parsing -> graphite point shape."""

import math

from pyspark.sql import functions as F

from biggraphite_spark.sources.openmetrics import parse_exposition, to_graphite_points

LINES = [
    "# HELP http_requests_total The total number of HTTP requests.",
    "# TYPE http_requests_total counter",
    'http_requests_total{method="post",code="200"} 1027 1395066363000',
    'http_requests_total{method="get", code="200"} 10 1395066363000',
    "process_start_time_seconds 42.5 1395066363000",
    "no_timestamp_metric 7",
    'escaped{path="a\\"b\\\\c\\nd"} 1 1000',
    "go_gc_duration_seconds_sum NaN 1000",
    "infinite_metric +Inf 1000",
    "12bad_name 1 1000",                      # name may not start with a digit
    'unterminated{foo="bar 1 1000',           # malformed labels -> dropped
    "too many fields here 1 2 3",
    "",
]


def _parsed(spark):
    df = spark.createDataFrame([(l,) for l in LINES], "value string")
    return parse_exposition(df)


def test_parse_exposition_fields_and_escapes(spark):
    rows = {(r["name"], tuple(sorted((r["labels"] or {}).items()))): r
            for r in _parsed(spark).collect()}
    # well-formed labeled sample
    k = ("http_requests_total", (("code", "200"), ("method", "post")))
    assert rows[k]["value"] == 1027.0 and rows[k]["ts_ms"] == 1395066363000
    # spaces after commas are tolerated
    assert ("http_requests_total", (("code", "200"), ("method", "get"))) in rows
    # escape sequences decode: \" \\ \n
    esc = rows[("escaped", (("path", 'a"b\\c\nd'),))]
    assert esc["value"] == 1.0
    # optional timestamp
    assert rows[("no_timestamp_metric", ())]["ts_ms"] is None
    # spec scalars: NaN lands as null already at the Arrow boundary
    # (pyarrow from_pandas treats float NaN as missing) — which IS the
    # engine's NaN-sentinel -> null convention, one stage early
    assert rows[("go_gc_duration_seconds_sum", ())]["value"] is None
    assert rows[("infinite_metric", ())]["value"] == math.inf
    # malformed lines dropped, comments skipped
    names = {n for n, _ in rows}
    assert "12bad_name" not in names and "unterminated" not in names
    assert "too" not in names


def test_to_graphite_points_flattening(spark):
    pts = {
        r["name"]: (r["ts"], r["value"])
        for r in to_graphite_points(_parsed(spark), default_ts_s=111).collect()
    }
    # labels sorted by key, flattened into the dotted name; ms -> s
    assert pts["http_requests_total.code.200.method.post"] == (1395066363, 1027.0)
    # label-less metric keeps its bare name
    assert pts["process_start_time_seconds"] == (1395066363, 42.5)
    # missing timestamp takes the provided scrape time
    assert pts["no_timestamp_metric"] == (111, 7.0)
    # NaN becomes null (the engine's NaN-sentinel convention)
    assert pts["go_gc_duration_seconds_sum"][1] is None


def test_exposition_parses_on_a_live_stream(spark, tmp_path):
    """The same parse + flatten runs unchanged on a Structured Streaming
    source (mapInPandas is streaming-capable): scrape lines fed over a
    TCP socket land as windowed partials, malformed lines dropped
    mid-stream — the carbon socket contract, OpenMetrics edition."""
    import socket
    import threading
    import time

    from biggraphite_spark.streaming.ingest import generic_partials
    from biggraphite_spark.model import Stage

    lines = [
        b'http_requests_total{code="200"} 2.5 3600000\n',
        b"# TYPE http_requests_total counter\n",
        b"garbage {{{ line\n",
        b'http_requests_total{code="200"} 1.5 3700000\n',
    ]
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def feed():
        conn, _ = srv.accept()
        with conn:
            for ln in lines:
                conn.sendall(ln)

    threading.Thread(target=feed, daemon=True).start()

    raw = (
        spark.readStream.format("socket")
        .option("host", "127.0.0.1")
        .option("port", port)
        .load()
    )
    pts = to_graphite_points(parse_exposition(raw)).select(
        "name", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    partials = generic_partials(pts, Stage.from_string("1000*3600s"))
    q = (
        partials.writeStream.outputMode("complete")
        .format("memory")
        .queryName("om_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt-om"))
        .start()
    )
    try:
        deadline = 30
        got = {}
        while deadline > 0:
            q.processAllAvailable()
            got = {
                (r["name"], r["ts"]): (r["sum"], r["count"])
                for r in spark.sql("SELECT * FROM om_stream").collect()
            }
            if got:
                break
            time.sleep(0.5)
            deadline -= 1
    finally:
        q.stop()
    srv.close()
    assert got[("http_requests_total.code.200", 3600)] == (4.0, 2)


def test_points_feed_the_ingest_pipeline(spark):
    """The flattened points run straight through the stage0 rollup — the
    same path carbon lines take."""
    from biggraphite_spark.model import Stage
    from biggraphite_spark.operators.downsample import bucket_col

    pts = to_graphite_points(_parsed(spark), default_ts_s=0)
    rolled = (
        pts.groupBy("name", bucket_col(F.col("ts"), Stage.from_string("1000*3600s").precision))
        .agg(F.sum("value").alias("sum"), F.count("value").alias("count"))
    )
    got = {r["name"]: r["count"] for r in rolled.collect()}
    assert got["http_requests_total.code.200.method.post"] == 1
