"""End-to-end streaming freshness: late ingest -> T3 upsert -> rollup ->
render visibility, in one test.

A micro-batch arriving 14 minutes late (inside the reference's 15-minute
out-of-order tolerance, model.OUT_OF_ORDER_S / drivers/cassandra.py:640)
must: re-emit its (name, bucket) from the streaming rollup state (T2/T3),
win the epoch LWW resolution in the PointStore, refresh the coarse rollup
day in place (incremental view maintenance), and show up in a render-path
read — the full ingest-to-render freshness contract.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from biggraphite_spark.model import Retention, Stage
from biggraphite_spark.storage import PointStore

STAGE1 = Stage.from_string("1000*3600s")
COARSE = Stage.from_string("100*86400s")
LATE_BY_S = 840  # 14 min: late, but inside the 15-min watermark
LATE_VALUE = 1000.0


def _partials_stream(spark, indir):
    from biggraphite_spark.sources.events import (
        event_ts_timestamp,
        load_events,
        metric_name_col,
    )
    from biggraphite_spark.streaming.ingest import generic_partials

    schema = load_events(spark, "/root/testdata/sf0.001").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(indir)
    )
    pts = stream.select(
        metric_name_col().alias("name"),
        event_ts_timestamp(stream).alias("ts"),
        "value",
    )
    return generic_partials(pts, STAGE1)


def test_late_batch_upserts_rollup_and_renders(spark, tmp_path):
    from biggraphite_spark.engine import Engine
    from biggraphite_spark.sources.events import (
        event_ts_seconds,
        load_events,
        metric_catalog,
    )
    from biggraphite_spark.streaming.ingest import (
        fan_out_sink,
        finalize_partials,
        latest_partials,
        rollup_maintenance_sink,
    )
    from biggraphite_spark.web import GraphiteWeb

    indir = str(tmp_path / "in")
    os.makedirs(indir)
    shutil.copy("/root/testdata/sf0.001/events.parquet",
                os.path.join(indir, "events.parquet"))
    store = PointStore(str(tmp_path / "store"))

    ev = load_events(spark, "/root/testdata/sf0.001")
    # target = the newest event's metric: its bucket is the freshest one,
    # so a point LATE_BY_S behind the stream max is within the watermark
    newest = ev.orderBy(F.desc("ts")).limit(1).cache()
    target_row = newest.select(
        F.concat(F.lit("bg."), "event_type", F.lit(".u"),
                 F.col("user_id").cast("string")).alias("name"),
        event_ts_seconds(newest).alias("sec"),
    ).collect()[0]
    name, t_max = target_row["name"], target_row["sec"]
    late_sec = t_max - LATE_BY_S
    bucket = (late_sec // 3600) * 3600

    def append0(batch_df, epoch_id):
        store.write(batch_df.withColumn("epoch", F.lit(epoch_id)), STAGE1,
                    mode="append")

    q = (
        _partials_stream(spark, indir)
        .writeStream.outputMode("update")
        .foreachBatch(
            fan_out_sink(append0,
                         rollup_maintenance_sink(store, STAGE1, [COARSE]))
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()

        def snap():
            fine = {
                (r["name"], r["ts"]): (r["sum"], r["count"])
                for r in latest_partials(store, spark, STAGE1)
                .filter((F.col("name") == name) & (F.col("ts") == bucket))
                .collect()
            }
            day = (bucket // 86400) * 86400
            coarse = {
                r["ts"]: r["sum"]
                for r in store.read(spark, COARSE)
                .filter((F.col("name") == name) & (F.col("ts") == day))
                .collect()
            }
            return fine, coarse, day

        fine0, coarse0, day = snap()
        s0, c0 = fine0[(name, bucket)]
        assert coarse0, "coarse rollup must exist after the first batch"

        # the 14-minute-late micro-batch: same metric, LATE_BY_S behind the
        # stream's max event time, a value big enough to see everywhere
        if dict(ev.dtypes)["ts"] in ("bigint", "long"):
            shifted = F.col("ts") - F.lit(LATE_BY_S * 10**9)
        else:
            shifted = F.col("ts") - F.expr(f"INTERVAL {LATE_BY_S} SECONDS")
        late = newest.withColumn("ts", shifted).withColumn(
            "value", F.lit(LATE_VALUE)
        )
        late.coalesce(1).write.mode("append").parquet(indir)
        q.processAllAvailable()

        fine1, coarse1, _ = snap()
        s1, c1 = fine1[(name, bucket)]
        # T3: the bucket was re-emitted and the newest epoch wins with the
        # late point folded in
        assert c1 == c0 + 1
        assert s1 == pytest.approx(s0 + LATE_VALUE)
        # incremental coarse maintenance saw it too, with no read-time fold
        assert coarse1[day] == pytest.approx(coarse0[day] + LATE_VALUE)
    finally:
        q.stop()

    # render visibility: an engine whose 1h stage reads the streaming store
    # serves the late data through the graphite render path
    catalog = metric_catalog(ev)
    # a retention whose FIRST stage is the streamed 3600s stage: the engine
    # reads points0 for it (raw path), so hand it the finalized store as
    # (name, ts, value) points — each 3600s bucket re-aggregates a single
    # already-final point, an identity under every aggregator
    stage1_pts = (
        latest_partials(store, spark, STAGE1)
        .drop("pday")
        .join(catalog.select("name", "aggregator"), "name")
        .select(
            "name", "ts",
            finalize_partials(None, F.col("aggregator")).alias("value"),
        )
    )
    ret = Retention.from_string("1000*3600s:100*86400s")
    eng = Engine(catalog, stage1_pts, ret, now=t_max, stage_tables={})
    out = GraphiteWeb(eng).render([name], bucket, bucket + 3600)
    pts = {ts: v for v, ts in out[0]["datapoints"]}
    assert bucket in pts and pts[bucket] is not None
    # the rendered bucket equals the aggregator-finalized upserted partial
    agg = catalog.filter(F.col("name") == name).collect()[0]["aggregator"]
    expect = {
        "average": s1 / c1,
        "total": s1,
    }.get(agg)
    if expect is not None:
        assert pts[bucket] == pytest.approx(expect)
