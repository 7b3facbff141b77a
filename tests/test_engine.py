"""End-to-end slice tests: events -> catalog/points -> downsample -> find ->
fetch -> dense read, cross-checked against DuckDB as an independent oracle."""

import math

import pytest
from pyspark.sql import functions as F

from biggraphite_spark.engine import Engine
from biggraphite_spark.model import Stage
from biggraphite_spark.sources.events import (
    NOW,
    RETENTION,
    load_catalog,
    load_stage0,
)


@pytest.fixture(scope="module")
def engine(spark, sf_dir):
    catalog = load_catalog(spark, sf_dir).cache()
    points0 = load_stage0(spark, sf_dir).cache()
    return Engine(catalog, points0, RETENTION, NOW)


def test_catalog_matches_oracle(engine, duck):
    spark_names = {r["name"] for r in engine.catalog.select("name").collect()}
    duck_names = {
        r[0]
        for r in duck.execute(
            "SELECT DISTINCT concat('bg.', event_type, '.u', CAST(user_id AS VARCHAR)) FROM events"
        ).fetchall()
    }
    assert spark_names == duck_names
    row = engine.catalog.filter(F.col("name") == sorted(spark_names)[0]).first()
    assert row["depth"] == 2 and row["p0"] == "bg" and row["parent"].startswith("bg.")


def test_find_glob_against_oracle(engine, duck):
    got = [r["name"] for r in engine.find("bg.click.u*").select("name").collect()]
    exp = sorted(
        r[0]
        for r in duck.execute(
            "SELECT DISTINCT concat('bg.', event_type, '.u', CAST(user_id AS VARCHAR)) AS n "
            "FROM events WHERE event_type = 'click'"
        ).fetchall()
    )
    assert got == exp
    # char-class + enum globs
    one = [r["name"] for r in engine.find("bg.{click,view}.u1").select("name").collect()]
    assert set(one) <= {"bg.click.u1", "bg.view.u1"}


def test_downsample_avg_matches_oracle(engine, duck):
    stage1 = Stage.from_string("1000*3600s")
    df = engine.stage_tables[stage1.as_string()]
    # pick an 'average' metric (user_id % 5 == 0)
    got = (
        df.filter(F.col("name") == "bg.click.u0")
        .orderBy("ts")
        .select("ts", "value", "count")
        .collect()
    )
    exp = duck.execute(
        """
        SELECT ((epoch_ns(ts) // 1000000000) // 3600) * 3600 AS b,
               sum(value), count(value)
        FROM events WHERE event_type='click' AND user_id=0
        GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    assert [(r["ts"], pytest.approx(r["value"]), r["count"]) for r in got] == [
        (b, pytest.approx(v), c) for b, v, c in exp
    ]


def test_cascaded_stage_counts_consistent(engine):
    """stage2 (1d) partial counts must sum to the same raw point totals as
    stage1 (1h) — the (sum,count) merge identity (metric.py:218-261)."""
    s1 = engine.stage_tables["1000*3600s"].agg(F.sum("count")).first()[0]
    s2 = engine.stage_tables["100*86400s"].agg(F.sum("count")).first()[0]
    raw = engine.points0.count()
    assert s1 == s2 == raw


def test_fetch_average_final_value(engine, duck):
    """Read-time final aggregation: average = sum/count over 1h partials
    regrouped to 1d buckets."""
    stage2 = Stage.from_string("100*86400s")
    metrics = engine.find("bg.click.u0")
    from biggraphite_spark.operators.fetch import fetch_points

    df = fetch_points(
        engine.stage_tables["1000*3600s"], metrics, 1704067200, 1704067200 + 5 * 86400,
        target=stage2,
    )
    got = {r["ts"]: r["value"] for r in df.collect()}
    exp = dict(
        duck.execute(
            """
            SELECT ((epoch_ns(ts) // 1000000000) // 86400) * 86400 AS b,
                   sum(value) / count(value)
            FROM events WHERE event_type='click' AND user_id=0
              AND (epoch_ns(ts) // 1000000000) >= 1704067200
              AND (epoch_ns(ts) // 1000000000) < 1704067200 + 5*86400
            GROUP BY 1
            """
        ).fetchall()
    )
    assert got.keys() == exp.keys()
    for k in exp:
        assert got[k] == pytest.approx(exp[k])


def test_last_aggregator_newest_wins(engine, duck):
    """'last' metrics (user_id % 5 == 4) store the newest value per bucket."""
    df = engine.stage_tables["1000*3600s"]
    sample = df.filter(F.col("aggregator") == "last").orderBy("name", "ts").limit(5).collect()
    assert sample, "no last-aggregator metrics in fixture"
    for r in sample:
        name = r["name"]
        etype, uid = name.split(".")[1], int(name.split(".")[2][1:])
        exp = duck.execute(
            """
            SELECT value FROM events
            WHERE event_type=? AND user_id=?
              AND (epoch_ns(ts) // 1000000000) >= ? AND (epoch_ns(ts) // 1000000000) < ? + 3600
            ORDER BY ts DESC LIMIT 1
            """,
            [etype, uid, r["ts"], r["ts"]],
        ).fetchone()[0]
        assert r["value"] == pytest.approx(exp)


def test_read_dense_grid(engine):
    res = engine.read("bg.click.u0", NOW - 40 * 86400, NOW)
    n_buckets = (res.end - res.start) // res.step
    assert res.step in (3600, 86400)
    rows = res.series.count()
    assert rows == n_buckets  # one metric, fully dense
    non_null = res.series.filter(F.col("value").isNotNull()).count()
    assert 0 < non_null < rows  # holes exist and are preserved


def test_align_window_selects_coarser_stage(engine):
    # a window starting beyond stage0's horizon must fall to a coarser stage
    _, _, stage = RETENTION.align_time_window(NOW - 40 * 86400, NOW, NOW)
    assert stage.as_string() == "1000*3600s"


def test_read_on_sampled_touch(spark, sf_dir):
    """The fetch path refreshes read_on on the reference's deterministic
    modulo counter (drivers/cassandra.py:303,1921-1935: rate 0.1 -> every
    10th call), for exactly the metrics the fetch matched; clean's expiry
    cutoff keeps reading updated_on only (drivers/cassandra.py:3219-3224),
    so reads never resurrect a write-cold metric."""
    from biggraphite_spark.operators.maintenance import expired_metrics

    catalog = load_catalog(spark, sf_dir).cache()
    points0 = load_stage0(spark, sf_dir).cache()
    eng = Engine(catalog, points0, RETENTION, NOW)

    def read_ons():
        return {
            r["name"]: r["read_on"]
            for r in eng.catalog.select("name", "read_on").collect()
        }

    assert set(read_ons().values()) == {None}
    eng.fetch("bg.click.u*", NOW - 86400, NOW)  # call 0: touches
    after = read_ons()
    touched = {n for n, v in after.items() if v == NOW}
    expected = {r["name"] for r in eng.find("bg.click.u*").collect()}
    assert touched == expected and expected
    # calls 1..9 skip (counter modulo), call 10 touches again
    for _ in range(9):
        eng.fetch("bg.purchase.u*", NOW - 86400, NOW)
    assert {n for n, v in read_ons().items() if v == NOW} == expected
    eng.fetch("bg.purchase.u*", NOW - 86400, NOW)
    purchases = {r["name"] for r in eng.find("bg.purchase.u*").collect()}
    assert {n for n, v in read_ons().items() if v == NOW} == expected | purchases
    # expiry stays on updated_on: read-touched metrics expire all the same
    exp = {
        r["name"]
        for r in expired_metrics(eng.catalog, NOW + 1).select("name").collect()
    }
    assert expected <= exp
    # rate 0 disables
    eng2 = Engine(catalog, points0, RETENTION, NOW)
    eng2.read_on_sampling_rate = 0
    eng2.fetch("bg.click.u*", NOW - 86400, NOW)
    assert eng2.catalog is catalog
