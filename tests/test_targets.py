"""Render-target expression language: parser shapes, error contract, and
evaluation parity against direct functions/series composition."""

import pytest

from biggraphite_spark.functions.targets import (
    Call,
    Leaf,
    evaluate_target,
    parse_target,
    parse_timespan,
)
from biggraphite_spark.model import InvalidArgumentError


def test_parse_shapes():
    assert parse_target("a.b.c") == Leaf("a.b.c")
    t = parse_target("movingAverage(sumSeries(bg.{click,view}.u*), 4)")
    assert t.func == "movingAverage" and t.args[1] == 4
    inner = t.args[0]
    assert inner.func == "sumSeries" and inner.args[0] == Leaf("bg.{click,view}.u*")
    assert inner.text == "sumSeries(bg.{click,view}.u*)"
    t = parse_target("summarize(x.y, '2d', \"max\")")
    assert t.args[1:] == ("2d", "max")
    assert parse_target("scale(a.b, 0.5)").args[1] == 0.5
    assert parse_target("offset(a.b, -3)").args[1] == -3


def test_parse_errors():
    for bad in ["", "f(", "a.b)", "f(a.b,)", "f('unterminated)",
                "a.{b", "sumSeries(a.b) extra"]:
        with pytest.raises(InvalidArgumentError):
            parse_target(bad)


def test_parse_timespan():
    assert parse_timespan("90s") == 90
    assert parse_timespan("5min") == 300
    assert parse_timespan("2d") == 2 * 86400
    with pytest.raises(InvalidArgumentError):
        parse_timespan("2fortnights")


def test_evaluate_matches_direct_composition(spark):
    from pyspark.sql import functions as F

    from biggraphite_spark.functions.series import combine, moving

    rows = [("a", t * 60, float(t)) for t in range(8)] + [
        ("b", t * 60, 1.0) for t in range(8)
    ]
    df = spark.createDataFrame(rows, ["name", "ts", "value"])
    node = parse_target("movingAverage(sumSeries(x.*), 3)")
    got = evaluate_target(node, fetch=lambda g: df, step=60).orderBy("ts").collect()
    want = (
        moving(combine(df, "sum", name="sumSeries(x.*)"), 3)
        .orderBy("ts")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert got[0]["name"] == "sumSeries(x.*)"


def test_evaluate_rejects_scalar_only_and_unknown(spark):
    df = None
    with pytest.raises(InvalidArgumentError):
        evaluate_target(parse_target("noSuchFunc(a.b)"),
                        fetch=lambda g: __import__("pyspark").sql.SparkSession
                        .getActiveSession().createDataFrame(
                            [("a.b", 0, 1.0)], ["name", "ts", "value"]),
                        step=60)


def test_unquoted_string_arg_in_scalar_position_is_400(spark):
    """summarize(x, 1h): the unquoted 1h parses as a glob Leaf and fetches a
    DataFrame — scalar argument positions must raise the 400-contract error,
    not a str(DataFrame)/TypeError surprise (ADVICE r3)."""
    df = spark.createDataFrame([("x", 0, 1.0)], ["name", "ts", "value"])
    for target in ["summarize(x, 1h)", "scale(x, y.z)", "movingAverage(x, w)"]:
        with pytest.raises(InvalidArgumentError):
            evaluate_target(parse_target(target), fetch=lambda g: df, step=60)


def test_round4_verbs_match_direct_composition(spark):
    from biggraphite_spark.functions import series as S

    rows = [("a.x", t * 60, float(t)) for t in range(6)] + [
        ("b.y", t * 60, 10.0 - t) for t in range(6)
    ]
    df = spark.createDataFrame(rows, ["name", "ts", "value"])
    fetch = lambda g: df  # noqa: E731

    def run(target):
        return sorted(
            tuple(r)
            for r in evaluate_target(
                parse_target(target), fetch=fetch, step=60
            ).collect()
        )

    assert run("sortByTotal(x.*)") == sorted(
        tuple(r)
        for r in S.sort_by_total(df).select("name", "ts", "value").collect()
    )
    assert run("highestCurrent(x.*, 1)") == sorted(
        tuple(r)
        for r in S.highest_current(df, 1).select("name", "ts", "value").collect()
    )
    # highestCurrent(1) keeps b.y: last values are a.x=5, b.y=5 — name
    # tie-break keeps a.x
    kept = {t[0] for t in run("highestCurrent(x.*, 1)")}
    assert kept == {"a.x"}
    assert run("integralByInterval(x.*, '2min')") == sorted(
        tuple(r) for r in S.integral_by_interval(df, 120).collect()
    )
    assert run("aggregateLine(x.*, 'max')") == sorted(
        tuple(r) for r in S.aggregate_line(df, "max").collect()
    )
    # group() unions its series arguments
    assert len(run("group(x.*, x.*)")) == 2 * df.count()


def test_alias_by_metric_and_negative_nodes(spark):
    df = spark.createDataFrame(
        [("root.mid.leaf", 0, 1.0)], ["name", "ts", "value"]
    )
    out = evaluate_target(
        parse_target("aliasByMetric(x.*)"), fetch=lambda g: df, step=60
    ).collect()
    assert out[0]["alias"] == "leaf"


def test_reduce_ema_wildcard_verbs(spark):
    from biggraphite_spark.functions import series as S
    from biggraphite_spark.functions.holtwinters import exponential_moving_average

    rows = [
        ("app.error.m", t * 60, float(t)) for t in range(6)
    ] + [("app.purchase.m", t * 60, 2.0 * t + 1) for t in range(6)]
    df = spark.createDataFrame(rows, ["name", "ts", "value"])
    fetch = lambda g: df  # noqa: E731

    def run(target):
        return sorted(
            tuple(r)
            for r in evaluate_target(
                parse_target(target), fetch=fetch, step=60
            ).collect()
        )

    assert run("reduceSeries(x.*, 'asPercent', 1, 'error', 'purchase')") == sorted(
        tuple(r)
        for r in S.reduce_series(df, "asPercent", 1, "error", "purchase").collect()
    )
    # standalone mapSeries renders as the flattened input series (graphite's
    # json renderer flattens the grouped list-of-lists right back)
    assert run("mapSeries(x.*, 0, 2)") == sorted(tuple(r) for r in df.collect())
    with pytest.raises(InvalidArgumentError):
        run("reduceSeries(x.*, 'noSuchReducer', 1, 'a', 'b')")
    assert run("exponentialMovingAverage(x.*, 3)") == sorted(
        tuple(r) for r in exponential_moving_average(df, 3).collect()
    )
    assert run("sumSeriesWithWildcards(x.*, 1)") == sorted(
        tuple(r)
        for r in S.combine_series_with_wildcards(df, "sum", 1).collect()
    )


def test_holt_winters_verbs(spark):
    from biggraphite_spark.functions.holtwinters import holt_winters

    rows = [("m", t * 60, float(t % 5)) for t in range(30)]
    df = spark.createDataFrame(rows, ["name", "ts", "value"])
    direct = holt_winters(df, 60)
    fc = evaluate_target(
        parse_target("holtWintersForecast(x.*)"), fetch=lambda g: df, step=60
    )
    got = {r["ts"]: r["value"] for r in fc.collect()}
    want = {r["ts"]: r["forecast"] for r in direct.collect()}
    assert got == want
    assert fc.first()["name"] == "holtWintersForecast(m)"

    bands = evaluate_target(
        parse_target("holtWintersConfidenceBands(x.*)"),
        fetch=lambda g: df, step=60,
    )
    names = {r["name"] for r in bands.select("name").distinct().collect()}
    assert names == {
        "holtWintersConfidenceUpper(m)",
        "holtWintersConfidenceLower(m)",
    }


def test_two_series_and_filter_verbs(spark):
    from biggraphite_spark.functions.series import divide_series, maximum_above

    rows = [("e", t * 60, 2.0) for t in range(4)] + [
        ("p", t * 60, 4.0) for t in range(4)
    ]
    df = spark.createDataFrame(rows, ["name", "ts", "value"])
    e = df.filter("name = 'e'")
    p = df.filter("name = 'p'")

    def fetch(glob):
        return {"e.*": e, "p.*": p}[glob]

    got = evaluate_target(
        parse_target("divideSeries(sumSeries(e.*), sumSeries(p.*))"),
        fetch=fetch, step=60,
    ).orderBy("ts").collect()
    assert [r["value"] for r in got] == [0.5] * 4

    got = evaluate_target(
        parse_target("maximumAbove(p.*, 3)"), fetch=fetch, step=60
    ).collect()
    assert {r["name"] for r in got} == {"p"}
    got = evaluate_target(
        parse_target("maximumAbove(e.*, 3)"), fetch=fetch, step=60
    ).collect()
    assert got == []


def test_alias_and_round_and_smart_summarize(spark):
    rows = [("a.b", 60 + t * 60, 1.5 + t) for t in range(6)]
    df = spark.createDataFrame(rows, ["name", "ts", "value"])

    got = evaluate_target(parse_target("alias(a.b, 'renamed')"),
                          fetch=lambda g: df, step=60).collect()
    assert {r["name"] for r in got} == {"renamed"}

    got = evaluate_target(parse_target("round(a.b)"),
                          fetch=lambda g: df, step=60).orderBy("ts").collect()
    # Spark round() is HALF_UP: 1.5->2, 2.5->3, ...
    assert [r["value"] for r in got] == [2.0, 3.0, 4.0, 5.0, 6.0, 7.0]

    # smartSummarize aligns buckets to the window start, not epoch 0
    got = evaluate_target(parse_target("smartSummarize(a.b, '2min', 'sum')"),
                          fetch=lambda g: df, step=60, start=60)
    ts = sorted(r["ts"] for r in got.collect())
    assert ts[0] == 60 and all(b - a == 120 for a, b in zip(ts, ts[1:]))


def test_multi_series_verbs(spark):
    rows = [("e.a", t * 60, 2.0) for t in range(4)] + [
        ("e.b", t * 60, 6.0) for t in range(4)
    ]
    df = spark.createDataFrame(rows, ["name", "ts", "value"])

    got = evaluate_target(parse_target("countSeries(e.*)"),
                          fetch=lambda g: df, step=60).collect()
    assert {r["value"] for r in got} == {2.0}
    assert {r["name"] for r in got} == {"countSeries(e.*)"}

    got = evaluate_target(parse_target("rangeOfSeries(e.*)"),
                          fetch=lambda g: df, step=60).collect()
    assert {r["value"] for r in got} == {4.0}

    got = evaluate_target(
        parse_target("weightedAverage(e.*, e.*, 1)"),
        fetch=lambda g: df, step=60,
    ).orderBy("ts").collect()
    # weights == values: weighted avg = (2*2 + 6*6)/(2+6) = 5.0
    assert [r["value"] for r in got] == [5.0] * 4
