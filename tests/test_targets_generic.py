"""Round-6 render-verb expansion: the generic aggregate table (agg_expr),
filter/rank/transform verbs, seriesLists pairing, tag-aware verbs,
zero-series synthetics, and the consolidateBy/xFilesFactor meta channel.

Parity model: graphite-web render/functions.py (public source) — safe*
null semantics, positional list zipping, window-start-aligned synthetics.
"""

import math

import pytest
from pyspark.sql import functions as F

from biggraphite_spark.functions import series as S
from biggraphite_spark.functions.targets import evaluate_target, parse_target
from biggraphite_spark.model import InvalidArgumentError


def _run(df, target, **kw):
    return evaluate_target(parse_target(target), fetch=lambda g: df, step=60, **kw)


def _vals(df, target, **kw):
    return {
        (r["name"], r["ts"]): r["value"] for r in _run(df, target, **kw).collect()
    }


@pytest.fixture(scope="module")
def trio(spark):
    """Three series with distinct stats and one embedded null."""
    rows = (
        [("m.a", t * 60, float(t + 1)) for t in range(4)]  # 1..4
        + [("m.b", t * 60, 10.0) for t in range(4)]
        + [("m.c", 0, 2.0), ("m.c", 120, 6.0)]  # nulls at 60/180 on dense grid
    )
    df = spark.createDataFrame(rows, ["name", "ts", "value"])
    # densify m.c so every series shares the 4-bucket grid
    grid = spark.createDataFrame(
        [("m.c", t * 60) for t in range(4)], ["name", "ts"]
    )
    c = grid.join(df, ["name", "ts"], "left")
    return df.filter("name != 'm.c'").unionByName(c)


# -- agg_expr: the aggregate function table ---------------------------------


def test_agg_expr_table(spark):
    rows = [("s", t, v) for t, v in enumerate([4.0, 1.0, None, 3.0])]
    df = spark.createDataFrame(rows, "name string, ts long, value double")

    def agg(how):
        return df.groupBy("name").agg(
            S.agg_expr(how, order="ts").alias("v")
        ).first()["v"]

    assert agg("sum") == 8.0
    assert agg("total") == 8.0  # alias
    assert agg("average") == pytest.approx(8.0 / 3)
    assert agg("avg_zero") == pytest.approx(8.0 / 4)  # nulls count as 0
    assert agg("median") == 3.0
    assert agg("range") == 3.0
    assert agg("rangeOf") == 3.0  # alias
    assert agg("stddev") == pytest.approx(
        math.sqrt(((4 - 8 / 3) ** 2 + (1 - 8 / 3) ** 2 + (3 - 8 / 3) ** 2) / 3)
    )
    assert agg("count") == 3.0
    assert agg("first") == 4.0
    assert agg("last") == 3.0
    assert agg("current") == 3.0  # alias of last
    # safeDiff: first minus the rest (nulls skipped)
    assert agg("diff") == 4.0 - 1.0 - 3.0
    # safeMul: ANY null constituent nulls the product
    assert agg("multiply") is None
    with pytest.raises(ValueError, match="unknown aggregate"):
        agg("p99")


def test_agg_expr_multiply_no_nulls(spark):
    df = spark.createDataFrame(
        [("s", 0, 2.0), ("s", 1, 3.0), ("s", 2, 4.0)],
        "name string, ts long, value double",
    )
    got = df.groupBy("name").agg(S.agg_expr("multiply").alias("v")).first()["v"]
    assert got == 24.0


def test_summarize_order_sensitive(spark):
    # last within the widened bucket must honor ts order, not shuffle order
    rows = [("s", t * 60, float(t)) for t in range(6)]
    df = spark.createDataFrame(rows, ["name", "ts", "value"]).repartition(8)
    got = {r["ts"]: r["value"] for r in S.summarize(df, 120, "last").collect()}
    assert got == {0: 1.0, 120: 3.0, 240: 5.0}
    got = {r["ts"]: r["value"] for r in S.summarize(df, 120, "first").collect()}
    assert got == {0: 0.0, 120: 2.0, 240: 4.0}


# -- generic aggregate / filter / rank verbs --------------------------------


def test_aggregate_generic(trio):
    got = _vals(trio, "aggregate(m.*, 'max')")
    name = "aggregate(m.*, 'max')"
    assert got[(name, 0)] == 10.0 and got[(name, 60)] == 10.0
    got = _vals(trio, "aggregate(m.*, 'median')")
    assert got[(name.replace("max", "median"), 0)] == 2.0
    with pytest.raises(InvalidArgumentError):
        _run(trio, "aggregate(m.*, 'bogus')").collect()


def test_filter_series(trio):
    kept = {r["name"] for r in _run(trio, "filterSeries(m.*, 'max', '>', 9)").collect()}
    assert kept == {"m.b"}
    kept = {r["name"] for r in _run(trio, "filterSeries(m.*, 'min', '<=', 1)").collect()}
    assert kept == {"m.a"}
    with pytest.raises(InvalidArgumentError):
        _run(trio, "filterSeries(m.*, 'max', '~', 9)").collect()


def test_highest_lowest_sortby(trio):
    assert {r["name"] for r in _run(trio, "highest(m.*, 1, 'max')").collect()} == {"m.b"}
    assert {r["name"] for r in _run(trio, "lowest(m.*, 1, 'min')").collect()} == {"m.a"}
    ranked = _run(trio, "sortBy(m.*, 'max')")
    assert ranked.columns == ["name", "ts", "value"]
    order = [r["name"] for r in ranked.select("name").distinct()
             .orderBy("name").collect()]
    assert set(order) == {"m.a", "m.b", "m.c"}
    # reverse=true flips the rank order; verify via the library call
    direct = S.sort_by(trio, "max", reverse=True)
    top = direct.filter("rank = 1").select("name").distinct().collect()
    assert {r["name"] for r in top} == {"m.b"}


def test_threshold_filters_and_value_removal(trio):
    assert {r["name"] for r in _run(trio, "maximumBelow(m.*, 7)").collect()} == {
        "m.a", "m.c"
    }
    assert {r["name"] for r in _run(trio, "minimumAbove(m.*, 1.5)").collect()} == {
        "m.b", "m.c"
    }
    got = _vals(trio, "removeAboveValue(m.*, 3)")
    assert got[("m.a", 180)] is None and got[("m.a", 120)] == 3.0
    got = _vals(trio, "removeBelowValue(m.*, 3)")
    assert got[("m.a", 0)] is None and got[("m.a", 120)] == 3.0


def test_remove_between_percentile(spark):
    # 5 flat series 1..5: the extremes (s1, s5) leave the 80th-pct band
    rows = [(f"s{i}", t * 60, float(i)) for i in range(1, 6) for t in range(4)]
    df = spark.createDataFrame(rows, ["name", "ts", "value"])
    kept = {
        r["name"]
        for r in _run(df, "removeBetweenPercentile(s.*, 80)").collect()
    }
    assert kept == {"s1", "s5"}
    # n < 50 folds to 100-n, same answer
    assert kept == {
        r["name"]
        for r in _run(df, "removeBetweenPercentile(s.*, 20)").collect()
    }


# -- scalar value transforms -------------------------------------------------


def test_value_transforms(trio):
    got = _vals(trio, "add(m.*, 5)")
    assert got[("m.a", 0)] == 6.0 and got[("m.c", 60)] is None
    got = _vals(trio, "exp(m.*)")
    assert got[("m.a", 0)] == pytest.approx(math.e)
    # logit: v=1 -> explicit null (graphite's ZeroDivisionError -> None)
    one = trio.sparkSession.createDataFrame(
        [("s", 0, 1.0), ("s", 60, 0.5)], "name string, ts long, value double"
    )
    got = _vals(one, "logit(x)")
    assert got[("s", 0)] is None
    assert got[("s", 60)] == pytest.approx(0.0)
    low = _run(trio, "toLowerCase(m.*)").select("name").distinct().collect()
    assert {r["name"] for r in low} == {"m.a", "m.b", "m.c"}
    up = _run(trio, "toUpperCase(m.*)").select("name").distinct().collect()
    assert {r["name"] for r in up} == {"M.A", "M.B", "M.C"}


# -- seriesLists pairing ------------------------------------------------------


def test_series_lists_pairing(spark):
    a = spark.createDataFrame(
        [("x.1", 0, 2.0), ("x.1", 60, None), ("x.2", 0, 5.0)],
        "name string, ts long, value double",
    )
    b = spark.createDataFrame(
        [("y.1", 0, 3.0), ("y.1", 60, 7.0), ("y.2", 0, 10.0)],
        "name string, ts long, value double",
    )

    def run(target):
        fetch = lambda g: a if g.startswith("x") else b  # noqa: E731
        return {
            (r["name"], r["ts"]): r["value"]
            for r in evaluate_target(
                parse_target(target), fetch=fetch, step=60
            ).collect()
        }

    got = run("sumSeriesLists(x.*, y.*)")
    assert got[("sumSeries(x.1,y.1)", 0)] == 5.0
    assert got[("sumSeries(x.1,y.1)", 60)] == 7.0  # null treated as 0
    assert got[("sumSeries(x.2,y.2)", 0)] == 15.0
    got = run("diffSeriesLists(x.*, y.*)")
    assert got[("diffSeries(x.1,y.1)", 0)] == -1.0
    got = run("multiplySeriesLists(x.*, y.*)")
    assert got[("multiplySeries(x.1,y.1)", 0)] == 6.0
    assert got[("multiplySeries(x.1,y.1)", 60)] is None  # safeMul
    got = run("aggregateSeriesLists(x.*, y.*, 'max')")
    assert got[("maxSeries(x.1,y.1)", 60)] == 7.0
    with pytest.raises(InvalidArgumentError):
        run("aggregateSeriesLists(x.*, y.*, 'bogus')")


def test_pow_series_fold(spark):
    rows = [("a", 0, 2.0), ("b", 0, 3.0), ("a", 60, 2.0), ("b", 60, None)]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    got = _vals(df, "powSeries(p.*)")
    key = "powSeries(p.*)"
    assert got[(key, 0)] == 8.0  # 2 ** 3 in name order
    assert got[(key, 60)] is None  # safePow: null constituent nulls bucket


# -- template / refetch verbs -------------------------------------------------


def test_apply_by_node(spark):
    rows = [("app.h1.busy", 0, 2.0), ("app.h1.total", 0, 4.0),
            ("app.h2.busy", 0, 3.0), ("app.h2.total", 0, 6.0)]
    df = spark.createDataFrame(rows, ["name", "ts", "value"])

    def fetch(glob):
        rx = "^" + glob.replace(".", r"\.").replace("*", "[^.]*") + "$"
        return df.filter(F.col("name").rlike(rx))

    got = evaluate_target(
        parse_target(
            "applyByNode(app.*.busy, 1, 'divideSeries(%.busy, %.total)', '%.util')"
        ),
        fetch=fetch, step=60,
    ).collect()
    vals = {r["name"]: r["value"] for r in got}
    assert vals == {"app.h1.util": 0.5, "app.h2.util": 0.5}


def test_use_series_above(spark):
    rows = [("req.a.count", 0, 100.0), ("req.b.count", 0, 5.0),
            ("req.a.p99", 0, 1.5), ("req.b.p99", 0, 9.9)]
    df = spark.createDataFrame(rows, ["name", "ts", "value"])

    def fetch(glob):
        if glob.endswith(".count"):
            return df.filter("name like '%count'")
        return df.filter(F.col("name") == glob)

    got = evaluate_target(
        parse_target("useSeriesAbove(req.*.count, 50, 'count', 'p99')"),
        fetch=fetch, step=60,
    ).collect()
    assert {(r["name"], r["value"]) for r in got} == {("req.a.p99", 1.5)}


# -- legend verbs -------------------------------------------------------------


def test_cacti_style_and_legend_value(spark):
    rows = [("m", 0, 1.0), ("m", 60, 3.0)]
    df = spark.createDataFrame(rows, ["name", "ts", "value"])
    names = {r["name"] for r in _run(df, "cactiStyle(x)").collect()}
    assert names == {"m Current:3.00 Max:3.00 Min:1.00"}
    names = {r["name"] for r in _run(df, "legendValue(x, 'total', 'last')").collect()}
    assert names == {"m (total: 4.0) (last: 3.0)"}


# -- tag-aware verbs ----------------------------------------------------------


@pytest.fixture(scope="module")
def tagged(spark):
    rows = [
        ("cpu;dc=east;host=a", 0, 1.0),
        ("cpu;dc=east;host=b", 0, 3.0),
        ("cpu;dc=west;host=c", 0, 10.0),
        ("disk;dc=east;host=a", 0, 7.0),
    ]
    return spark.createDataFrame(rows, ["name", "ts", "value"])


def test_group_by_tags(tagged):
    got = _vals(tagged, "groupByTags(x.*, 'sum', 'dc')")
    assert got[("sum;dc=east", 0)] == 11.0
    assert got[("sum;dc=west", 0)] == 10.0
    got = _vals(tagged, "groupByTags(x.*, 'avg', 'name', 'dc')")
    assert got[("cpu;dc=east", 0)] == 2.0
    assert got[("disk;dc=east", 0)] == 7.0


def test_alias_by_tags(tagged):
    names = {r["name"] for r in _run(tagged, "aliasByTags(x.*, 'host', 'dc')").collect()}
    assert names == {"a.east", "b.east", "c.west"}


# -- consolidation / display meta channel -------------------------------------


def test_consolidate_by_meta(trio):
    meta = {}
    out = _run(trio, "consolidateBy(m.*, 'max')", meta=meta)
    assert meta == {"consolidate": "max"}
    names = {r["name"] for r in out.select("name").distinct().collect()}
    assert names == {f'consolidateBy({n},"max")' for n in ("m.a", "m.b", "m.c")}
    with pytest.raises(InvalidArgumentError):
        _run(trio, "consolidateBy(m.*, 'median')", meta={})


def test_xfiles_factor_meta(trio):
    meta = {}
    out = _run(trio, "setXFilesFactor(m.*, 0.5)", meta=meta)
    assert meta == {"xff": 0.5}
    assert out.columns == ["name", "ts", "value"]


def test_display_passthroughs(trio):
    assert _vals(trio, "color(m.*, 'red')") == _vals(trio, "alpha(m.*, 0.5)")
    names = {r["name"] for r in _run(trio, "dashed(m.a)").collect()}
    assert all(n.startswith("dashed(") and n.endswith(",5)") for n in names)
    names = {r["name"] for r in _run(trio, "drawAsInfinite(m.a)").collect()}
    assert all(n.startswith("drawAsInfinite(") for n in names)
    names = {r["name"] for r in _run(trio, "stacked(m.*)").collect()}
    assert all(n.startswith("stacked(") for n in names)
    # named stack group: grouping only, names unchanged
    names = {r["name"] for r in _run(trio, "stacked(m.*, 'grp')").collect()}
    assert names == {"m.a", "m.b", "m.c"}
    names = {
        r["name"] for r in _run(trio, "areaBetween(m.*)").collect()
    }
    assert names == {"areaBetween(m.*)"}


# -- zero-series synthetics ---------------------------------------------------


def test_constant_line_and_threshold(spark, trio):
    got = _run(trio, "constantLine(42)", end=240, spark=spark).collect()
    assert {r["value"] for r in got} == {42.0}
    assert {r["name"] for r in got} == {"42"}
    assert sorted(r["ts"] for r in got) == [0, 60, 120, 180]
    got = _run(trio, "threshold(99, 'limit')", end=240, spark=spark).collect()
    assert {r["name"] for r in got} == {"limit"}
    # without the window the verb 400s instead of crashing
    with pytest.raises(InvalidArgumentError):
        _run(trio, "constantLine(1)").collect()


def test_time_sin_randomwalk_vertical(spark, trio):
    got = _run(trio, "time('t')", end=180, spark=spark).collect()
    assert {(r["ts"], r["value"]) for r in got} == {(0, 0.0), (60, 60.0), (120, 120.0)}
    got = _run(trio, "sinFunction('s', 2)", end=180, spark=spark).collect()
    vals = {r["ts"]: r["value"] for r in got}
    assert vals[60] == pytest.approx(2 * math.sin(6.0))
    walk = _run(trio, "randomWalk('w')", end=3600, spark=spark).collect()
    assert len(walk) == 60
    # deterministic across evaluations (hash-seeded, not random())
    walk2 = _run(trio, "randomWalk('w')", end=3600, spark=spark).collect()
    assert sorted(map(tuple, walk)) == sorted(map(tuple, walk2))
    got = _run(trio, "verticalLine(120, 'deploy')", end=240, spark=spark).collect()
    assert [(r["name"], r["ts"], r["value"]) for r in got] == [("deploy", 120, 1.0)]
    with pytest.raises(InvalidArgumentError):
        _run(trio, "verticalLine(9999)", end=240, spark=spark).collect()


def test_series_by_tag_leaf(spark, tagged):
    calls = []

    def tag_fetch(specs):
        calls.append(specs)
        return tagged.filter("name like 'cpu%'")

    got = evaluate_target(
        parse_target("sumSeries(seriesByTag('name=cpu', 'dc=~e.*'))"),
        fetch=lambda g: tagged, step=60, tag_fetch=tag_fetch,
    ).collect()
    assert calls == [["name=cpu", "dc=~e.*"]]
    assert {r["value"] for r in got} == {14.0}
    with pytest.raises(InvalidArgumentError):
        evaluate_target(
            parse_target("seriesByTag('name=cpu')"),
            fetch=lambda g: tagged, step=60,
        ).collect()


# -- window arguments ---------------------------------------------------------


def test_moving_window_and_timespan_windows(spark):
    rows = [("m", t * 60, float(t)) for t in range(6)]
    df = spark.createDataFrame(rows, ["name", "ts", "value"])
    # movingWindow with explicit func
    got = _vals(df, "movingWindow(x, 3, 'sum')")
    assert got[("m", 240)] == 2.0 + 3.0 + 4.0
    # quoted timespan window: '2min' over step=60 = 2 points
    got = _vals(df, "movingAverage(x, '2min')")
    assert got[("m", 120)] == pytest.approx(1.5)
    # movingWindow median routes to moving_median (exclusive of the
    # current bucket, graphite movingMedian): window at 240 = {1,2,3}
    got = _vals(df, "movingWindow(x, 3, 'median')")
    assert got[("m", 240)] == 2.0


def test_bool_and_none_literals(spark):
    rows = [("a", 0, 1.0), ("b", 0, 5.0)]
    df = spark.createDataFrame(rows, ["name", "ts", "value"])
    # sortBy(..., true) parses true as a boolean, not a glob fetch
    out = _run(df, "sortBy(x.*, 'max', true)")
    assert out.columns == ["name", "ts", "value"]


def test_wildcards_aggregate_generic(spark):
    rows = [("a.x.m", 0, 2.0), ("a.y.m", 0, 4.0)]
    df = spark.createDataFrame(rows, ["name", "ts", "value"])
    got = _vals(df, "aggregateWithWildcards(x.*, 'max', 1)")
    assert got[("a.m", 0)] == 4.0
    got = _vals(df, "multiplySeriesWithWildcards(x.*, 1)")
    assert got[("a.m", 0)] == 8.0


def test_holtwinters_confidence_area_alias(spark):
    rows = [("m", t * 60, float(t % 5)) for t in range(30)]
    df = spark.createDataFrame(rows, ["name", "ts", "value"])
    area = _run(df, "holtWintersConfidenceArea(x)")
    names = {r["name"] for r in area.select("name").distinct().collect()}
    assert names == {
        "holtWintersConfidenceUpper(m)",
        "holtWintersConfidenceLower(m)",
    }


# -- short aliases, aliasQuery, compressPeriodicGaps -------------------------


def test_short_function_aliases(spark):
    rows = [("a", 0, 2.0), ("b", 0, 6.0)]
    df = spark.createDataFrame(rows, ["name", "ts", "value"])
    assert _vals(df, "sum(x.*)")[("sum(x.*)", 0)] == 8.0
    assert _vals(df, "avg(x.*)")[("avg(x.*)", 0)] == 4.0
    assert _vals(df, "min(x.*)")[("min(x.*)", 0)] == 2.0
    assert _vals(df, "max(x.*)")[("max(x.*)", 0)] == 6.0
    got = _vals(df, "log(x.*)")
    assert got[("a", 0)] == pytest.approx(math.log10(2.0))


def test_alias_query(spark):
    data = spark.createDataFrame(
        [("ch.1.rate", 0, 1.0), ("ch.1.rate", 60, 2.0),
         ("ch.2.rate", 0, 5.0), ("ch.2.rate", 60, 7.0),
         ("ch.1.freq", 60, 440.0), ("ch.2.freq", 60, 880.0)],
        ["name", "ts", "value"],
    )

    def fetch(glob):
        return data.filter(F.col("name").rlike(
            "^" + glob.replace(".", r"\.").replace("*", "[^.]*") + "$"))

    got = evaluate_target(
        parse_target(
            "aliasQuery(ch.*.rate, 'ch\\.(\\d+)\\.rate', 'ch.\\1.freq',"
            " 'Channel %d MHz')"
        ),
        fetch=fetch, step=60,
    ).collect()
    names = {r["name"] for r in got}
    assert names == {"Channel 440 MHz", "Channel 880 MHz"}
    # the queried series supplies the label; data rows stay the originals
    assert sorted(r["value"] for r in got if r["name"] == "Channel 440 MHz") == [1.0, 2.0]


def test_compress_periodic_gaps(spark):
    # values every 120s on a 60s grid: step should be re-detected as 120
    rows = []
    for t in range(10):
        rows.append(("m", t * 60, float(t) if t % 2 == 0 else None))
    rows += [("tiny", 0, 1.0), ("tiny", 60, None)]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    got = evaluate_target(
        parse_target("compressPeriodicGaps(x.*)"),
        fetch=lambda g: df, step=60,
    ).collect()
    m = sorted((r["ts"], r["value"]) for r in got if r["name"] == "m")
    assert m == [(0, 0.0), (120, 2.0), (240, 4.0), (360, 6.0), (480, 8.0)]
    # <3 known points: unchanged passthrough
    tiny = sorted((r["ts"], r["value"]) for r in got if r["name"] == "tiny")
    assert tiny == [(0, 1.0), (60, None)]


def test_events_render_verb(spark):
    ev = spark.createDataFrame(
        [(95,), (100,), (110,), (130,), (500,)], ["when"]
    )
    calls = []

    def events_fetch(tags):
        calls.append(tags)
        return ev

    got = evaluate_target(
        parse_target("events('deploy', 'api')"),
        fetch=lambda g: None, step=60, start=60, end=300,
        events_fetch=events_fetch,
    ).collect()
    assert calls == [["deploy", "api"]]
    vals = {r["ts"]: r["value"] for r in got}
    # bucket grid anchored at start=60: [60,120) has 95/100/110 -> 3,
    # [120,180) has 130 -> 1; 500 is outside the window
    assert vals == {60: 3.0, 120: 1.0}
    assert {r["name"] for r in got} == {'events("deploy", "api")'}

    with pytest.raises(InvalidArgumentError):
        evaluate_target(parse_target("events()"), fetch=lambda g: None,
                        step=60, start=0, end=100).collect()


def test_optional_graphite_args(spark):
    rows = [("m", t * 60, None if t < 3 else float(t)) for t in range(8)]
    df = spark.createDataFrame(rows, "name string, ts long, value double")

    # movingAverage xFilesFactor: window [0..120] is all-null-heavy; with
    # xff=0.5 early windows (known fraction < 0.5) emit null
    got = _vals(df, "movingAverage(x, 4, 0.5)")
    assert got[("m", 120)] is None          # 0/3 known in [0,120]
    assert got[("m", 240)] == pytest.approx(3.5)  # {3,4} of 4 known = 0.5
    got_noxff = _vals(df, "movingAverage(x, 4)")
    assert got_noxff[("m", 240)] == pytest.approx(3.5)

    # summarize alignToFrom=true anchors buckets to the window start
    rows2 = [("m", 60 + t * 60, 1.0) for t in range(6)]
    df2 = spark.createDataFrame(rows2, ["name", "ts", "value"])
    ts_epoch = sorted(
        r["ts"] for r in _run(df2, "summarize(x, '2min', 'sum')").collect()
    )
    assert ts_epoch[0] == 0
    ts_aligned = sorted(
        r["ts"]
        for r in evaluate_target(
            parse_target("summarize(x, '2min', 'sum', true)"),
            fetch=lambda g: df2, step=60, start=60,
        ).collect()
    )
    assert ts_aligned[0] == 60

    # transformNull with a referenceSeries fills only where the ref knows
    ref = spark.createDataFrame(
        [("r", 0, 1.0), ("r", 60, None), ("r", 120, 2.0)],
        "name string, ts long, value double",
    )
    base = spark.createDataFrame(
        [("m", 0, None), ("m", 60, None), ("m", 120, 5.0)],
        "name string, ts long, value double",
    )

    def fetch(g):
        return {"x": base, "ref.*": ref}[g]

    got = {
        r["ts"]: r["value"]
        for r in evaluate_target(
            parse_target("transformNull(x, -1, ref.*)"), fetch=fetch, step=60
        ).collect()
    }
    assert got == {0: -1.0, 60: None, 120: 5.0}


def test_optional_args_batch2(spark):
    rows = [("m", 60 + t * 60, 1.0) for t in range(6)]
    df = spark.createDataFrame(rows, ["name", "ts", "value"])

    # hitcount alignToInterval=true anchors to the window start
    got = evaluate_target(
        parse_target("hitcount(x, '2min', true)"),
        fetch=lambda g: df, step=60, start=60,
    ).collect()
    assert min(r["ts"] for r in got) == 60
    got0 = evaluate_target(
        parse_target("hitcount(x, '2min')"),
        fetch=lambda g: df, step=60, start=60,
    ).collect()
    assert min(r["ts"] for r in got0) == 0

    # timeShift extra args accepted (shift is forward: 60 -> 120)
    got = _vals(df, "timeShift(x, '1min', false)")
    assert got[("m", 120)] == 1.0

    # holtWinters seasonality argument steers the season length
    rows2 = [("m", t * 60, float(t % 4)) for t in range(40)]
    df2 = spark.createDataFrame(rows2, ["name", "ts", "value"])
    a = {r["ts"]: r["value"] for r in _run(
        df2, "holtWintersForecast(x, '7d', '4min')").collect()}
    b = {r["ts"]: r["value"] for r in _run(
        df2, "holtWintersForecast(x, '7d', '10min')").collect()}
    assert a != b  # different season lengths give different forecasts


# -- batched refetch verbs (fetch_names path) ---------------------------------


def test_series_lists_length_mismatch_is_400(spark):
    a = spark.createDataFrame(
        [("x.1", 0, 2.0), ("x.2", 0, 5.0)], "name string, ts long, value double")
    b = spark.createDataFrame(
        [("y.1", 0, 3.0)], "name string, ts long, value double")
    fetch = lambda g: a if g.startswith("x") else b  # noqa: E731
    # graphite raises InputParameterError (400) on unequal list lengths —
    # silently zipping would truncate data
    with pytest.raises(InvalidArgumentError):
        evaluate_target(
            parse_target("diffSeriesLists(x.*, y.*)"), fetch=fetch, step=60)


def test_pow_series_negative_base(spark):
    # math.pow(-2, 3) == -8 in graphite's safePow; only a DOMAIN error
    # (negative base, non-integer exponent -> NaN) nulls the bucket
    rows = [("a", 0, -2.0), ("b", 0, 3.0), ("a", 60, -2.0), ("b", 60, 0.5)]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    got = _vals(df, "powSeries(p.*)")
    assert got[("powSeries(p.*)", 0)] == -8.0
    assert got[("powSeries(p.*)", 60)] is None


def _tracking_fetch_names(df):
    calls = []

    def fetch_names(names):
        calls.append(list(names))
        return df.filter(F.col("name").isin(list(names)))

    return fetch_names, calls


def test_apply_by_node_batched_single_fetch(spark):
    rows = [("app.h1.busy", 0, 2.0), ("app.h1.total", 0, 4.0),
            ("app.h2.busy", 0, 3.0), ("app.h2.total", 0, 6.0)]
    df = spark.createDataFrame(rows, ["name", "ts", "value"])

    def fetch(glob):
        rx = "^" + glob.replace(".", r"\.").replace("*", "[^.]*") + "$"
        return df.filter(F.col("name").rlike(rx))

    fetch_names, calls = _tracking_fetch_names(df)
    got = evaluate_target(
        parse_target("applyByNode(app.*.busy, 1, '%.total', '%.t')"),
        fetch=fetch, fetch_names=fetch_names, step=60,
    ).collect()
    # ONE batched read for BOTH prefixes — sub-plan count independent of
    # how many names matched
    assert calls == [["app.h1.total", "app.h2.total"]]
    assert {(r["name"], r["value"]) for r in got} == {
        ("app.h1.t", 4.0), ("app.h2.t", 6.0)}
    # expression templates keep graphite's per-prefix re-entry semantics
    got2 = evaluate_target(
        parse_target(
            "applyByNode(app.*.busy, 1, 'divideSeries(%.busy, %.total)', '%.util')"
        ),
        fetch=fetch, fetch_names=fetch_names, step=60,
    ).collect()
    assert {(r["name"], r["value"]) for r in got2} == {
        ("app.h1.util", 0.5), ("app.h2.util", 0.5)}
    assert len(calls) == 1  # the expression path never used fetch_names


def test_use_series_above_batched_single_fetch(spark):
    rows = [("req.a.count", 0, 100.0), ("req.b.count", 0, 5.0),
            ("req.c.count", 0, 70.0),
            ("req.a.p99", 0, 1.5), ("req.b.p99", 0, 9.9),
            ("req.c.p99", 0, 3.3)]
    df = spark.createDataFrame(rows, ["name", "ts", "value"])

    def fetch(glob):
        if glob.endswith(".count"):
            return df.filter("name like '%count'")
        return df.filter(F.col("name") == glob)

    fetch_names, calls = _tracking_fetch_names(df)
    got = evaluate_target(
        parse_target("useSeriesAbove(req.*.count, 50, 'count', 'p99')"),
        fetch=fetch, fetch_names=fetch_names, step=60,
    ).collect()
    assert calls == [["req.a.p99", "req.c.p99"]]
    assert {(r["name"], r["value"]) for r in got} == {
        ("req.a.p99", 1.5), ("req.c.p99", 3.3)}


def test_alias_query_batched_single_fetch(spark):
    data = spark.createDataFrame(
        [("ch.1.rate", 0, 1.0), ("ch.1.rate", 60, 2.0),
         ("ch.2.rate", 0, 5.0), ("ch.2.rate", 60, 7.0),
         ("ch.1.freq", 0, 430.0), ("ch.1.freq", 60, 440.0),
         ("ch.2.freq", 60, 880.0)],
        ["name", "ts", "value"],
    )

    def fetch(glob):
        return data.filter(F.col("name").rlike(
            "^" + glob.replace(".", r"\.").replace("*", "[^.]*") + "$"))

    fetch_names, calls = _tracking_fetch_names(data)
    got = evaluate_target(
        parse_target(
            "aliasQuery(ch.*.rate, 'ch\\.(\\d+)\\.rate', 'ch.\\1.freq',"
            " 'Channel %d MHz')"
        ),
        fetch=fetch, fetch_names=fetch_names, step=60,
    ).collect()
    assert calls == [["ch.1.freq", "ch.2.freq"]]
    names = {r["name"] for r in got}
    assert names == {"Channel 440 MHz", "Channel 880 MHz"}
    assert sorted(
        r["value"] for r in got if r["name"] == "Channel 440 MHz"
    ) == [1.0, 2.0]
