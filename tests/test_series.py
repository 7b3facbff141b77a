"""Graphite render-function layer (functions/series.py) unit tests.

The oracle-checked queries (gr_* in __spark_entry__.py) pin combine /
percentileOfSeries / moving / derivative / integral / keepLastValue /
summarize / highest / aliasByNode against DuckDB; these tests pin the rest
(scale, offset, absolute, perSecond, timeShift, nonNegativeDerivative,
keepLastValue's limit) on hand-computed fixtures, graphite-web's documented
semantics being the contract.
"""

import pytest
from pyspark.sql import functions as F

from biggraphite_spark.functions import series as S


@pytest.fixture(scope="module")
def two_series(spark):
    rows = [
        ("a", 0, 1.0), ("a", 60, 3.0), ("a", 120, 2.0), ("a", 180, 10.0),
        ("b", 0, 100.0), ("b", 60, None), ("b", 120, 90.0),
    ]
    return spark.createDataFrame(rows, "name string, ts long, value double")


def _as_dict(df):
    return {(r["name"], r["ts"]): r["value"] for r in df.collect()}


def test_scale_offset_absolute(two_series):
    assert _as_dict(S.scale(two_series, 2.0))[("a", 60)] == 6.0
    assert _as_dict(S.offset(two_series, -5.0))[("a", 0)] == -4.0
    neg = S.offset(two_series, -5.0)
    assert _as_dict(S.absolute(neg))[("a", 0)] == 4.0
    # nulls propagate, never become numbers
    assert _as_dict(S.scale(two_series, 2.0))[("b", 60)] is None


def test_time_shift(two_series):
    shifted = _as_dict(S.time_shift(two_series, 3600))
    assert shifted[("a", 3600)] == 1.0
    assert ("a", 0) not in shifted


def test_derivative_and_per_second(two_series):
    d = _as_dict(S.derivative(two_series))
    assert d[("a", 0)] is None  # no predecessor
    assert d[("a", 60)] == 2.0
    assert d[("a", 120)] == -1.0
    nn = _as_dict(S.non_negative_derivative(two_series))
    assert nn[("a", 120)] is None  # counter reset -> null, not negative
    ps = _as_dict(S.per_second(two_series, 60))
    assert ps[("a", 180)] == pytest.approx(8.0 / 60)
    # null bucket: lag over it gives null delta both sides
    assert d[("b", 60)] is None


def test_moving_skips_nulls(two_series):
    m = _as_dict(S.moving(two_series, 2, "average"))
    assert m[("a", 60)] == 2.0
    # the frame is the trailing 2 *buckets* (60=null, 120=90); the null is
    # skipped inside the avg, matching graphite's None-skipping windows
    assert m[("b", 120)] == pytest.approx(90.0)


def test_keep_last_value_limit(spark):
    rows = [
        ("m", 0, 5.0), ("m", 60, None), ("m", 120, None),
        ("m", 180, None), ("m", 240, 7.0),
    ]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    unlimited = _as_dict(S.keep_last_value(df))
    assert unlimited[("m", 180)] == 5.0
    limited = _as_dict(S.keep_last_value(df, limit=2))
    assert limited[("m", 60)] == 5.0
    assert limited[("m", 120)] == 5.0
    assert limited[("m", 180)] is None  # third consecutive hole exceeds limit
    assert limited[("m", 240)] == 7.0


def test_summarize_rejects_unknown_func(two_series):
    with pytest.raises(ValueError, match="unknown aggregate function"):
        S.summarize(two_series, 120, "p99")


def test_as_percent_shares_sum_to_100(spark):
    rows = [("x", 0, 30.0), ("y", 0, 70.0), ("x", 60, 5.0)]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    got = _as_dict(S.as_percent(df))
    assert got[("x", 0)] == pytest.approx(30.0)
    assert got[("y", 0)] == pytest.approx(70.0)
    assert got[("x", 60)] == pytest.approx(100.0)


def test_diff_and_divide_series(spark):
    a = spark.createDataFrame(
        [("a", 0, 10.0), ("a", 60, 20.0)], "name string, ts long, value double"
    )
    b = spark.createDataFrame(
        [("b", 0, 4.0), ("b", 60, 0.0)], "name string, ts long, value double"
    )
    diff = {r["ts"]: r["value"] for r in S.diff_series(a, b).collect()}
    assert diff == {0: 6.0, 60: 20.0}
    div = {r["ts"]: r["value"] for r in S.divide_series(a, b).collect()}
    assert div[0] == pytest.approx(2.5)
    assert div[60] is None  # divide by zero -> null, graphite's None


def test_remove_above_percentile_nulls_not_drops(spark):
    rows = [("m", i * 60, float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    out = _as_dict(S.remove_above_percentile(df, 50))
    assert len(out) == 10  # buckets survive
    assert out[("m", 0)] == 0.0
    assert out[("m", 540)] is None  # above the per-series p50 -> nulled


def test_highest_is_deterministic_on_ties(spark):
    rows = [("x", 0, 1.0), ("y", 0, 1.0), ("z", 0, 2.0)]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    top = {r["name"]: r["rank"] for r in S.highest(df, 2).collect()}
    assert top == {"z": 1, "x": 2}  # name tie-break, not arbitrary


def test_lowest_mirrors_highest(spark):
    rows = [("x", 0, 1.0), ("y", 0, 1.0), ("z", 0, 2.0)]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    bottom = {r["name"]: r["rank"] for r in S.lowest(df, 2).collect()}
    assert bottom == {"x": 1, "y": 2}


def test_stat_filters_keep_whole_series(two_series):
    # series a: mean 4.0; series b: mean 95.0 (null-skipping)
    kept = {r["name"] for r in S.average_above(two_series, 10.0).collect()}
    assert kept == {"b"}
    kept = {r["name"] for r in S.average_below(two_series, 10.0).collect()}
    assert kept == {"a"}
    kept = {r["name"] for r in S.maximum_above(two_series, 50.0).collect()}
    assert kept == {"b"}
    kept = {r["name"] for r in S.minimum_below(two_series, 50.0).collect()}
    assert kept == {"a"}


def test_grep_and_exclude(two_series):
    assert {r["name"] for r in S.grep_series(two_series, "^a$").collect()} == {"a"}
    assert {r["name"] for r in S.exclude(two_series, "^a$").collect()} == {"b"}


def test_n_percentile_is_flat_per_series(two_series):
    got = _as_dict(S.n_percentile(two_series, 50))  # graphite-style percent
    # a: sorted [1,2,3,10] -> interpolated p50 = 2.5, every bucket
    assert got[("a", 0)] == pytest.approx(2.5)
    assert got[("a", 180)] == pytest.approx(2.5)
    # b: nulls skipped -> p50 of [90,100] = 95
    assert got[("b", 60)] == pytest.approx(95.0)


def test_time_slice_nulls_outside(two_series):
    got = _as_dict(S.time_slice(two_series, 60, 120))
    assert len(got) == 7  # grid preserved
    assert got[("a", 0)] is None
    assert got[("a", 60)] == 3.0


def test_transform_null(two_series):
    got = _as_dict(S.transform_null(two_series, -1.0))
    assert got[("b", 60)] == -1.0
    assert got[("b", 0)] == 100.0


def test_clamp_nulls_outside_bounds(two_series):
    got = _as_dict(S.clamp(two_series, lo=2.0, hi=90.0))
    assert got[("a", 0)] is None     # 1.0 below lo
    assert got[("a", 60)] == 3.0
    assert got[("b", 0)] is None     # 100.0 above hi
    assert got[("b", 120)] == 90.0


def test_remove_below_percentile(spark):
    rows = [("m", i * 60, float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    out = _as_dict(S.remove_below_percentile(df, 50))
    assert len(out) == 10
    assert out[("m", 0)] is None
    assert out[("m", 540)] == 9.0


def test_group_by_node(spark):
    rows = [
        ("bg.err.u1", 0, 1.0), ("bg.err.u2", 0, 2.0), ("bg.ok.u1", 0, 5.0),
    ]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    got = _as_dict(S.group_by_node(df, 1, "sum"))
    assert got == {("err", 0): 3.0, ("ok", 0): 5.0}


def test_hitcount_scales_by_inferred_step(spark):
    # step inferred as the min ts delta (60); hitcount(120) sums value*60
    rows = [("m", 0, 1.0), ("m", 60, 2.0), ("m", 120, 4.0)]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    got = _as_dict(S.hitcount(df, 120))
    assert got == {("m", 0): 180.0, ("m", 120): 240.0}


def test_arithmetic_transforms(two_series):
    lg = _as_dict(S.logarithm(two_series, 10.0))
    assert lg[("b", 0)] == pytest.approx(2.0)
    assert lg[("b", 60)] is None
    neg = S.offset(two_series, -5.0)
    assert _as_dict(S.square_root(neg))[("a", 0)] is None  # -4 -> null
    assert _as_dict(S.square_root(two_series))[("a", 60)] == pytest.approx(3.0 ** 0.5)
    assert _as_dict(S.pow_series(two_series, 2.0))[("a", 120)] == 4.0
    inv = _as_dict(S.invert(S.offset(two_series, -1.0)))
    assert inv[("a", 0)] is None  # 1-1=0 -> null
    assert inv[("a", 60)] == pytest.approx(0.5)


def test_offset_to_zero(two_series):
    z = _as_dict(S.offset_to_zero(two_series))
    assert z[("a", 0)] == 0.0
    assert z[("a", 180)] == 9.0
    assert z[("b", 120)] == 0.0  # min skips the null bucket


def test_delay_and_changed(two_series):
    d = _as_dict(S.delay(two_series, 1))
    assert d[("a", 0)] is None
    assert d[("a", 60)] == 1.0
    c = _as_dict(S.changed(two_series))
    assert c[("a", 0)] == 0.0  # first bucket: graphite emits 0
    assert c[("a", 60)] == 1.0
    assert c[("b", 60)] == 0.0  # null vs known -> not a change


def test_moving_median_and_stdev(spark):
    # graphite movingMedian: trailing window EXCLUDING the current bucket,
    # first windowSize buckets consumed as warm-up (emitted from i=windowSize)
    rows = [("a", t, v) for t, v in ((0, 1.0), (60, 9.0), (120, 2.0), (180, 4.0))]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    mm = _as_dict(S.moving_median(df, 3))
    assert ("a", 0) not in mm and ("a", 120) not in mm  # warm-up dropped
    assert mm == {("a", 180): 2.0}  # median(1, 9, 2) — current (4.0) excluded
    # graphite stdev: population deviation, current inclusive, from row 0
    sd = _as_dict(S.stdev(df, 2))
    assert sd[("a", 0)] == 0.0  # single-sample window: graphite emits 0
    assert sd[("a", 60)] == pytest.approx(4.0)   # pop-stdev(1, 9)
    assert sd[("a", 120)] == pytest.approx(3.5)  # pop-stdev(9, 2)


def test_linear_regression_exact_fit(spark):
    # y = 2x + 1 over the rebased x grid -> the fit reproduces it exactly
    rows = [("a", 1_000_000 + 60 * i, 1.0 + 2.0 * 60 * i) for i in range(5)]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    fit = _as_dict(S.linear_regression(df))
    for i in range(5):
        assert fit[("a", 1_000_000 + 60 * i)] == pytest.approx(1.0 + 120.0 * i)


def test_most_deviant_and_sort_by_total(two_series):
    md = S.most_deviant(two_series, 1)
    assert {r["name"] for r in md.collect()} == {"b"}  # var(100, 90) > var(a)
    ranked = S.sort_by_total(two_series)
    by_name = {r["name"]: r["rank"] for r in ranked.collect()}
    assert by_name == {"b": 1, "a": 2}


def test_across_series_combinators(two_series):
    cnt = {r["ts"]: r["value"] for r in S.count_series(two_series).collect()}
    assert cnt[0] == 2.0 and cnt[60] == 1.0  # null doesn't count
    rng = {r["ts"]: r["value"] for r in S.range_of_series(two_series).collect()}
    assert rng[0] == 99.0
    assert rng[60] == 0.0  # single known value
    mul = {r["ts"]: r["value"] for r in S.multiply_series(two_series).collect()}
    assert mul[0] == 100.0
    assert mul[120] == 180.0
    assert mul[60] is None  # graphite safeMul: any-null bucket -> None
    assert mul[180] == 10.0  # single known series: product of one


def test_average_series_with_wildcards(spark):
    rows = [
        ("dc1.web.cpu", 0, 10.0), ("dc1.db.cpu", 0, 30.0), ("dc2.web.cpu", 0, 5.0),
    ]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    out = {(r["name"], r["ts"]): r["value"] for r in
           S.average_series_with_wildcards(df, 1).collect()}
    assert out[("dc1.cpu", 0)] == 20.0
    assert out[("dc2.cpu", 0)] == 5.0


def test_alias_sub(two_series):
    out = S.alias_sub(two_series, "^a$", "alpha")
    assert {r["name"] for r in out.collect()} == {"alpha", "b"}


def test_interpolate(spark):
    rows = [
        ("a", 0, 1.0), ("a", 60, None), ("a", 120, None), ("a", 180, 7.0),
        ("a", 240, None),  # trailing hole stays null
        ("b", 0, None), ("b", 60, 5.0),  # leading hole stays null
    ]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    out = _as_dict(S.interpolate(df))
    assert out[("a", 60)] == pytest.approx(3.0)
    assert out[("a", 120)] == pytest.approx(5.0)
    assert out[("a", 240)] is None
    assert out[("b", 0)] is None
    # limit: the two-hole gap is wider than limit=1, stays null
    lim = _as_dict(S.interpolate(df, limit=1))
    assert lim[("a", 60)] is None
    assert lim[("a", 180)] == 7.0


def test_weighted_average(spark):
    vals = spark.createDataFrame(
        [("a", 0, 10.0), ("b", 0, 20.0), ("a", 60, 4.0)],
        "name string, ts long, value double",
    )
    wts = spark.createDataFrame(
        [("a", 0, 1.0), ("b", 0, 3.0), ("a", 60, 0.0)],
        "name string, ts long, value double",
    )
    out = {r["ts"]: r["value"] for r in S.weighted_average(vals, wts).collect()}
    assert out[0] == pytest.approx((10.0 * 1 + 20.0 * 3) / 4)
    assert out[60] is None  # zero total weight -> null, not division error


def test_weighted_average_pairs_by_node(spark):
    # graphite's documented use: …avg paired with …count — full names differ,
    # the node components pair them (weightedAverage(avgList, wtList, 1))
    vals = spark.createDataFrame(
        [("app.u1.avg", 0, 10.0), ("app.u2.avg", 0, 20.0)],
        "name string, ts long, value double",
    )
    wts = spark.createDataFrame(
        [("app.u1.count", 0, 1.0), ("app.u2.count", 0, 3.0)],
        "name string, ts long, value double",
    )
    out = {r["ts"]: r["value"] for r in S.weighted_average(vals, wts, 1).collect()}
    assert out[0] == pytest.approx((10.0 * 1 + 20.0 * 3) / 4)
    # full-name join (no nodes) matches nothing here — the bug the node
    # pairing exists to avoid
    assert S.weighted_average(vals, wts).count() == 0


def test_transform_tail_functions(two_series, spark):
    nn = _as_dict(S.is_non_null(two_series))
    assert nn[("b", 60)] == 0.0 and nn[("b", 0)] == 1.0
    sg = _as_dict(S.sigmoid_series(two_series))
    assert sg[("a", 0)] == pytest.approx(1 / (1 + 2.718281828459045 ** -1.0))
    rd = _as_dict(S.round_series(S.scale(two_series, 1.234), 1))
    assert rd[("a", 0)] == pytest.approx(1.2)
    mm = _as_dict(S.min_max(two_series))
    assert mm[("a", 0)] == 0.0 and mm[("a", 180)] == 1.0
    assert mm[("b", 60)] is None  # nulls stay null
    flat = spark.createDataFrame(
        [("f", 0, 2.0), ("f", 60, 2.0)], "name string, ts long, value double"
    )
    assert _as_dict(S.min_max(flat))[("f", 0)] == 0.0  # flat series -> 0


def test_scale_to_seconds_and_integral_by_interval(spark):
    rows = [("m", t * 60, float(v)) for t, v in ((0, 6), (1, 6), (2, 6), (3, 6))]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    # step inferred 60s; per-second rate = value/60
    ps = _as_dict(S.scale_to_seconds(df, 1))
    assert ps[("m", 0)] == pytest.approx(0.1)
    # integral resets at each 120s boundary
    ib = _as_dict(S.integral_by_interval(df, 120))
    assert ib[("m", 60)] == 12.0
    assert ib[("m", 120)] == 6.0  # reset


def test_remove_empty_series(spark):
    rows = [("full", 0, 1.0), ("full", 60, 2.0),
            ("half", 0, 1.0), ("half", 60, None),
            ("empty", 0, None), ("empty", 60, None)]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    assert {r["name"] for r in S.remove_empty_series(df).collect()} == {"full", "half"}
    assert {r["name"] for r in S.remove_empty_series(df, 0.9).collect()} == {"full"}


def test_combine_series_with_wildcards(spark):
    rows = [("dc1.web.cpu", 0, 10.0), ("dc1.db.cpu", 0, 30.0)]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    out = {(r["name"], r["ts"]): r["value"]
           for r in S.combine_series_with_wildcards(df, "sum", 1).collect()}
    assert out[("dc1.cpu", 0)] == 40.0


def test_average_outside_percentile_keeps_band_edges(spark):
    rows = [(f"m{i}", 0, float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    kept = {r["name"] for r in S.average_outside_percentile(df, 80).collect()}
    # rank floor(0.8*11)=8 -> hi=sorted[7]=7.0; lo rank floor(0.2*11)=2 -> 1.0
    # keep stats <= 1.0 or >= 7.0
    assert kept == {"m0", "m1", "m7", "m8", "m9"}


def test_sort_by_maxima_and_limit(two_series):
    ranked = {r["name"]: r["rank"] for r in S.sort_by_maxima(two_series).collect()}
    assert ranked == {"b": 1, "a": 2}
    lim = S.limit_series(two_series, 1)
    assert {r["name"] for r in lim.collect()} == {"a"}  # name order


# ---------------------------------------------------------------------------
# render tail: smartSummarize / sorts / selection / list ops / generators
# ---------------------------------------------------------------------------


def test_smart_summarize_origin_alignment(spark):
    from biggraphite_spark.functions.series import smart_summarize

    rows = [("a", 130, 1.0), ("a", 190, 2.0), ("a", 250, 4.0)]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    # origin=130, precision=120: buckets [130,250) and [250,370)
    out = _as_dict(smart_summarize(df, 120, "sum", origin=130))
    assert out == {("a", 130): 3.0, ("a", 250): 4.0}


def test_sort_by_minima_filters_and_ranks(spark):
    from biggraphite_spark.functions.series import sort_by_minima

    rows = [("a", 0, 5.0), ("b", 0, 2.0), ("neg", 0, -1.0)]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    ranked = {r["name"]: r["rank"] for r in sort_by_minima(df).collect()}
    # 'neg' max <= 0 -> dropped; b(min 2) before a(min 5)
    assert ranked == {"b": 1, "a": 2}


def test_current_above_below_partition(spark):
    from biggraphite_spark.functions.series import current_above, current_below

    rows = [
        ("hi", 0, 1.0), ("hi", 60, 99.0),
        ("lo", 0, 98.0), ("lo", 60, 3.0),
        ("gap", 0, 97.0), ("gap", 60, None),  # last KNOWN value is 97
    ]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    assert {r["name"] for r in current_above(df, 50).collect()} == {"hi", "gap"}
    assert {r["name"] for r in current_below(df, 50).collect()} == {"lo"}


def test_substr_and_group_by_nodes(spark):
    from biggraphite_spark.functions.series import group_by_nodes, substr_series

    rows = [("dc1.web.req.count", 0, 1.0), ("dc2.web.req.count", 0, 2.0)]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    assert {r["name"] for r in substr_series(df, 1, 3).collect()} == {"web.req"}
    out = group_by_nodes(df, "sum", 1, 2).collect()
    assert [(r["name"], r["value"]) for r in out] == [("web.req", 3.0)]


def test_unique_series_first_list_wins(spark):
    from biggraphite_spark.functions.series import unique_series

    a = spark.createDataFrame([("x", 0, 1.0)], "name string, ts long, value double")
    b = spark.createDataFrame(
        [("x", 0, 99.0), ("y", 0, 2.0)], "name string, ts long, value double"
    )
    out = _as_dict(unique_series(a, b))
    assert out == {("x", 0): 1.0, ("y", 0): 2.0}


def test_divide_series_lists_pairs_by_sorted_name(spark):
    from biggraphite_spark.functions.series import divide_series_lists

    num = spark.createDataFrame(
        [("n.b", 0, 10.0), ("n.a", 0, 4.0)], "name string, ts long, value double"
    )
    den = spark.createDataFrame(
        [("d.b", 0, 5.0), ("d.a", 0, 2.0)], "name string, ts long, value double"
    )
    out = _as_dict(divide_series_lists(num, den))
    # sorted pairing: n.a/d.a, n.b/d.b; dividend names survive
    assert out == {("n.a", 0): 2.0, ("n.b", 0): 2.0}


def test_aggregate_line_flat(spark):
    from biggraphite_spark.functions.series import aggregate_line

    rows = [("a", 0, 1.0), ("a", 60, 3.0), ("a", 120, None)]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    out = _as_dict(aggregate_line(df, "average"))
    assert out == {("a", 0): 2.0, ("a", 60): 2.0, ("a", 120): 2.0}


def test_time_stack_shifts_and_names(spark):
    from biggraphite_spark.functions.series import time_stack

    df = spark.createDataFrame([("a", 100, 1.0)], "name string, ts long, value double")
    out = {(r["name"], r["ts"]) for r in time_stack(df, 10, 0, 3).collect()}
    assert out == {("a.shift_0", 100), ("a.shift_1", 110), ("a.shift_2", 120)}


def test_fallback_series_both_paths(spark):
    from biggraphite_spark.functions.series import fallback_series

    primary = spark.createDataFrame([("p", 0, 1.0)], "name string, ts long, value double")
    empty = primary.filter("name = 'nope'")
    fb = spark.createDataFrame([("f", 0, 9.0)], "name string, ts long, value double")
    assert _as_dict(fallback_series(primary, fb)) == {("p", 0): 1.0}
    assert _as_dict(fallback_series(empty, fb)) == {("f", 0): 9.0}


def test_generators(spark):
    from biggraphite_spark.functions.series import constant_line, time_function

    cl = constant_line(spark, 7.5, 100, 400, 100).collect()
    assert [(r["ts"], r["value"]) for r in cl] == [(100, 7.5), (200, 7.5), (300, 7.5)]
    tf = time_function(spark, "t", 100, 300, 100).collect()
    assert [(r["ts"], r["value"]) for r in tf] == [(100, 100.0), (200, 200.0)]


def test_map_reduce_series(spark):
    from biggraphite_spark.functions.series import map_series, reduce_series

    rows = [
        ("h1.disk.used", 0, 30.0), ("h1.disk.total", 0, 100.0),
        ("h2.disk.used", 0, 10.0), ("h2.disk.total", 0, 40.0),
        ("h1.disk.free", 0, 70.0),  # unmatched role: ignored
    ]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    out = _as_dict(reduce_series(df, "asPercent", 2, "used", "total"))
    assert out == {("h1.disk.asPercent", 0): 30.0, ("h2.disk.asPercent", 0): 25.0}
    div = _as_dict(reduce_series(df, "divideSeries", 2, "used", "total"))
    assert div[("h1.disk.divideSeries", 0)] == 0.3
    keys = {r["map_key"] for r in map_series(df, 0).collect()}
    assert keys == {"h1", "h2"}
    import pytest as _pt

    with _pt.raises(ValueError):
        reduce_series(df, "nope", 2, "used", "total")


def test_zscore_outliers_golden(spark):
    import statistics

    from biggraphite_spark.functions.series import zscore_outliers

    vals = [10.0, 10.0, 10.0, 10.0, 50.0]
    rows = spark.createDataFrame(
        [("m", i, v) for i, v in enumerate(vals)] + [("flat", 0, 5.0), ("flat", 1, 5.0)],
        ["name", "ts", "value"],
    )
    got = {(r.name, r.ts): r for r in zscore_outliers(rows, threshold=1.5).collect()}
    mu, sd = statistics.mean(vals), statistics.stdev(vals)
    for i, v in enumerate(vals):
        want = round((v - mu) / sd, 6)
        assert got[("m", i)].z == want
        assert got[("m", i)].is_outlier == (abs(want) > 1.5)
    assert got[("m", 4)].is_outlier is True
    # flat series: sd == 0 -> null z, never flagged
    assert got[("flat", 0)].z is None and got[("flat", 0)].is_outlier is False


def test_seasonal_decompose_recovers_planted_cycle(spark):
    """A pure sine-free synthetic: value = linear trend + fixed per-phase
    offset.  The decomposition must recover the phase offsets (centered)
    and leave ~zero residual away from the edges."""
    import pytest as _pytest

    from biggraphite_spark.functions.series import seasonal_decompose

    period, step = 4, 60
    offsets = [10.0, -2.0, 0.0, -8.0]  # sums to 0 -> already centered
    rows = [
        ("m", t * step, 100.0 + 0.0 * t + offsets[t % period])
        for t in range(40)
    ]
    df = spark.createDataFrame(rows, ["name", "ts", "value"])
    out = {r["ts"]: r for r in seasonal_decompose(df, step, period).collect()}
    # interior rows: trend = flat 100 (the window mean of a constant-trend
    # series with balanced phases), seasonal = planted offset, residual ~ 0
    for t in range(3, 37):
        r = out[t * step]
        assert r["trend"] == _pytest.approx(100.0, abs=1e-6)
        assert r["seasonal"] == _pytest.approx(offsets[t % period], abs=1e-6)
        assert r["residual"] == _pytest.approx(0.0, abs=1e-6)
    # edges have no complete window -> null trend and residual
    assert out[0]["trend"] is None and out[0]["residual"] is None

    with _pytest.raises(ValueError):
        seasonal_decompose(df, step, 1)
