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
    with pytest.raises(ValueError, match="unknown series function"):
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
    out = _as_dict(S.remove_above_percentile(df, 0.5))
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
    got = _as_dict(S.n_percentile(two_series, 0.5))
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
    out = _as_dict(S.remove_below_percentile(df, 0.5))
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
