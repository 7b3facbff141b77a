"""Golden semantics tests for the pure-Python kernel.

Test vectors mirror the reference's own unit suite (tests/test_accessor.py,
tests/test_metric.py of criteo/biggraphite) as catalogued in FIXTURES.md §2c
and §4.
"""

import math

import pytest

from biggraphite_spark.model import (
    DEFAULT_RETENTION_STR,
    Aggregator,
    InvalidArgumentError,
    Retention,
    Stage,
    components_from_name,
    metric_id,
    parent_name,
    sanitize_metric_name,
)

NAN = float("nan")


# ---------------------------------------------------------------------------
# Stage / Retention codecs (reference: tests/test_accessor.py:99-179)
# ---------------------------------------------------------------------------

def test_stage_codec_roundtrip():
    st = Stage.from_string("86400*1s")
    assert (st.points, st.precision, st.duration) == (86400, 1, 86400)
    assert st.as_string() == "86400*1s"
    assert Stage.from_string("10080*60s_aggr").as_string(with_suffix=True) == "10080*60s_aggr"
    assert Stage.from_string("86400*1s_0").stage0


def test_stage_table_name():
    # per-stage table naming, reference drivers/cassandra.py:1026-1033
    assert Stage(86400, 1, stage0=True).table_name == "datapoints_86400p_1s_0"
    assert Stage(10080, 60).table_name == "datapoints_10080p_60s_aggr"


@pytest.mark.parametrize("bad", ["", "60*60", "x*1s", "60*60s:1*1234s", "60*1s:15*2s"])
def test_invalid_retentions_rejected(bad):
    # FIXTURES §4: precision must be a multiple, durations strictly increasing
    with pytest.raises(InvalidArgumentError):
        Retention.from_string(bad)


def test_retention_parse_and_props():
    r = Retention.from_string(DEFAULT_RETENTION_STR)
    assert len(r.stages) == 2
    assert r.stage0.stage0 and not r.stages[1].stage0
    assert r.duration == 10080 * 60
    assert r.points == 86400 + 10080
    assert r.as_string() == DEFAULT_RETENTION_STR


def test_stage_rounding():
    st = Stage(60, 60, stage0=True)
    assert st.round_down(61) == 60
    assert st.round_up(61) == 120
    assert st.round_down(60) == 60
    assert st.round_up(60) == 60
    assert st.step(121) == 2


# ---------------------------------------------------------------------------
# align_time_window golden rows (FIXTURES §4; reference test_accessor.py:163-178)
# ---------------------------------------------------------------------------

@pytest.fixture()
def retention():
    return Retention.from_string("60*60s:24*3600s")


@pytest.mark.parametrize(
    "start,end,now,exp_start,exp_end,exp_stage",
    [
        (61, 119, 1200, 60, 120, "60*60s"),
        (59, 121, 1200, 0, 180, "60*60s"),
        (59, 3601, 8000, 0, 7200, "24*3600s"),
    ],
)
def test_align_time_window_golden(retention, start, end, now, exp_start, exp_end, exp_stage):
    s, e, stage = retention.align_time_window(start, end, now)
    assert (s, e, stage.as_string()) == (exp_start, exp_end, exp_stage)


def test_align_time_window_clamps_to_now(retention):
    s, e, stage = retention.align_time_window(1100, 99999, 1200)
    assert e == 1200 and stage.as_string() == "60*60s"


def test_find_stage_for_ts(retention):
    # finest stage covering the searched ts; coarsest as fallback
    assert retention.find_stage_for_ts(7000, 8000).as_string() == "60*60s"
    assert retention.find_stage_for_ts(59, 8000).as_string() == "24*3600s"
    assert retention.find_stage_for_ts(-10**9, 8000).as_string() == "24*3600s"


# ---------------------------------------------------------------------------
# Aggregators (FIXTURES §2c; reference tests/test_accessor.py:34-97)
# ---------------------------------------------------------------------------

VALUES = [NAN, 0, 1, NAN, 2, 3, NAN]  # newest first
COUNTS = [0, 1, 1, 0, 2, 1, 0]


@pytest.mark.parametrize(
    "name,expected",
    [("average", 1.2), ("last", 0), ("minimum", 0), ("maximum", 3), ("total", 6)],
)
def test_aggregate_golden(name, expected):
    assert Aggregator(name).aggregate(VALUES, COUNTS) == expected


def test_aggregate_all_nan_is_nan():
    for name in Aggregator.NAMES:
        assert math.isnan(Aggregator(name).aggregate([NAN, NAN], [0, 0]))
        assert math.isnan(Aggregator(name).aggregate([], []))


@pytest.mark.parametrize(
    "name,expected",
    [
        ("average", (30, 2)),
        ("last", (20, 2)),
        ("minimum", (10, 2)),
        ("maximum", (20, 2)),
        ("total", (30, 2)),
    ],
)
def test_merge_golden(name, expected):
    assert Aggregator(name).merge([10, 20], [1, 1]) == expected


def test_merge_skips_nan():
    v, c = Aggregator("last").merge([10, NAN], [1, 5])
    assert (v, c) == (10, 1)


def test_carbon_aliases():
    assert Aggregator("avg").name == "average"
    assert Aggregator("sum").name == "total"
    with pytest.raises(InvalidArgumentError):
        Aggregator("avg_zero")  # explicitly TODO in the reference, metric.py:210


# ---------------------------------------------------------------------------
# Names
# ---------------------------------------------------------------------------

def test_name_hygiene():
    assert components_from_name("a..b.c") == ["a", "b", "c"]
    assert sanitize_metric_name(".a..b.") == "a.b"
    assert parent_name("a.b.c") == "a.b"
    assert parent_name("a") == ""


def test_metric_id_stable_and_distinct():
    assert metric_id("a.b.c") == metric_id("a.b.c")
    assert metric_id("a.b.c") != metric_id("a.b.d")
    assert len(metric_id("a.b.c")) == 36  # uuid shape
