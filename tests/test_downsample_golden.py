"""Reference downsampler golden sequences + fixture invariants.

Sources: FIXTURES.md §2a/§2b, mirroring the reference's
tests/drivers/test_drivers_downsampling.py:59-185 and
tests/test_utils.py:116-137 (_make_easily_queryable_points).
"""

import pytest
from pyspark.sql import functions as F

from biggraphite_spark.model import Retention, Stage
from biggraphite_spark.operators.downsample import (
    copy_to_retention,
    downsample_all,
    downsample_stage0,
    normalize_stage0,
    rollup_partials,
    with_aggregator,
)

# retention 3*10s:3*100s from the reference's downsampler suite
STAGE0 = Stage.from_string("3*10s_0")
STAGE1 = Stage.from_string("3*100s")


def _run(spark, feed, aggregator):
    """Feed (ts, value) pairs (in arrival order) through slot-normalize +
    downsample to stage1; return {ts: (value, count)}."""
    rows = [("m", ts, float(v), i) for i, (ts, v) in enumerate(feed)]
    pts = spark.createDataFrame(rows, "name string, ts long, value double, arrival long")
    slots = normalize_stage0(pts, STAGE0, arrival_col="arrival")
    catalog = spark.createDataFrame([("m", aggregator)], "name string, aggregator string")
    out = downsample_stage0(with_aggregator(slots, catalog), STAGE1)
    return {r["ts"]: (r["value"], r["count"]) for r in out.collect()}


def test_golden_total_with_slot_overwrite(spark):
    # reference test_drivers_downsampling.py:133-163: (0,1) is overwritten by
    # (1,2) inside the 10s slot; the two ts=300 points collapse to the
    # last-arriving 1501
    got = _run(spark, [(0, 1), (1, 2), (10, 15), (30, 25), (60, 150), (300, 1500), (300, 1501)], "total")
    assert got[0] == (192.0, 4)  # 2+15+25+150
    assert got[300] == (1501.0, 1)


def test_golden_out_of_order(spark):
    # reference :165-185: newest-ts wins per slot regardless of arrival order
    got = _run(spark, [(101, 42), (100, 84), (9, 1), (10, 2), (0, -10)], "total")
    assert got[0] == (3.0, 2)  # slots: (0..9)->1 (ts 9 beats ts 0), (10..19)->2
    assert got[100] == (42.0, 1)  # ts 101 beats ts 100 in slot 100..109


def test_golden_average_carries_sum(spark):
    got = _run(spark, [(0, 1), (1, 2), (10, 15), (30, 25), (60, 150)], "average")
    assert got[0] == (192.0, 4)  # stored partial is the SUM; division at read


def test_downsample_all_composes_slot_dedup(spark):
    """downsample_all must normalize stage0 slots BEFORE aggregating — a
    resent value in one slot contributes once (the newest), not twice
    (reference ring buffer, drivers/_downsampling.py:128-189).  The same
    overwrite feed as test_golden_total_with_slot_overwrite, but driven
    through the default pipeline entry point."""
    feed = [(0, 1), (1, 2), (10, 15), (30, 25), (60, 150), (300, 1500), (300, 1501)]
    rows = [("m", ts, float(v), i) for i, (ts, v) in enumerate(feed)]
    pts = spark.createDataFrame(rows, "name string, ts long, value double, arrival long")
    catalog = spark.createDataFrame([("m", "total")], "name string, aggregator string")
    ret = Retention.from_string("3*10s:3*100s")
    out = downsample_all(pts, catalog, list(ret.stages), arrival_col="arrival")
    got = {r["ts"]: (r["value"], r["count"]) for r in out["3*100s"].collect()}
    assert got[0] == (192.0, 4)     # slot 0 keeps 2, not 1+2
    assert got[300] == (1501.0, 1)  # same-ts resend: last arrival wins
    # opt-out restores raw aggregation (single-shuffle plan for known-unique feeds)
    raw = downsample_all(pts, catalog, list(ret.stages), dedup_slots=False)
    got_raw = {r["ts"]: (r["value"], r["count"]) for r in raw["3*100s"].collect()}
    assert got_raw[0] == (193.0, 5)
    assert got_raw[300] == (3001.0, 2)


# ---------------------------------------------------------------------------
# _make_easily_queryable_points invariants (FIXTURES §2a)
# ---------------------------------------------------------------------------

def _easy_points(start, end, period):
    """3 of 4 quarter-points per period: -1, +1, 3*index, (missing)."""
    pts = []
    q = period // 4
    idx0 = start // period
    for t in range(start, end, period):
        i = t // period
        pts.append((t + 0 * q, -1.0))
        pts.append((t + 1 * q, 1.0))
        pts.append((t + 2 * q, 3.0 * i))
    return pts


def test_easy_fixture_invariants(spark):
    period = 40
    pts = _easy_points(0, 400, period)
    rows = [("m", ts, v) for ts, v in pts]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    for agg, expect in [
        ("average", lambda i: i),
        ("maximum", lambda i: 3 * i if i >= 1 else 1),
        ("minimum", lambda i: -1),
    ]:
        catalog = spark.createDataFrame([("m", agg)], "name string, aggregator string")
        stage = Stage.from_string(f"10*{period}s")
        out = downsample_stage0(with_aggregator(df, catalog), stage)
        got = {r["ts"] // period: (r["value"], r["count"]) for r in out.collect()}
        for i in range(10):
            value, count = got[i]
            assert count == 3, (agg, i)
            if agg == "average":
                assert value / count == pytest.approx(expect(i)), (agg, i)
            else:
                assert value == pytest.approx(expect(i)), (agg, i)


# ---------------------------------------------------------------------------
# copy with retention override
# ---------------------------------------------------------------------------

def test_copy_to_retention_reaggregates(spark):
    rows = [("m", h * 3600, float(h), 2, "total") for h in range(48)]
    hourly = spark.createDataFrame(
        rows, "name string, ts long, value double, count long, aggregator string"
    )
    src = Retention.from_string("86400*1s:1000*3600s")
    dst = Retention.from_string("86400*1s:500*7200s:100*86400s")
    out = copy_to_retention({"1000*3600s": hourly}, src, dst)
    assert set(out) == {"500*7200s", "100*86400s"}
    two_h = {r["ts"]: (r["value"], r["count"]) for r in out["500*7200s"].collect()}
    assert two_h[0] == (1.0, 4)  # hours 0+1, counts 2+2
    daily = {r["ts"]: (r["value"], r["count"]) for r in out["100*86400s"].collect()}
    assert daily[0] == (sum(range(24)), 48)


def test_copy_skips_incompatible_stage(spark):
    hourly = spark.createDataFrame(
        [("m", 0, 1.0, 1, "total")],
        "name string, ts long, value double, count long, aggregator string",
    )
    src = Retention.from_string("86400*1s:1000*3600s")
    dst = Retention.from_string("60*60s:100*5400s")  # 90min not divisible by 1h
    out = copy_to_retention({"1000*3600s": hourly}, src, dst)
    assert out == {}
