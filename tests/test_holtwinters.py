"""Holt-Winters forecast/bands/aberration (functions/holtwinters.py).

Semantic pins (graphite-web holtWintersAnalysis is the contract):
constant series converge to the constant with shrinking deviation; a spike
breaks the upper band with positive aberration; the recurrence matches a
directly-evaluated pure-Python reference on a mixed fixture.
"""

import pytest
from pyspark.sql import functions as F

from biggraphite_spark.functions.holtwinters import (
    DELTA,
    _analysis,
    bootstrap_trim,
    holt_winters,
)


def _rows(spark, values, name="m", step=60):
    rows = [(name, i * step, v) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "name string, ts long, value double")


def test_constant_series_converges(spark):
    df = _rows(spark, [5.0] * 50)
    out = holt_winters(df, step=60, season_length=10).orderBy("ts").collect()
    tail = out[-1]
    assert tail["forecast"] == pytest.approx(5.0, abs=0.2)
    assert tail["aberration"] == 0.0
    assert tail["lower"] <= 5.0 <= tail["upper"]


def test_spike_breaks_band(spark):
    vals = [1.0] * 40 + [100.0]
    out = (
        holt_winters(_rows(spark, vals), step=60, season_length=10)
        .orderBy("ts")
        .collect()
    )
    spike = out[-1]
    assert spike["value"] > spike["upper"]
    assert spike["aberration"] == pytest.approx(spike["value"] - spike["upper"])
    # everything before the spike sits inside the settled band
    assert all(r["aberration"] == 0.0 for r in out[20:-1])


def test_matches_reference_recurrence(spark):
    vals = [1.0, 2.0, None, 4.0, 3.0, 2.0, 5.0, None, 1.0, 2.0, 3.0, 4.0]
    season = 4
    preds, devs = _analysis([v for v in vals], season)
    out = (
        holt_winters(_rows(spark, vals), step=60, season_length=season)
        .orderBy("ts")
        .collect()
    )
    for i, r in enumerate(out):
        if preds[i] is None:
            assert r["forecast"] is None
        else:
            assert r["forecast"] == pytest.approx(preds[i])
            assert r["upper"] == pytest.approx(preds[i] + DELTA * devs[i])


def test_gap_resets_slope_to_graphite_values(spark):
    """Hand-computed graphite golden across a mid-series gap — pinned to
    numbers worked out on paper from graphite-web's holtWintersAnalysis
    (alpha=0.1, beta=0.0035, gamma=0.1), NOT to _analysis, so a drift in
    the implementation can't hide in its own twin.  The decisive value is
    the post-gap forecast: graphite appends slope 0 for a None bucket, so
    the 12.0 bucket restarts from zero slope (a stale pre-gap slope of
    0.0035 would shift the next forecast to ~11.916334)."""
    vals = [10.0, 20.0, None, 12.0, 13.0]
    out = (
        holt_winters(_rows(spark, vals), step=60, season_length=2)
        .orderBy("ts")
        .collect()
    )
    expected_forecast = [10.0, 10.0, 11.0035, None, 11.909685]
    expected_deviation = [0.0, 1.0, 0.0, 2.1, 0.1090315]
    for r, want_f, want_d in zip(out, expected_forecast, expected_deviation):
        if want_f is None:
            assert r["forecast"] is None
        else:
            assert r["forecast"] == pytest.approx(want_f, abs=1e-9)
            assert r["upper"] == pytest.approx(want_f + DELTA * want_d, abs=1e-9)
            assert r["lower"] == pytest.approx(want_f - DELTA * want_d, abs=1e-9)


def test_exponential_moving_average(spark):
    """EMA contract: SMA bootstrap over the first window (emitted at its
    last bucket), then c·x + (1-c)·ema with c = 2/(w+1); nulls emit null
    and carry the state."""
    from biggraphite_spark.functions.holtwinters import exponential_moving_average

    vals = [3.0, 6.0, None, 12.0, None, 24.0]
    out = [
        r["value"]
        for r in exponential_moving_average(_rows(spark, vals), 3)
        .orderBy("ts")
        .collect()
    ]
    c = 0.5  # 2/(3+1)
    boot = (3.0 + 6.0) / 2  # null inside the bootstrap window is skipped
    e3 = c * 12.0 + (1 - c) * boot
    e5 = c * 24.0 + (1 - c) * e3
    assert out[0] is None and out[1] is None
    assert out[2] == pytest.approx(boot)
    assert out[3] == pytest.approx(e3)
    assert out[4] is None  # gap emits null, carries state
    assert out[5] == pytest.approx(e5)


def test_bootstrap_trim(spark):
    df = _rows(spark, [1.0] * 20)
    out = holt_winters(df, step=60, season_length=5)
    trimmed = bootstrap_trim(out, 10 * 60)
    assert trimmed.count() == 10
    assert trimmed.agg(F.min("ts")).collect()[0][0] == 600
