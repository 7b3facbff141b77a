"""Holt-Winters forecasting (graphite's holtWintersForecast /
ConfidenceBands / Aberration) as an ``applyInPandas`` operator.

Graphite-web ships a triple-exponential-smoothing analysis (additive
seasonality, alpha=0.1, beta=0.0035, gamma=0.1, season = one day of
buckets, confidence delta = 3 deviations) driving its dashboard anomaly
bands.  The recurrence is inherently sequential per series — every bucket's
state depends on the previous bucket AND the same bucket one season ago —
so unlike everything else in ``functions/series.py`` it cannot be a
Column/Window expression.  This is the designed escape hatch: Arrow-batched
``applyInPandas`` per metric, vectorized across series (each group's loop is
a tight numpy-scalar recurrence; groups run in parallel across cores /
executors, which is the axis that matters at fleet scale — millions of
metrics, each a short series).

Semantics follow graphite-web's render/functions.py holtWintersAnalysis
(public): None buckets carry the last prediction forward with zeroed
seasonal state; the first season bootstraps from zeros, so callers wanting
graphite's exact dashboard output fetch one extra season and trim it —
``bootstrap_trim`` does exactly that.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ALPHA = 0.1
BETA = 0.0035
GAMMA = 0.1
DELTA = 3.0  # confidence band width, in deviations

HW_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("forecast", T.DoubleType()),
        T.StructField("upper", T.DoubleType()),
        T.StructField("lower", T.DoubleType()),
        T.StructField("aberration", T.DoubleType()),
    ]
)


def _analysis(values: list, season_length: int) -> tuple[list, list]:
    """The graphite recurrence: returns (predictions, deviations)."""
    intercepts: list = []
    slopes: list = []
    seasonals: list = []
    predictions: list = []
    deviations: list = []

    def last_seasonal(i: int) -> float:
        j = i - season_length
        return seasonals[j] if j >= 0 else 0.0

    def last_deviation(i: int) -> float:
        j = i - season_length
        return deviations[j] if j >= 0 else 0.0

    next_pred = None
    for i, actual in enumerate(values):
        if actual is None:
            # graphite zeroes the slope across a gap (functions.py
            # holtWintersAnalysis: slopes.append(0)); the recurrence resumes
            # from zero slope at the next known bucket, NOT the stale one
            intercepts.append(None)
            slopes.append(0.0)
            seasonals.append(0.0)
            predictions.append(next_pred)
            deviations.append(0.0)
            next_pred = None
            continue
        if i == 0:
            last_intercept = actual
            last_slope = 0.0
            prediction = actual
        else:
            last_intercept = intercepts[-1]
            last_slope = slopes[-1]
            if last_intercept is None:
                last_intercept = actual
            prediction = next_pred
        seasonal_now = last_seasonal(i)
        seasonal_dev = last_deviation(i)
        intercept = ALPHA * (actual - seasonal_now) + (1 - ALPHA) * (
            last_intercept + last_slope
        )
        slope = BETA * (intercept - last_intercept) + (1 - BETA) * last_slope
        seasonal = GAMMA * (actual - intercept) + (1 - GAMMA) * seasonal_now
        next_pred = intercept + slope + last_seasonal(i + 1)
        pred_for_dev = 0.0 if prediction is None else prediction
        deviation = GAMMA * abs(actual - pred_for_dev) + (1 - GAMMA) * seasonal_dev
        intercepts.append(intercept)
        slopes.append(slope)
        seasonals.append(seasonal)
        predictions.append(prediction)
        deviations.append(deviation)
    return predictions, deviations


def holt_winters(
    series: DataFrame, step: int, season_length: int | None = None
) -> DataFrame:
    """Forecast + confidence bands + aberration per series.

    Input: dense (name, ts, value) buckets at ``step`` seconds (gap-fill
    first — see operators.gapfill.dense_series).  ``season_length`` defaults
    to graphite's one day of buckets.  Output adds forecast, upper/lower
    (forecast ± DELTA·deviation) and aberration (signed band excursion).
    """
    season = season_length if season_length is not None else max(86400 // step, 1)

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.sort_values("ts")
        vals = [None if pd.isna(v) else float(v) for v in g["value"]]
        preds, devs = _analysis(vals, season)
        out = pd.DataFrame(
            {
                "name": key[0],
                "ts": g["ts"].to_numpy(),
                "value": g["value"].to_numpy(),
                "forecast": pd.array(preds, dtype="Float64"),
                "deviation": pd.array(devs, dtype="Float64"),
            }
        )
        out["upper"] = out["forecast"] + DELTA * out["deviation"]
        out["lower"] = out["forecast"] - DELTA * out["deviation"]
        above = out["value"] > out["upper"]
        below = out["value"] < out["lower"]
        out["aberration"] = ((out["value"] - out["upper"]).where(above, 0.0)) + (
            (out["value"] - out["lower"]).where(below, 0.0)
        )
        return out[
            ["name", "ts", "value", "forecast", "upper", "lower", "aberration"]
        ]

    # grouped applyInPandas: each series' recurrence runs whole in one call
    # (an Arrow batch boundary must never cut a recurrence); parallelism is
    # across series, the axis that matters at fleet scale.  The explicit
    # repartition is load-bearing: series data is tiny in BYTES, so AQE
    # coalesces the groupBy exchange to ONE partition and every group's
    # Python recurrence runs on a single core — byte-based coalescing is
    # blind to per-row Python cost.  A user repartition pins the width and
    # already hash-distributes by name, so the groupBy needs no second
    # exchange.
    n = series.sparkSession.sparkContext.defaultParallelism
    return series.repartition(n, "name").groupBy("name").applyInPandas(fn, HW_SCHEMA)


def bootstrap_trim(forecast: DataFrame, start_ts: int) -> DataFrame:
    """Drop the warm-up season (graphite fetches 7 extra days and trims):
    keep buckets at/after ``start_ts``."""
    return forecast.filter(F.col("ts") >= start_ts)


EMA_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def exponential_moving_average(series: DataFrame, window: int) -> DataFrame:
    """``exponentialMovingAverage``: SMA-bootstrapped EMA per series.

    Contract (stated precisely because EMA variants differ): smoothing
    constant ``c = 2/(window+1)``; the first ``window`` buckets emit null
    except the last of them, which emits the arithmetic mean of the known
    values seen so far (the bootstrap); from there, a known bucket emits
    ``c·x + (1-c)·ema`` and advances the state, a null bucket emits null
    and carries the state.  An all-null bootstrap window starts the EMA at
    the first known value.  Sequential per series like the Holt-Winters
    recurrence — same grouped-applyInPandas escape hatch, same explicit
    repartition so AQE's byte-based coalescing can't serialize the Python
    work onto one core.
    """
    c = 2.0 / (window + 1)

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.sort_values("ts")
        out: list = []
        ema = None
        boot_sum, boot_cnt = 0.0, 0
        for i, v in enumerate(g["value"]):
            x = None if pd.isna(v) else float(v)
            if i < window:
                if x is not None:
                    boot_sum += x
                    boot_cnt += 1
                if i == window - 1 and boot_cnt > 0:
                    ema = boot_sum / boot_cnt
                    out.append(ema)
                else:
                    out.append(None)
                continue
            if x is None:
                out.append(None)
                continue
            ema = x if ema is None else c * x + (1 - c) * ema
            out.append(ema)
        return pd.DataFrame(
            {"name": key[0], "ts": g["ts"].to_numpy(),
             "value": pd.array(out, dtype="Float64")}
        )

    n = series.sparkSession.sparkContext.defaultParallelism
    return series.repartition(n, "name").groupBy("name").applyInPandas(fn, EMA_SCHEMA)
