"""Conversion funnels over event streams.

Beyond-reference operator: the time-bounded ordered funnel every product
analytics stack ships (Amplitude/Mixpanel semantics) — step *i* matches
the earliest qualifying event STRICTLY AFTER step *i-1* and within a
conversion window of it; users are counted at the deepest step their
earliest chain reaches (greedy-earliest matching).

Scale shape: one conditional min-aggregation per step chained by
equi-joins on the user key — every stage co-partitions on the same key so
AQE reuses the exchange, and no window function ever scans the full event
stream.  The unbounded funnel (events_funnel) is the window → ∞ special
case of the same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_funnel(
    events: DataFrame,
    steps: list[str],
    window_s: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "sec",
) -> DataFrame:
    """Per-user funnel chain with a ``window_s``-second conversion bound
    between consecutive steps.

    Output: ``user_col``, one ``t_<step>`` column per step (null once the
    chain breaks), and ``steps`` = how deep the chain reached.  Greedy
    earliest-match semantics: each step takes its earliest qualifying
    event; a later first-step event that would have converted is not
    explored (the standard funnel-tool contract, documented because it is
    a choice, not a law).
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    if window_s <= 0:
        raise ValueError("window_s must be positive")
    e = events.select(user_col, type_col, ts_col)
    cols = [f"t_{s}" for s in steps]
    out = (
        e.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias(cols[0]))
    )
    for prev, (step, col) in zip(cols, list(zip(steps, cols))[1:]):
        nxt = (
            e.filter(F.col(type_col) == step)
            .join(out.select(user_col, prev).filter(F.col(prev).isNotNull()), user_col)
            .filter(
                (F.col(ts_col) > F.col(prev))
                & (F.col(ts_col) <= F.col(prev) + window_s)
            )
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(col))
        )
        out = out.join(nxt, user_col, "left")
    reached = F.lit(1)
    for col in cols[1:]:
        reached = reached + F.col(col).isNotNull().cast("int")
    return out.select(user_col, *cols, reached.cast("long").alias("steps"))


def attribution(
    events: DataFrame,
    touch_types: list[str],
    conversion_type: str,
    window_s: int,
    model: str = "last_touch",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "sec",
) -> DataFrame:
    """Single-touch conversion attribution: credit each conversion event to
    one qualifying touch within ``window_s`` seconds before it (inclusive
    of same-second touches) — last-touch or first-touch, the two
    single-touch models marketing analytics defaults to.

    Ties on the touch timestamp break by event type (max for last-touch,
    min for first-touch) via struct ordering, so the credit is
    deterministic across engines.  Output: one row per (user, conversion
    time) that HAS a qualifying touch: user, conv ts, credited touch ts +
    type.

    Shape: one user-keyed equi-join with the window bound as a join-time
    filter, then one (user, conversion) aggregation — co-partitioned on
    the user key throughout, no window over the raw stream.
    """
    if model not in ("last_touch", "first_touch"):
        raise ValueError(f"unknown attribution model {model!r}")
    if window_s <= 0:
        raise ValueError("window_s must be positive")
    conv = (
        events.filter(F.col(type_col) == conversion_type)
        .select(user_col, F.col(ts_col).alias("conv_sec"))
        .distinct()
    )
    touches = events.filter(F.col(type_col).isin(*touch_types)).select(
        user_col,
        F.col(ts_col).alias("touch_sec"),
        F.col(type_col).alias("touch_type"),
    )
    j = touches.join(conv, user_col).filter(
        (F.col("touch_sec") <= F.col("conv_sec"))
        & (F.col("touch_sec") > F.col("conv_sec") - window_s)
    )
    pick = F.max if model == "last_touch" else F.min
    best = pick(F.struct("touch_sec", "touch_type")).alias("b")
    return (
        j.groupBy(user_col, "conv_sec")
        .agg(best)
        .select(
            user_col,
            "conv_sec",
            F.col("b.touch_sec").alias("touch_sec"),
            F.col("b.touch_type").alias("touch_type"),
        )
    )
