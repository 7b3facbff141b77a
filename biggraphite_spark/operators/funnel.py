"""Conversion funnels over event streams.

Beyond-reference operator: the time-bounded ordered funnel every product
analytics stack ships (Amplitude/Mixpanel semantics) — step *i* matches
the earliest qualifying event STRICTLY AFTER step *i-1* and within a
conversion window of it; users are counted at the deepest step their
earliest chain reaches (greedy-earliest matching).

Scale shape: ONE shuffle on the user key.  Events are filtered to the
step types, grouped per user into a timestamp-sorted array, and the whole
chain is computed by a single ``aggregate`` fold over that array — no
per-step join, no window function over the raw stream.  Per-user state is
the k-slot timestamp struct, and the per-user array is bounded by that
user's own step-typed events (the same bound any sessionization carries).
The unbounded funnel (events_funnel) is the window → ∞ special case of
the same plan.
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
    cols = [f"t_{s}" for s in steps]
    # per-user timestamp-sorted event array: the only shuffle in the plan
    evs = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).cast("long").alias("ts"),
                F.col(type_col).alias("et"),
            )
        )
    )
    per_user = (
        events.filter(F.col(type_col).isin(*steps))
        .select(user_col, type_col, ts_col)
        .groupBy(user_col)
        .agg(evs.alias("__evs"))
    )

    # left-to-right fold: because the array is ts-ascending, the FIRST
    # event that qualifies for step i (given the already-fixed t_{i-1}) is
    # exactly the MIN the per-step join used to compute — greedy-earliest
    # falls out of the scan order.  Each event credits at most one step
    # (first matching branch wins), and ties at the same second order by
    # (ts, et), which cannot change the result: a step-i event at
    # ts == t_{i-1} is excluded by the strict `>` either way.
    init = F.struct(*[F.lit(None).cast("long").alias(c) for c in cols])

    def _advance(acc, x):
        branch = None
        for i, (s, c) in enumerate(zip(steps, cols)):
            if i == 0:
                cond = (x.getField("et") == s) & acc.getField(c).isNull()
            else:
                prev = acc.getField(cols[i - 1])
                cond = (
                    (x.getField("et") == s)
                    & prev.isNotNull()
                    & acc.getField(c).isNull()
                    & (x.getField("ts") > prev)
                    & (x.getField("ts") <= prev + window_s)
                )
            taken = F.struct(
                *[
                    (x.getField("ts") if j == i else acc.getField(cc)).alias(cc)
                    for j, cc in enumerate(cols)
                ]
            )
            branch = (
                F.when(cond, taken) if branch is None else branch.when(cond, taken)
            )
        return branch.otherwise(acc)

    folded = per_user.select(
        user_col, F.aggregate("__evs", init, _advance).alias("__f")
    )
    reached = F.lit(1)
    for c in cols[1:]:
        reached = reached + F.col("__f").getField(c).isNotNull().cast("int")
    return (
        folded.filter(F.col("__f").getField(cols[0]).isNotNull())
        .select(
            user_col,
            *[F.col("__f").getField(c).alias(c) for c in cols],
            reached.cast("long").alias("steps"),
        )
    )


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


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "sec",
    tie_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    for each consecutive pair within a user's timeline, count
    (from_type → to_type) and its row-normalized probability — the
    user-behavior-model summary (next-action prediction priors, anomaly
    baselines) product analytics derives from raw streams.

    Total order inside a user is (ts, event id): timestamps collide in
    real streams, so the deterministic tie column is part of the
    contract.  Shape: one lead() window per user (single shuffle on the
    user key), then a (from, to)-keyed hash agg — transition-matrix-sized
    output regardless of stream volume.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(tie_col).asc()
    )
    pairs = (
        events.select(
            user_col,
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(total) + 1.23e-9, 6
        ).alias("p"),
    )


def entry_paths(
    events: DataFrame,
    depth: int = 8,
    top: int = 20,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "sec",
    tie_col: str = "event_id",
) -> DataFrame:
    """Top entry journeys: each user's first ``depth`` events joined into
    a ``a>b>c`` path string, counted across users, top ``top`` paths by
    (count DESC, path ASC) — the onboarding-flow mining query.

    ``depth`` bounds the path string at EVERY scale (per-user event
    counts grow with data; the truncated prefix does not).  Shape: one
    user-keyed window (rank ≤ depth compiles to WindowGroupLimit), one
    path hash agg, one top-k.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(tie_col).asc()
    )
    firsts = (
        events.select(
            user_col,
            F.col(type_col).alias("t"),
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= depth)
    )
    paths = (
        firsts.groupBy(user_col)
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rk", "t"))
                    ),
                    lambda s: s["t"],
                ),
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    # TakeOrdered top-k first (per-partition top-k, no all-to-one shuffle
    # of the path relation), THEN the rank window over only `top` rows
    winners = paths.orderBy(F.desc("n_users"), F.col("path").asc()).limit(top)
    rk = Window.orderBy(F.desc("n_users"), F.col("path").asc())
    return winners.select(
        "path", "n_users", F.row_number().over(rk).cast("long").alias("rk")
    )
