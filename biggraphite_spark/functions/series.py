"""Graphite-render-style series functions as DataFrame transformations.

The reference's own query surface stops at glob find + fetch + regroup
(SURVEY.md §0): the render-function library (``sumSeries``, ``movingAverage``,
``summarize``, …) lives in graphite-web, one layer above
biggraphite/plugins/graphite.py:433-496, which only feeds it aligned series.
A user switching from the reference still runs those functions on every
dashboard, so this module re-expresses the common ones Spark-first: every
function is a Column/Window expression over the canonical fetched shape
``(name, ts, value)`` — no UDFs, no driver-side loops, whole-stage codegen
end to end.

Scale notes: per-series functions (`moving`, `derivative`, `integral`,
`keep_last_value`) partition their window by ``name`` — with name-bucketed
storage they need no exchange at all; across-series combinators (`combine`,
`percentile_of_series`) shuffle on ``ts``, whose cardinality is the window
length (small), so the exchange is cheap at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_COMBINE = {
    "sum": F.sum,
    "average": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
}


#: graphite accepts several spellings per aggregate (render/functions.py
#: aggFuncNames/aggFuncAliases); normalize before lookup
_AGG_ALIASES = {
    "avg": "average",
    "total": "sum",
    "current": "last",
    "rangeOf": "range",
}

#: aggregate names agg_expr accepts beyond the _COMBINE basics
_AGG_EXTRAS = (
    "avg_zero", "median", "stddev", "range", "multiply", "diff",
    "first", "last",
)


def agg_expr(how: str, order: str = "name") -> Column:
    """One Column aggregate over ``value`` for any graphite aggregate-
    function name (the ``aggregate``/``aggregateLine``/``groupByTags``
    function table, graphite render/functions.py ``aggFuncs``), with
    graphite's ``safe*`` null semantics: nulls are ignored, an all-null
    group yields null, except ``multiply`` which nulls the whole product
    when ANY constituent is null (safeMul).

    Order-sensitive aggregates (``diff`` = first minus the rest, ``first``/
    ``last``) order by the ``order`` column: ``name`` for cross-series
    combining (graphite's series-list order is our sorted-name order),
    ``ts`` for within-series re-bucketing (``summarize``).  They build a
    sorted array of (order, value) structs — group cardinality is a
    dashboard's series count or a bucket's width, so the array stays tiny.

    Usable in ``groupBy(...).agg`` and in unordered window frames alike
    (the percentile-backed ``median`` is the one exception Spark bans over
    a moving frame — ``movingWindow`` routes medians to
    :func:`moving_median` instead).
    """
    how = _AGG_ALIASES.get(how, how)
    v = F.col("value")
    if how == "count":
        return F.count(v).cast("double")
    if how in _COMBINE:
        return _COMBINE[how](v)
    if how == "median":
        return F.percentile(v, F.lit(0.5))
    if how == "stddev":
        return F.stddev_pop(v)
    if how == "range":
        return F.max(v) - F.min(v)
    if how == "avg_zero":
        return F.sum(F.coalesce(v, F.lit(0.0))) / F.count(F.lit(1))
    if how == "multiply":
        prod = F.aggregate(
            F.collect_list(v), F.lit(1.0), lambda acc, x: acc * x
        )
        return F.when(F.count(F.lit(1)) == F.count(v), prod)
    known = F.collect_list(
        F.when(v.isNotNull(), F.struct(F.col(order).alias("o"), v.alias("v")))
    )
    # all-null group -> empty array: guard element_at (ANSI mode throws on
    # out-of-bounds) so the aggregate yields null like the other safe* forms
    if how == "first":
        arr = F.array_sort(known)
        return F.when(F.size(arr) > 0, F.element_at(arr, 1)["v"])
    if how == "last":
        arr = F.reverse(F.array_sort(known))
        return F.when(F.size(arr) > 0, F.element_at(arr, 1)["v"])
    if how == "diff":
        arr = F.array_sort(known)
        head = F.element_at(arr, 1)["v"]
        total = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x["v"])
        return F.when(F.size(arr) > 0, head * 2 - total)
    raise ValueError(f"unknown aggregate function {how!r}")


def agg_over(how: str, w) -> Column:
    """Windowed counterpart of :func:`agg_expr` — ``.over(w)`` must apply
    to each aggregate PRIMITIVE (Spark rejects a window over a composite
    expression that nests collect_list), so the order-sensitive and
    composite forms are re-spelled window-first here.  Frame order for
    first/last/diff is the window's own ORDER BY (always ts in the
    moving/aggregateLine callers); same safe* null semantics as
    :func:`agg_expr`.  ``median`` intentionally raises over a moving
    frame (Spark bans windowed percentile) — callers route it to
    :func:`moving_median`."""
    how = _AGG_ALIASES.get(how, how)
    v = F.col("value")
    if how == "count":
        return F.count(v).over(w).cast("double")
    if how in _COMBINE:
        return _COMBINE[how](v).over(w)
    if how == "median":
        return F.percentile(v, F.lit(0.5)).over(w)
    if how == "stddev":
        return F.stddev_pop(v).over(w)
    if how == "range":
        return F.max(v).over(w) - F.min(v).over(w)
    if how == "avg_zero":
        return (
            F.sum(F.coalesce(v, F.lit(0.0))).over(w)
            / F.count(F.lit(1)).over(w)
        )
    if how == "first":
        return F.first(v, ignorenulls=True).over(w)
    if how == "last":
        return F.last(v, ignorenulls=True).over(w)
    if how == "diff":
        # first non-null minus the rest = 2*first - sum (nulls skipped)
        return (
            F.lit(2.0) * F.first(v, ignorenulls=True).over(w)
            - F.sum(v).over(w)
        )
    if how == "multiply":
        arr = F.collect_list(v).over(w)  # skips nulls
        cnt = F.count(F.lit(1)).over(w)
        prod = F.aggregate(arr, F.lit(1.0), lambda acc, x: acc * x)
        return F.when(F.size(arr) == cnt, prod)
    raise ValueError(f"unknown aggregate function {how!r}")


def _pct_frac(pct: float) -> float:
    """Graphite's percentile functions take a *percent* (nPercentile(90)),
    not a fraction; normalize and validate once so every family member
    agrees (render/functions.py nPercentile/removeAbovePercentile)."""
    if not 0 < pct <= 100:
        raise ValueError(f"percentile must be in (0, 100], got {pct!r}")
    return pct / 100.0


def summarize(series: DataFrame, precision: int, how: str = "sum") -> DataFrame:
    """graphite ``summarize(series, interval, func)``: re-bucket each series
    to ``precision`` seconds with any aggregate-table combinator
    (order-sensitive ones run in time order within the widened bucket)."""
    bucket = (F.col("ts") - (F.col("ts") % F.lit(precision))).alias("ts")
    return (
        series.groupBy("name", bucket)
        .agg(agg_expr(how, order="ts").alias("value"))
    )


def combine(series: DataFrame, how: str = "sum", name: str | None = None) -> DataFrame:
    """``sumSeries``/``averageSeries``/``minSeries``/``maxSeries`` and the
    generic ``aggregate(seriesList, 'func')``: collapse all input series
    into one, bucket by bucket, with any aggregate-table function."""
    out = series.groupBy("ts").agg(agg_expr(how).alias("value"))
    if name is not None:
        out = out.select(F.lit(name).alias("name"), "ts", "value")
    return out


def percentile_of_series(series: DataFrame, pct: float) -> DataFrame:
    """``percentileOfSeries``: per-bucket exact interpolated percentile across
    all series (matches graphite's sorted-interpolation definition).
    ``pct`` is a graphite-style percent, e.g. 50 for the median."""
    return series.groupBy("ts").agg(
        F.percentile("value", F.lit(_pct_frac(pct))).alias("value")
    )


def moving(series: DataFrame, points: int, how: str = "average",
           xff: float | None = None) -> DataFrame:
    """``movingAverage``/``movingSum``/``movingMin``/``movingMax`` and the
    generic ``movingWindow(series, n, 'func', xFilesFactor)`` over the
    trailing ``points`` buckets of each series (current bucket inclusive).
    Medians route to :func:`moving_median` — Spark bans percentile
    aggregates over a moving frame.  With ``xff``, a window whose known
    fraction falls below it emits null (graphite's per-window
    xFilesFactor)."""
    if _AGG_ALIASES.get(how, how) == "median":
        return moving_median(series, points)
    w = (
        Window.partitionBy("name")
        .orderBy("ts")
        .rowsBetween(-(points - 1), Window.currentRow)
    )
    agg = agg_over(how, w)
    if xff:
        frac = F.count("value").over(w) / F.count(F.lit(1)).over(w)
        agg = F.when(frac >= F.lit(float(xff)), agg)
    return series.select(
        "name", "ts", agg.alias("value")
    )


def derivative(series: DataFrame) -> DataFrame:
    """``derivative``: bucket-over-bucket delta; first bucket is null."""
    w = Window.partitionBy("name").orderBy("ts")
    return series.select(
        "name", "ts", (F.col("value") - F.lag("value").over(w)).alias("value")
    )


def non_negative_derivative(series: DataFrame) -> DataFrame:
    """``nonNegativeDerivative``: like derivative but negative deltas (counter
    resets) become null."""
    w = Window.partitionBy("name").orderBy("ts")
    delta = F.col("value") - F.lag("value").over(w)
    return series.select(
        "name", "ts", F.when(delta >= 0, delta).alias("value")
    )


def per_second(series: DataFrame, step: int) -> DataFrame:
    """``perSecond``: non-negative derivative scaled by the bucket width."""
    w = Window.partitionBy("name").orderBy("ts")
    delta = F.col("value") - F.lag("value").over(w)
    return series.select(
        "name", "ts", F.when(delta >= 0, delta / F.lit(step)).alias("value")
    )


def integral(series: DataFrame) -> DataFrame:
    """``integral``: running sum of each series from its first bucket."""
    w = (
        Window.partitionBy("name")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return series.select("name", "ts", F.sum("value").over(w).alias("value"))


def time_shift(series: DataFrame, seconds: int) -> DataFrame:
    """``timeShift``: move every bucket forward by ``seconds`` (negative
    shifts backwards), e.g. to overlay last week on this week."""
    return series.select(
        "name", (F.col("ts") + F.lit(seconds)).alias("ts"), "value"
    )


def scale(series: DataFrame, factor: float) -> DataFrame:
    return series.withColumn("value", F.col("value") * F.lit(factor))


def offset(series: DataFrame, amount: float) -> DataFrame:
    return series.withColumn("value", F.col("value") + F.lit(amount))


def absolute(series: DataFrame) -> DataFrame:
    return series.withColumn("value", F.abs("value"))


def keep_last_value(series: DataFrame, limit: int | None = None) -> DataFrame:
    """``keepLastValue``: forward-fill null buckets from the most recent
    non-null one; with ``limit``, only across at most that many consecutive
    holes.  Input is expected dense (see operators.gapfill.dense_series)."""
    w = (
        Window.partitionBy("name")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = F.last("value", ignorenulls=True).over(w)
    if limit is None:
        return series.select("name", "ts", filled.alias("value"))
    # distance to the last non-null bucket = ts-rank minus rank of the fill source
    rn = F.row_number().over(Window.partitionBy("name").orderBy("ts"))
    src_rn = F.last(
        F.when(F.col("value").isNotNull(), rn), ignorenulls=True
    ).over(w)
    gap = rn - src_rn
    return series.select(
        "name", "ts", F.when(gap <= limit, filled).alias("value")
    )


def highest(series: DataFrame, n: int, how: str = "average") -> DataFrame:
    """``highestAverage``/``highestMax`` and the generic ``highest(series,
    n, 'func')``: keep the n series ranking highest by the given per-series
    statistic (rounded before ranking, name tie-break, so the cut is
    reproducible across engines)."""
    stat = series.groupBy("name").agg(
        F.round(agg_expr(how, order="ts"), 6).alias("stat")
    )
    w = Window.orderBy(F.desc("stat"), F.asc("name"))
    top = (
        stat.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= n)
    )
    return series.join(F.broadcast(top), "name").select(
        "name", "ts", "value", "stat", "rank"
    )


def divide_series(num: DataFrame, den: DataFrame) -> DataFrame:
    """``divideSeries``: bucketwise ratio of two series sets joined on ts
    (each side pre-combined if it holds several series).  Division by
    zero/null yields null, graphite's None semantics."""
    n = combine(num, "sum").withColumnRenamed("value", "num")
    d = combine(den, "sum").withColumnRenamed("value", "den")
    return n.join(d, "ts", "full_outer").select(
        "ts",
        F.when(F.col("den") != 0, F.col("num") / F.col("den")).alias("value"),
    )


def diff_series(minuend: DataFrame, *subtrahends: DataFrame) -> DataFrame:
    """``diffSeries``: first series set minus the sum of the rest."""
    m = combine(minuend, "sum").withColumnRenamed("value", "pos")
    rest = subtrahends[0]
    for s in subtrahends[1:]:
        rest = rest.unionByName(s)
    neg = combine(rest, "sum").withColumnRenamed("value", "neg")
    return m.join(neg, "ts", "full_outer").select(
        "ts",
        (F.coalesce(F.col("pos"), F.lit(0.0)) - F.coalesce(F.col("neg"), F.lit(0.0))).alias("value"),
    )


def as_percent(series: DataFrame) -> DataFrame:
    """``asPercent`` (total mode): each series as a share of the bucket's
    total across all series."""
    w = Window.partitionBy("ts")
    total = F.sum("value").over(w)
    return series.select(
        "name", "ts",
        F.when(total != 0, F.col("value") / total * 100.0).alias("value"),
    )


def stddev_series(series: DataFrame) -> DataFrame:
    """``stddevSeries``: per-bucket population standard deviation across
    series."""
    return series.groupBy("ts").agg(F.stddev_pop("value").alias("value"))


def remove_above_percentile(series: DataFrame, pct: float) -> DataFrame:
    """``removeAbovePercentile``: null out values above each series' own
    exact percentile (graphite nulls, never drops, the bucket).  ``pct`` is
    a graphite-style percent (removeAbovePercentile(90))."""
    cut = series.groupBy("name").agg(
        F.percentile("value", F.lit(_pct_frac(pct))).alias("cut")
    )
    return series.join(F.broadcast(cut), "name").select(
        "name", "ts", F.when(F.col("value") <= F.col("cut"), F.col("value")).alias("value")
    )


def hitcount(series: DataFrame, precision: int,
             origin: int | None = None) -> DataFrame:
    """``hitcount``: re-bucket to ``precision`` seconds as rate×time — each
    source bucket contributes ``value * source_step`` so the output estimates
    the number of events in the coarser bucket.  ``source_step`` is inferred
    per series as the minimum ts delta (graphite knows it from the fetch
    header; the inference keeps the function standalone).  ``origin``
    anchors the buckets to the request window start (graphite's
    ``alignToInterval=True``)."""
    w = Window.partitionBy("name").orderBy("ts")
    step = F.min(F.col("ts") - F.lag("ts").over(w)).over(
        Window.partitionBy("name")
    )
    if origin:
        off = F.col("ts") - F.lit(origin)
        bucket = (F.lit(origin) + off - (off % F.lit(precision))).alias("ts")
    else:
        bucket = (F.col("ts") - (F.col("ts") % F.lit(precision))).alias("ts")
    return (
        series.select("name", "ts", (F.col("value") * step).alias("scaled"))
        .groupBy("name", bucket)
        .agg(F.sum("scaled").alias("value"))
    )


def grep_series(series: DataFrame, pattern: str) -> DataFrame:
    """``grep``: keep only series whose name matches the regex."""
    return series.filter(F.col("name").rlike(pattern))


def exclude(series: DataFrame, pattern: str) -> DataFrame:
    """``exclude``: drop series whose name matches the regex."""
    return series.filter(~F.col("name").rlike(pattern))


def _stat_filter(series: DataFrame, how: str, keep: Column) -> DataFrame:
    stat = series.groupBy("name").agg(agg_expr(how, order="ts").alias("stat"))
    kept = stat.filter(keep).select("name")
    return series.join(F.broadcast(kept), "name", "left_semi")


def average_above(series: DataFrame, n: float) -> DataFrame:
    """``averageAbove``: keep series whose mean is above ``n``."""
    return _stat_filter(series, "average", F.col("stat") > n)


def average_below(series: DataFrame, n: float) -> DataFrame:
    """``averageBelow``: keep series whose mean is below ``n``."""
    return _stat_filter(series, "average", F.col("stat") < n)


def maximum_above(series: DataFrame, n: float) -> DataFrame:
    """``maximumAbove``: keep series whose max is above ``n``."""
    return _stat_filter(series, "max", F.col("stat") > n)


def minimum_below(series: DataFrame, n: float) -> DataFrame:
    """``minimumBelow``: keep series whose min is below ``n``."""
    return _stat_filter(series, "min", F.col("stat") < n)


def n_percentile(series: DataFrame, pct: float) -> DataFrame:
    """``nPercentile``: replace each series by the flat line of its own
    exact percentile (same interpolated definition as graphite).  ``pct``
    is a graphite-style percent — nPercentile(90), not 0.9; a caller
    porting a render target passes the number graphite shows."""
    w = Window.partitionBy("name")
    return series.select(
        "name", "ts",
        F.percentile("value", F.lit(_pct_frac(pct))).over(w).alias("value"),
    )


def time_slice(series: DataFrame, start: int, end: int) -> DataFrame:
    """``timeSlice``: null values outside [start, end] (graphite nulls the
    bucket rather than dropping it, preserving the dense grid)."""
    inside = (F.col("ts") >= start) & (F.col("ts") <= end)
    return series.select(
        "name", "ts", F.when(inside, F.col("value")).alias("value")
    )


def transform_null_ref(series: DataFrame, default: float,
                       reference: DataFrame) -> DataFrame:
    """``transformNull(seriesList, default, referenceSeries)``: fill nulls
    only at timestamps where ANY reference series has a value (graphite's
    three-arg form).  The reference timestamp set is window-bounded, so it
    broadcasts."""
    ref_ts = (
        reference.filter(F.col("value").isNotNull())
        .select("ts").distinct()
        .withColumn("_has", F.lit(1))
    )
    filled = F.when(
        F.col("value").isNotNull(), F.col("value")
    ).otherwise(F.when(F.col("_has") == 1, F.lit(float(default))))
    return (
        series.join(F.broadcast(ref_ts), "ts", "left")
        .select("name", "ts", filled.alias("value"))
    )


def transform_null(series: DataFrame, default: float = 0.0) -> DataFrame:
    """``transformNull``: replace null buckets with a constant."""
    return series.withColumn(
        "value", F.coalesce(F.col("value"), F.lit(default))
    )


def lowest(series: DataFrame, n: int, how: str = "average") -> DataFrame:
    """``lowestAverage``/``lowestMax``/generic ``lowest``: mirror of
    :func:`highest`."""
    stat = series.groupBy("name").agg(
        F.round(agg_expr(how, order="ts"), 6).alias("stat")
    )
    w = Window.orderBy(F.asc("stat"), F.asc("name"))
    bottom = (
        stat.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= n)
    )
    return series.join(F.broadcast(bottom), "name").select(
        "name", "ts", "value", "stat", "rank"
    )


def highest_current(series: DataFrame, n: int) -> DataFrame:
    """``highestCurrent``: keep the n series whose last known value ranks
    highest (graphite safeLast ranking; name tie-break)."""
    stat = _last_known(series).select(
        "name", F.round("last_value", 6).alias("stat")
    )
    w = Window.orderBy(F.desc("stat"), F.asc("name"))
    top = (
        stat.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= n)
    )
    return series.join(F.broadcast(top), "name").select(
        "name", "ts", "value", "stat", "rank"
    )


def lowest_current(series: DataFrame, n: int) -> DataFrame:
    """``lowestCurrent``: mirror of :func:`highest_current`.  All-null
    series (safeLast undefined) sort last, not first — plain ``asc`` puts
    NULLs ahead of every real value, which would hand them the top-n
    slots and make the verb asymmetric with ``highestCurrent``."""
    stat = _last_known(series).select(
        "name", F.round("last_value", 6).alias("stat")
    )
    w = Window.orderBy(F.asc_nulls_last("stat"), F.asc("name"))
    bottom = (
        stat.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= n)
    )
    return series.join(F.broadcast(bottom), "name").select(
        "name", "ts", "value", "stat", "rank"
    )


def remove_below_percentile(series: DataFrame, pct: float) -> DataFrame:
    """``removeBelowPercentile``: null out values below each series' own
    exact percentile.  ``pct`` is a graphite-style percent."""
    cut = series.groupBy("name").agg(
        F.percentile("value", F.lit(_pct_frac(pct))).alias("cut")
    )
    return series.join(F.broadcast(cut), "name").select(
        "name", "ts", F.when(F.col("value") >= F.col("cut"), F.col("value")).alias("value")
    )


def clamp(series: DataFrame, lo: float | None = None, hi: float | None = None) -> DataFrame:
    """``removeBelowValue``/``removeAboveValue`` pair: null values outside
    [lo, hi]."""
    v = F.col("value")
    keep = F.lit(True)
    if lo is not None:
        keep = keep & (v >= lo)
    if hi is not None:
        keep = keep & (v <= hi)
    return series.withColumn("value", F.when(keep, v))


def sort_by_name(series: DataFrame) -> DataFrame:
    """``sortByName``: order the output rows by (name, ts)."""
    return series.orderBy("name", "ts")


def group_by_node(series: DataFrame, node: int, how: str = "sum") -> DataFrame:
    """``groupByNode``: combine series sharing the selected path component
    (0-based), the render-side analogue of an aggregated glob."""
    key = F.element_at(F.split(F.col("name"), r"\."), node + 1).alias("name")
    return (
        series.groupBy(key, "ts")
        .agg(agg_expr(how).alias("value"))
    )


def alias_by_node(series: DataFrame, *nodes: int) -> DataFrame:
    """``aliasByNode``: rename each series to the dot-join of the selected
    path components (0-based, as graphite counts them)."""
    parts = F.split(F.col("name"), r"\.")
    # element_at is 1-based and supports negative indices from the end, so
    # graphite's negative node numbers (aliasByNode(s, -1), aliasByMetric)
    # map directly
    picked = [F.element_at(parts, i + 1 if i >= 0 else i) for i in nodes]
    return series.withColumn("alias", F.concat_ws(".", *picked))


def logarithm(series: DataFrame, base: float = 10.0) -> DataFrame:
    """``logarithm``: log of each value in the given base; non-positive
    values become null (graphite's None)."""
    v = F.col("value")
    return series.withColumn("value", F.when(v > 0, F.log(float(base), v)))


def square_root(series: DataFrame) -> DataFrame:
    """``squareRoot``: negative values become null."""
    v = F.col("value")
    return series.withColumn("value", F.when(v >= 0, F.sqrt(v)))


def pow_series(series: DataFrame, exponent: float) -> DataFrame:
    """``pow``: raise every value to ``exponent``."""
    return series.withColumn("value", F.pow(F.col("value"), F.lit(exponent)))


def invert(series: DataFrame) -> DataFrame:
    """``invert``: 1/x; zero becomes null."""
    v = F.col("value")
    return series.withColumn("value", F.when(v != 0, F.lit(1.0) / v))


def offset_to_zero(series: DataFrame) -> DataFrame:
    """``offsetToZero``: subtract each series' own minimum so it baselines
    at zero."""
    w = Window.partitionBy("name")
    return series.select(
        "name", "ts", (F.col("value") - F.min("value").over(w)).alias("value")
    )


def delay(series: DataFrame, steps: int) -> DataFrame:
    """``delay``: shift each series' values ``steps`` buckets forward in time
    (the first ``steps`` buckets become null)."""
    w = Window.partitionBy("name").orderBy("ts")
    return series.select(
        "name", "ts", F.lag("value", steps).over(w).alias("value")
    )


def changed(series: DataFrame) -> DataFrame:
    """``changed``: 1 where the value differs from the previous bucket, else
    0 (first bucket: 0, as graphite emits)."""
    w = Window.partitionBy("name").orderBy("ts")
    prev = F.lag("value").over(w)
    return series.select(
        "name",
        "ts",
        F.when(
            prev.isNotNull() & F.col("value").isNotNull() & (F.col("value") != prev),
            F.lit(1.0),
        )
        .otherwise(F.lit(0.0))
        .alias("value"),
    )


def moving_median(series: DataFrame, points: int) -> DataFrame:
    """``movingMedian``: exact median over the trailing ``points`` buckets
    of each series, EXCLUDING the current bucket, with the first ``points``
    buckets consumed as warm-up (graphite render/functions.py movingMedian:
    ``window = series[i - windowSize:i]`` emitted for ``i >= windowSize``).
    Spark refuses percentile-family aggregates over a window frame, so the
    median is spelled out as sorted-frame array algebra (collect_list skips
    nulls, matching graphite's known-values semantics); the frame holds
    ≤ ``points`` values so the per-row array is tiny."""
    w = (
        Window.partitionBy("name")
        .orderBy("ts")
        .rowsBetween(-points, -1)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    odd = F.element_at(arr, ((n + 1) / 2).cast("int"))
    even = (
        F.element_at(arr, (n / 2).cast("int"))
        + F.element_at(arr, (n / 2 + 1).cast("int"))
    ) / 2.0
    med = F.when(n == 0, F.lit(None)).otherwise(
        F.when(n % 2 == 1, odd).otherwise(even)
    )
    rn = F.row_number().over(Window.partitionBy("name").orderBy("ts"))
    return (
        series.select("name", "ts", med.alias("value"), rn.alias("_rn"))
        .filter(F.col("_rn") > points)
        .drop("_rn")
    )


def stdev(series: DataFrame, points: int) -> DataFrame:
    """``stdev``: moving *population* standard deviation over the trailing
    ``points`` buckets of each series, current bucket inclusive — graphite's
    stdev computes ``sqrt(n·Σx² − (Σx)²)/n`` over its streaming window
    (render/functions.py stdev), which is stddev_pop, not stddev_samp;
    single-known-value windows therefore yield 0, as graphite emits."""
    w = (
        Window.partitionBy("name")
        .orderBy("ts")
        .rowsBetween(-(points - 1), Window.currentRow)
    )
    return series.select(
        "name", "ts", F.stddev_pop("value").over(w).alias("value")
    )


def linear_regression(series: DataFrame) -> DataFrame:
    """``linearRegression``: replace each series by its least-squares fit
    line evaluated at every bucket — built-in ``regr_slope``/
    ``regr_intercept`` over the (ts, value) pairs, no UDF."""
    w = Window.partitionBy("name")
    # x is rebased to the series' own first bucket: the fitted line is the
    # same, but epoch-sized x values lose ~9 digits to cancellation in the
    # variance sums, which shows up at the rounding the oracle compares at
    x = (F.col("ts") - F.min("ts").over(w)).cast("double")
    slope = F.regr_slope("value", x).over(w)
    intercept = F.regr_intercept("value", x).over(w)
    return series.select(
        "name", "ts", (slope * x + intercept).alias("value")
    )


def most_deviant(series: DataFrame, n: int) -> DataFrame:
    """``mostDeviant``: keep the ``n`` series with the highest population
    variance (rounded before ranking, name tie-break, reproducible cut)."""
    stat = series.groupBy("name").agg(
        F.round(F.var_pop("value"), 6).alias("stat")
    )
    w = Window.orderBy(F.desc("stat"), F.asc("name"))
    top = (
        stat.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= n)
    )
    return series.join(F.broadcast(top), "name").select(
        "name", "ts", "value", "stat", "rank"
    )


def sort_by_total(series: DataFrame) -> DataFrame:
    """``sortByTotal``: rank series by their sum, descending (rank column
    carries the order; rows stay one-per-bucket)."""
    stat = series.groupBy("name").agg(
        F.round(F.sum("value"), 6).alias("stat")
    )
    w = Window.orderBy(F.desc("stat"), F.asc("name"))
    ranked = stat.withColumn("rank", F.row_number().over(w).cast("long"))
    return series.join(F.broadcast(ranked), "name").select(
        "name", "ts", "value", "stat", "rank"
    )


def count_series(series: DataFrame) -> DataFrame:
    """``countSeries``: number of series with a known value in each bucket."""
    return series.groupBy("ts").agg(
        F.count("value").cast("double").alias("value")
    )


def range_of_series(series: DataFrame) -> DataFrame:
    """``rangeOfSeries``: per-bucket max minus min across series."""
    return series.groupBy("ts").agg(
        (F.max("value") - F.min("value")).alias("value")
    )


def multiply_series(series: DataFrame) -> DataFrame:
    """``multiplySeries``: per-bucket product across series — a running
    ``aggregate`` over the bucket's collected values (series-set cardinality
    is dashboard-sized, so the collect_list stays tiny).  Graphite's safeMul
    returns None when ANY constituent is None, so the product is gated on
    bucket completeness: a bucket with any null value yields null."""
    prod = F.aggregate(
        F.collect_list("value"), F.lit(1.0), lambda acc, x: acc * x
    )
    complete = F.count(F.lit(1)) == F.count("value")
    return series.groupBy("ts").agg(
        F.when(complete, prod).alias("value")
    )


def combine_series_with_wildcards(
    series: DataFrame, how: str, *positions: int
) -> DataFrame:
    """``sumSeriesWithWildcards`` / ``averageSeriesWithWildcards`` / … and
    the generic ``aggregateWithWildcards(seriesList, 'func', *pos)``:
    blank out the given name components (0-based) and combine the series
    that collapse together with any aggregate-table function."""
    parts = F.split(F.col("name"), r"\.")
    kept = F.filter(
        F.transform(parts, lambda p, i: F.when(~i.isin(list(positions)), p)),
        lambda p: p.isNotNull(),
    )
    key = F.concat_ws(".", kept).alias("name")
    return series.groupBy(key, "ts").agg(agg_expr(how).alias("value"))


def average_series_with_wildcards(series: DataFrame, *positions: int) -> DataFrame:
    """``averageSeriesWithWildcards`` — see
    :func:`combine_series_with_wildcards`."""
    return combine_series_with_wildcards(series, "average", *positions)


def alias_sub(series: DataFrame, pattern: str, replacement: str) -> DataFrame:
    """``aliasSub``: regex-rewrite every series name."""
    return series.withColumn(
        "name", F.regexp_replace("name", pattern, replacement)
    )


def interpolate(series: DataFrame, limit: int | None = None) -> DataFrame:
    """``interpolate``: linearly fill null buckets between two known
    neighbours of the same series; leading/trailing holes stay null.  With
    ``limit``, only gaps of at most that many consecutive holes are filled.

    Pure window algebra: the last known (ts, value) before and the first
    after each hole, then the straight line between them — no UDF, one
    (name)-partitioned sort."""
    w_prev = (
        Window.partitionBy("name")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("name")
        .orderBy("ts")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known = F.when(
        F.col("value").isNotNull(), F.struct(F.col("ts"), F.col("value"))
    )
    prev = F.last(known, ignorenulls=True).over(w_prev)
    nxt = F.first(known, ignorenulls=True).over(w_next)
    frac = (F.col("ts") - prev["ts"]).cast("double") / (
        nxt["ts"] - prev["ts"]
    ).cast("double")
    filled = prev["value"] + (nxt["value"] - prev["value"]) * frac
    gap_ok = (
        F.lit(True)
        if limit is None
        else ((nxt["ts"] - prev["ts"]) / _step_col() <= limit + 1)
    )
    out = F.when(F.col("value").isNotNull(), F.col("value")).otherwise(
        F.when(prev.isNotNull() & nxt.isNotNull() & gap_ok, filled)
    )
    return series.select("name", "ts", out.alias("value"))


def compress_periodic_gaps(series: DataFrame) -> DataFrame:
    """``compressPeriodicGaps``: re-grid each series to the step its
    non-null points actually arrive at — the most common delta between
    consecutive known points (ties break to the smaller delta, a
    deterministic refinement of graphite's dict-order tie) — from the
    first known point to the last.  Series with fewer than 3 known points
    pass through unchanged, like graphite.  Per-series window + one
    sequence explode; the regrid join is keyed (name, ts), no UDF."""
    nn = series.filter(F.col("value").isNotNull())
    w = Window.partitionBy("name").orderBy("ts")
    deltas = nn.select(
        "name", (F.col("ts") - F.lag("ts").over(w)).alias("delta")
    ).filter(F.col("delta").isNotNull())
    mode = (
        deltas.groupBy("name", "delta").count()
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("name")
                .orderBy(F.desc("count"), F.asc("delta"))
            ),
        )
        .filter(F.col("rk") == 1)
        .select("name", F.col("delta").alias("step"))
    )
    span = nn.groupBy("name").agg(
        F.min("ts").alias("t0"), F.max("ts").alias("t1"),
        F.count(F.lit(1)).alias("n"),
    )
    grid = (
        span.filter(F.col("n") >= 3)
        .join(mode, "name")
        .select("name", F.explode(F.sequence("t0", "t1", "step")).alias("ts"))
    )
    regridded = grid.join(series, ["name", "ts"], "left").select(
        "name", "ts", "value"
    )
    # pass through any series NOT regridded — including all-null series
    # that have no row in span at all
    regrid_names = span.filter(F.col("n") >= 3).select("name")
    passthrough = series.join(F.broadcast(regrid_names), "name", "left_anti")
    return regridded.unionByName(passthrough)


def _step_col() -> Column:
    """Per-series bucket width inferred as the minimum ts delta (same
    inference as :func:`hitcount`)."""
    w = Window.partitionBy("name").orderBy("ts")
    return F.min(F.col("ts") - F.lag("ts").over(w)).over(Window.partitionBy("name"))


def weighted_average(values: DataFrame, weights: DataFrame, *nodes: int) -> DataFrame:
    """``weightedAverage``: per-bucket Σ(value·weight)/Σ(weight) across the
    two series sets — graphite pairs avg-series with count-series to undo
    pre-averaged rollups.

    Graphite pairs the two sides by the selected *node* components
    (``weightedAverage(avgList, weightList, *nodes)``), not by identical
    full names — the avg series is ``….avg`` and its weight ``….count``, so
    a full-name join would match nothing.  Pass the 0-based node positions
    whose dot-components identify the pair (each side must be unique per
    key, as graphite's dict-keyed pairing assumes); with no nodes the join
    falls back to the full name, for callers who pre-aliased both sides."""
    if nodes:
        parts = F.split(F.col("name"), r"\.")
        key = F.concat_ws(".", *[F.element_at(parts, i + 1) for i in nodes])
    else:
        key = F.col("name")
    v = values.select(key.alias("k"), "ts", F.col("value").alias("v"))
    w = weights.select(key.alias("k"), "ts", F.col("value").alias("w"))
    joined = v.join(w, ["k", "ts"])
    return joined.groupBy("ts").agg(
        (F.sum(F.col("v") * F.col("w")) / F.nullif(F.sum("w"), F.lit(0.0))).alias(
            "value"
        )
    )


def sort_by_maxima(series: DataFrame) -> DataFrame:
    """``sortByMaxima``: rank series by their max, descending (rank column
    carries the order, mirror of :func:`sort_by_total`)."""
    stat = series.groupBy("name").agg(F.round(F.max("value"), 6).alias("stat"))
    w = Window.orderBy(F.desc("stat"), F.asc("name"))
    ranked = stat.withColumn("rank", F.row_number().over(w).cast("long"))
    return series.join(F.broadcast(ranked), "name").select(
        "name", "ts", "value", "stat", "rank"
    )


def limit_series(series: DataFrame, n: int) -> DataFrame:
    """``limit``: keep the first ``n`` series by name order (graphite's
    deterministic truncation)."""
    kept = (
        series.select("name")
        .distinct()
        .orderBy("name")
        .limit(n)
    )
    return series.join(F.broadcast(kept), "name", "left_semi")


def scale_to_seconds(series: DataFrame, seconds: int) -> DataFrame:
    """``scaleToSeconds``: re-express each rate×step bucket per ``seconds``
    — value · seconds/step, step inferred per series as in
    :func:`hitcount`."""
    return series.select(
        "name", "ts",
        (F.col("value") * F.lit(seconds) / _step_col()).alias("value"),
    )


def is_non_null(series: DataFrame) -> DataFrame:
    """``isNonNull``: 1 where the bucket has a known value, else 0."""
    return series.select(
        "name", "ts",
        F.when(F.col("value").isNotNull(), F.lit(1.0)).otherwise(F.lit(0.0)).alias("value"),
    )


def remove_empty_series(series: DataFrame, xff: float = 0.0) -> DataFrame:
    """``removeEmptySeries``: drop series with no known values; with a
    nonzero ``xff``, drop series whose known-bucket fraction is below it
    (graphite's xFilesFactor form of the filter)."""
    stat = series.groupBy("name").agg(
        (F.count("value") / F.count(F.lit(1))).alias("frac")
    )
    keep = F.col("frac") >= xff if xff > 0 else F.col("frac") > 0
    kept = stat.filter(keep).select("name")
    return series.join(F.broadcast(kept), "name", "left_semi")


def min_max(series: DataFrame) -> DataFrame:
    """``minMax``: normalize each series to [0, 1] by its own range; a
    flat series maps to 0 (graphite's ZeroDivisionError fallback), nulls
    stay null."""
    w = Window.partitionBy("name")
    lo, hi = F.min("value").over(w), F.max("value").over(w)
    norm = F.when(hi - lo != 0, (F.col("value") - lo) / (hi - lo)).otherwise(
        F.when(F.col("value").isNotNull(), F.lit(0.0))
    )
    return series.select("name", "ts", norm.alias("value"))


def sigmoid_series(series: DataFrame) -> DataFrame:
    """``sigmoid``: 1 / (1 + e^-x) per bucket.  Deliberate variant: for
    x < -709 graphite's safeExp overflows to None, while IEEE doubles
    saturate to the mathematically-correct limit 0.0 here."""
    return series.withColumn(
        "value", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("value")))
    )


def round_series(series: DataFrame, precision: int = 0) -> DataFrame:
    """``round``: round every value to ``precision`` decimal places."""
    return series.withColumn("value", F.round("value", precision))


def integral_by_interval(series: DataFrame, interval: int) -> DataFrame:
    """``integralByInterval``: running sum within each ``interval``-second
    window of each series, resetting at every window boundary — one window
    partitioned by (name, interval bucket).  Null buckets contribute 0 and
    re-emit the accumulated sum (graphite adds ``v or 0``), except before
    the window's first known value, where the sum is still null rather
    than graphite's leading 0."""
    bucket = F.col("ts") - (F.col("ts") % F.lit(interval))
    w = (
        Window.partitionBy("name", bucket)
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return series.select("name", "ts", F.sum("value").over(w).alias("value"))


def average_outside_percentile(series: DataFrame, n: float) -> DataFrame:
    """``averageOutsidePercentile``: keep series whose mean falls outside
    the [100-n, n] percentile band of all series' means.  Graphite's
    ``_getPercentile(interpolate=False)`` picks ``sorted[rank-1]`` with
    ``rank = int(n/100 · (len+1))`` (clamped to the ends) — reproduced
    here by indexing the sorted means array, NOT by the interpolated
    ``percentile`` function, which disagrees on small series sets.
    All-null series have no mean: they neither enter the percentile
    computation nor survive the filter."""
    if n < 50:
        n = 100 - n
    # rounded before ranking (like highest/lowest): near-tied means must
    # sort identically across engines or the band boundary flips
    stat = series.groupBy("name").agg(F.round(F.avg("value"), 6).alias("stat"))
    arr = stat.agg(F.array_sort(F.collect_list("stat")).alias("arr"))

    def pick(pct: float) -> Column:
        a = F.col("arr")
        size = F.size(a)
        rank = F.floor(F.lit(pct / 100.0) * (size + 1)).cast("int")
        idx = F.greatest(F.least(rank, size), F.lit(1))
        return F.element_at(a, idx)

    bounds = arr.select(
        pick(100 - n).alias("lo"), pick(n).alias("hi")
    )
    kept = (
        stat.crossJoin(F.broadcast(bounds))
        .filter(~((F.col("stat") > F.col("lo")) & (F.col("stat") < F.col("hi"))))
        .select("name")
    )
    return series.join(F.broadcast(kept), "name", "left_semi")


def smart_summarize(
    series: DataFrame, precision: int, how: str = "sum", origin: int = 0
) -> DataFrame:
    """``smartSummarize``: like :func:`summarize` but buckets are aligned to
    ``origin`` (graphite aligns to the requested window start) instead of the
    epoch.  Pass the fetch window's start ts as ``origin``."""
    off = F.col("ts") - F.lit(origin)
    bucket = (F.lit(origin) + off - (off % F.lit(precision))).alias("ts")
    return series.groupBy("name", bucket).agg(agg_expr(how, order="ts").alias("value"))


def sort_by_minima(series: DataFrame) -> DataFrame:
    """``sortByMinima``: drop series whose max never exceeds 0, then rank
    ascending by each survivor's minimum (graphite render/functions.py
    sortByMinima: ``filter max > 0`` + ``sort key=min``)."""
    stat = series.groupBy("name").agg(
        F.round(F.min("value"), 6).alias("stat"), F.max("value").alias("mx")
    )
    kept = stat.filter(F.col("mx") > 0).drop("mx")
    w = Window.orderBy(F.asc("stat"), F.asc("name"))
    ranked = kept.withColumn("rank", F.row_number().over(w).cast("long"))
    return series.join(F.broadcast(ranked), "name").select(
        "name", "ts", "value", "stat", "rank"
    )


def substr_series(series: DataFrame, start: int, stop: int = 0) -> DataFrame:
    """``substr``: rewrite each name to the dot-joined node slice
    [start, stop) (0-based, stop=0 meaning "to the end"), graphite's
    display-name truncation."""
    parts = F.split(F.col("name"), r"\.")
    length = (F.size(parts) if stop == 0 else F.lit(stop)) - F.lit(start)
    sliced = F.slice(parts, start + 1, length)
    return series.select(
        F.array_join(sliced, ".").alias("name"), "ts", "value"
    )


def unique_series(*series_lists: DataFrame) -> DataFrame:
    """``unique``: concatenate the lists keeping only the FIRST occurrence
    of each name (earlier lists win, graphite's seen-set order)."""
    tagged = None
    for i, df in enumerate(series_lists):
        t = df.select(F.lit(i).alias("pri"), "name", "ts", "value")
        tagged = t if tagged is None else tagged.unionAll(t)
    first = tagged.groupBy("name").agg(F.min("pri").alias("pri"))
    return tagged.join(F.broadcast(first), ["name", "pri"]).select(
        "name", "ts", "value"
    )


def _last_known(series: DataFrame) -> DataFrame:
    """Per-series last non-null value (graphite safeLast)."""
    return series.groupBy("name").agg(
        F.max_by("value", F.when(F.col("value").isNotNull(), F.col("ts"))).alias(
            "last_value"
        )
    )


def current_above(series: DataFrame, n: float) -> DataFrame:
    """``currentAbove``: keep series whose last known value is above ``n``."""
    kept = _last_known(series).filter(F.col("last_value") > n).select("name")
    return series.join(F.broadcast(kept), "name", "left_semi")


def current_below(series: DataFrame, n: float) -> DataFrame:
    """``currentBelow``: keep series whose last known value is at most
    ``n`` (graphite keeps ``safeLast(s) <= n``)."""
    kept = _last_known(series).filter(F.col("last_value") <= n).select("name")
    return series.join(F.broadcast(kept), "name", "left_semi")


def aggregate_line(series: DataFrame, how: str = "average") -> DataFrame:
    """``aggregateLine``: replace each bucket's value with the series-wide
    aggregate — a flat line at the statistic, emitted on the series' own
    grid.  The frame is ordered + unbounded so order-sensitive aggregates
    (first/last/diff) see time order, not shuffle order."""
    w = (
        Window.partitionBy("name")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return series.select(
        "name", "ts", agg_over(how, w).alias("value")
    )


def time_stack(
    series: DataFrame, shift_s: int, start: int = 0, end: int = 7
) -> DataFrame:
    """``timeStack``: union of ``timeShift(series, i*shift_s)`` for i in
    [start, end), each copy suffixed ``.shift_i`` — the week-over-week
    overlay.  One scan per shift; Spark unions share the cached source."""
    out = None
    for i in range(start, end):
        branch = series.select(
            F.concat(F.col("name"), F.lit(f".shift_{i}")).alias("name"),
            (F.col("ts") + F.lit(i * shift_s)).alias("ts"),
            "value",
        )
        out = branch if out is None else out.unionAll(branch)
    return out


def divide_series_lists(dividends: DataFrame, divisors: DataFrame) -> DataFrame:
    """``divideSeriesLists``: pair the two lists positionally BY SORTED NAME
    (graphite zips the two fetched lists; dot-name order is the only
    deterministic DataFrame analogue) and divide bucket-wise.  Unequal list
    lengths raise in graphite; here unmatched ranks simply drop."""
    wn = Window.orderBy("name")

    def ranked(df: DataFrame, v: str) -> DataFrame:
        names = df.select("name").distinct().withColumn("r", F.row_number().over(wn))
        return df.join(F.broadcast(names), "name").select(
            "r", "ts", F.col("value").alias(v), *( ["name"] if v == "v" else [] )
        )

    num = ranked(dividends, "v")
    den = ranked(divisors, "w")
    return num.join(den, ["r", "ts"]).select(
        "name", "ts", (F.col("v") / F.nullif(F.col("w"), F.lit(0.0))).alias("value")
    )


def group_by_nodes(series: DataFrame, how: str, *nodes: int) -> DataFrame:
    """``groupByNodes``: aggregate series whose selected node components
    agree — the multi-node generalization of :func:`group_by_node`."""
    parts = F.split(F.col("name"), r"\.")
    key = F.concat_ws(".", *[F.element_at(parts, i + 1) for i in nodes])
    return (
        series.groupBy(key.alias("name"), "ts")
        .agg(agg_expr(how).alias("value"))
    )


def fallback_series(series: DataFrame, fallback: DataFrame) -> DataFrame:
    """``fallbackSeries``: if the primary selection is EMPTY, use the
    fallback — graphite's all-or-nothing swap, decided per call, not per
    name.  The emptiness probe is one cheap limit(1) action."""
    if series.limit(1).count() > 0:
        return series
    return fallback


def constant_line(
    spark, value: float, start: int, end: int, step: int
) -> DataFrame:
    """``constantLine``: a synthetic flat series on [start, end) at the
    given step (sequence + explode; no driver-side row building)."""
    return spark.range(1).select(
        F.lit("constantLine").alias("name"),
        F.explode(
            F.sequence(F.lit(start), F.lit(end - 1), F.lit(step))
        ).alias("ts"),
        F.lit(float(value)).alias("value"),
    )


def time_function(spark, name: str, start: int, end: int, step: int) -> DataFrame:
    """``time``/``identity``: a synthetic series whose value at t is t."""
    return spark.range(1).select(
        F.lit(name).alias("name"),
        F.explode(
            F.sequence(F.lit(start), F.lit(end - 1), F.lit(step))
        ).alias("ts"),
    ).select("name", "ts", F.col("ts").cast("double").alias("value"))


def map_series(series: DataFrame, *map_nodes: int) -> DataFrame:
    """``mapSeries``: tag each row with the dot-joined key of the selected
    node components — the grouping half of graphite's map/reduce pair."""
    parts = F.split(F.col("name"), r"\.")
    key = F.concat_ws(".", *[F.element_at(parts, i + 1) for i in map_nodes])
    return series.select(key.alias("map_key"), "name", "ts", "value")


_REDUCERS = {
    "divideSeries": lambda a, b: a / F.nullif(b, F.lit(0.0)),
    "diffSeries": lambda a, b: a - F.coalesce(b, F.lit(0.0)),
    "asPercent": lambda a, b: F.lit(100.0) * a / F.nullif(b, F.lit(0.0)),
}


def reduce_series(
    series: DataFrame,
    reducer: str,
    reduce_node: int,
    *matchers: str,
) -> DataFrame:
    """``reduceSeries``: group series whose names agree on every node except
    ``reduce_node``, pick the two series whose ``reduce_node`` component
    equals ``matchers[0]`` / ``matchers[1]``, and combine them with the
    named reducer (graphite render/functions.py reduceSeries with the
    standard two-argument reducers).

    One conditional aggregation per (group key, ts) — roles pivot into
    columns map-side, so the whole reduce is a single hash aggregation,
    no self-join.  Output names are ``<group_key>.<reducer>``.
    """
    if reducer not in _REDUCERS:
        raise ValueError(
            f"unknown reducer {reducer!r}; one of {sorted(_REDUCERS)}"
        )
    if len(matchers) != 2:
        raise ValueError("reduce_series supports exactly two matcher roles")
    parts = F.split(F.col("name"), r"\.")
    node_val = F.element_at(parts, reduce_node + 1)
    key = F.array_join(
        F.concat(
            F.slice(parts, 1, reduce_node),
            F.slice(parts, reduce_node + 2, F.size(parts) - reduce_node - 1),
        ),
        ".",
    )
    tagged = series.select(
        key.alias("k"), node_val.alias("role"), "ts", "value"
    ).filter(F.col("role").isin(*matchers))
    a, b = matchers
    pivoted = tagged.groupBy("k", "ts").agg(
        F.max(F.when(F.col("role") == a, F.col("value"))).alias("va"),
        F.max(F.when(F.col("role") == b, F.col("value"))).alias("vb"),
    )
    combined = _REDUCERS[reducer](F.col("va"), F.col("vb"))
    return pivoted.select(
        F.concat_ws(".", F.col("k"), F.lit(reducer)).alias("name"),
        "ts",
        combined.alias("value"),
    )


def zscore_outliers(series: DataFrame, threshold: float = 2.0) -> DataFrame:
    """Per-series z-score anomaly flags — the static-band complement to the
    holtWinters* family (graphite-web exposes the same idea through
    ``aberration``-style bands; a plain z-score is what ops dashboards
    reach for first).

    Per (name): z = (value - mean) / stddev_samp over the fetched window;
    points with |z| > threshold are flagged.  Degenerate flat series
    (stddev 0 or a single point) yield null z and are never flagged.

    One window partitioned by name — a single series-keyed exchange, and
    none at all when the input is already clustered by series (the cached
    `_hourly_finals` / bucketed-store read paths).
    """
    w = Window.partitionBy("name")
    sd = F.stddev_samp("value").over(w)
    # flag on the ROUNDED z (the value callers see): flagging the raw z
    # would let a 2.0000004-vs-2.0 disagree with the reported column
    z = F.round(
        F.when(sd > 0, (F.col("value") - F.avg("value").over(w)) / sd), 6
    )
    return series.select(
        "name",
        "ts",
        "value",
        z.alias("z"),
        F.coalesce(F.abs(z) > threshold, F.lit(False)).alias("is_outlier"),
    )


def seasonal_decompose(
    series: DataFrame, step: int, period: int
) -> DataFrame:
    """Additive seasonal decomposition (classical moving-average method):
    ``value = trend + seasonal + residual``.

    - trend: centered moving average covering exactly one period — a plain
      ``period``-bucket window when the period is odd, the classical
      2x``period`` MA (two offset period windows averaged) when even, so
      every phase contributes equal weight and a planted cycle cannot
      leak into the trend.  Emitted only where the frames are complete
      and gap-free — edges and null-holed windows stay null;
    - seasonal: per-phase mean of the detrended values (phase = bucket
      index mod ``period``), centered so the seasonal component sums to
      ~zero over a period;
    - residual: what neither explains.

    The capacity-planning / anomaly-triage decomposition ops dashboards
    run on daily-cycling metrics.  Shape: one per-series window + two
    small keyed aggregations joined back — no driver loops, no UDFs,
    scales with the series count like every other verb here.
    """
    if period < 2:
        raise ValueError("period must cover at least 2 buckets")
    half = period // 2
    # A ROWS frame counts rows, not buckets: on a sparse grid a frame of
    # ``period`` non-null rows can silently span non-contiguous timestamps.
    # Require the frame's timestamp span to be exactly (period-1)*step as
    # well, so a trend is only emitted over a genuinely gap-free window.
    span = (period - 1) * step
    if period % 2 == 1:
        win = Window.partitionBy("name").orderBy("ts").rowsBetween(-half, half)
        trend = F.when(
            (F.count("value").over(win) == period)
            & (F.max("ts").over(win) - F.min("ts").over(win) == span),
            F.avg("value").over(win),
        )
    else:
        w1 = Window.partitionBy("name").orderBy("ts").rowsBetween(-half, half - 1)
        w2 = Window.partitionBy("name").orderBy("ts").rowsBetween(-half + 1, half)
        trend = F.when(
            (F.count("value").over(w1) == period)
            & (F.count("value").over(w2) == period)
            & (F.max("ts").over(w1) - F.min("ts").over(w1) == span)
            & (F.max("ts").over(w2) - F.min("ts").over(w2) == span),
            (F.avg("value").over(w1) + F.avg("value").over(w2)) / 2,
        )
    phase = ((F.col("ts") % (step * period)) / step).cast("long")
    base = series.select(
        "name", "ts", "value", phase.alias("phase"), trend.alias("trend")
    ).withColumn("detr", F.col("value") - F.col("trend"))
    pm = (
        base.filter(F.col("detr").isNotNull())
        .groupBy("name", "phase")
        .agg(F.avg("detr").alias("pmean"))
    )
    ctr = pm.groupBy("name").agg(F.avg("pmean").alias("c"))
    return (
        base.join(pm, ["name", "phase"], "left")
        .join(ctr, "name", "left")
        .select(
            "name",
            "ts",
            "value",
            F.round("trend", 6).alias("trend"),
            F.round(F.col("pmean") - F.col("c"), 6).alias("seasonal"),
            F.round(
                F.col("value") - F.col("trend") - (F.col("pmean") - F.col("c")), 6
            ).alias("residual"),
        )
    )


# ---------------------------------------------------------------------------
# generic filter / rank / value-transform verbs (graphite render/functions.py
# filterSeries, sortBy, removeAboveValue family, …)
# ---------------------------------------------------------------------------

_FILTER_OPS = ("=", "!=", ">", ">=", "<", "<=")


def _series_stat(series: DataFrame, how: str) -> DataFrame:
    """Per-series scalar statistic (rounded at the oracle resolution) for
    the filter/sort/rank family — ``last`` orders by ts, matching
    graphite's safeLast."""
    return series.groupBy("name").agg(
        F.round(agg_expr(how, order="ts"), 6).alias("stat")
    )


def filter_series(series: DataFrame, how: str, op: str, n: float) -> DataFrame:
    """``filterSeries(seriesList, func, operator, threshold)``: keep series
    whose per-series statistic passes the comparison — the generic form of
    averageAbove/currentBelow/… (graphite render/functions.py
    filterSeries)."""
    col = F.col("stat")
    preds = {
        "=": col == n, "!=": col != n,
        ">": col > n, ">=": col >= n,
        "<": col < n, "<=": col <= n,
    }
    if op not in preds:
        raise ValueError(f"unknown operator {op!r}; one of {_FILTER_OPS}")
    kept = _series_stat(series, how).filter(preds[op]).select("name")
    return series.join(F.broadcast(kept), "name", "left_semi")


def sort_by(series: DataFrame, how: str = "average",
            reverse: bool = False) -> DataFrame:
    """``sortBy(seriesList, func, reverse)``: rank series by any aggregate-
    table statistic, ascending by default (the generic form of
    sortByTotal/sortByMaxima; rank/stat ride along like the other sort
    verbs and are projected away at the language boundary)."""
    stat = _series_stat(series, how)
    order = F.desc_nulls_last("stat") if reverse else F.asc_nulls_last("stat")
    w = Window.orderBy(order, F.asc("name"))
    ranked = stat.withColumn("rank", F.row_number().over(w).cast("long"))
    return series.join(F.broadcast(ranked), "name").select(
        "name", "ts", "value", "stat", "rank"
    )


def remove_above_value(series: DataFrame, n: float) -> DataFrame:
    """``removeAboveValue``: null out datapoints greater than ``n``."""
    return series.withColumn(
        "value", F.when(F.col("value") <= n, F.col("value"))
    )


def remove_below_value(series: DataFrame, n: float) -> DataFrame:
    """``removeBelowValue``: null out datapoints less than ``n``."""
    return series.withColumn(
        "value", F.when(F.col("value") >= n, F.col("value"))
    )


def maximum_below(series: DataFrame, n: float) -> DataFrame:
    """``maximumBelow``: keep series whose max is below ``n``."""
    return _stat_filter(series, "max", F.col("stat") < n)


def minimum_above(series: DataFrame, n: float) -> DataFrame:
    """``minimumAbove``: keep series whose min is above ``n``."""
    return _stat_filter(series, "min", F.col("stat") > n)


def remove_between_percentile(series: DataFrame, n: float) -> DataFrame:
    """``removeBetweenPercentile``: drop series that never leave the
    per-bucket [100-n, n] percentile band (n is folded above 50 first,
    like graphite).  Percentiles use the same interpolated definition as
    the rest of the percentile family.  One whole-partition window keyed
    by ts + a broadcast semi-join — no driver loop."""
    if n < 50:
        n = 100 - n
    w = Window.partitionBy("ts")
    hi = F.percentile("value", F.lit(_pct_frac(n))).over(w)
    lo = F.percentile("value", F.lit(1 - _pct_frac(n))).over(w)
    out = F.when((F.col("value") > hi) | (F.col("value") < lo), 1).otherwise(0)
    keep = (
        series.select("name", out.alias("out"))
        .groupBy("name").agg(F.max("out").alias("out"))
        .filter(F.col("out") == 1)
        .select("name")
    )
    return series.join(F.broadcast(keep), "name", "left_semi")


def exp_series(series: DataFrame) -> DataFrame:
    """``exp``: e ** value."""
    return series.withColumn("value", F.exp("value"))


def logit_series(series: DataFrame) -> DataFrame:
    """``logit``: ln(v / (1 - v)); v == 1 yields null (graphite emits None
    on the ZeroDivisionError)."""
    v = F.col("value")
    return series.withColumn(
        "value", F.when(v != 1.0, F.log(v / (F.lit(1.0) - v)))
    )


def pow_series_fold(series: DataFrame, name: str) -> DataFrame:
    """``powSeries``: per-bucket left-fold of exponentiation across series
    in name order (graphite folds in series-list order; sorted dot-names
    are the deterministic DataFrame analogue).  Like safePow, any null
    constituent nulls the bucket, and only a DOMAIN error nulls the fold
    (math.pow(-2, 3) == -8 is fine in graphite; a negative base with a
    non-integer exponent yields NaN here == ValueError there)."""
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("name").alias("o"), F.col("value").alias("v")))
    )

    def safe_pow(acc, x):
        p = F.pow(acc, x["v"])
        return F.when(~F.isnan(p), p)

    folded = F.aggregate(
        F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
        F.element_at(arr, 1)["v"],
        safe_pow,
    )
    complete = F.count(F.lit(1)) == F.count("value")
    return series.groupBy("ts").agg(
        F.when(complete, folded).alias("value")
    ).select(F.lit(name).alias("name"), "ts", "value")


# ---------------------------------------------------------------------------
# pairwise seriesLists family (sumSeriesLists / diffSeriesLists /
# multiplySeriesLists / aggregateSeriesLists)
# ---------------------------------------------------------------------------


def _paired_by_rank(a: DataFrame, b: DataFrame) -> DataFrame:
    """Zip two series lists positionally BY SORTED NAME (graphite zips the
    fetched lists; dot-name order is the deterministic DataFrame analogue)
    — rows (ts, v, w, name, name2); unmatched ranks drop."""
    wn = Window.orderBy("name")

    def ranked(df: DataFrame, v: str, alias: str) -> DataFrame:
        names = df.select("name").distinct().withColumn(
            "r", F.row_number().over(wn)
        )
        return df.join(F.broadcast(names), "name").select(
            "r", "ts", F.col("value").alias(v), F.col("name").alias(alias)
        )

    return ranked(a, "v", "name").join(
        ranked(b, "w", "name2"), ["r", "ts"]
    )


def aggregate_series_lists(a: DataFrame, b: DataFrame, how: str) -> DataFrame:
    """``sumSeriesLists`` / ``diffSeriesLists`` / ``multiplySeriesLists`` /
    ``aggregateSeriesLists(l1, l2, func)``: pair the two lists positionally
    and combine bucket-wise with graphite's safe* pair semantics (nulls
    ignored except multiply; order-sensitive funcs see (v, w) in list
    order).  Output names follow graphite: ``<func>Series(n1,n2)``.

    graphite-web raises InputParameterError (a 400) when the two lists
    differ in length — silently dropping unmatched ranks would hand data
    clients a truncated zip, so the same contract is kept here.  Both
    sides are materialized once (eager localCheckpoint, not .cache()):
    the length check is a driver-side action, and without materialization
    it would evaluate each (possibly render-deep) series subtree once for
    the count and AGAIN for the pairing — measured 2x on gr_series_lists
    (4.5s vs 2.3s at sf0.1).  localCheckpoint blocks are released by the
    ContextCleaner when the result drops out of scope — including on the
    length-mismatch raise — where CacheManager entries would accumulate
    for the session across repeated calls."""
    how = _AGG_ALIASES.get(how, how)
    a, b = a.localCheckpoint(eager=True), b.localCheckpoint(eager=True)
    na = a.select("name").distinct().count()
    nb = b.select("name").distinct().count()
    if na != nb:
        raise ValueError(
            f"seriesLists must have the same length ({na} vs {nb} series)")
    v, w = F.col("v"), F.col("w")
    both = v.isNotNull() & w.isNotNull()
    either = v.isNotNull() | w.isNotNull()
    nn = v.isNotNull().cast("int") + w.isNotNull().cast("int")
    pair_avg = F.when(
        either,
        (F.coalesce(v, F.lit(0.0)) + F.coalesce(w, F.lit(0.0))) / nn,
    )
    exprs = {
        "sum": F.when(either, F.coalesce(v, F.lit(0.0)) + F.coalesce(w, F.lit(0.0))),
        "average": pair_avg,
        "median": pair_avg,
        "min": F.least(v, w),
        "max": F.greatest(v, w),
        "multiply": F.when(both, v * w),
        "diff": F.when(both, v - w).when(v.isNotNull(), v).otherwise(w),
        "first": F.coalesce(v, w),
        "last": F.coalesce(w, v),
        "count": nn.cast("double"),
        "range": F.when(both, F.greatest(v, w) - F.least(v, w)).when(either, F.lit(0.0)),
        "stddev": F.when(both, F.abs(v - w) / 2).when(either, F.lit(0.0)),
    }
    if how not in exprs:
        raise ValueError(
            f"unknown pairwise aggregate {how!r}; one of {sorted(exprs)}"
        )
    label = F.format_string(f"{how}Series(%s,%s)", F.col("name"), F.col("name2"))
    return _paired_by_rank(a, b).select(
        label.alias("name"), "ts", exprs[how].alias("value")
    )


# ---------------------------------------------------------------------------
# name-decorating verbs (cactiStyle / legendValue) and display passthroughs
# ---------------------------------------------------------------------------


def cacti_style(series: DataFrame) -> DataFrame:
    """``cactiStyle``: suffix each name with Current / Max / Min at %.2f
    (graphite additionally space-justifies the columns for its text
    legend; the numbers and order match).  All-null series print NaN."""
    wf = (
        Window.partitionBy("name").orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w = Window.partitionBy("name")
    nan = F.lit(float("nan"))
    label = F.format_string(
        "%s Current:%.2f Max:%.2f Min:%.2f",
        F.col("name"),
        F.coalesce(F.last("value", ignorenulls=True).over(wf), nan),
        F.coalesce(F.max("value").over(w), nan),
        F.coalesce(F.min("value").over(w), nan),
    )
    return series.select(label.alias("name"), "ts", "value")


def legend_value(series: DataFrame, *stats: str) -> DataFrame:
    """``legendValue(seriesList, *valueTypes)``: append ``(stat: value)``
    per requested statistic to each name (avg/total/min/max/last and the
    rest of the aggregate table); values render rounded to 6 places.
    Stats come from one per-series groupBy broadcast back onto the rows —
    the order-sensitive aggregates (last/first/diff) can't nest inside a
    window expression."""
    cols = [
        F.round(agg_expr(st, order="ts"), 6).alias(f"_s{i}")
        for i, st in enumerate(stats)
    ]
    stat = series.groupBy("name").agg(*cols)
    name_col = F.col("name")
    for i, st in enumerate(stats):
        name_col = F.concat(
            name_col, F.lit(f" ({st}: "),
            F.coalesce(F.col(f"_s{i}").cast("string"), F.lit("None")),
            F.lit(")"),
        )
    return series.join(F.broadcast(stat), "name").select(
        name_col.alias("name"), "ts", "value"
    )


# ---------------------------------------------------------------------------
# zero-series synthetics (constantLine's siblings)
# ---------------------------------------------------------------------------


def sin_function(spark, name: str, amplitude: float,
                 start: int, end: int, step: int) -> DataFrame:
    """``sinFunction``: amplitude * sin(ts / 10) on the render grid —
    graphite's test-signal generator (its phase origin is the request
    time; ours is the epoch, deterministic for oracles)."""
    return spark.range(1).select(
        F.lit(name).alias("name"),
        F.explode(
            F.sequence(F.lit(start), F.lit(end - 1), F.lit(step))
        ).alias("ts"),
    ).select(
        "name", "ts",
        (F.lit(float(amplitude)) * F.sin(F.col("ts") / F.lit(10.0))).alias("value"),
    )


def random_walk(spark, name: str, start: int, end: int, step: int) -> DataFrame:
    """``randomWalkFunction``: cumulative sum of per-bucket steps uniform
    in [-0.5, 0.5).  graphite draws real random numbers; a replayable
    engine cannot, so the step stream is a fixed-seed hash of (name, ts)
    — same shape, deterministic across runs and resumes."""
    grid = spark.range(1).select(
        F.lit(name).alias("name"),
        F.explode(
            F.sequence(F.lit(start), F.lit(end - 1), F.lit(step))
        ).alias("ts"),
    )
    stepv = (
        F.pmod(F.xxhash64(F.col("name"), F.col("ts")), F.lit(1000)) / 1000.0
        - 0.5
    )
    w = (
        Window.partitionBy("name").orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.select(
        "name", "ts", F.sum(stepv).over(w).alias("value")
    )


def vertical_line(spark, ts: int, label: str = "vertical_line") -> DataFrame:
    """``verticalLine``: a single marker datapoint (value 1.0) at ``ts`` —
    the renderer draws the vertical; the data contract is the marker
    row."""
    return spark.range(1).select(
        F.lit(label).alias("name"),
        F.lit(int(ts)).cast("long").alias("ts"),
        F.lit(1.0).alias("value"),
    )


# ---------------------------------------------------------------------------
# tag-aware verbs over the carbon name encoding (path;k=v;k2=v2) —
# the render-language consumers of operators/tags.py's TagDB surface
# ---------------------------------------------------------------------------


def _tag_value(tag: str) -> Column:
    """Value of ``tag`` parsed from the carbon-encoded name column; the
    implicit ``name`` tag is the path before the first ``;`` (graphite
    convention, operators/tags.py parse_series)."""
    import re as _re

    if tag == "name":
        return F.element_at(F.split(F.col("name"), ";"), 1)
    return F.regexp_extract(
        F.col("name"), "(?:^|;)" + _re.escape(tag) + "=([^;]*)", 1
    )


def group_by_tags(series: DataFrame, how: str, *tags: str) -> DataFrame:
    """``groupByTags(seriesList, func, *tags)``: aggregate series whose
    selected tag values agree.  Output names follow graphite: the base is
    the ``name`` tag when requested, else the function name, with each
    (non-empty) grouped tag appended ``;tag=value`` in argument order."""
    if not tags:
        raise ValueError("groupByTags requires at least one tag")
    base = _tag_value("name") if "name" in tags else F.lit(
        _AGG_ALIASES.get(how, how)
    )
    label = base
    for t in tags:
        if t == "name":
            continue
        tv = _tag_value(t)
        label = F.concat(
            label,
            F.when(tv != "", F.concat(F.lit(f";{t}="), tv)).otherwise(F.lit("")),
        )
    return (
        series.groupBy(label.alias("name"), "ts")
        .agg(agg_expr(how).alias("value"))
    )


def alias_by_tags(series: DataFrame, *tags: str) -> DataFrame:
    """``aliasByTags``: rename each series to the dot-joined values of the
    requested tags (the tag analogue of aliasByNode; missing tags
    contribute empty components, like graphite's ``tags.get(tag, '')``)."""
    if not tags:
        raise ValueError("aliasByTags requires at least one tag")
    label = F.concat_ws(".", *[_tag_value(t) for t in tags])
    return series.select(label.alias("name"), "ts", "value")
