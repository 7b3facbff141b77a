"""Graphite render-target expression language: parser + evaluator.

graphite-web users query ``/render`` with nested function expressions over
glob leaves — ``movingAverage(sumSeries(bg.click.*), 4)`` — not bare
globs.  This module parses that grammar (the public graphite-web
``render/grammar.py`` surface; the reference delegates rendering to
graphite-web, SURVEY §0) and evaluates it onto the DataFrame
implementations in :mod:`.series`, so one target expression becomes ONE
Spark plan over the fetched series.

Scope: the computational core of the target language — nested calls,
glob leaves (brace groups included), numeric / quoted-string / timespan
("1h"/"2d") / bare-boolean arguments — plus the zero-series synthetics
(constantLine, timeFunction, sinFunction, randomWalkFunction,
verticalLine, seriesByTag), the generic aggregate-table verbs
(aggregate, filterSeries, sortBy, highest/lowest, movingWindow,
aggregateWithWildcards, groupByTags, …), the pairwise seriesLists
family, and the presentation verbs whose data contract is a name
decoration (cactiStyle, legendValue, dashed, stacked, …).
consolidateBy/setXFilesFactor ride a ``meta`` side-channel to the
renderer, which applies them at consolidation time.  Unknown functions
raise ``InvalidArgumentError`` so callers get graphite's 400 contract.

Evaluation returns frames with (name, ts, value): combining functions
label their single output series with the expression text, exactly how
graphite-web titles them.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..model import InvalidArgumentError

# ---------------------------------------------------------------------------
# AST + parser
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Call:
    func: str
    args: tuple
    text: str  # the source text, used to label combined series


@dataclass(frozen=True)
class Leaf:
    glob: str


_IDENT = re.compile(r"[A-Za-z_][A-Za-z_0-9]*")
_NUMBER = re.compile(r"-?\d+(\.\d+)?")
#: characters that may appear in a glob path component (brace commas are
#: handled by depth tracking in the tokenizer)
_PATHCHARS = set("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
                 "0123456789.*?[]!{},_-:#$%")

_TIMESPAN = re.compile(r"^(\d+)(s|min|h|d|w)$")
_TIMESPAN_UNITS = {"s": 1, "min": 60, "h": 3600, "d": 86400, "w": 604800}


def parse_timespan(s: str) -> int:
    m = _TIMESPAN.match(s)
    if not m:
        raise InvalidArgumentError(f"bad timespan {s!r}")
    return int(m.group(1)) * _TIMESPAN_UNITS[m.group(2)]


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.i = 0

    def error(self, msg: str):
        raise InvalidArgumentError(f"target parse error at {self.i}: {msg} "
                                   f"in {self.text!r}")

    def peek(self) -> str:
        return self.text[self.i] if self.i < len(self.text) else ""

    def skip_ws(self):
        while self.peek() in (" ", "\t"):
            self.i += 1

    def parse(self):
        node = self.parse_expr()
        self.skip_ws()
        if self.i != len(self.text):
            self.error("trailing input")
        return node

    def parse_expr(self):
        self.skip_ws()
        start = self.i
        m = _IDENT.match(self.text, self.i)
        if m and self.text[m.end():m.end() + 1] == "(":
            func = m.group(0)
            self.i = m.end() + 1  # past '('
            args = []
            self.skip_ws()
            if self.peek() == ")":
                self.i += 1
            else:
                while True:
                    args.append(self.parse_arg())
                    self.skip_ws()
                    if self.peek() == ",":
                        self.i += 1
                        continue
                    if self.peek() == ")":
                        self.i += 1
                        break
                    self.error("expected ',' or ')'")
            return Call(func, tuple(args), self.text[start:self.i])
        return self.parse_path()

    def parse_arg(self):
        self.skip_ws()
        c = self.peek()
        if c in ("'", '"'):
            quote, self.i = c, self.i + 1
            j = self.text.find(quote, self.i)
            if j < 0:
                self.error("unterminated string")
            s, self.i = self.text[self.i:j], j + 1
            return s
        m = _NUMBER.match(self.text, self.i)
        if m and not (
            # a number-prefixed path like 5xx.status.* stays a path
            self.text[m.end():m.end() + 1] in _PATHCHARS - set("0123456789")
            and self.text[m.end():m.end() + 1] not in (",", ")")
        ):
            self.i = m.end()
            v = m.group(0)
            return float(v) if "." in v else int(v)
        node = self.parse_expr()
        # bare true/false/none argument literals (graphite's grammar has
        # boolean/None tokens; a metric literally named "true" must be
        # globbed as {true} or quoted upstream, same trade graphite makes)
        if isinstance(node, Leaf):
            lit = {"true": True, "false": False,
                   "True": True, "False": False,
                   "none": None, "None": None}
            if node.glob in lit:
                return lit[node.glob]
        return node

    def parse_path(self):
        start = self.i
        depth = 0
        while self.i < len(self.text):
            c = self.text[self.i]
            if c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
                if depth < 0:
                    self.error("unbalanced '}'")
            elif depth == 0 and c in (",", ")", "(", " "):
                break
            elif c not in _PATHCHARS:
                self.error(f"bad path char {c!r}")
            self.i += 1
        if depth != 0:
            self.error("unbalanced '{'")
        if self.i == start:
            self.error("empty expression")
        return Leaf(self.text[start:self.i])


def parse_target(text: str):
    """Parse one render target into a Call/Leaf tree."""
    return _Parser(text).parse()


# ---------------------------------------------------------------------------
# evaluator
# ---------------------------------------------------------------------------


def _scalar(v):
    """Guard for scalar argument positions: an unquoted timespan/identifier
    like ``summarize(x, 1h)`` parses as a glob Leaf and evaluates to a
    (usually empty) fetched DataFrame — surface graphite's 400 contract
    instead of a confusing str(DataFrame)/TypeError downstream."""
    if isinstance(v, DataFrame):
        raise InvalidArgumentError(
            "expected a scalar argument, got a series expression "
            "(unquoted string argument?)"
        )
    return v


def _farg(v) -> float:
    return float(_scalar(v))


def _iarg(v) -> int:
    return int(_scalar(v))


def _sarg(v) -> str:
    return str(_scalar(v))


_GLOB_SPECIALS = set("*?[]{}")


def _exact_name(t: str) -> bool:
    """True when ``t`` is a literal metric name (no glob syntax) — the
    precondition for routing a refetch verb's derived target through the
    batched ``fetch_names`` path."""
    return bool(t) and not (set(t) & _GLOB_SPECIALS)


def _is_plain_leaf(template: str) -> bool:
    """True when a refetch template parses to a bare path (no function
    call) — '%' is a legal path char, so the unsubstituted template
    parses as-is."""
    try:
        return isinstance(parse_target(template), Leaf)
    except InvalidArgumentError:
        return False


#: functions that synthesize series from the render window instead of
#: consuming one (graphite render/functions.py's requestContext-only verbs)
_ZERO_SERIES = frozenset({
    "constantLine", "threshold", "identity", "timeFunction", "time",
    "sinFunction", "sin", "randomWalkFunction", "randomWalk",
    "verticalLine", "seriesByTag", "events",
})


def evaluate_target(node, fetch, step: int, start: int = 0,
                    end: int | None = None, spark=None,
                    tag_fetch=None, meta: dict | None = None,
                    events_fetch=None, fetch_names=None) -> DataFrame:
    """Evaluate a parsed target: ``fetch(glob) -> DataFrame(name, ts,
    value)`` supplies the leaves; ``step`` is the fetched grid's bucket
    seconds (perSecond needs it) and ``start`` the aligned window start
    (smartSummarize aligns its buckets to it, per graphite).

    ``end``/``spark`` power the zero-series synthetics (constantLine,
    timeFunction, …) — without them those verbs raise graphite's 400.
    ``tag_fetch(specs) -> DataFrame(name, ts, value)`` backs
    ``seriesByTag`` leaves; ``events_fetch(tags) -> DataFrame(when)``
    backs the ``events(*tags)`` annotation-overlay verb.
    ``fetch_names(names) -> DataFrame(name, ts, value)`` (optional) reads
    an explicit exact-name list in ONE plan — when supplied, the refetch
    verbs (applyByNode / useSeriesAbove / aliasQuery) batch their derived
    targets through it instead of re-entering the evaluator once per
    matched name, so their sub-plan count is independent of how many
    names matched.  ``meta``, when
    supplied, collects render hints that don't change the data
    (``consolidate`` from consolidateBy/cumulative, ``xff`` from
    setXFilesFactor) for the renderer to honor at consolidation time."""
    from . import series as S

    if meta is None:
        meta = {}

    def _barg(v) -> bool:
        return bool(_scalar(v))

    def _window_points(v) -> int:
        """moving* window argument: a point count, or a quoted timespan
        that graphite divides by the series step."""
        if isinstance(v, str):
            return max(1, parse_timespan(v) // max(1, step))
        return _iarg(v)

    def _spark():
        sp = spark
        if sp is None:
            from pyspark.sql import SparkSession

            sp = SparkSession.getActiveSession()
        if sp is None:
            raise InvalidArgumentError(
                "this render function needs a SparkSession")
        return sp

    def _window_end() -> int:
        if end is None:
            raise InvalidArgumentError(
                "this render function needs the render window (end=)")
        return end

    def _zero_series(n, f: str) -> DataFrame:
        from . import series as S

        args = list(n.args)
        if f == "seriesByTag":
            if tag_fetch is None:
                raise InvalidArgumentError(
                    "seriesByTag requires a tag database (tag_fetch=)")
            if not args:
                raise InvalidArgumentError(
                    "seriesByTag requires at least one matcher")
            return tag_fetch([_sarg(a) for a in args])
        if f == "events":
            # graphite render/functions.py events(*tags): annotation
            # counts binned onto the render grid, usable with
            # drawAsInfinite
            if events_fetch is None:
                raise InvalidArgumentError(
                    "events requires an annotation store (events_fetch=)")
            tags = [_sarg(a) for a in args]
            label = "events(" + ", ".join(f'"{t}"' for t in tags) + ")"
            ev = events_fetch(tags)
            bucket = (
                S.F.col("when") - ((S.F.col("when") - start) % S.F.lit(step))
            ).alias("ts")
            return (
                ev.filter(
                    (S.F.col("when") >= start)
                    & (S.F.col("when") < _window_end())
                )
                .groupBy(bucket)
                .agg(S.F.count(S.F.lit(1)).cast("double").alias("value"))
                .select(S.F.lit(label).alias("name"), "ts", "value")
            )
        if f in ("constantLine", "threshold"):
            value = _farg(args[0])
            out = S.constant_line(_spark(), value, start, _window_end(), step)
            # graphite names both after the numeric value unless threshold
            # got an explicit label (render/functions.py constantLine)
            label = (
                _sarg(args[1])
                if f == "threshold" and len(args) > 1 and args[1]
                else f"{value:g}"
            )
            return out.select(
                S.F.lit(label).alias("name"), "ts", "value"
            )
        if f in ("identity", "timeFunction", "time"):
            name = _sarg(args[0]) if args else f
            return S.time_function(_spark(), name, start, _window_end(), step)
        if f in ("sinFunction", "sin"):
            name = _sarg(args[0]) if args else "sin"
            amplitude = _farg(args[1]) if len(args) > 1 else 1.0
            return S.sin_function(
                _spark(), name, amplitude, start, _window_end(), step)
        if f in ("randomWalkFunction", "randomWalk"):
            name = _sarg(args[0]) if args else "randomWalk"
            return S.random_walk(_spark(), name, start, _window_end(), step)
        # verticalLine: marker at an absolute epoch ts (graphite also
        # accepts its at-style time strings; epoch covers the API use)
        ts = _iarg(args[0])
        label = _sarg(args[1]) if len(args) > 1 else "vertical_line"
        if not (start <= ts <= _window_end()):
            raise InvalidArgumentError(
                "verticalLine timestamp outside the render window")
        return S.vertical_line(_spark(), ts, label)

    def ev(n) -> DataFrame:
        if isinstance(n, Leaf):
            return fetch(n.glob)
        f = n.func
        if f in _ZERO_SERIES:
            return _zero_series(n, f)
        args = [ev(a) if isinstance(a, (Call, Leaf)) else a for a in n.args]
        if not args or not isinstance(args[0], DataFrame):
            raise InvalidArgumentError(
                f"{n.func}: first argument must be a series expression")
        s, rest = args[0], args[1:]

        def combined(how: str) -> DataFrame:
            return S.combine(s, how, name=n.text)
        # graphite registers short aliases in SeriesFunctions: sum/avg/
        # min/max for the *Series combiners, log for logarithm
        if f in ("sumSeries", "sum"):
            return combined("sum")
        if f in ("averageSeries", "avg"):
            return combined("average")
        if f in ("minSeries", "min"):
            return combined("min")
        if f in ("maxSeries", "max"):
            return combined("max")
        if f == "percentileOfSeries":
            return S.percentile_of_series(s, _farg(rest[0])).select(
                # per-bucket single series: label like graphite
                S.F.lit(n.text).alias("name"), "ts", "value"
            )
        if f in ("movingAverage", "movingSum", "movingMin", "movingMax"):
            # optional trailing xFilesFactor (graphite signature)
            return S.moving(s, _window_points(rest[0]),
                            how=f[len("moving"):].lower(),
                            xff=_farg(rest[1]) if len(rest) > 1 else None)
        if f == "movingMedian":
            return S.moving_median(s, _window_points(rest[0]))
        if f == "movingWindow":
            how = _sarg(rest[1]) if len(rest) > 1 else "average"
            return S.moving(s, _window_points(rest[0]), how=how,
                            xff=_farg(rest[2]) if len(rest) > 2 else None)
        if f == "scale":
            return S.scale(s, _farg(rest[0]))
        if f == "offset":
            return S.offset(s, _farg(rest[0]))
        if f == "absolute":
            return S.absolute(s)
        if f == "derivative":
            return S.derivative(s)
        if f == "nonNegativeDerivative":
            return S.non_negative_derivative(s)
        if f == "perSecond":
            return S.per_second(s, step)
        if f == "integral":
            return S.integral(s)
        if f == "keepLastValue":
            return S.keep_last_value(s, _iarg(rest[0]) if rest else None)
        if f == "transformNull":
            default = _farg(rest[0]) if rest else 0.0
            if len(rest) > 1 and isinstance(rest[1], DataFrame):
                return S.transform_null_ref(s, default, rest[1])
            return S.transform_null(s, default)
        if f == "timeShift":
            # optional resetEnd/alignDST accepted: resetEnd's clamp is
            # already applied by the fetch window; alignDST is a no-op in
            # a UTC engine
            return S.time_shift(s, parse_timespan(_sarg(rest[0])))
        if f == "summarize":
            how = _sarg(rest[1]) if len(rest) > 1 else "sum"
            if len(rest) > 2 and _barg(rest[2]):
                # alignToFrom=true: buckets anchor to the request window
                # start instead of the epoch — smartSummarize's grid
                return S.smart_summarize(
                    s, parse_timespan(_sarg(rest[0])), how=how, origin=start)
            return S.summarize(s, parse_timespan(_sarg(rest[0])), how=how)
        if f in ("highestAverage", "highestMax"):
            return S.highest(s, _iarg(rest[0]), how=f[len("highest"):].lower())
        if f == "lowestAverage":
            return S.lowest(s, _iarg(rest[0]), how="average")
        if f == "nPercentile":
            return S.n_percentile(s, _farg(rest[0]))
        if f == "aliasByNode":
            return S.alias_by_node(s, *[_iarg(a) for a in rest])
        if f == "groupByNode":
            return S.group_by_node(s, _iarg(rest[0]), _sarg(rest[1]))
        if f == "divideSeries":
            return S.divide_series(s, rest[0])
        if f == "diffSeries":
            return S.diff_series(s, *rest)
        if f == "asPercent":
            return S.as_percent(s)
        if f == "averageAbove":
            return S.average_above(s, _farg(rest[0]))
        if f == "averageBelow":
            return S.average_below(s, _farg(rest[0]))
        if f == "maximumAbove":
            return S.maximum_above(s, _farg(rest[0]))
        if f == "minimumBelow":
            return S.minimum_below(s, _farg(rest[0]))
        if f == "currentAbove":
            return S.current_above(s, _farg(rest[0]))
        if f == "currentBelow":
            return S.current_below(s, _farg(rest[0]))
        if f == "removeAbovePercentile":
            return S.remove_above_percentile(s, _farg(rest[0]))
        if f == "removeBelowPercentile":
            return S.remove_below_percentile(s, _farg(rest[0]))
        if f == "grep":
            return S.grep_series(s, _sarg(rest[0]))
        if f == "exclude":
            return S.exclude(s, _sarg(rest[0]))
        if f == "timeSlice":
            return S.time_slice(s, _iarg(rest[0]), _iarg(rest[1]))
        if f == "hitcount":
            align = len(rest) > 1 and _barg(rest[1])
            return S.hitcount(s, parse_timespan(_sarg(rest[0])),
                              origin=start if align else None)
        if f == "changed":
            return S.changed(s)
        if f == "interpolate":
            return S.interpolate(s, _iarg(rest[0]) if rest else None)
        if f in ("logarithm", "log"):
            return S.logarithm(s, _farg(rest[0]) if rest else 10.0)
        if f == "squareRoot":
            return S.square_root(s)
        if f == "pow":
            return S.pow_series(s, _farg(rest[0]))
        if f == "invert":
            return S.invert(s)
        if f == "offsetToZero":
            return S.offset_to_zero(s)
        if f == "clamp":
            return S.clamp(s, _farg(rest[0]), _farg(rest[1]))
        if f == "delay":
            return S.delay(s, _iarg(rest[0]))
        if f == "stdev":
            return S.stdev(s, _iarg(rest[0]))
        if f == "linearRegression":
            return S.linear_regression(s)
        if f == "mostDeviant":
            return S.most_deviant(s, _iarg(rest[0]))
        if f == "aliasSub":
            return S.alias_sub(s, _sarg(rest[0]), _sarg(rest[1]))
        if f == "limit":
            return S.limit_series(s, _iarg(rest[0]))
        if f == "alias":
            return s.select(S.F.lit(_sarg(rest[0])).alias("name"), "ts", "value")
        if f == "stddevSeries":
            return S.stddev_series(s).select(
                S.F.lit(n.text).alias("name"), "ts", "value"
            )
        if f == "averageOutsidePercentile":
            return S.average_outside_percentile(s, _farg(rest[0]))
        if f == "removeEmptySeries":
            return S.remove_empty_series(s, _farg(rest[0]) if rest else 0.0)
        if f == "isNonNull":
            return S.is_non_null(s)
        if f == "substr":
            return S.substr_series(s, _iarg(rest[0]), _iarg(rest[1]) if len(rest) > 1 else 0)
        if f == "minMax":
            return S.min_max(s)
        if f == "sigmoid":
            return S.sigmoid_series(s)
        if f == "round":
            return S.round_series(s, _iarg(rest[0]) if rest else 0)
        if f == "scaleToSeconds":
            return S.scale_to_seconds(s, _iarg(rest[0]))
        if f == "smartSummarize":
            how = _sarg(rest[1]) if len(rest) > 1 else "sum"
            return S.smart_summarize(s, parse_timespan(_sarg(rest[0])), how, origin=start)
        if f == "countSeries":
            return S.count_series(s).select(
                S.F.lit(n.text).alias("name"), "ts", "value"
            )
        if f == "rangeOfSeries":
            return S.range_of_series(s).select(
                S.F.lit(n.text).alias("name"), "ts", "value"
            )
        if f == "multiplySeries":
            return S.multiply_series(s).select(
                S.F.lit(n.text).alias("name"), "ts", "value"
            )
        if f == "weightedAverage":
            return S.weighted_average(s, rest[0], *[_iarg(a) for a in rest[1:]])
        if f == "groupByNodes":
            return S.group_by_nodes(s, _sarg(rest[0]), *[_iarg(a) for a in rest[1:]])
        if f == "timeStack":
            return S.time_stack(
                s, parse_timespan(_sarg(rest[0])),
                _iarg(rest[1]) if len(rest) > 1 else 0,
                _iarg(rest[2]) if len(rest) > 2 else 7,
            )
        if f == "fallbackSeries":
            return S.fallback_series(s, rest[0])
        if f == "unique":
            return S.unique_series(s, *rest)
        # sort verbs: the render contract is (name, ts, value); the rank
        # lives in graphite's series-list ORDER, which our JSON writer
        # derives from name order — the rank/stat columns are an internal
        # detail, so project them away at the language boundary
        if f == "sortByTotal":
            return S.sort_by_total(s).select("name", "ts", "value")
        if f == "sortByMaxima":
            return S.sort_by_maxima(s).select("name", "ts", "value")
        if f == "sortByMinima":
            return S.sort_by_minima(s).select("name", "ts", "value")
        if f == "sortByName":
            return S.sort_by_name(s)
        if f == "highestCurrent":
            return S.highest_current(s, _iarg(rest[0])).select("name", "ts", "value")
        if f == "lowestCurrent":
            return S.lowest_current(s, _iarg(rest[0])).select("name", "ts", "value")
        if f == "aliasByMetric":
            return S.alias_by_node(s, -1)
        if f == "integralByInterval":
            return S.integral_by_interval(s, parse_timespan(_sarg(rest[0])))
        if f == "aggregateLine":
            return S.aggregate_line(s, _sarg(rest[0]) if rest else "average")
        if f == "divideSeriesLists":
            if not rest or not isinstance(rest[0], DataFrame):
                raise InvalidArgumentError(
                    "divideSeriesLists: second argument must be a series list")
            return S.divide_series_lists(s, rest[0])
        if f == "group":
            out = s
            for extra in rest:
                if not isinstance(extra, DataFrame):
                    raise InvalidArgumentError(
                        "group: every argument must be a series expression")
                out = out.unionByName(extra)
            return out
        if f == "mapSeries":
            # standalone mapSeries renders as the flattened input series
            # (graphite returns the grouped list-of-lists, which the json
            # renderer flattens right back); the grouping key only becomes
            # visible when reduceSeries consumes it
            return S.map_series(s, *[_iarg(a) for a in rest]).select(
                "name", "ts", "value"
            )
        if f == "reduceSeries":
            try:
                return S.reduce_series(
                    s, _sarg(rest[0]), _iarg(rest[1]),
                    *[_sarg(a) for a in rest[2:]],
                )
            except ValueError as ex:  # unknown reducer / matcher arity
                raise InvalidArgumentError(str(ex))
        if f == "exponentialMovingAverage":
            from .holtwinters import exponential_moving_average

            return exponential_moving_average(s, _window_points(rest[0]))
        if f.endswith("SeriesWithWildcards"):
            # sum/average/min/max/multiplySeriesWithWildcards — any
            # aggregate-table prefix
            return S.combine_series_with_wildcards(
                s, f[: -len("SeriesWithWildcards")], *[_iarg(a) for a in rest]
            )
        if f == "aggregateWithWildcards":
            return S.combine_series_with_wildcards(
                s, _sarg(rest[0]), *[_iarg(a) for a in rest[1:]]
            )
        if f in (
            "holtWintersForecast",
            "holtWintersConfidenceBands",
            "holtWintersConfidenceArea",
            "holtWintersAberration",
        ):
            # graphite render/functions.py holtWinters family over the
            # fetched window (graphite additionally bootstraps with
            # bootstrapInterval (arg 1, default 7d) of history before the
            # window; callers wanting that fetch the wider range and
            # bootstrap_trim the result).  seasonality (arg 2, default 1d)
            # maps to the season length in buckets.
            from .holtwinters import holt_winters

            season = None
            if len(rest) > 1 and rest[1]:
                season = max(
                    1, parse_timespan(_sarg(rest[1])) // max(1, step))
            hw = holt_winters(s, step, season_length=season)
            named = S.F.concat(
                S.F.lit(f + "("), S.F.col("name"), S.F.lit(")")
            )
            if f == "holtWintersForecast":
                return hw.select(
                    named.alias("name"), "ts", S.F.col("forecast").alias("value")
                )
            if f == "holtWintersAberration":
                return hw.select(
                    named.alias("name"), "ts", S.F.col("aberration").alias("value")
                )
            upper = hw.select(
                S.F.concat(
                    S.F.lit("holtWintersConfidenceUpper("), S.F.col("name"), S.F.lit(")")
                ).alias("name"),
                "ts",
                S.F.col("upper").alias("value"),
            )
            lower = hw.select(
                S.F.concat(
                    S.F.lit("holtWintersConfidenceLower("), S.F.col("name"), S.F.lit(")")
                ).alias("name"),
                "ts",
                S.F.col("lower").alias("value"),
            )
            return upper.unionByName(lower)
        # -- generic aggregate / filter / rank verbs ------------------------
        if f == "aggregate":
            # optional third xFilesFactor arg is a consolidation hint our
            # dense-grid model doesn't need; accepted and ignored
            try:
                return combined(_sarg(rest[0]))
            except ValueError as ex:
                raise InvalidArgumentError(str(ex))
        if f == "filterSeries":
            try:
                return S.filter_series(
                    s, _sarg(rest[0]), _sarg(rest[1]), _farg(rest[2]))
            except ValueError as ex:
                raise InvalidArgumentError(str(ex))
        if f in ("highest", "lowest"):
            k = _iarg(rest[0]) if rest else 1
            how = _sarg(rest[1]) if len(rest) > 1 else "average"
            fn = S.highest if f == "highest" else S.lowest
            return fn(s, k, how)
        if f == "sortBy":
            how = _sarg(rest[0]) if rest else "average"
            rev = bool(_scalar(rest[1])) if len(rest) > 1 else False
            return S.sort_by(s, how, rev).select("name", "ts", "value")
        if f == "maximumBelow":
            return S.maximum_below(s, _farg(rest[0]))
        if f == "minimumAbove":
            return S.minimum_above(s, _farg(rest[0]))
        if f == "removeAboveValue":
            return S.remove_above_value(s, _farg(rest[0]))
        if f == "removeBelowValue":
            return S.remove_below_value(s, _farg(rest[0]))
        if f == "removeBetweenPercentile":
            return S.remove_between_percentile(s, _farg(rest[0]))
        # -- scalar value transforms ---------------------------------------
        if f == "add":
            return S.offset(s, _farg(rest[0]))
        if f == "exp":
            return S.exp_series(s)
        if f == "logit":
            return S.logit_series(s)
        if f == "toLowerCase":
            return s.select(S.F.lower("name").alias("name"), "ts", "value")
        if f == "toUpperCase":
            return s.select(S.F.upper("name").alias("name"), "ts", "value")
        # -- seriesLists family --------------------------------------------
        if f == "powSeries":
            out = s
            for extra in rest:
                if not isinstance(extra, DataFrame):
                    raise InvalidArgumentError(
                        "powSeries: every argument must be a series expression")
                out = out.unionByName(extra)
            return S.pow_series_fold(out, n.text)
        if f in ("sumSeriesLists", "diffSeriesLists", "multiplySeriesLists",
                 "aggregateSeriesLists"):
            if not rest or not isinstance(rest[0], DataFrame):
                raise InvalidArgumentError(
                    f"{f}: second argument must be a series list")
            how = {
                "sumSeriesLists": "sum",
                "diffSeriesLists": "diff",
                "multiplySeriesLists": "multiply",
            }.get(f) or _sarg(rest[1])
            try:
                return S.aggregate_series_lists(s, rest[0], how)
            except ValueError as ex:
                raise InvalidArgumentError(str(ex))
        # -- template / refetch verbs --------------------------------------
        if f == "applyByNode":
            node_i = _iarg(rest[0])
            template = _sarg(rest[1])
            new_name = _sarg(rest[2]) if len(rest) > 2 and rest[2] else None
            # one render's worth of distinct prefixes (dashboard-sized)
            prefixes = sorted({
                ".".join(r["name"].split(".")[: node_i + 1])
                for r in s.select("name").distinct().collect()
            })
            if not prefixes:
                return s.select("name", "ts", "value").limit(0)
            # BATCHED path: a pure-path template whose substitutions are
            # all exact names reads the whole derived set in ONE plan via
            # fetch_names — sub-plan count independent of matched prefixes
            derived = [template.replace("%", p) for p in prefixes]
            if (
                fetch_names is not None
                and _is_plain_leaf(template)
                and all(_exact_name(d) for d in derived)
                and len(set(derived)) == len(derived)
            ):
                fetched = fetch_names(derived).select("name", "ts", "value")
                if new_name:
                    mdf = fetched.sparkSession.createDataFrame(
                        [(d, new_name.replace("%", p))
                         for d, p in zip(derived, prefixes)],
                        "name string, _new string",
                    )
                    fetched = fetched.join(
                        S.F.broadcast(mdf), "name"
                    ).select(S.F.col("_new").alias("name"), "ts", "value")
                return fetched
            # template is an expression (or a glob): graphite's contract is
            # one evaluator re-entry per prefix with '%' substituted
            out = None
            for p in prefixes:
                sub = ev(parse_target(template.replace("%", p)))
                if new_name:
                    sub = sub.select(
                        S.F.lit(new_name.replace("%", p)).alias("name"),
                        "ts", "value",
                    )
                else:
                    sub = sub.select("name", "ts", "value")
                out = sub if out is None else out.unionByName(sub)
            return out
        if f == "compressPeriodicGaps":
            return S.compress_periodic_gaps(s)
        if f == "aliasQuery":
            # graphite 1.1: re.sub each name into a new target, evaluate
            # it, and interpolate its last value into newName ('%d'/'%f'
            # style)
            search, replace = _sarg(rest[0]), _sarg(rest[1])
            new_name = _sarg(rest[2])
            names = sorted(
                r["name"] for r in s.select("name").distinct().collect()
            )
            if not names:
                return s.select("name", "ts", "value").limit(0)
            qs = [re.sub(search, replace, nm) for nm in names]
            # BATCHED path: all derived targets are exact names — ONE
            # fetch_names read, ONE per-name latest-value aggregation, one
            # dashboard-sized collect; the rename is a broadcast join
            if fetch_names is not None and all(_exact_name(q) for q in qs):
                lastv = {
                    r["name"]: r["v"]
                    for r in fetch_names(sorted(set(qs)))
                    .filter(S.F.col("value").isNotNull())
                    .groupBy("name")
                    .agg(S.F.max_by("value", "ts").alias("v"))
                    .collect()
                }
                mapping = []
                for nm, q in zip(names, qs):
                    if q not in lastv:
                        raise InvalidArgumentError(
                            f"aliasQuery: no current value for {q!r}")
                    mapping.append((nm, new_name % lastv[q]))
                mdf = s.sparkSession.createDataFrame(
                    mapping, "name string, _new string")
                return s.join(S.F.broadcast(mdf), "name").select(
                    S.F.col("_new").alias("name"), "ts", "value"
                )
            # derived targets are expressions/globs: per-name re-entry
            # (dashboard-bounded, graphite's own shape for this verb)
            out = None
            for nm, q in zip(names, qs):
                sub = ev(parse_target(q))
                row = (
                    sub.filter(S.F.col("value").isNotNull())
                    .orderBy(S.F.desc("ts"))
                    .select("value")
                    .first()
                )
                if row is None:
                    raise InvalidArgumentError(
                        f"aliasQuery: no current value for {q!r}")
                label = new_name % row["value"]
                branch = s.filter(S.F.col("name") == nm).select(
                    S.F.lit(label).alias("name"), "ts", "value"
                )
                out = branch if out is None else out.unionByName(branch)
            return out
        if f == "useSeriesAbove":
            cut = _farg(rest[0])
            search, replace = _sarg(rest[1]), _sarg(rest[2])
            names = sorted(
                r["name"]
                for r in S.maximum_above(s, cut).select("name").distinct().collect()
            )
            if not names:
                return s.select("name", "ts", "value").limit(0)
            derived = [re.sub(search, replace, nm) for nm in names]
            # BATCHED path: exact derived names read in ONE plan (dup
            # substitutions keep the per-name loop so graphite's
            # one-series-per-source-name union shape is preserved)
            if (
                fetch_names is not None
                and all(_exact_name(d) for d in derived)
                and len(set(derived)) == len(derived)
            ):
                return fetch_names(derived).select("name", "ts", "value")
            out = None
            for d in derived:
                sub = fetch(d)
                out = sub if out is None else out.unionByName(sub)
            return out
        # -- name-decorating legend verbs ----------------------------------
        if f == "cactiStyle":
            # optional system/units args tweak graphite's number formatting
            # only; the stats and order are what the data contract carries
            return S.cacti_style(s)
        if f == "legendValue":
            try:
                return S.legend_value(s, *[_sarg(a) for a in rest])
            except ValueError as ex:
                raise InvalidArgumentError(str(ex))
        # -- tag-aware verbs ------------------------------------------------
        if f == "groupByTags":
            try:
                return S.group_by_tags(
                    s, _sarg(rest[0]), *[_sarg(a) for a in rest[1:]])
            except ValueError as ex:
                raise InvalidArgumentError(str(ex))
        if f == "aliasByTags":
            try:
                return S.alias_by_tags(s, *[_sarg(a) for a in rest])
            except ValueError as ex:
                raise InvalidArgumentError(str(ex))
        # -- consolidation / render hints (meta channel) --------------------
        if f in ("consolidateBy", "cumulative"):
            how = _sarg(rest[0]) if f == "consolidateBy" else "sum"
            if S._AGG_ALIASES.get(how, how) not in (
                "average", "sum", "min", "max", "first", "last",
            ):
                raise InvalidArgumentError(
                    f"unknown consolidation function {how!r}")
            meta["consolidate"] = how
            return s.select(
                S.F.format_string(
                    'consolidateBy(%s,"' + how + '")', S.F.col("name")
                ).alias("name"),
                "ts", "value",
            )
        if f in ("setXFilesFactor", "xFilesFactor"):
            meta["xff"] = _farg(rest[0])
            return s
        # -- display-attribute passthroughs ---------------------------------
        if f in ("alpha", "color", "lineWidth"):
            # pure draw attributes; the data contract is unchanged
            return s
        if f == "dashed":
            d = _farg(rest[0]) if rest else 5.0
            return s.select(
                S.F.concat(
                    S.F.lit("dashed("), S.F.col("name"), S.F.lit(f",{d:g})")
                ).alias("name"),
                "ts", "value",
            )
        if f in ("drawAsInfinite", "secondYAxis"):
            return s.select(
                S.F.format_string(f"{f}(%s)", S.F.col("name")).alias("name"),
                "ts", "value",
            )
        if f == "stacked":
            if rest:  # named stack group: grouping is a draw attribute
                return s
            return s.select(
                S.F.format_string("stacked(%s)", S.F.col("name")).alias("name"),
                "ts", "value",
            )
        if f == "areaBetween":
            # graphite renames both band series to the expression text
            return s.select(
                S.F.lit(n.text).alias("name"), "ts", "value"
            )
        raise InvalidArgumentError(f"unsupported render function {f!r}")

    return ev(node)


def supported_functions() -> list[str]:
    """Sorted names of every render function the evaluator dispatches —
    the data behind graphite-web's ``/functions`` endpoint (its function
    index, which query builders like grafana introspect).

    Derived by walking this module's AST for comparisons against the
    dispatch variable ``f`` (``f == "name"``, ``f in ("a", "b")``), plus
    the ``_ZERO_SERIES`` set and the ``endswith``-matched
    *SeriesWithWildcards family — self-maintaining, so a new ``if f ==``
    branch is published automatically."""
    import ast
    import inspect

    src = inspect.getsource(evaluate_target)
    names: set[str] = set(_ZERO_SERIES)
    for node in ast.walk(ast.parse(src)):
        if not (isinstance(node, ast.Compare)
                and isinstance(node.left, ast.Name)
                and node.left.id == "f"):
            continue
        for comp in node.comparators:
            if isinstance(comp, ast.Constant) and isinstance(comp.value, str):
                names.add(comp.value)
            elif isinstance(comp, (ast.Tuple, ast.List, ast.Set)):
                names.update(
                    e.value for e in comp.elts
                    if isinstance(e, ast.Constant) and isinstance(e.value, str)
                )
    for prefix in ("sum", "average", "min", "max", "multiply"):
        names.add(f"{prefix}SeriesWithWildcards")
    return sorted(names)
