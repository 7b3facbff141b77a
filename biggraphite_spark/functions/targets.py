"""Graphite render-target expression language: parser + evaluator.

graphite-web users query ``/render`` with nested function expressions over
glob leaves — ``movingAverage(sumSeries(bg.click.*), 4)`` — not bare
globs.  This module parses that grammar (the public graphite-web
``render/grammar.py`` surface; the reference delegates rendering to
graphite-web, SURVEY §0) and evaluates it onto the DataFrame
implementations in :mod:`.series`, so one target expression becomes ONE
Spark plan over the fetched series.

Scope: the computational core of the target language — nested calls,
glob leaves (brace groups included), numeric and quoted-string and
timespan ("1h"/"2d") arguments.  Presentation-only verbs (color,
lineWidth, …) are out of scope; unknown functions raise
``InvalidArgumentError`` so callers get graphite's 400 contract.

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
        return self.parse_expr()

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


def evaluate_target(node, fetch, step: int, start: int = 0) -> DataFrame:
    """Evaluate a parsed target: ``fetch(glob) -> DataFrame(name, ts,
    value)`` supplies the leaves; ``step`` is the fetched grid's bucket
    seconds (perSecond needs it) and ``start`` the aligned window start
    (smartSummarize aligns its buckets to it, per graphite)."""
    from . import series as S

    def ev(n) -> DataFrame:
        if isinstance(n, Leaf):
            return fetch(n.glob)
        args = [ev(a) if isinstance(a, (Call, Leaf)) else a for a in n.args]
        if not args or not isinstance(args[0], DataFrame):
            raise InvalidArgumentError(
                f"{n.func}: first argument must be a series expression")
        s, rest = args[0], args[1:]

        def combined(how: str) -> DataFrame:
            return S.combine(s, how, name=n.text)

        f = n.func
        if f == "sumSeries":
            return combined("sum")
        if f == "averageSeries":
            return combined("average")
        if f == "minSeries":
            return combined("min")
        if f == "maxSeries":
            return combined("max")
        if f == "percentileOfSeries":
            return S.percentile_of_series(s, _farg(rest[0])).select(
                # per-bucket single series: label like graphite
                S.F.lit(n.text).alias("name"), "ts", "value"
            )
        if f in ("movingAverage", "movingSum", "movingMin", "movingMax"):
            return S.moving(s, _iarg(rest[0]), how=f[len("moving"):].lower())
        if f == "movingMedian":
            return S.moving_median(s, _iarg(rest[0]))
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
            return S.transform_null(s, _farg(rest[0]) if rest else 0.0)
        if f == "timeShift":
            return S.time_shift(s, parse_timespan(_sarg(rest[0])))
        if f == "summarize":
            how = _sarg(rest[1]) if len(rest) > 1 else "sum"
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
            return S.hitcount(s, parse_timespan(_sarg(rest[0])))
        if f == "changed":
            return S.changed(s)
        if f == "interpolate":
            return S.interpolate(s, _iarg(rest[0]) if rest else None)
        if f == "logarithm":
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

            return exponential_moving_average(s, _iarg(rest[0]))
        if f in ("averageSeriesWithWildcards", "sumSeriesWithWildcards"):
            return S.combine_series_with_wildcards(
                s, "average" if f.startswith("average") else "sum",
                *[_iarg(a) for a in rest],
            )
        if f in (
            "holtWintersForecast",
            "holtWintersConfidenceBands",
            "holtWintersAberration",
        ):
            # graphite render/functions.py holtWinters family over the
            # fetched window (graphite additionally bootstraps with 7 days
            # of history before the window; callers wanting that fetch the
            # wider range and bootstrap_trim the result)
            from .holtwinters import holt_winters

            hw = holt_winters(s, step)
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
        raise InvalidArgumentError(f"unsupported render function {f!r}")

    return ev(node)
