"""Hot-metric skew: prove the PERF.md claim instead of asserting it.

Fixture: one metric holds ~30% of all points (a hot service counter — the
skew shape the reference's Cassandra partitioner also suffers) vs a uniform
twin of identical size.  The downsample and fetch paths must stay within
2x of the uniform wall-time, because their (name, bucket) grouping keys
stay fine-grained even under name skew and the map-side partial aggregate
collapses the hot key's rows before anything shuffles.  The plan-shape
check pins that second property mechanically, so the timing bound isn't
carried by hardware luck alone.
"""

import io
import time
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from biggraphite_spark.model import Stage
from biggraphite_spark.operators.downsample import downsample_stage0, with_aggregator
from biggraphite_spark.operators.fetch import fetch_points

N_ROWS = 2_000_000
N_METRICS = 100
SPAN_S = 30 * 86400
STAGE1 = Stage.from_string("1000*3600s")


def _points(spark, hot_frac):
    """Deterministic synthetic points over 30 days; with hot_frac, metric
    m0 owns that share of all rows and the rest spread uniformly."""
    df = spark.range(N_ROWS)
    if hot_frac:
        hot_rows = int(N_ROWS * hot_frac)
        name = F.when(F.col("id") < hot_rows, F.lit("m0")).otherwise(
            F.concat(F.lit("m"), (F.col("id") % (N_METRICS - 1) + 1).cast("string"))
        )
    else:
        name = F.concat(F.lit("m"), (F.col("id") % N_METRICS).cast("string"))
    return df.select(
        name.alias("name"),
        ((F.col("id") * 7919) % SPAN_S).alias("ts"),  # spread across buckets
        (F.col("id") % 1000).cast("double").alias("value"),
    )


def _catalog(spark):
    rows = [(f"m{i}", "average") for i in range(N_METRICS)]
    return spark.createDataFrame(rows, "name string, aggregator string")


def _timed(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def _downsample(spark, pts):
    return downsample_stage0(with_aggregator(pts, _catalog(spark)), STAGE1)


def _fetch(spark, pts):
    stage1 = _downsample(spark, pts)
    return fetch_points(stage1, _catalog(spark), 0, SPAN_S, target=STAGE1)


@pytest.mark.parametrize("path", ["downsample", "fetch"])
def test_skew_within_2x_of_uniform(spark, path):
    build = _downsample if path == "downsample" else _fetch
    uniform = build(spark, _points(spark, None))
    skewed = build(spark, _points(spark, 0.30))
    _timed(uniform)  # warm JIT/codegen on the identical plan shape
    _timed(skewed)
    # interleave trials so transient JVM load (GC, other suites' leftover
    # threads) biases both sides equally; min-of-3 drops the outliers
    pairs = [(_timed(uniform), _timed(skewed)) for _ in range(3)]
    t_uniform = min(u for u, _ in pairs)
    t_skew = min(s for _, s in pairs)
    assert t_skew <= 2.0 * max(t_uniform, 0.2), (
        f"{path}: skewed {t_skew:.2f}s vs uniform {t_uniform:.2f}s ({pairs})"
    )


def test_downsample_partial_aggregates_before_exchange(spark):
    """The skew-absorbers in the plan: a partial aggregate below the
    exchange (the hot metric's rows collapse per input partition before
    they ever shuffle) and HASH aggregation — a string-typed agg buffer
    (e.g. first(aggregator)) would silently demote the rollup to
    SortAggregate, sorting every raw point per partition."""
    plan = io.StringIO()
    with redirect_stdout(plan):
        _downsample(spark, _points(spark, 0.30)).explain("formatted")
    text = plan.getvalue()
    assert text.count("HashAggregate") >= 2, text  # partial + final
    assert "SortAggregate" not in text, text
    # the shuffle is keyed on the fine-grained (name, aggregator, bucket)
    # tuple, not name alone (formatted mode lists the keys on the Exchange
    # node's Arguments line)
    exchange_args = next(
        line for line in text.splitlines()
        if "hashpartitioning" in line and "Arguments" in line
    )
    assert "name" in exchange_args and "groupingexpression" in exchange_args
