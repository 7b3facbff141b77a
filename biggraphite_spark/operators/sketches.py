"""Deterministic streaming-style sketches: KMV distinct count, count-min
heavy hitters.

Sketches are how a 100 TB pipeline answers cardinality / frequency
questions without a full shuffle of the raw key space.  Spark ships
HyperLogLog (``approx_count_distinct``), but its register layout is
engine-private — no external oracle can replay it.  These two sketches
are built on md5, which every engine computes identically, so the DuckDB
correctness harness reproduces them bit for bit: the *estimates
themselves* are oracle-checked, not just smoke-tested.

- KMV (k minimum values), Bar-Yossef et al. 2002 "Counting distinct
  elements in a data stream": keep the k smallest uniform hashes of a
  set; the k-th smallest hash, as a fraction U of the hash space,
  estimates the cardinality as (k-1)/U.
- Count-min, Cormode & Muthukrishnan 2005: d independent hash rows of w
  counters; an item's estimate is the MIN of its d counters —
  overestimates only, which makes it a sound heavy-hitter screen.

Both are algebraic aggregations (groupBy over hashed keys): partial
aggregation map-side, one small shuffle, mergeable across partitions /
days / streaming micro-batches — the property that makes them sketches
and not just aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "kmv_distinct",
    "cm_heavy_hitters",
    "hll_partials",
    "hll_merge",
    "hll_distinct",
    "HASH_SPACE",
    "HLL_P",
]

#: 8 hex digits = 32-bit hash space; plenty below md5 collision concerns
#: for the 2^16-ish cardinalities a single sketch group holds, and small
#: enough that both engines read it back with exact integer math.
HASH_SPACE = float(1 << 32)


def _h32(col: Column, salt: str = "") -> Column:
    """First 32 bits of md5(salt || value) as a long — the shared uniform
    hash.  DuckDB twin: ``CAST(concat('0x', substr(md5(...), 1, 8)) AS
    BIGINT)``."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8), 16, 10
    ).cast("long")


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    k: int = 64,
) -> DataFrame:
    """KMV distinct-count estimate of ``value_col`` per ``group_cols``.

    Output per group: ``kth_hash`` (the sketch's synopsis value),
    ``est_distinct`` = (k-1) / (kth_hash / 2^32) rounded to 4 decimals,
    or the exact count when the group holds fewer than ``k`` distinct
    hashes (the standard small-set escape: the sketch IS the exhaustive
    set below k).

    Shape: distinct-hash reduction, then one per-group k-th order
    statistic via a capped sort window — the sort input is the distinct
    hash set, already far smaller than the data.  Mergeable: the union of
    two groups' k-minima contains the union's k minima.
    """
    hashes = df.select(
        *group_cols, _h32(F.col(value_col)).alias("__h")
    ).distinct()
    return _kmv_estimate(hashes, group_cols, k)


def _kmv_estimate(
    hashes: DataFrame, group_cols: tuple[str, ...], k: int
) -> DataFrame:
    """(kth_hash, est_distinct) per group from a distinct-hash relation —
    the shared tail of :func:`kmv_distinct` and :func:`kmv_merge`."""
    w = Window.partitionBy(*group_cols).orderBy("__h")
    ranked = hashes.select(
        *group_cols, "__h", F.row_number().over(w).alias("__r")
    ).filter(F.col("__r") <= k)
    n = F.max("__r")
    kth = F.max(F.when(F.col("__r") == k, F.col("__h")))
    return ranked.groupBy(*group_cols).agg(
        F.coalesce(kth, F.lit(-1)).alias("kth_hash"),
        F.round(
            F.when(n < k, n.cast("double")).otherwise(
                F.lit(float(k - 1)) / (kth / F.lit(HASH_SPACE))
            ),
            4,
        ).alias("est_distinct"),
    )


def kmv_partials(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    k: int = 64,
) -> DataFrame:
    """Mergeable KMV state: the ≤k smallest distinct hashes per group as a
    sorted array — the synopsis a per-day / per-partition / per-micro-batch
    job persists instead of raw keys.

    Union-then-retake-k is EXACT, not approximate-on-approximate: any
    global k-minimum is a k-minimum of its own partial (were ≥k hashes in
    its group smaller, they would be smaller globally too), so merging
    partials reproduces the direct sketch bit-for-bit — pinned by
    events_kmv_merge against the direct oracle.
    """
    hashes = df.select(
        *group_cols, _h32(F.col(value_col)).alias("__h")
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy("__h")
    ranked = hashes.select(
        *group_cols, "__h", F.row_number().over(w).alias("__r")
    ).filter(F.col("__r") <= k)
    return ranked.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list("__h")).alias("minima")
    )


def kmv_merge(
    partials: DataFrame,
    group_cols: tuple[str, ...] = (),
    k: int = 64,
) -> DataFrame:
    """Merge KMV partials down to ``group_cols`` (daily → weekly, partition
    → global, micro-batch → table): union the minima arrays, retake the k
    smallest, re-estimate with the same (k-1)/U rule.  Input is
    synopsis-sized (≤k hashes per partial), so the merge is a
    metadata-scale job no matter how large the raw data was."""
    hashes = partials.select(
        *group_cols, F.explode("minima").alias("__h")
    ).distinct()
    return _kmv_estimate(hashes, group_cols, k)


#: default HyperLogLog precision: 2^8 = 256 registers per group, the
#: classic ~6.5% standard-error point — small enough that a per-(group,
#: day) partial is a few hundred rows of synopsis.
HLL_P = 8


def _hll_alpha(m: int) -> float:
    """Flajolet et al. 2007 bias constant; both engines get the identical
    double because the oracle SQL interpolates repr() of this value."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_partials(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    p: int = HLL_P,
) -> DataFrame:
    """Mergeable HyperLogLog state: non-empty registers ``(idx, rho)`` per
    group — register index = top ``p`` bits of the shared 32-bit md5 hash,
    rho = leading-zero run of the remaining ``32-p`` bits + 1.

    Spark's own ``approx_count_distinct`` IS HyperLogLog, but its register
    layout is engine-private (module docstring); this one is built on the
    portable md5 hash, so the DuckDB oracle replays the registers — and
    therefore the estimate — bit for bit.

    Everything is exact integer math: ``rho`` comes from the binary-string
    length of the remainder (``conv(w, 10, 2)``), not ``log2``, so no
    engine's libm is in the loop.  Output is one row per NON-EMPTY
    register: ≤ 2^p rows per group no matter how large the input.
    """
    m_bits = 32 - p
    split = 1 << m_bits
    h = _h32(F.col(value_col))
    w = h % split
    rho = F.when(w == F.lit(0), F.lit(m_bits + 1)).otherwise(
        F.lit(m_bits + 1) - F.length(F.conv(w.cast("string"), 10, 2))
    )
    return (
        df.select(
            *group_cols,
            F.shiftright(h, m_bits).alias("idx"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(*group_cols, "idx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(
    partials: DataFrame,
    group_cols: tuple[str, ...] = (),
    p: int = HLL_P,
) -> DataFrame:
    """Merge HLL partials down to ``group_cols`` and estimate: register
    merge is ``max`` per index (associative/commutative, so daily →
    global merge is EXACTLY the direct sketch), then the standard
    estimator with the small-range linear-counting branch.

    Determinism note: ``Z = Σ 2^(-rho)`` over ≤ 2^p registers is a sum of
    dyadic rationals whose every partial sum is exactly representable in a
    double (needs < 40 mantissa bits), so the addition order — Spark's
    partial aggregation vs DuckDB's single pass — cannot change the
    result.  The only libm call (``ln`` in the linear-counting branch)
    gets bit-identical input on both sides; the contract query rounds
    with the documented paired tie-breaker.
    """
    m = 1 << p
    alpha = _hll_alpha(m)
    regs = partials.groupBy(*group_cols, "idx").agg(F.max("rho").alias("rho"))
    z = regs.groupBy(*group_cols).agg(
        (
            (F.lit(m) - F.count(F.lit(1))) * F.lit(1.0)
            + F.sum(F.pow(F.lit(2.0), -F.col("rho")))
        ).alias("zsum"),
        (F.lit(m) - F.count(F.lit(1))).alias("zeros"),
    )
    raw = F.lit(alpha) * F.lit(float(m * m)) / F.col("zsum")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (F.col("zeros") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zeros")),
    ).otherwise(raw)
    return z.select(*group_cols, est.alias("est_distinct"))


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
    p: int = HLL_P,
) -> DataFrame:
    """Single-pass HyperLogLog distinct estimate per group — partials
    straight into the merge (the merge of one partial is the identity)."""
    return hll_merge(hll_partials(df, value_col, group_cols, p), group_cols, p)


def cm_heavy_hitters(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    min_count: int = 1,
) -> DataFrame:
    """Count-min heavy hitters: items whose count-min estimate reaches
    ``min_count``, with the estimate alongside the exact count so the
    overestimate bias is visible.

    ONE pass over the raw data, then synopsis-sized algebra with no join:

    1. exact counts per distinct item — the only aggregation that sees
       the raw stream (map-side partial sums, one shuffle on the item);
    2. explode × depth over DISTINCT items and compute cell(d, b) =
       Σ exact_count as a window over (d, b) — identical to counting the
       raw stream into the cells, since every occurrence of an item
       lands in the same ``depth`` cells, and the window keeps each
       item's row alongside its cell total, so no probe join is needed;
    3. the per-item min over its ``depth`` cell totals.

    The raw input is scanned exactly ONCE (plan-asserted); everything
    after step 1 is distinct-item-scale.  ``estimate >= exact`` always
    (count-min never undercounts), asserted in tests.
    """
    d_rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("__d")
    item_counts = df.groupBy(F.col(item_col).alias("__item")).agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    probed = item_counts.select("__item", "exact_count", d_rows).select(
        "__item",
        "exact_count",
        "__d",
        (_h32_salted(F.col("__item"), F.col("__d")) % width).alias("__b"),
    )
    cell = F.sum("exact_count").over(Window.partitionBy("__d", "__b"))
    return (
        probed.withColumn("__cell", cell)
        .groupBy("__item", "exact_count")
        .agg(F.min("__cell").alias("cm_estimate"))
        .filter(F.col("cm_estimate") >= min_count)
        .select(
            F.col("__item").alias(item_col), "cm_estimate", "exact_count"
        )
    )


def _h32_salted(item: Column, d: Column) -> Column:
    """Row-d hash: first 32 bits of md5(d || ':' || item).  DuckDB twin
    uses the identical concatenation."""
    return F.conv(
        F.substring(
            F.md5(F.concat(d.cast("string"), F.lit(":"), item.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")


def log2_histogram(
    df: DataFrame,
    value_col: str,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """HDR-style log2-bucket histogram: positive values land in bucket
    ``floor(log2(v))`` (so bucket b covers [2^b, 2^(b+1))), counted per
    group — the fixed-size, exactly-mergeable latency summary (merging =
    summing counts), unlike exact percentiles which need the raw data.

    Output: group cols, bucket, n.  One hash aggregation over a
    projection; non-positive/null values are excluded (a real pipeline
    routes them to a quality counter first)."""
    bucket = F.floor(F.log2(F.col(value_col))).cast("long")
    return (
        df.filter(F.col(value_col) > 0)
        .groupBy(*group_cols, bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def hist_percentiles(
    hist: DataFrame,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Percentile reconstruction from a :func:`log2_histogram`: the q-th
    percentile estimate is the LOWER BOUND (2^bucket) of the first bucket
    whose cumulative count reaches ceil(q*n) — deterministic integer rank
    math, so the estimate is oracle-exact even though it is (by design) a
    bucket-resolution approximation of the true percentile."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = F.sum("n").over(Window.partitionBy(*group_cols))
    cum = F.sum("n").over(w)
    enriched = hist.select(
        *group_cols, "bucket", "n", cum.alias("cum"), total.alias("total")
    )
    aggs = [F.sum("n").alias("n_total")]
    for q in qs:
        rank = F.ceil(F.lit(q) * F.col("total"))
        aggs.append(
            F.pow(
                F.lit(2.0),
                F.min(F.when(F.col("cum") >= rank, F.col("bucket"))),
            ).alias(f"p{int(q * 100)}_est")
        )
    return enriched.groupBy(*group_cols).agg(*aggs)
