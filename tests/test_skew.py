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


# ---------------------------------------------------------------------------
# Dedup-path skew: hot boilerplate shingle
# ---------------------------------------------------------------------------

N_DOCS = 4_000
TOKS_PER_DOC = 30


def _docs(spark, boilerplate_frac):
    """Synthetic corpus of mutually-distinct docs; with boilerplate_frac,
    that share of docs embeds one common trigram ("corpus wide boilerplate")
    — the hot-shingle shape every crawl corpus has (cookie banners,
    license headers)."""
    df = spark.range(N_DOCS)
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(TOKS_PER_DOC - 1)),
        lambda i: F.concat_ws(
            "", F.lit("t"), ((F.col("id") * 131 + i * 7919) % 999983).cast("string")
        ),
    )
    text = F.array_join(toks, " ")
    if boilerplate_frac:
        hot = int(N_DOCS * boilerplate_frac)
        text = F.when(
            F.col("id") < hot,
            F.concat(F.lit("corpus wide boilerplate "), text),
        ).otherwise(text)
    return df.select(F.col("id").alias("doc_id"), text.alias("text"))


def test_lsh_dedup_robust_to_hot_shingle_skew(spark):
    """A boilerplate trigram shared by 30% of (otherwise distinct) docs makes
    the exact inverted-index join quadratic in the hot posting — but the
    LSH path's per-doc signatures differ, so bands don't collide and its
    cost stays flat.  This is the reason MinHash/LSH is the documented
    100 TB path while ngram_jaccard_pairs is the exact baseline."""
    from biggraphite_spark.operators.dedup import lsh_near_dups, with_shingles

    uniform = _docs(spark, None)
    skewed = _docs(spark, 0.30)

    # the hot shingle really does create a quadratic pair surface for the
    # exact path: >= C(1200, 2) co-shingled candidate pairs
    sh = with_shingles(skewed).select("doc_id", F.explode("shingles").alias("sh"))
    hot_postings = sh.filter(F.col("sh") == "corpus wide boilerplate").count()
    assert hot_postings >= int(N_DOCS * 0.30)

    build = lambda d: lsh_near_dups(d, threshold=0.5)  # noqa: E731
    _timed(build(uniform))  # warm identical plan shape
    _timed(build(skewed))
    pairs = [(_timed(build(uniform)), _timed(build(skewed))) for _ in range(3)]
    t_uniform = min(u for u, _ in pairs)
    t_skew = min(s for _, s in pairs)
    assert t_skew <= 2.0 * max(t_uniform, 0.2), (
        f"LSH dedup degraded under hot-shingle skew: "
        f"uniform {t_uniform:.2f}s vs skewed {t_skew:.2f}s"
    )
    # and the answer itself is clean: boilerplate alone must not make
    # distinct docs near-dups at J >= 0.5
    assert build(skewed).count() == 0


# ---------------------------------------------------------------------------
# Graph-family skew: hub node in half the pairs
# ---------------------------------------------------------------------------

HUB_D = 1500          # hub degree per side -> 2.25M wedges through the hub
HUB = 10_000
UNI_K = 27            # 3000 nodes x 27^2 ~= 2.2M wedges, spread uniformly


def _hub_pairs(spark):
    """Canonical (a < b) pair graph where ONE node sits in ~half the
    pairs — the boilerplate-document shape an LSH near-dup graph grows
    when the verify threshold is loose."""
    lo = spark.range(HUB_D).select(F.col("id").alias("a"), F.lit(HUB).alias("b"))
    hi = spark.range(HUB_D).select(
        F.lit(HUB).alias("a"), (F.col("id") + HUB + 1).alias("b"))
    closing = spark.range(300).select(
        F.col("id").alias("a"), (F.col("id") + HUB + 1).alias("b"))
    return lo.unionAll(hi).unionAll(closing).localCheckpoint()


def _uniform_pairs(spark):
    """Same order of wedge work, no hub: every node wedges K^2 ways."""
    return spark.range(3000).select(
        F.col("id").alias("a"),
        F.explode(F.sequence(F.col("id") + 1, F.col("id") + UNI_K)).alias("b"),
    ).localCheckpoint()


def test_triangle_hub_skew_within_2x_of_uniform(spark):
    """A hub in 50% of pairs must not serialize the wedge enumeration.

    Why it holds: the pair graph is small enough that Catalyst BROADCASTS
    one side of the wedge join, so the hub's D^2 wedges are produced by
    every probe-side input partition in parallel — broadcast joins have no
    shuffle key to skew.  The wedge WORK itself is inherent to the graph
    (both fixtures enumerate ~2.2M wedges), so equal work is the fair
    comparison, and the bound is the same 2x the downsample path pins."""
    from biggraphite_spark.operators.graph import triangle_stats

    hub_nodes = spark.range(2 * HUB).select(F.col("id").alias("doc_id"))
    uni_nodes = spark.range(3000 + UNI_K + 1).select(F.col("id").alias("doc_id"))
    hub = triangle_stats(_hub_pairs(spark), hub_nodes)
    uni = triangle_stats(_uniform_pairs(spark), uni_nodes)
    _timed(hub)  # warm codegen on both shapes
    _timed(uni)
    pairs = [(_timed(uni), _timed(hub)) for _ in range(3)]
    t_uni = min(u for u, _ in pairs)
    t_hub = min(h for _, h in pairs)
    assert t_hub <= 2.0 * max(t_uni, 0.2), (
        f"hub {t_hub:.2f}s vs uniform {t_uni:.2f}s ({pairs})")
    # the skew-immunity comes from the broadcast: pin it in the plan
    plan = io.StringIO()
    with redirect_stdout(plan):
        hub.explain("formatted")
    assert "BroadcastHashJoin" in plan.getvalue()


def test_triangle_salt_identical_results(spark):
    """The salted wedge join — the escape hatch for pair graphs too big to
    broadcast, where a hub key WOULD pile onto one shuffle partition — is
    result-identical to the unsalted plan on the hub fixture."""
    from biggraphite_spark.operators.graph import triangle_stats

    nodes = spark.range(2 * HUB).select(F.col("id").alias("doc_id"))
    p = _hub_pairs(spark)
    plain = {
        (r["doc_id"], r["degree"], r["triangles"])
        for r in triangle_stats(p, nodes).collect()
    }
    salted = {
        (r["doc_id"], r["degree"], r["triangles"])
        for r in triangle_stats(p, nodes, salt=8).collect()
    }
    assert plain == salted
    # sanity: the hub fixture actually HAS triangles (closing pairs)
    assert any(t > 0 for _, _, t in plain)


def test_salted_posting_join_identical_results(spark):
    """The skew-salted shared-shingle self-join behind ngram_jaccard_pairs /
    containment_pairs is result-identical to the direct join, on a corpus
    where a hot boilerplate shingle engages the salted path AND clone pairs
    span both paths (hot boilerplate shingles + cold unique shingles), so
    the per-pair shared-count must sum correctly across the union."""
    from biggraphite_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    base = _docs(spark, 0.30)
    clones = base.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + N_DOCS).alias("doc_id"), "text"
    )
    docs = base.unionByName(clones).localCheckpoint()
    for fn, key in (
        (ngram_jaccard_pairs, "jaccard"),
        (containment_pairs, "cont_a_in_b"),
    ):
        plain = {
            (r["doc_a"], r["doc_b"], r[key])
            for r in fn(docs, 0.5, hot_min=10**9).collect()
        }
        salted = {
            (r["doc_a"], r["doc_b"], r[key])
            for r in fn(docs, 0.5, salt_blocks=8, hot_min=8).collect()
        }
        assert plain == salted
        # sanity: the clone construction actually produces pairs
        assert len(plain) >= 50


def test_containment_prefix_pairs_lossless(spark):
    """The prefix-filtered scale path is BIT-IDENTICAL to the exact posting
    self-join — across collapse modes (clone-collapse on/off/auto), the
    skew-salted prefix join, and thresholds that make t*|A| integral (the
    FP ceiling edge).  The fixture mixes a hot boilerplate shingle, exact
    clones (exercising the distinct-set collapse + intra-group emission)
    and a short-doc-inside-long-doc pair (the asymmetric case containment
    exists for, which Jaccard-length pruning would drop).  Degenerate
    texts are in the fixture on purpose: >=2 NULL-text docs (shingle set
    [NULL] — must emit NO pairs, the exact path never equijoins NULL) and
    >=2 EMPTY-text docs (shingle set [''] — the '' shingle DOES equijoin,
    so their mutual 1.0 pairs must survive), which pins the collapse
    grouping (array-structural, not a null-dropping string encoding) and
    the intra-emission eligibility guard."""
    from biggraphite_spark.operators.dedup import (
        containment_pairs,
        containment_prefix_pairs,
    )

    base = _docs(spark, 0.30)
    clones = base.filter(F.col("doc_id") < 40).select(
        (F.col("doc_id") + N_DOCS).alias("doc_id"), "text"
    )
    # short docs fully contained in their long source: first 8 tokens
    shorts = base.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 2 * N_DOCS).alias("doc_id"),
        F.array_join(F.slice(F.split("text", " "), 1, 8), " ").alias("text"),
    )
    degenerate = spark.createDataFrame(
        [(3 * N_DOCS + 0, None), (3 * N_DOCS + 1, None), (3 * N_DOCS + 2, None),
         (3 * N_DOCS + 3, ""), (3 * N_DOCS + 4, "")],
        "doc_id long, text string",
    )
    docs = (
        base.unionByName(clones)
        .unionByName(shorts)
        .unionByName(degenerate)
        .localCheckpoint()
    )

    for t in (0.5, 0.75, 1.0):
        exact = sorted(
            tuple(r) for r in containment_pairs(docs, t).collect()
        )
        assert len(exact) >= 60  # clones + short-in-long pairs both present
        for kwargs in (
            {"collapse": True},
            {"collapse": False},
            {"collapse": "auto"},
            {"collapse": True, "salt_blocks": 8, "hot_min": 8},
            {"collapse": False, "salt_blocks": 8, "hot_min": 8},
        ):
            got = sorted(
                tuple(r)
                for r in containment_prefix_pairs(docs, t, **kwargs).collect()
            )
            assert got == exact, (t, kwargs)
    # the asymmetric pair class is really in the result: a short doc's
    # containment in its source is 1.0 while the reverse is far below it
    asym = [
        r
        for r in containment_pairs(docs, 0.75).collect()
        if 2 * N_DOCS <= r["doc_b"] < 3 * N_DOCS and r["cont_b_in_a"] == 1.0
    ]
    assert len(asym) >= 20
    assert all(r["cont_a_in_b"] < 0.75 for r in asym)


def test_jaccard_prefix_pairs_lossless(spark):
    """The prefix-filtered exact-Jaccard scale path is bit-identical to the
    all-pairs posting self-join, across collapse modes and the salted
    join, including exact clones (intra-group Jaccard exactly 1.0) and
    degenerate texts (NULL texts: no pairs; empty texts: mutual 1.0 pairs
    via the '' shingle — see the containment twin test)."""
    from biggraphite_spark.operators.dedup import (
        jaccard_prefix_pairs,
        ngram_jaccard_pairs,
    )

    base = _docs(spark, 0.30)
    clones = base.filter(F.col("doc_id") < 40).select(
        (F.col("doc_id") + N_DOCS).alias("doc_id"), "text"
    )
    degenerate = spark.createDataFrame(
        [(3 * N_DOCS + 0, None), (3 * N_DOCS + 1, None), (3 * N_DOCS + 2, None),
         (3 * N_DOCS + 3, ""), (3 * N_DOCS + 4, "")],
        "doc_id long, text string",
    )
    docs = base.unionByName(clones).unionByName(degenerate).localCheckpoint()

    for t in (0.5, 1.0):
        exact = sorted(
            tuple(r) for r in ngram_jaccard_pairs(docs, t).collect()
        )
        assert len(exact) >= 40  # the clone pairs are all J = 1.0
        for kwargs in (
            {"collapse": True},
            {"collapse": False},
            {"collapse": True, "salt_blocks": 8, "hot_min": 8},
        ):
            got = sorted(
                tuple(r)
                for r in jaccard_prefix_pairs(docs, t, **kwargs).collect()
            )
            assert got == exact, (t, kwargs)
