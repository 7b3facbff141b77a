"""Plan-shape regression gate for flagship queries.

scripts/plan_audit.py sweeps every contract query interactively; this test
pins the invariants that must NEVER regress on a representative slice —
analysis only (explain), no execution, so the whole gate costs seconds:

- no CartesianProduct anywhere (BroadcastNestedLoopJoin is the only
  accepted non-equi form, and only for intentional scalar/query-batch
  broadcasts);
- no row-at-a-time Python UDFs (BatchEvalPython) — Python runs only in
  Arrow-batched stages (ArrowEvalPython / MapInPandas);
- exchange count stays within each query's recorded budget (an exchange
  regression is a new shuffle at 100 TB).
"""

import io
import re
from contextlib import redirect_stdout

import pytest

SF_DIR = "/root/testdata/sf0.001"

#: query -> max allowed Exchange nodes: measured count in the
#: recompute-from-raw configuration +3 headroom (counts drift ±2 with
#: session history — exchange-reuse and AQE decisions vary with what ran
#: before).  The gate catches a CHANGE IN KIND — a join losing its
#: broadcast, a new shuffle in an operator — which shows up as far more
#: than +3; it is not an exact-count pin.  Store-backed bench plans have
#: far fewer exchanges (branch fan-outs read materialized partials);
#: gr_window_stats' large count is the recompute-mode union fan-out
#: re-deriving stage1 per branch, which the store collapses (PERF.md
#: finding 4).
EXCHANGE_BUDGETS = {
    "bg_downsample_1h": 7,
    "bg_fetch_1d": 11,
    "bg_downsample_dupslots": 9,
    "doc_dedup_minhash_lsh": 14,
    # containment's count covers the skew-salted posting join (hot/cold
    # split + hot-key count over the checkpointed posting relation)
    "doc_containment": 13,
    "emb_cosine_topk": 9,
    "emb_ann_ivfpq": 11,
    "tpch_q2": 13,
    "tpch_q21": 13,
    "events_sessionize": 5,
    "events_quantiles": 5,
    "gr_window_stats": 52,
    "mm_decode": 5,
    # round-6 session-2 additions (plan-measured at sf0.001 + 3 headroom).
    # doc_triangles' large count is the LSH subtree appearing once per
    # triangle-join leg IN THE PLAN; the contract query caches the pair
    # relation so the subtree executes once at runtime.
    "events_hll": 13,
    "doc_triangles": 47,
    "doc_hits": 23,
    "emb_pca": 5,
    "doc_rag_chunks": 5,
    "events_transitions": 9,
    "doc_quota_sample": 7,
    "doc_weighted_sample": 5,
    "doc_edit_verify": 15,
    "events_entry_paths": 7,
}


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def plans(spark):
    import __spark_entry__ as entrymod

    # pin the recompute-from-raw configuration: other tests may have run
    # materialize_store, whose _STAGE1_OVERRIDE switches stage1 reads to
    # store-backed plans with different exchange counts — budgets must be
    # measured against ONE deterministic shape regardless of test order
    saved = dict(entrymod._STAGE1_OVERRIDE)
    entrymod._STAGE1_OVERRIDE.clear()
    try:
        qs = entrymod.queries()
        out = {}
        for name in EXCHANGE_BUDGETS:
            out[name] = _plan(qs[name](spark, SF_DIR))
            spark.catalog.clearCache()
    finally:
        entrymod._STAGE1_OVERRIDE.update(saved)
    return out


def test_no_cartesian_products(plans):
    bad = [n for n, t in plans.items() if "CartesianProduct" in t]
    assert not bad, f"cartesian product appeared in: {bad}"


def test_no_row_at_a_time_python(plans):
    bad = [n for n, t in plans.items() if "BatchEvalPython" in t]
    assert not bad, f"non-Arrow Python UDF appeared in: {bad}"


def test_exchange_budgets(plans):
    over = {
        n: (len(re.findall(r"\bExchange\b", t)), EXCHANGE_BUDGETS[n])
        for n, t in plans.items()
        if len(re.findall(r"\bExchange\b", t)) > EXCHANGE_BUDGETS[n]
    }
    assert not over, f"exchange count over budget (got, budget): {over}"


def test_python_stages_are_arrow_batched(plans):
    # the multimodal decode is the designed Python stage — it must be the
    # Arrow-batched operator, present exactly where intended
    assert "MapInPandas" in plans["mm_decode"]


def test_windowed_funnel_is_one_exchange_zero_joins(spark):
    # the round-6 fold contract: per-user chain semantics = ONE shuffle on
    # the user key and no join of any kind (the old shape chained k-1
    # user-keyed joins)
    from pyspark.sql import functions as F  # noqa: F401

    from biggraphite_spark.operators.funnel import windowed_funnel

    df = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20), (2, "a", 5)],
        "user_id long, event_type string, sec long",
    )
    plan = _plan(windowed_funnel(df, ["a", "b", "c"], 100))
    # formatted explain prints each node twice (tree + detail): count the
    # detail headers, which appear once per physical node
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1
    assert "Join" not in plan


def test_cm_heavy_hitters_scans_raw_once(spark, tmp_path):
    # sketch cells are a window over the per-item exact counts, so the raw
    # input is scanned exactly once and the plan has no join at all
    from biggraphite_spark.operators.sketches import cm_heavy_hitters

    src = str(tmp_path / "items")
    spark.range(0, 1000).selectExpr(
        "concat('it', id % 37) AS item"
    ).write.parquet(src)
    df = spark.read.parquet(src)
    plan = _plan(cm_heavy_hitters(df, "item", depth=4, width=64))
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1
    assert "Join" not in plan


def test_autocomplete_is_single_scan_no_join(spark):
    # tag autocomplete = filter + map_keys explode + distinct: one
    # aggregation chain, no join — the shape a 100-TB catalog needs
    from biggraphite_spark.operators.tags import (
        auto_complete_tags, auto_complete_values, with_tags,
    )

    tagged = with_tags(spark.createDataFrame(
        [("cpu;dc=east;host=a",), ("disk;dc=west",)], ["series"]
    ))
    for df in (
        auto_complete_tags(tagged, ["dc=east"], tag_prefix="h"),
        auto_complete_values(tagged, "dc", ["host=a"]),
    ):
        plan = _plan(df)
        assert "Join" not in plan


def test_events_store_range_prunes_at_scan(spark, tmp_path):
    # /events/get_data pushes the when-range into the parquet scan
    from biggraphite_spark.operators.annotations import EventsStore

    store = EventsStore(spark, str(tmp_path / "ev"))
    store.add("deploy", 1000, ["deploy"])
    plan = _plan(store.get_data(500, 1500, ["deploy"]))
    assert "PushedFilters" in plan and "when" in plan
    assert "Join" not in plan
