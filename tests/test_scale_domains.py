"""Scale-domain adjudications + bench guard rails.

Round-8 verdict items 6 and 7: the quadratic-by-design exact baselines were
adjudicated in prose; now the registry carries machine-readable
``scale_domain`` tags that bench.py turns into skipped-with-reason record
entries, and a per-query spill guard cancels a runaway query BEFORE it
fills the box's disk (the sf10 failure mode: one exact baseline spilled
>78 GB and killed the remaining queries).
"""

from __future__ import annotations

from pyspark.sql import functions as F

import bench
import __spark_entry__ as entrymod


def test_scale_domain_schema_and_membership():
    """Every tag names a registered query, carries a numeric max_sf and a
    reason that names its production sibling or measurement disposition."""
    domains = entrymod.scale_domains()
    registered = set(entrymod.queries())
    assert domains, "the four adjudicated baselines must be tagged"
    for name, dom in domains.items():
        assert name in registered, name
        assert set(dom) == {"max_sf", "reason"}, (name, dom)
        assert isinstance(dom["max_sf"], (int, float)) and dom["max_sf"] > 0
        assert isinstance(dom["reason"], str) and len(dom["reason"]) >= 20
    # the adjudicated set, exactly: new tags need a new disposition (the
    # round-8 four + round-9's doc_containment_recall, which embeds the
    # exact containment baseline as its recall denominator)
    assert set(domains) == {
        "doc_dedup_ngram",
        "doc_containment",
        "doc_containment_recall",
        "doc_lsh_recall",
        "doc_simhash_pairs",
    }
    # every tagged baseline's sibling claim is live: the named sibling in
    # the reason text must itself be a registered, untagged query
    siblings = {
        "doc_dedup_ngram": ("doc_dedup_minhash_lsh", "doc_dedup_ngram_prefix"),
        "doc_containment": ("doc_containment_prefix",),
        "doc_simhash_pairs": ("doc_simhash_pairs64",),
    }
    for name, sibs in siblings.items():
        for sib in sibs:
            assert sib in domains[name]["reason"]
            assert sib in registered and sib not in domains


def test_bench_record_carries_skipped_map():
    out = bench.build_record(
        samples={"q1": [1.0]},
        errors={},
        chunk_loadavg=[1.0],
        mat={},
        sf_dir="/x/sf10",
        passes=1,
        partial=False,
        skipped={"doc_dedup_ngram": "scale_domain max_sf=1: ..."},
    )
    keys = list(out.keys())
    # summary-first contract: skipped is a scalar-sized map, before queries
    assert keys.index("skipped") < keys.index("queries")
    assert out["skipped"] == {"doc_dedup_ngram": "scale_domain max_sf=1: ..."}


def test_spill_guard_cancels_before_limit(spark):
    """Injected spill bomb: a shuffle whose write is far larger than the
    guard's limit must be cancelled mid-flight with a named spill breach —
    cancel-before-full, not die-on-disk-full."""
    bomb = (
        spark.range(3_000_000)
        .select("id", F.lpad(F.col("id").cast("string"), 512, "x").alias("pad"))
        .repartition(32, "id")  # forces a ~1.5 GB shuffle write
    )
    elapsed, breach, exc = bench.run_guarded(
        spark,
        lambda: bomb.write.format("noop").mode("overwrite").save(),
        spill_limit_bytes=30_000_000,  # 30 MB ceiling, ~2% of the bomb
        poll_s=0.3,
    )
    assert breach is not None and breach.startswith("spill>"), (breach, exc)
    assert exc is not None  # the cancelled action surfaced as an exception
    # the guard's own accounting: scratch growth at cancel was near the
    # limit, not the full bomb (poll granularity allows a few multiples)
    grown_gb = float(breach.split("grew ")[1].split("GB")[0])
    assert grown_gb < 1.0, breach


def test_timeout_guard_still_works(spark):
    # md5 over 40M rows: ~10s+ of executor work on any box, so the 0.5s
    # ceiling reliably fires mid-job
    slow = spark.range(40_000_000).select(
        F.md5(F.col("id").cast("string")).alias("h")
    ).agg(F.max("h"))
    elapsed, breach, exc = bench.run_guarded(
        spark,
        lambda: slow.write.format("noop").mode("overwrite").save(),
        timeout_s=0.5,
        poll_s=0.2,
    )
    assert breach is not None and breach.startswith("timeout>"), (breach, exc)
    assert elapsed < 30


def test_guard_off_is_transparent(spark):
    elapsed, breach, exc = bench.run_guarded(
        spark, lambda: spark.range(10).count()
    )
    assert breach is None and exc is None and elapsed >= 0


def test_registry_order_matches_queries_set():
    # bench.py chunks by registration order so that the driver-gate
    # rotation (which reorders queries() each round) cannot change chunk
    # composition between rounds; the two orders must stay the same SET
    import __spark_entry__ as entrymod

    assert set(entrymod.registry_order()) == set(entrymod.queries())
    assert entrymod.registry_order() == list(entrymod._QUERIES)
