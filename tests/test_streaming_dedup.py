"""Streaming near-dup dedup against a historical corpus index.

Pins three contracts:
- the projection-form MinHash signatures are BIT-IDENTICAL to the
  aggregation form (same salted digests, same minima) — the property that
  lets the stream and the batch corpus share one keying;
- the batch core drops exactly the docs whose banding collides with the
  index (near-dups of corpus docs go, novel docs stay);
- the foreachBatch streaming query reproduces the batch answer across
  multiple micro-batches.
"""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from biggraphite_spark.operators.dedup import (
    minhash_signatures,
    minhash_signatures_projection,
)
from biggraphite_spark.streaming.dedup import (
    corpus_band_index,
    near_dup_filter,
    stream_near_dup_dedup,
)

DOC_SCHEMA = "doc_id long, text string"

CORPUS = [
    (100, "the quick brown fox jumps over the lazy dog near the river bank"),
    (101, "pack my box with five dozen liquor jugs before the morning train"),
]

STREAM_ROWS = [
    # near-dup of corpus doc 100 (one token changed) -> must be dropped
    (1, "the quick brown fox jumps over the lazy cat near the river bank"),
    # exact dup of corpus doc 101 -> must be dropped
    (2, "pack my box with five dozen liquor jugs before the morning train"),
    # novel -> must survive
    (3, "completely unrelated sentence about distributed query engines today"),
    (4, "another novel document mentioning winnowing fingerprints and spark"),
]


@pytest.fixture()
def dirs():
    d = tempfile.mkdtemp(prefix="bgspark-stream-dedup-")
    yield {k: os.path.join(d, k) for k in ("in", "out", "ckpt")}
    shutil.rmtree(d, ignore_errors=True)


def test_projection_signatures_match_aggregation_form(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    agg = {r["doc_id"]: r.asDict() for r in minhash_signatures(docs).collect()}
    proj = {r["doc_id"]: r.asDict() for r in minhash_signatures_projection(docs).collect()}
    assert agg == proj


def test_arrow_signatures_match_projection_form(spark):
    """All three signature forms are bit-identical — the Arrow twin must
    reproduce the split/md5/min pipeline exactly, including the degenerate
    short-text branch and empty-token behaviour of split-on-space."""
    from pyspark.sql import Row

    from biggraphite_spark.operators.dedup import minhash_signatures_arrow

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(60)
    edge = spark.createDataFrame(
        [
            Row(doc_id=900001, text="one two"),          # < n tokens
            Row(doc_id=900002, text=""),                  # empty text
            Row(doc_id=900003, text="a  b   c d"),        # empty tokens
            Row(doc_id=900004, text=" leading and trailing "),
            Row(doc_id=900005, text="uni çödé tøkens reppeat uni çödé tøkens"),
        ]
    )
    for df in (docs.select("doc_id", "text"), edge):
        proj = {
            r["doc_id"]: r.asDict()
            for r in minhash_signatures_projection(df).collect()
        }
        arrow = {
            r["doc_id"]: r.asDict()
            for r in minhash_signatures_arrow(df).collect()
        }
        assert proj == arrow


def test_near_dup_filter_batch_semantics(spark):
    corpus = spark.createDataFrame(CORPUS, DOC_SCHEMA)
    stream_docs = spark.createDataFrame(STREAM_ROWS, DOC_SCHEMA)
    index = corpus_band_index(corpus)
    kept = sorted(
        r["doc_id"] for r in near_dup_filter(stream_docs, index).collect()
    )
    assert kept == [3, 4]
    # the broadcast probe strategy is a physical-only rewrite
    kept_bc = sorted(
        r["doc_id"]
        for r in near_dup_filter(stream_docs, index, probe="broadcast").collect()
    )
    assert kept_bc == kept


def test_stream_matches_batch_across_microbatches(spark, dirs):
    corpus = spark.createDataFrame(CORPUS, DOC_SCHEMA)
    index = corpus_band_index(corpus)
    # two micro-batches: files land before each run of the availableNow query
    spark.createDataFrame(STREAM_ROWS[:2], DOC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(dirs["in"])
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(dirs["in"])
    q = stream_near_dup_dedup(stream, index, dirs["out"], dirs["ckpt"])
    q.awaitTermination(120)
    spark.createDataFrame(STREAM_ROWS[2:], DOC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(dirs["in"])
    stream2 = spark.readStream.schema(DOC_SCHEMA).parquet(dirs["in"])
    q2 = stream_near_dup_dedup(stream2, index, dirs["out"], dirs["ckpt"])
    q2.awaitTermination(120)
    survivors = sorted(
        r["doc_id"] for r in spark.read.parquet(dirs["out"]).collect()
    )
    assert survivors == [3, 4]


def test_persisted_band_index_probe_is_exchange_free_on_index_side(spark, dirs):
    """The bucketed band index hands the probe join HashPartitioning(bkey),
    which IS the join key: the index-side subtree must contain NO Exchange
    (the stream side, tiny, is the only thing that moves) — the 100 TB
    probe shape."""
    from biggraphite_spark.operators.dedup import (
        band_keys,
        minhash_signatures_projection,
    )
    from biggraphite_spark.streaming.dedup import _bkey, write_band_index

    corpus = spark.createDataFrame(CORPUS, DOC_SCHEMA)
    table = "bgspark_test_band_index"
    try:
        write_band_index(corpus, os.path.join(dirs["out"], "idx"), table, n_buckets=4)
        index = spark.table(table)
        incoming = spark.createDataFrame(STREAM_ROWS, DOC_SCHEMA)
        probe = _bkey(band_keys(minhash_signatures_projection(incoming))).join(
            index.hint("merge"), "bkey"
        )
        prev = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            plan = probe._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", prev)
        assert "Bucketed: true" in plan
        # exactly one Exchange: the stream side; the bucketed index scan
        # satisfies the join's distribution without one
        assert plan.count("Exchange") == 1
        # the colliding doc set is unchanged by the layout
        got = sorted(r["doc_id"] for r in probe.select("doc_id").distinct().collect())
        assert got == [1, 2]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_arrow_shingles_match_expression_form(spark):
    from pyspark.sql import Row

    from biggraphite_spark.operators.dedup import with_shingles

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(60)
    edge = spark.createDataFrame(
        [
            Row(doc_id=900001, text="one two"),
            Row(doc_id=900002, text=""),
            Row(doc_id=900003, text="a  b   c d a  b   c d"),  # dup grams
            Row(doc_id=900004, text=" x y z "),
        ]
    )
    for df in (docs.select("doc_id", "text"), edge):
        expr = {
            r["doc_id"]: list(r["shingles"])
            for r in with_shingles(df, method="expr").collect()
        }
        arrow = {
            r["doc_id"]: list(r["shingles"])
            for r in with_shingles(df, method="arrow").collect()
        }
        assert expr == arrow  # arrays equal INCLUDING order
