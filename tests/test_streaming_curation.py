"""Batch curation operators running UNCHANGED on Structured Streaming.

The stateless text operators (quality gate, lang-id, token stats,
fingerprints) are pure Column projections, so the exact same functions that
filter a 100 TB batch corpus also filter a document stream — one codebase,
two execution modes.  These tests pin that contract: feed documents through
readStream, apply the batch operator, and compare against the batch result.

Streaming exact dedup uses ``dropDuplicatesWithinWatermark`` — the
Structured Streaming shape for ingest-time dedup with bounded state (state
for a key is dropped once the watermark passes it).
"""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string, lang string, source string, ts timestamp"


@pytest.fixture()
def docdirs():
    d = tempfile.mkdtemp(prefix="bgspark-curation-stream-")
    yield {k: os.path.join(d, k) for k in ("in", "out", "ckpt")}
    shutil.rmtree(d, ignore_errors=True)


def _feed(spark, path, rows, part):
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(os.path.join(path, part))


ROWS = [
    (1, "the quick brown fox jumps over the lazy dog again and again "
        "with a steady pace and a calm mind every single day", "en", "s1", None),
    (2, "x y z", "en", "s1", None),  # too short -> gated out
    (3, "der hund und die katze sind nicht ein problem das ist gut so "
        "und der tag ist lang und die nacht ist kurz heute", "de", "s2", None),
]


def test_quality_rules_identical_on_batch_and_stream(spark, docdirs):
    from biggraphite_spark.operators.text import quality_rules

    _feed(spark, docdirs["in"], ROWS, "a")
    batch = (
        spark.read.schema(DOC_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(docdirs["in"])
    )
    expected = {r["doc_id"]: r for r in quality_rules(batch, min_words=10).collect()}

    src = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(docdirs["in"])
    )
    q = (
        quality_rules(src, min_words=10)
        .writeStream.format("parquet")
        .option("path", docdirs["out"])
        .option("checkpointLocation", docdirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r
        for r in spark.read.parquet(docdirs["out"]).collect()
    }
    assert set(got) == set(expected)
    for doc_id, row in expected.items():
        assert got[doc_id]["keep"] == row["keep"]
        assert got[doc_id]["n_words"] == row["n_words"]
    assert expected[2]["keep"] is False and expected[1]["keep"] is True


def test_streaming_exact_dedup_within_watermark(spark, docdirs):
    # same text hash arriving twice within the watermark: second drop'd;
    # state is keyed by the hash, bounded by the watermark
    from datetime import datetime

    rows = [
        (1, "a b c", "en", "s1", datetime(2024, 1, 1, 0, 0, 0)),
        (2, "a b c", "en", "s1", datetime(2024, 1, 1, 0, 1, 0)),  # dup
        (3, "d e f", "en", "s1", datetime(2024, 1, 1, 0, 2, 0)),
    ]
    _feed(spark, docdirs["in"], rows, "a")
    src = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(docdirs["in"])
    )
    deduped = (
        src.withColumn("text_hash", F.md5("text"))
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["text_hash"])
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", docdirs["out"])
        .option("checkpointLocation", docdirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(docdirs["out"]).collect()
    assert len(out) == 2
    assert {r["text_hash"] for r in out} == {
        r["text_hash"] for r in spark.createDataFrame(rows, DOC_SCHEMA)
        .withColumn("text_hash", F.md5("text")).collect()
    }


def test_streaming_kmv_partials_merge_to_batch_answer(spark, docdirs):
    """Sketch algebra across micro-batches: each foreachBatch persists only
    the synopsis-sized KMV partials, and merging every persisted partial
    reproduces the single-pass batch sketch bit-for-bit — the pattern a
    streaming cardinality dashboard runs at any volume."""
    from biggraphite_spark.operators.sketches import (
        kmv_distinct,
        kmv_merge,
        kmv_partials,
    )

    schema = "g string, v long, ts timestamp"
    a = [("g1", i, None) for i in range(400)] + [("g2", i, None) for i in range(50)]
    b = [("g1", i, None) for i in range(300, 700)]  # overlaps batch a
    for part, rows in (("a", a), ("b", b)):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(os.path.join(docdirs["in"], part))

    partials_path = docdirs["out"]

    def sink(batch_df, _bid):
        kmv_partials(batch_df, "v", ("g",), k=64).write.mode("append").parquet(
            partials_path
        )

    src = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1)
        .parquet(docdirs["in"])
    )
    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", docdirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    partials = spark.read.parquet(partials_path)
    assert partials.count() >= 3  # >= 2 micro-batches x live groups
    merged = {
        r["g"]: (r["kth_hash"], r["est_distinct"])
        for r in kmv_merge(partials, ("g",), k=64).collect()
    }
    full = (
        spark.read.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(docdirs["in"])
    )
    direct = {
        r["g"]: (r["kth_hash"], r["est_distinct"])
        for r in kmv_distinct(full, "v", ("g",), k=64).collect()
    }
    assert merged == direct


def test_streaming_hll_partials_merge_to_batch_answer(spark, docdirs):
    """HLL register algebra across micro-batches: foreachBatch persists
    per-batch registers (≤2^p rows per group); max-merging every persisted
    partial reproduces the single-pass batch sketch bit-for-bit — max is
    associative AND idempotent, so re-processed batches can't even skew
    it (exactly-once not required for correctness)."""
    from biggraphite_spark.operators.sketches import (
        hll_distinct,
        hll_merge,
        hll_partials,
    )

    schema = "g string, v long, ts timestamp"
    a = [("g1", i, None) for i in range(400)] + [("g2", i, None) for i in range(50)]
    b = [("g1", i, None) for i in range(300, 700)]
    for part, rows in (("a", a), ("b", b)):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(os.path.join(docdirs["in"], part))

    partials_path = docdirs["out"]

    def sink(batch_df, _bid):
        hll_partials(batch_df, "v", ("g",)).write.mode("append").parquet(
            partials_path
        )

    src = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1)
        .parquet(docdirs["in"])
    )
    q = (
        src.writeStream.foreachBatch(sink)
        .option("checkpointLocation", docdirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    partials = spark.read.parquet(partials_path)
    merged = {
        r["g"]: r["est_distinct"]
        for r in hll_merge(partials, ("g",)).collect()
    }
    full = (
        spark.read.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(docdirs["in"])
    )
    direct = {
        r["g"]: r["est_distinct"]
        for r in hll_distinct(full, "v", ("g",)).collect()
    }
    assert merged == direct
    # idempotence: merging the partials TWICE (simulated replay) is a no-op
    replayed = {
        r["g"]: r["est_distinct"]
        for r in hll_merge(partials.unionByName(partials), ("g",)).collect()
    }
    assert replayed == direct
