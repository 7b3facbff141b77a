"""Quality-gate, repetition, BM25, and dup-cluster operator unit tests.

Hand-computed expectations on tiny frames; the sf0.01 DuckDB oracle queries
(doc_quality_rules / doc_repetition / doc_bm25 / doc_dup_clusters) cover the
full-corpus contract.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from biggraphite_spark.operators.dedup import dup_clusters
from biggraphite_spark.operators.text import (
    bm25_scores,
    quality_rules,
    repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_quality_rules_flags(spark):
    good = "the quick brown fox jumps over the lazy dog and then runs far away home again to rest now ok done"
    short = "tiny doc of words"
    out = {
        r["doc_id"]: r
        for r in quality_rules(_docs(spark, [(1, good), (2, short)])).collect()
    }
    assert out[1]["rule_word_count"] and out[1]["rule_stopwords"]
    assert out[1]["keep"]
    assert not out[2]["rule_word_count"]  # 4 words < min 20
    assert not out[2]["keep"]
    assert out[1]["n_words"] == 21


def test_quality_rules_max_token_and_alpha(spark):
    doc = " ".join(["word"] * 19 + ["x" * 25])
    row = quality_rules(_docs(spark, [(1, doc)])).collect()[0]
    assert row["max_token_len"] == 25
    assert not row["rule_max_token_len"]
    nums = " ".join(["123"] * 20)
    row = quality_rules(_docs(spark, [(1, nums)])).collect()[0]
    assert row["alpha_ratio"] == 0.0
    assert not row["rule_alpha_ratio"]


def test_repetition_stats_hand_computed(spark):
    # tokens: a a a b  -> top token 3/4; dup tokens 3/4
    # bigrams: "a a","a a","a b" -> top 2/3, dup 2/3
    row = repetition_stats(_docs(spark, [(1, "a a a b")])).collect()[0]
    assert row["top_token_frac"] == pytest.approx(0.75)
    assert row["dup_token_frac"] == pytest.approx(0.75)
    assert row["top_bigram_frac"] == pytest.approx(round(2 / 3, 6))
    assert row["dup_bigram_frac"] == pytest.approx(round(2 / 3, 6))


def test_repetition_no_repeats(spark):
    row = repetition_stats(_docs(spark, [(1, "a b c d")])).collect()[0]
    assert row["top_token_frac"] == pytest.approx(0.25)
    assert row["dup_token_frac"] == 0.0
    assert row["dup_bigram_frac"] == 0.0


def test_bm25_matches_reference_formula(spark):
    rows = [(1, "spark join spark x"), (2, "x y z w"), (3, "join a b c")]
    out = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(_docs(spark, rows), terms=("spark", "join")).collect()
    }
    # independent plain-Python recompute
    docs = {i: t.split(" ") for i, t in rows}
    N = 3
    avgdl = sum(len(t) for t in docs.values()) / N
    df = {tm: sum(tm in t for t in docs.values()) for tm in ("spark", "join")}

    def score(toks):
        s = 0.0
        for tm in ("spark", "join"):
            tf = toks.count(tm)
            idf = math.log(1 + (N - df[tm] + 0.5) / (df[tm] + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(toks) / avgdl))
        return round(s, 6)

    for i, toks in docs.items():
        assert out[i] == pytest.approx(score(toks), abs=1e-6)
    assert out[2] == 0.0


def test_dup_clusters_chain_and_singleton(spark):
    docs = _docs(spark, [(i, f"doc {i}") for i in range(1, 6)])
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "doc_a long, doc_b long"
    ).withColumn("jaccard", F.lit(1.0))
    out = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in dup_clusters(docs, pairs=pairs).collect()
    }
    # chain 1-2-3 collapses transitively; pair 4-5; every doc labelled
    assert out == {1: (1, 3), 2: (1, 3), 3: (1, 3), 4: (4, 2), 5: (4, 2)}


def test_dup_clusters_long_chain_converges(spark):
    n = 9
    docs = _docs(spark, [(i, f"doc {i}") for i in range(n)])
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    out = dup_clusters(docs, pairs=pairs).collect()
    assert all(r["cluster_id"] == 0 and r["cluster_size"] == n for r in out)


def test_dup_clusters_distributed_path_matches_driver_path(spark):
    docs = _docs(spark, [(i, f"doc {i}") for i in range(12)])
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (7, 8), (8, 9), (9, 10)], "doc_a long, doc_b long"
    )
    driver = dup_clusters(docs, pairs=pairs).collect()
    dist = dup_clusters(docs, pairs=pairs, driver_max_edges=0).collect()
    key = lambda r: (r["doc_id"], r["cluster_id"], r["cluster_size"])  # noqa: E731
    assert sorted(map(key, driver)) == sorted(map(key, dist))
