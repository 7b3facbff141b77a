"""Curation operators: hand-computed semantics + plan-shape checks."""

import math

from pyspark.sql import functions as F

from biggraphite_spark.operators.curation import (
    chunk_dedup,
    contamination,
    mix_weights,
    substring_runs,
    unigram_logprob,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_dedup_drops_shared_spans_keeps_order(spark):
    # chunk=2: doc 1 = [a b][c d][e f]; doc 2 = [a b][x y]; "a b" is shared
    df = _docs(spark, [(1, "a b c d e f"), (2, "a b x y")])
    out = {
        r["doc_id"]: r
        for r in chunk_dedup(df, chunk=2, max_doc_freq=1).collect()
    }
    assert out[1]["n_chunks"] == 3 and out[1]["n_kept"] == 2
    assert out[1]["cleaned_text"] == "c d e f"
    assert out[2]["cleaned_text"] == "x y"


def test_chunk_dedup_all_boilerplate_yields_empty_text(spark):
    df = _docs(spark, [(1, "a b"), (2, "a b")])
    for r in chunk_dedup(df, chunk=2, max_doc_freq=1).collect():
        assert r["n_kept"] == 0 and r["cleaned_text"] == ""


def test_chunk_dedup_short_tail_chunk(spark):
    # 5 tokens at chunk=2 -> 3 spans, last is 1 token
    df = _docs(spark, [(1, "a b c d e")])
    row = chunk_dedup(df, chunk=2, max_doc_freq=1).collect()[0]
    assert row["n_chunks"] == 3 and row["cleaned_text"] == "a b c d e"


def test_contamination_counts_distinct_gram_overlap(spark):
    corpus = _docs(spark, [(1, "a b c d e"), (2, "p q r s t")])
    bench = _docs(spark, [(100, "b c d e f")])
    out = {
        r["doc_id"]: r
        for r in contamination(corpus, bench, n=3, min_overlap=1).collect()
    }
    # doc 1 grams: abc bcd cde; bench grams: bcd cde def -> overlap 2
    assert out[1]["n_grams"] == 3 and out[1]["n_overlap"] == 2
    assert out[1]["contaminated"] is True
    assert out[2]["n_overlap"] == 0 and out[2]["contaminated"] is False


def test_contamination_benchmark_side_is_broadcast(spark):
    corpus = _docs(spark, [(1, "a b c d e")])
    bench = _docs(spark, [(100, "b c d e f")])
    plan = contamination(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_unigram_logprob_hand_computed(spark):
    # corpus: a a a b -> p(a)=3/4, p(b)=1/4
    df = _docs(spark, [(1, "a a"), (2, "a b")])
    out = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    h1 = -math.log2(3 / 4)
    h2 = (-math.log2(3 / 4) - math.log2(1 / 4)) / 2
    assert abs(out[1]["cross_entropy"] - round(h1, 6)) < 1e-9
    assert abs(out[2]["cross_entropy"] - round(h2, 6)) < 1e-9
    assert abs(out[2]["perplexity"] - round(2 ** h2, 6)) < 1e-9


def test_mix_weights_normalized_and_epoch_math(spark):
    df = spark.createDataFrame(
        [(1, "a b c d", "s1"), (2, "e f", "s1"), (3, "g h", "s2")],
        "doc_id long, text string, source string",
    )
    rows = {r["source"]: r for r in mix_weights(df, alpha=1.0, token_budget=8).collect()}
    # alpha=1 -> weights proportional to token counts: s1=6, s2=2
    assert abs(rows["s1"]["weight"] - 0.75) < 1e-9
    assert abs(rows["s2"]["weight"] - 0.25) < 1e-9
    # epochs = budget * w / tokens = 8 * .75 / 6 = 1.0 ; 8 * .25 / 2 = 1.0
    assert abs(rows["s1"]["effective_epochs"] - 1.0) < 1e-9
    assert abs(rows["s2"]["effective_epochs"] - 1.0) < 1e-9
    assert abs(sum(r["weight"] for r in rows.values()) - 1.0) < 1e-6


def test_substring_runs_recovers_exact_run_length(spark):
    # docs share exactly tokens 3..10 of doc 1 (run of 8); k=3 anchors
    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    df = _docs(
        spark,
        [(1, f"x1 x2 {shared} x3 x4"), (2, f"y1 {shared} y2 y3 y4")],
    )
    rows = substring_runs(df, k=3, min_run_tokens=8).collect()
    assert len(rows) == 1
    assert rows[0]["doc_a"] == 1 and rows[0]["doc_b"] == 2
    assert rows[0]["longest_run"] == 8
    # 8-token run at k=3 -> 6 anchors
    assert rows[0]["n_anchors"] == 6


def test_substring_runs_below_threshold_not_reported(spark):
    df = _docs(spark, [(1, "a b c d e x1 x2"), (2, "a b c d e y1 y2")])
    assert substring_runs(df, k=3, min_run_tokens=8).count() == 0


def test_substring_runs_df_cap_prunes_common_grams(spark):
    # the same gram in 3 docs with cap=2 -> no anchors survive
    df = _docs(
        spark,
        [(1, "a b c q1 q2 q3 q4 q5"), (2, "a b c r1 r2 r3 r4 r5"), (3, "a b c s1 s2 s3 s4 s5")],
    )
    assert (
        substring_runs(df, k=3, min_run_tokens=3, max_gram_doc_freq=2).count() == 0
    )


def test_chunk_dedup_single_wide_shuffle_pair(spark):
    # plan sanity: no cartesian/nested-loop stage anywhere in the operator
    df = _docs(spark, [(1, "a b c d"), (2, "a b x y")])
    plan = chunk_dedup(df, chunk=2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_chunk_dedup_identity_and_python_twin_on_seeded_corpus(spark):
    # seeded pseudo-corpus; twin-checks chunking + frequency logic in plain
    # Python, and the identity: with an infinite doc-freq cap nothing drops
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 37))))
        for i in range(1, 26)
    ]
    # force shared boilerplate spans across some docs
    boiler = "b1 b2 b3 b4"
    docs = [
        (i, f"{boiler} {t}" if i % 5 == 0 else t) for i, t in docs
    ]
    df = _docs(spark, docs)

    # identity: cap larger than corpus -> everything kept, text reassembles
    ident = {r["doc_id"]: r for r in chunk_dedup(df, chunk=4, max_doc_freq=10**6).collect()}
    for i, t in docs:
        assert ident[i]["cleaned_text"] == t
        assert ident[i]["n_kept"] == ident[i]["n_chunks"]

    # twin: python reimplementation of chunk hashing + doc-freq filter
    def chunks(t, c=4):
        toks = t.split(" ")
        return [" ".join(toks[j : j + c]) for j in range(0, len(toks), c)]

    from collections import defaultdict

    freq = defaultdict(set)
    for i, t in docs:
        for ch in set(chunks(t)):
            freq[ch].add(i)
    expected = {
        i: " ".join(ch for ch in chunks(t) if len(freq[ch]) <= 1) for i, t in docs
    }
    got = {r["doc_id"]: r["cleaned_text"] for r in chunk_dedup(df, chunk=4, max_doc_freq=1).collect()}
    assert got == expected


def test_curate_decision_table_stage_semantics(spark):
    from biggraphite_spark.operators.curation import curate

    good = ("the cat and the dog walk in the park with a friend and see "
            "many other animals along the way every single morning")
    docs = _docs(
        spark,
        [
            (1, good),                 # passes quality, unique
            (2, good),                 # exact dup of 1
            (3, "x y z"),              # fails quality
        ],
    ).withColumn("lang", F.lit("en"))
    bench = _docs(spark, [(100, good)]).withColumn("lang", F.lit("en"))
    out = {r["doc_id"]: r for r in curate(docs, bench, contam_n=3).collect()}
    assert out[1]["passed_quality"] is True and out[3]["passed_quality"] is False
    assert out[1]["is_exact_dup"] is False and out[2]["is_exact_dup"] is True
    # doc 1/2 share grams with the benchmark -> contaminated
    assert out[1]["contaminated"] is True
    assert out[3]["contaminated"] is False
    # contaminated docs never survive, regardless of other flags
    assert out[1]["keep"] is False and out[2]["keep"] is False


def test_dataset_card_single_row_sane(spark, sf_dir):
    from biggraphite_spark.operators.curation import dataset_card
    from biggraphite_spark.sources.testdata import load_parallel

    rows = dataset_card(load_parallel(spark, sf_dir, "documents")).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_docs > 0 and r.n_tokens > r.n_docs
    assert 0 <= r.pct_exact_dup <= 100 and 0 <= r.pct_quality_pass <= 100
    assert r.p50_doc_tokens <= r.p95_doc_tokens
    assert r.vocab_size > 0 and r.n_langs >= 1 and r.n_sources >= 1


def test_dataset_card_counts_duplicates(spark):
    from biggraphite_spark.operators.curation import dataset_card

    docs = spark.createDataFrame(
        [(0, "en", "s", "a b c"), (1, "en", "s", "a b c"), (2, "de", "s", "x y z")],
        ["doc_id", "lang", "source", "text"],
    )
    r = dataset_card(docs).collect()[0]
    # 3 docs, one exact-dup pair -> 1 redundant copy of 3 = 33.3333%
    assert r.n_docs == 3 and r.n_tokens == 9 and r.n_langs == 2
    assert abs(r.pct_exact_dup - 100.0 / 3) < 1e-3
    assert r.vocab_size == 6


def test_source_overlap_tiny_golden(spark):
    from biggraphite_spark.operators.curation import source_overlap

    docs = spark.createDataFrame(
        [
            (0, "A", "a b c d"),       # grams (n=2): "a b","b c","c d"
            (1, "B", "a b c x"),       # grams: "a b","b c","c x"
            (2, "C", "p q r s"),       # disjoint
        ],
        ["doc_id", "source", "text"],
    )
    rows = source_overlap(docs, group_col="source", n=2).collect()
    got = {(r.source_a, r.source_b): r for r in rows}
    assert set(got) == {("A", "B")}          # C shares nothing -> absent
    r = got[("A", "B")]
    assert r.shared == 2 and r.n_a == 3 and r.n_b == 3
    assert abs(r.overlap_coef - 2 / 3) < 1e-6


def test_chunk_neardup_drops_mutated_boilerplate(spark):
    """A 8-token footer repeated with ONE word changed must near-dup
    (Jaccard of 3-gram shingles >= 0.5) and drop from the LATER doc, while
    exact chunk_dedup would miss it."""
    from biggraphite_spark.operators.curation import chunk_dedup, chunk_neardup

    footer_a = "follow us on the social media for updates"
    # one word differs -> Jaccard 5/7; this specific pair ALSO lands a full
    # band match under the deterministic md5 signatures (banding is
    # probabilistic by design, but fixed for given strings — verified when
    # the test was written)
    footer_b = "follow us on the social media for info"
    body0 = "alpha beta gamma delta epsilon zeta eta theta"
    body1 = "iota kappa lam mu nu xi omicron pi"
    docs = spark.createDataFrame(
        [(0, body0 + " " + footer_a), (1, body1 + " " + footer_b)],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r for r in chunk_neardup(docs, chunk=8).collect()}
    assert got[0].n_chunks == 2 and got[0].n_kept == 2    # earlier doc intact
    assert got[1].n_chunks == 2 and got[1].n_kept == 1    # mutated footer dropped
    # the exact-hash pass keeps everything: hashes differ
    exact = {r.doc_id: r for r in chunk_dedup(docs, chunk=8).collect()}
    assert exact[1].n_kept == 2


def test_rag_chunks_overlap_and_coverage(spark):
    import pytest as _pytest

    from biggraphite_spark.operators.curation import rag_chunks

    words = [f"w{i}" for i in range(75)]
    docs = spark.createDataFrame(
        [(1, " ".join(words)), (2, "a b c")], "doc_id long, text string"
    )
    got = rag_chunks(docs, size=32, overlap=8).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # short doc: exactly one chunk, whole text
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "a b c"
    assert by_doc[2][0]["n_tokens"] == 3
    # 75 tokens, size 32, stride 24 -> ceil((75-32)/24)+1 = 3 chunks
    chunks = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert len(chunks) == 3
    toks = [c["chunk_text"].split(" ") for c in chunks]
    # stride geometry: chunk i starts at i*24; neighbours share 8 tokens
    assert toks[0] == words[0:32]
    assert toks[1] == words[24:56]
    assert toks[2] == words[48:75]  # final window reaches the last token
    assert toks[0][-8:] == toks[1][:8]
    assert chunks[2]["n_tokens"] == 27
    with _pytest.raises(ValueError):
        rag_chunks(docs, size=8, overlap=8)
