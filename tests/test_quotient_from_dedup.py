"""The dedup-provided twin quotient (``lsh_near_dups_quotient``): identical
non-null texts form CLOSED twin classes of the LSH near-dup graph by
construction (same text ⇒ same signature, band keys and verified Jaccard
against everyone; members pair at exactly 1.0), so the graph family can
consume the quotient straight off the text collapse instead of expanding
member pairs only to re-detect the very same classes.

Every test pins EQUALITY between the quotient-fed consumer and the fully
EXPANDED path (``collapse=False`` everywhere) on a corpus mixing clone
groups, genuinely near-duplicate (not identical) texts, singletons, and the
degenerate fixtures the lossless prefix tests established: ≥2 NULL-text
docs (isolated on the pair graph — NULL never equijoins) and ≥2 EMPTY-text
docs (the '' shingle DOES equijoin, so they pair at 1.0)."""

import pytest
from pyspark.sql import functions as F

from biggraphite_spark.operators.dedup import (
    dup_clusters,
    lsh_near_dups,
    lsh_near_dups_quotient,
)
from biggraphite_spark.operators.graph import (
    kcore,
    neardup_pagerank,
    triangle_stats,
)

N_BASE = 40
CLONES = 6  # every base doc gets this many exact clones


def _corpus(spark):
    """Clone-replicated corpus with near-dup (not identical) variants:
    base docs 0..39, each cloned CLONES times (identical text), plus a
    truncated variant per base doc (high-but-<1 Jaccard to its group),
    3 null-text docs and 2 empty-text docs."""
    base = spark.range(N_BASE)
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(19)),
        lambda i: F.concat_ws(
            "",
            F.lit("w"),
            (((F.col("id") % 8) * 131 + i * 7919) % 9973).cast("string"),
        ),
    )
    text = F.array_join(toks, " ")
    docs = base.select(F.col("id").alias("doc_id"), text.alias("text"))
    clones = docs.crossJoin(
        spark.range(1, CLONES + 1).withColumnRenamed("id", "rep")
    ).select(
        (F.col("doc_id") + F.col("rep") * 1000).alias("doc_id"), "text"
    )
    variants = docs.select(
        (F.col("doc_id") + 50_000).alias("doc_id"),
        F.array_join(F.slice(F.split("text", " "), 1, 17), " ").alias("text"),
    )
    degenerate = spark.createDataFrame(
        [
            (90_000, None),
            (90_001, None),
            (90_002, None),
            (90_010, ""),
            (90_011, ""),
        ],
        "doc_id long, text string",
    )
    return (
        docs.unionByName(clones)
        .unionByName(variants)
        .unionByName(degenerate)
        .localCheckpoint()
    )


@pytest.fixture(scope="module")
def corpus(spark):
    return _corpus(spark)


@pytest.fixture(scope="module")
def quotient(corpus):
    q = lsh_near_dups_quotient(corpus, threshold=0.5, collapse=True)
    assert q is not None
    return q


def test_quotient_reconstructs_expanded_pair_graph(corpus, quotient):
    """membership + class_pairs reconstruct the EXACT pair set the direct
    (collapse=False) path emits: cross-class all-or-nothing expansion plus
    within-class cliques."""
    membership, class_pairs = quotient
    mem = {r["node"]: (r["cls"], r["m"], r["closed"]) for r in membership.collect()}
    groups: dict[int, list[int]] = {}
    for node, (cls, _m, _c) in mem.items():
        groups.setdefault(cls, []).append(node)
    rebuilt = set()
    for cls, members in groups.items():
        if mem[members[0]][2]:  # closed: clique
            ms = sorted(members)
            rebuilt.update(
                (u, v) for i, u in enumerate(ms) for v in ms[i + 1 :]
            )
    for r in class_pairs.collect():
        for u in groups[r["a"]]:
            for v in groups[r["b"]]:
                rebuilt.add((min(u, v), max(u, v)))
    direct = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_near_dups(corpus, threshold=0.5, collapse=False).collect()
    }
    assert rebuilt == direct
    # the degenerate rows behaved: null-text docs isolated, empty-text pair
    assert not any(90_000 <= a <= 90_002 or 90_000 <= b <= 90_002 for a, b in direct)
    assert (90_010, 90_011) in direct


def test_neardup_pagerank_quotient_matches_expanded(corpus, quotient):
    got = {
        r["doc_id"]: r["score"]
        for r in neardup_pagerank(corpus, quotient=quotient).collect()
    }
    want = {
        r["doc_id"]: r["score"]
        for r in neardup_pagerank(corpus, collapse=False).collect()
    }
    assert got == want


def test_triangles_quotient_matches_expanded(corpus, quotient):
    nodes = corpus.select("doc_id")
    got = {
        r["doc_id"]: (r["degree"], r["triangles"], r["clustering_coeff"])
        for r in triangle_stats(None, nodes, quotient=quotient).collect()
    }
    pairs = lsh_near_dups(corpus, threshold=0.5, collapse=False).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    want = {
        r["doc_id"]: (r["degree"], r["triangles"], r["clustering_coeff"])
        for r in triangle_stats(pairs, nodes, collapse=False).collect()
    }
    assert got == want


def test_kcore_quotient_matches_expanded(corpus, quotient):
    nodes = corpus.select("doc_id")
    got = {
        r["doc_id"]: (r["in_core"], r["core_degree"])
        for r in kcore(None, nodes, k=3, rounds=6, quotient=quotient).collect()
    }
    p = lsh_near_dups(corpus, threshold=0.5, collapse=False)
    edges = p.select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    ).unionByName(
        p.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b"))
    )
    want = {
        r["doc_id"]: (r["in_core"], r["core_degree"])
        for r in kcore(edges, nodes, k=3, rounds=6, collapse=False).collect()
    }
    assert got == want


@pytest.mark.parametrize("cc_method", ["auto", "star"])
def test_dup_clusters_quotient_matches_expanded(corpus, quotient, cc_method):
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in dup_clusters(
            corpus, quotient=quotient, cc_method=cc_method
        ).collect()
    }
    want = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in dup_clusters(corpus, collapse=False, cc_method="driver").collect()
    }
    assert got == want


def test_dup_clusters_builds_quotient_itself(corpus):
    """``dup_clusters`` with no pairs and no quotient reads the quotient
    off the dedup collapse on its own (the round-10 default path)."""
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in dup_clusters(corpus, collapse=True).collect()
    }
    want = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in dup_clusters(corpus, collapse=False, cc_method="driver").collect()
    }
    assert got == want


def test_twin_pagerank_seeded_matches_expanded(spark, corpus):
    """Seeded, jaccard-weighted PageRank on the (text group × seed flag)
    refined quotient equals the expanded weighted/personalized loop on the
    ROUNDED lattice (the multiply-by-count vs sum-of-identical-terms
    difference is ulp-level FP association, absorbed exactly like the
    unweighted twin path's).  Seeds deliberately split clone groups: some
    members of a group are seeds, some are not."""
    from biggraphite_spark.operators.graph import pagerank, twin_pagerank_seeded

    # seeds: base docs with doc_id % 3 == 0 and SOME clones (rep 1 only),
    # plus one null-text doc — splitting text groups across the flag
    seeds = corpus.filter(
        ((F.col("doc_id") < N_BASE) & (F.col("doc_id") % 3 == 0))
        | ((F.col("doc_id") >= 1000) & (F.col("doc_id") < 1040))
        | (F.col("doc_id") == 90_000)
    ).select("doc_id")
    q = lsh_near_dups_quotient(corpus, threshold=0.5, collapse=True, with_weights=True)
    assert q is not None
    nodes = corpus.select("doc_id")
    got = {
        r["doc_id"]: round(r["rank"] * 1000 + 1.23e-9, 6)
        for r in twin_pagerank_seeded(q[0], q[1], nodes, seeds).collect()
    }
    p = lsh_near_dups(corpus, threshold=0.5, collapse=False).cache()
    edges = p.select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b"),
        F.col("jaccard").alias("w"),
    ).unionByName(p.select(
        F.col("doc_b").alias("a"), F.col("doc_a").alias("b"),
        F.col("jaccard").alias("w"),
    ))
    want = {
        r["doc_id"]: round(r["rank"] * 1000 + 1.23e-9, 6)
        for r in pagerank(edges, nodes, weight_col="w", seeds=seeds).collect()
    }
    assert got == want


def test_chunk_neardup_quotient_matches_expanded(spark, corpus):
    from biggraphite_spark.operators.curation import chunk_neardup

    got = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"])
        for r in chunk_neardup(corpus, chunk=8).collect()
    }
    # force the expanded fallback by an impossible collapse ratio via a
    # monkeypatch-free route: rebuild with quotient disabled by calling
    # the internals directly
    from biggraphite_spark.operators.curation import _chunks_exploded
    from biggraphite_spark.operators.dedup import lsh_near_dups

    chunks = _chunks_exploded(corpus, "text", 8).withColumn(
        "ckey", F.shiftleft(F.col("doc_id"), 32) + F.col("chunk_id")
    )
    pseudo = chunks.select(
        F.col("ckey").alias("doc_id"), F.col("chunk_text").alias("text")
    )
    pairs = lsh_near_dups(pseudo, threshold=0.5, collapse=False)
    dropped = pairs.select(F.col("doc_b").alias("ckey")).distinct().withColumn(
        "dropme", F.lit(1)
    )
    want = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"])
        for r in chunks.join(dropped, "ckey", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(
                F.when(F.col("dropme").isNull(), 1).otherwise(0)
            ).alias("n_kept"),
        )
        .collect()
    }
    assert got == want
