"""Iterative graph algorithms over pair graphs the dedup pipeline builds.

PageRank here serves the curation use the near-dup graph motivates:
scoring documents by duplication centrality, so cluster representatives
can be chosen by importance instead of by arbitrary min-id (the CCNet /
web-corpus practice of weighting pages by link centrality, applied to
the similarity graph).  Reference scope note: biggraphite has no graph
operators — this is part of the beyond-reference training-data-pipeline
family, like the dedup and ANN modules it composes with
(``operators/dedup.py``).

Execution shape (the one that holds at 100 TB): the edge list is tiny
relative to the corpus (near-dup pairs ≪ docs by design, same argument
as ``DRIVER_CC_MAX_EDGES``), each iteration is one join + one hash
aggregation keyed on the node id, and lineage is truncated with
``localCheckpoint`` every few rounds exactly like the star-CC loop —
without it the plan, not the data, becomes the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Fixed-iteration PageRank: ``rank' = (1-d)/N + d * Σ rank(u)/out(u)``
    over directed ``edges(a, b)``; every node in ``nodes`` gets a row
    (nodes without in-edges hold the teleport term).  Deterministic — a
    fixed iteration count, no convergence test — so the result is
    oracle-replayable; dangling mass is not redistributed (the simple
    variant, documented contract).

    ``N`` is read once driver-side (a convergence-scalar class collect,
    same as the k-means loop).  Edges are cached: every iteration probes
    the same (a, b, outd) relation.
    """
    n = nodes.count()
    ids = nodes.select(F.col(id_col).alias("id"))
    deg = edges.groupBy("a").agg(F.count(F.lit(1)).cast("double").alias("outd"))
    ed = edges.join(deg, "a").select("a", "b", "outd").cache()
    teleport = (1.0 - damping) / n
    ranks = ids.select("id", F.lit(1.0 / n).alias("rank"))
    for i in range(iterations):
        contribs = (
            ed.join(ranks, ed.a == ranks.id)
            .select(F.col("b").alias("id"),
                    (F.col("rank") / F.col("outd")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = ids.join(contribs, "id", "left").select(
            "id",
            (
                F.lit(teleport)
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = ranks.localCheckpoint()
    return ranks.select(F.col("id").alias(id_col), "rank")


def neardup_pagerank(
    docs: DataFrame,
    threshold: float = 0.5,
    iterations: int = 10,
    damping: float = 0.85,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Duplication-centrality scores: PageRank over the symmetric
    MinHash-LSH near-dup graph (``lsh_near_dups``).  Output
    ``(doc_id, score)`` with score = rank × N (so an isolated document
    scores (1-d) and hubs score above 1), rounded at the oracle
    resolution with the documented paired tie-breaker.  Pass ``pairs``
    to reuse an already-built near-dup graph (the representatives
    composition feeds the same pairs to CC and PageRank — one LSH
    pipeline, two consumers)."""
    from .dedup import lsh_near_dups

    if pairs is None:
        pairs = lsh_near_dups(docs, threshold=threshold)
    pairs = pairs.select("doc_a", "doc_b")
    edges = pairs.select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b"))
    )
    nodes = docs.select("doc_id")
    n = nodes.count()
    pr = pagerank(edges, nodes, id_col="doc_id",
                  iterations=iterations, damping=damping)
    return pr.select(
        "doc_id",
        F.round(F.col("rank") * F.lit(float(n)) + 1.23e-9, 6).alias("score"),
    )
