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
    weight_col: str | None = None,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank: ``rank' = teleport(v) + d * Σ rank(u) *
    w(u,v)/wout(u)`` over directed ``edges(a, b[, weight])``; every node
    in ``nodes`` gets a row (nodes without in-edges hold their teleport
    term).  Deterministic — a fixed iteration count, no convergence
    test — so the result is oracle-replayable; dangling mass is not
    redistributed (the simple variant, documented contract).

    ``weight_col`` turns the uniform split into a weighted one
    (w/Σw per source).  ``seeds`` switches to PERSONALIZED PageRank:
    teleport mass (1-d) flows only to the seed set (uniformly), so rank
    becomes proximity to the seeds through the graph — the
    quality-propagation primitive (score documents by closeness to a
    trusted sub-corpus).  Initial mass likewise starts on the seeds.

    ``N``/seed ids are read once driver-side (a convergence-scalar class
    collect, same as the k-means loop; seed sets are source-sized).
    Edges are cached: every iteration probes the same (a, b, share)
    relation.
    """
    ids = nodes.select(F.col(id_col).alias("id"))
    w = F.col(weight_col) if weight_col else F.lit(1.0)
    weighted = edges.select("a", "b", w.alias("w"))
    wout = weighted.groupBy("a").agg(F.sum("w").alias("wout"))
    ed = (
        weighted.join(wout, "a")
        .select("a", "b", (F.col("w") / F.col("wout")).alias("share"))
        .cache()
    )
    if seeds is None:
        n = nodes.count()
        tele_col = F.lit((1.0 - damping) / n)
        init_col = F.lit(1.0 / n)
        base = ids
    else:
        seed_ids = [r[0] for r in seeds.select(id_col).distinct().collect()]
        n_seeds = len(seed_ids)
        if n_seeds == 0:
            raise ValueError("personalized pagerank needs a non-empty seed set")
        is_seed = F.col("id").isin(seed_ids)
        tele_col = F.when(is_seed, (1.0 - damping) / n_seeds).otherwise(0.0)
        init_col = F.when(is_seed, 1.0 / n_seeds).otherwise(0.0)
        base = ids
    ranks = base.select("id", init_col.alias("rank"))
    for i in range(iterations):
        contribs = (
            ed.join(ranks, ed.a == ranks.id)
            .select(F.col("b").alias("id"),
                    (F.col("rank") * F.col("share")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = base.join(contribs, "id", "left").select(
            "id",
            (
                tele_col
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
    # the two-direction union references the pair subtree twice; cache it
    # or the LSH candidate+verify joins execute twice
    pairs = pairs.select("doc_a", "doc_b").cache()
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
