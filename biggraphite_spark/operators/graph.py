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
        # seed membership rides a broadcast-joined flag column, not an
        # isin literal — a million-seed personalization would otherwise
        # serialize the whole seed set into every plan (and the literal
        # itself into the query string).  One broadcast hash join, then
        # the flag is a plain column the teleport/init expressions read.
        seed_flag = seeds.select(
            F.col(id_col).alias("id")
        ).distinct().withColumn("_seed", F.lit(True))
        n_seeds = seed_flag.count()
        if n_seeds == 0:
            raise ValueError("personalized pagerank needs a non-empty seed set")
        base = ids.join(F.broadcast(seed_flag), "id", "left").select(
            "id", F.coalesce(F.col("_seed"), F.lit(False)).alias("_seed")
        ).localCheckpoint()
        is_seed = F.col("_seed")
        tele_col = F.when(is_seed, (1.0 - damping) / n_seeds).otherwise(0.0)
        init_col = F.when(is_seed, 1.0 / n_seeds).otherwise(0.0)
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


def triangle_stats(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    salt: int = 1,
) -> DataFrame:
    """Per-node triangle count + local clustering coefficient over an
    undirected graph given as CANONICAL pairs ``(a, b)`` with ``a < b``.

    Triangles are enumerated once each via the ordered node-iterator join
    (x < y < z): pairs(x,y) ⋈ pairs(y,z) ⋈ pairs(x,z).  Clustering
    coefficient = triangles / C(degree, 2); nodes with degree < 2 get 0.
    For the near-dup graph this scores CLUSTER DENSITY — a clique of
    exact dups has coefficient 1, a chain of borderline matches 0 — the
    signal curation uses to tell "one duplicated document" from "a chain
    of weakly similar ones".

    Shape: the pair graph is ≪ the corpus by construction (same argument
    as PageRank above); three hash joins keyed on node ids, no
    cartesian.  For the LSH near-dup graph the verify step already bounds
    degree by the band-collision rate, so the default is unsalted.

    ``salt > 1`` splits the wedge join's middle-node key: the e1 side is
    bucketed by ``hash(a) % salt`` and the e2 side replicated into every
    bucket, so a hub that sits in half the pairs has its D_in x D_out
    wedge enumeration spread across ``salt`` tasks instead of landing on
    ONE shuffle partition (the classic skew-join salt; the wedge WORK is
    inherent to the graph — salting distributes it).  Results are
    identical for any salt (pinned by the skew test).
    """
    p = pairs.select(F.col("a"), F.col("b"))
    e3 = p.alias("e3")
    if salt > 1:
        e1 = p.withColumn(
            "_salt", F.pmod(F.hash("a"), F.lit(salt))
        ).alias("e1")
        e2 = p.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        ).alias("e2")
        wedge_cond = (F.col("e1.b") == F.col("e2.a")) & (
            F.col("e1._salt") == F.col("e2._salt")
        )
    else:
        e1 = p.alias("e1")
        e2 = p.alias("e2")
        wedge_cond = F.col("e1.b") == F.col("e2.a")
    tri = (
        e1.join(e2, wedge_cond)
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .select(
            F.col("e1.a").alias("x"),
            F.col("e1.b").alias("y"),
            F.col("e2.b").alias("z"),
        )
    )
    per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    deg = (
        p.select(F.col("a").alias("id"))
        .unionAll(p.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    ids = nodes.select(F.col(id_col).alias("id"))
    out = (
        ids.join(deg, "id", "left")
        .join(per_node, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("degree"), F.lit(0)).cast("long").alias("degree"),
            F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
        )
    )
    wedges = (F.col("degree") * (F.col("degree") - 1) / 2.0)
    coeff = F.when(
        F.col("degree") >= 2, F.col("triangles") / wedges
    ).otherwise(F.lit(0.0))
    return out.withColumn("clustering_coeff", F.round(coeff + 1.23e-9, 6))


def kcore(
    edges: DataFrame,
    nodes: DataFrame,
    k: int = 2,
    rounds: int | None = None,
    id_col: str = "doc_id",
    checkpoint_every: int = 2,
    max_rounds: int = 100,
) -> DataFrame:
    """k-core peel over SYMMETRIC ``edges(a, b)``: iteratively remove
    nodes with fewer than ``k`` surviving neighbors.

    ``rounds=None`` (the operator default) peels to the true fixpoint —
    the loop stops when the surviving-edge count is stable (a
    convergence-scalar driver read, same class as the k-means loop).
    ``rounds=R`` runs a FIXED R-round peel instead: deterministic at
    every scale without a data-dependent loop, which is what the
    oracle-replayable contract query pins (an R-round peel equals the
    true k-core whenever the peeling depth ≤ R; the pytest asserts that
    equality on the test graph).

    Execution shape: the edge set is ``localCheckpoint``ed up front —
    the peel must iterate over MATERIALIZED edges, not re-analyze the
    (potentially huge) upstream lineage per round — then each round is
    one tiny hash agg plus two BROADCAST semi-joins against the
    survivor set, which only ever shrinks.  The working edge set is
    filtered progressively (``alive_{t+1} ⊆ alive_t``), so late rounds
    scan almost nothing; equivalent to re-filtering the full edge set
    against ``surv_t`` because survival is monotone decreasing.

    Output: every node in ``nodes`` with ``in_core`` and its surviving
    degree (``core_degree``, 0 outside the core).
    """
    alive = edges.select("a", "b").localCheckpoint()
    prev_n = None
    i = 0
    while True:
        if rounds is not None and i >= rounds:
            break
        if rounds is None:
            n = alive.count()
            if n == prev_n or i >= max_rounds:
                break
            prev_n = n
        keep = (
            alive.groupBy("a")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= k)
            .select(F.col("a").alias("v"))
        )
        alive = alive.join(
            F.broadcast(keep.withColumnRenamed("v", "a")), "a", "left_semi"
        ).join(
            F.broadcast(keep.withColumnRenamed("v", "b")), "b", "left_semi"
        )
        i += 1
        if i % checkpoint_every == 0:
            alive = alive.localCheckpoint()
    core = alive.groupBy("a").agg(
        F.count(F.lit(1)).alias("core_degree")
    )
    ids = nodes.select(F.col(id_col).alias("a"))
    return ids.join(core, "a", "left").select(
        F.col("a").alias(id_col),
        F.col("core_degree").isNotNull().alias("in_core"),
        F.coalesce(F.col("core_degree"), F.lit(0)).cast("long").alias("core_degree"),
    )


def hits(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    iterations: int = 3,
    checkpoint_every: int = 2,
) -> DataFrame:
    """HITS hubs/authorities (Kleinberg 1999) over DIRECTED
    ``edges(src, dst)`` — in PURE INTEGER arithmetic.

    The classic formulation normalizes each round, which drags a
    corpus-wide floating-point sum (association-order-sensitive, so not
    oracle-replayable) into the loop.  This variant runs the UNNORMALIZED
    power iteration instead: hub₀ = 1 for every node, then per round
    auth = Aᵀ·hub and hub = A·auth, all in longs — scores are exact
    integers, identical on every engine, and the RANKING (all HITS
    semantics anybody consumes) is unchanged because normalization is a
    positive scalar.  With ``iterations=3`` the magnitudes are bounded by
    d_max⁶ — safely inside int64 for any near-dup graph whose degrees the
    LSH verify step bounds.

    Output: every node with final ``hub`` and ``auth`` (0 when the node
    has no out-/in-edges respectively).
    """
    if iterations < 1:
        raise ValueError("hits needs at least one iteration")
    ids = nodes.select(F.col(id_col).alias("id"))
    # localCheckpoint, not cache: every iteration embeds the edge subtree
    # in the PLAN twice, so an upstream LSH pipeline would make the plan
    # (not the data) grow geometrically — the finding-34 template
    ed = edges.select("src", "dst").localCheckpoint()
    hub = ids.select("id", F.lit(1).cast("long").alias("hub"))
    auth = None
    # per round: auth ← Aᵀ·hub, then hub ← A·auth; both from the same
    # generation, so the returned (hub_T, auth_T) is the textbook pair
    for i in range(iterations):
        auth = (
            ed.join(hub, ed.src == hub.id)
            .groupBy("dst")
            .agg(F.sum("hub").alias("auth"))
            .select(F.col("dst").alias("id"), "auth")
        )
        hub = (
            ed.join(auth, ed.dst == auth.id)
            .groupBy("src")
            .agg(F.sum("auth").alias("hub"))
            .select(F.col("src").alias("id"), "hub")
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            hub = hub.localCheckpoint()
            auth = auth.localCheckpoint()
    return (
        ids.join(hub, "id", "left")
        .join(auth, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("hub"), F.lit(0)).cast("long").alias("hub"),
            F.coalesce(F.col("auth"), F.lit(0)).cast("long").alias("auth"),
        )
    )


def neardup_pagerank(
    docs: DataFrame,
    threshold: float = 0.5,
    iterations: int = 10,
    damping: float = 0.85,
    pairs: DataFrame | None = None,
    max_degree: int | None = None,
) -> DataFrame:
    """Duplication-centrality scores: PageRank over the symmetric
    MinHash-LSH near-dup graph (``lsh_near_dups``).  Output
    ``(doc_id, score)`` with score = rank × N (so an isolated document
    scores (1-d) and hubs score above 1), rounded at the oracle
    resolution with the documented paired tie-breaker.  Pass ``pairs``
    to reuse an already-built near-dup graph (the representatives
    composition feeds the same pairs to CC and PageRank — one LSH
    pipeline, two consumers).  ``max_degree`` caps per-node pair fanout
    (``dedup.cap_pair_fanout``, top-d by jaccard) before the iteration —
    the boilerplate-clique guard: the fixpoint cost rides Σ deg², which
    clone-replicated or templated corpora grow quadratically."""
    from .dedup import cap_pair_fanout, lsh_near_dups

    if pairs is None:
        pairs = lsh_near_dups(docs, threshold=threshold)
    if max_degree is not None:
        pairs = cap_pair_fanout(pairs, max_degree)
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
