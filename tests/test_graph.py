"""Graph operators (operators/graph.py): hand-graph goldens and the
contract invariants the near-dup use relies on."""

import pytest
from pyspark.sql import functions as F

from biggraphite_spark.operators.graph import hits, kcore, pagerank, triangle_stats


def _pr(spark, edge_list, node_ids, **kw):
    edges = spark.createDataFrame(edge_list, "a long, b long")
    nodes = spark.createDataFrame([(i,) for i in node_ids], ["doc_id"])
    return {
        r["doc_id"]: r["rank"]
        for r in pagerank(edges, nodes, **kw).collect()
    }


def test_symmetric_pair_and_isolated(spark):
    # two mutually-linked nodes + an isolated one: the pair holds rank
    # symmetric; the isolated node keeps only the teleport term
    got = _pr(spark, [(1, 2), (2, 1)], [1, 2, 3], iterations=10)
    assert got[1] == pytest.approx(got[2])
    assert got[3] == pytest.approx(0.15 / 3)
    # mass conservation over the connected component + teleport leak only
    assert got[1] + got[2] + got[3] == pytest.approx(1.0 - 0.85 * (1 / 3))


def test_star_graph_hub_dominates(spark):
    # 1 is the hub of a 4-spoke star (symmetric edges)
    edges = []
    for s in (2, 3, 4, 5):
        edges += [(1, s), (s, 1)]
    got = _pr(spark, edges, [1, 2, 3, 4, 5], iterations=20)
    assert got[1] > got[2] and all(
        got[s] == pytest.approx(got[2]) for s in (3, 4, 5)
    )
    # closed symmetric graph: total mass conserved
    assert sum(got.values()) == pytest.approx(1.0)
    # exact python replay of the same fixed-iteration recurrence
    out = {1: 4, 2: 1, 3: 1, 4: 1, 5: 1}
    rank = {v: 1 / 5 for v in out}
    for _ in range(20):
        contrib = {v: 0.0 for v in out}
        for a, b in edges:
            contrib[b] += rank[a] / out[a]
        rank = {v: 0.15 / 5 + 0.85 * contrib[v] for v in out}
    for v in out:
        assert got[v] == pytest.approx(rank[v], rel=1e-12)


def test_every_node_gets_a_row(spark):
    got = _pr(spark, [(1, 2), (2, 1)], [1, 2, 7, 8, 9])
    assert set(got) == {1, 2, 7, 8, 9}


def test_weighted_pagerank_python_replay(spark):
    edges = [(1, 2, 3.0), (1, 3, 1.0), (2, 1, 1.0), (3, 1, 1.0)]
    e = spark.createDataFrame(edges, "a long, b long, w double")
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3)], ["doc_id"])
    got = {
        r["doc_id"]: r["rank"]
        for r in pagerank(e, nodes, weight_col="w", iterations=15).collect()
    }
    # python replay with the same weighted shares
    wout = {1: 4.0, 2: 1.0, 3: 1.0}
    rank = {v: 1 / 3 for v in (1, 2, 3)}
    for _ in range(15):
        contrib = {v: 0.0 for v in (1, 2, 3)}
        for a, b, w in edges:
            contrib[b] += rank[a] * w / wout[a]
        rank = {v: 0.15 / 3 + 0.85 * contrib[v] for v in (1, 2, 3)}
    for v in (1, 2, 3):
        assert got[v] == pytest.approx(rank[v], rel=1e-12)
    # weight asymmetry shows: node 2 outranks node 3
    assert got[2] > got[3]


def test_personalized_pagerank_seeds(spark):
    # chain 1-2-3-4 (symmetric), seed on 1: rank decays with distance
    edges = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3)]
    e = spark.createDataFrame(edges, "a long, b long")
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 9)], ["doc_id"])
    seeds = spark.createDataFrame([(1,)], ["doc_id"])
    got = {
        r["doc_id"]: r["rank"]
        for r in pagerank(e, nodes, seeds=seeds, iterations=20).collect()
    }
    # exact python replay (note: node 2 legitimately out-ranks the seed —
    # the degree-1 seed forwards ALL its mass while 2 splits its own)
    out = {1: 1, 2: 2, 3: 2, 4: 1}
    rank = {1: 1.0, 2: 0.0, 3: 0.0, 4: 0.0, 9: 0.0}
    for _ in range(20):
        contrib = {v: 0.0 for v in rank}
        for a, b in edges:
            contrib[b] += rank[a] / out[a]
        rank = {
            v: (0.15 if v == 1 else 0.0) + 0.85 * contrib[v] for v in rank
        }
    for v in rank:
        assert got[v] == pytest.approx(rank[v], rel=1e-12, abs=1e-15)
    # mass decays with distance beyond the seed's neighbour
    assert got[2] > got[3] > got[4]
    # an isolated non-seed gets NO mass under personalization
    assert got[9] == 0.0
    with pytest.raises(ValueError):
        pagerank(e, nodes, seeds=nodes.limit(0)).collect()


def _sym(edge_pairs):
    """canonical pairs -> symmetric (a, b) edge list"""
    out = []
    for a, b in edge_pairs:
        out += [(a, b), (b, a)]
    return out


def test_triangle_stats_clique_vs_chain(spark):
    # {1,2,3} is a triangle (coeff 1 everywhere); 4-5-6 is a chain
    # (no triangles; middle node coeff 0); 9 is isolated
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (5, 6)], "a long, b long"
    )
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 5, 6, 9)], ["doc_id"])
    got = {r["doc_id"]: r for r in triangle_stats(pairs, nodes).collect()}
    for v in (1, 2, 3):
        assert got[v]["triangles"] == 1 and got[v]["degree"] == 2
        assert got[v]["clustering_coeff"] == pytest.approx(1.0)
    assert got[5]["degree"] == 2 and got[5]["triangles"] == 0
    assert got[5]["clustering_coeff"] == pytest.approx(0.0)
    for v in (4, 6):  # degree-1: coefficient defined as 0
        assert got[v]["clustering_coeff"] == 0.0
    assert got[9]["degree"] == 0 and got[9]["triangles"] == 0


def test_triangle_stats_4clique_counts(spark):
    # K4 has C(4,3)=4 triangles; each node sits in 3 of them, coeff 1
    vs = (1, 2, 3, 4)
    pairs = spark.createDataFrame(
        [(a, b) for a in vs for b in vs if a < b], "a long, b long"
    )
    nodes = spark.createDataFrame([(v,) for v in vs], ["doc_id"])
    got = {r["doc_id"]: r for r in triangle_stats(pairs, nodes).collect()}
    for v in vs:
        assert got[v]["triangles"] == 3 and got[v]["degree"] == 3
        assert got[v]["clustering_coeff"] == pytest.approx(1.0)


def test_kcore_peels_pendants_and_matches_fixpoint(spark):
    # triangle {1,2,3} + pendant chain 3-4-5: the 2-core is the triangle;
    # 4 survives round 1 (neighbors 3,5) until 5 is gone — peel depth 2
    pairs = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    edges = spark.createDataFrame(_sym(pairs), "a long, b long")
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 5, 9)], ["doc_id"])
    bounded = {r["doc_id"]: r for r in
               kcore(edges, nodes, k=2, rounds=8).collect()}
    fixpoint = {r["doc_id"]: r for r in
                kcore(edges, nodes, k=2, rounds=None).collect()}
    for got in (bounded, fixpoint):
        assert {v for v in got if got[v]["in_core"]} == {1, 2, 3}
        for v in (1, 2, 3):
            assert got[v]["core_degree"] == 2
        for v in (4, 5, 9):
            assert got[v]["core_degree"] == 0
    # the bounded contract peel == the true fixpoint on this graph
    assert {v: (r["in_core"], r["core_degree"]) for v, r in bounded.items()} == {
        v: (r["in_core"], r["core_degree"]) for v, r in fixpoint.items()
    }


def test_kcore_k3_dissolves_triangle(spark):
    pairs = [(1, 2), (1, 3), (2, 3)]
    edges = spark.createDataFrame(_sym(pairs), "a long, b long")
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3)], ["doc_id"])
    got = kcore(edges, nodes, k=3, rounds=None).collect()
    assert all(not r["in_core"] for r in got)


def test_hits_integer_replay_and_provenance_direction(spark):
    # provenance: 2->1, 3->1, 3->2 (later copies earlier): 1 is the
    # authority, 3 the strongest hub.  Exact integer python replay.
    edge_list = [(2, 1), (3, 1), (3, 2)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 9)], ["doc_id"])
    got = {r["doc_id"]: r for r in hits(edges, nodes, iterations=3).collect()}
    hub = {v: 1 for v in (1, 2, 3, 9)}
    auth = {}
    for _ in range(3):
        auth = {v: 0 for v in hub}
        for s, d in edge_list:
            auth[d] += hub[s]
        nxt = {v: 0 for v in hub}
        for s, d in edge_list:
            nxt[s] += auth[d]
        hub = nxt
    for v in (1, 2, 3, 9):
        assert got[v]["hub"] == hub[v], v
        assert got[v]["auth"] == auth[v], v
    assert got[1]["auth"] > got[2]["auth"] > got[3]["auth"]
    assert got[3]["hub"] > got[2]["hub"] and got[1]["hub"] == 0
    assert got[9]["hub"] == 0 and got[9]["auth"] == 0
    with pytest.raises(ValueError):
        hits(edges, nodes, iterations=0)


def test_personalized_seeds_ride_a_broadcast_join(spark):
    """Seed membership is a broadcast-joined flag, not an isin literal — a
    million-seed personalization must not serialize the seed set into the
    plan.  The r6 replay golden above pins the VALUES; this pins the
    shape."""
    import io
    from contextlib import redirect_stdout

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (3, 2)], "a long, b long")
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3)], ["doc_id"])
    seeds = spark.createDataFrame([(1,), (3,)], ["doc_id"])
    ranks = pagerank(edges, nodes, seeds=seeds, iterations=4)
    plan = io.StringIO()
    with redirect_stdout(plan):
        ranks.explain("formatted")
    text = plan.getvalue()
    assert " IN (" not in text and " INSET " not in text, text
    # the flag column comes out of the checkpointed broadcast join; the
    # teleport term reads it as a plain column
    assert "_seed" in text, text


def test_cap_pair_fanout_union_semantics(spark):
    """Degree cap keeps each node's top-d by (weight desc, partner asc),
    and an edge survives if EITHER endpoint ranks it."""
    from biggraphite_spark.operators.dedup import cap_pair_fanout

    # star: node 0 pairs with 1..5 at varying weights; plus a spur 4-5
    pairs = spark.createDataFrame(
        [
            (0, 1, 0.9), (0, 2, 0.8), (0, 3, 0.7), (0, 4, 0.6), (0, 5, 0.5),
            (4, 5, 0.4),
        ],
        "doc_a long, doc_b long, jaccard double",
    )
    got = sorted(
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in cap_pair_fanout(pairs, max_degree=2).collect()
    )
    # node 0's top-2: (0,1), (0,2).  But every leaf also ranks its only
    # edges: 3 keeps (0,3), 4 keeps (0,4)+(4,5), 5 keeps (0,5)+(4,5) —
    # union semantics keeps all six edges here EXCEPT none dropped?  No:
    # every edge is top-2 for its leaf endpoint, so all survive.
    assert (0, 1, 0.9) in got and (4, 5, 0.4) in got
    assert len(got) == 6

    # tighten to d=1: each leaf keeps its strongest edge only; (4,5) is
    # rank-2 for node 4 (0.6 > 0.4) AND rank-2 for node 5 (0.5 > 0.4) ->
    # dropped.  (0,2..5) survive via their leaf endpoint's single slot.
    got1 = sorted(
        (r["doc_a"], r["doc_b"]) for r in cap_pair_fanout(pairs, 1).collect()
    )
    assert (4, 5) not in got1
    assert got1 == [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5)]


def test_neardup_pagerank_capped_bounds_edges(spark):
    """max_degree on neardup_pagerank changes scores only through the
    documented capped edge set (clique fanout bounded)."""
    from biggraphite_spark.operators.graph import neardup_pagerank

    # a 6-clique of identical docs + 2 singletons
    rows = [(i, "a b c d e f g h") for i in range(6)] + [
        (10, "x y z w q r s t"), (11, "p o n m l k j i")
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = {
        r["doc_id"]: r["score"]
        for r in neardup_pagerank(docs, max_degree=2).collect()
    }
    uncapped = {
        r["doc_id"]: r["score"]
        for r in neardup_pagerank(docs).collect()
    }
    assert set(capped) == set(uncapped) == {0, 1, 2, 3, 4, 5, 10, 11}
    # singletons hold the teleport score under both
    assert capped[10] == uncapped[10]
    # clique members still rank above singletons after capping
    assert all(capped[i] > capped[10] for i in range(6))
