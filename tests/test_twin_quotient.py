"""Twin-class quotient (operators/graph.py): the graph-side sibling of the
dedup family's distinct-text collapse.  Every test pins EQUALITY between the
collapsed and expanded paths on graphs chosen to stress the class algebra:
clone blow-ups (closed twins), star spokes (open twins), mixed graphs, and a
twin-free pseudo-random graph where the auto probe must back off."""

import pytest
from pyspark.sql import functions as F

from biggraphite_spark.operators.graph import (
    _twin_quotient,
    kcore,
    pagerank,
    triangle_stats,
)


def _blowup(quot_edges, mult):
    """Expand a quotient graph into its blow-up: quotient node q becomes a
    clique of mult[q] members (ids q*100..), a quotient edge a complete
    bipartite join.  Returns (canonical pairs, member ids)."""
    members = {q: [q * 100 + i for i in range(m)] for q, m in mult.items()}
    edges = set()
    for ms in members.values():
        edges.update(
            (u, v) for i, u in enumerate(ms) for v in ms[i + 1 :]
        )
    for a, b in quot_edges:
        edges.update(
            (min(u, v), max(u, v))
            for u in members[a]
            for v in members[b]
        )
    nodes = sorted(x for ms in members.values() for x in ms)
    return sorted(edges), nodes


def _sym(pairs):
    return pairs + [(b, a) for a, b in pairs]


# quotient: a triangle {1,2,3}, a chain 3-4, an isolated clone clique 5,
# and a singleton 6 — multiplicities mix 1 with >1 so every closed-form
# term (intra-clique, clique-to-neighbor, neighbor-pair) is non-trivial
QUOT_EDGES = [(1, 2), (1, 3), (2, 3), (3, 4)]
MULT = {1: 3, 2: 1, 3: 4, 4: 2, 5: 5, 6: 1}


def _frames(spark, pairs, node_ids):
    p = spark.createDataFrame(pairs, "a long, b long")
    e = spark.createDataFrame(_sym(pairs), "a long, b long")
    nodes = spark.createDataFrame([(i,) for i in node_ids], ["doc_id"])
    return p, e, nodes


def _spoke_graph():
    """Open-twin stress: hubs {1,2,3} form a triangle; spokes 10..16 each
    connect to ALL of {1,2,3} (mutually non-adjacent => one open class);
    plus a pendant 20-21 pair and an isolated node in `nodes`."""
    pairs = [(1, 2), (1, 3), (2, 3), (20, 21)]
    pairs += [(h, s) for s in range(10, 17) for h in (1, 2, 3)]
    pairs = sorted((min(a, b), max(a, b)) for a, b in pairs)
    nodes = [1, 2, 3, 20, 21, 99] + list(range(10, 17))
    return pairs, nodes


def _random_graph():
    """Twin-free-ish pseudo-random graph (deterministic arithmetic)."""
    pairs = set()
    for i in range(300):
        a = (i * 7919) % 49
        b = (i * i * 104729 + 13) % 49
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    return sorted(pairs), list(range(49))


GRAPHS = {
    "blowup": lambda: _blowup(QUOT_EDGES, MULT),
    "spokes": _spoke_graph,
    "random": _random_graph,
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_triangle_stats_twin_equals_expanded(spark, name):
    pairs, node_ids = GRAPHS[name]()
    p, _, nodes = _frames(spark, pairs, node_ids)
    plain = sorted(
        tuple(r) for r in triangle_stats(p, nodes, collapse=False).collect()
    )
    twin = sorted(
        tuple(r) for r in triangle_stats(p, nodes, collapse=True).collect()
    )
    auto = sorted(
        tuple(r) for r in triangle_stats(p, nodes, collapse="auto").collect()
    )
    assert twin == plain and auto == plain
    assert any(t > 0 for _, _, t, _ in plain)  # fixture has triangles


@pytest.mark.parametrize("name", sorted(GRAPHS))
@pytest.mark.parametrize("rounds", [8, None])
def test_kcore_twin_equals_expanded(spark, name, rounds):
    pairs, node_ids = GRAPHS[name]()
    _, e, nodes = _frames(spark, pairs, node_ids)
    for k in (2, 3):
        plain = sorted(
            tuple(r)
            for r in kcore(e, nodes, k=k, rounds=rounds, collapse=False).collect()
        )
        twin = sorted(
            tuple(r)
            for r in kcore(e, nodes, k=k, rounds=rounds, collapse=True).collect()
        )
        assert twin == plain, (name, k, rounds)


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_pagerank_twin_equals_expanded(spark, name):
    pairs, node_ids = GRAPHS[name]()
    _, e, nodes = _frames(spark, pairs, node_ids)
    plain = {
        r["doc_id"]: r["rank"]
        for r in pagerank(e, nodes, collapse=False).collect()
    }
    twin = {
        r["doc_id"]: r["rank"]
        for r in pagerank(e, nodes, collapse=True).collect()
    }
    assert set(twin) == set(plain)
    for v in plain:
        # twin multiplies where the expanded loop sums m identical terms —
        # equal up to FP association, far inside the rounded output lattice
        assert twin[v] == pytest.approx(plain[v], rel=1e-12, abs=1e-15), (name, v)
    # mass check on the symmetric graph: ranks of edge-connected nodes sum
    # to 1 minus the teleport share parked on isolated nodes
    assert sum(plain.values()) == pytest.approx(
        sum(twin.values()), rel=1e-12
    )


def test_twin_quotient_classes_and_probe(spark):
    # blow-up of quotient triangle {1,2,3} + chain 3-4 + isolated clique 5.
    # The twin partition is COARSER than the generating clone groups where
    # the graph allows: node 200 (the m=1 quotient node of the triangle)
    # has the same closed neighborhood as group 1's members — {1-group,
    # 200, 3-group} — so {100,101,102,200} is ONE closed class of 4.
    pairs, node_ids = GRAPHS["blowup"]()
    e = spark.createDataFrame(_sym(pairs), "a long, b long")
    q = _twin_quotient(e, "auto", 0.8)
    assert q is not None
    membership, cp = q
    got = {
        r["node"]: (r["cls"], r["m"], r["closed"])
        for r in membership.collect()
    }
    assert got[100] == got[101] == got[102] == got[200] == (100, 4, True)
    assert all(got[300 + i] == (300, 4, True) for i in range(4))
    assert got[400] == got[401] == (400, 2, True)
    assert all(got[500 + i] == (500, 5, True) for i in range(5))
    assert 600 not in got  # no edges: not in the quotient at all
    # class pairs: the merged {1,2}-class ~ 3-class, 3-class ~ 4-class
    got_cp = sorted((r["a"], r["b"]) for r in cp.collect())
    assert got_cp == [(100, 300), (300, 400)]
    # spokes: the 7 spokes form one OPEN class
    pairs, node_ids = _spoke_graph()
    e = spark.createDataFrame(_sym(pairs), "a long, b long")
    membership, cp = _twin_quotient(e, True, 0.8)
    spokes = {
        r["node"]: (r["cls"], r["m"], r["closed"])
        for r in membership.collect()
        if 10 <= r["node"] <= 16
    }
    assert set(spokes.values()) == {(10, 7, False)}
    # twin-free pseudo-random graph: the auto probe declines
    pairs, node_ids = _random_graph()
    e = spark.createDataFrame(_sym(pairs), "a long, b long")
    assert _twin_quotient(e, "auto", 0.8) is None


def test_dup_clusters_twin_equals_expanded(spark):
    from biggraphite_spark.operators.dedup import dup_clusters

    pairs, node_ids = GRAPHS["blowup"]()
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in node_ids + [9999]],
        "doc_id long, text string",
    )
    pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    expanded = sorted(
        tuple(r)
        for r in dup_clusters(docs, pairs=pdf, collapse=False).collect()
    )
    for method in ("auto", "star"):
        got = sorted(
            tuple(r)
            for r in dup_clusters(
                docs, pairs=pdf, cc_method=method, collapse=True
            ).collect()
        )
        assert got == expanded, method
    # every clone group landed in one cluster, labelled by the global min
    by_doc = {d: (c, s) for d, c, s in expanded}
    assert by_doc[300] == (100, 10)  # component {1,2,3,4} blown up: 3+1+4+2
    assert by_doc[504] == (500, 5)  # isolated clone clique keeps its min
    assert by_doc[9999] == (9999, 1)  # singleton untouched
