"""As-of join, range join, and deterministic sketch edge cases.

The contract queries (events_asof_join / events_range_join /
events_distinct_kmv / events_heavy_hitters) pin these operators against
DuckDB at sf0.01; this file pins the edges the fixtures don't hit:
tolerance voiding, tie timestamps, bucket-boundary containment, the
small-set KMV escape, and count-min's never-undercount invariant.
"""

from pyspark.sql import functions as F


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# asof_join
# ---------------------------------------------------------------------------

def test_asof_basic_and_unmatched(spark):
    from biggraphite_spark.operators.joins import asof_join

    left = _df(spark, [(1, 10, "a"), (1, 4, "b"), (2, 7, "c")], "k int, ts int, p string")
    right = _df(spark, [(1, 8, 80.0), (1, 2, 20.0), (2, 9, 90.0)], "k int, ts int, v double")
    out = {
        (r["k"], r["ts"]): (r["ts_right"], r["v_right"])
        for r in asof_join(left, right, on=["k"]).collect()
    }
    assert out[(1, 10)] == (8, 80.0)
    assert out[(1, 4)] == (2, 20.0)
    assert out[(2, 7)] == (None, None)  # only future right rows -> left-join nulls


def test_asof_equal_ts_matches_and_payload_tiebreak(spark):
    from biggraphite_spark.operators.joins import asof_join

    left = _df(spark, [(1, 5, "x")], "k int, ts int, p string")
    # two right rows at the exact left timestamp: >= includes them, and the
    # highest-sorting payload wins deterministically
    right = _df(spark, [(1, 5, 1.0), (1, 5, 3.0), (1, 4, 9.0)], "k int, ts int, v double")
    row = asof_join(left, right, on=["k"]).collect()[0]
    assert (row["ts_right"], row["v_right"]) == (5, 3.0)


def test_asof_tolerance_voids_stale_matches(spark):
    from biggraphite_spark.operators.joins import asof_join

    left = _df(spark, [(1, 100, "a"), (1, 200, "b")], "k int, ts int, p string")
    right = _df(spark, [(1, 95, 1.0)], "k int, ts int, v double")
    out = {
        r["ts"]: r["v_right"]
        for r in asof_join(left, right, on=["k"], tolerance=10).collect()
    }
    assert out[100] == 1.0       # 5s old: inside tolerance
    assert out[200] is None      # 105s old: voided


def test_asof_plan_has_no_join(spark):
    """The union+window spelling must not degenerate into a join node —
    that is the whole point vs the quadratic inequality-join spelling."""
    from biggraphite_spark.operators.joins import asof_join

    left = _df(spark, [(1, 10, "a")], "k int, ts int, p string")
    right = _df(spark, [(1, 8, 80.0)], "k int, ts int, v double")
    plan = asof_join(left, right, on=["k"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan


# ---------------------------------------------------------------------------
# range_join
# ---------------------------------------------------------------------------

def test_range_join_boundaries_inclusive_and_no_dups(spark):
    from biggraphite_spark.operators.joins import range_join

    pts = _df(spark, [(100,), (150,), (200,), (201,), (99,)], "ts int")
    iv = _df(spark, [(1, 100, 200)], "iid int, start int, end int")
    got = sorted(r["ts"] for r in range_join(pts, iv, bucket=50).collect())
    assert got == [100, 150, 200]  # both endpoints in, outside rows out, no dups


def test_range_join_interval_spanning_many_buckets(spark):
    from biggraphite_spark.operators.joins import range_join

    pts = _df(spark, [(i,) for i in range(0, 1000, 100)], "ts int")
    iv = _df(spark, [(1, 50, 949)], "iid int, start int, end int")
    got = sorted(r["ts"] for r in range_join(pts, iv, bucket=10).collect())
    assert got == [100, 200, 300, 400, 500, 600, 700, 800, 900]


def test_range_join_with_equi_key(spark):
    from biggraphite_spark.operators.joins import range_join

    pts = _df(spark, [("a", 10), ("b", 10)], "k string, ts int")
    iv = _df(spark, [("a", 0, 20, 1)], "k string, start int, end int, iid int")
    got = range_join(pts, iv, on=["k"], bucket=5).collect()
    assert [(r["k"], r["ts"], r["iid"]) for r in got] == [("a", 10, 1)]


def test_range_join_overlapping_intervals_each_match(spark):
    from biggraphite_spark.operators.joins import range_join

    pts = _df(spark, [(15,)], "ts int")
    iv = _df(spark, [(1, 10, 20), (2, 12, 16)], "iid int, start int, end int")
    got = sorted(r["iid"] for r in range_join(pts, iv, bucket=4).collect())
    assert got == [1, 2]


# ---------------------------------------------------------------------------
# sketches
# ---------------------------------------------------------------------------

def test_kmv_small_set_is_exact(spark):
    from biggraphite_spark.operators.sketches import kmv_distinct

    df = _df(spark, [("g", i % 5) for i in range(50)], "g string, v int")
    row = kmv_distinct(df, "v", ("g",), k=64).collect()[0]
    assert row["est_distinct"] == 5.0
    assert row["kth_hash"] == -1  # below k: no k-th order statistic exists


def test_kmv_estimate_tracks_cardinality(spark):
    from biggraphite_spark.operators.sketches import kmv_distinct

    df = _df(spark, [("g", i) for i in range(2000)], "g string, v int")
    row = kmv_distinct(df, "v", ("g",), k=64).collect()[0]
    # KMV with k=64 has ~1/sqrt(62) ~ 13% relative error; allow 3 sigma
    assert 2000 * 0.6 < row["est_distinct"] < 2000 * 1.5


def test_cm_never_undercounts_and_exact_on_wide_sketch(spark):
    from biggraphite_spark.operators.sketches import cm_heavy_hitters

    rows = [("a",)] * 10 + [("b",)] * 3 + [("c",)] * 1
    df = _df(spark, rows, "item string")
    got = {r["item"]: r for r in cm_heavy_hitters(df, "item", depth=4, width=256).collect()}
    for item, exact in (("a", 10), ("b", 3), ("c", 1)):
        assert got[item]["exact_count"] == exact
        assert got[item]["cm_estimate"] >= exact
    # 3 items in a 4x256 grid: collisions are practically impossible
    assert all(r["cm_estimate"] == r["exact_count"] for r in got.values())


def test_cm_narrow_sketch_overestimates_under_collisions(spark):
    from biggraphite_spark.operators.sketches import cm_heavy_hitters

    df = _df(spark, [(str(i),) for i in range(40)], "item string")
    got = cm_heavy_hitters(df, "item", depth=2, width=4).collect()
    assert len(got) == 40
    assert all(r["cm_estimate"] >= r["exact_count"] for r in got)
    assert any(r["cm_estimate"] > r["exact_count"] for r in got)  # w=4 must collide


def test_cm_min_count_filters(spark):
    from biggraphite_spark.operators.sketches import cm_heavy_hitters

    rows = [("hot",)] * 20 + [("cold",)]
    df = _df(spark, rows, "item string")
    got = cm_heavy_hitters(df, "item", depth=4, width=256, min_count=10).collect()
    assert [r["item"] for r in got] == ["hot"]


def test_kmv_merge_is_exact_vs_direct(spark):
    """The union-retake-k merge reproduces the direct sketch bit-for-bit:
    every global k-minimum is a k-minimum of its own partial."""
    from biggraphite_spark.operators.sketches import (
        kmv_distinct,
        kmv_merge,
        kmv_partials,
    )

    rows = [("g", d, d * 37 + i) for d in range(5) for i in range(300)]
    df = _df(spark, rows, "g string, day int, v int")
    direct = {
        (r["g"],): (r["kth_hash"], r["est_distinct"])
        for r in kmv_distinct(df, "v", ("g",), k=64).collect()
    }
    partials = kmv_partials(df, "v", ("g", "day"), k=64)
    # partials are synopsis-sized
    assert all(len(r["minima"]) <= 64 for r in partials.collect())
    merged = {
        (r["g"],): (r["kth_hash"], r["est_distinct"])
        for r in kmv_merge(partials, ("g",), k=64).collect()
    }
    assert merged == direct


def test_hll_merge_is_exact_vs_direct(spark):
    """Register merge (per-index max) is associative: daily partials merged
    back to the group reproduce the single-pass sketch bit-for-bit."""
    from biggraphite_spark.operators.sketches import (
        hll_distinct,
        hll_merge,
        hll_partials,
    )

    rows = [("g", d, d * 211 + i) for d in range(5) for i in range(400)]
    df = _df(spark, rows, "g string, day int, v int")
    direct = {r["g"]: r["est_distinct"] for r in hll_distinct(df, "v", ("g",)).collect()}
    partials = hll_partials(df, "v", ("g", "day"))
    # partials are synopsis-sized: <= 2^p non-empty registers per group
    sizes = partials.groupBy("g", "day").count().collect()
    assert all(r["count"] <= 256 for r in sizes)
    merged = {
        r["g"]: r["est_distinct"] for r in hll_merge(partials, ("g",)).collect()
    }
    assert merged == direct


def test_hll_estimate_tracks_cardinality_and_small_range(spark):
    from biggraphite_spark.operators.sketches import hll_distinct

    # small set -> linear-counting branch, tight estimate
    small = _df(spark, [("g", i % 7) for i in range(100)], "g string, v int")
    est = hll_distinct(small, "v", ("g",)).collect()[0]["est_distinct"]
    assert 6.0 <= est <= 8.1
    # larger set -> raw estimator, ~6.5% standard error at p=8; allow 4 sigma
    big = _df(spark, [("g", i) for i in range(5000)], "g string, v int")
    est = hll_distinct(big, "v", ("g",)).collect()[0]["est_distinct"]
    assert 5000 * 0.74 < est < 5000 * 1.26


def test_hll_rho_integer_path_matches_log2(spark):
    """The binary-string-length rho must equal the mathematical
    leading-zero rank for every hash — spot-check the full rho range."""
    from biggraphite_spark.operators.sketches import hll_partials

    df = _df(spark, [("g", i) for i in range(3000)], "g string, v int")
    regs = hll_partials(df, "v", ("g",)).collect()
    assert all(1 <= r["rho"] <= 25 for r in regs)
    assert all(0 <= r["idx"] < 256 for r in regs)


def test_windowed_funnel_bounds_and_greedy_semantics(spark):
    from biggraphite_spark.operators.funnel import windowed_funnel

    rows = [
        # u1: full chain inside windows
        ("u1", "a", 0), ("u1", "b", 50), ("u1", "c", 90),
        # u2: step b arrives after the window -> chain breaks at a
        ("u2", "a", 0), ("u2", "b", 200), ("u2", "c", 210),
        # u3: greedy-earliest — the first b at 80 leaves no c within its
        # window even though the later b at 120 would have converted
        ("u3", "a", 0), ("u3", "b", 80), ("u3", "b", 120), ("u3", "c", 190),
        # u4: same-timestamp events are NOT strictly after -> break
        ("u4", "a", 10), ("u4", "b", 10),
    ]
    df = _df(spark, rows, "user_id string, event_type string, sec long")
    out = {
        r["user_id"]: (r["t_a"], r["t_b"], r["t_c"], r["steps"])
        for r in windowed_funnel(df, ["a", "b", "c"], 100).collect()
    }
    assert out["u1"] == (0, 50, 90, 3)
    assert out["u2"] == (0, None, None, 1)
    assert out["u3"] == (0, 80, None, 2)
    assert out["u4"] == (10, None, None, 1)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        windowed_funnel(df, ["a"], 100)
    with _pytest.raises(ValueError):
        windowed_funnel(df, ["a", "b"], 0)


def test_attribution_models_and_window(spark):
    from biggraphite_spark.operators.funnel import attribution

    rows = [
        ("u1", "view", 10), ("u1", "click", 20), ("u1", "purchase", 30),
        # u2's only touch is outside the window
        ("u2", "view", 0), ("u2", "purchase", 200),
        # u3: tie at the same second -> type tie-break (view > click lexic.)
        ("u3", "view", 50), ("u3", "click", 50), ("u3", "purchase", 60),
    ]
    df = _df(spark, rows, "user_id string, event_type string, sec long")
    last = {
        (r["user_id"], r["conv_sec"]): (r["touch_sec"], r["touch_type"])
        for r in attribution(df, ["view", "click"], "purchase", 100).collect()
    }
    assert last[("u1", 30)] == (20, "click")
    assert ("u2", 200) not in last  # no qualifying touch
    assert last[("u3", 60)] == (50, "view")  # ts tie -> lexicographic max

    first = {
        (r["user_id"], r["conv_sec"]): (r["touch_sec"], r["touch_type"])
        for r in attribution(
            df, ["view", "click"], "purchase", 100, model="first_touch"
        ).collect()
    }
    assert first[("u1", 30)] == (10, "view")
    assert first[("u3", 60)] == (50, "click")  # ts tie -> lexicographic min

    import pytest as _pytest
    with _pytest.raises(ValueError):
        attribution(df, ["view"], "purchase", 100, model="nope")


def test_log2_histogram_and_percentile_reconstruction(spark):
    from biggraphite_spark.operators.sketches import hist_percentiles, log2_histogram

    # 8 values in bucket 0 ([1,2)), 1 in bucket 3 ([8,16)), 1 in bucket 6
    vals = [1.5] * 8 + [9.0, 100.0]
    df = _df(spark, [("g", v) for v in vals], "g string, v double")
    h = {r["bucket"]: r["n"] for r in log2_histogram(df, "v", ("g",)).collect()}
    assert h == {0: 8, 3: 1, 6: 1}
    p = hist_percentiles(
        log2_histogram(df, "v", ("g",)), (0.5, 0.95, 0.99), ("g",)
    ).collect()[0]
    # ranks over 10: p50 -> 5th value (bucket 0), p95 -> 10th (bucket 6)
    assert p["n_total"] == 10
    assert p["p50_est"] == 1.0    # 2^0
    assert p["p95_est"] == 64.0   # 2^6
    assert p["p99_est"] == 64.0
    # non-positive values are excluded
    df2 = _df(spark, [("g", -1.0), ("g", 0.0), ("g", 2.0)], "g string, v double")
    assert log2_histogram(df2, "v", ("g",)).count() == 1


def test_windowed_funnel_randomized_vs_python_bruteforce(spark):
    """200 random users, random event streams, one Spark job — every
    user's chain must match an independent greedy-earliest python walk."""
    import random

    from biggraphite_spark.operators.funnel import windowed_funnel

    rnd = random.Random(42)
    steps, window = ["a", "b", "c"], 50
    rows = []
    for u in range(200):
        for _ in range(rnd.randrange(1, 12)):
            rows.append((f"u{u}", rnd.choice("abcx"), rnd.randrange(0, 300)))
    df = _df(spark, rows, "user_id string, event_type string, sec long")
    got = {
        r["user_id"]: (r["t_a"], r["t_b"], r["t_c"], r["steps"])
        for r in windowed_funnel(df, steps, window).collect()
    }

    by_user: dict = {}
    for u, t, s in rows:
        by_user.setdefault(u, []).append((t, s))
    want = {}
    for u, evs in by_user.items():
        t_prev = min((s for t, s in evs if t == "a"), default=None)
        if t_prev is None:
            continue
        chain = [t_prev]
        for step in steps[1:]:
            nxt = min(
                (s for t, s in evs
                 if t == step and t_prev < s <= t_prev + window),
                default=None,
            )
            chain.append(nxt)
            if nxt is None:
                break
            t_prev = nxt
        chain += [None] * (len(steps) - len(chain))
        want[u] = (*chain, sum(1 for c in chain if c is not None))
    assert got == want


def test_attribution_randomized_vs_python_bruteforce(spark):
    import random

    from biggraphite_spark.operators.funnel import attribution

    rnd = random.Random(7)
    rows = []
    for u in range(200):
        for _ in range(rnd.randrange(1, 10)):
            rows.append(
                (f"u{u}", rnd.choice(["view", "click", "buy"]), rnd.randrange(0, 200))
            )
    df = _df(spark, rows, "user_id string, event_type string, sec long")
    for model, pick in (("last_touch", max), ("first_touch", min)):
        got = {
            (r["user_id"], r["conv_sec"]): (r["touch_sec"], r["touch_type"])
            for r in attribution(
                df, ["view", "click"], "buy", 60, model=model
            ).collect()
        }
        want = {}
        by_user: dict = {}
        for u, t, s in rows:
            by_user.setdefault(u, []).append((t, s))
        for u, evs in by_user.items():
            for conv in {s for t, s in evs if t == "buy"}:
                touches = [
                    (s, t) for t, s in evs
                    if t in ("view", "click") and conv - 60 < s <= conv
                ]
                if touches:
                    want[(u, conv)] = pick(touches)
        assert got == want, model


def test_event_transitions_rows_normalize_and_order_ties(spark):
    from biggraphite_spark.operators.funnel import event_transitions

    # user 1: a->b->a; user 2: a->b (same ts ties broken by event_id)
    rows = [
        (1, 1, "a", 10), (1, 2, "b", 20), (1, 3, "a", 30),
        (2, 4, "a", 5), (2, 5, "b", 5),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, sec long"
    )
    got = {(r["from_type"], r["to_type"]): (r["n"], r["p"])
           for r in event_transitions(df).collect()}
    assert got[("a", "b")] == (2, 1.0)  # a always goes to b
    assert got[("b", "a")] == (1, 1.0)
    assert ("b", None) not in got  # terminal events emit no pair


def test_entry_paths_depth_cap_and_topk_order(spark):
    from biggraphite_spark.operators.funnel import entry_paths

    rows = []
    for u in range(4):  # three users share a>b>c, one goes b>a
        seq = ["a", "b", "c"] if u < 3 else ["b", "a"]
        rows += [(u, u * 10 + i, t, i) for i, t in enumerate(seq)]
    rows += [(9, 99, "x", 0)] + [(9, 100 + i, "y", 1 + i) for i in range(10)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, sec long"
    )
    got = entry_paths(df, depth=3, top=2).collect()
    assert [(r["path"], r["n_users"], r["rk"]) for r in got] == [
        ("a>b>c", 3, 1),
        ("b>a", 1, 2),  # ties broken by path ASC; depth caps user 9 at x>y>y
    ]


def test_lsh_edit_verify_exact_dup_and_threshold(spark):
    from biggraphite_spark.operators.dedup import lsh_edit_verify

    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    rows = [
        (1, base), (2, base),                      # exact dup: distance 0
        (3, base.replace("gamma", "gXmma")),       # 4 in-place edits
        (4, "totally different words entirely unrelated content " * 4),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"]): r for r in
           lsh_edit_verify(df, max_rel_dist=0.4).collect()}
    assert got[(1, 2)]["edit_distance"] == 0
    assert got[(1, 2)]["rel_dist"] == 0.0
    if (1, 3) in got:  # candidate generation is band-dependent
        assert 0 < got[(1, 3)]["edit_distance"] <= 8
    assert all(r["rel_dist"] <= 0.4 for r in got.values())


def test_lsh_edit_verify_collapse_identical(spark):
    """The distinct-text collapse (signatures, band collisions and the DP
    all depend only on the text) emits the IDENTICAL relation as the
    direct path — exercised with clone groups (intra pairs, distance 0),
    near-dup groups (cross rep pairs expand to member pairs), an
    empty-text group and a null-text group (both must emit nothing, the
    direct path's 0/0-null and null-signature semantics)."""
    from pyspark.sql import functions as F

    from biggraphite_spark.operators.dedup import lsh_edit_verify

    base = "alpha beta gamma delta epsilon zeta eta theta " * 4
    rows = (
        [(i, base) for i in range(5)]
        + [(10 + i, base.replace("gamma", "gXmma")) for i in range(4)]
        + [(20 + i, "unrelated words entirely different content " * 4) for i in range(3)]
        + [(30, ""), (31, ""), (40, None), (41, None)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        mode: sorted(
            tuple(r) for r in lsh_edit_verify(df, collapse=mode).collect()
        )
        for mode in (True, False, "auto")
    }
    assert got[True] == got[False] == got["auto"]
    pairs = {(a, b) for a, b, _, _ in got[True]}
    assert (0, 1) in pairs                      # intra clone pair
    assert any(a < 5 and 10 <= b < 14 for a, b in pairs)  # cross near-dup
    assert all(a < 30 and b < 30 for a, b in pairs)  # empty/null emit nothing


def test_simhash_near_pairs_collapse_identical(spark):
    """The distinct-text collapse on the Manku banded hamming join emits
    the identical relation as the direct path: clone groups (hamming 0
    intra pairs, including the empty-text group — its simhash is real),
    near groups (cross rep pairs expand), and null-text groups (simhash
    is null on the direct path, so they must emit nothing)."""
    from biggraphite_spark.operators.dedup import simhash_near_pairs

    base = "alpha beta gamma delta epsilon zeta " * 3
    rows = (
        [(i, base) for i in range(6)]
        + [(10 + i, base.replace("zeta", "zetb")) for i in range(4)]
        + [(20, ""), (21, ""), (30, None), (31, None)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        mode: sorted(
            tuple(r) for r in simhash_near_pairs(docs, collapse=mode).collect()
        )
        for mode in (True, False, "auto")
    }
    assert got[True] == got[False] == got["auto"]
    pairs = {(a, b) for a, b, _ in got[True]}
    assert (0, 1) in pairs and (20, 21) in pairs   # clone + empty intra
    assert not any(a >= 30 or b >= 30 for a, b in pairs)  # null emits nothing
