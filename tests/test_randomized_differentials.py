"""Randomized differential tests: each operator runs once over a seeded
random corpus (one Spark job) and is compared element-by-element against an
independent plain-python brute force — the cheap version of property
testing that still sweeps the input space far beyond the hand goldens.
"""

from __future__ import annotations

import hashlib
import random

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_rake_keywords_randomized(spark):
    from biggraphite_spark.operators.text import STOPWORDS, rake_keywords

    rnd = random.Random(11)
    vocab = ["alpha", "beta", "gamma", "delta", "model", "data"] + list(STOPWORDS)
    rows = [
        (i, " ".join(rnd.choice(vocab) for _ in range(rnd.randrange(3, 30))))
        for i in range(60)
    ]
    got = {}
    for r in rake_keywords(_docs(spark, rows), top_k=3).collect():
        got.setdefault(r["doc_id"], []).append((r["phrase"], r["score"], r["rank"]))

    stop = set(STOPWORDS)
    for doc_id, text in rows:
        toks = [t for t in text.split(" ") if t]
        phrases, cur = [], []
        for t in toks:
            if t in stop:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(t)
        if cur:
            phrases.append(cur)
        if not phrases:
            assert doc_id not in got
            continue
        freq: dict = {}
        deg: dict = {}
        for p in phrases:
            for w in p:
                freq[w] = freq.get(w, 0) + 1
                deg[w] = deg.get(w, 0) + len(p)
        scored = [
            (" ".join(p), round(sum(deg[w] / freq[w] for w in p), 6))
            for p in phrases
        ]
        scored.sort(key=lambda x: (-x[1], x[0]))
        want = [(ph, sc, i + 1) for i, (ph, sc) in enumerate(scored[:3])]
        have = sorted(got[doc_id], key=lambda x: x[2])
        assert len(have) == len(want), doc_id
        for (gp, gs, gr), (wp, ws, wr) in zip(have, want):
            # identical (score, phrase) ties may permute between engines
            assert gr == wr and gs == pytest.approx(ws, abs=2e-6)
            assert gp == wp or (gs == ws and gp in {p for p, s in scored if s == ws})


def test_ngram_novelty_randomized(spark):
    from biggraphite_spark.operators.curation import ngram_novelty

    rnd = random.Random(5)
    vocab = list("abcdefg")
    rows = [
        (i, " ".join(rnd.choice(vocab) for _ in range(rnd.randrange(1, 15))))
        for i in range(80)
    ]
    got = {
        r["doc_id"]: (r["n_grams"], r["n_novel"], r["novelty"])
        for r in ngram_novelty(_docs(spark, rows), n=3).collect()
    }

    def grams(text):
        toks = text.split(" ")
        if len(toks) >= 3:
            return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        return {text}

    first: dict = {}
    for doc_id, text in rows:
        for g in grams(text):
            first.setdefault(g, doc_id)
    for doc_id, text in rows:
        gs = grams(text)
        novel = sum(1 for g in gs if first[g] == doc_id)
        assert got[doc_id][0] == len(gs)
        assert got[doc_id][1] == novel
        assert got[doc_id][2] == pytest.approx(round(novel / len(gs), 6))


def test_cross_source_dedup_randomized(spark):
    from biggraphite_spark.operators.dedup import cross_source_dedup

    rnd = random.Random(3)
    sources = ["web", "books", "curated", "wiki"]
    texts = [f"text {i}" for i in range(20)]  # collisions guaranteed
    rows = [
        (i, rnd.choice(texts), rnd.choice(sources)) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    priority = ("curated", "web")
    got = {
        r["doc_id"]: (r["kept_doc_id"], r["keep"])
        for r in cross_source_dedup(df, priority=priority).collect()
    }

    rank = {s: i for i, s in enumerate(priority)}
    groups: dict = {}
    for doc_id, text, source in rows:
        h = hashlib.md5(text.encode()).hexdigest()
        groups.setdefault(h, []).append((rank.get(source, len(priority)), source, doc_id))
    for members in groups.values():
        kept = min(members)[2]
        for _, _, doc_id in members:
            assert got[doc_id] == (kept, doc_id == kept)


def test_seasonal_decompose_randomized_with_nulls(spark):
    from biggraphite_spark.functions.series import seasonal_decompose

    rnd = random.Random(9)
    period, step, n = 6, 10, 60
    rows = []
    for name in ("s1", "s2"):
        for t in range(n):
            v = None if rnd.random() < 0.1 else round(rnd.uniform(0, 100), 3)
            rows.append((name, t * step, v))
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    got = {
        (r["name"], r["ts"]): (r["trend"], r["seasonal"], r["residual"])
        for r in seasonal_decompose(df, step, period).collect()
    }

    half = period // 2
    series: dict = {}
    for name, ts, v in rows:
        series.setdefault(name, {})[ts // step] = v
    for name, vals in series.items():
        # trend: classical 2xMA gated on complete non-null frames
        trend = {}
        for i in range(n):
            f1 = [vals.get(j) for j in range(i - half, i + half)]
            f2 = [vals.get(j) for j in range(i - half + 1, i + half + 1)]
            in1 = all(0 <= j < n for j in range(i - half, i + half))
            in2 = all(0 <= j < n for j in range(i - half + 1, i + half + 1))
            if in1 and in2 and all(v is not None for v in f1 + f2):
                trend[i] = (sum(f1) / period + sum(f2) / period) / 2
        detr = {
            i: vals[i] - trend[i]
            for i in trend
            if vals.get(i) is not None
        }
        pmeans: dict = {}
        for i, d in detr.items():
            pmeans.setdefault(i % period, []).append(d)
        pmean = {p: sum(ds) / len(ds) for p, ds in pmeans.items()}
        c = sum(pmean.values()) / len(pmean) if pmean else None
        for i in range(n):
            gt, gs, gr = got[(name, i * step)]
            wt = trend.get(i)
            if wt is None:
                assert gt is None and gr is None
            else:
                assert gt == pytest.approx(round(wt, 6), abs=2e-6)
            p = i % period
            if p in pmean:
                assert gs == pytest.approx(round(pmean[p] - c, 6), abs=2e-6)
            if wt is not None and p in pmean and vals.get(i) is not None:
                assert gr == pytest.approx(
                    round(vals[i] - wt - (pmean[p] - c), 6), abs=2e-6
                )


def test_agg_expr_randomized(spark):
    """Every aggregate-table function vs an independent python brute force
    over seeded random groups with nulls — the graphite safe* semantics
    (null-skipping, all-null -> None, safeMul any-null -> None, safeDiff
    first-minus-rest in ts order) element-by-element."""
    import math

    from biggraphite_spark.functions.series import agg_expr

    rnd = random.Random(23)
    rows = []
    for g in range(40):
        n = rnd.randrange(1, 9)
        for t in range(n):
            v = None if rnd.random() < 0.3 else round(rnd.uniform(-50, 50), 3)
            rows.append((f"g{g}", t, v))
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    by_group: dict[str, list] = {}
    for name, ts, v in rows:
        by_group.setdefault(name, []).append((ts, v))

    def brute(vals, how):
        known = [v for _, v in sorted(vals) if v is not None]
        if how == "count":
            return float(len(known))
        if how == "multiply":
            if len(known) != len(vals):
                return None
            p = 1.0
            for v in known:
                p *= v
            return p
        if how == "avg_zero":
            # graphite avg_zero maps None -> 0 first: all-null group = 0.0
            return sum(known) / len(vals)
        if not known:
            return None
        if how == "sum":
            return sum(known)
        if how == "average":
            return sum(known) / len(known)
        if how == "min":
            return min(known)
        if how == "max":
            return max(known)
        if how == "range":
            return max(known) - min(known)
        if how == "median":
            s = sorted(known)
            m = len(s) // 2
            return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2
        if how == "stddev":
            mu = sum(known) / len(known)
            return math.sqrt(sum((v - mu) ** 2 for v in known) / len(known))
        if how == "first":
            return known[0]
        if how == "last":
            return known[-1]
        if how == "diff":
            return known[0] - sum(known[1:])
        raise AssertionError(how)

    hows = ("sum", "average", "avg_zero", "min", "max", "range", "median",
            "stddev", "first", "last", "diff", "multiply", "count")
    got_rows = df.groupBy("name").agg(
        *[agg_expr(h, order="ts").alias(h) for h in hows]
    ).collect()
    assert len(got_rows) == 40
    for r in got_rows:
        for h in hows:
            want = brute(by_group[r["name"]], h)
            got = r[h]
            if want is None:
                assert got is None, (r["name"], h, got)
            else:
                assert got == pytest.approx(want, rel=1e-9, abs=1e-9), (
                    r["name"], h, got, want)


def test_aggregate_series_lists_randomized(spark):
    """All 12 pairwise seriesLists forms vs a python brute force over a
    seeded random pair of equal-length lists with nulls — the positional
    sorted-name zip + safe* pair semantics.  Unequal lengths raise, like
    graphite-web's InputParameterError (400)."""
    from biggraphite_spark.functions.series import aggregate_series_lists

    rnd = random.Random(31)

    def mk(prefix, n_series):
        rows = []
        for i in range(n_series):
            for t in range(4):
                v = None if rnd.random() < 0.25 else round(
                    rnd.uniform(-9, 9), 2)
                rows.append((f"{prefix}.{i}", t * 60, v))
        return rows

    rows_a, rows_b = mk("a", 3), mk("b", 3)
    with pytest.raises(ValueError):
        aggregate_series_lists(
            spark.createDataFrame(
                rows_a, "name string, ts long, value double"),
            spark.createDataFrame(
                mk("c", 4), "name string, ts long, value double"),
            "sum",
        )
    a = spark.createDataFrame(rows_a, "name string, ts long, value double")
    b = spark.createDataFrame(rows_b, "name string, ts long, value double")

    def by_rank(rows):
        names = sorted({n for n, _, _ in rows})
        return {
            r: {(t): v for n2, t, v in rows if n2 == n}
            for r, n in enumerate(names)
        }, names

    da, names_a = by_rank(rows_a)
    db, names_b = by_rank(rows_b)

    def brute(how, v, w):
        both = v is not None and w is not None
        either = v is not None or w is not None
        z = lambda x: 0.0 if x is None else x  # noqa: E731
        if how in ("sum", "total"):
            return z(v) + z(w) if either else None
        if how in ("average", "avg", "median"):
            if not either:
                return None
            return (z(v) + z(w)) / ((v is not None) + (w is not None))
        if how == "min":
            return min(v, w) if both else (v if v is not None else w)
        if how == "max":
            return max(v, w) if both else (v if v is not None else w)
        if how == "multiply":
            return v * w if both else None
        if how == "diff":
            return v - w if both else (v if v is not None else w)
        if how == "first":
            return v if v is not None else w
        if how in ("last", "current"):
            return w if w is not None else v
        if how == "count":
            return float((v is not None) + (w is not None))
        if how in ("range", "rangeOf"):
            return (max(v, w) - min(v, w)) if both else (0.0 if either else None)
        if how == "stddev":
            return abs(v - w) / 2 if both else (0.0 if either else None)
        raise AssertionError(how)

    for how in ("sum", "average", "min", "max", "multiply", "diff",
                "first", "last", "count", "range", "stddev", "median"):
        got = {
            (r["name"], r["ts"]): r["value"]
            for r in aggregate_series_lists(a, b, how).collect()
        }
        canon = {"avg": "average", "total": "sum",
                 "current": "last", "rangeOf": "range"}.get(how, how)
        want = {}
        for r in range(min(len(names_a), len(names_b))):
            label = f"{canon}Series({names_a[r]},{names_b[r]})"
            for t in (0, 60, 120, 180):
                want[(label, t)] = brute(how, da[r].get(t), db[r].get(t))
        assert set(got) == set(want), how
        for key in want:
            if want[key] is None:
                assert got[key] is None, (how, key, got[key])
            else:
                assert got[key] == pytest.approx(want[key]), (how, key)
