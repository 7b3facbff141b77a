"""Exact-arithmetic PCA (operators/pca.py): moment mergeability, the
numpy cross-check, and the projection contracts emb_pca relies on."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from biggraphite_spark.operators.pca import (
    PCA_QUANT,
    pca_fit,
    pca_moments,
    pca_project,
)


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def _rng_vecs(n=200, d=8, seed=7):
    rng = np.random.default_rng(seed)
    # anisotropic cloud: dim 0 carries 5x the spread of the rest
    base = rng.normal(size=(n, d)) * 0.05
    base[:, 0] *= 5
    base[:, 1] *= 2
    return np.clip(base, -0.9, 0.9)


def test_moments_match_numpy_and_merge_exactly(spark):
    vecs = _rng_vecs()
    df = _emb_df(spark, vecs).repartition(7)
    rows = pca_moments(df).collect()
    got = {(r["kind"], r["pos"]): r["v"] for r in rows}
    Q = np.array(
        [[math.floor(float(np.float32(x)) * PCA_QUANT) for x in v] for v in vecs],
        dtype=np.int64,
    )
    S = Q.T @ Q
    s = Q.sum(axis=0)
    d = Q.shape[1]
    assert got[(2, 0)] == len(Q)
    for i in range(d):
        assert got[(1, i)] == s[i]
        for j in range(d):
            assert got[(0, i * d + j)] == S[i, j]
    # partition layout cannot change integer moments: 1 vs 7 partitions
    rows1 = pca_moments(_emb_df(spark, vecs).coalesce(1)).collect()
    assert {(r["kind"], r["pos"]): r["v"] for r in rows1} == got


def test_pc1_captures_dominant_axis_and_variance_ordering(spark):
    vecs = _rng_vecs()
    df = _emb_df(spark, vecs)
    comps, offsets, eigs = pca_fit(df, k=3)
    # eigenvalues descend
    assert eigs[0] > eigs[1] > eigs[2] > 0
    # the dominant component is essentially dim 0
    assert abs(comps[0][0]) > 0.95
    # sign fix: the largest-|coefficient| entry is positive
    for c in comps:
        assert c[int(np.argmax(np.abs(c)))] > 0
    # components are orthonormal
    for a in range(3):
        for b in range(3):
            dot = float(np.dot(comps[a], comps[b]))
            assert dot == pytest.approx(1.0 if a == b else 0.0, abs=1e-9)


def test_projection_centered_and_variance_matches_eigenvalue(spark):
    vecs = _rng_vecs()
    df = _emb_df(spark, vecs)
    comps, offsets, eigs = pca_fit(df, k=2)
    proj = pca_project(df, comps, offsets).select("pc1", "pc2").toPandas()
    # centering: projections average to ~0 (exact up to the fold's fp)
    assert abs(proj.pc1.mean()) < 1e-9
    assert abs(proj.pc2.mean()) < 1e-9
    # population variance of pc1 equals the top eigenvalue
    assert proj.pc1.var(ddof=0) == pytest.approx(eigs[0], rel=1e-6)
    assert proj.pc2.var(ddof=0) == pytest.approx(eigs[1], rel=1e-6)


def test_projection_plan_stays_jvm_side(spark):
    vecs = _rng_vecs(50)
    df = _emb_df(spark, vecs)
    comps, offsets, _ = pca_fit(df, k=1)
    plan = pca_project(df, comps, offsets)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # fold is Column algebra, not a UDF
    assert "Exchange" not in plan  # projection is shuffle-free


def test_whitening_gives_unit_variance(spark):
    from biggraphite_spark.operators.pca import pca_whiten

    vecs = _rng_vecs()
    df = _emb_df(spark, vecs)
    comps, offsets, eigs = pca_fit(df, k=2)
    wh = pca_whiten(df, comps, offsets, eigs).select("w1", "w2").toPandas()
    # each whitened direction has ~unit population variance, mean ~0
    assert wh.w1.var(ddof=0) == pytest.approx(1.0, rel=1e-6)
    assert wh.w2.var(ddof=0) == pytest.approx(1.0, rel=1e-6)
    assert abs(wh.w1.mean()) < 1e-6 and abs(wh.w2.mean()) < 1e-6
