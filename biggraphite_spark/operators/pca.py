"""Distributed PCA over embedding columns — exact-arithmetic moments, so
the projection is oracle-replayable bit for bit.

Part of the beyond-reference embedding family (with ``similarity.py`` /
``clustering.py``): principal components are the standard pre-step for
embedding compression (Matryoshka-style truncation keeps the FIRST model
dims; PCA keeps the highest-variance LEARNED dims), whitening, and
visualization sampling in a training-data pipeline.

Why this is deterministic when textbook distributed PCA is not: float
covariance accumulation is association-order-sensitive, so a Spark
partial-agg tree and any oracle's single pass disagree in the last ulp
and an eigensolve AMPLIFIES that drift.  Here the embeddings are
fixed-point quantized (``floor(x * 1e6)`` — one IEEE multiply plus
floor, which every engine reproduces), and the sufficient statistics ``S = Σ qqᵀ``,
``s = Σ q``, ``n`` are accumulated in int64 — integer addition is
associative, so ANY aggregation order yields the identical matrix.  The
(tiny, d×d) covariance solve then happens once, driver-side, on exact
inputs: same matrix + same LAPACK = same components for the engine and
the oracle twin.

Scale shape: one Arrow ``mapInPandas`` pass emits a d×d partial Gram per
PARTITION (synopsis-sized: d²+d+1 longs regardless of row count), a
(d²)-key hash agg sums them, and only the d×d result reaches the driver
— the same convergence-scalar collect class as the k-means loop.  The
projection is a broadcast-literal ``zip_with``/``aggregate`` fold, fully
JVM-side, no shuffle.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pca_moments", "pca_fit", "pca_project", "pca_whiten", "PCA_QUANT"]

#: fixed-point scale: 6 fractional decimal digits survive quantization.
#: |x| ≤ ~1 embeddings → |q| ≤ ~1e6, q² ≤ 1e12 → int64 holds the Gram
#: sum exactly past 10^6 rows per group; larger corpora shard the moment
#: pass and merge (integer partials merge losslessly).
PCA_QUANT = 1_000_000


def _quantize(vec_col):
    """floor(x * PCA_QUANT) per element — float→double widening, one IEEE
    multiply, floor: every engine computes the identical long."""
    return F.transform(
        vec_col.cast("array<double>"),
        lambda x: F.floor(x * F.lit(float(PCA_QUANT))).cast("long"),
    )


def pca_moments(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Exact integer sufficient statistics for PCA: rows ``(kind, pos, v)``
    with kind 0 = flattened ``S = Σ qqᵀ`` (pos = i*d + j), kind 1 =
    ``s = Σ q`` (pos = i), kind 2 = row count (pos = 0).

    One Arrow pass; each partition contributes ONE synopsis (d²+d+1
    rows), merged by an integer hash agg — the moments are mergeable
    across partitions, days, or shards with zero loss.
    """
    quant = df.select(_quantize(F.col(vec_col)).alias("q"))

    def gram(batches):
        import pandas as pd

        S = None
        s = None
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.stack(pdf["q"].to_numpy()).astype(np.int64)
            part = Q.T @ Q  # int64 matmul: exact
            S = part if S is None else S + part
            sv = Q.sum(axis=0)
            s = sv if s is None else s + sv
            n += len(Q)
        if S is None:
            return
        d = S.shape[0]
        yield pd.DataFrame(
            {
                "kind": [0] * (d * d) + [1] * d + [2],
                "pos": list(range(d * d)) + list(range(d)) + [0],
                "v": list(S.flatten()) + list(s) + [n],
            }
        )

    partials = quant.mapInPandas(gram, schema="kind int, pos int, v long")
    return partials.groupBy("kind", "pos").agg(F.sum("v").alias("v"))


def pca_fit(
    df: DataFrame, vec_col: str = "embedding", k: int = 2
) -> tuple[list[list[float]], list[float], list[float]]:
    """Fit top-``k`` principal components from the exact moments.

    Returns ``(components, offsets, eigenvalues)`` — components in the
    QUANTIZED space (projection = dot(q, c)/QUANT − offset), sign-fixed
    so each component's largest-|coefficient| entry is positive
    (eigenvectors are sign-ambiguous; this pins one).  The d×d eigensolve
    runs on the driver over exact integer inputs, so any process holding
    the same data derives the identical components.
    """
    rows = pca_moments(df, vec_col).collect()
    sflat = {(r["kind"], r["pos"]): r["v"] for r in rows}
    n = sflat[(2, 0)]
    d = int(round(len([1 for kk, _ in sflat if kk == 0]) ** 0.5))
    S = np.array(
        [[sflat[(0, i * d + j)] for j in range(d)] for i in range(d)],
        dtype=np.float64,
    )
    s = np.array([sflat[(1, i)] for i in range(d)], dtype=np.float64)
    cov = (S - np.outer(s, s) / n) / n
    evals, evecs = np.linalg.eigh(cov)
    comps: list[list[float]] = []
    offsets: list[float] = []
    eigs: list[float] = []
    mean = s / n  # quantized-space mean
    for r in range(1, k + 1):
        c = evecs[:, -r]
        pivot = int(np.argmax(np.abs(c)))
        if c[pivot] < 0:
            c = -c
        comps.append([float(x) for x in c])
        # offset = mean · c in the same left-to-right fold order the
        # projection uses, so centering cancels bit-exactly at the mean
        acc = 0.0
        for i in range(d):
            acc = acc + float(mean[i]) * float(c[i])
        offsets.append(acc / PCA_QUANT)
        eigs.append(float(evals[-r]) / (PCA_QUANT * PCA_QUANT))
    return comps, offsets, eigs


def pca_project(
    df: DataFrame,
    components: list[list[float]],
    offsets: list[float],
    vec_col: str = "embedding",
    out_prefix: str = "pc",
) -> DataFrame:
    """Project onto fitted components: per row and component, a
    left-to-right ``aggregate`` fold over ``zip_with(q, c, *)`` — exact
    fold order is part of the contract (the oracle twin replays it
    verbatim), broadcast literals, no shuffle, whole-stage codegen."""
    out = df.withColumn("__q", _quantize(F.col(vec_col)))
    for j, (c, off) in enumerate(zip(components, offsets), start=1):
        lit = F.array(*[F.lit(float(x)) for x in c])
        dot = F.aggregate(
            F.zip_with(F.col("__q"), lit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out.withColumn(
            f"{out_prefix}{j}", dot / F.lit(float(PCA_QUANT)) - F.lit(off)
        )
    return out.drop("__q")


def pca_whiten(
    df: DataFrame,
    components: list[list[float]],
    offsets: list[float],
    eigenvalues: list[float],
    vec_col: str = "embedding",
    out_prefix: str = "w",
    eps: float = 1e-12,
) -> DataFrame:
    """PCA whitening: project, then scale each principal score by
    1/sqrt(eigenvalue) so every retained direction has unit variance —
    the standard embedding pre-conditioning before cosine-based dedup or
    clustering (SemDeDup-style pipelines), where one dominant direction
    would otherwise drown the rest.

    The scale factors are driver-computed doubles applied as broadcast
    literals, so whitening inherits the projection's bit-exactness: the
    oracle twin multiplies by the identical literal."""
    proj = pca_project(df, components, offsets, vec_col, out_prefix="__p")
    out = proj
    for j, ev in enumerate(eigenvalues, start=1):
        out = out.withColumn(
            f"{out_prefix}{j}",
            F.col(f"__p{j}") * F.lit(1.0 / float(np.sqrt(ev + eps))),
        )
    return out.drop(*[f"__p{j}" for j in range(1, len(eigenvalues) + 1)])
