"""Similarity search over embedding columns: brute-force cosine top-k and a
random-hyperplane LSH-bucketed variant.

Beyond-reference operators.  The embeddings table carries
``array<float>`` vectors; all math is done after an elementwise cast to
double, with explicit left-to-right summation so the DuckDB oracle computes
bit-compatible values (both engines then round before ranking, making the
top-k fully deterministic).

Scale shape:
- brute force = broadcast(queries) x corpus — linear scan, the correctness
  baseline and still the right plan for <= millions of vectors per query
  batch;
- LSH buckets = sign-pattern of dots with fixed hyperplanes -> 2^H buckets;
  the join is then bucket-equi + local top-k, cutting the scan by ~2^H at
  recall cost.  Hyperplanes are deterministic (seeded) Python constants
  embedded into the plan, so plans are reproducible across runs/engines.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def random_hyperplanes(n: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes, rounded so their decimal
    literals parse to identical doubles everywhere."""
    rng = random.Random(seed)
    return [
        [round(rng.gauss(0.0, 1.0), 6) for _ in range(dim)] for _ in range(n)
    ]


def as_double_array(col: Column) -> Column:
    return col.cast("array<double>")


def dot_expr(a: Column, b: Column) -> Column:
    """Left-to-right sequential dot product (matches list_sum order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query batch against the corpus.

    Output: query_id, neighbor_id, sim (rounded), rank — ranked by rounded
    similarity with id tie-break, so the result set is exactly reproducible.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(F.col(vec_col)).alias("qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(F.col(vec_col)).alias("cv")
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("qv"), F.col("cv")), 5).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def lsh_bucket_expr(vec: Column, hyperplanes: list[list[float]]) -> Column:
    """Bucket id = sign pattern of the vector against each hyperplane."""
    bucket = None
    for h, plane in enumerate(hyperplanes):
        lit = F.array(*[F.lit(v) for v in plane])
        term = F.when(dot_expr(vec, lit) >= 0, F.lit(1 << h)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return bucket.cast("long")


def ann_lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    hyperplanes: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed approximate top-k: candidates share the query's bucket.

    The bucket equi-join replaces the full cross product — at scale the
    corpus is pre-bucketed (partitioned/bucketed by ``bucket``) so each query
    touches one partition.
    """
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(F.col(vec_col)).alias("cv")
    ).withColumn("bucket", lsh_bucket_expr(F.col("cv"), hyperplanes))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(F.col(vec_col)).alias("qv")
    ).withColumn("bucket", lsh_bucket_expr(F.col("qv"), hyperplanes))
    sims = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("qv"), F.col("cv")), 5).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def label_centroids(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label centroid statistics via posexplode -> two-level aggregation
    (the IVF-style cell summary): label, n_vectors, centroid_norm."""
    exploded = embeddings.select(
        "label", id_col, F.posexplode(as_double_array(F.col(vec_col))).alias("pos", "val")
    )
    cell = exploded.groupBy("label", "pos").agg(
        F.avg("val").alias("mean_val"), F.count_distinct(F.col(id_col)).alias("n_vectors")
    )
    return (
        cell.groupBy("label")
        .agg(
            F.first("n_vectors").alias("n_vectors"),
            F.round(F.sqrt(F.sum(F.col("mean_val") * F.col("mean_val"))), 5).alias("centroid_norm"),
        )
    )
