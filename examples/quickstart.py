"""End-to-end quickstart for the bgspark engine.

Runs against the driver-generated test data (``--sf-dir``, default
sf0.001) and walks the two halves of the engine:

1. the Graphite-compatible metrics path — catalog find, aligned read,
   a render-target expression, a seriesByTag query;
2. the training-data curation path — near-dup detection, cluster
   representatives by PageRank centrality, and quality stats.

    python examples/quickstart.py [--sf-dir /root/testdata/sf0.001]
"""

import argparse
import sys

sys.path.insert(0, ".")  # repo root


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from pyspark.sql import functions as F  # noqa: F401

    from biggraphite_spark.cli import build_engine
    from biggraphite_spark.session import get_spark

    spark = get_spark("bgspark-quickstart")
    eng = build_engine(spark, args.sf_dir)

    # -- metrics path -------------------------------------------------------
    names = eng.glob_names("bg.click.u*")[:3]
    print(f"# {len(names)} sample metrics:", ", ".join(names))

    res = eng.read(names[0], eng.now - 2 * 86400, eng.now)
    print(f"# read {names[0]}: step={res.step}s, "
          f"{res.series.count()} dense buckets")

    from biggraphite_spark.functions.targets import (
        evaluate_target, parse_target,
    )

    target = "movingAverage(sumSeries(bg.click.u*), 4)"
    node = parse_target(target)
    start, end = eng.now - 2 * 86400, eng.now
    a_start, a_end, stage = eng.retention.align_time_window(
        start, end, eng.now)
    df = evaluate_target(
        node,
        fetch=lambda g: eng.read(g, start, end).series,
        step=stage.precision, start=a_start,
    )
    top = df.filter("value is not null").orderBy("ts").limit(3).collect()
    print(f"# render {target!r}: first points",
          [(r["ts"], round(r["value"], 3)) for r in top])

    # -- curation path ------------------------------------------------------
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    print(f"# documents: {docs.count()}")

    from biggraphite_spark.operators.dedup import dup_clusters, lsh_near_dups
    from biggraphite_spark.operators.graph import neardup_pagerank

    pairs = lsh_near_dups(docs, threshold=0.5).cache()
    print(f"# near-dup pairs (MinHash-LSH, jaccard>=0.5): {pairs.count()}")

    clusters = dup_clusters(docs, pairs=pairs)
    n_clusters = clusters.select("cluster_id").distinct().count()
    print(f"# dedup clusters: {n_clusters} "
          f"(keep one representative per cluster)")

    scores = neardup_pagerank(docs, pairs=pairs)
    hub = scores.orderBy(F.desc("score")).first()
    print(f"# most central document: doc_id={hub['doc_id']} "
          f"score={hub['score']}")

    from biggraphite_spark.operators.graph import kcore, triangle_stats

    tri = triangle_stats(
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b")),
        docs.select("doc_id"),
    )
    dense = tri.filter("clustering_coeff >= 0.99").count()
    core = kcore(
        pairs.selectExpr("doc_a as a", "doc_b as b")
        .unionByName(pairs.selectExpr("doc_b as a", "doc_a as b")),
        docs.select("doc_id"),
    )
    print(f"# graph: {dense} docs in dup cliques (coeff=1), "
          f"{core.filter('in_core').count()} docs in the 2-core")

    from biggraphite_spark.operators.text import text_stats

    stats = text_stats(docs).agg(
        F.avg("n_tokens").alias("avg_tokens")
    ).first()
    print(f"# avg tokens/doc: {stats['avg_tokens']:.1f}")

    # -- embeddings path ----------------------------------------------------
    from biggraphite_spark.operators.pca import pca_fit, pca_project

    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    comps, offsets, eigs = pca_fit(emb, "embedding", k=2)
    proj = pca_project(emb, comps, offsets)
    spread = proj.agg(
        F.round(F.variance("pc1"), 5).alias("v1"),
        F.round(F.variance("pc2"), 5).alias("v2"),
    ).first()
    print(f"# PCA over {emb.count()} embeddings: "
          f"top-2 eigenvalues {eigs[0]:.5f}/{eigs[1]:.5f}, "
          f"projected variance {spread['v1']}/{spread['v2']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
