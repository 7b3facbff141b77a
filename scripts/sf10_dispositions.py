#!/usr/bin/env python
"""Dispositions for the sf10 stretch point's super-linear queries.

The sf10-shape dataset (scripts/gen_sf1.py with copies=100) replicates
document CONTENT 100x, so every clone group grows 100x and the near-dup
pair graph grows ~10,000x over sf0.1 — a property of the replication
generator, not of the corpus sizes the engine targets (real corpora add
documents, not 100-way clones).  Two measurements separate generator
artifacts from engine scaling:

1. **Pair-density audit** — count LSH candidate/verified pairs at
   sf0.1 / sf1 / sf10 so the >linear wall ratios of the pair-graph
   queries can be read against the pair-space growth they actually pay.
2. **SemDeDup k ∝ N** — the contract query pins k=8 for oracle
   tractability; the production knob (Abbas et al. 2023) scales cluster
   count with corpus size so cell sizes stay constant.  Time
   semantic_dedup at sf10 with k=80 (cell size == the sf1 k=8 shape):
   near-flat per-vector cost is the engine's actual scaling behaviour.

Usage: python scripts/sf10_dispositions.py [sf10_dir]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf10 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf10"
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from pyspark.sql import functions as F

    from biggraphite_spark.operators.clustering import semantic_dedup
    from biggraphite_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_near_dups,
        minhash_signatures_projection,
    )
    from biggraphite_spark.session import get_spark

    spark = get_spark("sf10-dispositions")
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm-up

    # 1. pair-density audit across the three decades
    for label, d in [
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1", "/root/repo/testdata_sf1"),
        ("sf10", sf10),
    ]:
        if not os.path.isdir(d):
            continue
        docs = spark.read.parquet(f"{d}/documents.parquet")
        t0 = time.time()
        sigs = minhash_signatures_projection(docs).cache()
        n_cand = lsh_candidate_pairs(sigs).count()
        t_cand = time.time() - t0
        t0 = time.time()
        n_ver = lsh_near_dups(docs, threshold=0.5).count()
        t_ver = time.time() - t0
        sigs.unpersist()
        spark.catalog.clearCache()
        print(json.dumps({
            "measure": "lsh_pair_density", "sf": label,
            "docs": docs.count(), "candidate_pairs": n_cand,
            "verified_pairs": n_ver,
            "candidates_sec": round(t_cand, 1),
            "verify_sec": round(t_ver, 1),
        }), flush=True)

    # 2. SemDeDup at sf10 across the k knob.  k=8 (the oracle-tractable
    # contract setting) means 25k-wide cells and ~2.5e9 pair cosines —
    # the expression form needed >40 min wall / ~600 CPU-min here even
    # block-salted (the knob's quadratic contract, sum of cell^2); the
    # Arrow pair stage makes even that measurable.  k=80 reproduces the
    # sf1 k=8 cell width one decade up (the production k ∝ N setting);
    # k=800 is the paper-faithful sqrt-ish point.
    emb = spark.read.parquet(f"{sf10}/embeddings.parquet")
    n = emb.count()
    for k in (8, 80, 800):
        t0 = time.time()
        kept = semantic_dedup(emb, k=k).filter("keep").count()
        spark.catalog.clearCache()
        print(json.dumps({
            "measure": "semdedup_k_scaling", "sf": "sf10", "vectors": n,
            "k": k, "kept": kept, "sec": round(time.time() - t0, 1),
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
