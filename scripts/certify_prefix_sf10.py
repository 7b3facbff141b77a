#!/usr/bin/env python
"""sf10 LOSSLESSNESS spot-certification for the prefix-filtered pair paths.

The full exact baselines cannot run at sf10 (that is why the prefix paths
exist), so the bit-identity claim there cannot be a full value gate.  But
pair values are PAIRWISE — containment/Jaccard depend only on the two
documents' shingle sets — so restriction commutes with the operator:

    exact(docs restricted to S)  ==  prefix(all docs) filtered to pairs
                                     with BOTH endpoints in S

for any doc subset S.  This script draws a deterministic hash sample S
(~SAMPLE_FRAC of sf10), runs the EXACT operators on the subset (small
enough to be feasible), runs the PREFIX operators on the FULL sf10 corpus,
restricts, and value-compares row sets exactly.  A lost pair or a wrong
rounded value fails the certification.

The same argument certifies the text-collapsed ``lsh_edit_verify``: a
band collision depends only on the two signatures (pairwise) and the DP
only on the two texts, so restriction commutes with the WHOLE operator —
the uncollapsed direct path on S must equal the collapsed full-corpus run
restricted to S×S.

Usage: python scripts/certify_prefix_sf10.py
Env: SPARK_GRAFT_SF_DIR (default /root/repo/testdata_sf10),
     SPARK_GRAFT_SAMPLE_MOD (default 64 -> ~1.6% of docs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/repo/testdata_sf10")
SAMPLE_MOD = int(os.environ.get("SPARK_GRAFT_SAMPLE_MOD", "64"))


def main() -> None:
    from pyspark.sql import functions as F

    from biggraphite_spark.operators.dedup import (
        containment_pairs,
        containment_prefix_pairs,
        jaccard_prefix_pairs,
        lsh_edit_verify,
        ngram_jaccard_pairs,
    )
    from biggraphite_spark.session import get_spark

    spark = get_spark("certify-prefix-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(64)
    in_sample = F.crc32(F.col("doc_id").cast("string")) % SAMPLE_MOD == 0
    sample = docs.filter(in_sample).cache()
    n_sample = sample.count()

    cases = [
        (
            "containment",
            lambda d: containment_pairs(d, threshold=0.6),
            lambda d: containment_prefix_pairs(d, threshold=0.6),
        ),
        (
            "jaccard",
            lambda d: ngram_jaccard_pairs(d, threshold=0.5),
            lambda d: jaccard_prefix_pairs(d, threshold=0.5),
        ),
        (
            # uncollapsed direct path on S vs text-collapsed run on FULL
            # sf10, restricted — certifies the finding-44 collapse at scale
            "edit_verify",
            lambda d: lsh_edit_verify(d, collapse=False),
            lambda d: lsh_edit_verify(d, collapse="auto"),
        ),
    ]
    ok = True
    for name, exact_fn, prefix_fn in cases:
        t0 = time.time()
        exact_rows = sorted(tuple(r) for r in exact_fn(sample).collect())
        t1 = time.time()
        full = prefix_fn(docs)
        restricted = (
            full.join(
                sample.select(F.col("doc_id").alias("doc_a")), "doc_a", "left_semi"
            ).join(
                sample.select(F.col("doc_id").alias("doc_b")), "doc_b", "left_semi"
            )
            # left_semi twice reorders nothing but select order must match
            .select(*[f.name for f in full.schema.fields])
        )
        prefix_rows = sorted(tuple(r) for r in restricted.collect())
        t2 = time.time()
        match = exact_rows == prefix_rows
        ok = ok and match
        print(
            json.dumps(
                {
                    "case": name,
                    "sample_docs": n_sample,
                    "exact_pairs_on_sample": len(exact_rows),
                    "prefix_pairs_restricted": len(prefix_rows),
                    "values_identical": match,
                    "exact_s": round(t1 - t0, 2),
                    "prefix_full_sf10_s": round(t2 - t1, 2),
                }
            ),
            flush=True,
        )
        spark.catalog.clearCache()
        sample = docs.filter(in_sample).cache()
    print(f"RESULT: {'PASS' if ok else 'FAIL'}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
