#!/usr/bin/env python
"""Scale sf0.1 to an sf1-equivalent dataset for the scale bench point.

The driver only ships sf{0.001,0.01,0.1}; the 100x-design claims need at
least one empirical point a decade up.  This replicates sf0.1 x10 with
per-replica key offsets so every foreign-key join keeps exactly the sf0.1
per-replica match structure (replica i's orders only reference replica i's
customers, etc.) while distinct-key cardinalities, join fan-outs, and
shuffle volumes all scale 10x — the same construction TPC-H itself uses
for scale factors (more customers, not hotter customers).  region/nation
stay fixed (constant-size in TPC-H proper).

Usage: python scripts/gen_sf1.py [out_dir] [copies] [src_dir]
       (defaults /root/repo/testdata_sf1, 10, /root/testdata/sf0.1)

``copies=100`` produces the sf10-shape decade directly (the construction
composes: 100 one-shot replicas == 10 replicas of 10, since region/nation
are fixed and strides come from the source max key).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
COPIES = 10

#: per-table key columns to shift by replica * (1 + max key over sf0.1)
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]


def main() -> None:
    global SRC, COPIES
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    if len(sys.argv) > 2:
        COPIES = int(sys.argv[2])
    if len(sys.argv) > 3:
        SRC = sys.argv[3]
    from pyspark.sql import functions as F

    from biggraphite_spark.session import get_spark

    spark = get_spark("gen-sf1")
    os.makedirs(out, exist_ok=True)
    for t in FIXED:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(f"{t}: copied")
    for t, keys in SHIFT.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        # one offset per key column: keys shift in lockstep across every
        # table sharing them (o_custkey uses customer's max, etc.), so the
        # offset must come from the key's HOME table's max
        strides = {}
        for k in keys:
            home = {
                "c_custkey": "customer", "s_suppkey": "supplier",
                "p_partkey": "part", "o_orderkey": "orders",
                "o_custkey": "customer", "l_orderkey": "orders",
                "l_partkey": "part", "l_suppkey": "supplier",
                "event_id": "events", "user_id": "events",
                "doc_id": "documents", "vec_id": "embeddings",
            }[k]
            home_col = k if not k.startswith(("o_c", "l_")) else {
                "o_custkey": "c_custkey", "l_orderkey": "o_orderkey",
                "l_partkey": "p_partkey", "l_suppkey": "s_suppkey",
            }[k]
            strides[k] = (
                spark.read.parquet(f"{SRC}/{home}.parquet")
                .agg(F.max(home_col)).collect()[0][0] + 1
            )
        parts = []
        for i in range(COPIES):
            rep = df
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + F.lit(i * strides[k]))
            parts.append(rep)
        scaled = parts[0]
        for rep in parts[1:]:
            scaled = scaled.unionByName(rep)
        scaled.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: x{COPIES} -> {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
