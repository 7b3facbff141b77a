#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark AND its
``oracle_sql()`` twin on DuckDB at sf0.01 (or $SPARK_GRAFT_ORACLE_SF_DIR),
then compares row count, sorted column names, and an order-insensitive
value hash.  Usage:

    python scripts/oracle_check.py [query ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon_cell(v) -> str:
    # Deliberately does NOT collapse integral floats to ints: the driver's
    # comparison distinguishes Spark long `3` from DuckDB HUGEINT-as-float64
    # `3.0`, and the old collapse masked exactly that class (VERDICT r3).
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        return f"{v:.6f}"
    if isinstance(v, (pd.Timestamp,)):
        return v.isoformat()
    return str(v)


def dtype_kinds(df: pd.DataFrame) -> list[str]:
    """Column dtype kinds in sorted-column order: i=int u=uint f=float b=bool
    O=object M=datetime — int-vs-float disagreement here is the HUGEINT bug."""
    return [df[c].dtype.kind for c in sorted(df.columns)]


def frame_fingerprint(df: pd.DataFrame) -> tuple[int, list[str], str, list[str]]:
    cols = sorted(df.columns)
    rows = [
        "|".join(canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(df), cols, h, rows


def main() -> int:
    import __spark_entry__ as entrymod
    from biggraphite_spark.session import get_spark

    only = set(sys.argv[1:])
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    # bound the oracle's thread pool when several checkers share the box
    # (scripts/oracle_sweep.py parallel mode); default = all cores
    duck_threads = os.environ.get("SPARK_GRAFT_DUCK_THREADS")
    if duck_threads:
        con.execute(f"SET threads={int(duck_threads)}")
    for t in TABLES:
        # driver testdata ships single parquet FILES; Spark-generated scale
        # dirs (scripts/gen_sf1.py) are DIRECTORIES of part files
        path = f"{SF_DIR}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    spark = get_spark("oracle-check")
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            failures += 1
            continue
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"rows-only  {name}: {len(sdf)} rows ({spark_s:.1f}s) [no oracle]")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures += 1
            continue
        sn, scols, shash, srows = frame_fingerprint(sdf)
        on, ocols, ohash, orows = frame_fingerprint(odf)
        skinds, okinds = dtype_kinds(sdf), dtype_kinds(odf)
        # int-vs-float kind disagreement is a red flag even if the hash agrees
        # (empty results hash equal regardless of dtype).
        kind_ok = len(sdf) == 0 or not any(
            ("f" in (sk, ok)) and (sk != ok) and ({sk, ok} & {"i", "u"})
            for sk, ok in zip(skinds, okinds)
        )
        status = (
            "OK   "
            if (sn, scols, shash) == (on, ocols, ohash) and kind_ok
            else "MISMATCH"
        )
        print(f"{status} {name}: rows {sn}/{on} cols {'=' if scols == ocols else f'{scols} vs {ocols}'} "
              f"hash {'=' if shash == ohash else f'{shash} vs {ohash}'}"
              f"{'' if kind_ok else f' dtypes {skinds} vs {okinds}'} ({spark_s:.1f}s)")
        if status != "OK   ":
            failures += 1
            sset, oset = set(srows), set(orows)
            for r in list(sset - oset)[:3]:
                print(f"    spark-only: {r[:200]}")
            for r in list(oset - sset)[:3]:
                print(f"    oracle-only: {r[:200]}")
    print("RESULT:", "PASS" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
