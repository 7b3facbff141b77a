#!/usr/bin/env python
"""Parallel full-registry oracle sweep.

A serial full sweep at sf1 costs ~30-60s/query (Spark plan + a DuckDB
oracle that re-parses the 10M-row events table per query) — ~5h for 163
queries.  This splits the registry round-robin across N worker processes
(each its own Spark JVM on SPARK_GRAFT_CPUS cores and its own DuckDB
bounded to SPARK_GRAFT_DUCK_THREADS), which is safe because the checkers
share nothing but the read-only parquet inputs.

    SPARK_GRAFT_ORACLE_SF_DIR=testdata_sf1 python scripts/oracle_sweep.py [N]

Prints each worker's per-query lines as they finish, then a combined
RESULT line.  Exit 0 iff every worker passed.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    n_workers = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    chunks = [names[i::n_workers] for i in range(n_workers)]

    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_CPUS", "8")
    env.setdefault("SPARK_GRAFT_DUCK_THREADS", "8")
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "18g")

    procs = [
        subprocess.Popen(
            [sys.executable, "-u", os.path.join(ROOT, "scripts", "oracle_check.py"),
             *chunk],
            env=env, cwd=ROOT,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        for chunk in chunks if chunk
    ]
    rc = 0
    for i, p in enumerate(procs):
        for line in p.stdout:
            line = line.rstrip("\n")
            if line.startswith(("OK", "FAIL", "MISMATCH", "rows-only", "RESULT")):
                print(f"[w{i}] {line}", flush=True)
        p.wait()
        rc |= p.returncode
    print(f"SWEEP RESULT: {'PASS' if rc == 0 else 'FAIL'} "
          f"({len(names)} queries, {len(procs)} workers)")
    return rc


if __name__ == "__main__":
    sys.exit(main())
