#!/usr/bin/env python
"""Interleaved same-JVM A/B of the r10.5 prefix/hot-key checkpoint + probe
changes (dedup.py) against the committed r10 implementations.

The chunk-level bench cannot resolve these effects: same-day per-query
swings on IDENTICAL code reach 1.5-2x inside a 5-heavy-plan chunk (the
PERF.md finding-18 noise class), so this script uses the ab_guard_drift
pattern instead — ONE JVM, the OLD operator (checked out verbatim from the
pre-change commit via ``git show``) and the NEW operator (the working
tree's import) alternated A,B,A,B,... with a warm-up rep each, reporting
per-variant medians of the noop-sink wall.

Usage:  python scripts/ab_prefix_ckpt.py [reps=3] [sf_dir=/root/testdata_sf1]
Prints one JSON line per operator with old/new medians and all samples.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata_sf1"
# Default to the PRE-CHANGE commit the recorded r10 A/B numbers compare
# against (627a843 = the tree before the prefix-checkpoint change), not
# HEAD: with HEAD as base, a post-merge run loads the NEW code as the
# "old" arm and silently reports ~1.0.  main() additionally fails loudly
# when the two arms' sources are byte-identical.
BASE_REF = os.environ.get("AB_BASE_REF", "627a843")


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    from biggraphite_spark.session import get_spark
    import biggraphite_spark.operators.dedup as newmod

    # the OLD module, loaded from the base ref under a scratch name; it
    # self-imports nothing outside the package, so exec in a module shim
    # with the package context is enough
    old_src = subprocess.check_output(
        ["git", "show", f"{BASE_REF}:biggraphite_spark/operators/dedup.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        text=True,
    )
    with open(newmod.__file__) as fh:
        if fh.read() == old_src:
            raise SystemExit(
                f"AB arms identical: {BASE_REF}:dedup.py == working tree; "
                "set AB_BASE_REF to the pre-change commit"
            )
    import types

    oldmod = types.ModuleType("dedup_old")
    oldmod.__package__ = "biggraphite_spark.operators"
    oldmod.__file__ = newmod.__file__  # relative imports resolve identically
    exec(compile(old_src, "dedup_old", "exec"), oldmod.__dict__)

    spark = get_spark("ab-prefix-ckpt")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    docs.write.format("noop").mode("overwrite").save()  # warm the scan

    import os as _os
    only = {c for c in _os.environ.get("AB_CASES", "").split(",") if c}
    cases = [
        ("containment_prefix", lambda m: m.containment_prefix_pairs(docs, threshold=0.6)),
        ("jaccard_prefix", lambda m: m.jaccard_prefix_pairs(docs, threshold=0.5)),
        ("containment_exact", lambda m: m.containment_pairs(docs, threshold=0.6)),
        ("ngram_exact", lambda m: m.ngram_jaccard_pairs(docs, threshold=0.5)),
        ("lsh_near_dups", lambda m: m.lsh_near_dups(docs, threshold=0.5)),
    ]
    if only:
        cases = [c for c in cases if c[0] in only]

    for name, build in cases:
        samples: dict[str, list[float]] = {"old": [], "new": []}
        # one unrecorded warm-up per variant, then interleaved recorded reps
        for variant, mod in (("old", oldmod), ("new", newmod)):
            build(mod).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
        for _ in range(REPS):
            for variant, mod in (("old", oldmod), ("new", newmod)):
                spark.sparkContext.setJobDescription(f"ab:{name}:{variant}")
                t0 = time.time()
                build(mod).write.format("noop").mode("overwrite").save()
                samples[variant].append(round(time.time() - t0, 3))
                spark.sparkContext.setJobDescription(None)
                spark.catalog.clearCache()
        rec = {
            "case": name,
            "sf_dir": SF_DIR,
            "old_median": statistics.median(samples["old"]),
            "new_median": statistics.median(samples["new"]),
            "ratio_new_over_old": round(
                statistics.median(samples["new"]) / statistics.median(samples["old"]), 3
            ),
            "samples": samples,
        }
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
