#!/usr/bin/env python
"""A/B the bench spill-guard's cost on the round-9 sf0.1 drift suspects.

Round 9's sf0.1 common-set record moved +5.8% with no code change on 15
queries' paths; BASELINE.md attributed it to the guard-clock fix plus
JIT-position noise.  This settles it: ONE JVM, each query warmed once,
then guard-off/guard-on timings INTERLEAVED (off,on,off,on,off,on) so
within-JVM drift (JIT recompilation, cache decay) cancels instead of
biasing one arm.  The guard arm runs the exact bench.run_guarded watchdog
(poll 2s, timeout 900s, spill limit 60 GB — the record-run settings).

Prints ONE JSON line: per-query medians for both arms and the on/off
ratio.  A ratio ~1.0 pins the drift on JIT position; a consistent >1.0
names the guard's scratch walk as a real cost.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_AB_QUERIES (comma list), SPARK_GRAFT_AB_PASSES (default 3).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = [
    q
    for q in os.environ.get(
        "SPARK_GRAFT_AB_QUERIES",
        "gr_seasonal,gr_holt_winters,gr_anomaly_seasonal,gr_ema,gr_zscore,"
        "gr_window_stats,gr_moving_deriv,gr_summarize_ffill,gr_rate_shift,"
        "gr_sort_limit",
    ).split(",")
    if q
]
PASSES = int(os.environ.get("SPARK_GRAFT_AB_PASSES", "3"))


def main() -> None:
    import __spark_entry__ as entry
    from bench import _warm_up, run_guarded
    from biggraphite_spark.session import get_spark

    spark = get_spark("guard-ab")
    spark.sparkContext.setLogLevel("ERROR")
    _warm_up(spark)
    qmap = entry.queries()
    out = {}
    for name in QUERIES:
        fn = qmap[name]

        def action():
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

        action()  # warm: plan cache + JIT first-compile out of both arms
        offs, ons = [], []
        for _ in range(PASSES):
            t0 = time.time()
            action()
            offs.append(time.time() - t0)
            el, breach, exc = run_guarded(
                spark, action, timeout_s=900,
                spill_limit_bytes=int(60e9), poll_s=2.0,
            )
            if breach or exc:
                raise RuntimeError(f"{name}: {breach} {exc}")
            ons.append(el)
        out[name] = {
            "off_s": round(statistics.median(offs), 3),
            "on_s": round(statistics.median(ons), 3),
            "ratio": round(statistics.median(ons) / statistics.median(offs), 3),
        }
        print(f"{name}: off={out[name]['off_s']} on={out[name]['on_s']} "
              f"ratio={out[name]['ratio']}", file=sys.stderr, flush=True)
    ratios = sorted(v["ratio"] for v in out.values())
    print(
        json.dumps(
            {
                "metric": "guard_ab",
                "sf_dir": SF_DIR,
                "passes": PASSES,
                "ratio_median": ratios[len(ratios) // 2],
                "ratio_max": ratios[-1],
                "queries": out,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
