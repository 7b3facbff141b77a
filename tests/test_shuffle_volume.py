"""Shuffle-VOLUME bound for the downsample family: map-side partial
aggregation must collapse dense points to at most one exchange row per
(group x map partition).  Runs scripts/shuffle_audit.py's controlled
selftest in a subprocess (it needs spark.ui.enabled for the stage-metrics
REST surface, which the shared test session keeps off)."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_downsample_partial_agg_shuffle_bound():
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "shuffle_audit.py"),
         "selftest-downsample"],
        capture_output=True, text=True, timeout=300, env=env, cwd=ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    assert rec["pass"], rec
    # the collapse is real, not borderline: 100k dense points must shuffle
    # as well under a tenth of the point count
    assert rec["shuffle_write_records"] < rec["points"] / 10, rec
