"""Contract: every entry query must run under a session the engine did NOT
build — that is exactly the driver's environment (plain
``SparkSession.builder.getOrCreate()``, no legacy confs, default timezone).

Round-2 regression class this pins: code assuming the events ``ts`` column's
physical type (int64 nanos vs TIMESTAMP_NTZ) worked in the engine's own
session but threw ``AnalysisException`` in the driver's.  Runtime
``spark.conf.set`` of parquet legacy confs does not help (Spark 4.1.2
ignores ``nanosAsLong`` entirely), so the only safe pattern is dtype
dispatch — which this test exercises end-to-end in a subprocess that never
imports ``biggraphite_spark.session``.
"""

import subprocess
import sys

import pytest

# one per round-2 failure class + broad representatives of each family:
# - bg_downsample_dupslots: the exact query that crashed the r2 driver bench
# - bg_fetch_1d: read path (catalog join + regroup)
# - events_sessionize: raw-events window query using event_ts_seconds
# - gr_rate_shift: hourly-finals + render-verb composite (this round's family)
# - mm_audio: Arrow mapInPandas chain + JVM HOF features over binary
VANILLA_QUERIES = [
    "bg_downsample_dupslots",
    "bg_fetch_1d",
    "events_sessionize",
    "gr_rate_shift",
    "mm_audio",
    "doc_nb_lang",        # round-3 text/classifier family
    "gr_zscore",          # round-3 name-clustered hourly-finals path
    "emb_rp_recall",      # round-3 literal-matrix projection path
]

_SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

# the driver's session: no engine confs, no legacy parquet flags
spark = SparkSession.builder.master("local[4]").appName("vanilla-contract").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry

qs = entry.queries()
for name in {queries!r}:
    df = qs[name](spark, "/root/testdata/sf0.001")
    n = df.count()
    assert n >= 0, name
    print(f"VANILLA-OK {{name}} rows={{n}}")
print("VANILLA-ALL-OK")
"""


@pytest.mark.slow
def test_entry_queries_under_vanilla_session():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(queries=VANILLA_QUERIES)],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert "VANILLA-ALL-OK" in proc.stdout, (
        f"vanilla-session run failed\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}"
    )
