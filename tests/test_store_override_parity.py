"""Value parity of the three stage-1 read paths the contract queries run on.

The correctness gate runs queries recomputing the 1h stage from raw events;
the driver bench runs the SAME queries against a materialized PointStore
(``__spark_entry__.materialize_store`` swaps ``_stage1`` via
``_STAGE1_OVERRIDE``), in plain or name-bucketed layout.  If the override
path ever diverged in VALUES (not just speed), the bench would be timing a
different computation than the one the oracle certified.  This pins all
three paths to identical rows for representative queries.
"""

import os
import shutil
import tempfile

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"
QUERIES = ["bg_fetch_1d", "bg_downsample_1d", "gr_summarize_ffill"]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def override_cleanup(spark):
    d = tempfile.mkdtemp(prefix="bgspark-store-parity-")
    yield d
    entry._STAGE1_OVERRIDE.pop(SF, None)
    from biggraphite_spark.storage import PointStore

    spark.sql(
        f"DROP TABLE IF EXISTS {PointStore(d).bucketed_table(entry.STAGE1)}"
    )
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.slow
def test_store_override_paths_value_identical(spark, override_cleanup):
    raw = {q: _rows(entry._QUERIES[q](spark, SF)) for q in QUERIES}
    assert all(raw[q] for q in QUERIES)  # non-trivial inputs

    entry.materialize_store(spark, SF, base_dir=override_cleanup, bucketed=True)
    for mode in ("plain", "bucketed"):
        os.environ["SPARK_GRAFT_STORE_MODE"] = mode
        try:
            # re-materialize flips which layout serves reads
            entry.materialize_store(
                spark, SF, base_dir=override_cleanup, bucketed=True
            )
            assert entry._STAGE1_OVERRIDE.get(SF) is not None
            for q in QUERIES:
                got = _rows(entry._QUERIES[q](spark, SF))
                assert got == raw[q], f"{q} diverged under {mode} store reads"
        finally:
            os.environ.pop("SPARK_GRAFT_STORE_MODE", None)
    # cleanup fixture drops the override so later tests recompute from raw
