"""SPARK_GRAFT_REUSE_STORE validity: reuse must be refused when any
selectable layout is missing or the source dataset changed under the store
(same-basename regeneration), and the bucketed external table must be
re-registerable in a session that didn't write it (the reuse-across-
sessions shape — the in-memory catalog forgets saveAsTable registrations).
"""

import os
import shutil
import tempfile

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def store_dir(spark):
    d = tempfile.mkdtemp(prefix="bgspark-store-reuse-")
    yield d
    entry._STAGE1_OVERRIDE.pop(SF, None)
    from biggraphite_spark.storage import PointStore

    spark.sql(
        f"DROP TABLE IF EXISTS {PointStore(d).bucketed_table(entry.STAGE1)}"
    )
    os.environ.pop("SPARK_GRAFT_REUSE_STORE", None)
    shutil.rmtree(d, ignore_errors=True)


@pytest.mark.slow
def test_reuse_respects_fingerprint_and_layouts(spark, store_dir):
    t = entry.materialize_store(spark, SF, base_dir=store_dir, bucketed=True)
    assert "materialize_plain_sec" in t

    os.environ["SPARK_GRAFT_REUSE_STORE"] = "1"
    # valid reuse: both layouts present, fingerprint matches
    t = entry.materialize_store(spark, SF, base_dir=store_dir, bucketed=True)
    assert t.get("materialize_reused") == 1.0

    # a missing bucketed layout must force a rewrite when bucketed=True
    from biggraphite_spark.storage import PointStore

    bucketed_path = PointStore(store_dir).stage_path(entry.STAGE1) + "_bucketed"
    shutil.rmtree(bucketed_path, ignore_errors=True)
    t = entry.materialize_store(spark, SF, base_dir=store_dir, bucketed=True)
    assert "materialize_plain_sec" in t, "missing bucketed layout reused"

    # a changed fingerprint (regenerated source) must force a rewrite
    with open(os.path.join(store_dir, ".source_fingerprint"), "w") as fh:
        fh.write("stale-generation")
    t = entry.materialize_store(spark, SF, base_dir=store_dir, bucketed=True)
    assert "materialize_plain_sec" in t, "stale fingerprint reused"

    # and the rewrite restored a valid fingerprint: reuse works again
    t = entry.materialize_store(spark, SF, base_dir=store_dir, bucketed=True)
    assert t.get("materialize_reused") == 1.0


@pytest.mark.slow
def test_read_bucketed_reregisters_external_table(spark, store_dir):
    from biggraphite_spark.storage import PointStore

    entry.materialize_store(spark, SF, base_dir=store_dir, bucketed=True)
    store = PointStore(store_dir)
    name = store.bucketed_table(entry.STAGE1)
    before = sorted(
        tuple(r) for r in store.read_bucketed(spark, entry.STAGE1).collect()
    )
    assert before

    # simulate a fresh session: drop the catalog entry, keep the files
    spark.sql(f"DROP TABLE {name}")
    assert not spark.catalog.tableExists(name)
    after_df = store.read_bucketed(spark, entry.STAGE1)
    after = sorted(tuple(r) for r in after_df.collect())
    assert after == before
    # the re-registered table still carries the bucket spec: a
    # (name)-keyed aggregation over it plans without an Exchange
    from pyspark.sql import functions as F

    plan = (
        after_df.groupBy("name")
        .agg(F.count("*"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
