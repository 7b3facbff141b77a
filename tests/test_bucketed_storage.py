"""Name-bucketed PointStore layout: correctness + the shuffle-elimination
claim (PERF.md's scale experiment) checked against the physical plan."""

import pytest
from pyspark.sql import functions as F

from biggraphite_spark.model import Stage
from biggraphite_spark.storage import PointStore

STAGE1 = Stage.from_string("1000*3600s")


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def stores(spark, tmp_path):
    rows = [
        (f"m{m}", day * 86400 + h * 3600, float(m * 100 + day))
        for m in range(8)
        for day in range(3)
        for h in range(0, 24, 6)
    ]
    df = spark.createDataFrame(rows, "name string, ts long, value double")
    store = PointStore(str(tmp_path / "store"))
    store.write(df, STAGE1)
    store.write_bucketed(df, STAGE1, n_buckets=4)
    yield spark, store, df
    spark.sql(f"DROP TABLE IF EXISTS {store.bucketed_table(STAGE1)}")


def _rollup(df):
    bucket = (F.col("ts") - (F.col("ts") % F.lit(86400))).alias("ts")
    return df.groupBy("name", bucket).agg(F.sum("value").alias("value"))


def test_bucketed_roundtrip_matches_plain(stores):
    spark, store, df = stores
    plain = _rollup(store.read(spark, STAGE1)).collect()
    bucketed = _rollup(store.read_bucketed(spark, STAGE1)).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, bucketed))
    assert len(plain) == 8 * 3


def test_bucketed_rollup_needs_no_exchange(stores):
    spark, store, _ = stores
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plain_plan = _physical_plan(_rollup(store.read(spark, STAGE1)))
        bucketed_plan = _physical_plan(_rollup(store.read_bucketed(spark, STAGE1)))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    # the plain layout shuffles on (name, bucket); the name-bucketed scan's
    # HashPartitioning(name) already clusters every group key
    assert "Exchange" in plain_plan
    assert "Exchange" not in bucketed_plan
    assert "Bucketed: true" in bucketed_plan


def test_bucketed_day_pruning_survives(stores):
    spark, store, _ = stores
    fetched = store.read_bucketed(spark, STAGE1).filter(
        PointStore.time_filter(86400, 2 * 86400)
    )
    days = {r["pday"] for r in fetched.select("pday").distinct().collect()}
    assert days == {1}
    files = fetched.select(F.input_file_name()).distinct().collect()
    touched = {f[0].split("pday=")[1].split("/")[0] for f in files}
    assert touched == {"1"}
