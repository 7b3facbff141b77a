"""Unit semantics for maintenance/diff operators on tiny in-memory frames."""

import pytest
from pyspark.sql import functions as F

from biggraphite_spark.operators.diff import merge_with_cache, series_dissymmetry
from biggraphite_spark.operators.maintenance import (
    directories_from_names,
    empty_directories,
    missing_parent_metrics,
    orphan_metrics,
    retention_points_col,
)


@pytest.fixture(scope="module")
def catalog(spark):
    rows = [("a.b.c", 100), ("a.b.d", 200), ("a.x", 50), ("q", 10)]
    df = spark.createDataFrame(rows, "name string, updated_on long")
    return df.withColumn(
        "parent", F.expr("array_join(slice(split(name, '\\\\.'), 1, size(split(name, '\\\\.')) - 1), '.')")
    )


def test_directories_from_names(catalog, spark):
    dirs = {r["directory"] for r in directories_from_names(catalog).collect()}
    assert dirs == {"a", "a.b"}  # 'q' is top-level: no proper prefix


def test_empty_directories(catalog):
    live = catalog.filter(F.col("updated_on") >= 100)  # a.b.c, a.b.d survive
    empty = {r["directory"] for r in empty_directories(catalog, live).collect()}
    assert empty == set()  # 'a' still has live children via a.b.*
    live2 = catalog.filter(F.col("name") == "a.x")
    empty2 = {r["directory"] for r in empty_directories(catalog, live2).collect()}
    assert empty2 == {"a.b"}


def test_missing_parent_and_orphans(catalog, spark):
    dirs = directories_from_names(catalog).filter(F.col("directory") != "a.b")
    missing = {r["name"] for r in missing_parent_metrics(catalog, dirs).collect()}
    # metrics under a.b lost their parent; top-level 'q' has parent '' which
    # never exists in the directories view -> also flagged (reference treats
    # root as implicit; callers filter depth>0), so restrict:
    assert {"a.b.c", "a.b.d"} <= missing
    metadata = catalog.filter(F.col("name") != "a.x")
    orphans = {r["name"] for r in orphan_metrics(catalog, metadata).collect()}
    assert orphans == {"a.x"}


def test_retention_points_col(spark):
    df = spark.createDataFrame([("86400*1s:10080*60s",)], "retention string")
    got = df.select(retention_points_col(F.col("retention")).alias("p")).first()["p"]
    assert got == 86400 + 10080


def test_merge_with_cache_cache_wins(spark):
    db = spark.createDataFrame([("m", 0, 1.0), ("m", 60, 2.0)], "name string, ts long, value double")
    cache = spark.createDataFrame([("m", 60, 9.0), ("m", 120, 3.0)], "name string, ts long, value double")
    rows = {(r["ts"]): (r["value"], r["source"]) for r in merge_with_cache(db, cache).collect()}
    assert rows == {0: (1.0, "db"), 60: (9.0, "cache"), 120: (3.0, "cache")}


def test_dissymmetry_gaps(spark):
    a = spark.createDataFrame([("m", 0, 1.0), ("m", 60, 0.0), ("m", 120, 5.0)],
                              "name string, ts long, value double")
    b = spark.createDataFrame([("m", 0, 1.0), ("m", 60, 0.0)],
                              "name string, ts long, value double")
    row = series_dissymmetry(a, b).first()
    # gaps: identical -> 0, zero-and-zero -> 0, one-side-only -> 1
    assert row["n_points"] == 3
    assert row["p90"] > 0.5  # the missing point dominates the tail
