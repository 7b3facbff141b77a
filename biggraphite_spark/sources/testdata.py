"""Loaders for the driver-provided synthetic tables (TESTDATA.md)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def sf_dir_from_env() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_parallel(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a table repartitioned to the session's core count.

    The synthetic tables are single parquet files, so a bare scan yields ONE
    input partition and every downstream per-row stage (shingle explosion,
    hashing, mapInPandas) runs on one core.  A round-robin repartition costs
    one tiny shuffle of the raw rows and buys full parallelism — on a real
    lake with many files/splits this is a no-op to remove, which is why it
    lives here (local-layout concern) and not inside the operators.
    """
    df = load_table(spark, sf_dir, name)
    return df.repartition(spark.sparkContext.defaultParallelism)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL entry points."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
