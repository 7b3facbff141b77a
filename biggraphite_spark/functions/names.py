"""Column-expression builders for metric-name structure.

The reference materializes name components as indexed columns
(``component_0..component_63`` in Cassandra, drivers/cassandra.py:656-733;
``p0..p63`` in Elasticsearch, drivers/elasticsearch.py:202-221) so globs can
be answered by per-component index predicates.  We do the same with plain
catalog columns ``p0..pN`` + ``depth`` + ``parent`` — Catalyst then pushes
equality/prefix predicates on them into Parquet row-group statistics, which
is the Spark-native replacement for the SASI/Lucene/ES indexes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..model import COMPONENTS_MAX_LEN


def components_col(name_col: Column) -> Column:
    """Split a name into its non-empty dot components.

    Reference semantics: metric.py:181-194 (empty components dropped).
    """
    return F.filter(F.split(name_col, r"\."), lambda x: x != F.lit(""))


def with_name_structure(
    df: DataFrame, name_col: str = "name", n_components: int = COMPONENTS_MAX_LEN
) -> DataFrame:
    """Add ``p0..p{n-1}``, ``depth`` and ``parent`` columns derived from a name.

    - ``p{i}``: i-th component, null past the end (ES ``p0..p63`` analogue)
    - ``depth``: n_components - 1 (drivers/elasticsearch.py:208,319-320)
    - ``parent``: name minus last component, '' at top level
      (drivers/cassandra.py:1969,2054)
    """
    parts = components_col(F.col(name_col))
    df = df.withColumn("_parts", parts)
    cols = [
        # try_element_at: null past the array end (ANSI mode makes plain
        # element_at throw), matching the null-padded p0..pN catalog shape
        F.try_element_at(F.col("_parts"), F.lit(i + 1)).alias(f"p{i}")
        for i in range(n_components)
    ]
    df = df.select(
        "*",
        *cols,
        (F.size("_parts") - F.lit(1)).alias("depth"),
        F.array_join(F.slice(F.col("_parts"), 1, F.greatest(F.size("_parts") - 1, F.lit(0))), ".").alias(
            "parent"
        ),
    )
    return df.drop("_parts")


def sanitize_name_col(name_col: Column) -> Column:
    """Re-join non-empty components (reference sanitize, metric.py:181-194)."""
    return F.array_join(components_col(name_col), ".")


def metric_id_col(name_col: Column) -> Column:
    """Deterministic metric id as a column.

    The reference derives uuid5(name) (metric.py:157-178); the property that
    matters is a stable collision-resistant id derived only from the name, so
    the engine uses sha2-256 hex (JVM-side, codegen-friendly, and
    reproducible in any oracle SQL engine).
    """
    return F.sha2(name_col, 256)
