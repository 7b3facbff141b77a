"""Dense time-grid materialization (gap filling).

The reference's Reader scatters fetched points into a dense array of size
``(end-start)/step`` with ``None`` holes (plugins/graphite.py:182-219) —
graphite render output requires every bucket to be present.  SURVEY §2.5 W5:
``sequence`` + ``explode`` + left join.

Scale notes: the grid is generated per matched metric (small set) — a
broadcast of the metric list against a generated sequence, then a left join
with the fetched buckets on (name, ts).  The join is on the same keys as the
fetch aggregation, so with AQE the exchange is reused rather than repeated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dense_series(
    fetched: DataFrame, metrics: DataFrame, start: int, end: int, step: int
) -> DataFrame:
    """Left-join fetched buckets onto the dense grid; holes stay null.

    Output: name, ts, value — exactly ``(end - start) / step`` rows per
    matched metric, sorted consumption left to the caller.
    """
    grid = (
        metrics.select("name")
        .withColumn("ts", F.explode(F.sequence(F.lit(start), F.lit(end - step), F.lit(step))))
    )
    return grid.join(fetched, ["name", "ts"], "left").select("name", "ts", "value")
