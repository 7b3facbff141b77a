"""Graphite events (annotation) store — the ``/events`` API surface.

graphite-web keeps deploy/incident annotations in a Django ``events``
model and serves them at ``POST /events/`` + ``GET /events/get_data``;
dashboards (grafana's graphite annotation source among them) overlay
them on charts.  The reference delegates this to graphite-web (SURVEY
§0); here the store is a parquet directory and the queries are Spark
filters, consistent with :class:`..operators.tags.TagStore`'s
single-writer append design.

Row shape mirrors the graphite model: ``id`` (monotonic), ``when``
(epoch seconds), ``what``, ``data``, ``tags`` (array<string>).  Tag
queries support graphite's two set semantics: ``union`` (any requested
tag present) and ``intersection`` (all present).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCHEMA = "id long, `when` long, what string, data string, tags array<string>"


class EventsStore:
    def __init__(self, spark, path: str):
        self.spark = spark
        self.path = path
        self._write_lock = threading.Lock()

    def _existing(self) -> DataFrame:
        try:
            return self.spark.read.parquet(self.path)
        except Exception:  # first write: empty store
            return self.spark.createDataFrame([], _SCHEMA)

    def add(self, what: str, when: int, tags: list[str],
            data: str = "") -> dict:
        """``POST /events/``: append one annotation; returns the stored
        row (graphite echoes the created event).  The max-id read is one
        driver-bounded aggregate under the write lock — annotation volume
        is human-scale, orders below the points path."""
        with self._write_lock:
            prev = self._existing().agg(F.max("id").alias("m")).first()["m"]
            new_id = (prev or 0) + 1
            row = {
                "id": new_id,
                "when": int(when),
                "what": what,
                "data": data,
                "tags": list(tags),
            }
            self.spark.createDataFrame(
                [(new_id, int(when), what, data, list(tags))], _SCHEMA
            ).write.mode("append").parquet(self.path)
        return row

    def get_data(self, start: int | None = None, end: int | None = None,
                 tags: list[str] | None = None,
                 set_op: str = "intersection") -> DataFrame:
        """``GET /events/get_data``: time-range + tag filter.
        ``set_op='intersection'`` (graphite's default) keeps events
        carrying ALL requested tags; ``'union'`` keeps events carrying
        any.  Pure Column predicates — the when-range prunes at the
        parquet scan."""
        out = self._existing()
        if start is not None:
            out = out.filter(F.col("when") >= int(start))
        if end is not None:
            out = out.filter(F.col("when") <= int(end))
        if tags:
            want = F.array(*[F.lit(t) for t in tags])
            if set_op == "union":
                out = out.filter(F.arrays_overlap("tags", want))
            elif set_op == "intersection":
                out = out.filter(
                    F.forall(want, lambda t: F.array_contains("tags", t))
                )
            else:
                raise ValueError(
                    f"unknown set {set_op!r}; 'union' or 'intersection'"
                )
        return out.orderBy("when", "id")
