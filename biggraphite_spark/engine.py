"""Engine facade: the reference's Accessor/Reader surface, Spark-first.

Mirrors the read lifecycle of SURVEY §3.1/§3.3 (graphite render + ``bgutil
read``): glob -> catalog find -> align_time_window (plan-time stage
selection, the one genuine "optimizer rule" we own, SURVEY §4.1) -> stage
fetch + read-time regroup -> dense grid.

The engine holds the catalog plus one DataFrame per retention stage.  Stage
DataFrames may come straight from the in-memory downsampler
(:func:`operators.downsample.downsample_all`) or from a partitioned points
store (:mod:`storage`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .model import Retention, Stage
from .operators.downsample import downsample_all, with_aggregator
from .operators.fetch import fetch_points
from .operators.find import find_metrics, glob_metric_names
from .operators.gapfill import dense_series


@dataclass
class ReadResult:
    """((start, end, step), dense series) — Reader.fetch shape
    (plugins/graphite.py:182-219)."""

    start: int
    end: int
    step: int
    series: DataFrame  # name, ts, value — dense grid


class Engine:
    def __init__(
        self,
        catalog: DataFrame,
        points0: DataFrame,
        retention: Retention,
        now: int,
        stage_tables: Optional[dict[str, DataFrame]] = None,
    ):
        self.catalog = catalog
        self.points0 = points0
        self.retention = retention
        self.now = now
        if stage_tables is None:
            stage_tables = downsample_all(points0, catalog, list(retention.stages))
        self.stage_tables = stage_tables
        #: read_on sampling (reference drivers/cassandra.py:303,1921-1935,
        #: DEFAULT_READ_ON_SAMPLING_RATE = 0.1): every int(1/rate)-th fetch
        #: refreshes read_on for the metrics it touched — the reference's
        #: deterministic modulo counter, vectorized per fetch CALL (the
        #: set-oriented equivalent of its per-metric loop).  0 disables.
        self.read_on_sampling_rate = 0.1
        self._read_on_counter = 0

    # -- metadata path -----------------------------------------------------
    def find(self, pattern: str) -> DataFrame:
        return find_metrics(self.catalog, pattern)

    def glob_names(self, pattern: str) -> list[str]:
        return glob_metric_names(self.catalog, pattern)

    # -- data path ---------------------------------------------------------
    def stage_df(self, stage: Stage) -> DataFrame:
        if stage.stage0:
            return self.points0
        return self.stage_tables[stage.as_string()]

    def fetch(self, pattern: str, start: int, end: int, stage: Optional[Stage] = None,
              aggregated: bool = True) -> tuple[DataFrame, int, int, Stage]:
        """Aligned fetch for every metric matching ``pattern``.

        Returns (buckets DataFrame, aligned_start, aligned_end, stage); the
        DataFrame has one row per non-empty bucket (sparse — see
        :meth:`read` for the dense render shape).
        """
        metrics = self.find(pattern)
        self._maybe_touch_read_on(metrics)
        if stage is None:
            start, end, stage = self.retention.align_time_window(start, end, self.now)
        else:
            start, end = stage.round_down(start), stage.round_up(end)
        df = fetch_points(
            self.stage_df(stage),
            metrics,
            start,
            end,
            target=stage,
            aggregated=aggregated,
            source_is_raw=stage.stage0,
        )
        return df, start, end, stage

    def _maybe_touch_read_on(self, metrics: DataFrame) -> None:
        """The reference's sampled read_on refresh (``skip = counter % rate
        > 0; counter += 1`` — drivers/cassandra.py:1921-1935), applied to
        the whole matched-metric set of one fetch.  The touched catalog is
        lazily checkpointed so a long-lived server's lineage stays flat
        across many touches."""
        if not self.read_on_sampling_rate:
            return
        rate = int(1 / self.read_on_sampling_rate)
        skip = self._read_on_counter % rate > 0
        self._read_on_counter += 1
        if skip:
            return
        from .catalog import touch_read_on

        self.catalog = touch_read_on(
            self.catalog, metrics.select("name"), self.now
        ).localCheckpoint(eager=False)

    def read(self, pattern: str, start: int, end: int) -> ReadResult:
        """Render-style read: aligned window, dense per-metric series."""
        metrics = self.find(pattern)
        fetched, start, end, stage = self.fetch(pattern, start, end)
        series = dense_series(fetched, metrics, start, end, stage.precision)
        return ReadResult(start=start, end=end, step=stage.precision, series=series)

    def read_names(self, names: list[str], start: int, end: int) -> ReadResult:
        """Render-style read for an explicit (already-resolved) name list —
        the ``seriesByTag`` leaf path, where the TagDB has matched exact
        carbon-encoded names that a glob could not express (``;`` is not
        glob syntax).  Same aligned window + dense grid as :meth:`read`;
        the name set is find-capped upstream, so isin stays a pushed-down
        IN predicate."""
        metrics = self.catalog.filter(F.col("name").isin(list(names)))
        self._maybe_touch_read_on(metrics)
        start, end, stage = self.retention.align_time_window(start, end, self.now)
        fetched = fetch_points(
            self.stage_df(stage),
            metrics,
            start,
            end,
            target=stage,
            aggregated=True,
            source_is_raw=stage.stage0,
        )
        series = dense_series(fetched, metrics, start, end, stage.precision)
        return ReadResult(start=start, end=end, step=stage.precision, series=series)
