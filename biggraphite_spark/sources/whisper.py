"""Whisper (.wsp) import connector — SURVEY §2.1 S4.

The reference walks a whisper tree with a multiprocessing pool
(cli/import_whisper.py:52-110); here the tree is a ``binaryFile``
DataFrame scan and the parse runs distributed in ``mapInPandas`` — one
Arrow batch of whole files per task, no driver-side I/O.

The on-disk format is public (graphite-project/whisper):

    header:   !2LfL   aggregationType, maxRetention, xFilesFactor, archiveCount
    archive:  !3L     offset, secondsPerPoint, points        (x archiveCount)
    points:   !Ld     timestamp, value                       (per archive slot)

Empty slots carry timestamp 0 and are skipped.  Metric names derive from the
file path relative to the import root (``a/b/c.wsp`` -> ``a.b.c``), exactly
the reference's mapping (import_whisper.py:70-110).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_HEADER = struct.Struct("!2LfL")
_ARCHIVE = struct.Struct("!3L")
_POINT = struct.Struct("!Ld")

#: whisper aggregationType -> our aggregator names (whisper/__init__.py)
AGGREGATION_TYPES = {1: "average", 2: "total", 3: "last", 4: "maximum", 5: "minimum"}


def parse_wsp(content: bytes) -> tuple[dict, list[tuple[str, int, float]]]:
    """Parse one .wsp payload -> (metadata, [(stage_str, ts, value)]).

    metadata: aggregator, xfilesfactor, retention (our Stage string codec).
    """
    agg_type, _max_ret, xff, n_arch = _HEADER.unpack_from(content, 0)
    archives = []
    off = _HEADER.size
    for _ in range(n_arch):
        a_off, spp, pts = _ARCHIVE.unpack_from(content, off)
        archives.append((a_off, spp, pts))
        off += _ARCHIVE.size
    points: list[tuple[str, int, float]] = []
    for a_off, spp, pts in archives:
        stage_str = f"{pts}*{spp}s"
        for i in range(pts):
            ts, value = _POINT.unpack_from(content, a_off + i * _POINT.size)
            if ts != 0:
                points.append((stage_str, ts, value))
    meta = {
        "aggregator": AGGREGATION_TYPES.get(agg_type, "average"),
        "xfilesfactor": float(xff),
        "retention": ":".join(f"{pts}*{spp}s" for _, spp, pts in archives),
    }
    return meta, points


def _name_from_path(path: str, root: str) -> str:
    rel = path.split(root.rstrip("/") + "/", 1)[-1]
    if rel.endswith(".wsp"):
        rel = rel[: -len(".wsp")]
    return rel.strip("/").replace("/", ".")


_POINTS_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("stage", T.StringType()),
        T.StructField("ts", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)

_META_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("aggregator", T.StringType()),
        T.StructField("retention", T.StringType()),
        T.StructField("xfilesfactor", T.DoubleType()),
    ]
)


def _binary_tree(spark: SparkSession, root: str) -> DataFrame:
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wsp")
        .option("recursiveFileLookup", "true")
        .load(root)
    )


def whisper_points(spark: SparkSession, root: str) -> DataFrame:
    """All points of a whisper tree: (name, stage, ts, value)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                name = _name_from_path(path, root)
                _, pts = parse_wsp(bytes(content))
                rows.extend((name, st, ts, v) for st, ts, v in pts)
            yield pd.DataFrame(rows, columns=["name", "stage", "ts", "value"])

    return _binary_tree(spark, root).mapInPandas(parse, _POINTS_SCHEMA)


def whisper_metadata(spark: SparkSession, root: str) -> DataFrame:
    """Catalog rows of a whisper tree: (name, aggregator, retention, xff)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                meta, _ = parse_wsp(bytes(content))
                rows.append(
                    (
                        _name_from_path(path, root),
                        meta["aggregator"],
                        meta["retention"],
                        meta["xfilesfactor"],
                    )
                )
            yield pd.DataFrame(
                rows, columns=["name", "aggregator", "retention", "xfilesfactor"]
            )

    return _binary_tree(spark, root).mapInPandas(parse, _META_SCHEMA)


def make_wsp(archives: list[tuple[int, int]], points_by_archive: list[list[tuple[int, float]]],
             aggregator: str = "average", xff: float = 0.5) -> bytes:
    """Build a .wsp payload (test/fixture helper; also documents the codec).

    ``archives``: [(seconds_per_point, n_points)]; ``points_by_archive``:
    matching [(ts, value)] lists (slot order; missing slots omitted).
    """
    inv_agg = {v: k for k, v in AGGREGATION_TYPES.items()}
    n = len(archives)
    header_size = _HEADER.size + n * _ARCHIVE.size
    offsets = []
    off = header_size
    for spp, pts in archives:
        offsets.append(off)
        off += pts * _POINT.size
    max_ret = max(spp * pts for spp, pts in archives)
    buf = bytearray(off)
    _HEADER.pack_into(buf, 0, inv_agg[aggregator], max_ret, xff, n)
    pos = _HEADER.size
    for (spp, pts), a_off in zip(archives, offsets):
        _ARCHIVE.pack_into(buf, pos, a_off, spp, pts)
        pos += _ARCHIVE.size
    for (spp, pts), a_off, slot_points in zip(archives, offsets, points_by_archive):
        for i, (ts, value) in enumerate(slot_points):
            _POINT.pack_into(buf, a_off + i * _POINT.size, ts, value)
    return bytes(buf)
