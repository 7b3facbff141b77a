"""Graphite ``/render?format=json`` HTTP source — the clusters_diff feed.

The reference's clusters_diff compares two live Graphite clusters by
fetching every target's rendered JSON from both and diffing the point
sets (``cli/clusters_diff.py:48-101`` fetch/parse,
``:468-500`` URL construction: ``http://<host><prefix>/render/?noCache&
format=json&from=<f>&until=<u>&target=<t>``).  Round 1 shipped the diff
math only (:mod:`..operators.diff`); this module adds the missing fetch
side so the diff runs against live endpoints end to end.

Scale shape: one render call returns a dashboard-sized payload, but an
ops sweep diffs THOUSANDS of targets — so the fetch itself is
distributed: the target list becomes a DataFrame and each executor
fetches its slice inside ``mapInPandas`` (stdlib urllib, no driver-side
loop, no collected intermediate).  Fetch errors surface per target as an
``error`` column instead of failing the sweep, mirroring the
reference's per-query error ledger (``HostResult.add_error``).
"""

from __future__ import annotations

import json
from typing import Iterable, Iterator, Sequence
from urllib.parse import quote

from pyspark.sql import DataFrame, SparkSession

#: result schema of :func:`render_source`
RENDER_SCHEMA = "target string, name string, ts long, value double, error string"


def render_url(
    host: str,
    target: str,
    from_param: str,
    until_param: str,
    prefix: str = "",
) -> str:
    """The reference's render URL shape (cli/clusters_diff.py:468-478)."""
    return "http://%s%s/render/?noCache&format=json&from=%s&until=%s&target=%s" % (
        host,
        prefix,
        quote(from_param, safe=""),
        quote(until_param, safe=""),
        quote(target, safe=""),
    )


def parse_render_json(payload: str | bytes) -> list[tuple[str, int, float | None]]:
    """Parse render JSON into (name, ts, value) points.

    Mirrors the reference's tolerant parse (cli/clusters_diff.py:63-85):
    empty / invalid payloads yield no points, objects without ``target``
    are skipped, and target names lose their spaces (clusters format
    targets inconsistently).  Null datapoints are KEPT as null values —
    a present-but-null point is diff information, not absence.
    """
    if not payload:
        return []
    try:
        data = json.loads(payload)
    except ValueError:
        return []
    points: list[tuple[str, int, float | None]] = []
    for obj in data:
        if not isinstance(obj, dict) or "target" not in obj:
            continue
        name = str(obj["target"]).replace(" ", "")
        for val, ts in obj.get("datapoints", ()):
            points.append((name, int(ts), None if val is None else float(val)))
    return points


def _fetch_one(
    host: str,
    target: str,
    from_param: str,
    until_param: str,
    prefix: str,
    timeout_s: float,
    auth_key: str | None,
) -> tuple[list[tuple[str, int, float | None]], str | None]:
    """One HTTP GET -> (points, error).  IOErrors are returned, not raised:
    a 10-minute sweep over 5k targets must not die on one bad endpoint."""
    from urllib.request import Request, urlopen

    url = render_url(host, target, from_param, until_param, prefix)
    headers = {"Authorization": "Basic %s" % auth_key} if auth_key else {}
    try:
        with urlopen(Request(url, None, headers), timeout=timeout_s) as resp:
            return parse_render_json(resp.read()), None
    except OSError as e:  # covers URLError, HTTPError, socket timeouts
        return [], "%s" % e


def render_source(
    spark: SparkSession,
    host: str,
    targets: Sequence[str],
    from_param: str = "-24h",
    until_param: str = "now",
    prefix: str = "",
    timeout_s: float = 5.0,
    auth_key: str | None = None,
    fetch_partitions: int | None = None,
) -> DataFrame:
    """Distributed render fetch: one row per fetched point, plus one
    error row (null name/ts/value) per failed target.

    The target list is parallelized and each executor slice runs its
    fetches inside ``mapInPandas`` — Arrow-batched in, Arrow-batched
    out, HTTP concurrency = partition count (default: one target per
    partition up to the cluster's parallelism, the right unit for
    network-bound work).
    """
    import pandas as pd

    n = fetch_partitions or min(
        max(len(targets), 1), spark.sparkContext.defaultParallelism
    )
    tdf = spark.createDataFrame(
        [(t,) for t in targets], "target string"
    ).repartition(n)

    def fetch(batches: Iterable["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: list[tuple[str, str | None, int | None, float | None, str | None]] = []
            for target in pdf["target"]:
                points, err = _fetch_one(
                    host, target, from_param, until_param, prefix, timeout_s, auth_key
                )
                if err is not None:
                    out.append((target, None, None, None, err))
                for name, ts, value in points:
                    out.append((target, name, ts, value, None))
            yield pd.DataFrame(
                out, columns=["target", "name", "ts", "value", "error"]
            )

    return tdf.mapInPandas(fetch, RENDER_SCHEMA)


def diff_clusters_http(
    spark: SparkSession,
    host_a: str,
    host_b: str,
    targets: Sequence[str],
    from_param: str = "-24h",
    until_param: str = "now",
    prefix: str = "",
    timeout_s: float = 5.0,
    auth_key: str | None = None,
    percentiles: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """End-to-end clusters_diff: fetch every target from both clusters and
    report per-series dissymmetry percentiles (operators/diff.py math,
    reference cli/clusters_diff.py:165-181,231-247)."""
    from ..operators.diff import series_dissymmetry

    common = dict(
        from_param=from_param,
        until_param=until_param,
        prefix=prefix,
        timeout_s=timeout_s,
        auth_key=auth_key,
    )
    a = render_source(spark, host_a, targets, **common).filter("error IS NULL")
    b = render_source(spark, host_b, targets, **common).filter("error IS NULL")
    return series_dissymmetry(
        a.select("name", "ts", "value"),
        b.select("name", "ts", "value"),
        percentiles=percentiles,
    )
