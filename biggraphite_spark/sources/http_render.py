"""HTTP render source: fetch graphite ``/render/?format=json`` series.

The reference's clusters_diff tool reads its two inputs over HTTP from two
live graphite clusters (cli/clusters_diff.py:48-101: urllib request with
optional Basic auth, JSON body of ``[{"target": ..., "datapoints":
[[value, ts], ...]}, ...]``, spaces stripped from targets, unparseable
bodies treated as empty).  This module reproduces that source and lands the
result as a (name, ts, value) DataFrame so the existing
``operators.diff.series_dissymmetry`` join works unchanged on live-cluster
input.

Scale note: render responses are dashboard-sized (one window of one glob),
so the fetch is deliberately driver-side — exactly like the reference —
and the DataFrame is created from the parsed rows.  Bulk point movement
between clusters goes through the PointStore path, never through /render.
"""

from __future__ import annotations

import json
import urllib.request
from urllib.parse import urlencode

from pyspark.sql import DataFrame, SparkSession

RENDER_TIMEOUT_S = 30.0


class RenderRequestError(RuntimeError):
    """HTTP/render fetch failure (reference clusters_diff.RequestError)."""


def render_url(base_url: str, target: str, start: int | None = None,
               end: int | None = None) -> str:
    params = [("target", target), ("format", "json")]
    if start is not None:
        params.append(("from", str(start)))
    if end is not None:
        params.append(("until", str(end)))
    return base_url.rstrip("/") + "/render/?" + urlencode(params)


def parse_render_json(body: bytes | str) -> list[tuple[str, int, float | None]]:
    """Render JSON -> (name, ts, value) rows.

    Mirrors clusters_diff._parse_request_result: empty/unparseable bodies
    yield no rows, entries without a target are skipped, spaces are
    stripped from target names, datapoints are [value, ts] pairs (value
    may be null for empty buckets).
    """
    if not body:
        return []
    try:
        data = json.loads(body)
    except ValueError:
        return []
    rows: list[tuple[str, int, float | None]] = []
    for obj in data:
        if "target" not in obj:
            continue
        name = obj["target"].replace(" ", "")
        for value, ts in obj.get("datapoints", ()):
            rows.append((name, int(ts), None if value is None else float(value)))
    return rows


def fetch_render(base_url: str, target: str, start: int | None = None,
                 end: int | None = None, auth_key: str | None = None,
                 timeout_s: float = RENDER_TIMEOUT_S) -> list[tuple[str, int, float | None]]:
    """One render fetch; Basic auth via ``auth_key`` exactly as the
    reference passes it (pre-encoded credential string)."""
    headers = {}
    if auth_key is not None:
        headers["Authorization"] = "Basic %s" % auth_key
    req = urllib.request.Request(render_url(base_url, target, start, end), headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            return parse_render_json(resp.read())
    except OSError as ex:  # URLError subclasses OSError
        raise RenderRequestError(str(ex)) from ex


def render_points_df(spark: SparkSession, base_url: str, targets: list[str],
                     start: int | None = None, end: int | None = None,
                     auth_key: str | None = None,
                     timeout_s: float = RENDER_TIMEOUT_S) -> DataFrame:
    """Fetch every target from one cluster into a (name, ts, value) frame."""
    rows: list[tuple[str, int, float | None]] = []
    for target in targets:
        rows.extend(fetch_render(base_url, target, start, end, auth_key, timeout_s))
    return spark.createDataFrame(rows, "name string, ts long, value double")


def cluster_diff_http(spark: SparkSession, url_a: str, url_b: str,
                      targets: list[str], start: int | None = None,
                      end: int | None = None, auth_key: str | None = None,
                      percentiles: tuple[float, ...] = (0.5, 0.9)) -> DataFrame:
    """The full clusters_diff read: fetch both clusters over HTTP, compare
    with the existing dissymmetry join (cli/clusters_diff.py:137-247)."""
    from ..operators.diff import series_dissymmetry

    a = render_points_df(spark, url_a, targets, start, end, auth_key)
    b = render_points_df(spark, url_b, targets, start, end, auth_key)
    return series_dissymmetry(a, b, percentiles)
