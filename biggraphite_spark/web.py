"""Minimal REST surface over the catalog: the reference's web API read path.

Mirrors ``cli/web/namespaces/biggraphite.py:57-85`` — GET one metric's
metadata, POST an update — plus a glob-list endpoint (the simplest read of
the bgutil-over-HTTP worker, ``cli/web/namespaces/bgutil.py:116-213``) and
the reference's route shapes:

    GET  /biggraphite/metric/<name>      -> 200 metric JSON | 404
    POST /biggraphite/metric/<name>      -> 204 | 404 unknown | 400 invalid
    GET  /biggraphite/glob?pattern=<g>   -> 200 {"metrics": [...]}

Stdlib ``http.server`` only — the container guarantees no web framework,
and a metadata read path needs none.  State is a single
:class:`CatalogWeb`: GETs run Spark lookups against the current catalog
DataFrame; POST swaps in the next catalog state (the batch-functional
mutation model of :mod:`biggraphite_spark.catalog`), so the server is the
one writer and Spark's thread-safe query path serves concurrent readers.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .model import InvalidArgumentError, MetricMetadata, TooManyMetrics
from .operators.find import glob_metric_names


class CatalogWeb:
    """The app behind the handler: catalog lookups + functional updates."""

    def __init__(self, catalog: DataFrame, now: int):
        self.catalog = catalog
        self.now = now
        self._write_lock = threading.Lock()

    # -- reads -------------------------------------------------------------
    def get_metric(self, name: str) -> dict | None:
        row = self.catalog.filter(F.col("name") == name).first()
        if row is None:
            return None
        fields = set(row.asDict())
        return {
            "id": row["id"],
            "name": row["name"],
            "metadata": {
                "aggregator": row["aggregator"],
                "retention": row["retention"],
                "carbon_xfilesfactor": float(row["xfilesfactor"]),
            },
            "created_on": row["created_on"],
            "updated_on": row["updated_on"],
            "read_on": row["read_on"] if "read_on" in fields else None,
        }

    def glob(self, pattern: str) -> list[str]:
        return glob_metric_names(self.catalog, pattern)

    # -- writes ------------------------------------------------------------
    def update_metric(self, name: str, payload: dict) -> bool:
        """POST semantics: full-metadata update of one existing metric.

        Returns False for an unknown metric (the 404 path); raises
        InvalidArgumentError for a malformed payload (the 400 path).
        Validation goes through the typed MetricMetadata codec, exactly the
        values the reference would accept.
        """
        meta = MetricMetadata.from_string_dict(payload)
        with self._write_lock:
            if self.catalog.filter(F.col("name") == name).first() is None:
                return False
            hit = F.col("name") == name
            out = (
                self.catalog
                .withColumn("aggregator", F.when(hit, meta.aggregator.name)
                            .otherwise(F.col("aggregator")))
                .withColumn("retention", F.when(hit, meta.retention.as_string())
                            .otherwise(F.col("retention")))
                .withColumn("xfilesfactor",
                            F.when(hit, float(meta.carbon_xfilesfactor))
                            .otherwise(F.col("xfilesfactor")))
                .withColumn("updated_on", F.when(hit, F.lit(self.now))
                            .otherwise(F.col("updated_on")))
            )
            self.catalog = out
        return True


class _Handler(BaseHTTPRequestHandler):
    app: CatalogWeb  # set by make_server

    # -- plumbing ----------------------------------------------------------
    def _send(self, code: int, payload=None) -> None:
        body = b"" if payload is None else json.dumps(payload).encode()
        self.send_response(code)
        if body:
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if body:
            self.wfile.write(body)

    def log_message(self, fmt, *args):  # quiet by default; tests capture rc
        pass

    # -- routes ------------------------------------------------------------
    def do_GET(self):
        url = urlparse(self.path)
        parts = [p for p in url.path.split("/") if p]
        try:
            if len(parts) == 3 and parts[0] == "biggraphite" and parts[1] == "metric":
                m = self.app.get_metric(unquote(parts[2]))
                if m is None:
                    return self._send(404, {"message": "metric not found"})
                return self._send(200, m)
            if len(parts) == 2 and parts[0] == "biggraphite" and parts[1] == "glob":
                q = parse_qs(url.query)
                pattern = q.get("pattern", [""])[0]
                return self._send(200, {"metrics": self.app.glob(pattern)})
        except (InvalidArgumentError, TooManyMetrics) as ex:
            return self._send(400, {"message": str(ex)})
        return self._send(404, {"message": "unknown route"})

    def do_POST(self):
        url = urlparse(self.path)
        parts = [p for p in url.path.split("/") if p]
        if not (len(parts) == 3 and parts[0] == "biggraphite" and parts[1] == "metric"):
            return self._send(404, {"message": "unknown route"})
        try:
            n = int(self.headers.get("Content-Length", "0"))
            payload = json.loads(self.rfile.read(n) or b"{}")
            if self.app.update_metric(unquote(parts[2]), payload):
                return self._send(204)
            return self._send(404, {"message": "unknown metric"})
        except (InvalidArgumentError, KeyError, ValueError) as ex:
            return self._send(400, {"message": str(ex)})


def make_server(app: CatalogWeb, port: int = 0) -> ThreadingHTTPServer:
    """Bind a server (port 0 = ephemeral, for tests); caller runs
    serve_forever() — the CLI does so inline, tests in a daemon thread."""
    handler = type("BoundHandler", (_Handler,), {"app": app})
    return ThreadingHTTPServer(("127.0.0.1", port), handler)
