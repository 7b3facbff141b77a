"""HTTP render source (sources/http_render.py) against live local servers.

Two stdlib HTTP servers play the two graphite clusters of the reference's
clusters_diff (cli/clusters_diff.py:48-101); the test drives the full
fetch -> parse -> dissymmetry pipeline over real sockets, plus the parser's
documented edge cases (spaces in targets, null datapoints, bodies that are
empty/unparseable/missing targets).
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from biggraphite_spark.sources.http_render import (
    RenderRequestError,
    cluster_diff_http,
    fetch_render,
    parse_render_json,
    render_url,
)

SERIES_A = [
    {"target": "bg.cpu. u1", "datapoints": [[1.0, 0], [2.0, 60], [None, 120]]},
    {"target": "bg.cpu.u2", "datapoints": [[5.0, 0], [5.0, 60]]},
    {"no_target_key": True},
]
SERIES_B = [
    {"target": "bg.cpu.u1", "datapoints": [[1.0, 0], [4.0, 60], [None, 120]]},
    {"target": "bg.cpu.u2", "datapoints": [[5.0, 0], [5.0, 60]]},
]


def _serve(payload):
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            url = urlparse(self.path)
            assert url.path == "/render/"
            q = parse_qs(url.query)
            assert q["format"] == ["json"] and "target" in q
            self.last_auth = self.headers.get("Authorization")
            Handler.seen_auth = self.headers.get("Authorization")
            body = json.dumps(payload).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, Handler, f"http://127.0.0.1:{srv.server_address[1]}"


def test_parse_render_json_edges():
    # spaces stripped, nulls kept as None, non-target entries skipped
    rows = parse_render_json(json.dumps(SERIES_A))
    assert ("bg.cpu.u1", 0, 1.0) in rows and ("bg.cpu.u1", 120, None) in rows
    assert len({n for n, _, _ in rows}) == 2
    # the reference treats empty/garbage bodies as no data, not an error
    assert parse_render_json(b"") == []
    assert parse_render_json(b"not json") == []


def test_fetch_render_with_auth():
    srv, handler, url = _serve(SERIES_A)
    try:
        rows = fetch_render(url, "bg.cpu.*", start=0, end=180, auth_key="c2VjcmV0")
        assert len(rows) == 5
        assert handler.seen_auth == "Basic c2VjcmV0"
    finally:
        srv.shutdown()
    # dead server -> RenderRequestError, like the reference's RequestError
    with pytest.raises(RenderRequestError):
        fetch_render(url, "bg.cpu.*", timeout_s=1.0)


def test_render_url_shape():
    u = render_url("http://h:1/", "bg.*", 10, 20)
    assert u.startswith("http://h:1/render/?")
    assert "target=bg.%2A" in u or "target=bg.*" in u
    assert "from=10" in u and "until=20" in u


def test_cluster_diff_http_end_to_end(spark):
    sa, _, url_a = _serve(SERIES_A)
    sb, _, url_b = _serve(SERIES_B)
    try:
        out = {
            r["name"]: r
            for r in cluster_diff_http(spark, url_a, url_b, ["bg.cpu.*"]).collect()
        }
    finally:
        sa.shutdown()
        sb.shutdown()
    # u2 identical -> zero gap at every percentile; u1 differs at ts=60
    assert out["bg.cpu.u2"]["p90"] == 0.0
    assert out["bg.cpu.u1"]["p90"] > 0.0
    assert out["bg.cpu.u1"]["n_points"] == 3
