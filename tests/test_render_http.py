"""clusters_diff HTTP fetch path (biggraphite_spark/sources/render_http.py).

Reference surface: cli/clusters_diff.py:48-101 (fetch + tolerant JSON
parse), :468-478 (URL shape).  Drives two live stdlib HTTP servers
standing in for two Graphite clusters; the distributed mapInPandas fetch
runs against them for real, errors and all.
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

# per-"cluster" canned series: target -> [(value, ts), ...]
_SERIES_A = {
    "sys.cpu": [[1.0, 100], [2.0, 160], [None, 220]],
    "sys.mem": [[5.0, 100], [5.0, 160]],
}
_SERIES_B = {
    "sys.cpu": [[1.0, 100], [4.0, 160], [None, 220]],   # one diverging point
    "sys.mem": [[5.0, 100], [5.0, 160]],
}


def _make_server(series, fail_targets=(), garbage_targets=()):
    class Handler(BaseHTTPRequestHandler):
        seen_auth = None

        def log_message(self, *args):
            pass

        def do_GET(self):
            u = urlparse(self.path)
            assert u.path == "/render/"
            Handler.seen_auth = self.headers.get("Authorization")
            q = parse_qs(u.query)
            target = q["target"][0]
            if target in fail_targets:
                self.send_error(500, "boom")
                return
            if target in garbage_targets:
                body = b"not json"
            else:
                # " target " with spaces: parse must strip them
                body = json.dumps(
                    [{"target": " %s " % target, "datapoints": series.get(target, [])}]
                ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, Handler


@pytest.fixture(scope="module")
def cluster_a():
    srv, _ = _make_server(_SERIES_A, fail_targets=("sys.down",), garbage_targets=("sys.bad",))
    yield "127.0.0.1:%d" % srv.server_address[1]
    srv.shutdown()


@pytest.fixture(scope="module")
def cluster_b():
    srv, _ = _make_server(_SERIES_B)
    yield "127.0.0.1:%d" % srv.server_address[1]
    srv.shutdown()


def test_parse_render_json_tolerance():
    from biggraphite_spark.sources.render_http import parse_render_json

    assert parse_render_json("") == []
    assert parse_render_json("not json") == []
    assert parse_render_json('[{"datapoints": [[1, 2]]}]') == []  # no target
    pts = parse_render_json('[{"target": "a b", "datapoints": [[1.5, 10], [null, 20]]}]')
    assert pts == [("ab", 10, 1.5), ("ab", 20, None)]


def test_render_url_shape():
    from biggraphite_spark.sources.render_http import render_url

    url = render_url("h:80", "a.b c", "-24h", "now", prefix="/gr")
    assert url == "http://h:80/gr/render/?noCache&format=json&from=-24h&until=now&target=a.b%20c"


def test_render_source_points_nulls_and_errors(spark, cluster_a):
    from biggraphite_spark.sources.render_http import render_source

    df = render_source(
        spark, cluster_a, ["sys.cpu", "sys.mem", "sys.down", "sys.bad"],
        from_param="100", until_param="220",
    )
    rows = df.collect()
    by_target = {}
    for r in rows:
        by_target.setdefault(r["target"], []).append(r)
    # full series, null point kept as null value
    cpu = sorted((r["ts"], r["value"]) for r in by_target["sys.cpu"])
    assert cpu == [(100, 1.0), (160, 2.0), (220, None)]
    # HTTP 500 -> one error row, sweep survives
    down = by_target["sys.down"]
    assert len(down) == 1 and down[0]["name"] is None and down[0]["error"]
    # garbage JSON -> tolerant parse, no rows at all for that target
    assert "sys.bad" not in by_target


def test_render_source_basic_auth(spark):
    """Basic auth reaches the server as the reference sends it: a
    pre-encoded credential in the Authorization header
    (cli/clusters_diff.py:48-101)."""
    from biggraphite_spark.sources.render_http import render_source

    srv, handler = _make_server(_SERIES_A)
    addr = "127.0.0.1:%d" % srv.server_address[1]
    try:
        rows = render_source(
            spark, addr, ["sys.cpu"],
            from_param="100", until_param="220", auth_key="c2VjcmV0",
        ).collect()
        assert len(rows) == 3
        assert handler.seen_auth == "Basic c2VjcmV0"
    finally:
        srv.shutdown()


def test_diff_clusters_http_end_to_end(spark, cluster_a, cluster_b):
    from biggraphite_spark.sources.render_http import diff_clusters_http

    out = {
        r["name"]: r
        for r in diff_clusters_http(
            spark, cluster_a, cluster_b, ["sys.cpu", "sys.mem"],
            from_param="100", until_param="220",
        ).collect()
    }
    # sys.mem identical -> all gaps 0
    assert out["sys.mem"]["p90"] == 0.0
    # sys.cpu: gaps [0, |2-4|/6, 0 (both null -> joined null==null full-outer
    # matches, point_gap(None,None)=1.0 — both sides present with null value)]
    assert out["sys.cpu"]["n_points"] == 3
    assert out["sys.cpu"]["p90"] > 0.0
