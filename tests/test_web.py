"""REST metadata API round-trip (biggraphite_spark/web.py).

Reference surface: cli/web/namespaces/biggraphite.py:57-85 (metric
GET/POST) + the bgutil-over-HTTP glob list.  Drives a live stdlib server
over HTTP exactly as a client would: GET -> POST update -> GET reflects it,
plus the 404/400 error contract.
"""

import json
import threading
import urllib.error
import urllib.request

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def server(spark):
    from biggraphite_spark.sources.events import NOW, load_catalog
    from biggraphite_spark.web import CatalogWeb, make_server

    app = CatalogWeb(load_catalog(spark, SF).cache(), NOW)
    srv = make_server(app, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url) as r:
        return r.status, json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req) as r:
        return r.status


def test_glob_list(server):
    status, body = _get(f"{server}/biggraphite/glob?pattern=bg.click.u*")
    assert status == 200
    names = body["metrics"]
    assert names == sorted(names) and names
    assert all(n.startswith("bg.click.u") for n in names)


def test_metric_get_post_roundtrip(server):
    _, body = _get(f"{server}/biggraphite/glob?pattern=bg.click.u*")
    name = body["metrics"][0]

    status, metric = _get(f"{server}/biggraphite/metric/{name}")
    assert status == 200
    assert metric["name"] == name
    assert set(metric["metadata"]) == {"aggregator", "retention", "carbon_xfilesfactor"}

    new_meta = {
        "aggregator": "maximum",
        "retention": "86400*1s:10080*60s",
        "carbon_xfilesfactor": 0.25,
    }
    assert _post(f"{server}/biggraphite/metric/{name}", new_meta) == 204

    _, after = _get(f"{server}/biggraphite/metric/{name}")
    assert after["metadata"]["aggregator"] == "maximum"
    assert after["metadata"]["retention"] == "86400*1s:10080*60s"
    assert after["metadata"]["carbon_xfilesfactor"] == 0.25
    assert after["updated_on"] >= metric["updated_on"]


def test_error_contract(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/biggraphite/metric/no.such.metric")
    assert e.value.code == 404

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/biggraphite/metric/no.such.metric", {"aggregator": "maximum"})
    assert e.value.code == 404

    # invalid payload on an existing metric -> 400, catalog untouched
    _, body = _get(f"{server}/biggraphite/glob?pattern=bg.view.u*")
    name = body["metrics"][0]
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/biggraphite/metric/{name}", {"aggregator": "p99"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{server}/biggraphite/metric/{name}", {"retention": "banana"})
    assert e.value.code == 400

    # malformed glob -> 400, not a 500
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{server}/biggraphite/glob?pattern=bg.%7Ba,b")
    assert e.value.code == 400
