"""HTTP query service (S8): POST /query -> GeoJSON; parse errors -> 400.

Reference contract: /root/reference/src/web/api.go:26-136 (query in the POST
body, GeoJSON FeatureCollection out, error text in the response body).
"""

import json
import threading
import urllib.error
import urllib.request

import pytest

from simple_osm_queries_ray.pipelines.query import QueryEngine
from simple_osm_queries_ray.server import serve
from simple_osm_queries_ray.sources.repo import build_repo

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def server_url(ray_session):
    srv = serve(QueryEngine(build_repo(SF)), port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def test_query_returns_geojson(server_url):
    body = "bbox(9.85,53.45,10.05,53.65).nodes{lang=en}"
    req = urllib.request.Request(f"{server_url}/query", data=body.encode(), method="POST")
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 200
        fc = json.load(resp)
    assert fc["type"] == "FeatureCollection"
    assert len(fc["features"]) == 50
    f0 = fc["features"][0]
    assert f0["geometry"]["type"] == "Point"
    assert f0["properties"]["lang"] == "en"
    assert f0["properties"]["@osm_type"] == "node"


def test_parse_error_is_400(server_url):
    req = urllib.request.Request(f"{server_url}/query", data=b"bbox(9,53,11)", method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 400
    assert b"position" in ei.value.read()


def test_app_page(server_url):
    with urllib.request.urlopen(f"{server_url}/app") as resp:
        assert resp.status == 200
        html = resp.read()
        assert b"/query" in html
        # the reference web UI's client-side viewport substitution
        assert b"{{bbox}}" in html


def test_multi_statement_union(server_url):
    body = (
        "bbox(9.85,53.45,10.05,53.65).nodes{lang=en}\n"
        "bbox(9.85,53.45,10.05,53.65).nodes{lang=de}"
    )
    req = urllib.request.Request(f"{server_url}/query", data=body.encode(), method="POST")
    with urllib.request.urlopen(req) as resp:
        fc = json.load(resp)
    langs = {f["properties"]["lang"] for f in fc["features"]}
    assert langs == {"en", "de"}


def test_explain_endpoint(server_url):
    import json
    import urllib.request

    req = urllib.request.Request(
        server_url + "/explain",
        data=b"bbox(9.85,53.45,10.05,53.65).nodes{lang=de}",
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        plan = json.loads(r.read())
    assert plan[0]["object_type"] == "node"
    assert plan[0]["required_keys"] == ["lang"]
    assert plan[0]["n_candidate_cells"] > 0


def test_stats_and_healthz(server_url):
    import json
    import urllib.request

    with urllib.request.urlopen(f"{server_url}/healthz") as r:
        assert json.loads(r.read())["status"] == "ok"
    with urllib.request.urlopen(f"{server_url}/stats") as r:
        stats = json.loads(r.read())
    assert stats["nodes"] > 0 and stats["tag_keys"] > 0
    # cached second call returns identical payload
    with urllib.request.urlopen(f"{server_url}/stats") as r:
        assert json.loads(r.read()) == stats
