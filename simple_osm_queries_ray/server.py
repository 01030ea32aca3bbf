"""HTTP query service (reference S8, ``/root/reference/src/web/api.go:26-136``).

``POST /query`` with the soq query string as the request body returns a
GeoJSON FeatureCollection; parse errors return 400 with the message (the
reference returns 500 there — we keep its body-text contract but use the
correct status class). ``GET /app`` serves a minimal map page listing the
endpoint (the reference ships a Leaflet UI; shipping a JS bundle is out of
scope — the API contract is the parity surface).

The server is a thin driver-side wrapper: each request parses the query,
compiles it to the Ray Data plan against the shared repo, and streams the
result batches into the response. Heavy lifting happens in the cluster; the
handler thread only serializes. Stdlib ThreadingHTTPServer — requests execute
Ray Data pipelines concurrently (Ray's driver API is thread-safe).
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .model import QUERY_TYPE_TO_OBJECT_TYPE
from .parser import ParseError, parse_query
from .pipelines.query import QueryEngine
from .sources.geojson import iter_features

_APP_HTML = b"""<!doctype html>
<html><head><title>simple-osm-queries-ray</title></head>
<body><h1>simple-osm-queries-ray</h1>
<p>POST a soq query string to <code>/query</code> to receive GeoJSON.</p>
<form onsubmit="fetch('/query',{method:'POST',body:q.value}).then(r=>r.text())
.then(t=>{out.textContent=t});return false">
<textarea id="q" rows="4" cols="80">bbox(9.0,53.0,11.0,55.0).nodes{lang=de}</textarea>
<br><button>Run</button></form><pre id="out"></pre></body></html>"""


def make_handler(engine: QueryEngine):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def do_GET(self):
            if self.path.rstrip("/") in ("", "/app"):
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.end_headers()
                self.wfile.write(_APP_HTML)
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self):
            if self.path != "/query":
                self.send_response(404)
                self.end_headers()
                return
            length = int(self.headers.get("Content-Length", "0"))
            text = self.rfile.read(length).decode("utf-8")
            try:
                query = parse_query(text, engine.repo.tag_index)
            except ParseError as e:
                self.send_response(400)
                self.send_header("Content-Type", "text/plain; charset=utf-8")
                self.end_headers()
                self.wfile.write(str(e).encode())
                return
            try:
                self.send_response(200)
                self.send_header("Content-Type", "application/geo+json")
                self.end_headers()
                self.wfile.write(b'{"type":"FeatureCollection","features":[')
                first = True
                for stmt in query.statements:
                    ds = engine.execute_statement(stmt, project=False)
                    otype = QUERY_TYPE_TO_OBJECT_TYPE[stmt.query_type]
                    for feat in iter_features(ds, engine.repo.tag_index, otype):
                        if not first:
                            self.wfile.write(b",")
                        self.wfile.write(json.dumps(feat).encode())
                        first = False
                self.wfile.write(b"]}")
            except BrokenPipeError:
                pass

    return Handler


def serve(engine: QueryEngine, host: str = "127.0.0.1", port: int = 8080) -> ThreadingHTTPServer:
    """Create (but don't start) the server; call ``serve_forever()`` to run."""
    return ThreadingHTTPServer((host, port), make_handler(engine))
