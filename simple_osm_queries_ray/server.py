"""HTTP query service (reference S8, ``/root/reference/src/web/api.go:26-136``).

``POST /query`` with the soq query string as the request body returns a
GeoJSON FeatureCollection; parse errors return 400 with the message (the
reference returns 500 there — we keep its body-text contract but use the
correct status class). ``GET /app`` serves an interactive map UI: query box,
canvas map with pan/zoom/graticule, Point/Polygon rendering and
click-to-inspect properties — the reference's Leaflet page
(``src/web/index.html``) re-done dependency-free (no CDN in this sandbox).

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
<html><head><title>simple-osm-queries-ray</title><meta charset="utf-8">
<style>
 body{margin:0;font:13px sans-serif;display:flex;flex-direction:column;height:100vh}
 #bar{padding:6px;background:#f4f4f4;border-bottom:1px solid #ccc;display:flex;gap:6px}
 #q{flex:1;font:12px monospace;resize:vertical}
 #map{flex:1;cursor:grab;background:#eaf2f8}
 #status{padding:3px 8px;background:#f4f4f4;border-top:1px solid #ccc;white-space:pre;overflow:auto;max-height:9em}
</style></head><body>
<div id="bar"><textarea id="q" rows="2">bbox(9.0,53.0,11.0,55.0).nodes{lang=de AND this.ways{wtype=primary}}</textarea>
<button id="run">Run</button><button id="fit">Fit</button></div>
<canvas id="map"></canvas><div id="status">POST /query; drag to pan, wheel to zoom, click a feature for its tags.</div>
<script>
'use strict';
const cv=document.getElementById('map'),ctx=cv.getContext('2d'),st=document.getElementById('status');
let feats=[],view={lon:10,lat:54,scale:200},drag=null;
function resize(){cv.width=cv.clientWidth;cv.height=cv.clientHeight;draw();}
window.addEventListener('resize',resize);
function px(lon,lat){return[(lon-view.lon)*view.scale+cv.width/2,(view.lat-lat)*view.scale+cv.height/2];}
function geo(x,y){return[(x-cv.width/2)/view.scale+view.lon,view.lat-(y-cv.height/2)/view.scale];}
function draw(){
 ctx.clearRect(0,0,cv.width,cv.height);
 ctx.strokeStyle='#c8d8e8';ctx.fillStyle='#8aa';ctx.font='10px sans-serif';
 const[w0,n0]=geo(0,0),[e0,s0]=geo(cv.width,cv.height);
 const step=Math.pow(10,Math.ceil(Math.log10(180/view.scale*40)));
 for(let lon=Math.floor(w0/step)*step;lon<=e0;lon+=step){const[x]=px(lon,0);
  ctx.beginPath();ctx.moveTo(x,0);ctx.lineTo(x,cv.height);ctx.stroke();ctx.fillText(lon.toFixed(4),x+2,10);}
 for(let lat=Math.floor(s0/step)*step;lat<=n0;lat+=step){const[,y]=px(0,lat);
  ctx.beginPath();ctx.moveTo(0,y);ctx.lineTo(cv.width,y);ctx.stroke();ctx.fillText(lat.toFixed(4),2,y-2);}
 for(const f of feats){const g=f.geometry;
  if(g.type==='Point'){const[x,y]=px(g.coordinates[0],g.coordinates[1]);
   ctx.fillStyle='#d9534f';ctx.beginPath();ctx.arc(x,y,3,0,7);ctx.fill();}
  else if(g.type==='Polygon'){ctx.strokeStyle='#2a6496';ctx.fillStyle='rgba(42,100,150,.15)';
   ctx.beginPath();g.coordinates[0].forEach((c,i)=>{const[x,y]=px(c[0],c[1]);i?ctx.lineTo(x,y):ctx.moveTo(x,y);});
   ctx.closePath();ctx.fill();ctx.stroke();}
  else if(g.type==='LineString'){ctx.strokeStyle='#2a6496';
   ctx.beginPath();g.coordinates.forEach((c,i)=>{const[x,y]=px(c[0],c[1]);i?ctx.lineTo(x,y):ctx.moveTo(x,y);});ctx.stroke();}}}
function flatPairs(a){return Array.isArray(a[0])?a.flatMap(flatPairs):[a];}
function bounds(){let b=null;for(const f of feats){const cs=flatPairs(f.geometry.coordinates);
 for(const c of cs){if(!b)b=[c[0],c[1],c[0],c[1]];else{b[0]=Math.min(b[0],c[0]);b[1]=Math.min(b[1],c[1]);b[2]=Math.max(b[2],c[0]);b[3]=Math.max(b[3],c[1]);}}}return b;}
function fit(){const b=bounds();if(!b)return;view.lon=(b[0]+b[2])/2;view.lat=(b[1]+b[3])/2;
 view.scale=Math.min(cv.width/Math.max(b[2]-b[0],1e-4),cv.height/Math.max(b[3]-b[1],1e-4))*0.9;draw();}
document.getElementById('run').onclick=async()=>{st.textContent='running...';
 let qq=document.getElementById('q').value;
 // {{bbox}} placeholder -> current viewport (minlon,minlat,maxlon,maxlat),
 // the reference web UI's client substitution (src/web/index.html:363-372)
 if(qq.indexOf('{{bbox}}')>=0){
  const[w0,n0]=geo(0,0),[e0,s0]=geo(cv.width,cv.height);
  qq=qq.replace('{{bbox}}',[w0.toFixed(5),s0.toFixed(5),e0.toFixed(5),n0.toFixed(5)].join(','));}
 const r=await fetch('/query',{method:'POST',body:qq});
 const t=await r.text();
 if(!r.ok){st.textContent='error: '+t;return;}
 feats=JSON.parse(t).features;st.textContent=feats.length+' features';fit();};
document.getElementById('fit').onclick=fit;
cv.addEventListener('mousedown',e=>{drag=[e.clientX,e.clientY];cv.style.cursor='grabbing';});
window.addEventListener('mouseup',()=>{drag=null;cv.style.cursor='grab';});
window.addEventListener('mousemove',e=>{if(!drag)return;
 view.lon-=(e.clientX-drag[0])/view.scale;view.lat+=(e.clientY-drag[1])/view.scale;
 drag=[e.clientX,e.clientY];draw();});
cv.addEventListener('wheel',e=>{e.preventDefault();const[glon,glat]=geo(e.offsetX,e.offsetY);
 view.scale*=e.deltaY<0?1.25:0.8;
 view.lon=glon-(e.offsetX-cv.width/2)/view.scale;view.lat=glat+(e.offsetY-cv.height/2)/view.scale;draw();},{passive:false});
cv.addEventListener('click',e=>{if(drag)return;let best=null,bd=64;
 for(const f of feats){if(f.geometry.type!=='Point')continue;
  const[x,y]=px(f.geometry.coordinates[0],f.geometry.coordinates[1]);
  const d=(x-e.offsetX)**2+(y-e.offsetY)**2;if(d<bd){bd=d;best=f;}}
 if(best)st.textContent=JSON.stringify(best.properties,null,1);});
resize();
</script></body></html>"""


def make_handler(engine: QueryEngine):
    import threading

    _stats_lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def do_GET(self):
            if self.path.rstrip("/") in ("", "/app"):
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.end_headers()
                self.wfile.write(_APP_HTML)
            elif self.path.rstrip("/") == "/healthz":
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(b'{"status":"ok"}')
            elif self.path.rstrip("/") == "/stats":
                # feature counts are cached after the first call — counting a
                # Dataset is cheap (metadata) but not free under load. The
                # lock serializes the first computation under the threading
                # server, and repo.table() works for BOTH repo kinds (a
                # DiskRepo has no .nodes/.ways/.relations attributes)
                with _stats_lock:
                    if not hasattr(engine, "_stats_cache"):
                        ti = engine.repo.tag_index
                        engine._stats_cache = json.dumps(
                            {
                                "nodes": engine.repo.table("node").count(),
                                "ways": engine.repo.table("way").count(),
                                "relations": engine.repo.table("relation").count(),
                                "tag_keys": len(ti.keys),
                                "tag_values": int(sum(len(v) for v in ti.values)),
                            }
                        ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(engine._stats_cache)
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self):
            if self.path not in ("/query", "/explain"):
                self.send_response(404)
                self.end_headers()
                return
            length = int(self.headers.get("Content-Length", "0"))
            text = self.rfile.read(length).decode("utf-8")
            if self.path == "/explain":
                try:
                    plan = engine.explain_string(text)
                except ValueError as e:  # LexError/ParseError/planner errors
                    self.send_response(400)
                    self.send_header("Content-Type", "text/plain; charset=utf-8")
                    self.end_headers()
                    self.wfile.write(str(e).encode())
                    return
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps(plan).encode())
                return
            try:
                # parse AND compile before sending any status: LexError,
                # ParseError and the planner's ValueErrors (bbox-required,
                # membership gating) must all yield a clean 400 — once 200
                # + headers are out, an error can only truncate the stream
                query = parse_query(text, engine.repo.tag_index)
                if not query.statements:
                    raise ValueError(
                        "query contains no statements (empty or comment-only input)"
                    )
                compiled = [
                    (
                        engine.execute_statement(stmt, project=False),
                        QUERY_TYPE_TO_OBJECT_TYPE[stmt.query_type],
                    )
                    for stmt in query.statements
                ]
            except ValueError as e:
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
                for ds, otype in compiled:
                    for feat in iter_features(ds, engine.repo.tag_index, otype):
                        if not first:
                            self.wfile.write(b",")
                        self.wfile.write(json.dumps(feat).encode())
                        first = False
                self.wfile.write(b"]}")
            except (BrokenPipeError, ConnectionResetError):
                pass  # client hung up mid-stream

    return Handler


def serve(engine: QueryEngine, host: str = "127.0.0.1", port: int = 8080) -> ThreadingHTTPServer:
    """Create (but don't start) the server; call ``serve_forever()`` to run."""
    return ThreadingHTTPServer((host, port), make_handler(engine))
