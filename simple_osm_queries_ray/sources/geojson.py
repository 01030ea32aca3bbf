"""GeoJSON FeatureCollection sink (reference S7, ``src/index/io.go:13-76``).

Decodes dictionary tags back to string properties, adds ``@osm_id`` /
``@osm_type``, and emits nodes as Points, ways as LineStrings over their
inlined member coordinates (reference ``src/index/grid_reader.go:394-404``;
bbox-Polygon fallback when a projected result carries only bounds) and
relations as bbox Polygons (the reference's relation geometry is also
bbox-only, ``src/index/grid_reader.go:513-517``). Small results stream
driver-side into one file; large results should use ``write_json`` shards
instead.
"""

from __future__ import annotations

import json

import numpy as np
import ray.data

from ..functions.tags import TagIndex
from ..model import OSM_NODE, OSM_WAY
from ..stages.tag_encode import decode_tags_to_strings


def iter_features(
    ds: ray.data.Dataset, tag_index: TagIndex, object_type: str
):
    """Yield GeoJSON feature dicts for a query result (streamed per batch)."""
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        has_tags = "tag_keys" in batch.column_names
        props_list = (
            decode_tags_to_strings(batch, tag_index) if has_tags else [{}] * len(batch)
        )
        ids = np.asarray(batch["id"], dtype=np.int64)
        for i in range(len(batch)):
            props = dict(props_list[i])
            props["@osm_id"] = int(ids[i])
            props["@osm_type"] = object_type
            if object_type == OSM_NODE:
                geom = {
                    "type": "Point",
                    "coordinates": [
                        float(batch["lon"][i].as_py()),
                        float(batch["lat"][i].as_py()),
                    ],
                }
            elif object_type == OSM_WAY and "node_lons" in batch.column_names:
                lons = batch["node_lons"][i].as_py()
                lats = batch["node_lats"][i].as_py()
                geom = {
                    "type": "LineString",
                    "coordinates": [[float(x), float(y)] for x, y in zip(lons, lats)],
                }
            else:
                x0 = float(batch["minlon"][i].as_py())
                y0 = float(batch["minlat"][i].as_py())
                x1 = float(batch["maxlon"][i].as_py())
                y1 = float(batch["maxlat"][i].as_py())
                geom = {
                    "type": "Polygon",
                    "coordinates": [[[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]],
                }
            yield {"type": "Feature", "geometry": geom, "properties": props}


def write_geojson(
    ds: ray.data.Dataset,
    path: str,
    tag_index: TagIndex,
    object_type: str,
) -> int:
    n = 0
    with open(path, "w", encoding="utf-8") as f:
        f.write('{"type":"FeatureCollection","features":[')
        first = True
        for feat in iter_features(ds, tag_index, object_type):
            if not first:
                f.write(",")
            f.write(json.dumps(feat))
            first = False
            n += 1
        f.write("]}")
    return n


def read_geojson(path: str, *, parallelism: int = 8) -> ray.data.Dataset:
    """GeoJSON FeatureCollection source: the inverse of :func:`write_geojson`.

    Parses the file's feature array driver-side into line-delimited shards
    (GeoJSON is one JSON document, so the split is a driver parse — fine for
    query-result-sized files; corpus-scale inputs should be NDJSON and go
    through ``ray.data.read_json``), then decodes feature dicts into the
    engine's unified columnar layout in parallel ``map_batches`` tasks:
    Points -> (id, lon, lat, tag strings), LineStrings -> (id, node_lons,
    node_lats, bbox, tag strings). ``@osm_id`` / ``@osm_type`` round-trip.
    """
    with open(path, encoding="utf-8") as f:
        doc = json.load(f)
    feats = doc.get("features", [])
    if not feats:
        return ray.data.from_items([])

    def decode(batch) -> "ray.data.Dataset":
        import pyarrow as pa

        rows = batch["feature"].to_pylist()
        out = {
            "id": [], "otype": [], "lon": [], "lat": [],
            "node_lons": [], "node_lats": [],
            "minlon": [], "minlat": [], "maxlon": [], "maxlat": [],
            "tag_keys_str": [], "tag_vals_str": [],
        }
        for fs in rows:
            feat = json.loads(fs)
            props = feat.get("properties", {})
            geom = feat.get("geometry", {})
            out["id"].append(int(props.get("@osm_id", -1)))
            out["otype"].append(props.get("@osm_type", ""))
            tags = {k: v for k, v in props.items() if not k.startswith("@")}
            out["tag_keys_str"].append(list(tags.keys()))
            out["tag_vals_str"].append([str(v) for v in tags.values()])
            if geom.get("type") == "Point":
                # RFC 7946 allows a third (altitude) element — take lon/lat
                x, y = geom["coordinates"][:2]
                out["lon"].append(float(x)); out["lat"].append(float(y))
                out["node_lons"].append(None); out["node_lats"].append(None)
                out["minlon"].append(float(x)); out["minlat"].append(float(y))
                out["maxlon"].append(float(x)); out["maxlat"].append(float(y))
            else:
                coords = geom.get("coordinates", [])
                gtype = geom.get("type")
                if gtype == "Polygon":
                    coords = coords[0] if coords else []
                elif gtype == "MultiLineString":
                    coords = [c for part in coords for c in part]
                elif gtype == "MultiPolygon":
                    # outer rings of every polygon, concatenated
                    coords = [c for poly in coords for c in (poly[0] if poly else [])]
                elif gtype == "MultiPoint":
                    pass  # already a flat list of positions
                xs = [float(c[0]) for c in coords]
                ys = [float(c[1]) for c in coords]
                out["lon"].append(None); out["lat"].append(None)
                out["node_lons"].append(xs); out["node_lats"].append(ys)
                out["minlon"].append(min(xs) if xs else None)
                out["minlat"].append(min(ys) if ys else None)
                out["maxlon"].append(max(xs) if xs else None)
                out["maxlat"].append(max(ys) if ys else None)
        lf = pa.list_(pa.float64())
        ls = pa.list_(pa.string())
        return pa.table(
            {
                "id": pa.array(out["id"], type=pa.int64()),
                "otype": pa.array(out["otype"], type=pa.string()),
                "lon": pa.array(out["lon"], type=pa.float64()),
                "lat": pa.array(out["lat"], type=pa.float64()),
                "node_lons": pa.array(out["node_lons"], type=lf),
                "node_lats": pa.array(out["node_lats"], type=lf),
                "minlon": pa.array(out["minlon"], type=pa.float64()),
                "minlat": pa.array(out["minlat"], type=pa.float64()),
                "maxlon": pa.array(out["maxlon"], type=pa.float64()),
                "maxlat": pa.array(out["maxlat"], type=pa.float64()),
                "tag_keys_str": pa.array(out["tag_keys_str"], type=ls),
                "tag_vals_str": pa.array(out["tag_vals_str"], type=ls),
            }
        )

    items = [{"feature": json.dumps(f)} for f in feats]
    return ray.data.from_items(items).repartition(parallelism).map_batches(
        decode, batch_format="pyarrow"
    )
