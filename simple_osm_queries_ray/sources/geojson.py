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
