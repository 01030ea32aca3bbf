"""DuckDB SQL fragments that re-derive the synthetic feature graph.

Every expression mirrors the numpy derivation in ``sources/synthetic.py`` /
``pipelines/build_graph.py`` operation-for-operation in IEEE doubles (all
float literals are CAST AS DOUBLE — DuckDB otherwise parses them as DECIMAL),
so the driver's oracle comparison is bit-exact. These strings are *oracles*
for correctness checking, not an execution path of the engine.
"""

from __future__ import annotations

from .model import NODES_PER_REL, NODES_PER_WAY, WAY_ID_BASE
from .sources.synthetic import H1_MUL, H2_ADD, H2_MUL, H_MOD

# nodes: id, lon, lat, cell, lang, source, n_chars  (from the documents view)
NODES_CTE = f"""
nodes AS (
  SELECT
    doc_id AS id,
    lang, source, n_chars, text,
    CASE WHEN doc_id % 10 < 3
      THEN CAST(9.9 AS DOUBLE) + CAST(((doc_id * {H1_MUL}) % {H_MOD}) % 1000 AS DOUBLE) * CAST(0.0001 AS DOUBLE)
      ELSE CAST(9.0 AS DOUBLE) + CAST(((doc_id * {H1_MUL}) % {H_MOD}) % 2000 AS DOUBLE) * CAST(0.001 AS DOUBLE)
    END AS lon,
    CASE WHEN doc_id % 10 < 3
      THEN CAST(53.5 AS DOUBLE) + CAST(((doc_id * {H2_MUL} + {H2_ADD}) % {H_MOD}) % 1000 AS DOUBLE) * CAST(0.0001 AS DOUBLE)
      ELSE CAST(53.0 AS DOUBLE) + CAST(((doc_id * {H2_MUL} + {H2_ADD}) % {H_MOD}) % 2000 AS DOUBLE) * CAST(0.001 AS DOUBLE)
    END AS lat
  FROM documents
),
nodes_c AS (
  SELECT *,
    CAST(FLOOR(lon / CAST(0.1 AS DOUBLE)) AS BIGINT) * 100000
      + CAST(FLOOR(lat / CAST(0.1 AS DOUBLE)) AS BIGINT) AS cell,
    id // {NODES_PER_WAY} AS wg,
    id // {NODES_PER_REL} AS rg
  FROM nodes
)"""

# way tags: wtype cycles residential/primary/footway; wg % 7 == 0 -> bridge
WAY_TAGS_SQL = (
    "CASE wg % 3 WHEN 0 THEN 'residential' WHEN 1 THEN 'primary' ELSE 'footway' END"
)

WAYS_CTE = f"""
ways AS (
  SELECT
    {WAY_ID_BASE} + wg AS id,
    wg,
    min(lon) AS minlon, min(lat) AS minlat,
    max(lon) AS maxlon, max(lat) AS maxlat
  FROM nodes_c GROUP BY wg
)"""


def geolocate_sql(id_col: str) -> tuple[str, str]:
    """(lon_expr, lat_expr) mirroring ``sources/synthetic.py::geolocate``
    for an arbitrary BIGINT id column — the same formula NODES_CTE inlines
    for doc_id."""
    lon = (
        f"CASE WHEN {id_col} % 10 < 3 "
        f"THEN CAST(9.9 AS DOUBLE) + CAST((({id_col} * {H1_MUL}) % {H_MOD}) % 1000 AS DOUBLE) * CAST(0.0001 AS DOUBLE) "
        f"ELSE CAST(9.0 AS DOUBLE) + CAST((({id_col} * {H1_MUL}) % {H_MOD}) % 2000 AS DOUBLE) * CAST(0.001 AS DOUBLE) END"
    )
    lat = (
        f"CASE WHEN {id_col} % 10 < 3 "
        f"THEN CAST(53.5 AS DOUBLE) + CAST((({id_col} * {H2_MUL} + {H2_ADD}) % {H_MOD}) % 1000 AS DOUBLE) * CAST(0.0001 AS DOUBLE) "
        f"ELSE CAST(53.0 AS DOUBLE) + CAST((({id_col} * {H2_MUL} + {H2_ADD}) % {H_MOD}) % 2000 AS DOUBLE) * CAST(0.001 AS DOUBLE) END"
    )
    return lon, lat


def bbox_where(b: tuple[float, float, float, float], lon="lon", lat="lat") -> str:
    return (
        f"{lon} >= CAST({b[0]!r} AS DOUBLE) AND {lon} <= CAST({b[2]!r} AS DOUBLE) "
        f"AND {lat} >= CAST({b[1]!r} AS DOUBLE) AND {lat} <= CAST({b[3]!r} AS DOUBLE)"
    )


def tile_expr(zoom: int, lon="lon", lat="lat") -> str:
    n = 1 << zoom
    return (
        f"(CAST(FLOOR((90.0 - {lat}) / CAST(180 AS DOUBLE) * CAST({n} AS DOUBLE)) AS BIGINT) * {n} "
        f"+ CAST(FLOOR(({lon} + 180.0) / CAST(360 AS DOUBLE) * CAST({n} AS DOUBLE)) AS BIGINT))"
    )


def circle_where(cx: float, cy: float, r: float, lon="lon", lat="lat") -> str:
    """Point-in-circle refine exactly as pipelines/query.py::_circle_refine
    evaluates it: the enclosing-bbox prune (bounds computed in Python float,
    round-tripped via repr) AND the squared planar distance against r*r —
    identical IEEE expressions on both engines."""
    r2 = r * r
    dx = f"({lon} - CAST({cx!r} AS DOUBLE))"
    dy = f"({lat} - CAST({cy!r} AS DOUBLE))"
    bbox = bbox_where((cx - r, cy - r, cx + r, cy + r), lon=lon, lat=lat)
    return f"{bbox} AND ({dx} * {dx} + {dy} * {dy}) <= CAST({r2!r} AS DOUBLE)"


def circle_bbox_where(cx: float, cy: float, r: float) -> str:
    """Closest-point-of-bbox-in-circle refine for extended features,
    matching _circle_refine's way/relation branch: the bbox-intersect prune
    against the enclosing box, then GREATEST-clamped axis distances squared
    (max is exact in float, so GREATEST == nested np.maximum)."""
    r2 = r * r
    dx = (
        f"GREATEST(minlon - CAST({cx!r} AS DOUBLE), "
        f"CAST({cx!r} AS DOUBLE) - maxlon, CAST(0 AS DOUBLE))"
    )
    dy = (
        f"GREATEST(minlat - CAST({cy!r} AS DOUBLE), "
        f"CAST({cy!r} AS DOUBLE) - maxlat, CAST(0 AS DOUBLE))"
    )
    intersect = (
        f"minlon <= CAST({cx + r!r} AS DOUBLE) AND maxlon >= CAST({cx - r!r} AS DOUBLE) "
        f"AND minlat <= CAST({cy + r!r} AS DOUBLE) AND maxlat >= CAST({cy - r!r} AS DOUBLE)"
    )
    return f"{intersect} AND ({dx} * {dx} + {dy} * {dy}) <= CAST({r2!r} AS DOUBLE)"
