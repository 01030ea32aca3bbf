"""Driver contract for the Ray Data engine (see simple_osm_queries_ray/).

``entry()`` runs the flagship spatial-join + tile-assignment pipeline at
sf0.001; ``queries()`` exposes one callable per implemented operator;
``oracle_sql()`` gives the DuckDB-equivalent SQL over the same parquet views.
Ray is initialised by the caller — nothing here calls ray.init/shutdown.

Column-name discipline: every computed column is named identically in the Ray
result and the SQL (the driver sorts columns by name before value-hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np

SF_SMOKE = "/root/testdata/sf0.001"

# fixed parameters shared by queries() and oracle_sql()
BBOX_SMALL = (9.85, 53.45, 10.05, 53.65)
BBOX_ALL = (9.0, 53.0, 11.0, 55.0)
TRIANGLE = [(9.05, 53.05), (10.95, 53.1), (9.5, 54.9)]
KNN_QUERIES = [(9.95, 53.55), (9.2, 53.8), (10.5, 54.5)]
KNN_K = 5
TILE_ZOOM = 12


def _repo(sf_dir: str):
    from simple_osm_queries_ray.sources.repo import build_repo

    return build_repo(sf_dir)


def _engine(sf_dir: str):
    from simple_osm_queries_ray.pipelines.query import QueryEngine

    return QueryEngine(_repo(sf_dir))


def entry() -> Any:
    """Flagship: spatial join (soq query incl. semi-join) + tile assignment."""
    from simple_osm_queries_ray.stages.geo import assign_tiles

    eng = _engine(SF_SMOKE)
    result = eng.execute_string(
        "bbox(9.0,53.0,11.0,55.0).nodes{lang=de AND this.ways{wtype=primary}}"
    )
    return assign_tiles(result, TILE_ZOOM)


# ---------------------------------------------------------------------------
# queries


def _q_nodes_cells(sf_dir: str):
    return (
        _repo(sf_dir)
        .nodes.select_columns(["id", "lon", "lat", "cell"])
    )


def _q_cell_density(sf_dir: str):
    # A1 density histogram: groupby cell (pre-deduplication happens naturally:
    # one row per node, the shuffle moves (cell) only)
    ds = _repo(sf_dir).nodes.select_columns(["cell"])
    out = ds.groupby("cell").count()
    return out.rename_columns({"count()": "n_nodes"}) if "count()" in out.schema().names else out


def _q_soq_tag_filter(sf_dir: str):
    return _engine(sf_dir).execute_string(
        f"bbox({BBOX_SMALL[0]},{BBOX_SMALL[1]},{BBOX_SMALL[2]},{BBOX_SMALL[3]})"
        ".nodes{lang=en AND n_chars>=200}"
    )


def _q_soq_and_or(sf_dir: str):
    return _engine(sf_dir).execute_string(
        f"bbox({BBOX_ALL[0]},{BBOX_ALL[1]},{BBOX_ALL[2]},{BBOX_ALL[3]})"
        ".nodes{lang=de AND n_chars>=200 OR lang=fr}"
    )


def _q_soq_neq(sf_dir: str):
    return _engine(sf_dir).execute_string(
        f"bbox({BBOX_ALL[0]},{BBOX_ALL[1]},{BBOX_ALL[2]},{BBOX_ALL[3]}).nodes{{lang!=en}}"
    )


def _q_semi_join_ways(sf_dir: str):
    return _engine(sf_dir).execute_string(
        f"bbox({BBOX_ALL[0]},{BBOX_ALL[1]},{BBOX_ALL[2]},{BBOX_ALL[3]})"
        ".nodes{lang=de AND this.ways{wtype=primary}}"
    )


def _q_anti_join(sf_dir: str):
    return _engine(sf_dir).execute_string(
        f"bbox({BBOX_ALL[0]},{BBOX_ALL[1]},{BBOX_ALL[2]},{BBOX_ALL[3]})"
        ".nodes{!this.ways{bridge=*}}"
    )


def _q_way_semi_join_nodes(sf_dir: str):
    return _engine(sf_dir).execute_string(
        f"bbox({BBOX_ALL[0]},{BBOX_ALL[1]},{BBOX_ALL[2]},{BBOX_ALL[3]})"
        ".ways{this.nodes{lang=zh}}"
    )


def _q_ways_bounds(sf_dir: str):
    return _repo(sf_dir).ways.select_columns(["id", "minlon", "minlat", "maxlon", "maxlat"])


def _q_relations_bounds(sf_dir: str):
    return _repo(sf_dir).relations.select_columns(
        ["id", "minlon", "minlat", "maxlon", "maxlat"]
    )


def _q_tile_assign(sf_dir: str):
    from simple_osm_queries_ray.stages.geo import assign_tiles

    return assign_tiles(_repo(sf_dir).nodes, TILE_ZOOM).select_columns(["id", "tile"])


def _q_tile_histogram(sf_dir: str):
    from simple_osm_queries_ray.stages.geo import assign_tiles

    ds = assign_tiles(_repo(sf_dir).nodes, TILE_ZOOM).select_columns(["tile"])
    out = ds.groupby("tile").count()
    return out.rename_columns({"count()": "n"}) if "count()" in out.schema().names else out


def _q_pip_triangle(sf_dir: str):
    from simple_osm_queries_ray.stages.geo import filter_in_polygon

    return filter_in_polygon(_repo(sf_dir).nodes, TRIANGLE).select_columns(["id", "lon", "lat"])


def _q_knn(sf_dir: str):
    from simple_osm_queries_ray.stages.knn import knn_bruteforce

    return knn_bruteforce(_repo(sf_dir).nodes, np.array(KNN_QUERIES), KNN_K)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "nodes_cells": _q_nodes_cells,
        "cell_density": _q_cell_density,
        "soq_tag_filter": _q_soq_tag_filter,
        "soq_and_or": _q_soq_and_or,
        "soq_neq": _q_soq_neq,
        "soq_semi_join_ways": _q_semi_join_ways,
        "soq_anti_join": _q_anti_join,
        "soq_way_semi_join_nodes": _q_way_semi_join_nodes,
        "ways_bounds": _q_ways_bounds,
        "relations_bounds": _q_relations_bounds,
        "tile_assign": _q_tile_assign,
        "tile_histogram": _q_tile_histogram,
        "pip_triangle": _q_pip_triangle,
        "knn": _q_knn,
    }


# ---------------------------------------------------------------------------
# oracle SQL


def oracle_sql() -> dict[str, str]:
    from simple_osm_queries_ray.model import (
        NODES_PER_REL,
        REL_ID_BASE,
        REL_NEST,
        WAY_ID_BASE,
    )
    from simple_osm_queries_ray.sql_oracle import (
        NODES_CTE,
        WAY_TAGS_SQL,
        WAYS_CTE,
        bbox_where,
        tile_expr,
    )
    from simple_osm_queries_ray.stages.geo import pip_sql_condition

    W = f"WITH {NODES_CTE}"
    WW = f"WITH {NODES_CTE}, {WAYS_CTE}"

    knn_points = ", ".join(
        f"(CAST({i} AS BIGINT), CAST({p[0]!r} AS DOUBLE), CAST({p[1]!r} AS DOUBLE))"
        for i, p in enumerate(KNN_QUERIES)
    )

    return {
        "nodes_cells": f"{W} SELECT id, lon, lat, cell FROM nodes_c",
        "cell_density": f"{W} SELECT cell, count(*) AS n_nodes FROM nodes_c GROUP BY cell",
        "soq_tag_filter": (
            f"{W} SELECT id, lon, lat FROM nodes_c "
            f"WHERE {bbox_where(BBOX_SMALL)} AND lang = 'en' AND n_chars >= 200"
        ),
        "soq_and_or": (
            f"{W} SELECT id, lon, lat FROM nodes_c "
            f"WHERE {bbox_where(BBOX_ALL)} AND ((lang = 'de' AND n_chars >= 200) OR lang = 'fr')"
        ),
        "soq_neq": (
            f"{W} SELECT id, lon, lat FROM nodes_c "
            f"WHERE {bbox_where(BBOX_ALL)} AND lang <> 'en'"
        ),
        # semi-join: a node's (only) way is wg = id // 5; wtype=primary <=> wg%3=1
        "soq_semi_join_ways": (
            f"{W} SELECT id, lon, lat FROM nodes_c "
            f"WHERE {bbox_where(BBOX_ALL)} AND lang = 'de' AND wg % 3 = 1"
        ),
        # anti-join on bridge=* <=> NOT wg%7=0
        "soq_anti_join": (
            f"{W} SELECT id, lon, lat FROM nodes_c "
            f"WHERE {bbox_where(BBOX_ALL)} AND wg % 7 <> 0"
        ),
        # ways containing a zh node (bbox covers the full extent)
        "soq_way_semi_join_nodes": (
            f"{WW} SELECT w.id, w.minlon, w.minlat, w.maxlon, w.maxlat FROM ways w "
            f"WHERE EXISTS (SELECT 1 FROM nodes_c n WHERE n.wg = w.wg AND n.lang = 'zh')"
        ),
        "ways_bounds": f"{WW} SELECT id, minlon, minlat, maxlon, maxlat FROM ways",
        "relations_bounds": f"""
{WW},
rel_members AS (
  SELECT rg, lon AS minlon, lat AS minlat, lon AS maxlon, lat AS maxlat
  FROM nodes_c WHERE id % {NODES_PER_REL} < 3
  UNION ALL
  SELECT wg // 10 AS rg, minlon, minlat, maxlon, maxlat FROM ways
),
rel_base AS (
  SELECT rg, min(minlon) AS minlon, min(minlat) AS minlat,
         max(maxlon) AS maxlon, max(maxlat) AS maxlat
  FROM rel_members GROUP BY rg
),
rel_children AS (
  SELECT (rg - rg % {REL_NEST}) AS prg,
         min(minlon) AS minlon, min(minlat) AS minlat,
         max(maxlon) AS maxlon, max(maxlat) AS maxlat
  FROM rel_base
  WHERE rg % {REL_NEST} <> 0 AND (rg - rg % {REL_NEST}) IN (SELECT rg FROM rel_base)
  GROUP BY 1
)
SELECT {REL_ID_BASE} + b.rg AS id,
       LEAST(b.minlon, COALESCE(c.minlon, b.minlon)) AS minlon,
       LEAST(b.minlat, COALESCE(c.minlat, b.minlat)) AS minlat,
       GREATEST(b.maxlon, COALESCE(c.maxlon, b.maxlon)) AS maxlon,
       GREATEST(b.maxlat, COALESCE(c.maxlat, b.maxlat)) AS maxlat
FROM rel_base b LEFT JOIN rel_children c ON c.prg = b.rg
""",
        "tile_assign": f"{W} SELECT id, {tile_expr(TILE_ZOOM)} AS tile FROM nodes_c",
        "tile_histogram": (
            f"{W} SELECT {tile_expr(TILE_ZOOM)} AS tile, count(*) AS n "
            "FROM nodes_c GROUP BY 1"
        ),
        "pip_triangle": (
            f"{W} SELECT id, lon, lat FROM nodes_c WHERE {pip_sql_condition(TRIANGLE)}"
        ),
        "knn": f"""
{W},
q(qid, qlon, qlat) AS (VALUES {knn_points}),
scored AS (
  SELECT q.qid, n.id,
         (q.qlon - n.lon) * (q.qlon - n.lon) + (q.qlat - n.lat) * (q.qlat - n.lat) AS dist2
  FROM q CROSS JOIN nodes_c n
),
ranked AS (
  SELECT qid, id, dist2,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist2, id) AS rank
  FROM scored
)
SELECT qid, id, dist2, rank FROM ranked WHERE rank <= {KNN_K}
""",
    }
