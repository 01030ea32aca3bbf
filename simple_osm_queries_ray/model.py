"""Core data model: constants, cell packing, feature-table schemas.

Reference data model: node / way / relation features with dictionary-encoded
tags and reverse membership lists (``/root/reference/src/feature/feature.go:8-47``,
``src/index/feature.go:9-178``) on a flat lon/lat grid with 0.1 x 0.1 degree
cells (``src/common/cell.go:5-13``, default size ``src/main.go:39``).

Arrow mapping (SURVEY.md section 1.4):

nodes:      id:int64, lon:float64, lat:float64, cell:int64,
            tag_keys:list<int32>, tag_vals:list<int32>,
            way_ids:list<int64>, relation_ids:list<int64>
ways:       id:int64, node_ids:list<int64>, node_lons:list<float64>,
            node_lats:list<float64>, cells:list<int64>,
            minlon/minlat/maxlon/maxlat:float64 (bound),
            tag_keys, tag_vals, relation_ids:list<int64>
relations:  id:int64, node_ids/way_ids/child_relation_ids/parent_relation_ids,
            cells:list<int64>, minlon..maxlat bound, tag_keys, tag_vals

The packed cell id is ``cell = cx * CELL_PACK + cy`` (reference packs
``x<<32|y`` into a map key, ``src/index/grid_writer.go:534-536``; we use a
decimal pack so DuckDB oracle SQL can reproduce it with plain arithmetic).
"""

from __future__ import annotations

import numpy as np

# Grid geometry (reference defaults: src/main.go:39).
CELL_W = 0.1
CELL_H = 0.1

# Decimal cell packing: supports cx in [-180/0.1, 180/0.1] and cy likewise.
CELL_PACK = 100_000

# Object types (reference: src/osm/types.go:10-14).
OSM_NODE = "node"
OSM_WAY = "way"
OSM_RELATION = "relation"

# Query types add the child_relations direction (src/osm/types.go:32-37).
QUERY_NODES = "nodes"
QUERY_WAYS = "ways"
QUERY_RELATIONS = "relations"
QUERY_CHILD_RELATIONS = "child_relations"

QUERY_TYPE_TO_OBJECT_TYPE = {
    QUERY_NODES: OSM_NODE,
    QUERY_WAYS: OSM_WAY,
    QUERY_RELATIONS: OSM_RELATION,
    QUERY_CHILD_RELATIONS: OSM_RELATION,
}

# Sentinel for "string not present in the tag dictionary"
# (reference: index.NotFound, src/index/tag.go).
NOT_FOUND = -1

# Synthetic id ranges for the derived membership graph (nodes get the raw
# document ids; ways and relations live in disjoint ranges, mirroring the
# reference's per-type id spaces).
WAY_ID_BASE = 100_000_000
REL_ID_BASE = 200_000_000

# Membership-graph shape parameters (see sources/synthetic.py).
NODES_PER_WAY = 5
NODES_PER_REL = 50  # relation group g covers ways with way_group // 10 == g
WAYS_PER_REL = 10
REL_NEST = 4  # relation groups with g % 4 == 0 parent groups g+1..g+3


def cell_xy(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized cell index for coordinates.

    Reference: ``CellIndex{int(x / cellWidth), int(y / cellHeight)}``
    (``src/common/cell.go:7-9``). Go ``int()`` truncates toward zero; all
    engine data lives at positive lon/lat where trunc == floor. We use floor
    (and document the divergence for negative coordinates).
    """
    cx = np.floor(np.asarray(lon, dtype=np.float64) / CELL_W).astype(np.int64)
    cy = np.floor(np.asarray(lat, dtype=np.float64) / CELL_H).astype(np.int64)
    return cx, cy


def pack_cell(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    return np.asarray(cx, dtype=np.int64) * CELL_PACK + np.asarray(cy, dtype=np.int64)


def unpack_cell(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact inverse of :func:`pack_cell` for SIGNED cy (southern
    hemisphere). The naive ``cell % CELL_PACK`` wraps negative cy to
    ``cy + CELL_PACK`` (and shifts cx by -1); every scheme keeps
    ``|cy| < CELL_PACK/2`` (GridCellScheme rejects cell_h where
    180/cell_h >= CELL_PACK), so a centered modulo recovers the true pair.
    Round-trip sites (``pack_cell(unpack_cell(c) + offset)``) are identical
    under either convention; coordinate comparisons need this one."""
    cell = np.asarray(cell, dtype=np.int64)
    half = CELL_PACK // 2
    cy = (cell % CELL_PACK + half) % CELL_PACK - half
    cx = (cell - cy) // CELL_PACK
    return cx, cy


def cell_of(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    cx, cy = cell_xy(lon, lat)
    return pack_cell(cx, cy)


def cells_for_bbox(minlon: float, minlat: float, maxlon: float, maxlat: float) -> np.ndarray:
    """All packed cell ids covered by a bbox (inclusive corner cells).

    Reference: min/max corner cells, then the full rectangle of cells between
    them (``src/index/grid_reader.go:39-69``).
    """
    cx0, cy0 = cell_xy(np.float64(minlon), np.float64(minlat))
    cx1, cy1 = cell_xy(np.float64(maxlon), np.float64(maxlat))
    xs = np.arange(int(cx0), int(cx1) + 1, dtype=np.int64)
    ys = np.arange(int(cy0), int(cy1) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return pack_cell(gx.ravel(), gy.ravel())
