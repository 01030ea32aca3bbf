"""Polygon -> raster-tile rasterization (vector-to-raster assignment).

The north rule's "raster-tile <-> vector-feature assignment" so far covers
points -> tiles (``stages/geo.py::assign_tiles``), bbox spans -> tiles
(``assign_tiles_bounds``) and tiles <- features (``tile_histogram``).  This
module adds the polygon direction: every zoom-z tile whose CENTER lies
inside a polygon — the standard scanline rasterization, distributed.

Scale shape: the parallel unit is the SCANLINE (one tile row of one
polygon's bbox), not the polygon — a continent-sized geofence with millions
of covered tiles fans out to millions of independent scanline rows, while
tiny polygons batch thousands-per-task.  Polygon vertices are broadcast
once (``ray.put``), never shipped per batch.  Per batch, the crossing
x-coordinates of all (scanline x edge) pairs are computed in one numpy
broadcast, and the fill test is a vectorized parity count — the exact
same strict-< crossing test as ``stages/geo.py::pip_join`` /
``pip_sql_condition``, evaluated at tile centers, so the operator has a
bit-exact DuckDB oracle (generate_series over the bbox tile grid + the PIP
condition; see ``__ray_entry__.oracle_sql()['polygon_tiles']``).

Tile scheme: the engine's equirectangular grid (``stages/geo.py::tile_xy``),
tile id = ty * 2^z + tx; centers at (tx + 0.5, ty + 0.5) in grid units.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..state.broadcast import get as bget


def _tile_ranges(polys: list[list[tuple[float, float]]], zoom: int):
    """Per-polygon candidate tile spans: [tx0, tx1] x [ty0, ty1] from bbox."""
    n = float(1 << zoom)
    out = []
    for poly in polys:
        xs = np.array([p[0] for p in poly])
        ys = np.array([p[1] for p in poly])
        tx0 = int(np.floor((xs.min() + 180.0) / 360.0 * n))
        tx1 = int(np.floor((xs.max() + 180.0) / 360.0 * n))
        ty0 = int(np.floor((90.0 - ys.max()) / 180.0 * n))
        ty1 = int(np.floor((90.0 - ys.min()) / 180.0 * n))
        out.append((tx0, tx1, ty0, ty1))
    return out


def polygon_raster_tiles(
    polys: list[list[tuple[float, float]]], zoom: int
) -> ray.data.Dataset:
    """Dataset of (poly_id, tile, tx, ty): tiles whose center is inside.

    Supports ragged vertex counts; polygons need not be convex.  Scanlines
    (poly_id, ty) are the distributed rows; vertices ride the object store.
    """
    nt = np.int64(1 << zoom)
    ranges = _tile_ranges(polys, zoom)
    scanlines = [
        {"poly_id": pi, "ty": ty, "tx0": r[0], "tx1": r[1]}
        for pi, r in enumerate(ranges)
        for ty in range(r[2], r[3] + 1)
    ]
    # ragged vertices as one padded float array + edge masks, broadcast once
    max_v = max(len(p) for p in polys)
    vx = np.full((len(polys), max_v + 1), np.nan)
    vy = np.full((len(polys), max_v + 1), np.nan)
    for i, p in enumerate(polys):
        vx[i, : len(p)] = [q[0] for q in p]
        vy[i, : len(p)] = [q[1] for q in p]
        vx[i, len(p)] = p[0][0]  # closing edge
        vy[i, len(p)] = p[0][1]
    verts = ray.put((vx, vy))

    def rasterize(batch: pa.Table) -> pa.Table:
        vx, vy = bget(verts)
        pid = np.asarray(batch["poly_id"], dtype=np.int64)
        ty = np.asarray(batch["ty"], dtype=np.int64)
        tx0 = np.asarray(batch["tx0"], dtype=np.int64)
        tx1 = np.asarray(batch["tx1"], dtype=np.int64)
        s = len(pid)
        # scanline center latitude (tile_xy inverse at ty + 0.5)
        yc = 90.0 - (ty.astype(np.float64) + 0.5) / float(nt) * 180.0
        # edges of each scanline's polygon: (s, max_v) slabs
        y1 = vy[pid, :-1]
        y2 = vy[pid, 1:]
        x1 = vx[pid, :-1]
        x2 = vx[pid, 1:]
        ycc = yc[:, None]
        with np.errstate(invalid="ignore", divide="ignore"):
            crossing = (y1 > ycc) != (y2 > ycc)  # NaN pads compare False
            cx = (x2 - x1) * (ycc - y1) / (y2 - y1) + x1
        cx = np.where(crossing, cx, np.inf)
        cx.sort(axis=1)  # crossings first, inf padding last
        # candidate tiles per scanline, flattened without Python loops
        cnt = (tx1 - tx0 + 1).astype(np.int64)
        total = int(cnt.sum())
        if total == 0:
            return pa.table(
                {
                    "poly_id": pa.array([], type=pa.int64()),
                    "tile": pa.array([], type=pa.int64()),
                    "tx": pa.array([], type=pa.int64()),
                    "ty": pa.array([], type=pa.int64()),
                }
            )
        row = np.repeat(np.arange(s), cnt)
        offs = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        tx = tx0[row] + (np.arange(total) - offs[row])
        # tile center longitude; inside iff #crossings <= xc is odd
        xc = (tx.astype(np.float64) + 0.5) / float(nt) * 360.0 - 180.0
        ncross = (cx[row] <= xc[:, None]).sum(axis=1)
        inside = (ncross % 2) == 1
        row, tx = row[inside], tx[inside]
        return pa.table(
            {
                "poly_id": pid[row],
                "tile": ty[row] * nt + tx,
                "tx": tx,
                "ty": ty[row],
            }
        )

    ds = ray.data.from_items(scanlines)
    return ds.map_batches(rasterize, batch_format="pyarrow")
