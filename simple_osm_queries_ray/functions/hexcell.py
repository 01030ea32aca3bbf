"""H3-style hexagonal cell encoding over the lon/lat plane.

The north rule names a "distributed H3/S2 cell index"; :mod:`.hiercell`
covers the S2 side (hierarchical quad cells + normalized coverings). This
module adds the H3 side: a pointy-top axial hexagon lattice (the public
cube-coordinate construction, Patel's H3 docs / Red Blob Games) laid over
the engine's transcendental-free equirectangular plane — hexagonal
adjacency, uniform 6-neighbor rings and ~30% lower quantization error per
area than squares, with the plane geometry the reference's flat grid uses
(``/root/reference/src/common/cell.go:5-13``). Real H3 projects onto an
icosahedron to cover the sphere; at the reference's city-to-country extents
the equirectangular plane is the same approximation its 0.1-degree grid
already makes, so we keep every kernel in exactly-reproducible float64
arithmetic instead.

Pipeline-facing properties:

- ``hex_cell`` is fully vectorized: two fused multiply-adds, three
  ``floor(x+0.5)`` roundings and one branch-free cube-rounding fix-up per
  point, then an integer pack — one ``map_batches`` kernel.
- ``hex_cell_sql`` emits a DuckDB expression replaying the SAME float64
  expression tree op-for-op (literals via ``repr`` round-trip), so cell
  assignment at any size has an exact SQL oracle by construction, like
  :func:`..functions.geohash.geohash_sql`.
- :class:`HexCellScheme` satisfies the engine's pluggable cell-scheme seam
  (SURVEY 2.8): opaque int64 cell ids, conservative bbox coverings for
  partition pruning, eps-ring expansion for buffered sub-statements — the
  density planner, disk index and query probes work unchanged on it.

Cell id layout: ``((q + OFF) << 21) | (r + OFF)`` with ``OFF = 2^20`` —
axial coordinates stay below 2^20 for any size >= 1e-3 degrees, ids fit in
42 bits, and unpacking is two shifts/masks.
"""

from __future__ import annotations

import math

import numpy as np

OFF = 1 << 20  # axial coordinate offset (biased non-negative)
_SHIFT = 21  # bits reserved for r


def _axial_constants(size: float) -> tuple[float, float, float]:
    """(A, B, C) with qf = lon*A + lat*B, rf = lat*C — the pointy-top
    pixel->axial transform q=(sqrt(3)/3*x - y/3)/s, r=(2/3*y)/s folded into
    three float64 constants shared by the numpy kernel and the SQL twin."""
    if not size > 0:
        raise ValueError("size must be positive")
    a = (math.sqrt(3.0) / 3.0) / size
    b = (-1.0 / 3.0) / size
    c = (2.0 / 3.0) / size
    return a, b, c


def hex_axial(
    lon: np.ndarray, lat: np.ndarray, size: float
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized axial (q, r) hex coordinates via cube rounding.

    Every op is plain float64 (no transcendentals at call time), in the
    exact order ``hex_cell_sql`` mirrors: fractional axial coords, the
    third cube coordinate y = -q - r, floor(x+0.5) rounding, then the
    standard fix-up that recomputes the coordinate with the largest
    rounding error from the other two (cube coords must sum to 0).
    """
    a, b, c = _axial_constants(size)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    qf = (lon * a) + (lat * b)
    rf = lat * c
    yf = (-qf) - rf
    rq = np.floor(qf + 0.5)
    rr = np.floor(rf + 0.5)
    ry = np.floor(yf + 0.5)
    dq = np.abs(rq - qf)
    dr = np.abs(rr - rf)
    dy = np.abs(ry - yf)
    fix_q = (dq > dr) & (dq > dy)
    fix_r = ~fix_q & ~(dy > dr)
    q = np.where(fix_q, (-ry) - rr, rq)
    r = np.where(fix_r, (-rq) - ry, rr)
    return q.astype(np.int64), r.astype(np.int64)


def hex_pack(q: np.ndarray, r: np.ndarray) -> np.ndarray:
    """Axial (q, r) -> opaque int64 cell id."""
    q = np.asarray(q, dtype=np.int64)
    r = np.asarray(r, dtype=np.int64)
    if len(q) and (
        int(np.abs(q).max(initial=0)) >= OFF or int(np.abs(r).max(initial=0)) >= OFF
    ):
        raise ValueError("axial coordinate out of packable range; increase size")
    return ((q + OFF) << np.int64(_SHIFT)) | (r + OFF)


def hex_unpack(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`hex_pack`."""
    cell = np.asarray(cell, dtype=np.int64)
    q = (cell >> np.int64(_SHIFT)) - OFF
    r = (cell & np.int64((1 << _SHIFT) - 1)) - OFF
    return q, r


def hex_cell(lon: np.ndarray, lat: np.ndarray, size: float) -> np.ndarray:
    """Packed int64 hex cell id per point."""
    q, r = hex_axial(lon, lat, size)
    return hex_pack(q, r)


def hex_center(q: np.ndarray, r: np.ndarray, size: float) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) of hex centers (pointy-top axial->pixel)."""
    q = np.asarray(q, dtype=np.float64)
    r = np.asarray(r, dtype=np.float64)
    lon = size * (math.sqrt(3.0) * q + (math.sqrt(3.0) / 2.0) * r)
    lat = size * (1.5 * r)
    return lon, lat


def hex_cell_sql(lon_expr: str, lat_expr: str, size: float) -> str:
    """DuckDB expression computing the identical packed cell id: the same
    three constants (repr round-trips the float64 exactly), the same
    operation order, ``FLOOR(x + 0.5)`` rounding and the same cube-rounding
    fix-up as :func:`hex_axial`, then the integer pack."""
    a, b, c = _axial_constants(size)
    qf = f"((({lon_expr}) * CAST({a!r} AS DOUBLE)) + (({lat_expr}) * CAST({b!r} AS DOUBLE)))"
    rf = f"(({lat_expr}) * CAST({c!r} AS DOUBLE))"
    h0 = f"(SELECT {qf} AS __qf, {rf} AS __rf) __h0"
    h1 = f"(SELECT __qf, __rf, ((- __qf) - __rf) AS __yf FROM {h0}) __h1"
    h2 = (
        "(SELECT __qf, __rf, __yf, FLOOR(__qf + 0.5) AS __rq, "
        f"FLOOR(__rf + 0.5) AS __rr, FLOOR(__yf + 0.5) AS __ry FROM {h1}) __h2"
    )
    h3 = (
        "(SELECT __rq, __rr, __ry, ABS(__rq - __qf) AS __dq, "
        f"ABS(__rr - __rf) AS __dr, ABS(__ry - __yf) AS __dy FROM {h2}) __h3"
    )
    q_sel = "CASE WHEN (__dq > __dr) AND (__dq > __dy) THEN (- __ry) - __rr ELSE __rq END"
    r_sel = (
        "CASE WHEN NOT ((__dq > __dr) AND (__dq > __dy)) AND NOT (__dy > __dr) "
        "THEN (- __rq) - __ry ELSE __rr END"
    )
    return (
        f"(SELECT ((CAST({q_sel} AS BIGINT) + {OFF}) * {1 << _SHIFT}) "
        f"+ (CAST({r_sel} AS BIGINT) + {OFF}) FROM {h3})"
    )


class HexCellScheme:
    """Pluggable H3-style cell scheme (SURVEY 2.8 seam): hexagonal lattice
    cells as the feature-table 'cell' ids. Like :class:`..functions.hiercell.
    QuadCellScheme`, ids are opaque int64 — the density planner, disk-index
    partition pruning and query probes operate on them unchanged."""

    def __init__(self, size: float = 0.05):
        self.size = float(size)
        self.name = f"hex{self.size:g}"

    def cell_of(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        return hex_cell(lon, lat, self.size)

    def _cells_near_box(
        self, minlon: float, minlat: float, maxlon: float, maxlat: float, pad: float
    ) -> np.ndarray:
        """Cells whose center lies within ``pad`` of the box — a conservative
        superset of every cell intersecting it when ``pad >= size``
        (a pointy-top hexagon fits in the radius-``size`` disc around its
        center). The axial transform is linear, so the (q, r) search window
        comes from the four padded corners, +/-1 for rounding."""
        a, b, c = _axial_constants(self.size)
        lons = np.array([minlon - pad, minlon - pad, maxlon + pad, maxlon + pad])
        lats = np.array([minlat - pad, maxlat + pad, minlat - pad, maxlat + pad])
        qf = lons * a + lats * b
        rf = lats * c
        q0, q1 = int(np.floor(qf.min())) - 1, int(np.ceil(qf.max())) + 1
        r0, r1 = int(np.floor(rf.min())) - 1, int(np.ceil(rf.max())) + 1
        qq, rr = np.meshgrid(
            np.arange(q0, q1 + 1, dtype=np.int64),
            np.arange(r0, r1 + 1, dtype=np.int64),
            indexing="ij",
        )
        qq, rr = qq.ravel(), rr.ravel()
        cx, cy = hex_center(qq, rr, self.size)
        keep = (
            (cx >= minlon - pad)
            & (cx <= maxlon + pad)
            & (cy >= minlat - pad)
            & (cy <= maxlat + pad)
        )
        return np.sort(hex_pack(qq[keep], rr[keep]))

    def cells_for_bbox(
        self, minlon: float, minlat: float, maxlon: float, maxlat: float
    ) -> np.ndarray:
        return self._cells_near_box(minlon, minlat, maxlon, maxlat, self.size)

    def expand_cells(self, cells: np.ndarray, eps: float) -> np.ndarray:
        """Cells within planar distance ``eps`` of the given cells (buffered
        sub-statements read these instead of the bare outer covering). Any
        point of a source cell is <= size from its center and any containing
        cell's center is <= size from the target point, so center-to-center
        distance is bounded by eps + 2*size; ring-expand each cell's axial
        window by that bound and dedup."""
        cells = np.asarray(cells, dtype=np.int64)
        if len(cells) == 0:
            return cells
        q, r = hex_unpack(cells)
        reach = eps + 2.0 * self.size
        # |dq| <= (sqrt(3)/3 * |dx| + |dy|/3) / size, |dr| <= (2/3) |dy| / size
        kq = int(np.ceil((math.sqrt(3.0) / 3.0 + 1.0 / 3.0) * reach / self.size)) + 1
        kr = int(np.ceil((2.0 / 3.0) * reach / self.size)) + 1
        dq, dr = np.meshgrid(
            np.arange(-kq, kq + 1, dtype=np.int64),
            np.arange(-kr, kr + 1, dtype=np.int64),
            indexing="ij",
        )
        dq, dr = dq.ravel(), dr.ravel()
        # keep only offsets whose center displacement can be within reach
        ox, oy = hex_center(dq, dr, self.size)
        ok = (np.abs(ox) <= reach + self.size) & (np.abs(oy) <= reach + self.size)
        dq, dr = dq[ok], dr[ok]
        eq = (q[:, None] + dq[None, :]).ravel()
        er = (r[:, None] + dr[None, :]).ravel()
        return np.unique(hex_pack(eq, er))
