"""Hierarchical quadtree cell encoding (H3/S2-style) over the lon/lat plane.

The north rule calls for a batched hierarchical cell index alongside the
reference's flat 0.1-degree grid (``src/common/cell.go:5-13``). This module
provides the S2-flavoured machinery on the engine's transcendental-free
equirectangular tiling (``stages/geo.py::tile_xy``):

- cell id at ``level`` L = ``4^L + morton(tx, ty)`` — the leading marker bit
  makes ids unique ACROSS levels (S2 encodes position+level in one id the
  same way, via its trailing bit), so parent/child arithmetic is pure shifts;
- ``quad_parent`` / ``quad_children`` / ``quad_level`` hierarchy ops;
- ``quad_covering`` — S2-style normalized covering of a bbox: coarse cells
  fully inside the box stay coarse, boundary cells subdivide until
  ``max_level``;
- all per-row kernels vectorized (64-bit bit-spreading interleave).

The morton interleave and marker-bit layout are exactly reproducible in
DuckDB BIGINT arithmetic (bit shifts + masks), so cell assignment at any
level has an exact SQL oracle.
"""

from __future__ import annotations

import numpy as np

from ..stages.geo import tile_xy

MAX_LEVEL = 26  # 2*26 + marker = 53 bits < int64


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of x to even bit positions (Morton helper)."""
    x = x.astype(np.uint64)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def morton(tx: np.ndarray, ty: np.ndarray) -> np.ndarray:
    """Interleave tx (even bits) and ty (odd bits) -> int64."""
    return (_part1by1(np.asarray(tx)) | (_part1by1(np.asarray(ty)) << np.uint64(1))).astype(
        np.int64
    )


def quad_cell(lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
    """Level-L hierarchical cell id for points: 4^L + morton(tile_xy(L))."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    tx, ty = tile_xy(lon, lat, level)
    # clamp boundary coordinates (lon=180 / lat=-90 floor to 2^level) into
    # the grid — an out-of-range tile would corrupt the level marker bit
    # and make the feature unfindable by any covering probe
    hi = np.int64((1 << level) - 1)
    tx = np.clip(tx, 0, hi)
    ty = np.clip(ty, 0, hi)
    return (np.int64(1) << np.int64(2 * level)) + morton(tx, ty)


def quad_level(cell: np.ndarray) -> np.ndarray:
    """Recover the level from the marker bit (position of the highest set
    bit, halved)."""
    cell = np.asarray(cell, dtype=np.int64)
    # int64 cells are < 2^53; frexp is exact there
    bits = np.frexp(cell.astype(np.float64))[1] - 1
    return bits // 2


def quad_parent(cell: np.ndarray, levels_up: int = 1) -> np.ndarray:
    """Ancestor cell id ``levels_up`` levels coarser (pure shift: the marker
    bit travels with the payload)."""
    return np.asarray(cell, dtype=np.int64) >> np.int64(2 * levels_up)


def quad_children(cell: int) -> np.ndarray:
    """The four direct children of a cell id."""
    base = np.int64(cell) << np.int64(2)
    return base + np.arange(4, dtype=np.int64)


def quad_cell_bounds(cell: int) -> tuple[float, float, float, float]:
    """(minlon, minlat, maxlon, maxlat) of a cell id."""
    cell = int(cell)
    level = int(quad_level(np.array([cell]))[0])
    m = cell - (1 << (2 * level))
    tx = int(_compact1by1(np.array([m], dtype=np.int64))[0])
    ty = int(_compact1by1(np.array([m >> 1], dtype=np.int64))[0])
    n = float(1 << level)
    minlon = tx / n * 360.0 - 180.0
    maxlon = (tx + 1) / n * 360.0 - 180.0
    maxlat = 90.0 - ty / n * 180.0
    minlat = 90.0 - (ty + 1) / n * 180.0
    return minlon, minlat, maxlon, maxlat


def _compact1by1(x: np.ndarray) -> np.ndarray:
    """Inverse of _part1by1: gather even bits."""
    x = x.astype(np.uint64) & np.uint64(0x5555555555555555)
    x = (x | (x >> np.uint64(1))) & np.uint64(0x3333333333333333)
    x = (x | (x >> np.uint64(2))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x >> np.uint64(4))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x >> np.uint64(8))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x >> np.uint64(16))) & np.uint64(0x00000000FFFFFFFF)
    return x.astype(np.int64)


def quad_covering(
    bbox: tuple[float, float, float, float],
    max_level: int,
    *,
    min_level: int = 0,
) -> np.ndarray:
    """S2-style normalized covering: the minimal set of cells (levels
    ``min_level``..``max_level``) whose union contains ``bbox``, with cells
    fully inside the box kept at the coarsest level that fits.

    Driver-side recursion over at most O(perimeter * levels) cells — coverings
    are broadcast-sized planning state, like the reference's bbox cell
    rectangle (``grid_reader.go:39-69``).
    """
    minlon, minlat, maxlon, maxlat = bbox
    out: list[int] = []

    def contains(cb) -> bool:
        return (
            cb[0] >= minlon and cb[2] <= maxlon and cb[1] >= minlat and cb[3] <= maxlat
        )

    def intersects(cb) -> bool:
        return not (
            cb[0] > maxlon or cb[2] < minlon or cb[1] > maxlat or cb[3] < minlat
        )

    def walk(cell: int, level: int):
        cb = quad_cell_bounds(cell)
        if not intersects(cb):
            return
        if level >= min_level and (contains(cb) or level == max_level):
            out.append(cell)
            return
        for c in quad_children(cell):
            walk(int(c), level + 1)

    walk(1, 0)  # root cell id = 4^0 + 0
    return np.sort(np.array(out, dtype=np.int64))


def covering_to_max_level(covering: np.ndarray, max_level: int) -> np.ndarray:
    """Expand a mixed-level covering to the full set of max_level cell ids
    (for searchsorted probes against point cells at max_level)."""
    cells = []
    for c in np.asarray(covering, dtype=np.int64):
        lvl = int(quad_level(np.array([c]))[0])
        d = max_level - lvl
        base = np.int64(c) << np.int64(2 * d)
        cells.append(base + np.arange(1 << (2 * d), dtype=np.int64))
    return np.sort(np.concatenate(cells)) if cells else np.array([], dtype=np.int64)


def quad_cell_sql(level: int, lon_col: str = "lon", lat_col: str = "lat") -> str:
    """DuckDB expression replaying quad_cell exactly (bit interleave via a
    per-bit sum — BIGINT shifts and masks only)."""
    n = 1 << level
    tx = (
        f"CAST(FLOOR(({lon_col} + 180.0) / CAST(360 AS DOUBLE) * CAST({n} AS DOUBLE)) AS BIGINT)"
    )
    ty = (
        f"CAST(FLOOR((90.0 - {lat_col}) / CAST(180 AS DOUBLE) * CAST({n} AS DOUBLE)) AS BIGINT)"
    )
    parts = [f"(CAST(1 AS BIGINT) << {2 * level})"]
    for b in range(level):
        parts.append(f"((({tx} >> {b}) & 1) << {2 * b})")
        parts.append(f"((({ty} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " + ".join(parts) + ")"


class QuadCellScheme:
    """Pluggable cell scheme (SURVEY 2.8 seam): hierarchical quad cells as
    the feature-table 'cell' ids. Swapping this for the flat grid changes
    nothing else — the density planner, partition pruning and query probes
    all operate on opaque int64 cell ids.
    """

    name = "quad"

    def __init__(self, level: int = 12):
        self.level = level
        self.name = f"quad{level}"

    def cell_of(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        return quad_cell(lon, lat, self.level)

    def cells_for_bbox(
        self, minlon: float, minlat: float, maxlon: float, maxlat: float
    ) -> np.ndarray:
        cov = quad_covering((minlon, minlat, maxlon, maxlat), self.level)
        return covering_to_max_level(cov, self.level)

    def expand_cells(self, cells: np.ndarray, eps: float) -> np.ndarray:
        """Cells within planar distance ``eps`` of the given level-L cells
        (buffered sub-statements read these instead of the bare outer
        covering). Vectorized morton decode -> ring expand -> re-encode."""
        cells = np.asarray(cells, dtype=np.int64)
        if len(cells) == 0:
            return cells
        L = self.level
        n = 1 << L
        m = cells - (np.int64(1) << np.int64(2 * L))
        tx = _compact1by1(m)
        ty = _compact1by1(m >> np.int64(1))
        rx = int(np.ceil(eps / (360.0 / n)))
        ry = int(np.ceil(eps / (180.0 / n)))
        dx, dy = np.meshgrid(np.arange(-rx, rx + 1), np.arange(-ry, ry + 1), indexing="ij")
        ex = np.clip(tx[:, None] + dx.ravel()[None, :], 0, n - 1).ravel()
        ey = np.clip(ty[:, None] + dy.ravel()[None, :], 0, n - 1).ravel()
        return np.unique((np.int64(1) << np.int64(2 * L)) + morton(ex, ey))


class GridCellScheme:
    """The reference's flat lon/lat grid, with a configurable cell size.

    The reference's ``Import`` takes cellWidth/cellHeight parameters
    (``/root/reference/src/importing/import.go:17``, wired from
    ``src/main.go:87``, default 0.1 at ``src/main.go:39``) — this scheme is
    the engine's equivalent knob: ``GridCellScheme(0.05, 0.05)`` plugs into
    ``build_repo(cell_scheme=...)`` / ``QueryEngine(cell_scheme=...)`` and
    every downstream plan operates on the resulting opaque int64 cell ids.
    The default (0.1 x 0.1) matches the reference and the module-level
    ``model.cell_of`` fast path.
    """

    def __init__(self, cell_w: float = 0.1, cell_h: float = 0.1):
        if cell_w <= 0 or cell_h <= 0:
            raise ValueError("cell_w and cell_h must be positive")
        from ..model import CELL_PACK

        # packing capacity: cell = cx*CELL_PACK + cy collides when the cy
        # range (latitude span / cell_h) reaches CELL_PACK — reject sizes
        # the decimal pack cannot represent instead of silently conflating
        # distant cells (pruning would still be correct but degenerate)
        if 180.0 / cell_h >= CELL_PACK:
            raise ValueError(
                f"cell_h={cell_h} too small for the cell packing: latitude "
                f"span 180/{cell_h} >= CELL_PACK ({CELL_PACK}); minimum "
                f"supported cell_h is {180.0 / CELL_PACK}"
            )
        self.cell_w = float(cell_w)
        self.cell_h = float(cell_h)
        self._default = self.cell_w == 0.1 and self.cell_h == 0.1
        # name keys the build_repo cache — must distinguish sizes
        self.name = "grid" if self._default else f"grid-{cell_w}x{cell_h}"

    def cell_of(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        from ..model import CELL_PACK

        cx = np.floor(np.asarray(lon, dtype=np.float64) / self.cell_w).astype(np.int64)
        cy = np.floor(np.asarray(lat, dtype=np.float64) / self.cell_h).astype(np.int64)
        return cx * CELL_PACK + cy

    def cells_for_bbox(
        self, minlon: float, minlat: float, maxlon: float, maxlat: float
    ) -> np.ndarray:
        from ..model import pack_cell

        cx0 = int(np.floor(minlon / self.cell_w))
        cx1 = int(np.floor(maxlon / self.cell_w))
        cy0 = int(np.floor(minlat / self.cell_h))
        cy1 = int(np.floor(maxlat / self.cell_h))
        xs = np.arange(cx0, cx1 + 1, dtype=np.int64)
        ys = np.arange(cy0, cy1 + 1, dtype=np.int64)
        gx, gy = np.meshgrid(xs, ys, indexing="ij")
        return pack_cell(gx.ravel(), gy.ravel())

    def expand_cells(self, cells: np.ndarray, eps: float) -> np.ndarray:
        """Grid cells within planar distance ``eps`` of the given cells
        (ring expansion by ceil(eps / cell side) in each axis)."""
        from ..model import pack_cell, unpack_cell

        cells = np.asarray(cells, dtype=np.int64)
        if len(cells) == 0:
            return cells
        cx, cy = unpack_cell(cells)
        rx = int(np.ceil(eps / self.cell_w))
        ry = int(np.ceil(eps / self.cell_h))
        dx, dy = np.meshgrid(np.arange(-rx, rx + 1), np.arange(-ry, ry + 1), indexing="ij")
        ex = (cx[:, None] + dx.ravel()[None, :]).ravel()
        ey = (cy[:, None] + dy.ravel()[None, :]).ravel()
        return np.unique(pack_cell(ex, ey))


def scheme_to_json(scheme) -> dict:
    """Serialize a cell scheme for persistence in a written index, so
    query-side ``DiskRepo`` reconstructs the EXACT scheme the cells were
    built with (the reference persists cellWidth/cellHeight implicitly in
    its grid-file directory layout; we persist explicitly)."""
    if isinstance(scheme, GridCellScheme):
        return {"kind": "grid", "cell_w": scheme.cell_w, "cell_h": scheme.cell_h}
    if isinstance(scheme, QuadCellScheme):
        return {"kind": "quad", "level": scheme.level}
    from .hexcell import HexCellScheme

    if isinstance(scheme, HexCellScheme):
        return {"kind": "hex", "size": scheme.size}
    raise ValueError(f"unknown cell scheme {type(scheme).__name__}")


def scheme_from_json(d: dict):
    kind = d["kind"]
    if kind == "grid":
        return GridCellScheme(d["cell_w"], d["cell_h"])
    if kind == "quad":
        return QuadCellScheme(d["level"])
    if kind == "hex":
        from .hexcell import HexCellScheme

        return HexCellScheme(d["size"])
    raise ValueError(f"unknown cell scheme kind {kind!r}")
