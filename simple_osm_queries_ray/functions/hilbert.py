"""Hilbert space-filling-curve index over a 2^p x 2^p grid, bit-exact in SQL.

Why a second space-filling curve next to the Morton/quadtree ids
(``functions/hiercell.py``): Morton order has long diagonal jumps between
adjacent cells, so contiguous Morton ranges can cover spatially disjoint
strips.  The Hilbert curve visits every cell of the grid with unit steps —
contiguous index ranges are spatially compact — which is exactly what a
RANGE partitioner wants when it cuts a 100 TB feature table into
equal-count, spatially-local shards (``stages/spacefill.py``).  The
reference's import partitions space by a fixed cell-count extent plan
(``/root/reference/src/importing/import.go:74-84``); Hilbert range sharding
is the scale-native generalization: balanced by COUNT, local by CURVE.

Layout: the classic Wikipedia xy->d loop (public domain algorithm): for each
bit plane s = 2^(p-1) .. 1, accumulate s*s*((3*rx) XOR ry) and rotate the
quadrant.  Everything here is vectorized over numpy arrays (the loop is over
the p bit planes, never over rows), and ``hilbert_sql_ctes`` emits a DuckDB
CTE chain that replays the same loop step-for-step in BIGINT arithmetic, so
the index has an exact SQL twin (same pattern as the geohash / hex-cell
generated oracles).
"""

from __future__ import annotations

import numpy as np

MAX_ORDER = 31  # 2*31 = 62 bits < int64


def hilbert_d(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    """Distance along the order-``order`` Hilbert curve of cell (x, y).

    ``x``/``y`` must already be integer grid coordinates in [0, 2^order).
    Vectorized: the loop runs ``order`` times regardless of row count.
    """
    if not 1 <= order <= MAX_ORDER:
        raise ValueError(f"order must be in [1, {MAX_ORDER}]")
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1 << (order - 1))
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant: flip when rx==1 (within ry==0), then swap x/y
        flip = (ry == 0) & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= 1
    return d


def hilbert_xy(d: np.ndarray, order: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse mapping d -> (x, y); used by the round-trip property tests."""
    if not 1 <= order <= MAX_ORDER:
        raise ValueError(f"order must be in [1, {MAX_ORDER}]")
    t = np.asarray(d, dtype=np.int64).copy()
    x = np.zeros_like(t)
    y = np.zeros_like(t)
    s = np.int64(1)
    while s < (np.int64(1) << order):
        rx = (t // 2) & 1
        ry = (t ^ rx) & 1
        # inverse rotation
        flip = (ry == 0) & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        x += s * rx
        y += s * ry
        t //= 4
        s <<= 1
    return x, y


def hilbert_sql_ctes(
    order: int, src: str, x_col: str, y_col: str, carry: list[str]
) -> tuple[str, str]:
    """Generate the DuckDB CTE chain replaying :func:`hilbert_d` bit-exactly.

    Returns ``(ctes, final_name)``: append ``ctes`` after a WITH that defines
    ``src`` (a relation with integer columns ``x_col``/``y_col`` plus the
    ``carry`` columns to thread through), then select ``hd`` from
    ``final_name``.  One pair of CTEs per bit plane — CASE logic mirrors the
    numpy where() rotation exactly, and every quantity is BIGINT.
    """
    if not 1 <= order <= MAX_ORDER:
        raise ValueError(f"order must be in [1, {MAX_ORDER}]")
    carry_sql = ", ".join(carry)
    parts = []
    prev = src
    first = True
    for i in range(order):
        s = 1 << (order - 1 - i)
        x_in = x_col if first else "hx"
        y_in = y_col if first else "hy"
        d_in = "CAST(0 AS BIGINT)" if first else "hd"
        b = f"hb{i}"
        u = f"hu{i}"
        parts.append(
            f"{b} AS (SELECT {carry_sql}, {x_in} AS hx, {y_in} AS hy, {d_in} AS hd,\n"
            f"  CASE WHEN ({x_in} & {s}) > 0 THEN 1 ELSE 0 END AS rx,\n"
            f"  CASE WHEN ({y_in} & {s}) > 0 THEN 1 ELSE 0 END AS ry\n"
            f"  FROM {prev})"
        )
        # (3*rx) XOR ry over rx,ry in {0,1}: (0,0)->0 (0,1)->1 (1,0)->3 (1,1)->2
        quad = (
            "CASE WHEN rx = 0 AND ry = 0 THEN 0 WHEN rx = 0 AND ry = 1 THEN 1 "
            "WHEN rx = 1 AND ry = 0 THEN 3 ELSE 2 END"
        )
        flip_x = f"CASE WHEN ry = 0 AND rx = 1 THEN {s - 1} - hx ELSE hx END"
        flip_y = f"CASE WHEN ry = 0 AND rx = 1 THEN {s - 1} - hy ELSE hy END"
        parts.append(
            f"{u} AS (SELECT {carry_sql},\n"
            f"  CASE WHEN ry = 0 THEN ({flip_y}) ELSE hx END AS hx,\n"
            f"  CASE WHEN ry = 0 THEN ({flip_x}) ELSE hy END AS hy,\n"
            f"  hd + CAST({s} AS BIGINT) * CAST({s} AS BIGINT) * ({quad}) AS hd\n"
            f"  FROM {b})"
        )
        prev = u
        first = False
    return ",\n".join(parts), prev


# -- extent-normalized grid ---------------------------------------------------
# The synthetic feature extent (sources/synthetic.py geolocation) is
# lon in [9, 11), lat in [53, 55).  Points are mapped to an extent-local
# 2^p x 2^p grid so the curve resolution spends its bits inside the data,
# not on the empty globe (the reference's import does the same thing when it
# splits its configured extent, import.go:74-84).

EXTENT = (9.0, 53.0, 11.0, 55.0)  # minlon, minlat, maxlon, maxlat


def extent_grid_xy(
    lon: np.ndarray, lat: np.ndarray, order: int, extent: tuple = EXTENT
) -> tuple[np.ndarray, np.ndarray]:
    """Integer grid coordinates of points within ``extent`` (clipped)."""
    n = np.int64(1 << order)
    x0, y0, x1, y1 = extent
    gx = np.floor((np.asarray(lon, dtype=np.float64) - x0) / (x1 - x0) * float(n)).astype(
        np.int64
    )
    gy = np.floor((np.asarray(lat, dtype=np.float64) - y0) / (y1 - y0) * float(n)).astype(
        np.int64
    )
    return np.clip(gx, 0, n - 1), np.clip(gy, 0, n - 1)


def extent_grid_sql(order: int, extent: tuple = EXTENT, lon="lon", lat="lat") -> tuple[str, str]:
    """DuckDB expressions for :func:`extent_grid_xy` (bit-exact doubles)."""
    n = 1 << order
    x0, y0, x1, y1 = extent

    def d(v: float) -> str:
        return f"CAST({v!r} AS DOUBLE)"

    gx = (
        f"LEAST(GREATEST(CAST(FLOOR(({lon} - {d(x0)}) / {d(x1 - x0)} * {d(float(n))}) "
        f"AS BIGINT), 0), {n - 1})"
    )
    gy = (
        f"LEAST(GREATEST(CAST(FLOOR(({lat} - {d(y0)}) / {d(y1 - y0)} * {d(float(n))}) "
        f"AS BIGINT), 0), {n - 1})"
    )
    return gx, gy
