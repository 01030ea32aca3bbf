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


def zonal_stats(
    nodes: ray.data.Dataset,
    polys: list[list[tuple[float, float]]],
    zoom: int,
    value_col: str = "n_chars",
) -> ray.data.Dataset:
    """Raster-space zonal statistics: per polygon, aggregate the features of
    every tile the polygon covers (tiles from :func:`polygon_raster_tiles`).

    Classic GIS zonal stats through the raster layer: features aggregate to
    tiles ONCE (integer partial sums per batch, then a tiny groupby bounded
    by the count of distinct non-empty tiles, never by feature count), and
    polygons join the per-tile table — no per-feature point-in-polygon.
    The per-tile aggregate is the broadcast small side (``ray.put`` once;
    its size is bounded by occupied tiles — at deeper zooms bucket the join
    with the ``_attach_int64`` machinery instead).  Integer sums keep the
    oracle comparison exact (no float summation-order drift).

    Output: (poly_id, n_tiles, n_nodes, sum_chars) — n_tiles counts ALL
    covered tiles including empty ones (LEFT-join semantics).
    """
    from ray.data.aggregate import Sum

    from .geo import tile_id

    pt = polygon_raster_tiles(polys, zoom).select_columns(["poly_id", "tile"])

    def agg(batch: pa.Table) -> pa.Table:
        t = tile_id(np.asarray(batch["lon"]), np.asarray(batch["lat"]), zoom)
        v = np.asarray(batch[value_col], dtype=np.int64)
        tiles, inv = np.unique(t, return_inverse=True)
        nn = np.bincount(inv, minlength=len(tiles)).astype(np.int64)
        sv = np.zeros(len(tiles), dtype=np.int64)
        np.add.at(sv, inv, v)
        return pa.table({"tile": tiles, "nn": nn, "sv": sv})

    tile_aggs = (
        nodes.select_columns(["lon", "lat", value_col])
        .map_batches(agg, batch_format="pyarrow")
        .groupby("tile")
        .aggregate(Sum("nn", alias_name="nn"), Sum("sv", alias_name="sv"))
        .to_pandas()
    )
    if "tile" not in tile_aggs.columns:
        # zero input nodes: the empty groupby result carries no columns
        empty = np.array([], dtype=np.int64)
        side = ray.put((empty, empty, empty))
    else:
        tile_aggs = tile_aggs.sort_values("tile")
        side = ray.put(
            (
                tile_aggs["tile"].to_numpy(np.int64),
                tile_aggs["nn"].to_numpy(np.int64),
                tile_aggs["sv"].to_numpy(np.int64),
            )
        )

    def attach(batch: pa.Table) -> pa.Table:
        tiles, nn, sv = bget(side)
        t = np.asarray(batch["tile"])
        pid = np.asarray(batch["poly_id"])
        if len(tiles) == 0:
            # zero input nodes: every polygon still reports its tile count
            # (numpy would otherwise index the empty aggregate eagerly)
            pids, inv = np.unique(pid, return_inverse=True)
            zeros = np.zeros(len(pids), dtype=np.int64)
            return pa.table(
                {
                    "poly_id": pids,
                    "n_tiles": np.bincount(inv, minlength=len(pids)).astype(np.int64),
                    "n_nodes": zeros,
                    "sum_chars": zeros,
                }
            )
        pos = np.searchsorted(tiles, t)
        pos_c = np.minimum(pos, len(tiles) - 1)
        hit = tiles[pos_c] == t
        # partial per-polygon sums within the batch
        pids, inv = np.unique(pid, return_inverse=True)
        n_tiles = np.bincount(inv, minlength=len(pids)).astype(np.int64)
        n_nodes = np.zeros(len(pids), dtype=np.int64)
        sum_chars = np.zeros(len(pids), dtype=np.int64)
        np.add.at(n_nodes, inv, np.where(hit, nn[pos_c], 0))
        np.add.at(sum_chars, inv, np.where(hit, sv[pos_c], 0))
        return pa.table(
            {
                "poly_id": pids,
                "n_tiles": n_tiles,
                "n_nodes": n_nodes,
                "sum_chars": sum_chars,
            }
        )

    return (
        pt.map_batches(attach, batch_format="pyarrow")
        .groupby("poly_id")
        .aggregate(
            Sum("n_tiles", alias_name="n_tiles"),
            Sum("n_nodes", alias_name="n_nodes"),
            Sum("sum_chars", alias_name="sum_chars"),
        )
    )


def way_segment_tiles(ways: ray.data.Dataset, zoom: int) -> ray.data.Dataset:
    """Supercover line rasterization: tiles actually CROSSED by each way's
    polyline — tighter than the reference's bbox-span assignment
    (``/root/reference/src/index/grid_reader.go:513-517`` stores bbox only;
    this exceeds reference parity with real geometry).

    Exact separating-axis test per (segment, candidate tile): the x/y axes
    are handled by candidate generation from the segment bbox, and the
    segment-normal axis by the 4-corner cross-product side test — a segment
    intersects the tile rectangle iff not all corners lie strictly on one
    side.  Only multiplies/subtracts, so the DuckDB twin reproduces it
    bit-for-bit.  All work is one numpy broadcast per batch; ways carry
    their geometry as list columns so a way's tiles dedup locally.

    Output: (id, tile) distinct.
    """
    from ..functions.segments import list_parts

    if not 1 <= zoom <= 24:
        # zoom=0 would never terminate the coarse-to-fine loop (it starts
        # at level max(1, zoom-4)); > 24 leaves no row-index headroom in the
        # packed row*nt^2 dedup key (the pack uses the batch-local row
        # index, never the way id, so id magnitude cannot overflow it)
        raise ValueError(f"way_segment_tiles: zoom must be in [1, 24], got {zoom}")

    nt = np.int64(1 << zoom)
    ntf = float(nt)

    def ranges_at(x1, x2, y1, y2, level: int):
        """Per-segment candidate tile spans at ``level`` (floor of the same
        expressions the oracle uses; composes across levels because
        floor(v * 2^L) == floor(v * 2^z) >> (z - L))."""
        f = float(1 << level)
        a0 = np.floor((np.minimum(x1, x2) + 180.0) / 360.0 * f).astype(np.int64)
        a1 = np.floor((np.maximum(x1, x2) + 180.0) / 360.0 * f).astype(np.int64)
        b0 = np.floor((90.0 - np.maximum(y1, y2)) / 180.0 * f).astype(np.int64)
        b1 = np.floor((90.0 - np.minimum(y1, y2)) / 180.0 * f).astype(np.int64)
        return a0, a1, b0, b1

    def corner_hit(seg, tx, ty, x1, y1, x2, y2, level: int):
        """Separating-axis corner test of segment ``seg`` vs tile (tx, ty)
        at ``level``.  The {cr > 0} half-plane is convex, so a hit at a
        child implies a hit at every ancestor — coarse-level pruning drops
        no final tile."""
        f = float(1 << level)
        lon_lo = tx.astype(np.float64) / f * 360.0 - 180.0
        lon_hi = (tx + 1).astype(np.float64) / f * 360.0 - 180.0
        lat_hi = 90.0 - ty.astype(np.float64) / f * 180.0
        lat_lo = 90.0 - (ty + 1).astype(np.float64) / f * 180.0
        dx = x2[seg] - x1[seg]
        dy = y2[seg] - y1[seg]
        rx, ry = x1[seg], y1[seg]

        def cr(cx, cy):
            return dx * (cy - ry) - dy * (cx - rx)

        c1 = cr(lon_lo, lat_lo)
        c2 = cr(lon_lo, lat_hi)
        c3 = cr(lon_hi, lat_lo)
        c4 = cr(lon_hi, lat_hi)
        sep = ((c1 > 0) & (c2 > 0) & (c3 > 0) & (c4 > 0)) | (
            (c1 < 0) & (c2 < 0) & (c3 < 0) & (c4 < 0)
        )
        return ~sep

    COARSE_LEVELS = 4  # start 4 zooms up: 16x fewer seed candidates per axis

    def fn(batch: pa.Table) -> pa.Table:
        # int64 pack bound: the dedup key is row_index * nt^2 + tile — the
        # batch-local ROW index, not the way id (real OSM way ids ~1.4e9
        # would wrap the pack at zoom > ~16). Row counts only exceed the
        # bound at extreme zooms; slice-and-recurse keeps the pack exact.
        max_rows = max(1, (2**63 - 1) // (nt * nt) - 1)
        if len(batch) > max_rows:
            return pa.concat_tables(
                [fn(batch.slice(s, max_rows)) for s in range(0, len(batch), max_rows)]
            )
        lons, off = list_parts(batch["node_lons"])
        lats, _ = list_parts(batch["node_lats"])
        lons = np.asarray(lons, dtype=np.float64)
        lats = np.asarray(lats, dtype=np.float64)
        wid = np.asarray(batch["id"], dtype=np.int64)
        counts = off[1:] - off[:-1]
        # segment k of row i: flat positions off[i]..off[i+1]-2 paired with +1
        valid = np.ones(len(lons), dtype=bool)
        nz = counts > 0
        valid[(off[1:] - 1)[nz]] = False  # a row's last node starts no segment
        si = np.flatnonzero(valid)
        x1, y1, x2, y2 = lons[si], lats[si], lons[si + 1], lats[si + 1]
        seg_row = np.repeat(
            np.arange(len(wid), dtype=np.int64), np.maximum(counts - 1, 0)
        )
        n_seg = len(si)
        if n_seg == 0:
            return pa.table(
                {"id": pa.array([], type=pa.int64()), "tile": pa.array([], type=pa.int64())}
            )

        # seed candidates at the coarse level from segment bboxes
        z0 = max(1, zoom - COARSE_LEVELS)
        a0, a1, b0, b1 = ranges_at(x1, x2, y1, y2, z0)
        w = a1 - a0 + 1
        cnt = w * (b1 - b0 + 1)
        total = int(cnt.sum())
        seg = np.repeat(np.arange(n_seg), cnt)
        offs = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        kk = np.arange(total) - offs[seg]
        tx = a0[seg] + kk % w[seg]
        ty = b0[seg] + kk // w[seg]

        # coarse-to-fine: keep hits, expand to the 4 children, clip to the
        # child level's bbox ranges (exact: range floors compose by shifts)
        level = z0
        while True:
            keep = corner_hit(seg, tx, ty, x1, y1, x2, y2, level)
            seg, tx, ty = seg[keep], tx[keep], ty[keep]
            if level == zoom:
                break
            level += 1
            seg = np.repeat(seg, 4)
            tx = np.repeat(tx * 2, 4) + np.tile([0, 1, 0, 1], len(tx))
            ty = np.repeat(ty * 2, 4) + np.tile([0, 0, 1, 1], len(ty))
            a0, a1, b0, b1 = ranges_at(x1, x2, y1, y2, level)
            inb = (
                (tx >= a0[seg]) & (tx <= a1[seg]) & (ty >= b0[seg]) & (ty <= b1[seg])
            )
            seg, tx, ty = seg[inb], tx[inb], ty[inb]

        key = seg_row[seg] * (nt * nt) + ty * nt + tx
        uk = np.unique(key)
        return pa.table(
            {"id": pa.array(wid[uk // (nt * nt)]), "tile": pa.array(uk % (nt * nt))}
        )

    return ways.select_columns(["id", "node_lons", "node_lats"]).map_batches(
        fn, batch_format="pyarrow"
    )


def tile_focal_density(
    nodes: ray.data.Dataset, zoom: int, radius: int
) -> ray.data.Dataset:
    """Raster focal (moving-window) statistics: for every tile, the count of
    features within the (2*radius+1)^2 tile window centered on it — the
    standard KDE-with-box-kernel / focal-sum raster operator.

    Scale shape: features first collapse to per-tile counts (integer
    partials + a groupby bounded by occupied tiles); each occupied tile then
    scatters its count to its window's tiles — (2r+1)^2 emissions per
    OCCUPIED TILE, not per feature — and one tiny groupby sums the overlaps.
    Grid edges clip (no wraparound), matching the SQL twin's bounds filter.

    Output: (tile, n) for every tile whose window holds >= 1 feature.
    """
    from .geo import tile_id

    n = np.int64(1 << zoom)
    k = 2 * radius + 1

    def count_tiles(batch: pa.Table) -> pa.Table:
        t = tile_id(np.asarray(batch["lon"]), np.asarray(batch["lat"]), zoom)
        tiles, counts = np.unique(t, return_counts=True)
        return pa.table({"tile": tiles, "c": counts.astype(np.int64)})

    per_tile = (
        nodes.select_columns(["lon", "lat"])
        .map_batches(count_tiles, batch_format="pyarrow")
        .groupby("tile")
        .sum("c")
    )

    dx = np.tile(np.arange(-radius, radius + 1), k)
    dy = np.repeat(np.arange(-radius, radius + 1), k)

    def scatter(batch: pa.Table) -> pa.Table:
        t = np.asarray(batch["tile"])
        c = np.asarray(batch["sum(c)"])
        tx = (t % n)[:, None] + dx[None, :]
        ty = (t // n)[:, None] + dy[None, :]
        ok = (tx >= 0) & (tx < n) & (ty >= 0) & (ty < n)
        out_t = (ty * n + tx)[ok]
        out_c = np.broadcast_to(c[:, None], ok.shape)[ok]
        tiles, inv = np.unique(out_t, return_inverse=True)
        sums = np.zeros(len(tiles), dtype=np.int64)
        np.add.at(sums, inv, out_c)
        return pa.table({"tile": tiles, "nw": sums})

    out = per_tile.map_batches(scatter, batch_format="pyarrow").groupby("tile").sum("nw")
    return out.map_batches(
        lambda b: pa.table({"tile": b["tile"], "n": b["sum(nw)"]}),
        batch_format="pyarrow",
    )


def way_polygon_join(
    ways: ray.data.Dataset, polys: list[list[tuple[float, float]]]
) -> ray.data.Dataset:
    """Vector-vector spatial join: (way id, poly_id) pairs whose geometries
    intersect — a way matches a polygon iff any way segment PROPERLY crosses
    a polygon edge (strict orientation sign product, the same formula as
    ``stages/geo.py::segment_cross_join``) or its first node lies inside
    (ray-casting parity, the same formula as ``pip_sql_condition``).  The
    disjunction covers fully-contained ways; touching-only contact is
    excluded on both sides, so the DuckDB twin is exact on generic inputs.

    Scale shape: polygon edges are broadcast once (``ray.put``; the small
    side), ways stream through in batches; per batch, way-bbox x poly-bbox
    prefilter (lossless: a crossing or containment implies bbox overlap),
    then all (candidate, segment, edge) orientation tests run in one numpy
    broadcast with a per-candidate any() reduction.
    """
    from ..functions.segments import list_parts

    n_poly = len(polys)
    ex1, ey1, ex2, ey2, eoff = [], [], [], [], [0]
    pminx, pminy, pmaxx, pmaxy = [], [], [], []
    for poly in polys:
        m = len(poly)
        for i in range(m):
            x1, y1 = poly[i]
            x2, y2 = poly[(i + 1) % m]
            ex1.append(x1), ey1.append(y1), ex2.append(x2), ey2.append(y2)
        eoff.append(eoff[-1] + m)
        xs = [p[0] for p in poly]
        ys = [p[1] for p in poly]
        pminx.append(min(xs)), pminy.append(min(ys))
        pmaxx.append(max(xs)), pmaxy.append(max(ys))
    side = ray.put(
        (
            np.array(ex1), np.array(ey1), np.array(ex2), np.array(ey2),
            np.array(eoff, dtype=np.int64),
            np.array(pminx), np.array(pminy), np.array(pmaxx), np.array(pmaxy),
        )
    )

    def join(batch: pa.Table) -> pa.Table:
        ex1, ey1, ex2, ey2, eoff, pminx, pminy, pmaxx, pmaxy = bget(side)
        empty = pa.table(
            {"id": pa.array([], type=pa.int64()), "poly_id": pa.array([], type=pa.int64())}
        )
        W = len(batch)
        if W == 0:
            return empty
        wid = np.asarray(batch["id"], dtype=np.int64)
        lons, off = list_parts(batch["node_lons"])
        lats, _ = list_parts(batch["node_lats"])
        lons = np.asarray(lons, dtype=np.float64)
        lats = np.asarray(lats, dtype=np.float64)
        wminx = np.asarray(batch["minlon"])
        wminy = np.asarray(batch["minlat"])
        wmaxx = np.asarray(batch["maxlon"])
        wmaxy = np.asarray(batch["maxlat"])
        # bbox prefilter: (way, poly) candidates
        ov = (
            (wminx[:, None] <= pmaxx[None, :])
            & (pminx[None, :] <= wmaxx[:, None])
            & (wminy[:, None] <= pmaxy[None, :])
            & (pminy[None, :] <= wmaxy[:, None])
        )
        cw, cp = np.nonzero(ov)
        if len(cw) == 0:
            return empty
        # a zero-node way has no first vertex: off[i] == off[i+1] would read
        # the NEXT way's first node (or index past the end on the last row)
        has_pts = (np.diff(off) > 0)[cw]
        cw, cp = cw[has_pts], cp[has_pts]
        if len(cw) == 0:
            return empty
        # containment of the way's first node (ray-casting parity)
        fx, fy = lons[off[:-1][cw]], lats[off[:-1][cw]]
        j0, j1 = eoff[cp], eoff[cp + 1]
        ne = j1 - j0
        tot_e = int(ne.sum())
        ci = np.repeat(np.arange(len(cw)), ne)
        eo = np.zeros(len(cw), dtype=np.int64)
        np.cumsum(ne[:-1], out=eo[1:])
        ej = j0[ci] + (np.arange(tot_e) - eo[ci])
        yy1, yy2 = ey1[ej], ey2[ej]
        fxx, fyy = fx[ci], fy[ci]
        with np.errstate(invalid="ignore", divide="ignore"):
            crossing = ((yy1 > fyy) != (yy2 > fyy)) & (
                fxx < (ex2[ej] - ex1[ej]) * (fyy - yy1) / (yy2 - yy1) + ex1[ej]
            )
        ncross = np.zeros(len(cw), dtype=np.int64)
        np.add.at(ncross, ci, crossing)
        inside = (ncross % 2) == 1
        # proper segment x edge crossings
        ns = np.maximum(np.diff(off), 1) - 1
        nseg_c = ns[cw]
        pairs = nseg_c * ne
        tot = int(pairs.sum())
        hit = inside.copy()
        if tot:
            ci2 = np.repeat(np.arange(len(cw)), pairs)
            offs = np.zeros(len(cw), dtype=np.int64)
            np.cumsum(pairs[:-1], out=offs[1:])
            k = np.arange(tot) - offs[ci2]
            sj = off[:-1][cw][ci2] + k // ne[ci2]
            ej2 = j0[ci2] + k % ne[ci2]
            sx1, sy1 = lons[sj], lats[sj]
            sx2, sy2 = lons[sj + 1], lats[sj + 1]
            tx1, ty1 = ex1[ej2], ey1[ej2]
            tx2, ty2 = ex2[ej2], ey2[ej2]
            d1 = np.sign((sx2 - sx1) * (ty1 - sy1) - (sy2 - sy1) * (tx1 - sx1))
            d2 = np.sign((sx2 - sx1) * (ty2 - sy1) - (sy2 - sy1) * (tx2 - sx1))
            d3 = np.sign((tx2 - tx1) * (sy1 - ty1) - (ty2 - ty1) * (sx1 - tx1))
            d4 = np.sign((tx2 - tx1) * (sy2 - ty1) - (ty2 - ty1) * (sx2 - tx1))
            cross = (d1 * d2 < 0) & (d3 * d4 < 0)
            any_cross = np.zeros(len(cw), dtype=bool)
            np.logical_or.at(any_cross, ci2, cross)
            hit |= any_cross
        return pa.table(
            {"id": wid[cw[hit]], "poly_id": cp[hit].astype(np.int64)}
        )

    return ways.select_columns(
        ["id", "node_lons", "node_lats", "minlon", "minlat", "maxlon", "maxlat"]
    ).map_batches(join, batch_format="pyarrow")


def tile_pyramid(
    nodes: ray.data.Dataset, zoom: int, min_zoom: int
) -> ray.data.Dataset:
    """Tile-pyramid aggregation: feature counts per tile at every zoom in
    [min_zoom, zoom] — the overview levels a tile server pre-computes.

    One streaming pass: each batch counts its tiles at the max zoom, then
    derives every coarser level's parents locally (tx//2^d, ty//2^d —
    integer shifts only) and emits (level, tile) partials packed into one
    int64 key, so a single tiny groupby sums ALL levels at once instead of
    one shuffle per level.  Partial volume is occupied-tiles x levels per
    block, never features x levels.

    Output: (zoom, tile, n) int64.
    """
    from .geo import tile_id

    if not 0 <= min_zoom <= zoom <= 24:
        raise ValueError(
            f"tile_pyramid needs 0 <= min_zoom <= zoom <= 24 (got {min_zoom}..{zoom}): "
            "tile ids reach 4^zoom and would collide across the zoom*2^50 key "
            "packing beyond zoom 24"
        )
    n = np.int64(1 << zoom)
    levels = zoom - min_zoom + 1
    PACK = np.int64(1) << np.int64(50)  # tile < 4^zoom <= 2^48 for zoom <= 24 (enforced)

    def partial(batch: pa.Table) -> pa.Table:
        t = tile_id(np.asarray(batch["lon"]), np.asarray(batch["lat"]), zoom)
        tiles, counts = np.unique(t, return_counts=True)
        tx, ty = tiles % n, tiles // n
        keys, vals = [], []
        for d in range(levels):
            nz = n >> d
            pt = (ty >> d) * nz + (tx >> d)
            keys.append(np.int64(zoom - d) * PACK + pt)
            vals.append(counts)
        k = np.concatenate(keys)
        v = np.concatenate(vals).astype(np.int64)
        uk, inv = np.unique(k, return_inverse=True)
        s = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, inv, v)
        return pa.table({"zt": uk, "c": s})

    out = (
        nodes.select_columns(["lon", "lat"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(8)
        .groupby("zt")
        .sum("c")
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "zoom": np.asarray(b["zt"]) // PACK,
                "tile": np.asarray(b["zt"]) % PACK,
                "n": b["sum(c)"],
            }
        ),
        batch_format="pyarrow",
    )


def cell_blobs(
    nodes: ray.data.Dataset,
    min_count: int,
    *,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Blob detection over the density raster: connected-component labeling
    of DENSE grid cells (count >= ``min_count``) under 4-adjacency, each blob
    labeled by its minimum member cell key. Returns (cell, blob, n).

    The raster analogue of the reference's cell-index region machinery
    (``src/index/grid_reader.go:39-78``): contiguous dense areas become one
    region. Distributed plan — every stage is bounded by the number of
    OCCUPIED cells (~6.5M for the whole planet at 0.1 deg), never by input
    rows:

    1. per-batch ``(cell, count)`` partials, repartitioned small, one tiny
       groupby-sum, filter ``n >= min_count``;
    2. 4-adjacency candidate edges by pure key arithmetic (east neighbor =
       ``cell + CELL_PACK``, north = ``cell + 1``; cy never wraps because
       ``|lat|/CELL_H << CELL_PACK``), inner-filtered through the dense set
       with the bucketed int64 lookup (no driver materialization);
    3. hash-min label propagation (``stages.dedup.connected_components``);
    4. labels re-attach to the dense counts with the same bucketed lookup.
    """
    from ray.data.aggregate import Sum

    from ..model import CELL_PACK, cell_of
    from .dedup import connected_components
    from .knn import _attach_int64

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_partitions = max(2, cpus // 2)
    n_buckets = num_partitions * 4

    def partial(batch: pa.Table) -> pa.Table:
        cell = cell_of(
            np.asarray(batch["lon"], dtype=np.float64),
            np.asarray(batch["lat"], dtype=np.float64),
        )
        cells, counts = np.unique(cell, return_counts=True)
        return pa.table(
            {"cell": pa.array(cells), "c": pa.array(counts.astype(np.int64))}
        )

    agg = (
        nodes.select_columns(["lon", "lat"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(8)
        .groupby("cell")
        .aggregate(Sum("c", alias_name="n"))
        .materialize()
    )
    # guard BEFORE the filter: an empty grouped dataset has no schema, so
    # filter(expr="n >= ...") would fail on the missing column
    dense = agg.filter(expr=f"n >= {int(min_count)}").materialize() if agg.count() else agg
    n_dense = dense.count()
    if n_dense == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "cell": pa.array([], type=pa.int64()),
                    "blob": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        )

    def cand_edges(batch: pa.Table) -> pa.Table:
        c = np.asarray(batch["cell"], dtype=np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([c, c])),
                "dst": pa.array(np.concatenate([c + CELL_PACK, c + 1])),
            }
        )

    flag = dense.map_batches(
        lambda b: pa.table(
            {"k": b["cell"], "v": pa.array(np.ones(b.num_rows, dtype=np.int64))}
        ),
        batch_format="pyarrow",
    )
    edges = (
        _attach_int64(
            dense.map_batches(cand_edges, batch_format="pyarrow"),
            flag,
            "dst",
            "ok",
            n_buckets,
        )
        .select_columns(["src", "dst"])
        .rename_columns({"src": "id_a", "dst": "id_b"})
        .materialize()
    )

    np_cc = 1 if n_dense < 2048 else num_partitions
    comp = connected_components(
        dense.rename_columns({"cell": "id"}), edges, num_partitions=np_cc
    )
    lbl = comp.map_batches(
        lambda b: pa.table({"k": b["id"], "v": b["group_id"]}),
        batch_format="pyarrow",
    )
    return _attach_int64(dense, lbl, "cell", "blob", n_buckets).select_columns(
        ["cell", "blob", "n"]
    )


def cell_blob_stats(
    nodes: ray.data.Dataset,
    min_count: int,
    *,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-blob rollup of :func:`cell_blobs`: component size in cells, total
    feature count and the cell-grid bounding box. One extra tiny groupby
    over the dense-cell table (bounded by occupied cells, never input rows).
    Returns (blob, n_cells, n_rows, min_cx, max_cx, min_cy, max_cy).
    """
    from ray.data.aggregate import Max, Min, Sum

    from ..model import unpack_cell

    blobs = cell_blobs(nodes, min_count, num_partitions=num_partitions).materialize()
    if blobs.count() == 0:
        c = lambda: pa.array([], type=pa.int64())
        return ray.data.from_arrow(
            pa.table(
                {
                    "blob": c(), "n_cells": c(), "n_rows": c(),
                    "min_cx": c(), "max_cx": c(), "min_cy": c(), "max_cy": c(),
                }
            )
        )

    def widen(batch: pa.Table) -> pa.Table:
        cell = np.asarray(batch["cell"], dtype=np.int64)
        cx, cy = unpack_cell(cell)
        return pa.table(
            {
                "blob": batch["blob"],
                "one": pa.array(np.ones(len(cell), dtype=np.int64)),
                "n": batch["n"],
                "cx": pa.array(cx),
                "cy": pa.array(cy),
            }
        )

    return (
        blobs.map_batches(widen, batch_format="pyarrow")
        .groupby("blob")
        .aggregate(
            Sum("one", alias_name="n_cells"),
            Sum("n", alias_name="n_rows"),
            Min("cx", alias_name="min_cx"),
            Max("cx", alias_name="max_cx"),
            Min("cy", alias_name="min_cy"),
            Max("cy", alias_name="max_cy"),
        )
    )


def moran_cells(nodes: ray.data.Dataset) -> "pd.DataFrame":
    """Moran's I spatial autocorrelation of per-cell feature counts under
    4-adjacency (rook contiguity), INTEGER-EXACT.

    The classic "is density clustered?" statistic: I = (n/W) * num/den with
    num = sum over adjacent cell pairs of (x_i - mean)(x_j - mean) and
    den = sum of squared deviations. Mean-centering in floats would drift;
    instead every deviation is scaled by n: d_i = n*x_i - S (an INTEGER),
    which multiplies num and den by n^2 — the ratio I is unchanged and every
    distributed sum is exactly associative. Output is the one-row integer
    tuple (n_cells, s_total, num, den, n_pairs); I itself is
    (n_cells / n_pairs) * (num / den) for the caller.

    Scale shape: one histogram groupby bounded by OCCUPIED cells (never input
    rows), two scalar broadcasts (n, S), adjacency by pure key arithmetic
    (east = cell + CELL_PACK, north = cell + 1) through the bucketed int64
    lookup — each undirected pair counted once via the E/N directions.
    int64 bound: |d_i| = |n*x_i - S| must stay below ~3e9 for d_i*d_j to fit
    (occupied-cell count x max cell population < 3e9); beyond that, shard
    the statistic by region or drop to the per-region mean variant.
    """
    import pandas as pd

    from ray.data.aggregate import Count, Sum

    from ..model import CELL_PACK
    from .knn import _attach_int64

    def cell_partial(batch: pa.Table) -> pa.Table:
        c, n = np.unique(np.asarray(batch["cell"], dtype=np.int64), return_counts=True)
        return pa.table({"cell": pa.array(c), "x": pa.array(n.astype(np.int64))})

    hist = (
        nodes.select_columns(["cell"])
        .map_batches(cell_partial, batch_format="pyarrow")
        .repartition(8)
        .groupby("cell")
        .aggregate(Sum("x", alias_name="x"))
        .materialize()
    )
    if hist.count() == 0:
        # zero input nodes: aggregate() on an empty dataset yields no keys
        return pd.DataFrame(
            [{"n_cells": 0, "s_total": 0, "num": 0, "den": 0, "n_pairs": 0}]
        )
    sc = hist.aggregate(Sum("x", alias_name="tot"), Count(alias_name="n"))
    n, tot = int(sc["n"]), int(sc["tot"])

    def dev(batch: pa.Table) -> pa.Table:
        cell = np.asarray(batch["cell"], dtype=np.int64)
        x = np.asarray(batch["x"], dtype=np.int64)
        return pa.table({"cell": pa.array(cell), "dv": pa.array(n * x - tot)})

    d = hist.map_batches(dev, batch_format="pyarrow").materialize()
    keyed = d.map_batches(
        lambda t: pa.table({"k": t["cell"], "v": t["dv"]}), batch_format="pyarrow"
    )

    def with_key(shift: int):
        def fn(batch: pa.Table) -> pa.Table:
            c = np.asarray(batch["cell"], dtype=np.int64)
            return pa.table(
                {"nk": pa.array(c + shift), "dv": batch["dv"]}
            )

        return fn

    def pair_partial(batch: pa.Table) -> pa.Table:
        dv = np.asarray(batch["dv"], dtype=np.int64)
        nb = np.asarray(batch["nb_dv"], dtype=np.int64)
        return pa.table(
            {
                "num": pa.array([int((dv * nb).sum())], type=pa.int64()),
                "n_pairs": pa.array([len(dv)], type=pa.int64()),
            }
        )

    num, n_pairs = 0, 0
    for shift in (CELL_PACK, 1):  # east, north: each undirected pair once
        joined = _attach_int64(
            d.map_batches(with_key(shift), batch_format="pyarrow"),
            keyed,
            "nk",
            "nb_dv",
            32,
        )
        agg = joined.map_batches(pair_partial, batch_format="pyarrow").aggregate(
            Sum("num", alias_name="num"), Sum("n_pairs", alias_name="n_pairs")
        )
        if agg["num"] is not None:
            num += int(agg["num"])
            n_pairs += int(agg["n_pairs"])

    def den_partial(batch: pa.Table) -> pa.Table:
        dv = np.asarray(batch["dv"], dtype=np.int64)
        return pa.table({"den": pa.array([int((dv * dv).sum())], type=pa.int64())})

    den = int(
        d.map_batches(den_partial, batch_format="pyarrow").aggregate(
            Sum("den", alias_name="den")
        )["den"]
    )
    return pd.DataFrame(
        [
            {
                "n_cells": n,
                "s_total": tot,
                "num": num,
                "den": den,
                "n_pairs": n_pairs,
            }
        ]
    )


def getis_ord_gi(nodes: ray.data.Dataset) -> ray.data.Dataset:
    """Getis-Ord Gi* hot-spot components per occupied grid cell, INTEGER-EXACT.

    The per-cell companion to :func:`moran_cells` (which is one global
    statistic): for every occupied cell, the 3x3 queen-contiguity window sum
    of feature counts (self included; empty cells contribute 0) and the
    window cardinality clipped to the occupied-cell bounding rectangle.
    Output ``(cell, x, wsum, wn)`` — the caller forms
    Gi* = (wsum - wn*xbar) / (s*sqrt((n*wn - wn^2)/(n-1))) from these plus
    the global scalars; everything emitted here is an exactly-associative
    integer, so the distributed result replays a SQL window self-join
    bit-for-bit.

    Scale shape: the histogram groupby is bounded by OCCUPIED cells, never
    input rows; window sums come from a 9-offset scatter (self included) +
    one groupby over <= 9x occupied keys; the attach is the bucketed int64
    lookup (no ``Dataset.join``); the region bbox is 4 scalar aggregates.
    Same int64 caution as Moran: cell keys near the packing boundary would
    alias under +-1 arithmetic only if ``cy`` hit 0 or CELL_PACK-1 — the
    equirectangular domain keeps cy strictly interior.
    """
    from ray.data.aggregate import Max, Min, Sum

    from ..model import CELL_PACK, unpack_cell
    from .knn import _attach_int64

    def cell_partial(batch: pa.Table) -> pa.Table:
        c, n = np.unique(np.asarray(batch["cell"], dtype=np.int64), return_counts=True)
        return pa.table({"cell": pa.array(c), "x": pa.array(n.astype(np.int64))})

    hist = (
        nodes.select_columns(["cell"])
        .map_batches(cell_partial, batch_format="pyarrow")
        .repartition(8)
        .groupby("cell")
        .aggregate(Sum("x", alias_name="x"))
        .materialize()
    )

    if hist.count() == 0:
        # zero input nodes: the Min/Max aggregate below would yield None
        # keys (same guard class as moran_cells)
        c = lambda: pa.array([], type=pa.int64())
        return ray.data.from_arrow(
            pa.table({"cell": c(), "x": c(), "wsum": c(), "wn": c()})
        )

    def cxy(batch: pa.Table) -> pa.Table:
        cx, cy = unpack_cell(np.asarray(batch["cell"], dtype=np.int64))
        return pa.table({"cx": pa.array(cx), "cy": pa.array(cy)})

    bb = hist.map_batches(cxy, batch_format="pyarrow").aggregate(
        Min("cx", alias_name="minx"),
        Max("cx", alias_name="maxx"),
        Min("cy", alias_name="miny"),
        Max("cy", alias_name="maxy"),
    )
    minx, maxx, miny, maxy = (int(bb[k]) for k in ("minx", "maxx", "miny", "maxy"))

    def scatter(batch: pa.Table) -> pa.Table:
        cell = np.asarray(batch["cell"], dtype=np.int64)
        x = np.asarray(batch["x"], dtype=np.int64)
        ks, vs = [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                ks.append(cell + dx * CELL_PACK + dy)
                vs.append(x)
        return pa.table(
            {"k": pa.array(np.concatenate(ks)), "v": pa.array(np.concatenate(vs))}
        )

    keyed = (
        hist.map_batches(scatter, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("v", alias_name="v"))
    )
    joined = _attach_int64(hist, keyed, "cell", "wsum", 32)

    def widen(batch: pa.Table) -> pa.Table:
        cell = np.asarray(batch["cell"], dtype=np.int64)
        cx, cy = unpack_cell(cell)
        wnx = np.minimum(cx + 1, maxx) - np.maximum(cx - 1, minx) + 1
        wny = np.minimum(cy + 1, maxy) - np.maximum(cy - 1, miny) + 1
        return batch.append_column("wn", pa.array(wnx * wny))

    return joined.map_batches(widen, batch_format="pyarrow")


def tile_boundary(nodes: ray.data.Dataset, zoom: int) -> ray.data.Dataset:
    """Boundary tiles of the occupied raster set: occupied zoom-``zoom``
    tiles with FEWER than 4 occupied rook neighbors — the raster edge map
    (coastline/perimeter extraction) of the density surface.

    Output ``(tile, n, nb)``: feature count and occupied-4-neighbor count,
    rows where ``nb < 4`` only.  Neighbor occupancy by pure key arithmetic
    (tile = ty*2^z + tx; west/east guard the x seam, north/south fall off
    the keyspace and simply never match).  Every stage is bounded by
    occupied tiles: a 5-entry scatter per occupied tile (self carries 0, so
    isolated tiles still get an nb row), one groupby over the scattered
    keys, and the bucketed int64 lookup for the attach.
    """
    from ray.data.aggregate import Sum

    from .geo import tile_id
    from .knn import _attach_int64

    n_side = np.int64(1 << zoom)

    def tile_partial(batch: pa.Table) -> pa.Table:
        t = tile_id(np.asarray(batch["lon"]), np.asarray(batch["lat"]), zoom)
        tt, cnt = np.unique(t, return_counts=True)
        return pa.table({"tile": pa.array(tt), "n": pa.array(cnt.astype(np.int64))})

    hist = (
        nodes.select_columns(["lon", "lat"])
        .map_batches(tile_partial, batch_format="pyarrow")
        .repartition(8)
        .groupby("tile")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )

    if hist.count() == 0:
        # zero input nodes: the empty grouped dataset has no schema, which
        # would crash _attach_int64 — return the documented empty layout
        c = lambda: pa.array([], type=pa.int64())
        return ray.data.from_arrow(pa.table({"tile": c(), "n": c(), "nb": c()}))

    def scatter(batch: pa.Table) -> pa.Table:
        t = np.asarray(batch["tile"], dtype=np.int64)
        tx = t % n_side
        ks = [t]  # self: counts 0 so isolated tiles still appear
        vs = [np.zeros(len(t), dtype=np.int64)]
        one = np.ones(len(t), dtype=np.int64)
        ks.append(t - n_side)  # north: negative keys never match
        vs.append(one)
        ks.append(t + n_side)  # south: > max key never matches
        vs.append(one)
        west_ok = tx > 0
        ks.append((t - 1)[west_ok])
        vs.append(one[west_ok])
        east_ok = tx < n_side - 1
        ks.append((t + 1)[east_ok])
        vs.append(one[east_ok])
        return pa.table(
            {"k": pa.array(np.concatenate(ks)), "v": pa.array(np.concatenate(vs))}
        )

    keyed = (
        hist.map_batches(scatter, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("v", alias_name="v"))
    )
    joined = _attach_int64(hist, keyed, "tile", "nb", 32)
    return joined.map_batches(
        lambda t: t.filter(pa.compute.less(t["nb"], 4)), batch_format="pyarrow"
    )
