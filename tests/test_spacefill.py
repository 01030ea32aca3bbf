"""Hilbert curve index, locality sharding, and polygon rasterization.

Brute-force checks: the numpy Hilbert kernel against the textbook scalar
loop, unit-step adjacency (the locality property range sharding relies
on), NTILE-exact shard assignment against pandas, and scanline
rasterization against per-tile point-in-polygon evaluated directly.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data

from simple_osm_queries_ray.functions.hilbert import (
    extent_grid_xy,
    hilbert_d,
    hilbert_sql_ctes,
    hilbert_xy,
)
from simple_osm_queries_ray.stages.raster import polygon_raster_tiles
from simple_osm_queries_ray.stages.spacefill import (
    _ntile_starts,
    assign_hilbert,
    hilbert_shards,
)


def _scalar_hilbert(x: int, y: int, order: int) -> int:
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_scalar_reference():
    order = 5
    n = 1 << order
    gx, gy = np.meshgrid(np.arange(n), np.arange(n))
    gx, gy = gx.ravel(), gy.ravel()
    got = hilbert_d(gx, gy, order)
    exp = np.array([_scalar_hilbert(int(a), int(b), order) for a, b in zip(gx, gy)])
    np.testing.assert_array_equal(got, exp)


def test_hilbert_bijection_and_roundtrip():
    order = 6
    n = 1 << order
    gx, gy = np.meshgrid(np.arange(n), np.arange(n))
    gx, gy = gx.ravel(), gy.ravel()
    d = hilbert_d(gx, gy, order)
    assert len(np.unique(d)) == n * n
    assert d.min() == 0 and d.max() == n * n - 1
    rx, ry = hilbert_xy(d, order)
    np.testing.assert_array_equal(rx, gx)
    np.testing.assert_array_equal(ry, gy)


def test_hilbert_unit_steps():
    """Consecutive curve positions are grid neighbors — the locality
    property that makes contiguous ranges spatially compact."""
    order = 5
    n = 1 << order
    gx, gy = np.meshgrid(np.arange(n), np.arange(n))
    d = hilbert_d(gx.ravel(), gy.ravel(), order)
    pos = np.empty((n * n, 2), dtype=np.int64)
    pos[d] = np.stack([gx.ravel(), gy.ravel()], axis=1)
    steps = np.abs(np.diff(pos, axis=0)).sum(axis=1)
    assert (steps == 1).all()


def test_hilbert_sql_twin_matches_numpy():
    duckdb = pytest.importorskip("duckdb")
    order = 7
    rng = np.random.RandomState(3)
    n = 1 << order
    x = rng.randint(0, n, 500)
    y = rng.randint(0, n, 500)
    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"x": x, "y": y, "id": np.arange(500)}))
    ctes, fin = hilbert_sql_ctes(order, "pts", "x", "y", ["id"])
    got = con.sql(f"WITH {ctes} SELECT hd FROM {fin} ORDER BY id").fetchnumpy()["hd"]
    np.testing.assert_array_equal(got, hilbert_d(x, y, order))


def test_ntile_starts_matches_sql_semantics():
    # 10 rows, 4 buckets -> sizes 3,3,2,2 -> starts 0,3,6,8
    np.testing.assert_array_equal(_ntile_starts(10, 4), [0, 3, 6, 8])
    np.testing.assert_array_equal(_ntile_starts(8, 4), [0, 2, 4, 6])
    np.testing.assert_array_equal(_ntile_starts(3, 4), [0, 1, 2, 3])


def _pandas_ntile(df: pd.DataFrame, k: int) -> pd.Series:
    order = df.sort_values(["hd", "id"]).index
    n = len(df)
    starts = _ntile_starts(n, k)
    ranks = pd.Series(np.arange(n), index=order)
    return ranks.map(lambda r: int(np.searchsorted(starts, r, side="right") - 1))


@pytest.mark.parametrize("k", [4, 7, 32])
def test_hilbert_shards_exact_ntile(k):
    rng = np.random.RandomState(11)
    n = 2000
    df = pd.DataFrame(
        {
            "id": np.arange(n),
            "lon": 9.0 + rng.rand(n) * 2,
            "lat": 53.0 + rng.rand(n) * 2,
        }
    )
    ds = ray.data.from_pandas(df)
    got = hilbert_shards(ds, k=k, order=6).to_pandas().sort_values("id")
    gx, gy = extent_grid_xy(df["lon"].to_numpy(), df["lat"].to_numpy(), 6)
    hd = hilbert_d(gx, gy, 6)
    ref = pd.DataFrame({"id": df["id"], "hd": hd})
    exp_shard = _pandas_ntile(ref, k)
    np.testing.assert_array_equal(got["hd"].to_numpy(), hd)
    np.testing.assert_array_equal(
        got["shard"].to_numpy(), exp_shard.sort_index().to_numpy()
    )
    # equal-count property
    sizes = got.groupby("shard").size()
    assert sizes.max() - sizes.min() <= 1
    assert len(sizes) == k


def test_hilbert_shards_are_spatially_contiguous_ranges():
    """Each shard covers one contiguous hd range (range partitioning)."""
    rng = np.random.RandomState(5)
    n = 1500
    df = pd.DataFrame(
        {"id": np.arange(n), "lon": 9.0 + rng.rand(n) * 2, "lat": 53.0 + rng.rand(n) * 2}
    )
    got = hilbert_shards(ray.data.from_pandas(df), k=8, order=6).to_pandas()
    g = got.sort_values(["hd", "id"])
    # shards are non-decreasing along the curve order
    assert (np.diff(g["shard"].to_numpy()) >= 0).all()


def test_assign_hilbert_column():
    df = pd.DataFrame({"id": [0, 1], "lon": [9.0, 10.99], "lat": [53.0, 54.99]})
    out = assign_hilbert(ray.data.from_pandas(df), order=4).to_pandas()
    gx, gy = extent_grid_xy(df["lon"].to_numpy(), df["lat"].to_numpy(), 4)
    np.testing.assert_array_equal(out["hd"].to_numpy(), hilbert_d(gx, gy, 4))


# -- polygon rasterization ---------------------------------------------------


def _pip(poly, px, py) -> bool:
    inside = False
    m = len(poly)
    for i in range(m):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % m]
        if ((y1 > py) != (y2 > py)) and px < (x2 - x1) * (py - y1) / (y2 - y1) + x1:
            inside = not inside
    return inside


def _brute_tiles(polys, zoom):
    n = 1 << zoom
    rows = []
    for pid, poly in enumerate(polys):
        xs = [p[0] for p in poly]
        ys = [p[1] for p in poly]
        tx0 = int(np.floor((min(xs) + 180.0) / 360.0 * n))
        tx1 = int(np.floor((max(xs) + 180.0) / 360.0 * n))
        ty0 = int(np.floor((90.0 - max(ys)) / 180.0 * n))
        ty1 = int(np.floor((90.0 - min(ys)) / 180.0 * n))
        for ty in range(ty0, ty1 + 1):
            cy = 90.0 - (ty + 0.5) / n * 180.0
            for tx in range(tx0, tx1 + 1):
                cx = (tx + 0.5) / n * 360.0 - 180.0
                if _pip(poly, cx, cy):
                    rows.append((pid, ty * n + tx, tx, ty))
    return pd.DataFrame(rows, columns=["poly_id", "tile", "tx", "ty"])


def test_polygon_raster_tiles_matches_brute_force():
    from simple_osm_queries_ray.sources.synthetic import synthetic_polygons

    polys = synthetic_polygons(8)
    got = (
        polygon_raster_tiles(polys, zoom=11)
        .to_pandas()
        .sort_values(["poly_id", "tile"])
        .reset_index(drop=True)
    )
    exp = (
        _brute_tiles(polys, 11).sort_values(["poly_id", "tile"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))
    assert len(got) > 100  # non-trivial coverage


def test_polygon_raster_concave_polygon():
    # U-shaped concave polygon: the notch tiles must be excluded
    poly = [
        (9.0, 53.0),
        (9.5, 53.0),
        (9.5, 53.4),
        (9.35, 53.4),
        (9.35, 53.1),
        (9.15, 53.1),
        (9.15, 53.4),
        (9.0, 53.4),
    ]
    got = polygon_raster_tiles([poly], zoom=12).to_pandas()
    exp = _brute_tiles([poly], 12)
    assert set(map(tuple, got[["tile"]].values.tolist())) == set(
        map(tuple, exp[["tile"]].values.tolist())
    )
    # a center in the notch: (9.25, 53.3) -> its tile must be absent
    n = 1 << 12
    ntx = int(np.floor((9.25 + 180.0) / 360.0 * n))
    nty = int(np.floor((90.0 - 53.3) / 180.0 * n))
    assert nty * n + ntx not in set(got["tile"])


def test_polygon_raster_ragged_vertex_counts():
    tri = [(10.0, 54.0), (10.3, 54.0), (10.15, 54.3)]
    quad = [(9.0, 53.0), (9.4, 53.0), (9.4, 53.4), (9.0, 53.4)]
    got = polygon_raster_tiles([tri, quad], zoom=12).to_pandas()
    exp = _brute_tiles([tri, quad], 12)
    for pid in (0, 1):
        assert set(got.loc[got.poly_id == pid, "tile"]) == set(
            exp.loc[exp.poly_id == pid, "tile"]
        )


# -- zonal stats and way supercover tiles ------------------------------------


def test_zonal_stats_matches_brute_force():
    from simple_osm_queries_ray.sources.synthetic import synthetic_polygons
    from simple_osm_queries_ray.stages.geo import tile_id
    from simple_osm_queries_ray.stages.raster import zonal_stats

    rng = np.random.RandomState(2)
    n = 3000
    df = pd.DataFrame(
        {
            "lon": 9.0 + rng.rand(n) * 2,
            "lat": 53.0 + rng.rand(n) * 2,
            "n_chars": rng.randint(1, 500, n),
        }
    )
    polys = synthetic_polygons(6)
    zoom = 11
    got = (
        zonal_stats(ray.data.from_pandas(df), polys, zoom)
        .to_pandas()
        .sort_values("poly_id")
        .reset_index(drop=True)
    )
    # brute force: tile -> aggregate, polygon tiles -> left join
    t = tile_id(df["lon"].to_numpy(), df["lat"].to_numpy(), zoom)
    agg = (
        pd.DataFrame({"tile": t, "n_chars": df["n_chars"]})
        .groupby("tile")
        .agg(nn=("n_chars", "size"), sc=("n_chars", "sum"))
        .reset_index()
    )
    pt = _brute_tiles(polys, zoom)
    m = pt.merge(agg, on="tile", how="left").fillna(0)
    exp = (
        m.groupby("poly_id")
        .agg(
            n_tiles=("tile", "size"), n_nodes=("nn", "sum"), sum_chars=("sc", "sum")
        )
        .reset_index()
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got.astype("int64"), exp)


def _seg_hits_tile(x1, y1, x2, y2, tx, ty, zoom):
    n = 1 << zoom
    lon_lo = tx / n * 360.0 - 180.0
    lon_hi = (tx + 1) / n * 360.0 - 180.0
    lat_hi = 90.0 - ty / n * 180.0
    lat_lo = 90.0 - (ty + 1) / n * 180.0
    crs = [
        (x2 - x1) * (cy - y1) - (y2 - y1) * (cx - x1)
        for cx, cy in [(lon_lo, lat_lo), (lon_lo, lat_hi), (lon_hi, lat_lo), (lon_hi, lat_hi)]
    ]
    return not (all(c > 0 for c in crs) or all(c < 0 for c in crs))


def _brute_way_tiles(ways, zoom):
    n = 1 << zoom
    out = set()
    for wid, pts in ways:
        for (x1, y1), (x2, y2) in zip(pts, pts[1:]):
            tx0 = int(np.floor((min(x1, x2) + 180.0) / 360.0 * n))
            tx1 = int(np.floor((max(x1, x2) + 180.0) / 360.0 * n))
            ty0 = int(np.floor((90.0 - max(y1, y2)) / 180.0 * n))
            ty1 = int(np.floor((90.0 - min(y1, y2)) / 180.0 * n))
            for ty in range(ty0, ty1 + 1):
                for tx in range(tx0, tx1 + 1):
                    if _seg_hits_tile(x1, y1, x2, y2, tx, ty, zoom):
                        out.add((wid, ty * n + tx))
    return out


def _ways_ds(ways):
    import pyarrow as pa

    return ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([w for w, _ in ways], type=pa.int64()),
                "node_lons": pa.array(
                    [[p[0] for p in pts] for _, pts in ways],
                    type=pa.list_(pa.float64()),
                ),
                "node_lats": pa.array(
                    [[p[1] for p in pts] for _, pts in ways],
                    type=pa.list_(pa.float64()),
                ),
            }
        )
    )


def test_way_segment_tiles_matches_brute_force():
    from simple_osm_queries_ray.stages.raster import way_segment_tiles

    rng = np.random.RandomState(9)
    ways = []
    for wid in range(20):
        m = rng.randint(2, 8)
        pts = list(
            zip(9.0 + rng.rand(m) * 2, 53.0 + rng.rand(m) * 2)
        )
        ways.append((wid, pts))
    got = way_segment_tiles(_ways_ds(ways), zoom=10).to_pandas()
    exp = _brute_way_tiles(ways, 10)
    assert set(zip(got["id"], got["tile"])) == exp


def test_way_segment_tiles_diagonal_is_tighter_than_bbox():
    """A long diagonal: supercover tiles ~ O(n), bbox span ~ O(n^2)."""
    from simple_osm_queries_ray.stages.raster import way_segment_tiles

    ways = [(7, [(9.0, 53.0), (10.5, 54.5)])]
    zoom = 12
    got = way_segment_tiles(_ways_ds(ways), zoom).to_pandas()
    n = 1 << zoom
    tx0 = int(np.floor((9.0 + 180.0) / 360.0 * n))
    tx1 = int(np.floor((10.5 + 180.0) / 360.0 * n))
    ty0 = int(np.floor((90.0 - 54.5) / 180.0 * n))
    ty1 = int(np.floor((90.0 - 53.0) / 180.0 * n))
    bbox_tiles = (tx1 - tx0 + 1) * (ty1 - ty0 + 1)
    assert len(got) < bbox_tiles / 4  # dramatically tighter
    assert set(zip(got["id"], got["tile"])) == _brute_way_tiles(ways, zoom)


def test_way_segment_tiles_single_point_way():
    """Degenerate duplicate-node segment rasterizes its containing tile."""
    from simple_osm_queries_ray.stages.geo import tile_id
    from simple_osm_queries_ray.stages.raster import way_segment_tiles

    ways = [(3, [(9.5, 53.5), (9.5, 53.5)])]
    got = way_segment_tiles(_ways_ds(ways), zoom=12).to_pandas()
    t = tile_id(np.array([9.5]), np.array([53.5]), 12)[0]
    assert set(zip(got["id"], got["tile"])) == {(3, t)}


def test_tile_focal_density_matches_brute_force():
    from simple_osm_queries_ray.stages.geo import tile_id
    from simple_osm_queries_ray.stages.raster import tile_focal_density

    rng = np.random.RandomState(6)
    n_pts, zoom, r = 2000, 10, 2
    df = pd.DataFrame(
        {"lon": 9.0 + rng.rand(n_pts) * 2, "lat": 53.0 + rng.rand(n_pts) * 2}
    )
    got = (
        tile_focal_density(ray.data.from_pandas(df), zoom, r)
        .to_pandas()
        .sort_values("tile")
        .reset_index(drop=True)
    )
    n = 1 << zoom
    t = tile_id(df["lon"].to_numpy(), df["lat"].to_numpy(), zoom)
    counts = pd.Series(t).value_counts()
    acc = {}
    for tile, c in counts.items():
        tx, ty = tile % n, tile // n
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                if 0 <= tx + dx < n and 0 <= ty + dy < n:
                    k = (ty + dy) * n + (tx + dx)
                    acc[k] = acc.get(k, 0) + int(c)
    exp = (
        pd.DataFrame(sorted(acc.items()), columns=["tile", "n"])
        .astype("int64")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), exp)
    # window sums dominate the center count
    center = counts.reindex(got["tile"]).fillna(0).to_numpy()
    assert (got["n"].to_numpy() >= center).all()


# -- partitioned layout: write waves, resume, pruned reads --------------------


def _pts_df(n=1200, seed=13):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "id": np.arange(n),
            "lon": 9.0 + rng.rand(n) * 2,
            "lat": 53.0 + rng.rand(n) * 2,
            "payload": rng.randint(0, 1000, n),
        }
    )


def test_write_hilbert_partitioned_roundtrip_and_resume(tmp_path):
    import json
    import os

    from simple_osm_queries_ray.stages.spacefill import write_hilbert_partitioned

    df = _pts_df()
    out = str(tmp_path / "hp")
    k = 8
    man = write_hilbert_partitioned(
        ray.data.from_pandas(df), out, k=k, order=6, waves=3
    )
    # every shard dir exists with the exact NTILE row count
    sizes = {}
    for s in range(k):
        d = f"{out}/data/shard={s}"
        assert os.path.isdir(d)
        sizes[s] = ray.data.read_parquet(d).count()
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert sum(sizes.values()) == len(df)
    # round trip: all ids exactly once
    back = ray.data.read_parquet(f"{out}/data").to_pandas()
    assert sorted(back["id"]) == sorted(df["id"])
    # manifest recorded all waves with lineage
    m = json.load(open(f"{out}/manifest.json"))
    assert m["meta"]["k"] == k and len(m["meta"]["shard_hd"]) == k
    assert sum(w["rows"] for w in m["waves"].values()) == len(df)
    # resume: a rerun skips every recorded wave (no files rewritten)
    mtimes = {
        f: os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(out)
        for f in fs
        if f.endswith(".parquet")
    }
    write_hilbert_partitioned(ray.data.from_pandas(df), out, k=k, order=6, waves=3)
    mtimes2 = {
        f: os.path.getmtime(os.path.join(r, f))
        for r, _, fs in os.walk(out)
        for f in fs
        if f.endswith(".parquet")
    }
    assert mtimes == mtimes2


def test_hilbert_pruned_bbox_read(tmp_path):
    import json

    from simple_osm_queries_ray.stages.spacefill import (
        read_hilbert_shards,
        shards_for_bbox,
        write_hilbert_partitioned,
    )

    df = _pts_df(3000, seed=21)
    out = str(tmp_path / "hp2")
    k = 16
    write_hilbert_partitioned(ray.data.from_pandas(df), out, k=k, order=6, waves=4)
    m = json.load(open(f"{out}/manifest.json"))
    bounds = [tuple(b) for b in m["meta"]["shard_hd"]]
    bbox = (9.1, 53.1, 9.35, 53.35)
    shards = shards_for_bbox(bbox, bounds, order=6)
    # locality: a small bbox touches a strict minority of the shards
    assert 0 < len(shards) < k // 2
    got = read_hilbert_shards(out, shards).to_pandas()
    got = got[
        (got["lon"] >= bbox[0])
        & (got["lon"] <= bbox[2])
        & (got["lat"] >= bbox[1])
        & (got["lat"] <= bbox[3])
    ]
    exp = df[
        (df["lon"] >= bbox[0])
        & (df["lon"] <= bbox[2])
        & (df["lat"] >= bbox[1])
        & (df["lat"] <= bbox[3])
    ]
    assert sorted(got["id"]) == sorted(exp["id"])
    assert len(exp) > 0


def test_way_polygon_join_matches_brute_force():
    from simple_osm_queries_ray.sources.synthetic import synthetic_polygons
    from simple_osm_queries_ray.stages.raster import way_polygon_join

    rng = np.random.RandomState(17)
    ways = []
    for wid in range(40):
        m = rng.randint(2, 6)
        ways.append((wid, list(zip(9.0 + rng.rand(m) * 2, 53.0 + rng.rand(m) * 2))))
    polys = synthetic_polygons(6)
    import pyarrow as pa

    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([w for w, _ in ways], type=pa.int64()),
                "node_lons": pa.array(
                    [[p[0] for p in pts] for _, pts in ways], type=pa.list_(pa.float64())
                ),
                "node_lats": pa.array(
                    [[p[1] for p in pts] for _, pts in ways], type=pa.list_(pa.float64())
                ),
                "minlon": pa.array([min(p[0] for p in pts) for _, pts in ways]),
                "minlat": pa.array([min(p[1] for p in pts) for _, pts in ways]),
                "maxlon": pa.array([max(p[0] for p in pts) for _, pts in ways]),
                "maxlat": pa.array([max(p[1] for p in pts) for _, pts in ways]),
            }
        )
    )
    got = way_polygon_join(ds, polys).to_pandas()

    def proper_cross(a, b, c, d):
        def s(p, q, r):
            return np.sign((q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0]))

        return s(a, b, c) * s(a, b, d) < 0 and s(c, d, a) * s(c, d, b) < 0

    exp = set()
    for wid, pts in ways:
        for pid, poly in enumerate(polys):
            hit = _pip(poly, pts[0][0], pts[0][1])
            if not hit:
                m = len(poly)
                for sa, sb in zip(pts, pts[1:]):
                    for i in range(m):
                        if proper_cross(sa, sb, poly[i], poly[(i + 1) % m]):
                            hit = True
                            break
                    if hit:
                        break
            if hit:
                exp.add((wid, pid))
    assert set(zip(got["id"], got["poly_id"])) == exp
    assert len(exp) > 10


def test_tile_pyramid_matches_brute_force():
    from simple_osm_queries_ray.stages.geo import tile_id
    from simple_osm_queries_ray.stages.raster import tile_pyramid

    rng = np.random.RandomState(8)
    n_pts, zoom, min_zoom = 2500, 10, 7
    df = pd.DataFrame(
        {"lon": 9.0 + rng.rand(n_pts) * 2, "lat": 53.0 + rng.rand(n_pts) * 2}
    )
    got = (
        tile_pyramid(ray.data.from_pandas(df), zoom, min_zoom)
        .to_pandas()
        .sort_values(["zoom", "tile"])
        .reset_index(drop=True)
    )
    rows = []
    for z in range(min_zoom, zoom + 1):
        t = tile_id(df["lon"].to_numpy(), df["lat"].to_numpy(), z)
        for tile, c in pd.Series(t).value_counts().items():
            rows.append((z, int(tile), int(c)))
    exp = (
        pd.DataFrame(rows, columns=["zoom", "tile", "n"])
        .sort_values(["zoom", "tile"])
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got.astype("int64"), exp)
    # conservation: every level's counts sum to the point count
    assert (got.groupby("zoom")["n"].sum() == n_pts).all()


def test_cell_top_lang_mode_and_tiebreak():
    import pyarrow as pa

    from simple_osm_queries_ray.stages.text import cell_top_lang

    # cell 1: b wins by count; cell 2: tie between a and c -> a (lang asc)
    tbl = pa.table(
        {
            "cell": pa.array([1, 1, 1, 2, 2, 2, 2], type=pa.int64()),
            "lang": ["a", "b", "b", "c", "a", "c", "a"],
        }
    )
    got = (
        cell_top_lang(ray.data.from_arrow(tbl))
        .to_pandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    assert got.to_dict("records") == [
        {"cell": 1, "lang": "b", "n": 2},
        {"cell": 2, "lang": "a", "n": 2},
    ]


def test_write_hilbert_partitioned_crash_resume_no_duplicates(tmp_path):
    """A crash mid-wave (partial parquet files present, wave NOT in the
    manifest) must not duplicate rows on rerun: the rerun clears the
    unrecorded wave's shard dirs before rewriting."""
    import json
    import os
    import shutil

    from simple_osm_queries_ray.stages.spacefill import write_hilbert_partitioned

    df = _pts_df()
    out = str(tmp_path / "hp")
    k = 8
    write_hilbert_partitioned(ray.data.from_pandas(df), out, k=k, order=6, waves=3)

    # simulate the crash: un-record the middle wave and plant a stray
    # partial file in one of its shard dirs (what an interrupted
    # write_parquet leaves behind)
    mpath = f"{out}/manifest.json"
    m = json.load(open(mpath))
    victim = sorted(m["waves"])[1]
    lo = int(victim.split("_")[1])
    del m["waves"][victim]
    json.dump(m, open(mpath, "w"))
    shard_dir = f"{out}/data/shard={lo}"
    src = next(f for f in os.listdir(shard_dir) if f.endswith(".parquet"))
    shutil.copy(f"{shard_dir}/{src}", f"{shard_dir}/stray_partial_{src}")

    write_hilbert_partitioned(ray.data.from_pandas(df), out, k=k, order=6, waves=3)
    back = ray.data.read_parquet(f"{out}/data").to_pandas()
    assert sorted(back["id"]) == sorted(df["id"])  # exactly once each


def test_plan_shards_bucketed_rank_selection_matches_pull(monkeypatch):
    # review r04: straddled cells can be corpus-scaled — above
    # _STRADDLE_PULL_LIMIT the plan resolves cut ids via the 3-pass
    # bucketed rank selection instead of pulling every (hd, id) row to the
    # driver. The two paths must assign IDENTICAL shards.
    import simple_osm_queries_ray.stages.spacefill as sp

    rng = np.random.RandomState(7)
    n = 3000
    # concentrate points so several Hilbert cells straddle shard cuts, and
    # use non-contiguous ids so rank-by-id is non-trivial
    df = pd.DataFrame(
        {
            "id": rng.permutation(np.arange(n) * 17 + 3),
            "lon": 9.0 + rng.rand(n) * 0.02,
            "lat": 53.0 + rng.rand(n) * 2.0,
        }
    )
    ds = ray.data.from_pandas(df)
    base = hilbert_shards(ds, k=16, order=6).to_pandas().sort_values("id")

    monkeypatch.setattr(sp, "_STRADDLE_PULL_LIMIT", 0)  # force bucketed path
    bucketed = hilbert_shards(ds, k=16, order=6).to_pandas().sort_values("id")

    np.testing.assert_array_equal(
        base["shard"].to_numpy(), bucketed["shard"].to_numpy()
    )
    sizes = bucketed.groupby("shard").size()
    assert sizes.max() - sizes.min() <= 1


def test_way_polygon_join_skips_zero_node_ways():
    # review r04: a zero-node way with a (stale) bbox overlapping a polygon
    # read the NEXT way's first vertex — or indexed past the end on the
    # last row
    import pyarrow as pa

    from simple_osm_queries_ray.sources.synthetic import synthetic_polygons
    from simple_osm_queries_ray.stages.raster import way_polygon_join

    polys = synthetic_polygons(6)
    # way 0: empty node list, bbox covering everything; way 1: a normal way
    ds = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([0, 1], type=pa.int64()),
                "node_lons": pa.array([[], [9.5, 9.6]], type=pa.list_(pa.float64())),
                "node_lats": pa.array([[], [53.5, 53.6]], type=pa.list_(pa.float64())),
                "minlon": pa.array([0.0, 9.5]),
                "minlat": pa.array([0.0, 53.5]),
                "maxlon": pa.array([20.0, 9.6]),
                "maxlat": pa.array([90.0, 53.6]),
            }
        )
    )
    got = way_polygon_join(ds, polys).to_pandas()
    assert (got["id"] != 0).all()  # the empty way must emit nothing

    # empty way as the LAST row previously indexed past the flat buffer
    ds2 = ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 0], type=pa.int64()),
                "node_lons": pa.array([[9.5, 9.6], []], type=pa.list_(pa.float64())),
                "node_lats": pa.array([[53.5, 53.6], []], type=pa.list_(pa.float64())),
                "minlon": pa.array([9.5, 0.0]),
                "minlat": pa.array([53.5, 0.0]),
                "maxlon": pa.array([9.6, 20.0]),
                "maxlat": pa.array([53.6, 90.0]),
            }
        )
    )
    got2 = way_polygon_join(ds2, polys).to_pandas()
    assert (got2["id"] != 0).all()
    assert got.sort_values(["id", "poly_id"]).reset_index(drop=True).equals(
        got2.sort_values(["id", "poly_id"]).reset_index(drop=True)
    )
