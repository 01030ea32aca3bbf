"""Property-based tests (hypothesis) for the round-2 raster / space-filling
kernels: invariants that must hold for ARBITRARY inputs, not just the seeded
fixtures — curve bijectivity, rasterization vs direct PIP, separating-axis
equivalence with a parametric-clipping reference."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from simple_osm_queries_ray.functions.hilbert import hilbert_d, hilbert_xy


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=2**24 - 1),
)
def test_hilbert_roundtrip_property(order, seed):
    n = 1 << order
    rng = np.random.RandomState(seed % 2**31)
    x = rng.randint(0, n, 32)
    y = rng.randint(0, n, 32)
    d = hilbert_d(x, y, order)
    assert (d >= 0).all() and (d < n * n).all()
    rx, ry = hilbert_xy(d, order)
    np.testing.assert_array_equal(rx, x)
    np.testing.assert_array_equal(ry, y)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=2, max_value=7), st.integers(min_value=0, max_value=10**6))
def test_hilbert_locality_property(order, seed):
    """Nearby curve positions are nearby in space: |pos(d) - pos(d+1)| = 1
    for random windows of the curve."""
    n = 1 << order
    rng = np.random.RandomState(seed % 2**31)
    d0 = rng.randint(0, n * n - 8)
    ds = np.arange(d0, d0 + 8)
    xs, ys = hilbert_xy(ds, order)
    steps = np.abs(np.diff(xs)) + np.abs(np.diff(ys))
    np.testing.assert_array_equal(steps, np.ones(7, dtype=np.int64))


def _seg_rect_intersects_param(x1, y1, x2, y2, lo_x, lo_y, hi_x, hi_y):
    """Independent reference: Liang-Barsky parametric clipping."""
    dx, dy = x2 - x1, y2 - y1
    t0, t1 = 0.0, 1.0
    for p, q in (
        (-dx, x1 - lo_x),
        (dx, hi_x - x1),
        (-dy, y1 - lo_y),
        (dy, hi_y - y1),
    ):
        if p == 0:
            if q < 0:
                return False
        else:
            r = q / p
            if p < 0:
                t0 = max(t0, r)
            else:
                t1 = min(t1, r)
            if t0 > t1:
                return False
    return True


@settings(max_examples=300, deadline=None)
@given(
    st.floats(min_value=-5, max_value=5),
    st.floats(min_value=-5, max_value=5),
    st.floats(min_value=-5, max_value=5),
    st.floats(min_value=-5, max_value=5),
)
def test_corner_side_test_equals_parametric_clipping(x1, y1, x2, y2):
    """The engine's bbox-overlap + 4-corner separating-axis test agrees with
    Liang-Barsky clipping on the unit square (up to boundary-touch ties,
    excluded by nudging away from exact contact)."""
    lo_x, lo_y, hi_x, hi_y = 0.0, 0.0, 1.0, 1.0
    # bbox overlap (the candidate-generation axis tests)
    if not (
        min(x1, x2) <= hi_x
        and max(x1, x2) >= lo_x
        and min(y1, y2) <= hi_y
        and max(y1, y2) >= lo_y
    ):
        return
    corners = [(lo_x, lo_y), (lo_x, hi_y), (hi_x, lo_y), (hi_x, hi_y)]
    crs = [(x2 - x1) * (cy - y1) - (y2 - y1) * (cx - x1) for cx, cy in corners]
    if any(abs(c) < 1e-12 for c in crs):
        return  # boundary-touch tie: both definitions are convention-bound
    sat_hit = not (all(c > 0 for c in crs) or all(c < 0 for c in crs))
    lb_hit = _seg_rect_intersects_param(x1, y1, x2, y2, lo_x, lo_y, hi_x, hi_y)
    assert sat_hit == lb_hit


def test_cell_blobs_labeling():
    """L-shaped dense component merges transitively to its min cell key;
    below-threshold neighbors are excluded; isolated dense cells are
    singleton blobs."""
    import pyarrow as pa
    import ray.data

    from simple_osm_queries_ray.model import pack_cell
    from simple_osm_queries_ray.stages.raster import cell_blobs

    def pts(cx, cy, n):
        # n points inside cell (cx, cy)
        return [(cx * 0.1 + 0.05 + i * 1e-4, cy * 0.1 + 0.05) for i in range(n)]

    coords = (
        pts(90, 530, 2)      # dense, part of the L
        + pts(91, 530, 3)    # dense, east neighbor
        + pts(91, 531, 2)    # dense, north of the east arm -> same blob
        + pts(90, 531, 1)    # below threshold: must NOT bridge or appear
        + pts(95, 535, 4)    # dense but isolated -> own blob
    )
    lon = np.array([c[0] for c in coords])
    lat = np.array([c[1] for c in coords])
    ids = np.arange(len(coords), dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"id": ids, "lon": lon, "lat": lat}))
    got = cell_blobs(ds, 2).to_pandas().sort_values("cell").reset_index(drop=True)

    k = lambda cx, cy: int(pack_cell(np.int64(cx), np.int64(cy)))
    want = {
        k(90, 530): (k(90, 530), 2),
        k(91, 530): (k(90, 530), 3),
        k(91, 531): (k(90, 530), 2),
        k(95, 535): (k(95, 535), 4),
    }
    assert len(got) == len(want)
    for _, row in got.iterrows():
        blob, n = want[int(row["cell"])]
        assert int(row["blob"]) == blob and int(row["n"]) == n


def test_cell_blobs_no_dense_cells():
    import pyarrow as pa
    import ray.data

    from simple_osm_queries_ray.stages.raster import cell_blobs

    ds = ray.data.from_arrow(
        pa.table({"id": [1, 2], "lon": [9.05, 10.05], "lat": [53.05, 54.05]})
    )
    out = cell_blobs(ds, 2).to_pandas()
    assert len(out) == 0


def test_cell_blob_stats_rollup():
    import pyarrow as pa
    import ray.data

    from simple_osm_queries_ray.model import pack_cell
    from simple_osm_queries_ray.stages.raster import cell_blob_stats

    def pts(cx, cy, n):
        return [(cx * 0.1 + 0.05 + i * 1e-4, cy * 0.1 + 0.05) for i in range(n)]

    coords = pts(90, 530, 2) + pts(91, 530, 3) + pts(91, 531, 2) + pts(95, 535, 4)
    lon = np.array([c[0] for c in coords])
    lat = np.array([c[1] for c in coords])
    ids = np.arange(len(coords), dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"id": ids, "lon": lon, "lat": lat}))
    got = cell_blob_stats(ds, 2).to_pandas().sort_values("blob").reset_index(drop=True)
    k = lambda cx, cy: int(pack_cell(np.int64(cx), np.int64(cy)))
    assert got["blob"].tolist() == [k(90, 530), k(95, 535)]
    assert got["n_cells"].tolist() == [3, 1]
    assert got["n_rows"].tolist() == [7, 4]
    assert got[["min_cx", "max_cx", "min_cy", "max_cy"]].values.tolist() == [
        [90, 91, 530, 531],
        [95, 95, 535, 535],
    ]


def test_zonal_stats_empty_nodes():
    """Zero input nodes: every polygon reports its tile count with zero
    node/char sums (regression: the empty per-tile aggregate was indexed
    eagerly and raised IndexError)."""
    import pyarrow as pa
    import ray.data as ray_data

    from simple_osm_queries_ray.stages.raster import zonal_stats

    nodes = ray_data.from_arrow(
        pa.table(
            {
                "lon": pa.array([], type=pa.float64()),
                "lat": pa.array([], type=pa.float64()),
                "n_chars": pa.array([], type=pa.int64()),
            }
        )
    )
    polys = [[(9.0, 53.0), (9.5, 53.0), (9.5, 53.5), (9.0, 53.5)]]
    got = zonal_stats(nodes, polys, zoom=10, value_col="n_chars").to_pandas()
    assert len(got) == 1
    assert got["n_nodes"].iloc[0] == 0 and got["sum_chars"].iloc[0] == 0
    assert got["n_tiles"].iloc[0] > 0


def test_tile_pyramid_zoom_guard():
    import pytest as _pytest

    from simple_osm_queries_ray.stages.raster import tile_pyramid

    import ray.data as ray_data

    ds = ray_data.range(1)
    with _pytest.raises(ValueError, match="zoom"):
        tile_pyramid(ds, zoom=25, min_zoom=10)
    with _pytest.raises(ValueError, match="zoom"):
        tile_pyramid(ds, zoom=12, min_zoom=13)


def test_tile_boundary_isolated_and_interior():
    """An isolated occupied tile (nb=0) must appear — the self-scatter
    carries it through the groupby — and a fully surrounded tile (nb=4)
    must NOT. 3x3 occupied block: center is interior, the 8 ring tiles are
    boundary."""
    import pandas as pd
    import ray.data

    from simple_osm_queries_ray.stages.geo import tile_xy
    from simple_osm_queries_ray.stages.raster import tile_boundary

    zoom = 12
    n = 1 << zoom
    # pick a tile well inside the grid near the testdata extent, then
    # synthesize one point per wanted tile at its center
    base_lon, base_lat = 9.5, 53.5
    tx0, ty0 = (int(v[0]) for v in tile_xy(np.array([base_lon]), np.array([base_lat]), zoom))
    tiles = [(tx0 + dx, ty0 + dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    tiles.append((tx0 + 10, ty0 + 10))  # isolated
    lons = [(tx + 0.5) / n * 360.0 - 180.0 for tx, _ in tiles]
    lats = [90.0 - (ty + 0.5) / n * 180.0 for _, ty in tiles]
    ds = ray.data.from_pandas(
        pd.DataFrame({"lon": lons, "lat": lats})
    ).repartition(3)
    out = tile_boundary(ds, zoom).to_pandas().sort_values("tile")
    keys = {ty * n + tx for tx, ty in tiles}
    center = ty0 * n + tx0
    isolated = (ty0 + 10) * n + (tx0 + 10)
    assert set(out["tile"]) == keys - {center}
    assert int(out.loc[out["tile"] == isolated, "nb"].iloc[0]) == 0
    ring = out[out["tile"] != isolated]
    assert (ring["nb"] < 4).all() and (ring["nb"] >= 2).all()


def test_getis_window_clips_at_region_corner():
    """wn at the occupied-region corner is 4 (2x2), edges 6, interior 9;
    wsum over a uniform 3x3 block is the occupied window count."""
    import pandas as pd
    import ray.data

    from simple_osm_queries_ray.model import pack_cell
    from simple_osm_queries_ray.stages.raster import getis_ord_gi

    # one point per cell of a 3x3 occupied block (cell size 0.1 deg)
    lons = [9.05 + 0.1 * i for i in range(3) for _ in range(3)]
    lats = [53.05 + 0.1 * j for _ in range(3) for j in range(3)]
    cells = pack_cell(
        np.floor(np.array(lons) / 0.1).astype(np.int64),
        np.floor(np.array(lats) / 0.1).astype(np.int64),
    )
    ds = ray.data.from_pandas(
        pd.DataFrame({"cell": cells})
    ).repartition(2)
    out = getis_ord_gi(ds).to_pandas().sort_values("cell").reset_index(drop=True)
    assert len(out) == 9
    assert sorted(out["wn"]) == [4, 4, 4, 4, 6, 6, 6, 6, 9]
    # uniform x=1 per cell: wsum == occupied cells in the window == wn here
    np.testing.assert_array_equal(out["wsum"].to_numpy(), out["wn"].to_numpy())
    np.testing.assert_array_equal(out["x"].to_numpy(), np.ones(9, dtype=np.int64))


def test_unpack_cell_signed_roundtrip():
    # review r04: unpack must be the exact inverse of pack for NEGATIVE cy
    # (southern hemisphere) — the naive modulo wrapped cy by +CELL_PACK and
    # shifted cx by -1
    from simple_osm_queries_ray.model import pack_cell, unpack_cell

    cx = np.array([-1800, -1, 0, 1, 100, 1799], dtype=np.int64)
    cy = np.array([-900, -1, 0, 1, -899, 899], dtype=np.int64)
    gx, gy = np.meshgrid(cx, cy)
    packed = pack_cell(gx.ravel(), gy.ravel())
    ux, uy = unpack_cell(packed)
    np.testing.assert_array_equal(ux, gx.ravel())
    np.testing.assert_array_equal(uy, gy.ravel())


def test_getis_southern_hemisphere_window():
    """review r04: the wrapped unpack broke wn for any data with lat < 0 —
    a 3x3 block straddling the equator must read the same wn pattern as the
    northern-block test above."""
    import pandas as pd
    import ray.data

    from simple_osm_queries_ray.model import pack_cell
    from simple_osm_queries_ray.stages.raster import getis_ord_gi

    # 3x3 occupied block with cy in {-1, 0, 1} (lat -0.05, 0.05, 0.15)
    lons = [9.05 + 0.1 * i for i in range(3) for _ in range(3)]
    lats = [-0.05 + 0.1 * j for _ in range(3) for j in range(3)]
    cells = pack_cell(
        np.floor(np.array(lons) / 0.1).astype(np.int64),
        np.floor(np.array(lats) / 0.1).astype(np.int64),
    )
    ds = ray.data.from_pandas(pd.DataFrame({"cell": cells})).repartition(2)
    out = getis_ord_gi(ds).to_pandas().sort_values("cell").reset_index(drop=True)
    assert len(out) == 9
    assert sorted(out["wn"]) == [4, 4, 4, 4, 6, 6, 6, 6, 9]
    np.testing.assert_array_equal(out["wsum"].to_numpy(), out["wn"].to_numpy())


def test_cell_blob_stats_southern_hemisphere_bbox():
    # review r04: blob bbox from wrapped unpack mixed cx-1 with cx and put
    # min_cy/max_cy at 0/99999 for equator-crossing blobs
    import pandas as pd
    import ray.data

    from simple_osm_queries_ray.model import pack_cell
    from simple_osm_queries_ray.stages.raster import cell_blob_stats

    # a vertical 2-cell blob crossing the equator: (cx=100, cy=-1), (100, 0)
    lon = np.repeat([10.05, 10.05], 3)
    lat = np.repeat([-0.05, 0.05], 3)
    ds = ray.data.from_pandas(
        pd.DataFrame({"id": np.arange(6, dtype=np.int64), "lon": lon, "lat": lat})
    ).repartition(2)
    out = cell_blob_stats(ds, 2).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["min_cx"], r["max_cx"]) == (100, 100)
    assert (r["min_cy"], r["max_cy"]) == (-1, 0)
    assert r["n_cells"] == 2 and r["n_rows"] == 6


def test_getis_and_tile_boundary_empty_input():
    import pandas as pd
    import ray.data

    from simple_osm_queries_ray.stages.raster import getis_ord_gi, tile_boundary

    empty_cells = ray.data.from_pandas(
        pd.DataFrame({"cell": np.array([], dtype=np.int64)})
    )
    out = getis_ord_gi(empty_cells)
    assert out.count() == 0
    # NB: Ray's to_pandas drops columns on 0-row datasets; check the schema
    assert out.schema().names == ["cell", "x", "wsum", "wn"]

    empty_pts = ray.data.from_pandas(
        pd.DataFrame(
            {
                "lon": np.array([], dtype=np.float64),
                "lat": np.array([], dtype=np.float64),
            }
        )
    )
    out2 = tile_boundary(empty_pts, 10)
    assert out2.count() == 0
    assert out2.schema().names == ["tile", "n", "nb"]


def test_way_segment_tiles_huge_way_ids_high_zoom():
    # review r04: the dedup key packed way_id * 4^zoom — real OSM way ids
    # (~1.4e9) wrapped int64 at zoom 20 and returned garbage ids; the pack
    # now uses the batch-local row index. Same ways under tiny ids must
    # yield identical tile sets under huge ids.
    import pandas as pd
    import ray.data

    from simple_osm_queries_ray.stages.raster import way_segment_tiles

    rng = np.random.RandomState(3)
    n = 20
    lons = [list(9.0 + rng.rand(3) * 0.01) for _ in range(n)]
    lats = [list(53.0 + rng.rand(3) * 0.01) for _ in range(n)]
    small = pd.DataFrame(
        {"id": np.arange(n, dtype=np.int64), "node_lons": lons, "node_lats": lats}
    )
    huge = small.assign(id=small["id"] + 1_400_000_000)
    zoom = 20
    a = (
        way_segment_tiles(ray.data.from_pandas(small), zoom)
        .to_pandas()
        .sort_values(["id", "tile"])
        .reset_index(drop=True)
    )
    b = (
        way_segment_tiles(ray.data.from_pandas(huge), zoom)
        .to_pandas()
        .sort_values(["id", "tile"])
        .reset_index(drop=True)
    )
    assert (b["id"] - a["id"] == 1_400_000_000).all()
    np.testing.assert_array_equal(a["tile"].to_numpy(), b["tile"].to_numpy())
    assert (a["id"] >= 0).all() and (b["id"] >= 1_400_000_000).all()
