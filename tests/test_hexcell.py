"""Hex cell scheme checks: cube-coordinate invariants, nearest-center
assignment vs brute force, pack/unpack round-trip, covering and ring
supersets, bit-exact agreement with the generated DuckDB SQL twin, and the
scheme plugged into the full query engine."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa

from simple_osm_queries_ray.functions.hexcell import (
    HexCellScheme,
    hex_axial,
    hex_cell,
    hex_cell_sql,
    hex_center,
    hex_pack,
    hex_unpack,
)

SIZE = 0.05


def test_center_round_trips():
    # the center of every cell assigns back to that cell
    q = np.arange(-50, 50, dtype=np.int64)
    r = np.arange(-50, 50, dtype=np.int64)
    qq, rr = np.meshgrid(q, r, indexing="ij")
    qq, rr = qq.ravel(), rr.ravel()
    cx, cy = hex_center(qq, rr, SIZE)
    aq, ar = hex_axial(cx, cy, SIZE)
    assert (aq == qq).all() and (ar == rr).all()


def test_assignment_is_nearest_center():
    # cube rounding picks the hexagon whose center is planar-nearest
    rng = np.random.default_rng(7)
    lon = rng.uniform(-3, 3, 500)
    lat = rng.uniform(-2, 2, 500)
    q, r = hex_axial(lon, lat, SIZE)
    cx, cy = hex_center(q, r, SIZE)
    d_assigned = np.hypot(lon - cx, lat - cy)
    # compare against every center in a local window
    dq, dr = np.meshgrid(np.arange(-2, 3), np.arange(-2, 3), indexing="ij")
    nx, ny = hex_center(
        q[:, None] + dq.ravel()[None, :], r[:, None] + dr.ravel()[None, :], SIZE
    )
    d_best = np.hypot(lon[:, None] - nx, lat[:, None] - ny).min(axis=1)
    assert np.allclose(d_assigned, d_best)


def test_pack_unpack_round_trip():
    rng = np.random.default_rng(5)
    q = rng.integers(-100000, 100000, 1000)
    r = rng.integers(-100000, 100000, 1000)
    c = hex_pack(q, r)
    q2, r2 = hex_unpack(c)
    assert (q2 == q).all() and (r2 == r).all()
    assert len(np.unique(c)) == len(np.unique(q * (1 << 21) + r))


def test_sql_twin_matches_kernel():
    rng = np.random.default_rng(11)
    lon = np.concatenate(
        [rng.uniform(-180, 180, 300), np.array([0.0, 9.95, -180.0, 180.0])]
    )
    lat = np.concatenate(
        [rng.uniform(-90, 90, 300), np.array([0.0, 53.55, -90.0, 90.0])]
    )
    want = hex_cell(lon, lat, SIZE)
    con = duckdb.connect()
    con.register("pts", pa.table({"lon": lon, "lat": lat}))
    got = (
        con.execute(f"SELECT {hex_cell_sql('lon', 'lat', SIZE)} AS c FROM pts")
        .df()["c"]
        .to_numpy()
    )
    assert (got == want).all()


def test_bbox_covering_is_superset():
    scheme = HexCellScheme(SIZE)
    bbox = (9.0, 53.0, 10.0, 54.0)
    cov = scheme.cells_for_bbox(*bbox)
    rng = np.random.default_rng(3)
    lon = rng.uniform(bbox[0], bbox[2], 2000)
    lat = rng.uniform(bbox[1], bbox[3], 2000)
    cells = scheme.cell_of(lon, lat)
    assert np.isin(cells, cov).all()
    # and it is not wildly loose: every covering cell's center is near the box
    q, r = hex_unpack(cov)
    cx, cy = hex_center(q, r, SIZE)
    assert (cx >= bbox[0] - 2 * SIZE).all() and (cx <= bbox[2] + 2 * SIZE).all()


def test_expand_cells_is_superset():
    scheme = HexCellScheme(SIZE)
    rng = np.random.default_rng(9)
    lon0 = rng.uniform(9, 10, 50)
    lat0 = rng.uniform(53, 54, 50)
    base = np.unique(scheme.cell_of(lon0, lat0))
    eps = 0.12
    grown = scheme.expand_cells(base, eps)
    # every point within eps (in each axis) of a base point lands in grown
    theta = rng.uniform(0, 2 * np.pi, 400)
    rad = rng.uniform(0, eps, 400)
    src = rng.integers(0, len(lon0), 400)
    plon = lon0[src] + rad * np.cos(theta)
    plat = lat0[src] + rad * np.sin(theta)
    assert np.isin(scheme.cell_of(plon, plat), grown).all()


def test_assign_hex_stage():
    import ray.data

    from simple_osm_queries_ray.stages.geo import assign_hex

    lon = np.array([9.1, 9.9, 10.4])
    lat = np.array([53.2, 53.8, 54.1])
    ds = ray.data.from_arrow(
        pa.table({"id": np.arange(3, dtype=np.int64), "lon": lon, "lat": lat})
    )
    out = assign_hex(ds, SIZE).to_pandas().sort_values("id")
    assert (out["hcell"].to_numpy() == hex_cell(lon, lat, SIZE)).all()


def test_knn_hex_ring_matches_bruteforce():
    import ray.data

    from simple_osm_queries_ray.stages.knn import knn_hex_ring

    rng = np.random.default_rng(21)
    n = 3000
    lon = rng.uniform(9, 11, n)
    lat = rng.uniform(53, 55, n)
    ids = np.arange(n, dtype=np.int64)
    cells = hex_cell(lon, lat, SIZE)
    ds = ray.data.from_arrow(
        pa.table({"id": ids, "lon": lon, "lat": lat, "cell": cells})
    )
    qp, k = (9.95, 53.55), 7
    got = knn_hex_ring(ds, qp, k, size=SIZE).to_pandas()
    d2 = (lon - qp[0]) ** 2 + (lat - qp[1]) ** 2
    order = np.lexsort((ids, d2))[:k]
    assert got["id"].tolist() == ids[order].tolist()
    assert np.allclose(got["dist2"].to_numpy(), d2[order])


def test_query_engine_on_hex_scheme(tmp_path):
    """The full soq path (bbox covering -> partition-pruned disk reads ->
    tag filter) over a HexCellScheme-built index equals the flat-grid
    answer."""
    from simple_osm_queries_ray.pipelines.build_index import DiskRepo, write_index
    from simple_osm_queries_ray.pipelines.query import QueryEngine
    from simple_osm_queries_ray.sources.repo import build_repo

    sf_dir = "/root/testdata/sf0.001"
    scheme = HexCellScheme(SIZE)
    idx = str(tmp_path / "hexidx")
    write_index(build_repo(sf_dir, cell_scheme=scheme), idx)
    eng = QueryEngine(DiskRepo(idx), cell_scheme=scheme)
    got = (
        eng.execute_string("bbox(9.0,53.0,9.6,53.6).nodes{lang=de}")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    ref_eng = QueryEngine(build_repo(sf_dir))
    want = (
        ref_eng.execute_string("bbox(9.0,53.0,9.6,53.6).nodes{lang=de}")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert got["id"].tolist() == want["id"].tolist()


def test_knn_rings_exhausted_fall_back_to_exact_scan():
    # review r04: max_rings exhausted before the distance bound previously
    # returned silently incomplete / non-nearest results; all three ring
    # searches must finalize with an exact scan instead
    import ray.data

    from simple_osm_queries_ray.stages.knn import (
        knn_cell_ring,
        knn_hex_ring,
        knn_quad_ring,
    )

    # two clusters far apart: rings from the query exhaust long before
    # reaching the far cluster
    lon = np.array([9.01, 9.02, 9.03, 15.01, 15.02, 15.03])
    lat = np.array([53.01, 53.02, 53.03, 58.01, 58.02, 58.03])
    ids = np.arange(6, dtype=np.int64)
    qp, k = (9.0, 53.0), 5
    d2 = (lon - qp[0]) ** 2 + (lat - qp[1]) ** 2
    order = np.lexsort((ids, d2))[:k]

    from simple_osm_queries_ray.functions.hexcell import hex_cell
    from simple_osm_queries_ray.functions.hiercell import QuadCellScheme
    from simple_osm_queries_ray.model import cell_of

    for fn, cells, kw in (
        (knn_cell_ring, cell_of(lon, lat), {}),
        (knn_hex_ring, hex_cell(lon, lat, 0.05), {"size": 0.05}),
        (knn_quad_ring, QuadCellScheme(12).cell_of(lon, lat), {"level": 12}),
    ):
        ds = ray.data.from_arrow(
            pa.table({"id": ids, "lon": lon, "lat": lat, "cell": cells})
        )
        got = fn(ds, qp, k, max_rings=3, **kw).to_pandas()
        assert got["id"].tolist() == ids[order].tolist(), fn.__name__
        assert np.allclose(got["dist2"].to_numpy(), d2[order]), fn.__name__
