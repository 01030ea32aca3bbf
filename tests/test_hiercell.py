"""Hierarchical quad-cell (H3/S2-style) encoding invariants."""

import numpy as np

from simple_osm_queries_ray.functions.hiercell import (
    covering_to_max_level,
    morton,
    quad_cell,
    quad_cell_bounds,
    quad_children,
    quad_covering,
    quad_level,
    quad_parent,
)

rng = np.random.RandomState(11)
LON = 9.0 + rng.rand(500) * 2
LAT = 53.0 + rng.rand(500) * 2


def test_morton_roundtrip_and_locality():
    tx = rng.randint(0, 1 << 20, 1000)
    ty = rng.randint(0, 1 << 20, 1000)
    m = morton(tx, ty)
    # even/odd bit split is exact
    from simple_osm_queries_ray.functions.hiercell import _compact1by1

    np.testing.assert_array_equal(_compact1by1(m), tx)
    np.testing.assert_array_equal(_compact1by1(m >> 1), ty)


def test_levels_and_parents():
    for level in (0, 3, 8, 12, 26):
        c = quad_cell(LON, LAT, level)
        np.testing.assert_array_equal(quad_level(c), level)
        if level > 0:
            # parent arithmetic agrees with direct assignment one level up
            np.testing.assert_array_equal(quad_parent(c), quad_cell(LON, LAT, level - 1))
    # children of a cell all parent back to it
    c0 = int(quad_cell(np.array([9.5]), np.array([53.5]), 10)[0])
    assert all(int(quad_parent(ch)) == c0 for ch in quad_children(c0))


def test_cell_bounds_contain_point():
    c = quad_cell(LON, LAT, 12)
    for i in range(0, 500, 50):
        mn, mt, mx, mxt = quad_cell_bounds(int(c[i]))
        assert mn <= LON[i] < mx
        assert mt <= LAT[i] <= mxt


def test_covering_is_exact_and_normalized():
    bbox = (9.13, 53.21, 9.87, 53.66)
    cov = quad_covering(bbox, 12)
    levels = quad_level(cov)
    assert levels.max() == 12 and levels.min() < 12  # mixed levels: normalized
    # expanded covering == brute-force set of level-12 cells intersecting bbox
    expanded = set(covering_to_max_level(cov, 12).tolist())
    n = 1 << 12
    tx0 = int(np.floor((bbox[0] + 180) / 360 * n))
    tx1 = int(np.floor((bbox[2] + 180) / 360 * n))
    ty0 = int(np.floor((90 - bbox[3]) / 180 * n))
    ty1 = int(np.floor((90 - bbox[1]) / 180 * n))
    brute = set()
    txs, tys = np.meshgrid(np.arange(tx0, tx1 + 1), np.arange(ty0, ty1 + 1))
    brute = set(((1 << 24) + morton(txs.ravel(), tys.ravel())).tolist())
    assert expanded == brute
    # no cell is an ancestor of another (disjoint union)
    s = set(cov.tolist())
    for c in cov:
        p = int(c)
        while p > 1:
            p >>= 2
            assert p not in s


def test_quad_indexed_query_end_to_end(ray_session, tmp_path):
    """A quad-cell (level-12) repo persists through the density-planned index
    and answers a covering-pruned bbox query identically to the flat grid,
    touching fewer partitions than a full scan."""
    import os

    from simple_osm_queries_ray.functions.hiercell import QuadCellScheme
    from simple_osm_queries_ray.pipelines.build_index import DiskRepo, write_index
    from simple_osm_queries_ray.pipelines.query import QueryEngine
    from simple_osm_queries_ray.sources.repo import build_repo

    scheme = QuadCellScheme(12)
    sf = "/root/testdata/sf0.001"
    repo = build_repo(sf, cell_scheme=scheme)
    idx = str(tmp_path / "qidx")
    write_index(repo, idx, rows_per_partition=100)
    disk = DiskRepo(idx)
    eng = QueryEngine(disk, cell_scheme=scheme)
    grid_eng = QueryEngine(build_repo(sf))

    q = "bbox(9.85,53.45,10.05,53.65).nodes{lang=en AND n_chars>=200}"
    got = set(eng.execute_string(q).to_pandas()["id"])
    exp = set(grid_eng.execute_string(q).to_pandas()["id"])
    assert got == exp and len(got) > 0

    # pruned read: the covering's partitions are a strict subset
    cells = scheme.cells_for_bbox(9.85, 53.45, 10.05, 53.65)
    pids = disk.plan.pids_for_cells(cells)
    total = len([d for d in os.listdir(os.path.join(idx, "node")) if d.startswith("pid=")])
    assert 0 < len(pids) < total


def test_quad_compact_exact_and_minimal():
    """quad_compact: expanding the covering back to the leaf level must
    reproduce the occupied leaf set exactly, and no four complete siblings
    may survive (minimality). A fully occupied subtree promotes to its root."""
    import pyarrow as pa
    import ray

    from simple_osm_queries_ray.functions.hiercell import quad_cell_bounds
    from simple_osm_queries_ray.stages.geo import quad_compact

    level = 6
    # fully occupy one level-3 cell: centers of all its level-6 descendants
    root = int(quad_cell(np.array([9.5]), np.array([53.5]), 3)[0])
    pts_lon, pts_lat = [], []
    base = np.int64(root) << np.int64(6)
    for c in (base + np.arange(64, dtype=np.int64)):
        mn, mt, mx, mxt = quad_cell_bounds(int(c))
        pts_lon.append((mn + mx) / 2)
        pts_lat.append((mt + mxt) / 2)
    # plus scattered points elsewhere (partial occupancy)
    r = np.random.RandomState(7)
    pts_lon += list(-120.0 + r.rand(40) * 3)
    pts_lat += list(-33.0 + r.rand(40) * 3)
    ds = ray.data.from_arrow(
        pa.table({"lon": pa.array(pts_lon, pa.float64()), "lat": pa.array(pts_lat, pa.float64())})
    )

    out = quad_compact(ds, level).to_pandas()
    cells = out["cell"].to_numpy()
    np.testing.assert_array_equal(quad_level(cells), out["level"].to_numpy())

    # the saturated subtree collapsed to its level-3 root
    assert root in set(cells.tolist())

    # exactness: expansion == occupied leaf set
    leaves = set(
        np.unique(quad_cell(np.array(pts_lon), np.array(pts_lat), level)).tolist()
    )
    assert set(covering_to_max_level(cells, level).tolist()) == leaves

    # minimality: no parent has all four children present in the output
    _, counts = np.unique(cells // 4, return_counts=True)
    assert counts.max() < 4
    # and no duplicates / no ancestor-descendant overlap (expansion size check)
    assert len(set(cells.tolist())) == len(cells)


def test_grid_scheme_rejects_unpackable_cell_height():
    """cell = cx*CELL_PACK + cy collides once the latitude span in cells
    reaches CELL_PACK — the constructor must reject such sizes instead of
    silently conflating distant cells (review r04)."""
    import pytest

    from simple_osm_queries_ray.functions.hiercell import GridCellScheme

    with pytest.raises(ValueError, match="cell_h"):
        GridCellScheme(0.1, 0.001)
    with pytest.raises(ValueError):
        GridCellScheme(0.1, -1.0)
    GridCellScheme(0.001, 0.05)  # narrow WIDTH is fine (cx is unbounded)
