"""Property-based check of the grid-bucketed radius self-join: random point
sets (including cell-border and duplicate coordinates) must produce exactly
the brute-force O(n^2) pair set — guards the 3x3-replication exactly-once
emission logic across cell boundaries."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import ray.data

from simple_osm_queries_ray.stages.knn import radius_join


def brute_pairs(lon, lat, r):
    d2 = (lon[:, None] - lon[None, :]) ** 2 + (lat[:, None] - lat[None, :]) ** 2
    a, b = np.nonzero((d2 <= r * r) & (np.arange(len(lon))[:, None] < np.arange(len(lon))[None, :]))
    return set(zip(a.tolist(), b.tolist()))


coord = st.floats(min_value=0.0, max_value=0.5, allow_nan=False, width=32)
# a grid snap mixes in exact cell-border coordinates (multiples of 0.1)
snapped = st.builds(lambda x: round(x * 10) / 10, coord)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(st.tuples(st.one_of(coord, snapped), st.one_of(coord, snapped)),
                 min_size=2, max_size=40),
    r=st.sampled_from([0.02, 0.05, 0.1]),
)
def test_radius_join_matches_bruteforce(pts, r):
    lon = np.array([p[0] for p in pts], dtype=np.float64)
    lat = np.array([p[1] for p in pts], dtype=np.float64)
    ids = np.arange(len(pts), dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"id": ids, "lon": lon, "lat": lat})
    )
    got = radius_join(ds, r).to_pandas()
    got_pairs = (
        set() if len(got) == 0
        else set(zip(got["id_a"].tolist(), got["id_b"].tolist()))
    )
    assert got_pairs == brute_pairs(lon, lat, r)


def test_nn_join_fallback_path():
    """Isolated points (block-local NN farther than a cell) must be resolved
    exactly by the brute-force phase-2 residue."""
    from simple_osm_queries_ray.stages.knn import nn_join

    lon = np.array([0.05, 1.05, 2.05, 2.07], dtype=np.float64)
    lat = np.array([0.05, 0.05, 0.05, 0.05], dtype=np.float64)
    ids = np.arange(4, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"id": ids, "lon": lon, "lat": lat}))
    got = nn_join(ds).to_pandas().sort_values("id").reset_index(drop=True)
    # 0 and 1 are >1 cell from everything: fallback; 2<->3 resolve locally
    assert got["nn_id"].tolist() == [1, 2, 3, 2]
    d2 = (lon[:, None] - lon[None, :]) ** 2
    np.fill_diagonal(d2, np.inf)
    assert np.allclose(got["dist2"].to_numpy(), d2.min(axis=1))


def brute_knn(lon, lat, ids, k):
    """(id, rank, nn_id, dist2) rows, ties -> smallest nn_id — the SQL twin."""
    d2 = (lon[:, None] - lon[None, :]) ** 2 + (lat[:, None] - lat[None, :]) ** 2
    rows = []
    for i in range(len(ids)):
        order = sorted(
            (float(d2[i, j]), int(ids[j])) for j in range(len(ids)) if j != i
        )
        for r, (d, nid) in enumerate(order[:k], start=1):
            rows.append((int(ids[i]), r, nid, d))
    return rows


def _run_knn_join(lon, lat, k):
    from simple_osm_queries_ray.stages.knn import knn_join

    ids = np.arange(len(lon), dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"id": ids, "lon": lon, "lat": lat}))
    got = knn_join(ds, k).to_pandas().sort_values(["id", "rank"])
    got_rows = [
        (int(a), int(b), int(c), float(d))
        for a, b, c, d in zip(got["id"], got["rank"], got["nn_id"], got["dist2"])
    ]
    return got_rows, brute_knn(lon, lat, ids, k)


def test_knn_join_isolated_point_residue():
    """A point alone in its 3x3 block must still get its k neighbours via
    the brute-force residue (regression: zero-row emission dropped it)."""
    lon = np.array([0.05, 0.06, 0.07, 0.08, 5.05], dtype=np.float64)
    lat = np.array([0.05, 0.05, 0.05, 0.05, 0.05], dtype=np.float64)
    got, want = _run_knn_join(lon, lat, 3)
    assert got == want
    assert sum(1 for r in got if r[0] == 4) == 3  # isolated point resolved


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(st.tuples(st.one_of(coord, snapped), st.one_of(coord, snapped)),
                 min_size=2, max_size=30),
    k=st.sampled_from([1, 2, 3]),
)
def test_knn_join_matches_bruteforce(pts, k):
    lon = np.array([p[0] for p in pts], dtype=np.float64)
    lat = np.array([p[1] for p in pts], dtype=np.float64)
    got, want = _run_knn_join(lon, lat, k)
    assert got == want


def test_resolve_residue_rings_sparse_lattice(monkeypatch):
    """Sparse data where EVERY point is residue (lattice spacing > 3 cells):
    with brute_cap=0 the expanding-block rounds must resolve everything
    distributed — no driver brute-force — and match the exact answer."""
    from simple_osm_queries_ray.stages import knn as knn_mod

    # 6x6 lattice, spacing 0.35 deg (cell = 0.1): all 3x3 blocks are singletons
    gx, gy = np.meshgrid(np.arange(6), np.arange(6))
    lon = (gx.ravel() * 0.35 + 0.05).astype(np.float64)
    lat = (gy.ravel() * 0.35 + 0.05).astype(np.float64)
    ids = np.arange(len(lon), dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"id": ids, "lon": lon, "lat": lat}))

    def no_brute(*a, **k):
        raise AssertionError("driver brute force must not run with brute_cap=0")

    monkeypatch.setattr(knn_mod, "knn_bruteforce", no_brute)
    got = (
        knn_mod.resolve_knn_residue(
            ds, ds.select_columns(["id", "lon", "lat"]), 3,
            exclude_self=True, brute_cap=0,
        )
        .to_pandas()
        .sort_values(["id", "rank"])
    )
    got_rows = [
        (int(a), int(b), int(c), float(d))
        for a, b, c, d in zip(got["id"], got["rank"], got["nn_id"], got["dist2"])
    ]
    assert got_rows == brute_knn(lon, lat, ids, 3)


def test_knn_join_ring_residue_matches(monkeypatch):
    """knn_join with the residue forced through the ring rounds (cap=0)
    equals the default path on mixed dense+sparse data."""
    from simple_osm_queries_ray.stages import knn as knn_mod

    rng = np.random.default_rng(7)
    dense = rng.uniform(0.0, 0.3, size=(40, 2))
    sparse = np.stack(
        [np.arange(8) * 0.9 + 2.0, np.full(8, 0.05)], axis=1
    )
    pts = np.concatenate([dense, sparse])
    lon, lat = pts[:, 0].astype(np.float64), pts[:, 1].astype(np.float64)
    want = brute_knn(lon, lat, np.arange(len(lon), dtype=np.int64), 2)

    orig = knn_mod.resolve_knn_residue

    def capped(ds, residue, k, exclude_self=True, brute_cap=50_000):
        return orig(ds, residue, k, exclude_self=exclude_self, brute_cap=0)

    monkeypatch.setattr(knn_mod, "resolve_knn_residue", capped)
    got, _ = _run_knn_join(lon, lat, 2)
    assert got == want


def test_nn_join_ring_residue(monkeypatch):
    from simple_osm_queries_ray.stages import knn as knn_mod

    orig = knn_mod.resolve_knn_residue

    def capped(ds, residue, k, exclude_self=True, brute_cap=50_000):
        return orig(ds, residue, k, exclude_self=exclude_self, brute_cap=0)

    monkeypatch.setattr(knn_mod, "resolve_knn_residue", capped)
    lon = np.array([0.05, 1.05, 2.05, 2.07], dtype=np.float64)
    lat = np.array([0.05, 0.05, 0.05, 0.05], dtype=np.float64)
    ids = np.arange(4, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"id": ids, "lon": lon, "lat": lat}))
    got = knn_mod.nn_join(ds).to_pandas().sort_values("id").reset_index(drop=True)
    assert got["nn_id"].tolist() == [1, 2, 3, 2]
