"""Exact-DBSCAN checks: the distributed plan (radius_join buckets ->
degree count -> core-core hash-min components -> one union-groupby label
resolution) must equal a serial reference implementation on arbitrary point
sets, including cell-border coordinates and duplicate points."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import ray.data

from simple_osm_queries_ray.stages.knn import dbscan


def reference_dbscan(lon, lat, eps, min_pts):
    """Serial deterministic DBSCAN: min-id cluster labels, border -> min
    core-neighbor cluster."""
    n = len(lon)
    d2 = (lon[:, None] - lon[None, :]) ** 2 + (lat[:, None] - lat[None, :]) ** 2
    nbr = (d2 <= eps * eps) & ~np.eye(n, dtype=bool)
    core = nbr.sum(axis=1) + 1 >= min_pts
    label = {}
    for i in np.flatnonzero(core):
        if i in label:
            continue
        # BFS the core-core component, label with min core id
        comp, stack = {int(i)}, [int(i)]
        while stack:
            u = stack.pop()
            for v in np.flatnonzero(nbr[u] & core):
                if int(v) not in comp:
                    comp.add(int(v))
                    stack.append(int(v))
        root = min(comp)
        for u in comp:
            label[u] = root
    out = {}
    for i in range(n):
        if core[i]:
            out[i] = (label[i], "core")
        else:
            cands = [label[int(j)] for j in np.flatnonzero(nbr[i] & core)]
            out[i] = (min(cands), "border") if cands else (-1, "noise")
    return out


def run_engine(lon, lat, eps, min_pts):
    ids = np.arange(len(lon), dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"id": ids, "lon": lon, "lat": lat}))
    got = dbscan(ds, eps, min_pts).to_pandas().sort_values("id")
    return {
        int(r.id): (int(r.cluster), r.role) for r in got.itertuples(index=False)
    }


def test_dbscan_two_blobs_and_noise():
    rng = np.random.default_rng(7)
    blob1 = rng.normal([0.05, 0.05], 0.004, size=(20, 2))
    blob2 = rng.normal([0.25, 0.25], 0.004, size=(20, 2))
    stray = np.array([[0.5, 0.5], [0.7, 0.1]])
    pts = np.concatenate([blob1, blob2, stray])
    lon, lat = pts[:, 0].copy(), pts[:, 1].copy()
    got = run_engine(lon, lat, 0.02, 4)
    want = reference_dbscan(lon, lat, 0.02, 4)
    assert got == want
    clusters = {c for c, role in got.values() if c >= 0}
    assert len(clusters) == 2  # the two blobs
    assert got[40] == (-1, "noise") and got[41] == (-1, "noise")


def test_dbscan_min_pts_guard():
    ds = ray.data.from_arrow(
        pa.table({"id": [0], "lon": [0.0], "lat": [0.0]})
    )
    import pytest

    with pytest.raises(ValueError):
        dbscan(ds, 0.01, 1)


coord = st.floats(min_value=0.0, max_value=0.25, allow_nan=False, width=32)
snapped = st.builds(lambda x: round(x * 10) / 10, coord)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    pts=st.lists(
        st.tuples(st.one_of(coord, snapped), st.one_of(coord, snapped)),
        min_size=2,
        max_size=30,
    ),
    eps=st.sampled_from([0.02, 0.05]),
    min_pts=st.sampled_from([2, 3, 4]),
)
def test_dbscan_matches_reference(pts, eps, min_pts):
    lon = np.array([p[0] for p in pts], dtype=np.float64)
    lat = np.array([p[1] for p in pts], dtype=np.float64)
    assert run_engine(lon, lat, eps, min_pts) == reference_dbscan(
        lon, lat, eps, min_pts
    )
