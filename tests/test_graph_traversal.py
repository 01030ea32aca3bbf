"""Graph-traversal checks (stages/graph.py): the distributed bounded-round
BFS / Bellman-Ford over the eps-proximity graph must equal serial reference
implementations bit-exactly (same candidate sets, same left-to-right path
accumulation, min is order-independent), on both the broadcast path and the
size-gated hash fallback."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from simple_osm_queries_ray.stages.graph import proximity_bfs, proximity_sssp


def _point_set() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Two clusters + a bridge chain + isolated points, deterministic."""
    rng = np.random.default_rng(7)
    a = rng.uniform(0.0, 0.04, size=(60, 2))
    b = rng.uniform(0.10, 0.14, size=(40, 2)) + np.array([0.0, 0.02])
    chain = np.stack(
        [np.linspace(0.04, 0.10, 8), np.linspace(0.04, 0.12, 8)], axis=1
    )
    iso = np.array([[0.9, 0.9], [0.95, 0.95]])
    pts = np.concatenate([a, b, chain, iso])
    ids = np.arange(len(pts), dtype=np.int64) * 3 + 5  # non-contiguous ids
    return ids, pts[:, 0].astype(np.float64), pts[:, 1].astype(np.float64)


def _dataset(ids, lon, lat) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table({"id": pa.array(ids), "lon": pa.array(lon), "lat": pa.array(lat)})
    )


def _adj(ids, lon, lat, eps):
    """(i, j, w) arrays over index positions, both directions, same float
    expressions as stages/knn.py::radius_join + stages/graph.py (dlon*dlon +
    dlat*dlat, then sqrt)."""
    d2 = (lon[:, None] - lon[None, :]) ** 2 + (lat[:, None] - lat[None, :]) ** 2
    m = (d2 <= eps * eps) & ~np.eye(len(ids), dtype=bool)
    i, j = np.nonzero(m)
    return i, j, np.sqrt(d2[i, j])


def reference_bfs(ids, lon, lat, eps, src_id, rounds):
    i, j, _ = _adj(ids, lon, lat, eps)
    n = len(ids)
    hops = np.full(n, -1, dtype=np.int64)
    src = int(np.flatnonzero(ids == src_id)[0])
    hops[src] = 0
    frontier = {src}
    for r in range(1, rounds + 1):
        nxt = set()
        for a, b in zip(i, j):
            if int(a) in frontier and hops[b] < 0:
                hops[b] = r
                nxt.add(int(b))
        if not nxt:
            break
        frontier = nxt
    return {int(ids[k]): int(hops[k]) for k in range(n) if hops[k] >= 0}


def reference_bellman_ford(ids, lon, lat, eps, src_id, rounds):
    i, j, w = _adj(ids, lon, lat, eps)
    n = len(ids)
    dist = np.full(n, np.inf)
    src = int(np.flatnonzero(ids == src_id)[0])
    dist[src] = 0.0
    for _ in range(rounds):
        cand = dist[i] + w
        new = dist.copy()
        np.minimum.at(new, j, cand)
        if np.array_equal(new, dist):
            break
        dist = new
    return {int(ids[k]): float(dist[k]) for k in range(n) if np.isfinite(dist[k])}


def _to_dict(ds, val_col):
    out = {}
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        out.update(
            zip(
                np.asarray(b["id"], dtype=np.int64).tolist(),
                np.asarray(b[val_col]).tolist(),
            )
        )
    return out


EPS = 0.012
SRC_OFF = 5  # id of index 0


def test_bfs_matches_reference():
    ids, lon, lat = _point_set()
    ds = _dataset(ids, lon, lat)
    got = _to_dict(proximity_bfs(ds, EPS, source_id=SRC_OFF, max_rounds=30), "hops")
    want = reference_bfs(ids, lon, lat, EPS, SRC_OFF, 30)
    assert got == want
    # the bridge chain forces multi-hop discovery; cluster b must be reached
    assert max(got.values()) >= 4
    # isolated points are absent
    assert int(ids[-1]) not in got


def test_bfs_round_bound_truncates():
    ids, lon, lat = _point_set()
    ds = _dataset(ids, lon, lat)
    full = _to_dict(proximity_bfs(ds, EPS, source_id=SRC_OFF, max_rounds=30), "hops")
    cut = _to_dict(proximity_bfs(ds, EPS, source_id=SRC_OFF, max_rounds=3), "hops")
    assert cut == {k: v for k, v in full.items() if v <= 3}
    assert len(cut) < len(full)


def test_bfs_hash_path_identical():
    ids, lon, lat = _point_set()
    ds = _dataset(ids, lon, lat)
    bc = _to_dict(proximity_bfs(ds, EPS, source_id=SRC_OFF, max_rounds=6), "hops")
    hashed = _to_dict(
        proximity_bfs(ds, EPS, source_id=SRC_OFF, max_rounds=6, broadcast_limit=0),
        "hops",
    )
    assert bc == hashed


def test_sssp_matches_bellman_ford_bitexact():
    ids, lon, lat = _point_set()
    ds = _dataset(ids, lon, lat)
    got = _to_dict(proximity_sssp(ds, EPS, source_id=SRC_OFF, max_rounds=30), "dist")
    want = reference_bellman_ford(ids, lon, lat, EPS, SRC_OFF, 30)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], (k, got[k], want[k])  # bit-exact, no tolerance


def test_sssp_hash_path_identical():
    ids, lon, lat = _point_set()
    ds = _dataset(ids, lon, lat)
    bc = _to_dict(proximity_sssp(ds, EPS, source_id=SRC_OFF, max_rounds=8), "dist")
    hashed = _to_dict(
        proximity_sssp(ds, EPS, source_id=SRC_OFF, max_rounds=8, broadcast_limit=0),
        "dist",
    )
    assert bc == hashed


def test_sssp_bounded_rounds_subset():
    ids, lon, lat = _point_set()
    ds = _dataset(ids, lon, lat)
    cut = _to_dict(proximity_sssp(ds, EPS, source_id=SRC_OFF, max_rounds=2), "dist")
    want = reference_bellman_ford(ids, lon, lat, EPS, SRC_OFF, 2)
    assert cut == want


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def random_points(draw):
    n = draw(st.integers(min_value=2, max_value=40))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    # coordinates in a couple of cells; duplicates allowed (distance 0 edges)
    lon = rng.uniform(0.0, 0.15, n)
    lat = rng.uniform(0.0, 0.15, n)
    dup = draw(st.booleans())
    if dup and n >= 4:
        lon[1] = lon[0]
        lat[1] = lat[0]
    ids = rng.choice(np.arange(1, 10 * n), size=n, replace=False).astype(np.int64)
    eps = draw(st.sampled_from([0.005, 0.02, 0.06]))
    rounds = draw(st.integers(min_value=1, max_value=8))
    return ids, lon, lat, eps, rounds


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(random_points())
def test_bfs_property_random_graphs(pts):
    ids, lon, lat, eps, rounds = pts
    src = int(ids[0])
    ds = _dataset(ids, lon, lat)
    got = _to_dict(proximity_bfs(ds, eps, source_id=src, max_rounds=rounds), "hops")
    assert got == reference_bfs(ids, lon, lat, eps, src, rounds)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(random_points())
def test_sssp_property_random_graphs(pts):
    ids, lon, lat, eps, rounds = pts
    src = int(ids[0])
    ds = _dataset(ids, lon, lat)
    got = _to_dict(proximity_sssp(ds, eps, source_id=src, max_rounds=rounds), "dist")
    want = reference_bellman_ford(ids, lon, lat, eps, src, rounds)
    assert got == want  # bit-exact floats


from simple_osm_queries_ray.stages.graph import proximity_bfs_multi


def reference_multi_bfs(ids, lon, lat, eps, srcs, rounds):
    """Lexicographic (hops, src) minimum over per-source BFS distances."""
    best = {}
    for s in srcs:
        for nid, h in reference_bfs(ids, lon, lat, eps, s, rounds).items():
            cur = best.get(nid)
            if cur is None or (h, s) < cur:
                best[nid] = (h, int(s))
    return best


def _multi_to_dict(ds):
    out = {}
    for b in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        for i, h, s in zip(
            np.asarray(b["id"], dtype=np.int64).tolist(),
            np.asarray(b["hops"], dtype=np.int64).tolist(),
            np.asarray(b["src"], dtype=np.int64).tolist(),
        ):
            out[i] = (h, s)
    return out


def test_multi_bfs_matches_reference():
    ids, lon, lat = _point_set()
    srcs = [int(ids[0]), int(ids[70]), int(ids[90])]
    ds = _dataset(ids, lon, lat)
    got = _multi_to_dict(proximity_bfs_multi(ds, EPS, srcs, max_rounds=30))
    assert got == reference_multi_bfs(ids, lon, lat, EPS, srcs, 30)
    # both clusters must carry labels from their own sources
    assert len({s for _, s in got.values()}) >= 2


def test_multi_bfs_hash_path_identical():
    ids, lon, lat = _point_set()
    srcs = [int(ids[0]), int(ids[70])]
    ds = _dataset(ids, lon, lat)
    bc = _multi_to_dict(proximity_bfs_multi(ds, EPS, srcs, max_rounds=6))
    hashed = _multi_to_dict(
        proximity_bfs_multi(ds, EPS, srcs, max_rounds=6, broadcast_limit=0)
    )
    assert bc == hashed


def test_multi_bfs_nonexistent_source_produces_no_phantom_row():
    """A source id absent from the node set must not surface as a
    (src, 0, src) row — the SQL twin seeds FROM the node table."""
    ids, lon, lat = _point_set()
    ghost = int(ids.max()) + 999
    srcs = [int(ids[0]), ghost]
    ds = _dataset(ids, lon, lat)
    got = _multi_to_dict(proximity_bfs_multi(ds, EPS, srcs, max_rounds=6))
    assert ghost not in got
    assert got == reference_multi_bfs(ids, lon, lat, EPS, [int(ids[0])], 6)
    # hash path agrees
    hashed = _multi_to_dict(
        proximity_bfs_multi(ds, EPS, srcs, max_rounds=6, broadcast_limit=0)
    )
    assert hashed == got


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(random_points())
def test_multi_bfs_property_random_graphs(pts):
    ids, lon, lat, eps, rounds = pts
    srcs = sorted(set(int(s) for s in ids[: min(3, len(ids))]))
    ds = _dataset(ids, lon, lat)
    got = _multi_to_dict(proximity_bfs_multi(ds, eps, srcs, max_rounds=rounds))
    assert got == reference_multi_bfs(ids, lon, lat, eps, srcs, rounds)


# -- triangle_counts ---------------------------------------------------------


def reference_triangles(ids, lon, lat, eps):
    """Serial per-node triangle counts via the dense adjacency matrix:
    diag(A^3) / 2 per node."""
    d2 = (lon[:, None] - lon[None, :]) ** 2 + (lat[:, None] - lat[None, :]) ** 2
    A = ((d2 <= eps * eps) & ~np.eye(len(ids), dtype=bool)).astype(np.int64)
    tri_per_node = np.diag(A @ A @ A) // 2
    keep = tri_per_node > 0
    return dict(zip(ids[keep].tolist(), tri_per_node[keep].tolist()))


def _tri_result_dict(ds) -> dict:
    df = ds.to_pandas()
    return dict(zip(df["id"].tolist(), df["n_triangles"].tolist()))


def test_triangle_counts_matches_dense_reference():
    from simple_osm_queries_ray.stages.graph import triangle_counts

    ids, lon, lat = _point_set()
    got = _tri_result_dict(triangle_counts(_dataset(ids, lon, lat), 0.02))
    assert got == reference_triangles(ids, lon, lat, 0.02)


def test_triangle_counts_random_points_and_hub():
    """Random cloud plus a deliberate high-degree hub (many points within eps
    of one center) — exercises the degree-ordering path where the hub must
    NOT enumerate its whole neighborhood; and duplicate coordinates."""
    from simple_osm_queries_ray.stages.graph import triangle_counts

    rng = np.random.default_rng(42)
    pts = rng.uniform(0.0, 0.2, size=(150, 2))
    hub = np.full((25, 2), 0.05) + rng.uniform(-0.004, 0.004, size=(25, 2))
    dup = pts[:3]  # exact duplicate coordinates
    all_pts = np.concatenate([pts, hub, dup])
    ids = np.arange(len(all_pts), dtype=np.int64) + 11
    lon = all_pts[:, 0].astype(np.float64)
    lat = all_pts[:, 1].astype(np.float64)
    eps = 0.015
    got = _tri_result_dict(triangle_counts(_dataset(ids, lon, lat), eps))
    assert got == reference_triangles(ids, lon, lat, eps)
