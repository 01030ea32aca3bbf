"""Property-based checks of the polyline geometry joins: random way sets
(with cell-border coordinates mixed in) must reproduce the brute-force
O(n^2) answer — guards exactly-once covering replication across cell
boundaries and the vectorized orientation / clamped-distance kernels."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import ray.data

from simple_osm_queries_ray.stages.geo import node_way_buffer_join, segment_cross_join


def _ways_table(ways):
    ids = np.arange(len(ways), dtype=np.int64)
    lons = [[p[0] for p in w] for w in ways]
    lats = [[p[1] for p in w] for w in ways]
    lf = pa.list_(pa.float64())
    return pa.table(
        {
            "id": pa.array(ids),
            "node_lons": pa.array(lons, type=lf),
            "node_lats": pa.array(lats, type=lf),
            "minlon": pa.array([min(x) for x in lons]),
            "minlat": pa.array([min(y) for y in lats]),
            "maxlon": pa.array([max(x) for x in lons]),
            "maxlat": pa.array([max(y) for y in lats]),
        }
    )


def _seg_cross(a1, a2, b1, b2):
    def d(p, q, r):
        return np.sign((q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0]))

    return d(a1, a2, b1) * d(a1, a2, b2) < 0 and d(b1, b2, a1) * d(b1, b2, a2) < 0


def brute_cross(ways):
    out = set()
    for i in range(len(ways)):
        for j in range(i + 1, len(ways)):
            hit = any(
                _seg_cross(ways[i][s], ways[i][s + 1], ways[j][t], ways[j][t + 1])
                for s in range(len(ways[i]) - 1)
                for t in range(len(ways[j]) - 1)
            )
            if hit:
                out.add((i, j))
    return out


def _pt_seg_d2(p, a, b):
    dx, dy = b[0] - a[0], b[1] - a[1]
    den = dx * dx + dy * dy
    t = 0.0 if den == 0 else ((p[0] - a[0]) * dx + (p[1] - a[1]) * dy) / den
    t = min(max(t, 0.0), 1.0)
    ex, ey = p[0] - (a[0] + t * dx), p[1] - (a[1] + t * dy)
    return ex * ex + ey * ey


coord = st.floats(min_value=0.0, max_value=0.375, allow_nan=False, width=32)
snapped = st.builds(lambda x: round(x * 10) / 10, coord)
point = st.tuples(st.one_of(coord, snapped), st.one_of(coord, snapped))
way = st.lists(point, min_size=2, max_size=5)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(ways=st.lists(way, min_size=2, max_size=12))
def test_segment_cross_join_matches_bruteforce(ways):
    ds = ray.data.from_arrow(_ways_table(ways))
    got = segment_cross_join(ds).to_pandas()
    got_pairs = (
        set() if len(got) == 0 else set(zip(got["id_a"].tolist(), got["id_b"].tolist()))
    )
    assert got_pairs == brute_cross(ways)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ways=st.lists(way, min_size=1, max_size=6),
    pts=st.lists(point, min_size=1, max_size=20),
    eps=st.sampled_from([0.02, 0.05]),
)
def test_buffer_join_matches_bruteforce(ways, pts, eps):
    wtbl = _ways_table(ways)
    ntbl = pa.table(
        {
            "id": pa.array(np.arange(len(pts), dtype=np.int64)),
            "lon": pa.array([p[0] for p in pts], type=pa.float64()),
            "lat": pa.array([p[1] for p in pts], type=pa.float64()),
        }
    )
    got = node_way_buffer_join(
        ray.data.from_arrow(ntbl), ray.data.from_arrow(wtbl), eps=eps
    ).to_pandas()
    got_pairs = (
        set() if len(got) == 0 else set(zip(got["node_id"].tolist(), got["way_id"].tolist()))
    )
    want = set()
    for ni, p in enumerate(pts):
        for wi, w in enumerate(ways):
            if any(_pt_seg_d2(p, w[s], w[s + 1]) <= eps * eps for s in range(len(w) - 1)):
                want.add((ni, wi))
    assert got_pairs == want


from hypothesis import given as _given, settings as _settings, strategies as _st


@_settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@_given(
    left_keys=_st.lists(_st.integers(min_value=-5, max_value=5), min_size=0, max_size=30),
    right_keys=_st.lists(_st.integers(min_value=-5, max_value=5), min_size=0, max_size=8),
)
def test_hash_join_attach_matches_pandas_merge(left_keys, right_keys):
    """hash_join_attach == pandas left-merge for any key multiset (right side
    deduped to one row per key, as the contract requires)."""
    import pyarrow as pa

    from simple_osm_queries_ray.stages.joins import hash_join_attach

    right_keys = sorted(set(right_keys))
    left = pa.table(
        {
            "k": pa.array(left_keys, type=pa.int64()),
            "payload": pa.array([f"L{i}" for i in range(len(left_keys))]),
        }
    )
    right = pa.table(
        {
            "rk": pa.array(right_keys, type=pa.int64()),
            "val": pa.array([k * 10 for k in right_keys], type=pa.int64()),
        }
    )
    got = hash_join_attach(
        ray.data.from_arrow(left), "k", ray.data.from_arrow(right), "rk",
        {"val": pa.int64()},
    ).to_pandas()
    exp = left.to_pandas().merge(
        right.to_pandas().rename(columns={"rk": "k"}), on="k", how="left"
    )
    if len(got) == 0 and len(exp) == 0:
        return
    got = got.sort_values(["k", "payload"]).reset_index(drop=True)
    exp = exp.sort_values(["k", "payload"]).reset_index(drop=True)
    assert list(got["k"]) == list(exp["k"])
    assert list(got["payload"]) == list(exp["payload"])
    gv = got["val"].astype("float64")
    ev = exp["val"].astype("float64")
    assert ((gv == ev) | (gv.isna() & ev.isna())).all()


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    ways=st.lists(way, min_size=1, max_size=6),
    pts=st.lists(point, min_size=1, max_size=20),
)
def test_nearest_way_join_matches_bruteforce(ways, pts):
    """nearest_way_join == brute-force argmin over (d2, way_id), exact in
    float64 — exercises both the bucket-local phase (close ways) and the
    streamed phase-2 residue (points far from every way, since the domain
    spans several 0.1-degree cells)."""
    from simple_osm_queries_ray.stages.geo import nearest_way_join

    wtbl = _ways_table(ways)
    ntbl = pa.table(
        {
            "id": pa.array(np.arange(len(pts), dtype=np.int64)),
            "lon": pa.array([p[0] for p in pts], type=pa.float64()),
            "lat": pa.array([p[1] for p in pts], type=pa.float64()),
        }
    )
    got = nearest_way_join(
        ray.data.from_arrow(ntbl), ray.data.from_arrow(wtbl)
    ).to_pandas()
    got_map = {r.node_id: (r.way_id, r.d2) for r in got.itertuples()}
    want = {}
    for ni, p in enumerate(pts):
        best = None
        for wi, w in enumerate(ways):
            d2 = min(_pt_seg_d2(p, w[s], w[s + 1]) for s in range(len(w) - 1))
            if best is None or d2 < best[1] or (d2 == best[1] and wi < best[0]):
                best = (wi, d2)
        want[ni] = best
    assert got_map == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(ways=st.lists(way, min_size=1, max_size=8), eps=st.sampled_from([0.01, 0.05, 0.2]))
def test_simplify_ways_matches_recursive_dp(ways, eps):
    """Level-synchronous vectorized DP == the textbook per-way recursion
    (same argmax tie-break, same degenerate-chord fallback)."""
    from simple_osm_queries_ray.stages.geo import simplify_ways

    ds = ray.data.from_arrow(_ways_table(ways))
    got = simplify_ways(ds, eps=eps).to_pandas()
    gm = {}
    for r in got.itertuples():
        gm.setdefault(r.way_id, set()).add(r.k)

    def dp(pts, eps):
        n = len(pts)
        keep = {0, n - 1}
        e2 = eps * eps

        def rec(i0, i1):
            if i1 - i0 < 2:
                return
            (ax, ay), (bx, by) = pts[i0], pts[i1]
            dx, dy = bx - ax, by - ay
            len2 = dx * dx + dy * dy
            best = (-1.0, None)
            for k in range(i0 + 1, i1):
                px, py = pts[k]
                if len2 > 0:
                    cr = dx * (py - ay) - dy * (px - ax)
                    d2 = (cr * cr) / len2
                else:
                    d2 = (px - ax) ** 2 + (py - ay) ** 2
                if d2 > best[0]:
                    best = (d2, k)
            if best[0] > e2:
                keep.add(best[1])
                rec(i0, best[1])
                rec(best[1], i1)

        rec(0, n - 1)
        return keep

    assert gm == {i: dp(w, eps) for i, w in enumerate(ways)}


def test_nearest_way_join_ring_rounds():
    """brute_cap=0 forces the expanding coarsened-block rounds (no driver
    brute force): sparse nodes several cells from every way must resolve
    distributed with the exact (d2, way_id) argmin."""
    from simple_osm_queries_ray.stages.geo import nearest_way_join

    ways = [
        [(0.05, 0.05), (0.25, 0.05)],
        [(5.05, 5.05), (5.25, 5.05), (5.25, 5.25)],
    ]
    # nodes far from both ways (multiple levels needed) + one adjacent node
    pts = [(2.5, 2.5), (9.9, 0.1), (0.06, 0.06), (7.0, 7.0)]
    wtbl = _ways_table(ways)
    ntbl = pa.table(
        {
            "id": pa.array(np.arange(len(pts), dtype=np.int64)),
            "lon": pa.array([p[0] for p in pts], type=pa.float64()),
            "lat": pa.array([p[1] for p in pts], type=pa.float64()),
        }
    )
    got = nearest_way_join(
        ray.data.from_arrow(ntbl), ray.data.from_arrow(wtbl), brute_cap=0
    ).to_pandas()
    got_map = {r.node_id: (r.way_id, r.d2) for r in got.itertuples()}
    want = {}
    for ni, p in enumerate(pts):
        best = None
        for wi, w in enumerate(ways):
            d2 = min(_pt_seg_d2(p, w[s], w[s + 1]) for s in range(len(w) - 1))
            if best is None or d2 < best[1] or (d2 == best[1] and wi < best[0]):
                best = (wi, d2)
        want[ni] = best
    assert got_map == want


def test_way_way_buffer_join_kernel():
    """Hand-made polylines with controlled distances: crossing pair (d=0),
    parallel-within-eps pair, parallel-beyond-eps pair, endpoint-near pair."""
    from simple_osm_queries_ray.stages.geo import way_way_buffer_join

    a_ways = [
        [(0.0, 0.0), (1.0, 0.0)],        # a0: horizontal baseline
        [(5.0, 5.0), (6.0, 5.0)],        # a1: far away from everything
        [(2.0, 2.0), (3.0, 2.0)],        # a2: endpoint-near case
    ]
    b_ways = [
        [(0.5, -0.5), (0.5, 0.5)],       # b0: crosses a0
        [(0.0, 0.005), (1.0, 0.005)],    # b1: parallel to a0, d=0.005
        [(0.0, 0.5), (1.0, 0.5)],        # b2: parallel to a0, d=0.5 (miss)
        [(3.004, 2.0), (4.0, 2.0)],      # b3: 0.004 past a2's endpoint
    ]
    wa = _ways_table(a_ways)
    wb = _ways_table(b_ways)
    got = way_way_buffer_join(
        ray.data.from_arrow(wa), ray.data.from_arrow(wb), eps=0.01
    ).to_pandas()
    pairs = set(zip(got["a_id"].astype(int), got["b_id"].astype(int)))
    assert pairs == {(0, 0), (0, 1), (2, 3)}


def test_pip_mask_bit_identical_to_reference_formula():
    """The out=-buffer rewrite of point_in_polygon_mask must replay the
    original expression ((x2-x1)*(lat-y1))/(y2-y1)+x1 in the exact same
    operation order — bit-identical to the naive allocation-per-op form the
    SQL oracle repeats verbatim (pip_sql_condition)."""
    from simple_osm_queries_ray.stages.geo import point_in_polygon_mask

    def naive(lon, lat, polygon):
        inside = np.zeros(len(lon), dtype=bool)
        m = len(polygon)
        for i in range(m):
            x1, y1 = polygon[i]
            x2, y2 = polygon[(i + 1) % m]
            inside ^= ((y1 > lat) != (y2 > lat)) & (
                lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1
            )
        return inside

    rng = np.random.default_rng(11)
    lon = rng.uniform(9, 11, 50000)
    lat = rng.uniform(53, 55, 50000)
    for npts in (3, 5, 16):
        pts = np.column_stack(
            [rng.uniform(9, 11, npts), rng.uniform(53, 55, npts)]
        )
        poly = [(float(x), float(y)) for x, y in pts]
        a = naive(lon, lat, poly)
        b = point_in_polygon_mask(lon, lat, poly)
        assert (a == b).all()


def test_polygon_join_prefilter_false_identical():
    """prefilter=False (the scaling job's compute-dense mode) must produce
    exactly the prefiltered plan's (id, poly_id) pairs."""
    from simple_osm_queries_ray.sources.synthetic import synthetic_polygons
    from simple_osm_queries_ray.stages.geo import polygon_join

    rng = np.random.default_rng(3)
    tbl = pa.table(
        {
            "id": pa.array(np.arange(20000, dtype=np.int64)),
            "lon": pa.array(rng.uniform(9, 11, 20000)),
            "lat": pa.array(rng.uniform(53, 55, 20000)),
        }
    )
    ds = ray.data.from_arrow(tbl)
    polys = synthetic_polygons(8)
    a = polygon_join(ds, polys).to_pandas()
    b = polygon_join(ds, polys, prefilter=False).to_pandas()
    key = lambda df: sorted(zip(df["id"].astype(int), df["poly_id"].astype(int)))
    assert key(a) == key(b) and len(a) > 0


def test_filter_in_polygon_custom_scheme_matches_default():
    """The cell prune must use the scheme the dataset's cell column was
    built with — a 0.05-grid dataset pruned with 0.1-grid ids would drop
    matching rows silently (r04 contract note)."""
    import numpy as np

    from simple_osm_queries_ray.functions.hiercell import GridCellScheme
    from simple_osm_queries_ray.sources.repo import build_repo
    from simple_osm_queries_ray.stages.geo import filter_in_polygon

    tri = [(9.05, 53.05), (10.95, 53.1), (9.5, 54.9)]
    scheme = GridCellScheme(0.05, 0.05)
    custom = build_repo("/root/testdata/sf0.001", cell_scheme=scheme)
    default = build_repo("/root/testdata/sf0.001")
    a = set(
        filter_in_polygon(default.nodes, tri).to_pandas()["id"]
    )
    b = set(
        filter_in_polygon(custom.nodes, tri, cell_scheme=scheme).to_pandas()["id"]
    )
    assert a == b and a
