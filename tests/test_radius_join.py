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
