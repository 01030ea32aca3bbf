"""Bench generators: generated_nodes / generated_points must derive the exact
same features as the plain parquet-read path (raw_nodes) for the same ids."""

import numpy as np
import pandas as pd

from simple_osm_queries_ray.sources.synthetic import (
    generated_nodes,
    generated_points,
    raw_nodes,
    synthetic_polygons,
)

SF = "/root/testdata/sf0.001"


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("id").reset_index(drop=True)


def test_generated_nodes_matches_raw_nodes(ray_session):
    a = _sorted(raw_nodes(SF, replicate=3, stride=2000).to_pandas())
    b = _sorted(generated_nodes(SF, replicate=3, stride=2000, replicas_per_task=2).to_pandas())
    assert len(a) == len(b) and len(a) % 3 == 0 and len(a) > 0
    for col in ["id", "lon", "lat", "cell"]:
        np.testing.assert_array_equal(a[col].to_numpy(), b[col].to_numpy())
    assert a["caption"].tolist() == b["caption"].tolist()
    # tag lists identical
    assert [list(x) for x in a["tag_vals_str"]] == [list(x) for x in b["tag_vals_str"]]


def test_generated_points_matches_geometry(ray_session):
    a = _sorted(
        raw_nodes(SF, replicate=2, stride=2000).to_pandas()[["id", "lon", "lat", "cell"]]
    )
    b = _sorted(generated_points(SF, replicate=2, stride=2000).to_pandas())
    assert list(b.columns) == ["id", "lon", "lat", "cell"]
    for col in a.columns:
        np.testing.assert_array_equal(a[col].to_numpy(), b[col].to_numpy())


def test_synthetic_polygons_deterministic():
    p1 = synthetic_polygons(4)
    p2 = synthetic_polygons(4)
    assert p1 == p2
    assert len(p1) == 4 and all(len(p) == 16 for p in p1)
