"""Geohash kernel checks: canonical published vectors, the prefix
property, the odd-precision guard, and bit-exact agreement between the
numpy kernel and its generated DuckDB SQL twin on random coordinates."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa

from simple_osm_queries_ray.functions.geohash import geohash_encode, geohash_sql


def test_known_vectors():
    # the two canonical examples from the public geohash documentation
    assert geohash_encode(np.array([10.40744]), np.array([57.64911]), 11)[0] == (
        "u4pruydqqvj"
    )
    assert geohash_encode(np.array([-5.60302]), np.array([42.60498]), 5)[0] == "ezs42"


def test_prefix_property():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    g7 = geohash_encode(lon, lat, 7)
    g5 = geohash_encode(lon, lat, 5)
    assert all(a.startswith(b) for a, b in zip(g7, g5))


def test_odd_precision_guard():
    import pytest

    for bad in (0, 2, 6, 13):
        with pytest.raises(ValueError):
            geohash_encode(np.array([0.0]), np.array([0.0]), bad)


def test_sql_twin_matches_kernel():
    rng = np.random.default_rng(11)
    lon = np.concatenate(
        [rng.uniform(-180, 180, 100), np.array([-180.0, 0.0, 180.0, 9.95])]
    )
    lat = np.concatenate(
        [rng.uniform(-90, 90, 100), np.array([-90.0, 0.0, 90.0, 53.55])]
    )
    want = geohash_encode(lon, lat, 7)
    con = duckdb.connect()
    con.register("pts", pa.table({"lon": lon, "lat": lat}))
    got = (
        con.execute(f"SELECT {geohash_sql('lon', 'lat', 7)} AS gh FROM pts")
        .df()["gh"]
        .to_numpy()
    )
    assert (got == want).all()


def test_assign_geohash_stage():
    import ray.data

    from simple_osm_queries_ray.stages.geo import assign_geohash

    ds = ray.data.from_arrow(
        pa.table({"id": [1, 2], "lon": [10.40744, -5.60302], "lat": [57.64911, 42.60498]})
    )
    out = assign_geohash(ds, 5).to_pandas().sort_values("id")
    assert out["gh"].tolist() == ["u4pru", "ezs42"]
