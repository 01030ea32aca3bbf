"""bucketed_reduce / bucketed_sum / bucketed_min / bucketed_distinct vs
pandas groupby on random multi-key int data — the high-cardinality
aggregate replacement must agree exactly with the generic semantics."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from simple_osm_queries_ray.stages.group_collect import (
    bucketed_distinct,
    bucketed_min,
    bucketed_reduce,
    bucketed_sum,
)


@pytest.fixture(scope="module")
def frame():
    rng = np.random.default_rng(7)
    n = 50_000
    return pd.DataFrame(
        {
            "a": rng.integers(-1000, 1000, n),  # negative keys must hash fine
            "b": rng.integers(0, 13, n),
            "v": rng.integers(-50, 100, n),
            "w": rng.integers(0, 10, n),
        }
    )


def test_bucketed_sum_matches_pandas(frame):
    got = (
        bucketed_sum(ray.data.from_pandas(frame), ["a", "b"], ["v", "w"])
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    exp = (
        frame.groupby(["a", "b"], as_index=False)[["v", "w"]]
        .sum()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert (got[["a", "b", "v", "w"]].to_numpy() == exp.to_numpy()).all()


def test_bucketed_mixed_ops_match_pandas(frame):
    got = (
        bucketed_reduce(
            ray.data.from_pandas(frame), ["a"], {"v": "min", "w": "max"}
        )
        .to_pandas()
        .sort_values("a")
        .reset_index(drop=True)
    )
    exp = (
        frame.groupby("a", as_index=False)
        .agg(v=("v", "min"), w=("w", "max"))
        .sort_values("a")
        .reset_index(drop=True)
    )
    assert (got[["a", "v", "w"]].to_numpy() == exp.to_numpy()).all()


def test_bucketed_min_and_distinct(frame):
    got = (
        bucketed_min(ray.data.from_pandas(frame), ["b"], ["v"])
        .to_pandas()
        .sort_values("b")
        .reset_index(drop=True)
    )
    exp = (
        frame.groupby("b", as_index=False)["v"].min().sort_values("b").reset_index(drop=True)
    )
    assert (got[["b", "v"]].to_numpy() == exp.to_numpy()).all()

    gd = (
        bucketed_distinct(ray.data.from_pandas(frame), ["a", "b"])
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    ed = (
        frame[["a", "b"]]
        .drop_duplicates()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert (gd.to_numpy() == ed.to_numpy()).all()


def test_empty_input():
    empty = ray.data.from_pandas(
        pd.DataFrame({"a": pd.Series([], dtype=np.int64), "v": pd.Series([], dtype=np.int64)})
    )
    assert bucketed_sum(empty, ["a"], ["v"]).count() == 0
