"""Count-min sketch: guarantee, mergeability, and probe correctness."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from simple_osm_queries_ray.stages.sketch import (
    CMS_WBITS,
    cms_buckets,
    cms_estimate,
    cms_sketch,
    cms_user_counts,
)


def _events(rng, n, n_users):
    # zipf-ish skew: low ids are heavy hitters
    u = (rng.pareto(1.3, n) * 3).astype(np.int64) % n_users
    return pd.DataFrame({"user_id": u})


def test_cms_never_underestimates():
    rng = np.random.RandomState(4)
    df = _events(rng, 20000, 500)
    ds = ray.data.from_pandas(df)
    probes = list(range(0, 50))
    out = cms_user_counts(ds, probes).to_pandas().sort_values("user_id")
    exact = df["user_id"].value_counts()
    for _, row in out.iterrows():
        true = int(exact.get(row["user_id"], 0))
        assert row["exact"] == true
        assert row["est"] >= true  # the CMS one-sided guarantee


def test_cms_heavy_hitters_are_tight():
    """For counts >> collision noise the estimate equals the true count
    (width 1024, 20k events -> expected collision mass ~ tens)."""
    rng = np.random.RandomState(7)
    df = _events(rng, 20000, 500)
    out = (
        cms_user_counts(ray.data.from_pandas(df), [0, 1, 2])
        .to_pandas()
        .set_index("user_id")
    )
    for uid in (0, 1, 2):
        est, exact = out.loc[uid, "est"], out.loc[uid, "exact"]
        assert exact > 1000  # heavy by construction
        assert est - exact <= 0.05 * exact


def test_cms_sketch_merges_by_addition():
    """sketch(A ++ B) == sketch(A) + sketch(B) — the property that makes
    per-batch partials a correct distributed plan."""
    rng = np.random.RandomState(9)
    a = _events(rng, 3000, 200)
    b = _events(rng, 4000, 200)
    sa = cms_sketch(ray.data.from_pandas(a), "user_id")
    sb = cms_sketch(ray.data.from_pandas(b), "user_id")
    sab = cms_sketch(
        ray.data.from_pandas(pd.concat([a, b], ignore_index=True)), "user_id"
    )
    np.testing.assert_array_equal(sab, sa + sb)


def test_cms_estimate_is_min_over_rows():
    ids = np.array([42, 7], dtype=np.int64)
    sk = np.zeros((3, 1 << CMS_WBITS), dtype=np.int64)
    for j in range(3):
        sk[j, cms_buckets(ids, j)] = [10 + j, 99 - j]
    np.testing.assert_array_equal(cms_estimate(sk, ids), [10, 97])


def test_cms_total_mass_per_row():
    """Every depth row holds exactly one increment per event."""
    rng = np.random.RandomState(1)
    df = _events(rng, 5000, 100)
    sk = cms_sketch(ray.data.from_pandas(df), "user_id")
    np.testing.assert_array_equal(sk.sum(axis=1), [len(df)] * sk.shape[0])


# ---------------------------------------------------------------------------
# skyline2 (Pareto frontier)


def test_sky2_mask_matches_brute_force():
    """Strict-dominance survivors, incl. ties and exact duplicates."""
    from simple_osm_queries_ray.stages.sketch import _sky2_mask

    rng = np.random.default_rng(7)
    for _ in range(300):
        n = int(rng.integers(1, 50))
        x = rng.integers(0, 8, n)
        y = rng.integers(0, 8, n)
        m = _sky2_mask(x, y)
        for i in range(n):
            dominated = np.any(
                (x >= x[i]) & (y >= y[i]) & ((x > x[i]) | (y > y[i]))
            )
            assert m[i] == (not dominated)


def test_sky2_duplicates_survive_together():
    from simple_osm_queries_ray.stages.sketch import _sky2_mask

    x = np.array([5, 5, 3, 5], dtype=np.int64)
    y = np.array([2, 2, 9, 1], dtype=np.int64)
    np.testing.assert_array_equal(_sky2_mask(x, y), [True, True, True, False])


def test_skyline2_local_filter_is_lossless():
    """The distributed plan (block partials -> final pass) equals the
    single-block skyline regardless of how rows are split into blocks."""
    from simple_osm_queries_ray.stages.sketch import _sky2_mask, skyline2

    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame(
        {
            "user_id": np.arange(n, dtype=np.int64),
            "n_events": rng.integers(0, 500, n),
            "v_cents": rng.integers(0, 500, n),
        }
    )
    got = (
        skyline2(ray.data.from_pandas(df).repartition(17), "n_events", "v_cents")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    m = _sky2_mask(df["n_events"].to_numpy(), df["v_cents"].to_numpy())
    exp = df[m].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
