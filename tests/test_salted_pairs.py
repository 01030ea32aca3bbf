"""Planted-hot-key tests for the salted all-pairs-per-key machinery
(stages/text.py salted_key_pairs) — the skew path behind covisit_pairs and
user_cell_jaccard. The scale claim under test: one dense key (an urban
cell-hour with thousands of participants) must NOT land its full k^2/2 pair
enumeration in a single task, and salting must not change the result."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from simple_osm_queries_ray.stages.text import (
    _PAIR_MIX_B,
    covisit_pairs,
    salted_key_pairs,
    user_cell_jaccard,
)

SF = "/root/testdata/sf0.001"


def _triples(keys, users):
    return ray.data.from_arrow(
        pa.table(
            {
                "key": pa.array(np.asarray(keys, dtype=np.int64)),
                "user_id": pa.array(np.asarray(users, dtype=np.int64)),
            }
        )
    )


def _pairs_df(ds):
    df = ds.to_pandas().sort_values("pair").reset_index(drop=True)
    return df


def _planted(n_hot=1200, hot_key=7):
    rng = np.random.RandomState(20260820)
    # one dense meeting ...
    keys = [np.full(n_hot, hot_key, dtype=np.int64)]
    users = [np.arange(n_hot, dtype=np.int64) * 3 + 1]
    # ... plus background keys of ordinary size
    for k in range(100, 140):
        m = rng.randint(2, 9)
        keys.append(np.full(m, k, dtype=np.int64))
        users.append(rng.choice(5000, size=m, replace=False).astype(np.int64))
    # and a pair that co-occurs under two keys (n must count keys)
    keys.append(np.array([900, 900, 901, 901], dtype=np.int64))
    users.append(np.array([11, 22, 11, 22], dtype=np.int64))
    return np.concatenate(keys), np.concatenate(users)


def test_salted_equals_unsalted_with_planted_hot_key():
    keys, users = _planted()
    base = _pairs_df(salted_key_pairs(_triples(keys, users), hot_threshold=10**9))
    # hot_threshold=128 forces the 1200-member meeting into ceil(1200/128)=10
    # salt groups; result must be IDENTICAL (same pairs, same counts)
    salted = _pairs_df(salted_key_pairs(_triples(keys, users), hot_threshold=128))
    assert len(base) == len(salted)
    assert (base["pair"].to_numpy() == salted["pair"].to_numpy()).all()
    assert (base["n"].to_numpy() == salted["n"].to_numpy()).all()
    # sanity on the plant itself: the hot meeting contributes C(1200,2) pairs
    assert len(base) >= 1200 * 1199 // 2
    df = base.set_index("pair")["n"]
    assert df.loc[11 * (1 << 31) + 22] == 2  # two-key co-occurrence counted


def test_salted_bounds_per_task_enumeration():
    keys, users = _planted()
    t = 128
    # every (key, i, j) segment must stay within ~(2*t)^2 pairs: a task holds
    # at most two salt groups of expected size <= t each (hash unevenness
    # gets a 2x allowance per side). Unsalted, the hot meeting would be ONE
    # segment of C(1200,2) ~ 719k pairs, far past this bound.
    bound = (2 * t) ** 2
    assert 1200 * 1199 // 2 > bound
    out = salted_key_pairs(
        _triples(keys, users), hot_threshold=t, max_task_pairs=bound
    )
    assert out.count() >= 1200 * 1199 // 2  # asserts inside tasks didn't fire


def test_salted_dedups_cross_batch_duplicates():
    keys, users = _planted(n_hot=600)
    # duplicate every row (two blocks of the same triples): counts must not
    # double — the route pass replicates deterministically and each task
    # dedups on (key, i, j, user)
    ds_dup = ray.data.from_arrow(
        pa.table(
            {
                "key": pa.array(np.concatenate([keys, keys])),
                "user_id": pa.array(np.concatenate([users, users])),
            }
        )
    ).repartition(8)
    base = _pairs_df(salted_key_pairs(_triples(keys, users), hot_threshold=10**9))
    dup = _pairs_df(salted_key_pairs(ds_dup, hot_threshold=64))
    assert len(base) == len(dup)
    assert (base["pair"].to_numpy() == dup["pair"].to_numpy()).all()
    assert (base["n"].to_numpy() == dup["n"].to_numpy()).all()


def test_salt_hash_spreads_hot_members():
    # the member-salt hash must actually spread a dense meeting's users:
    # with g=10 groups over 1200 sequential-ish ids no group may exceed 2x
    # the expected size (the same allowance the bound test budgets for)
    u = np.arange(1200, dtype=np.int64) * 3 + 1
    g = 10
    s = (np.abs(u * _PAIR_MIX_B) >> np.int64(33)) % g
    sizes = np.bincount(s, minlength=g)
    assert sizes.max() <= 2 * 1200 // g
    assert (sizes > 0).all()


def test_covisit_and_jaccard_still_green_with_tight_threshold():
    # end-to-end: the two public queries give identical results whether or
    # not salting engages (tiny threshold forces it on real sf0.001 data)
    for fn, sort_cols in (
        (covisit_pairs, ["user_a", "user_b"]),
        (user_cell_jaccard, ["user_a", "user_b"]),
    ):
        base = (
            fn(SF, hot_threshold=10**9)
            .to_pandas()
            .sort_values(sort_cols)
            .reset_index(drop=True)
        )
        tight = (
            fn(SF, hot_threshold=4)
            .to_pandas()
            .sort_values(sort_cols)
            .reset_index(drop=True)
        )
        assert base.equals(tight), fn.__name__
