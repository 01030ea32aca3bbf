"""Count-min sketch over the event stream — mergeable frequency estimates.

Companion to the HyperLogLog distinct counter (``stages/text.py``): where
HLL answers "how many distinct", CMS answers "how often does X occur"
in one streaming pass with O(d*w) state.  The scale property that matters
on a 100 TB stream: per-batch partial sketches MERGE BY ELEMENTWISE ADD,
so the whole reduction is `groupby(bucket).sum` over at most d*w rows —
no shuffle of the data itself, and the driver only ever sees the final
d x w table (24 KB at d=3, w=1024).

The depth-j hash replays the HLL mix pipeline (multiply / xor-shift twice)
on ``id + seed_j``; every operation is exactly reproducible in DuckDB
HUGEINT arithmetic, so the sketch — and therefore every estimate — has an
exact SQL twin (``__ray_entry__._cms_oracle_sql``).  The standard CMS
guarantee (estimate >= true count, overestimate bounded by collisions) is
test-pinned in ``tests/test_sketch.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

CMS_DEPTH = 3
CMS_WBITS = 10  # width = 1024 buckets per row
CMS_SEED_STEP = 0x9E3779B9  # seed_j = j * step, small enough for BIGINT adds

_M1 = np.uint64(0x9E3779B97F4A7C15)
_M2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _mix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) * _M1
    x ^= x >> np.uint64(33)
    x *= _M2
    x ^= x >> np.uint64(29)
    return x


def cms_buckets(ids: np.ndarray, j: int, wbits: int = CMS_WBITS) -> np.ndarray:
    """Depth-j bucket per id: top bits of the seeded 64-bit mix hash."""
    x = _mix64(ids.astype(np.uint64) + np.uint64(j * CMS_SEED_STEP))
    return (x >> np.uint64(64 - wbits)).astype(np.int64)


def cms_sketch(
    ds: ray.data.Dataset,
    id_col: str,
    depth: int = CMS_DEPTH,
    wbits: int = CMS_WBITS,
) -> np.ndarray:
    """One streaming pass -> the (depth, 2^wbits) count-min table.

    Per batch: nonzero (row*width + bucket, count) partials; global merge is
    one tiny groupby-sum (bounded by depth*width, not by data size).
    """
    w = 1 << wbits

    def partial(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch[id_col], dtype=np.int64)
        jb = np.concatenate(
            [np.int64(j * w) + cms_buckets(u, j, wbits) for j in range(depth)]
        )
        keys, counts = np.unique(jb, return_counts=True)
        return pa.table({"jb": keys, "c": counts.astype(np.int64)})

    merged = (
        ds.select_columns([id_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("jb")
        .sum("c")
        .to_pandas()
    )
    sketch = np.zeros(depth * w, dtype=np.int64)
    sketch[merged["jb"].to_numpy(np.int64)] = merged["sum(c)"].to_numpy(np.int64)
    return sketch.reshape(depth, w)


def cms_estimate(
    sketch: np.ndarray, probes: np.ndarray, wbits: int = CMS_WBITS
) -> np.ndarray:
    """Point estimates: MIN over depth rows at each probe's buckets."""
    ests = np.stack(
        [sketch[j, cms_buckets(probes, j, wbits)] for j in range(sketch.shape[0])]
    )
    return ests.min(axis=0)


def cms_user_counts(
    events: ray.data.Dataset, probes: list[int]
) -> "pa.Table":
    """Sketch the event stream once, then answer per-user frequency probes:
    (user_id, est, exact).  ``exact`` comes from a distributed filtered
    count (broadcast probe set, integer partials) so the CMS guarantee
    est >= exact is visible in the output."""
    import ray as _ray

    from ..state.broadcast import get as bget

    sk = cms_sketch(events, "user_id")
    p = np.asarray(sorted(probes), dtype=np.int64)
    est = cms_estimate(sk, p)

    pref = _ray.put(p)

    def exact_partial(batch: pa.Table) -> pa.Table:
        pp = bget(pref)
        u = np.asarray(batch["user_id"], dtype=np.int64)
        pos = np.searchsorted(pp, u)
        pos_c = np.minimum(pos, len(pp) - 1)
        hit = pp[pos_c] == u
        cnt = np.bincount(pos_c[hit], minlength=len(pp)).astype(np.int64)
        return pa.table({"i": np.arange(len(pp)), "n": cnt})

    ex = (
        events.select_columns(["user_id"])
        .map_batches(exact_partial, batch_format="pyarrow")
        .groupby("i")
        .sum("n")
        .to_pandas()
        .sort_values("i")
    )
    exact = np.zeros(len(p), dtype=np.int64)
    exact[ex["i"].to_numpy(np.int64)] = ex["sum(n)"].to_numpy(np.int64)
    return pa.table({"user_id": p, "est": est.astype(np.int64), "exact": exact})


def heavy_hitter_users(sf_dir: str, k: int = 64) -> "pd.DataFrame":
    """EXACT heavy hitters in two streaming passes — the scalable form of
    "GROUP BY user HAVING count > n/k" that never shuffles the full key set:

    1. candidate pass: within each batch, keep users with local count >
       batch_rows/k. If a user's GLOBAL count exceeds n/k, some batch must
       hold it above its local threshold (otherwise the global sum would be
       <= sum(batch_rows)/k = n/k), so the union of per-batch survivors is a
       guaranteed SUPERSET of the true heavy hitters — the Misra-Gries
       guarantee without sketch-merge bookkeeping. Candidate volume per
       batch is <= k rows.
    2. exact pass: broadcast the (<= k x batches, deduped) candidate set,
       count ONLY candidates per batch (partial sums), driver-reduce, and
       filter by the exact global threshold.

    Output: (user_id, n_events) for every user with n_events > n/k."""
    import numpy as np
    import pyarrow as pa
    import ray

    from ..sources.read import read_parquet_sized
    from ..state.broadcast import get as bget
    from .semi_join import isin_sorted

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["user_id"]).materialize()
    n = ds.count()

    def local_candidates(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["user_id"], dtype=np.int64)
        uniq, cnt = np.unique(u, return_counts=True)
        keep = cnt > len(u) / k
        return pa.table({"user_id": pa.array(uniq[keep])})

    cand_parts = [
        np.asarray(b["user_id"], dtype=np.int64)
        for b in ds.map_batches(local_candidates, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    ]
    cands = (
        np.unique(np.concatenate(cand_parts))
        if cand_parts
        else np.array([], dtype=np.int64)
    )
    c_ref = ray.put(cands)

    def count_candidates(batch: pa.Table) -> pa.Table:
        cs = bget(c_ref)
        u = np.asarray(batch["user_id"], dtype=np.int64)
        u = u[isin_sorted(u, cs)]
        uniq, cnt = np.unique(u, return_counts=True)
        return pa.table(
            {"user_id": pa.array(uniq), "c": pa.array(cnt.astype(np.int64))}
        )

    totals: dict[int, int] = {}
    for b in ds.map_batches(count_candidates, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for uid, c in zip(
            np.asarray(b["user_id"], dtype=np.int64),
            np.asarray(b["c"], dtype=np.int64),
        ):
            totals[int(uid)] = totals.get(int(uid), 0) + int(c)
    out_u = np.array(sorted(u for u, c in totals.items() if c > n / k), dtype=np.int64)
    out_c = np.array([totals[int(u)] for u in out_u], dtype=np.int64)
    # pandas, not from_arrow: a 0-row Ray Dataset silently drops its schema
    # in to_pandas(), which reads as a schema mismatch when the result is
    # legitimately empty (no user exceeds n/k at uniform scales)
    import pandas as pd

    return pd.DataFrame({"user_id": out_u, "n_events": out_c})


def _sky2_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Survivor mask of the 2-D Pareto frontier (maximize both, STRICT
    dominance: a row falls iff some row is >= on both dims and > on one;
    exact (x, y) duplicates all survive together).

    Vectorized sweep: sort desc by (x, y); within each equal-x group only
    rows at the group's max y can survive, and the group survives iff that
    max strictly exceeds the best y seen among strictly-larger x.
    """
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((-y, -x))
    xs, ys = x[order], y[order]
    starts = np.flatnonzero(np.r_[True, xs[1:] != xs[:-1]])
    gmax = ys[starts]  # ys is desc within each equal-x group
    best_prev = np.r_[np.iinfo(np.int64).min, np.maximum.accumulate(gmax)[:-1]]
    gid = np.cumsum(np.r_[False, xs[1:] != xs[:-1]])
    keep_sorted = (ys == gmax[gid]) & (gmax[gid] > best_prev[gid])
    mask = np.zeros(n, dtype=bool)
    mask[order] = keep_sorted
    return mask


def skyline2(
    ds: ray.data.Dataset, xcol: str, ycol: str
) -> ray.data.Dataset:
    """Distributed 2-D Pareto frontier over int64 columns (maximize both).

    Per-block LOCAL skyline partial — any row dominated inside a block is
    dominated globally, so the filter is lossless — then one final pass over
    the concatenated partials (``repartition(1)``).  Typical frontiers are
    tiny (the final block holds one row per distinct x on the frontier);
    the adversarial worst case (perfectly anti-correlated dims) degenerates
    to O(N) survivors per block, in which case shard by x-range and merge
    hierarchically instead.
    """

    def local(batch: pa.Table) -> pa.Table:
        m = _sky2_mask(
            np.asarray(batch[xcol], dtype=np.int64),
            np.asarray(batch[ycol], dtype=np.int64),
        )
        return batch.filter(pa.array(m))

    partial = ds.map_batches(local, batch_format="pyarrow")
    return partial.repartition(1).map_batches(local, batch_format="pyarrow")
