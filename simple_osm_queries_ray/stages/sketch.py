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
