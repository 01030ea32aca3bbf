"""Hilbert-curve spatial ordering and equal-count locality sharding.

The scale problem this solves: a 100 TB feature table must be cut into
shards that are (a) equal-sized so no worker starves, and (b) spatially
compact so a bbox / polygon / tile query touches few shards.  The
reference's import solves (a) with a nodes-per-extent bin-packing plan
(``/root/reference/src/importing/import.go:74-84``) and gets (b) only
coarsely.  Hilbert range partitioning gives both: order every feature by
its Hilbert index (``functions/hilbert.py``) and cut the ORDER into
equal-count ranges — contiguous curve ranges are spatially compact by the
curve's unit-step property (test-pinned in ``tests/test_spacefill.py``).

Plan shape (nothing materializes the table driver-side):

1. one ``map_batches`` pass emits sparse per-batch (cell, count) histogram
   partials over the 4^order Hilbert cells — the only thing the driver ever
   sees is the aggregated histogram (bounded by 4^order rows, not by table
   size; at order 8 that is <= 65 536 rows);
2. the driver cumsums the histogram and places the NTILE boundaries
   (exact equal-count semantics: first N%K shards get one extra row);
   cells a boundary splits mid-cell are resolved by collecting ONLY those
   cells' (cell, id) pairs — at most K-1 cells regardless of table size;
3. the tiny plan (per-cell shard array + per-straddle-cell id thresholds)
   is broadcast via ``ray.put`` and a second ``map_batches`` pass stamps
   the shard id — two streaming passes total, no sort, no shuffle.

This matches ``NTILE(K) OVER (ORDER BY hd, id)`` exactly (the SQL twin in
``__ray_entry__.oracle_sql``), and is how the engine would lay out parquet
partitions for the resumable 100 TB import (cf. the density-planned wave
writer in ``pipelines/build_index.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.hilbert import extent_grid_xy, hilbert_d
from ..state.broadcast import get as bget

HILBERT_ORDER = 10  # hilbert_cells query: 1024x1024 extent grid
SHARD_ORDER = 8  # histogram resolution for shard planning: 65 536 cells


def assign_hilbert(
    ds: ray.data.Dataset, order: int = HILBERT_ORDER, out_col: str = "hd"
) -> ray.data.Dataset:
    """Append the extent-grid Hilbert index (vectorized, zero-copy Arrow)."""

    def fn(batch: pa.Table) -> pa.Table:
        gx, gy = extent_grid_xy(
            np.asarray(batch["lon"]), np.asarray(batch["lat"]), order
        )
        return batch.append_column(out_col, pa.array(hilbert_d(gx, gy, order)))

    return ds.map_batches(fn, batch_format="pyarrow")


def _ntile_starts(n_rows: int, k: int) -> np.ndarray:
    """0-based start rank of each of the k NTILE buckets (SQL semantics:
    first n_rows % k buckets hold one extra row)."""
    q, r = divmod(n_rows, k)
    sizes = np.full(k, q, dtype=np.int64)
    sizes[:r] += 1
    return np.concatenate([[0], np.cumsum(sizes)[:-1]])


def hilbert_shards(
    ds: ray.data.Dataset,
    k: int,
    order: int = SHARD_ORDER,
    id_col: str = "id",
) -> ray.data.Dataset:
    """Equal-count Hilbert range sharding: (id, hd, shard), shard in [0, k).

    Exact ``NTILE(k) OVER (ORDER BY hd, id)`` semantics.  ``ds`` must carry
    ``lon``/``lat``/``id_col``.  Two streaming passes; driver state is the
    4^order histogram and the <= k-1 straddled cells' id lists (for a
    deeper grid than one histogram level can hold, recurse the same plan on
    the straddled cells — not needed at order 8).
    """
    with_hd = assign_hilbert(ds, order)
    plan = _plan_shards(with_hd, k, order, id_col)

    def stamp(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col])
        hd = np.asarray(batch["hd"])
        return pa.table(
            {id_col: ids, "hd": hd, "shard": _stamp_shards(plan, hd, ids)}
        )

    return with_hd.select_columns([id_col, "hd"]).map_batches(
        stamp, batch_format="pyarrow"
    )


# above this many total rows in boundary-straddling cells, _plan_shards
# switches from pulling their ids to the 3-pass bucketed rank selection
_STRADDLE_PULL_LIMIT = 2_000_000


def _bucketed_rank_ids(
    with_hd: ray.data.Dataset,
    id_col: str,
    cut_ranks: dict[int, np.ndarray],
    n_buckets: int = 4096,
) -> dict[int, np.ndarray]:
    """For each straddled cell, the id values at the given within-cell ranks
    (ranks are by ascending id) — WITHOUT pulling the cell's rows to the
    driver. Three narrow passes: (A) per-cell id min/max, (B) per
    (cell, id-range-bucket) counts, (C) pull only the buckets a cut rank
    lands in (~count/n_buckets rows per cut). The bucket map only needs to
    be deterministic and monotone in id, so float64 rounding in the scale
    factor is harmless (both passes share the formula)."""
    sc_arr = np.array(sorted(cut_ranks), dtype=np.int64)

    def match(batch: pa.Table):
        hd = np.asarray(batch["hd"], dtype=np.int64)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        pos = np.clip(np.searchsorted(sc_arr, hd), 0, len(sc_arr) - 1)
        m = sc_arr[pos] == hd
        return pos[m], ids[m]

    # pass A: per-cell id min/max (combined on the tiny driver side)
    def mnmx(batch: pa.Table) -> pa.Table:
        pos, ids = match(batch)
        if not len(pos):
            e = np.array([], dtype=np.int64)
            return pa.table({"p": e, "mn": e, "mx": e})
        order_ = np.argsort(pos, kind="stable")
        pos, ids = pos[order_], ids[order_]
        u, st = np.unique(pos, return_index=True)
        return pa.table(
            {
                "p": pa.array(u),
                "mn": pa.array(np.minimum.reduceat(ids, st)),
                "mx": pa.array(np.maximum.reduceat(ids, st)),
            }
        )

    hd_ids = with_hd.select_columns(["hd", id_col])
    a = hd_ids.map_batches(mnmx, batch_format="pyarrow").to_pandas()
    g = a.groupby("p").agg(mn=("mn", "min"), mx=("mx", "max"))
    mnf = np.zeros(len(sc_arr), dtype=np.float64)
    scale = np.ones(len(sc_arr), dtype=np.float64)
    for p, r in g.iterrows():
        mnf[int(p)] = float(r["mn"])
        span = float(r["mx"]) - float(r["mn"]) + 1.0
        scale[int(p)] = n_buckets / span

    def bucket_of(pos: np.ndarray, ids: np.ndarray) -> np.ndarray:
        b = np.floor((ids.astype(np.float64) - mnf[pos]) * scale[pos])
        return np.clip(b, 0, n_buckets - 1).astype(np.int64)

    # pass B: per (cell, bucket) counts
    def bcount(batch: pa.Table) -> pa.Table:
        pos, ids = match(batch)
        if not len(pos):
            e = np.array([], dtype=np.int64)
            return pa.table({"k": e, "n": e})
        key = pos * np.int64(n_buckets) + bucket_of(pos, ids)
        u, n = np.unique(key, return_counts=True)
        return pa.table({"k": pa.array(u), "n": pa.array(n.astype(np.int64))})

    b = (
        hd_ids.map_batches(bcount, batch_format="pyarrow")
        .repartition(8)
        .groupby("k")
        .sum("n")
        .to_pandas()
    )
    key = b["k"].to_numpy()
    cnt = b["sum(n)"].to_numpy()
    order_ = np.argsort(key)
    key, cnt = key[order_], cnt[order_]

    # locate the bucket containing each cut rank; remember the rank of the
    # bucket's first row so pass C resolves the within-bucket offset
    need: dict[int, set[int]] = {}
    bucket_base: dict[tuple[int, int], int] = {}
    for p, c in enumerate(sc_arr):
        in_cell = (key >= p * n_buckets) & (key < (p + 1) * n_buckets)
        kb = (key[in_cell] - p * n_buckets).astype(np.int64)
        kc = cnt[in_cell]
        cum = np.concatenate([[0], np.cumsum(kc)])
        for r in cut_ranks[int(c)]:
            bi = int(np.searchsorted(cum, int(r), side="right") - 1)
            need.setdefault(p, set()).add(int(kb[bi]))
            bucket_base[(p, int(kb[bi]))] = int(cum[bi])

    need_keys = np.sort(
        np.array(
            [p * n_buckets + bb for p, bs in need.items() for bb in bs],
            dtype=np.int64,
        )
    )

    # pass C: pull ONLY the needed buckets' ids
    def pick(batch: pa.Table) -> pa.Table:
        pos, ids = match(batch)
        if not len(pos):
            e = np.array([], dtype=np.int64)
            return pa.table({"k": e, "v": e})
        key_ = pos * np.int64(n_buckets) + bucket_of(pos, ids)
        j = np.clip(np.searchsorted(need_keys, key_), 0, len(need_keys) - 1)
        m = need_keys[j] == key_
        return pa.table({"k": pa.array(key_[m]), "v": pa.array(ids[m])})

    picked = hd_ids.map_batches(pick, batch_format="pyarrow").to_pandas()
    pk = picked["k"].to_numpy()
    pv = picked["v"].to_numpy()

    out: dict[int, np.ndarray] = {}
    for p, c in enumerate(sc_arr):
        vals = []
        for r in cut_ranks[int(c)]:
            # which bucket held this rank (recompute: same walk as above)
            in_cell = (key >= p * n_buckets) & (key < (p + 1) * n_buckets)
            kb = (key[in_cell] - p * n_buckets).astype(np.int64)
            cum = np.concatenate([[0], np.cumsum(cnt[in_cell])])
            bi = int(np.searchsorted(cum, int(r), side="right") - 1)
            bb = int(kb[bi])
            ids_b = np.sort(pv[pk == p * n_buckets + bb])
            vals.append(int(ids_b[int(r) - bucket_base[(p, bb)]]))
        out[int(c)] = np.array(vals, dtype=np.int64)
    return out


def _plan_shards(
    with_hd: ray.data.Dataset, k: int, order: int, id_col: str
):
    """The tiny driver-side shard plan: one histogram pass + boundary-cell
    cut resolution (direct id pull below _STRADDLE_PULL_LIMIT rows, bucketed
    rank selection above).  Returns a ray.put handle to (cell_shard,
    straddle) plus the histogram arrays for lineage (cells, counts,
    starts)."""

    def partial(batch: pa.Table) -> pa.Table:
        hd = np.asarray(batch["hd"])
        cells, counts = np.unique(hd, return_counts=True)
        return pa.table({"hd": cells, "n": counts.astype(np.int64)})

    def combine(batch: pa.Table) -> pa.Table:
        c, inv = np.unique(np.asarray(batch["hd"]), return_inverse=True)
        n = np.zeros(len(c), dtype=np.int64)
        np.add.at(n, inv, np.asarray(batch["n"]))
        return pa.table({"hd": c, "n": n})

    # partials can hold up to 4^order rows PER BLOCK; funnel them through a
    # narrow repartition + re-combine so the final groupby shuffles a few
    # combined partials, not (blocks x occupied-cells) rows
    hist = (
        with_hd.select_columns(["hd"])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(8)
        .map_batches(combine, batch_format="pyarrow")
        .groupby("hd")
        .sum("n")
        .to_pandas()
    )
    if hist.empty:  # zero input rows: the empty groupby drops its columns
        cells = np.array([], dtype=np.int64)
        counts = np.array([], dtype=np.int64)
    else:
        hist = hist.sort_values("hd")
        cells = hist["hd"].to_numpy()
        counts = hist["sum(n)"].to_numpy()
    n_rows = int(counts.sum())
    starts = _ntile_starts(n_rows, k)  # start rank of shard j, j=1..k-1 cut points
    # stays length-aligned with cells/counts when they are empty
    cum_before = np.concatenate([[0], np.cumsum(counts)])[: len(counts)]

    # cell i spans ranks [cum_before[i], cum_before[i]+counts[i]);
    # its first shard = number of shard starts <= cum_before[i]
    first_shard = np.searchsorted(starts, cum_before, side="right") - 1
    last_shard = np.searchsorted(starts, cum_before + counts - 1, side="right") - 1
    straddle_idx = np.nonzero(first_shard != last_shard)[0]

    # dense per-cell shard lookup (-1 marks straddlers)
    n_cells = 1 << (2 * order)
    cell_shard = np.full(n_cells, -1, dtype=np.int32)
    clean = first_shard == last_shard
    cell_shard[cells[clean]] = first_shard[clean].astype(np.int32)

    # resolve straddled cells: <= k-1 cells, but each can be corpus-scaled
    # (a dense metro cell). Below _STRADDLE_PULL_LIMIT total rows the ids
    # pull to the driver directly; above it, a bucketed rank-selection
    # (3 narrow passes) pulls only the id buckets containing a cut rank.
    straddle: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    if len(straddle_idx):
        # within-cell rank (by ascending id) of every shard cut per cell
        cut_ranks: dict[int, np.ndarray] = {}
        for ci in straddle_idx:
            c = int(cells[ci])
            lo, span = int(cum_before[ci]), int(counts[ci])
            cut_ranks[c] = starts[(starts > lo) & (starts < lo + span)] - lo

        total_straddle = int(counts[straddle_idx].sum())
        if total_straddle <= _STRADDLE_PULL_LIMIT:
            sc_arr = np.sort(cells[straddle_idx].astype(np.int64))

            def pick(batch: pa.Table) -> pa.Table:
                hd = np.asarray(batch["hd"])
                m = np.isin(hd, sc_arr)
                return pa.table(
                    {"hd": hd[m], id_col: np.asarray(batch[id_col])[m]}
                )

            picked = (
                with_hd.select_columns(["hd", id_col])
                .map_batches(pick, batch_format="pyarrow")
                .to_pandas()
            )
            thr = {
                c: np.sort(picked.loc[picked["hd"] == c, id_col].to_numpy())[r]
                for c, r in cut_ranks.items()
            }
        else:
            thr = _bucketed_rank_ids(with_hd, id_col, cut_ranks)
        for ci in straddle_idx:
            c = int(cells[ci])
            # row with within-cell rank r belongs to shard first + #(cuts <= r)
            straddle[c] = (thr[c], np.int32(first_shard[ci]))

    handle = ray.put((cell_shard, straddle))
    return {
        "handle": handle,
        "cells": cells,
        "counts": counts,
        "starts": starts,
        "k": k,
        "order": order,
    }


def _stamp_shards(plan: dict, hd: np.ndarray, ids: np.ndarray) -> np.ndarray:
    """Vectorized shard assignment from the broadcast plan.  Only straddle
    cells PRESENT in this batch are resolved (the plan may hold up to k-1
    of them globally; a batch usually sees none or a handful)."""
    cs, strad = bget(plan["handle"])
    shard = cs[hd].copy()
    miss = shard < 0
    if strad and miss.any():
        for c in np.unique(hd[miss]):
            thr, first = strad[int(c)]
            m = hd == c
            shard[m] = first + np.searchsorted(
                thr, ids[m], side="right"
            ).astype(np.int32)
    return shard.astype(np.int64)


# -- partitioned parquet layout over the shard plan ---------------------------


def _shard_hd_bounds(
    cells: np.ndarray, counts: np.ndarray, starts: np.ndarray
) -> list[tuple[int, int]]:
    """Per shard: the [hd_lo, hd_hi] Hilbert range its rank span covers.
    Empty shards get (0, -1).  Contiguity (non-overlapping except at
    boundary-straddling cells) follows from range partitioning."""
    n_rows = int(counts.sum())
    cum = np.concatenate([np.cumsum(counts) - counts, [n_rows]])
    bounds = []
    ends = np.concatenate([starts[1:], [n_rows]])
    for s, e in zip(starts, ends):
        if e <= s:
            bounds.append((0, -1))
            continue
        lo = int(cells[np.searchsorted(cum, s, side="right") - 1])
        hi = int(cells[np.searchsorted(cum, e - 1, side="right") - 1])
        bounds.append((lo, hi))
    return bounds


def write_hilbert_partitioned(
    ds: ray.data.Dataset,
    out_dir: str,
    k: int = 32,
    order: int = SHARD_ORDER,
    waves: int = 4,
    id_col: str = "id",
    lineage: dict | None = None,
) -> "object":
    """Materialize ``ds`` as hive-partitioned parquet ``shard=<s>/`` under the
    equal-count Hilbert plan — the resumable spatial layout for a 100 TB
    import: balanced by count, compact by curve, one directory per shard so
    a rerun (or a reader) touches only the partitions it needs.

    Shards write in ``waves`` groups, each recorded in the checkpoint
    manifest (``state/manifest.py``) with per-partition row counts; a rerun
    skips recorded waves.  The shard plan (k, order, per-shard Hilbert
    ranges) persists in the manifest meta as the layout's lineage, which
    :func:`shards_for_bbox` uses for pruned reads.  Returns the Manifest.
    """
    import time as _time

    from ..state.manifest import Manifest

    # Materialize the hd-stamped input ONCE: the plan takes two narrow scans
    # (histogram + straddle) and every wave another filtered scan — without
    # this, each pass RE-EXECUTES the whole upstream pipeline (read + hilbert
    # assign), i.e. waves+2 full recomputes of a corpus-sized input. Cached
    # blocks spill through the object store, which is one write+read of the
    # data instead of ~6 recomputes of it.
    with_hd = assign_hilbert(ds, order).materialize()
    plan = _plan_shards(with_hd, k, order, id_col)
    cells, counts, starts = plan["cells"], plan["counts"], plan["starts"]
    bounds = _shard_hd_bounds(cells, counts, starts)
    n_rows = int(counts.sum())
    sizes = np.diff(np.concatenate([starts, [n_rows]]))  # exact NTILE sizes

    meta = {
        "kind": "hilbert_partitioned",
        "k": k,
        "order": order,
        "shard_hd": [list(b) for b in bounds],
        **(lineage or {}),
    }
    man = Manifest.load_or_create(out_dir, meta)

    def stamp_full(batch: pa.Table) -> pa.Table:
        hd = np.asarray(batch["hd"])
        ids = np.asarray(batch[id_col])
        return batch.append_column("shard", pa.array(_stamp_shards(plan, hd, ids)))

    full = with_hd.map_batches(stamp_full, batch_format="pyarrow")

    per_wave = max(1, (k + waves - 1) // waves)
    for w in range(waves):
        lo, hi = w * per_wave, min((w + 1) * per_wave, k)
        if lo >= hi:
            continue
        key = f"wave_{lo}_{hi}"
        if man.is_done(key):
            continue
        t0 = _time.time()

        # a crash mid-wave leaves partial parquet files in this wave's
        # shard= dirs (the manifest records AFTER the write), and a rerun's
        # write_parquet would append uniquely-named files NEXT TO them —
        # readers would see duplicated rows. An unrecorded wave's dirs are
        # therefore garbage by definition: clear them before rewriting.
        import shutil as _shutil

        for s in range(lo, hi):
            _shutil.rmtree(f"{out_dir}/data/shard={s}", ignore_errors=True)

        def pick(batch: pa.Table, lo=lo, hi=hi) -> pa.Table:
            s = np.asarray(batch["shard"])
            return batch.filter(pa.array((s >= lo) & (s < hi)))

        full.map_batches(pick, batch_format="pyarrow").write_parquet(
            f"{out_dir}/data", partition_cols=["shard"]
        )
        # per-partition counts come exactly from the NTILE plan — no extra pass
        man.record(
            key, {s: int(sizes[s]) for s in range(lo, hi)}, _time.time() - t0
        )
    return man


def shards_for_bbox(
    bbox: tuple[float, float, float, float],
    shard_hd: list[tuple[int, int]],
    order: int = SHARD_ORDER,
) -> list[int]:
    """Shards whose Hilbert range can hold any cell of ``bbox`` — the
    pruning set for a range read (conservative superset; readers still
    apply the exact geometry filter)."""
    from ..functions.hilbert import extent_grid_xy, hilbert_d

    gx0, gy0 = extent_grid_xy(np.array([bbox[0]]), np.array([bbox[1]]), order)
    gx1, gy1 = extent_grid_xy(np.array([bbox[2]]), np.array([bbox[3]]), order)
    xs = np.arange(gx0[0], gx1[0] + 1)
    ys = np.arange(gy0[0], gy1[0] + 1)
    mx, my = np.meshgrid(xs, ys)
    hds = np.unique(hilbert_d(mx.ravel(), my.ravel(), order))
    out = []
    for s, (lo, hi) in enumerate(shard_hd):
        if hi < lo:
            continue
        pos = np.searchsorted(hds, lo)
        if pos < len(hds) and hds[pos] <= hi:
            out.append(s)
    return out


def read_hilbert_shards(out_dir: str, shards: list[int]) -> ray.data.Dataset:
    """Read ONLY the given shard partitions (hive dirs) — the pruned path."""
    import os

    paths = [
        d
        for s in shards
        if os.path.isdir(d := f"{out_dir}/data/shard={s}")
    ]
    if not paths:
        # legitimate no-overlap query (bbox outside the data extent, or the
        # requested shards were empty and never materialized as dirs):
        # read_parquet([]) raises, so return an empty dataset instead,
        # borrowing the schema from any written shard file
        import glob

        import pyarrow.parquet as pq

        any_file = sorted(glob.glob(f"{out_dir}/data/shard=*/*.parquet"))
        if any_file:
            tbl = pq.read_schema(any_file[0]).empty_table()
            if "shard" not in tbl.column_names:  # hive partition column
                tbl = tbl.append_column("shard", pa.array([], type=pa.int64()))
            return ray.data.from_arrow(tbl)
        return ray.data.from_arrow(
            pa.table({"shard": pa.array([], type=pa.int64())})
        )
    return ray.data.read_parquet(paths)
