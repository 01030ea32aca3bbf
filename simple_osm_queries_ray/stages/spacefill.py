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


def _plan_shards(
    with_hd: ray.data.Dataset, k: int, order: int, id_col: str
):
    """The tiny driver-side shard plan: one histogram pass + boundary-cell id
    collection.  Returns a ray.put handle to (cell_shard, straddle) plus the
    histogram arrays for lineage (cells, counts, starts)."""

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

    # resolve straddled cells: collect ONLY their ids (<= k-1 cells)
    straddle: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    if len(straddle_idx):
        scells = set(int(c) for c in cells[straddle_idx])
        sc_arr = np.array(sorted(scells), dtype=np.int64)

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
        for ci in straddle_idx:
            c = int(cells[ci])
            ids = np.sort(picked.loc[picked["hd"] == c, id_col].to_numpy())
            # shard cut ranks that fall strictly inside this cell's rank span
            lo, span = int(cum_before[ci]), int(counts[ci])
            cuts = starts[(starts > lo) & (starts < lo + span)] - lo
            # row with within-cell rank r belongs to shard first + #(cuts <= r)
            straddle[c] = (ids[cuts], np.int32(first_shard[ci]))

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

    with_hd = assign_hilbert(ds, order)
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
