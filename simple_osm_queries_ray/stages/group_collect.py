"""Bucketed vectorized group-collect: the engine's grouped list-assembly shuffle.

``Dataset.groupby(key).map_groups(fn)`` calls Python once per *group*; with
millions of tiny groups (e.g. one way per 5 nodes) that is a Python-loop
disguised as a shuffle. Instead we shuffle once on a hash *bucket* of the key
(``groupby("__bucket")``) and assemble **all** groups of a bucket in one
vectorized call: ``np.lexsort`` + ``np.unique`` segment offsets +
``pa.ListArray.from_arrays``.

Scale notes (100 TB design):
- one all-to-all shuffle keyed on ``hash(key) % num_buckets``; pick
  ``num_buckets`` so a bucket (≈ total_rows / num_buckets) fits a worker heap;
- group sizes are bounded by the data model (way member lists), so no single
  group can blow a bucket — skewed *keys* are impossible here by construction;
  skewed cells are handled separately (density-planned hot-cell splitting,
  pipelines/build_index.py::PartitionPlan).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pyarrow as pa
import ray.data


_HASH_MUL = np.int64(-7046029254386353131)


def bucket_of(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    """Fibonacci-hash bucket id in [0, num_buckets): cheap integer spread so
    consecutive keys don't land in one bucket. THE one shared definition —
    every hash-bucket shuffle in the package must use it so both sides of
    any bucketed join agree."""
    return np.abs((np.asarray(keys, dtype=np.int64) * _HASH_MUL) >> np.int64(32)) % num_buckets


def bucket_collect(
    ds: ray.data.Dataset,
    key: str,
    assemble: Callable[[pa.Table, np.ndarray, np.ndarray, np.ndarray], pa.Table],
    *,
    sort_col: str | None = None,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Group ``ds`` by ``key`` and assemble each bucket's groups vectorized.

    ``assemble(sorted_tbl, group_keys, starts, ends) -> pa.Table`` receives the
    bucket's rows sorted by (key, sort_col) plus the per-group segment bounds
    and must emit one row per group. No per-group Python.
    """

    def add_bucket(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[key], dtype=np.int64)
        return batch.append_column(
            "__bucket", pa.array(bucket_of(k, num_buckets).astype(np.int64))
        )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl = tbl.drop_columns(["__bucket"])
        k = np.asarray(tbl[key], dtype=np.int64)
        if sort_col is not None:
            s = np.asarray(tbl[sort_col], dtype=np.int64)
            order = np.lexsort((s, k))
        else:
            order = np.argsort(k, kind="stable")
        tbl = tbl.take(pa.array(order))
        k = k[order]
        group_keys, starts = np.unique(k, return_index=True)
        ends = np.append(starts[1:], len(k))
        return assemble(tbl, group_keys, starts, ends)

    return ds.map_batches(add_bucket, batch_format="pyarrow").groupby("__bucket").map_groups(
        per_bucket, batch_format="pyarrow"
    )


def collect_list_column(
    flat: pa.Array | np.ndarray, starts: np.ndarray, ends: np.ndarray, type_: pa.DataType
) -> pa.ListArray:
    """Build a list column from already-sorted flat values and segment bounds.

    Segments must be contiguous ([starts[i], ends[i]) covering the array in
    order), which ``bucket_collect`` guarantees.
    """
    if len(starts) == 0:
        # zero groups: Arrow requires list offsets of length >= 1, and the
        # concat below would produce an empty offsets array (empty blocks
        # reach here whenever an upstream filter empties a block)
        return pa.LargeListArray.from_arrays(
            pa.array([0], type=pa.int64()), pa.array([], type=type_)
        ).cast(pa.list_(type_))
    offsets = np.concatenate([starts, ends[-1:]]).astype(np.int64)
    if isinstance(flat, np.ndarray):
        flat = pa.array(flat, type=type_)
    elif flat.type != type_:
        flat = flat.cast(type_)
    return pa.LargeListArray.from_arrays(pa.array(offsets, type=pa.int64()), flat).cast(
        pa.list_(type_)
    )


def segment_unique_lists(
    group_idx: np.ndarray, values: np.ndarray, n_groups: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-group sorted-unique values -> (flat_unique, offsets len n_groups+1).

    Vectorized: one np.unique over (group_idx, value) pairs + a bincount.
    ``values`` must be non-negative int64 (packed cell ids are).
    """
    group_idx = np.asarray(group_idx, dtype=np.int64)
    values = np.asarray(values, dtype=np.int64)
    pairs = np.stack([group_idx, values], axis=1)
    uniq = np.unique(pairs, axis=0)
    counts = np.bincount(uniq[:, 0], minlength=n_groups)
    offsets = np.zeros(n_groups + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return uniq[:, 1], offsets


_REDUCERS = {"sum": np.add, "min": np.minimum, "max": np.maximum}


def bucketed_reduce(
    ds: ray.data.Dataset,
    key_cols: list[str],
    val_ops: dict[str, str],
    *,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Per-key reduction over int64 columns via ONE hash-bucket shuffle + a
    vectorized lexsort/reduceat per bucket; ``val_ops`` maps value column ->
    "sum" | "min" | "max" (mixed ops in one pass).

    This is the high-cardinality replacement for
    ``groupby(keys).aggregate(...)``: Ray's generic aggregate carries
    per-group machinery that costs ~8 s at ~150 k groups and minutes at
    ~2 M groups (measured, sf0.1 host), while this path is sub-second at
    both — use the generic form below ~10^3 groups, this one above.
    Empty ``val_ops`` makes it a global DISTINCT over the keys.
    Output: key_cols + value columns, reduced.
    """

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = np.zeros(len(batch), dtype=np.uint64)
        for c in key_cols:
            h = h * np.uint64(0x100000001B3) + np.asarray(
                batch[c], dtype=np.int64
            ).astype(np.uint64)
        return batch.append_column(
            "__bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64))
        )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        keys = [np.asarray(tbl[c], dtype=np.int64) for c in key_cols]
        if len(keys[0]) == 0:
            return pa.table(
                {c: pa.array([], type=pa.int64()) for c in [*key_cols, *val_ops]}
            )
        order = np.lexsort(tuple(reversed(keys)))
        keys = [k[order] for k in keys]
        first = np.ones(len(keys[0]), dtype=bool)
        first[1:] = False
        for k in keys:
            first[1:] |= k[1:] != k[:-1]
        starts = np.flatnonzero(first)
        out = {c: pa.array(k[starts]) for c, k in zip(key_cols, keys)}
        for c, op in val_ops.items():
            v = np.asarray(tbl[c], dtype=np.int64)[order]
            out[c] = pa.array(_REDUCERS[op].reduceat(v, starts))
        return pa.table(out)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda t: per_bucket(t.drop_columns(["__bucket"])),
            batch_format="pyarrow",
        )
    )


def bucketed_sum(
    ds: ray.data.Dataset,
    key_cols: list[str],
    val_cols: list[str],
    *,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """SUM per key tuple — see :func:`bucketed_reduce`."""
    return bucketed_reduce(
        ds, key_cols, {c: "sum" for c in val_cols}, num_buckets=num_buckets
    )


def bucketed_min(
    ds: ray.data.Dataset,
    key_cols: list[str],
    val_cols: list[str],
    *,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """MIN per key tuple — see :func:`bucketed_reduce`."""
    return bucketed_reduce(
        ds, key_cols, {c: "min" for c in val_cols}, num_buckets=num_buckets
    )


def bucketed_distinct(
    ds: ray.data.Dataset, key_cols: list[str], *, num_buckets: int = 64
) -> ray.data.Dataset:
    """Global DISTINCT over int64 key tuples — see :func:`bucketed_reduce`."""
    return bucketed_reduce(ds, key_cols, {}, num_buckets=num_buckets)


def coalesce_small_blocks(
    ds: ray.data.Dataset, *, rows_per_block: int = 250_000, min_blocks: int | None = None
) -> ray.data.Dataset:
    """Collapse post-shuffle block fragmentation on a MATERIALIZED dataset.

    Reduce-side block count follows the map-side count, so a small table
    exiting a wide op inherits hundreds of near-empty blocks (e.g. the
    decoded OSM element stream has one block per PBF blob), and every
    later shuffle pays its per-block fixed cost times that count —
    observed 268 s in flow_child_bounds over a 2,500-row, 528-block
    relation table vs 1.5 s at 8 blocks. Repartition to row-proportional
    blocks, floored at twice the CPU count so map parallelism survives."""
    if min_blocks is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        min_blocks = 2 * cpus
    n = ds.count()
    target = max(min_blocks, -(-n // rows_per_block))
    if ds.num_blocks() > 4 * target:
        ds = ds.repartition(target).materialize()
    return ds
