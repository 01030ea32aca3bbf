"""Join / membership-attachment stages.

Reimplements the reference's reverse-membership construction (J3/J4 in
SURVEY.md section 2.4: ``nodeId -> [wayIds]`` etc., built in
``/root/reference/src/index/grid_writer.go:254-330``) as the canonical Ray
Data pattern: explode membership lists to edge rows, ``bucket_collect`` the
edges by member id, hash-join the resulting list column back onto the member
table.

``Dataset.join`` (Arrow acero underneath) rejects list-typed non-key columns,
so the attach join is a hand-rolled partitioned hash join: tag both sides,
align schemas, union, ``groupby`` a key-hash bucket, and merge each bucket
vectorized (sort right side, ``searchsorted`` probe, ``take``). One shuffle,
no per-row Python; bucket count bounds per-task memory at scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.segments import list_parts
from .group_collect import bucket_collect, bucket_of as _bucket_of, collect_list_column


def explode_list(
    ds: ray.data.Dataset, list_col: str, id_col: str, out_val: str, out_key: str
) -> ray.data.Dataset:
    """(id, [members]) rows -> (member, id) edge rows, vectorized.

    e.g. ways(id, node_ids) -> (node_id, way_id) edges. Only the two int64
    columns leave this stage, so the downstream shuffle moves minimal bytes.
    """

    def fn(batch: pa.Table) -> pa.Table:
        flat, offsets = list_parts(batch[list_col])
        ids = np.asarray(batch[id_col], dtype=np.int64)
        reps = np.diff(offsets)
        return pa.table(
            {
                out_key: pa.array(np.asarray(flat, dtype=np.int64)),
                out_val: pa.array(np.repeat(ids, reps)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def collect_edge_lists(
    edges: ray.data.Dataset, key: str, val: str, out_col: str, num_buckets: int = 64
) -> ray.data.Dataset:
    """(key, val) edges -> one row per key with sorted list<int64> of vals."""

    def assemble(tbl: pa.Table, keys: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        vals = np.asarray(tbl[val], dtype=np.int64)
        return pa.table(
            {
                key: pa.array(keys, type=pa.int64()),
                out_col: collect_list_column(vals, starts, ends, pa.int64()),
            }
        )

    return bucket_collect(edges, key, assemble, sort_col=val, num_buckets=num_buckets)


def hash_join_attach(
    left: ray.data.Dataset,
    left_key: str,
    right: ray.data.Dataset,
    right_key: str,
    attach_cols: dict[str, pa.DataType],
    *,
    num_buckets: int = 32,
    fill_empty_list_cols: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """Left-join ``attach_cols`` of ``right`` onto ``left`` (any column types).

    ``right`` must have at most one row per key. Unmatched left rows get null
    (or an empty list for columns named in ``fill_empty_list_cols``).
    """
    left_schema = left.schema()
    left_names = list(left_schema.names)
    left_types = list(left_schema.types)
    clash = set(left_names) & set(attach_cols)
    if clash:
        raise ValueError(
            f"hash_join_attach: attach column(s) {sorted(clash)} already "
            "exist on the left table — drop or rename them first (a "
            "duplicate-named schema would only fail deep inside the merge)"
        )
    out_names = left_names + list(attach_cols)

    def prep_left(batch: pa.Table) -> pa.Table:
        n = len(batch)
        arrays = [batch[c] for c in left_names]
        arrays += [pa.nulls(n, t) for t in attach_cols.values()]
        tbl = pa.Table.from_arrays(arrays, names=out_names)
        k = np.asarray(batch[left_key], dtype=np.int64)
        tbl = tbl.append_column("__jk", pa.array(k))
        tbl = tbl.append_column("__side", pa.array(np.zeros(n, dtype=np.int8)))
        return tbl.append_column("__bucket", pa.array(_bucket_of(k, num_buckets)))

    def prep_right(batch: pa.Table) -> pa.Table:
        n = len(batch)
        arrays = []
        for c, t in zip(left_names, left_types):
            arrays.append(pa.nulls(n, t))
        for c in attach_cols:
            arrays.append(batch[c])
        tbl = pa.Table.from_arrays(arrays, names=out_names)
        k = np.asarray(batch[right_key], dtype=np.int64)
        tbl = tbl.append_column("__jk", pa.array(k))
        tbl = tbl.append_column("__side", pa.array(np.ones(n, dtype=np.int8)))
        return tbl.append_column("__bucket", pa.array(_bucket_of(k, num_buckets)))

    unioned = left.map_batches(prep_left, batch_format="pyarrow").union(
        right.map_batches(prep_right, batch_format="pyarrow")
    )

    def merge(tbl: pa.Table) -> pa.Table:
        side = np.asarray(tbl["__side"], dtype=np.int8)
        keys = np.asarray(tbl["__jk"], dtype=np.int64)
        left_idx = np.nonzero(side == 0)[0]
        right_idx = np.nonzero(side == 1)[0]
        lkeys = keys[left_idx]
        rkeys = keys[right_idx]
        order = np.argsort(rkeys, kind="stable")
        rkeys_sorted = rkeys[order]
        if len(rkeys_sorted) > 1 and bool(
            (rkeys_sorted[1:] == rkeys_sorted[:-1]).any()
        ):
            dup = int(rkeys_sorted[1:][rkeys_sorted[1:] == rkeys_sorted[:-1]][0])
            raise ValueError(
                "hash_join_attach: right side has duplicate join key "
                f"{dup} — the contract is at most one row per key (a "
                "silent first-match attach would drop data)"
            )
        pos = np.searchsorted(rkeys_sorted, lkeys)
        pos_c = np.clip(pos, 0, max(len(rkeys_sorted) - 1, 0))
        matched = (
            rkeys_sorted[pos_c] == lkeys if len(rkeys_sorted) else np.zeros(len(lkeys), dtype=bool)
        )
        out = {}
        left_take = pa.array(left_idx)
        for c in left_names:
            out[c] = tbl[c].take(left_take)
        # matched left rows take the right row's attach columns
        right_src = np.where(matched, right_idx[order][pos_c] if len(rkeys_sorted) else 0, -1)
        take_idx = pa.array(
            np.where(right_src >= 0, right_src, 0), type=pa.int64()
        )
        valid = pa.array(matched)
        for c in attach_cols:
            col = tbl[c].take(take_idx).combine_chunks()
            # null out unmatched rows
            col = pa.compute.if_else(valid, col, pa.nulls(len(matched), attach_cols[c]))
            out[c] = col
        res = pa.table(out)
        for c in fill_empty_list_cols:
            arr = res[c].combine_chunks()
            if arr.null_count:
                res = res.set_column(res.column_names.index(c), c, nulls_to_empty_list(arr))
        return res

    return unioned.groupby("__bucket").map_groups(merge, batch_format="pyarrow")


def nulls_to_empty_list(col: pa.ListArray) -> pa.ListArray:
    """Replace null list slots with empty lists (values re-gathered, no copy of
    valid slots beyond one take)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count == 0:
        return col
    value_type = col.type.value_type
    if col.offset != 0:
        # a sliced array's offsets index into the UNSLICED values buffer;
        # rebasing them to zero while keeping col.values would gather the
        # wrong elements (silent corruption) — normalize via a copy first
        col = pa.concat_arrays([col])
    offsets = np.asarray(col.offsets, dtype=np.int64)
    offsets = offsets - offsets[0]
    valid = ~np.asarray(col.is_null())
    lengths = np.where(valid, np.diff(offsets), 0)
    starts = np.where(valid, offsets[:-1], 0)
    total = int(lengths.sum())
    if total:
        base = np.repeat(starts, lengths)
        within = np.arange(total) - np.repeat(np.cumsum(lengths) - lengths, lengths)
        flat = col.values.take(pa.array(base + within, type=pa.int64()))
    else:
        flat = pa.array([], type=value_type)
    new_off = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=new_off[1:])
    if new_off[-1] > np.iinfo(np.int32).max:
        # list<> offsets are int32; a silent wrap would produce a
        # negative-offset array Arrow does not validate (the sibling
        # collect_list_column uses checked int64 large_list offsets, but
        # here the output must keep the input's list<> type)
        raise OverflowError(
            f"nulls_to_empty_list: {int(new_off[-1])} child elements exceed "
            "int32 list offsets — split the batch or use large_list upstream"
        )
    return pa.ListArray.from_arrays(pa.array(new_off.astype(np.int32)), flat)


# single-task worker-side concat + lexsort, NOT a driver pull: the edge
# array must fit ONE worker's memory by attach_edges_broadcast's contract
# (a range-partitioned distributed sort only added a corpus-wide exchange
# before the same-sized gather — measured 5.3 s vs 2.9 s at 10 M edges),
# but routing the gather through the driver exposed the sort to the driver
# process's allocator state — on the virtualized bench host, driver-side
# page-fault storms intermittently tripled this stage. The blocks travel
# object-store -> worker zero-copy and the sorted pair returns as a plain
# object ref the probe tasks read directly; the driver only brokers refs.
# np.lexsort on <= 10^8 int64 pairs is seconds. Module-level @ray.remote:
# a per-call wrapper would re-pickle and re-export the function per query.
@ray.remote(num_returns=1)
def _gather_sort_edges(edge_key: str, edge_val: str, *blocks):
    ks, vs = [], []
    for b in blocks:
        if edge_key not in b.schema.names:  # Ray emits schema-less empty blocks
            continue
        ks.append(np.asarray(b[edge_key], dtype=np.int64))
        vs.append(np.asarray(b[edge_val], dtype=np.int64))
    if ks:
        k = np.concatenate(ks)
        v = np.concatenate(vs)
        order = np.lexsort((v, k))
        return k[order], v[order]
    return np.array([], dtype=np.int64), np.array([], dtype=np.int64)


def attach_edges_broadcast(
    ds: ray.data.Dataset,
    id_col: str,
    edges: ray.data.Dataset,
    edge_key: str,
    edge_val: str,
    out_col: str,
) -> ray.data.Dataset:
    """Attach ``out_col = sorted [edge_val where edge_key == id]`` to ``ds``
    WITHOUT shuffling ``ds``.

    The edge table (two int64 columns) is collected, sorted by (key, val) and
    broadcast once (``ray.put``); each left batch probes it with two
    ``searchsorted`` calls and gathers its members. This replaces a
    whole-left-table hash shuffle with a map-side lookup — the same
    broadcast-vs-shuffle tradeoff the semi-join probe uses.

    Scale assumption (documented per the partitioning contract): the *edge
    set* must fit in worker memory (16 bytes/edge; ~10^8 edges = 1.6 GB). For
    bigger edge sets use :func:`attach_list_column`, the partitioned hash
    join with identical semantics.
    """
    block_refs = edges.select_columns([edge_key, edge_val]).to_arrow_refs()
    edges_ref = _gather_sort_edges.remote(edge_key, edge_val, *block_refs)

    def attach(batch: pa.Table) -> pa.Table:
        from ..state.broadcast import get as bget

        ek, ev = bget(edges_ref)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        lo = np.searchsorted(ek, ids, side="left")
        hi = np.searchsorted(ek, ids, side="right")
        lens = hi - lo
        total = int(lens.sum())
        if total:
            base = np.repeat(lo, lens)
            within = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
            flat = ev[base + within]
        else:
            flat = np.array([], dtype=np.int64)
        off = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(lens, out=off[1:])
        return batch.append_column(out_col, collect_list_column(flat, off[:-1], off[1:], pa.int64()))

    return ds.map_batches(attach, batch_format="pyarrow")


def attach_list_column(
    ds: ray.data.Dataset,
    id_col: str,
    lists: ray.data.Dataset,
    list_key: str,
    list_col: str,
    *,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Left-join a (key, list<int64>) dataset onto ``ds``; missing -> []."""
    return hash_join_attach(
        ds,
        id_col,
        lists,
        list_key,
        {list_col: pa.list_(pa.int64())},
        num_buckets=num_partitions,
        fill_empty_list_cols=(list_col,),
    )
