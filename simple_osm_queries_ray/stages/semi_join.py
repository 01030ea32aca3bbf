"""Semi-/anti-join probes over membership-ID lists (SURVEY.md J1/J2).

The reference's headline feature — context-aware sub-statements
(``this.<type>{filter}``) — qualifies an outer feature iff at least one of
its related features satisfies the inner filter
(``/root/reference/src/query/filter.go:182-337``). Set-oriented decorrelation:

1. inner side: filter the inner-type table to the candidate cells and the
   inner predicate, project ``id`` -> a sorted int64 array (the reference's
   ``idCache`` memo, filter.go:256);
2. broadcast it once (``ray.put``), probe each outer batch's membership list
   column with ``searchsorted`` + segment-any — vectorized, no per-row work.

The broadcast path assumes the matched-ID set fits in memory (the inner side
is filter-pruned; for the rare huge case the explode+hash-join fallback in
``stages/joins.py`` applies — same semantics, one more shuffle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..functions.segments import list_parts, segment_any
from ..state.broadcast import get as bget
from .group_collect import collect_list_column


@ray.remote(num_returns=1)
def _gather_ids_task(id_col: str, unique: bool, *blocks):
    parts = []
    for b in blocks:
        if id_col not in b.schema.names:  # Ray emits schema-less empty blocks
            continue
        a = np.asarray(b[id_col], dtype=np.int64)
        parts.append(np.unique(a) if unique else a)
    if not parts:
        return np.array([], dtype=np.int64)
    ids = np.concatenate(parts)
    return np.unique(ids) if unique else np.sort(ids)


def sorted_id_array(ds: ray.data.Dataset, id_col: str = "id") -> "ray.ObjectRef":
    """Collect a dataset's id column into a sorted numpy array, broadcast as
    an object ref. The gather + sort runs in ONE Ray task (blocks move
    object-store -> worker zero-copy; the driver only brokers refs) — same
    rationale as attach_edges_broadcast: keep the driver process's
    allocator out of the hot path and let the sort overlap scheduling."""
    refs = ds.select_columns([id_col]).to_arrow_refs()
    return _gather_ids_task.remote(id_col, False, *refs)


def sorted_unique_id_array(ds: "ray.data.Dataset", id_col: str = "id") -> "ray.ObjectRef":
    """:func:`sorted_id_array` with dedup — for id sources that emit one row
    per JOIN PAIR (e.g. buffer-join output), where the same id recurs once
    per partner and broadcasting duplicates would bloat the probe array."""
    refs = ds.select_columns([id_col]).to_arrow_refs()
    return _gather_ids_task.remote(id_col, True, *refs)


def isin_sorted(values: np.ndarray, sorted_ids: np.ndarray) -> np.ndarray:
    """Vectorized membership of values in a sorted id array."""
    if len(sorted_ids) == 0 or len(values) == 0:
        return np.zeros(len(values), dtype=bool)
    pos = np.searchsorted(sorted_ids, values)
    pos = np.clip(pos, 0, len(sorted_ids) - 1)
    return sorted_ids[pos] == values


def probe_membership_lists(list_col: pa.ChunkedArray | pa.Array, ids_ref) -> np.ndarray:
    """Per-row: does any id in the row's membership list hit the matched set?

    This is the probe half of the semi-join (filter.go:265-331); wrap the
    result with ``~`` for the anti-join (``!this...``, filter.go:27-34).
    """
    sorted_ids = bget(ids_ref)
    flat, offsets = list_parts(list_col)
    hit = isin_sorted(np.asarray(flat, dtype=np.int64), sorted_ids)
    return segment_any(hit, offsets)


def probe_scalar(values: np.ndarray, ids_ref) -> np.ndarray:
    sorted_ids = bget(ids_ref)
    return isin_sorted(np.asarray(values, dtype=np.int64), sorted_ids)


def filter_list_to_idset(list_col: pa.ChunkedArray | pa.Array, ids_ref) -> pa.ListArray:
    """Keep only list elements present in the broadcast id set (existence join)."""
    sorted_ids = bget(ids_ref)
    flat, offsets = list_parts(list_col)
    flat = np.asarray(flat, dtype=np.int64)
    keep = isin_sorted(flat, sorted_ids)
    n = len(offsets) - 1
    cs = np.zeros(len(flat) + 1, dtype=np.int64)
    np.cumsum(keep, out=cs[1:])
    lens = cs[offsets[1:]] - cs[offsets[:-1]]
    new_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=new_off[1:])
    return collect_list_column(flat[keep], new_off[:-1], new_off[1:], pa.int64())
