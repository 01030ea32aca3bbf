"""Tag encode / decode stages: string tag lists <-> dictionary-encoded int lists.

Reference: ``TagIndex.EncodeTags`` (``/root/reference/src/index/tag.go:257-274``)
at import time; decode at GeoJSON output (``src/index/io.go:46-57``). The
TagIndex is broadcast once (``ray.put``); encoding maps the flattened
(key, value) string pairs through the reverse dictionaries with pandas'
C-level hash map — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.segments import list_parts
from ..functions.tags import TagIndex
from ..model import NOT_FOUND
from ..state.broadcast import get as bget


def _encode_tables(tag_index: TagIndex) -> tuple[pa.Array, pa.Array, np.ndarray]:
    """(keys_arr, pair_strs, pair_vi): Arrow lookup tables for C-level encode.

    ``pair_strs[j] = "<ki>\\x00<value>"`` with ``pair_vi[j]`` the value index —
    ``pc.index_in`` against it resolves a (key index, value string) pair
    without touching Python per element.
    """
    keys_arr = pa.array(tag_index.keys, type=pa.string())
    pair_strs, pair_vi = [], []
    for ki, values in enumerate(tag_index.values):
        for vi, v in enumerate(values):
            pair_strs.append(f"{ki}\x00{v}")
            pair_vi.append(vi)
    return keys_arr, pa.array(pair_strs, type=pa.string()), np.asarray(pair_vi, dtype=np.int32)


# Per-worker cache: the tables depend only on the TagIndex, which bget()
# already caches per worker process. Without this they are rebuilt on EVERY
# batch — a cost that grows with batch count, i.e. gets WORSE with more CPUs.
# Holding the TagIndex in the value keeps its id() from being reused
# (identity-checked anyway).
_MAPS_CACHE: dict[int, tuple[TagIndex, pa.Array, pa.Array, np.ndarray]] = {}


def _cached_encode_tables(ti: TagIndex) -> tuple[pa.Array, pa.Array, np.ndarray]:
    hit = _MAPS_CACHE.get(id(ti))
    if hit is not None and hit[0] is ti:
        return hit[1], hit[2], hit[3]
    keys_arr, pair_strs, pair_vi = _encode_tables(ti)
    _MAPS_CACHE[id(ti)] = (ti, keys_arr, pair_strs, pair_vi)
    return keys_arr, pair_strs, pair_vi


# decode side: flattened value-string table + per-key offsets depend only on
# the TagIndex too — rebuilding them per batch (a Python loop over the whole
# vocabulary) would dominate the vectorized decode they feed at real
# vocabulary sizes, multiplied by batch count
_DECODE_CACHE: dict[int, tuple[TagIndex, np.ndarray, pa.Array]] = {}


def _cached_decode_tables(ti: TagIndex) -> tuple[np.ndarray, pa.Array]:
    hit = _DECODE_CACHE.get(id(ti))
    if hit is not None and hit[0] is ti:
        return hit[1], hit[2]
    val_lens = np.array([len(v) for v in ti.values], dtype=np.int64)
    val_base = np.zeros(len(val_lens) + 1, dtype=np.int64)
    np.cumsum(val_lens, out=val_base[1:])
    flat_val_strs = pa.array(
        [v for values in ti.values for v in values], type=pa.string()
    )
    _DECODE_CACHE[id(ti)] = (ti, val_base, flat_val_strs)
    return val_base, flat_val_strs


def encode_tags(ds: ray.data.Dataset, tag_index_ref) -> ray.data.Dataset:
    """Add int32 ``tag_keys`` / ``tag_vals`` columns from the *_str lists.

    Pure Arrow kernels (index_in + binary_join_element_wise): the flat string
    children never become Python objects.
    """
    import pyarrow.compute as pc

    from ..functions.segments import list_parts_arrow

    def fn(batch: pa.Table) -> pa.Table:
        ti: TagIndex = bget(tag_index_ref)
        keys_arr, pair_strs, pair_vi = _cached_encode_tables(ti)

        flat_keys, offsets = list_parts_arrow(batch["tag_keys_str"])
        flat_vals, _ = list_parts_arrow(batch["tag_vals_str"])
        k_idx_arr = pc.index_in(flat_keys, value_set=keys_arr)  # null if unknown key
        combined = pc.binary_join_element_wise(
            pc.cast(k_idx_arr, pa.string()), flat_vals, "\x00"
        )  # null key index -> null combined -> NOT_FOUND below
        pos = pc.index_in(combined, value_set=pair_strs)
        pos_np = np.asarray(pos.fill_null(-1), dtype=np.int64)
        v_idx = np.where(pos_np >= 0, pair_vi[np.clip(pos_np, 0, None)], NOT_FOUND).astype(
            np.int32
        )
        k_idx = np.asarray(k_idx_arr.fill_null(NOT_FOUND), dtype=np.int32)

        off32 = pa.array(offsets.astype(np.int32))
        batch = batch.append_column(
            "tag_keys", pa.ListArray.from_arrays(off32, pa.array(k_idx, type=pa.int32()))
        )
        return batch.append_column(
            "tag_vals", pa.ListArray.from_arrays(off32, pa.array(v_idx, type=pa.int32()))
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def check_validity(ds: ray.data.Dataset, tag_index_ref) -> int:
    """Optional invariant check (reference ``--check-feature-validity``,
    ``/root/reference/src/index/grid_reader.go:686-707``): every encoded key
    index must address the key dictionary and every value index its key's
    value dictionary. Returns the number of violating features (the reference
    logs per-feature errors; we count distributed and let the caller decide).
    """
    import pyarrow.compute as pc

    from ..functions.segments import list_parts

    def fn(batch: pa.Table) -> pa.Table:
        ti: TagIndex = bget(tag_index_ref)
        n_keys = len(ti.keys)
        val_sizes = np.asarray([len(v) for v in ti.values], dtype=np.int64)
        flat_keys, offsets = list_parts(batch["tag_keys"])
        flat_vals, _ = list_parts(batch["tag_vals"])
        flat_keys = np.asarray(flat_keys, dtype=np.int64)
        flat_vals = np.asarray(flat_vals, dtype=np.int64)
        bad_key = (flat_keys < 0) | (flat_keys >= n_keys)
        bad_val = np.ones(len(flat_vals), dtype=bool)
        ok = ~bad_key
        bad_val[ok] = (flat_vals[ok] < 0) | (flat_vals[ok] >= val_sizes[flat_keys[ok]])
        from ..functions.segments import segment_any

        bad_feature = segment_any(bad_key | bad_val, offsets)
        return pa.table({"bad": pa.array(np.array([int(bad_feature.sum())], dtype=np.int64))})

    total = 0
    for b in ds.map_batches(fn, batch_format="pyarrow").iter_batches(batch_format="pyarrow", batch_size=None):
        total += int(pc.sum(b["bad"]).as_py() or 0)
    return total


def decode_tags_to_strings(batch: pa.Table, tag_index: TagIndex) -> list[dict[str, str]]:
    """Per-row {key: value} dicts for output sinks (GeoJSON properties).

    The dictionary lookups are vectorized: one flat gather of key strings and
    one of pair-table value strings (the same lookup tables the encoder
    uses); only the final dict assembly per row remains Python — that is the
    JSON sink's intrinsic cost.
    """
    flat_keys, offsets = list_parts(batch["tag_keys"])
    flat_vals, _ = list_parts(batch["tag_vals"])
    flat_keys = np.asarray(flat_keys, dtype=np.int64)
    flat_vals = np.asarray(flat_vals, dtype=np.int64)
    keys_arr, _pair_strs, _pair_vi = _cached_encode_tables(tag_index)
    # per-key value-dictionary offsets: value j of key k lives at
    # val_base[k] + j in the flattened value table (cached per TagIndex)
    val_base, flat_val_strs = _cached_decode_tables(tag_index)
    n_keys = len(val_base) - 1
    ok = (flat_keys >= 0) & (flat_vals >= 0)
    safe_k = np.clip(flat_keys, 0, max(n_keys - 1, 0))
    key_strs = keys_arr.take(pa.array(safe_k)).to_pylist()
    val_strs = flat_val_strs.take(
        pa.array(np.clip(val_base[safe_k] + flat_vals, 0, max(len(flat_val_strs) - 1, 0)))
    ).to_pylist()
    out = []
    for i in range(len(offsets) - 1):
        out.append(
            {
                key_strs[j]: val_strs[j]
                for j in range(offsets[i], offsets[i + 1])
                if ok[j]
            }
        )
    return out
