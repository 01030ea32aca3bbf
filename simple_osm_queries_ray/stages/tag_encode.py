"""Tag encode / decode stages: string tag lists <-> dictionary-encoded int lists.

Reference: ``TagIndex.EncodeTags`` (``/root/reference/src/index/tag.go:257-274``)
at import time; decode at GeoJSON output (``src/index/io.go:46-57``). The
TagIndex is broadcast once (``ray.put``); encoding maps the flattened
(key, value) string pairs through the reverse dictionaries with pandas'
C-level hash map — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.segments import list_parts
from ..functions.tags import TagIndex
from ..model import NOT_FOUND
from ..state.broadcast import get as bget


def _pair_maps(tag_index: TagIndex) -> tuple[dict, list[dict]]:
    key_map = {k: i for i, k in enumerate(tag_index.keys)}
    val_maps = [{v: vi for vi, v in enumerate(values)} for values in tag_index.values]
    return key_map, val_maps


# Per-worker cache: the maps depend only on the TagIndex, which bget() already
# caches per worker process. Without this the maps (potentially 10^4+ entries)
# are rebuilt on EVERY batch — a cost that grows with batch count, i.e. gets
# WORSE with more CPUs. The cache holds a strong ref to the TagIndex so its
# id() can never be reused while the entry is live (identity-checked anyway).
_MAPS_CACHE: dict[int, tuple[TagIndex, dict, list[dict]]] = {}


def _cached_pair_maps(ti: TagIndex) -> tuple[dict, list[dict]]:
    hit = _MAPS_CACHE.get(id(ti))
    if hit is not None and hit[0] is ti:
        return hit[1], hit[2]
    key_map, val_maps = _pair_maps(ti)
    _MAPS_CACHE[id(ti)] = (ti, key_map, val_maps)
    return key_map, val_maps


def encode_tags(ds: ray.data.Dataset, tag_index_ref) -> ray.data.Dataset:
    """Add int32 ``tag_keys`` / ``tag_vals`` columns from the *_str lists."""

    def fn(batch: pa.Table) -> pa.Table:
        ti: TagIndex = bget(tag_index_ref)
        key_map, val_maps = _cached_pair_maps(ti)

        flat_keys, offsets = list_parts(batch["tag_keys_str"])
        flat_vals, _ = list_parts(batch["tag_vals_str"])
        keys_s = pd.Series(flat_keys)
        k_idx = keys_s.map(key_map).fillna(NOT_FOUND).astype(np.int32).to_numpy()
        # value lookup per distinct key present (few keys, large batches):
        # one vectorized .map per key instead of per-element tuple building.
        v_idx = np.full(len(flat_vals), NOT_FOUND, dtype=np.int32)
        vals_s = pd.Series(flat_vals)
        for ki in np.unique(k_idx):
            if ki == NOT_FOUND:
                continue
            m = k_idx == ki
            v_idx[m] = (
                vals_s[m].map(val_maps[ki]).fillna(NOT_FOUND).astype(np.int32).to_numpy()
            )

        off32 = pa.array(offsets.astype(np.int32))
        batch = batch.append_column(
            "tag_keys", pa.ListArray.from_arrays(off32, pa.array(k_idx, type=pa.int32()))
        )
        return batch.append_column(
            "tag_vals", pa.ListArray.from_arrays(off32, pa.array(v_idx, type=pa.int32()))
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def decode_tags_to_strings(batch: pa.Table, tag_index: TagIndex) -> list[dict[str, str]]:
    """Per-row {key: value} dicts for output sinks (GeoJSON properties)."""
    flat_keys, offsets = list_parts(batch["tag_keys"])
    flat_vals, _ = list_parts(batch["tag_vals"])
    flat_keys = np.asarray(flat_keys, dtype=np.int64)
    flat_vals = np.asarray(flat_vals, dtype=np.int64)
    out = []
    for i in range(len(offsets) - 1):
        d = {}
        for j in range(offsets[i], offsets[i + 1]):
            k = int(flat_keys[j])
            v = int(flat_vals[j])
            if k >= 0 and v >= 0:
                d[tag_index.key_string(k)] = tag_index.value_string(k, v)
        out.append(d)
    return out
