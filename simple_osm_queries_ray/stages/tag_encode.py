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


def _pair_maps(tag_index: TagIndex) -> tuple[dict, dict]:
    key_map = {k: i for i, k in enumerate(tag_index.keys)}
    pair_map = {}
    for ki, values in enumerate(tag_index.values):
        for vi, v in enumerate(values):
            pair_map[(ki, v)] = vi
    return key_map, pair_map


def encode_tags(ds: ray.data.Dataset, tag_index_ref) -> ray.data.Dataset:
    """Add int32 ``tag_keys`` / ``tag_vals`` columns from the *_str lists."""

    def fn(batch: pa.Table) -> pa.Table:
        ti: TagIndex = bget(tag_index_ref)
        key_map, pair_map = _pair_maps(ti)

        flat_keys, offsets = list_parts(batch["tag_keys_str"])
        flat_vals, _ = list_parts(batch["tag_vals_str"])
        keys_s = pd.Series(flat_keys)
        k_idx = keys_s.map(key_map).fillna(NOT_FOUND).astype(np.int32).to_numpy()
        pair_s = pd.Series(list(zip(k_idx.tolist(), flat_vals)))
        v_idx = pair_s.map(pair_map).fillna(NOT_FOUND).astype(np.int32).to_numpy()

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
