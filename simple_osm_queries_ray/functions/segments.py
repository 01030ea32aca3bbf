"""Vectorized kernels over Arrow list columns (flattened values + offsets).

Every per-feature predicate on the variable-length tag / membership lists is
expressed as a numpy computation on the flat child array followed by a
segment reduction over the list offsets — no Python loop per row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_parts(arr: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Return (flat_values, offsets[int64 len n+1]) of a list column.

    Handles chunked arrays by combining; null lists are treated as empty.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.LargeListArray) or isinstance(arr, pa.ListArray):
        # .offsets includes the array's own offset; normalize to zero-based.
        offsets = np.asarray(arr.offsets, dtype=np.int64)
        offsets = offsets - offsets[0]
        flat = np.asarray(arr.flatten())
        return flat, offsets
    raise TypeError(f"expected a list array, got {arr.type}")


def list_parts_arrow(arr: pa.ChunkedArray | pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Like :func:`list_parts` but keeps the flat child as an Arrow array.

    Use this for string children: ``np.asarray`` of an Arrow string array
    materializes one Python object per element, which dominates any
    downstream vectorized cost. Arrow-kernel consumers must stay zero-copy.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, (pa.LargeListArray, pa.ListArray)):
        offsets = np.asarray(arr.offsets, dtype=np.int64)
        offsets = offsets - offsets[0]
        return arr.flatten(), offsets
    raise TypeError(f"expected a list array, got {arr.type}")


def segment_any(mask: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row: does any element of the row's list satisfy ``mask``?

    ``mask`` is over the flat child array; ``offsets`` has length n_rows+1.
    Empty rows yield False. O(flat) with a single cumsum.
    """
    cs = np.zeros(len(mask) + 1, dtype=np.int64)
    np.cumsum(mask, out=cs[1:])
    return (cs[offsets[1:]] - cs[offsets[:-1]]) > 0


def segment_sum(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row sum of the row's list elements (0 for empty rows)."""
    cs = np.zeros(len(values) + 1, dtype=np.int64)
    np.cumsum(values, out=cs[1:])
    return cs[offsets[1:]] - cs[offsets[:-1]]


def segment_value_where(
    values: np.ndarray, mask: np.ndarray, offsets: np.ndarray, default: int = -1
) -> np.ndarray:
    """Per-row: value of the (unique) element where ``mask`` holds, else default.

    Used for GetValueIndex(key): tag keys are unique per feature (reference
    bitstring design, src/index/feature.go:55-72), so a masked segment sum
    recovers the single matching value exactly.
    """
    got = segment_any(mask, offsets)
    s = segment_sum(np.where(mask, values, 0).astype(np.int64), offsets)
    return np.where(got, s, default)


def segment_min(values: np.ndarray, offsets: np.ndarray, fill=np.inf) -> np.ndarray:
    """Per-row min of the row's list elements (``fill`` for empty rows).

    Exact with empty rows ANYWHERE in the batch: reduceat runs only at the
    nonzero rows' starts — strictly increasing and all < len(values), so
    consecutive nonzero starts delimit exactly the nonzero segments (empty
    segments contribute no elements between them). The clamped-starts
    variant (np.minimum(starts, len-1)) silently steals the final element
    from the last nonzero row whenever trailing rows are empty — never use
    it (see fingerprint_batch's same-class fix in stages/text.py).
    """
    counts = np.diff(offsets)
    out = np.full(len(counts), fill, dtype=np.asarray(values).dtype)
    nz = counts > 0
    if nz.any():
        out[nz] = np.minimum.reduceat(values, offsets[:-1][nz])
    return out
