"""Vectorized evaluation of soq filter trees over encoded-tag batches.

Per-feature semantics are the reference's, re-expressed as boolean-mask
algebra over the flattened tag-list columns (SURVEY.md M4-M7):

- TagFilter (``filter.go:103-128``): feature without the key never matches,
  including ``!=``; ``=``/``!=`` test (key,value) pair presence; comparisons
  test the value index of the (unique) key occurrence against the literal's
  dictionary index — order lives in the natural-sorted value dictionary;
- KeyFilter (``filter.go:150-156``): ``HasKey(k) == should_be_set``;
- Logical AND/OR (``filter.go:59-80``) = mask & / |;
- Negated (``filter.go:27-34``) = ~mask;
- SubStatementFilter probes a precomputed matched-ID broadcast set against
  the feature's membership lists (see pipelines/query.py + stages/semi_join).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.segments import list_parts, segment_any, segment_value_where
from ..model import NOT_FOUND
from ..parser.ast_nodes import (
    BinOp,
    FilterExpr,
    KeyFilter,
    LogicalFilter,
    LogicOp,
    NegatedFilter,
    SubStatementFilter,
    TagFilter,
)
from .semi_join import isin_sorted, probe_membership_lists


def eval_filter_mask(
    expr: FilterExpr,
    batch: pa.Table,
    sub_probe_cols: dict[tuple, tuple[str, object]] | None = None,
    _path: tuple = (),
) -> np.ndarray:
    """Boolean mask for ``expr`` over ``batch``.

    ``sub_probe_cols`` maps a sub-statement's tree *path* (stable across
    pickling, unlike ``id()``) to (membership_column_name, matched_ids_ref) —
    resolved ahead of execution by the query planner (set-oriented
    decorrelation of the reference's per-feature memoized semi-join).
    """
    if isinstance(expr, TagFilter):
        return _tag_mask(expr, batch)
    if isinstance(expr, KeyFilter):
        has = _has_key(expr.key_index, batch)
        return has if expr.should_be_set else ~has
    if isinstance(expr, LogicalFilter):
        a = eval_filter_mask(expr.a, batch, sub_probe_cols, _path + ("a",))
        b = eval_filter_mask(expr.b, batch, sub_probe_cols, _path + ("b",))
        return (a | b) if expr.op == LogicOp.OR else (a & b)
    if isinstance(expr, NegatedFilter):
        return ~eval_filter_mask(expr.base, batch, sub_probe_cols, _path + ("n",))
    if isinstance(expr, SubStatementFilter):
        if not sub_probe_cols or _path not in sub_probe_cols:
            raise RuntimeError("SubStatementFilter not resolved by the planner")
        col, ids_ref = sub_probe_cols[_path]
        if col == "@id":
            # buffered sub-statement: the planner already resolved the
            # spatial semi-join to a set of matching OUTER ids
            from ..state.broadcast import get as bget

            return isin_sorted(np.asarray(batch["id"], dtype=np.int64), bget(ids_ref))
        if col == "@flag":
            # partitioned-fallback sub-statement (matched-ID set exceeded the
            # broadcast limit): the planner attached a nullable int8 flag
            # column; validity IS the probe result
            arr = batch[ids_ref]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            return ~np.asarray(arr.is_null())
        return probe_membership_lists(batch[col], ids_ref)
    raise TypeError(f"Unknown filter expression {type(expr)}")


def _key_parts(batch: pa.Table):
    flat_keys, offsets = list_parts(batch["tag_keys"])
    flat_vals, _ = list_parts(batch["tag_vals"])
    return np.asarray(flat_keys, dtype=np.int32), np.asarray(flat_vals, dtype=np.int32), offsets


def _has_key(key_index: int, batch: pa.Table) -> np.ndarray:
    if key_index == NOT_FOUND:
        return np.zeros(len(batch), dtype=bool)
    # key presence needs only the tag_keys column — list_parts is offset
    # arithmetic, no tag_vals flatten
    flat_keys, offsets = list_parts(batch["tag_keys"])
    return segment_any(np.asarray(flat_keys, dtype=np.int32) == key_index, offsets)


def _tag_mask(expr: TagFilter, batch: pa.Table) -> np.ndarray:
    n = len(batch)
    if expr.key_index == NOT_FOUND:
        return np.zeros(n, dtype=bool)
    flat_keys, flat_vals, offsets = _key_parts(batch)
    key_match = flat_keys == expr.key_index
    has_key = segment_any(key_match, offsets)
    if expr.op == BinOp.EQ:
        return segment_any(key_match & (flat_vals == expr.value_index), offsets)
    if expr.op == BinOp.NEQ:
        return has_key & ~segment_any(key_match & (flat_vals == expr.value_index), offsets)
    # comparisons: value index of the unique key occurrence
    val = segment_value_where(flat_vals.astype(np.int64), key_match, offsets, default=NOT_FOUND)
    if expr.op == BinOp.GT:
        cmp = val > expr.value_index
    elif expr.op == BinOp.GTE:
        cmp = val >= expr.value_index
    elif expr.op == BinOp.LT:
        cmp = val < expr.value_index
    else:
        cmp = val <= expr.value_index
    return has_key & cmp


def find_substatements(expr: FilterExpr) -> list[tuple[tuple, SubStatementFilter]]:
    """(path, node) of all SubStatementFilter nodes of a filter tree.

    Paths use the same a/b/n labels as ``eval_filter_mask``'s recursion, so a
    probe map built from them resolves correctly after pickling. Nested
    sub-statements *inside* a sub-statement are resolved recursively by the
    planner when computing that sub-statement's matched set.
    """
    out: list[tuple[tuple, SubStatementFilter]] = []
    stack: list[tuple[tuple, FilterExpr]] = [((), expr)]
    while stack:
        path, e = stack.pop()
        if isinstance(e, SubStatementFilter):
            out.append((path, e))
        elif isinstance(e, LogicalFilter):
            stack.append((path + ("a",), e.a))
            stack.append((path + ("b",), e.b))
        elif isinstance(e, NegatedFilter):
            stack.append((path + ("n",), e.base))
    return out
