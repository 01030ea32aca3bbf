"""Distributed TagIndex construction (SURVEY.md A2 + M9).

Reference pass 1 scans all objects collecting per-key distinct value sets,
then natural-sorts each value list (``/root/reference/src/index/tag.go:73-98``,
sort at ``tag.go:58-67``). Ray-native: per-batch partial dedup of (key, value)
pairs inside ``map_batches`` (combiner), a small ``groupby`` on the already
deduplicated pairs, driver-side natural sort of the (tiny) dictionary.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..functions.tags import TagIndex


def _distinct_pairs_batch(batch: pa.Table) -> pa.Table:
    from ..functions.segments import list_parts_arrow

    flat_keys, _ = list_parts_arrow(batch["tag_keys_str"])
    flat_vals, _ = list_parts_arrow(batch["tag_vals_str"])
    # C-level distinct: Arrow hash group-by with no aggregates; the strings
    # never become Python objects.
    return pa.table({"key": flat_keys, "value": flat_vals}).group_by(["key", "value"]).aggregate([])


def _distinct_pairs_batch_flat(batch: pa.Table) -> pa.Table:
    # second-tier combiner: input is already (key, value) pairs
    return batch.group_by(["key", "value"]).aggregate([])


def build_tag_index(
    *datasets: ray.data.Dataset, base: TagIndex | None = None
) -> TagIndex:
    """Distinct (key, value) pairs across all feature datasets -> TagIndex.

    The shuffle moves only pre-deduplicated pairs; the final dictionary is
    driver-side state by design (it is broadcast, never sharded — ST1).

    ``base``: evolve an existing dictionary instead of building fresh
    (:meth:`TagIndex.extended_with`) — incremental refresh keeps existing
    key indices stable so unchanged features re-encode byte-identically
    and refresh_index rewrites only genuinely-changed partitions.
    """
    parts = [
        ds.select_columns(["tag_keys_str", "tag_vals_str"]).map_batches(
            _distinct_pairs_batch, batch_format="pyarrow"
        )
        for ds in datasets
    ]
    pairs = parts[0]
    for p in parts[1:]:
        pairs = pairs.union(p)
    # The per-batch dedup shrinks pairs to ~dictionary size per block. A
    # groupby here would pay the shuffle machinery's ~1.8 s FIXED cost for a
    # vocabulary-sized combine (the scaling-job diagnosis); instead coalesce
    # to 8 blocks, dedup each block at C level, and merge the 8 vocabulary-
    # sized survivors driver-side — the same two-level tree combine, no
    # sort/hash machinery. At a vocabulary too large for the driver, add one
    # more repartition tier keyed on hash(key) before collecting.
    distinct = pairs.repartition(8).map_batches(
        _distinct_pairs_batch_flat, batch_format="pyarrow", batch_size=None
    )
    seen: set[tuple[str, str]] = set()
    per_key: dict[str, list[str]] = {}
    for b in distinct.iter_batches(batch_format="pyarrow", batch_size=None):
        for k, v in zip(b["key"].to_pylist(), b["value"].to_pylist()):
            if (k, v) not in seen:
                seen.add((k, v))
                per_key.setdefault(k, []).append(v)
    # Deterministic key order: first-appearance order is scan-order-dependent
    # in a parallel engine, so we fix key order lexicographically (key order
    # carries no semantics — only value order does).
    ordered = {k: per_key[k] for k in sorted(per_key)}
    if base is not None:
        return base.extended_with(ordered)
    return TagIndex.from_tag_lists(ordered)
