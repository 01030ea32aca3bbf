"""Broadcast helpers: ship small lookup state to every task/actor exactly once.

The reference keeps its TagIndex and sub-statement ID memo as in-process
shared state (``/root/reference/src/index/tag.go:100-108``,
``src/query/filter.go:166-179``). The Ray-native analogue is ``ray.put`` on
the driver + ``ray.get`` inside the stage (cached per worker process), never
re-shipped per batch and never shuffled.
"""

from __future__ import annotations

from typing import Any

import ray

# Per-worker-process cache of resolved broadcast objects, so stateless
# map_batches functions don't call ray.get on every batch. ray.get of the same
# ref is already zero-copy from the local object store, but the dict also
# skips deserialization of non-Arrow payloads. BOUNDED: a long-lived session
# creates a fresh ref per query (matched-ID arrays, gathered edge tables —
# up to GBs each), and an unbounded dict would pin every payload in every
# worker for the process lifetime, growing RSS monotonically until OOM.
# Insertion-ordered dict + evict-oldest = per-worker LRU-ish cap; evicted
# entries just re-ray.get (zero-copy) on next use.
_CACHE: dict[Any, Any] = {}
_CACHE_MAX = 32


def put(obj: Any) -> "ray.ObjectRef":
    return ray.put(obj)


def get(ref: Any) -> Any:
    if isinstance(ref, ray.ObjectRef):
        hit = _CACHE.get(ref)
        if hit is not None:
            return hit
        val = ray.get(ref)
        while len(_CACHE) >= _CACHE_MAX:
            _CACHE.pop(next(iter(_CACHE)))
        _CACHE[ref] = val
        return val
    return ref  # plain object (tests / driver-side use)
