"""Deterministic clustered embedding corpus — the IVF recall fixture.

Random uniform embeddings (the ``embeddings.parquet`` table) are the WORST
case for an inverted file: with no cluster structure, a query's true
neighbours scatter across lists and recall at small nprobe is inherently
modest. Real embedding corpora are clustered (that is why IVF works), so
recall evidence needs a clustered fixture: every vector is its cluster's
center plus bounded hash-derived noise, fully deterministic per (vec_id,
component) — batch-boundary independent, so any block split of the range
produces identical vectors (same discipline as sources/synthetic.geolocate).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_MIX = np.int64(-7046029254386353131)
_M53 = np.int64((1 << 53) - 1)


def _hash_uniform(ids: np.ndarray, dim: int) -> np.ndarray:
    """(n, dim) uniforms in [-0.5, 0.5), deterministic per (id, component)."""
    h = ids[:, None] * np.int64(dim) + np.arange(dim, dtype=np.int64)[None, :]
    h = (h + np.int64(1)) * _MIX
    h ^= h >> np.int64(29)
    h *= _MIX
    u = ((h >> np.int64(11)) & _M53).astype(np.float64) / float(1 << 53)
    return u - 0.5


def cluster_centers(n_clusters: int, dim: int) -> np.ndarray:
    """Unit-norm cluster centers (fixed seed; tiny, computed everywhere)."""
    rng = np.random.RandomState(20260820)
    c = rng.standard_normal((n_clusters, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def clustered_embeddings(
    n: int,
    *,
    dim: int = 32,
    n_clusters: int = 64,
    noise: float = 0.15,
    num_blocks: int | None = None,
) -> ray.data.Dataset:
    """(vec_id, embedding list<double>[dim]) with vec_id i in cluster
    i % n_clusters: center + noise * hash-uniform offset."""
    centers = cluster_centers(n_clusters, dim)

    def gen(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["id"], dtype=np.int64)
        vecs = centers[ids % n_clusters] + noise * _hash_uniform(ids, dim)
        return pa.table(
            {
                "vec_id": pa.array(ids),
                "embedding": pa.ListArray.from_arrays(
                    pa.array(np.arange(len(ids) + 1, dtype=np.int32) * dim),
                    pa.array(vecs.ravel(), type=pa.float64()),
                ),
            }
        )

    ds = ray.data.range(n, override_num_blocks=num_blocks) if num_blocks else ray.data.range(n)
    return ds.map_batches(gen, batch_format="pyarrow")
