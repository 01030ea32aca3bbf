"""Embeddings table with planted near-duplicate vectors.

The base table has no near pairs (max pairwise cosine ~0.48), so rows with
``vec_id % 25 == 0`` are copied with id += 100000 and the first component
shifted by +0.25 — cosine vs the original stays ~0.999 (far above any
detection threshold, far below nothing). All arithmetic in float64; the SQL
twin casts the FLOAT[] column to DOUBLE[] first so values match bit-exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

NEAR_OFFSET = 100_000
EVERY = 25
SHIFT = 0.25


def dup_embeddings(sf_dir: str) -> ray.data.Dataset:
    from .read import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"], dtype=np.int64)
        vecs = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        d = vecs.shape[1] if len(vecs) else 0

        def to_list(mat: np.ndarray) -> pa.ListArray:
            return pa.ListArray.from_arrays(
                pa.array(np.arange(len(mat) + 1, dtype=np.int32) * d),
                pa.array(mat.ravel(), type=pa.float64()),
            )

        base = pa.table({"vec_id": pa.array(ids), "embedding": to_list(vecs)})
        m = ids % EVERY == 0
        shifted = vecs[m].copy()
        if len(shifted):
            shifted[:, 0] = shifted[:, 0] + SHIFT
        near = pa.table(
            {"vec_id": pa.array(ids[m] + NEAR_OFFSET), "embedding": to_list(shifted)}
        )
        return pa.concat_tables([base, near])

    return ds.map_batches(fn, batch_format="pyarrow")


DUP_EMB_SQL = f"""
dup_emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {NEAR_OFFSET} AS vec_id,
         list_prepend(v[1] + CAST({SHIFT!r} AS DOUBLE), v[2:]) AS embedding
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
  WHERE vec_id % {EVERY} = 0
)"""
