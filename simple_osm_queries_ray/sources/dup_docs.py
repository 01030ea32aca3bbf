"""Deterministic duplicated/near-duplicated documents table for dedup ops.

The base ``documents`` table has no duplicate texts, so the dedup operators
need planted ones (FIXTURES.md style, fixed formulas reproducible in SQL):

- exact duplicates: rows with ``doc_id % 10 == 0`` are copied verbatim with
  id += 1_000_000;
- near duplicates:  rows with ``doc_id % 10 == 5`` are copied with the last
  two whitespace-separated words removed and id += 2_000_000.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

EXACT_OFFSET = 1_000_000
NEAR_OFFSET = 2_000_000
# last two words (same regex semantics in RE2 / DuckDB / Python re)
NEAR_REGEX = r" [^ ]+ [^ ]+$"


def dup_documents(sf_dir: str) -> ray.data.Dataset:
    from .read import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch["doc_id"].cast(pa.int64())
        base = pa.table({"id": ids, "text": batch["text"]})
        ids_np = np.asarray(ids, dtype=np.int64)
        exact_mask = pa.array(ids_np % 10 == 0)
        exact = base.filter(exact_mask)
        exact = pa.table(
            {"id": pc.add(exact["id"], EXACT_OFFSET), "text": exact["text"]}
        )
        near_mask = pa.array(ids_np % 10 == 5)
        near = base.filter(near_mask)
        near = pa.table(
            {
                "id": pc.add(near["id"], NEAR_OFFSET),
                "text": pc.replace_substring_regex(near["text"], NEAR_REGEX, ""),
            }
        )
        return pa.concat_tables([base, exact, near])

    return ds.map_batches(fn, batch_format="pyarrow")


DUP_DOCS_SQL = f"""
dup_docs AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + {EXACT_OFFSET} AS id, text FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + {NEAR_OFFSET} AS id,
         regexp_replace(text, ' [^ ]+ [^ ]+$', '') AS text
  FROM documents WHERE doc_id % 10 = 5
)"""
