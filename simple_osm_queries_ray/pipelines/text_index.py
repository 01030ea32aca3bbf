"""Inverted text index: token -> posting lists as hash-sharded parquet,
with partition-pruned keyword search.

This is the text-side mirror of the grid disk index (pipelines/build_index.py
/ reference src/index/grid_writer.go): build once, then answer keyword
queries by reading ONLY the shards that can contain the query tokens. At
corpus scale the index build is one explode + one keyed write; a search
touches len(query_tokens) shards out of num_shards regardless of corpus
size — the same partition-pruning contract tests/test_index.py pins for
grid cells.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..sources.read import read_parquet_sized


def _token_shard(tokens: pd.Series | np.ndarray, num_shards: int) -> np.ndarray:
    """Stable token shard: pandas' keyed siphash (hash_key is fixed, so the
    assignment is identical across runs, processes and machines — build and
    search must agree). Vectorized C over the whole token array; at real
    corpus scale the vocabulary is millions of tokens per batch and a
    per-byte Python hash would dominate the build."""
    arr = np.asarray(tokens, dtype=object)
    h = pd.util.hash_array(arr, categorize=False)
    return (h % np.uint64(num_shards)).astype(np.int64)


def build_text_index(
    sf_dir: str, index_dir: str, *, num_shards: int = 16
) -> str:
    """Explode distinct (token, doc_id) pairs and write them hash-sharded:
    ``index_dir/shard=<s>/*.parquet``. One streaming pass + one keyed write."""
    from ..stages.text import _doc_tokens

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        flat, doc_of = _doc_tokens(batch["text"].to_pandas())
        if len(flat) == 0:
            return pa.table({"token": pa.array([], type=pa.string()),
                             "doc_id": pa.array([], type=pa.int64()),
                             "shard": pa.array([], type=pa.int64())})
        d = pd.DataFrame({"token": flat, "doc_id": ids[doc_of]}).drop_duplicates()
        uniq = d["token"].unique()
        shard_of = dict(zip(uniq, _token_shard(uniq, num_shards)))
        return pa.table(
            {
                "token": pa.array(d["token"].to_numpy(), type=pa.string()),
                "doc_id": pa.array(d["doc_id"].to_numpy(), type=pa.int64()),
                "shard": pa.array(d["token"].map(shard_of).to_numpy(), type=pa.int64()),
            }
        )

    ds = docs.map_batches(explode, batch_format="pyarrow")
    ds.write_parquet(index_dir, partition_cols=["shard"])
    return index_dir


def keyword_search(
    index_dir: str, tokens: list[str], *, num_shards: int = 16
) -> ray.data.Dataset:
    """Docs containing ALL query tokens. Reads only the shards the query
    tokens hash to (partition pruning — the point of the index), filters the
    postings to the exact tokens, and keeps doc_ids whose distinct-token hit
    count equals the query size. Output: (doc_id,)."""
    from ray.data.aggregate import Count

    want = sorted(set(tokens))
    shards = sorted({int(s) for s in _token_shard(np.array(want, dtype=object), num_shards)})
    import glob

    paths = [
        f for s in shards
        for f in sorted(glob.glob(os.path.join(index_dir, f"shard={s}", "*.parquet")))
    ]
    postings = ray.data.read_parquet(paths, columns=["token", "doc_id"])
    tok_set = pa.array(want, type=pa.string())

    def filt(batch: pa.Table) -> pa.Table:
        mask = pa.compute.is_in(batch["token"], value_set=tok_set)
        return batch.filter(mask)

    hits = postings.map_batches(filt, batch_format="pyarrow")
    counted = hits.groupby("doc_id").aggregate(Count(alias_name="n"))

    k = len(want)

    def full_match(batch: pa.Table) -> pa.Table:
        m = pa.compute.equal(batch["n"], pa.scalar(k, type=batch["n"].type))
        return batch.filter(m).select(["doc_id"])

    return counted.map_batches(full_match, batch_format="pyarrow")


def touched_shards(index_dir: str, tokens: list[str], *, num_shards: int = 16) -> int:
    want = sorted(set(tokens))
    return len({int(s) for s in _token_shard(np.array(want, dtype=object), num_shards)})
