"""Distributed iterative graph algorithms with exact arithmetic.

PageRank-style score propagation over the order-supplier bipartite graph
(distinct (l_orderkey, l_suppkey) pairs of lineitem, both directions). All
arithmetic is FIXED-POINT INTEGER: contributions are ``score * 85 // (100 *
outdeg)`` and integer sums are exactly associative, so the distributed
result is bit-identical to a serial or SQL replay regardless of summation
order — the same determinism discipline as the integer-cent revenue sums
(pipelines/relational.py), applied to an iterative algorithm.

Per iteration: one partitioned hash join (edges x scores on src — neither
side broadcast) and one groupby-sum keyed on dst. The corpus-scale shape of
Pregel-style propagation on Ray Data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

SCALE = 1_000_000
DAMP_NUM = 85
BASE = 15 * SCALE // 100


def _bipartite_edges(sf_dir: str) -> ray.data.Dataset:
    """Directed edge list (src, dst) of the order-supplier graph: orders get
    even vertex ids (2k), suppliers odd (2k+1); every distinct pair emits
    both directions. Dedup = per-batch drop_duplicates then one keyed
    groupby (the only dedup shuffle)."""
    from ..sources.read import read_parquet_sized

    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"])

    num_buckets = 16

    def pairs(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o": np.asarray(batch["l_orderkey"], dtype=np.int64),
                "s": np.asarray(batch["l_suppkey"], dtype=np.int64),
            }
        ).drop_duplicates()
        df["__bucket"] = df["o"].to_numpy() % num_buckets
        return pa.Table.from_pandas(df, preserve_index=False)

    def dedup(tbl: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"o": np.asarray(tbl["o"], dtype=np.int64), "s": np.asarray(tbl["s"], dtype=np.int64)}
        ).drop_duplicates()
        o = df["o"].to_numpy() * 2
        s = df["s"].to_numpy() * 2 + 1
        return pa.table(
            {
                "src": pa.array(np.concatenate([o, s])),
                "dst": pa.array(np.concatenate([s, o])),
            }
        )

    cand = li.map_batches(pairs, batch_format="pyarrow")
    return cand.groupby("__bucket").map_groups(dedup, batch_format="pyarrow")


def pagerank_suppliers(sf_dir: str, iters: int = 2, k: int = 20) -> pd.DataFrame:
    """``iters`` rounds of damped integer score propagation from a uniform
    start, then the top-k supplier vertices by (score desc, suppkey asc).
    Output: (s_suppkey, score)."""
    from ray.data.aggregate import Sum

    from .joins import hash_join_attach

    edges = _bipartite_edges(sf_dir).materialize()  # reused every iteration

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"src": batch["src"], "one": pa.array(np.ones(len(batch), dtype=np.int64))}
        )

    deg = (
        edges.map_batches(ones, batch_format="pyarrow")
        .groupby("src")
        .aggregate(Sum("one", alias_name="deg"))
    )

    def init_scores(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": batch["src"],
                "sc": pa.array(np.full(len(batch), SCALE, dtype=np.int64)),
                "deg": batch["deg"].cast(pa.int64()),
            }
        )

    scores = deg.map_batches(init_scores, batch_format="pyarrow").materialize()

    for _ in range(iters):
        contrib = hash_join_attach(
            edges, "src", scores, "v", {"sc": pa.int64(), "deg": pa.int64()}
        )

        def push(batch: pa.Table) -> pa.Table:
            sc = np.asarray(batch["sc"].combine_chunks().fill_null(0), dtype=np.int64)
            d = np.asarray(batch["deg"].combine_chunks().fill_null(1), dtype=np.int64)
            c = sc * np.int64(DAMP_NUM) // (np.int64(100) * np.maximum(d, 1))
            df = pd.DataFrame({"dst": np.asarray(batch["dst"], dtype=np.int64), "c": c})
            g = df.groupby("dst", as_index=False)["c"].sum()
            return pa.table({"dst": pa.array(g["dst"].to_numpy()), "c": pa.array(g["c"].to_numpy())})

        acc = (
            contrib.map_batches(push, batch_format="pyarrow")
            .repartition(8)
            .groupby("dst")
            .aggregate(Sum("c", alias_name="acc"))
        )
        new_scores = hash_join_attach(
            acc, "dst", scores.select_columns(["v", "deg"]).map_batches(
                lambda b: pa.table({"v2": b["v"], "deg": b["deg"]}), batch_format="pyarrow"
            ), "v2", {"deg": pa.int64()},
        )

        def finish(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "v": batch["dst"],
                    "sc": pa.array(
                        np.int64(BASE) + np.asarray(batch["acc"], dtype=np.int64)
                    ),
                    "deg": batch["deg"].combine_chunks().fill_null(1).cast(pa.int64()),
                }
            )

        scores = new_scores.map_batches(finish, batch_format="pyarrow").materialize()

    def suppliers(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch["v"], dtype=np.int64)
        sc = np.asarray(batch["sc"], dtype=np.int64)
        odd = v % 2 == 1
        return pa.table(
            {"s_suppkey": pa.array((v[odd] - 1) // 2), "score": pa.array(sc[odd])}
        )

    out = scores.map_batches(suppliers, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["score", "s_suppkey"], ascending=[False, True], kind="mergesort")
    return out.head(k).reset_index(drop=True)
