"""Dataset-version diffing — the FULL OUTER JOIN shape.

A training-data pipeline re-materializes its corpus continuously; the
operational question between two versions is "what changed": rows added,
removed, or modified. That is a full outer join on the row key plus a value
compare — a join shape the engine's other operators never need (semi-joins,
left-attaches and inner joins cover the reference's semantics,
``src/query/filter.go:265-331``).

Distributed plan: both versions stream, tagged with a side bit, through ONE
hash-bucket shuffle on the key (the same discipline as
``stages.group_collect.bucketed_reduce``: a bucket holds every row of its
keys from BOTH sides, so the per-bucket compare is exact and independent).
Inside a bucket everything is sorted-array arithmetic — searchsorted
membership, no Python loops. Only O(#statuses) rows leave each bucket.

The second version is synthesized deterministically from the documents table
(drop ``doc_id % 17 == 0``, perturb ``n_chars`` where ``doc_id % 13 == 0``,
append fresh ids where ``doc_id % 19 == 0``) so the SQL twin can reproduce
it exactly — no external data, per the round rules.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..sources.read import read_parquet_sized

_STATUS = ("added", "changed", "removed", "same")
_ADD_OFFSET = 10_000_000


def _v1(sf_dir: str) -> ray.data.Dataset:
    return read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )


def _v2(sf_dir: str) -> ray.data.Dataset:
    """Deterministic synthetic 'next version' of the documents table."""
    docs = _v1(sf_dir)

    def evolve(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        n = np.asarray(batch["n_chars"], dtype=np.int64)
        keep = ids % 17 != 0
        kid, kn = ids[keep], n[keep].copy()
        kn[kid % 13 == 0] += 1
        aid = ids[ids % 19 == 0] + _ADD_OFFSET
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([kid, aid])),
                "n_chars": pa.array(
                    np.concatenate([kn, np.full(len(aid), 42, dtype=np.int64)])
                ),
            }
        )

    return docs.map_batches(evolve, batch_format="pyarrow")


def version_diff_counts(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    val: str,
    *,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Row-status census between two dataset versions keyed by int64 ``key``
    with int64 payload ``val``: added / removed / changed / same counts.

    Keys must be unique per side (versions of a keyed corpus). One shuffle;
    per-bucket compare is sorted-array arithmetic; the reduce output is 4
    rows. ``num_buckets`` bounds per-task memory — size it so both sides'
    bucket slices fit a worker heap (same rule as bucketed_reduce)."""

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            k = np.asarray(batch[key], dtype=np.int64)
            h = (k.astype(np.uint64) * np.uint64(0x100000001B3)) % np.uint64(num_buckets)
            return pa.table(
                {
                    "k": pa.array(k),
                    "v": pa.array(np.asarray(batch[val], dtype=np.int64)),
                    "side": pa.array(np.full(len(k), side, dtype=np.int8)),
                    "__bucket": pa.array(h.astype(np.int64)),
                }
            )

        return fn

    both = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        k = np.asarray(tbl["k"], dtype=np.int64)
        v = np.asarray(tbl["v"], dtype=np.int64)
        s = np.asarray(tbl["side"], dtype=np.int8)
        k0, v0 = k[s == 0], v[s == 0]
        k1, v1 = k[s == 1], v[s == 1]
        o0, o1 = np.argsort(k0), np.argsort(k1)
        k0, v0, k1, v1 = k0[o0], v0[o0], k1[o1], v1[o1]
        pos = np.searchsorted(k0, k1)
        in0 = (pos < len(k0)) & (k0[np.minimum(pos, max(len(k0) - 1, 0))] == k1) if len(k0) else np.zeros(len(k1), bool)
        n_added = int((~in0).sum())
        same_val = v0[pos[in0]] == v1[in0]
        n_same = int(same_val.sum())
        n_changed = int(len(same_val) - n_same)
        n_removed = int(len(k0) - in0.sum())
        return pa.table(
            {
                "status": pa.array(list(_STATUS)),
                "n": pa.array(
                    np.array([n_added, n_changed, n_removed, n_same], dtype=np.int64)
                ),
            }
        )

    from ray.data.aggregate import Sum

    return (
        both.groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby("status")
        .aggregate(Sum("n", alias_name="n"))
        .filter(expr="n > 0")  # SQL twin only surfaces statuses that occur
    )


def documents_version_diff(sf_dir: str) -> ray.data.Dataset:
    """queries() face: diff the documents table against its synthetic next
    version. Output: (status, n) — 4 rows."""
    return version_diff_counts(_v1(sf_dir), _v2(sf_dir), "doc_id", "n_chars")


def partition_checksums(
    sf_dir: str, *, part_size: int = 1000
) -> ray.data.Dataset:
    """Anti-entropy checksums per id-range partition: (part, n_rows,
    checksum) over the documents table, where part = doc_id // part_size —
    the same contiguous-range partitioning the wave-resumable jobs use
    (jobs/image_job.py), so a resumed run can be VERIFIED identical to an
    uninterrupted one partition-by-partition without comparing rows.

    Checksum = sum of (doc_id * 2654435761 + n_chars * 40503) % 2^32 per
    partition — order-independent (addition commutes, so distributed batch
    order cannot change it) and exactly reproducible in SQL (all
    intermediates fit int64). Streaming partials + one bucketed sum; output
    is O(#partitions)."""
    from ..stages.group_collect import bucketed_sum

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        n = np.asarray(batch["n_chars"], dtype=np.int64)
        h = (ids * np.int64(2654435761) + n * np.int64(40503)) % np.int64(2**32)
        part = ids // part_size
        u, inv = np.unique(part, return_inverse=True)
        cnt = np.zeros(len(u), dtype=np.int64)
        acc = np.zeros(len(u), dtype=np.int64)
        np.add.at(cnt, inv, 1)
        np.add.at(acc, inv, h)
        return pa.table(
            {"part": pa.array(u), "n_rows": pa.array(cnt), "checksum": pa.array(acc)}
        )

    return bucketed_sum(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["part"],
        ["n_rows", "checksum"],
    )
