"""Incremental MinHash dedup across corpus versions — the 100 TB re-crawl
story (r04 verdict #5).

A training corpus re-materializes continuously; re-signing and re-pairing
every document per version is O(corpus) work for an O(delta) change. This
pipeline persists the LSH state of version N and computes version N+1's
near-dup pair set by:

1. CONTENT DIFF — hash every v2 doc (the exact-dedup 128-bit kernel) and
   bucket-compare against the persisted (id, hash) table: ids whose
   (id, hash) is absent from v1 are the DELTA (added or changed); v1 ids
   whose (id, hash) is absent from v2 are STALE (removed, or changed and
   re-entering through the delta). One hash-bucket shuffle, sorted-array
   compare per bucket (the pipelines/versioning.py discipline); only
   delta/stale rows leave the buckets.
2. PURGE — drop stale ids from the persisted band rows and from the
   persisted verified pairs (either endpoint stale).
3. SIGN THE DELTA ONLY — :func:`..stages.dedup.minhash_band_rows` over the
   delta docs; signing volume is O(delta), asserted via ``stats_out``.
4. PAIR — candidate pairs from the (surviving ∪ delta) band buckets,
   restricted to pairs touching >= 1 delta id (an ``is_new`` carry bit
   through the shared bucket machinery); exact-Jaccard verify attaches
   texts from v2 only for those pairs.
5. RESULT = surviving old pairs ∪ new verified pairs. Disjoint by
   construction: a new pair touches a delta id, and a delta id never
   survives in the old pair set (brand-new ids were never there; changed
   ids are stale and purged). Equality with the batch rerun over v2 is
   oracle-pinned (same exact-Jaccard SQL twin over the evolved corpus) and
   asserted in tests.

Band derivation depends on the threshold but not the corpus size
(stages/dedup.py:_lsh_rows_per_band), so v1 signatures remain valid for
v2 — a threshold change invalidates the state (meta.json check, loud).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..sources.read import read_parquet_sized
from ..stages.dedup import (
    _lsh_rows_per_band,
    _verify_pairs_jaccard,
    candidate_pairs_from_buckets,
    minhash_band_rows,
    minhash_lsh_pairs,
)
from ..stages.group_collect import bucketed_distinct

#: above this many delta/stale ids the membership filters switch from the
#: ray.put sorted-array probe to a partitioned hash join — same rationale
#: and size as pipelines/query.py BROADCAST_ID_LIMIT (a 10 M int64 set is
#: ~80 MB in the object store, read zero-copy by every task)
ID_BROADCAST_LIMIT = 10_000_000


def _content_hashes(
    ds: ray.data.Dataset, *, text_col: str = "text", id_col: str = "id"
) -> ray.data.Dataset:
    """(id, h1, h2) — the exact-dedup 128-bit content hash per doc."""

    def fn(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch[text_col].to_pylist(), dtype=object)
        h1 = pd.util.hash_pandas_object(s, index=False, hash_key="0123456789123456")
        h2 = pd.util.hash_pandas_object(s, index=False, hash_key="6543210987654321")
        return pa.table(
            {
                "id": batch[id_col].cast(pa.int64()),
                "h1": pa.array(h1.to_numpy().astype(np.int64)),
                "h2": pa.array(h2.to_numpy().astype(np.int64)),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def _hash_diff(
    v1: ray.data.Dataset, v2: ray.data.Dataset, *, num_buckets: int = 64
) -> ray.data.Dataset:
    """(id, status) with status 1 = delta (in v2, (id,h) not in v1) and
    0 = stale (in v1, (id,h) not in v2). One bucketed shuffle keyed on id;
    per-bucket sorted-array compare on the (id, h1, h2) triple; only
    changed rows leave a bucket (output is delta-sized, not corpus-sized)."""

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            k = np.asarray(batch["id"], dtype=np.int64)
            h = (k.astype(np.uint64) * np.uint64(0x100000001B3)) % np.uint64(num_buckets)
            return pa.table(
                {
                    "id": pa.array(k),
                    "h1": batch["h1"],
                    "h2": batch["h2"],
                    "side": pa.array(np.full(len(k), side, dtype=np.int8)),
                    "__bucket": pa.array(h.astype(np.int64)),
                }
            )

        return fn

    both = v1.map_batches(tag(0), batch_format="pyarrow").union(
        v2.map_batches(tag(1), batch_format="pyarrow")
    )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        ids = np.asarray(tbl["id"], dtype=np.int64)
        h1 = np.asarray(tbl["h1"], dtype=np.int64)
        h2 = np.asarray(tbl["h2"], dtype=np.int64)
        s = np.asarray(tbl["side"], dtype=np.int8)
        out_id, out_st = [], []
        rows = {}
        for side in (0, 1):
            m = s == side
            r = np.stack([ids[m], h1[m], h2[m]], axis=1)
            rows[side] = r[np.argsort(r[:, 0])]  # ids unique per side
        for side, status in ((1, 1), (0, 0)):  # v2-not-in-v1 = delta; v1-not-in-v2 = stale
            probe, ref = rows[side], rows[1 - side]
            if len(probe) == 0:
                continue
            if len(ref) == 0:
                miss = np.ones(len(probe), dtype=bool)
            else:
                # ids are unique per side: locate the id, then require the
                # content hash to match at that position
                idx = np.clip(
                    np.searchsorted(ref[:, 0], probe[:, 0]), 0, len(ref) - 1
                )
                miss = ~(ref[idx] == probe).all(axis=1)
            out_id.append(probe[miss, 0])
            out_st.append(np.full(int(miss.sum()), status, dtype=np.int64))
        if not out_id:
            return pa.table(
                {"id": pa.array([], type=pa.int64()),
                 "status": pa.array([], type=pa.int64())}
            )
        return pa.table(
            {"id": pa.array(np.concatenate(out_id)),
             "status": pa.array(np.concatenate(out_st))}
        )

    return both.groupby("__bucket").map_groups(per_bucket, batch_format="pyarrow")


def _membership_filter(
    ds: ray.data.Dataset,
    col: str,
    ids_ds: ray.data.Dataset,
    *,
    keep_in: bool,
    n_ids: int | None = None,
) -> ray.data.Dataset:
    """Keep ds rows whose ``col`` is (keep_in) / is not (not keep_in) in the
    id set. Broadcast sorted-array probe under ID_BROADCAST_LIMIT; above it,
    a partitioned left-outer hash join with a marker column — identical
    semantics, no driver materialization."""
    if n_ids is None:
        n_ids = ids_ds.count()
    if n_ids <= ID_BROADCAST_LIMIT:
        from ..stages.semi_join import sorted_unique_id_array

        ref = sorted_unique_id_array(ids_ds, "id")

        def probe(batch: pa.Table) -> pa.Table:
            from ..state.broadcast import get as bget

            sorted_ids = bget(ref)
            v = np.asarray(batch[col], dtype=np.int64)
            if len(sorted_ids) == 0:
                hit = np.zeros(len(v), dtype=bool)
            else:
                idx = np.clip(np.searchsorted(sorted_ids, v), 0, len(sorted_ids) - 1)
                hit = sorted_ids[idx] == v
            return batch.filter(pa.array(hit if keep_in else ~hit))

        return ds.map_batches(probe, batch_format="pyarrow")

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    num_partitions = max(2, cpus // 2)
    ids_r = ids_ds.map_batches(
        lambda t: pa.table({col: t["id"].cast(pa.int64())}), batch_format="pyarrow"
    )
    # semi/anti emit each left row at most once even with duplicate right
    # keys, so no pre-dedup of the id side is needed
    return ds.join(
        ids_r, "left_semi" if keep_in else "left_anti", num_partitions, on=(col,)
    )


def build_minhash_state(
    docs: ray.data.Dataset,
    state_dir: str,
    *,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "id",
) -> dict:
    """Sign + pair the full corpus and persist the incremental state:
    ``bands/`` (band, bhash, id), ``content/`` (id, h1, h2), ``pairs/``
    (id_a, id_b), then ``meta.json`` LAST — its presence is the
    completeness gate (the crash-consistency discipline of
    pipelines/build_index.py): an interrupted build leaves no meta and the
    next run rebuilds from scratch."""
    meta_path = os.path.join(state_dir, "meta.json")
    if os.path.exists(meta_path):
        os.remove(meta_path)  # drop the gate first: a failed rebuild must not
        # leave old meta over new partial data
    os.makedirs(state_dir, exist_ok=True)
    minhash_band_rows(
        docs, threshold=threshold, text_col=text_col, id_col=id_col
    ).write_parquet(os.path.join(state_dir, "bands"))
    _content_hashes(docs, text_col=text_col, id_col=id_col).write_parquet(
        os.path.join(state_dir, "content")
    )
    minhash_lsh_pairs(
        docs, threshold=threshold, text_col=text_col, id_col=id_col
    ).write_parquet(os.path.join(state_dir, "pairs"))
    meta = {"threshold": threshold, "rows_per_band": _lsh_rows_per_band(threshold)}
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return meta


def incremental_minhash_dedup(
    docs_v2: ray.data.Dataset,
    state_dir: str,
    *,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "id",
    stats_out: dict | None = None,
    update_state_dir: str | None = None,
) -> ray.data.Dataset:
    """Near-dup pairs (id_a < id_b, exact Jaccard >= threshold) for corpus
    version 2, computed from persisted v1 state by signing ONLY the delta.
    Result is identical to ``minhash_lsh_pairs(docs_v2)`` (oracle-pinned).

    ``stats_out`` (optional dict) receives ``signed_docs`` / ``delta_docs``
    / ``stale_docs`` so callers can assert the incremental contract.
    ``update_state_dir`` rolls the state forward for version 3 (must be a
    DIFFERENT directory: the rolled bands/pairs lineages lazily read the
    old state, so an in-place rewrite would read-while-write corrupt)."""
    if update_state_dir is not None and os.path.abspath(
        update_state_dir
    ) == os.path.abspath(state_dir):
        raise ValueError(
            "update_state_dir must differ from state_dir: the rolled state "
            "is derived lazily FROM the old state's files (write-generations "
            "alternate between two dirs, or copy afterwards)"
        )
    meta_path = os.path.join(state_dir, "meta.json")
    if not os.path.exists(meta_path):
        raise FileNotFoundError(
            f"no complete minhash state at {state_dir} (meta.json missing); "
            "run build_minhash_state first"
        )
    with open(meta_path) as f:
        meta = json.load(f)
    if meta["threshold"] != threshold:
        raise ValueError(
            f"state at {state_dir} was signed for threshold={meta['threshold']}; "
            f"threshold={threshold} needs a rebuild (band derivation differs)"
        )

    v1_content = read_parquet_sized(os.path.join(state_dir, "content"))
    v2_hashes = _content_hashes(docs_v2, text_col=text_col, id_col=id_col)
    diff = _hash_diff(v1_content, v2_hashes).materialize()  # delta-sized
    delta_ids = diff.filter(expr="status == 1").select_columns(["id"])
    stale_ids = diff.filter(expr="status == 0").select_columns(["id"])
    n_delta = delta_ids.count()
    n_stale = stale_ids.count()

    if n_delta == 0 and n_stale == 0:
        # nothing changed: the persisted pair set IS the answer (and the
        # verify join below would choke on a schema-less empty candidate
        # stream). State roll-forward just copies.
        if stats_out is not None:
            stats_out.update({"delta_docs": 0, "stale_docs": 0, "signed_docs": 0})
        v1_pairs = read_parquet_sized(os.path.join(state_dir, "pairs"))
        if update_state_dir is not None and os.path.abspath(
            update_state_dir
        ) != os.path.abspath(state_dir):
            next_meta = os.path.join(update_state_dir, "meta.json")
            if os.path.exists(next_meta):
                os.remove(next_meta)
            os.makedirs(update_state_dir, exist_ok=True)
            read_parquet_sized(os.path.join(state_dir, "bands")).write_parquet(
                os.path.join(update_state_dir, "bands")
            )
            v1_content.write_parquet(os.path.join(update_state_dir, "content"))
            v1_pairs.write_parquet(os.path.join(update_state_dir, "pairs"))
            with open(next_meta, "w") as f:
                json.dump(meta, f)
            return read_parquet_sized(os.path.join(update_state_dir, "pairs"))
        return v1_pairs

    v1_bands = read_parquet_sized(os.path.join(state_dir, "bands"))
    surviving_bands = _membership_filter(
        v1_bands, id_col, stale_ids, keep_in=False, n_ids=n_stale
    )
    delta_docs = _membership_filter(
        docs_v2.select_columns([id_col, text_col]), id_col, delta_ids,
        keep_in=True, n_ids=n_delta,
    ).materialize()  # delta-sized; reused for signing + count
    signed_docs = delta_docs.count()
    delta_bands = minhash_band_rows(
        delta_docs, threshold=threshold, text_col=text_col, id_col=id_col
    )
    if stats_out is not None:
        stats_out.update(
            {"delta_docs": n_delta, "stale_docs": n_stale, "signed_docs": signed_docs}
        )

    def flag(v: int):
        return lambda t: t.append_column(
            "is_new", pa.array(np.full(len(t), v, dtype=np.int64))
        )

    all_bands = surviving_bands.map_batches(flag(0), batch_format="pyarrow").union(
        delta_bands.map_batches(flag(1), batch_format="pyarrow")
    )
    cand = candidate_pairs_from_buckets(
        all_bands, ["band", "bhash"], id_col, carry_cols=["is_new"]
    )
    cand_new = bucketed_distinct(
        cand.map_batches(
            lambda t: t.filter(
                pc.greater(pc.add(t["is_new_a"], t["is_new_b"]), 0)
            ).select(["id_a", "id_b"]),
            batch_format="pyarrow",
        ),
        ["id_a", "id_b"],
    )
    new_pairs = _verify_pairs_jaccard(
        cand_new, docs_v2, threshold, text_col=text_col, id_col=id_col
    )

    v1_pairs = read_parquet_sized(os.path.join(state_dir, "pairs"))
    old_pairs = _membership_filter(
        _membership_filter(v1_pairs, "id_a", stale_ids, keep_in=False, n_ids=n_stale),
        "id_b", stale_ids, keep_in=False, n_ids=n_stale,
    )
    result = old_pairs.union(new_pairs)

    if update_state_dir is not None:
        next_meta = os.path.join(update_state_dir, "meta.json")
        if os.path.exists(next_meta):
            os.remove(next_meta)
        os.makedirs(update_state_dir, exist_ok=True)
        all_bands.map_batches(
            lambda t: t.drop_columns(["is_new"]), batch_format="pyarrow"
        ).write_parquet(os.path.join(update_state_dir, "bands"))
        v2_hashes.write_parquet(os.path.join(update_state_dir, "content"))
        result.write_parquet(os.path.join(update_state_dir, "pairs"))
        with open(next_meta, "w") as f:
            json.dump(meta, f)
        return read_parquet_sized(os.path.join(update_state_dir, "pairs"))
    return result


# -- deterministic evolved corpus (queries()/oracle twin) -------------------

V2_REMOVE_MOD = 17
V2_CHANGE_MOD = 13
V2_ADD_MOD = 19
V2_ADD_OFFSET = 4_000_000
V2_CHANGE_SUFFIX = " v2"
V2_ADD_SUFFIX = " extra"


def dup_documents_v2(sf_dir: str) -> ray.data.Dataset:
    """Version 2 of sources/dup_docs.py's corpus, evolved deterministically
    (SQL-reproducible): drop id % 17 == 0; append ' v2' where id % 13 == 0;
    add copies with ' extra' and id += 4_000_000 where id % 19 == 0."""
    from ..sources.dup_docs import dup_documents

    base = dup_documents(sf_dir)

    def evolve(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["id"], dtype=np.int64)
        keep = pa.array(ids % V2_REMOVE_MOD != 0)
        kept = batch.filter(keep)
        kid = np.asarray(kept["id"], dtype=np.int64)
        changed = pa.array(kid % V2_CHANGE_MOD == 0)
        ktext = pc.if_else(
            changed,
            pc.binary_join_element_wise(kept["text"], V2_CHANGE_SUFFIX, ""),
            kept["text"],
        )
        add_mask = pa.array(ids % V2_ADD_MOD == 0)
        added = batch.filter(add_mask)
        return pa.concat_tables(
            [
                pa.table({"id": kept["id"], "text": ktext}),
                pa.table(
                    {
                        "id": pc.add(added["id"], V2_ADD_OFFSET),
                        "text": pc.binary_join_element_wise(
                            added["text"], V2_ADD_SUFFIX, ""
                        ),
                    }
                ),
            ]
        )

    return base.map_batches(evolve, batch_format="pyarrow")


DUP_DOCS_V2_SQL = f"""
dup_docs_v2 AS (
  SELECT id,
         CASE WHEN id % {V2_CHANGE_MOD} = 0 THEN text || '{V2_CHANGE_SUFFIX}'
              ELSE text END AS text
  FROM dup_docs WHERE id % {V2_REMOVE_MOD} != 0
  UNION ALL
  SELECT id + {V2_ADD_OFFSET} AS id, text || '{V2_ADD_SUFFIX}' AS text
  FROM dup_docs WHERE id % {V2_ADD_MOD} = 0
)"""


def incremental_minhash_query(
    sf_dir: str, *, threshold: float = 0.5, stats_out: dict | None = None
) -> ray.data.Dataset:
    """queries() entry: bootstrap v1 state from dup_documents, then compute
    dup_documents_v2's pair set incrementally (signing only the delta).
    The oracle is the batch exact-Jaccard SQL over the evolved corpus."""
    import tempfile

    from ..sources.dup_docs import dup_documents

    state = tempfile.mkdtemp(prefix="soqr_mh_state_")
    build_minhash_state(dup_documents(sf_dir), state, threshold=threshold)
    return incremental_minhash_dedup(
        dup_documents_v2(sf_dir), state, threshold=threshold, stats_out=stats_out
    )
