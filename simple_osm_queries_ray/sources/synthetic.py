"""Deterministic derivation of geolocated features from the testdata tables.

The north rule's input is a table of (image_id, bytes, w, h, fmt, caption,
phash) rows treated as geolocated point features: lon/lat derived
deterministically from the row's hash, caption tokens becoming tags
(SURVEY.md section 1.4 / 7.1). The sandbox testdata ships a ``documents``
parquet table (doc_id, text, lang, source, n_chars); we treat it as the
caption table: ``doc_id`` -> id/phash, ``text`` -> caption, and
(lang, source, n_chars) -> tags.

Every arithmetic step here is chosen to be bit-identical between numpy and
DuckDB doubles so the driver's SQL oracle can recompute the geolocation:
integer hashing, then ``base + int_step * literal`` in IEEE float64.

The derivation plants one HOT CELL holding ~30% of all rows (rows with
``id % 10 < 3`` land in cell x=99,y=535) to exercise explicit skew splitting
(reference analogue: density-driven extent planning,
``/root/reference/src/importing/import.go:167-233``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..model import NODES_PER_REL, NODES_PER_WAY, REL_ID_BASE, WAY_ID_BASE, WAYS_PER_REL, cell_of

# Hash/geolocate constants — mirrored verbatim in oracle SQL (see
# __ray_entry__.sql_nodes_cte()).
H1_MUL = 2654435761
H2_MUL = 2246822519
H2_ADD = 1013904223
H_MOD = 2097152  # 2**21

# Replication stride for bench-scale blowup: replica r of doc i gets
# id = i + r * REP_STRIDE. Node ids stay < WAY_ID_BASE for factors <= 100.
REP_STRIDE = 100_000

WTYPE_VALUES = ["residential", "primary", "footway"]
RTYPE_VALUES = ["route", "boundary", "multipolygon"]


def geolocate(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """id -> (lon, lat), vectorized; identical in SQL with CAST(... AS DOUBLE)."""
    ids = np.asarray(ids, dtype=np.int64)
    h1 = (ids * H1_MUL) % H_MOD
    h2 = (ids * H2_MUL + H2_ADD) % H_MOD
    hot = (ids % 10) < 3
    lon = np.where(hot, 9.9 + (h1 % 1000) * 0.0001, 9.0 + (h1 % 2000) * 0.001)
    lat = np.where(hot, 53.5 + (h2 % 1000) * 0.0001, 53.0 + (h2 % 2000) * 0.001)
    return lon, lat


def derive_node_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> raw node-feature batch (string tags, no membership).

    Columns out: id, lon, lat, cell, tag_keys_str, tag_vals_str, caption.
    Vectorized; tags are the fixed keys (lang, source, n_chars) whose values
    come from the document row.
    """
    ids = np.asarray(batch["id"] if "id" in batch.column_names else batch["doc_id"], dtype=np.int64)
    lon, lat = geolocate(ids)
    cell = cell_of(lon, lat)
    n = len(ids)

    lang = batch["lang"].to_numpy(zero_copy_only=False)
    source = batch["source"].to_numpy(zero_copy_only=False)
    n_chars = np.asarray(batch["n_chars"], dtype=np.int64)

    # Fixed 3 tags per node -> build list arrays from constant offsets.
    offsets = np.arange(0, 3 * (n + 1), 3, dtype=np.int32)[: n + 1]
    flat_keys = np.empty(3 * n, dtype=object)
    flat_vals = np.empty(3 * n, dtype=object)
    flat_keys[0::3] = "lang"
    flat_keys[1::3] = "source"
    flat_keys[2::3] = "n_chars"
    flat_vals[0::3] = lang
    flat_vals[1::3] = source
    flat_vals[2::3] = n_chars.astype(str)

    tag_keys = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat_keys, type=pa.string()))
    tag_vals = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat_vals, type=pa.string()))

    return pa.table(
        {
            "id": pa.array(ids, type=pa.int64()),
            "lon": pa.array(lon, type=pa.float64()),
            "lat": pa.array(lat, type=pa.float64()),
            "cell": pa.array(cell, type=pa.int64()),
            "tag_keys_str": tag_keys,
            "tag_vals_str": tag_vals,
            "caption": batch["text"].combine_chunks()
            if "text" in batch.column_names
            else pa.array([""] * n, type=pa.string()),
        }
    )


def way_group(ids: np.ndarray) -> np.ndarray:
    """Node id -> way-group key (consecutive NODES_PER_WAY ids form one way)."""
    return np.asarray(ids, dtype=np.int64) // NODES_PER_WAY


def way_tags_for_groups(wg: np.ndarray) -> tuple[pa.ListArray, pa.ListArray]:
    """Deterministic way tags: wtype cycles over 3 values; every 7th way bridge=yes."""
    wg = np.asarray(wg, dtype=np.int64)
    n = len(wg)
    wtype = np.asarray(WTYPE_VALUES, dtype=object)[wg % 3]
    bridge = wg % 7 == 0
    keys: list[list[str]] = []
    vals: list[list[str]] = []
    for i in range(n):
        if bridge[i]:
            keys.append(["wtype", "bridge"])
            vals.append([wtype[i], "yes"])
        else:
            keys.append(["wtype"])
            vals.append([wtype[i]])
    return pa.array(keys, type=pa.list_(pa.string())), pa.array(vals, type=pa.list_(pa.string()))


def rel_group_of_way_group(wg: np.ndarray) -> np.ndarray:
    return np.asarray(wg, dtype=np.int64) // WAYS_PER_REL


def rel_tags_for_groups(rg: np.ndarray) -> tuple[pa.ListArray, pa.ListArray]:
    rg = np.asarray(rg, dtype=np.int64)
    rtype = np.asarray(RTYPE_VALUES, dtype=object)[rg % 3]
    keys = [["rtype"] for _ in rg]
    vals = [[v] for v in rtype]
    return pa.array(keys, type=pa.list_(pa.string())), pa.array(vals, type=pa.list_(pa.string()))


def read_documents(sf_dir: str, replicate: int = 1) -> ray.data.Dataset:
    """documents parquet -> Dataset with a (possibly replicated) ``id`` column.

    Column-pruned read (only the columns the derivation needs). ``replicate``
    unions r deterministic shifted copies for bench-scale inputs — replica r
    re-derives every column from id = doc_id + r*REP_STRIDE so replicas spread
    over the grid instead of stacking.
    """
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    if replicate <= 1:
        return ds.map_batches(
            lambda b: b.append_column("id", b["doc_id"].cast(pa.int64())),
            batch_format="pyarrow",
        )

    def explode(batch: pa.Table) -> pa.Table:
        tables = []
        for r in range(replicate):
            ids = np.asarray(batch["doc_id"], dtype=np.int64) + r * REP_STRIDE
            tables.append(batch.append_column("id", pa.array(ids, type=pa.int64())))
        return pa.concat_tables(tables)

    return ds.map_batches(explode, batch_format="pyarrow")


def raw_nodes(sf_dir: str, replicate: int = 1) -> ray.data.Dataset:
    """The map-only geolocate stage: documents -> raw node features."""
    return read_documents(sf_dir, replicate).map_batches(derive_node_batch, batch_format="pyarrow")
