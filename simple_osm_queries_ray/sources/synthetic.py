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

from ..model import NODES_PER_WAY, WAY_ID_BASE, WAYS_PER_REL, cell_of

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

    import pyarrow.compute as pc

    lang = batch["lang"].combine_chunks() if isinstance(batch["lang"], pa.ChunkedArray) else batch["lang"]
    source = (
        batch["source"].combine_chunks()
        if isinstance(batch["source"], pa.ChunkedArray)
        else batch["source"]
    )
    n_chars_str = pc.cast(batch["n_chars"], pa.string())
    if isinstance(n_chars_str, pa.ChunkedArray):
        n_chars_str = n_chars_str.combine_chunks()

    # Fixed 3 tags per node -> interleave [lang_i, source_i, n_chars_i] with a
    # single C-level gather (take) instead of Python object arrays.
    offsets = np.arange(0, 3 * (n + 1), 3, dtype=np.int32)[: n + 1]
    stacked_vals = pa.concat_arrays([lang.cast(pa.string()), source.cast(pa.string()), n_chars_str])
    gather = np.empty(3 * n, dtype=np.int64)
    gather[0::3] = np.arange(n)
    gather[1::3] = np.arange(n) + n
    gather[2::3] = np.arange(n) + 2 * n
    flat_vals = pc.take(stacked_vals, pa.array(gather))
    flat_keys = pc.take(
        pa.array(["lang", "source", "n_chars"]), pa.array(np.tile([0, 1, 2], n))
    )

    tag_keys = pa.ListArray.from_arrays(pa.array(offsets), flat_keys)
    tag_vals = pa.ListArray.from_arrays(pa.array(offsets), flat_vals)

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
    """Deterministic way tags: wtype cycles over 3 values; every 7th way bridge=yes.

    Fully vectorized: indices into a tiny string dictionary gathered with one
    Arrow take per column — no per-row Python list building.
    """
    import pyarrow.compute as pc

    wg = np.asarray(wg, dtype=np.int64)
    n = len(wg)
    bridge = wg % 7 == 0
    lens = np.where(bridge, 2, 1)
    off = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lens, out=off[1:])
    total = int(off[-1])
    second = off[:-1][bridge] + 1  # second slot of bridge rows
    key_idx = np.zeros(total, dtype=np.int64)  # 0 = "wtype"
    key_idx[second] = 1  # 1 = "bridge"
    val_idx = np.empty(total, dtype=np.int64)
    val_idx[off[:-1]] = wg % 3  # 0..2 = wtype values
    val_idx[second] = 3  # 3 = "yes"
    flat_keys = pc.take(pa.array(["wtype", "bridge"]), pa.array(key_idx))
    flat_vals = pc.take(pa.array(WTYPE_VALUES + ["yes"]), pa.array(val_idx))
    return (
        pa.ListArray.from_arrays(pa.array(off), flat_keys),
        pa.ListArray.from_arrays(pa.array(off), flat_vals),
    )


def rel_group_of_way_group(wg: np.ndarray) -> np.ndarray:
    return np.asarray(wg, dtype=np.int64) // WAYS_PER_REL


def rel_tags_for_groups(rg: np.ndarray) -> tuple[pa.ListArray, pa.ListArray]:
    import pyarrow.compute as pc

    rg = np.asarray(rg, dtype=np.int64)
    n = len(rg)
    off = pa.array(np.arange(n + 1, dtype=np.int32))
    flat_keys = pc.take(pa.array(["rtype"]), pa.array(np.zeros(n, dtype=np.int64)))
    flat_vals = pc.take(pa.array(RTYPE_VALUES), pa.array(rg % 3))
    return (
        pa.ListArray.from_arrays(off, flat_keys),
        pa.ListArray.from_arrays(off, flat_vals),
    )


def read_documents(sf_dir: str, replicate: int = 1, stride: int = REP_STRIDE) -> ray.data.Dataset:
    """documents parquet -> Dataset with a (possibly replicated) ``id`` column.

    Column-pruned read (only the columns the derivation needs). ``replicate``
    unions r deterministic shifted copies for bench-scale inputs — replica r
    re-derives every column from id = doc_id + r*stride so replicas spread
    over the grid instead of stacking. ``stride`` must exceed the max doc_id,
    and replicate*stride must stay below WAY_ID_BASE so node ids never collide
    with the synthetic way/relation id ranges.
    """
    assert replicate * stride <= WAY_ID_BASE, "node ids would collide with way ids"
    from .read import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    if replicate <= 1:
        return ds.map_batches(
            lambda b: b.append_column("id", b["doc_id"].cast(pa.int64())),
            batch_format="pyarrow",
        )

    def explode(batch: pa.Table) -> pa.Table:
        tables = []
        for r in range(replicate):
            ids = np.asarray(batch["doc_id"], dtype=np.int64) + r * stride
            tables.append(batch.append_column("id", pa.array(ids, type=pa.int64())))
        return pa.concat_tables(tables)

    return ds.map_batches(explode, batch_format="pyarrow")


def synthetic_polygons(
    n: int, vertices: int = 16, seed: int = 7
) -> list[list[tuple[float, float]]]:
    """Deterministic star-convex geofence polygons over the node extent.

    Used by the spatial-join benches and their oracle SQL (same construction
    re-run with the same seed gives identical coordinates).
    """
    rng = np.random.RandomState(seed)
    polys = []
    for _ in range(n):
        cx, cy = 9.0 + rng.rand() * 2, 53.0 + rng.rand() * 2
        ang = np.sort(rng.rand(vertices) * 2 * np.pi)
        r = 0.2 + rng.rand(vertices) * 0.3
        polys.append(
            [(float(cx + rr * np.cos(a)), float(cy + rr * np.sin(a))) for a, rr in zip(ang, r)]
        )
    return polys


def generated_points(
    sf_dir: str,
    replicate: int,
    stride: int = REP_STRIDE,
    blocks_per_cpu: int = 4,
    num_blocks: int | None = None,
) -> ray.data.Dataset:
    """Geometry-only feature generator for the spatial-join scaling benches.

    Same deterministic id set and geolocation as :func:`generated_nodes`
    (replica r: id = doc_id + r*stride) but carrying only (id, lon, lat,
    cell) — the columns the spatial-join + tile-assignment job reads. No
    way-id-range constraint: no membership graph is derived from these ids.
    """
    import pyarrow.parquet as pq
    import ray as _ray

    doc_ids = np.asarray(
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])["doc_id"],
        dtype=np.int64,
    )
    ids_ref = _ray.put(doc_ids)
    if num_blocks is not None:
        # fixed layout regardless of cluster size — required for fair
        # two-cluster-size comparisons (same blocks, different CPU pool)
        per_task = max(1, replicate // num_blocks)
    else:
        cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
        per_task = max(1, replicate // (blocks_per_cpu * cpus))

    def gen(batch) -> pa.Table:
        from ..model import cell_of
        from ..state.broadcast import get as bget

        base = bget(ids_ref)
        tables = []
        for r in np.asarray(batch["id"], dtype=np.int64):
            ids = base + int(r) * stride
            lon, lat = geolocate(ids)
            tables.append(
                pa.table(
                    {
                        "id": pa.array(ids, type=pa.int64()),
                        "lon": pa.array(lon, type=pa.float64()),
                        "lat": pa.array(lat, type=pa.float64()),
                        "cell": pa.array(cell_of(lon, lat), type=pa.int64()),
                    }
                )
            )
        return pa.concat_tables(tables)

    # Generation is UNTIMED fixture setup for the scaling bench (only the
    # downstream job is measured, over the pre-materialized blocks).
    # Fractional num_cpus lets the small-slot config (6 CPUs) overlap
    # generation tasks so fixture wall-time doesn't scale inversely with the
    # measured slot count — the measured job itself runs strictly within the
    # session's CPU budget.
    return ray.data.range(
        replicate, override_num_blocks=max(1, replicate // per_task)
    ).map_batches(
        gen, batch_format="pyarrow", batch_size=per_task, num_cpus=0.25
    )


def raw_nodes(sf_dir: str, replicate: int = 1, stride: int = REP_STRIDE) -> ray.data.Dataset:
    """The map-only geolocate stage: documents -> raw node features."""
    return read_documents(sf_dir, replicate, stride).map_batches(
        derive_node_batch, batch_format="pyarrow"
    )


def generated_nodes(
    sf_dir: str, replicate: int, stride: int = REP_STRIDE, replicas_per_task: int | None = None
) -> ray.data.Dataset:
    """Bench-scale node generator with full fan-out parallelism.

    Reading one small parquet file yields a handful of blocks, so a 1000x
    explode inside map_batches runs on a few tasks no matter how many CPUs
    exist. Instead: broadcast the (tiny) documents table once, drive the
    generation with ``ray.data.range(replicate)`` — one task per few replicas
    — and derive each replica's rows from id = doc_id + r*stride. Output
    parallelism scales with ``replicate``, not with the input file count.

    ``replicas_per_task`` defaults so the output has ~4 blocks per CPU:
    enough tasks to saturate the cluster, few enough that downstream
    sort-shuffles (whose task count is quadratic in block count) stay cheap.
    """
    import pyarrow.parquet as pq
    import ray as _ray

    assert replicate * stride <= WAY_ID_BASE, "node ids would collide with way ids"
    if replicas_per_task is None:
        cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
        replicas_per_task = max(1, replicate // (4 * cpus))
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    docs_ref = _ray.put(docs)

    def gen(batch) -> pa.Table:
        from ..state.broadcast import get as bget

        base: pa.Table = bget(docs_ref)
        tables = []
        for r in np.asarray(batch["id"], dtype=np.int64):
            ids = np.asarray(base["doc_id"], dtype=np.int64) + int(r) * stride
            t = base.append_column("id", pa.array(ids, type=pa.int64()))
            tables.append(derive_node_batch(t))
        return pa.concat_tables(tables)

    return ray.data.range(
        replicate, override_num_blocks=max(1, replicate // replicas_per_task)
    ).map_batches(gen, batch_format="pyarrow", batch_size=replicas_per_task)
