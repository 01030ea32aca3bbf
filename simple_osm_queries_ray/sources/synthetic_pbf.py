"""Scalable synthetic ``.osm.pbf`` fixture writer (import-throughput bench).

The reference's headline metric is end-to-end import MB/s (1.5-2 MB/s,
``README.md:33``; whole-Germany 4.5 h, ``src/importing/import.go:75``).
Benchmarking our import path end-to-end needs a multi-hundred-MB PBF with
realistic topology — nodes with tags, ways referencing real node ids,
relations with way+node members — synthesized deterministically (no
external data, per the round rules).

Sharded: each Ray task writes one self-contained ``.osm.pbf`` file of
``nodes_per_shard`` nodes plus the ways/relations wholly contained in its
id range (``sources/osm_pbf.write_osm_pbf`` per shard; ``import_osm``
accepts the path list). Deterministic per shard, so the fixture is
content-addressable by (n_nodes, nodes_per_shard) and reusable across
bench cycles.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray

from .synthetic import geolocate

WAY_ID_BASE = 2_000_000_000
REL_ID_BASE = 3_000_000_000
NODES_PER_WAY = 5
WAYS_PER_REL = 40

_LANGS = ("en", "de", "es", "fr", "zh")
_WTYPES = ("primary", "secondary", "residential", "track")


def _tag_lists(keys: list[str], vals: np.ndarray) -> tuple[pa.ListArray, pa.ListArray]:
    """One (key, val) tag per element, as list<string> columns."""
    n = len(vals)
    off = pa.array(np.arange(n + 1, dtype=np.int32))
    k = pa.ListArray.from_arrays(off, pa.array(np.repeat(keys, n) if len(keys) == 1 else keys))
    v = pa.ListArray.from_arrays(off, pa.array(vals))
    return k, v


def _empty_list(n: int, typ: pa.DataType) -> pa.ListArray:
    return pa.ListArray.from_arrays(
        pa.array(np.zeros(n + 1, dtype=np.int32)), pa.array([], type=typ)
    )


def shard_elements(shard: int, nodes_per_shard: int) -> pa.Table:
    """The element table (osm_pbf schema) for one shard's id range."""
    base = shard * nodes_per_shard
    ids = np.arange(base, base + nodes_per_shard, dtype=np.int64)
    lon, lat = geolocate(ids)
    nk, nv = _tag_lists(["lang"], np.array(_LANGS, dtype=object)[ids % len(_LANGS)])
    n = len(ids)
    li = pa.int64()
    nodes = pa.table(
        {
            "etype": pa.array(np.zeros(n, dtype=np.int64)),
            "id": pa.array(ids),
            "lon": pa.array(lon),
            "lat": pa.array(lat),
            "tag_keys_str": nk,
            "tag_vals_str": nv,
            "refs": _empty_list(n, li),
            "member_nodes": _empty_list(n, li),
            "member_ways": _empty_list(n, li),
            "member_rels": _empty_list(n, li),
        }
    )

    n_ways = nodes_per_shard // NODES_PER_WAY
    wg = base // NODES_PER_WAY + np.arange(n_ways, dtype=np.int64)
    wids = WAY_ID_BASE + wg
    refs_flat = ids[: n_ways * NODES_PER_WAY]
    refs = pa.ListArray.from_arrays(
        pa.array(np.arange(n_ways + 1, dtype=np.int32) * NODES_PER_WAY),
        pa.array(refs_flat),
    )
    wk, wv = _tag_lists(["wtype"], np.array(_WTYPES, dtype=object)[wg % len(_WTYPES)])
    zeros_w = np.zeros(n_ways, dtype=np.float64)
    ways = pa.table(
        {
            "etype": pa.array(np.ones(n_ways, dtype=np.int64)),
            "id": pa.array(wids),
            "lon": pa.array(zeros_w),
            "lat": pa.array(zeros_w),
            "tag_keys_str": wk,
            "tag_vals_str": wv,
            "refs": refs,
            "member_nodes": _empty_list(n_ways, li),
            "member_ways": _empty_list(n_ways, li),
            "member_rels": _empty_list(n_ways, li),
        }
    )

    n_rels = n_ways // WAYS_PER_REL
    rg = (base // NODES_PER_WAY) // WAYS_PER_REL + np.arange(n_rels, dtype=np.int64)
    rids = REL_ID_BASE + rg
    mw_flat = wids[: n_rels * WAYS_PER_REL]
    mw = pa.ListArray.from_arrays(
        pa.array(np.arange(n_rels + 1, dtype=np.int32) * WAYS_PER_REL),
        pa.array(mw_flat),
    )
    mn_flat = ids[(np.arange(n_rels)[:, None] * WAYS_PER_REL * NODES_PER_WAY
                   + np.arange(3)[None, :]).ravel()]
    mn = pa.ListArray.from_arrays(
        pa.array(np.arange(n_rels + 1, dtype=np.int32) * 3), pa.array(mn_flat)
    )
    rk, rv = _tag_lists(
        ["rtype"], np.array(["route", "boundary"], dtype=object)[rg % 2]
    )
    zeros_r = np.zeros(n_rels, dtype=np.float64)
    rels = pa.table(
        {
            "etype": pa.array(np.full(n_rels, 2, dtype=np.int64)),
            "id": pa.array(rids),
            "lon": pa.array(zeros_r),
            "lat": pa.array(zeros_r),
            "tag_keys_str": rk,
            "tag_vals_str": rv,
            "refs": _empty_list(n_rels, li),
            "member_nodes": mn,
            "member_ways": mw,
            "member_rels": _empty_list(n_rels, li),
        }
    )
    return pa.concat_tables([nodes, ways, rels])


@ray.remote
def _write_shard(path: str, shard: int, nodes_per_shard: int) -> int:
    from .osm_pbf import write_osm_pbf

    write_osm_pbf(path, shard_elements(shard, nodes_per_shard))
    return os.path.getsize(path)


def write_synthetic_pbf(
    out_dir: str, n_nodes: int, *, nodes_per_shard: int = 200_000
) -> tuple[list[str], int]:
    """Write the sharded fixture (one Ray task per shard); returns (paths,
    total_bytes). Shards already on disk with nonzero size are kept — the
    fixture is deterministic, so this doubles as resume."""
    os.makedirs(out_dir, exist_ok=True)
    n_shards = max(1, n_nodes // nodes_per_shard)
    paths = [os.path.join(out_dir, f"shard{su:04d}.osm.pbf") for su in range(n_shards)]
    pending = [
        (p, s) for s, p in enumerate(paths)
        if not (os.path.exists(p) and os.path.getsize(p) > 0)
    ]
    if pending:
        ray.get([_write_shard.remote(p, s, nodes_per_shard) for p, s in pending])
    return paths, sum(os.path.getsize(p) for p in paths)
