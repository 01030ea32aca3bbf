"""Generic OSM import: raw parsed elements -> queryable FeatureRepo.

The real-data counterpart of the synthetic derivation (``sources/synthetic.py``
builds the graph from formulas; this pipeline builds it from actual member
references). Reference passes: ``src/importing/import.go:17-163`` (temp
features, node->way/relation back-references) and
``src/index/grid_writer.go:50-330`` (cell assignment, bbox assembly). Ray
shape: every membership resolution is an explode -> hash-join / bucket-collect
exchange keyed on the member id — no ordering assumptions, no in-memory
global maps (the reference needs members-before-parents file order; nested
relation bounds flow through :func:`flow_child_bounds` instead).

Divergences (documented):
- way/relation members referencing ids absent from the input are dropped
  from the assembled lists (the reference skips unknown members at write
  time too);
- relations whose bbox never receives a member contribution keep an empty
  (+inf/-inf) bound and match no bbox query.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..model import cell_of
from ..sources.osm_xml import read_osm_xml, split_elements
from ..stages.group_collect import (
    bucket_collect,
    coalesce_small_blocks as _coalesce_small_blocks,
    collect_list_column,
    segment_unique_lists,
)
from ..stages.joins import hash_join_attach
from .build_graph import attach_reverse_membership, flow_child_bounds

_SELF_SEQ = -1  # self-marker rows sort before real members (seq/member ids >= 0)
_TAG_SEQ = -2  # per-way tag rows sort before everything (fused tag attach)

_BOUND_FIELDS = [
    ("minlon", pa.float64()),
    ("minlat", pa.float64()),
    ("maxlon", pa.float64()),
    ("maxlat", pa.float64()),
]
_TAG_FIELDS = [
    ("tag_keys_str", pa.list_(pa.string())),
    ("tag_vals_str", pa.list_(pa.string())),
]
_EMPTY_WAYS = pa.schema(
    [
        ("id", pa.int64()),
        ("node_ids", pa.list_(pa.int64())),
        ("node_lons", pa.list_(pa.float64())),
        ("node_lats", pa.list_(pa.float64())),
        ("cells", pa.list_(pa.int64())),
        *_BOUND_FIELDS,
        *_TAG_FIELDS,
    ]
)
_EMPTY_RELS = pa.schema(
    [
        ("id", pa.int64()),
        ("node_ids", pa.list_(pa.int64())),
        ("way_ids", pa.list_(pa.int64())),
        ("cells", pa.list_(pa.int64())),
        *_BOUND_FIELDS,
        *_TAG_FIELDS,
        ("child_relation_ids", pa.list_(pa.int64())),
        ("parent_relation_ids", pa.list_(pa.int64())),
    ]
)


def _explode_with_seq(ds: ray.data.Dataset, list_col: str, out_key: str) -> ray.data.Dataset:
    """(id, [refs]) -> (id, seq, ref) rows preserving document order."""
    from ..functions.segments import list_parts

    def fn(batch: pa.Table) -> pa.Table:
        flat, offsets = list_parts(batch[list_col])
        ids = np.asarray(batch["id"], dtype=np.int64)
        reps = np.diff(offsets)
        total = int(offsets[-1])
        seq = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], reps)
        return pa.table(
            {
                out_key: pa.array(np.asarray(flat, dtype=np.int64)),
                "owner_id": pa.array(np.repeat(ids, reps)),
                "seq": pa.array(seq),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def assemble_ways(
    raw_ways: ray.data.Dataset, nodes: ray.data.Dataset, num_buckets: int | None = None
) -> ray.data.Dataset:
    """(id, refs, tags) + node coords -> full way features.

    Two exchanges: a hash join attaching each referenced node's coords/cell to
    the (way, seq, ref) edge rows, then a bucket-collect keyed on the way id
    re-assembling ordered node lists, unique cells and the bbox
    (``grid_writer.go:125-145`` semantics: a way lives in every cell one of
    its nodes touches). Refs to unknown nodes are dropped.
    """
    if num_buckets is None:
        # reduce tasks = buckets: a fixed 16 underuses a 32-core node (and a
        # 256-node cluster); size to the cluster
        num_buckets = max(
            16, int(ray.cluster_resources().get("CPU", 16)) if ray.is_initialized() else 16
        )
    edges = _explode_with_seq(raw_ways.select_columns(["id", "refs"]), "refs", "node_ref")
    edges = hash_join_attach(
        edges,
        "node_ref",
        nodes.select_columns(["id", "lon", "lat", "cell"]).rename_columns(
            {"id": "__nid", "lon": "__nlon", "lat": "__nlat", "cell": "__ncell"}
        ),
        "__nid",
        {"__nlon": pa.float64(), "__nlat": pa.float64(), "__ncell": pa.int64()},
        num_buckets=num_buckets,
    )

    def drop_unknown(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pa.compute.is_valid(batch["__nlon"]))
        n = len(batch)
        # tag columns ride as nulls on member rows; the tag row (seq = -2,
        # one per way, below) carries the real lists. Fusing tags into the
        # SAME bucket exchange replaces the former second hash join, which
        # re-shuffled the assembled ways with their full coordinate-list
        # payload (measured: the tag join cost ~half the whole assembly)
        return batch.append_column(
            "tag_keys_str", pa.nulls(n, pa.list_(pa.string()))
        ).append_column("tag_vals_str", pa.nulls(n, pa.list_(pa.string())))

    edges = edges.map_batches(drop_unknown, batch_format="pyarrow")

    def tag_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "node_ref": pa.array(np.full(n, -1, dtype=np.int64)),
                "owner_id": batch["id"].cast(pa.int64()),
                "seq": pa.array(np.full(n, _TAG_SEQ, dtype=np.int64)),
                "__nlon": pa.nulls(n, pa.float64()),
                "__nlat": pa.nulls(n, pa.float64()),
                "__ncell": pa.nulls(n, pa.int64()),
                "tag_keys_str": batch["tag_keys_str"],
                "tag_vals_str": batch["tag_vals_str"],
            }
        )

    edges = edges.union(
        raw_ways.select_columns(["id", "tag_keys_str", "tag_vals_str"]).map_batches(
            tag_rows, batch_format="pyarrow"
        )
    )

    def assemble(tbl: pa.Table, wids: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        from ..stages.joins import nulls_to_empty_list

        seq = np.asarray(tbl["seq"], dtype=np.int64)
        is_member = seq != _TAG_SEQ
        # tag row (seq = -2) sorts first within its way; the member range is
        # [start + has_tag, end). Ways with no resolved members are dropped
        # (same semantics as the former inner collect + tag attach).
        has_tag = ~is_member[starts]
        lens = ends - starts - has_tag.astype(np.int64)
        keep = lens > 0
        row_grp = np.repeat(np.arange(len(starts), dtype=np.int64), ends - starts)
        member_sel = is_member & keep[row_grp]
        wids = wids[keep]
        lens = lens[keep]
        n = len(wids)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        seg_starts, seg_ends = offs[:-1], offs[1:]
        ids = np.asarray(tbl["node_ref"], dtype=np.int64)[member_sel]
        lon = np.asarray(
            tbl["__nlon"].combine_chunks().fill_null(np.nan), dtype=np.float64
        )[member_sel]
        lat = np.asarray(
            tbl["__nlat"].combine_chunks().fill_null(np.nan), dtype=np.float64
        )[member_sel]
        cells = np.asarray(
            tbl["__ncell"].combine_chunks().fill_null(0), dtype=np.int64
        )[member_sel]
        group_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        ucells, uoff = segment_unique_lists(group_idx, cells, n)
        # tags come from the way's first row: the tag row when present, else
        # a member row whose (null) tag lists become empty lists
        take_idx = pa.array(starts[keep])
        tk = nulls_to_empty_list(tbl["tag_keys_str"].take(take_idx))
        tv = nulls_to_empty_list(tbl["tag_vals_str"].take(take_idx))
        empty_f = np.array([], dtype=np.float64)
        return pa.table(
            {
                "id": pa.array(wids, type=pa.int64()),
                "node_ids": collect_list_column(ids, seg_starts, seg_ends, pa.int64()),
                "node_lons": collect_list_column(lon, seg_starts, seg_ends, pa.float64()),
                "node_lats": collect_list_column(lat, seg_starts, seg_ends, pa.float64()),
                "cells": collect_list_column(ucells, uoff[:-1], uoff[1:], pa.int64()),
                "minlon": pa.array(np.minimum.reduceat(lon, seg_starts) if n else empty_f, type=pa.float64()),
                "minlat": pa.array(np.minimum.reduceat(lat, seg_starts) if n else empty_f, type=pa.float64()),
                "maxlon": pa.array(np.maximum.reduceat(lon, seg_starts) if n else empty_f, type=pa.float64()),
                "maxlat": pa.array(np.maximum.reduceat(lat, seg_starts) if n else empty_f, type=pa.float64()),
                "tag_keys_str": tk,
                "tag_vals_str": tv,
            }
        )

    return bucket_collect(
        edges, "owner_id", assemble, sort_col="seq", num_buckets=num_buckets
    )


def assemble_relations(
    raw_rels: ray.data.Dataset,
    nodes: ray.data.Dataset,
    ways: ray.data.Dataset,
    num_buckets: int | None = None,
    max_nesting: int = 2,
) -> ray.data.Dataset:
    """(id, member lists, tags) -> relation features with bbox/cell union.

    Member bound edges (node points, way bboxes) meet in a bucket-collect
    keyed on the relation id; a per-relation self edge guarantees every
    relation appears even with no resolvable members. Child/parent relation
    edges come from the actual ``member_rels`` lists (existence-filtered);
    nested bounds flow with :func:`flow_child_bounds` for ``max_nesting``
    levels (reference: file-order dependence, ``grid_writer.go:94-106``).
    """
    if num_buckets is None:
        num_buckets = max(
            16, int(ray.cluster_resources().get("CPU", 16)) if ray.is_initialized() else 16
        )

    node_edges = _explode_with_seq(
        raw_rels.select_columns(["id", "member_nodes"]), "member_nodes", "member_id"
    )
    node_edges = hash_join_attach(
        node_edges,
        "member_id",
        nodes.select_columns(["id", "lon", "lat", "cell"]).rename_columns(
            {"id": "__nid", "lon": "__nlon", "lat": "__nlat", "cell": "__ncell"}
        ),
        "__nid",
        {"__nlon": pa.float64(), "__nlat": pa.float64(), "__ncell": pa.int64()},
        num_buckets=num_buckets,
    )

    def node_to_bound(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pa.compute.is_valid(batch["__nlon"]))
        lon = np.asarray(batch["__nlon"], dtype=np.float64)
        lat = np.asarray(batch["__nlat"], dtype=np.float64)
        cell = np.asarray(batch["__ncell"], dtype=np.int64)
        n = len(batch)
        return pa.table(
            {
                "owner_id": batch["owner_id"],
                "member_id": batch["member_id"],
                "seq": batch["seq"],
                "member_type": pa.array(np.zeros(n, dtype=np.int64)),
                "minlon": pa.array(lon),
                "minlat": pa.array(lat),
                "maxlon": pa.array(lon),
                "maxlat": pa.array(lat),
                "cells": pa.ListArray.from_arrays(
                    pa.array(np.arange(n + 1, dtype=np.int32)), pa.array(cell)
                ),
            }
        )

    node_edges = node_edges.map_batches(node_to_bound, batch_format="pyarrow")

    way_edges = _explode_with_seq(
        raw_rels.select_columns(["id", "member_ways"]), "member_ways", "member_id"
    )
    way_edges = hash_join_attach(
        way_edges,
        "member_id",
        ways.select_columns(["id", "minlon", "minlat", "maxlon", "maxlat", "cells"]).rename_columns(
            {
                "id": "__wid",
                "minlon": "__wminlon",
                "minlat": "__wminlat",
                "maxlon": "__wmaxlon",
                "maxlat": "__wmaxlat",
                "cells": "__wcells",
            }
        ),
        "__wid",
        {
            "__wminlon": pa.float64(),
            "__wminlat": pa.float64(),
            "__wmaxlon": pa.float64(),
            "__wmaxlat": pa.float64(),
            "__wcells": pa.list_(pa.int64()),
        },
        num_buckets=num_buckets,
    )

    def way_to_bound(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pa.compute.is_valid(batch["__wminlon"]))
        n = len(batch)
        from ..stages.joins import nulls_to_empty_list

        return pa.table(
            {
                "owner_id": batch["owner_id"],
                "member_id": batch["member_id"],
                "seq": batch["seq"],
                "member_type": pa.array(np.ones(n, dtype=np.int64)),
                "minlon": batch["__wminlon"],
                "minlat": batch["__wminlat"],
                "maxlon": batch["__wmaxlon"],
                "maxlat": batch["__wmaxlat"],
                "cells": nulls_to_empty_list(batch["__wcells"].combine_chunks()),
            }
        )

    way_edges = way_edges.map_batches(way_to_bound, batch_format="pyarrow")

    def self_edges(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "owner_id": batch["id"],
                "member_id": pa.array(np.full(n, _SELF_SEQ, dtype=np.int64)),
                "seq": pa.array(np.full(n, _SELF_SEQ, dtype=np.int64)),
                "member_type": pa.array(np.full(n, 2, dtype=np.int64)),
                "minlon": pa.array(np.full(n, np.inf)),
                "minlat": pa.array(np.full(n, np.inf)),
                "maxlon": pa.array(np.full(n, -np.inf)),
                "maxlat": pa.array(np.full(n, -np.inf)),
                "cells": pa.ListArray.from_arrays(
                    pa.array(np.zeros(n + 1, dtype=np.int32)),
                    pa.array([], type=pa.int64()),
                ),
            }
        )

    edges = (
        raw_rels.select_columns(["id"])
        .map_batches(self_edges, batch_format="pyarrow")
        .union(node_edges)
        .union(way_edges)
    )

    def assemble(tbl: pa.Table, rids: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        from ..functions.segments import list_parts

        n = len(rids)
        member_id = np.asarray(tbl["member_id"], dtype=np.int64)
        member_type = np.asarray(tbl["member_type"], dtype=np.int64)
        flat_cells, cell_offsets = list_parts(tbl["cells"])
        group_idx = np.repeat(np.arange(n, dtype=np.int64), ends - starts)
        cgi = np.repeat(group_idx, np.diff(cell_offsets))
        ucells, uoff = segment_unique_lists(cgi, np.asarray(flat_cells, dtype=np.int64), n)

        def typed_lists(type_code: int) -> pa.ListArray:
            mask = member_type == type_code
            lens = np.add.reduceat(mask.astype(np.int64), starts)
            lens[(ends - starts) == 0] = 0
            offs = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lens, out=offs[1:])
            return collect_list_column(member_id[mask], offs[:-1], offs[1:], pa.int64())

        return pa.table(
            {
                "id": pa.array(rids, type=pa.int64()),
                "node_ids": typed_lists(0),
                "way_ids": typed_lists(1),
                "cells": collect_list_column(ucells, uoff[:-1], uoff[1:], pa.int64()),
                "minlon": pa.array(np.minimum.reduceat(np.asarray(tbl["minlon"]), starts)),
                "minlat": pa.array(np.minimum.reduceat(np.asarray(tbl["minlat"]), starts)),
                "maxlon": pa.array(np.maximum.reduceat(np.asarray(tbl["maxlon"]), starts)),
                "maxlat": pa.array(np.maximum.reduceat(np.asarray(tbl["maxlat"]), starts)),
            }
        )

    # seq sort keeps member order inside node_ids/way_ids; the self edge
    # (seq = -1) sorts first and contributes nothing to either list.
    # MATERIALIZE here: the assembled relation table (one row per relation,
    # tiny vs the member-edge volume that produced it) fans out to several
    # consumers below (sorted_id_array, resolve_children, the parent-edge
    # explode, the broadcast attach, flow_child_bounds) — unpinned, each
    # re-executes the full edge assembly (observed 415 s vs ~15 s at 500k
    # nodes; same rule at every later fan-out point in this function)
    rels = _coalesce_small_blocks(
        bucket_collect(
            edges, "owner_id", assemble, sort_col="seq", num_buckets=num_buckets
        ).materialize()
    )
    rels = hash_join_attach(
        rels,
        "id",
        raw_rels.select_columns(["id", "tag_keys_str", "tag_vals_str", "member_rels"]),
        "id",
        {
            "tag_keys_str": pa.list_(pa.string()),
            "tag_vals_str": pa.list_(pa.string()),
            "member_rels": pa.list_(pa.int64()),
        },
        num_buckets=num_buckets,
        fill_empty_list_cols=("tag_keys_str", "tag_vals_str", "member_rels"),
    )

    # child edges = actual member_rels filtered to existing relations;
    # parent lists are the inversion (explode -> broadcast-probe attach)
    from ..stages.semi_join import filter_list_to_idset, sorted_id_array
    from ..stages.joins import attach_edges_broadcast, explode_list

    rels = rels.materialize()  # joined tags/member_rels: same fan-out rule
    ids_ref = sorted_id_array(rels)

    def resolve_children(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "child_relation_ids", filter_list_to_idset(batch["member_rels"], ids_ref)
        )
        return batch.drop_columns(["member_rels"])

    rels = rels.map_batches(resolve_children, batch_format="pyarrow").materialize()
    parent_edges = explode_list(
        rels.select_columns(["id", "child_relation_ids"]),
        "child_relation_ids",
        "id",
        out_val="__parent",
        out_key="__child",
    )
    rels = attach_edges_broadcast(
        rels, "id", parent_edges, "__child", "__parent", "parent_relation_ids"
    )
    return flow_child_bounds(rels, max_depth=max_nesting, num_buckets=num_buckets)


def _read_elements(paths: str | list[str]) -> ray.data.Dataset:
    plist = [paths] if isinstance(paths, str) else list(paths)
    pbf = [p for p in plist if p.endswith(".pbf")]
    if pbf and len(pbf) != len(plist):
        raise ValueError(
            "cannot mix .pbf and XML inputs in one import: "
            f"{len(pbf)} of {len(plist)} paths are .pbf"
        )
    if pbf:
        from ..sources.osm_pbf import read_osm_pbf

        return read_osm_pbf(pbf)
    return read_osm_xml(paths)


def merge_changes(
    elems: ray.data.Dataset, changes: ray.data.Dataset
) -> ray.data.Dataset:
    """Apply an osmChange element delta to a base element dataset: every
    changed (etype, id) — created, modified or deleted — is dropped from the
    base, then create/modify rows are appended (OSM change semantics:
    modify replaces the whole element).

    The changed-id set is the small side (minutely/hourly diffs are MBs
    against a multi-GB base), so it broadcasts once as per-type sorted
    arrays and each base batch filters locally — no shuffle of the base.
    For a delta comparable in size to the base, build a fresh import
    instead (or swap this probe for the partitioned hash anti-join in
    ``stages/joins.py``).
    """
    # one collect serves both halves: the broadcast drop set AND the
    # last-write-wins addition resolution below
    ctbl = pa.concat_tables(
        ray.get(changes.to_arrow_refs()), promote_options="default"
    )
    keys_et = np.asarray(ctbl["etype"], dtype=np.int64) if ctbl.num_rows else np.array([], dtype=np.int64)
    keys_id = np.asarray(ctbl["id"], dtype=np.int64) if ctbl.num_rows else np.array([], dtype=np.int64)
    per_type = [np.sort(keys_id[keys_et == t]) for t in (0, 1, 2)]
    ref = ray.put(per_type)

    def drop_changed(batch: pa.Table) -> pa.Table:
        from ..state.broadcast import get as bget

        sets = bget(ref)
        et = np.asarray(batch["etype"], dtype=np.int64)
        ids = np.asarray(batch["id"], dtype=np.int64)
        keep = np.ones(len(ids), dtype=bool)
        for t, arr in enumerate(sets):
            if len(arr) == 0:
                continue
            m = et == t
            pos = np.searchsorted(arr, ids[m])
            pos[pos >= len(arr)] = len(arr) - 1
            keep[m] = arr[pos] != ids[m]
        return batch.filter(pa.array(keep))

    from ..sources.osm_xml import OP_DELETE

    # last-write-wins per (etype, id): an element touched by several change
    # operations (modify in osc1 then osc2, create-then-modify, or
    # modify-then-delete) must surface ONCE with its final state — naively
    # appending every non-delete row duplicates it. The delta is the small
    # side by this function's contract, so resolve ordering driver-side in
    # Arrow (exact types preserved); ``__seq`` comes from read_osc.
    if ctbl.num_rows:
        et = keys_et
        ids = keys_id
        seq = (
            np.asarray(ctbl["__seq"], dtype=np.int64)
            if "__seq" in ctbl.column_names
            else np.arange(ctbl.num_rows, dtype=np.int64)
        )
        order = np.lexsort((seq, ids, et))
        ets, idss = et[order], ids[order]
        last = np.ones(len(order), dtype=bool)
        last[:-1] = (ets[1:] != ets[:-1]) | (idss[1:] != idss[:-1])
        keep = np.zeros(ctbl.num_rows, dtype=bool)
        keep[order[last]] = True
        keep &= np.asarray(ctbl["op"], dtype=np.int64) != OP_DELETE
        adds_tbl = ctbl.filter(pa.array(keep)).drop_columns(
            [c for c in ("op", "__seq") if c in ctbl.column_names]
        )
    else:
        adds_tbl = ctbl.drop_columns(
            [c for c in ("op", "__seq") if c in ctbl.column_names]
        )

    base = elems.map_batches(drop_changed, batch_format="pyarrow")
    return base.union(ray.data.from_arrow(adds_tbl))


def import_osm_with_changes(
    base_paths: str | list[str],
    osc_paths: str | list[str],
    materialize: bool = True,
    cell_scheme=None,
    base_tag_index=None,
):
    """``import`` + osmChange replication: read the base extract, apply one
    or more ``.osc`` deltas at the element level, then run the exact same
    assembly pipeline — a node move reflows every way/relation geometry
    that references it, which per-feature patching would miss. At scale the
    reassembly cost is bounded by scoping the rebuild to cells whose
    elements changed (the partition-pruned DiskRepo gives the seam); here
    the full rebuild keeps the semantics trivially right.
    """
    from ..sources.osm_xml import read_osc

    merged = merge_changes(_read_elements(base_paths), read_osc(osc_paths))
    return build_repo_from_elements(
        merged, materialize=materialize, cell_scheme=cell_scheme
    )


def import_osm(paths: str | list[str], materialize: bool = True, cell_scheme=None, base_tag_index=None):
    """``.osm`` / ``.osm.pbf`` file(s) -> FeatureRepo (the reference's
    ``import`` command, ``src/main.go:70-96``, as one Ray pipeline).
    ``cell_scheme`` mirrors the reference's cellWidth/cellHeight import
    parameters (``src/importing/import.go:17``) — e.g.
    ``GridCellScheme(0.05, 0.05)``; default is the 0.1-degree grid.
    """
    return build_repo_from_elements(
        _read_elements(paths), materialize=materialize, cell_scheme=cell_scheme,
        base_tag_index=base_tag_index,
    )


def build_repo_from_elements(
    elems: ray.data.Dataset, materialize: bool = True, cell_scheme=None,
    base_tag_index=None,
):
    """Parsed element dataset -> FeatureRepo.

    The element dataset is materialized once (the object-store analogue of
    the reference's temp-feature spill file, SURVEY.md S2/S3) because three
    type-projections and several joins re-consume it.
    """
    from ..sources.repo import FeatureRepo
    from ..stages.tag_encode import encode_tags
    from .tag_dictionary import build_tag_index

    if materialize:
        elems = elems.materialize()
    raw_nodes, raw_ways, raw_rels = split_elements(elems)

    assign_cell = cell_scheme.cell_of if cell_scheme is not None else cell_of

    def add_cell(batch: pa.Table) -> pa.Table:
        cell = assign_cell(
            np.asarray(batch["lon"], dtype=np.float64),
            np.asarray(batch["lat"], dtype=np.float64),
        )
        return batch.append_column("cell", pa.array(cell, type=pa.int64()))

    nodes0 = raw_nodes.map_batches(add_cell, batch_format="pyarrow")
    if materialize:
        # coalesce as well: the decoded element stream inherits one block
        # per PBF blob, and downstream sort-shuffle task counts are
        # quadratic in block count (group_collect.coalesce_small_blocks)
        nodes0 = _coalesce_small_blocks(nodes0.materialize())
    # empty way/relation inputs short-circuit to typed empty tables: the
    # collect/join machinery cannot infer schemas from zero-row lineages
    if raw_ways.count() == 0:
        ways0 = ray.data.from_arrow(_EMPTY_WAYS.empty_table())
    else:
        ways0 = assemble_ways(raw_ways, nodes0)
    if materialize:
        ways0 = _coalesce_small_blocks(ways0.materialize())
    if raw_rels.count() == 0:
        rels0 = ray.data.from_arrow(_EMPTY_RELS.empty_table())
    else:
        rels0 = assemble_relations(raw_rels, nodes0, ways0)
    if materialize:
        rels0 = rels0.materialize()

    nodes1, ways1 = attach_reverse_membership(nodes0, ways0, rels0)
    if materialize:
        # both feed TWO consumers (tag index + encode); unpinned, the
        # attach lineage re-executes per consumer
        nodes1 = nodes1.materialize()
        ways1 = ways1.materialize()
    tag_index = build_tag_index(nodes1, ways1, rels0, base=base_tag_index)
    ti_ref = ray.put(tag_index)
    nodes = encode_tags(nodes1, ti_ref)
    ways = encode_tags(ways1, ti_ref)
    rels = encode_tags(rels0, ti_ref)
    if materialize:
        nodes = nodes.materialize()
        ways = ways.materialize()
        rels = rels.materialize()
    return FeatureRepo(nodes, ways, rels, tag_index, cell_scheme=cell_scheme)
