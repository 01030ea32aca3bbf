"""Feature-graph construction: nodes -> ways -> relations + reverse membership.

Ray-Data re-expression of the reference's import passes
(``/root/reference/src/importing/import.go:17-163`` and
``src/index/grid_writer.go:50-330``): instead of ordered file scans and
in-memory maps, membership assembly is a keyed shuffle (``bucket_collect``)
and reverse membership is explode + collect + hash join (SURVEY.md J3/J4/J5).
No ordering assumptions (the reference needs members-before-parents file
order; we iterate relation-bbox assembly to a bounded fixed point instead).

Synthetic membership graph (FIXTURES.md section 2): every NODES_PER_WAY
consecutive node ids form a way; every WAYS_PER_REL consecutive way groups
form a relation; relations directly contain their range's first 3 nodes;
relation groups with g % 4 == 0 are parents of groups g+1..g+3.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.segments import list_parts
from ..model import (
    NODES_PER_REL,
    NODES_PER_WAY,
    REL_ID_BASE,
    REL_NEST,
    WAY_ID_BASE,
    WAYS_PER_REL,
)
from ..sources.synthetic import (
    rel_tags_for_groups,
    way_tags_for_groups,
)
from ..stages.group_collect import bucket_collect, collect_list_column, segment_unique_lists
from ..stages.joins import nulls_to_empty_list, attach_list_column, collect_edge_lists, explode_list


def build_ways(
    raw_nodes: ray.data.Dataset,
    num_buckets: int = 64,
    *,
    cell_fn=None,
    compact_exchange: bool = True,
) -> ray.data.Dataset:
    """Assemble way features from member nodes (one shuffle keyed on way group).

    Output: id, node_ids, node_lons, node_lats, cells (unique member cells,
    the reference's multi-cell replication rule ``grid_writer.go:125-129``),
    bound (minlon..maxlat), tag_keys_str/tag_vals_str, relation_ids.

    ``compact_exchange`` (default on) projects the all-to-all payload down
    to (wg int64, r int8, lon, lat) — 26 bytes/row vs the 40-byte full row
    — and reconstructs the dropped columns EXACTLY on the receive side:
    ``id = wg * NODES_PER_WAY + r`` (the residual is < NODES_PER_WAY by the
    key derivation, so int8 holds it losslessly) and ``cell`` via
    ``cell_fn`` (defaults to the flat grid's :func:`..model.cell_of`; pass
    the scheme's ``cell_of`` when the repo uses a custom cell scheme —
    every producer derives the cell column from lon/lat, so receive-side
    recomputation is byte-identical). The exchange is the engine's one
    corpus-wide full all-to-all; its cost is byte-volume-bound, so the
    projection is a direct ~1.5x cut in shuffled bytes (measured in
    bench.py's shuffle probe)."""

    assemble = _way_assemble_fn()
    if not compact_exchange:
        return bucket_collect(
            raw_nodes.map_batches(_add_wg, batch_format="pyarrow"),
            "wg",
            assemble,
            sort_col="id",
            num_buckets=num_buckets,
        )

    if cell_fn is None:
        from ..model import cell_of as cell_fn

    def assemble_compact(
        tbl: pa.Table, wgs: np.ndarray, starts: np.ndarray, ends: np.ndarray
    ) -> pa.Table:
        wg_col = np.asarray(tbl["wg"], dtype=np.int64)
        r = np.asarray(tbl["r"], dtype=np.int64)
        lon = np.asarray(tbl["lon"], dtype=np.float64)
        lat = np.asarray(tbl["lat"], dtype=np.float64)
        full = pa.table(
            {
                "id": pa.array(wg_col * NODES_PER_WAY + r),
                "lon": pa.array(lon),
                "lat": pa.array(lat),
                "cell": pa.array(
                    np.asarray(cell_fn(lon, lat), dtype=np.int64)
                ),
            }
        )
        return assemble(full, wgs, starts, ends)

    return bucket_collect(
        raw_nodes.map_batches(_add_wg_compact, batch_format="pyarrow"),
        "wg",
        assemble_compact,
        sort_col="r",
        num_buckets=num_buckets,
    )


def _add_wg(batch: pa.Table) -> pa.Table:
    """Shared way-group keying (build_ways + build_ways_local_first must
    derive the key identically — their equivalence is pinned by test)."""
    ids = np.asarray(batch["id"], dtype=np.int64)
    t = batch.select(["id", "lon", "lat", "cell"])
    return t.append_column("wg", pa.array(ids // NODES_PER_WAY))


def _add_wg_compact(batch: pa.Table) -> pa.Table:
    """Minimal exchange payload: (wg, r, lon, lat) with r = id mod
    NODES_PER_WAY as int8 — see build_ways(compact_exchange=True)."""
    ids = np.asarray(batch["id"], dtype=np.int64)
    wg = ids // NODES_PER_WAY
    return pa.table(
        {
            "wg": pa.array(wg),
            "r": pa.array((ids - wg * NODES_PER_WAY).astype(np.int8)),
            "lon": batch["lon"],
            "lat": batch["lat"],
        }
    )


def build_relations(
    raw_nodes: ray.data.Dataset, ways: ray.data.Dataset, num_buckets: int = 16
) -> ray.data.Dataset:
    """Assemble relation features from member edges (J5 bbox-union aggregation).

    Member edges: direct node members (first 3 ids of each relation range) and
    way members. Bound/cells are the union over member bounds/cells
    (reference ``grid_writer.go:94-106,146-244``); parent/child bbox nesting
    is applied afterwards by :func:`nest_relations` as a bounded fixed point.
    """

    def node_edges(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["id"], dtype=np.int64)
        keep = ids % NODES_PER_REL < 3
        ids = ids[keep]
        lon = np.asarray(batch["lon"], dtype=np.float64)[keep]
        lat = np.asarray(batch["lat"], dtype=np.float64)[keep]
        cell = np.asarray(batch["cell"], dtype=np.int64)[keep]
        one = np.ones(len(ids), dtype=np.int64)
        return pa.table(
            {
                "rg": pa.array(ids // NODES_PER_REL),
                "member_id": pa.array(ids),
                "member_type": pa.array(one * 0),  # 0 = node
                "minlon": pa.array(lon),
                "minlat": pa.array(lat),
                "maxlon": pa.array(lon),
                "maxlat": pa.array(lat),
                "cells": pa.ListArray.from_arrays(
                    pa.array(np.arange(len(ids) + 1, dtype=np.int32)), pa.array(cell)
                ),
            }
        )

    def way_edges(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["id"], dtype=np.int64)
        wg = ids - WAY_ID_BASE
        return pa.table(
            {
                "rg": pa.array(wg // WAYS_PER_REL),
                "member_id": pa.array(ids),
                "member_type": pa.array(np.ones(len(ids), dtype=np.int64)),  # 1 = way
                "minlon": batch["minlon"],
                "minlat": batch["minlat"],
                "maxlon": batch["maxlon"],
                "maxlat": batch["maxlat"],
                "cells": batch["cells"],
            }
        )

    edges = raw_nodes.map_batches(node_edges, batch_format="pyarrow").union(
        ways.map_batches(way_edges, batch_format="pyarrow")
    )

    def assemble(tbl: pa.Table, rgs: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        n = len(rgs)
        member_id = np.asarray(tbl["member_id"], dtype=np.int64)
        member_type = np.asarray(tbl["member_type"], dtype=np.int64)
        # member lists split by type: encode (segment, type) and re-collect.
        flat_cells, cell_offsets = list_parts(tbl["cells"])
        group_idx = np.repeat(np.arange(n, dtype=np.int64), ends - starts)
        cell_group_idx = np.repeat(group_idx, np.diff(cell_offsets))
        ucells, uoff = segment_unique_lists(cell_group_idx, np.asarray(flat_cells, dtype=np.int64), n)

        def typed_lists(type_code: int) -> pa.ListArray:
            mask = member_type == type_code
            lens = np.add.reduceat(mask.astype(np.int64), starts)
            offs = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lens, out=offs[1:])
            return collect_list_column(member_id[mask], offs[:-1], offs[1:], pa.int64())

        tag_keys, tag_vals = rel_tags_for_groups(rgs)
        return pa.table(
            {
                "id": pa.array(REL_ID_BASE + rgs, type=pa.int64()),
                "node_ids": typed_lists(0),
                "way_ids": typed_lists(1),
                "cells": collect_list_column(ucells, uoff[:-1], uoff[1:], pa.int64()),
                "minlon": pa.array(np.minimum.reduceat(np.asarray(tbl["minlon"]), starts)),
                "minlat": pa.array(np.minimum.reduceat(np.asarray(tbl["minlat"]), starts)),
                "maxlon": pa.array(np.maximum.reduceat(np.asarray(tbl["maxlon"]), starts)),
                "maxlat": pa.array(np.maximum.reduceat(np.asarray(tbl["maxlat"]), starts)),
                "tag_keys_str": tag_keys,
                "tag_vals_str": tag_vals,
            }
        )

    return bucket_collect(edges, "rg", assemble, sort_col="member_id", num_buckets=num_buckets)


def nest_relations(relations: ray.data.Dataset, max_depth: int = 1) -> ray.data.Dataset:
    """Add child/parent relation edges and expand parent bounds/cells.

    The reference relies on members-appearing-before-parents file order
    (``grid_writer.go:94-97``); here parent-child edges are formulaic
    (group g % REL_NEST == 0 parents g+1..g+REL_NEST-1, existence resolved by
    a self semi-join on the relation table) and bbox/cell expansion flows
    child bounds to parents through a keyed shuffle, iterated ``max_depth``
    times — our synthetic graph nests exactly one level, deeper graphs raise
    ``max_depth`` (fully distributed; no driver-side loops).
    """

    def add_cand(batch: pa.Table) -> pa.Table:
        rg = np.asarray(batch["id"], dtype=np.int64) - REL_ID_BASE
        is_parent = rg % REL_NEST == 0
        n = len(rg)
        child_lens = np.where(is_parent, REL_NEST - 1, 0)
        child_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(child_lens, out=child_off[1:])
        # children of parent g are g+1 .. g+REL_NEST-1
        reps = np.repeat(rg[is_parent], REL_NEST - 1) if is_parent.any() else np.array([], dtype=np.int64)
        k = (
            np.tile(np.arange(1, REL_NEST, dtype=np.int64), int(is_parent.sum()))
            if is_parent.any()
            else np.array([], dtype=np.int64)
        )
        flat_children = REL_ID_BASE + reps + k
        parent_lens = np.where(is_parent, 0, 1)
        parent_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(parent_lens, out=parent_off[1:])
        flat_parents = (REL_ID_BASE + rg - rg % REL_NEST)[~is_parent]
        batch = batch.append_column(
            "cand_child_ids", collect_list_column(flat_children, child_off[:-1], child_off[1:], pa.int64())
        )
        return batch.append_column(
            "cand_parent_ids", collect_list_column(flat_parents, parent_off[:-1], parent_off[1:], pa.int64())
        )

    # materialize ONCE, and BEFORE deriving anything: both the candidate
    # pass and sorted_id_array's gather consume the relation table — the r04
    # fix pinned it after with_cand was already derived from the unpinned
    # handle, so the assembly still executed twice (once for the gather,
    # once through with_cand -> resolve)
    relations = relations.materialize()
    with_cand = relations.map_batches(add_cand, batch_format="pyarrow")

    # Existence semi-join: keep candidate ids present in the relation table.
    # Relation ids are 1/NODES_PER_REL of the node count; the id *set* is still
    # compact (int64 array) — broadcast a sorted array and probe with
    # searchsorted (the reference's map-probe, src/query/filter.go:273-331,
    # set-oriented). A partitioned join is the fallback for id sets too big to
    # broadcast; candidate edges are formulaic +-REL_NEST so either works.
    from ..stages.semi_join import filter_list_to_idset, sorted_id_array

    ids_ref = sorted_id_array(relations)

    def resolve(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "child_relation_ids", filter_list_to_idset(batch["cand_child_ids"], ids_ref)
        )
        batch = batch.append_column(
            "parent_relation_ids", filter_list_to_idset(batch["cand_parent_ids"], ids_ref)
        )
        return batch.drop_columns(["cand_child_ids", "cand_parent_ids"])

    resolved = with_cand.map_batches(resolve, batch_format="pyarrow")
    return flow_child_bounds(resolved, max_depth=max_depth)


def flow_child_bounds(
    resolved: ray.data.Dataset, max_depth: int = 1, num_buckets: int = 8
) -> ray.data.Dataset:
    """Bounded fixed-point: child bounds/cells flow up to parents via
    explode -> bucket_collect(parent) -> hash join (same shape as J5).

    ``resolved`` needs parent_relation_ids + minlon..maxlat + cells columns;
    each iteration propagates one nesting level (the reference instead relies
    on members-before-parents file order, ``grid_writer.go:94-97``)."""
    for _ in range(max_depth):
        # materialize per iteration: `resolved` feeds BOTH the edge explode
        # and the join's left side; an unmaterialized lineage would embed
        # twice per level and re-execute 2^max_depth times (r04 review).
        # Coalesce too — the joins re-fragment block counts each level and
        # the next level's shuffles pay per-block cost (group_collect.py)
        from ..stages.group_collect import coalesce_small_blocks

        resolved = coalesce_small_blocks(resolved.materialize())
        child_edges = resolved.map_batches(
            lambda b: _parent_bound_edges(b), batch_format="pyarrow"
        )

        def assemble(tbl: pa.Table, pids: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
            n = len(pids)
            flat_cells, coff = list_parts(tbl["cells"])
            group_idx = np.repeat(np.arange(n, dtype=np.int64), ends - starts)
            cgi = np.repeat(group_idx, np.diff(coff))
            ucells, uoff = segment_unique_lists(cgi, np.asarray(flat_cells, dtype=np.int64), n)
            return pa.table(
                {
                    "parent_id": pa.array(pids, type=pa.int64()),
                    "c_minlon": pa.array(np.minimum.reduceat(np.asarray(tbl["minlon"]), starts)),
                    "c_minlat": pa.array(np.minimum.reduceat(np.asarray(tbl["minlat"]), starts)),
                    "c_maxlon": pa.array(np.maximum.reduceat(np.asarray(tbl["maxlon"]), starts)),
                    "c_maxlat": pa.array(np.maximum.reduceat(np.asarray(tbl["maxlat"]), starts)),
                    "c_cells": collect_list_column(ucells, uoff[:-1], uoff[1:], pa.int64()),
                }
            )

        updates = bucket_collect(child_edges, "parent_id", assemble, num_buckets=num_buckets)
        from ..stages.joins import hash_join_attach

        joined = hash_join_attach(
            resolved,
            "id",
            updates,
            "parent_id",
            {
                "c_minlon": pa.float64(),
                "c_minlat": pa.float64(),
                "c_maxlon": pa.float64(),
                "c_maxlat": pa.float64(),
                "c_cells": pa.list_(pa.int64()),
            },
            num_buckets=num_buckets,
        )
        resolved = joined.map_batches(_apply_parent_updates, batch_format="pyarrow")

    return resolved


def _parent_bound_edges(b: pa.Table) -> pa.Table:
    flat_p, off_p = list_parts(b["parent_relation_ids"])
    reps = np.diff(off_p)
    idx = np.repeat(np.arange(len(reps)), reps)
    take = pa.array(idx)
    sub = b.select(["minlon", "minlat", "maxlon", "maxlat", "cells"]).take(take)
    return sub.append_column("parent_id", pa.array(np.asarray(flat_p, dtype=np.int64)))


_UPDATE_COLS = ["c_minlon", "c_minlat", "c_maxlon", "c_maxlat", "c_cells"]


def _apply_parent_updates(batch: pa.Table) -> pa.Table:
    has = ~np.asarray(pa.compute.is_null(batch["c_minlon"]))
    if not has.any():
        return batch.drop_columns(_UPDATE_COLS)
    for name, cname, fn in (
        ("minlon", "c_minlon", np.fmin),
        ("minlat", "c_minlat", np.fmin),
        ("maxlon", "c_maxlon", np.fmax),
        ("maxlat", "c_maxlat", np.fmax),
    ):
        cur = np.asarray(batch[name], dtype=np.float64)
        upd = np.asarray(batch[cname].combine_chunks().fill_null(np.nan), dtype=np.float64)
        batch = batch.set_column(batch.column_names.index(name), name, pa.array(fn(cur, upd)))
    # merge cell lists: concat then per-row unique
    flat_a, off_a = list_parts(batch["cells"])
    cc = batch["c_cells"].combine_chunks()
    flat_b, off_b = list_parts(nulls_to_empty_list(cc))
    n = len(off_a) - 1
    gi = np.concatenate(
        [
            np.repeat(np.arange(n, dtype=np.int64), np.diff(off_a)),
            np.repeat(np.arange(n, dtype=np.int64), np.diff(off_b)),
        ]
    )
    vals = np.concatenate([np.asarray(flat_a, dtype=np.int64), np.asarray(flat_b, dtype=np.int64)])
    ucells, uoff = segment_unique_lists(gi, vals, n)
    batch = batch.set_column(
        batch.column_names.index("cells"),
        "cells",
        collect_list_column(ucells, uoff[:-1], uoff[1:], pa.int64()),
    )
    return batch.drop_columns(_UPDATE_COLS)



def attach_reverse_membership(
    raw_nodes: ray.data.Dataset,
    ways: ray.data.Dataset,
    relations: ray.data.Dataset,
    num_partitions: int | None = None,
    broadcast_edge_limit: int = 25_000_000,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """node.way_ids / node.relation_ids / way.relation_ids via explode+collect+join.

    Reference J3/J4 (``grid_writer.go:254-330``). Returns (nodes, ways) with
    the reverse lists attached. way.relation_ids already exists formulaically
    on the synthetic ways; it is recomputed here from relation member lists to
    exercise the real path, and overrides the formula column.

    Path choice (broadcast vs shuffle): each edge set is two int64 columns;
    when it fits worker memory (``broadcast_edge_limit`` edges ≈ 16 B each)
    the member table is NOT shuffled — the sorted edge array is broadcast and
    probed map-side (``attach_edges_broadcast``). Bigger edge sets fall back
    to the partitioned hash join with identical semantics. The default gate
    is 25 M edges ≈ 400 MB: the broadcast path gather+lexsorts the whole
    edge set in ONE task, so the gate bounds that task's working set (the
    r03 audit flagged the previous 100 M ≈ 1.6 GB default as a single-task
    straggler at the boundary on a real cluster).
    """
    from ..stages.joins import attach_edges_broadcast

    if num_partitions is None:
        # above-gate fallback parallelism follows the cluster (fixed 16
        # reduce tasks underused a 32-core node; same rule as the import
        # assemblers). Measured at 100 M edges / 32 CPUs: partitioned 26 s
        # (vs broadcast 5.5 s on ONE box — no network; the 25 M-edge gate
        # still bounds the broadcast's single-task gather for real clusters)
        import ray

        num_partitions = max(
            16,
            int(ray.cluster_resources().get("CPU", 16))
            if ray.is_initialized()
            else 16,
        )

    def edge_count(member_ds, list_col):
        # Size the broadcast-vs-shuffle gate WITHOUT executing the explode:
        # sum the list lengths in a single projected scan (offsets only — the
        # flat member values never leave the parquet reader). The explode
        # emits exactly one edge per list element, so the counts agree.
        # (r02 verdict: `edges.count()` here ran the full explode once for
        # the gate and again in the chosen path — 2x the corpus-wide explode
        # and the bench's most expensive stage.)
        def partial(batch: pa.Table) -> pa.Table:
            n = pc.sum(pc.list_value_length(batch[list_col])).as_py() or 0
            return pa.table({"n": pa.array([int(n)], type=pa.int64())})

        total = (
            member_ds.select_columns([list_col])
            .map_batches(partial, batch_format="pyarrow")
            .sum("n")
        )
        return int(total or 0)

    def attach(ds, id_col, member_ds, list_col, edge_key, out_col):
        edges = explode_list(
            member_ds.select_columns(["id", list_col]), list_col, "id",
            out_val="__val", out_key=edge_key,
        )
        if edge_count(member_ds, list_col) <= broadcast_edge_limit:
            return attach_edges_broadcast(ds, id_col, edges, edge_key, "__val", out_col)
        lists = collect_edge_lists(edges, edge_key, "__val", out_col)
        return attach_list_column(
            ds, id_col, lists, edge_key, out_col, num_partitions=num_partitions
        )

    nodes = attach(raw_nodes, "id", ways, "node_ids", "node_id", "way_ids")
    nodes = attach(nodes, "id", relations, "node_ids", "node_id", "relation_ids")
    if "relation_ids" in ways.schema().names:
        ways = ways.drop_columns(["relation_ids"])
    ways2 = attach(ways, "id", relations, "way_ids", "way_id", "relation_ids")
    return nodes, ways2


def _way_assemble_fn():
    """The way-group assemble kernel shared by both shuffle strategies:
    (sorted rows, group keys, segment bounds) -> one way row per group."""

    def assemble(tbl: pa.Table, wgs: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> pa.Table:
        ids = np.asarray(tbl["id"], dtype=np.int64)
        lon = np.asarray(tbl["lon"], dtype=np.float64)
        lat = np.asarray(tbl["lat"], dtype=np.float64)
        cells = np.asarray(tbl["cell"], dtype=np.int64)
        n = len(wgs)
        group_idx = np.repeat(np.arange(n, dtype=np.int64), ends - starts)
        ucells, uoff = segment_unique_lists(group_idx, cells, n)
        tag_keys, tag_vals = way_tags_for_groups(wgs)
        rel_ids = REL_ID_BASE + wgs // WAYS_PER_REL

        def seg_reduce(vals, fn):
            return fn.reduceat(vals, starts)

        return pa.table(
            {
                "id": pa.array(WAY_ID_BASE + wgs, type=pa.int64()),
                "node_ids": collect_list_column(ids, starts, ends, pa.int64()),
                "node_lons": collect_list_column(lon, starts, ends, pa.float64()),
                "node_lats": collect_list_column(lat, starts, ends, pa.float64()),
                "cells": collect_list_column(
                    ucells, uoff[:-1], uoff[1:], pa.int64()
                ),
                "minlon": pa.array(seg_reduce(lon, np.minimum), type=pa.float64()),
                "minlat": pa.array(seg_reduce(lat, np.minimum), type=pa.float64()),
                "maxlon": pa.array(seg_reduce(lon, np.maximum), type=pa.float64()),
                "maxlat": pa.array(seg_reduce(lat, np.maximum), type=pa.float64()),
                "tag_keys_str": tag_keys,
                "tag_vals_str": tag_vals,
                "relation_ids": collect_list_column(
                    rel_ids, np.arange(n), np.arange(1, n + 1), pa.int64()
                ),
            }
        )

    return assemble


def _empty_ways_table() -> pa.Table:
    ls = pa.list_(pa.string())
    lf = pa.list_(pa.float64())
    li = pa.list_(pa.int64())
    return pa.table(
        {
            "id": pa.array([], type=pa.int64()),
            "node_ids": pa.array([], type=li),
            "node_lons": pa.array([], type=lf),
            "node_lats": pa.array([], type=lf),
            "cells": pa.array([], type=li),
            "minlon": pa.array([], type=pa.float64()),
            "minlat": pa.array([], type=pa.float64()),
            "maxlon": pa.array([], type=pa.float64()),
            "maxlat": pa.array([], type=pa.float64()),
            "tag_keys_str": pa.array([], type=ls),
            "tag_vals_str": pa.array([], type=ls),
            "relation_ids": pa.array([], type=li),
        }
    )


def build_ways_local_first(
    raw_nodes: ray.data.Dataset,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """build_ways with MAP-SIDE grouping: a way group whose NODES_PER_WAY
    members all sit in one input block assembles locally without touching
    the exchange; only the residue — groups split across blocks (boundary
    groups, or any input that is not clustered by way) — goes through the
    keyed shuffle. Results are identical to :func:`build_ways` for any
    input (pinned by test); the win scales with input clustering: the bench
    generator emits whole replicas per task, so its residue is empty and
    the headline's dominant all-to-all disappears.

    This is the grouping analogue of a map-side combine: exploit physical
    clustering when present, stay correct when absent. The completeness
    threshold is NODES_PER_WAY — the same constant the group key derives
    from, NOT a parameter: any other value would declare partial groups
    'complete' and emit duplicate way ids (r04 review removed the knob)."""
    expected_group_size = NODES_PER_WAY

    add_wg = _add_wg
    assemble = _way_assemble_fn()

    def local_or_residue(batch: pa.Table) -> pa.Table:
        wg = np.asarray(batch["wg"], dtype=np.int64)
        ids = np.asarray(batch["id"], dtype=np.int64)
        order = np.lexsort((ids, wg))
        tbl = batch.take(pa.array(order))
        wg_s = wg[order]
        new = np.ones(len(wg_s), dtype=bool)
        new[1:] = wg_s[1:] != wg_s[:-1]
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], len(wg_s))
        complete = (ends - starts) == expected_group_size
        sizes_all = ends - starts
        keep = np.repeat(complete, sizes_all)  # row-level complete mask
        comp = None
        res = None
        if complete.any():
            c_starts, c_ends = starts[complete], ends[complete]
            sub = tbl.filter(pa.array(keep))
            sizes = c_ends - c_starts
            s2 = np.zeros(len(sizes), dtype=np.int64)
            np.cumsum(sizes[:-1], out=s2[1:])
            comp = assemble(sub, wg_s[c_starts], s2, s2 + sizes)
        if (~complete).any():
            res = tbl.filter(pa.array(~keep))
        return comp, res

    # ONE local pass per batch: emit assembled way rows and residue node
    # rows in a union schema distinguished by __res (sorting/grouping each
    # batch once — a two-pass variant pays the local work twice), then split
    # downstream: way rows pass through, residue rows take the keyed shuffle.
    way_schema = _empty_ways_table().schema

    def local_pass(batch: pa.Table) -> pa.Table:
        comp, res = local_or_residue(batch)
        parts = []
        if comp is not None:
            t = comp
            for name, typ in (("lon", pa.float64()), ("lat", pa.float64()),
                              ("cell", pa.int64()), ("wg", pa.int64())):
                t = t.append_column("__r_" + name, pa.nulls(len(t), typ))
            parts.append(t.append_column("__res", pa.array(np.zeros(len(t), dtype=np.int8))))
        if res is not None and len(res):
            n = len(res)
            cols = {f.name: pa.nulls(n, f.type) for f in way_schema}
            cols["id"] = res["id"]
            cols["__r_lon"] = res["lon"]
            cols["__r_lat"] = res["lat"]
            cols["__r_cell"] = res["cell"]
            cols["__r_wg"] = res["wg"]
            cols["__res"] = pa.array(np.ones(n, dtype=np.int8))
            parts.append(pa.table(cols))
        if not parts:
            t = _empty_ways_table()
            for name, typ in (("lon", pa.float64()), ("lat", pa.float64()),
                              ("cell", pa.int64()), ("wg", pa.int64())):
                t = t.append_column("__r_" + name, pa.array([], type=typ))
            return t.append_column("__res", pa.array([], type=pa.int8()))
        return pa.concat_tables(parts, promote_options="default")

    mixed = raw_nodes.map_batches(add_wg, batch_format="pyarrow").map_batches(
        local_pass, batch_format="pyarrow"
    )

    def ways_only(batch: pa.Table) -> pa.Table:
        m = pa.compute.equal(batch["__res"], pa.scalar(0, type=pa.int8()))
        return batch.filter(m).select([f.name for f in way_schema])

    def residue_only(batch: pa.Table) -> pa.Table:
        m = pa.compute.equal(batch["__res"], pa.scalar(1, type=pa.int8()))
        sub = batch.filter(m)
        return pa.table(
            {
                "id": sub["id"],
                "lon": sub["__r_lon"],
                "lat": sub["__r_lat"],
                "cell": sub["__r_cell"],
                "wg": sub["__r_wg"],
            }
        )

    mixed = mixed.materialize()
    complete_ds = mixed.map_batches(ways_only, batch_format="pyarrow")
    residue_ways = bucket_collect(
        mixed.map_batches(residue_only, batch_format="pyarrow"),
        "wg", assemble, sort_col="id", num_buckets=num_buckets,
    )
    return complete_ds.union(residue_ways)
