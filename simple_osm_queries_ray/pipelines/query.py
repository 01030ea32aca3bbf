"""Query execution: soq AST -> Ray Data plan.

Replaces the reference's per-feature interpreter loop
(``/root/reference/src/query/statement.go:39-70``,
``src/index/grid_reader.go:39-78``) with a set-oriented plan:

1. cell prune: keep features whose cell(s) hit the bbox cell rectangle
   (reference reads exactly those cell files) — vectorized searchsorted;
2. bbox refine: keep features whose geometry bound intersects the bbox
   (``grid_reader.go:180-184``, inclusive bounds as in orb);
3. sub-statements (J1/J2): decorrelated — candidate cells are the union of
   the outer candidates' cells (a superset of the per-feature union the
   reference walks, which cannot change probe results: a related feature is
   always present in its outer feature's own cells by the replication rule),
   the inner filter runs over those cells, matched IDs are broadcast and
   probed against membership lists;
4. filter mask -> result projection. Multi-statement queries union without
   dedup (``src/query/query.go:29-35``).

Divergence (documented): multi-cell ways/relations are stored once with a
``cells`` list instead of being replicated per cell file, so our results are
naturally distinct by id; the reference emits one copy per overlapped cell
file it reads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.segments import list_parts, segment_any
from ..model import (
    OSM_NODE,
    OSM_RELATION,
    OSM_WAY,
    QUERY_CHILD_RELATIONS,
    QUERY_NODES,
    QUERY_RELATIONS,
    QUERY_TYPE_TO_OBJECT_TYPE,
    QUERY_WAYS,
)
from ..parser import BboxLocation, CircleLocation, Query, Statement, parse_query
from ..parser.ast_nodes import and_level_tag_constraints, required_key_indices
from ..sources.repo import FeatureRepo
from ..stages.semi_join import isin_sorted, sorted_id_array, sorted_unique_id_array
from ..stages.tag_filter import eval_filter_mask, find_substatements
from ..state.broadcast import get as bget

def _circle_refine(
    candidates: ray.data.Dataset, circle: "CircleLocation", obj_type: str
) -> ray.data.Dataset:
    """Exact distance refine after the enclosing-bbox prune: nodes by
    point-in-circle, extended features by closest-point-of-bbox distance —
    both in planar degree space (the engine-wide convention)."""
    cx, cy, r = circle.lon, circle.lat, circle.radius_deg
    r2 = r * r
    node_side = obj_type == OSM_NODE

    def refine(batch: pa.Table) -> pa.Table:
        if node_side:
            dx = np.asarray(batch["lon"], dtype=np.float64) - cx
            dy = np.asarray(batch["lat"], dtype=np.float64) - cy
        else:
            dx = np.maximum(
                np.maximum(
                    np.asarray(batch["minlon"], dtype=np.float64) - cx,
                    cx - np.asarray(batch["maxlon"], dtype=np.float64),
                ),
                0.0,
            )
            dy = np.maximum(
                np.maximum(
                    np.asarray(batch["minlat"], dtype=np.float64) - cy,
                    cy - np.asarray(batch["maxlat"], dtype=np.float64),
                ),
                0.0,
            )
        return batch.filter(pa.array(dx * dx + dy * dy <= r2))

    return candidates.map_batches(refine, batch_format="pyarrow")


def _filter_uses_tags(expr) -> bool:
    """True when the filter (EXCLUDING sub-statement interiors, which read
    their own tables) tests tag values or key presence — only then do the
    tag_keys/tag_vals list columns need to leave the parquet reader."""
    from ..parser.ast_nodes import (
        KeyFilter,
        LogicalFilter,
        NegatedFilter,
        SubStatementFilter,
        TagFilter,
    )

    if isinstance(expr, (TagFilter, KeyFilter)):
        return True
    if isinstance(expr, LogicalFilter):
        return _filter_uses_tags(expr.a) or _filter_uses_tags(expr.b)
    if isinstance(expr, NegatedFilter):
        return _filter_uses_tags(expr.base)
    if isinstance(expr, SubStatementFilter):
        return False
    return False


# membership column of the OUTER feature probed for a given inner query type
# (reference filter.go:265-331; invalid combinations error there too)
_MEMBERSHIP = {
    (OSM_NODE, QUERY_WAYS): "way_ids",
    (OSM_NODE, QUERY_RELATIONS): "relation_ids",
    (OSM_WAY, QUERY_NODES): "node_ids",
    (OSM_WAY, QUERY_RELATIONS): "relation_ids",
    (OSM_RELATION, QUERY_NODES): "node_ids",
    (OSM_RELATION, QUERY_WAYS): "way_ids",
    (OSM_RELATION, QUERY_RELATIONS): "parent_relation_ids",
    (OSM_RELATION, QUERY_CHILD_RELATIONS): "child_relation_ids",
}


class QueryEngine:
    #: matched-ID sets up to this size are broadcast (``ray.put`` of a sorted
    #: int64 array, ~8 B/id -> 80 MB at the default) and probed map-side;
    #: bigger sets route through the partitioned hash-join fallback in
    #: :meth:`_attach_probe_flag` — same semantics, one more shuffle, no
    #: driver/worker materialization of the id set. Sizing rationale (r03
    #: audit): the broadcast array lives once per NODE in plasma (zero-copy
    #: mapped by every probe task), but the gather+sort task and the
    #: driver-side ``ray.put`` hold ~2x transiently and every query with k
    #: probe sub-statements pins k arrays — 10 M ids keeps the worst case
    #: under ~200 MB/node on a 1-2 GB object-store-per-node budget, while
    #: the fallback's extra exchange only costs ~1 s at this cardinality
    #: (bench: attach-probe at 10 M edges). Override per-engine when the
    #: cluster's object store is known to be larger.
    BROADCAST_ID_LIMIT = 10_000_000

    def __init__(self, repo: FeatureRepo, cell_scheme=None, broadcast_id_limit: int | None = None):
        """``cell_scheme`` must match the scheme the repo's 'cell' columns
        were built with (default: the reference's flat grid). A hierarchical
        QuadCellScheme (functions/hiercell.py) plugs in here — the rest of
        the plan operates on opaque int64 cell ids."""
        from ..functions.hiercell import GridCellScheme

        self.repo = repo
        # precedence: explicit arg > the scheme persisted with a written
        # index (DiskRepo loads scheme.json) > the reference's default grid
        self.cell_scheme = (
            cell_scheme or getattr(repo, "cell_scheme", None) or GridCellScheme()
        )
        self.broadcast_id_limit = (
            self.BROADCAST_ID_LIMIT if broadcast_id_limit is None else broadcast_id_limit
        )

    # -- public API -------------------------------------------------------
    def execute_string(self, text: str) -> ray.data.Dataset:
        return self.execute(parse_query(text, self.repo.tag_index))

    def explain_string(self, text: str) -> list[dict]:
        """Plan inspection without execution: per statement, the candidate
        cell count, required tag keys, and — for a DiskRepo — how many
        partitions the cell pruning and the zone-map pruning each leave.
        The observability face of the planner (which pruning fired and why),
        cheap enough to serve from the HTTP API."""
        out = []
        for stmt in parse_query(text, self.repo.tag_index).statements:
            obj_type = QUERY_TYPE_TO_OBJECT_TYPE[stmt.query_type]
            loc = stmt.location
            if isinstance(loc, CircleLocation):
                # same normalization execute_statement applies: a circle
                # plans as its enclosing bbox + an exact refine
                loc = loc.enclosing_bbox()
            cells = np.sort(
                self.cell_scheme.cells_for_bbox(loc.minlon, loc.minlat, loc.maxlon, loc.maxlat)
            )
            req = sorted(required_key_indices(stmt.filter))
            info = {
                "object_type": obj_type,
                "n_candidate_cells": int(len(cells)),
                "required_key_indices": req,
                "required_keys": [self.repo.tag_index.key_string(k) for k in req],
                "n_substatements": len(find_substatements(stmt.filter)),
            }
            if hasattr(self.repo, "pids_for"):
                info["n_partitions_total"] = int(self.repo.plan.num_partitions)
                info["n_partitions_after_cells"] = len(self.repo.pids_for(obj_type, cells))
                info["n_partitions_after_zonemap"] = len(
                    self.repo.pids_for(
                        obj_type, cells, required_keys=req,
                        ranges=and_level_tag_constraints(stmt.filter),
                    )
                )
            out.append(info)
        return out

    def execute(self, query: Query) -> ray.data.Dataset:
        if not query.statements:
            from ..parser import ParseError

            raise ParseError(
                "query contains no statements (empty or comment-only input)"
            )
        results = [self.execute_statement(s) for s in query.statements]
        otypes = {QUERY_TYPE_TO_OBJECT_TYPE[s.query_type] for s in query.statements}
        if len(otypes) > 1:
            # mixed-type multi-statement query (reference query.go:29-35
            # concatenates feature sets): node projections (id, lon, lat)
            # and extended projections (id, minlon..maxlat) have different
            # schemas, and a raw union of mismatched block schemas breaks
            # downstream consumption — normalize every statement to the
            # common bbox-envelope form (a node's envelope is degenerate)
            def envelope(node_side: bool):
                def fn(b: pa.Table) -> pa.Table:
                    if node_side:
                        lon, lat = b["lon"], b["lat"]
                        return pa.table(
                            {"id": b["id"], "minlon": lon, "minlat": lat,
                             "maxlon": lon, "maxlat": lat}
                        )
                    return b.select(["id", "minlon", "minlat", "maxlon", "maxlat"])

                return fn

            results = [
                r.map_batches(
                    envelope(QUERY_TYPE_TO_OBJECT_TYPE[s.query_type] == OSM_NODE),
                    batch_format="pyarrow",
                )
                for r, s in zip(results, query.statements)
            ]
        out = results[0]
        for r in results[1:]:
            out = out.union(r)
        return out

    def _table(
        self,
        obj_type: str,
        cells: np.ndarray | None = None,
        required_keys=None,
        ranges=None,
        columns=None,
    ) -> ray.data.Dataset:
        """Cell-pruned read when the repo supports it (DiskRepo reads only the
        partitions covering ``cells``), additionally zone-map-pruned by the
        filter's REQUIRED tag keys (build_index.build_zonemap) and
        column-pruned to the statement's referenced columns (projection
        pushdown into ``read_parquet``); in-memory repos scan and filter."""
        try:
            return self.repo.table(
                obj_type, cells=cells, required_keys=required_keys, ranges=ranges,
                columns=columns,
            )
        except TypeError:
            return self.repo.table(obj_type)

    def _stmt_columns(self, stmt: Statement, obj_type: str, extra: tuple = ()) -> list[str]:
        """Columns the statement's plan actually touches: prune/bbox/geometry
        base, tag lists only when the filter tests tags, one membership list
        per sub-statement probe. Fed to ``read_parquet(columns=...)`` so a
        tag-only query never lifts payload or unused membership columns off
        disk (r02 verdict #9)."""
        cols = (
            ["id", "lon", "lat", "cell"]
            if obj_type == OSM_NODE
            else ["id", "minlon", "minlat", "maxlon", "maxlat", "cells"]
        )
        if _filter_uses_tags(stmt.filter):
            cols += ["tag_keys", "tag_vals"]
        for _path, sub in find_substatements(stmt.filter):
            inner = sub.statement
            if getattr(inner.location, "buffer_deg", None) is not None:
                if obj_type == OSM_WAY:
                    # way-outer buffer probes feed the polyline to the
                    # segment-distance kernels
                    for c in ("node_lons", "node_lats"):
                        if c not in cols:
                            cols.append(c)
                elif obj_type == OSM_RELATION:
                    # relation-outer buffer probes rebuild member geometry
                    # from the membership lists (see _buffer_matched_outer_ids)
                    for c in ("node_ids", "way_ids"):
                        if c not in cols:
                            cols.append(c)
                continue
            col = _MEMBERSHIP.get((obj_type, inner.query_type))
            if col and col not in cols:
                cols.append(col)
        for c in extra:
            if c not in cols:
                cols.append(c)
        return cols

    # -- statement plan ---------------------------------------------------
    def execute_statement(self, stmt: Statement, project: bool = True) -> ray.data.Dataset:
        circle = None
        if isinstance(stmt.location, CircleLocation):
            # circle plans as its enclosing bbox (cell pruning + every
            # downstream consumer unchanged) + one exact distance refine
            import dataclasses

            circle = stmt.location
            stmt = dataclasses.replace(stmt, location=circle.enclosing_bbox())
        if not isinstance(stmt.location, BboxLocation):
            raise ValueError("Top-level statements need a bbox or circle location")
        obj_type = QUERY_TYPE_TO_OBJECT_TYPE[stmt.query_type]
        if stmt.query_type == QUERY_CHILD_RELATIONS:
            raise ValueError("child_relations is only valid inside sub-statements")

        # GeoJSON consumers (project=False) need every column; projected
        # queries push the statement's referenced columns into the read
        columns = self._stmt_columns(stmt, obj_type) if project else None
        candidates = self._bbox_candidates(
            stmt.location, obj_type, required_key_indices(stmt.filter),
            and_level_tag_constraints(stmt.filter), columns=columns,
        )
        if circle is not None:
            candidates = _circle_refine(candidates, circle, obj_type)
        candidates, probes = self._resolve_substatements(stmt, candidates, obj_type)
        filt = stmt.filter

        def apply_filter(batch: pa.Table) -> pa.Table:
            mask = eval_filter_mask(filt, batch, probes)
            return batch.filter(pa.array(mask))

        result = candidates.map_batches(apply_filter, batch_format="pyarrow")
        return self._project(result, obj_type) if project else result

    # -- helpers ----------------------------------------------------------
    def _bbox_candidates(
        self, loc: BboxLocation, obj_type: str, required_keys=None, ranges=None,
        columns=None,
    ) -> ray.data.Dataset:
        cellset = np.sort(
            self.cell_scheme.cells_for_bbox(loc.minlon, loc.minlat, loc.maxlon, loc.maxlat)
        )
        cells_ref = ray.put(cellset)
        bbox = (loc.minlon, loc.minlat, loc.maxlon, loc.maxlat)
        ds = self._table(obj_type, cellset, required_keys, ranges, columns=columns)

        if obj_type == OSM_NODE:

            def prune(batch: pa.Table) -> pa.Table:
                cs = bget(cells_ref)
                in_cells = isin_sorted(np.asarray(batch["cell"], dtype=np.int64), cs)
                lon = np.asarray(batch["lon"], dtype=np.float64)
                lat = np.asarray(batch["lat"], dtype=np.float64)
                inside = (
                    (lon >= bbox[0]) & (lon <= bbox[2]) & (lat >= bbox[1]) & (lat <= bbox[3])
                )
                return batch.filter(pa.array(in_cells & inside))

        else:

            def prune(batch: pa.Table) -> pa.Table:
                cs = bget(cells_ref)
                flat, offsets = list_parts(batch["cells"])
                hit = isin_sorted(np.asarray(flat, dtype=np.int64), cs)
                in_cells = segment_any(hit, offsets)
                intersects = (
                    (np.asarray(batch["minlon"]) <= bbox[2])
                    & (np.asarray(batch["maxlon"]) >= bbox[0])
                    & (np.asarray(batch["minlat"]) <= bbox[3])
                    & (np.asarray(batch["maxlat"]) >= bbox[1])
                )
                return batch.filter(pa.array(in_cells & intersects))

        return ds.map_batches(prune, batch_format="pyarrow")

    def _resolve_substatements(
        self, stmt: Statement, candidates: ray.data.Dataset, obj_type: str
    ) -> tuple[ray.data.Dataset, dict[tuple, tuple[str, object]]]:
        """Resolve each sub-statement to a probe the per-batch filter can
        evaluate. Returns ``(candidates, probes)`` — candidates may gain
        attached ``__probe_N`` flag columns when a matched-ID set exceeds
        ``broadcast_id_limit`` and the partitioned fallback runs."""
        subs = find_substatements(stmt.filter)
        if not subs:
            return candidates, {}
        # materialize once: _distinct_cells_ref consumes every candidate
        # batch to collect the cell set, and the downstream filter (plus a
        # possible _attach_probe_flag) re-reads the same lineage — without
        # this the pruned read + bbox filter, the most expensive stage of a
        # sub-statement query, executes twice
        candidates = candidates.materialize()
        # all sub-statements share the same outer candidate cell set
        cells_needed_ref = self._distinct_cells_ref(candidates, obj_type)
        probes: dict[tuple, tuple[str, object]] = {}
        n_flags = 0
        for path, sub in subs:
            inner_stmt = sub.statement
            buf = getattr(inner_stmt.location, "buffer_deg", None)
            if buf is not None:
                ids_ref = self._buffer_matched_outer_ids(
                    inner_stmt, candidates, obj_type, buf, cells_needed_ref,
                    outer_loc=stmt.location,
                )
                probes[path] = ("@id", ids_ref)
                continue
            col = _MEMBERSHIP.get((obj_type, inner_stmt.query_type))
            if col is None:
                raise ValueError(
                    f"Invalid query type {inner_stmt.query_type} requested for {obj_type} "
                    "in sub-statement expression"
                )
            # one execution of the inner plan: the id projection is
            # materialized (distributed, spillable), the gate count is then
            # free, and BOTH paths reuse it (the broadcast previously re-ran
            # the whole inner pipeline to collect ids)
            matched_ids = self._matched_features(
                inner_stmt, cells_needed_ref
            ).select_columns(["id"]).materialize()
            if matched_ids.count() <= self.broadcast_id_limit:
                probes[path] = (col, sorted_id_array(matched_ids))
            else:
                flag_col = f"__probe_{n_flags}"
                n_flags += 1
                candidates = self._attach_probe_flag(candidates, col, matched_ids, flag_col)
                probes[path] = ("@flag", flag_col)
        return candidates, probes

    def _attach_probe_flag(
        self,
        candidates: ray.data.Dataset,
        member_col: str,
        matched_ids: ray.data.Dataset,
        flag_col: str,
        num_partitions: int = 64,
    ) -> ray.data.Dataset:
        """Partitioned semi-join for matched-ID sets too big to broadcast:
        explode the outer membership lists to (member, outer) edges, inner-
        join the edges against the matched ids (hash-bucketed — no driver or
        whole-worker materialization), dedup hit outer ids, and left-join a
        flag column back onto the candidates. ``eval_filter_mask`` reads the
        flag's validity instead of probing a broadcast array, so NOT/OR
        compositions behave identically to the broadcast path."""
        from ..stages.joins import explode_list, hash_join_attach

        candidates = candidates.materialize()  # read by 2 plans below
        edges = explode_list(
            candidates.select_columns(["id", member_col]), member_col, "id",
            out_val="__outer", out_key="__member",
        )
        flagged = matched_ids.map_batches(
            lambda b: pa.table(
                {"id": b["id"], "__m": pa.array(np.ones(len(b), dtype=np.int8))}
            ),
            batch_format="pyarrow",
        )
        hit_edges = hash_join_attach(
            edges, "__member", flagged, "id", {"__m": pa.int8()},
            num_buckets=num_partitions,
        ).filter(expr="__m == 1")

        def batch_distinct(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"__outer": np.unique(np.asarray(batch["__outer"], dtype=np.int64))}
            )

        from ..stages.group_collect import bucketed_distinct

        # hit-outer cardinality is corpus-scaled in exactly the regime this
        # fallback exists for (> broadcast_id_limit matches) — dedup through
        # the bucketed reduce, not the generic per-group aggregate
        hits = bucketed_distinct(
            hit_edges.map_batches(batch_distinct, batch_format="pyarrow"),
            ["__outer"],
            num_buckets=num_partitions,
        ).map_batches(
            lambda b: pa.table(
                {
                    "__outer": b["__outer"],
                    flag_col: pa.array(np.ones(len(b), dtype=np.int8)),
                }
            ),
            batch_format="pyarrow",
        )
        return hash_join_attach(
            candidates, "id", hits, "__outer", {flag_col: pa.int8()},
            num_buckets=num_partitions,
        )

    def _buffer_matched_outer_ids(
        self,
        inner_stmt: Statement,
        candidates: ray.data.Dataset,
        obj_type: str,
        eps: float,
        cells_needed_ref,
        outer_loc=None,
    ) -> "ray.ObjectRef":
        """``this.buffer(r)`` probe (the reference's planned location
        modifier, README.md:155-181): outer ids with at least one inner
        feature matching the sub-filter within planar distance ``eps`` —
        a spatial semi-join instead of the membership probe.

        Pruning soundness differs by inner type. Inner NODES within eps of
        an outer feature have home cells within ceil(eps/cell) rings of the
        outer cells, so the read prunes on the eps-EXPANDED outer cell set.
        Inner WAYS must NOT be cell-pruned that way: a way's cell list holds
        member-NODE home cells only, while a long segment passes within eps
        of cells containing neither endpoint — instead ways prefilter on
        bbox-intersect with the outer statement's bbox expanded by eps
        (sound: a way within eps of an outer candidate has a bbox meeting
        that box), falling back to a full way scan when the outer location
        is itself context-aware. The join is the bucketed
        single-meeting-cell machinery of
        :func:`~..stages.geo.node_way_buffer_join` /
        :func:`~..stages.geo.node_node_buffer_join`."""
        from ..stages.geo import (
            node_node_buffer_join,
            node_way_buffer_join,
            way_way_buffer_join,
        )

        if obj_type == OSM_NODE:
            outer_geom = candidates.select_columns(["id", "lon", "lat"])
            if inner_stmt.query_type == QUERY_WAYS:
                bbox = None
                if isinstance(outer_loc, BboxLocation):
                    bbox = (
                        outer_loc.minlon - eps, outer_loc.minlat - eps,
                        outer_loc.maxlon + eps, outer_loc.maxlat + eps,
                    )
                matched = self._matched_features(
                    inner_stmt, None, bbox_intersect=bbox,
                    extra_columns=("node_lons", "node_lats"),
                )
                pairs = node_way_buffer_join(outer_geom, matched, eps=eps)
            elif inner_stmt.query_type == QUERY_NODES:
                expanded_ref = ray.put(
                    self.cell_scheme.expand_cells(ray.get(cells_needed_ref), eps)
                )
                matched = self._matched_features(inner_stmt, expanded_ref)
                pairs = node_node_buffer_join(outer_geom, matched, eps=eps)
            else:
                raise ValueError(
                    f"this.buffer(...) supports .nodes/.ways sub-statements, got "
                    f"{inner_stmt.query_type}"
                )
            return sorted_unique_id_array(pairs, "node_id")

        if obj_type == OSM_WAY:
            # WAY outer (round 3; the reference's planned type-generic buffer,
            # README.md:163-183, which it never built). Inner pruning must be
            # geometry-independent of the outer CELLS (a way's cell list holds
            # member-node home cells only): the sound prefilter is the outer
            # candidates' aggregated bbox expanded by eps — a qualifying inner
            # feature lies within eps of some candidate polyline, hence inside
            # that box.
            outer_geom = candidates.select_columns(
                ["id", "node_lons", "node_lats", "minlon", "minlat", "maxlon", "maxlat"]
            ).materialize()
            gbox = self._global_bbox(outer_geom)
            expanded = (
                (gbox[0] - eps, gbox[1] - eps, gbox[2] + eps, gbox[3] + eps)
                if gbox is not None
                else None
            )
            if inner_stmt.query_type == QUERY_NODES:
                matched = self._matched_features(inner_stmt, None, bbox_intersect=expanded)
                pairs = node_way_buffer_join(matched, outer_geom, eps=eps)
                return sorted_unique_id_array(pairs, "way_id")
            if inner_stmt.query_type == QUERY_WAYS:
                matched = self._matched_features(
                    inner_stmt, None, bbox_intersect=expanded,
                    extra_columns=("node_lons", "node_lats"),
                )
                pairs = way_way_buffer_join(outer_geom, matched, eps=eps)

                # a way is within 0 of itself: drop self-pairs so an outer
                # way that itself matches the inner filter does not qualify
                # trivially (same semantics as the node-node kernel's
                # equal-id exclusion; relation outers keep self-pairs
                # because their a_id is a relation id)
                def _drop_self(b: pa.Table) -> pa.Table:
                    a = np.asarray(b["a_id"], dtype=np.int64)
                    bb = np.asarray(b["b_id"], dtype=np.int64)
                    return b.filter(pa.array(a != bb))

                pairs = pairs.map_batches(_drop_self, batch_format="pyarrow")
                return sorted_unique_id_array(pairs, "a_id")
            raise ValueError(
                f"this.buffer(...) supports .nodes/.ways sub-statements, got "
                f"{inner_stmt.query_type}"
            )

        if obj_type == OSM_RELATION:
            # RELATION outer (round 3): relations carry no geometry of their
            # own, so — exactly like the reference's relation bbox, which is
            # the union over member bounds (grid_writer.go:94-106) — the
            # buffered distance is taken to the union of DIRECT member
            # geometries: member-node points and member-way polylines.
            # Implementation: explode the membership lists to (member, rel)
            # edges, attach member geometry via partitioned hash joins, and
            # run the same bucketed pair kernels as the node/way outers with
            # the member's id REPLACED by the owning relation id, so pairs
            # carry relation ids directly (the node-node kernel runs with
            # exclude_equal_ids=False — relation and node id spaces may
            # collide numerically on raw OSM imports, and such a pair is
            # two distinct objects, not a self-pair).
            # Member reads prune on the outer candidates' cell set — sound
            # because a relation's cell list is the union over member cells.
            from ..stages.joins import explode_list, hash_join_attach

            candidates = candidates.materialize()  # feeds 2 member plans
            gbox = self._global_bbox(candidates)
            expanded = (
                (gbox[0] - eps, gbox[1] - eps, gbox[2] + eps, gbox[3] + eps)
                if gbox is not None
                else None
            )
            cells = ray.get(cells_needed_ref)
            f8 = pa.float64()
            lf = pa.list_(f8)

            def _as_geom(keep_cols):
                def fn(batch: pa.Table) -> pa.Table:
                    batch = batch.filter(pc.is_valid(batch[keep_cols[-1]]))
                    arrays = [batch["__rel"]] + [batch[c] for c in keep_cols]
                    return pa.Table.from_arrays(arrays, names=["id"] + keep_cols)

                return fn

            member_pts = hash_join_attach(
                explode_list(
                    candidates.select_columns(["id", "node_ids"]),
                    "node_ids", "id", out_val="__rel", out_key="__member",
                ),
                "__member",
                self._table(OSM_NODE, cells=cells, columns=["id", "lon", "lat"]),
                "id",
                {"lon": f8, "lat": f8},
            ).map_batches(_as_geom(["lon", "lat"]), batch_format="pyarrow")

            way_geo_cols = [
                "node_lons", "node_lats", "minlon", "minlat", "maxlon", "maxlat",
            ]
            member_ways = hash_join_attach(
                explode_list(
                    candidates.select_columns(["id", "way_ids"]),
                    "way_ids", "id", out_val="__rel", out_key="__member",
                ),
                "__member",
                self._table(OSM_WAY, cells=cells, columns=["id"] + way_geo_cols),
                "id",
                {c: (lf if c.startswith("node_") else f8) for c in way_geo_cols},
            ).map_batches(_as_geom(way_geo_cols), batch_format="pyarrow")

            if inner_stmt.query_type == QUERY_NODES:
                matched = self._matched_features(
                    inner_stmt, None, bbox_intersect=expanded
                )
                # exclude_equal_ids=False: member_pts carry RELATION ids —
                # a relation id numerically equal to an inner node id (raw
                # OSM imports keep per-type id spaces) is a different
                # object, not a self-pair
                p_nodes = node_node_buffer_join(
                    member_pts, matched, eps=eps, exclude_equal_ids=False
                )
                p_ways = node_way_buffer_join(matched, member_ways, eps=eps)
                hits = p_nodes.select_columns(["node_id"]).union(
                    p_ways.select_columns(["way_id"]).rename_columns(
                        {"way_id": "node_id"}
                    )
                )
                return sorted_unique_id_array(hits, "node_id")
            if inner_stmt.query_type == QUERY_WAYS:
                matched = self._matched_features(
                    inner_stmt, None, bbox_intersect=expanded,
                    extra_columns=("node_lons", "node_lats"),
                )
                p_nodes = node_way_buffer_join(member_pts, matched, eps=eps)
                # member-way probe keyed on the WAY's own id, not the owning
                # relation id: way_way_buffer_join attaches geometry through
                # a one-row-per-key join, and a relation's several member
                # ways sharing its id would all get the FIRST member's
                # polyline (a false negative when only a later member is
                # within eps — latent until the join's contract check, r04).
                # Hit way ids then map back to owning relations via the
                # membership edges.
                from ..stages.semi_join import probe_scalar

                edges_w = explode_list(
                    candidates.select_columns(["id", "way_ids"]),
                    "way_ids", "id", out_val="__rel", out_key="__member",
                ).materialize()
                mem_ids_ref = sorted_unique_id_array(edges_w, "__member")

                def keep_members(b: pa.Table) -> pa.Table:
                    keep = probe_scalar(
                        np.asarray(b["id"], dtype=np.int64), mem_ids_ref
                    )
                    return b.filter(pa.array(keep))

                mw_geo = self._table(
                    OSM_WAY, cells=cells, columns=["id"] + way_geo_cols
                ).map_batches(keep_members, batch_format="pyarrow")
                p_ways = way_way_buffer_join(mw_geo, matched, eps=eps)
                hit_ways_ref = sorted_unique_id_array(p_ways, "a_id")

                def rels_of_hit_ways(b: pa.Table) -> pa.Table:
                    hit = probe_scalar(
                        np.asarray(b["__member"], dtype=np.int64), hit_ways_ref
                    )
                    return pa.table({"rel": b["__rel"].filter(pa.array(hit))})

                rel_hits = edges_w.map_batches(
                    rels_of_hit_ways, batch_format="pyarrow"
                )
                hits = p_nodes.select_columns(["node_id"]).union(
                    rel_hits.rename_columns({"rel": "node_id"})
                )
                return sorted_unique_id_array(hits, "node_id")
            raise ValueError(
                f"this.buffer(...) supports .nodes/.ways sub-statements, got "
                f"{inner_stmt.query_type}"
            )

        raise ValueError(
            "this.buffer(...) sub-statements are supported for node, way and "
            f"relation outer statements (got {obj_type})"
        )

    def _global_bbox(self, ds: ray.data.Dataset):
        """(minlon, minlat, maxlon, maxlat) over a bounded-feature dataset;
        None when empty. One streaming aggregate — 4 scalars to the driver."""
        from ray.data.aggregate import Max, Min

        row = ds.aggregate(
            Min("minlon"), Min("minlat"), Max("maxlon"), Max("maxlat")
        )
        if not row or row.get("min(minlon)") is None:
            return None
        return (
            float(row["min(minlon)"]),
            float(row["min(minlat)"]),
            float(row["max(maxlon)"]),
            float(row["max(maxlat)"]),
        )

    def _matched_features(
        self, inner_stmt: Statement, cells_needed_ref, bbox_intersect=None,
        extra_columns: tuple = (),
    ) -> ray.data.Dataset:
        """Inner features passing the sub-statement's filter.
        ``cells_needed_ref`` (broadcast sorted cell array) prunes by cell
        membership; ``None`` skips cell pruning (buffered way probes, where
        member-node cells under-cover the polyline). ``bbox_intersect``
        additionally prefilters ways/relations whose bbox meets the given
        (minlon, minlat, maxlon, maxlat)."""
        inner_obj = QUERY_TYPE_TO_OBJECT_TYPE[inner_stmt.query_type]
        inner_ds = self._table(
            inner_obj,
            ray.get(cells_needed_ref) if cells_needed_ref is not None else None,
            required_key_indices(inner_stmt.filter),
            and_level_tag_constraints(inner_stmt.filter),
            columns=self._stmt_columns(inner_stmt, inner_obj, extra=extra_columns),
        )

        if cells_needed_ref is None:
            prune = None
        elif inner_obj == OSM_NODE:

            def prune(batch: pa.Table) -> pa.Table:
                cs = bget(cells_needed_ref)
                mask = isin_sorted(np.asarray(batch["cell"], dtype=np.int64), cs)
                return batch.filter(pa.array(mask))

        else:

            def prune(batch: pa.Table) -> pa.Table:
                cs = bget(cells_needed_ref)
                flat, offsets = list_parts(batch["cells"])
                hit = isin_sorted(np.asarray(flat, dtype=np.int64), cs)
                return batch.filter(pa.array(segment_any(hit, offsets)))

        inner_candidates = (
            inner_ds.map_batches(prune, batch_format="pyarrow") if prune else inner_ds
        )
        if bbox_intersect is not None:
            bb = bbox_intersect

            if inner_obj == OSM_NODE:

                def bbox_pre(batch: pa.Table) -> pa.Table:
                    lon = np.asarray(batch["lon"], dtype=np.float64)
                    lat = np.asarray(batch["lat"], dtype=np.float64)
                    keep = (lon >= bb[0]) & (lon <= bb[2]) & (lat >= bb[1]) & (lat <= bb[3])
                    return batch.filter(pa.array(keep))

            else:

                def bbox_pre(batch: pa.Table) -> pa.Table:
                    keep = (
                        (np.asarray(batch["minlon"], dtype=np.float64) <= bb[2])
                        & (np.asarray(batch["maxlon"], dtype=np.float64) >= bb[0])
                        & (np.asarray(batch["minlat"], dtype=np.float64) <= bb[3])
                        & (np.asarray(batch["maxlat"], dtype=np.float64) >= bb[1])
                    )
                    return batch.filter(pa.array(keep))

            inner_candidates = inner_candidates.map_batches(bbox_pre, batch_format="pyarrow")
        # nested `this` inside the inner filter: context switches to the inner
        # feature (filter.go:193-196) — recurse with the inner candidates
        inner_candidates, probes = self._resolve_substatements(
            inner_stmt, inner_candidates, inner_obj
        )
        filt = inner_stmt.filter

        def apply_filter(batch: pa.Table) -> pa.Table:
            mask = eval_filter_mask(filt, batch, probes)
            return batch.filter(pa.array(mask))

        return inner_candidates.map_batches(apply_filter, batch_format="pyarrow")

    def _distinct_cells_ref(self, candidates: ray.data.Dataset, obj_type: str) -> "ray.ObjectRef":
        if obj_type == OSM_NODE:

            def cells_of(batch: pa.Table) -> pa.Table:
                return pa.table({"cell": np.unique(np.asarray(batch["cell"], dtype=np.int64))})

        else:

            def cells_of(batch: pa.Table) -> pa.Table:
                flat, _ = list_parts(batch["cells"])
                return pa.table({"cell": np.unique(np.asarray(flat, dtype=np.int64))})

        parts = [
            np.asarray(b["cell"], dtype=np.int64)
            for b in candidates.map_batches(cells_of, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        ]
        cells = (
            np.unique(np.concatenate(parts)) if parts else np.array([], dtype=np.int64)
        )
        return ray.put(cells)

    @staticmethod
    def _project(ds: ray.data.Dataset, obj_type: str) -> ray.data.Dataset:
        cols = (
            ["id", "lon", "lat"]
            if obj_type == OSM_NODE
            else ["id", "minlon", "minlat", "maxlon", "maxlat"]
        )
        return ds.select_columns(cols)
