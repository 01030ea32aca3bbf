"""FeatureRepo: the engine's handle to the node/way/relation tables + TagIndex.

Builds (or loads) the full feature graph for an ``sf_dir`` and materializes
the three tables in the object store, mirroring the reference's loaded index
(``GridIndexReader`` + ``TagIndex``, ``/root/reference/src/main.go:90-93``).
A module-level cache keeps one repo per (sf_dir, replicate) so repeated
queries (the driver's correctness harness calls many) reuse the build.
"""

from __future__ import annotations

import ray
import ray.data

from ..pipelines.build_graph import (
    attach_reverse_membership,
    build_relations,
    build_ways,
    nest_relations,
)
from ..pipelines.tag_dictionary import build_tag_index
from ..stages.tag_encode import encode_tags
from ..functions.tags import TagIndex
from ..model import OSM_NODE, OSM_RELATION, OSM_WAY
from .synthetic import raw_nodes


class FeatureRepo:
    def __init__(
        self,
        nodes: ray.data.Dataset,
        ways: ray.data.Dataset,
        relations: ray.data.Dataset,
        tag_index: TagIndex,
        cell_scheme=None,
    ):
        self.nodes = nodes
        self.ways = ways
        self.relations = relations
        self.tag_index = tag_index
        self.tag_index_ref = ray.put(tag_index)
        # the scheme the 'cell' columns were built with (None = default
        # grid); QueryEngine and write_index read it so callers cannot
        # desync build-time and query-time geometry by forgetting to pass
        # the scheme twice
        self.cell_scheme = cell_scheme

    def table(self, object_type: str) -> ray.data.Dataset:
        return {
            OSM_NODE: self.nodes,
            OSM_WAY: self.ways,
            OSM_RELATION: self.relations,
        }[object_type]


_CACHE: dict[tuple[str, int, str], FeatureRepo] = {}


def build_repo(
    sf_dir: str,
    replicate: int = 1,
    materialize: bool = True,
    cell_scheme=None,
    base_tag_index=None,
) -> FeatureRepo:
    """``cell_scheme`` (functions/hiercell.py) overrides the flat-grid cell
    assignment; way/relation cell lists inherit the scheme automatically
    (they are unions of member-node cells)."""
    # cache entries are only valid within the Ray session that created
    # their datasets — after a shutdown/re-init the old object refs have no
    # owner and any consumption fails with "owner is unknown"
    import ray as _ray

    session = _ray.get_runtime_context().get_job_id() if _ray.is_initialized() else None
    # evict entries from dead sessions: their Datasets hold object refs with
    # no owner, and a long-lived process cycling ray.init/shutdown would
    # otherwise accumulate unreachable repos without bound
    for stale in [k for k in _CACHE if k[0] != session]:
        del _CACHE[stale]
    key = (
        session, sf_dir, replicate, materialize,
        cell_scheme.name if cell_scheme else "grid",
    )
    # evolved-dictionary builds (refresh path) bypass the cache: the cache
    # key cannot see the base dictionary's content, and a fresh-dictionary
    # repo encodes differently
    if base_tag_index is None and key in _CACHE:
        return _CACHE[key]

    nodes0 = raw_nodes(sf_dir, replicate)
    if cell_scheme is not None:
        import numpy as np
        import pyarrow as pa

        def recell(batch: pa.Table) -> pa.Table:
            c = cell_scheme.cell_of(
                np.asarray(batch["lon"], dtype=np.float64),
                np.asarray(batch["lat"], dtype=np.float64),
            )
            return batch.set_column(
                batch.column_names.index("cell"), "cell", pa.array(c, type=pa.int64())
            )

        nodes0 = nodes0.map_batches(recell, batch_format="pyarrow")
    if materialize:
        nodes0 = nodes0.materialize()
    # the compact exchange recomputes cells receive-side: hand it the same
    # derivation the cell column was produced with
    ways0 = build_ways(
        nodes0, cell_fn=cell_scheme.cell_of if cell_scheme is not None else None
    )
    if materialize:
        ways0 = ways0.materialize()
    rels0 = nest_relations(build_relations(nodes0, ways0))
    if materialize:
        rels0 = rels0.materialize()

    nodes1, ways1 = attach_reverse_membership(nodes0, ways0, rels0)

    tag_index = build_tag_index(nodes1, ways1, rels0, base=base_tag_index)
    ti_ref = ray.put(tag_index)

    nodes = encode_tags(nodes1, ti_ref)
    ways = encode_tags(ways1, ti_ref)
    rels = encode_tags(rels0, ti_ref)
    if materialize:
        nodes = nodes.materialize()
        ways = ways.materialize()
        rels = rels.materialize()

    repo = FeatureRepo(nodes, ways, rels, tag_index, cell_scheme=cell_scheme)
    if base_tag_index is None:
        _CACHE[key] = repo
    return repo
