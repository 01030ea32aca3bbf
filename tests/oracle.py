"""Brute-force Python oracle: independent, naive implementation of the
synthetic feature graph and soq query semantics, evaluated row-by-row over
pandas frames. Engine results must match these ID sets exactly
(SURVEY.md section 5 test strategy)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from simple_osm_queries_ray.model import (
    CELL_PACK,
    NODES_PER_REL,
    NODES_PER_WAY,
    REL_ID_BASE,
    REL_NEST,
    WAY_ID_BASE,
    WAYS_PER_REL,
)
from simple_osm_queries_ray.sources.synthetic import (
    H1_MUL,
    H2_ADD,
    H2_MUL,
    H_MOD,
    RTYPE_VALUES,
    WTYPE_VALUES,
)


def cell_of(lon: float, lat: float) -> int:
    return math.floor(lon / 0.1) * CELL_PACK + math.floor(lat / 0.1)


def build_oracle_graph(sf_dir: str):
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    nodes = []
    for _, row in docs.iterrows():
        i = int(row.doc_id)
        h1 = (i * H1_MUL) % H_MOD
        h2 = (i * H2_MUL + H2_ADD) % H_MOD
        if i % 10 < 3:
            lon = 9.9 + (h1 % 1000) * 0.0001
            lat = 53.5 + (h2 % 1000) * 0.0001
        else:
            lon = 9.0 + (h1 % 2000) * 0.001
            lat = 53.0 + (h2 % 2000) * 0.001
        nodes.append(
            {
                "id": i,
                "lon": lon,
                "lat": lat,
                "cell": cell_of(lon, lat),
                "tags": {"lang": row.lang, "source": row.source, "n_chars": str(row.n_chars)},
                "way_ids": [WAY_ID_BASE + i // NODES_PER_WAY],
                "relation_ids": [REL_ID_BASE + i // NODES_PER_REL] if i % NODES_PER_REL < 3 else [],
            }
        )
    nodes_df = pd.DataFrame(nodes)

    ways = {}
    for n in nodes:
        wg = n["id"] // NODES_PER_WAY
        w = ways.setdefault(
            wg,
            {
                "id": WAY_ID_BASE + wg,
                "node_ids": [],
                "lons": [],
                "lats": [],
                "cells": set(),
                "tags": (
                    {"wtype": WTYPE_VALUES[wg % 3], "bridge": "yes"}
                    if wg % 7 == 0
                    else {"wtype": WTYPE_VALUES[wg % 3]}
                ),
                "relation_ids": [REL_ID_BASE + wg // WAYS_PER_REL],
            },
        )
        w["node_ids"].append(n["id"])
        w["lons"].append(n["lon"])
        w["lats"].append(n["lat"])
        w["cells"].add(n["cell"])
    for w in ways.values():
        order = np.argsort(w["node_ids"])
        w["node_ids"] = [w["node_ids"][i] for i in order]
        w["lons"] = [w["lons"][i] for i in order]
        w["lats"] = [w["lats"][i] for i in order]
        w["minlon"], w["maxlon"] = min(w["lons"]), max(w["lons"])
        w["minlat"], w["maxlat"] = min(w["lats"]), max(w["lats"])
    ways_df = pd.DataFrame(sorted(ways.values(), key=lambda w: w["id"]))

    rels = {}
    for n in nodes:
        rg = n["id"] // NODES_PER_REL
        r = rels.setdefault(
            rg,
            {
                "id": REL_ID_BASE + rg,
                "node_ids": [],
                "way_ids": set(),
                "cells": set(),
                "bounds": [],
                "tags": {"rtype": RTYPE_VALUES[rg % 3]},
            },
        )
        if n["id"] % NODES_PER_REL < 3:
            r["node_ids"].append(n["id"])
            r["cells"].add(n["cell"])
            r["bounds"].append((n["lon"], n["lat"], n["lon"], n["lat"]))
    for w in ways.values():
        rg = (w["id"] - WAY_ID_BASE) // WAYS_PER_REL
        if rg in rels:
            r = rels[rg]
            r["way_ids"].add(w["id"])
            r["cells"] |= w["cells"]
            r["bounds"].append((w["minlon"], w["minlat"], w["maxlon"], w["maxlat"]))
    for r in rels.values():
        rg = r["id"] - REL_ID_BASE
        r["way_ids"] = sorted(r["way_ids"])
        r["node_ids"] = sorted(r["node_ids"])
        if rg % REL_NEST == 0:
            r["child_relation_ids"] = [
                REL_ID_BASE + rg + k for k in range(1, REL_NEST) if (rg + k) in rels
            ]
            r["parent_relation_ids"] = []
        else:
            p = rg - rg % REL_NEST
            r["child_relation_ids"] = []
            r["parent_relation_ids"] = [REL_ID_BASE + p] if p in rels else []
    # parent bounds/cells absorb children (one nesting level)
    for r in rels.values():
        for cid in r["child_relation_ids"]:
            c = rels[cid - REL_ID_BASE]
            r["bounds"].extend(c["bounds"])
            r["cells"] |= c["cells"]
    for r in rels.values():
        bs = r["bounds"]
        r["minlon"] = min(b[0] for b in bs)
        r["minlat"] = min(b[1] for b in bs)
        r["maxlon"] = max(b[2] for b in bs)
        r["maxlat"] = max(b[3] for b in bs)
        del r["bounds"]
    rels_df = pd.DataFrame(sorted(rels.values(), key=lambda r: r["id"]))
    return nodes_df, ways_df, rels_df


# ---------------------------------------------------------------------------
# naive query evaluation helpers (per-test predicates stay explicit lambdas)


def in_bbox_node(row, bbox) -> bool:
    return bbox[0] <= row.lon <= bbox[2] and bbox[1] <= row.lat <= bbox[3]


def bound_intersects(row, bbox) -> bool:
    return (
        row.minlon <= bbox[2]
        and row.maxlon >= bbox[0]
        and row.minlat <= bbox[3]
        and row.maxlat >= bbox[1]
    )


def bbox_cells(bbox) -> set[int]:
    out = set()
    for cx in range(math.floor(bbox[0] / 0.1), math.floor(bbox[2] / 0.1) + 1):
        for cy in range(math.floor(bbox[1] / 0.1), math.floor(bbox[3] / 0.1) + 1):
            out.add(cx * CELL_PACK + cy)
    return out


def select_nodes(nodes_df, bbox, pred) -> set[int]:
    """Naive bbox+cell+tag selection over the oracle node frame."""
    cells = bbox_cells(bbox)
    out = set()
    for row in nodes_df.itertuples():
        if row.cell in cells and in_bbox_node(row, bbox) and pred(row):
            out.add(row.id)
    return out


def select_bound_features(df, bbox, pred) -> set[int]:
    """Naive bbox selection for ways/relations (cell hit + bound intersect)."""
    cells = bbox_cells(bbox)
    out = set()
    for row in df.itertuples():
        if (set(row.cells) & cells) and bound_intersects(row, bbox) and pred(row):
            out.add(row.id)
    return out
