"""Iterative graph traversal over the eps-proximity graph (BFS / SSSP).

The reference engine has no graph-traversal operator, but OSM data IS a
graph, and the reference's bounded relation-resolution fixpoint
(``/root/reference/src/importing/import.go`` — relations referencing
relations resolve over a bounded number of passes) establishes the pattern
these operators generalize: a bounded number of synchronous set-oriented
rounds ("supersteps"), each expressed as Ray Data ops over the full edge
set, with ``materialize()`` as the round barrier — the same shape as the
label propagation in :func:`..stages.dedup.connected_components`.

The graph is the eps-proximity graph produced by
:func:`..stages.knn.radius_join` (grid-bucketed pair enumeration — the edge
list is built distributed and never driver-held). Two traversals:

* :func:`proximity_bfs` — hop distance from a source node, ``max_rounds``
  supersteps. Exact SQL twin: a recursive CTE over the same pair predicate
  with the same round bound.
* :func:`proximity_sssp` — bounded-round Bellman-Ford on planar segment
  lengths (``sqrt(dist2)``). No SQL twin (a recursive CTE would have to
  enumerate every bounded-hop path — exponential); pinned in tests against
  a local Bellman-Ford over the identical edge list, which is bit-exact
  because both sides take ``min`` over the same candidate sums.

Frontier/visited handling follows the repo's size-gated
broadcast-vs-shuffle discipline (cf. ``QueryEngine._resolve_substatements``):

* **broadcast path** (vertex count <= ``broadcast_limit``): the frontier /
  visited state lives in sorted numpy arrays, ``ray.put`` once per round;
  each round is ONE map-only pass over the distributed edge set (searchsorted
  probes) plus a tiny partial-row pull — no shuffle at all.
* **hash path** (bigger graphs): per-round state stays a Dataset; the
  frontier attaches to the edge set through the bucketed
  :func:`..stages.joins.hash_join_attach` and new labels reduce through one
  ``groupby``. Per-round shuffle volume is O(E) worst case — the standard
  cost of synchronous distributed BFS; rounds stream and spill, nothing
  lands on the driver.

Both paths produce identical tables (min over identical candidate sets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..state.broadcast import get as bget
from .joins import hash_join_attach
from .knn import radius_join
from .semi_join import isin_sorted

# above this vertex count the per-round state stops being driver-held sorted
# arrays and the bucketed hash rounds run instead (same contract as
# QueryEngine.BROADCAST_ID_LIMIT: a broadcast probe array of 4M int64 is
# ~32 MB — cheap to ship once per round; beyond it, shuffle)
BROADCAST_VERTEX_LIMIT = 4_000_000


def symmetric_edges(pairs: ray.data.Dataset) -> ray.data.Dataset:
    """radius_join emits each unordered pair once (id_a < id_b); traversal
    needs both directions. Map-only doubling, weight = planar length."""

    def both(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["id_a"], dtype=np.int64)
        b = np.asarray(batch["id_b"], dtype=np.int64)
        w = np.sqrt(np.asarray(batch["dist2"], dtype=np.float64))
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
                "w": pa.array(np.concatenate([w, w])),
            }
        )

    return pairs.map_batches(both, batch_format="pyarrow")


def _hops_table(ids: np.ndarray, hops: np.ndarray) -> pa.Table:
    return pa.table(
        {"id": pa.array(ids, type=pa.int64()), "hops": pa.array(hops, type=pa.int64())}
    )


def proximity_bfs(
    ds: ray.data.Dataset,
    radius: float,
    source_id: int = 0,
    max_rounds: int = 10,
    broadcast_limit: int = BROADCAST_VERTEX_LIMIT,
) -> ray.data.Dataset:
    """(id, hops) for every feature reachable from ``source_id`` within
    ``max_rounds`` hops of the eps-proximity graph. hops(source) = 0."""
    edges = symmetric_edges(radius_join(ds, radius)).materialize()
    if ds.count() <= broadcast_limit:
        return _bfs_broadcast(edges, source_id, max_rounds)
    return _bfs_hash(edges, source_id, max_rounds)


def _bfs_broadcast(
    edges: ray.data.Dataset, source_id: int, max_rounds: int
) -> ray.data.Dataset:
    # visited_sorted is the probe array (searchsorted membership); out_ids /
    # out_hops accumulate the result in discovery order (round 0 first)
    visited_sorted = np.array([source_id], dtype=np.int64)
    out_ids = np.array([source_id], dtype=np.int64)
    out_hops = np.array([0], dtype=np.int64)
    frontier = visited_sorted
    for r in range(1, max_rounds + 1):
        f_ref = ray.put(frontier)
        v_ref = ray.put(visited_sorted)

        def expand(batch: pa.Table) -> pa.Table:
            src = np.asarray(batch["src"], dtype=np.int64)
            dst = np.asarray(batch["dst"], dtype=np.int64)
            m = isin_sorted(src, bget(f_ref)) & ~isin_sorted(dst, bget(v_ref))
            return pa.table({"id": pa.array(np.unique(dst[m]))})

        parts = [
            np.asarray(b["id"], dtype=np.int64)
            for b in edges.map_batches(expand, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        ]
        new = (
            np.unique(np.concatenate(parts)) if parts else np.array([], dtype=np.int64)
        )
        if len(new) == 0:
            break
        visited_sorted = np.sort(np.concatenate([visited_sorted, new]))
        out_ids = np.concatenate([out_ids, new])
        out_hops = np.concatenate([out_hops, np.full(len(new), r, dtype=np.int64)])
        frontier = new  # already sorted (np.unique)
    return ray.data.from_arrow(_hops_table(out_ids, out_hops))


def _bfs_hash(
    edges: ray.data.Dataset, source_id: int, max_rounds: int, num_buckets: int = 64
) -> ray.data.Dataset:
    dist = ray.data.from_arrow(
        _hops_table(np.array([source_id], dtype=np.int64), np.array([0], dtype=np.int64))
    ).materialize()
    frontier = dist.select_columns(["id"]).materialize()
    for r in range(1, max_rounds + 1):

        def flag_one(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "id": batch["id"],
                    "__f": pa.array(np.ones(len(batch), dtype=np.int8)),
                }
            )

        def cand_ids(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = pc.equal(batch["__f"], pa.scalar(1, type=pa.int8()))
            dst = np.asarray(batch.filter(keep)["dst"], dtype=np.int64)
            return pa.table({"id": pa.array(np.unique(dst))})

        cands = (
            hash_join_attach(
                edges,
                "src",
                frontier.map_batches(flag_one, batch_format="pyarrow"),
                "id",
                {"__f": pa.int8()},
                num_buckets=num_buckets,
            )
            .map_batches(cand_ids, batch_format="pyarrow")
            .groupby("id")
            .count()
            .select_columns(["id"])
        )

        def seen_flag(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "id": batch["id"],
                    "__seen": pa.array(np.ones(len(batch), dtype=np.int8)),
                }
            )

        def unseen(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            fresh = batch.filter(pc.is_null(batch["__seen"]))
            ids = np.asarray(fresh["id"], dtype=np.int64)
            return _hops_table(ids, np.full(len(ids), r, dtype=np.int64))

        new_rows = hash_join_attach(
            cands,
            "id",
            dist.map_batches(seen_flag, batch_format="pyarrow"),
            "id",
            {"__seen": pa.int8()},
            num_buckets=num_buckets,
        ).map_batches(unseen, batch_format="pyarrow").materialize()
        if new_rows.count() == 0:
            break
        dist = dist.union(new_rows).materialize()
        frontier = new_rows.select_columns(["id"]).materialize()
    return dist


def proximity_sssp(
    ds: ray.data.Dataset,
    radius: float,
    source_id: int = 0,
    max_rounds: int = 10,
    broadcast_limit: int = BROADCAST_VERTEX_LIMIT,
) -> ray.data.Dataset:
    """(id, dist) — min planar path length from ``source_id`` over paths of
    at most ``max_rounds`` edges (bounded Bellman-Ford). dist(source) = 0."""
    edges = symmetric_edges(radius_join(ds, radius)).materialize()
    if ds.count() <= broadcast_limit:
        return _sssp_broadcast(edges, source_id, max_rounds)
    return _sssp_hash(edges, source_id, max_rounds)


def _dist_table(ids: np.ndarray, d: np.ndarray) -> pa.Table:
    return pa.table(
        {"id": pa.array(ids, type=pa.int64()), "dist": pa.array(d, type=pa.float64())}
    )


def _sssp_broadcast(
    edges: ray.data.Dataset, source_id: int, max_rounds: int
) -> ray.data.Dataset:
    ids = np.array([source_id], dtype=np.int64)  # kept sorted
    dist = np.array([0.0], dtype=np.float64)  # aligned with ids
    f_ids = ids
    f_d = dist
    for _ in range(max_rounds):
        ref = ray.put((f_ids, f_d))

        def relax(batch: pa.Table) -> pa.Table:
            fi, fd = bget(ref)
            src = np.asarray(batch["src"], dtype=np.int64)
            dst = np.asarray(batch["dst"], dtype=np.int64)
            w = np.asarray(batch["w"], dtype=np.float64)
            m = isin_sorted(src, fi)
            if not m.any():
                return _dist_table(
                    np.array([], dtype=np.int64), np.array([], dtype=np.float64)
                )
            pos = np.searchsorted(fi, src[m])
            cand_d = fd[pos] + w[m]
            cand_id = dst[m]
            uniq, inv = np.unique(cand_id, return_inverse=True)
            best = np.full(len(uniq), np.inf)
            np.minimum.at(best, inv, cand_d)
            return _dist_table(uniq, best)

        # per-batch min partials pulled to the driver (bounded by the
        # broadcast gate) and merged with np.minimum.at — min is
        # associative/commutative, so the result equals a global min
        p_ids: list[np.ndarray] = []
        p_d: list[np.ndarray] = []
        for b in edges.map_batches(relax, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        ):
            p_ids.append(np.asarray(b["id"], dtype=np.int64))
            p_d.append(np.asarray(b["dist"], dtype=np.float64))
        if not p_ids:
            break
        c_id = np.concatenate(p_ids)
        c_d = np.concatenate(p_d)
        if len(c_id) == 0:
            break
        uniq, inv = np.unique(c_id, return_inverse=True)
        best = np.full(len(uniq), np.inf)
        np.minimum.at(best, inv, c_d)
        # merge with current labels
        pos = np.searchsorted(ids, uniq)
        pos_c = np.clip(pos, 0, len(ids) - 1)
        known = ids[pos_c] == uniq  # ids always holds >= 1 row (the source)
        improved_known = known & (best < dist[pos_c])
        new_node = ~known
        if not (improved_known.any() or new_node.any()):
            break
        # apply improvements
        dist[pos_c[improved_known]] = best[improved_known]
        add_ids = uniq[new_node]
        add_d = best[new_node]
        merged_ids = np.concatenate([ids, add_ids])
        merged_d = np.concatenate([dist, add_d])
        order = np.argsort(merged_ids, kind="stable")
        ids = merged_ids[order]
        dist = merged_d[order]
        changed = np.concatenate([uniq[improved_known], add_ids])
        changed_d = np.concatenate([best[improved_known], add_d])
        c_order = np.argsort(changed, kind="stable")
        f_ids = changed[c_order]
        f_d = changed_d[c_order]
    return ray.data.from_arrow(_dist_table(ids, dist))


def _sssp_hash(
    edges: ray.data.Dataset, source_id: int, max_rounds: int, num_buckets: int = 64
) -> ray.data.Dataset:
    dist = ray.data.from_arrow(
        _dist_table(np.array([source_id], dtype=np.int64), np.array([0.0]))
    ).materialize()
    frontier = dist
    for _ in range(max_rounds):

        def fprep(batch: pa.Table) -> pa.Table:
            return pa.table({"id": batch["id"], "__fd": batch["dist"]})

        def cand_rows(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            hit = batch.filter(pc.is_valid(batch["__fd"]))
            dst = np.asarray(hit["dst"], dtype=np.int64)
            d = np.asarray(hit["__fd"], dtype=np.float64) + np.asarray(
                hit["w"], dtype=np.float64
            )
            uniq, inv = np.unique(dst, return_inverse=True)
            best = np.full(len(uniq), np.inf)
            np.minimum.at(best, inv, d)
            # tag side 1 = candidate
            t = _dist_table(uniq, best)
            return t.append_column(
                "__cand", pa.array(np.ones(len(uniq), dtype=np.int8))
            )

        cands = hash_join_attach(
            edges,
            "src",
            frontier.map_batches(fprep, batch_format="pyarrow"),
            "id",
            {"__fd": pa.float64()},
            num_buckets=num_buckets,
        ).map_batches(cand_rows, batch_format="pyarrow")

        def tag_dist(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "id": batch["id"],
                    "dist": batch["dist"],
                    "__cand": pa.array(np.zeros(len(batch), dtype=np.int8)),
                }
            )

        def reduce_labels(tbl: pa.Table) -> pa.Table:
            ids_ = np.asarray(tbl["id"], dtype=np.int64)
            d = np.asarray(tbl["dist"], dtype=np.float64)
            cand = np.asarray(tbl["__cand"], dtype=np.int8)
            uniq, inv = np.unique(ids_, return_inverse=True)
            best = np.full(len(uniq), np.inf)
            np.minimum.at(best, inv, d)
            old = np.full(len(uniq), np.inf)
            np.minimum.at(old, inv, np.where(cand == 0, d, np.inf))
            changed = best < old
            out = _dist_table(uniq, best)
            return out.append_column("__chg", pa.array(changed.astype(np.int8)))

        merged = (
            dist.map_batches(tag_dist, batch_format="pyarrow")
            .union(cands)
            .groupby("id")
            .map_groups(reduce_labels, batch_format="pyarrow")
            .materialize()
        )
        changed_rows = merged.filter(expr="__chg == 1")
        dist = merged.select_columns(["id", "dist"]).materialize()
        frontier = changed_rows.select_columns(["id", "dist"]).materialize()
        if frontier.count() == 0:
            break
    return dist


# --- PageRank-style fixed-point score propagation (pre-existing op) ---

SCALE = 1_000_000
DAMP_NUM = 85
BASE = 15 * SCALE // 100


def _bipartite_edges(sf_dir: str) -> ray.data.Dataset:
    """Directed edge list (src, dst) of the order-supplier graph: orders get
    even vertex ids (2k), suppliers odd (2k+1); every distinct pair emits
    both directions. Dedup = per-batch drop_duplicates then one keyed
    groupby (the only dedup shuffle)."""
    from ..sources.read import read_parquet_sized

    li = read_parquet_sized(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"])

    num_buckets = 16

    def pairs(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o": np.asarray(batch["l_orderkey"], dtype=np.int64),
                "s": np.asarray(batch["l_suppkey"], dtype=np.int64),
            }
        ).drop_duplicates()
        df["__bucket"] = df["o"].to_numpy() % num_buckets
        return pa.Table.from_pandas(df, preserve_index=False)

    def dedup(tbl: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"o": np.asarray(tbl["o"], dtype=np.int64), "s": np.asarray(tbl["s"], dtype=np.int64)}
        ).drop_duplicates()
        o = df["o"].to_numpy() * 2
        s = df["s"].to_numpy() * 2 + 1
        return pa.table(
            {
                "src": pa.array(np.concatenate([o, s])),
                "dst": pa.array(np.concatenate([s, o])),
            }
        )

    cand = li.map_batches(pairs, batch_format="pyarrow")
    return cand.groupby("__bucket").map_groups(dedup, batch_format="pyarrow")


def pagerank_suppliers(sf_dir: str, iters: int = 2, k: int = 20) -> pd.DataFrame:
    """``iters`` rounds of damped integer score propagation from a uniform
    start, then the top-k supplier vertices by (score desc, suppkey asc).
    Output: (s_suppkey, score)."""
    from ray.data.aggregate import Sum

    from .joins import hash_join_attach

    edges = _bipartite_edges(sf_dir).materialize()  # reused every iteration

    def ones(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"src": batch["src"], "one": pa.array(np.ones(len(batch), dtype=np.int64))}
        )

    from .group_collect import bucketed_sum

    # vertex-keyed merges run through the bucketed reduce: the bipartite
    # vertex set is orders+suppliers sized, far past the generic
    # aggregate's ~10^3-group comfort zone (group_collect.py)
    deg = bucketed_sum(
        edges.map_batches(ones, batch_format="pyarrow"), ["src"], ["one"]
    ).rename_columns({"one": "deg"})

    def init_scores(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "v": batch["src"],
                "sc": pa.array(np.full(len(batch), SCALE, dtype=np.int64)),
                "deg": batch["deg"].cast(pa.int64()),
            }
        )

    scores = deg.map_batches(init_scores, batch_format="pyarrow").materialize()

    for _ in range(iters):
        contrib = hash_join_attach(
            edges, "src", scores, "v", {"sc": pa.int64(), "deg": pa.int64()}
        )

        def push(batch: pa.Table) -> pa.Table:
            sc = np.asarray(batch["sc"].combine_chunks().fill_null(0), dtype=np.int64)
            d = np.asarray(batch["deg"].combine_chunks().fill_null(1), dtype=np.int64)
            c = sc * np.int64(DAMP_NUM) // (np.int64(100) * np.maximum(d, 1))
            df = pd.DataFrame({"dst": np.asarray(batch["dst"], dtype=np.int64), "c": c})
            g = df.groupby("dst", as_index=False)["c"].sum()
            return pa.table({"dst": pa.array(g["dst"].to_numpy()), "c": pa.array(g["c"].to_numpy())})

        acc = bucketed_sum(
            contrib.map_batches(push, batch_format="pyarrow"), ["dst"], ["c"]
        ).rename_columns({"c": "acc"})
        new_scores = hash_join_attach(
            acc, "dst", scores.select_columns(["v", "deg"]).map_batches(
                lambda b: pa.table({"v2": b["v"], "deg": b["deg"]}), batch_format="pyarrow"
            ), "v2", {"deg": pa.int64()},
        )

        def finish(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "v": batch["dst"],
                    "sc": pa.array(
                        np.int64(BASE) + np.asarray(batch["acc"], dtype=np.int64)
                    ),
                    "deg": batch["deg"].combine_chunks().fill_null(1).cast(pa.int64()),
                }
            )

        scores = new_scores.map_batches(finish, batch_format="pyarrow").materialize()

    def suppliers(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch["v"], dtype=np.int64)
        sc = np.asarray(batch["sc"], dtype=np.int64)
        odd = v % 2 == 1
        return pa.table(
            {"s_suppkey": pa.array((v[odd] - 1) // 2), "score": pa.array(sc[odd])}
        )

    out = scores.map_batches(suppliers, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["score", "s_suppkey"], ascending=[False, True], kind="mergesort")
    return out.head(k).reset_index(drop=True)


def _multi_table(ids: np.ndarray, hops: np.ndarray, src: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "id": pa.array(ids, type=pa.int64()),
            "hops": pa.array(hops, type=pa.int64()),
            "src": pa.array(src, type=pa.int64()),
        }
    )


def proximity_bfs_multi(
    ds: ray.data.Dataset,
    radius: float,
    source_ids: list[int],
    max_rounds: int = 10,
    broadcast_limit: int = BROADCAST_VERTEX_LIMIT,
) -> ray.data.Dataset:
    """Multi-source BFS ("nearest facility"): every feature reachable within
    ``max_rounds`` hops of ANY source gets (hops, src) — the hop distance to
    its closest source and that source's id (round tie -> smallest source).
    Label propagation is min-merge per round: a node first reached at round
    r takes the min label among its round-(r-1) neighbors, which equals the
    global lexicographic (hops, src) minimum (every source at distance r has
    a shortest-path predecessor at distance r-1 carrying it as a candidate).
    Same size-gated broadcast/hash discipline as :func:`proximity_bfs`."""
    edges = symmetric_edges(radius_join(ds, radius)).materialize()
    srcs = np.array(sorted(set(int(s) for s in source_ids)), dtype=np.int64)
    # seed only sources that exist in the dataset — the SQL twin seeds
    # FROM the node table, so a caller-passed id outside it must produce
    # no (src, 0, src) phantom row; one streaming pass, srcs stay tiny
    srcs_ref = ray.put(srcs)

    def present(batch: pa.Table) -> pa.Table:
        s = bget(srcs_ref)
        ids = np.asarray(batch["id"], dtype=np.int64)
        return pa.table({"src": pa.array(s[isin_sorted(s, np.sort(ids))])})

    found = ds.select_columns(["id"]).map_batches(present, batch_format="pyarrow").to_pandas()
    srcs = np.unique(found["src"].to_numpy()) if len(found) else srcs[:0]
    if ds.count() <= broadcast_limit:
        return _bfs_multi_broadcast(edges, srcs, max_rounds)
    return _bfs_multi_hash(edges, srcs, max_rounds)


def _bfs_multi_broadcast(
    edges: ray.data.Dataset, srcs: np.ndarray, max_rounds: int
) -> ray.data.Dataset:
    visited_sorted = srcs.copy()
    out_ids = srcs.copy()
    out_hops = np.zeros(len(srcs), dtype=np.int64)
    out_src = srcs.copy()
    f_ids, f_src = srcs.copy(), srcs.copy()
    for r in range(1, max_rounds + 1):
        ref = ray.put((f_ids, f_src))
        v_ref = ray.put(visited_sorted)

        def expand(batch: pa.Table) -> pa.Table:
            fi, fs = bget(ref)
            s = np.asarray(batch["src"], dtype=np.int64)
            d = np.asarray(batch["dst"], dtype=np.int64)
            m = isin_sorted(s, fi) & ~isin_sorted(d, bget(v_ref))
            if not m.any():
                return pa.table(
                    {
                        "id": pa.array([], type=pa.int64()),
                        "lbl": pa.array([], type=pa.int64()),
                    }
                )
            pos = np.searchsorted(fi, s[m])
            cand_id = d[m]
            cand_lbl = fs[pos]
            uniq, inv = np.unique(cand_id, return_inverse=True)
            best = np.full(len(uniq), np.iinfo(np.int64).max)
            np.minimum.at(best, inv, cand_lbl)
            return pa.table({"id": pa.array(uniq), "lbl": pa.array(best)})

        p_id, p_lbl = [], []
        for b in edges.map_batches(expand, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        ):
            p_id.append(np.asarray(b["id"], dtype=np.int64))
            p_lbl.append(np.asarray(b["lbl"], dtype=np.int64))
        if not p_id:
            break
        c_id = np.concatenate(p_id)
        c_lbl = np.concatenate(p_lbl)
        if len(c_id) == 0:
            break
        uniq, inv = np.unique(c_id, return_inverse=True)
        best = np.full(len(uniq), np.iinfo(np.int64).max)
        np.minimum.at(best, inv, c_lbl)
        visited_sorted = np.sort(np.concatenate([visited_sorted, uniq]))
        out_ids = np.concatenate([out_ids, uniq])
        out_hops = np.concatenate([out_hops, np.full(len(uniq), r, dtype=np.int64)])
        out_src = np.concatenate([out_src, best])
        f_ids, f_src = uniq, best  # uniq is sorted
    return ray.data.from_arrow(_multi_table(out_ids, out_hops, out_src))


def _bfs_multi_hash(
    edges: ray.data.Dataset, srcs: np.ndarray, max_rounds: int, num_buckets: int = 64
) -> ray.data.Dataset:
    dist = ray.data.from_arrow(
        _multi_table(srcs, np.zeros(len(srcs), dtype=np.int64), srcs)
    ).materialize()
    frontier = dist.select_columns(["id", "src"]).materialize()
    for r in range(1, max_rounds + 1):

        def fprep(batch: pa.Table) -> pa.Table:
            return pa.table({"id": batch["id"], "__fs": batch["src"]})

        def cand_rows(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            hit = batch.filter(pc.is_valid(batch["__fs"]))
            d = np.asarray(hit["dst"], dtype=np.int64)
            lbl = np.asarray(hit["__fs"], dtype=np.int64)
            uniq, inv = np.unique(d, return_inverse=True)
            best = np.full(len(uniq), np.iinfo(np.int64).max)
            np.minimum.at(best, inv, lbl)
            return pa.table({"id": pa.array(uniq), "lbl": pa.array(best)})

        cands = (
            hash_join_attach(
                edges,
                "src",
                frontier.map_batches(fprep, batch_format="pyarrow"),
                "id",
                {"__fs": pa.int64()},
                num_buckets=num_buckets,
            )
            .map_batches(cand_rows, batch_format="pyarrow")
            .groupby("id")
            .min("lbl")
            .map_batches(
                lambda b: pa.table({"id": b["id"], "lbl": b["min(lbl)"]}),
                batch_format="pyarrow",
            )
        )

        def seen_flag(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "id": batch["id"],
                    "__seen": pa.array(np.ones(len(batch), dtype=np.int8)),
                }
            )

        def unseen(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            fresh = batch.filter(pc.is_null(batch["__seen"]))
            ids = np.asarray(fresh["id"], dtype=np.int64)
            lbl = np.asarray(fresh["lbl"], dtype=np.int64)
            return _multi_table(ids, np.full(len(ids), r, dtype=np.int64), lbl)

        new_rows = hash_join_attach(
            cands,
            "id",
            dist.map_batches(seen_flag, batch_format="pyarrow"),
            "id",
            {"__seen": pa.int8()},
            num_buckets=num_buckets,
        ).map_batches(unseen, batch_format="pyarrow").materialize()
        if new_rows.count() == 0:
            break
        dist = dist.union(new_rows).materialize()
        frontier = new_rows.select_columns(["id", "src"]).materialize()
    return dist


# triangle_counts packing: forward-edge key = (src << 31) | dst. Engine ids
# (doc/way/rel spaces + dup offsets) stay far below 2^31; guarded at runtime.
_TRI_SHIFT = 31
_TRI_MASK = (1 << _TRI_SHIFT) - 1


def triangle_counts(
    ds: ray.data.Dataset, radius: float, *, n_buckets: int = 64
) -> ray.data.Dataset:
    """Per-node triangle participation counts over the eps-proximity graph.

    The MapReduce-classic node-iterator with DEGREE ORDERING: each edge is
    oriented from its lower-(degree, id) endpoint to the higher one, wedges
    are enumerated only among a node's FORWARD neighbors (per-node forward
    degree is O(sqrt(m)) by the standard orientation argument — the hot-cell
    hub never enumerates its full neighborhood), and a wedge (u; v, w) closes
    into a triangle iff (v, w) is itself a forward edge — checked by the
    bucketed int64 membership lookup (``_attach_int64``), never a corpus-wide
    ``Dataset.join``. Every triangle is counted exactly once at its unique
    lowest-rank vertex, then exploded to all three corners for the per-node
    counts. Shuffles: one edge-endpoint degree groupby, two bounded-bucket
    degree attaches, one wedge-bucket groupby, one membership attach, one
    final count groupby — all over id-sized rows (no payload, no geometry).
    """
    from ray.data.aggregate import Sum

    from .knn import _attach_int64, radius_join

    edges = radius_join(ds, radius).select_columns(["id_a", "id_b"]).materialize()

    def end_partial(batch: pa.Table) -> pa.Table:
        both = np.concatenate(
            [
                np.asarray(batch["id_a"], dtype=np.int64),
                np.asarray(batch["id_b"], dtype=np.int64),
            ]
        )
        u, c = np.unique(both, return_counts=True)
        return pa.table({"k": pa.array(u), "v": pa.array(c.astype(np.int64))})

    deg = (
        edges.map_batches(end_partial, batch_format="pyarrow")
        .repartition(8)
        .groupby("k")
        .aggregate(Sum("v", alias_name="v"))
        .materialize()
    )

    with_deg = _attach_int64(
        _attach_int64(edges, deg, "id_a", "deg_a", n_buckets),
        deg,
        "id_b",
        "deg_b",
        n_buckets,
    )

    def orient(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["id_a"], dtype=np.int64)
        b = np.asarray(batch["id_b"], dtype=np.int64)
        da = np.asarray(batch["deg_a"], dtype=np.int64)
        db = np.asarray(batch["deg_b"], dtype=np.int64)
        if len(a) and max(a.max(), b.max()) >= (1 << _TRI_SHIFT):
            raise ValueError("triangle_counts: ids must fit in 31 bits")
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        ddst = np.where(a_first, db, da)
        bkt = ((src.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(40)).astype(np.int64) % n_buckets
        return pa.table(
            {
                "bkt": pa.array(bkt),
                "src": pa.array(src),
                "dst": pa.array(dst),
                "ddst": pa.array(ddst),
            }
        )

    fwd = with_deg.map_batches(orient, batch_format="pyarrow").materialize()

    def wedges_in_bucket(tbl: pa.Table) -> pa.Table:
        src = np.asarray(tbl["src"], dtype=np.int64)
        dst = np.asarray(tbl["dst"], dtype=np.int64)
        ddst = np.asarray(tbl["ddst"], dtype=np.int64)
        # sort by (src, rank of dst): within each src segment dsts come out
        # rank-ascending, so pair (i < j) is already (lower-rank, higher-rank)
        # — exactly the orientation a closing forward edge would have
        order = np.lexsort((dst, ddst, src))
        src, dst, ddst = src[order], dst[order], ddst[order]
        n = len(src)
        seg_start = np.zeros(n, dtype=np.int64)
        new_seg = np.flatnonzero(np.diff(src) != 0) + 1
        starts = np.concatenate(([0], new_seg))
        marker = np.zeros(n, dtype=np.int64)
        marker[new_seg] = 1
        seg_of = np.cumsum(marker)
        pos = np.arange(n) - starts[seg_of]
        cnt = pos  # row j pairs with every earlier row of its segment
        total = int(cnt.sum())
        if total == 0:
            return pa.table(
                {"key": pa.array([], type=pa.int64()), "u": pa.array([], type=pa.int64())}
            )
        second = np.repeat(np.arange(n, dtype=np.int64), cnt)
        block_off = np.concatenate(([0], np.cumsum(cnt)))[:-1]
        k = np.arange(total, dtype=np.int64) - np.repeat(block_off, cnt)
        first = np.repeat(starts[seg_of], cnt) + k
        key = (dst[first] << _TRI_SHIFT) | dst[second]
        return pa.table({"key": pa.array(key), "u": pa.array(src[second])})

    wedges = (
        fwd.groupby("bkt")
        .map_groups(
            lambda t: wedges_in_bucket(t.drop_columns(["bkt"])),
            batch_format="pyarrow",
        )
    )

    def fwd_keys(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch["src"], dtype=np.int64)
        dst = np.asarray(batch["dst"], dtype=np.int64)
        return pa.table(
            {
                "k": pa.array((src << _TRI_SHIFT) | dst),
                "v": pa.array(np.ones(len(src), dtype=np.int64)),
            }
        )

    closed = _attach_int64(
        wedges, fwd.map_batches(fwd_keys, batch_format="pyarrow"), "key", "_hit", n_buckets
    )

    def corner_partial(batch: pa.Table) -> pa.Table:
        key = np.asarray(batch["key"], dtype=np.int64)
        u = np.asarray(batch["u"], dtype=np.int64)
        allids = np.concatenate([u, key >> _TRI_SHIFT, key & _TRI_MASK])
        ids_u, c = np.unique(allids, return_counts=True)
        return pa.table({"id": pa.array(ids_u), "n": pa.array(c.astype(np.int64))})

    return (
        closed.map_batches(corner_partial, batch_format="pyarrow")
        .repartition(8)
        .groupby("id")
        .aggregate(Sum("n", alias_name="n_triangles"))
    )
