"""k-nearest-neighbour search over point features.

Two paths (SURVEY.md section 7.2 step 6):

- :func:`knn_bruteforce` — broadcast the (small) query-point matrix, compute
  per-batch squared distances vectorized, keep a per-batch top-k per query
  (combiner), then reduce the k * n_batches candidates per query in one tiny
  final stage. No all-to-all shuffle; scales linearly in rows.
- :func:`knn_cell_ring` — the reference-style index path: probe expanding
  rings of grid cells around each query point (generalizes the cell prune of
  ``/root/reference/src/index/grid_reader.go:39-78``) and stop once the ring
  distance bound exceeds the current k-th best. Efficient when the cell index
  is materialized (reads only nearby cells instead of the full table).

Distances are squared-euclidean in lon/lat degrees (deterministic ties broken
by feature id), matching the oracle SQL exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..model import CELL_H, CELL_W, cell_of, pack_cell
from ..state.broadcast import get as bget


def _topk_per_query(
    qlon: np.ndarray,
    qlat: np.ndarray,
    lon: np.ndarray,
    lat: np.ndarray,
    ids: np.ndarray,
    k: int,
):
    """(qid, id, dist2) candidate triples: per-batch top-k for each query."""
    # distance matrix Q x N, vectorized
    dlon = qlon[:, None] - lon[None, :]
    dlat = qlat[:, None] - lat[None, :]
    d2 = dlon * dlon + dlat * dlat
    n = d2.shape[1]
    kk = min(k, n)
    if kk == 0:
        e = np.array([], dtype=np.int64)
        return e, e, np.array([], dtype=np.float64)
    # exact (d2, id) lexicographic top-k per row — argpartition alone is
    # NOT tie-safe at the k-boundary (equal distances straddling the cut
    # would be kept arbitrarily, losing the smallest-id candidate)
    order = np.lexsort((np.broadcast_to(ids, d2.shape), d2), axis=1)[:, :kk]
    sd2 = np.take_along_axis(d2, order, axis=1)
    sids = ids[order]
    qids = np.repeat(np.arange(d2.shape[0], dtype=np.int64), kk)
    return qids, sids.ravel().astype(np.int64), sd2.ravel()


def knn_bruteforce(
    ds: ray.data.Dataset, query_points: np.ndarray, k: int
) -> ray.data.Dataset:
    """Exact kNN: per-batch vectorized top-k + single small reduce.

    ``query_points``: float64 array of shape (Q, 2) as (lon, lat). Returns a
    Dataset of (qid, id, dist2, rank) with rank 1..k per query, deterministic
    tie-break on id.
    """
    import ray

    q_ref = ray.put(np.asarray(query_points, dtype=np.float64))

    def candidates(batch: pa.Table) -> pa.Table:
        q = bget(q_ref)
        qids, ids_, d2 = _topk_per_query(
            q[:, 0],
            q[:, 1],
            np.asarray(batch["lon"], dtype=np.float64),
            np.asarray(batch["lat"], dtype=np.float64),
            np.asarray(batch["id"], dtype=np.int64),
            k,
        )
        return pa.table(
            {
                "qid": pa.array(qids),
                "id": pa.array(ids_),
                "dist2": pa.array(d2),
            }
        )

    def reduce_group(tbl: pa.Table) -> pa.Table:
        d2 = np.asarray(tbl["dist2"], dtype=np.float64)
        ids_ = np.asarray(tbl["id"], dtype=np.int64)
        qid = np.asarray(tbl["qid"], dtype=np.int64)
        order = np.lexsort((ids_, d2))
        kk = min(k, len(order))
        sel = order[:kk]
        return pa.table(
            {
                "qid": pa.array(qid[sel]),
                "id": pa.array(ids_[sel]),
                "dist2": pa.array(d2[sel]),
                "rank": pa.array(np.arange(1, kk + 1, dtype=np.int64)),
            }
        )

    cand = ds.map_batches(candidates, batch_format="pyarrow")
    # qid cardinality is tiny (Q queries), so the groupby moves k*n_batches
    # candidate rows only — not the input table. Coalesce the tiny candidate
    # set first: a sort-shuffle's task count is quadratic in block count, and
    # cand inherits the (large) input block count.
    return cand.repartition(4).groupby("qid").map_groups(reduce_group, batch_format="pyarrow")


def _exact_topk_scan(source, qlon: float, qlat: float, k: int) -> list:
    """Exact top-k by one distributed scan: per-batch (d2, id)-lexsorted
    top-k partials, tiny driver merge. The ring searches fall back to this
    when ``max_rings`` is exhausted before their distance bound is met, so
    the cap is a cost knob — never a silent correctness knob."""

    def partial(batch: pa.Table) -> pa.Table:
        lon = np.asarray(batch["lon"], dtype=np.float64)
        lat = np.asarray(batch["lat"], dtype=np.float64)
        ids = np.asarray(batch["id"], dtype=np.int64)
        d2 = (lon - qlon) ** 2 + (lat - qlat) ** 2
        idx = np.lexsort((ids, d2))[:k]  # same (dist, id) tie-break as rings
        return pa.table({"id": pa.array(ids[idx]), "d2": pa.array(d2[idx])})

    df = (
        source.select_columns(["id", "lon", "lat"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    df = df.sort_values(["d2", "id"]).head(k)
    return [(float(d), int(i)) for d, i in zip(df["d2"], df["id"])]


def knn_cell_ring(
    ds: "ray.data.Dataset | None",
    query_point: tuple[float, float],
    k: int,
    *,
    max_rings: int = 64,
    repo=None,
) -> "pa.Table":
    """Index-path kNN for a single query point via expanding cell rings.

    Ring r = cells with Chebyshev distance r from the query's cell. After
    scanning ring r, any candidate closer than the minimal possible distance
    of ring r+1 (r * cell_size) is final.

    Pass ``repo`` (anything with ``table("node", cells=...)``, e.g.
    ``DiskRepo``) to read ONLY the partitions overlapping each ring — the
    reference's grid-reader behavior (``grid_reader.go:39-78``) and the scale
    path. With a plain ``ds`` each ring is a scan + filter (testing only).
    """
    qlon, qlat = float(query_point[0]), float(query_point[1])
    qcell = int(cell_of(np.array([qlon]), np.array([qlat]))[0])
    from ..model import unpack_cell

    cx, cy = unpack_cell(np.array([qcell]))
    cx, cy = int(cx[0]), int(cy[0])

    best: list[tuple[float, int]] = []  # (dist2, id) sorted
    out_rows = []
    for r in range(max_rings):
        # cells of ring r
        if r == 0:
            ring = [(cx, cy)]
        else:
            ring = []
            for dx in range(-r, r + 1):
                ring.append((cx + dx, cy - r))
                ring.append((cx + dx, cy + r))
            for dy in range(-r + 1, r):
                ring.append((cx - r, cy + dy))
                ring.append((cx + r, cy + dy))
        cells = np.sort(
            pack_cell(
                np.array([c[0] for c in ring], dtype=np.int64),
                np.array([c[1] for c in ring], dtype=np.int64),
            )
        )

        from .semi_join import isin_sorted

        def prune(batch: pa.Table, _cells=cells) -> pa.Table:
            mask = isin_sorted(np.asarray(batch["cell"], dtype=np.int64), _cells)
            return batch.filter(pa.array(mask))

        source = repo.table("node", cells=cells) if repo is not None else ds
        ring_tbl = (
            source.map_batches(prune, batch_format="pyarrow")
            .select_columns(["id", "lon", "lat"])
            .to_pandas()
        )
        if len(ring_tbl):
            d2 = (ring_tbl["lon"].to_numpy() - qlon) ** 2 + (
                ring_tbl["lat"].to_numpy() - qlat
            ) ** 2
            for dist, fid in zip(d2, ring_tbl["id"].to_numpy()):
                best.append((float(dist), int(fid)))
            best.sort()
            best = best[:k]
        # stopping bound: min possible distance of the next ring
        next_min = (r * min(CELL_W, CELL_H)) ** 2
        if len(best) == k and best[-1][0] <= next_min:
            break
    else:
        # rings exhausted before the bound was met (sparse data, or k
        # larger than the ring-covered population): one exact scan
        # finalizes — a corner candidate must never beat an unscanned ring
        best = _exact_topk_scan(
            repo.table("node") if repo is not None else ds, qlon, qlat, k
        )
    arr = best[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(arr) + 1, dtype=np.int64)),
            "id": pa.array([b[1] for b in arr], type=pa.int64()),
            "dist2": pa.array([b[0] for b in arr], type=pa.float64()),
        }
    )


def knn_hex_ring(
    ds: "ray.data.Dataset | None",
    query_point: tuple[float, float],
    k: int,
    *,
    size: float = 0.05,
    max_rings: int = 64,
    repo=None,
) -> "pa.Table":
    """Index-path kNN over the H3-style HEXAGONAL lattice: expanding true
    hex rings (ring r = the 6r cells at hex distance r, H3's gridDisk
    shape) around the query's cell, with a distance-bound stop.

    Bound: hex centers at hex distance d are >= 1.5*size*d apart on the
    plane (two lattice basis vectors of length sqrt(3)*size at 60 degrees;
    the minimal d-step combination has norm d*sqrt(3)*size*cos(30deg)), and
    both the query and any unseen point sit within ``size`` of their cell
    centers — so every point beyond ring r is at least
    ``1.5*size*(r+1) - 2*size`` away. Once the k-th best distance is under
    that, later rings cannot improve the answer.

    ``repo`` (a HexCellScheme-built DiskRepo) turns each ring into a pruned
    partition read; otherwise ``ds`` (with a hex 'cell' column) is scanned
    with a vectorized ring-membership filter.
    """
    from ..functions.hexcell import hex_axial, hex_pack
    from .semi_join import isin_sorted

    qlon, qlat = float(query_point[0]), float(query_point[1])
    q0, r0 = hex_axial(np.array([qlon]), np.array([qlat]), size)
    q0, r0 = int(q0[0]), int(r0[0])

    best: list[tuple[float, int]] = []
    for r in range(max_rings):
        dq, dr = np.meshgrid(
            np.arange(-r, r + 1, dtype=np.int64),
            np.arange(-r, r + 1, dtype=np.int64),
            indexing="ij",
        )
        dq, dr = dq.ravel(), dr.ravel()
        hd = np.maximum(np.maximum(np.abs(dq), np.abs(dr)), np.abs(dq + dr))
        on_ring = hd == r
        cells = np.sort(hex_pack(q0 + dq[on_ring], r0 + dr[on_ring]))

        def prune(batch: pa.Table, _cells=cells) -> pa.Table:
            mask = isin_sorted(np.asarray(batch["cell"], dtype=np.int64), _cells)
            return batch.filter(pa.array(mask))

        source = repo.table("node", cells=cells) if repo is not None else ds
        ring_tbl = (
            source.map_batches(prune, batch_format="pyarrow")
            .select_columns(["id", "lon", "lat"])
            .to_pandas()
        )
        if len(ring_tbl):
            d2 = (ring_tbl["lon"].to_numpy() - qlon) ** 2 + (
                ring_tbl["lat"].to_numpy() - qlat
            ) ** 2
            best.extend(
                (float(d), int(i)) for d, i in zip(d2, ring_tbl["id"].to_numpy())
            )
            best.sort()
            best = best[:k]
        lower = 1.5 * size * (r + 1) - 2.0 * size
        if len(best) == k and lower > 0 and best[-1][0] <= lower * lower:
            break
    else:
        # max_rings exhausted without meeting the bound: exact-scan finalize
        best = _exact_topk_scan(
            repo.table("node") if repo is not None else ds, qlon, qlat, k
        )
    arr = best[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(arr) + 1, dtype=np.int64)),
            "id": pa.array([b[1] for b in arr], type=pa.int64()),
            "dist2": pa.array([b[0] for b in arr], type=pa.float64()),
        }
    )


def knn_quad_ring(
    ds: "ray.data.Dataset | None",
    query_point: tuple[float, float],
    k: int,
    *,
    level: int = 12,
    max_rings: int = 64,
    repo=None,
) -> "pa.Table":
    """Index-path kNN over the HIERARCHICAL quad-cell index: expanding
    Chebyshev rings in level-``level`` tile coordinates, morton-encoded to
    cell ids, with the same distance-bound stop as :func:`knn_cell_ring`.
    ``repo`` (e.g. a quad-celled DiskRepo) turns each ring into a pruned
    partition read.
    """
    from ..functions.hiercell import morton
    from ..stages.geo import tile_xy
    from .semi_join import isin_sorted

    qlon, qlat = float(query_point[0]), float(query_point[1])
    tx0, ty0 = tile_xy(np.array([qlon]), np.array([qlat]), level)
    # clamp into the tile grid: lon=180 / lat=-90 floor to n_tiles, the
    # r=0 ring would clip away entirely and the search would return empty
    n_tiles_c = 1 << level
    tx0 = int(np.clip(int(tx0[0]), 0, n_tiles_c - 1))
    ty0 = int(np.clip(int(ty0[0]), 0, n_tiles_c - 1))
    n_tiles = 1 << level
    tile_w, tile_h = 360.0 / n_tiles, 180.0 / n_tiles
    marker = np.int64(1) << np.int64(2 * level)

    best: list[tuple[float, int]] = []
    for r in range(max_rings):
        if r == 0:
            ring = [(tx0, ty0)]
        else:
            ring = [(tx0 + dx, ty0 - r) for dx in range(-r, r + 1)]
            ring += [(tx0 + dx, ty0 + r) for dx in range(-r, r + 1)]
            ring += [(tx0 - r, ty0 + dy) for dy in range(-r + 1, r)]
            ring += [(tx0 + r, ty0 + dy) for dy in range(-r + 1, r)]
        ring = [(x, y) for x, y in ring if 0 <= x < n_tiles and 0 <= y < n_tiles]
        if not ring:
            break
        cells = np.sort(
            marker
            + morton(
                np.array([c[0] for c in ring], dtype=np.int64),
                np.array([c[1] for c in ring], dtype=np.int64),
            )
        )

        def prune(batch: pa.Table, _cells=cells) -> pa.Table:
            mask = isin_sorted(np.asarray(batch["cell"], dtype=np.int64), _cells)
            return batch.filter(pa.array(mask))

        source = repo.table("node", cells=cells) if repo is not None else ds
        ring_tbl = (
            source.map_batches(prune, batch_format="pyarrow")
            .select_columns(["id", "lon", "lat"])
            .to_pandas()
        )
        if len(ring_tbl):
            d2 = (ring_tbl["lon"].to_numpy() - qlon) ** 2 + (
                ring_tbl["lat"].to_numpy() - qlat
            ) ** 2
            best.extend(
                (float(d), int(i)) for d, i in zip(d2, ring_tbl["id"].to_numpy())
            )
            best.sort()
            best = best[:k]
        next_min = (r * min(tile_w, tile_h)) ** 2
        if len(best) == k and best[-1][0] <= next_min:
            break
    else:
        # max_rings exhausted without meeting the bound: exact-scan finalize
        # (the `if not ring: break` exit above means the WHOLE grid was
        # scanned, which is complete — it correctly skips this fallback)
        best = _exact_topk_scan(
            repo.table("node") if repo is not None else ds, qlon, qlat, k
        )
    arr = best[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(arr) + 1, dtype=np.int64)),
            "id": pa.array([b[1] for b in arr], type=pa.int64()),
            "dist2": pa.array([b[0] for b in arr], type=pa.float64()),
        }
    )


def radius_join(ds: ray.data.Dataset, radius: float) -> ray.data.Dataset:
    """Distance-threshold self-join: every unordered pair of features within
    planar degree distance ``radius`` (id_a < id_b, plus the squared
    distance). The all-pairs problem is cut down to per-bucket work by the
    standard grid-bucket replication: each point lands in its home bucket
    plus the 8 neighbors, pairs are enumerated inside one bucket only
    (home point x any point), and the id ordering picks exactly one of the
    two buckets that see a cross-bucket pair — no global dedup pass.

    Buckets are RADIUS-sized (edge = ``radius``), not the index's fixed 0.1
    deg cells: with fixed cells a dense cell costs O(cell_population^2)
    compares no matter how small the radius — bucketing at the radius makes
    per-bucket work O(points within ~radius of each other), i.e. proportional
    to the OUTPUT pair count, which is optimal for this plan. Any radius is
    accepted (the old fixed-cell form required radius <= 0.1). Shuffle
    payload is (bucket, id, lon, lat, home) x9 — never tags or payload
    columns; a region dense at the radius scale still concentrates in one
    bucket, the same skew caveat as every cell groupby.
    """
    r2 = float(radius) * float(radius)
    inv = 1.0 / float(radius)

    def replicate(batch: pa.Table) -> pa.Table:
        ids_ = np.asarray(batch["id"], dtype=np.int64)
        lon = np.asarray(batch["lon"], dtype=np.float64)
        lat = np.asarray(batch["lat"], dtype=np.float64)
        # radius-sized grid; coordinates are bounded (|lon|<=180, |lat|<=90)
        # so bx/by fit comfortably in 31 bits for any radius >= 1e-6 deg
        bx = np.floor(lon * inv).astype(np.int64)
        by = np.floor(lat * inv).astype(np.int64)
        out_bucket, out_home = [], []
        n = len(ids_)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                out_bucket.append(((bx + dx) << np.int64(32)) + (by + dy + (1 << 30)))
                out_home.append(
                    np.full(n, dx == 0 and dy == 0, dtype=np.bool_)
                )
        reps = 9
        return pa.table(
            {
                "bucket": pa.array(np.concatenate(out_bucket)),
                "id": pa.array(np.tile(ids_, reps)),
                "lon": pa.array(np.tile(lon, reps)),
                "lat": pa.array(np.tile(lat, reps)),
                "home": pa.array(np.concatenate(out_home)),
            }
        )

    def pairs_in_bucket(tbl: pa.Table) -> pa.Table:
        ids_ = np.asarray(tbl["id"], dtype=np.int64)
        lon = np.asarray(tbl["lon"], dtype=np.float64)
        lat = np.asarray(tbl["lat"], dtype=np.float64)
        home = np.asarray(tbl["home"], dtype=np.bool_)
        hi = np.flatnonzero(home)
        out_a, out_b, out_d = [], [], []
        # cache-block the home rows against the full bucket
        for s in range(0, len(hi), 512):
            h = hi[s : s + 512]
            dlon = lon[h, None] - lon[None, :]
            dlat = lat[h, None] - lat[None, :]
            d2 = dlon * dlon + dlat * dlat
            keep = (d2 <= r2) & (ids_[h, None] < ids_[None, :])
            ai, bj = np.nonzero(keep)
            out_a.append(ids_[h][ai])
            out_b.append(ids_[bj])
            out_d.append(d2[ai, bj])
        if not out_a:
            return pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                    "dist2": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a)),
                "id_b": pa.array(np.concatenate(out_b)),
                "dist2": pa.array(np.concatenate(out_d)),
            }
        )

    return (
        ds.select_columns(["id", "lon", "lat"])
        .map_batches(replicate, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pyarrow")
    )


def _replicate_3x3_cells(batch: pa.Table) -> pa.Table:
    """9-neighborhood index-cell replication shared by :func:`nn_join` and
    :func:`knn_join`: (bucket, id, lon, lat, home) rows, one per point per
    3x3 cell-block member, home marking the center copy."""
    from ..model import cell_xy, pack_cell

    ids_ = np.asarray(batch["id"], dtype=np.int64)
    lon = np.asarray(batch["lon"], dtype=np.float64)
    lat = np.asarray(batch["lat"], dtype=np.float64)
    cx, cy = cell_xy(lon, lat)
    out_bucket, out_home = [], []
    n = len(ids_)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            out_bucket.append(pack_cell(cx + dx, cy + dy))
            out_home.append(np.full(n, dx == 0 and dy == 0, dtype=np.bool_))
    return pa.table(
        {
            "bucket": pa.array(np.concatenate(out_bucket)),
            "id": pa.array(np.tile(ids_, 9)),
            "lon": pa.array(np.tile(lon, 9)),
            "lat": pa.array(np.tile(lat, 9)),
            "home": pa.array(np.concatenate(out_home)),
        }
    )


def nn_join(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Nearest-neighbour self-join: for every feature, the id and squared
    planar distance of its closest other feature (tie -> smallest id).

    Two-phase exact plan. Phase 1 reuses the radius-join bucketing: each
    point meets everything in its 3x3 cell block and takes the block-local
    minimum. A block-local answer is provably global when d2 <= CELL^2,
    because any point outside the block is strictly farther than one cell
    width. Phase 2 resolves the (rare) unresolved points — isolated ones or
    block minima beyond a cell — DISTRIBUTED via
    :func:`resolve_knn_residue` (expanding coarsened blocks, k=1); the
    driver never materializes more than the resolver's brute_cap tail.
    """
    from ..model import CELL_H, CELL_W, cell_xy, pack_cell

    guarantee2 = float(min(CELL_W, CELL_H)) ** 2

    replicate = _replicate_3x3_cells

    INF = np.inf
    BIG_ID = np.iinfo(np.int64).max

    def block_min(tbl: pa.Table) -> pa.Table:
        ids_ = np.asarray(tbl["id"], dtype=np.int64)
        lon = np.asarray(tbl["lon"], dtype=np.float64)
        lat = np.asarray(tbl["lat"], dtype=np.float64)
        home = np.asarray(tbl["home"], dtype=np.bool_)
        hi = np.flatnonzero(home)
        out = {"id": [], "nn_id": [], "dist2": [], "qlon": [], "qlat": []}
        for s in range(0, len(hi), 512):
            h = hi[s : s + 512]
            dlon = lon[h, None] - lon[None, :]
            dlat = lat[h, None] - lat[None, :]
            d2 = dlon * dlon + dlat * dlat
            d2[ids_[h, None] == ids_[None, :]] = INF  # exclude self
            m = d2.min(axis=1) if d2.shape[1] else np.full(len(h), INF)
            # tie-break: smallest id among the minima
            nn = np.where(d2 == m[:, None], ids_[None, :], BIG_ID).min(axis=1)
            out["id"].append(ids_[h])
            out["nn_id"].append(nn)
            out["dist2"].append(m)
            out["qlon"].append(lon[h])
            out["qlat"].append(lat[h])
        if not out["id"]:
            return pa.table(
                {
                    "id": pa.array([], type=pa.int64()),
                    "nn_id": pa.array([], type=pa.int64()),
                    "dist2": pa.array([], type=pa.float64()),
                    "qlon": pa.array([], type=pa.float64()),
                    "qlat": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "id": pa.array(np.concatenate(out["id"])),
                "nn_id": pa.array(np.concatenate(out["nn_id"])),
                "dist2": pa.array(np.concatenate(out["dist2"])),
                "qlon": pa.array(np.concatenate(out["qlon"])),
                "qlat": pa.array(np.concatenate(out["qlat"])),
            }
        )

    local = (
        ds.select_columns(["id", "lon", "lat"])
        .map_batches(replicate, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(block_min, batch_format="pyarrow")
        .materialize()
    )

    resolved = local.filter(expr=f"dist2 <= {guarantee2!r}").drop_columns(["qlon", "qlat"])

    # phase 2: the unresolved residue stays a Dataset and resolves
    # distributed (k=1) — no driver pull, no broadcast of ids
    residue = (
        local.filter(expr=f"dist2 > {guarantee2!r}")
        .select_columns(["id", "qlon", "qlat"])
        .rename_columns({"qlon": "lon", "qlat": "lat"})
    )
    if residue.count() == 0:
        return resolved
    fixed = resolve_knn_residue(ds, residue, 1, exclude_self=True).drop_columns(["rank"])
    return resolved.union(fixed)


_ATTACH_MUL = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 odd constant


def _attach_int64(
    left: ray.data.Dataset,
    keyed: ray.data.Dataset,
    key_col: str,
    out_name: str,
    n_buckets: int,
) -> ray.data.Dataset:
    """Inner-join lookup without ``Dataset.join``: attach ``keyed``'s ``v``
    to every ``left`` row whose ``key_col`` matches ``keyed.k`` (unique keys;
    unmatched left rows are dropped). All columns must be int64.

    Both sides hash-bucket on the key (multiplicative hash, one groupby
    shuffle over ``n_buckets`` bounded groups) and the match runs vectorized
    inside each bucket (argsort + searchsorted). This sidesteps a Ray Data
    hash-join edge case — a partition that receives zero left rows builds a
    schema-less empty block and Arrow rejects the join — and keeps the
    lookup's memory bounded per bucket rather than per build side.
    """
    left_cols = [c for c in left.schema().names]
    SENT = np.iinfo(np.int64).min

    def bkt_of(k: np.ndarray) -> np.ndarray:
        return ((k.astype(np.uint64) * _ATTACH_MUL) >> np.uint64(40)).astype(
            np.int64
        ) % n_buckets

    def tag_left(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[key_col], dtype=np.int64)
        cols = {"bkt": pa.array(bkt_of(k))}
        for c in left_cols:
            cols[c] = batch[c]
        cols["_v"] = pa.array(np.full(len(k), SENT, dtype=np.int64))
        return pa.table(cols)

    def tag_keyed(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["k"], dtype=np.int64)
        cols = {"bkt": pa.array(bkt_of(k))}
        for c in left_cols:
            cols[c] = pa.array(k if c == key_col else np.zeros(len(k), dtype=np.int64))
        cols["_v"] = batch["v"]
        return pa.table(cols)

    def local(tbl: pa.Table) -> pa.Table:
        v = np.asarray(tbl["_v"], dtype=np.int64)
        k = np.asarray(tbl[key_col], dtype=np.int64)
        is_right = v != SENT
        rk, rv = k[is_right], v[is_right]
        order = np.argsort(rk, kind="stable")
        rk, rv = rk[order], rv[order]
        li = np.flatnonzero(~is_right)
        pos = np.searchsorted(rk, k[li])
        pos_c = np.minimum(pos, max(len(rk) - 1, 0))
        matched = (len(rk) > 0) & (rk[pos_c] == k[li]) if len(rk) else np.zeros(
            len(li), dtype=bool
        )
        keep = li[matched]
        cols = {c: tbl[c].take(pa.array(keep)) for c in left_cols}
        cols[out_name] = pa.array(rv[pos_c[matched]])
        return pa.table(cols)

    return (
        left.map_batches(tag_left, batch_format="pyarrow")
        .union(keyed.map_batches(tag_keyed, batch_format="pyarrow"))
        .groupby("bkt")
        .map_groups(local, batch_format="pyarrow")
    )


def dbscan(
    ds: ray.data.Dataset,
    eps: float,
    min_pts: int,
    *,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Distributed exact DBSCAN over point features (deterministic variant).

    Standard DBSCAN semantics with the one well-known nondeterminism — which
    cluster claims a border point reachable from several — resolved to the
    MINIMUM candidate cluster label, so output is order-independent:

    - ``core``: at least ``min_pts`` points (self included) within ``eps``;
    - cluster = connected component of the core-core eps-graph, labeled by
      its minimum core id;
    - ``border``: non-core within eps of >= 1 core -> min core-neighbor's
      cluster; everything else ``noise`` (cluster -1).

    Distributed plan, all pieces already scale-audited: the eps-neighbor
    graph comes from :func:`radius_join` (grid-bucket replication, one
    cell-keyed shuffle, never all-pairs); degrees are one groupby-count over
    the edge list; core-core components run through
    ``stages.dedup.connected_components`` (hash-min label propagation,
    rounds = graph diameter); the final role/label resolution is ONE
    groupby over a union of small (id, label, flag) row sets — for a core
    point every core neighbor is in the same component, so min() over
    component + neighbor rows cannot mix labels.

    Returns (id, cluster, role). Generalizes the reference's cell-index
    machinery (``src/index/grid_reader.go:39-78``) to density clustering.
    """
    import ray as _ray

    from .dedup import connected_components

    if min_pts < 2:
        raise ValueError("min_pts must be >= 2 (min_pts=1 makes every point core)")
    if num_partitions is None:
        cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
        num_partitions = max(2, cpus // 2)

    pairs = radius_join(ds, eps).select_columns(["id_a", "id_b"]).materialize()

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["id_a"], dtype=np.int64)
        b = np.asarray(batch["id_b"], dtype=np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow").materialize()

    def all_noise(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "id": batch["id"],
                "cluster": pa.array(np.full(n, -1, dtype=np.int64)),
                "role": pa.array(np.full(n, "noise", dtype=object), type=pa.string()),
            }
        )

    if edges.count() == 0:
        # nothing within eps of anything -> all noise (and an empty dataset
        # has no schema to group by)
        return ds.select_columns(["id"]).map_batches(all_noise, batch_format="pyarrow")

    from .group_collect import bucketed_reduce, bucketed_sum

    # degree per point: per-batch unique-count partials + ONE bucketed sum
    # (generic groupby.count is per-group machinery at corpus-scale key
    # cardinality — minutes at ~2M groups by the repo's measured rule)
    def deg_partial(batch: pa.Table) -> pa.Table:
        u, c = np.unique(np.asarray(batch["src"], dtype=np.int64), return_counts=True)
        return pa.table({"src": pa.array(u), "n_nbr": pa.array(c.astype(np.int64))})

    deg = bucketed_sum(
        edges.map_batches(deg_partial, batch_format="pyarrow"), ["src"], ["n_nbr"]
    )
    # |N(p)| includes p itself in the classic formulation -> degree+1
    core = (
        deg.filter(expr=f"n_nbr >= {min_pts - 1}")
        .select_columns(["src"])
        .rename_columns({"src": "cid"})
        .materialize()
    )

    if core.count() == 0:
        # no dense region anywhere -> everything is noise
        return ds.select_columns(["id"]).map_batches(all_noise, batch_format="pyarrow")

    n_buckets = num_partitions * 4

    # core-core edges: filter both endpoints through the core set with the
    # bucketed local lookup (no Dataset.join -- see _attach_int64)
    core_flag = core.map_batches(
        lambda b: pa.table(
            {"k": b["cid"], "v": pa.array(np.ones(b.num_rows, dtype=np.int64))}
        ),
        batch_format="pyarrow",
    )
    core_pairs = (
        _attach_int64(
            _attach_int64(edges, core_flag, "src", "cs", n_buckets),
            core_flag,
            "dst",
            "cd",
            n_buckets,
        )
        .filter(expr="src < dst")
        .select_columns(["src", "dst"])
        .rename_columns({"src": "id_a", "dst": "id_b"})
        .materialize()
    )
    # tiny graphs -> one partition: a hash-join partition that receives zero
    # left rows builds a schema-less empty block and Arrow rejects the join
    np_cc = 1 if core.count() < 2048 else num_partitions
    comp = connected_components(
        core.rename_columns({"cid": "id"}), core_pairs, num_partitions=np_cc
    ).materialize()  # (id, group_id) for core points only

    # every point's min core-neighbor cluster: pull dst's component label
    # onto each edge (inner semantics drop non-core dst), groupby-min on src
    comp_kv = comp.rename_columns({"id": "k", "group_id": "v"})

    def nmin_partial(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch["src"], dtype=np.int64)
        grp = np.asarray(batch["grp"], dtype=np.int64)
        u, inv = np.unique(src, return_inverse=True)
        m = np.full(len(u), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(m, inv, grp)
        return pa.table({"src": pa.array(u), "grp": pa.array(m)})

    neighbor_min = bucketed_reduce(
        _attach_int64(edges, comp_kv, "dst", "grp", n_buckets)
        .select_columns(["src", "grp"])
        .map_batches(nmin_partial, batch_format="pyarrow"),
        ["src"],
        {"grp": "min"},
    )
    nm_col = "grp"

    SENT = np.iinfo(np.int64).max

    def comp_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "id": batch["id"],
                "grp": batch["group_id"],
                "is_core": pa.array(np.ones(n, dtype=np.int64)),
            }
        )

    def neighbor_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "id": batch["src"],
                "grp": batch[nm_col],
                "is_core": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    def base_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "id": batch["id"],
                "grp": pa.array(np.full(n, SENT, dtype=np.int64)),
                "is_core": pa.array(np.zeros(n, dtype=np.int64)),
            }
        )

    merged = bucketed_reduce(
        comp.map_batches(comp_rows, batch_format="pyarrow")
        .union(neighbor_min.map_batches(neighbor_rows, batch_format="pyarrow"))
        .union(ds.select_columns(["id"]).map_batches(base_rows, batch_format="pyarrow")),
        ["id"],
        {"grp": "min", "is_core": "max"},
    )

    ROLES = np.array(["noise", "border", "core"], dtype=object)

    def finalize(batch: pa.Table) -> pa.Table:
        grp = np.asarray(batch["grp"], dtype=np.int64)
        is_core = np.asarray(batch["is_core"], dtype=np.int64)
        cluster = np.where(grp == SENT, np.int64(-1), grp)
        role = ROLES[np.where(is_core == 1, 2, np.where(cluster >= 0, 1, 0))]
        return pa.table(
            {
                "id": batch["id"],
                "cluster": pa.array(cluster),
                "role": pa.array(role, type=pa.string()),
            }
        )

    return merged.map_batches(finalize, batch_format="pyarrow")


def _residue_round_fns(level: int, needed_ref, g2: float, k: int, exclude_self: bool, final: bool):
    """Per-level kernels for :func:`resolve_knn_residue`, bound via factory
    locals so lazy execution after the loop advances ``level`` stays correct."""
    from ..model import cell_xy

    def corpus_side(batch: pa.Table) -> pa.Table:
        need = bget(needed_ref)
        lon = np.asarray(batch["lon"], dtype=np.float64)
        lat = np.asarray(batch["lat"], dtype=np.float64)
        cx, cy = cell_xy(lon, lat)
        cell = pack_cell(cx >> level, cy >> level)
        if len(need):
            pos = np.searchsorted(need, cell)
            pos[pos >= len(need)] = len(need) - 1
            keep = need[pos] == cell
        else:
            keep = np.zeros(len(cell), dtype=bool)
        t = batch.filter(pa.array(keep))
        return pa.table(
            {
                "bucket": pa.array(cell[keep]),
                "id": t["id"],
                "lon": t["lon"],
                "lat": t["lat"],
                "is_query": pa.array(np.zeros(len(t), dtype=np.bool_)),
            }
        )

    def query_side(batch: pa.Table) -> pa.Table:
        lon = np.asarray(batch["lon"], dtype=np.float64)
        lat = np.asarray(batch["lat"], dtype=np.float64)
        ids_ = np.asarray(batch["id"], dtype=np.int64)
        cx, cy = cell_xy(lon, lat)
        cxl, cyl = cx >> level, cy >> level
        buckets = [
            pack_cell(cxl + dx, cyl + dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        ]
        n = len(ids_)
        return pa.table(
            {
                "bucket": pa.array(np.concatenate(buckets)),
                "id": pa.array(np.tile(ids_, 9)),
                "lon": pa.array(np.tile(lon, 9)),
                "lat": pa.array(np.tile(lat, 9)),
                "is_query": pa.array(np.ones(9 * n, dtype=np.bool_)),
            }
        )

    _EMPTY_PART = pa.table(
        {
            "id": pa.array([], type=pa.int64()),
            "nn_id": pa.array([], type=pa.int64()),
            "dist2": pa.array([], type=pa.float64()),
            "qlon": pa.array([], type=pa.float64()),
            "qlat": pa.array([], type=pa.float64()),
        }
    )

    def partial_topk(tbl: pa.Table) -> pa.Table:
        isq = np.asarray(tbl["is_query"], dtype=np.bool_)
        if not isq.any():
            return _EMPTY_PART
        ids_ = np.asarray(tbl["id"], dtype=np.int64)
        lon = np.asarray(tbl["lon"], dtype=np.float64)
        lat = np.asarray(tbl["lat"], dtype=np.float64)
        qi = np.flatnonzero(isq)
        ci = np.flatnonzero(~isq)
        # corpus sorted by id -> stable lexsort reproduces the (dist2, id)
        # tie-break of the SQL twin
        corder = ci[np.argsort(ids_[ci], kind="stable")]
        cid, clon, clat = ids_[corder], lon[corder], lat[corder]
        out = {c: [] for c in ("id", "nn_id", "dist2", "qlon", "qlat")}
        if len(cid) == 0:
            # keep empty-block queries alive for the next round
            out["id"].append(ids_[qi])
            out["nn_id"].append(np.full(len(qi), -1, dtype=np.int64))
            out["dist2"].append(np.full(len(qi), np.inf))
            out["qlon"].append(lon[qi])
            out["qlat"].append(lat[qi])
        for s in range(0, len(qi) if len(cid) else 0, 256):
            h = qi[s : s + 256]
            cand_id, cand_d2 = [], []
            # slab the corpus axis: a coarse block can cover a dense cluster,
            # so per-task memory must not scale with the block population
            for cs in range(0, len(cid), 65536):
                sl = slice(cs, cs + 65536)
                dlon = lon[h, None] - clon[None, sl]
                dlat = lat[h, None] - clat[None, sl]
                d2 = dlon * dlon + dlat * dlat
                if exclude_self:
                    d2[ids_[h, None] == cid[None, sl]] = np.inf
                kk = min(k, d2.shape[1])
                order = np.lexsort(
                    (np.broadcast_to(cid[sl], d2.shape), d2), axis=1
                )[:, :kk]
                cand_id.append(cid[sl][order])
                cand_d2.append(np.take_along_axis(d2, order, axis=1))
            ad = np.concatenate(cand_d2, axis=1)
            ai = np.concatenate(cand_id, axis=1)
            order = np.lexsort((ai, ad), axis=1)[:, : min(k, ad.shape[1])]
            sd2 = np.take_along_axis(ad, order, axis=1)
            sid = np.take_along_axis(ai, order, axis=1)
            fin = np.isfinite(sd2)
            rows, _ = np.nonzero(fin)
            out["id"].append(np.repeat(ids_[h], fin.sum(axis=1)))
            out["nn_id"].append(sid[fin])
            out["dist2"].append(sd2[fin])
            out["qlon"].append(np.repeat(lon[h], fin.sum(axis=1)))
            out["qlat"].append(np.repeat(lat[h], fin.sum(axis=1)))
            # queries whose every candidate is inf (self-only block) still
            # need a carrier row
            none = ~fin.any(axis=1)
            if none.any():
                out["id"].append(ids_[h][none])
                out["nn_id"].append(np.full(int(none.sum()), -1, dtype=np.int64))
                out["dist2"].append(np.full(int(none.sum()), np.inf))
                out["qlon"].append(lon[h][none])
                out["qlat"].append(lat[h][none])
        if not out["id"]:
            return _EMPTY_PART
        return pa.table(
            {
                "id": pa.array(np.concatenate(out["id"]).astype(np.int64)),
                "nn_id": pa.array(np.concatenate(out["nn_id"]).astype(np.int64)),
                "dist2": pa.array(np.concatenate(out["dist2"])),
                "qlon": pa.array(np.concatenate(out["qlon"])),
                "qlat": pa.array(np.concatenate(out["qlat"])),
            }
        )

    def merge_topk(tbl: pa.Table) -> pa.Table:
        qid = np.asarray(tbl["id"], dtype=np.int64)
        nn = np.asarray(tbl["nn_id"], dtype=np.int64)
        d2 = np.asarray(tbl["dist2"], dtype=np.float64)
        qlon = np.asarray(tbl["qlon"], dtype=np.float64)
        qlat = np.asarray(tbl["qlat"], dtype=np.float64)
        # candidates are unique per (query, corpus point): a corpus point
        # lives in exactly one level-L cell, so no cross-bucket duplicates
        order = np.lexsort((nn, d2, qid))
        qid, nn, d2 = qid[order], nn[order], d2[order]
        qlon, qlat = qlon[order], qlat[order]
        starts = np.ones(len(qid), dtype=bool)
        starts[1:] = qid[1:] != qid[:-1]
        sidx = np.flatnonzero(starts)
        ends = np.append(sidx[1:], len(qid))
        out = {c: [] for c in ("id", "rank", "nn_id", "dist2", "ok", "lon", "lat")}
        for s, e in zip(sidx, ends):
            cand = slice(s, min(e, s + k))
            cd2 = d2[cand]
            cnn = nn[cand]
            real = np.isfinite(cd2) & (cnn >= 0)
            nreal = int(real.sum())
            ok = final or (nreal == k and cd2[real][-1] <= g2)
            if ok and nreal:
                out["id"].append(np.full(nreal, qid[s]))
                out["rank"].append(np.arange(1, nreal + 1, dtype=np.int64))
                out["nn_id"].append(cnn[real])
                out["dist2"].append(cd2[real])
                out["ok"].append(np.ones(nreal, dtype=np.bool_))
                out["lon"].append(np.full(nreal, qlon[s]))
                out["lat"].append(np.full(nreal, qlat[s]))
            else:
                out["id"].append(np.array([qid[s]]))
                out["rank"].append(np.array([1], dtype=np.int64))
                out["nn_id"].append(np.array([-1], dtype=np.int64))
                out["dist2"].append(np.array([np.inf]))
                out["ok"].append(np.zeros(1, dtype=np.bool_))
                out["lon"].append(np.array([qlon[s]]))
                out["lat"].append(np.array([qlat[s]]))
        return pa.table(
            {
                "id": pa.array(np.concatenate(out["id"]).astype(np.int64)),
                "rank": pa.array(np.concatenate(out["rank"]).astype(np.int64)),
                "nn_id": pa.array(np.concatenate(out["nn_id"]).astype(np.int64)),
                "dist2": pa.array(np.concatenate(out["dist2"])),
                "ok": pa.array(np.concatenate(out["ok"])),
                "lon": pa.array(np.concatenate(out["lon"])),
                "lat": pa.array(np.concatenate(out["lat"])),
            }
        )

    return corpus_side, query_side, partial_topk, merge_topk


#: one 3x3 block at this level spans every occupiable base cell
#: (2^13 = 8192 > 3600 cells across the lon range), so the final round is
#: exact by construction and the loop always terminates
_RESIDUE_MAX_LEVEL = 13


def resolve_knn_residue(
    ds: ray.data.Dataset,
    residue: ray.data.Dataset,
    k: int,
    exclude_self: bool = True,
    brute_cap: int = 50_000,
) -> ray.data.Dataset:
    """Exact kNN for ``residue`` queries (id, lon, lat) against ``ds``,
    fully distributed — replaces the former driver-side whole-corpus brute
    force (r02 verdict #4), whose cost was O(residue x N) with an unbounded
    driver pull on sparse/skewed data.

    Expanding coarsened-block rounds: at level L the grid coarsens to
    2^L x 2^L base cells, each residue query replicates to its 3x3 level-L
    block, the corpus is filtered MAP-SIDE to the needed level-L cells (the
    driver holds only the unique needed-cell array, which shrinks 4x per
    level) and grouped per block. A query resolves when its kth candidate
    lies within the level guarantee (any point outside the block is farther
    than 2^L * min cell side). Once the residue fits ``brute_cap`` the
    remaining queries go through the broadcast :func:`knn_bruteforce`
    (driver pull bounded by the cap); at ``_RESIDUE_MAX_LEVEL`` a block
    covers the world, so the loop cannot fail to terminate.

    Returns (id, rank, nn_id, dist2) with rank 1..min(k, available) per
    query, ordered by (dist2, nn_id) — the SQL twin's tie-break.
    """
    import ray as _ray

    from ..model import cell_xy

    guarantee0 = float(min(CELL_W, CELL_H))
    corpus = ds.select_columns(["id", "lon", "lat"])
    resolved_parts: list[ray.data.Dataset] = []
    residue = residue.materialize()
    n_res = residue.count()
    level = 1
    while n_res > brute_cap and level <= _RESIDUE_MAX_LEVEL:
        cell_parts = []
        for b in residue.select_columns(["lon", "lat"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        ):
            cx, cy = cell_xy(
                np.asarray(b["lon"], dtype=np.float64),
                np.asarray(b["lat"], dtype=np.float64),
            )
            cxl, cyl = cx >> level, cy >> level
            cell_parts.append(
                np.unique(
                    np.concatenate(
                        [
                            pack_cell(cxl + dx, cyl + dy)
                            for dx in (-1, 0, 1)
                            for dy in (-1, 0, 1)
                        ]
                    )
                )
            )
        needed = (
            np.unique(np.concatenate(cell_parts))
            if cell_parts
            else np.array([], dtype=np.int64)
        )
        needed_ref = _ray.put(needed)
        g2 = (guarantee0 * float(1 << level)) ** 2
        final = level == _RESIDUE_MAX_LEVEL
        corpus_side, query_side, partial_topk, merge_topk = _residue_round_fns(
            level, needed_ref, g2, k, exclude_self, final
        )
        merged = (
            corpus.map_batches(corpus_side, batch_format="pyarrow")
            .union(residue.map_batches(query_side, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(partial_topk, batch_format="pyarrow")
            .groupby("id")
            .map_groups(merge_topk, batch_format="pyarrow")
            .materialize()
        )
        resolved_parts.append(
            merged.filter(expr="ok == True").select_columns(
                ["id", "rank", "nn_id", "dist2"]
            )
        )
        residue = (
            merged.filter(expr="ok == False")
            .select_columns(["id", "lon", "lat"])
            .materialize()
        )
        n_res = residue.count()
        level += 1

    if n_res > 0:
        assert n_res <= brute_cap, (
            f"kNN residue {n_res} exceeds brute_cap {brute_cap} after the "
            "final coarsened-block round — unreachable by construction"
        )
        pts = residue.to_pandas().sort_values("id")
        qpts = np.stack(
            [pts["lon"].to_numpy(np.float64), pts["lat"].to_numpy(np.float64)], axis=1
        )
        qids = pts["id"].to_numpy(dtype=np.int64)
        extra = 1 if exclude_self else 0
        fb = knn_bruteforce(ds, qpts, k + extra).to_pandas()
        fb["self_id"] = qids[fb["qid"].to_numpy()]
        if exclude_self:
            fb = fb[fb["id"] != fb["self_id"]]
        fb = fb.sort_values(["qid", "rank"]).groupby("qid").head(k)
        fb["new_rank"] = fb.groupby("qid").cumcount() + 1
        fixed = pa.table(
            {
                "id": pa.array(fb["self_id"].to_numpy(dtype=np.int64)),
                "rank": pa.array(fb["new_rank"].to_numpy(dtype=np.int64)),
                "nn_id": pa.array(fb["id"].to_numpy(dtype=np.int64)),
                "dist2": pa.array(fb["dist2"].to_numpy(dtype=np.float64)),
            }
        )
        resolved_parts.append(ray.data.from_arrow(fixed))

    if not resolved_parts:
        return ray.data.from_arrow(
            pa.table(
                {
                    "id": pa.array([], type=pa.int64()),
                    "rank": pa.array([], type=pa.int64()),
                    "nn_id": pa.array([], type=pa.int64()),
                    "dist2": pa.array([], type=pa.float64()),
                }
            )
        )
    out = resolved_parts[0]
    for p in resolved_parts[1:]:
        out = out.union(p)
    return out


def knn_join(ds: ray.data.Dataset, k: int = 3) -> ray.data.Dataset:
    """k-nearest-neighbour self-join: for every feature, its k closest
    other features as (id, rank, nn_id, dist2), rank 1..k ordered by
    (dist2 asc, id asc) — the all-rows generalization of :func:`nn_join`.

    Same two-phase exact plan: 3x3 cell-block local top-k (the block answer
    is provably global when the K-TH distance <= CELL^2 — any point outside
    the block is strictly farther than one cell width), then the residue
    (isolated points, or kth neighbour beyond a cell) resolves DISTRIBUTED
    via :func:`resolve_knn_residue` (expanding coarsened blocks; the driver
    never holds more than the brute_cap tail). Block points are pre-sorted
    by id so a stable argsort on distance reproduces the SQL twin's
    ROW_NUMBER (ORDER BY dist2, id) tie-break exactly.
    """
    from ..model import CELL_H, CELL_W, cell_xy, pack_cell

    guarantee2 = float(min(CELL_W, CELL_H)) ** 2

    replicate = _replicate_3x3_cells

    def block_topk(tbl: pa.Table) -> pa.Table:
        ids_ = np.asarray(tbl["id"], dtype=np.int64)
        order = np.argsort(ids_, kind="stable")  # id order for tie-breaks
        ids_ = ids_[order]
        lon = np.asarray(tbl["lon"], dtype=np.float64)[order]
        lat = np.asarray(tbl["lat"], dtype=np.float64)[order]
        home = np.asarray(tbl["home"], dtype=np.bool_)[order]
        hi = np.flatnonzero(home)
        out = {"id": [], "rank": [], "nn_id": [], "dist2": [], "ok": [], "qlon": [], "qlat": []}
        m = len(ids_)
        for s in range(0, len(hi), 256):
            h = hi[s : s + 256]
            dlon = lon[h, None] - lon[None, :]
            dlat = lat[h, None] - lat[None, :]
            d2 = dlon * dlon + dlat * dlat
            d2[ids_[h, None] == ids_[None, :]] = np.inf  # exclude self
            kk = min(k, max(m - 1, 0))
            if kk == 0:
                # point alone in its 3x3 block: emit a placeholder row so the
                # residue resolver still sees it (carrying its coordinates)
                rows = len(h)
                out["id"].append(ids_[h])
                out["rank"].append(np.zeros(rows, dtype=np.int64))
                out["nn_id"].append(np.full(rows, -1, dtype=np.int64))
                out["dist2"].append(np.full(rows, np.inf))
                out["ok"].append(np.zeros(rows, dtype=np.bool_))
                out["qlon"].append(lon[h])
                out["qlat"].append(lat[h])
                continue
            idx = np.argsort(d2, axis=1, kind="stable")[:, :kk]
            nn = ids_[idx]
            nd = np.take_along_axis(d2, idx, axis=1)
            # resolved iff we found k finite neighbours and the kth is
            # within the one-cell guarantee
            ok = (
                (nd.shape[1] == k)
                & np.isfinite(nd).all(axis=1)
                & (nd[:, -1] <= guarantee2)
            )
            rows = len(h)
            out["id"].append(np.repeat(ids_[h], nd.shape[1]))
            out["rank"].append(np.tile(np.arange(1, nd.shape[1] + 1), rows))
            out["nn_id"].append(nn.ravel())
            out["dist2"].append(nd.ravel())
            out["ok"].append(np.repeat(ok, nd.shape[1]))
            out["qlon"].append(np.repeat(lon[h], nd.shape[1]))
            out["qlat"].append(np.repeat(lat[h], nd.shape[1]))
        if not out["id"]:
            return pa.table(
                {
                    "id": pa.array([], type=pa.int64()),
                    "rank": pa.array([], type=pa.int64()),
                    "nn_id": pa.array([], type=pa.int64()),
                    "dist2": pa.array([], type=pa.float64()),
                    "ok": pa.array([], type=pa.bool_()),
                    "qlon": pa.array([], type=pa.float64()),
                    "qlat": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "id": pa.array(np.concatenate(out["id"])),
                "rank": pa.array(np.concatenate(out["rank"]).astype(np.int64)),
                "nn_id": pa.array(np.concatenate(out["nn_id"])),
                "dist2": pa.array(np.concatenate(out["dist2"])),
                "ok": pa.array(np.concatenate(out["ok"])),
                "qlon": pa.array(np.concatenate(out["qlon"])),
                "qlat": pa.array(np.concatenate(out["qlat"])),
            }
        )

    local = (
        ds.select_columns(["id", "lon", "lat"])
        .map_batches(replicate, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(block_topk, batch_format="pyarrow")
        .materialize()
    )
    resolved = local.filter(expr="ok == True").drop_columns(["ok", "qlon", "qlat"])

    # unresolved queries carry their own coordinates (one row at rank <= 1),
    # so the residue stays a Dataset — no driver pull, no broadcast of ids
    residue = (
        local.filter(expr="ok == False")
        .filter(expr="rank <= 1")
        .select_columns(["id", "qlon", "qlat"])
        .rename_columns({"qlon": "lon", "qlat": "lat"})
    )
    if residue.count() == 0:
        return resolved
    fixed = resolve_knn_residue(ds, residue, k, exclude_self=True)
    return resolved.union(fixed)


def knn_regress(
    ds: ray.data.Dataset,
    values: ray.data.Dataset,
    query_points: np.ndarray,
    k: int,
) -> ray.data.Dataset:
    """kNN regression: predict an integer attribute at each query point as
    the FLOORED MEAN of its k nearest neighbors' values — the lazy-learner
    baseline every spatial-ML pipeline starts from.

    Composition of existing scale-safe pieces: :func:`knn_bruteforce`
    (broadcast queries, per-batch top-k partials) finds the neighbor ids;
    the neighbor values attach through the bucketed int64 lookup
    (``values`` = (k, v) rows, the whole corpus never joins — only Q*k
    lookup rows shuffle); one qid groupby sums. Floored integer division
    keeps the estimate bit-exact distributed. Output: (qid, est,
    n_neighbors).
    """
    from ray.data.aggregate import Sum

    nn = knn_bruteforce(ds, query_points, k).select_columns(["qid", "id"])
    att = _attach_int64(nn, values, "id", "val", 16)

    def partial(batch: pa.Table) -> pa.Table:
        qid = np.asarray(batch["qid"], dtype=np.int64)
        val = np.asarray(batch["val"], dtype=np.int64)
        u, inv = np.unique(qid, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        c = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, val)
        np.add.at(c, inv, 1)
        return pa.table({"qid": pa.array(u), "vs": pa.array(s), "vc": pa.array(c)})

    def finish(batch: pa.Table) -> pa.Table:
        vs = np.asarray(batch["vs"], dtype=np.int64)
        vc = np.asarray(batch["vc"], dtype=np.int64)
        return pa.table(
            {
                "qid": batch["qid"],
                "est": pa.array(vs // vc),
                "n_neighbors": pa.array(vc),
            }
        )

    return (
        att.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .groupby("qid")
        .aggregate(Sum("vs", alias_name="vs"), Sum("vc", alias_name="vc"))
        .map_batches(finish, batch_format="pyarrow")
    )
