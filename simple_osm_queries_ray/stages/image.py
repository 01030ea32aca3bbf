"""Image-processing stages over binary payload columns (actor pools, ST6).

The decode / feature / resize stages are real Ray Data plumbing over the
opaque ``bytes`` column: callable classes (one setup per actor, work per
batch), small batch sizes for wide binary rows, Arrow binary in / Arrow out.
Only the codecs behind them are deterministic stand-ins (this container
ships no image/video library): SOQR for stills (``sources/images.py``) and
SOQV (length-prefixed SOQR frames) for video — the frame sampler's batch
sizing, fan-out and schema are real, and real ffmpeg/PyAV decoders slot
into the actors' ``__init__``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..sources.images import decode_image


class ImageDecoder:
    """Actor-pool stage: decode bytes -> per-image stats + verified phash.

    __init__ is the once-per-actor setup point (a real deployment would load
    libjpeg or a GPU decoder here).
    """

    def __init__(self):
        from ..sources.images import average_hash

        self._hash = average_hash

    def __call__(self, batch: pa.Table) -> pa.Table:
        means = np.empty((len(batch), 3), dtype=np.float64)
        phash = np.empty(len(batch), dtype=np.int64)
        for i, blob in enumerate(batch["bytes"]):
            px = decode_image(blob.as_py())
            means[i] = px.reshape(-1, 3).mean(axis=0)
            phash[i] = self._hash(px)
        return pa.table(
            {
                "image_id": batch["image_id"],
                "mean_r": pa.array(means[:, 0]),
                "mean_g": pa.array(means[:, 1]),
                "mean_b": pa.array(means[:, 2]),
                "phash_decoded": pa.array(phash),
                "phash": batch["phash"],
            }
        )


def _pool(concurrency):
    """Normalize a concurrency spec to an autoscaling (1, n) actor pool.

    A fixed int pins min actors == n; when the input has fewer blocks than
    n, Ray warns (and can deadlock on tight CPU budgets). Min-1 pools keep
    the same ceiling without demanding more actors than there is input."""
    if isinstance(concurrency, int):
        return (1, max(1, concurrency))
    return concurrency


def decode_features(ds: ray.data.Dataset, concurrency: int | None = None) -> ray.data.Dataset:
    # small batches: binary payload rows are wide (guide: size batch x
    # concurrency to the worker heap); pool sized to half the CPUs so the
    # producer stage never starves (see stages/text.py note)
    if concurrency is None:
        import ray as _ray

        # autoscaling pool (min 1): a fixed min > 1 can deadlock when the
        # input has fewer blocks than the pool or the CPU budget is tight
        concurrency = (1, max(1, int(_ray.cluster_resources().get("CPU", 4)) // 2))
    return ds.map_batches(
        ImageDecoder, batch_format="pyarrow", batch_size=256,
        concurrency=_pool(concurrency),
    )


class ImageResizer:
    """Nearest-neighbour resize to a fixed (w, h); re-encodes losslessly."""

    def __init__(self, out_w: int = 16, out_h: int = 16):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.images import encode_image

        out = []
        for blob in batch["bytes"]:
            px = decode_image(blob.as_py())
            h, w, _ = px.shape
            ys = (np.arange(self.out_h) * h) // self.out_h
            xs = (np.arange(self.out_w) * w) // self.out_w
            out.append(encode_image(px[np.ix_(ys, xs)], "png"))
        return pa.table(
            {
                "image_id": batch["image_id"],
                "bytes": pa.array(out, type=pa.binary()),
                "w": pa.array(np.full(len(out), self.out_w, dtype=np.int32)),
                "h": pa.array(np.full(len(out), self.out_h, dtype=np.int32)),
            }
        )


def resize_images(ds: ray.data.Dataset, w: int = 16, h: int = 16, concurrency=(1, 4)):
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"out_w": w, "out_h": h},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=_pool(concurrency),
    )


def phash_near_dup(
    images: ray.data.Dataset, *, max_hamming: int = 6, id_prefix: str = "img"
) -> ray.data.Dataset:
    """Near-duplicate image pairs by perceptual-hash Hamming distance.

    The image analogue of SimHash text dedup: the stored ``phash`` column
    feeds the generic 64-bit Hamming pair machinery (chunk-bucket LSH +
    popcount verify, ``stages/dedup.py``). Returns (id_a, id_b) numeric image
    ids (the ``image_id`` string minus its prefix).
    """
    import pyarrow.compute as pc

    from .dedup import hamming_pairs_int64

    def prep(batch: pa.Table) -> pa.Table:
        nums = pc.cast(
            pc.utf8_slice_codeunits(batch["image_id"], len(id_prefix), 99), pa.int64()
        )
        return pa.table({"id": nums, "sig": batch["phash"]})

    return hamming_pairs_int64(
        images.select_columns(["image_id", "phash"]).map_batches(prep, batch_format="pyarrow"),
        sig_col="sig",
        max_hamming=max_hamming,
    )


VIDEO_MAGIC = b"SOQV0"


def encode_video(frames: list, fps: int = 30) -> bytes:
    """SOQV0 container: magic + u16 frame count + u16 fps + concatenated
    length-prefixed SOQR frames. A deterministic stand-in for a real codec
    (ffmpeg/PyAV aren't in this container) — the Ray-side plumbing around it
    is the real deliverable."""
    import struct

    from ..sources.images import encode_image

    blobs = [encode_image(f, "png") for f in frames]
    head = VIDEO_MAGIC + struct.pack("<HH", len(blobs), fps)
    return head + b"".join(struct.pack("<I", len(b)) + b for b in blobs)


def decode_video_frames(data: bytes):
    """Yield (frame_idx, frame_bytes) from a SOQV0 blob."""
    import struct

    if data[:5] != VIDEO_MAGIC:
        raise NotImplementedError(
            "real video decode requires ffmpeg/PyAV, absent from this "
            "container; only the SOQV stand-in container is supported"
        )
    n, _fps = struct.unpack("<HH", data[5:9])
    pos = 9
    for i in range(n):
        (ln,) = struct.unpack("<I", data[pos : pos + 4])
        pos += 4
        yield i, data[pos : pos + ln]
        pos += ln


class VideoFrameSampler:
    """Actor-pool stage: video bytes -> one row per sampled frame.

    Contract: (video_id, bytes) in; (video_id, frame_idx, bytes) out, every
    ``every_n``-th frame. ``__init__`` is the per-actor codec setup point —
    a real deployment opens its ffmpeg/PyAV context here; the SOQV stand-in
    keeps the batch sizing, fan-out row explosion and schema real.
    """

    def __init__(self, every_n: int = 30):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids, idxs, blobs = [], [], []
        for vid, data in zip(batch["video_id"].to_pylist(), batch["bytes"]):
            for i, frame in decode_video_frames(data.as_py()):
                if i % self.every_n == 0:
                    vids.append(vid)
                    idxs.append(i)
                    blobs.append(frame)
        return pa.table(
            {
                "video_id": pa.array(vids, type=pa.string()),
                "frame_idx": pa.array(np.asarray(idxs, dtype=np.int32), type=pa.int32()),
                "bytes": pa.array(blobs, type=pa.binary()),
            }
        )


def sample_video_frames(
    ds: ray.data.Dataset, every_n: int = 30, concurrency=(1, 4)
) -> ray.data.Dataset:
    # tiny batches: each video row fans out to many frame rows, and the
    # binary payload per row is the widest in the engine
    return ds.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"every_n": every_n},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=_pool(concurrency),
    )


def synthetic_video_table(sf_dir: str, frames_per_video: int = 12) -> ray.data.Dataset:
    """documents -> (video_id, bytes[SOQV0], n_frames, caption): every video
    is a deterministic sequence of per-doc RNG frames (same derivation style
    as sources/images.py)."""
    from ..sources.images import reference_pixels
    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        blobs = []
        for i in ids:
            w, h = 8 + int(i % 3) * 4, 8 + int(i % 5) * 2
            frames = [
                reference_pixels(int(i) * 1000 + k, w, h) for k in range(frames_per_video)
            ]
            blobs.append(encode_video(frames))
        return pa.table(
            {
                "video_id": pa.array([f"vid{int(i):08d}" for i in ids], type=pa.string()),
                "bytes": pa.array(blobs, type=pa.binary()),
                "n_frames": pa.array(
                    np.full(len(ids), frames_per_video, dtype=np.int32), type=pa.int32()
                ),
                "caption": batch["text"],
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=256)


def caption_doc_retrieval(sf_dir: str, *, qmod: int = 20, qtokens: int = 8):
    """Cross-modal retrieval: for every query image (id % qmod == 0), find
    the document with the largest distinct-token overlap against the FIRST
    ``qtokens`` caption tokens. Output: (qid, best_doc, score) — argmax by
    (score desc, doc_id asc), all-integer so bit-exact vs SQL.

    Shape: the query set is tiny (benchmarks/query workloads always are vs
    the corpus), so the per-query token sets broadcast once via ray.put;
    the corpus streams through ONE map_batches that scores every (query,
    doc) overlap vectorized (merge on token, groupby count) and emits only
    each batch's best row per query — the driver reduces |queries| x
    |batches| partial rows."""
    import pandas as pd

    from ..sources.images import image_table
    from ..sources.read import read_parquet_sized
    from ..state.broadcast import get as bget
    from .text import _doc_tokens

    q = image_table(sf_dir).select_columns(["image_id", "caption"])

    def pick_queries(batch: pa.Table) -> pa.Table:
        ids = np.asarray([int(s[3:]) for s in batch["image_id"].to_pylist()], dtype=np.int64)
        keep = ids % qmod == 0
        return pa.table(
            {"qid": pa.array(ids[keep]), "caption": batch["caption"].filter(pa.array(keep))}
        )

    qrows = pa.concat_tables(
        q.map_batches(pick_queries, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    qids = np.asarray(qrows["qid"], dtype=np.int64)
    qmap: list[tuple[int, str]] = []
    caps = qrows["caption"].to_pylist()
    for qid, cap in zip(qids, caps):
        toks = cap.lower().split()[:qtokens]
        for t in dict.fromkeys(toks):  # distinct, order-preserving
            qmap.append((int(qid), t))
    qdf = pd.DataFrame(qmap, columns=["qid", "token"])
    ref = ray.put(qdf)

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        qd = bget(ref)
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        flat, doc_of = _doc_tokens(batch["text"].to_pandas())
        if len(flat) == 0:
            return pa.table({"qid": pa.array([], type=pa.int64()),
                             "best_doc": pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.int64())})
        d = pd.DataFrame({"token": flat, "doc": ids[doc_of]}).drop_duplicates()
        sc = d.merge(qd, on="token").groupby(["qid", "doc"], as_index=False).size()
        if len(sc) == 0:
            return pa.table({"qid": pa.array([], type=pa.int64()),
                             "best_doc": pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.int64())})
        sc = sc.sort_values(["qid", "size", "doc"], ascending=[True, False, True], kind="mergesort")
        best = sc.drop_duplicates("qid", keep="first")
        return pa.table(
            {
                "qid": pa.array(best["qid"].to_numpy(), type=pa.int64()),
                "best_doc": pa.array(best["doc"].to_numpy(), type=pa.int64()),
                "score": pa.array(best["size"].to_numpy(), type=pa.int64()),
            }
        )

    parts = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["qid", "score", "best_doc"], ascending=[True, False, True], kind="mergesort")
    return parts.drop_duplicates("qid", keep="first").reset_index(drop=True)


class TileMosaicPartial:
    """Actor-pool stage for the raster mosaic: decode each image once per
    batch (decoder state in __init__) and emit per-(tile) partial sums of
    mean-RGB numerators/denominators — the aggregate ships 4 ints per tile
    per batch instead of pixels."""

    def __init__(self, zoom: int):
        from ..sources.images import decode_image
        from ..sources.synthetic import geolocate
        from .geo import tile_id

        self._decode = decode_image
        self._geolocate = geolocate
        self._tile_of = tile_id
        self.zoom = zoom

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        ids = np.asarray(
            [int(s[3:]) for s in batch["image_id"].to_pylist()], dtype=np.int64
        )
        lon, lat = self._geolocate(ids)
        tiles = self._tile_of(lon, lat, self.zoom)
        sums = np.zeros((len(ids), 3), dtype=np.int64)
        npx = np.zeros(len(ids), dtype=np.int64)
        for i, blob in enumerate(batch["bytes"].to_pylist()):  # decode is per-payload
            px = self._decode(blob)
            sums[i] = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            npx[i] = px.shape[0] * px.shape[1]
        df = pd.DataFrame(
            {"tile": tiles, "r": sums[:, 0], "g": sums[:, 1], "b": sums[:, 2], "n": npx}
        ).groupby("tile", as_index=False).sum()
        return pa.Table.from_pandas(df, preserve_index=False)


def tile_mosaic(ds: ray.data.Dataset, zoom: int = 6, *, concurrency: int = 4):
    """Raster mosaic: mean RGB of all image pixels per raster tile. Output:
    (tile, mean_r, mean_g, mean_b, n_pixels) with means as integer
    milli-values (sum*1000//n) so the result is exactly reproducible.

    Shape: actor-pool decode + per-batch per-tile partial sums, then a tiny
    groupby over (tile) partials — pixels never shuffle."""
    from ray.data.aggregate import Sum

    agg = (
        ds.select_columns(["image_id", "bytes"])
        .map_batches(TileMosaicPartial, fn_constructor_args=(zoom,),
                     concurrency=_pool(concurrency),
                     batch_size=256, batch_format="pyarrow")
        .repartition(4)
        .groupby("tile")
        .aggregate(
            Sum("r", alias_name="r"), Sum("g", alias_name="g"),
            Sum("b", alias_name="b"), Sum("n", alias_name="n"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["n"], dtype=np.int64)
        out = {"tile": batch["tile"]}
        for c, name in (("r", "mean_r_milli"), ("g", "mean_g_milli"), ("b", "mean_b_milli")):
            s = np.asarray(batch[c], dtype=np.int64)
            out[name] = pa.array(s * 1000 // np.maximum(n, 1), type=pa.int64())
        out["n_pixels"] = pa.array(n)
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow")


def tile_best_image(images: ray.data.Dataset, zoom: int = 12) -> ray.data.Dataset:
    """Per map tile: the representative image — longest caption, tie ->
    smallest image_id. The north rule's raster-tile <-> image-feature
    assignment as a grouped top-1: each image geolocates by its id (the same
    derivation that places documents as nodes), assigns a zoom tile, and a
    per-batch vectorized argmax partial keeps one candidate row per
    (batch, tile) BEFORE the shuffle — the exchange carries at most
    (occupied tiles x batches) metadata rows and the binary payload column
    never enters it. Final per-tile winner by (caption_chars DESC, id ASC)
    in one tiny groupby. Output: (tile, image_id, caption_chars)."""
    import pyarrow.compute as pc

    from ..sources.synthetic import geolocate
    from .geo import tile_id

    def _pick(tile, iid, clen, sel_src):
        order = np.lexsort((iid, -clen, tile))
        t_sorted = tile[order]
        first = np.ones(len(t_sorted), dtype=bool)
        first[1:] = t_sorted[1:] != t_sorted[:-1]
        return order[first] if sel_src is None else sel_src[order[first]]

    def partial(batch: pa.Table) -> pa.Table:
        sid = batch["image_id"].combine_chunks() if isinstance(
            batch["image_id"], pa.ChunkedArray
        ) else batch["image_id"]
        ids = np.asarray(
            pc.cast(pc.utf8_slice_codeunits(sid, 3, 99), pa.int64()), dtype=np.int64
        )
        lon, lat = geolocate(ids)
        tile = tile_id(lon, lat, zoom)
        clen = np.asarray(pc.utf8_length(batch["caption"]), dtype=np.int64)
        sel = _pick(tile, ids, clen, None)
        return pa.table(
            {
                "tile": pa.array(tile[sel]),
                "image_id": sid.take(pa.array(sel)),
                "caption_chars": pa.array(clen[sel]),
                "__iid": pa.array(ids[sel]),
            }
        )

    def final(tbl: pa.Table) -> pa.Table:
        tile = np.asarray(tbl["tile"], dtype=np.int64)
        iid = np.asarray(tbl["__iid"], dtype=np.int64)
        clen = np.asarray(tbl["caption_chars"], dtype=np.int64)
        sel = _pick(tile, iid, clen, None)
        return tbl.select(["tile", "image_id", "caption_chars"]).take(pa.array(sel))

    return (
        images.select_columns(["image_id", "caption"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("tile")
        .map_groups(final, batch_format="pyarrow")
    )


def phash_dedup_groups(
    images: ray.data.Dataset, *, max_hamming: int = 6
) -> ray.data.Dataset:
    """Near-duplicate image GROUPS: connected components over the phash
    Hamming pair graph, each image labeled with the minimum reachable numeric
    id (the canonical keep-this-one resolution — the image analogue of
    dedup_groups on text). Pairs come from the chunk-bucket LSH machinery;
    components from the hash-min label propagation in stages/dedup.py.
    Output: (image_id, group_id) for every image, singletons included."""
    import pyarrow.compute as pc

    from .dedup import connected_components

    pairs = phash_near_dup(images, max_hamming=max_hamming)

    def ids_only(batch: pa.Table) -> pa.Table:
        nums = pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 3, 99), pa.int64())
        return pa.table({"id": nums, "image_id": batch["image_id"]})

    withnum = images.select_columns(["image_id"]).map_batches(
        ids_only, batch_format="pyarrow"
    ).materialize()
    labeled = connected_components(withnum.select_columns(["id"]), pairs)
    from .joins import hash_join_attach

    return hash_join_attach(
        withnum, "id", labeled, "id", {"group_id": pa.int64()}
    ).select_columns(["image_id", "group_id"])


def tile_pyramid_best_image(
    images: ray.data.Dataset, zoom: int = 12, min_zoom: int = 0
) -> ray.data.Dataset:
    """Representative image per tile at EVERY zoom in [min_zoom, zoom] — the
    overview a tile server pre-renders, as a hierarchical argmax. Top-1 by
    (caption_chars DESC, id ASC) is a mergeable aggregate, so one streaming
    pass computes each batch's winner per (level, tile) locally (parent
    tiles by integer shifts, all levels packed into one int64 key like
    raster.tile_pyramid) and a single tiny groupby finishes ALL levels at
    once: partial volume is occupied-tiles x levels per block, never
    images x levels, and payload bytes never enter the exchange.
    Output: (zoom, tile, image_id, caption_chars)."""
    import pyarrow.compute as pc

    from ..sources.synthetic import geolocate
    from .geo import tile_id

    if not 0 <= min_zoom <= zoom <= 24:
        raise ValueError(
            f"tile_pyramid_best_image needs 0 <= min_zoom <= zoom <= 24 "
            f"(got {min_zoom}..{zoom}): tile ids reach 4^zoom and would "
            "collide across the zoom*2^50 key packing beyond zoom 24"
        )
    n = np.int64(1 << zoom)
    levels = zoom - min_zoom + 1
    PACK = np.int64(1) << np.int64(50)

    def _first_per_key(keys, iid, clen):
        order = np.lexsort((iid, -clen, keys))
        k_sorted = keys[order]
        first = np.ones(len(k_sorted), dtype=bool)
        first[1:] = k_sorted[1:] != k_sorted[:-1]
        return order[first]

    def partial(batch: pa.Table) -> pa.Table:
        sid = batch["image_id"].combine_chunks() if isinstance(
            batch["image_id"], pa.ChunkedArray
        ) else batch["image_id"]
        ids = np.asarray(
            pc.cast(pc.utf8_slice_codeunits(sid, 3, 99), pa.int64()), dtype=np.int64
        )
        lon, lat = geolocate(ids)
        t = tile_id(lon, lat, zoom)
        clen = np.asarray(pc.utf8_length(batch["caption"]), dtype=np.int64)
        tx, ty = t % n, t // n
        keys = []
        for d in range(levels):
            nz = n >> d
            pt = (ty >> d) * nz + (tx >> d)
            keys.append(np.int64(zoom - d) * PACK + pt)
        k = np.concatenate(keys)
        m = len(ids)
        iid_r = np.tile(ids, levels)
        clen_r = np.tile(clen, levels)
        sel = _first_per_key(k, iid_r, clen_r)
        return pa.table(
            {
                "zt": pa.array(k[sel]),
                "image_id": sid.take(pa.array(sel % m)),
                "caption_chars": pa.array(clen_r[sel]),
                "__iid": pa.array(iid_r[sel]),
            }
        )

    def final(tbl: pa.Table) -> pa.Table:
        k = np.asarray(tbl["zt"], dtype=np.int64)
        iid = np.asarray(tbl["__iid"], dtype=np.int64)
        clen = np.asarray(tbl["caption_chars"], dtype=np.int64)
        sel = _first_per_key(k, iid, clen)
        ks = k[sel]
        out = tbl.select(["image_id", "caption_chars"]).take(pa.array(sel))
        return pa.table(
            {
                "zoom": pa.array(ks // PACK),
                "tile": pa.array(ks % PACK),
                "image_id": out["image_id"],
                "caption_chars": out["caption_chars"],
            }
        )

    return (
        images.select_columns(["image_id", "caption"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("zt")
        .map_groups(final, batch_format="pyarrow")
    )


def quality_filter(
    meta: ray.data.Dataset,
    *,
    min_pixels: int = 256,
    max_aspect: int = 3,
    min_caption_chars: int = 20,
    lossless_only: bool = True,
) -> ray.data.Dataset:
    """Training-data image quality gate over METADATA columns only.

    The standard web-corpus pre-filter (LAION-style): minimum resolution,
    bounded aspect ratio, lossless format, minimum caption length. Aspect is
    an integer cross-multiply (``max_aspect*h >= w AND max_aspect*w >= h``) —
    no float division to drift. Runs on :func:`..sources.images.image_meta_table`
    so the pixel payload is never materialized (projection-pushdown
    discipline); map-only, zero shuffle. Output: image_id, w, h (BIGINT),
    n_pixels, caption_len.
    """
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        w = np.asarray(batch["w"], dtype=np.int64)
        h = np.asarray(batch["h"], dtype=np.int64)
        npix = w * h
        clen = np.asarray(pc.utf8_length(batch["caption"]), dtype=np.int64)
        mask = (
            (npix >= min_pixels)
            & (max_aspect * h >= w)
            & (max_aspect * w >= h)
            & (clen >= min_caption_chars)
        )
        if lossless_only:
            mask &= np.asarray(pc.equal(batch["fmt"], "png"), dtype=np.bool_)
        keep = np.nonzero(mask)[0]
        sel = pa.array(keep)
        return pa.table(
            {
                "image_id": batch["image_id"].take(sel),
                "w": pa.array(w[keep]),
                "h": pa.array(h[keep]),
                "n_pixels": pa.array(npix[keep]),
                "caption_len": pa.array(clen[keep]),
            }
        )

    return meta.map_batches(fn, batch_format="pyarrow")


def dedup_keep_largest(
    meta: ray.data.Dataset, *, num_buckets: int = 64
) -> ray.data.Dataset:
    """Exact-caption image dedup keeping the LARGEST-resolution copy.

    The resolution-aware sibling of exact text dedup: images crawled at
    multiple sizes (originals + thumbnails) share a caption; keep one row
    per caption — max ``w*h``, ties to the smallest id. Scale shape: the
    caption never shuffles — each batch hashes it to 128 bits (two
    independent 64-bit keys, the dedup_exact discipline), pre-reduces
    within the batch, and ships only (h1, h2, id, w, h, n) partials; one
    hash-bucket shuffle on h1 and a vectorized lexsort-argmax per bucket
    finish the job. No bit-packing: an earlier encode packed (npix, id,
    w, h) into one int64 for a Max aggregate, which silently corrupts any
    image wider than 63 px and caps ids at 2^34 — unacceptable for the
    web-crawl inputs this targets. Metadata-only input — pixels never read.
    """
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch["caption"].to_pylist(), dtype=object)
        h1 = pd.util.hash_pandas_object(s, index=False, hash_key="0123456789123456").to_numpy().astype(np.int64)
        h2 = pd.util.hash_pandas_object(s, index=False, hash_key="6543210987654321").to_numpy().astype(np.int64)
        ids = np.asarray(
            [int(x[3:]) for x in batch["image_id"].to_pylist()], dtype=np.int64
        )
        w = np.asarray(batch["w"], dtype=np.int64)
        h = np.asarray(batch["h"], dtype=np.int64)
        n = np.ones(len(ids), dtype=np.int64)
        return _kl_reduce(h1, h2, ids, w, h, n, num_buckets)

    def per_bucket(tbl: pa.Table) -> pa.Table:
        return _kl_reduce(
            np.asarray(tbl["h1"], dtype=np.int64),
            np.asarray(tbl["h2"], dtype=np.int64),
            np.asarray(tbl["id"], dtype=np.int64),
            np.asarray(tbl["w"], dtype=np.int64),
            np.asarray(tbl["h"], dtype=np.int64),
            np.asarray(tbl["n"], dtype=np.int64),
            None,
        )

    def finish(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["id"], dtype=np.int64)
        return pa.table(
            {
                "image_id": pa.array(
                    [f"img{int(i):08d}" for i in ids], type=pa.string()
                ),
                "w": batch["w"],
                "h": batch["h"],
                "n_dups": batch["n"],
            }
        )

    return (
        meta.select_columns(["image_id", "w", "h", "caption"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda t: per_bucket(t.drop_columns(["__bucket"])),
            batch_format="pyarrow",
        )
        .map_batches(finish, batch_format="pyarrow")
    )


def _kl_reduce(h1, h2, ids, w, h, n, num_buckets):
    """Keep the (max npix, min id) row per (h1, h2) and sum the dup counts —
    one lexsort + segment-first pass. With ``num_buckets`` set, re-attach
    the shuffle bucket column (partial stage); None = final per-bucket."""
    npix = w * h
    order = np.lexsort((ids, -npix, h2, h1))
    h1s, h2s = h1[order], h2[order]
    first = np.ones(len(h1s), dtype=bool)
    first[1:] = (h1s[1:] != h1s[:-1]) | (h2s[1:] != h2s[:-1])
    starts = np.flatnonzero(first)
    seg = np.cumsum(first) - 1
    counts = np.zeros(len(starts), dtype=np.int64)
    np.add.at(counts, seg, n[order])
    keep = order[starts]
    out = {
        "h1": pa.array(h1[keep]),
        "h2": pa.array(h2[keep]),
        "id": pa.array(ids[keep]),
        "w": pa.array(w[keep]),
        "h": pa.array(h[keep]),
        "n": pa.array(counts),
    }
    if num_buckets is not None:
        out["__bucket"] = pa.array(
            (h1[keep].astype(np.uint64) % np.uint64(num_buckets)).astype(np.int64)
        )
    return pa.table(out)


# -- training-batch layout operators -----------------------------------------

# Aspect-ratio buckets as (w, h) integer ratios. Assignment is by threshold
# (first bucket whose upper edge exceeds w/h), with every comparison done in
# integer cross-multiplication (w * q < p * h) so the Ray side and the SQL
# oracle agree EXACTLY — no float nearest-neighbor tie-breaking. Edges are
# the midpoints between adjacent bucket ratios: 5/8, 7/8, 7/6, 5/3.
ASPECT_BUCKET_LABELS = ("1:2", "3:4", "1:1", "4:3", "2:1")
ASPECT_BUCKET_EDGES = ((5, 8), (7, 8), (7, 6), (5, 3))  # (p, q): r < p/q


def image_format_stats(meta: ray.data.Dataset) -> ray.data.Dataset:
    """Storage-migration planning rollup per image format: count, total
    payload bytes (the raw-codec size accounting the shard packer uses:
    9-byte header + 3 bytes/pixel), pixel mass and the dimension envelope.
    The per-format byte totals are what a "convert everything above N
    megapixels to format X" migration plan is costed from.

    Scale shape: metadata-only input (``image_meta_table`` — pixels never
    load), one vectorized partial per batch, then a groupby over len(fmts)
    keys. Returns (fmt, n_images, total_bytes, sum_pixels, max_w, max_h).
    """
    from ray.data.aggregate import Max, Sum

    def partial(batch: pa.Table) -> pa.Table:
        w = np.asarray(batch["w"], dtype=np.int64)
        h = np.asarray(batch["h"], dtype=np.int64)
        fmt = np.asarray(batch["fmt"].to_pandas())
        px = w * h
        size = 9 + 3 * px
        uu, inv = np.unique(fmt, return_inverse=True)
        m = len(uu)
        n = np.bincount(inv, minlength=m).astype(np.int64)
        tb = np.zeros(m, dtype=np.int64)
        sp = np.zeros(m, dtype=np.int64)
        np.add.at(tb, inv, size)
        np.add.at(sp, inv, px)
        mw = np.zeros(m, dtype=np.int64)
        mh = np.zeros(m, dtype=np.int64)
        np.maximum.at(mw, inv, w)
        np.maximum.at(mh, inv, h)
        return pa.table(
            {
                "fmt": pa.array(uu.astype(str)),
                "n": pa.array(n),
                "tb": pa.array(tb),
                "sp": pa.array(sp),
                "mw": pa.array(mw),
                "mh": pa.array(mh),
            }
        )

    return (
        meta.map_batches(partial, batch_format="pyarrow")
        .groupby("fmt")
        .aggregate(
            Sum("n", alias_name="n_images"),
            Sum("tb", alias_name="total_bytes"),
            Sum("sp", alias_name="sum_pixels"),
            Max("mw", alias_name="max_w"),
            Max("mh", alias_name="max_h"),
        )
    )


def aspect_ratio_buckets(meta: ray.data.Dataset) -> ray.data.Dataset:
    """SDXL-style aspect-ratio bucketing for resolution-grouped training
    batches: every image is routed to one of five fixed aspect buckets and
    the per-(bucket, fmt) histogram is returned with the ratio range seen.

    Scale shape: metadata-only input (never the pixel payload — use
    ``image_meta_table``), one vectorized comparison pass per batch, then a
    groupby over <= len(buckets) x len(fmts) keys of pre-aggregated partials.
    Returns (bucket, fmt, n_images, min_ratio, max_ratio).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Min

    labels = np.asarray(ASPECT_BUCKET_LABELS, dtype=object)

    def assign(batch: pa.Table) -> pa.Table:
        w = np.asarray(batch["w"], dtype=np.int64)
        h = np.asarray(batch["h"], dtype=np.int64)
        idx = np.full(len(w), len(ASPECT_BUCKET_EDGES), dtype=np.int64)
        # first threshold r < p/q wins; iterate from the top so lower edges
        # overwrite — 4 vectorized comparisons over the batch
        for i in range(len(ASPECT_BUCKET_EDGES) - 1, -1, -1):
            p, q = ASPECT_BUCKET_EDGES[i]
            idx[w * q < p * h] = i
        return pa.table(
            {
                "bucket": pa.array(labels[idx], type=pa.string()),
                "fmt": batch["fmt"],
                "ratio": pa.array(w.astype(np.float64) / h.astype(np.float64)),
            }
        )

    return (
        meta.map_batches(assign, batch_format="pyarrow")
        .groupby(["bucket", "fmt"])
        .aggregate(
            Count(alias_name="n_images"),
            Min("ratio", alias_name="min_ratio"),
            Max("ratio", alias_name="max_ratio"),
        )
    )


IMG_SHARD_BUDGET = 65536  # bytes per output shard at test scale


def image_shard_packing(
    sf_dir: str,
    budget: int = IMG_SHARD_BUDGET,
    bucket_size: int = 256,
) -> ray.data.Dataset:
    """WebDataset-style sequential shard packing: images are laid out in
    image_id order and cut into shards of ``budget`` bytes — shard =
    (total payload bytes BEFORE this image) // budget. The layout is the
    tar-shard manifest a multimodal training job consumes.

    Scale shape: the global prefix sum is two-tier. Pass 1 reduces the
    corpus to per-bucket byte sums (bucket = doc_id // bucket_size; a
    ~N/bucket_size-row table) whose exclusive prefix is computed driver-side
    and broadcast; pass 2 co-locates each bucket with one groupby of THREE
    int64 columns (the payload is dropped in the very first map) and a
    vectorized cumsum finishes each group. At 10^12 images raise
    bucket_size so the pass-1 table stays driver-sized, or tier pass 1 once
    more; payload bytes never move through either shuffle.

    Returns (image_id, size_bytes, shard).
    """
    import pyarrow.compute as pc
    import ray

    from ..sources.images import image_table

    def sizes(batch: pa.Table) -> pa.Table:
        ids = np.asarray(
            pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 3, 99), pa.int64()),
            dtype=np.int64,
        )
        size = np.asarray(pc.binary_length(batch["bytes"]), dtype=np.int64)
        return pa.table(
            {"doc_id": ids, "size_bytes": size, "bucket": ids // bucket_size}
        )

    sized = image_table(sf_dir).map_batches(sizes, batch_format="pyarrow").materialize()

    def bucket_partial(batch: pa.Table) -> pa.Table:
        b = np.asarray(batch["bucket"], dtype=np.int64)
        s = np.asarray(batch["size_bytes"], dtype=np.int64)
        uniq, inv = np.unique(b, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, s)
        return pa.table({"bucket": pa.array(uniq), "b": pa.array(sums)})

    parts = sized.map_batches(bucket_partial, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("bucket", sort=True)["b"].sum()
    buckets = agg.index.to_numpy(dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(agg.to_numpy(dtype=np.int64))[:-1]))
    off_ref = ray.put((buckets, offsets))

    def pack(group: pa.Table) -> pa.Table:
        bkts, offs = ray.get(off_ref)
        ids = np.asarray(group["doc_id"], dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        size = np.asarray(group["size_bytes"], dtype=np.int64)[order]
        bucket = int(group["bucket"][0].as_py())
        base = offs[np.searchsorted(bkts, bucket)]
        prefix = base + np.cumsum(size) - size
        return pa.table(
            {
                "image_id": pa.array(
                    [f"img{int(i):08d}" for i in ids], type=pa.string()
                ),
                "size_bytes": pa.array(size),
                "shard": pa.array(prefix // budget),
            }
        )

    return sized.groupby("bucket").map_groups(pack, batch_format="pyarrow")


def tile_image_node_stats(sf_dir: str, zoom: int = 12, lang: str = "de") -> ray.data.Dataset:
    """Cross-modal raster rollup — the graft's three families in one plan:
    per raster tile, the geolocated IMAGE count + total caption length
    (image family) and the count of ``lang``-tagged OSM nodes (vector
    family), joined on the tile key (raster family).

    Scale shape: both sides pre-aggregate to tile-keyed partials inside
    map_batches (payload/caption never leave the map stage; the node side
    projects two columns at the read), the partials union, and ONE tiny
    tile-keyed groupby sums them — no corpus-sized shuffle, no join
    operator. Output: (tile, n_images, sum_caption_len, n_nodes).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from ..sources.images import image_meta_table
    from ..sources.read import read_parquet_sized
    from ..sources.synthetic import geolocate
    from .geo import tile_id

    def img_partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(
            pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 3, 99), pa.int64()),
            dtype=np.int64,
        )
        lon, lat = geolocate(ids)
        tiles = tile_id(lon, lat, zoom)
        clen = np.asarray(pc.utf8_length(batch["caption"]), dtype=np.int64)
        uniq, inv = np.unique(tiles, return_inverse=True)
        ni = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        sc = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sc, inv, clen)
        return pa.table(
            {
                "tile": pa.array(uniq),
                "n_images": pa.array(ni),
                "sum_caption_len": pa.array(sc),
                "n_nodes": pa.array(np.zeros(len(uniq), dtype=np.int64)),
            }
        )

    def node_partial(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["lang"], lang)
        ids = np.asarray(batch["doc_id"], dtype=np.int64)[np.asarray(keep, dtype=bool)]
        lon, lat = geolocate(ids)
        tiles = tile_id(lon, lat, zoom)
        uniq, counts = np.unique(tiles, return_counts=True)
        z = np.zeros(len(uniq), dtype=np.int64)
        return pa.table(
            {
                "tile": pa.array(uniq),
                "n_images": pa.array(z),
                "sum_caption_len": pa.array(z),
                "n_nodes": pa.array(counts.astype(np.int64)),
            }
        )

    imgs = image_meta_table(sf_dir).map_batches(img_partial, batch_format="pyarrow")
    nodes = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    ).map_batches(node_partial, batch_format="pyarrow")
    return (
        imgs.union(nodes)
        .groupby("tile")
        .aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("sum_caption_len", alias_name="sum_caption_len"),
            Sum("n_nodes", alias_name="n_nodes"),
        )
    )


class AlignmentScorer:
    """Actor-pool stage: CLIP-style image-text alignment scoring.

    ``__init__`` is the once-per-actor model-load point — a real deployment
    loads CLIP weights / a GPU session here; the stand-in builds two fixed
    random projections (seeded, identical on every actor) so scores are
    deterministic and the plumbing (batched two-tower encode, cosine,
    payload-column handling) is real. Pixels and captions never leave the
    stage — only (image_id, align_score) rows come out.
    """

    DIM = 32

    def __init__(self, seed: int = 1234):
        rng = np.random.Generator(np.random.PCG64(seed))
        # image tower: 48-bin RGB histogram -> DIM; text tower: 64 hashed
        # bag-of-words buckets -> DIM
        self.w_img = rng.standard_normal((48, self.DIM))
        self.w_txt = rng.standard_normal((64, self.DIM))

    def _embed_image(self, px: np.ndarray) -> np.ndarray:
        feats = np.concatenate(
            [
                np.histogram(px[..., c], bins=16, range=(0, 256))[0]
                for c in range(3)
            ]
        ).astype(np.float64)
        feats /= max(feats.sum(), 1.0)
        v = feats @ self.w_img
        return v / max(np.linalg.norm(v), 1e-12)

    def _embed_text(self, caption: str) -> np.ndarray:
        buckets = np.zeros(64, dtype=np.float64)
        for tok in caption.lower().split():
            h = 2166136261
            for ch in tok.encode():
                h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
            buckets[h % 64] += 1.0
        buckets /= max(buckets.sum(), 1.0)
        v = buckets @ self.w_txt
        return v / max(np.linalg.norm(v), 1e-12)

    def __call__(self, batch: pa.Table) -> pa.Table:
        scores = np.empty(len(batch), dtype=np.float64)
        caps = batch["caption"].to_pylist()
        for i, blob in enumerate(batch["bytes"]):
            px = decode_image(blob.as_py())
            scores[i] = float(self._embed_image(px) @ self._embed_text(caps[i]))
        return pa.table(
            {"image_id": batch["image_id"], "align_score": pa.array(scores)}
        )


def alignment_scores(
    ds: ray.data.Dataset, concurrency=(1, 8), batch_size: int = 256
) -> ray.data.Dataset:
    """Batched two-tower alignment scoring over (bytes, caption) rows."""
    return ds.map_batches(
        AlignmentScorer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_pool(concurrency),
    )


#: curation survivor-set broadcast gate: below this many ids the sorted id
#: array ships once via ray.put (≤ ~60 MB at 5 M 12-byte ids); above it the
#: semi-join runs as the bucketed int64 hash join — survivor counts are
#: corpus-scaled, so an unconditional driver pull would be a scale bug
SURVIVOR_BROADCAST_LIMIT = 5_000_000


def _ids_int64(col: "pa.ChunkedArray | pa.Array") -> pa.Array:
    """Vectorized ``image_id`` ('img%08d', sources/images.py) -> int64 join
    key via Arrow kernels (slice off the 'img' prefix, cast)."""
    import pyarrow.compute as pc

    out = pc.cast(pc.utf8_slice_codeunits(col, 3), pa.int64())
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def curation_pipeline(
    sf_dir: str,
    min_score: float = -1.0,
    *,
    survivor_broadcast_limit: int = SURVIVOR_BROADCAST_LIMIT,
) -> ray.data.Dataset:
    """LAION-style curation composite: metadata quality gate (resolution,
    aspect, caption length — never touches pixels) THEN alignment scoring
    of only the survivors (the expensive payload stage runs on the reduced
    set — gate ordering is the point), THEN a score threshold.

    The survivor semi-join is size-gated like the query engine's probe
    planner (pipelines/query.py): survivor sets under
    ``survivor_broadcast_limit`` broadcast a sorted id array; bigger sets
    route through the bucketed int64 hash join of stages/joins.py (one
    payload exchange — acceptable because every surviving payload must
    reach a scoring actor anyway).

    Output: (image_id, align_score) for kept images.
    """
    from ..sources.images import image_table

    imgs = image_table(sf_dir)
    gated = (
        quality_filter(imgs.drop_columns(["bytes"]))
        .select_columns(["image_id"])
        .materialize()
    )
    if gated.count() <= survivor_broadcast_limit:
        import ray as _ray

        ids_ref = _ray.put(pa.array(sorted(gated.to_pandas()["image_id"])))

        def keep(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = pc.is_in(batch["image_id"], value_set=_ray.get(ids_ref))
            return batch.filter(mask)

        survivors = imgs.map_batches(keep, batch_format="pyarrow")
    else:
        from .joins import hash_join_attach

        def with_key(batch: pa.Table) -> pa.Table:
            return batch.append_column("__k", _ids_int64(batch["image_id"]))

        flagged = gated.map_batches(
            lambda b: pa.table(
                {
                    "__k": _ids_int64(b["image_id"]),
                    "__m": pa.array(np.ones(len(b), dtype=np.int8)),
                }
            ),
            batch_format="pyarrow",
        )
        survivors = (
            hash_join_attach(
                imgs.map_batches(with_key, batch_format="pyarrow"),
                "__k",
                flagged,
                "__k",
                {"__m": pa.int8()},
            )
            .filter(expr="__m == 1")
            .drop_columns(["__k", "__m"])
        )
    scored = alignment_scores(survivors)
    if min_score > -1.0:
        import pyarrow.compute as pc

        scored = scored.map_batches(
            lambda b: b.filter(pc.greater_equal(b["align_score"], min_score)),
            batch_format="pyarrow",
        )
    return scored


def image_budget_selection(
    meta: ray.data.Dataset, budget_frac: tuple[int, int] = (1, 4)
) -> "pa.Table":
    """Curation under a storage budget: the maximal quality-ordered prefix
    whose cumulative bytes fit ``budget_frac`` of the corpus (exact SQL
    semantics: ORDER BY score DESC, id; running SUM(bytes) <= budget).

    score = w*h (resolution as the metadata quality proxy), bytes = the
    codec-exact 9 + 3*w*h. Distributed as ONE streaming pass — the
    selection-by-order-statistic discipline (same family as the exact
    percentiles): per-score (n, bytes) partials through one bucketed sum —
    the driver sees only DISTINCT scores (bounded by distinct resolutions,
    not rows). The boundary score class needs no row pull at all: bytes is
    a pure function of score (9 + 3*score), so every row of the class costs
    the same and the ORDER BY (score DESC, id) prefix that fits is exactly
    floor(remaining_budget / class_byte_cost) rows — arithmetic, identical
    to the SQL running-sum semantics. (r03 listed the then row-level
    boundary pull as O(N) on a resolution-monoculture corpus; this removes
    the pull entirely.)
    Output: one row (n_selected, bytes_selected, min_score_selected)."""
    import pyarrow.compute as pc

    from .group_collect import bucketed_sum

    def partial(batch: pa.Table) -> pa.Table:
        w = np.asarray(batch["w"], dtype=np.int64)
        h = np.asarray(batch["h"], dtype=np.int64)
        score = w * h
        byt = 9 + 3 * score
        u, inv = np.unique(score, return_inverse=True)
        n = np.zeros(len(u), dtype=np.int64)
        b = np.zeros(len(u), dtype=np.int64)
        np.add.at(n, inv, 1)
        np.add.at(b, inv, byt)
        return pa.table({"score": pa.array(u), "n": pa.array(n), "b": pa.array(b)})

    hist = bucketed_sum(
        meta.map_batches(partial, batch_format="pyarrow"), ["score"], ["n", "b"]
    ).to_pandas()
    hist = hist.sort_values("score", ascending=False).reset_index(drop=True)
    scores = hist["score"].to_numpy()
    nb = hist["b"].to_numpy()
    nn = hist["n"].to_numpy()
    budget = int(nb.sum()) * budget_frac[0] // budget_frac[1]

    cum = np.cumsum(nb)
    full = cum <= budget  # score classes selected in full
    n_sel = int(nn[full].sum())
    b_sel = int(nb[full].sum())
    min_score = int(scores[full][-1]) if full.any() else None
    k = int(full.sum())
    if k < len(scores):
        # boundary class: every row costs the same (bytes = 9 + 3*score), so
        # the id-ordered prefix that fits is floor(remaining / cost) rows —
        # no row-level collection needed, at any class cardinality
        bscore = int(scores[k])
        remaining = budget - b_sel
        row_cost = 9 + 3 * bscore
        fit = min(int(remaining // row_cost), int(nn[k]))
        if fit:
            n_sel += fit
            b_sel += fit * row_cost
            min_score = bscore
    return pa.table(
        {
            "n_selected": pa.array([np.int64(n_sel)]),
            "bytes_selected": pa.array([np.int64(b_sel)]),
            "min_score_selected": pa.array([np.int64(min_score if min_score is not None else -1)]),
        }
    )
