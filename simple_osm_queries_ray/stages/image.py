"""Image-processing stages over binary payload columns (actor pools, ST6).

The decode / feature / resize stages are real Ray Data plumbing over the
opaque ``bytes`` column: callable classes (one setup per actor, work per
batch), small batch sizes for wide binary rows, Arrow binary in / Arrow out.
Only the codec behind them is the deterministic SOQR stand-in (this container
ships no image library — ``sources/images.py``); a video frame-sampler is
stubbed with NotImplementedError as the clearly-marked integration point.
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
        ImageDecoder, batch_format="pyarrow", batch_size=256, concurrency=concurrency
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
        concurrency=concurrency,
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


class VideoFrameSampler:
    """STUB — video decode needs ffmpeg/PyAV, not present in this container.

    The Ray-side contract is real: binary column in, (video_id, frame_idx,
    bytes) rows out, actor pool with per-actor codec setup.
    """

    def __init__(self, every_n: int = 30):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "video frame sampling requires an ffmpeg/PyAV decoder; wire it in "
            "__init__ and emit (video_id, frame_idx, bytes) rows here"
        )
