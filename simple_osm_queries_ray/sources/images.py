"""Synthetic image+caption table in the north rule's input shape.

BASELINE.json ``input_hint``: (image_id: string, bytes: binary, w: int32,
h: int32, fmt: string, caption: string, phash: int64). Derived
deterministically from the documents table (no external data):

- pixels: seeded per-image RNG (PCG64(doc_id)) RGB array, w x h from a fixed
  formula of doc_id;
- "png"  = SOQR0 container, raw RGB bytes (lossless);
- "jpeg" = SOQR1 container, 6-bit-quantized RGB (lossy; max error 2/255 per
  channel -> PSNR ~46 dB, satisfying the >= 40 dB invariant). Real PNG/JPEG
  codecs are not in this container — the codec is a stand-in, but the Ray
  plumbing (binary column, batch sizing, actor-pool decode) is real.
- phash: 64-bit average-hash of the decoded pixels' grayscale 8x8 downsample.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

MAGIC_RAW = b"SOQR0"
MAGIC_QUANT = b"SOQR1"
QUANT_SHIFT = 2  # 6-bit quantization


def _dims(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    w = 8 + (doc_id % 5) * 8  # 8..40
    h = 8 + (doc_id % 7) * 4  # 8..32
    return w.astype(np.int32), h.astype(np.int32)


def _fmt(doc_id: np.ndarray) -> np.ndarray:
    return np.where(doc_id % 3 == 0, "jpeg", "png").astype(object)


def reference_pixels(doc_id: int, w: int, h: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(doc_id))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    h, w, _ = pixels.shape
    header = (MAGIC_QUANT if fmt == "jpeg" else MAGIC_RAW) + np.array(
        [w, h], dtype="<u2"
    ).tobytes()
    if fmt == "jpeg":
        q = (pixels >> QUANT_SHIFT).astype(np.uint8)
        return header + q.tobytes()
    return header + pixels.tobytes()


def decode_image(data: bytes) -> np.ndarray:
    magic, rest = data[:5], data[5:]
    if magic not in (MAGIC_RAW, MAGIC_QUANT):
        raise NotImplementedError(
            "real PNG/JPEG decode requires an image library not present in "
            "this container; only the SOQR stand-in codec is supported"
        )
    w, h = np.frombuffer(rest[:4], dtype="<u2")
    body = np.frombuffer(rest[4:], dtype=np.uint8).reshape(int(h), int(w), 3)
    if magic == MAGIC_QUANT:
        # dequantize to bin centers
        return ((body.astype(np.uint8) << QUANT_SHIFT) + (1 << (QUANT_SHIFT - 1))).astype(
            np.uint8
        )
    return body.copy()  # MAGIC_RAW (the guard above admits only the two)


def average_hash(pixels: np.ndarray) -> int:
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    small = gray[np.ix_(ys, xs)]
    bits = (small > small.mean()).ravel()
    val = 0
    for i, b in enumerate(bits):
        if b:
            val |= 1 << i
    return val - (1 << 64) if val >= (1 << 63) else val


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


DUP_IMAGE_OFFSET = 1_000_000


def dup_image_table(sf_dir: str) -> ray.data.Dataset:
    """image_table plus a near-duplicate copy of every 10th image.

    The copy (id + DUP_IMAGE_OFFSET) is the same pixels re-encoded with the
    lossy quantizing codec — its average-hash differs by only a few bits, so
    phash near-dup search must pair it with its original. Deterministic; the
    image analogue of sources/dup_docs.py.
    """
    base = image_table(sf_dir)

    def add_dups(batch: pa.Table) -> pa.Table:
        ids = np.asarray(
            [int(s[3:]) for s in batch["image_id"].to_pylist()], dtype=np.int64
        )
        pick = ids % 10 == 0
        if not pick.any():
            return batch
        sel = np.nonzero(pick)[0]
        blobs, phashes = [], []
        for i in sel:
            px = decode_image(batch["bytes"][i].as_py())
            blob = encode_image(px, "jpeg")
            blobs.append(blob)
            phashes.append(average_hash(decode_image(blob)))
        dup = pa.table(
            {
                "image_id": pa.array(
                    [f"img{int(ids[i]) + DUP_IMAGE_OFFSET:08d}" for i in sel], type=pa.string()
                ),
                "bytes": pa.array(blobs, type=pa.binary()),
                "w": batch["w"].take(pa.array(sel)),
                "h": batch["h"].take(pa.array(sel)),
                "fmt": pa.array(["jpeg"] * len(sel), type=pa.string()),
                "caption": batch["caption"].take(pa.array(sel)),
                "phash": pa.array(phashes, type=pa.int64()),
            }
        )
        return pa.concat_tables([batch, dup])

    return base.map_batches(add_dups, batch_format="pyarrow")


def image_batch_from_docs(batch: pa.Table) -> pa.Table:
    """(doc_id, text) batch -> full image batch (the deterministic synth)."""
    ids = np.asarray(batch["doc_id"], dtype=np.int64)
    w, h = _dims(ids)
    fmts = _fmt(ids)
    blobs, phashes = [], []
    for i in range(len(ids)):
        px = reference_pixels(int(ids[i]), int(w[i]), int(h[i]))
        blobs.append(encode_image(px, fmts[i]))
        phashes.append(average_hash(decode_image(blobs[-1])))
    return pa.table(
        {
            "image_id": pa.array([f"img{int(i):08d}" for i in ids], type=pa.string()),
            "bytes": pa.array(blobs, type=pa.binary()),
            "w": pa.array(w, type=pa.int32()),
            "h": pa.array(h, type=pa.int32()),
            "fmt": pa.array(fmts, type=pa.string()),
            "caption": batch["text"],
            "phash": pa.array(phashes, type=pa.int64()),
        }
    )


def image_table(sf_dir: str) -> ray.data.Dataset:
    """documents -> (image_id, bytes, w, h, fmt, caption, phash) Dataset."""
    from .read import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(image_batch_from_docs, batch_format="pyarrow", batch_size=512)


def image_meta_table(sf_dir: str) -> ray.data.Dataset:
    """(image_id, w, h, fmt, caption) WITHOUT the pixel payload.

    The synthetic analogue of a Lance/parquet ``columns=`` projection
    pushdown: metadata-only operators (quality gates, resolution dedup)
    must never materialize the ``bytes`` column — at 10^12-image scale the
    payload dwarfs every other column by orders of magnitude. Mirrors
    :func:`image_table` minus the pixels, same derivation formulas.
    """
    from .read import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        w, h = _dims(ids)
        return pa.table(
            {
                "image_id": pa.array(
                    [f"img{int(i):08d}" for i in ids], type=pa.string()
                ),
                "w": pa.array(w, type=pa.int32()),
                "h": pa.array(h, type=pa.int32()),
                "fmt": pa.array(_fmt(ids)),
                "caption": batch["text"],
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


THUMB_OFFSET = 3_000_000


def thumb_image_meta_table(sf_dir: str) -> ray.data.Dataset:
    """:func:`image_meta_table` plus a half-resolution "thumbnail" copy of
    every 10th image (id + THUMB_OFFSET, w//2 x h//2, same caption, jpeg).

    Thumbnails re-crawled alongside originals are the classic resolution
    near-dup in web image corpora; this plants them deterministically (the
    metadata sibling of :func:`dup_image_table`, formulas reproducible in
    SQL) so keep-largest dedup has real work to do.
    """
    base = image_meta_table(sf_dir)

    def add_thumbs(batch: pa.Table) -> pa.Table:
        ids = np.asarray(
            [int(s[3:]) for s in batch["image_id"].to_pylist()], dtype=np.int64
        )
        pick = ids % 10 == 0
        if not pick.any():
            return batch
        sel = pa.array(np.nonzero(pick)[0])
        w = np.asarray(batch["w"], dtype=np.int64)[pick] // 2
        h = np.asarray(batch["h"], dtype=np.int64)[pick] // 2
        thumb = pa.table(
            {
                "image_id": pa.array(
                    [f"img{int(i) + THUMB_OFFSET:08d}" for i in ids[pick]],
                    type=pa.string(),
                ),
                "w": pa.array(w.astype(np.int32), type=pa.int32()),
                "h": pa.array(h.astype(np.int32), type=pa.int32()),
                "fmt": pa.array(["jpeg"] * int(pick.sum()), type=pa.string()),
                "caption": batch["caption"].take(sel),
            }
        )
        return pa.concat_tables([batch, thumb])

    return base.map_batches(add_thumbs, batch_format="pyarrow")
