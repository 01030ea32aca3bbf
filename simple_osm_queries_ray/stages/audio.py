"""Audio-processing stages over binary payload columns (actor pool, ST6).

Unlike image/video, raw PCM needs no codec, so this stage is fully real:
the ``bytes`` column holds little-endian int16 mono PCM, features are
numpy-vectorized per clip. A compressed-audio decoder (mp3/ogg) would slot
into ``AudioFeatureExtractor.__init__`` exactly like the image decoder's
integration point (``stages/image.py``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

SAMPLE_RATE = 16_000


def synthetic_audio_table(sf_dir: str) -> ray.data.Dataset:
    """documents -> (clip_id, bytes[PCM16 mono], n_samples, caption) table.

    Deterministic per-doc waveform: a two-tone sine mix whose frequencies and
    length derive from doc_id (no external data; same derivation style as the
    image table, sources/images.py).
    """
    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        blobs, lens = [], []
        for i in ids:
            n = 1000 + int(i % 17) * 200
            t = np.arange(n, dtype=np.float64) / SAMPLE_RATE
            f1, f2 = 200 + int(i % 23) * 20, 1000 + int(i % 11) * 50
            wave = 0.6 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
            pcm = np.clip(wave * 32767, -32768, 32767).astype("<i2")
            blobs.append(pcm.tobytes())
            lens.append(n)
        return pa.table(
            {
                "clip_id": pa.array([f"clip{int(i):08d}" for i in ids], type=pa.string()),
                "bytes": pa.array(blobs, type=pa.binary()),
                "n_samples": pa.array(np.asarray(lens, dtype=np.int32), type=pa.int32()),
                "caption": batch["text"],
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=512)


class AudioFeatureExtractor:
    """Actor-pool stage: PCM bytes -> (rms, peak, zero-crossing rate, secs)."""

    def __init__(self, sample_rate: int = SAMPLE_RATE):
        # real deployments load their decoder here, once per actor
        self.sample_rate = sample_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        rms = np.empty(n, dtype=np.float64)
        peak = np.empty(n, dtype=np.float64)
        zcr = np.empty(n, dtype=np.float64)
        secs = np.empty(n, dtype=np.float64)
        for i, blob in enumerate(batch["bytes"]):
            pcm = np.frombuffer(blob.as_py(), dtype="<i2").astype(np.float64) / 32768.0
            rms[i] = np.sqrt(np.mean(pcm**2)) if len(pcm) else 0.0
            peak[i] = np.abs(pcm).max() if len(pcm) else 0.0
            zcr[i] = float(np.mean(np.signbit(pcm[1:]) != np.signbit(pcm[:-1]))) if len(pcm) > 1 else 0.0
            secs[i] = len(pcm) / self.sample_rate
        return pa.table(
            {
                "clip_id": batch["clip_id"],
                "rms": pa.array(rms),
                "peak": pa.array(peak),
                "zcr": pa.array(zcr),
                "seconds": pa.array(secs),
            }
        )


def audio_features(ds: ray.data.Dataset, concurrency: int | None = None) -> ray.data.Dataset:
    if concurrency is None:
        import ray as _ray

        concurrency = (1, max(1, int(_ray.cluster_resources().get("CPU", 4)) // 2))
    return ds.map_batches(
        AudioFeatureExtractor, batch_format="pyarrow", batch_size=256, concurrency=concurrency
    )
