"""Mergeable Bloom filter over int64 keys, for join-input pre-filtering.

Built distributed: each batch of build-side keys emits a partial bit array;
partials OR together (associative + commutative, like the HLL registers).
The probe side then drops rows whose keys cannot match BEFORE the join's
shuffle — no false negatives, so the join result is provably unchanged; the
win is shuffle volume when the build side is selective (e.g. a date-filtered
orders table probed by the full lineitem).
"""

from __future__ import annotations

import numpy as np

_M1 = np.uint64(0x9E3779B97F4A7C15)
_M2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _h2(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    x = keys.astype(np.uint64)
    a = x * _M1
    a ^= a >> np.uint64(31)
    b = x * _M2 ^ np.uint64(0x165667B19E3779F9)
    b ^= b >> np.uint64(29)
    return a, b | np.uint64(1)  # odd step so double hashing cycles all bits


class BloomFilter:
    def __init__(self, n_bits: int = 1 << 20, k: int = 5):
        self.n_bits = n_bits
        self.k = k
        self.bits = np.zeros(n_bits // 8, dtype=np.uint8)

    def add(self, keys: np.ndarray) -> None:
        a, b = _h2(np.asarray(keys, dtype=np.int64))
        for i in range(self.k):  # k-bounded loop, vectorized over keys
            pos = ((a + np.uint64(i) * b) % np.uint64(self.n_bits)).astype(np.int64)
            np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def might_contain(self, keys: np.ndarray) -> np.ndarray:
        a, b = _h2(np.asarray(keys, dtype=np.int64))
        out = np.ones(len(keys), dtype=bool)
        for i in range(self.k):
            pos = ((a + np.uint64(i) * b) % np.uint64(self.n_bits)).astype(np.int64)
            out &= (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1 > 0
        return out

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert other.n_bits == self.n_bits and other.k == self.k
        self.bits |= other.bits
        return self


def build_bloom(ds, key_col: str, *, n_bits: int = 1 << 20, k: int = 5) -> BloomFilter:
    """Distributed build: per-batch partial filters, OR-merged driver-side
    (num_batches * n_bits/8 bytes of exchange; the keys never leave their
    tasks)."""
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        f = BloomFilter(n_bits, k)
        f.add(np.asarray(batch[key_col], dtype=np.int64))
        return pa.table({"bits": pa.array([f.bits.tobytes()], type=pa.binary())})

    out = BloomFilter(n_bits, k)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for blob in b["bits"].to_pylist():
            out.bits |= np.frombuffer(blob, dtype=np.uint8)
    return out
