"""Deduplication operators: exact, MinHash+LSH, SimHash.

Ray-native shapes (beyond the reference, which has no row-dedup operator —
SURVEY.md section 2.5 — these are the training-data-pipeline additions):

- exact: 128-bit content hash per batch (two independent siphash streams via
  ``pd.util.hash_pandas_object`` — C speed, deterministic), then a
  ``groupby(hash).min(id)`` over (hash, id) pairs only. The text never enters
  the shuffle.
- MinHash+LSH: token-3-gram shingles -> k minhash permutations (vectorized
  universal hashing + ``np.minimum.reduceat``) -> banded signatures exploded
  to (band, band_hash, id) rows -> groupby band bucket -> candidate pairs ->
  exact-Jaccard verification against a broadcast text lookup of the (small)
  candidate set.
- SimHash: 64-bit majority-sign signature over token hashes; banded into 4
  16-bit chunks for candidate generation; verified by true Hamming distance.

All hashing is deterministic across processes (fixed keys / multipliers).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..state.broadcast import get as bget

# -- shared token/shingle kernels ------------------------------------------

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _token_hashes(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace tokens of each text -> (flat token hashes u64, row offsets)."""
    tokens = texts.str.split()
    lens = tokens.map(len).to_numpy(dtype=np.int64)
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = [t for row in tokens for t in row]
    h = pd.util.hash_pandas_object(pd.Series(flat, dtype=object), index=False).to_numpy()
    return h.astype(np.uint64), offsets


def _shingle_hashes(tok: np.ndarray, offsets: np.ndarray, n: int = 3):
    """3-gram shingles: combine consecutive token hashes; valid only within rows.

    Returns (flat shingle hashes, shingle-row offsets).
    """
    total = len(tok)
    lens = np.diff(offsets)
    sh_lens = np.maximum(lens - (n - 1), 0)
    sh_off = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(sh_lens, out=sh_off[1:])
    if total < n:
        return np.array([], dtype=np.uint64), sh_off
    a = tok[: total - 2] * np.uint64(0x9E3779B97F4A7C15)
    b = tok[1 : total - 1] * np.uint64(0xC2B2AE3D27D4EB4F)
    c = tok[2:]
    combined = (a ^ b ^ c) & _MASK
    # select positions whose 3 tokens are in the same row
    row_id = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    valid = row_id[: total - 2] == row_id[2:]
    return combined[valid], sh_off


_K_PERM = 64
_rng = np.random.RandomState(20260817)
_PERM_A = (_rng.randint(1, 2**62, size=_K_PERM).astype(np.uint64) * np.uint64(2) + np.uint64(1))
_PERM_B = _rng.randint(0, 2**62, size=_K_PERM).astype(np.uint64)
_BANDS = 8
_ROWS_PER_BAND = _K_PERM // _BANDS
_BAND_W = _rng.randint(1, 2**62, size=_ROWS_PER_BAND).astype(np.uint64) * np.uint64(2) + np.uint64(1)


def minhash_signatures(texts: pd.Series) -> np.ndarray:
    """(n_rows, K_PERM) uint64 minhash signature matrix, fully vectorized."""
    tok, offsets = _token_hashes(texts)
    sh, sh_off = _shingle_hashes(tok, offsets)
    n = len(offsets) - 1
    sig = np.full((n, _K_PERM), _MASK, dtype=np.uint64)
    if len(sh) == 0:
        return sig
    hashed = (sh[:, None] * _PERM_A[None, :] + _PERM_B[None, :]) & _MASK  # (S, K)
    starts = sh_off[:-1]
    nonempty = np.diff(sh_off) > 0
    # reduceat over the shingle axis; rows with zero shingles keep MAX
    red = np.minimum.reduceat(hashed, np.minimum(starts, max(len(sh) - 1, 0)), axis=0)
    sig[nonempty] = red[nonempty]
    return sig


def band_hashes(sig: np.ndarray) -> np.ndarray:
    """(n_rows, BANDS) uint64: one bucket hash per band."""
    n = sig.shape[0]
    out = np.empty((n, _BANDS), dtype=np.uint64)
    for b in range(_BANDS):
        chunk = sig[:, b * _ROWS_PER_BAND : (b + 1) * _ROWS_PER_BAND]
        out[:, b] = (chunk * _BAND_W[None, :]).sum(axis=1, dtype=np.uint64) & _MASK
    return out


def jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact token-3-gram Jaccard (verification / oracle)."""
    ta, tb = a.split(), b.split()
    sa = {tuple(ta[i : i + n]) for i in range(max(0, len(ta) - n + 1))}
    sb = {tuple(tb[i : i + n]) for i in range(max(0, len(tb) - n + 1))}
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "id",
) -> ray.data.Dataset:
    """EXACT token-3-gram Jaccard pairs (id_a < id_b, jaccard >= threshold).

    The oracle-able exact variant of the near-dup family (SQL twin explodes
    trigrams and joins); :func:`minhash_lsh_pairs` is the scale path. Shape
    mirrors ``embedding_near_dup_exact``: a dense doc x trigram-vocab presence
    matrix is built once driver-side and broadcast; each batch computes its
    intersection counts against the whole corpus with one integer matmul.
    O(N * V) broadcast memory — fine for the exact tier, not for 10^12 rows.
    Pairs where both trigram sets are empty are NOT emitted (union = 0).
    """
    import pandas as pd

    doc_ids, doc_tris = [], []
    for b in ds.select_columns([id_col, text_col]).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        texts = b[text_col].to_pylist()
        ids = np.asarray(b[id_col], dtype=np.int64)
        for i, t in enumerate(texts):
            toks = t.split()
            grams = list({" ".join(toks[j : j + 3]) for j in range(max(0, len(toks) - 2))})
            doc_ids.append(int(ids[i]))
            doc_tris.append(grams)
    order = np.argsort(np.asarray(doc_ids, dtype=np.int64))
    doc_ids = np.asarray(doc_ids, dtype=np.int64)[order]
    doc_tris = [doc_tris[i] for i in order]

    flat = [g for tris in doc_tris for g in tris]
    counts = np.asarray([len(t) for t in doc_tris], dtype=np.int64)
    vocab, col = np.unique(np.asarray(flat, dtype=object), return_inverse=True)
    n, v = len(doc_ids), len(vocab)
    M = np.zeros((n, v), dtype=np.uint8)
    row = np.repeat(np.arange(n, dtype=np.int64), counts)
    M[row, col] = 1
    state_ref = ray.put((doc_ids, M, counts.astype(np.float64)))

    def fn(batch: pa.Table) -> pa.Table:
        ids_all, mat, sizes = bget(state_ref)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        rows = np.searchsorted(ids_all, ids)
        mb = mat[rows].astype(np.int32)
        inter = mb @ mat.T.astype(np.int32)  # (b, N)
        union = sizes[rows][:, None] + sizes[None, :] - inter
        with np.errstate(divide="ignore", invalid="ignore"):
            jac = np.where(union > 0, inter / union, 0.0)
        ii, jj = np.nonzero(jac >= threshold)
        a, b_ = ids[ii], ids_all[jj]
        keep = a < b_
        return pa.table({"id_a": pa.array(a[keep]), "id_b": pa.array(b_[keep])})

    return ds.map_batches(fn, batch_format="pyarrow")


# -- candidate generation ----------------------------------------------------


def candidate_pairs_from_buckets(
    ds: ray.data.Dataset,
    key_cols: list[str],
    id_col: str,
    carry_cols: list[str] | None = None,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """(key..., id) rows -> candidate (id_a, id_b) pairs per identical key.

    One shuffle keyed on ``hash(key) % num_buckets`` (NOT one Python call per
    bucket value — LSH produces millions of mostly-singleton buckets, and
    ``groupby(key).map_groups`` would be a Python loop over all of them).
    Within a hash bucket rows are sorted by key; only segments with >= 2
    distinct ids emit pairs. ``carry_cols`` values (e.g. signatures) ride
    along as (a, b) column pairs.
    """
    carry_cols = carry_cols or []

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = np.zeros(len(batch), dtype=np.uint64)
        for c in key_cols:
            h = h * np.uint64(0x100000001B3) + np.asarray(batch[c], dtype=np.int64).astype(
                np.uint64
            )
        return batch.append_column("__bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64)))

    def per_bucket(tbl: pa.Table) -> pa.Table:
        tbl = tbl.drop_columns(["__bucket"])
        keys = [np.asarray(tbl[c], dtype=np.int64) for c in key_cols]
        ids = np.asarray(tbl[id_col], dtype=np.int64)
        order = np.lexsort((ids, *reversed(keys)))
        keys = [k[order] for k in keys]
        ids = ids[order]
        carry = [np.asarray(tbl[c])[order] for c in carry_cols]
        change = np.zeros(len(ids), dtype=bool)
        if len(ids):
            change[0] = True
            for k in keys:
                change[1:] |= k[1:] != k[:-1]
        starts = np.nonzero(change)[0]
        ends = np.append(starts[1:], len(ids))
        out_a, out_b = [], []
        out_carry_a = [[] for _ in carry_cols]
        out_carry_b = [[] for _ in carry_cols]
        for s, e in zip(starts, ends):  # only multi-member segments do work
            if e - s < 2:
                continue
            seg_ids, first = np.unique(ids[s:e], return_index=True)
            if len(seg_ids) < 2:
                continue
            ia, ib = np.triu_indices(len(seg_ids), 1)
            out_a.append(seg_ids[ia])
            out_b.append(seg_ids[ib])
            for ci, cv in enumerate(carry):
                seg_c = cv[s:e][first]
                out_carry_a[ci].append(seg_c[ia])
                out_carry_b[ci].append(seg_c[ib])
        cols = {
            "id_a": pa.array(
                np.concatenate(out_a) if out_a else np.array([], dtype=np.int64)
            ),
            "id_b": pa.array(
                np.concatenate(out_b) if out_b else np.array([], dtype=np.int64)
            ),
        }
        for ci, c in enumerate(carry_cols):
            cols[f"{c}_a"] = pa.array(
                np.concatenate(out_carry_a[ci]) if out_carry_a[ci] else np.array([], dtype=np.int64)
            )
            cols[f"{c}_b"] = pa.array(
                np.concatenate(out_carry_b[ci]) if out_carry_b[ci] else np.array([], dtype=np.int64)
            )
        return pa.table(cols)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


# -- operators --------------------------------------------------------------


def exact_dedup_keep_ids(ds: ray.data.Dataset, text_col: str = "text", id_col: str = "id") -> ray.data.Dataset:
    """Kept row ids after exact dedup: min id per distinct text content."""

    def hash_batch(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch[text_col].to_pylist(), dtype=object)
        h1 = pd.util.hash_pandas_object(s, index=False, hash_key="0123456789123456")
        h2 = pd.util.hash_pandas_object(s, index=False, hash_key="6543210987654321")
        return pa.table(
            {
                "h1": pa.array(h1.to_numpy().astype(np.int64)),
                "h2": pa.array(h2.to_numpy().astype(np.int64)),
                id_col: batch[id_col],
            }
        )

    from ray.data.aggregate import Min

    out = (
        ds.map_batches(hash_batch, batch_format="pyarrow")
        .groupby(["h1", "h2"])
        .aggregate(Min(id_col, alias_name=id_col))
    )
    return out.select_columns([id_col])


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "id",
) -> ray.data.Dataset:
    """Near-duplicate pairs (id_a < id_b) with exact Jaccard >= threshold.

    Candidates from LSH band buckets; each candidate pair verified with the
    exact shingle Jaccard (candidate texts broadcast — the candidate set is
    tiny relative to the corpus; a join-based verify is the fallback for
    pathological candidate volumes).
    """

    def to_bands(batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch[text_col].to_pylist(), dtype=object)
        sig = minhash_signatures(texts)
        bh = band_hashes(sig)
        n, B = bh.shape
        ids = np.asarray(batch[id_col], dtype=np.int64)
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(B, dtype=np.int64), n)),
                "bhash": pa.array(bh.ravel().astype(np.int64)),
                id_col: pa.array(np.repeat(ids, B)),
            }
        )

    bands = ds.map_batches(to_bands, batch_format="pyarrow")
    cand = (
        candidate_pairs_from_buckets(bands, ["band", "bhash"], id_col)
        .groupby(["id_a", "id_b"])
        .count()
        .select_columns(["id_a", "id_b"])
    )

    # broadcast candidate texts for exact verification
    cand_tbl = cand.to_pandas()
    need = np.unique(np.concatenate([cand_tbl["id_a"].to_numpy(), cand_tbl["id_b"].to_numpy()])) if len(cand_tbl) else np.array([], dtype=np.int64)
    texts = {}
    if len(need):
        from .semi_join import isin_sorted

        def take_texts(batch: pa.Table) -> pa.Table:
            mask = isin_sorted(np.asarray(batch[id_col], dtype=np.int64), need)
            return batch.select([id_col, text_col]).filter(pa.array(mask))

        for b in ds.map_batches(take_texts, batch_format="pyarrow").iter_batches(batch_format="pyarrow", batch_size=None):
            for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
                texts[i] = t
    keep_a, keep_b = [], []
    for a, b in zip(cand_tbl.get("id_a", []), cand_tbl.get("id_b", [])):
        if jaccard(texts[a], texts[b]) >= threshold:
            keep_a.append(a)
            keep_b.append(b)
    return ray.data.from_arrow(
        pa.table({"id_a": pa.array(keep_a, type=pa.int64()), "id_b": pa.array(keep_b, type=pa.int64())})
    )


def simhash_signatures(texts: pd.Series) -> np.ndarray:
    """64-bit SimHash per text: majority sign over token-hash bit columns."""
    tok, offsets = _token_hashes(texts)
    n = len(offsets) - 1
    if len(tok) == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = ((tok[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    contrib = bits * 2 - 1  # ±1
    starts = np.minimum(offsets[:-1], max(len(tok) - 1, 0))
    sums = np.add.reduceat(contrib, starts, axis=0)
    sums[np.diff(offsets) == 0] = 0
    sig_bits = (sums > 0).astype(np.uint64)
    return (sig_bits << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1, dtype=np.uint64)


def simhash_pairs(
    ds: ray.data.Dataset,
    *,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "id",
) -> ray.data.Dataset:
    """Near-duplicate pairs (id_a < id_b) with SimHash Hamming distance <= d.

    SimHash signatures per batch, then the generic 64-bit Hamming pair
    machinery (:func:`hamming_pairs_int64`).
    """

    def add_sig(batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch[text_col].to_pylist(), dtype=object)
        sig = simhash_signatures(texts)
        return pa.table(
            {id_col: batch[id_col], "sig": pa.array(sig.astype(np.int64))}
        )

    return hamming_pairs_int64(
        ds.map_batches(add_sig, batch_format="pyarrow"),
        sig_col="sig",
        id_col=id_col,
        max_hamming=max_hamming,
    )


def hamming_pairs_int64(
    ds: ray.data.Dataset,
    *,
    sig_col: str,
    id_col: str = "id",
    max_hamming: int = 3,
) -> ray.data.Dataset:
    """All (id_a < id_b) pairs whose 64-bit signatures differ by <= d bits.

    Works over ANY int64 signature column — SimHash of text, perceptual hash
    of images, etc. Candidate generation: 4 chunks of 16 bits (a pair within
    distance <= 3 agrees exactly on at least one chunk — pigeonhole);
    verification by true popcount distance. One shuffle keyed on
    (chunk, chunk_value); dense buckets are the skew risk and verification
    is quadratic per bucket — callers with adversarial signature skew should
    salt or cap bucket sizes.
    """

    def to_chunks(batch: pa.Table) -> pa.Table:
        sig = np.asarray(batch[sig_col], dtype=np.int64).astype(np.uint64)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        n = len(sig)
        chunks = np.empty((n, 4), dtype=np.int64)
        for c in range(4):
            chunks[:, c] = ((sig >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table(
            {
                "chunk": pa.array(np.tile(np.arange(4, dtype=np.int64), n)),
                "cval": pa.array(chunks.ravel()),
                id_col: pa.array(np.repeat(ids, 4)),
                "sig": pa.array(np.repeat(sig.astype(np.int64), 4)),
            }
        )

    chunks = ds.map_batches(to_chunks, batch_format="pyarrow")
    cand = candidate_pairs_from_buckets(
        chunks, ["chunk", "cval"], id_col, carry_cols=["sig"]
    )

    def verify(batch: pa.Table) -> pa.Table:
        sa = np.asarray(batch["sig_a"], dtype=np.int64).astype(np.uint64)
        sb = np.asarray(batch["sig_b"], dtype=np.int64).astype(np.uint64)
        x = sa ^ sb
        # vectorized popcount via byte lookup table
        dist = np.zeros(len(x), dtype=np.int64)
        for s in range(0, 64, 8):
            dist += _POPCOUNT[((x >> np.uint64(s)) & np.uint64(0xFF)).astype(np.int64)]
        keep = dist <= max_hamming
        return pa.table(
            {
                "id_a": batch["id_a"].filter(pa.array(keep)),
                "id_b": batch["id_b"].filter(pa.array(keep)),
            }
        )

    verified = cand.map_batches(verify, batch_format="pyarrow")
    return verified.groupby(["id_a", "id_b"]).count().select_columns(["id_a", "id_b"])


_POPCOUNT = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)
