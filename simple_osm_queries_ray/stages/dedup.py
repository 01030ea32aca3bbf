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
import pyarrow.compute as pc
import ray
import ray.data

# -- shared token/shingle kernels ------------------------------------------

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


# token hash = two 31-bit polynomial Horner streams over the token's bytes
# combined and spread over 64 bits with an odd-multiplier wrap. Chosen over a
# library siphash because the identical arithmetic replays in DuckDB
# (recursive CTE + HUGEINT mod 2^64), giving simhash_pairs an exact SQL
# oracle; minhash/gram consumers only need determinism.
_TOK_MOD = (1 << 31) - 1
_TOK_BASES = (131, 137)
_TOK_MIX = np.uint64(0x9E3779B97F4A7C15)

_TOK_POWER_CACHE: dict[int, np.ndarray] = {}


def _tok_powers(base: int, n: int) -> np.ndarray:
    cur = _TOK_POWER_CACHE.get(base)
    if cur is None or len(cur) < n:
        size = max(n, 256, 0 if cur is None else 2 * len(cur))
        p = np.empty(size, dtype=np.uint64)
        p[0] = 1
        b, m = np.uint64(base), np.uint64(_TOK_MOD)
        for j in range(1, size):
            p[j] = (p[j - 1] * b) % m
        _TOK_POWER_CACHE[base] = cur = p
    return cur


def _token_hashes(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace tokens of each text -> (flat token hashes u64, row offsets).

    Vectorized over the flattened token bytes (one power-table gather +
    reduceat per stream; terms < 2^39, segment sums < 2^63 — uint64-safe).
    """
    tokens = texts.str.split()
    lens = tokens.map(len).to_numpy(dtype=np.int64)
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = [t for row in tokens for t in row]
    if not flat:
        return np.array([], dtype=np.uint64), offsets
    blob = "".join(flat).encode("utf-8")
    tok_lens = np.array([len(t.encode("utf-8")) for t in flat], dtype=np.int64)
    b = np.frombuffer(blob, dtype=np.uint8).astype(np.uint64)
    toff = np.zeros(len(tok_lens) + 1, dtype=np.int64)
    np.cumsum(tok_lens, out=toff[1:])
    local = np.arange(len(b), dtype=np.int64) - np.repeat(toff[:-1], tok_lens)
    exp = np.repeat(tok_lens, tok_lens) - 1 - local
    starts = np.minimum(toff[:-1], max(len(b) - 1, 0))
    m = np.uint64(_TOK_MOD)
    hs = []
    for base in _TOK_BASES:
        pw = _tok_powers(base, int(tok_lens.max()) if len(tok_lens) else 1)
        h = np.add.reduceat(b * pw[exp], starts) % m
        h[tok_lens == 0] = 0
        hs.append(h)
    combined = ((hs[0] << np.uint64(31)) | hs[1]) * _TOK_MIX  # wraps mod 2^64
    return combined, offsets


# two independent shingle mixers: used together they give a 128-bit gram
# identity, making hash-collision miscounts in the distributed exact-Jaccard
# join negligible (~V^2 / 2^128) at any corpus size
_SHINGLE_MIX = (
    (np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F), np.uint64(1)),
    (np.uint64(0xFF51AFD7ED558CCD), np.uint64(0xC4CEB9FE1A85EC53), np.uint64(0x2545F4914F6CDD1D)),
)


def _shingle_hashes(tok: np.ndarray, offsets: np.ndarray, n: int = 3, mix: int = 0):
    """3-gram shingles: combine consecutive token hashes; valid only within rows.

    Returns (flat shingle hashes, shingle-row offsets). ``mix`` selects one of
    two independent mixers (compound 128-bit gram identity). The body is the
    unrolled 3-gram fast path; any other ``n`` delegates to the general
    kernel (the parameter previously desynced hashes from offsets for
    n != 3).
    """
    if n != 3:
        return _shingle_hashes_n(tok, offsets, n, mix)
    total = len(tok)
    lens = np.diff(offsets)
    sh_lens = np.maximum(lens - (n - 1), 0)
    sh_off = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(sh_lens, out=sh_off[1:])
    if total < n:
        return np.array([], dtype=np.uint64), sh_off
    ma, mb, mc = _SHINGLE_MIX[mix]
    a = tok[: total - 2] * ma
    b = tok[1 : total - 1] * mb
    c = tok[2:] * mc
    combined = (a ^ b ^ c) & _MASK
    # select positions whose 3 tokens are in the same row
    row_id = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    valid = row_id[: total - 2] == row_id[2:]
    return combined[valid], sh_off


def _distinct_grams(texts: pd.Series):
    """Per-row DISTINCT token-3-gram identities.

    Returns (row_idx, g1, g2, sizes): flat arrays of the distinct grams of
    each row (g1/g2 = the two independent 64-bit mixes, int64 bit-views) and
    the per-row distinct-gram counts. Fully vectorized (one lexsort).
    """
    tok, offsets = _token_hashes(texts)
    g1, sh_off = _shingle_hashes(tok, offsets, mix=0)
    g2, _ = _shingle_hashes(tok, offsets, mix=1)
    n = len(offsets) - 1
    row = np.repeat(np.arange(n, dtype=np.int64), np.diff(sh_off))
    a = g1.view(np.int64)
    b = g2.view(np.int64)
    order = np.lexsort((b, a, row))
    row, a, b = row[order], a[order], b[order]
    keep = np.ones(len(row), dtype=bool)
    if len(row):
        keep[1:] = (row[1:] != row[:-1]) | (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    row, a, b = row[keep], a[keep], b[keep]
    sizes = np.bincount(row, minlength=n).astype(np.int64)
    return row, a, b, sizes


def _pair_jaccard_batch(texts_a: pd.Series, texts_b: pd.Series) -> np.ndarray:
    """Exact token-3-gram Jaccard for aligned text pairs, fully vectorized.

    One sort over the union of both sides' distinct grams per pair; a gram in
    the intersection appears exactly twice under the same (pair, g1, g2) key
    (per-side distinctness), so adjacent-equality counts intersections.
    Empty-union pairs score 1.0 (matching :func:`jaccard`).
    """
    n = len(texts_a)
    ra, a1, a2, na = _distinct_grams(texts_a)
    rb, b1, b2, nb = _distinct_grams(texts_b)
    row = np.concatenate([ra, rb])
    g1 = np.concatenate([a1, b1])
    g2 = np.concatenate([a2, b2])
    order = np.lexsort((g2, g1, row))
    row, g1, g2 = row[order], g1[order], g2[order]
    same = np.zeros(len(row), dtype=bool)
    if len(row):
        same[1:] = (row[1:] == row[:-1]) & (g1[1:] == g1[:-1]) & (g2[1:] == g2[:-1])
    inter = np.bincount(row[same], minlength=n).astype(np.float64)
    union = na + nb - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 1.0)


_K_PERM = 64
_rng = np.random.RandomState(20260817)
_PERM_A = (_rng.randint(1, 2**62, size=_K_PERM).astype(np.uint64) * np.uint64(2) + np.uint64(1))
_PERM_B = _rng.randint(0, 2**62, size=_K_PERM).astype(np.uint64)
# 32 bands x 2 rows: collision prob for a true J >= 0.5 pair is
# 1 - (1 - 0.25)^32 > 0.9999, so the exact-Jaccard SQL oracle is a safe twin
# (measured min planted-pair Jaccard in the testdata is 0.7 -> miss ~ 1e-9);
# false candidates are pruned by exact verification, so extra bands cost
# only candidate volume, not precision
_BANDS = 32
_ROWS_PER_BAND = _K_PERM // _BANDS
_BAND_W = _rng.randint(1, 2**62, size=_ROWS_PER_BAND).astype(np.uint64) * np.uint64(2) + np.uint64(1)
# extra weights for non-default rows-per-band configurations; the first two
# entries stay the original _BAND_W so default band hashes are unchanged
_BAND_W_FULL = np.concatenate(
    [
        _BAND_W,
        (
            np.random.RandomState(20260820).randint(
                1, 2**62, size=_K_PERM - _ROWS_PER_BAND
            ).astype(np.uint64)
            * np.uint64(2)
            + np.uint64(1)
        ),
    ]
)


def _lsh_rows_per_band(threshold: float, recall: float = 0.999) -> int:
    """Largest rows-per-band (divisor of _K_PERM) whose banded recall at
    Jaccard exactly ``threshold`` stays >= ``recall``. The fixed 32x2 config
    was tuned for threshold >= 0.5 — at threshold 0.2 it silently lost ~27%
    of qualifying pairs (1-(1-0.2^2)^32 = 0.73); bigger rows-per-band at
    high thresholds instead cuts false-candidate volume."""
    best = None
    for r in (1, 2, 4, 8, 16, 32, 64):
        b = _K_PERM // r
        if 1.0 - (1.0 - float(threshold) ** r) ** b >= recall:
            best = r
    if best is None:
        # even 1 row/band (the most permissive banding K_PERM permutations
        # allow) cannot hit the recall target — e.g. threshold ~0.05 with 64
        # perms tops out near 0.96. Degrading silently is the exact failure
        # mode this function exists to prevent, so say so.
        import warnings

        achievable = 1.0 - (1.0 - float(threshold)) ** _K_PERM
        warnings.warn(
            f"minhash LSH at threshold={threshold} cannot reach recall="
            f"{recall} with {_K_PERM} permutations even at 1 row/band "
            f"(achievable ~{achievable:.4f}); proceeding at r=1 with "
            "degraded recall",
            stacklevel=2,
        )
        best = 1
    return best


def minhash_signatures(texts: pd.Series) -> np.ndarray:
    """(n_rows, K_PERM) uint64 minhash signature matrix, fully vectorized."""
    tok, offsets = _token_hashes(texts)
    sh, sh_off = _shingle_hashes(tok, offsets)
    n = len(offsets) - 1
    sig = np.full((n, _K_PERM), _MASK, dtype=np.uint64)
    if len(sh) == 0:
        return sig
    nonempty = np.diff(sh_off) > 0
    if not nonempty.any():
        return sig
    starts = sh_off[:-1][nonempty]
    # reduceat ONLY at nonempty rows' starts (strictly increasing, all in
    # range): the clamped-starts variant stole the last shingle from the
    # final nonempty row whenever trailing rows were empty, making
    # signatures batch-boundary-dependent (same class as fingerprint_batch).
    # Permutations process in chunks so the (n_shingles, chunk) transient is
    # bounded: the full (S, 64) uint64 matrix is 512 B/shingle — ~4 GB for a
    # batch of 4096 2k-token docs, multiplied by concurrent tasks.
    _CH = 16
    for c0 in range(0, _K_PERM, _CH):
        hashed = (
            sh[:, None] * _PERM_A[None, c0 : c0 + _CH]
            + _PERM_B[None, c0 : c0 + _CH]
        ) & _MASK
        sig[nonempty, c0 : c0 + _CH] = np.minimum.reduceat(hashed, starts, axis=0)
    return sig


def band_hashes(sig: np.ndarray, rows_per_band: int = _ROWS_PER_BAND) -> np.ndarray:
    """(n_rows, K_PERM//rows_per_band) uint64: one bucket hash per band."""
    n = sig.shape[0]
    bands = _K_PERM // rows_per_band
    w = _BAND_W_FULL[:rows_per_band]
    out = np.empty((n, bands), dtype=np.uint64)
    for b in range(bands):
        chunk = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
        out[:, b] = (chunk * w[None, :]).sum(axis=1, dtype=np.uint64) & _MASK
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
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """EXACT token-3-gram Jaccard pairs (id_a < id_b, jaccard >= threshold).

    Fully distributed mirror of the oracle SQL's explode-join-group plan (no
    whole-corpus broadcast, no driver materialization):

    1. per batch, distinct gram identities (128-bit, two independent mixes)
       per doc plus the doc's distinct-gram count -> (g1, g2, id, n) rows;
    2. one shuffle keyed on hash(g1, g2): docs sharing a gram meet in a
       bucket; each shared gram emits its doc pairs once, pre-counted within
       the bucket (``count_pairs``) so the pair shuffle carries partials;
    3. tiny groupby summing partial intersection counts, then the Jaccard
       filter c / (n_a + n_b - c) >= threshold.

    Cost is the intrinsic exact-join cost (sum over grams of k^2 pairs) — an
    ultra-frequent gram concentrates k ids in one segment; corpora with such
    stop-grams should pre-filter them (the oracle keeps every gram, so no
    default cap here). Pairs whose trigram sets are both empty are NOT
    emitted (union = 0), matching the SQL. :func:`minhash_lsh_pairs` is the
    probabilistic scale path.
    """

    def to_grams(batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch[text_col].to_pylist(), dtype=object)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        row, g1, g2, sizes = _distinct_grams(texts)
        return pa.table(
            {
                "g1": pa.array(g1),
                "g2": pa.array(g2),
                id_col: pa.array(ids[row]),
                "n": pa.array(sizes[row]),
            }
        )

    grams = ds.map_batches(to_grams, batch_format="pyarrow")
    pairs = candidate_pairs_from_buckets(
        grams, ["g1", "g2"], id_col, carry_cols=["n"], count_pairs=True,
        num_buckets=num_buckets,
    )

    # merge the per-bucket partial counts per (id_a, id_b) with a bucketed
    # vectorized reduce, NOT groupby(pair-cols).aggregate: the candidate set
    # here is ~millions of distinct pairs and Ray's generic aggregate costs
    # minutes at that group count (measured 220 s at 1.7 M groups, sf0.1)
    # where one lexsort + reduceat per bucket is sub-second. The Jaccard
    # filter folds into the reduce (a bucket holds every partial of its
    # pairs).
    def add_pair_bucket(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["id_a"], dtype=np.int64).astype(np.uint64)
        b = np.asarray(batch["id_b"], dtype=np.int64).astype(np.uint64)
        h = (a * np.uint64(0x100000001B3) + b) % np.uint64(num_buckets)
        return batch.append_column("__pb", pa.array(h.astype(np.int64)))

    def reduce_pairs(tbl: pa.Table) -> pa.Table:
        a = np.asarray(tbl["id_a"], dtype=np.int64)
        b = np.asarray(tbl["id_b"], dtype=np.int64)
        na = np.asarray(tbl["n_a"], dtype=np.int64)
        nb = np.asarray(tbl["n_b"], dtype=np.int64)
        c = np.asarray(tbl["c"], dtype=np.int64)
        if len(a) == 0:
            return pa.table(
                {"id_a": pa.array([], type=pa.int64()), "id_b": pa.array([], type=pa.int64())}
            )
        order = np.lexsort((b, a))
        a, b, na, nb, c = a[order], b[order], na[order], nb[order], c[order]
        first = np.ones(len(a), dtype=bool)
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.nonzero(first)[0]
        csum = np.add.reduceat(c, starts)
        a, b, na, nb = a[starts], b[starts], na[starts], nb[starts]
        keep = csum.astype(np.float64) / (na + nb - csum).astype(np.float64) >= threshold
        return pa.table({"id_a": pa.array(a[keep]), "id_b": pa.array(b[keep])})

    return (
        pairs.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("__pb")
        .map_groups(
            lambda t: reduce_pairs(t.drop_columns(["__pb"])), batch_format="pyarrow"
        )
    )


# -- candidate generation ----------------------------------------------------


def candidate_pairs_from_buckets(
    ds: ray.data.Dataset,
    key_cols: list[str],
    id_col: str,
    carry_cols: list[str] | None = None,
    num_buckets: int = 32,
    count_pairs: bool = False,
) -> ray.data.Dataset:
    """(key..., id) rows -> candidate (id_a, id_b) pairs per identical key.

    One shuffle keyed on ``hash(key) % num_buckets`` (NOT one Python call per
    bucket value — LSH/gram explosion produces millions of mostly-singleton
    key segments, and ``groupby(key).map_groups`` would be a Python loop over
    all of them). Within a hash bucket, rows are sorted by (key..., id),
    (key, id) duplicates dropped, and every >= 2-id segment emits its id
    pairs — all with numpy index arithmetic, no per-segment Python loop.
    ``carry_cols`` values (e.g. signatures, set sizes) ride along as
    (a, b) column pairs. ``count_pairs=True`` additionally pre-aggregates
    identical pairs *within* the bucket into a partial multiplicity column
    ``c`` (= number of shared keys seen in this bucket) so the downstream
    pair shuffle carries partials instead of one row per shared key.
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
        keys = [np.asarray(tbl[c], dtype=np.int64) for c in key_cols]
        ids = np.asarray(tbl[id_col], dtype=np.int64)
        order = np.lexsort((ids, *reversed(keys)))
        keys = [k[order] for k in keys]
        ids = ids[order]
        carry = [np.asarray(tbl[c])[order] for c in carry_cols]
        m = len(ids)
        empty = {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            **{f"{c}_{s}": pa.array([], type=pa.int64()) for c in carry_cols for s in "ab"},
        }
        if count_pairs:
            empty["c"] = pa.array([], type=pa.int64())
        if m == 0:
            return pa.table(empty)
        # drop duplicate (key, id) rows
        same_key = np.ones(m, dtype=bool)
        same_key[0] = False
        for k in keys:
            same_key[1:] &= k[1:] == k[:-1]
        dup = same_key.copy()
        dup[1:] &= ids[1:] == ids[:-1]
        keep = ~dup
        keys = [k[keep] for k in keys]
        ids = ids[keep]
        carry = [cv[keep] for cv in carry]
        same_key = same_key[keep]
        same_key[0] = False
        m = len(ids)
        # per row: its position within its key segment = #earlier rows it pairs with
        seg_start = np.nonzero(~same_key)[0]
        seg_id = np.cumsum(~same_key) - 1
        row_seg_start = seg_start[seg_id]
        pos = np.arange(m, dtype=np.int64) - row_seg_start
        total = int(pos.sum())
        if total == 0:
            return pa.table(empty)
        b_rows = np.repeat(np.arange(m, dtype=np.int64), pos)
        run_start = np.cumsum(pos) - pos
        a_rows = np.repeat(row_seg_start, pos) + (
            np.arange(total, dtype=np.int64) - np.repeat(run_start, pos)
        )
        id_a, id_b = ids[a_rows], ids[b_rows]
        carry_a = [cv[a_rows] for cv in carry]
        carry_b = [cv[b_rows] for cv in carry]
        c_part = None
        if count_pairs:
            o2 = np.lexsort((id_b, id_a))
            id_a, id_b = id_a[o2], id_b[o2]
            carry_a = [cv[o2] for cv in carry_a]
            carry_b = [cv[o2] for cv in carry_b]
            first = np.ones(total, dtype=bool)
            first[1:] = (id_a[1:] != id_a[:-1]) | (id_b[1:] != id_b[:-1])
            starts = np.nonzero(first)[0]
            c_part = np.diff(np.append(starts, total))
            id_a, id_b = id_a[starts], id_b[starts]
            carry_a = [cv[starts] for cv in carry_a]
            carry_b = [cv[starts] for cv in carry_b]
        cols = {"id_a": pa.array(id_a), "id_b": pa.array(id_b)}
        for ci, c in enumerate(carry_cols):
            cols[f"{c}_a"] = pa.array(carry_a[ci])
            cols[f"{c}_b"] = pa.array(carry_b[ci])
        if count_pairs:
            cols["c"] = pa.array(c_part.astype(np.int64))
        return pa.table(cols)

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda t: per_bucket(t.drop_columns(["__bucket"])), batch_format="pyarrow"
        )
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

    from .group_collect import bucketed_min

    # distinct-text key cardinality ~ corpus size: the bucketed min reduce,
    # not the generic aggregate (group_collect.py rationale)
    out = bucketed_min(
        ds.map_batches(hash_batch, batch_format="pyarrow"), ["h1", "h2"], [id_col]
    )
    return out.select_columns([id_col])


def minhash_band_rows(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "id",
) -> ray.data.Dataset:
    """(band, bhash, id) LSH band rows for every doc — the signing stage of
    :func:`minhash_lsh_pairs`, exposed so the incremental-dedup pipeline
    (pipelines/incremental_dedup.py) can persist signatures for one corpus
    version and re-sign ONLY the delta on the next. Band derivation is
    threshold-dependent (:func:`_lsh_rows_per_band`) but corpus-size
    independent, so rows signed under the same threshold are comparable
    across versions."""
    rows_per_band = _lsh_rows_per_band(threshold)

    def to_bands(batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch[text_col].to_pylist(), dtype=object)
        sig = minhash_signatures(texts)
        bh = band_hashes(sig, rows_per_band)
        n, B = bh.shape
        ids = np.asarray(batch[id_col], dtype=np.int64)
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(B, dtype=np.int64), n)),
                "bhash": pa.array(bh.ravel().astype(np.int64)),
                id_col: pa.array(np.repeat(ids, B)),
            }
        )

    return ds.map_batches(to_bands, batch_format="pyarrow")


def minhash_lsh_pairs(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "id",
) -> ray.data.Dataset:
    """Near-duplicate pairs (id_a < id_b) with exact Jaccard >= threshold.

    Candidates from LSH band buckets; verification is fully distributed: the
    candidate pair table is hash-joined (``Dataset.join``) to the text column
    twice (id_a -> text_a, id_b -> text_b) and each pair batch is verified
    with the vectorized exact-Jaccard kernel (:func:`_pair_jaccard_batch`) —
    no driver-side materialization, no per-pair Python. Shuffled verify
    volume is O(candidates x text bytes), not corpus-sized.
    """

    bands = minhash_band_rows(ds, threshold=threshold, text_col=text_col, id_col=id_col)
    from .group_collect import bucketed_distinct

    cand = bucketed_distinct(
        candidate_pairs_from_buckets(bands, ["band", "bhash"], id_col),
        ["id_a", "id_b"],
    )
    verified = _verify_pairs_jaccard(cand, ds, threshold, text_col=text_col, id_col=id_col)
    return verified


def _verify_pairs_jaccard(
    pairs: ray.data.Dataset,
    docs: ray.data.Dataset,
    threshold: float,
    *,
    text_col: str = "text",
    id_col: str = "id",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Attach both texts to candidate (id_a, id_b) pairs via two partitioned
    hash joins, then keep pairs with exact gram Jaccard >= threshold.

    ``num_partitions`` defaults to half the cluster CPUs per join: each
    ``Dataset.join`` holds ``num_partitions`` aggregator actors alive for the
    whole stage, and the two chained joins run concurrently — requesting more
    aggregators than CPUs deadlocks the streaming executor (observed with 16
    partitions on a 4-CPU test cluster).
    """
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_partitions = max(2, cpus // 2)

    # the attaches run on the engine's own hash_join_attach rather than
    # Dataset.join: sparse-candidate corpora (the realistic case — most
    # buckets hold no pair) emit schema-LESS empty blocks upstream, Ray
    # skips map UDFs on empty blocks so they cannot be normalized away, and
    # Dataset.join's aggregator fails on them with "No match for FieldRef
    # id_a" (found by bench_dedup.py's non-pathological corpus; the
    # planted-dup fixtures always had pairs in every block). The bucketed
    # groupby machinery never routes empty blocks into a merge task.
    # Candidate ids always exist in the corpus, so the left attach is an
    # inner join in effect; a defensive null filter keeps the contract.
    from .joins import hash_join_attach

    joined = hash_join_attach(
        pairs,
        "id_a",
        docs.select_columns([id_col, text_col]).rename_columns(
            {id_col: "__ja", text_col: "__text_a"}
        ),
        "__ja",
        {"__text_a": pa.string()},
        num_buckets=num_partitions,
    )
    joined = hash_join_attach(
        joined,
        "id_b",
        docs.select_columns([id_col, text_col]).rename_columns(
            {id_col: "__jb", text_col: "__text_b"}
        ),
        "__jb",
        {"__text_b": pa.string()},
        num_buckets=num_partitions,
    )

    def verify(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pa.compute.and_(
                pa.compute.is_valid(batch["__text_a"]),
                pa.compute.is_valid(batch["__text_b"]),
            )
        )
        ta = pd.Series(batch["__text_a"].to_pylist(), dtype=object)
        tb = pd.Series(batch["__text_b"].to_pylist(), dtype=object)
        keep = pa.array(_pair_jaccard_batch(ta, tb) >= threshold)
        return pa.table(
            {"id_a": batch["id_a"].filter(keep), "id_b": batch["id_b"].filter(keep)}
        )

    return joined.map_batches(verify, batch_format="pyarrow")


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
    nonempty = np.diff(offsets) > 0
    sums = np.zeros((n, 64), dtype=np.int64)
    # reduceat only at nonempty rows' starts — empty-safe (see minhash)
    if nonempty.any():
        sums[nonempty] = np.add.reduceat(contrib, offsets[:-1][nonempty], axis=0)
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
    of images, etc. Candidate generation: the 64 bits split into
    ``max_hamming + 1`` near-equal chunks, so a pair within distance d
    touches at most d chunks and MUST agree exactly on at least one
    (pigeonhole — COMPLETE for any d <= 63; an earlier fixed 4x16-bit split
    silently missed pairs above d = 3, e.g. one differing bit per chunk);
    verification by true popcount distance. One shuffle keyed on
    (chunk, chunk_value); dense buckets are the skew risk and verification
    is quadratic per bucket — callers with adversarial signature skew should
    salt or cap bucket sizes. Narrower chunks (bigger d) collide more —
    the honest completeness/candidate-volume trade.
    """
    if not 0 <= max_hamming <= 63:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    n_chunks = max_hamming + 1
    bounds = np.linspace(0, 64, n_chunks + 1).astype(np.int64)

    def to_chunks(batch: pa.Table) -> pa.Table:
        sig = np.asarray(batch[sig_col], dtype=np.int64).astype(np.uint64)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        n = len(sig)
        chunks = np.empty((n, n_chunks), dtype=np.int64)
        for c in range(n_chunks):
            lo, hi = int(bounds[c]), int(bounds[c + 1])
            mask = np.uint64((1 << (hi - lo)) - 1)
            chunks[:, c] = ((sig >> np.uint64(lo)) & mask).astype(np.int64)
        return pa.table(
            {
                "chunk": pa.array(np.tile(np.arange(n_chunks, dtype=np.int64), n)),
                "cval": pa.array(chunks.ravel()),
                id_col: pa.array(np.repeat(ids, n_chunks)),
                "sig": pa.array(np.repeat(sig.astype(np.int64), n_chunks)),
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

    from .group_collect import bucketed_distinct

    verified = cand.map_batches(verify, batch_format="pyarrow")
    # pair cardinality scales with near-dup density: bucketed distinct
    return bucketed_distinct(verified, ["id_a", "id_b"])


_POPCOUNT = np.array([bin(i).count("1") for i in range(256)], dtype=np.int64)


# Below this many (directed) edge rows, connected components runs as ONE
# vectorized Ray task instead of the round-based distributed propagation:
# each distributed round costs several shuffles of fixed machinery (~2-3 s
# on this host) TIMES the graph diameter, while a single task solves a
# 4M-edge graph in well under a second (hash-min + pointer-jumping, so
# in-task rounds are O(log diameter) vectorized passes). The distributed
# loop stays the scale path for genuinely large edge sets.
_LOCAL_CC_EDGE_LIMIT = 4_000_000


def _local_cc(labels: ray.data.Dataset, edges: ray.data.Dataset) -> ray.data.Dataset:
    """Single-task exact CC over a bounded edge set, then a broadcast map
    attaches group ids to every vertex (isolated vertices label themselves).
    The driver never touches the edge list — only the per-edge-endpoint
    group table, bounded by 2 x _LOCAL_CC_EDGE_LIMIT rows."""

    def cc_task(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch["src"], dtype=np.int64)
        dst = np.asarray(batch["dst"], dtype=np.int64)
        uniq = np.unique(src)  # both directions present -> src covers all
        label = uniq.copy()
        si = np.searchsorted(uniq, src)
        di = np.searchsorted(uniq, dst)
        while True:
            new = label.copy()
            np.minimum.at(new, di, label[si])
            # pointer jump: labels are ids of vertices in uniq, so chase one
            # level (label of my label) — doubles reach per pass
            new = np.minimum(new, new[np.searchsorted(uniq, new)])
            if np.array_equal(new, label):
                break
            label = new
        return pa.table({"id": pa.array(uniq), "group_id": pa.array(label)})

    comp = (
        edges.repartition(1)
        .map_batches(cc_task, batch_format="pyarrow", batch_size=None)
        .materialize()
    )

    cdf = comp.to_pandas()  # bounded by the gate; sorted by construction
    ref = ray.put(
        (cdf["id"].to_numpy(np.int64), cdf["group_id"].to_numpy(np.int64))
    )

    def attach(batch: pa.Table) -> pa.Table:
        from ..state.broadcast import get as _bget

        cid, cgrp = _bget(ref)
        ids = np.asarray(batch["id"], dtype=np.int64)
        if len(cid):
            pos = np.clip(np.searchsorted(cid, ids), 0, len(cid) - 1)
            grp = np.where(cid[pos] == ids, cgrp[pos], ids)
        else:
            grp = ids
        return pa.table({"id": pa.array(ids), "group_id": pa.array(grp)})

    return labels.select_columns(["id"]).map_batches(attach, batch_format="pyarrow")


def connected_components(
    ids: ray.data.Dataset,
    pairs: ray.data.Dataset,
    *,
    id_col: str = "id",
    max_iters: int = 20,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Distributed connected components over near-dup pair edges: each id is
    labeled with the MINIMUM id reachable through the pair graph (the
    canonical "dedup group" resolution — keep min, drop the rest).

    Hash-min label propagation WITH POINTER JUMPING: per round, every vertex
    takes the min of its own label, its neighbors' labels (edges join labels
    on src) and the label OF its label (labels self-join) — the jump halves
    the remaining distance to the component minimum each round, so rounds
    needed = O(log diameter), not diameter (a 1M-document near-dup chain
    converges in ~20 rounds instead of 1M). The loop stops as soon as a
    round changes nothing and RAISES if max_iters is exhausted first —
    silently returning unconverged labels would split one true component
    into several dedup groups. Convergence detection is folded into
    the round's own aggregate — each vertex's previous label rides along as
    a second Min column (edge-derived rows carry +inf there), so "did
    anything change" is a vectorized sum over the already-materialized
    round output, not an extra labels-vs-labels join. Labels materialize
    per round so the lineage doesn't re-execute iteratively.

    Returns (id, group_id).
    """

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_partitions = max(2, cpus // 2)

    def init_labels(batch: pa.Table) -> pa.Table:
        v = batch[id_col]
        return pa.table({"id": v, "label": v})

    # repartition BEFORE materializing: upstream pair/id streams can carry
    # schema-less empty blocks (pair-less reduce partitions; Ray skips map
    # UDFs on empty blocks so they survive every normalization attempt) and
    # the per-round Dataset.joins below fail on them — physically merging
    # blocks resolves empties against the real schema
    labels = ids.select_columns([id_col]).map_batches(
        init_labels, batch_format="pyarrow"
    ).repartition(num_partitions).materialize()

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["id_a"], dtype=np.int64)
        b = np.asarray(batch["id_b"], dtype=np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )

    edges = (
        pairs.map_batches(both_dirs, batch_format="pyarrow")
        .repartition(num_partitions)  # same schema-less-empty rationale
        .materialize()
    )
    n_edges = edges.count()
    if n_edges == 0:
        return labels.rename_columns({"label": "group_id"})
    if n_edges <= _LOCAL_CC_EDGE_LIMIT:
        return _local_cc(labels, edges)

    INF = np.iinfo(np.int64).max

    def tag_old(batch: pa.Table) -> pa.Table:
        # a vertex's current label doubles as its "old" marker for the round
        return pa.table({"id": batch["id"], "label": batch["label"], "old": batch["label"]})

    def tag_inf(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "id": batch["id"],
                "label": batch["label"],
                "old": pa.array(np.full(n, INF, dtype=np.int64)),
            }
        )

    def count_changed(batch: pa.Table) -> pa.Table:
        changed = np.asarray(batch["label"], dtype=np.int64) < np.asarray(
            batch["old"], dtype=np.int64
        )
        return pa.table({"changed": pa.array([int(changed.sum())], type=pa.int64())})

    for _ in range(max_iters):
        cand = (
            edges.join(
                labels.rename_columns({"id": "src", "label": "src_label"}),
                "inner",
                num_partitions,
                on=("src",),
            )
            .select_columns(["dst", "src_label"])
            .rename_columns({"dst": "id", "src_label": "label"})
        )
        # pointer jump: vertex v with label l also considers label(l) —
        # label values are vertex ids, so labels self-join on the label col
        jump = (
            labels.rename_columns({"label": "l"})
            .join(
                labels.rename_columns({"id": "l", "label": "jl"}),
                "inner",
                num_partitions,
                on=("l",),
            )
            .select_columns(["id", "jl"])
            .rename_columns({"jl": "label"})
        )
        from .group_collect import bucketed_reduce as _breduce

        # vertex count is corpus-sized in the above-gate regime: bucketed
        # min reduce per round, not the generic aggregate
        merged = _breduce(
            labels.map_batches(tag_old, batch_format="pyarrow")
            .union(
                cand.map_batches(tag_inf, batch_format="pyarrow"),
                jump.map_batches(tag_inf, batch_format="pyarrow"),
            ),
            ["id"],
            {"label": "min", "old": "min"},
        ).materialize()
        changed = (
            merged.map_batches(count_changed, batch_format="pyarrow").sum("changed")
            or 0
        )
        labels = merged.select_columns(["id", "label"])
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge within max_iters="
            f"{max_iters} rounds (with pointer jumping that bounds component "
            f"diameter by ~2^{max_iters}); raise max_iters — returning "
            "unconverged labels would silently split dedup groups"
        )
    return labels.rename_columns({"label": "group_id"})


def dedup_groups(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "id",
) -> ray.data.Dataset:
    """(id, group_id) over the exact-Jaccard near-dup graph: group_id = the
    smallest id in each connected component of pairs with J >= threshold."""
    pairs = ngram_jaccard_pairs(
        ds, threshold=threshold, text_col=text_col, id_col=id_col
    )
    return connected_components(ds.select_columns([id_col]), pairs, id_col=id_col)


def dedup_keep_best(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "id",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Representative selection over near-dup groups: for each connected
    component of the J >= threshold pair graph, keep the member with the
    LONGEST text (tie -> smallest id) and report the group size. This is the
    canonical training-data dedup flow (cluster, then keep one document per
    cluster) composed from the distributed pieces: trigram-join pairs ->
    hash-min connected components -> an order-encoding max aggregate.

    The argmax is packed into a single int64 key (len << 32 | ~id) so the
    per-group reduction is a plain Max + Count with partial combiners inside
    map_batches tasks -- no per-group materialization, no sort. Assumes
    text length < 2^31 and id < 2^32 (both hold for document corpora keyed
    by int ids; widen to two-column argmax otherwise).

    Returns (group_id, kept_id, n_members).
    """

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_partitions = max(2, cpus // 2)

    groups = dedup_groups(
        ds, threshold=threshold, text_col=text_col, id_col=id_col
    )

    ID_MASK = (1 << 32) - 1

    def length_key(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        lens = np.asarray(pc.utf8_length(batch[text_col]), dtype=np.int64)
        return pa.table({"id": ids, "key": (lens << 32) | (ID_MASK - ids)})

    from .group_collect import bucketed_reduce

    from .joins import hash_join_attach

    keys = ds.map_batches(length_key, batch_format="pyarrow")
    # hash_join_attach, not Dataset.join: the CC-derived groups stream can
    # carry schema-less empty blocks on sparse corpora (same class as
    # _verify_pairs_jaccard); keys are unique per id, so the left attach is
    # an inner join in effect (every grouped id exists in the corpus)
    joined = hash_join_attach(
        groups, "id", keys.rename_columns({"id": "__kid"}), "__kid",
        {"key": pa.int64()}, num_buckets=num_partitions,
    )
    # group count ~ corpus size: bucketed mixed-op reduce, not the generic
    # aggregate (group_collect.py rationale)
    agg = bucketed_reduce(
        joined.map_batches(
            lambda t: pa.table(
                {
                    "group_id": t["group_id"],
                    "best": t["key"],
                    "n_members": pa.array(np.ones(len(t), dtype=np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        ["group_id"],
        {"best": "max", "n_members": "sum"},
    )

    def decode(batch: pa.Table) -> pa.Table:
        best = np.asarray(batch["best"], dtype=np.int64)
        return pa.table(
            {
                "group_id": batch["group_id"],
                "kept_id": ID_MASK - (best & ID_MASK),
                "n_members": batch["n_members"],
            }
        )

    return agg.map_batches(decode, batch_format="pyarrow")


def _word_shingles(texts: pd.Series, n: int) -> tuple[np.ndarray, np.ndarray]:
    """All n-token shingle strings per doc, vectorized over the batch's
    flattened token stream: (shingle_strings, doc_index_of_shingle). A
    shingle is n lowercased whitespace tokens joined by one space —
    identical to the SQL ``array_to_string(t[i:i+n-1], ' ')`` spec."""
    from .text import _doc_tokens

    flat, doc_of = _doc_tokens(texts)
    if len(flat) < n:
        return np.array([], dtype=object), np.array([], dtype=np.int64)
    valid = doc_of[: len(flat) - n + 1] == doc_of[n - 1 :]
    idx = np.nonzero(valid)[0]
    if len(idx) == 0:
        return np.array([], dtype=object), np.array([], dtype=np.int64)
    s = pd.Series(flat[idx])
    for j in range(1, n):
        s = s + " " + pd.Series(flat[idx + j])
    return s.to_numpy(), doc_of[idx]


def decontaminate(
    ds: ray.data.Dataset,
    *,
    n: int = 4,
    eval_mod: int = 53,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Benchmark decontamination: flag every training document sharing any
    n-token shingle with any eval-set document (eval set = id % eval_mod == 0,
    a deterministic split the oracle can recompute). Output: (doc_id,) of
    contaminated training docs.

    Scale shape: the eval side is tiny by definition (benchmarks are KBs-MBs
    against a 100 TB corpus), so its distinct shingle set is collected once
    and broadcast via ray.put; the training corpus then streams through ONE
    map_batches probe — no shuffle, no join. The probe is vectorized:
    flattened sliding-window shingles + a hashed isin + bincount per doc.
    (The reference has no text ops; this is the standard eval-overlap filter
    of an LLM training-data pipeline.)"""
    from ..state.broadcast import get as bget

    def eval_shingles(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        keep = ids % eval_mod == 0
        sh, _ = _word_shingles(batch[text_col].to_pandas()[keep].reset_index(drop=True), n)
        return pa.table({"s": pa.array(pd.unique(sh), type=pa.string())})

    ev = set()
    for b in ds.map_batches(eval_shingles, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        ev.update(b["s"].to_pylist())
    ref = ray.put(frozenset(ev))

    def probe(batch: pa.Table) -> pa.Table:
        evset = bget(ref)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        train = ids % eval_mod != 0
        texts = batch[text_col].to_pandas()[train].reset_index(drop=True)
        sh, doc_of = _word_shingles(texts, n)
        hit = pd.Series(sh).isin(evset).to_numpy() if len(sh) else np.zeros(0, dtype=bool)
        n_docs = int(train.sum())
        flagged = np.bincount(doc_of[hit], minlength=n_docs) > 0 if n_docs else np.zeros(0, dtype=bool)
        out = ids[train][flagged]
        return pa.table({"doc_id": pa.array(out, type=pa.int64())})

    return ds.map_batches(probe, batch_format="pyarrow")


def _shingle_hashes_n(tok: np.ndarray, offsets: np.ndarray, n: int, mix: int = 0):
    """n-token generalization of :func:`_shingle_hashes`: combine n
    consecutive token hashes with per-position multipliers; valid only
    within rows. Returns (flat shingle hashes, per-row shingle offsets)."""
    total = len(tok)
    lens = np.diff(offsets)
    sh_lens = np.maximum(lens - (n - 1), 0)
    sh_off = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(sh_lens, out=sh_off[1:])
    if total < n:
        return np.array([], dtype=np.uint64), sh_off
    ma, mb, mc = _SHINGLE_MIX[mix]
    muls = [ma]
    for _ in range(n - 1):
        muls.append((muls[-1] * mb + mc) & _MASK)
    w = total - (n - 1)
    combined = np.zeros(w, dtype=np.uint64)
    for j in range(n):
        combined ^= (tok[j : w + j] * muls[j]) & _MASK
    row_id = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    valid = row_id[:w] == row_id[n - 1 :]
    return combined[valid] & _MASK, sh_off


def dup_span_docs(
    ds: ray.data.Dataset, *, n: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """Corpus-wide duplicated-span detection (the all-pairs complement of
    :func:`decontaminate`): every document sharing at least one n-token
    shingle with ANOTHER document. Output: (doc_id,) distinct.

    Scale shape: distinct (shingle, doc) pairs per batch, ONE shuffle keyed
    on the shingle string, per-group emit when the group spans >1 distinct
    doc, then a doc-keyed dedup of the (bounded-by-corpus-size) hits — the
    exact-substring-dedup building block (Lee et al. 2022's 'deduplicating
    training data' span step at shingle granularity)."""

    def pairs(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        texts = batch[text_col].to_pandas().str.lower()
        tok, offsets = _token_hashes(texts)
        h1, sh_off = _shingle_hashes_n(tok, offsets, n, mix=0)
        h2, _ = _shingle_hashes_n(tok, offsets, n, mix=1)
        if len(h1) == 0:
            return pa.table({"h1": pa.array([], type=pa.int64()),
                             "h2": pa.array([], type=pa.int64()),
                             "doc_id": pa.array([], type=pa.int64())})
        doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), np.diff(sh_off))
        # shuffle 128-bit shingle identities, not strings: ~10x fewer bytes
        # through the exchange; collision odds ~ V^2/2^128 are negligible
        d = pd.DataFrame(
            {"h1": h1.astype(np.int64), "h2": h2.astype(np.int64), "doc_id": ids[doc_of]}
        ).drop_duplicates()
        return pa.Table.from_pandas(d, preserve_index=False)

    def emit_shared(tbl: pa.Table) -> pa.Table:
        h1 = np.asarray(tbl["h1"], dtype=np.int64)
        h2 = np.asarray(tbl["h2"], dtype=np.int64)
        ids = np.asarray(tbl["doc_id"], dtype=np.int64)
        order = np.lexsort((h2, h1))
        h1, h2, ids = h1[order], h2[order], ids[order]
        new = np.ones(len(h1), dtype=bool)
        new[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
        grp = np.cumsum(new) - 1
        # docs are distinct within a (shingle) group already (per-batch dedup
        # is global: each doc's text lives in exactly one row)
        sizes = np.bincount(grp)
        keep = sizes[grp] > 1
        return pa.table({"doc_id": pa.array(np.unique(ids[keep]))})

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = np.asarray(batch["h1"], dtype=np.int64)
        b = np.abs((h * np.int64(-7046029254386353131)) >> np.int64(32)) % 64
        return batch.append_column("__bucket", pa.array(b.astype(np.int64)))

    # bucket the shingle key (emit_shared segments multiple groups in one
    # vectorized call) — groupby(h1) at millions of distinct shingles pays
    # the per-group machinery cost (group_collect.py rationale)
    hits = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda t: emit_shared(t.drop_columns(["__bucket"])),
            batch_format="pyarrow",
        )
    )
    from .group_collect import bucketed_distinct

    # doc cardinality ~ corpus: bucketed distinct, not the generic aggregate
    return bucketed_distinct(hits, ["doc_id"])


def source_caption_overlap(sf_dir: str) -> ray.data.Dataset:
    """Cross-source contamination matrix: for every pair of sources, how
    many DISTINCT texts appear in both — the dataset-curation question
    "how much of corpus A is already in corpus B". Runs over the planted-
    duplicate corpus (sources/dup_docs.py) with the copy tier as the
    source label, so 'orig' x 'exact_copy' measures exactly the planted
    contamination.

    Shape: per-batch distinct (128-bit text hash, source id) rows; the
    shared candidate-pair machinery (hash-bucketed, global (key, id) dedup
    within bucket, within-bucket pair pre-aggregation) emits per-bucket
    (source_a, source_b, c) partials; one tiny pair-keyed groupby sums.
    Text bytes never shuffle — only hashes and small int ids.
    Output: (source_a, source_b, n_shared).
    """
    from ray.data.aggregate import Sum

    from ..sources.dup_docs import EXACT_OFFSET, NEAR_OFFSET, dup_documents

    ds = dup_documents(sf_dir)
    names = np.asarray(["exact_copy", "near_copy", "orig"], dtype=object)

    def prep(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch["text"].to_pylist(), dtype=object)
        h1 = pd.util.hash_pandas_object(s, index=False, hash_key="0123456789123456")
        h2 = pd.util.hash_pandas_object(s, index=False, hash_key="6543210987654321")
        ids = np.asarray(batch["id"], dtype=np.int64)
        sid = np.where(ids >= NEAR_OFFSET, 1, np.where(ids >= EXACT_OFFSET, 0, 2))
        t = pa.table(
            {
                "h1": pa.array(h1.to_numpy().astype(np.int64)),
                "h2": pa.array(h2.to_numpy().astype(np.int64)),
                "sid": pa.array(sid.astype(np.int64)),
            }
        )
        return t.group_by(["h1", "h2", "sid"]).aggregate([])

    pairs = candidate_pairs_from_buckets(
        ds.map_batches(prep, batch_format="pyarrow"),
        key_cols=["h1", "h2"],
        id_col="sid",
        count_pairs=True,
    )
    agg = (
        pairs.groupby(["id_a", "id_b"])
        .aggregate(Sum("c", alias_name="n_shared"))
    )

    def to_names(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["id_a"], dtype=np.int64)
        b = np.asarray(batch["id_b"], dtype=np.int64)
        return pa.table(
            {
                "source_a": pa.array(names[a], type=pa.string()),
                "source_b": pa.array(names[b], type=pa.string()),
                "n_shared": batch["n_shared"],
            }
        )

    return agg.map_batches(to_names, batch_format="pyarrow")


def image_dedup_savings(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Storage-savings report for caption-exact image dedup: treating each
    row as an image whose payload size follows the corpus's raw-codec
    accounting (9-byte header + 3 bytes/pixel, dims derived from the id —
    the image_shards formula), group rows by EXACT caption and report how
    many duplicate groups exist, how many rows dedup would drop (keeping
    the largest payload per group) and the exact bytes reclaimed — the
    what-if a curation pipeline costs before committing to a dedup pass.
    All-integer. Output one row: (n_dup_groups, n_dropped, bytes_saved).

    Shape: per-batch (128-bit caption hash, n=1, size, size) partials ->
    one bucketed mixed-op reduce (sum n, sum size, max size) at
    caption-cardinality keys -> a single tiny final fold. Captions never
    shuffle; payload bytes are never read at all (metadata-only tier)."""
    from .group_collect import bucketed_reduce

    def prep(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch["text"].to_pylist(), dtype=object)
        h1 = pd.util.hash_pandas_object(s, index=False, hash_key="0123456789123456")
        h2 = pd.util.hash_pandas_object(s, index=False, hash_key="6543210987654321")
        ids = np.asarray(batch["id"], dtype=np.int64)
        w = 8 + (ids % 5) * 8
        h = 8 + (ids % 7) * 4
        size = 9 + 3 * w * h
        return pa.table(
            {
                "h1": pa.array(h1.to_numpy().astype(np.int64)),
                "h2": pa.array(h2.to_numpy().astype(np.int64)),
                "n": pa.array(np.ones(len(ids), dtype=np.int64)),
                "ss": pa.array(size),
                "ms": pa.array(size),
            }
        )

    groups = bucketed_reduce(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["h1", "h2"],
        {"n": "sum", "ss": "sum", "ms": "max"},
    )

    def fold(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["n"], dtype=np.int64)
        ss = np.asarray(batch["ss"], dtype=np.int64)
        ms = np.asarray(batch["ms"], dtype=np.int64)
        dup = n > 1
        return pa.table(
            {
                "g": pa.array([np.int64(dup.sum())]),
                "d": pa.array([np.int64((n[dup] - 1).sum())]),
                "b": pa.array([np.int64((ss[dup] - ms[dup]).sum())]),
            }
        )


    out = (
        groups.map_batches(fold, batch_format="pyarrow")
        .repartition(1)
        .map_batches(
            lambda t: pa.table(
                {
                    "n_dup_groups": pa.array(
                        [np.int64(np.asarray(t["g"]).sum())]
                    ),
                    "n_dropped": pa.array([np.int64(np.asarray(t["d"]).sum())]),
                    "bytes_saved": pa.array([np.int64(np.asarray(t["b"]).sum())]),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
    )
    return out


def doc_novelty(ds: ray.data.Dataset, *, num_buckets: int = 64) -> ray.data.Dataset:
    """Per-document novelty score over the corpus's doc-id order: of each
    document's DISTINCT token-3-grams, how many first appear in THIS
    document (no lower-id document contains them) — the incremental-
    curation signal "how much new text does this doc add", and 1 - novelty
    is the n-gram-level contamination by earlier docs. All-integer.

    Scale shape: the ngram_jaccard gram explode (128-bit identities, text
    bytes never shuffle) -> ONE gram-keyed bucket shuffle; per bucket a
    single lexsort yields each gram's min doc id AND the per-(gram, doc)
    novelty flags, pre-summed to (doc, grams, novel) partials -> tiny
    doc-keyed groupby. Docs with no trigram (under 3 tokens) are absent on
    both engines. Output: (id, n_grams, n_novel)."""

    def to_grams(batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch["text"].to_pylist(), dtype=object)
        ids = np.asarray(batch["id"], dtype=np.int64)
        row, g1, g2, _sizes = _distinct_grams(texts)
        b = ((g1 * np.int64(-7046029254386353131)) >> np.int64(32)) % num_buckets
        return pa.table(
            {
                "g1": pa.array(g1),
                "g2": pa.array(g2),
                "id": pa.array(ids[row]),
                "__bucket": pa.array(np.abs(b).astype(np.int64)),
            }
        )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        g1 = np.asarray(tbl["g1"], dtype=np.int64)
        g2 = np.asarray(tbl["g2"], dtype=np.int64)
        ids = np.asarray(tbl["id"], dtype=np.int64)
        order = np.lexsort((ids, g2, g1))
        g1, g2, ids = g1[order], g2[order], ids[order]
        new = np.ones(len(g1), dtype=bool)
        new[1:] = (g1[1:] != g1[:-1]) | (g2[1:] != g2[:-1])
        # sorted by id within each gram group -> the group head IS min id
        grp = np.cumsum(new) - 1
        first_id = ids[new][grp]
        novel = ids == first_id
        uu, inv = np.unique(ids, return_inverse=True)
        tot = np.bincount(inv, minlength=len(uu)).astype(np.int64)
        nov = np.zeros(len(uu), dtype=np.int64)
        np.add.at(nov, inv, novel.astype(np.int64))
        return pa.table(
            {"id": pa.array(uu), "g": pa.array(tot), "nv": pa.array(nov)}
        )

    from .group_collect import bucketed_sum

    merged_partials = (
        ds.map_batches(to_grams, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    # doc-keyed merge of the per-bucket partials: doc cardinality is
    # corpus-sized, so the bucketed reduce (group_collect.py rationale)
    out = bucketed_sum(merged_partials, ["id"], ["g", "nv"])
    return out.rename_columns({"g": "n_grams", "nv": "n_novel"})

