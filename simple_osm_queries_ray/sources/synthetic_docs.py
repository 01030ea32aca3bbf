"""Deterministic large-scale document corpus with BOUNDED near-dup
structure — the MinHash-family scale fixture.

The replicated corpora used elsewhere (bench_text.py, dup_docs.py at
bench scale) make every replica group a near-dup clique, so banded LSH
candidate volume grows quadratically per group — a pathological input by
construction, useless as a scale signal. Here every doc is a fresh
pseudo-random token multiset (vocabulary 50k, ~40 tokens → expected
pairwise Jaccard ≈ 0) except a planted ~1% of PAIRS: doc i with
i % 100 == 1 copies doc i-1's tokens with the last 4 replaced
(J ≈ 36/44 ≈ 0.82, above any practical threshold). Candidate volume is
O(n/100) — output-proportional, the shape a real deduped web corpus has.

Token derivation is per-(doc, position) hash (the clustered_embeddings
discipline): batch-boundary independent, so any block split of the id
range yields identical texts, and a "changed" doc re-derives exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

_MIX = np.int64(-7046029254386353131)
_M53 = np.int64((1 << 53) - 1)

VOCAB = 50_000
TOKENS_PER_DOC = 40
PAIR_MOD = 100  # doc i with i % PAIR_MOD == 1 is a near-dup of doc i-1
ALTERED_TAIL = 4


def _doc_token_ids(ids: np.ndarray, salt: int = 0) -> np.ndarray:
    """(n, TOKENS_PER_DOC) int token ids, deterministic per (doc, pos)."""
    h = ids[:, None] * np.int64(TOKENS_PER_DOC) + np.arange(
        TOKENS_PER_DOC, dtype=np.int64
    )[None, :]
    h = (h + np.int64(1 + salt)) * _MIX
    h ^= h >> np.int64(29)
    h *= _MIX
    return (((h >> np.int64(11)) & _M53) % np.int64(VOCAB)).astype(np.int64)


def doc_texts(ids: np.ndarray, *, salt: int = 0) -> list[str]:
    """Texts for arbitrary doc ids (vectorized derivation, joined once)."""
    is_pair = ids % PAIR_MOD == 1
    src = np.where(is_pair, ids - 1, ids)
    toks = _doc_token_ids(src, salt)
    if is_pair.any():
        tail = _doc_token_ids(ids, salt=salt + 7)[:, :ALTERED_TAIL]
        toks[is_pair, TOKENS_PER_DOC - ALTERED_TAIL:] = tail[is_pair]
    flat = toks.ravel()
    words = np.char.add("t", flat.astype("U8"))
    return [" ".join(row) for row in words.reshape(len(ids), TOKENS_PER_DOC)]


def synthetic_docs(
    n: int, *, num_blocks: int | None = None, salt: int = 0
) -> ray.data.Dataset:
    """(id, text) corpus of ``n`` docs with the planted pair structure."""

    def gen(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["id"], dtype=np.int64)
        return pa.table(
            {"id": pa.array(ids), "text": pa.array(doc_texts(ids, salt=salt))}
        )

    ds = ray.data.range(n, override_num_blocks=num_blocks) if num_blocks else ray.data.range(n)
    return ds.map_batches(gen, batch_format="pyarrow")
