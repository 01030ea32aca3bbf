"""Text-analysis operators for training-data pipelines.

All kernels are vectorized (pyarrow.compute / pandas C string methods) and —
except the fingerprint — arithmetically reproducible in DuckDB SQL:

- token_count: whitespace tokens (the synthetic corpus is single-space
  joined, so `split(' ')` and regex token counts agree);
- language-ID: n-gram/marker-word heuristic — per-language marker counts,
  argmax with deterministic tie-break (first language in the fixed order);
- quality score: token-count + stopword-ratio formula in IEEE doubles;
- fingerprint: 62-bit polynomial rolling hash over UTF-8 bytes (two 31-bit
  streams; the same Horner recurrence runs overflow-free in a DuckDB
  recursive CTE, so the operator has an exact SQL oracle).

The language marker/stopword sets are fixed tiny vocabularies — broadcast
state compiled once per actor in the stage's __init__ when used as an actor
pool (they are also cheap enough to close over for stateless tasks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

LANGS = ["en", "de", "es", "fr", "zh"]
MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "das"],
    "es": ["el", "los", "una"],
    "fr": ["le", "les", "une"],
    "zh": ["de0", "shi4", "le0"],
}
STOPWORDS = ["the", "a", "and", "of", "to"]

# GPT-2-style pretokenizer, ASCII approximation (contraction suffixes,
# letter runs, digit runs, punctuation runs, whitespace) — the "BPE-ish"
# token counter. Same leftmost-first semantics in Python re and DuckDB's
# RE2, so the count has an exact SQL twin.
BPE_SPLIT_RE = r"'(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|'|\s+"

# Two independent 31-bit polynomial streams combined into a 62-bit
# fingerprint: b * power < 2^39 and segment sums < 2^63, so the whole batch
# evaluates in uint64 with NO per-text Python; the same recurrence
# h = (h*B + byte) % p runs in DuckDB BIGINT (recursive CTE) overflow-free,
# giving the operator an exact SQL oracle.
_MOD = (1 << 31) - 1
_BASES = (131, 137)


class TextAnalyzer:
    """Actor-pool stage: per-actor setup in __init__, batches through
    __call__ (SURVEY.md ST6 pattern). All counting runs in Arrow's RE2
    kernels (count_substring / count_substring_regex) — C++ over the
    column's flat UTF-8 buffer, never Python re over Python strings (a
    21-regex Python pass measured ~20 s per 1 M docs; the module docstring
    already pins that these patterns behave identically under RE2, which is
    what DuckDB replays for the SQL twin)."""

    def __init__(self):
        # one alternation per group: whole-word matches are disjoint tokens,
        # so count(\b(a|b|c)\b) == count(\ba\b)+count(\bb\b)+count(\bc\b)
        # exactly, at a third of the scan passes
        self.marker_patterns = {
            lang: rf"\b(?:{'|'.join(ms)})\b" for lang, ms in MARKERS.items()
        }
        self.stop_pattern = rf"\b(?:{'|'.join(STOPWORDS)})\b"

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch["text"]
        # "a  b".split(" ") counts empty fields, so n_tokens = count(" ")+1
        # (exact for the empty string too: 0 + 1)
        n_tokens = np.asarray(pc.count_substring(col, " "), dtype=np.int64) + 1
        n_tokens_bpe = np.asarray(
            pc.count_substring_regex(col, BPE_SPLIT_RE), dtype=np.int64
        )

        marker_counts = np.zeros((len(col), len(LANGS)), dtype=np.int64)
        for li, lang in enumerate(LANGS):
            marker_counts[:, li] = np.asarray(
                pc.count_substring_regex(col, self.marker_patterns[lang]),
                dtype=np.int64,
            )
        # argmax with first-language tie-break (np.argmax takes first maximum)
        pred = np.array(LANGS, dtype=object)[np.argmax(marker_counts, axis=1)]

        stop = np.asarray(
            pc.count_substring_regex(col, self.stop_pattern), dtype=np.int64
        )
        stop_ratio = stop / np.maximum(n_tokens, 1).astype(np.float64)
        quality = 0.5 * np.minimum(1.0, n_tokens / 100.0) + 0.5 * (1.0 - stop_ratio)

        return pa.table(
            {
                "id": batch["id"] if "id" in batch.column_names else batch["doc_id"].cast(pa.int64()),
                "n_tokens": pa.array(n_tokens),
                "n_tokens_bpe": pa.array(n_tokens_bpe),
                "lang_pred": pa.array(pred, type=pa.string()),
                "stop_ratio": pa.array(stop_ratio),
                "quality": pa.array(quality),
            }
        )


def analyze_text(ds: ray.data.Dataset, concurrency: int | None = None) -> ray.data.Dataset:
    """Actor-pool sizing: leave headroom for the producer stage — a pool that
    reserves every CPU starves the read and the pipeline stalls (observed on a
    4-CPU test cluster with concurrency=4). Default: half the cluster CPUs."""
    if concurrency is None:
        import ray as _ray

        total = int(_ray.cluster_resources().get("CPU", 4))
        concurrency = (1, max(1, total // 2))  # autoscaling: min 1 avoids deadlock
    return ds.map_batches(
        TextAnalyzer, batch_format="pyarrow", concurrency=concurrency, batch_size=4096
    )


_POWER_CACHE: dict[int, np.ndarray] = {}


def _powers(base: int, n: int) -> np.ndarray:
    """base^0..base^(n-1) mod _MOD (cached, grown on demand)."""
    cur = _POWER_CACHE.get(base)
    if cur is None or len(cur) < n:
        size = max(n, 1024, 0 if cur is None else 2 * len(cur))
        p = np.empty(size, dtype=np.uint64)
        p[0] = 1
        b, m = np.uint64(base), np.uint64(_MOD)
        for j in range(1, size):  # once per cache growth, not per text
            p[j] = (p[j - 1] * b) % m
        _POWER_CACHE[base] = cur = p
    return cur


def _fingerprint_flat(flat: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Shared fingerprint core over flattened UTF-8 bytes + per-text lens."""
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    if len(flat) == 0:
        return np.zeros(len(lens), dtype=np.int64)
    # exponent of byte j (text-local position q, text length n): n - 1 - q
    local = np.arange(len(flat), dtype=np.int64) - np.repeat(offsets[:-1], lens)
    exp = np.repeat(lens, lens) - 1 - local
    m = np.uint64(_MOD)
    hs = []
    for base in _BASES:
        pw = _powers(base, int(lens.max()))
        terms = flat * pw[exp]  # < 2^39 per term: a text's sum stays < 2^64
        # segment sums via cumsum-diff, NOT reduceat: reduceat's clamped
        # start indices corrupt the LAST non-empty text when the batch ends
        # with empty texts (they steal its final byte). uint64 wrap-around
        # differences are exact while each text's true sum is < 2^64.
        csum = np.zeros(len(flat) + 1, dtype=np.uint64)
        np.cumsum(terms, out=csum[1:])
        h = (csum[offsets[1:]] - csum[offsets[:-1]]) % m
        hs.append(h)
    return (hs[0].astype(np.int64) << np.int64(31)) + hs[1].astype(np.int64)


def fingerprint_batch(texts: list[str]) -> np.ndarray:
    """62-bit document fingerprint (two 31-bit polynomial streams) from a
    Python string list — thin wrapper over the flat-bytes core (tests and
    small callers; the Dataset stage uses the zero-copy Arrow path)."""
    flat = np.frombuffer("".join(texts).encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    lens = np.array([len(t.encode("utf-8")) for t in texts], dtype=np.int64)
    return _fingerprint_flat(flat, lens)


def fingerprint_arrow(col) -> np.ndarray:
    """Zero-copy fingerprint over an Arrow string column: the flat UTF-8
    value buffer and per-row lengths come straight from the array's own
    buffers — no to_pylist, no join, no re-encode (those dominated the
    per-batch cost at corpus scale)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if arr.null_count:
        arr = arr.fill_null("")
    if pa.types.is_large_string(arr.type):
        odt = np.int64
    else:
        arr = arr.cast(pa.string()) if not pa.types.is_string(arr.type) else arr
        odt = np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=odt, count=len(arr) + 1 + arr.offset)[
        arr.offset :
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8) if arr.buffers()[2] else np.zeros(0, np.uint8)
    flat = data[offs[0] : offs[-1]].astype(np.uint64)
    lens = np.diff(offs)
    return _fingerprint_flat(flat, lens)


def fingerprints(ds: ray.data.Dataset) -> ray.data.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["id"] if "id" in batch.column_names else batch["doc_id"].cast(pa.int64())
        return pa.table({"id": ids, "fingerprint": pa.array(fingerprint_arrow(batch["text"]))})

    return ds.map_batches(fn, batch_format="pyarrow")


def session_window_events(sf_dir: str, gap_us: int = 1_800_000_000) -> ray.data.Dataset:
    """Gap-based session windows per user (streaming-shaped op the reference
    lacks; SURVEY.md section 2.7): a new session starts when a user's
    inter-event gap exceeds ``gap_us``. Output: (user_id, session_start [us],
    n, value_sum).

    Shape: one shuffle keyed on hash(user_id) bucket; each bucket's rows are
    sorted (user, ts) and sessionized in ONE vectorized pass (user-change OR
    gap-exceeded -> new-session flags -> reduceat). Partitioning assumption:
    sessionization needs all of a user's events in one task — a user's event
    count is the bounded quantity; pathological single-user skew would need
    time-range splitting with boundary-session merge.
    """
    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "event_type", "value"]
    )
    num_buckets = 32

    def add_bucket(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["user_id"], dtype=np.int64)
        ts = np.asarray(batch["ts"], dtype="datetime64[us]").astype(np.int64)
        b = np.abs((u * np.int64(-7046029254386353131)) >> np.int64(32)) % num_buckets
        return pa.table(
            {
                "user_id": pa.array(u),
                "ts_us": pa.array(ts),
                "value": batch["value"],
                "__bucket": pa.array(b),
            }
        )

    def sessionize(tbl: pa.Table) -> pa.Table:
        u = np.asarray(tbl["user_id"], dtype=np.int64)
        ts = np.asarray(tbl["ts_us"], dtype=np.int64)
        val = np.asarray(tbl["value"], dtype=np.float64)
        order = np.lexsort((ts, u))
        u, ts, val = u[order], ts[order], val[order]
        if len(u) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "session_start": pa.array([], type=pa.int64()),
                    "n": pa.array([], type=pa.int64()),
                    "value_sum": pa.array([], type=pa.float64()),
                }
            )
        new_sess = np.ones(len(u), dtype=bool)
        new_sess[1:] = (u[1:] != u[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        starts = np.nonzero(new_sess)[0]
        ends = np.append(starts[1:], len(u))
        return pa.table(
            {
                "user_id": pa.array(u[starts]),
                "session_start": pa.array(ts[starts]),
                "n": pa.array(ends - starts),
                "value_sum": pa.array(np.round(np.add.reduceat(val, starts), 6)),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda t: sessionize(t.drop_columns(["__bucket"])), batch_format="pyarrow"
        )
    )


def tumbling_window_events(sf_dir: str, window_us: int = 3_600_000_000) -> ray.data.Dataset:
    """Tumbling-window aggregate over the events table (streaming-shaped op):
    per (event_type, window) count + value sum. Partial aggregation per batch
    keeps the shuffle tiny (one row per key per batch)."""
    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch["ts"], dtype="datetime64[us]").astype(np.int64)
        win = ts // window_us
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pylist(),
                "window": win,
                "value": np.asarray(batch["value"], dtype=np.float64),
            }
        )
        g = df.groupby(["event_type", "window"], as_index=False).agg(
            n=("value", "size"), value_sum=("value", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "window"])
        .aggregate(Sum("n", alias_name="n"), Sum("value_sum", alias_name="value_sum"))
    )
    return out


def hopping_window_events(
    sf_dir: str, window_us: int = 3_600_000_000, hop_us: int = 900_000_000
) -> ray.data.Dataset:
    """Hopping (sliding) window counts per (event_type, window_start): each
    event lands in window_us/hop_us overlapping windows. Vectorized explode
    (np.repeat over the hop offsets) + per-batch partial counts so the
    shuffle moves one row per key per batch, not one per event-window pair.
    """
    from ..sources.read import read_parquet_sized

    assert window_us % hop_us == 0
    k = window_us // hop_us
    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch["ts"], dtype="datetime64[us]").astype(np.int64)
        base = ts // hop_us
        n = len(ts)
        # event at ts belongs to windows starting at (base - g) * hop_us,
        # g = 0..k-1 (all satisfy start <= ts < start + window_us)
        starts = (np.repeat(base, k) - np.tile(np.arange(k, dtype=np.int64), n)) * hop_us
        df = pd.DataFrame(
            {
                "event_type": np.repeat(
                    np.asarray(batch["event_type"].to_pylist(), dtype=object), k
                ),
                "window_start": starts,
            }
        )
        g = df.groupby(["event_type", "window_start"], as_index=False).size()
        g = g.rename(columns={"size": "n"})
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n", alias_name="n"))
    )


def asof_join_events(
    sf_dir: str, left_type: str = "purchase", right_type: str = "click"
) -> ray.data.Dataset:
    """As-of join: each ``left_type`` event gets the most recent
    ``right_type`` event time at-or-before it for the same user (inner: left
    rows with no preceding right event drop out) — the custom time-series
    join Ray Data lacks natively.

    Shape: ONE shuffle keyed on hash(user_id) co-locating both sides, then a
    per-bucket vectorized merge: right rows sort by (user, ts) into a packed
    composite key and every left row binary-searches its predecessor with a
    single searchsorted. Partitioning assumption: a user's events fit a
    bucket (same contract as sessionization). ts packing uses 52 bits
    (microsecond epochs to year ~2112) + dense per-bucket user indexes.
    """
    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )
    num_buckets = 32
    _TS_BITS = np.int64(52)
    _TS_MASK = np.int64((1 << 52) - 1)

    def prep(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"].to_pylist(), dtype=object)
        side = np.where(et == left_type, 0, np.where(et == right_type, 1, -1))
        keep = side >= 0
        u = np.asarray(batch["user_id"], dtype=np.int64)[keep]
        ts = np.asarray(batch["ts"], dtype="datetime64[us]").astype(np.int64)[keep]
        return pa.table(
            {
                "event_id": pa.array(np.asarray(batch["event_id"], dtype=np.int64)[keep]),
                "user_id": pa.array(u),
                "ts_us": pa.array(ts),
                "side": pa.array(side[keep].astype(np.int64)),
                "__bucket": pa.array(
                    np.abs((u * np.int64(-7046029254386353131)) >> np.int64(32)) % num_buckets
                ),
            }
        )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        side = np.asarray(tbl["side"], dtype=np.int64)
        u = np.asarray(tbl["user_id"], dtype=np.int64)
        ts = np.asarray(tbl["ts_us"], dtype=np.int64)
        eid = np.asarray(tbl["event_id"], dtype=np.int64)
        uniq, uidx = np.unique(u, return_inverse=True)
        key = (uidx.astype(np.int64) << _TS_BITS) | (ts & _TS_MASK)
        lmask = side == 0
        rmask = side == 1
        rkey = np.sort(key[rmask])
        rts = (ts[rmask])[np.argsort(key[rmask])]
        if len(rkey) == 0:
            # bucket has left events but no right side: zero matches (the
            # eager rkey[posc] below would IndexError on an empty array)
            empty = pa.array([], type=pa.int64())
            return pa.table(
                {"event_id": empty, "user_id": empty, "ts_us": empty, "click_ts_us": empty}
            )
        pos = np.searchsorted(rkey, key[lmask], side="right") - 1
        posc = np.clip(pos, 0, len(rkey) - 1)
        ok = (pos >= 0) & ((rkey[posc] >> _TS_BITS) == (key[lmask] >> _TS_BITS))
        return pa.table(
            {
                "event_id": pa.array(eid[lmask][ok]),
                "user_id": pa.array(u[lmask][ok]),
                "ts_us": pa.array(ts[lmask][ok]),
                "click_ts_us": pa.array(rts[posc][ok]),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(
            lambda t: per_bucket(t.drop_columns(["__bucket"])), batch_format="pyarrow"
        )
    )


def top_quality_per_lang(sf_dir: str, k: int = 5) -> ray.data.Dataset:
    """Top-k docs by quality score per predicted language (deterministic
    tie-break by id). The generic grouped-top-k shape: each batch keeps at
    most k rows per group (partial combiner), so the final per-group
    reduction sees batches*k rows per group, never the corpus.
    """
    stats = analyze_text(
        _docs(sf_dir)
    ).select_columns(["id", "lang_pred", "quality"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        lang = np.asarray(batch["lang_pred"].to_pylist(), dtype=object)
        q = np.asarray(batch["quality"], dtype=np.float64)
        ids = np.asarray(batch["id"], dtype=np.int64)
        codes, inv = np.unique(lang, return_inverse=True)
        order = np.lexsort((ids, -q, inv))
        inv_s = inv[order]
        change = np.r_[True, inv_s[1:] != inv_s[:-1]] if len(inv_s) else np.array([], dtype=bool)
        seg_start = np.flatnonzero(change)
        seg_id = np.cumsum(change) - 1
        pos_in_group = np.arange(len(inv_s)) - seg_start[seg_id]
        keep = order[pos_in_group < k]
        keep.sort()
        return batch.take(pa.array(keep))

    def reduce_group(tbl: pa.Table) -> pa.Table:
        q = np.asarray(tbl["quality"], dtype=np.float64)
        ids = np.asarray(tbl["id"], dtype=np.int64)
        order = np.lexsort((ids, -q))[: min(k, len(q))]
        order.sort()
        return tbl.take(pa.array(order))

    return (
        stats.map_batches(partial_topk, batch_format="pyarrow")
        .repartition(4)
        .groupby("lang_pred")
        .map_groups(reduce_group, batch_format="pyarrow")
    )


def _docs(sf_dir: str) -> ray.data.Dataset:
    from ..sources.read import read_parquet_sized

    return read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


# per-mille keep rates per language label: downsample over-represented
# languages, keep all of the rare ones (the standard corpus-balancing move)
SAMPLE_RATES_PERMILLE = {"en": 100, "de": 250, "es": 500, "fr": 750, "zh": 1000}
_SAMPLE_MUL = 2654435761  # Knuth multiplicative hash constant
_SAMPLE_MOD = 1 << 32


def stratified_sample(
    sf_dir: str,
    rates_permille: dict[str, int] | None = None,
) -> ray.data.Dataset:
    """Deterministic stratified sampling of the documents table: keep a doc
    iff hash(doc_id) lands under its language's per-mille keep rate. The
    hash is pure modular arithmetic ((doc_id mod 2^32) * 2654435761 mod
    2^32, then mod 1000) so the decision is reproducible anywhere --
    including in the DuckDB oracle -- and requires no coordination: every
    batch decides its own rows, nothing shuffles.

    Returns (doc_id, lang) of the kept sample.
    """
    from ..sources.read import read_parquet_sized

    rates = dict(SAMPLE_RATES_PERMILLE if rates_permille is None else rates_permille)
    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )

    def keep(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.uint64)
        h = ((ids % _SAMPLE_MOD) * _SAMPLE_MUL) % _SAMPLE_MOD % 1000
        lang = np.asarray(batch["lang"].to_pylist(), dtype=object)
        thresh = np.array(
            [rates.get(l, 1000) for l in lang], dtype=np.uint64
        )
        return batch.filter(pa.array(h < thresh))

    return docs.map_batches(keep, batch_format="pyarrow")


PACK_BUDGET_TOKENS = 512
PACK_NUM_SHARDS = 32


def pack_sequences(
    sf_dir: str,
    budget: int = PACK_BUDGET_TOKENS,
    num_shards: int = PACK_NUM_SHARDS,
) -> ray.data.Dataset:
    """Sequence packing for LLM pre-training batches: documents are hashed
    into ``num_shards`` independent shards (doc_id mod shards), concatenated
    in doc_id order within each shard, and cut into fixed token-budget
    sequences -- seq_id = (running token offset before this doc) // budget.
    Shards pack in parallel and each shard's packing is a single vectorized
    cumsum over its sorted group, so the only movement is one groupby
    shuffle of (doc_id, shard, n_tokens) -- three int columns, never text.
    At cluster scale, set num_shards to a multiple of the worker count; the
    sequence layout is deterministic regardless of shard placement.

    Returns (doc_id, shard, n_tokens, seq_id).
    """
    from ..sources.read import read_parquet_sized

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def tokens(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        n_tok = np.asarray(
            pc.list_value_length(pc.split_pattern(batch["text"], " ")),
            dtype=np.int64,
        )
        return pa.table(
            {"doc_id": ids, "shard": ids % num_shards, "n_tokens": n_tok}
        )

    def pack(group: pa.Table) -> pa.Table:
        ids = np.asarray(group["doc_id"], dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        n_tok = np.asarray(group["n_tokens"], dtype=np.int64)[order]
        offset = np.cumsum(n_tok) - n_tok
        return pa.table(
            {
                "doc_id": ids[order],
                "shard": np.asarray(group["shard"], dtype=np.int64)[order],
                "n_tokens": n_tok,
                "seq_id": offset // budget,
            }
        )

    return (
        docs.map_batches(tokens, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(pack, batch_format="pyarrow")
    )


QUANTILE_QS = (0.5, 0.9, 0.99)


def doc_length_quantiles(
    sf_dir: str, qs: tuple[float, ...] = QUANTILE_QS
) -> "pd.DataFrame":
    """Exact discrete quantiles of document length, computed the scale-safe
    way for bounded integer domains: per-batch value histograms (partial
    combiners) -> one tiny groupby-sum keyed by the value -> a driver-side
    cumulative pick over at most |domain| rows. No sort, no sampling, no
    sketch error — the shuffle carries (value, count) pairs, never rows.
    PERCENTILE_DISC semantics: the smallest value whose cumulative
    distribution reaches q.

    Returns a pandas frame (q, value) — the result is O(len(qs)).
    """
    from ray.data.aggregate import Sum

    from ..sources.read import read_parquet_sized

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        v, c = np.unique(np.asarray(batch["n_chars"], dtype=np.int64), return_counts=True)
        return pa.table({"value": pa.array(v), "n": pa.array(c.astype(np.int64))})

    hist = (
        docs.map_batches(partial, batch_format="pyarrow")
        .repartition(4)
        .groupby("value")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("value")
    )
    total = int(hist["n"].sum())
    cum = hist["n"].cumsum().to_numpy()
    vals = hist["value"].to_numpy()
    out_q, out_v = [], []
    for q in qs:
        k = max(1, int(np.ceil(q * total)))
        out_q.append(float(q))
        out_v.append(int(vals[np.searchsorted(cum, k, side="left")]))
    return pd.DataFrame({"q": out_q, "value": out_v})


def _doc_tokens(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Flatten per-doc whitespace tokens (lowercased, empties dropped) into
    (flat_tokens, doc_index_of_token). pandas str.split is the vectorized
    path; equals DuckDB's list_filter(string_split_regex(lower(t),'\\s+'),
    x -> x <> '')."""
    toks = texts.str.lower().str.split()
    lens = toks.str.len().fillna(0).astype(np.int64).to_numpy()
    flat = np.concatenate([np.asarray(t, dtype=object) for t in toks if len(t)]) if lens.sum() else np.array([], dtype=object)
    doc_of = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    return flat, doc_of


def top_terms_df(sf_dir: str, k: int = 30) -> ray.data.Dataset:
    """Top-k tokens by document frequency (count of distinct docs containing
    the token), ties broken by token ascending. Output: (token, df).

    Shape: per-batch partial — each doc's tokens are deduped locally (a doc
    lives in exactly one row, so within-batch dedup IS the global distinct)
    and counted into a (token, df) partial; the shuffle moves only the tiny
    token-vocabulary partials, then one small groupby-sum + sort + limit.
    The pattern is the document-frequency half of distributed TF-IDF."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flat, doc_of = _doc_tokens(batch["text"].to_pandas())
        if len(flat) == 0:
            return pa.table({"token": pa.array([], type=pa.string()), "df": pa.array([], type=pa.int64())})
        df_ = pd.DataFrame({"t": flat, "d": doc_of}).drop_duplicates()
        cnt = df_.groupby("t", sort=False).size()
        return pa.table({"token": pa.array(cnt.index, type=pa.string()), "df": pa.array(cnt.to_numpy(), type=pa.int64())})

    agg = (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .repartition(4)
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
    )
    # the aggregate is vocabulary-sized (tiny); a driver-side top-k keeps the
    # deterministic (df desc, token asc) cut without a distributed sort
    pdf = agg.to_pandas().sort_values(["df", "token"], ascending=[False, True], kind="mergesort")
    return pdf.head(k).reset_index(drop=True)


def events_retention(sf_dir: str) -> "pd.DataFrame":
    """Next-day retention: for each day d, how many distinct users had at
    least one event on BOTH d and d+1. Output: (day [int days since epoch],
    retained).

    Shape: per-batch dedup of (user, day) pairs, ONE shuffle keyed on
    hash(user) bucket (all of a user's days land together), per-bucket
    vectorized consecutive-day detection (sort + diff), then tiny per-day
    partials summed driver-side. Mirrors the sessionization partitioning
    assumption: per-user history fits a task."""
    from ray.data.aggregate import Sum

    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
    num_buckets = 32

    def dedup_pairs(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["user_id"], dtype=np.int64)
        day = np.asarray(batch["ts"], dtype="datetime64[us]").astype("datetime64[D]").astype(np.int64)
        pairs = np.unique(np.stack([u, day], axis=1), axis=0)
        b = np.abs((pairs[:, 0] * np.int64(-7046029254386353131)) >> np.int64(32)) % num_buckets
        return pa.table(
            {"user_id": pa.array(pairs[:, 0]), "day": pa.array(pairs[:, 1]), "__bucket": pa.array(b)}
        )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        u = np.asarray(tbl["user_id"], dtype=np.int64)
        day = np.asarray(tbl["day"], dtype=np.int64)
        order = np.lexsort((day, u))
        u, day = u[order], day[order]
        keep = np.ones(len(u), dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (day[1:] != day[:-1])  # cross-batch dedup
        u, day = u[keep], day[keep]
        nxt = (u[1:] == u[:-1]) & (day[1:] - day[:-1] == 1)
        d, c = np.unique(day[:-1][nxt], return_counts=True)
        return pa.table({"day": pa.array(d), "retained": pa.array(c.astype(np.int64))})

    agg = (
        ds.map_batches(dedup_pairs, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("retained", alias_name="retained"))
    )
    return agg.to_pandas().sort_values("day").reset_index(drop=True)


def doc_len_quantiles_per_lang(
    sf_dir: str, qs: tuple[float, ...] = (0.5, 0.9)
) -> "pd.DataFrame":
    """Exact per-language PERCENTILE_DISC over n_chars. Output: (lang, q,
    value). Same bounded-integer-domain histogram trick as
    :func:`doc_length_quantiles`, keyed by language: the shuffle moves only
    (lang, value, n) partials — |langs| x |distinct lengths| rows — and the
    cumsum walk per language happens on that tiny aggregate driver-side."""
    from ray.data.aggregate import Sum

    from ..sources.read import read_parquet_sized

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": np.asarray(batch["lang"]),
                "value": np.asarray(batch["n_chars"], dtype=np.int64),
            }
        )
        g = df.groupby(["lang", "value"], as_index=False).size().rename(columns={"size": "n"})
        g["n"] = g["n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (
        docs.map_batches(partial, batch_format="pyarrow")
        .repartition(4)
        .groupby(["lang", "value"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["lang", "value"])
    )
    out = []
    for lang, g in hist.groupby("lang", sort=True):
        total = int(g["n"].sum())
        cum = g["n"].cumsum().to_numpy()
        vals = g["value"].to_numpy()
        for q in qs:
            k = max(1, int(np.ceil(q * total)))
            out.append((lang, float(q), int(vals[np.searchsorted(cum, k, side="left")])))
    return pd.DataFrame(out, columns=["lang", "q", "value"])


def distinctive_terms(sf_dir: str) -> ray.data.Dataset:
    """The most distinctive term per document: maximize term frequency, tie
    broken by LOWER document frequency (rarer corpus-wide wins), then token
    ascending — an all-integer ordering, so the TF-IDF-style argmax is
    bit-exact against SQL. Output: (doc_id, token).

    Shape: the document-frequency table is vocabulary-sized; it is computed
    by the same partial-dedup aggregation as :func:`top_terms_df` and
    broadcast once via ray.put, then one streaming map_batches computes each
    doc's (tf desc, df asc, token asc) argmax vectorized — no per-doc join,
    no second shuffle over the corpus."""
    from ray.data.aggregate import Sum

    def df_partial(batch: pa.Table) -> pa.Table:
        flat, doc_of = _doc_tokens(batch["text"].to_pandas())
        if len(flat) == 0:
            return pa.table({"token": pa.array([], type=pa.string()), "df": pa.array([], type=pa.int64())})
        d = pd.DataFrame({"t": flat, "d": doc_of}).drop_duplicates()
        cnt = d.groupby("t", sort=False).size()
        return pa.table({"token": pa.array(cnt.index, type=pa.string()), "df": pa.array(cnt.to_numpy(), type=pa.int64())})

    dfs = (
        _docs(sf_dir)
        .map_batches(df_partial, batch_format="pyarrow")
        .repartition(4)
        .groupby("token")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()
        .sort_values("token")
    )
    # broadcast two contiguous arrays, not a Python dict: at web-scale vocab
    # a str->int dict costs ~100 B/entry of object overhead and pickles
    # slowly; a sorted fixed-width array probes via one vectorized
    # searchsorted (every probe token exists in the vocab by construction)
    ref = ray.put(
        (dfs["token"].to_numpy(dtype="U"), dfs["df"].to_numpy(dtype=np.int64))
    )

    from ..state.broadcast import get as bget

    def argmax(batch: pa.Table) -> pa.Table:
        vocab, dfv = bget(ref)
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        flat, doc_of = _doc_tokens(batch["text"].to_pandas())
        if len(flat) == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()), "token": pa.array([], type=pa.string())})
        tf = (
            pd.DataFrame({"d": doc_of, "t": flat})
            .groupby(["d", "t"], as_index=False)
            .size()
            .rename(columns={"size": "tf"})
        )
        probes = tf["t"].to_numpy(dtype=vocab.dtype)
        tf["df"] = dfv[np.searchsorted(vocab, probes)]
        tf = tf.sort_values(["d", "tf", "df", "t"], ascending=[True, False, True, True], kind="mergesort")
        first = tf.drop_duplicates("d", keep="first")
        return pa.table(
            {
                "doc_id": pa.array(ids[first["d"].to_numpy()], type=pa.int64()),
                "token": pa.array(first["t"].to_numpy(), type=pa.string()),
            }
        )

    return _docs(sf_dir).map_batches(argmax, batch_format="pyarrow")


def sample_exact(sf_dir: str, n: int = 100) -> "pd.DataFrame":
    """Exactly-n deterministic corpus sample: the n documents with the
    smallest multiplicative hash of doc_id (Knuth constant, mod 2^32) —
    the distributed equivalent of reservoir sampling but reproducible and
    oracle-checkable (ORDER BY hash LIMIT n in SQL). Output: (doc_id, hk).

    Shape: per-batch partial top-n (argpartition on the hash key), then one
    tiny driver-side reduce over num_batches*n candidate rows — the corpus
    itself never shuffles or sorts globally."""
    from ..sources.read import read_parquet_sized

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        hk = (ids * np.int64(_SAMPLE_MUL)) % np.int64(_SAMPLE_MOD)
        if len(ids) > n:
            keep = np.argpartition(hk, n)[:n]
            ids, hk = ids[keep], hk[keep]
        return pa.table({"doc_id": pa.array(ids), "hk": pa.array(hk)})

    cand = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["hk", "doc_id"], kind="mergesort").head(n)
    return cand.reset_index(drop=True)


def events_funnel(
    sf_dir: str, steps: tuple[str, str, str] = ("view", "click", "purchase")
) -> "pd.DataFrame":
    """Ordered funnel: users whose EARLIEST step events are strictly ordered
    step1 < step2 < step3. Output one row: (n_step1, n_step12, n_full).

    Shape: per-batch partials of per-(user, step) min timestamp, one shuffle
    keyed on hash(user) bucket, per-bucket vectorized min + ordering flags,
    then three tiny counts summed driver-side. Same partitioning assumption
    as sessionization (a user's history fits a task)."""
    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts", "user_id", "event_type"])
    num_buckets = 32
    s1, s2, s3 = steps

    def partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch["event_type"])
        keep = np.isin(et, list(steps))
        u = np.asarray(batch["user_id"], dtype=np.int64)[keep]
        ts = np.asarray(batch["ts"], dtype="datetime64[us]").astype(np.int64)[keep]
        step = np.searchsorted(np.sort(np.array(steps, dtype=object)), et[keep])
        # min per (user, original step name) — map via sorted order back to index
        names = np.sort(np.array(steps, dtype=object))
        df = pd.DataFrame({"user_id": u, "step": names[step], "ts_us": ts})
        g = df.groupby(["user_id", "step"], as_index=False)["ts_us"].min()
        b = np.abs((g["user_id"].to_numpy() * np.int64(-7046029254386353131)) >> np.int64(32)) % num_buckets
        g["__bucket"] = b
        return pa.Table.from_pandas(g, preserve_index=False)

    def per_bucket(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        g = df.groupby(["user_id", "step"])["ts_us"].min().unstack()
        t1 = g[s1] if s1 in g else pd.Series(np.nan, index=g.index)
        t2 = g[s2] if s2 in g else pd.Series(np.nan, index=g.index)
        t3 = g[s3] if s3 in g else pd.Series(np.nan, index=g.index)
        n1 = int(t1.notna().sum())
        n12 = int((t1 < t2).sum())
        n123 = int(((t1 < t2) & (t2 < t3)).sum())
        return pa.table(
            {
                "n_step1": pa.array([n1], type=pa.int64()),
                "n_step12": pa.array([n12], type=pa.int64()),
                "n_full": pa.array([n123], type=pa.int64()),
            }
        )

    parts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "n_step1": [int(parts["n_step1"].sum())],
            "n_step12": [int(parts["n_step12"].sum())],
            "n_full": [int(parts["n_full"].sum())],
        }
    )


def incremental_sessions(
    sf_dir: str, n_chunks: int = 4, gap_us: int = 1_800_000_000
) -> "pd.DataFrame":
    """Micro-batch (streaming-shaped) sessionization: process the event
    stream in ``n_chunks`` consecutive time slices, carrying open sessions
    across slice boundaries, and produce EXACTLY the batch result of
    :func:`session_window_events` (pinned by test).

    Per slice the work is the same bucketed vectorized sessionization as the
    batch op, additionally emitting each session's last_ts; the cross-slice
    merge operates on SESSION rows (bounded by active users per slice, not
    events — the state a streaming engine would checkpoint) and joins a
    session to its predecessor when the gap across the boundary closes.
    Value sums stay raw across merges and round once at the end, matching
    the batch op's per-session rounding."""
    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts", "user_id", "value"])
    num_buckets = 32

    def prep(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["user_id"], dtype=np.int64)
        ts = np.asarray(batch["ts"], dtype="datetime64[us]").astype(np.int64)
        b = np.abs((u * np.int64(-7046029254386353131)) >> np.int64(32)) % num_buckets
        return pa.table(
            {"user_id": pa.array(u), "ts_us": pa.array(ts), "value": batch["value"],
             "__bucket": pa.array(b)}
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow").materialize()
    lo = prepped.min("ts_us")
    hi = prepped.max("ts_us")
    bounds = np.linspace(lo, hi + 1, n_chunks + 1).astype(np.int64)

    def sessionize_chunk(tbl: pa.Table) -> pa.Table:
        u = np.asarray(tbl["user_id"], dtype=np.int64)
        ts = np.asarray(tbl["ts_us"], dtype=np.int64)
        val = np.asarray(tbl["value"], dtype=np.float64)
        order = np.lexsort((ts, u))
        u, ts, val = u[order], ts[order], val[order]
        if len(u) == 0:
            return pa.table({"user_id": pa.array([], type=pa.int64()),
                             "session_start": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64()),
                             "vsum": pa.array([], type=pa.float64()),
                             "last_ts": pa.array([], type=pa.int64())})
        new = np.ones(len(u), dtype=bool)
        new[1:] = (u[1:] != u[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        st = np.nonzero(new)[0]
        en = np.append(st[1:], len(u))
        return pa.table(
            {
                "user_id": pa.array(u[st]),
                "session_start": pa.array(ts[st]),
                "n": pa.array(en - st),
                "vsum": pa.array(np.add.reduceat(val, st)),
                "last_ts": pa.array(ts[en - 1]),
            }
        )

    chunks = []
    for ci in range(n_chunks):
        t0, t1 = int(bounds[ci]), int(bounds[ci + 1])

        def in_range(batch: pa.Table, _a=t0, _b=t1) -> pa.Table:
            ts = np.asarray(batch["ts_us"], dtype=np.int64)
            return batch.filter(pa.array((ts >= _a) & (ts < _b)))

        sess = (
            prepped.map_batches(in_range, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(
                lambda t: sessionize_chunk(t.drop_columns(["__bucket"])),
                batch_format="pyarrow",
            )
            .to_pandas()
        )
        chunks.append(sess)

    alls = pd.concat(chunks, ignore_index=True).sort_values(
        ["user_id", "session_start"], kind="mergesort"
    )
    u = alls["user_id"].to_numpy()
    st = alls["session_start"].to_numpy()
    en = alls["last_ts"].to_numpy()
    # merge a session into its predecessor when the boundary gap closes
    cont = np.zeros(len(alls), dtype=bool)
    if len(alls) > 1:
        cont[1:] = (u[1:] == u[:-1]) & (st[1:] - en[:-1] <= gap_us)
    grp = np.cumsum(~cont) - 1
    out = pd.DataFrame(
        {
            "user_id": u,
            "session_start": st,
            "n": alls["n"].to_numpy(),
            "vsum": alls["vsum"].to_numpy(),
            "grp": grp,
        }
    ).groupby("grp", as_index=False).agg(
        user_id=("user_id", "first"),
        session_start=("session_start", "first"),
        n=("n", "sum"),
        vsum=("vsum", "sum"),
    )
    out["value_sum"] = np.round(out["vsum"].to_numpy(), 6)
    return out[["user_id", "session_start", "n", "value_sum"]].reset_index(drop=True)


_HLL_MIX = np.uint64(0x9E3779B97F4A7C15)


def _hll_registers(ids: np.ndarray, p: int) -> np.ndarray:
    """Register maxima for one batch: a 64-bit mix hash, top-p bits pick the
    register, leading-zero rank of the rest sets the value. Vectorized."""
    x = ids.astype(np.uint64) * _HLL_MIX
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xC2B2AE3D27D4EB4F)
    x ^= x >> np.uint64(29)
    m = 1 << p
    idx = (x >> np.uint64(64 - p)).astype(np.int64)
    rest = (x << np.uint64(p)) | np.uint64(1)  # sentinel bit caps the rank
    # leading zeros via bit-exact binary-search bit_length: float64 log2
    # rounds values just below a power of two >= 2^53 UP (rank one too low)
    # and sends an all-ones rest to rank 0 via uint64 underflow
    v = rest.copy()
    bl = np.zeros(len(v), dtype=np.uint64)  # floor(log2(rest)); rest >= 1
    for s in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(s))
        bl[big] += np.uint64(s)
        v[big] >>= np.uint64(s)
    rank = (np.uint64(64) - bl).astype(np.uint8)  # = leading zeros + 1
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear-counting small-range correction
    return float(est)


def hll_distinct_users(sf_dir: str, p: int = 12) -> "pd.DataFrame":
    """Approximate distinct user count via a mergeable HyperLogLog sketch.
    Output: one row (estimate [int], p, registers_nonzero).

    Shape: the canonical mergeable-sketch aggregation — each batch emits its
    2^p register maxima as ONE row; the driver elementwise-maxes the partial
    register arrays (merge is associative + commutative, so any tree of
    partial merges gives the identical sketch — pinned by test). The corpus
    never shuffles; the exchange is num_batches * 2^p bytes.

    Rows-only (an estimator has no exact SQL twin); accuracy vs the exact
    distinct count is pinned within the standard ~1.04/sqrt(2^p) band in
    tests/test_dedup.py."""
    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.unique(np.asarray(batch["user_id"], dtype=np.int64))
        regs = _hll_registers(ids, p)
        return pa.table({"regs": pa.array([regs.tolist()], type=pa.list_(pa.uint8()))})

    merged = np.zeros(1 << p, dtype=np.uint8)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for row in b["regs"].to_pylist():
            merged = np.maximum(merged, np.asarray(row, dtype=np.uint8))
    return pd.DataFrame(
        {
            "estimate": [int(round(hll_estimate(merged)))],
            "p": [p],
            "registers_nonzero": [int((merged > 0).sum())],
        }
    )


def events_window_pairs(sf_dir: str, window_us: int = 60_000_000) -> ray.data.Dataset:
    """Temporal self-join: per user, the number of ordered event pairs
    (a, b) with a.ts < b.ts <= a.ts + window (ties broken by event_id so
    simultaneous events pair deterministically). Output: (user_id, n_pairs),
    returned as a Dataset — user cardinality is corpus-scaled, so the result
    must NOT materialize on the driver (r03 audit).

    Shape: ONE shuffle keyed on hash(user) bucket; within a bucket each
    user's events sort once and the pair count is a vectorized two-pointer:
    searchsorted of (ts + window) against the sorted ts array — no pair is
    ever materialized, so a burst of k events costs O(k log k), not O(k^2)
    rows."""
    from ray.data.aggregate import Sum

    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts", "user_id", "event_id"])
    num_buckets = 32

    def prep(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["user_id"], dtype=np.int64)
        ts = np.asarray(batch["ts"], dtype="datetime64[us]").astype(np.int64)
        b = np.abs((u * np.int64(-7046029254386353131)) >> np.int64(32)) % num_buckets
        return pa.table(
            {"user_id": pa.array(u), "ts_us": pa.array(ts),
             "event_id": batch["event_id"], "__bucket": pa.array(b)}
        )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        u = np.asarray(tbl["user_id"], dtype=np.int64)
        ts = np.asarray(tbl["ts_us"], dtype=np.int64)
        eid = np.asarray(tbl["event_id"], dtype=np.int64)
        order = np.lexsort((eid, ts, u))
        u, ts, eid = u[order], ts[order], eid[order]
        # user segment bounds
        seg = np.ones(len(u), dtype=bool)
        seg[1:] = u[1:] != u[:-1]
        seg_id = np.cumsum(seg) - 1
        seg_starts = np.nonzero(seg)[0]
        # ts is sorted only WITHIN a user segment; shift each segment by a
        # huge per-segment base so the concatenated array is globally
        # monotone and one searchsorted stays inside the right segment
        span = np.int64(ts.max() - ts.min() + window_us + 1) if len(ts) else np.int64(1)
        ts_adj = (ts - ts.min()) + seg_id * span if len(ts) else ts
        hi = np.searchsorted(ts_adj, ts_adj + window_us, side="right")
        n_after = hi - np.arange(len(u)) - 1
        cnt = np.maximum(n_after, 0)
        d, c = (
            u[seg_starts],
            np.add.reduceat(cnt, seg_starts) if len(u) else np.zeros(0, np.int64),
        )
        return pa.table({"user_id": pa.array(d), "n_pairs": pa.array(c.astype(np.int64))})

    from .group_collect import bucketed_sum

    # user cardinality is corpus-scaled: bucketed reduce, not the generic
    # aggregate (group_collect.py rationale)
    agg = bucketed_sum(
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow"),
        ["user_id"], ["n_pairs"],
    )
    agg = agg.materialize()
    # an empty events corpus yields a schema-less aggregate dataset; the
    # expression filter would fail on the missing column (same guard as
    # stages/raster.py's zonal empty case)
    return agg.filter(expr="n_pairs > 0") if agg.count() else agg


def weighted_sample(sf_dir: str, rate_per_char: int = 2_147_484) -> ray.data.Dataset:
    """Length-weighted deterministic sample: keep a doc iff
    hash(doc_id) < n_chars * rate_per_char (hash uniform on [0, 2^32)), so
    the keep probability is proportional to document length (~0.05% per
    char) — the curriculum-style 'prefer longer documents' downsample.
    Zero-shuffle map-only filter; exact SQL oracle. Output: (doc_id, n_chars).
    """
    from ..sources.read import read_parquet_sized

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])

    def keep(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        nch = np.asarray(batch["n_chars"], dtype=np.int64)
        hk = (ids * np.int64(_SAMPLE_MUL)) % np.int64(_SAMPLE_MOD)
        return batch.filter(pa.array(hk < nch * np.int64(rate_per_char)))

    return docs.map_batches(keep, batch_format="pyarrow")


def corpus_clean(sf_dir: str, *, len_lo: int = 100, len_hi: int = 2000) -> ray.data.Dataset:
    """The flagship training-data cleaning composite: one streaming pass
    keeps a document iff it (1) shares no 4-token shingle with the eval
    split (decontamination), (2) survives the per-language stratified
    downsample, and (3) has n_chars within [len_lo, len_hi]. Output:
    (doc_id, lang, n_chars) survivors.

    Composition shape: the contaminated-id set comes from the broadcast
    eval-shingle probe (bounded by the eval split), the sampling and length
    rules are pure per-row arithmetic — so the whole chain is a single
    map_batches with three vectorized masks, no shuffle at any stage.
    Every rule is individually oracle-checked elsewhere; the composite has
    its own composed SQL oracle."""
    from ..sources.read import read_parquet_sized
    from ..state.broadcast import get as bget
    from .dedup import decontaminate

    docs_t = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    bad = set()
    for b in decontaminate(docs_t, n=4, eval_mod=53).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        bad.update(b["doc_id"].to_pylist())
    bad_ref = ray.put(frozenset(bad))
    rates = dict(SAMPLE_RATES_PERMILLE)

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )

    def keep(batch: pa.Table) -> pa.Table:
        contaminated = bget(bad_ref)
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        nch = np.asarray(batch["n_chars"], dtype=np.int64)
        lang = np.asarray(batch["lang"].to_pylist(), dtype=object)
        h = ((ids.astype(np.uint64) % _SAMPLE_MOD) * _SAMPLE_MUL) % _SAMPLE_MOD % 1000
        thresh = np.array([rates.get(l, 1000) for l in lang], dtype=np.uint64)
        ok = (
            (h < thresh)
            & (nch >= len_lo)
            & (nch <= len_hi)
            & ~pd.Series(ids).isin(contaminated).to_numpy()
            & (ids % 53 != 0)  # the eval split itself never trains
        )
        return batch.filter(pa.array(ok))

    return docs.map_batches(keep, batch_format="pyarrow")


def repetition_stats(ds: ray.data.Dataset, n: int = 3) -> ray.data.Dataset:
    """Gopher-style within-document repetition signal (the duplicate-n-gram
    filters of Rae et al. 2021 §A1.1): per document the total and DISTINCT
    character ``n``-gram counts and the duplicated-gram ratio
    ``(total - distinct) / total``. Documents shorter than ``n`` emit no row
    (they have no n-grams). Output: (doc_id, total_ngrams, distinct_ngrams,
    dup_ratio). A corpus-cleaning primitive the reference has no analogue
    for; complements the cross-document dedup family in ``stages/dedup``.

    Fully vectorized per batch: the Arrow string column's UTF-8 buffer is
    viewed as one uint8 array, n-gram byte codes are built with shifted
    adds, and per-doc distinct counts come from one ``np.unique`` over
    (doc_idx << 8n | code) composites — no per-text Python in the hot path.
    Documents containing non-ASCII bytes (where byte n-grams differ from
    character n-grams) take a per-document fallback; the synthetic corpus
    and typical LLM English-web shards are ASCII-dominant, and the fallback
    count is one Python set per exceptional document only. Embarrassingly
    parallel — no shuffle at any scale."""
    if not 1 <= n <= 5:
        raise ValueError(f"n must be in 1..5 (byte codes fit int64), got {n}")
    shift = 8 * n

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        arr = batch["text"].combine_chunks() if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
        nbytes = np.asarray(pc.binary_length(arr), dtype=np.int64)
        nchars = np.asarray(pc.utf8_length(arr), dtype=np.int64)
        ascii_ok = nbytes == nchars
        # raw byte offsets into the (possibly shared/sliced) values buffer
        offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset : arr.offset + len(arr) + 1
        ].astype(np.int64)
        flat = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        counts = np.where(ascii_ok, np.maximum(nbytes - n + 1, 0), 0)
        total = int(counts.sum())
        ndocs = len(ids)
        t_out = np.maximum(nchars - n + 1, 0)
        d_out = np.zeros(ndocs, dtype=np.int64)
        if total:
            doc = np.repeat(np.arange(ndocs, dtype=np.int64), counts)
            offs = np.zeros(ndocs, dtype=np.int64)
            np.cumsum(counts[:-1], out=offs[1:])
            pos = np.arange(total, dtype=np.int64) - offs[doc] + offsets[:-1][doc]
            code = np.zeros(total, dtype=np.int64)
            for j in range(n):
                code = (code << np.int64(8)) | flat[pos + j].astype(np.int64)
            u = np.unique((doc << np.int64(shift)) | code)
            d_out += np.bincount(u >> np.int64(shift), minlength=ndocs)
        for i in np.nonzero(~ascii_ok)[0]:  # rare non-ASCII fallback
            s = arr[i].as_py()
            d_out[i] = len({s[j : j + n] for j in range(len(s) - n + 1)})
        keep = t_out > 0
        t_k, d_k = t_out[keep], d_out[keep]
        return pa.table(
            {
                "doc_id": pa.array(ids[keep]),
                "total_ngrams": pa.array(t_k),
                "distinct_ngrams": pa.array(d_k),
                "dup_ratio": pa.array(
                    (t_k - d_k).astype(np.float64) / t_k.astype(np.float64)
                ),
            }
        )

    return ds.select_columns(["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def chunk_docs(
    ds: ray.data.Dataset, size: int = 200, overlap: int = 50
) -> ray.data.Dataset:
    """Context-window chunking: split each document into windows of ``size``
    characters starting every ``size - overlap`` characters (the standard
    LLM pretraining / RAG chunker). Output: (doc_id, chunk_id, chunk_text);
    empty documents emit no chunk. Embarrassingly parallel, no shuffle.

    Vectorized per batch: chunk starts come from one repeat/cumsum explode;
    for ASCII batches the chunk texts are gathered directly out of the
    Arrow string buffer into a new StringArray (byte ranges, zero per-row
    Python); documents with multi-byte characters fall back to per-doc
    Python slicing (chunks are CHARACTER windows, matching SQL substr)."""
    if size <= 0 or not 0 <= overlap < size:
        raise ValueError(f"need size > 0 and 0 <= overlap < size, got {size}/{overlap}")
    step = size - overlap

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        arr = batch["text"].combine_chunks() if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
        nbytes = np.asarray(pc.binary_length(arr), dtype=np.int64)
        nchars = np.asarray(pc.utf8_length(arr), dtype=np.int64)
        ascii_ok = nbytes == nchars
        offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
            arr.offset : arr.offset + len(arr) + 1
        ].astype(np.int64)
        flat = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        nchunks = (nchars + step - 1) // step  # 0 chunks for empty docs
        out_ids, out_cid, out_txt = [], [], []
        av = np.nonzero(ascii_ok & (nchunks > 0))[0]
        if len(av):
            cts = nchunks[av]
            total = int(cts.sum())
            row = np.repeat(av, cts)
            offs = np.zeros(len(av), dtype=np.int64)
            np.cumsum(cts[:-1], out=offs[1:])
            cid = np.arange(total, dtype=np.int64) - offs[np.repeat(np.arange(len(av)), cts)]
            starts = offsets[:-1][row] + cid * step
            stops = np.minimum(starts + size, offsets[1:][row])
            lens = stops - starts
            new_off = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
            gather = np.repeat(starts, lens) + (
                np.arange(int(lens.sum()), dtype=np.int64)
                - np.repeat(new_off[:-1].astype(np.int64), lens)
            )
            chunk_arr = pa.StringArray.from_buffers(
                total,
                pa.py_buffer(new_off.tobytes()),
                pa.py_buffer(flat[gather].tobytes()),
            )
            out_ids.append(ids[row])
            out_cid.append(cid)
            out_txt.append(chunk_arr)
        for i in np.nonzero((~ascii_ok) & (nchunks > 0))[0]:  # rare fallback
            s = arr[i].as_py()
            ks = list(range(int(nchunks[i])))
            out_ids.append(np.full(len(ks), ids[i], dtype=np.int64))
            out_cid.append(np.array(ks, dtype=np.int64))
            out_txt.append(pa.array([s[k * step : k * step + size] for k in ks]))
        if not out_ids:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "chunk_id": pa.array([], type=pa.int64()),
                    "chunk_text": pa.array([], type=pa.string()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_ids)),
                "chunk_id": pa.array(np.concatenate(out_cid)),
                "chunk_text": pa.concat_arrays(out_txt),
            }
        )

    return ds.select_columns(["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


_SHARD_MUL = 2654435761  # Knuth multiplicative constant, also the corpus geolocator's
_SHARD_MOD = 2147483647  # 2^31 - 1: products stay < 2^63, SQL BIGINT-exact


def train_shards(ds: ray.data.Dataset, num_shards: int = 8) -> ray.data.Dataset:
    """Deterministic training-shard assignment: every document gets a
    pseudo-random 31-bit rank ``h = (doc_id * MUL) % MOD``, lands in shard
    ``h % num_shards`` and receives its stable position within the shard
    (ordered by (h, doc_id)). Output: (doc_id, shard, pos). This is the
    global-shuffle-to-shards step of a pretraining data pipeline, made
    reproducible: same corpus -> same shard files, independent of block
    layout or cluster size.

    Scale shape: the hash assignment is a stateless map; the only exchange
    is ONE groupby on shard (num_shards keys, uniformly loaded by the
    multiplicative hash), and positions come from a vectorized argsort
    within each shard group — no global sort, no driver materialization."""
    if num_shards <= 0:
        raise ValueError(f"num_shards must be positive, got {num_shards}")

    def assign(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        h = (ids * _SHARD_MUL) % _SHARD_MOD
        return pa.table(
            {"doc_id": pa.array(ids), "h": pa.array(h), "shard": pa.array(h % num_shards)}
        )

    def position(tbl: pa.Table) -> pa.Table:
        ids = np.asarray(tbl["doc_id"], dtype=np.int64)
        h = np.asarray(tbl["h"], dtype=np.int64)
        order = np.lexsort((ids, h))
        pos = np.empty(len(order), dtype=np.int64)
        pos[order] = np.arange(len(order), dtype=np.int64)
        return pa.table(
            {"doc_id": pa.array(ids), "shard": tbl["shard"], "pos": pa.array(pos)}
        )

    return (
        ds.select_columns(["doc_id"])
        .map_batches(assign, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(position, batch_format="pyarrow")
    )


BM25_TERMS = ("query", "merge", "vector")
_BM25_K1 = 1.2
_BM25_B = 0.75


def bm25_rank(
    sf_dir: str, terms: tuple[str, ...] = BM25_TERMS, k: int = 10
) -> "pd.DataFrame":
    """BM25 top-k document ranking for a fixed multi-term query (the scoring
    complement of the inverted-index `keyword_search` AND lookup).

    Deterministic no-log idf variant: idf_t = (N - df_t + 0.5)/(df_t + 0.5)
    (ln() is monotone in this ratio, so ranking semantics match classic BM25
    for a single term and the whole expression tree stays in exactly-rounded
    IEEE ops — +,-,*,/ — that DuckDB reproduces bit-for-bit; libm ln() has
    no such cross-engine guarantee). k1 = 1.2, b = 0.75.

    Two streaming passes over a materialized (doc_id, dl, tf_*) projection
    — integers only, a tiny fraction of corpus bytes:
    1. corpus stats: one-row partials per batch (N, sum dl, df per term),
       driver-reduced (rows = block count);
    2. scoring: broadcast scalar stats, per-batch top-k partial
       (argpartition), driver reduce over k x num_batches candidates.
    The corpus never shuffles; term frequencies come from non-overlapping
    substring counts on space-doubled padded text (' t ' cannot share its
    delimiter spaces after doubling), identical semantics to SQL
    length-replace counting.
    """
    from ..sources.read import read_parquet_sized

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    tf_cols = [f"tf{i}" for i in range(len(terms))]

    def prep(batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        dl = pc.add(pc.count_substring(texts, " "), 1).cast(pa.int64())
        padded = pc.binary_join_element_wise(
            " ", pc.replace_substring(texts, " ", "  "), " ", ""
        )
        cols = {"doc_id": batch["doc_id"].cast(pa.int64()), "dl": dl}
        for i, t in enumerate(terms):
            cols[tf_cols[i]] = pc.count_substring(padded, f" {t} ").cast(pa.int64())
        return pa.table(cols)

    prepped = docs.map_batches(prep, batch_format="pyarrow").materialize()

    def stats_partial(batch: pa.Table) -> pa.Table:
        out = {
            "n": pa.array([batch.num_rows], type=pa.int64()),
            "sdl": pa.array([pc.sum(batch["dl"]).as_py() or 0], type=pa.int64()),
        }
        for c in tf_cols:
            tf = np.asarray(batch[c], dtype=np.int64)
            out[f"df_{c}"] = pa.array([int((tf > 0).sum())], type=pa.int64())
        return pa.table(out)

    st = prepped.map_batches(stats_partial, batch_format="pyarrow").to_pandas().sum()
    n_docs, sum_dl = float(st["n"]), float(st["sdl"])
    avgdl = sum_dl / n_docs
    idf = [
        ((n_docs - float(st[f"df_{c}"])) + 0.5) / (float(st[f"df_{c}"]) + 0.5)
        for c in tf_cols
    ]

    def score_partial(batch: pa.Table) -> pa.Table:
        dl = np.asarray(batch["dl"], dtype=np.float64)
        norm = 0.25 + 0.75 * (dl / avgdl)
        score = np.zeros(len(dl), dtype=np.float64)
        any_tf = np.zeros(len(dl), dtype=bool)
        for i, c in enumerate(tf_cols):
            tf = np.asarray(batch[c], dtype=np.float64)
            score = score + idf[i] * ((tf * 2.2) / (tf + 1.2 * norm))
            any_tf |= tf > 0
        ids = np.asarray(batch["doc_id"], dtype=np.int64)[any_tf]
        score = score[any_tf]
        if len(ids) > k:
            # tie-break on doc_id like the final sort (and the oracle's
            # ORDER BY score DESC, doc_id): argpartition alone keeps an
            # arbitrary subset of boundary-score ties
            keep = np.lexsort((ids, -score))[:k]
            ids, score = ids[keep], score[keep]
        return pa.table({"doc_id": pa.array(ids), "score": pa.array(score)})

    cand = prepped.map_batches(score_partial, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(
        ["score", "doc_id"], ascending=[False, True], kind="mergesort"
    ).head(k)
    cand.insert(0, "rank", np.arange(1, len(cand) + 1, dtype=np.int64))
    return cand.reset_index(drop=True)


def cell_top_lang(nodes: ray.data.Dataset) -> ray.data.Dataset:
    """Grouped mode: per 0.1-degree grid cell, the most frequent language
    with a deterministic tie-break (smallest lang string) — the categorical
    counterpart of the cell density histogram (A1).

    Scale shape: per-batch (cell, lang) partial counts collapse each block
    to at most cells x languages rows before the single groupby; the argmax
    inside each cell group is a vectorized lexsort, not a row loop.  Exact
    oracle: ROW_NUMBER() OVER (PARTITION BY cell ORDER BY n DESC, lang).
    """
    import pandas as pd

    def partial(batch: pa.Table) -> "pd.DataFrame":
        df = pd.DataFrame(
            {"cell": np.asarray(batch["cell"]), "lang": batch["lang"].to_pandas()}
        )
        g = df.groupby(["cell", "lang"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    def pick(group: "pd.DataFrame") -> "pd.DataFrame":
        n = group.groupby("lang", as_index=False)["n"].sum()
        # order: count desc, lang asc -> first row is the mode
        n = n.sort_values(["n", "lang"], ascending=[False, True], kind="stable")
        top = n.iloc[:1]
        return pd.DataFrame(
            {
                "cell": group["cell"].iloc[:1].to_numpy(),
                "lang": top["lang"].to_numpy(),
                "n": top["n"].to_numpy(np.int64),
            }
        )

    return (
        nodes.map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(pick, batch_format="pandas")
    )


def user_trip_length(sf_dir: str) -> "ray.data.Dataset":
    """Per-user trajectory length ("odometer"): every event geolocates by
    event_id (the same hash derivation that places documents as nodes),
    events order by (ts, event_id) within a user, and consecutive-event
    planar distances round to integer NANODEGREES before summing — integer
    sums are exactly associative, so the result replays bit-for-bit in the
    oracle's LAG + SUM regardless of aggregation order (float sums would
    not; same discipline as way_chainage). ONE shuffle keyed on hash(user)
    bucket (a user's whole history lands in one task — the events family's
    standing partitioning assumption); per-bucket vectorized lexsort +
    diff. Output: (user_id, n_events, trip_nm)."""
    from ..sources.read import read_parquet_sized
    from ..sources.synthetic import geolocate

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    num_buckets = 32

    def prep(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["user_id"], dtype=np.int64)
        b = np.abs((u * np.int64(-7046029254386353131)) >> np.int64(32)) % num_buckets
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "ts": batch["ts"],
                "__bucket": pa.array(b),
            }
        )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        u = np.asarray(tbl["user_id"], dtype=np.int64)
        eid = np.asarray(tbl["event_id"], dtype=np.int64)
        ts = np.asarray(tbl["ts"], dtype="datetime64[us]").astype(np.int64)
        order = np.lexsort((eid, ts, u))
        u, eid = u[order], eid[order]
        lon, lat = geolocate(eid)
        d = np.sqrt(np.diff(lon) ** 2 + np.diff(lat) ** 2)
        d_nm = np.zeros(len(u), dtype=np.int64)
        if len(u) > 1:
            d_nm[1:] = np.floor(d * 1e9 + 0.5).astype(np.int64)
            d_nm[1:][u[1:] != u[:-1]] = 0  # no distance across users
        uniq, inv = np.unique(u, return_inverse=True)
        trip = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(trip, inv, d_nm)
        n = np.bincount(inv).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(uniq),
                "n_events": pa.array(n),
                "trip_nm": pa.array(trip),
            }
        )

    # stays a Dataset: the output is one row per USER — corpus-scaled, not
    # driver-bounded like the per-day retention table
    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def trip_segments(sf_dir: str, eps: float = 0.5) -> "ray.data.Dataset":
    """Spatial trajectory segmentation: within a user's (ts, event_id)-ordered
    event stream, a NEW segment starts wherever the planar jump from the
    previous event exceeds ``eps`` (the spatial analogue of time-gap
    sessionization). The break test is a float comparison — bit-stable across
    engines, unlike float sums — and segment ids are integer cumsums of break
    flags, so the oracle's windowed SUM replays exactly. Same ONE
    hash(user)-bucket shuffle as user_trip_length; per-bucket vectorized
    lexsort + diff + reduceat. Output: (user_id, seg, n_events, min_event,
    max_event)."""
    from ..sources.read import read_parquet_sized
    from ..sources.synthetic import geolocate

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    num_buckets = 32
    eps2 = float(eps) * float(eps)

    def prep(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["user_id"], dtype=np.int64)
        b = np.abs((u * np.int64(-7046029254386353131)) >> np.int64(32)) % num_buckets
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "ts": batch["ts"],
                "__bucket": pa.array(b),
            }
        )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        u = np.asarray(tbl["user_id"], dtype=np.int64)
        eid = np.asarray(tbl["event_id"], dtype=np.int64)
        ts = np.asarray(tbl["ts"], dtype="datetime64[us]").astype(np.int64)
        order = np.lexsort((eid, ts, u))
        u, eid = u[order], eid[order]
        lon, lat = geolocate(eid)
        n = len(u)
        brk = np.ones(n, dtype=np.int64)
        if n > 1:
            d2 = np.diff(lon) ** 2 + np.diff(lat) ** 2
            brk[1:] = (d2 > eps2).astype(np.int64)
            brk[1:][u[1:] != u[:-1]] = 1  # a user's first event always breaks
        # per-user segment index: cumsum of breaks minus the cumsum at the
        # user's first event (its break flag is 1, so seg starts at 0)
        cs = np.cumsum(brk)
        user_start = np.ones(n, dtype=bool)
        user_start[1:] = u[1:] != u[:-1]
        start_idx = np.flatnonzero(user_start)
        runs = np.diff(np.append(start_idx, n))
        base = np.repeat(cs[start_idx] - 1, runs)
        seg = cs - 1 - base
        # contiguous (user, seg) runs -> reduceat aggregates
        seg_start = brk.astype(bool)
        s_idx = np.flatnonzero(seg_start)
        cnt = np.diff(np.append(s_idx, n))
        return pa.table(
            {
                "user_id": pa.array(u[s_idx]),
                "seg": pa.array(seg[s_idx]),
                "n_events": pa.array(cnt.astype(np.int64)),
                "min_event": pa.array(np.minimum.reduceat(eid, s_idx)),
                "max_event": pa.array(np.maximum.reduceat(eid, s_idx)),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def events_rolling_max(sf_dir: str, k: int = 4) -> "ray.data.Dataset":
    """Per-row rolling window aggregate: for every event, the MAX of
    ``value`` over the user's last ``k`` events (current + k-1 preceding,
    (ts, event_id) order) — the ROWS-window complement of the family's
    tumbling/hopping aggregates. MAX over floats is order-independent, so
    the result is exact against the oracle's window function (rolling SUMs
    of floats would not replay — engines tree-aggregate them). Same ONE
    hash(user)-bucket shuffle; per-bucket vectorized shifted-column maximum
    (k columns, no per-row loop). Output: (event_id, user_id, roll_max)."""
    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    )
    num_buckets = 32

    def prep(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["user_id"], dtype=np.int64)
        b = np.abs((u * np.int64(-7046029254386353131)) >> np.int64(32)) % num_buckets
        return batch.append_column("__bucket", pa.array(b))

    def per_bucket(tbl: pa.Table) -> pa.Table:
        u = np.asarray(tbl["user_id"], dtype=np.int64)
        eid = np.asarray(tbl["event_id"], dtype=np.int64)
        ts = np.asarray(tbl["ts"], dtype="datetime64[us]").astype(np.int64)
        val = np.asarray(tbl["value"], dtype=np.float64)
        order = np.lexsort((eid, ts, u))
        u, eid, val = u[order], eid[order], val[order]
        n = len(u)
        # row i's window start = max(first index of its user, i - k + 1):
        # shifted-column max with a same-user guard per shift
        out = val.copy()
        for s in range(1, k):
            ok = np.zeros(n, dtype=bool)
            ok[s:] = u[s:] == u[:-s]
            np.maximum(out[s:], np.where(ok[s:], val[:-s], -np.inf), out=out[s:])
        return pa.table(
            {
                "event_id": pa.array(eid),
                "user_id": pa.array(u),
                "roll_max": pa.array(out),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


#: distinct odd mixers so a member's salt is independent of its routing
#: bucket (same-constant salting would send every salt group to one bucket)
_PAIR_MIX_A = np.int64(-7046029254386353131)
_PAIR_MIX_B = np.int64(-7723592293110706197)


def salted_key_pairs(
    triples: "ray.data.Dataset",
    *,
    hot_threshold: int = 4096,
    num_buckets: int = 64,
    max_task_pairs: int | None = None,
) -> "ray.data.Dataset":
    """All-pairs-per-key with two-level hot-key salting: for a Dataset of
    (key, user_id) int64 rows (cross-batch duplicates allowed), emit
    (pair, n) where pair packs the user pair as ``min*2^31 + max`` and n
    counts the DISTINCT keys under which the two users co-occur. The shared
    engine behind :func:`covisit_pairs` (key = packed cell-hour meeting)
    and :func:`user_cell_jaccard` (key = cell, n = intersection size).

    The skew problem this solves: naive per-key pair enumeration puts one
    dense key (an urban cell-hour with k participants) in ONE task doing the
    full k^2/2 work — exactly the hot-key skew the scale rule names. Scheme
    (triangle partitioning, the :func:`..stages.knn.radius_join` exactly-once
    ownership discipline):

    1. COUNT pass: per-batch-distinct partial counts -> bucketed sum; keys
       whose (upper-bound) member count exceeds ``hot_threshold`` become hot,
       with g = ceil(count / hot_threshold) salt groups. The hot set is tiny
       by construction (<= total_rows / hot_threshold entries) and ships once
       via ray.put.
    2. ROUTE pass: a member of hot key K gets salt s = hash(user) % g and is
       replicated to the g tasks {(min(s,t), max(s,t)) : t < g}; non-hot rows
       route as (K, 0, 0) with no replication. Tasks spread by a hash of
       (key, i, j), so one dense meeting fans across the cluster.
    3. ENUMERATE: task (K, i, i) pairs its salt-i members (triangular); task
       (K, i, j), i < j, pairs salt-i members against salt-j members (cross
       product only). A pair with salts (su, sv) is owned by exactly task
       (min(su,sv), max(su,sv)) — every pair exactly once, and no task holds
       more than ~2*hot_threshold members of any key (in expectation under
       the salt hash), so per-task pair work is bounded by ~hot_threshold^2
       regardless of key density.
    4. The per-task pair partials pre-aggregate (np.unique counts), then one
       bucketed pair-keyed sum merges across keys.

    ``triples`` is consumed twice (count + route); it re-executes from
    lineage, so callers may pass a lazy derivation (recompute-over-pin: the
    triples stream is corpus-sized and cheap to re-derive).
    ``max_task_pairs`` is a test hook: when set, every per-task segment
    asserts its enumerated pair count stays under it, pinning the skew
    bound (production default None — a failed bound is a plan bug, not a
    data error)."""
    from .group_collect import bucketed_sum

    def count_partial(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch["key"], dtype=np.int64)
        u = np.asarray(batch["user_id"], dtype=np.int64)
        rows = np.unique(np.stack([k, u], axis=1), axis=0)
        kk, nn = np.unique(rows[:, 0], return_counts=True)
        return pa.table({"key": pa.array(kk), "n": pa.array(nn.astype(np.int64))})

    counts = bucketed_sum(
        triples.map_batches(count_partial, batch_format="pyarrow"),
        ["key"], ["n"], num_buckets=num_buckets,
    )
    # cross-batch duplicates make these counts an UPPER bound on distinct
    # members — that only ever raises g (more salt groups than strictly
    # needed), never misses a hot key
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater(t["n"], hot_threshold)),
        batch_format="pyarrow",
    )
    # concat defensively: empty blocks can arrive schema-less
    hparts = [
        t for t in (ray.get(r) for r in hot.to_arrow_refs())
        if t.num_rows and t.num_columns
    ]
    if hparts:
        hot_tbl = pa.concat_tables(hparts)
        hk = np.asarray(hot_tbl["key"], dtype=np.int64)
        hn = np.asarray(hot_tbl["n"], dtype=np.int64)
    else:
        hk = np.empty(0, dtype=np.int64)
        hn = np.empty(0, dtype=np.int64)
    o = np.argsort(hk)
    hk, hn = hk[o], hn[o]
    hg = np.maximum(2, -(-hn // hot_threshold))  # ceil, min 2 groups
    hot_ref = ray.put((hk, hg))

    def route(batch: pa.Table) -> pa.Table:
        from ..state.broadcast import get as bget

        keys_h, g_h = bget(hot_ref)
        k = np.asarray(batch["key"], dtype=np.int64)
        u = np.asarray(batch["user_id"], dtype=np.int64)
        rows = np.unique(np.stack([k, u], axis=1), axis=0)
        k, u = rows[:, 0], rows[:, 1]
        assert (u >= 0).all() and (u < (1 << 31)).all(), "user ids must fit 31 bits"
        if len(keys_h):
            idx = np.clip(np.searchsorted(keys_h, k), 0, len(keys_h) - 1)
            g = np.where(keys_h[idx] == k, g_h[idx], 1).astype(np.int64)
        else:
            g = np.ones(len(k), dtype=np.int64)
        s = (np.abs(u * _PAIR_MIX_B) >> np.int64(33)) % g
        # ragged expansion: row -> g copies, one per counterpart salt t
        total = int(g.sum())
        row = np.repeat(np.arange(len(k)), g)
        starts = np.concatenate([[0], np.cumsum(g)[:-1]])
        t = np.arange(total) - np.repeat(starts, g)
        sr = s[row]
        i = np.minimum(sr, t)
        j = np.maximum(sr, t)
        kr, ur = k[row], u[row]
        h = kr * _PAIR_MIX_A + (i * np.int64(1_000_003) + j) * _PAIR_MIX_B
        b = np.abs(h >> np.int64(32)) % num_buckets
        return pa.table(
            {
                "key": pa.array(kr),
                "user_id": pa.array(ur),
                "s": pa.array(sr),
                "i": pa.array(i),
                "j": pa.array(j),
                "__bucket": pa.array(b),
            }
        )

    def per_task(tbl: pa.Table) -> pa.Table:
        arr = np.stack(
            [np.asarray(tbl[c], dtype=np.int64) for c in ("key", "i", "j", "user_id", "s")],
            axis=1,
        )
        arr = np.unique(arr, axis=0)  # cross-batch dedup; lexsorted (key,i,j,user)
        k, i, j, u, s = arr.T
        kij = (k, i, j)
        changed = np.zeros(len(k), dtype=bool)
        changed[0:1] = True
        for col in kij:
            changed[1:] |= col[1:] != col[:-1]
        seg_starts = np.flatnonzero(changed)
        seg_ends = np.r_[seg_starts[1:], len(k)]
        out = []
        for st, en in zip(seg_starts, seg_ends):
            us, ss = u[st:en], s[st:en]
            ii, jj = i[st], j[st]
            if ii == jj:
                m = en - st
                if m < 2:
                    continue
                ia, ib = np.triu_indices(m, k=1)
                a, b = us[ia], us[ib]  # us ascending -> a < b
            else:
                ua_ = us[ss == ii]
                ub_ = us[ss == jj]
                if not len(ua_) or not len(ub_):
                    continue
                a = np.repeat(ua_, len(ub_))
                b = np.tile(ub_, len(ua_))
                a, b = np.minimum(a, b), np.maximum(a, b)
            if max_task_pairs is not None:  # test hook: pin the skew bound
                assert len(a) <= max_task_pairs, (
                    f"salted pair task enumerated {len(a)} pairs for one "
                    f"(key, i, j) segment (> {max_task_pairs})"
                )
            out.append(a * (np.int64(1) << np.int64(31)) + b)
        if not out:
            return pa.table(
                {"pair": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64())}
            )
        pair, n = np.unique(np.concatenate(out), return_counts=True)
        return pa.table({"pair": pa.array(pair), "n": pa.array(n.astype(np.int64))})

    tasks = (
        triples.map_batches(route, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_task, batch_format="pyarrow")
    )
    return bucketed_sum(tasks, ["pair"], ["n"], num_buckets=num_buckets)


def covisit_pairs(sf_dir: str, *, hot_threshold: int = 4096) -> "ray.data.Dataset":
    """Spatio-temporal co-occurrence ("co-visitation"): pairs of users with
    events in the same grid cell within the same UTC hour, with the number
    of distinct (cell, hour) meetings. The contact-graph primitive.

    Plan: per-batch distinct (user, cell, hour) triples feed
    :func:`salted_key_pairs` keyed on the packed (cell, hour) — dense
    meetings split into salt groups with exactly-once triangle-partitioned
    pair ownership (no single task enumerates more than ~hot_threshold^2
    pairs, however hot one urban cell-hour gets), then the pair-keyed
    bucketed sum counts meetings. Pack bounds: |cell| < 2^28 (0.1-degree
    grid), hour-since-epoch < 2^22 through year ~2400, so cell*2^22 + hour
    fits int64; user pairs pack as ua*2^31 + ub while user ids stay below
    2^31 (asserted in the route pass). Output: (user_a, user_b,
    n_meetings)."""
    from ..model import cell_xy, pack_cell
    from ..sources.read import read_parquet_sized
    from ..sources.synthetic import geolocate

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["user_id"], dtype=np.int64)
        eid = np.asarray(batch["event_id"], dtype=np.int64)
        ts = np.asarray(batch["ts"], dtype="datetime64[us]").astype(np.int64)
        lon, lat = geolocate(eid)
        cell = pack_cell(*cell_xy(lon, lat))
        hr = ts // 3_600_000_000
        key = cell * (np.int64(1) << np.int64(22)) + hr
        rows = np.unique(np.stack([key, u], axis=1), axis=0)
        return pa.table(
            {"key": pa.array(rows[:, 0]), "user_id": pa.array(rows[:, 1])}
        )

    pairs = salted_key_pairs(
        ds.map_batches(prep, batch_format="pyarrow"), hot_threshold=hot_threshold
    )

    def unpack(batch: pa.Table) -> pa.Table:
        p = np.asarray(batch["pair"], dtype=np.int64)
        n = np.asarray(batch["n"], dtype=np.int64)
        return pa.table(
            {
                "user_a": pa.array(p >> np.int64(31)),
                "user_b": pa.array(p & np.int64((1 << 31) - 1)),
                "n_meetings": pa.array(n),
            }
        )

    return pairs.map_batches(unpack, batch_format="pyarrow")


def value_percentiles(
    sf_dir: str, qs: tuple[float, ...] = (0.5, 0.9, 0.99), *, bin_cap: int = 1_000_000
) -> "ray.data.Dataset":
    """EXACT percentiles of a float column (events.value) — distributed
    k-th order-statistic selection. The data values are only ROUTED (binned
    and compared), never transformed, so each answer is an exact element of
    the column and hash-identical to the oracle's ROW_NUMBER pick.

    Plan (classic two-pass selection, the integer-histogram discipline of
    doc_length_quantiles generalized to float domains): (1) min/max/count
    aggregate; (2) a 1024-bin histogram partial per batch, driver-reduced
    (1024 ints); locate the target rank's bin; (3) pull ONLY that bin's
    values (expected n/1024) and np.partition for the exact k-th smallest.
    While a bin exceeds ``bin_cap`` the selection recurses INSIDE it — bin
    membership is re-derived with the identical routing expression at every
    level (a range filter would disagree at bin boundaries), and a
    single-distinct-value bin short-circuits, so heavy ties terminate.
    Rank convention: k = floor((n-1) * q), 0-based ascending."""
    from ray.data.aggregate import Count, Max, Min

    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["value"]).materialize()
    agg = ds.aggregate(Min("value"), Max("value"), Count())
    lo, hi, n = float(agg["min(value)"]), float(agg["max(value)"]), int(agg["count()"])
    nbins = 1024

    def make_route(blo: float, width: float, bin_i: int, last: bool):
        """Membership test replaying the histogram's routing expression."""

        def route(v: np.ndarray) -> np.ndarray:
            b = np.clip(((v - blo) / width).astype(np.int64), 0, nbins - 1)
            return b == bin_i

        return route

    def hist_counts(routes, blo: float, bhi: float):
        width = (bhi - blo) / nbins or 1.0

        def partial(batch: pa.Table) -> pa.Table:
            v = np.asarray(batch["value"], dtype=np.float64)
            v = v[(v >= lo) & (v <= hi)]
            for r in routes:
                v = v[r(v)]
            b = np.clip(((v - blo) / width).astype(np.int64), 0, nbins - 1)
            c = np.bincount(b, minlength=nbins).astype(np.int64)
            return pa.table(
                {"bin": pa.array(np.arange(nbins, dtype=np.int64)), "c": pa.array(c)}
            )

        out = np.zeros(nbins, dtype=np.int64)
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        ):
            out[np.asarray(b["bin"], dtype=np.int64)] += np.asarray(b["c"], dtype=np.int64)
        return out, width

    def pull_values(routes):
        def fn(batch: pa.Table) -> pa.Table:
            v = np.asarray(batch["value"], dtype=np.float64)
            v = v[(v >= lo) & (v <= hi)]
            for r in routes:
                v = v[r(v)]
            return pa.table({"value": pa.array(v)})

        parts = [
            np.asarray(b["value"], dtype=np.float64)
            for b in ds.map_batches(fn, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        ]
        return np.concatenate(parts) if parts else np.array([], dtype=np.float64)

    rows_q, rows_v = [], []
    for q in qs:
        k = int(np.floor((n - 1) * q))  # 0-based global rank
        routes: list = []
        blo, bhi, rank = lo, hi, k
        while True:
            counts, width = hist_counts(routes, blo, bhi)
            cum = np.cumsum(counts)
            bin_i = int(np.searchsorted(cum, rank + 1))
            rank_in = rank - (int(cum[bin_i - 1]) if bin_i else 0)
            route = make_route(blo, width, bin_i, bin_i == nbins - 1)
            b_lo = blo + bin_i * width
            b_hi = blo + (bin_i + 1) * width
            if counts[bin_i] > bin_cap and bhi > blo and b_hi > np.nextafter(b_lo, np.inf):
                routes.append(route)
                blo, bhi, rank = b_lo, min(b_hi, bhi), rank_in
                continue
            vals = pull_values(routes + [route])
            rows_q.append(float(q))
            rows_v.append(float(np.partition(vals, rank_in)[rank_in]))
            break
    return ray.data.from_arrow(
        pa.table({"q": pa.array(rows_q, type=pa.float64()), "value": pa.array(rows_v)})
    )


def stay_points(sf_dir: str, min_run: int = 3) -> "ray.data.Dataset":
    """Stay-point detection (trajectory mining): maximal runs of >=
    ``min_run`` CONSECUTIVE events (ordered by (ts, event_id) within a
    user) whose geolocated position stays inside one 0.1-degree grid cell
    — the grid-quantized version of the classic stay-point primitive
    (dwell episodes, the unit of visit/POI mining). Gaps-and-islands over
    the same per-user bucket shuffle as :func:`user_trip_length`: ONE
    hash(user)-keyed exchange, then a vectorized per-bucket lexsort and
    run-boundary scan (no Python per-run loop for the boundary math; runs
    extract via start-index arithmetic). All-integer output replays
    exactly in the oracle's ROW_NUMBER-difference island id.

    Output: (user_id, cell, n_events, start_event_id) — one row per
    qualifying run; start_event_id identifies the run's first event."""
    from ..model import cell_of
    from ..sources.read import read_parquet_sized
    from ..sources.synthetic import geolocate

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    num_buckets = 32

    def prep(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["user_id"], dtype=np.int64)
        b = np.abs((u * np.int64(-7046029254386353131)) >> np.int64(32)) % num_buckets
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "ts": batch["ts"],
                "__bucket": pa.array(b),
            }
        )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        u = np.asarray(tbl["user_id"], dtype=np.int64)
        eid = np.asarray(tbl["event_id"], dtype=np.int64)
        ts = np.asarray(tbl["ts"], dtype="datetime64[us]").astype(np.int64)
        order = np.lexsort((eid, ts, u))
        u, eid = u[order], eid[order]
        lon, lat = geolocate(eid)
        cell = cell_of(lon, lat)
        new_run = np.r_[True, (u[1:] != u[:-1]) | (cell[1:] != cell[:-1])]
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.r_[starts, len(u)])
        keep = lens >= min_run
        s = starts[keep]
        return pa.table(
            {
                "user_id": pa.array(u[s]),
                "cell": pa.array(cell[s]),
                "n_events": pa.array(lens[keep].astype(np.int64)),
                "start_event_id": pa.array(eid[s]),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def od_matrix(sf_dir: str) -> "ray.data.Dataset":
    """Origin-destination matrix (mobility analytics): each user's FIRST
    and LAST geolocated event cell (by (ts, event_id) order) define one
    O-D trip; output counts users per (origin_cell, dest_cell). Same
    single hash(user)-bucket shuffle as the other trajectory ops; the
    per-bucket kernel pre-aggregates (origin, dest) partials (np.unique
    over the packed pair) so the final pair-keyed groupby ships one row
    per DISTINCT pair per bucket, not one per user — the combiner
    discipline that keeps the exchange O(cells^2)-bounded at corpus
    scale. Cells are positive (engine data lives at lon 9-11 / lat
    53-55), so origin packs into the high bits losslessly (asserted).

    Output: (origin_cell, dest_cell, n_users)."""
    from ..model import cell_of
    from ..sources.read import read_parquet_sized
    from ..sources.synthetic import geolocate

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    num_buckets = 32

    def prep(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["user_id"], dtype=np.int64)
        b = np.abs((u * np.int64(-7046029254386353131)) >> np.int64(32)) % num_buckets
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "ts": batch["ts"],
                "__bucket": pa.array(b),
            }
        )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        u = np.asarray(tbl["user_id"], dtype=np.int64)
        eid = np.asarray(tbl["event_id"], dtype=np.int64)
        ts = np.asarray(tbl["ts"], dtype="datetime64[us]").astype(np.int64)
        order = np.lexsort((eid, ts, u))
        u, eid = u[order], eid[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], len(u)] - 1
        lon_o, lat_o = geolocate(eid[starts])
        lon_d, lat_d = geolocate(eid[ends])
        o = cell_of(lon_o, lat_o)
        d = cell_of(lon_d, lat_d)
        assert (o >= 0).all() and (d >= 0).all() and (d < (1 << 31)).all()
        pair, n = np.unique(o * (np.int64(1) << np.int64(31)) + d, return_counts=True)
        return pa.table({"pair": pa.array(pair), "n": pa.array(n.astype(np.int64))})

    from .group_collect import bucketed_sum

    pairs = bucketed_sum(
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow"),
        ["pair"], ["n"],
    ).rename_columns({"n": "n_users"})

    def unpack(batch: pa.Table) -> pa.Table:
        p = np.asarray(batch["pair"], dtype=np.int64)
        return pa.table(
            {
                "origin_cell": pa.array(p >> np.int64(31)),
                "dest_cell": pa.array(p & np.int64((1 << 31) - 1)),
                "n_users": batch["n_users"],
            }
        )

    return pairs.map_batches(unpack, batch_format="pyarrow")


def user_cell_jaccard(
    sf_dir: str, tau_pct: int = 5, *, hot_threshold: int = 4096
) -> "ray.data.Dataset":
    """User-similarity by visited-cell overlap: pairs of users whose
    DISTINCT visited-cell sets have Jaccard >= tau_pct/100, reported with
    the integer (intersection, union) sizes so the comparison is exact —
    the threshold test is the cross-multiplied ``100*inter >= tau_pct *
    union`` (no float ratio anywhere; same all-integer discipline as the
    dedup family). The collaborative-filtering / contact-similarity
    primitive over trajectories.

    Plan: globally-distinct (cell, user) pairs feed
    :func:`salted_key_pairs` keyed on cell — intersection sizes come out as
    the per-pair distinct-key counts, with dense cells split into salt
    groups under the exactly-once triangle-partitioned ownership (no single
    task enumerates more than ~hot_threshold^2 pairs, however populous one
    cell gets). Per-user distinct-cell counts come from a parallel
    cell-deduped partial sum and broadcast as SORTED ARRAYS (searchsorted
    lookup per batch, not a Python dict — the distinctive_terms
    discipline).

    Output: (user_a, user_b, inter, union_n) with user_a < user_b."""
    from ..model import cell_of
    from ..sources.read import read_parquet_sized
    from ..sources.synthetic import geolocate

    # no materialize: the raw read feeds ONE consumer (the distinct build);
    # the fan-out point is `distinct` below, which IS pinned — pinning the
    # corpus-sized raw stream here was pure object-store pressure
    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
    )
    num_buckets = 64

    def prep(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["user_id"], dtype=np.int64)
        eid = np.asarray(batch["event_id"], dtype=np.int64)
        lon, lat = geolocate(eid)
        cell = cell_of(lon, lat)
        rows = np.unique(np.stack([cell, u], axis=1), axis=0)
        b = np.abs((rows[:, 0] * np.int64(-7046029254386353131)) >> np.int64(32)) % num_buckets
        return pa.table(
            {
                "cell": pa.array(rows[:, 0]),
                "user_id": pa.array(rows[:, 1]),
                "__bucket": pa.array(b),
            }
        )

    distinct = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(lambda t: pa.table(dict(zip(
            ["cell", "user_id"],
            [pa.array(a) for a in np.unique(np.stack(
                [np.asarray(t["cell"], dtype=np.int64),
                 np.asarray(t["user_id"], dtype=np.int64)], axis=1), axis=0).T],
        ))), batch_format="pyarrow")
        .materialize()
    )

    # per-user distinct-cell counts: tiny (one row per user) — broadcast as
    # sorted arrays for a searchsorted gather inside the pair filter
    from ray.data.aggregate import Count

    counts_tbl = (
        distinct.groupby("user_id").aggregate(Count(alias_name="nc")).materialize()
    )
    import pyarrow as _pa

    cparts = [b for b in counts_tbl.to_arrow_refs()]
    ctab = _pa.concat_tables([ray.get(r) for r in cparts])
    cu = np.asarray(ctab["user_id"], dtype=np.int64)
    cn = np.asarray(ctab["nc"], dtype=np.int64)
    o = np.argsort(cu)
    counts_ref = ray.put((cu[o], cn[o]))

    pairs = salted_key_pairs(
        distinct.map_batches(
            lambda t: pa.table({"key": t["cell"], "user_id": t["user_id"]}),
            batch_format="pyarrow",
        ),
        hot_threshold=hot_threshold,
        num_buckets=num_buckets,
    ).rename_columns({"n": "inter"})

    def finish(batch: pa.Table) -> pa.Table:
        p = np.asarray(batch["pair"], dtype=np.int64)
        inter = np.asarray(batch["inter"], dtype=np.int64)
        ua = p >> np.int64(31)
        ub = p & np.int64((1 << 31) - 1)
        users_sorted, n_sorted = ray.get(counts_ref)
        na = n_sorted[np.searchsorted(users_sorted, ua)]
        nb = n_sorted[np.searchsorted(users_sorted, ub)]
        union = na + nb - inter
        keep = 100 * inter >= tau_pct * union
        return pa.table(
            {
                "user_a": pa.array(ua[keep]),
                "user_b": pa.array(ub[keep]),
                "inter": pa.array(inter[keep]),
                "union_n": pa.array(union[keep]),
            }
        )

    return pairs.map_batches(finish, batch_format="pyarrow")


def user_first_seen(sf_dir: str) -> ray.data.Dataset:
    """New-users-per-day histogram: each user's FIRST active day, counted per
    day — the growth-accounting primitive (DAU's cohort sibling).

    Shape: per-batch (user -> min day) combiners shrink the stream before the
    one user-keyed groupby-Min; the surviving one-row-per-user table reduces
    to day-count partials and a day-keyed groupby bounded by the date range.
    Nothing corpus-sized shuffles twice. Output: (day [int days since epoch],
    new_users)."""
    from ray.data.aggregate import Min, Sum

    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def min_partial(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["user_id"], dtype=np.int64)
        day = (
            np.asarray(batch["ts"], dtype="datetime64[us]")
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        uu, inv = np.unique(u, return_inverse=True)
        md = np.full(len(uu), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(md, inv, day)
        return pa.table({"user_id": pa.array(uu), "day": pa.array(md)})

    from .group_collect import bucketed_min

    firsts = bucketed_min(
        ds.map_batches(min_partial, batch_format="pyarrow"), ["user_id"], ["day"]
    )

    def day_partial(batch: pa.Table) -> pa.Table:
        d, c = np.unique(np.asarray(batch["day"], dtype=np.int64), return_counts=True)
        return pa.table({"day": pa.array(d), "new_users": pa.array(c.astype(np.int64))})

    return (
        firsts.map_batches(day_partial, batch_format="pyarrow")
        .repartition(4)
        .groupby("day")
        .aggregate(Sum("new_users", alias_name="new_users"))
    )


def doc_length_rank(sf_dir: str) -> ray.data.Dataset:
    """Global RANK() of every document by length, WITHOUT a global sort: the
    window-function-to-broadcast-histogram rewrite.

    ``RANK() OVER (ORDER BY n_chars)`` = 1 + count of strictly smaller
    values — a pure order statistic. Pass 1 builds the value histogram
    (partial counts per batch, one groupby bounded by the DISTINCT-value
    domain, not row count); the sorted (value, prefix-count) arrays broadcast
    via ray.put; pass 2 stamps every row map-only with a searchsorted gather.
    At 100 TB the histogram stays small while a window sort would be the
    worst shuffle in the plan. Output: (doc_id, n_chars, length_rank).
    """
    import ray

    from ray.data.aggregate import Sum

    from ..sources.read import read_parquet_sized
    from ..state.broadcast import get as bget

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        v, c = np.unique(np.asarray(batch["n_chars"], dtype=np.int64), return_counts=True)
        return pa.table({"v": pa.array(v), "c": pa.array(c.astype(np.int64))})

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(4)
        .groupby("v")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("v")
    )
    vals = hist["v"].to_numpy(np.int64)
    # prefix[i] = rows with value strictly below vals[i]
    prefix = np.concatenate(([0], np.cumsum(hist["c"].to_numpy(np.int64))))[:-1]
    ref = ray.put((vals, prefix))

    def stamp(batch: pa.Table) -> pa.Table:
        v, p = bget(ref)
        x = np.asarray(batch["n_chars"], dtype=np.int64)
        pos = np.searchsorted(v, x)  # exact: every x occurs in the histogram
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_chars": pa.array(x),
                "length_rank": pa.array(p[pos] + 1),
            }
        )

    return ds.map_batches(stamp, batch_format="pyarrow")


def events_props_stats(sf_dir: str) -> ray.data.Dataset:
    """Semi-structured field extraction: parse the integer ``k`` field out of
    the JSON ``props`` column with ONE vectorized RE2 pass
    (:func:`pyarrow.compute.extract_regex` — no per-row json.loads), then
    reduce to per-event-type stats.

    Shape: the regex runs inside map_batches over the Arrow string column
    (zero-copy from the object store); per-batch partials pre-aggregate to
    <= |event_type| rows each, so the groupby shuffles a few dozen rows per
    block regardless of corpus size. Rows whose props lack the field are
    counted but contribute no k (null-skipping on both engines). Output:
    (event_type, n_events, sum_k, max_k).
    """
    from ray.data.aggregate import Max, Sum

    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["event_type", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        k = pc.cast(
            pc.struct_field(
                pc.extract_regex(batch["props"], r'"k": (?P<k>\d+)'), "k"
            ),
            pa.int64(),
        )
        kv = np.asarray(pc.fill_null(k, 0), dtype=np.int64)
        has = ~np.asarray(pc.is_null(k), dtype=bool)
        et = np.asarray(batch["event_type"], dtype=object)
        uniq, inv = np.unique(et, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, np.where(has, kv, 0))
        m = np.full(len(uniq), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(m, inv[has], kv[has])
        m_arr = pa.array(
            [int(x) if x != np.iinfo(np.int64).min else None for x in m],
            type=pa.int64(),
        )
        return pa.table(
            {
                "event_type": pa.array(uniq, type=pa.string()),
                "n": pa.array(n),
                "s": pa.array(s),
                "m": m_arr,
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        return batch

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n_events"),
            Sum("s", alias_name="sum_k"),
            Max("m", alias_name="max_k"),
        )
    )


def lm_quality_scores(sf_dir: str) -> ray.data.Dataset:
    """CCNet-style language-model quality signal in an integer-exact form:
    train a unigram term-frequency model over the corpus in one pass, then
    score every document by its tokens' global frequencies — ``sum_tf`` (the
    doc's total frequency mass) and ``min_tf`` (its rarest token). Low
    ``min_tf``/``sum_tf`` per token flags out-of-distribution text, the same
    decision a float perplexity makes; keeping the statistic integral makes
    the result bit-exact against the SQL oracle (no libm log differences).

    Shape: pass 1 is the vocabulary-sized (token, count) reduce of
    :func:`top_terms_df` — per-batch partials, tiny groupby; the model is
    broadcast once via ray.put as two sorted arrays (token vocab +
    counts — the r02-reviewed searchsorted layout, not a Python dict).
    Pass 2 re-streams the corpus, np.searchsorted's every batch's tokens
    against the broadcast vocab and segment-sums per doc. The corpus is
    read twice and never shuffled. Output: (doc_id, n_tokens, sum_tf,
    min_tf); empty docs are dropped (they have no tokens on either engine).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flat, _ = _doc_tokens(batch["text"].to_pandas())
        if len(flat) == 0:
            return pa.table(
                {"token": pa.array([], type=pa.string()),
                 "c": pa.array([], type=pa.int64())}
            )
        uniq, counts = np.unique(flat, return_counts=True)
        return pa.table(
            {"token": pa.array(uniq, type=pa.string()),
             "c": pa.array(counts.astype(np.int64))}
        )

    tf = (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .repartition(4)
        .groupby("token")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("token", kind="mergesort")
    )
    vocab = tf["token"].to_numpy(dtype=object)
    counts = tf["c"].to_numpy(dtype=np.int64)
    model_ref = ray.put((vocab, counts))

    def score(batch: pa.Table) -> pa.Table:
        voc, cnt = ray.get(model_ref)
        flat, doc_of = _doc_tokens(batch["text"].to_pandas())
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        if len(flat) == 0:
            return pa.table(
                {"doc_id": pa.array([], type=pa.int64()),
                 "n_tokens": pa.array([], type=pa.int64()),
                 "sum_tf": pa.array([], type=pa.int64()),
                 "min_tf": pa.array([], type=pa.int64())}
            )
        tfv = cnt[np.searchsorted(voc, flat)]
        n = np.bincount(doc_of, minlength=len(ids)).astype(np.int64)
        s = np.zeros(len(ids), dtype=np.int64)
        np.add.at(s, doc_of, tfv)
        mn = np.full(len(ids), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mn, doc_of, tfv)
        keep = n > 0
        return pa.table(
            {
                "doc_id": pa.array(ids[keep]),
                "n_tokens": pa.array(n[keep]),
                "sum_tf": pa.array(s[keep]),
                "min_tf": pa.array(mn[keep]),
            }
        )

    return _docs(sf_dir).map_batches(score, batch_format="pyarrow")


def events_k_anomalies(sf_dir: str, k_sigma2: int = 4) -> ray.data.Dataset:
    """Grouped anomaly detection, integer-exact: flag events whose ``props``
    integer field deviates from the OWNER's mean by more than
    sqrt(k_sigma2) population standard deviations. The z-test is evaluated
    in cleared-denominator integer form —

        (v*n - s)^2 * n  >  k_sigma2 * n * (n*ssq - s^2)

    (v the event's k, n/s/ssq the user's count/sum/sum-of-squares) — so
    both engines compare exact int64 quantities; no float summation-order
    hazard can flip a borderline row. With k in [0, 100) the left side is
    bounded by 1e4 * n^3: safe to n ~ 50k events/user; at corpora beyond
    that, promote the comparison to float AFTER the exact partial sums
    (the partials stay int64 and mergeable).

    Shape: pass 1 per-batch (user, n, s, ssq) partials -> one tiny
    user-keyed groupby; pass 2 re-streams events and attaches the stats by
    bucketed int64 hash join (stages/joins.py — the per-user table can
    exceed broadcast size at corpus scale), then filters vectorized.
    Users with n < 2 never flag (zero variance is not evidence). Output:
    (event_id, user_id, k).
    """
    from ray.data.aggregate import Sum

    from ..sources.read import read_parquet_sized
    from .joins import hash_join_attach

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "props"]
    )

    def extract(batch: pa.Table) -> pa.Table:
        kv = pc.cast(
            pc.struct_field(
                pc.extract_regex(batch["props"], r'"k": (?P<k>\d+)'), "k"
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "k": kv,
            }
        )

    events = ds.map_batches(extract, batch_format="pyarrow").materialize()

    def partial(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["user_id"], dtype=np.int64)
        v = np.asarray(pc.fill_null(batch["k"], 0), dtype=np.int64)
        has = ~np.asarray(pc.is_null(batch["k"]), dtype=bool)
        uu, inv = np.unique(u[has], return_inverse=True)
        n = np.bincount(inv, minlength=len(uu)).astype(np.int64)
        s = np.zeros(len(uu), dtype=np.int64)
        q = np.zeros(len(uu), dtype=np.int64)
        vh = v[has]
        np.add.at(s, inv, vh)
        np.add.at(q, inv, vh * vh)
        return pa.table(
            {"user_id": pa.array(uu), "n": pa.array(n), "s": pa.array(s), "q": pa.array(q)}
        )

    from .group_collect import bucketed_sum

    stats = bucketed_sum(
        events.map_batches(partial, batch_format="pyarrow"),
        ["user_id"], ["n", "s", "q"],
    )

    i64 = pa.int64()
    joined = hash_join_attach(
        events, "user_id", stats, "user_id", {"n": i64, "s": i64, "q": i64}
    )

    def flag(batch: pa.Table) -> pa.Table:
        v = np.asarray(pc.fill_null(batch["k"], 0), dtype=np.int64)
        has = ~np.asarray(pc.is_null(batch["k"]), dtype=bool)
        n = np.asarray(pc.fill_null(batch["n"], 0), dtype=np.int64)
        s = np.asarray(pc.fill_null(batch["s"], 0), dtype=np.int64)
        q = np.asarray(pc.fill_null(batch["q"], 0), dtype=np.int64)
        lhs = (v * n - s) ** 2 * n
        rhs = k_sigma2 * n * (n * q - s * s)
        keep = has & (n >= 2) & (lhs > rhs)
        out = batch.select(["event_id", "user_id", "k"]).filter(pa.array(keep))
        return out

    return joined.map_batches(flag, batch_format="pyarrow")


def events_k_delta(sf_dir: str, num_buckets: int = 32) -> ray.data.Dataset:
    """Per-user LAG: for every event with an immediate predecessor in the
    user's (ts, event_id) order, the delta of the ``props`` integer field
    against that predecessor — the change-point / feature-engineering
    primitive (integer-exact against the oracle's LAG window).

    Shape: the family's ONE hash(user)-bucket shuffle co-locates each
    user's events; per bucket a single lexsort + shifted compare emits the
    deltas vectorized. Events whose own or predecessor's field is missing
    are dropped on both engines (the predecessor is the immediate prior ROW,
    null field or not — LAG semantics). Output:
    (event_id, user_id, k, prev_k, dk)."""
    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "props"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        kv = pc.cast(
            pc.struct_field(
                pc.extract_regex(batch["props"], r'"k": (?P<k>\d+)'), "k"
            ),
            pa.int64(),
        )
        u = np.asarray(batch["user_id"], dtype=np.int64)
        b = np.abs((u * np.int64(-7046029254386353131)) >> np.int64(32)) % num_buckets
        return pa.table(
            {
                "event_id": batch["event_id"],
                "ts": batch["ts"],
                "user_id": batch["user_id"],
                "k": kv,
                "__bucket": pa.array(b),
            }
        )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        u = np.asarray(tbl["user_id"], dtype=np.int64)
        eid = np.asarray(tbl["event_id"], dtype=np.int64)
        ts = np.asarray(tbl["ts"], dtype="datetime64[us]").astype(np.int64)
        k = np.asarray(pc.fill_null(tbl["k"], 0), dtype=np.int64)
        has = ~np.asarray(pc.is_null(tbl["k"]), dtype=bool)
        order = np.lexsort((eid, ts, u))
        u, eid, k, has = u[order], eid[order], k[order], has[order]
        n = len(u)
        keep = np.zeros(n, dtype=bool)
        prev_k = np.zeros(n, dtype=np.int64)
        if n > 1:
            same = u[1:] == u[:-1]
            keep[1:] = same & has[1:] & has[:-1]
            prev_k[1:] = k[:-1]
        return pa.table(
            {
                "event_id": pa.array(eid[keep]),
                "user_id": pa.array(u[keep]),
                "k": pa.array(k[keep]),
                "prev_k": pa.array(prev_k[keep]),
                "dk": pa.array(k[keep] - prev_k[keep]),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def events_user_trend(sf_dir: str) -> ray.data.Dataset:
    """Per-user OLS trend of the ``props`` integer field over time, in
    cleared-denominator integer form: the least-squares slope of k vs
    x = whole seconds since 2024-01-01 is num/den with

        num = n*sum(x*k) - sum(x)*sum(k)
        den = n*sum(x*x) - sum(x)^2

    and the operator emits (user_id, n, num, den) as exact int64 — the
    consumer divides; no float summation-order hazard can perturb the
    hash. Overflow bound: den ~ n^2 * x^2 needs n * x_span_seconds
    < 3e9 (e.g. 95 events/user over a year); beyond that, recenter x per
    user (subtract the user's min — the slope is shift-invariant) or
    promote to float AFTER the exact int64 partials, which stay mergeable
    either way. Users whose x values are all equal (den = 0, slope
    undefined) are dropped on both engines; events without the field are
    ignored.

    Shape: one streaming pass of per-batch (user, n, sx, sy, sxy, sxx)
    partials -> one users-sized groupby sum -> vectorized final map. The
    corpus is never shuffled; only the per-user partial rows move.
    """
    from ray.data.aggregate import Sum

    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "props"]
    )
    # whole µs of 2024-01-01T00:00:00Z; ts >= epoch here so integer floor
    # division matches DuckDB's boundary-crossing date_diff('second', ...)
    epoch_us = np.int64(1704067200) * np.int64(1_000_000)

    def partial(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["user_id"], dtype=np.int64)
        x = (
            np.asarray(batch["ts"], dtype="datetime64[us]").astype(np.int64)
            - epoch_us
        ) // np.int64(1_000_000)
        kv = pc.cast(
            pc.struct_field(
                pc.extract_regex(batch["props"], r'"k": (?P<k>\d+)'), "k"
            ),
            pa.int64(),
        )
        has = ~np.asarray(pc.is_null(kv), dtype=bool)
        y = np.asarray(pc.fill_null(kv, 0), dtype=np.int64)
        u, x, y = u[has], x[has], y[has]
        uu, inv = np.unique(u, return_inverse=True)
        m = len(uu)
        n = np.bincount(inv, minlength=m).astype(np.int64)
        sums = {}
        for name, vals in (("sx", x), ("sy", y), ("sxy", x * y), ("sxx", x * x)):
            acc = np.zeros(m, dtype=np.int64)
            np.add.at(acc, inv, vals)
            sums[name] = acc
        return pa.table(
            {
                "user_id": pa.array(uu),
                "n": pa.array(n),
                "sx": pa.array(sums["sx"]),
                "sy": pa.array(sums["sy"]),
                "sxy": pa.array(sums["sxy"]),
                "sxx": pa.array(sums["sxx"]),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["n"], dtype=np.int64)
        sx = np.asarray(batch["sx"], dtype=np.int64)
        sy = np.asarray(batch["sy"], dtype=np.int64)
        sxy = np.asarray(batch["sxy"], dtype=np.int64)
        sxx = np.asarray(batch["sxx"], dtype=np.int64)
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        keep = den > 0
        return pa.table(
            {
                "user_id": batch["user_id"].filter(pa.array(keep)),
                "n": pa.array(n[keep]),
                "num": pa.array(num[keep]),
                "den": pa.array(den[keep]),
            }
        )

    from .group_collect import bucketed_sum

    return bucketed_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id"], ["n", "sx", "sy", "sxy", "sxx"],
    ).map_batches(finish, batch_format="pyarrow")


def events_value_corr(sf_dir: str) -> ray.data.Dataset:
    """Per-event-type Pearson correlation between the monetary ``value``
    and the ``props`` integer field, emitted as exact integer components:

        num  = n*sum(x*y) - sum(x)*sum(y)      (x = value in cents)
        denx = n*sum(x*x) - sum(x)^2           (y = props k)
        deny = n*sum(y*y) - sum(y)^2

    r = num / sqrt(denx*deny) — the division and sqrt are left to the
    consumer so the distributed result hashes exactly against the SQL
    twin (CORR() itself is float and summation-order sensitive). value
    carries exactly 2 decimals, so cents are exact int64; overflow bound
    n^2 * max_cents^2 < 9e18 means ~50 M rows/group at value <= $600 —
    beyond that, promote to float AFTER the exact int64 partials (they
    stay mergeable) or use the standard two-pass centered form.

    Shape: per-batch (type, n, sx, sy, sxy, sxx, syy) partials -> one
    types-sized groupby sum -> vectorized final map; groups whose either
    variance is zero are dropped on both engines (r undefined).
    """
    from ray.data.aggregate import Sum

    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_type", "value", "props"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        x = np.round(np.asarray(batch["value"], dtype=np.float64) * 100).astype(
            np.int64
        )
        kv = pc.cast(
            pc.struct_field(
                pc.extract_regex(batch["props"], r'"k": (?P<k>\d+)'), "k"
            ),
            pa.int64(),
        )
        has = ~np.asarray(pc.is_null(kv), dtype=bool)
        y = np.asarray(pc.fill_null(kv, 0), dtype=np.int64)
        et = np.asarray(batch["event_type"].to_pandas())[has]
        x, y = x[has], y[has]
        uu, inv = np.unique(et, return_inverse=True)
        m = len(uu)
        n = np.bincount(inv, minlength=m).astype(np.int64)
        cols = {"event_type": pa.array(uu.astype(str)), "n": pa.array(n)}
        for name, vals in (
            ("sx", x), ("sy", y), ("sxy", x * y), ("sxx", x * x), ("syy", y * y)
        ):
            acc = np.zeros(m, dtype=np.int64)
            np.add.at(acc, inv, vals)
            cols[name] = pa.array(acc)
        return pa.table(cols)

    def finish(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["n"], dtype=np.int64)
        sx = np.asarray(batch["sx"], dtype=np.int64)
        sy = np.asarray(batch["sy"], dtype=np.int64)
        sxy = np.asarray(batch["sxy"], dtype=np.int64)
        sxx = np.asarray(batch["sxx"], dtype=np.int64)
        syy = np.asarray(batch["syy"], dtype=np.int64)
        num = n * sxy - sx * sy
        denx = n * sxx - sx * sx
        deny = n * syy - sy * sy
        keep = (denx > 0) & (deny > 0)
        return pa.table(
            {
                "event_type": batch["event_type"].filter(pa.array(keep)),
                "n": pa.array(n[keep]),
                "num": pa.array(num[keep]),
                "denx": pa.array(denx[keep]),
                "deny": pa.array(deny[keep]),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


def events_gap_hours(sf_dir: str, num_buckets: int = 32) -> ray.data.Dataset:
    """Per-user activity-coverage gaps: over the user's [first, last] event
    hour span, how many whole UTC hours saw no event — the sensor-outage /
    tracking-gap primitive. All-integer (hour = epoch_us // 3.6e9), so the
    result hashes exactly.

    Shape: per-batch dedup to unique (user, hour) pairs (the big win — the
    exchange carries at most users x active-hours rows, not events), then
    one user-bucketed collect computes distinct/min/max per user in one
    vectorized pass. Output: (user_id, active_hours, span_hours,
    gap_hours)."""
    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    US_PER_HOUR = np.int64(3_600_000_000)

    def pairs(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["user_id"], dtype=np.int64)
        hr = (
            np.asarray(batch["ts"], dtype="datetime64[us]").astype(np.int64)
            // US_PER_HOUR
        )
        uniq = np.unique(np.stack([u, hr], axis=1), axis=0)
        b = (
            np.abs((uniq[:, 0] * np.int64(-7046029254386353131)) >> np.int64(32))
            % num_buckets
        )
        return pa.table(
            {
                "user_id": pa.array(uniq[:, 0]),
                "hr": pa.array(uniq[:, 1]),
                "__bucket": pa.array(b),
            }
        )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        u = np.asarray(tbl["user_id"], dtype=np.int64)
        hr = np.asarray(tbl["hr"], dtype=np.int64)
        uniq = np.unique(np.stack([u, hr], axis=1), axis=0)  # cross-batch dedup
        uu, starts = np.unique(uniq[:, 0], return_index=True)
        ends = np.append(starts[1:], len(uniq))
        active = (ends - starts).astype(np.int64)
        # pairs are sorted by (user, hour): segment min/max are the bounds
        span = uniq[ends - 1, 1] - uniq[starts, 1] + 1
        return pa.table(
            {
                "user_id": pa.array(uu),
                "active_hours": pa.array(active),
                "span_hours": pa.array(span),
                "gap_hours": pa.array(span - active),
            }
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def events_peak_hour(sf_dir: str) -> ray.data.Dataset:
    """Per event type, the UTC hour-of-day with the most events — the
    peak-load / scheduling primitive, with a deterministic tie-break
    (smallest hour). All-integer.

    Shape: per-batch (type, hour) count partials -> one <= types x 24-key
    groupby -> per-type vectorized argmax in map_groups. Output:
    (event_type, peak_hour, n_events)."""
    from ray.data.aggregate import Sum

    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
    US_PER_HOUR = np.int64(3_600_000_000)

    def partial(batch: pa.Table) -> pa.Table:
        hr = (
            np.asarray(batch["ts"], dtype="datetime64[us]").astype(np.int64)
            // US_PER_HOUR
        ) % np.int64(24)
        et = np.asarray(batch["event_type"].to_pandas())
        key = pd.DataFrame({"event_type": et, "hour": hr})
        g = key.groupby(["event_type", "hour"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "event_type": pa.array(g["event_type"].astype(str)),
                "hour": pa.array(g["hour"].to_numpy().astype(np.int64)),
                "n": pa.array(g["n"].to_numpy().astype(np.int64)),
            }
        )

    def peak(tbl: pa.Table) -> pa.Table:
        n = np.asarray(tbl["n"], dtype=np.int64)
        hr = np.asarray(tbl["hour"], dtype=np.int64)
        best = np.lexsort((hr, -n))[0]
        return pa.table(
            {
                "event_type": tbl["event_type"].slice(best, 1),
                "peak_hour": pa.array([hr[best]]),
                "n_events": pa.array([n[best]]),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Sum("n", alias_name="n"))
        .groupby("event_type")
        .map_groups(peak, batch_format="pyarrow")
    )


def lang_confusion(sf_dir: str, concurrency: int | None = None) -> ray.data.Dataset:
    """Confusion matrix of the stored ``lang`` label vs the marker-heuristic
    language ID — the label-quality audit a corpus-cleaning pipeline runs
    before trusting either column. Output: (lang, lang_pred, n).

    Shape: the regexes compile once per actor (ST6 pattern, shared with
    TextStats); per-batch (lang, pred) count partials; final groupby over
    <= |langs|^2 keys. Text never leaves the scan."""
    from ray.data.aggregate import Sum

    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["lang", "text"])

    class Confusion:
        def __init__(self):
            import re

            self.marker_res = {
                lang: [re.compile(rf"\b{m}\b") for m in ms]
                for lang, ms in MARKERS.items()
            }

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = pd.Series(batch["text"].to_pylist(), dtype=object)
            counts = np.zeros((len(texts), len(LANGS)), dtype=np.int64)
            for li, lang in enumerate(LANGS):
                for rx in self.marker_res[lang]:
                    counts[:, li] += texts.str.count(rx).to_numpy(dtype=np.int64)
            pred = np.array(LANGS, dtype=object)[np.argmax(counts, axis=1)]
            truth = np.asarray(batch["lang"].to_pandas(), dtype=object)
            g = (
                pd.DataFrame({"lang": truth, "lang_pred": pred})
                .groupby(["lang", "lang_pred"], sort=False)
                .size()
                .reset_index(name="n")
            )
            return pa.table(
                {
                    "lang": pa.array(g["lang"].astype(str)),
                    "lang_pred": pa.array(g["lang_pred"].astype(str)),
                    "n": pa.array(g["n"].to_numpy().astype(np.int64)),
                }
            )

    if concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        # autoscaling pool, min 1: a fixed min > 1 can reserve the CPUs the
        # read stage needs (or exceed the block count) and stall the
        # pipeline — the hazard analyze_text/decode_features document
        concurrency = (1, max(1, ncpu // 2))
    return (
        ds.map_batches(Confusion, batch_format="pyarrow", concurrency=concurrency)
        .groupby(["lang", "lang_pred"])
        .aggregate(Sum("n", alias_name="n"))
    )


def dataset_split_assign(
    sf_dir: str, train_permille: int = 800, val_permille: int = 100
) -> ray.data.Dataset:
    """Deterministic train/val/test split manifest: every document is routed
    by the same coordination-free multiplicative hash the samplers use
    (hash(doc_id) mod 1000 -> train < 800 <= val < 900 <= test), and the
    operator returns the per-(split, lang) census — the leakage-proof split
    audit a training pipeline records next to its shards. The assignment is
    a pure function of doc_id: reruns, different cluster sizes and the SQL
    oracle all agree row-for-row, and membership never needs a lookup table.

    Shape: one streaming pass of (split, lang) count partials -> a <= 15-key
    groupby. Output: (split, lang, n_docs, sum_chars)."""
    from ray.data.aggregate import Sum

    from ..sources.read import read_parquet_sized

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    names = np.array(["train", "val", "test"], dtype=object)

    def partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.uint64)
        h = ((ids % _SAMPLE_MOD) * _SAMPLE_MUL) % _SAMPLE_MOD % np.uint64(1000)
        split = np.where(
            h < train_permille, 0, np.where(h < train_permille + val_permille, 1, 2)
        )
        g = (
            pd.DataFrame(
                {
                    "split": names[split],
                    "lang": np.asarray(batch["lang"].to_pylist(), dtype=object),
                    "chars": np.asarray(batch["n_chars"], dtype=np.int64),
                }
            )
            .groupby(["split", "lang"], sort=False)
            .agg(n=("chars", "size"), sc=("chars", "sum"))
            .reset_index()
        )
        return pa.table(
            {
                "split": pa.array(g["split"].astype(str)),
                "lang": pa.array(g["lang"].astype(str)),
                "n": pa.array(g["n"].to_numpy().astype(np.int64)),
                "sc": pa.array(g["sc"].to_numpy().astype(np.int64)),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["split", "lang"])
        .aggregate(Sum("n", alias_name="n_docs"), Sum("sc", alias_name="sum_chars"))
    )


def events_gap_median(sf_dir: str, num_buckets: int = 32) -> ray.data.Dataset:
    """Per-user EXACT lower-median inter-event gap in whole microseconds —
    the bot/scripted-traffic signal (humans have ragged gaps; automation is
    metronomic). All-integer: the median is the k-th smallest gap VALUE
    (k = (n-1)//2), well-defined under ties, so the result hashes exactly.

    Shape: the family's one hash(user)-bucket shuffle; per bucket ONE
    lexsort in (user, ts, event_id) order yields the gaps via a shifted
    diff, a SECOND lexsort in (user, gap) order makes every user's median a
    direct gather at segment_start + (len-1)//2 — a per-group order
    statistic with zero per-group Python. Users with < 2 events are absent
    on both engines. Output: (user_id, n_gaps, median_gap_us)."""
    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["user_id"], dtype=np.int64)
        b = np.abs((u * np.int64(-7046029254386353131)) >> np.int64(32)) % num_buckets
        return pa.table(
            {
                "event_id": batch["event_id"],
                "ts": batch["ts"],
                "user_id": batch["user_id"],
                "__bucket": pa.array(b),
            }
        )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        u = np.asarray(tbl["user_id"], dtype=np.int64)
        eid = np.asarray(tbl["event_id"], dtype=np.int64)
        t = np.asarray(tbl["ts"], dtype="datetime64[us]").astype(np.int64)
        order = np.lexsort((eid, t, u))
        u, t = u[order], t[order]
        n = len(u)
        if n < 2:
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "n_gaps": pa.array([], type=pa.int64()),
                    "median_gap_us": pa.array([], type=pa.int64()),
                }
            )
        same = u[1:] == u[:-1]
        gu = u[1:][same]
        gap = (t[1:] - t[:-1])[same]
        if len(gu) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "n_gaps": pa.array([], type=pa.int64()),
                    "median_gap_us": pa.array([], type=pa.int64()),
                }
            )
        o2 = np.lexsort((gap, gu))
        gu, gap = gu[o2], gap[o2]
        starts = np.flatnonzero(np.r_[True, gu[1:] != gu[:-1]])
        lens = np.diff(np.append(starts, len(gu)))
        med_idx = starts + (lens - 1) // 2
        return pa.table(
            {
                "user_id": pa.array(gu[starts]),
                "n_gaps": pa.array(lens.astype(np.int64)),
                "median_gap_us": pa.array(gap[med_idx]),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def events_burstiness(sf_dir: str) -> ray.data.Dataset:
    """Per-user burstiness as exact Fano-factor components over hourly
    activity: for each user, the count of ACTIVE hours plus the sum and
    sum-of-squares of per-hour event counts — Fano = variance/mean derives
    as (h*sq - s*s) / (h*s) downstream; a metronomic bot has Fano ~ 0 over
    its active hours while organic traffic is over-dispersed. Complements
    events_gap_median (gap-based) with the count-based dispersion signal.
    All-integer: no float crosses the engine boundary.

    Shape: per-batch (user, hour) count partials -> ONE user-bucketed
    vectorized collect (all of a user's hour partials share the bucket, so
    the per-hour merge AND the per-user moments happen in the same task).
    Output: (user_id, n_hours, sum_c, sum_c2)."""
    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    US_PER_HOUR = np.int64(3_600_000_000)
    num_buckets = 32

    def partial(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["user_id"], dtype=np.int64)
        hr = (
            np.asarray(batch["ts"], dtype="datetime64[us]").astype(np.int64)
            // US_PER_HOUR
        )
        pairs = np.stack([u, hr], axis=1)
        uniq, counts = np.unique(pairs, axis=0, return_counts=True)
        b = (
            np.abs((uniq[:, 0] * np.int64(-7046029254386353131)) >> np.int64(32))
            % num_buckets
        )
        return pa.table(
            {
                "user_id": pa.array(uniq[:, 0]),
                "hr": pa.array(uniq[:, 1]),
                "c": pa.array(counts.astype(np.int64)),
                "__bucket": pa.array(b),
            }
        )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        u = np.asarray(tbl["user_id"], dtype=np.int64)
        hr = np.asarray(tbl["hr"], dtype=np.int64)
        c = np.asarray(tbl["c"], dtype=np.int64)
        order = np.lexsort((hr, u))
        u, hr, c = u[order], hr[order], c[order]
        first = np.ones(len(u), dtype=bool)
        first[1:] = (u[1:] != u[:-1]) | (hr[1:] != hr[:-1])
        starts = np.flatnonzero(first)
        ch = np.add.reduceat(c, starts)  # merged per-(user, hour) counts
        uh = u[starts]
        ustarts = np.flatnonzero(np.r_[True, uh[1:] != uh[:-1]])
        n_hours = np.diff(np.append(ustarts, len(uh))).astype(np.int64)
        sum_c = np.add.reduceat(ch, ustarts)
        sum_c2 = np.add.reduceat(ch * ch, ustarts)
        return pa.table(
            {
                "user_id": pa.array(uh[ustarts]),
                "n_hours": pa.array(n_hours),
                "sum_c": pa.array(sum_c),
                "sum_c2": pa.array(sum_c2),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def term_cooccurrence(sf_dir: str, k: int = 30) -> ray.data.Dataset:
    """Document co-occurrence counts between the top-k DF terms, with the
    marginals a PMI / association-score consumer needs: for every ordered
    pair (term_a < term_b) of the top-k vocabulary, the number of documents
    containing BOTH, plus each term's global document frequency and the
    corpus size — PMI = log(n_ab * n_docs / (df_a * df_b)) downstream; the
    operator ships only exact integers.

    Shape: the top-k vocabulary comes from the existing top_terms_df cut
    (deterministic df-desc/token-asc tie-break, shared with its oracle) and
    BROADCASTS (k strings); each batch builds its docs x k membership
    matrix and contributes ONE k x k co-occurrence partial (a boolean
    matmul) — the shuffle moves k^2-row partials, never doc-term pairs.
    A <= k^2-key generic groupby sums (bounded, so the generic aggregate is
    the right tier here). Output: (term_a, term_b, n_ab, df_a, df_b,
    n_docs), pairs with n_ab = 0 omitted on both engines."""
    from ray.data.aggregate import Sum

    top = top_terms_df(sf_dir, k)  # pandas (token, df), deterministic order
    vocab = top["token"].to_numpy()
    dfs = top["df"].to_numpy().astype(np.int64)
    order = np.argsort(vocab)  # lexicographic, matches SQL binary collation
    vocab_sorted = vocab[order]
    dfs_sorted = dfs[order]
    vocab_ref = ray.put(vocab_sorted)
    n_docs = int(_docs(sf_dir).count())

    def partial(batch: pa.Table) -> pa.Table:
        from ..state.broadcast import get as _bget

        vs = _bget(vocab_ref)
        kk = len(vs)
        flat, doc_of = _doc_tokens(batch["text"].to_pandas())
        if len(flat) == 0:
            return pa.table(
                {"ia": pa.array([], type=pa.int64()),
                 "ib": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64())}
            )
        pos = np.searchsorted(vs, flat)
        pos_c = np.clip(pos, 0, kk - 1)
        hit = vs[pos_c] == flat
        n_rows = int(doc_of.max()) + 1 if len(doc_of) else 0
        m = np.zeros((n_rows, kk), dtype=np.int64)
        m[doc_of[hit], pos_c[hit]] = 1
        co = m.T @ m  # k x k integer co-occurrence partial
        ia, ib = np.triu_indices(kk, k=1)
        n = co[ia, ib]
        keep = n > 0
        return pa.table(
            {
                "ia": pa.array(ia[keep].astype(np.int64)),
                "ib": pa.array(ib[keep].astype(np.int64)),
                "n": pa.array(n[keep]),
            }
        )

    agg = (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["ia", "ib"])
        .aggregate(Sum("n", alias_name="n_ab"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        ia = np.asarray(batch["ia"], dtype=np.int64)
        ib = np.asarray(batch["ib"], dtype=np.int64)
        return pa.table(
            {
                "term_a": pa.array(vocab_sorted[ia].astype(str)),
                "term_b": pa.array(vocab_sorted[ib].astype(str)),
                "n_ab": batch["n_ab"],
                "df_a": pa.array(dfs_sorted[ia]),
                "df_b": pa.array(dfs_sorted[ib]),
                "n_docs": pa.array(np.full(len(ia), n_docs, dtype=np.int64)),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


PROFILE_COLUMNS = ("lang", "source", "n_chars")


def profile_documents(sf_dir: str) -> "pd.DataFrame":
    """Table profiling (the distributed ANALYZE primitive): per column, row
    count, null count, EXACT distinct count, and min/max (as strings, one
    uniform output schema). Profiling is the step every ingestion pipeline
    runs before schema decisions; here it doubles as a schema-generic
    partials demo.

    Shape: one pass; each batch emits per-column partials carrying the
    batch's counts and its DISTINCT value set (these columns are
    bounded-vocabulary by contract — lang/source are categorical, n_chars a
    bounded int; for unbounded columns swap the exact set for a sketch, the
    HLL of stages/sketch.py). Driver merges vocabulary-sized partials.
    Output: (column, n, n_null, n_distinct, min_v, max_v)."""
    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=list(PROFILE_COLUMNS)
    )

    def partial(batch: pa.Table) -> pa.Table:
        cols, ns, nulls, vals = [], [], [], []
        for c in PROFILE_COLUMNS:
            arr = batch[c]
            cols.append(c)
            ns.append(len(arr))
            nulls.append(arr.null_count)
            uniq = pc.unique(pc.drop_null(arr))
            vals.append([str(x) for x in uniq.to_pylist()])
        return pa.table(
            {
                "column": pa.array(cols, type=pa.string()),
                "n": pa.array(np.asarray(ns, dtype=np.int64)),
                "n_null": pa.array(np.asarray(nulls, dtype=np.int64)),
                "vals": pa.array(vals, type=pa.list_(pa.string())),
            }
        )

    agg: dict[str, list] = {c: [0, 0, set()] for c in PROFILE_COLUMNS}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for c, n, nn, vs in zip(
            b["column"].to_pylist(), b["n"].to_pylist(),
            b["n_null"].to_pylist(), b["vals"].to_pylist(),
        ):
            agg[c][0] += int(n)
            agg[c][1] += int(nn)
            agg[c][2].update(vs)

    rows = []
    for c in PROFILE_COLUMNS:
        n, nn, vs = agg[c]
        # min/max over the ORIGINAL domain: numeric columns compare
        # numerically then render as strings (string-min of n_chars would
        # be lexicographic and wrong)
        if c == "n_chars":
            nums = sorted(int(v) for v in vs)
            mn, mx = (str(nums[0]), str(nums[-1])) if nums else (None, None)
        else:
            sv = sorted(vs)
            mn, mx = (sv[0], sv[-1]) if sv else (None, None)
        rows.append((c, n, nn, len(vs), mn, mx))
    return pd.DataFrame(
        rows, columns=["column", "n", "n_null", "n_distinct", "min_v", "max_v"]
    )


def events_session_assignment(
    sf_dir: str, gap_us: int = 1_800_000_000, num_buckets: int = 32
) -> ray.data.Dataset:
    """Per-EVENT session labeling (the assignment form of sessionization —
    events_sessions returns the per-session summary): each event gets its
    user's 1-based session ordinal under the 30-minute-gap rule. The label
    every downstream interval join keys on.

    Shape: one hash(user)-bucket shuffle; per bucket a lexsort, a gap
    compare, and a segmented cumsum — all vectorized. Output:
    (event_id, user_id, session_idx)."""
    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["user_id"], dtype=np.int64)
        b = np.abs((u * np.int64(-7046029254386353131)) >> np.int64(32)) % num_buckets
        return batch.append_column("__bucket", pa.array(b))

    def per_bucket(tbl: pa.Table) -> pa.Table:
        u = np.asarray(tbl["user_id"], dtype=np.int64)
        eid = np.asarray(tbl["event_id"], dtype=np.int64)
        ts = np.asarray(tbl["ts"], dtype="datetime64[us]").astype(np.int64)
        order = np.lexsort((eid, ts, u))
        u, eid, ts = u[order], eid[order], ts[order]
        n = len(u)
        new_sess = np.ones(n, dtype=np.int64)
        if n > 1:
            same = u[1:] == u[:-1]
            new_sess[1:] = np.where(same & (ts[1:] - ts[:-1] <= gap_us), 0, 1)
        run = np.cumsum(new_sess)
        # per-user reset: subtract the running total just before each user's
        # first row (nondecreasing, so a forward max carries the base)
        starts = np.zeros(n, dtype=bool)
        starts[0] = True
        if n > 1:
            starts[1:] = u[1:] != u[:-1]
        base = np.where(starts, run - new_sess, 0)
        np.maximum.accumulate(base, out=base)
        return pa.table(
            {
                "event_id": pa.array(eid),
                "user_id": pa.array(u),
                "session_idx": pa.array(run - base),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def events_dau_wau(sf_dir: str) -> "pd.DataFrame":
    """DAU / trailing-7-day WAU per active day — the windowed DISTINCT
    count, which does NOT decompose like a sum: a user active twice in a
    window must count once. Exact plan: global-distinct (user, day) pairs
    (one groupby of two int64 columns), DAU as a day-keyed count, WAU by
    exploding each pair to its 7 covered window-days and distinct-counting
    again — volume is bounded by 7x the distinct pairs, never 7x the
    events. Day tables are calendar-bounded, so the final join is
    driver-side. Output: (day [int days since epoch], dau, wau)."""
    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def pairs_partial(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["user_id"], dtype=np.int64)
        day = (
            np.asarray(batch["ts"], dtype="datetime64[us]")
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        df = pd.DataFrame({"user_id": u, "day": day}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    from .group_collect import bucketed_distinct

    # global distinct via the bucketed reduce: (user, day) cardinality is
    # ~users x days, far past the generic aggregate's comfort zone
    pairs = bucketed_distinct(
        ds.map_batches(pairs_partial, batch_format="pyarrow"), ["user_id", "day"]
    ).materialize()  # feeds both the DAU and WAU plans

    dau = (
        pairs.groupby("day").count().to_pandas().rename(columns={"count()": "dau"})
    )

    def widen(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["user_id"], dtype=np.int64)
        d = np.asarray(batch["day"], dtype=np.int64)
        n = len(u)
        return pa.table(
            {
                "user_id": pa.array(np.repeat(u, 7)),
                "wday": pa.array(
                    (d[:, None] + np.arange(7, dtype=np.int64)[None, :]).ravel()
                ),
            }
        )

    wau = (
        bucketed_distinct(
            pairs.map_batches(widen, batch_format="pyarrow"), ["user_id", "wday"]
        )
        .select_columns(["wday"])
        .groupby("wday")
        .count()
        .to_pandas()
        .rename(columns={"count()": "wau", "wday": "day"})
    )
    out = dau.merge(wau, on="day", how="left").sort_values("day").reset_index(drop=True)
    return out.astype({"day": np.int64, "dau": np.int64, "wau": np.int64})


def events_type_transitions(sf_dir: str, num_buckets: int = 32) -> ray.data.Dataset:
    """First-order Markov transition counts over each user's event-type
    sequence ((ts, event_id) order): how often type A is immediately
    followed by type B — the sequence-mining / next-action primitive.

    Shape: the family's one hash(user)-bucket shuffle; per bucket a lexsort
    and ONE shifted compare emit (prev, next) pair partials (dictionary-
    encoded: |types|^2 keys max per bucket), then a tiny pair-keyed
    groupby-sum. Output: (prev_type, next_type, n)."""
    from ray.data.aggregate import Sum

    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["user_id"], dtype=np.int64)
        b = np.abs((u * np.int64(-7046029254386353131)) >> np.int64(32)) % num_buckets
        return batch.append_column("__bucket", pa.array(b))

    def per_bucket(tbl: pa.Table) -> pa.Table:
        u = np.asarray(tbl["user_id"], dtype=np.int64)
        eid = np.asarray(tbl["event_id"], dtype=np.int64)
        ts = np.asarray(tbl["ts"], dtype="datetime64[us]").astype(np.int64)
        et = np.asarray(tbl["event_type"], dtype=object)
        order = np.lexsort((eid, ts, u))
        u, et = u[order], et[order]
        if len(u) < 2:
            return pa.table(
                {"prev_type": pa.array([], type=pa.string()),
                 "next_type": pa.array([], type=pa.string()),
                 "n": pa.array([], type=pa.int64())}
            )
        same = u[1:] == u[:-1]
        df = pd.DataFrame(
            {"prev_type": et[:-1][same], "next_type": et[1:][same]}
        )
        g = df.groupby(["prev_type", "next_type"], sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby(["prev_type", "next_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


def events_debounce(
    sf_dir: str, gap_us: int = 5_000_000, num_buckets: int = 32
) -> ray.data.Dataset:
    """Burst-dedup (debounce) census: per event type, how many events
    survive dropping every event that follows its per-(user, type)
    predecessor by <= ``gap_us`` (double-click suppression / sensor-bounce
    removal — a standard event-stream cleaning op). Predecessor = LAG over
    (ts, event_id) order, so exact-tie timestamps drop deterministically
    and the SQL twin is the classic LAG window.

    Shape: one user-bucketed shuffle (a bucket holds every row of its
    users, so each (user, type) chain is complete); per bucket the chain
    scan is a lexsort + one vectorized diff — no Python loops; only
    (type, counts) partials leave. Output: (event_type, n_total, n_kept)."""
    from ray.data.aggregate import Sum

    from ..sources.read import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )

    def bucket(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["user_id"], dtype=np.int64)
        b = np.abs((u * np.int64(-7046029254386353131)) >> np.int64(32)) % num_buckets
        return pa.table(
            {
                "user_id": pa.array(u),
                "event_id": pa.array(np.asarray(batch["event_id"], dtype=np.int64)),
                "ts_us": pa.array(
                    np.asarray(batch["ts"], dtype="datetime64[us]").astype(np.int64)
                ),
                "event_type": batch["event_type"],
                "__bucket": pa.array(b),
            }
        )

    def per_bucket(tbl: pa.Table) -> pa.Table:
        u = np.asarray(tbl["user_id"], dtype=np.int64)
        ts = np.asarray(tbl["ts_us"], dtype=np.int64)
        eid = np.asarray(tbl["event_id"], dtype=np.int64)
        types, code = np.unique(
            np.asarray(tbl["event_type"]).astype(str), return_inverse=True
        )
        order = np.lexsort((eid, ts, code, u))
        us, cs, tss = u[order], code[order], ts[order]
        new_chain = np.ones(len(us), dtype=bool)
        new_chain[1:] = (us[1:] != us[:-1]) | (cs[1:] != cs[:-1])
        kept = new_chain.copy()
        kept[1:] |= (tss[1:] - tss[:-1]) > gap_us
        n_total = np.bincount(cs, minlength=len(types)).astype(np.int64)
        n_kept = np.zeros(len(types), dtype=np.int64)
        np.add.at(n_kept, cs[kept], 1)
        return pa.table(
            {
                "event_type": pa.array(types.astype(object), type=pa.string()),
                "t": pa.array(n_total),
                "k": pa.array(n_kept),
            }
        )

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("t", alias_name="n_total"), Sum("k", alias_name="n_kept"))
    )
