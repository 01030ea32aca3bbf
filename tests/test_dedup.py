"""Dedup operator semantics: exact kept-set, minhash/simhash recall+precision."""

import numpy as np
import pandas as pd
import pytest

from simple_osm_queries_ray.sources.dup_docs import (
    EXACT_OFFSET,
    NEAR_OFFSET,
    dup_documents,
)
from simple_osm_queries_ray.stages.dedup import (
    exact_dedup_keep_ids,
    jaccard,
    minhash_lsh_pairs,
    simhash_pairs,
    simhash_signatures,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dup_df():
    return dup_documents(SF).to_pandas()


def test_dup_documents_shape(dup_df):
    base = dup_df[dup_df.id < EXACT_OFFSET]
    exact = dup_df[(dup_df.id >= EXACT_OFFSET) & (dup_df.id < NEAR_OFFSET)]
    near = dup_df[dup_df.id >= NEAR_OFFSET]
    assert len(exact) == (base.id % 10 == 0).sum()
    assert len(near) == (base.id % 10 == 5).sum()
    # near copies differ from their source by the last two words
    src = base.set_index("id")["text"]
    for row in near.itertuples():
        orig = src[row.id - NEAR_OFFSET]
        assert orig.startswith(row.text)
        assert len(orig.split()) - len(row.text.split()) == 2


def test_exact_dedup(dup_df):
    kept = set(exact_dedup_keep_ids(dup_documents(SF)).to_pandas()["id"])
    exp = set(dup_df.groupby("text")["id"].min())
    assert kept == exp
    # every exact duplicate got removed, i.e. no id >= EXACT_OFFSET that has
    # a verbatim twin below it survives
    assert not any(EXACT_OFFSET <= i < NEAR_OFFSET for i in kept)


def test_minhash_pairs(dup_df):
    got = minhash_lsh_pairs(dup_documents(SF), threshold=0.5).to_pandas()
    got_pairs = {tuple(r) for r in got[["id_a", "id_b"]].itertuples(index=False)}
    texts = dup_df.set_index("id")["text"]
    # precision: every reported pair truly has Jaccard >= 0.5
    for a, b in got_pairs:
        assert jaccard(texts[a], texts[b]) >= 0.5, (a, b)
    # recall on planted pairs: exact copies always collide
    planted_exact = {
        (i, i + EXACT_OFFSET) for i in dup_df.id[dup_df.id < EXACT_OFFSET] if i % 10 == 0
    }
    assert planted_exact <= got_pairs
    # planted near-dups (2 words clipped) that pass the true-Jaccard bar must
    # be found too — LSH with 8x8 bands at J>=0.9 has collision prob ~1-1e-7
    for i in dup_df.id[dup_df.id < EXACT_OFFSET]:
        if i % 10 == 5:
            j = jaccard(texts[i], texts[i + NEAR_OFFSET])
            if j >= 0.9:
                assert (i, i + NEAR_OFFSET) in got_pairs, (i, j)


def test_simhash_pairs(dup_df):
    got = simhash_pairs(dup_documents(SF), max_hamming=3).to_pandas()
    got_pairs = {tuple(r) for r in got[["id_a", "id_b"]].itertuples(index=False)}
    texts = dup_df.set_index("id")["text"]
    # precision: reported pairs have true hamming distance <= 3
    sigs = simhash_signatures(pd.Series(texts.values, dtype=object))
    sig_by_id = dict(zip(texts.index, sigs))
    for a, b in got_pairs:
        d = bin(int(sig_by_id[a]) ^ int(sig_by_id[b])).count("1")
        assert d <= 3, (a, b, d)
    # recall: exact copies (distance 0) always found
    planted_exact = {
        (i, i + EXACT_OFFSET) for i in dup_df.id[dup_df.id < EXACT_OFFSET] if i % 10 == 0
    }
    assert planted_exact <= got_pairs


def test_connected_components_chain():
    """Hash-min propagation reaches a fixpoint across multi-hop chains."""
    import pyarrow as pa
    import ray.data

    from simple_osm_queries_ray.stages.dedup import connected_components

    ids = ray.data.from_arrow(pa.table({"id": list(range(10))}))
    # chain 4-3-2-1-0 (diameter 4), pair 6-9, singletons 5,7,8
    pairs = ray.data.from_arrow(
        pa.table({"id_a": [3, 2, 1, 0, 6], "id_b": [4, 3, 2, 1, 9]})
    )
    got = dict(
        connected_components(ids, pairs).to_pandas()[["id", "group_id"]].values.tolist()
    )
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 5, 6: 6, 7: 7, 8: 8, 9: 6}


def test_dedup_groups_planted(dup_df):
    from simple_osm_queries_ray.stages.dedup import dedup_groups

    got = dedup_groups(dup_documents(SF), threshold=0.5).to_pandas()
    g = dict(got[["id", "group_id"]].values.tolist())
    # every exact copy resolves to its base id's group
    for i in dup_df.id[dup_df.id < EXACT_OFFSET]:
        if i % 10 == 0:
            assert g[i + EXACT_OFFSET] == g[i]
    assert len(g) == len(dup_df)


def test_incremental_sessions_equals_batch():
    """Micro-batch sessionization with cross-slice carry equals the batch
    result exactly (ints) / to float tolerance (value sums)."""
    import numpy as np

    from simple_osm_queries_ray.stages.text import (
        incremental_sessions,
        session_window_events,
    )

    SF = "/root/testdata/sf0.001"
    inc = incremental_sessions(SF, n_chunks=5).sort_values(
        ["user_id", "session_start"]).reset_index(drop=True)
    bat = session_window_events(SF).to_pandas().sort_values(
        ["user_id", "session_start"]).reset_index(drop=True)
    assert len(inc) == len(bat)
    assert (inc["user_id"].to_numpy() == bat["user_id"].to_numpy()).all()
    assert (inc["session_start"].to_numpy() == bat["session_start"].to_numpy()).all()
    assert (inc["n"].to_numpy() == bat["n"].to_numpy()).all()
    assert np.allclose(inc["value_sum"], bat["value_sum"], atol=1e-5)


def test_hll_distinct_users_accuracy_and_mergeability():
    import numpy as np

    from simple_osm_queries_ray.stages.text import (
        _hll_registers,
        hll_distinct_users,
        hll_estimate,
    )

    SF = "/root/testdata/sf0.001"
    import pyarrow.parquet as pq

    exact = len(np.unique(pq.read_table(f"{SF}/events.parquet", columns=["user_id"])["user_id"]))
    out = hll_distinct_users(SF, p=12)
    est = int(out["estimate"].iloc[0])
    # standard error ~1.04/sqrt(4096) = 1.6%; allow 3 sigma + small-N slack
    assert abs(est - exact) / exact < 0.08, (est, exact)

    # mergeability: sketch(a ∪ b) == max(sketch(a), sketch(b)) exactly
    rng = np.random.default_rng(7)
    a = rng.integers(0, 10_000, 5_000)
    b = rng.integers(5_000, 15_000, 5_000)
    u = np.concatenate([a, b])
    ra, rb, ru = (_hll_registers(np.unique(x), 12) for x in (a, b, u))
    assert (np.maximum(ra, rb) == ru).all()
    assert hll_estimate(ru) > 0


def test_bloom_filter_no_false_negatives_and_low_fp():
    import numpy as np

    from simple_osm_queries_ray.functions.bloom import BloomFilter

    rng = np.random.default_rng(3)
    present = rng.choice(10_000_000, 50_000, replace=False).astype(np.int64)
    absent = np.setdiff1d(
        rng.choice(10_000_000, 100_000, replace=False).astype(np.int64), present
    )
    f = BloomFilter()
    f.add(present)
    assert f.might_contain(present).all()  # no false negatives, ever
    fp = f.might_contain(absent).mean()
    assert fp < 0.02, fp  # 1M bits / 50k keys, k=5 -> well under 1%

    # mergeability: or-of-partials == single build
    f1, f2 = BloomFilter(), BloomFilter()
    f1.add(present[:25_000]); f2.add(present[25_000:])
    assert (f1.merge(f2).bits == f.bits).all()


def test_bloom_prefilter_preserves_q5():
    """q5 with the bloom prefilter on the lineitem probe side returns the
    identical result (no false negatives) while dropping probe rows."""
    from simple_osm_queries_ray.pipelines.relational import q5_local_supplier_revenue

    SF = "/root/testdata/sf0.001"
    base = q5_local_supplier_revenue(SF).to_pandas().sort_values("n_name").reset_index(drop=True)
    opt = (
        q5_local_supplier_revenue(SF, bloom_prefilter=True)
        .to_pandas().sort_values("n_name").reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(base, opt)


def test_repetition_stats_matches_python_sets():
    """repetition_stats == per-doc Python set count, incl. the non-ASCII
    per-doc fallback, short-doc dropping (< n chars -> no row) and sliced
    Arrow string buffers (two input blocks)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from simple_osm_queries_ray.stages.text import repetition_stats

    texts = [
        "abcabcabc",          # heavy repetition
        "abcdefg",            # all distinct
        "ab",                 # shorter than n -> dropped
        "",                   # empty -> dropped
        "aaaaaaa",            # single distinct trigram
        "héllo héllo héllo",  # non-ASCII fallback path
        "xyzxy" * 40,
    ]
    ids = list(range(len(texts)))
    tbl = pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts)})
    ds = ray.data.from_arrow([tbl.slice(0, 3), tbl.slice(3)])
    got = repetition_stats(ds, n=3).to_pandas().set_index("doc_id").sort_index()
    exp = {}
    for i, s in zip(ids, texts):
        t = max(len(s) - 2, 0)
        if t == 0:
            continue
        d = len({s[j : j + 3] for j in range(t)})
        exp[i] = (t, d, (t - d) / t)
    assert set(got.index) == set(exp)
    for i, (t, d, r) in exp.items():
        row = got.loc[i]
        assert (row.total_ngrams, row.distinct_ngrams, row.dup_ratio) == (t, d, r)


def test_chunk_docs_matches_python_slicing():
    """chunk_docs == per-doc Python slicing: window starts every
    size-overlap chars, empty docs dropped, non-ASCII fallback, sliced
    Arrow buffers (two blocks)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from simple_osm_queries_ray.stages.text import chunk_docs

    texts = ["", "short", "x" * 10, "abcdefghij" * 3, "héllo wörld" * 4, "y" * 9]
    tbl = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": pa.array(texts)}
    )
    ds = ray.data.from_arrow([tbl.slice(0, 2), tbl.slice(2)])
    got = chunk_docs(ds, size=10, overlap=3).to_pandas()
    gm = {(r.doc_id, r.chunk_id): r.chunk_text for r in got.itertuples()}
    exp = {}
    for i, s in enumerate(texts):
        k = 0
        while k * 7 < len(s):
            exp[(i, k)] = s[k * 7 : k * 7 + 10]
            k += 1
    assert gm == exp


def test_chunk_docs_rejects_bad_params():
    import pytest
    import ray.data

    from simple_osm_queries_ray.stages.text import chunk_docs

    ds = ray.data.from_items([{"doc_id": 1, "text": "x"}])
    for size, ov in [(0, 0), (5, 5), (5, -1)]:
        with pytest.raises(ValueError):
            chunk_docs(ds, size=size, overlap=ov)


def test_train_shards_stable_and_dense():
    """train_shards: positions are 0..n_s-1 dense per shard, the full
    assignment is independent of input block layout, and matches the
    multiplicative-hash spec."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from simple_osm_queries_ray.stages.text import _SHARD_MOD, _SHARD_MUL, train_shards

    ids = np.arange(137, dtype=np.int64) * 13 + 5
    tbl = pa.table({"doc_id": pa.array(ids)})
    a = train_shards(ray.data.from_arrow(tbl), num_shards=4).to_pandas()
    b = train_shards(
        ray.data.from_arrow([tbl.slice(0, 50), tbl.slice(50, 30), tbl.slice(80)]),
        num_shards=4,
    ).to_pandas()
    ka = a.sort_values("doc_id").reset_index(drop=True)
    kb = b.sort_values("doc_id").reset_index(drop=True)
    assert ka.equals(kb)
    h = (ids * _SHARD_MUL) % _SHARD_MOD
    assert (ka.set_index("doc_id")["shard"].loc[ids].to_numpy() == h % 4).all()
    for s, grp in a.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(len(grp)))
        # order within shard follows (h, doc_id)
        grp = grp.sort_values("pos")
        hh = (grp["doc_id"].to_numpy() * _SHARD_MUL) % _SHARD_MOD
        assert (np.diff(hh) >= 0).all()


def test_bm25_rank_small_corpus(tmp_path):
    """BM25 ranking on a hand-built corpus: scores recomputed serially, the
    no-log idf ratio, dl normalization and tf saturation all exercised."""
    import numpy as np
    import pandas as pd

    from simple_osm_queries_ray.stages.text import bm25_rank

    texts = [
        "query query query scan",          # high tf for 'query', short
        "query merge merge",               # mixes two terms
        "scan scan scan scan scan scan",   # no query terms except none
        "vector",                          # rare term -> high idf
        "query " + "filler " * 40 + "end", # long doc -> dl penalty
    ]
    df = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64), "text": texts})
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    got = bm25_rank(str(tmp_path), k=5)

    # serial recompute
    terms = ("query", "merge", "vector")
    dl = np.array([len(t.split()) for t in texts], dtype=np.float64)
    tf = np.array(
        [[t.split().count(term) for term in terms] for t in texts],
        dtype=np.float64,
    )
    n, avgdl = 5.0, dl.sum() / 5.0
    dfreq = (tf > 0).sum(axis=0).astype(np.float64)
    idf = ((n - dfreq) + 0.5) / (dfreq + 0.5)
    norm = 0.25 + 0.75 * (dl / avgdl)
    score = np.zeros(5)
    for i in range(3):
        score = score + idf[i] * ((tf[:, i] * 2.2) / (tf[:, i] + 1.2 * norm))
    keep = tf.sum(axis=1) > 0
    order = np.lexsort((np.arange(5)[keep], -score[keep]))
    want_ids = np.arange(5)[keep][order]
    assert got["doc_id"].tolist() == want_ids.tolist()
    assert np.allclose(got["score"].to_numpy(), score[want_ids])
    # doc 2 has no query terms at all -> excluded
    assert 2 not in got["doc_id"].tolist()


def test_value_percentiles_recursion_and_ties(tmp_path, ray_session):
    """The selection must stay exact when bins recurse (tiny bin_cap) and
    when the column is dominated by one repeated value."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from simple_osm_queries_ray.stages.text import value_percentiles

    rng = np.random.default_rng(3)
    vals = np.concatenate([rng.normal(0, 1, 5000), np.full(5000, 0.25)])
    t = pa.table(
        {
            "event_id": pa.array(np.arange(len(vals), dtype=np.int64)),
            "ts": pa.array(
                np.full(len(vals), np.datetime64("2024-01-01", "us"))
            ),
            "user_id": pa.array(np.zeros(len(vals), dtype=np.int64)),
            "value": pa.array(vals),
        }
    )
    sf = str(tmp_path)
    pq.write_table(t, f"{sf}/events.parquet")
    got = value_percentiles(sf, qs=(0.1, 0.5, 0.9), bin_cap=16).to_pandas()
    got = dict(zip(got["q"], got["value"]))
    srt = np.sort(vals)
    for q in (0.1, 0.5, 0.9):
        k = int(np.floor((len(vals) - 1) * q))
        assert got[q] == srt[k], (q, got[q], srt[k])


def test_connected_components_long_chain_pointer_jumping(monkeypatch):
    """review r04: plain hash-min needs O(diameter) rounds — a chain longer
    than max_iters previously returned SILENTLY unconverged labels on the
    distributed path. Pointer jumping converges in O(log d) rounds; if the
    cap is still exhausted, the call must raise, never return wrong groups."""
    import pyarrow as pa
    import pytest
    import ray.data

    import simple_osm_queries_ray.stages.dedup as dd

    monkeypatch.setattr(dd, "_LOCAL_CC_EDGE_LIMIT", 0)  # force distributed
    n = 70  # chain diameter 69 >> 10 rounds of plain propagation
    ids = ray.data.from_arrow(pa.table({"id": list(range(n))}))
    pairs = ray.data.from_arrow(
        pa.table({"id_a": list(range(n - 1)), "id_b": list(range(1, n))})
    )
    got = dict(
        dd.connected_components(ids, pairs, max_iters=10)
        .to_pandas()[["id", "group_id"]]
        .values.tolist()
    )
    assert got == {i: 0 for i in range(n)}

    with pytest.raises(RuntimeError, match="did not converge"):
        dd.connected_components(ids, pairs, max_iters=1).to_pandas()


def test_minhash_lsh_rows_per_band_scales_with_threshold():
    """review r04: the fixed 32x2 banding lost ~27% of J=0.2 pairs; the
    band config must now be derived from the threshold so the >= 0.999
    recall contract holds at any threshold."""
    from simple_osm_queries_ray.stages.dedup import _K_PERM, _lsh_rows_per_band

    for t in (0.2, 0.5, 0.7, 0.9):
        r = _lsh_rows_per_band(t)
        b = _K_PERM // r
        assert 1.0 - (1.0 - t**r) ** b >= 0.999, (t, r)
    assert _lsh_rows_per_band(0.5) == 2  # default config unchanged
    assert _lsh_rows_per_band(0.2) == 1  # low threshold -> wider bands
    assert _lsh_rows_per_band(0.9) >= 4  # high threshold -> cheaper verify
    # below the attainable-recall floor (64 perms), the max-recall config
    assert _lsh_rows_per_band(0.1) == 1


def test_minhash_lsh_pairs_low_threshold_recall():
    # two docs sharing ~27% of trigrams must be found at threshold 0.25
    # (previously P(candidate) ~ 0.87 per pair under the fixed banding —
    # with the fixed hash seeds, concretely missable)
    import pyarrow as pa
    import ray.data

    from simple_osm_queries_ray.stages.dedup import jaccard, minhash_lsh_pairs

    common = " ".join(f"shared{i}" for i in range(30))
    a = common + " " + " ".join(f"aonly{i}" for i in range(40))
    b = common + " " + " ".join(f"bonly{i}" for i in range(40))
    j = jaccard(a, b)
    assert 0.15 < j < 0.35
    ds = ray.data.from_arrow(
        pa.table({"id": [1, 2, 3], "text": [a, b, "totally different words here"]})
    )
    got = minhash_lsh_pairs(ds, threshold=min(0.25, j)).to_pandas()
    assert (1, 2) in set(zip(got.id_a, got.id_b))


def test_minhash_signatures_chunked_matches_full_matrix():
    # the permutation chunking must be byte-identical to the one-shot
    # (n_shingles, 64) matrix it replaced
    import pandas as pd

    from simple_osm_queries_ray.stages.dedup import (
        _MASK,
        _PERM_A,
        _PERM_B,
        _K_PERM,
        _shingle_hashes,
        _token_hashes,
        minhash_signatures,
    )

    texts = pd.Series(
        ["the quick brown fox jumps over the lazy dog", "", "a b", "x y z w v"]
    )
    got = minhash_signatures(texts)
    tok, offsets = _token_hashes(texts)
    sh, sh_off = _shingle_hashes(tok, offsets)
    exp = np.full((len(texts), _K_PERM), _MASK, dtype=np.uint64)
    hashed = (sh[:, None] * _PERM_A[None, :] + _PERM_B[None, :]) & _MASK
    nonempty = np.diff(sh_off) > 0
    exp[nonempty] = np.minimum.reduceat(hashed, sh_off[:-1][nonempty], axis=0)
    np.testing.assert_array_equal(got, exp)
