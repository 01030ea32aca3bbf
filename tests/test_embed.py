"""Embedding operators: ANN recall vs exact, LSH near-dup vs exact pairs.

The approximate variants have no SQL oracle; these tests pin their quality
against the exact operators (as promised in stages/embed.py docstrings).
"""

import pytest

from simple_osm_queries_ray.sources.dup_embeddings import dup_embeddings
from simple_osm_queries_ray.sources.read import read_parquet_sized
from simple_osm_queries_ray.stages.embed import (
    ann_search,
    ann_search_ivf,
    embedding_near_dup_exact,
    embedding_near_dup_lsh,
)

SF = "/root/testdata/sf0.001"
Q = [0, 1, 2]
K = 10


@pytest.fixture(scope="module")
def emb(ray_session):
    return read_parquet_sized(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])


def test_ann_exact_topk_shape(emb):
    df = ann_search(emb, Q, K).to_pandas()
    assert sorted(df.qid.unique()) == Q
    assert (df.groupby("qid").size() == K).all()
    assert not any(df.qid == df.vec_id)  # self excluded


def test_ann_ivf_recall(emb):
    exact = ann_search(emb, Q, K).to_pandas()
    ivf = ann_search_ivf(emb, Q, K).to_pandas()
    recalls = []
    for q in Q:
        e = set(exact[exact.qid == q].vec_id)
        i = set(ivf[ivf.qid == q].vec_id)
        assert len(i) <= K
        recalls.append(len(e & i) / len(e))
    # nprobe=4 of 16 lists on random embeddings: mean recall ~0.6 (0.4-0.9
    # per query); pin a floor that fails if the probe routing breaks
    assert sum(recalls) / len(recalls) >= 0.45, recalls


def test_ivf_partition_pruning(emb, tmp_path):
    """The IVF is a real inverted file: search touches only the probed
    lists' partitions, strictly fewer than the index's partition count."""
    import os

    import numpy as np

    from simple_osm_queries_ray.stages.embed import (
        _normalize,
        _query_matrix,
        build_ivf_index,
        ivf_probe_search,
    )

    idx = str(tmp_path / "ivf")
    cents = build_ivf_index(emb, idx)
    parts = [d for d in os.listdir(idx) if d.startswith("list_id=")]
    assert len(parts) > 4  # non-degenerate clustering
    q_ids, q_vecs = _query_matrix(emb, Q, "vec_id", "embedding")
    probe = np.argsort(-(_normalize(q_vecs) @ cents.T), axis=1)[:, :4]
    assert len(np.unique(probe)) < len(parts)  # probed set < full index
    df = ivf_probe_search(idx, cents, q_ids, q_vecs, K, nprobe=4).to_pandas()
    assert sorted(df.qid.unique()) == Q
    assert (df.groupby("qid").size() <= K).all()


def test_lsh_near_dup_matches_exact_planted_pairs(ray_session):
    de = dup_embeddings(SF)
    exact = embedding_near_dup_exact(de, 0.9).to_pandas()
    lsh = embedding_near_dup_lsh(de, 0.9).to_pandas()
    pe = set(zip(exact.id_a, exact.id_b))
    pl = set(zip(lsh.id_a, lsh.id_b))
    assert pl <= pe  # within-bucket exact verify -> no false positives
    assert pl == pe  # planted near-identical pairs land in shared buckets
    assert len(pe) > 0
