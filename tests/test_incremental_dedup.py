"""Incremental MinHash dedup (pipelines/incremental_dedup.py): the result
must equal the batch rerun over the evolved corpus while signing ONLY the
delta — the 100 TB re-crawl contract."""

import pandas as pd
import pytest

from simple_osm_queries_ray.pipelines.incremental_dedup import (
    build_minhash_state,
    dup_documents_v2,
    incremental_minhash_dedup,
)
from simple_osm_queries_ray.sources.dup_docs import dup_documents
from simple_osm_queries_ray.stages.dedup import minhash_lsh_pairs

SF = "/root/testdata/sf0.001"


def _pairs(ds) -> pd.DataFrame:
    return ds.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)


def test_incremental_equals_batch_and_signs_only_delta(ray_session, tmp_path):
    state = str(tmp_path / "state")
    build_minhash_state(dup_documents(SF), state)
    v1_docs = dup_documents(SF).count()
    stats = {}
    inc = _pairs(incremental_minhash_dedup(dup_documents_v2(SF), state, stats_out=stats))
    batch = _pairs(minhash_lsh_pairs(dup_documents_v2(SF), threshold=0.5))
    assert len(inc) > 0
    assert inc.equals(batch)
    # the contract: signing volume is the delta, not the corpus
    assert stats["signed_docs"] == stats["delta_docs"]
    assert 0 < stats["signed_docs"] < v1_docs // 2
    assert stats["stale_docs"] > 0


def test_incremental_rolls_state_forward(ray_session, tmp_path):
    # v1 -> v2 with update_state_dir, then v2 -> v2 again from the rolled
    # state: zero delta, zero signing, identical pairs
    state1 = str(tmp_path / "s1")
    state2 = str(tmp_path / "s2")
    build_minhash_state(dup_documents(SF), state1)
    first = _pairs(
        incremental_minhash_dedup(
            dup_documents_v2(SF), state1, update_state_dir=state2
        )
    )
    stats = {}
    again = _pairs(
        incremental_minhash_dedup(dup_documents_v2(SF), state2, stats_out=stats)
    )
    assert stats["delta_docs"] == 0
    assert stats["signed_docs"] == 0
    assert stats["stale_docs"] == 0
    assert again.equals(first)


def test_incremental_guards(ray_session, tmp_path):
    state = str(tmp_path / "state")
    with pytest.raises(FileNotFoundError, match="meta.json"):
        incremental_minhash_dedup(dup_documents_v2(SF), state)
    build_minhash_state(dup_documents(SF), state, threshold=0.5)
    with pytest.raises(ValueError, match="threshold"):
        incremental_minhash_dedup(dup_documents_v2(SF), state, threshold=0.3)


def test_membership_filter_join_path_matches_broadcast(ray_session):
    # force the partitioned semi/anti-join fallback (ID_BROADCAST_LIMIT = -1)
    # and pin equality with the broadcast probe on both polarities
    import numpy as np
    import pyarrow as pa
    import ray

    import simple_osm_queries_ray.pipelines.incremental_dedup as mod

    ds = ray.data.from_arrow(
        pa.table({"id": pa.array(np.arange(1000, dtype=np.int64)),
                  "v": pa.array(np.arange(1000, dtype=np.int64) * 7)})
    ).repartition(4)
    ids = ray.data.from_arrow(
        pa.table({"id": pa.array(np.arange(0, 1000, 3, dtype=np.int64))})
    )
    for keep_in in (True, False):
        bc = (
            mod._membership_filter(ds, "id", ids, keep_in=keep_in)
            .to_pandas().sort_values("id").reset_index(drop=True)
        )
        old = mod.ID_BROADCAST_LIMIT
        mod.ID_BROADCAST_LIMIT = -1
        try:
            jn = (
                mod._membership_filter(ds, "id", ids, keep_in=keep_in)
                .to_pandas().sort_values("id").reset_index(drop=True)
            )
        finally:
            mod.ID_BROADCAST_LIMIT = old
        assert len(bc) > 0
        assert bc[["id", "v"]].equals(jn[["id", "v"]]), keep_in


def test_in_place_roll_forward_rejected(ray_session, tmp_path):
    state = str(tmp_path / "s")
    build_minhash_state(dup_documents(SF), state)
    with pytest.raises(ValueError, match="must differ"):
        incremental_minhash_dedup(
            dup_documents_v2(SF), state, update_state_dir=state
        )
