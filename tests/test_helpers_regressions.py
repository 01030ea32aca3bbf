"""Regression pins for the round-3 hardening audit: each test encodes a
specific defect class found by adversarial review (see BASELINE.md,
"Round-3 hardening audit") so the class cannot silently return."""

import numpy as np
import pyarrow as pa


def test_nulls_to_empty_list_sliced_array():
    """Sliced (offset > 0) ListArrays must gather slice-adjusted values —
    the offsets-rebase-only variant silently returned the wrong lists."""
    from simple_osm_queries_ray.stages.joins import nulls_to_empty_list

    a = pa.array([[1, 2], [3], None, [4, 5, 6], [7]])
    out = nulls_to_empty_list(a.slice(2))
    assert out.to_pylist() == [[], [4, 5, 6], [7]]


def test_collect_list_column_zero_groups():
    """Empty blocks reach the list assembler whenever an upstream filter
    empties a block; Arrow rejects zero-length offsets."""
    from simple_osm_queries_ray.stages.group_collect import collect_list_column

    z = np.array([], dtype=np.int64)
    out = collect_list_column(z, z, z, pa.int64())
    assert len(out) == 0


def test_segment_min_trailing_empty_rows():
    """Clamped reduceat starts stole the last element from the final
    nonzero row when trailing rows were empty."""
    from simple_osm_queries_ray.functions.segments import segment_min

    vals = np.array([5.0, 3.0, 9.0], dtype=np.float64)
    # rows: [5,3,9], [], []
    offsets = np.array([0, 3, 3, 3], dtype=np.int64)
    out = segment_min(vals, offsets)
    assert out[0] == 3.0 and np.isinf(out[1]) and np.isinf(out[2])
    # interior empty too
    offsets = np.array([0, 1, 1, 3], dtype=np.int64)
    out = segment_min(vals, offsets)
    assert out[0] == 5.0 and np.isinf(out[1]) and out[2] == 3.0


def test_fingerprint_batch_boundary_independence():
    from simple_osm_queries_ray.stages.text import fingerprint_batch

    texts = ["hello world", "", "x", "yz" * 50]
    solo = [fingerprint_batch([t])[0] for t in texts]
    assert list(fingerprint_batch(texts)) == solo


def test_signature_batch_boundary_independence():
    import pandas as pd

    from simple_osm_queries_ray.stages.dedup import (
        minhash_signatures,
        simhash_signatures,
    )

    doc = "alpha beta gamma delta epsilon"
    assert (
        simhash_signatures(pd.Series([doc]))[0]
        == simhash_signatures(pd.Series([doc, ""]))[0]
    )
    a = minhash_signatures(pd.Series([doc]))[0]
    b = minhash_signatures(pd.Series([doc, ""]))[0]
    assert (a == b).all()


def test_hamming_pigeonhole_complete_beyond_three():
    """The fixed 4x16 chunk split silently missed pairs above d=3; the
    d+1-chunk split must catch a pair differing by one bit per chunk."""
    import ray
    import ray.data

    from simple_osm_queries_ray.stages.dedup import hamming_pairs_int64

    # two signatures differing in exactly 4 spread-out bits: one inside
    # each of the old 16-bit chunks, so the old split NEVER bucketed them
    a = np.int64(0)
    b = np.int64((1 << 3) | (1 << 19) | (1 << 35) | (1 << 51))
    ds = ray.data.from_arrow(
        pa.table({"id": pa.array([1, 2], pa.int64()), "sig": pa.array([a, b])})
    )
    got = hamming_pairs_int64(ds, sig_col="sig", max_hamming=4).to_pandas()
    assert len(got) == 1 and (got.iloc[0]["id_a"], got.iloc[0]["id_b"]) == (1, 2)


def test_broadcast_cache_bounded():
    from simple_osm_queries_ray.state import broadcast

    refs = [broadcast.put(np.arange(10) + i) for i in range(broadcast._CACHE_MAX + 16)]
    for r in refs:
        broadcast.get(r)
    assert len(broadcast._CACHE) <= broadcast._CACHE_MAX
    # most-recent entries still resolve correctly
    assert broadcast.get(refs[-1])[0] == broadcast._CACHE_MAX + 15


def test_quad_cell_boundary_clamp():
    from simple_osm_queries_ray.functions.hiercell import quad_cell, quad_level

    c = quad_cell(np.array([180.0, -180.0]), np.array([-90.0, 90.0]), 12)
    assert (quad_level(c) == 12).all()


def test_lsh_params_hold_recall_at_any_scale():
    from simple_osm_queries_ray.stages.embed import _lsh_params

    for n, tau in [(1e4, 0.8), (1e9, 0.5), (1e9, 0.9), (1e12, 0.8)]:
        p, b = _lsh_params(int(n), tau)
        s = 1.0 - np.arccos(tau) / np.pi
        recall = 1 - (1 - s**p) ** b
        assert recall >= 0.998, (n, tau, p, b, recall)


def test_events_window_pairs_empty_corpus(tmp_path):
    """An empty events table yields a schema-less aggregate dataset; the
    n_pairs filter must return empty instead of erroring on the missing
    column (review r04; same class as the zonal empty guard)."""
    import shutil

    import pyarrow.parquet as pq

    d = str(tmp_path / "sf")
    shutil.copytree("/root/testdata/sf0.001", d)
    ev = pq.read_table(f"{d}/events.parquet")
    pq.write_table(ev.slice(0, 0), f"{d}/events.parquet")

    from simple_osm_queries_ray.stages.text import events_window_pairs

    out = events_window_pairs(d)
    assert out.count() == 0
