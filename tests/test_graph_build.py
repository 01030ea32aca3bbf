"""Pipeline-vs-oracle conformance of the feature-graph build (J3/J4/J5)."""

import numpy as np
import pytest

from simple_osm_queries_ray.sources.repo import build_repo

import oracle

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def repo():
    return build_repo(SF)


@pytest.fixture(scope="module")
def oracle_graph():
    return oracle.build_oracle_graph(SF)


def _df(ds):
    return ds.to_pandas()


def test_nodes_match_oracle(repo, oracle_graph):
    nodes_df, _, _ = oracle_graph
    got = _df(repo.nodes).sort_values("id").reset_index(drop=True)
    exp = nodes_df.sort_values("id").reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["id"].to_numpy() == exp["id"].to_numpy()).all()
    np.testing.assert_array_equal(got["lon"].to_numpy(), exp["lon"].to_numpy())
    np.testing.assert_array_equal(got["lat"].to_numpy(), exp["lat"].to_numpy())
    np.testing.assert_array_equal(got["cell"].to_numpy(), exp["cell"].to_numpy())
    for g, e in zip(got["way_ids"], exp["way_ids"]):
        assert list(g) == list(e)
    for g, e in zip(got["relation_ids"], exp["relation_ids"]):
        assert list(g) == list(e)


def test_hot_cell_skew_planted(repo):
    got = _df(repo.nodes)
    counts = got.groupby("cell").size()
    assert counts.max() >= 0.25 * len(got)  # the planted hot cell


def test_ways_match_oracle(repo, oracle_graph):
    _, ways_df, _ = oracle_graph
    got = _df(repo.ways).sort_values("id").reset_index(drop=True)
    exp = ways_df.sort_values("id").reset_index(drop=True)
    assert list(got["id"]) == list(exp["id"])
    for g, e in zip(got["node_ids"], exp["node_ids"]):
        assert list(g) == list(e)
    for g, e in zip(got["cells"], exp["cells"]):
        assert sorted(g) == sorted(e)
    np.testing.assert_array_equal(got["minlon"].to_numpy(), exp["minlon"].to_numpy())
    np.testing.assert_array_equal(got["maxlat"].to_numpy(), exp["maxlat"].to_numpy())
    for g, e in zip(got["relation_ids"], exp["relation_ids"]):
        assert list(g) == list(e)


def test_relations_match_oracle(repo, oracle_graph):
    _, _, rels_df = oracle_graph
    got = _df(repo.relations).sort_values("id").reset_index(drop=True)
    exp = rels_df.sort_values("id").reset_index(drop=True)
    assert list(got["id"]) == list(exp["id"])
    for col in ("node_ids", "way_ids", "child_relation_ids", "parent_relation_ids"):
        for g, e in zip(got[col], exp[col]):
            assert sorted(g) == sorted(e), col
    for g, e in zip(got["cells"], exp["cells"]):
        assert sorted(g) == sorted(e)
    np.testing.assert_array_equal(got["minlon"].to_numpy(), exp["minlon"].to_numpy())
    np.testing.assert_array_equal(got["minlat"].to_numpy(), exp["minlat"].to_numpy())
    np.testing.assert_array_equal(got["maxlon"].to_numpy(), exp["maxlon"].to_numpy())
    np.testing.assert_array_equal(got["maxlat"].to_numpy(), exp["maxlat"].to_numpy())


def test_tag_index_contents(repo):
    ti = repo.tag_index
    assert "lang" in ti.keys and "wtype" in ti.keys and "rtype" in ti.keys
    # n_chars values must be natural-sorted (numeric order), not lexicographic
    ki = ti.key_index("n_chars")
    vals = [int(v) for v in ti.values[ki]]
    assert vals == sorted(vals)


def test_build_ways_local_first_matches_shuffle():
    """Local-first grouping equals the shuffle build on clustered AND
    deliberately scattered inputs (residue path)."""
    from simple_osm_queries_ray.pipelines.build_graph import (
        build_ways,
        build_ways_local_first,
    )
    from simple_osm_queries_ray.sources.synthetic import generated_nodes

    nodes = generated_nodes("/root/testdata/sf0.001", replicate=4).materialize()
    for ds in (nodes, nodes.random_shuffle(seed=3).materialize()):
        a = build_ways(ds).to_pandas().sort_values("id").reset_index(drop=True)
        b = build_ways_local_first(ds).to_pandas().sort_values("id").reset_index(drop=True)
        assert len(a) == len(b)
        assert (a["id"] == b["id"]).all()
        for x, y in zip(a["node_ids"], b["node_ids"]):
            assert list(x) == list(y)
        for x, y in zip(a["cells"], b["cells"]):
            assert list(x) == list(y)


def test_build_ways_compact_exchange_matches_full_rows():
    """The 26-byte compact exchange payload (wg, int8 residual, lon, lat)
    must reconstruct ids and cells byte-identically to the 40-byte full-row
    exchange — including under a custom cell scheme, where the receive-side
    cell recomputation must use the scheme's derivation, not the flat grid."""
    import pandas as pd

    from simple_osm_queries_ray.functions.hiercell import GridCellScheme
    from simple_osm_queries_ray.pipelines.build_graph import build_ways
    from simple_osm_queries_ray.sources.synthetic import generated_nodes

    nodes = generated_nodes("/root/testdata/sf0.001", replicate=2).materialize()

    def cmp(kwargs_a, kwargs_b, ds):
        a = build_ways(ds, **kwargs_a).to_pandas().sort_values("id").reset_index(drop=True)
        b = build_ways(ds, **kwargs_b).to_pandas().sort_values("id").reset_index(drop=True)
        assert len(a) == len(b) and len(a) > 0
        for col in a.columns:
            for x, y in zip(a[col], b[col]):
                if isinstance(x, (list, tuple)) or hasattr(x, "__len__") and not isinstance(x, str):
                    assert list(x) == list(y), col
                else:
                    assert x == y, col

    cmp({"compact_exchange": True}, {"compact_exchange": False}, nodes)

    # custom scheme: recell the input the way sources/repo.py does, and pass
    # the scheme's cell_of through — results must match the full-row path
    scheme = GridCellScheme(0.05, 0.05)

    def recell(batch):
        import numpy as np
        import pyarrow as pa

        c = scheme.cell_of(
            np.asarray(batch["lon"], dtype=np.float64),
            np.asarray(batch["lat"], dtype=np.float64),
        )
        return batch.set_column(
            batch.column_names.index("cell"), "cell", pa.array(c, type=pa.int64())
        )

    nodes_s = nodes.map_batches(recell, batch_format="pyarrow").materialize()
    cmp(
        {"compact_exchange": True, "cell_fn": scheme.cell_of},
        {"compact_exchange": False},
        nodes_s,
    )


def test_reverse_membership_gate_both_paths_agree():
    """attach_reverse_membership must produce identical reverse lists on
    both sides of the broadcast-vs-shuffle gate (r03 audit: the gate default
    dropped to 25M edges to bound the broadcast path's single-task sort;
    forcing broadcast_edge_limit=0 exercises the partitioned fallback)."""
    from simple_osm_queries_ray.pipelines.build_graph import (
        attach_reverse_membership,
        build_relations,
        build_ways,
    )
    from simple_osm_queries_ray.sources.synthetic import generated_nodes

    nodes = generated_nodes(SF, replicate=1).materialize()
    ways = build_ways(nodes).materialize()
    rels = build_relations(nodes, ways).materialize()

    def run(limit):
        n, w = attach_reverse_membership(
            nodes, ways, rels, broadcast_edge_limit=limit
        )
        ndf = n.to_pandas().sort_values("id").reset_index(drop=True)
        wdf = w.to_pandas().sort_values("id").reset_index(drop=True)
        return ndf, wdf

    nb, wb = run(25_000_000)  # broadcast tier (default)
    nf, wf = run(0)  # forced partitioned fallback

    assert (nb["id"] == nf["id"]).all() and (wb["id"] == wf["id"]).all()
    for col, a, b in (
        ("way_ids", nb, nf),
        ("relation_ids", nb, nf),
        ("relation_ids", wb, wf),
    ):
        for x, y in zip(a[col], b[col]):
            assert list(x) == list(y), col


def test_hash_join_attach_rejects_duplicate_right_keys():
    """The right side's at-most-one-row-per-key contract is now ENFORCED —
    a silent first-match attach would drop data (r04 review)."""
    import pyarrow as pa
    import pytest
    import ray

    from simple_osm_queries_ray.stages.joins import hash_join_attach

    left = ray.data.from_arrow(pa.table({"id": [1, 2, 3]}))
    right = ray.data.from_arrow(pa.table({"k": [1, 1, 2], "v": [10, 11, 20]}))
    with pytest.raises(Exception, match="duplicate join key"):
        hash_join_attach(left, "id", right, "k", {"v": pa.int64()}).materialize()


def test_hash_join_attach_rejects_clashing_attach_name():
    import pyarrow as pa
    import pytest
    import ray

    from simple_osm_queries_ray.stages.joins import hash_join_attach

    left = ray.data.from_arrow(pa.table({"id": [1], "v": [0]}))
    right = ray.data.from_arrow(pa.table({"k": [1], "v": [10]}))
    with pytest.raises(ValueError, match="already"):
        hash_join_attach(left, "id", right, "k", {"v": pa.int64()})
