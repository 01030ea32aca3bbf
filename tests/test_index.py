"""Persistent index: partition planning, skew split, write/read roundtrip,
manifest resume, disk-backed query parity."""

import json
import os

import numpy as np
import pytest

from simple_osm_queries_ray.pipelines.build_index import (
    DiskRepo,
    PartitionPlan,
    density_histogram,
    write_index,
)
from simple_osm_queries_ray.pipelines.query import QueryEngine
from simple_osm_queries_ray.sources.repo import build_repo

SF = "/root/testdata/sf0.001"


def test_partition_plan_packing():
    cells = np.array([10, 11, 12, 13], dtype=np.int64)
    counts = np.array([50, 60, 40, 30], dtype=np.int64)
    plan = PartitionPlan.from_histogram(cells, counts, rows_per_partition=100)
    # greedy: [50], [60,40]? 50+60>100 -> cell10=p0, 60+40=100 -> p1, 30 -> p2
    assert plan.pids.tolist() == [0, 1, 1, 2]
    assert plan.hot == {}


def test_partition_plan_hot_cell_split():
    cells = np.array([10, 11], dtype=np.int64)
    counts = np.array([250, 10], dtype=np.int64)
    plan = PartitionPlan.from_histogram(cells, counts, rows_per_partition=100)
    assert plan.hot == {10: 3}  # ceil(250/100) sub-partitions
    ids = np.arange(9, dtype=np.int64)
    pid = plan.assign(np.full(9, 10, dtype=np.int64), ids)
    assert set(pid) == {0, 1, 2}  # salted across the 3 sub-partitions
    # pruned read must include all sub-partitions of the hot cell
    assert set(plan.pids_for_cells(np.array([10]))) == {0, 1, 2}
    assert set(plan.pids_for_cells(np.array([11]))) == {3}


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("soq_index"))
    repo = build_repo(SF)
    write_index(repo, d, rows_per_partition=150, num_waves=2)
    return d


def test_density_histogram(index_dir):
    repo = build_repo(SF)
    cells, counts = density_histogram(repo.nodes)
    assert counts.sum() == repo.nodes.count()
    assert counts.max() >= 0.25 * counts.sum()  # hot cell visible


def test_manifest_and_layout(index_dir):
    with open(os.path.join(index_dir, "manifest.json")) as f:
        m = json.load(f)
    assert m["waves"], "waves recorded"
    for key, w in m["waves"].items():
        assert w["rows"] >= 0 and "partitions" in w
    assert os.path.isdir(os.path.join(index_dir, "node"))
    assert any(p.startswith("pid=") for p in os.listdir(os.path.join(index_dir, "node")))
    assert os.path.exists(os.path.join(index_dir, "tag-index"))


def test_resume_skips_completed_waves(index_dir):
    before = os.path.getmtime(os.path.join(index_dir, "manifest.json"))
    import time

    t0 = time.time()
    write_index(build_repo(SF), index_dir, rows_per_partition=150, num_waves=2)
    elapsed = time.time() - t0
    with open(os.path.join(index_dir, "manifest.json")) as f:
        m = json.load(f)
    # all waves were already recorded -> second run writes nothing new
    assert os.path.getmtime(os.path.join(index_dir, "manifest.json")) == before
    assert elapsed < 10  # pure skip, no dataset execution


def test_disk_repo_roundtrip(index_dir):
    repo = build_repo(SF)
    disk = DiskRepo(index_dir)
    mem_nodes = repo.nodes.to_pandas().sort_values("id").reset_index(drop=True)
    disk_nodes = disk.table("node").to_pandas().sort_values("id").reset_index(drop=True)
    assert len(mem_nodes) == len(disk_nodes)
    assert (mem_nodes["id"].to_numpy() == disk_nodes["id"].to_numpy()).all()
    np.testing.assert_array_equal(mem_nodes["lon"], disk_nodes["lon"])
    # ways replicate across partitions but dedup back to one row per id
    mem_ways = repo.ways.to_pandas()
    disk_ways = disk.table("way").to_pandas()
    assert sorted(mem_ways["id"]) == sorted(disk_ways["id"])


def test_disk_query_parity(index_dir):
    mem = QueryEngine(build_repo(SF))
    disk = QueryEngine(DiskRepo(index_dir))
    for q in (
        "bbox(9.85,53.45,10.05,53.65).nodes{lang=en}",
        "bbox(9,53,11,55).nodes{lang=de AND this.ways{wtype=primary}}",
        "bbox(9,53,11,55).ways{this.nodes{lang=zh}}",
        "bbox(9,53,11,55).relations{this.child_relations{rtype=boundary}}",
    ):
        a = set(mem.execute_string(q).to_pandas()["id"])
        b = set(disk.execute_string(q).to_pandas()["id"])
        assert a == b and a, q


def test_cell_pruned_read_touches_fewer_partitions(index_dir):
    disk = DiskRepo(index_dir)
    total_parts = len(
        [p for p in os.listdir(os.path.join(index_dir, "node")) if p.startswith("pid=")]
    )
    hot_cell = np.array([99 * 100_000 + 535], dtype=np.int64)
    pids = disk.plan.pids_for_cells(hot_cell)
    assert 0 < len(pids) < total_parts


def test_knn_ring_disk_matches_bruteforce(index_dir):
    from simple_osm_queries_ray.stages.knn import knn_bruteforce, knn_cell_ring

    disk = DiskRepo(index_dir)
    q = (9.95, 53.55)
    ring = knn_cell_ring(None, q, 5, repo=disk).to_pandas()
    brute = (
        knn_bruteforce(disk.table("node"), np.array([q]), 5)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert list(ring["id"]) == list(brute["id"])
    np.testing.assert_allclose(ring["dist2"], brute["dist2"])


def test_geojson_roundtrip(tmp_path):
    """write_geojson -> read_geojson preserves ids, coordinates and tags for
    both node (Point) and way (LineString) results."""
    import numpy as np

    from simple_osm_queries_ray.sources.geojson import read_geojson, write_geojson
    from simple_osm_queries_ray.sources.repo import build_repo
    from simple_osm_queries_ray.pipelines.tag_dictionary import build_tag_index

    repo = build_repo("/root/testdata/sf0.001")
    ti = repo.tag_index
    npath = str(tmp_path / "nodes.geojson")
    n = write_geojson(repo.nodes.limit(20), npath, ti, "node")
    assert n == 20
    back = read_geojson(npath).to_pandas().sort_values("id").reset_index(drop=True)
    orig = repo.nodes.limit(20).to_pandas().sort_values("id").reset_index(drop=True)
    assert list(back["id"]) == list(orig["id"])
    assert np.allclose(back["lon"], orig["lon"])
    assert (back["otype"] == "node").all()
    # tags survive the round trip (string form, order-insensitive)
    o_tags = {
        int(r["id"]): dict(zip(r["tag_keys_str"], r["tag_vals_str"]))
        for _, r in orig.iterrows()
    }
    for _, r in back.iterrows():
        assert dict(zip(r["tag_keys_str"], r["tag_vals_str"])) == o_tags[int(r["id"])]

    wpath = str(tmp_path / "ways.geojson")
    write_geojson(repo.ways.limit(5), wpath, ti, "way")
    wback = read_geojson(wpath).to_pandas().sort_values("id").reset_index(drop=True)
    worig = repo.ways.limit(5).to_pandas().sort_values("id").reset_index(drop=True)
    assert list(wback["id"]) == list(worig["id"])
    for a, b in zip(wback["node_lons"], worig["node_lons"]):
        assert np.allclose(list(a), list(b))


def test_text_index_partition_pruning(tmp_path):
    """A keyword query reads only the shards its tokens hash to, and the
    result matches a brute-force scan."""
    from simple_osm_queries_ray.pipelines.text_index import (
        build_text_index,
        keyword_search,
        touched_shards,
    )

    d = str(tmp_path / "tix")
    build_text_index("/root/testdata/sf0.001", d, num_shards=16)
    toks = ["batch", "join"]
    assert touched_shards(d, toks, num_shards=16) < 16
    got = sorted(keyword_search(d, toks).to_pandas()["doc_id"])
    import pyarrow.parquet as pq

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet").to_pandas()
    want = sorted(
        int(r.doc_id)
        for r in docs.itertuples()
        if all(t in r.text.lower().split() for t in toks)
    )
    assert got == want


def test_compact_index(tmp_path):
    """Compaction merges multi-file partitions into one file per partition
    without changing any rows, and is idempotent."""
    import glob

    from simple_osm_queries_ray.pipelines.build_index import (
        DiskRepo,
        compact_index,
        write_index,
    )
    from simple_osm_queries_ray.sources.repo import build_repo

    repo = build_repo("/root/testdata/sf0.001")
    d = str(tmp_path / "idx")
    write_index(repo, d)
    before_rows = DiskRepo(d).table("relation").to_pandas().sort_values("id").reset_index(drop=True)
    n_files_before = len(glob.glob(f"{d}/relation/pid=*/*.parquet"))
    stats = compact_index(d)
    assert stats["files_after"] <= stats["files_before"]
    n_files_after = len(glob.glob(f"{d}/relation/pid=*/*.parquet"))
    assert n_files_after < n_files_before
    after_rows = DiskRepo(d).table("relation").to_pandas().sort_values("id").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(before_rows, after_rows)
    # idempotent
    stats2 = compact_index(d)
    assert stats2["compacted"] == 0


def test_cached_cell_reader_matches_plain_read(tmp_path):
    """The actor-pool cached reader returns the same rows as the plain
    pruned read, and the LRU itself counts hits on re-access."""
    import numpy as np

    from simple_osm_queries_ray.pipelines.build_index import (
        CellPartitionCache,
        DiskRepo,
        table_cached,
        write_index,
    )
    from simple_osm_queries_ray.sources.repo import build_repo

    repo = build_repo("/root/testdata/sf0.001")
    d = str(tmp_path / "idx")
    write_index(repo, d)
    disk = DiskRepo(d)
    plain = disk.table("node").to_pandas().sort_values("id").reset_index(drop=True)
    cached = table_cached(disk, "node").to_pandas().sort_values("id").reset_index(drop=True)
    import pandas as pd

    plain["pid"] = plain["pid"].astype(str)
    cached["pid"] = cached["pid"].astype(str)
    pd.testing.assert_frame_equal(
        plain[sorted(plain.columns)], cached[sorted(cached.columns)]
    )

    # LRU unit behavior: second access of the same path is a hit, capacity evicts
    import glob

    paths = sorted(glob.glob(f"{d}/node/pid=*/*.parquet"))[:2]
    c = CellPartitionCache(capacity=1)
    c.get(paths[0]); c.get(paths[0])
    assert (c.hits, c.misses) == (1, 1)
    if len(paths) > 1:
        c.get(paths[1]); c.get(paths[0])  # evicted -> miss again
        assert c.misses == 3


def test_run_logged_artifact(tmp_path):
    """run_logged writes the result + a run.json with lineage, row count,
    wall time and Ray stats; a rerun with identical lineage is a no-op."""
    import json

    import ray.data

    from simple_osm_queries_ray.state.runlog import run_logged

    ds = ray.data.range(1000)
    out = str(tmp_path / "run")
    lineage = {"input": "range(1000)", "op": "identity", "params": {}}
    m = run_logged(ds, out, lineage)
    assert m["rows"] == 1000 and m["complete"]
    assert "ray_stats" in m and m["seconds"] >= 0
    on_disk = json.load(open(f"{out}/run.json"))
    assert on_disk["lineage"] == lineage
    # resume: same lineage -> returned without rewriting
    m2 = run_logged(ray.data.range(1000), out, lineage)
    assert m2["finished_at"] == m["finished_at"]
    # changed lineage -> result REPLACED, not appended: a rerun into an
    # existing result/ must not double-count rows from the prior run's files
    m3 = run_logged(ray.data.range(500), out, {"input": "range(500)", "op": "identity", "params": {}})
    assert m3["rows"] == 500


def test_zonemap_written_and_prunes_partitions(index_dir):
    """write_index records per-partition tag-key sets; pids_for drops
    partitions lacking a REQUIRED key and keeps unknown ones."""
    import json

    with open(os.path.join(index_dir, "zonemap.json")) as f:
        zm = json.load(f)
    assert "node" in zm and len(zm["node"]) >= 1
    first = zm["node"][next(iter(zm["node"]))]
    assert all(len(r) == 2 for r in first.values())  # v2: per-key [min,max]
    disk = DiskRepo(index_dir)
    all_pids = disk.pids_for("node")
    # every node carries the real keys -> requiring one prunes nothing
    some_key = int(next(iter(first)))
    assert disk.pids_for("node", required_keys=[some_key]) == all_pids
    # a key no partition has prunes every RECORDED partition (pids absent
    # from the zonemap — e.g. salted-plan gaps with no dir — stay, conservative)
    recorded = {int(p) for p in zm["node"]}
    assert [p for p in disk.pids_for("node", required_keys=[10_000]) if p in recorded] == []
    # synthetic zonemap: drop the partition that lacks the key, keep unknowns
    disk.zonemap = {"node": {p: {0: (0, 5)} for p in all_pids[:1]}}
    got = disk.pids_for("node", required_keys=[7])
    assert all_pids[0] not in got
    assert set(got) == set(all_pids[1:])  # unknown pids stay (conservative)
    # value-range pruning: key 0 spans [0,5] in the recorded partition
    assert all_pids[0] in disk.pids_for("node", ranges={0: [("=", 3)]})
    assert all_pids[0] not in disk.pids_for("node", ranges={0: [("=", 9)]})
    assert all_pids[0] not in disk.pids_for("node", ranges={0: [(">", 5)]})
    assert all_pids[0] in disk.pids_for("node", ranges={0: [(">=", 5)]})
    assert all_pids[0] not in disk.pids_for("node", ranges={0: [("<", 0)]})
    assert all_pids[0] in disk.pids_for("node", ranges={0: [("<=", 0)]})
    assert all_pids[0] not in disk.pids_for("node", ranges={7: []})  # absent key


def test_required_key_indices():
    from simple_osm_queries_ray.parser.ast_nodes import (
        BinOp,
        KeyFilter,
        LogicalFilter,
        LogicOp,
        NegatedFilter,
        TagFilter,
        required_key_indices,
    )

    t1 = TagFilter(key_index=1, value_index=0, op=BinOp.EQ)
    t2 = TagFilter(key_index=2, value_index=0, op=BinOp.NEQ)  # != still requires
    k3 = KeyFilter(key_index=3, should_be_set=True)
    k3n = KeyFilter(key_index=3, should_be_set=False)  # absence: no requirement
    assert required_key_indices(t1) == {1}
    assert required_key_indices(t2) == {2}
    assert required_key_indices(k3) == {3}
    assert required_key_indices(k3n) == frozenset()
    assert required_key_indices(LogicalFilter(t1, t2, LogicOp.AND)) == {1, 2}
    assert required_key_indices(LogicalFilter(t1, t2, LogicOp.OR)) == frozenset()
    assert required_key_indices(
        LogicalFilter(LogicalFilter(t1, k3, LogicOp.AND), t1, LogicOp.OR)
    ) == {1}
    assert required_key_indices(NegatedFilter(t1)) == frozenset()
    assert required_key_indices(TagFilter(key_index=-1, value_index=0, op=BinOp.EQ)) == frozenset()


def test_refresh_index_rewrites_only_changed_partitions(tmp_path):
    """refresh_index with an identical repo rewrites nothing (files stay
    byte-identical); deleting some nodes rewrites only their partitions and
    queries reflect the change."""
    import glob

    from simple_osm_queries_ray.pipelines.build_index import (
        DiskRepo,
        refresh_index,
        write_index,
    )
    from simple_osm_queries_ray.sources.repo import FeatureRepo, build_repo

    repo = build_repo(SF)
    d = str(tmp_path / "idx")
    write_index(repo, d)
    mtimes0 = {f: os.path.getmtime(f) for f in glob.glob(f"{d}/*/pid=*/*.parquet")}

    rep = refresh_index(d, repo)
    assert all(r["changed"] == [] and r["removed"] == [] for r in rep.values()), rep
    mtimes1 = {f: os.path.getmtime(f) for f in glob.glob(f"{d}/*/pid=*/*.parquet")}
    assert mtimes0 == mtimes1  # identical content -> untouched files

    # delete a handful of nodes -> only their partitions rewrite
    import pyarrow.compute as pc

    gone = list(range(5))
    nodes2 = repo.nodes.map_batches(
        lambda b: b.filter(
            pc.invert(pc.is_in(b["id"], value_set=__import__("pyarrow").array(gone)))
        ),
        batch_format="pyarrow",
    ).materialize()
    repo2 = FeatureRepo(nodes2, repo.ways, repo.relations, repo.tag_index)
    rep2 = refresh_index(d, repo2)
    assert rep2["node"]["changed"], rep2
    assert rep2["way"]["changed"] == [] and rep2["relation"]["changed"] == []
    changed = set(rep2["node"]["changed"])
    for f, t in mtimes0.items():
        pid = int(f.split("pid=")[1].split("/")[0])
        if "/node/" in f and pid in changed:
            continue
        assert os.path.getmtime(f) == t, f  # untouched partitions unmodified
    ids = set(DiskRepo(d).table("node").to_pandas()["id"])
    assert not (set(gone) & ids)
    assert len(ids) == repo.nodes.count() - len(gone)


def test_projection_pushdown_tag_only_query(index_dir):
    """A tag-only query must not lift payload columns (caption, string tag
    lists, membership lists) off disk: the planner pushes the statement's
    referenced columns into read_parquet (r02 verdict #9)."""
    from simple_osm_queries_ray.parser import parse_query

    disk = DiskRepo(index_dir)
    eng = QueryEngine(disk)
    stmt = parse_query("bbox(9,53,11,55).nodes{lang=de}", disk.tag_index).statements[0]
    cols = eng._stmt_columns(stmt, "node")
    assert "caption" not in cols and "way_ids" not in cols
    pruned = disk.table("node", columns=cols).materialize()
    full = disk.table("node").materialize()
    assert set(pruned.schema().names) == set(cols)
    assert pruned.size_bytes() < 0.8 * full.size_bytes()
    # membership probes pull exactly their column
    stmt2 = parse_query(
        "bbox(9,53,11,55).nodes{lang=de AND this.ways{wtype=primary}}", disk.tag_index
    ).statements[0]
    cols2 = eng._stmt_columns(stmt2, "node")
    assert "way_ids" in cols2 and "relation_ids" not in cols2


def test_disk_index_custom_cell_size(tmp_path):
    """An index built at 0.05 degrees (the reference's cellWidth/cellHeight
    import knob, src/importing/import.go:17) persists its scheme in
    scheme.json; DiskRepo + QueryEngine reconstruct it WITHOUT the caller
    passing a scheme, and answers match the default 0.1-degree index."""
    from simple_osm_queries_ray.functions.hiercell import GridCellScheme

    scheme = GridCellScheme(0.05, 0.05)
    d = str(tmp_path / "idx005")
    write_index(
        build_repo(SF, cell_scheme=scheme), d,
        rows_per_partition=150, num_waves=2, cell_scheme=scheme,
    )
    assert os.path.exists(os.path.join(d, "scheme.json"))
    disk = QueryEngine(DiskRepo(d))  # no explicit scheme: loaded from disk
    assert disk.cell_scheme.cell_w == 0.05
    mem = QueryEngine(build_repo(SF))
    for q in (
        "bbox(9.85,53.45,10.05,53.65).nodes{lang=en}",
        "bbox(9,53,11,55).nodes{lang=de AND this.ways{wtype=primary}}",
    ):
        a = set(mem.execute_string(q).to_pandas()["id"])
        b = set(disk.execute_string(q).to_pandas()["id"])
        assert a == b and a, q


def test_default_rebuild_clears_stale_scheme(tmp_path):
    """Rebuilding an index at the DEFAULT scheme into a directory that
    previously held a custom-scheme index must remove the stale scheme.json
    (and the manifest's lineage meta must invalidate the old waves) — a
    leftover scheme would make DiskRepo probe with the wrong geometry."""
    from simple_osm_queries_ray.functions.hiercell import GridCellScheme

    d = str(tmp_path / "idx")
    scheme = GridCellScheme(0.05, 0.05)
    write_index(
        build_repo(SF, cell_scheme=scheme), d,
        rows_per_partition=150, num_waves=2, cell_scheme=scheme,
    )
    assert os.path.exists(os.path.join(d, "scheme.json"))
    write_index(build_repo(SF), d, rows_per_partition=150, num_waves=2)
    assert not os.path.exists(os.path.join(d, "scheme.json"))
    disk = QueryEngine(DiskRepo(d))
    assert disk.cell_scheme.cell_w == 0.1
    got = set(
        disk.execute_string("bbox(9.85,53.45,10.05,53.65).nodes{lang=en}")
        .to_pandas()["id"]
    )
    mem = QueryEngine(build_repo(SF))
    exp = set(
        mem.execute_string("bbox(9.85,53.45,10.05,53.65).nodes{lang=en}")
        .to_pandas()["id"]
    )
    assert got == exp and got


def test_rebuild_with_new_params_replaces_old_generation(tmp_path):
    """write_parquet APPENDS: a lineage-mismatch restart (manifest meta
    change) must remove the previous generation's pid= dirs, otherwise the
    rebuilt index mixes two generations and node reads (never id-deduped)
    return duplicates (review r04)."""
    d = str(tmp_path / "idx")
    write_index(build_repo(SF), d, rows_per_partition=150, num_waves=2)
    n_before = DiskRepo(d).table("node").count()
    # different rows_per_partition -> meta mismatch -> clean restart
    write_index(build_repo(SF), d, rows_per_partition=300, num_waves=2)
    assert DiskRepo(d).table("node").count() == n_before


def test_unrecorded_wave_rewrite_is_idempotent(tmp_path):
    """Crash window between write_parquet and manifest.record: the wave's
    pid= dirs exist unrecorded; the resume must REPLACE them, not append a
    second copy of every row (review r04)."""
    import json as _json
    import shutil

    d = str(tmp_path / "idx")
    write_index(build_repo(SF), d, rows_per_partition=150, num_waves=2)
    n_before = DiskRepo(d).table("node").count()
    # simulate the crash: erase one node wave's manifest record but leave
    # its parquet files on disk
    with open(os.path.join(d, "manifest.json")) as f:
        man = _json.load(f)
    assert "node/wave0" in man["waves"]
    del man["waves"]["node/wave0"]
    with open(os.path.join(d, "manifest.json"), "w") as f:
        _json.dump(man, f)
    write_index(build_repo(SF), d, rows_per_partition=150, num_waves=2)
    assert DiskRepo(d).table("node").count() == n_before


def test_cli_refresh_preserves_custom_scheme(tmp_path):
    """`cli refresh` must rebuild the repo with the index's persisted
    scheme (review r04: it used the default 0.1 grid, rewriting partitions
    with cell ids no 0.05-scheme query probe could match)."""
    from simple_osm_queries_ray import cli

    d = str(tmp_path / "idx")
    assert cli.main(["import", SF, d, "--cell-width", "0.05", "--cell-height", "0.05"]) == 0
    assert cli.main(["refresh", SF, d]) == 0
    disk = QueryEngine(DiskRepo(d))
    assert disk.cell_scheme.cell_w == 0.05
    got = set(
        disk.execute_string("bbox(9.85,53.45,10.05,53.65).nodes{lang=en}")
        .to_pandas()["id"]
    )
    mem = QueryEngine(build_repo(SF))
    exp = set(
        mem.execute_string("bbox(9.85,53.45,10.05,53.65).nodes{lang=en}")
        .to_pandas()["id"]
    )
    assert got == exp and got


def test_disk_repo_rejects_scheme_manifest_disagreement(tmp_path):
    # review r04: a re-import at a different cell size that crashes between
    # the scheme.json write and the first completed wave must fail LOUDLY at
    # DiskRepo load, not silently probe old-generation data with the new
    # geometry
    import json
    import os

    from simple_osm_queries_ray.functions.hiercell import (
        GridCellScheme,
        scheme_to_json,
    )

    d = str(tmp_path / "idx")
    repo = build_repo(SF)
    write_index(repo, d, rows_per_partition=150, num_waves=2)
    # simulate the crash window: new-generation scheme.json next to the old
    # generation's manifest + data
    with open(os.path.join(d, "scheme.json"), "w") as f:
        json.dump(scheme_to_json(GridCellScheme(0.05, 0.05)), f)
    import pytest

    with pytest.raises(RuntimeError, match="cell scheme"):
        DiskRepo(d)


def test_write_index_defers_scheme_write_until_lineage_check(tmp_path):
    # the scheme/plan/tag-index metadata must land AFTER the manifest
    # lineage check: build custom-scheme, then default — the default rebuild
    # must clear scheme.json and serve consistently
    import os

    from simple_osm_queries_ray.functions.hiercell import GridCellScheme

    d = str(tmp_path / "idx")
    scheme = GridCellScheme(0.05, 0.05)
    repo_c = build_repo(SF, cell_scheme=scheme)
    write_index(repo_c, d, rows_per_partition=150, num_waves=2, cell_scheme=scheme)
    assert DiskRepo(d).cell_scheme is not None
    repo_d = build_repo(SF)
    write_index(repo_d, d, rows_per_partition=150, num_waves=2)
    assert not os.path.exists(os.path.join(d, "scheme.json"))
    disk = DiskRepo(d)
    assert disk.cell_scheme is None
    assert disk.table("node").count() == repo_d.nodes.count()


def test_cli_profile_does_not_consume_output_operand(tmp_path):
    # review r04 bound only .prof tokens as the profile path, silently
    # writing query.prof and reusing the operand; review r05 tightened
    # that to a loud SystemExit — a non-flag token after --profile that
    # is not a .prof path is ambiguous (profile path or GeoJSON operand?)
    import json
    import os

    import pytest

    from simple_osm_queries_ray import cli

    d = str(tmp_path / "idx")
    write_index(build_repo(SF), d, rows_per_partition=150, num_waves=2)
    out = str(tmp_path / "hits.geojson")
    with pytest.raises(SystemExit, match="ambiguous"):
        cli.main(["query", d, "bbox(9.85,53.45,10.05,53.65).nodes{lang=en}",
                  "--profile", out])
    assert not os.path.exists(out)
    # unambiguous forms still work: explicit .prof path plus the operand
    prof = str(tmp_path / "run.prof")
    assert (
        cli.main(["query", d, "bbox(9.85,53.45,10.05,53.65).nodes{lang=en}",
                  out, "--profile", prof]) == 0
    )
    with open(out) as f:
        gj = json.load(f)
    assert gj["features"], "features must land in the user's operand path"
    assert os.path.exists(prof)


def test_cli_refresh_rejects_cell_size_flags(tmp_path):
    # review r04: refresh silently dropped --cell-width/--cell-height; a
    # scheme change requires re-import and must be rejected loudly
    import pytest

    from simple_osm_queries_ray import cli

    d = str(tmp_path / "idx")
    write_index(build_repo(SF), d, rows_per_partition=150, num_waves=2)
    with pytest.raises(SystemExit, match="cell-width"):
        cli.main(["refresh", SF, d, "--cell-width", "0.05"])
