"""End-to-end OSM import throughput bench (r04 verdict #2): synthetic
sharded ``.osm.pbf`` fixture -> decode -> feature repo (way/relation
assembly, reverse membership, tag dictionary + encode) -> partitioned
on-disk index with manifest, then a resume-from-manifest rerun that must
skip every completed wave.

The reference's headline metric is import MB/s (1.5-2 MB/s single-process,
``/root/reference/README.md:33``; whole-Germany ~4.5 h,
``src/importing/import.go:75``). PBF zlib squeezes the synthetic fixture
far below real-world bytes/node (~3 vs ~10), so elements/s is reported
alongside MB/s — the decode work scales with elements, not compressed
bytes. Prints one JSON line; numbers recorded in BASELINE.md.

Fixture is cached under /tmp keyed by (nodes, shard size): reruns skip
generation."""

import json
import os
import time

N_NODES = int(os.environ.get("BENCH_IMPORT_NODES", "20000000"))
NODES_PER_SHARD = int(os.environ.get("BENCH_IMPORT_SHARD", "500000"))
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from simple_osm_queries_ray.pipelines.build_index import write_index
    from simple_osm_queries_ray.pipelines.import_osm import (
        _read_elements,
        build_repo_from_elements,
    )
    from simple_osm_queries_ray.sources.synthetic_pbf import write_synthetic_pbf

    fix_dir = f"/tmp/soqr_import_fixture_{N_NODES}_{NODES_PER_SHARD}"
    t0 = time.time()
    paths, pbf_bytes = write_synthetic_pbf(fix_dir, N_NODES, nodes_per_shard=NODES_PER_SHARD)
    t_fixture = time.time() - t0  # untimed vs the import metric; reported FYI

    times = {}
    t0 = time.time()
    elems = _read_elements(paths).materialize()
    n_elems = elems.count()
    times["decode"] = time.time() - t0

    t0 = time.time()
    repo = build_repo_from_elements(elems, materialize=True)
    n_nodes = repo.nodes.count()
    n_ways = repo.ways.count()
    n_rels = repo.relations.count()
    times["repo_build"] = time.time() - t0  # graph attach + dictionary + encode

    import shutil
    import tempfile

    idx = tempfile.mkdtemp(prefix="soqr_import_idx_")
    shutil.rmtree(idx)
    t0 = time.time()
    write_index(repo, idx, rows_per_partition=2_000_000, num_waves=6)
    times["index_write"] = time.time() - t0  # density plan + wave writes

    total = sum(times.values())

    # resume-from-manifest: a second write_index into the same dir must skip
    # every wave (manifest-complete) and touch no feature data
    t0 = time.time()
    write_index(repo, idx, rows_per_partition=2_000_000, num_waves=6)
    t_resume = time.time() - t0
    waves_done = len(json.load(open(os.path.join(idx, "manifest.json")))["waves"])

    out = {
        "metric": "import_mb_per_s",
        "value": round(pbf_bytes / 1e6 / total, 3),
        "unit": "MB/s",
        "pbf_bytes": int(pbf_bytes),
        "shards": len(paths),
        "elements": int(n_elems),
        "features": {"nodes": int(n_nodes), "ways": int(n_ways), "relations": int(n_rels)},
        "sec": round(total, 3),
        "passes": {k: round(v, 3) for k, v in times.items()},
        "elements_per_s": round(n_elems / total, 1),
        "mb_per_s_per_core": round(pbf_bytes / 1e6 / total / NUM_CPUS, 4),
        "fixture_sec": round(t_fixture, 3),
        "resume_sec": round(t_resume, 3),
        "resume_waves_skipped": int(waves_done),
        "num_cpus": NUM_CPUS,
    }
    shutil.rmtree(idx, ignore_errors=True)
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
