"""Cluster job entry: the headline spatial-join + tile-assignment pipeline.

Launch on a real cluster (the north rule's N / 4N fixed-size clusters):

    ray job submit --working-dir /root/repo -- \
        python jobs/spatial_job.py --sf-dir <data_dir> --index-dir <out_dir>

or standalone on one machine (auto-inits local Ray). The job:

1. builds (or resumes, via the manifest) the persistent cell index;
2. runs the 64-geofence polygon join and the zoom-12 tile histogram;
3. prints one JSON metrics line (rows, per-stage seconds, throughput).

Re-running after a failure skips every index wave the manifest already
records (per-partition checkpointing with lineage, state/manifest.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--index-dir", default="/tmp/soqr_index")
    ap.add_argument("--zoom", type=int, default=12)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import numpy as np

    from ray.data.aggregate import Sum

    from simple_osm_queries_ray.pipelines.build_index import DiskRepo, write_index
    from simple_osm_queries_ray.sources.repo import build_repo
    from simple_osm_queries_ray.sources.synthetic import synthetic_polygons
    from simple_osm_queries_ray.stages.geo import assign_tiles, polygon_join

    times = {}
    t0 = time.time()
    manifest = write_index(build_repo(args.sf_dir), args.index_dir)
    times["index_build_or_resume"] = round(time.time() - t0, 3)

    repo = DiskRepo(args.index_dir)
    nodes = repo.table("node")

    t0 = time.time()
    n_pairs = polygon_join(nodes, synthetic_polygons(64)).count()
    times["polygon_join"] = round(time.time() - t0, 3)

    # tile-assignment result persisted as a run artifact (lineage + metrics,
    # state/runlog.py) so a rerun with the same inputs is a no-op
    from simple_osm_queries_ray.state.runlog import run_logged

    t0 = time.time()

    def partial(batch):
        import pyarrow as pa

        t, c = np.unique(np.asarray(batch["tile"], dtype=np.int64), return_counts=True)
        return pa.table({"tile": pa.array(t), "n": pa.array(c.astype(np.int64))})

    hist = (
        assign_tiles(nodes, args.zoom)
        .map_batches(partial, batch_format="pyarrow")
        .repartition(8)
        .groupby("tile")
        .aggregate(Sum("n", alias_name="n"))
    )
    run_meta = run_logged(
        hist,
        os.path.join(args.index_dir, "tile-hist-run"),
        {"input": args.sf_dir, "op": "tile_assign_hist", "zoom": args.zoom},
    )
    n_tiles = run_meta["rows"]
    times["tile_assign_hist"] = round(time.time() - t0, 3)

    n_rows = nodes.count()
    print(
        json.dumps(
            {
                "rows": int(n_rows),
                "index_rows": manifest.total_rows(),
                "poly_pairs": int(n_pairs),
                "tiles": int(n_tiles),
                "seconds": times,
                "rows_per_s": round(
                    2 * n_rows / (times["polygon_join"] + times["tile_assign_hist"]), 1
                ),
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
