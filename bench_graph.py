"""Optional family-scale bench: graph traversal + trajectory operators.

Not part of the driver's per-round artifact (that is bench.py); this records
scale evidence for the round-3 operator families in BASELINE.md, like
bench_text.py / bench_raster.py do for theirs.

- proximity BFS over ~500 k points (sf0.1 x 100 replicas) with eps sized so
  the hot cluster keeps a bounded degree (~50) — the eps-graph edges come
  from the distributed radius_join buckets, rounds are map-only broadcast
  probes at this vertex count;
- user_trip_length / trip_segments over replicated events (shifted user and
  event ids so geolocation and bucketing stay varied): one hash(user)-bucket
  shuffle each, vectorized per bucket.

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
POINT_REPLICATE = int(os.environ.get("BENCH_GRAPH_POINTS_REPLICATE", "100"))
EVENT_REPLICATE = int(os.environ.get("BENCH_GRAPH_EVENTS_REPLICATE", "100"))
BFS_EPS = float(os.environ.get("BENCH_GRAPH_EPS", "0.001"))
BFS_ROUNDS = int(os.environ.get("BENCH_GRAPH_ROUNDS", "8"))


def main() -> int:
    import numpy as np
    import pyarrow as pa
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from simple_osm_queries_ray.sources.read import read_parquet_sized
    from simple_osm_queries_ray.sources.synthetic import REP_STRIDE, generated_points
    from simple_osm_queries_ray.stages.graph import proximity_bfs
    from simple_osm_queries_ray.stages.text import trip_segments, user_trip_length

    times: dict[str, float] = {}
    counts: dict[str, int] = {}

    # --- graph: BFS over the eps-proximity graph ---------------------------
    points = generated_points(SF_DIR, replicate=POINT_REPLICATE).materialize()
    n_points = points.count()
    t0 = time.time()
    hops = proximity_bfs(points, BFS_EPS, source_id=0, max_rounds=BFS_ROUNDS)
    counts["bfs_reached"] = hops.count()
    times["proximity_bfs"] = time.time() - t0

    # --- trajectories: replicated events -----------------------------------
    ev = read_parquet_sized(
        f"{SF_DIR}/events.parquet", columns=["event_id", "ts", "user_id"]
    )

    def replicate_events(batch: pa.Table) -> pa.Table:
        n = len(batch)
        rep = batch.take(pa.array(np.tile(np.arange(n), EVENT_REPLICATE)))
        r = np.repeat(np.arange(EVENT_REPLICATE, dtype=np.int64), n)
        eid = np.asarray(rep["event_id"], dtype=np.int64) + r * REP_STRIDE
        uid = np.asarray(rep["user_id"], dtype=np.int64) + r * 1000
        return pa.table(
            {"event_id": pa.array(eid), "ts": rep["ts"], "user_id": pa.array(uid)}
        )

    # the trajectory ops read "<sf_dir>/events.parquet" — stage the
    # replicated table under a shim sf_dir
    import shutil

    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    shim_sf = "/tmp/soqr_bench_graph_sf"
    shutil.rmtree(shim_sf, ignore_errors=True)
    os.makedirs(shim_sf, exist_ok=True)
    tmp_dir = f"{shim_sf}/_staging"
    ev.map_batches(replicate_events, batch_format="pyarrow").write_parquet(tmp_dir)
    tbl = pads.dataset(tmp_dir).to_table()
    n_events = tbl.num_rows
    pq.write_table(tbl, f"{shim_sf}/events.parquet", row_group_size=1 << 18)
    shutil.rmtree(tmp_dir, ignore_errors=True)

    t0 = time.time()
    counts["trip_users"] = user_trip_length(shim_sf).count()
    times["user_trip_length"] = time.time() - t0

    t0 = time.time()
    counts["trip_segments"] = trip_segments(shim_sf, eps=0.5).count()
    times["trip_segments"] = time.time() - t0

    total = sum(times.values())
    print(
        json.dumps(
            {
                "metric": "graph_trajectory_family_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in times.items()},
                "counts": counts,
                "rows": {"points": int(n_points), "events": int(n_events)},
                "sf": SF_DIR,
                "num_cpus": NUM_CPUS,
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
