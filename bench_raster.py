"""Optional raster/space-filling-family scale bench (not part of the
driver's BENCH artifact): times the round-2 raster operators at bench scale
— 10 M generated points for Hilbert sharding / focal density / zonal stats,
2 M assembled ways for supercover tracing, and a zoom-15 scanline fill
(~0.5 M tiles over 64 geofences) — evidence the scanline fan-out, the
scatter-window groupbys and the two-pass histogram shard plan hold when
the inputs no longer resemble the sf0.01 test tables.  Prints one JSON
line; numbers recorded in BASELINE.md."""

import json
import os
import time

REPL = int(os.environ.get("BENCH_RASTER_REPLICATE", "2000"))
SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def main() -> None:
    import numpy as np
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

    import pyarrow as pa

    from simple_osm_queries_ray.sources.synthetic import (
        generated_points,
        synthetic_polygons,
    )
    from simple_osm_queries_ray.stages.raster import (
        polygon_raster_tiles,
        tile_focal_density,
        way_segment_tiles,
        zonal_stats,
    )
    from simple_osm_queries_ray.stages.spacefill import hilbert_shards

    times, counts = {}, {}

    pts = generated_points(SF, replicate=REPL).materialize()
    n_pts = pts.count()

    # 1. zoom-15 scanline fill over the 64 geofences (~0.5 M tiles)
    t0 = time.time()
    counts["polygon_tiles"] = polygon_raster_tiles(
        synthetic_polygons(64), zoom=15
    ).count()
    times["polygon_tiles_z15"] = round(time.time() - t0, 3)

    # 2. Hilbert equal-count sharding of the 10 M points (two streaming passes)
    t0 = time.time()
    sh = hilbert_shards(pts, k=256)

    # consume via per-batch partial shard counts (256-row partials, tiny
    # groupby) — checks balance without shuffling the stamped rows
    def shard_partial(b: pa.Table) -> pa.Table:
        s, c = np.unique(np.asarray(b["shard"]), return_counts=True)
        return pa.table({"shard": s, "n": c.astype(np.int64)})

    sizes = (
        sh.map_batches(shard_partial, batch_format="pyarrow")
        .repartition(4)
        .groupby("shard")
        .sum("n")
        .to_pandas()
    )
    times["hilbert_shards_k256"] = round(time.time() - t0, 3)
    counts["shard_skew"] = int(sizes["sum(n)"].max() - sizes["sum(n)"].min())

    # 3. focal density (5x5 window) over the 10 M points at zoom 12
    t0 = time.time()
    counts["focal_tiles"] = tile_focal_density(pts, zoom=12, radius=2).count()
    times["focal_density_z12"] = round(time.time() - t0, 3)

    # 4. zonal stats: 64 polygons x per-tile aggregates of the 10 M points
    t0 = time.time()
    with_val = pts.map_batches(
        lambda b: b.append_column(
            "n_chars", pa.array(np.asarray(b["id"]) % 997 + 1)
        ),
        batch_format="pyarrow",
    )
    counts["zonal_rows"] = zonal_stats(
        with_val, synthetic_polygons(64), zoom=12
    ).count()
    times["zonal_stats_z12"] = round(time.time() - t0, 3)

    # 5. supercover tracing of 2 M assembled ways. The generated "ways" join
    # 5 hash-scattered points, so each segment spans ~1 degree — a worst-case
    # long-segment stress; zoom 11 keeps the output at ~37 M (way, tile)
    # pairs (real road segments are tile-sized and emit 1-3 candidates).
    from simple_osm_queries_ray.pipelines.build_graph import build_ways_local_first

    t0 = time.time()
    ways = build_ways_local_first(pts)
    counts["way_trace"] = way_segment_tiles(ways, zoom=11).count()
    times["way_trace_z11"] = round(time.time() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "raster_family_total_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "counts": counts,
                "rows": n_pts,
                "sf": SF,
                "num_cpus": NUM_CPUS,
                "replicate": REPL,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
