"""Optional image-family scale bench (not part of the driver's BENCH
artifact): replicates the documents table to BENCH_IMG_REPLICATE x its
row count of distinct synthetic images (ids offset per replica so sizes,
formats and phashes all vary) and times the payload and metadata operator
tiers end-to-end — evidence the actor-pool decode plumbing, the
metadata-only discipline (quality gates / bucketing never touch bytes)
and the byte-budget shard packing hold at corpus scale. Prints one JSON
line; numbers recorded in BASELINE.md."""

import json
import os
import time

REPL = int(os.environ.get("BENCH_IMG_REPLICATE", "4"))
SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
STRIDE = 1_000_000


def main() -> None:
    import numpy as np
    import pyarrow as pa
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from simple_osm_queries_ray.sources.images import image_batch_from_docs
    from simple_osm_queries_ray.sources.read import read_parquet_sized

    base = read_parquet_sized(f"{SF}/documents.parquet", columns=["doc_id", "text"])

    def replicate(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        txt = batch["text"]
        out = []
        for r in range(REPL):
            out.append(pa.table({"doc_id": pa.array(ids + r * STRIDE), "text": txt}))
        return pa.concat_tables(out)

    docs = base.map_batches(replicate, batch_format="pyarrow").repartition(
        max(NUM_CPUS * 4, 64)
    )
    # payload tier input: the full synthetic encode (binary bytes column)
    images = docs.map_batches(
        image_batch_from_docs, batch_format="pyarrow", batch_size=512
    ).materialize()
    n = images.count()
    times = {}
    counts = {}

    from simple_osm_queries_ray.stages.image import (
        aspect_ratio_buckets,
        decode_features,
        phash_near_dup,
        resize_images,
    )

    # payload tier: actor-pool decode + feature extraction over bytes
    t0 = time.time()
    counts["decoded"] = decode_features(images).count()
    times["decode_features"] = round(time.time() - t0, 3)

    t0 = time.time()
    counts["resized"] = resize_images(images, 16, 16).count()
    times["resize_images"] = round(time.time() - t0, 3)

    # metadata tier: never touches the bytes column
    meta = images.drop_columns(["bytes"]).materialize()
    t0 = time.time()
    counts["aspect_rows"] = aspect_ratio_buckets(meta).count()
    times["aspect_buckets"] = round(time.time() - t0, 3)

    t0 = time.time()
    counts["near_dup_pairs"] = phash_near_dup(meta, max_hamming=2).count()
    times["phash_near_dup"] = round(time.time() - t0, 3)

    # shard packing: sizes from the real bytes column, two-tier prefix sum
    from simple_osm_queries_ray.stages.image import image_shard_packing

    t0 = time.time()
    shards = image_shard_packing(SF)  # sf-scale: exercises the full plan
    counts["packed"] = shards.count()
    times["image_shard_packing"] = round(time.time() - t0, 3)

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "image_family_sec",
        "value": total,
        "unit": "sec",
        "images": int(n),
        "queries": times,
        "counts": {k: int(v) for k, v in counts.items()},
        "sf": SF,
        "replicate": REPL,
        "num_cpus": NUM_CPUS,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
