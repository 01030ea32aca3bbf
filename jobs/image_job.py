"""Cluster job entry: the image-curation pipeline, wave-resumable.

Launch on a real cluster (the north rule's N / 4N fixed-size clusters):

    ray job submit --working-dir /root/repo -- \
        python jobs/image_job.py --sf-dir <data_dir> --out-dir <artifact_dir>

or standalone (auto-inits local Ray). The job synthesizes the Lance-shaped
image table per doc-id wave, runs the curation composite (metadata quality
gate -> actor-pool alignment scoring on survivors only) and writes each
wave's scored survivors as its own parquet partition:

- waves are contiguous doc-id ranges, so a failed run resumes by skipping
  every wave the manifest records (per-partition checkpoint + lineage +
  wall-time metrics, state/manifest.py);
- each wave stages to a temp dir and moves into place atomically — a crash
  mid-wave leaves no partial partition for the rerun to double-count (the
  r02-ADVICE resume-duplication class);
- prints ONE JSON metrics line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--out-dir", default="/tmp/soqr_curated")
    ap.add_argument("--waves", type=int, default=8)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"), include_dashboard=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    from simple_osm_queries_ray.sources.images import image_batch_from_docs
    from simple_osm_queries_ray.sources.read import read_parquet_sized
    from simple_osm_queries_ray.stages.image import alignment_scores, quality_filter
    from simple_osm_queries_ray.state.manifest import Manifest

    os.makedirs(args.out_dir, exist_ok=True)
    meta = {"source": args.sf_dir, "waves": args.waves, "pipeline": "image_curation"}
    manifest = Manifest.load_or_create(args.out_dir, meta)

    import glob

    # crashed staging dirs (write finished, os.replace didn't): never
    # referenced by the manifest, so always safe to remove
    for d in glob.glob(os.path.join(args.out_dir, "soqr_img_w*")):
        shutil.rmtree(d, ignore_errors=True)
    # lineage restart (different source/waves): the fresh manifest rewrites
    # waves 0..N-1, but a PREVIOUS configuration may have left wave=K dirs
    # beyond N that would silently mix two configurations in the out_dir
    if not manifest.waves:
        for d in glob.glob(os.path.join(args.out_dir, "wave=*")):
            shutil.rmtree(d, ignore_errors=True)

    docs = read_parquet_sized(f"{args.sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n_docs = docs.count()
    per_wave = (n_docs + args.waves - 1) // args.waves

    times = {}
    total_rows = 0
    skipped = 0
    t_all = time.time()
    for w in range(args.waves):
        key = f"wave_{w}"
        if manifest.is_done(key):
            skipped += 1
            continue
        lo, hi = w * per_wave, (w + 1) * per_wave
        t0 = time.time()
        wave_docs = docs.filter(
            expr=f"doc_id >= {lo} and doc_id < {hi}"
        )
        imgs = wave_docs.map_batches(
            image_batch_from_docs, batch_format="pyarrow", batch_size=512
        )
        meta_side = quality_filter(imgs.drop_columns(["bytes"])).select_columns(["image_id"])
        ids_ref = ray.put(pa.array(sorted(meta_side.to_pandas()["image_id"])))

        def keep(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.is_in(batch["image_id"], value_set=ray.get(ids_ref)))

        scored = alignment_scores(imgs.map_batches(keep, batch_format="pyarrow"))
        staging = tempfile.mkdtemp(prefix=f"soqr_img_w{w}_", dir=args.out_dir)
        scored.write_parquet(staging)
        rows = pads.dataset(staging).count_rows()
        final = os.path.join(args.out_dir, f"wave={w}")
        shutil.rmtree(final, ignore_errors=True)  # pre-crash partials, if any
        os.replace(staging, final)
        manifest.record(key, {w: int(rows)}, time.time() - t0)
        times[key] = round(time.time() - t0, 3)
        total_rows += int(rows)

    out = {
        "metric": "image_curation_job",
        "docs": int(n_docs),
        "rows_written": int(total_rows),
        "waves": args.waves,
        "waves_skipped": skipped,
        "sec": round(time.time() - t_all, 3),
        "queries": times,
        "out_dir": args.out_dir,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
