"""Run artifact: result + lineage + metrics for a pipeline execution.

The north rule requires pipelines "resumable from per-partition checkpoints
with lineage and metrics". The build side lives in state/manifest.py; this is
the query/run side: execute a Dataset, write its result as partitioned
parquet, and drop a ``run.json`` next to it recording input lineage (caller-
supplied), row count, wall time, and Ray Data's own per-operator stats
string — enough to audit what ran, over what, and where time went.
"""

from __future__ import annotations

import json
import os
import time


def run_logged(ds, out_dir: str, lineage: dict) -> dict:
    """Write ``ds`` to ``out_dir/result/`` and a ``run.json`` manifest.

    Returns the manifest dict. Re-running with identical lineage and an
    existing complete artifact is a no-op (cheap resume for whole-run
    granularity; wave-level resume is write_index's job)."""
    meta_path = os.path.join(out_dir, "run.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            prior = json.load(f)
        if prior.get("lineage") == lineage and prior.get("complete"):
            return prior
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    result_dir = os.path.join(out_dir, "result")
    # stage + atomic replace (the image_job discipline): writing straight
    # into an existing result/ leaves a crashed or different-lineage run's
    # files alongside the new ones — uniquely-named parquet files mean the
    # combined dir double-counts rows and run.json records the wrong count
    import shutil
    import tempfile

    staging = tempfile.mkdtemp(prefix="soqr_run_", dir=out_dir)
    try:
        ds.write_parquet(staging)
        if os.path.isdir(result_dir):
            shutil.rmtree(result_dir)
        os.replace(staging, result_dir)
    except BaseException:
        shutil.rmtree(staging, ignore_errors=True)
        raise
    import pyarrow.dataset as pads

    rows = pads.dataset(result_dir).count_rows()
    manifest = {
        "lineage": lineage,
        "rows": int(rows),
        "seconds": round(time.time() - t0, 3),
        "finished_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "ray_stats": ds.stats(),
        "complete": True,
    }
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, meta_path)
    return manifest
