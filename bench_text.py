"""Optional text/dedup-family scale bench (not part of the driver's
BENCH artifact): replicates the 500-row documents table to ~100k distinct
docs and times the training-data operators end-to-end at that scale —
evidence the round-2 distributed rewrites (trigram explode-join, bucketed
LSH verify, streaming probes) hold when the corpus no longer fits a
broadcast. Prints one JSON line; numbers recorded in BASELINE.md."""

import json
import os
import time

REPL = int(os.environ.get("BENCH_TEXT_REPLICATE", "200"))
SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def main() -> None:
    import numpy as np
    import pyarrow as pa
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from simple_osm_queries_ray.sources.read import read_parquet_sized

    base = read_parquet_sized(f"{SF}/documents.parquet", columns=["doc_id", "text"])

    def replicate(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        texts = batch["text"].to_pylist()
        out_ids, out_txt = [], []
        for r in range(REPL):
            out_ids.append(ids + r * 1_000_000)
            # vary a suffix token so replicas are near- but not exact dups
            out_txt.extend(f"{t} rep{r}" for t in texts)
        return pa.table(
            {"doc_id": pa.array(np.concatenate(out_ids)), "text": pa.array(out_txt)}
        )

    docs = base.map_batches(replicate, batch_format="pyarrow").repartition(64).materialize()
    n = docs.count()
    times = {}

    from simple_osm_queries_ray.stages.dedup import dup_span_docs, exact_dedup_keep_ids
    from simple_osm_queries_ray.stages.text import analyze_text, fingerprints

    # per-stage min over BENCH_TEXT_RUNS warm passes (same discipline as
    # bench.py): pass 1 pays worker spin-up, per-worker caches and page
    # faults — measured 17.5 / 5.3 / 1.4 s for identical fingerprint runs —
    # and the steady state is what the 100 TB pipeline would see
    runs = int(os.environ.get("BENCH_TEXT_RUNS", "2"))
    kept = stats = fps = spans = 0
    for _ in range(runs):
        t0 = time.time(); kept = exact_dedup_keep_ids(docs, id_col="doc_id").count()
        times["dedup_exact"] = min(round(time.time() - t0, 3), times.get("dedup_exact", 1e9))
        t0 = time.time(); stats = analyze_text(docs).count()
        times["text_stats"] = min(round(time.time() - t0, 3), times.get("text_stats", 1e9))
        t0 = time.time(); fps = fingerprints(docs).count()
        times["fingerprints"] = min(round(time.time() - t0, 3), times.get("fingerprints", 1e9))
        t0 = time.time(); spans = dup_span_docs(docs).count()
        times["dup_span_docs"] = min(round(time.time() - t0, 3), times.get("dup_span_docs", 1e9))

    total = sum(times.values())
    print(json.dumps({
        "metric": "text_family_rows_per_s",
        "value": round(total, 3), "unit": "sec",
        "queries": times, "rows": int(n),
        "rows_per_s": round(4 * n / total, 1),
        "counts": {"kept": int(kept), "stats": int(stats), "fp": int(fps), "span_docs": int(spans)},
        "replicate": REPL, "num_cpus": NUM_CPUS, "sf": SF,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
