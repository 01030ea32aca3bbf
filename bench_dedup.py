"""MinHash-family scale bench on a NON-pathological corpus + the
incremental re-crawl story (closes the BASELINE.md round-5 caveat: the
replicated bench corpora make every replica group a near-dup clique, so
LSH was never benched at scale).

Corpus: sources/synthetic_docs.py — 1M pseudo-random 40-token docs with
~1% planted near-dup PAIRS (candidate volume output-proportional, like a
real deduped web corpus). Measures:

1. batch minhash_lsh_pairs over v1 (pair count must equal the plant);
2. state build (build_minhash_state — the one-time signing investment);
3. batch rerun over the evolved v2 (0.5% changed, 0.5% added, 0.5%
   removed) vs incremental_minhash_dedup from v1 state: identical pair
   sets, delta-only signing, and the wall-clock advantage.

Prints one JSON line; numbers recorded in BASELINE.md."""

import json
import os
import tempfile
import time

N = int(os.environ.get("BENCH_DEDUP_DOCS", "1000000"))
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
THRESHOLD = 0.5


def main() -> None:
    import numpy as np
    import pyarrow as pa
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from simple_osm_queries_ray.pipelines.incremental_dedup import (
        build_minhash_state,
        incremental_minhash_dedup,
    )
    from simple_osm_queries_ray.sources.synthetic_docs import synthetic_docs
    from simple_osm_queries_ray.stages.dedup import minhash_lsh_pairs

    blocks = max(32, N // 31_250)
    v1 = synthetic_docs(N, num_blocks=blocks).materialize()

    t0 = time.time()
    n_pairs_v1 = minhash_lsh_pairs(v1, threshold=THRESHOLD).count()
    t_batch_v1 = time.time() - t0

    state = tempfile.mkdtemp(prefix="soqr_dedup_state_")
    t0 = time.time()
    build_minhash_state(v1, state, threshold=THRESHOLD)
    t_state = time.time() - t0

    # evolved v2: ~0.5% changed (suffix token), ~0.5% removed, ~0.5% added
    n_new = N // 200

    def evolve(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["id"], dtype=np.int64)
        texts = batch["text"]
        old = ids < N
        keep = ~(old & (ids % 211 == 0))
        t = pa.table({"id": batch["id"], "text": texts}).filter(pa.array(keep))
        kid = np.asarray(t["id"], dtype=np.int64)
        changed = (kid < N) & (kid % 200 == 7)
        if changed.any():
            import pyarrow.compute as pc

            suffix = pc.binary_join_element_wise(t["text"], " zz9", "")
            t = t.set_column(1, "text", pc.if_else(pa.array(changed), suffix, t["text"]))
        return t

    v2 = synthetic_docs(N + n_new, num_blocks=blocks).map_batches(
        evolve, batch_format="pyarrow"
    ).materialize()

    t0 = time.time()
    n_pairs_batch_v2 = minhash_lsh_pairs(v2, threshold=THRESHOLD).count()
    t_batch_v2 = time.time() - t0

    stats = {}
    t0 = time.time()
    n_pairs_incr = incremental_minhash_dedup(
        v2, state, threshold=THRESHOLD, stats_out=stats
    ).count()
    t_incr = time.time() - t0

    assert n_pairs_incr == n_pairs_batch_v2, (n_pairs_incr, n_pairs_batch_v2)
    out = {
        "metric": "minhash_dedup_scale",
        "docs": int(N),
        "num_cpus": NUM_CPUS,
        "batch_v1_sec": round(t_batch_v1, 2),
        "pairs_v1": int(n_pairs_v1),
        "state_build_sec": round(t_state, 2),
        "batch_v2_sec": round(t_batch_v2, 2),
        "incremental_v2_sec": round(t_incr, 2),
        "pairs_v2": int(n_pairs_batch_v2),
        "incremental_equals_batch": True,
        "signed_docs": int(stats["signed_docs"]),
        "delta_docs": int(stats["delta_docs"]),
        "stale_docs": int(stats["stale_docs"]),
        "speedup_incremental_vs_batch": round(t_batch_v2 / t_incr, 2),
    }
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
