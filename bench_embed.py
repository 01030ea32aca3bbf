"""Optional embedding-family recall/scale bench (not part of the driver's
BENCH artifact): measures IVF ANN recall@10 as a function of nprobe against
the exact brute-force tier, on BOTH corpus shapes —

- ``clustered``: sources/clustered_embeddings (64 natural clusters), the
  workload IVF exists for; recall should be high even at nprobe=1;
- ``random``: the sf embeddings table (uniform vectors, IVF's worst case);
  recall climbs with nprobe and must reach 1.0 at nprobe = n_lists, which
  also re-verifies that probing every list equals brute force.

Prints one JSON line; numbers recorded in BASELINE.md."""

import json
import os
import time

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_CLUSTERED = int(os.environ.get("BENCH_EMBED_N", "200000"))
K = 10
N_LISTS = 16
NPROBES = (1, 2, 4, 8, 16)


def main() -> None:
    import numpy as np
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import tempfile

    from simple_osm_queries_ray.sources.clustered_embeddings import (
        clustered_embeddings,
    )
    from simple_osm_queries_ray.sources.read import read_parquet_sized
    from simple_osm_queries_ray.stages.embed import (
        _normalize,
        _query_matrix,
        ann_search,
        build_ivf_index,
        ivf_probe_search,
    )

    out = {"metric": "ivf_recall_at_10", "k": K, "n_lists": N_LISTS,
           "num_cpus": NUM_CPUS, "corpora": {}}

    corpora = {
        "clustered": clustered_embeddings(
            N_CLUSTERED, dim=32, n_clusters=64, num_blocks=64
        ).materialize(),
        "random": read_parquet_sized(
            f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).materialize(),
    }
    for name, ds in corpora.items():
        n = ds.count()
        queries = list(range(0, min(2000, n), 40))  # 50 query ids
        t0 = time.time()
        exact = ann_search(ds, queries, K).to_pandas()
        t_exact = time.time() - t0
        truth = {q: set(exact[exact.qid == q].vec_id) for q in queries}

        idx = tempfile.mkdtemp(prefix=f"soqr_ivf_bench_{name}_")
        t0 = time.time()
        cents = build_ivf_index(ds, idx, n_lists=N_LISTS)
        t_build = time.time() - t0
        q_ids, q_vecs = _query_matrix(ds, queries, "vec_id", "embedding")
        curve = {}
        for nprobe in NPROBES:
            t0 = time.time()
            got = ivf_probe_search(idx, cents, q_ids, q_vecs, K, nprobe=nprobe).to_pandas()
            sec = time.time() - t0
            rec = float(np.mean([
                len(truth[q] & set(got[got.qid == q].vec_id)) / max(1, len(truth[q]))
                for q in queries
            ]))
            curve[str(nprobe)] = {"recall": round(rec, 4), "sec": round(sec, 3)}
        out["corpora"][name] = {
            "rows": int(n),
            "queries": len(queries),
            "exact_sec": round(t_exact, 3),
            "build_sec": round(t_build, 3),
            "recall_by_nprobe": curve,
        }
        assert out["corpora"][name]["recall_by_nprobe"][str(N_LISTS)]["recall"] == 1.0, (
            "probing every list must equal brute force"
        )
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
