"""CLI entry points: import (index build) and query, mirroring the reference
commands (``/root/reference/src/main.go:85-123``; the HTTP server S8 is a
thin wrapper around the same query path and is out of scope for the core).

Usage (run from the repo root so workers resolve the package):

    python -m simple_osm_queries_ray.cli import <sf_dir|file.osm[.bz2|.gz]|file.pbf> <index_dir> [delta.osc ...]
    python -m simple_osm_queries_ray.cli refresh <src> <index_dir> [deltas.osc...]
    python -m simple_osm_queries_ray.cli query <index_dir> '<query>' [out.geojson|--explain|--profile [q.prof]]
    python -m simple_osm_queries_ray.cli stats <index_dir>
    python -m simple_osm_queries_ray.cli server <index_dir> [port]
    python -m simple_osm_queries_ray.cli shard <sf_dir> <out_dir> [k] [waves]
"""

from __future__ import annotations

import sys


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(__doc__)
        return 2
    cmd = argv[0]

    import ray

    # only shut Ray down if THIS call initialized it: when main() runs
    # embedded (tests, a server framework, repeated in-process calls) a
    # shutdown would orphan every Dataset the host session still holds
    owns_ray = not ray.is_initialized()
    if owns_ray:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    try:
        if cmd == "import":
            src, index_dir = argv[1], argv[2]
            changes = [a for a in argv[3:] if a.endswith(".osc")]
            from .pipelines.build_index import write_index

            # reference parity: `--cell-width W --cell-height H` mirror the
            # Import cellWidth/cellHeight parameters (src/main.go:87)
            scheme = None
            if "--cell-width" in argv or "--cell-height" in argv:
                from .functions.hiercell import GridCellScheme

                def _flag(name, default):
                    if name not in argv:
                        return default
                    i = argv.index(name)
                    if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
                        raise SystemExit(f"{name} requires a numeric value")
                    try:
                        return float(argv[i + 1])
                    except ValueError:
                        raise SystemExit(
                            f"{name} requires a numeric value, got {argv[i + 1]!r}"
                        ) from None

                scheme = GridCellScheme(
                    _flag("--cell-width", 0.1), _flag("--cell-height", 0.1)
                )
            if src.endswith((".osm", ".pbf", ".bz2", ".gz")):
                # real OSM input (reference `import` path, main.go:70-96);
                # trailing .osc args apply as osmChange deltas
                from .pipelines.import_osm import import_osm, import_osm_with_changes

                repo = (
                    import_osm_with_changes(src, changes, cell_scheme=scheme)
                    if changes
                    else import_osm(src, cell_scheme=scheme)
                )
            else:
                # synthetic derivation from a testdata sf directory
                from .sources.repo import build_repo

                repo = build_repo(src, cell_scheme=scheme)
            manifest = write_index(repo, index_dir, cell_scheme=scheme)
            print(f"index written to {index_dir}: {manifest.total_rows()} rows over "
                  f"{len(manifest.waves)} waves")
            return 0
        if cmd == "refresh":
            # incremental maintenance: rebuild the repo from <src> (+ .osc
            # deltas) and rewrite ONLY the changed partitions of an existing
            # index under its original plan
            src, index_dir = argv[1], argv[2]
            if "--cell-width" in argv or "--cell-height" in argv:
                # refresh rewrites partitions under the index's PERSISTED
                # scheme — accepting (and ignoring) a cell-size flag here
                # would hide user error; a scheme change needs a re-import
                raise SystemExit(
                    "refresh does not take --cell-width/--cell-height: the "
                    "index's persisted scheme is used; re-run `import` to "
                    "change the cell size"
                )
            changes = [a for a in argv[3:] if a.endswith(".osc")]
            import os as _os

            from .pipelines.build_index import refresh_index

            # the refreshed repo MUST be rebuilt with the scheme the index
            # was written with (persisted scheme.json) — a default-grid
            # rebuild of a custom-cell index would rewrite partitions whose
            # cell ids no query probe could ever match
            scheme = None
            scheme_path = _os.path.join(index_dir, "scheme.json")
            if _os.path.exists(scheme_path):
                import json as _json

                from .functions.hiercell import scheme_from_json

                with open(scheme_path) as f:
                    scheme = scheme_from_json(_json.load(f))
            # STABLE dictionary evolution: rebuild the repo against the
            # index's persisted tag dictionary (extended_with) so existing
            # key indices never move and unchanged features re-encode
            # byte-identically — otherwise one novel tag key would shift
            # the dictionary and cascade a rewrite of every partition whose
            # features carry a later-sorting key
            from .functions.tags import TagIndex

            base_ti = None
            ti_path = _os.path.join(index_dir, "tag-index")
            if _os.path.exists(ti_path):
                base_ti = TagIndex.load(ti_path)
            if src.endswith((".osm", ".pbf", ".bz2", ".gz")):
                from .pipelines.import_osm import import_osm, import_osm_with_changes

                repo = (
                    import_osm_with_changes(
                        src, changes, cell_scheme=scheme, base_tag_index=base_ti
                    )
                    if changes
                    else import_osm(src, cell_scheme=scheme, base_tag_index=base_ti)
                )
            else:
                from .sources.repo import build_repo

                repo = build_repo(src, cell_scheme=scheme, base_tag_index=base_ti)
            report = refresh_index(index_dir, repo)
            import json as _json

            print(_json.dumps(report))
            return 0
        if cmd == "query":
            index_dir, qtext = argv[1], argv[2]
            if "--explain" in argv:
                import json as _json

                from .pipelines.build_index import DiskRepo
                from .pipelines.query import QueryEngine

                plan = QueryEngine(DiskRepo(index_dir)).explain_string(qtext)
                print(_json.dumps(plan, indent=1))
                return 0
            # --profile [path.prof]: the reference's --profiling CPU-profile
            # flag (src/main.go:73-83) — wrap the DRIVER side in cProfile
            # (worker-side cost shows up in the per-dataset ds.stats(),
            # printed alongside) and write a pstats artifact
            profile_path = None
            if "--profile" in argv:
                i = argv.index("--profile")
                # only a .prof token binds as the profile path: anything else
                # after --profile is a positional operand (e.g. out.geojson) —
                # consuming it silently redirected the user's GeoJSON path
                # into the pstats artifact
                if len(argv) > i + 1 and not argv[i + 1].startswith("--"):
                    if not argv[i + 1].endswith(".prof"):
                        # ambiguous: is this the profile path or a positional
                        # operand (e.g. the GeoJSON output)? Guessing either
                        # way silently misroutes a file — refuse instead.
                        raise SystemExit(
                            f"--profile: ambiguous token {argv[i + 1]!r} — "
                            "profile paths must end in .prof (move positional "
                            "operands before --profile)"
                        )
                    profile_path = argv[i + 1]
                    argv = argv[:i] + argv[i + 2 :]
                else:
                    profile_path = "query.prof"
                    argv = argv[:i] + argv[i + 1 :]
            out = argv[3] if len(argv) > 3 else "output.geojson"
            from .model import QUERY_TYPE_TO_OBJECT_TYPE
            from .parser import parse_query
            from .pipelines.build_index import DiskRepo
            from .pipelines.query import QueryEngine
            from .sources.geojson import write_geojson

            repo = DiskRepo(index_dir)
            engine = QueryEngine(repo)
            query = parse_query(qtext, repo.tag_index)

            def run_query() -> int:
                total = 0
                # one file per statement type keeps geometry homogeneous; the
                # reference concatenates — same for single-statement queries
                for stmt in query.statements:
                    ds = engine.execute_statement(stmt, project=False)
                    total += write_geojson(
                        ds, out, repo.tag_index, QUERY_TYPE_TO_OBJECT_TYPE[stmt.query_type]
                    )
                    if profile_path:
                        print(ds.stats(), file=sys.stderr)
                return total

            if profile_path:
                import cProfile
                import pstats

                prof = cProfile.Profile()
                total = prof.runcall(run_query)
                prof.dump_stats(profile_path)
                pstats.Stats(prof).sort_stats("cumulative").print_stats(15)
                print(f"profile written to {profile_path}")
            else:
                total = run_query()
            print(f"wrote {total} features to {out}")
            return 0
        if cmd == "stats":
            # index observability: manifest waves/rows, partition counts,
            # zone-map coverage, refresh-hash presence
            index_dir = argv[1]
            import glob as _glob
            import json as _json
            import os

            out = {"index_dir": index_dir}
            with open(os.path.join(index_dir, "manifest.json")) as f:
                man = _json.load(f)
            out["waves"] = len(man.get("waves", {}))
            out["rows"] = sum(w["rows"] for w in man.get("waves", {}).values())
            out["build_seconds"] = round(
                sum(w.get("seconds", 0) for w in man.get("waves", {}).values()), 3
            )
            out["partitions"] = {
                ot: len(_glob.glob(os.path.join(index_dir, ot, "pid=*")))
                for ot in ("node", "way", "relation")
            }
            zm_path = os.path.join(index_dir, "zonemap.json")
            if os.path.exists(zm_path):
                with open(zm_path) as f:
                    zm = _json.load(f)
                out["zonemap_keys"] = {
                    ot: sorted({int(k) for pid in zm.get(ot, {}).values() for k in pid})
                    for ot in zm
                }
            out["refresh_hashes"] = os.path.exists(
                os.path.join(index_dir, "part-hashes.json")
            )
            print(_json.dumps(out, indent=1))
            return 0
        if cmd == "shard":
            # equal-count Hilbert locality sharding -> hive-partitioned
            # parquet with manifest resume (stages/spacefill.py)
            sf_dir, out_dir = argv[1], argv[2]
            k = int(argv[3]) if len(argv) > 3 else 32
            waves = int(argv[4]) if len(argv) > 4 else 4
            from .sources.repo import build_repo
            from .stages.spacefill import write_hilbert_partitioned

            nodes = build_repo(sf_dir).nodes
            man = write_hilbert_partitioned(
                nodes, out_dir, k=k, waves=waves, lineage={"source": sf_dir}
            )
            print(
                f"sharded {man.total_rows()} rows into {k} hilbert partitions "
                f"under {out_dir}/data ({len(man.waves)} waves)"
            )
            return 0
        if cmd == "server":
            index_dir = argv[1]
            port = int(argv[2]) if len(argv) > 2 else 8080
            from .pipelines.build_index import DiskRepo
            from .pipelines.query import QueryEngine
            from .server import serve

            srv = serve(QueryEngine(DiskRepo(index_dir)), port=port)
            print(f"listening on http://127.0.0.1:{port} (POST /query)")
            try:
                srv.serve_forever()
            except KeyboardInterrupt:
                pass
            return 0
    finally:
        if owns_ray:
            ray.shutdown()
    print(f"unknown command {cmd!r}")
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
