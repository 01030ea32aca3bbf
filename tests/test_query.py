"""Query-level golden tests against the brute-force oracle
(FIXTURES.md section 4 conformance vectors)."""

import pytest

from simple_osm_queries_ray.pipelines.query import QueryEngine
from simple_osm_queries_ray.sources.repo import build_repo

import oracle

SF = "/root/testdata/sf0.001"
BBOX = (9.0, 53.0, 11.0, 55.0)  # whole synthetic extent
SMALL = (9.85, 53.45, 10.05, 53.65)  # covers the hot cell + neighbours


@pytest.fixture(scope="module")
def engine():
    return QueryEngine(build_repo(SF))


@pytest.fixture(scope="module")
def graph():
    return oracle.build_oracle_graph(SF)


def ids(ds):
    df = ds.to_pandas()
    return set(df["id"]) if "id" in df.columns else set()


def q(engine, text):
    return ids(engine.execute_string(text))


def bbox_str(b):
    return f"bbox({b[0]},{b[1]},{b[2]},{b[3]})"


def test_key_wildcard(engine, graph):
    nodes_df, _, _ = graph
    got = q(engine, f"{bbox_str(BBOX)}.nodes{{lang=*}}")
    exp = oracle.select_nodes(nodes_df, BBOX, lambda r: "lang" in r.tags)
    assert got == exp


def test_eq_and_negated_wildcard(engine, graph):
    nodes_df, _, _ = graph
    got = q(engine, f"{bbox_str(BBOX)}.nodes{{lang=de AND source!=*}}")
    exp = oracle.select_nodes(
        nodes_df, BBOX, lambda r: r.tags.get("lang") == "de" and "source" not in r.tags
    )
    assert got == exp  # every node has source -> empty, engine must agree
    assert got == set()


def test_eq(engine, graph):
    nodes_df, _, _ = graph
    got = q(engine, f"{bbox_str(SMALL)}.nodes{{lang=en}}")
    exp = oracle.select_nodes(nodes_df, SMALL, lambda r: r.tags.get("lang") == "en")
    assert got == exp and got


def test_neq_requires_key(engine, graph):
    nodes_df, _, _ = graph
    got = q(engine, f"{bbox_str(BBOX)}.nodes{{lang!=en}}")
    exp = oracle.select_nodes(
        nodes_df, BBOX, lambda r: "lang" in r.tags and r.tags["lang"] != "en"
    )
    assert got == exp and got


def test_numeric_comparison_with_rewrite(engine, graph):
    nodes_df, _, _ = graph
    # n_chars dictionary holds distinct observed ints as strings; 300 is very
    # likely absent -> exercises the next-lower rewrite; numeric natural sort
    # makes dictionary order == numeric order.
    got = q(engine, f"{bbox_str(BBOX)}.nodes{{n_chars>=300}}")
    exp = oracle.select_nodes(nodes_df, BBOX, lambda r: int(r.tags["n_chars"]) >= 300)
    assert got == exp and got


def test_comparison_lt(engine, graph):
    nodes_df, _, _ = graph
    got = q(engine, f"{bbox_str(BBOX)}.nodes{{n_chars<150.5}}")
    exp = oracle.select_nodes(nodes_df, BBOX, lambda r: int(r.tags["n_chars"]) < 150.5)
    assert got == exp and got


def test_and_or_combination(engine, graph):
    nodes_df, _, _ = graph
    # note: values mixing letters+digits (e.g. "src1") are not lexable in the
    # reference grammar either (keyword chars exclude digits, strings are a
    # TODO: token.go:14) — stick to its language.
    got = q(engine, f"{bbox_str(BBOX)}.nodes{{lang=de AND n_chars>=200 OR lang=fr}}")
    exp = oracle.select_nodes(
        nodes_df,
        BBOX,
        lambda r: (r.tags.get("lang") == "de" and int(r.tags["n_chars"]) >= 200)
        or r.tags.get("lang") == "fr",
    )
    assert got == exp and got


def test_ways_query(engine, graph):
    _, ways_df, _ = graph
    got = q(engine, f"{bbox_str(SMALL)}.ways{{wtype=primary}}")
    exp = oracle.select_bound_features(
        ways_df, SMALL, lambda r: r.tags.get("wtype") == "primary"
    )
    assert got == exp and got


def test_relations_query(engine, graph):
    _, _, rels_df = graph
    got = q(engine, f"{bbox_str(BBOX)}.relations{{rtype=route}}")
    exp = oracle.select_bound_features(rels_df, BBOX, lambda r: r.tags.get("rtype") == "route")
    assert got == exp and got


def test_node_semi_join_ways(engine, graph):
    nodes_df, ways_df, _ = graph
    way_tags = {w.id: w.tags for w in ways_df.itertuples()}
    got = q(engine, f"{bbox_str(BBOX)}.nodes{{lang=de AND this.ways{{wtype=primary}}}}")
    exp = oracle.select_nodes(
        nodes_df,
        BBOX,
        lambda r: r.tags.get("lang") == "de"
        and any(way_tags[w].get("wtype") == "primary" for w in r.way_ids),
    )
    assert got == exp and got


def test_way_semi_join_nodes(engine, graph):
    nodes_df, ways_df, _ = graph
    node_tags = {n.id: n.tags for n in nodes_df.itertuples()}
    got = q(engine, f"{bbox_str(SMALL)}.ways{{this.nodes{{lang=zh}}}}")
    exp = oracle.select_bound_features(
        ways_df,
        SMALL,
        lambda r: any(node_tags[n].get("lang") == "zh" for n in r.node_ids),
    )
    assert got == exp and got


def test_anti_join(engine, graph):
    nodes_df, ways_df, _ = graph
    way_tags = {w.id: w.tags for w in ways_df.itertuples()}
    got = q(engine, f"{bbox_str(BBOX)}.nodes{{!this.ways{{bridge=*}}}}")
    exp = oracle.select_nodes(
        nodes_df,
        BBOX,
        lambda r: not any("bridge" in way_tags[w] for w in r.way_ids),
    )
    assert got == exp and got


def test_nested_two_level_this(engine, graph):
    nodes_df, ways_df, rels_df = graph
    node_tags = {n.id: n.tags for n in nodes_df.itertuples()}
    way_has_zh = {
        w.id: any(node_tags[n].get("lang") == "zh" for n in w.node_ids)
        for w in ways_df.itertuples()
    }
    got = q(
        engine,
        f"{bbox_str(SMALL)}.nodes{{this.ways{{wtype=residential AND this.nodes{{lang=zh}}}}}}",
    )
    way_tags = {w.id: w.tags for w in ways_df.itertuples()}
    exp = oracle.select_nodes(
        nodes_df,
        SMALL,
        lambda r: any(
            way_tags[w].get("wtype") == "residential" and way_has_zh[w] for w in r.way_ids
        ),
    )
    assert got == exp and got


def test_relation_child_relations(engine, graph):
    _, _, rels_df = graph
    rel_tags = {r.id: r.tags for r in rels_df.itertuples()}
    got = q(engine, f"{bbox_str(BBOX)}.relations{{this.child_relations{{rtype=boundary}}}}")
    exp = oracle.select_bound_features(
        rels_df,
        BBOX,
        lambda r: any(rel_tags[c].get("rtype") == "boundary" for c in r.child_relation_ids),
    )
    assert got == exp and got


def test_relation_parent_relations(engine, graph):
    _, _, rels_df = graph
    rel_tags = {r.id: r.tags for r in rels_df.itertuples()}
    got = q(engine, f"{bbox_str(BBOX)}.relations{{this.relations{{rtype=route}}}}")
    exp = oracle.select_bound_features(
        rels_df,
        BBOX,
        lambda r: any(rel_tags[p].get("rtype") == "route" for p in r.parent_relation_ids),
    )
    assert got == exp and got


def test_multi_statement_union_no_dedup(engine, graph):
    nodes_df, _, _ = graph
    text = f"{bbox_str(SMALL)}.nodes{{lang=en}}\n{bbox_str(SMALL)}.nodes{{lang=en}}"
    res = engine.execute_string(text).to_pandas()
    single = oracle.select_nodes(nodes_df, SMALL, lambda r: r.tags.get("lang") == "en")
    assert len(res) == 2 * len(single)  # append-union without dedup (query.go:29-35)


def test_invalid_membership_combo_raises(engine):
    with pytest.raises(ValueError):
        q(engine, f"{bbox_str(BBOX)}.nodes{{this.nodes{{lang=en}}}}")


# -- this.buffer(r) — the reference's PLANNED location modifier ------------
# (/root/reference/README.md:155-181; never built there)


def _brute_buffer_way_ids(nodes_df, ways_df, bbox, eps, node_pred, way_pred):
    import numpy as np

    prim = ways_df[[way_pred(w) for _, w in ways_df.iterrows()]]
    e2 = eps * eps
    hits = set()
    for _, n in nodes_df.iterrows():
        if not (bbox[0] <= n.lon <= bbox[2] and bbox[1] <= n.lat <= bbox[3]):
            continue
        if not node_pred(n):
            continue
        for _, w in prim.iterrows():
            xs, ys = np.asarray(w.lons), np.asarray(w.lats)
            dx, dy = np.diff(xs), np.diff(ys)
            den = dx * dx + dy * dy
            t = np.where(den > 0, ((n.lon - xs[:-1]) * dx + (n.lat - ys[:-1]) * dy) / np.where(den > 0, den, 1.0), 0.0)
            t = np.clip(t, 0.0, 1.0)
            ddx = n.lon - (xs[:-1] + t * dx)
            ddy = n.lat - (ys[:-1] + t * dy)
            if ((ddx * ddx + ddy * ddy) <= e2).any():
                hits.add(n.id)
                break
    return hits


def test_buffer_parse(engine):
    from simple_osm_queries_ray.parser import parse_query
    from simple_osm_queries_ray.parser.ast_nodes import SubStatementFilter

    qy = parse_query(
        f"{bbox_str(BBOX)}.nodes{{this.buffer(5m).ways{{wtype=primary}}}}",
        engine.repo.tag_index,
    )
    sub = qy.statements[0].filter
    assert isinstance(sub, SubStatementFilter)
    assert sub.statement.location.buffer_deg == 5 / 111320.0
    deg = parse_query(
        f"{bbox_str(BBOX)}.nodes{{this.buffer(0.01).ways{{wtype=primary}}}}",
        engine.repo.tag_index,
    ).statements[0].filter
    assert deg.statement.location.buffer_deg == 0.01


def test_buffer_parse_errors(engine):
    from simple_osm_queries_ray.parser import ParseError, parse_query

    for bad in (
        f"{bbox_str(BBOX)}.nodes{{this.buffer(5km).ways{{wtype=*}}}}",  # unknown unit
        f"{bbox_str(BBOX)}.nodes{{this.buffer().ways{{wtype=*}}}}",  # missing radius
        f"{bbox_str(BBOX)}.nodes{{this.buffer(0).ways{{wtype=*}}}}",  # non-positive
    ):
        with pytest.raises(ParseError):
            parse_query(bad, engine.repo.tag_index)


def test_buffer_ways_vs_oracle(engine, graph):
    nodes_df, ways_df, _ = graph
    got = q(
        engine,
        f"{bbox_str(BBOX)}.nodes{{lang=de AND this.buffer(0.01).ways{{wtype=primary}}}}",
    )
    exp = _brute_buffer_way_ids(
        nodes_df, ways_df, BBOX, 0.01,
        lambda n: n.tags.get("lang") == "de",
        lambda w: w.tags.get("wtype") == "primary",
    )
    assert got == exp and got


def test_buffer_negated(engine, graph):
    nodes_df, ways_df, _ = graph
    got = q(
        engine,
        f"{bbox_str(BBOX)}.nodes{{lang=de AND !this.buffer(0.01).ways{{wtype=primary}}}}",
    )
    near = _brute_buffer_way_ids(
        nodes_df, ways_df, BBOX, 0.01,
        lambda n: n.tags.get("lang") == "de",
        lambda w: w.tags.get("wtype") == "primary",
    )
    all_de = oracle.select_nodes(nodes_df, BBOX, lambda r: r.tags.get("lang") == "de")
    assert got == all_de - near and got


def test_buffer_nodes_vs_oracle(engine, graph):
    import numpy as np

    nodes_df, _, _ = graph
    eps = 2000 / 111320.0
    got = q(
        engine,
        f"{bbox_str(BBOX)}.nodes{{lang=de AND this.buffer(2000m).nodes{{lang=zh}}}}",
    )
    zh = nodes_df[[r.tags.get("lang") == "zh" for _, r in nodes_df.iterrows()]]
    exp = set()
    for _, n in nodes_df.iterrows():
        if n.tags.get("lang") != "de":
            continue
        if not (BBOX[0] <= n.lon <= BBOX[2] and BBOX[1] <= n.lat <= BBOX[3]):
            continue
        d2 = (zh.lon.values - n.lon) ** 2 + (zh.lat.values - n.lat) ** 2
        if ((d2 <= eps * eps) & (zh.id.values != n.id)).any():
            exp.add(n.id)
    assert got == exp and got


def test_buffer_quad_scheme_same_result(graph):
    """The buffered probe composes with the pluggable cell scheme: a quad-
    cell repo (different cell ids, different expand_cells) returns the
    identical id set."""
    from simple_osm_queries_ray.functions.hiercell import QuadCellScheme

    scheme = QuadCellScheme(level=12)
    eng2 = QueryEngine(build_repo(SF, cell_scheme=scheme), cell_scheme=scheme)
    nodes_df, ways_df, _ = graph
    got = q(
        eng2,
        f"{bbox_str(BBOX)}.nodes{{lang=de AND this.buffer(0.01).ways{{wtype=primary}}}}",
    )
    exp = _brute_buffer_way_ids(
        nodes_df, ways_df, BBOX, 0.01,
        lambda n: n.tags.get("lang") == "de",
        lambda w: w.tags.get("wtype") == "primary",
    )
    assert got == exp and got


def test_buffer_invalid_combos(engine):
    # node, way AND relation outers are all supported (round 3);
    # only .relations INNERS still reject (relations carry no geometry to
    # measure a distance TO — the reference never specified one either)
    with pytest.raises(ValueError):
        q(engine, f"{bbox_str(BBOX)}.nodes{{this.buffer(0.01).relations{{rtype=route}}}}")
    with pytest.raises(ValueError):
        q(engine, f"{bbox_str(BBOX)}.ways{{this.buffer(0.01).relations{{rtype=route}}}}")
    with pytest.raises(ValueError):
        q(engine, f"{bbox_str(BBOX)}.relations{{this.buffer(0.01).relations{{rtype=route}}}}")


def test_buffer_small_bbox_long_segments(engine, graph):
    """Regression: inner ways must NOT be cell-pruned by member-node cells —
    synthetic way segments span degrees, so a segment can pass within eps
    of an outer node while every member node lives cells away. A small
    outer bbox makes that pruning visibly lossy if reintroduced."""
    nodes_df, ways_df, _ = graph
    got = q(
        engine,
        f"{bbox_str(SMALL)}.nodes{{lang=de AND this.buffer(0.01).ways{{wtype=primary}}}}",
    )
    exp = _brute_buffer_way_ids(
        nodes_df, ways_df, SMALL, 0.01,
        lambda n: n.tags.get("lang") == "de",
        lambda w: w.tags.get("wtype") == "primary",
    )
    assert got == exp and got


@pytest.fixture(scope="module")
def fallback_engine():
    """Engine with broadcast_id_limit=0: every membership sub-statement is
    forced through the partitioned hash-join fallback (_attach_probe_flag)
    instead of the ray.put broadcast probe."""
    return QueryEngine(build_repo(SF), broadcast_id_limit=0)


def test_semi_join_partitioned_fallback_matches_broadcast(engine, fallback_engine):
    for text in [
        f"{bbox_str(BBOX)}.nodes{{lang=de AND this.ways{{wtype=primary}}}}",
        f"{bbox_str(SMALL)}.ways{{this.nodes{{lang=zh}}}}",
        f"{bbox_str(BBOX)}.nodes{{!this.ways{{bridge=*}}}}",
        f"{bbox_str(BBOX)}.nodes{{lang=fr OR this.ways{{wtype=primary}}}}",
    ]:
        exp = q(engine, text)
        got = q(fallback_engine, text)
        assert got == exp and got, text


def test_semi_join_fallback_nested(engine, fallback_engine):
    text = (
        f"{bbox_str(SMALL)}.nodes{{this.ways{{wtype=residential "
        f"AND this.nodes{{lang=zh}}}}}}"
    )
    assert q(fallback_engine, text) == q(engine, text)


def test_semi_join_fallback_projection_clean(fallback_engine):
    """The attached __probe_N flag column must not leak into the projected
    result schema."""
    ds = fallback_engine.execute_string(
        f"{bbox_str(SMALL)}.nodes{{this.ways{{wtype=primary}}}}"
    )
    assert set(ds.schema().names) == {"id", "lon", "lat"}


def _pt_polyline_hit(xs, ys, px, py, e2):
    import numpy as np

    dx, dy = np.diff(xs), np.diff(ys)
    den = dx * dx + dy * dy
    t = np.where(den > 0, ((px - xs[:-1]) * dx + (py - ys[:-1]) * dy) / np.where(den > 0, den, 1.0), 0.0)
    t = np.clip(t, 0.0, 1.0)
    ddx = px - (xs[:-1] + t * dx)
    ddy = py - (ys[:-1] + t * dy)
    return bool(((ddx * ddx + ddy * ddy) <= e2).any())


def _seg_seg_d2(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    """Exact segment-to-segment squared distance: 0 on proper crossing,
    else min of the four endpoint-to-opposite-segment distances."""
    import numpy as np

    def side(x1, y1, x2, y2, px, py):
        return np.sign((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1))

    if (
        side(ax1, ay1, ax2, ay2, bx1, by1) * side(ax1, ay1, ax2, ay2, bx2, by2) < 0
        and side(bx1, by1, bx2, by2, ax1, ay1) * side(bx1, by1, bx2, by2, ax2, ay2) < 0
    ):
        return 0.0

    def pt_seg(qx, qy, x1, y1, x2, y2):
        dx, dy = x2 - x1, y2 - y1
        den = dx * dx + dy * dy
        t = 0.0 if den == 0 else max(0.0, min(1.0, ((qx - x1) * dx + (qy - y1) * dy) / den))
        return (qx - (x1 + t * dx)) ** 2 + (qy - (y1 + t * dy)) ** 2

    return min(
        pt_seg(bx1, by1, ax1, ay1, ax2, ay2),
        pt_seg(bx2, by2, ax1, ay1, ax2, ay2),
        pt_seg(ax1, ay1, bx1, by1, bx2, by2),
        pt_seg(ax2, ay2, bx1, by1, bx2, by2),
    )


def test_way_buffer_nodes(engine, graph):
    """WAY outer + buffered node inner: outer ways with a matching node
    within eps of the polyline (round-3 extension of the reference's
    planned buffer)."""
    import numpy as np

    nodes_df, ways_df, _ = graph
    eps = 0.02
    got = q(
        engine,
        f"{bbox_str(BBOX)}.ways{{wtype=primary AND this.buffer({eps}).nodes{{lang=zh}}}}",
    )
    cand = oracle.select_bound_features(
        ways_df, BBOX, lambda w: w.tags.get("wtype") == "primary"
    )
    zh = [(n.lon, n.lat) for n in nodes_df.itertuples() if n.tags.get("lang") == "zh"]
    exp = set()
    for w in ways_df.itertuples():
        if w.id not in cand:
            continue
        xs, ys = np.asarray(w.lons), np.asarray(w.lats)
        if any(_pt_polyline_hit(xs, ys, px, py, eps * eps) for px, py in zh):
            exp.add(w.id)
    assert got == exp and got


def test_way_buffer_ways(engine, graph):
    """WAY outer + buffered way inner: segment-to-segment distance."""
    import numpy as np

    _, ways_df, _ = graph
    eps = 0.01
    got = q(
        engine,
        f"{bbox_str(SMALL)}.ways{{wtype=primary AND this.buffer({eps}).ways{{wtype=residential}}}}",
    )
    cand = oracle.select_bound_features(
        ways_df, SMALL, lambda w: w.tags.get("wtype") == "primary"
    )
    res = [w for w in ways_df.itertuples() if w.tags.get("wtype") == "residential"]
    e2 = eps * eps
    exp = set()
    for w in ways_df.itertuples():
        if w.id not in cand:
            continue
        axs, ays = np.asarray(w.lons), np.asarray(w.lats)
        hit = False
        for r in res:
            bxs, bys = np.asarray(r.lons), np.asarray(r.lats)
            for i in range(len(axs) - 1):
                for j in range(len(bxs) - 1):
                    if _seg_seg_d2(
                        axs[i], ays[i], axs[i + 1], ays[i + 1],
                        bxs[j], bys[j], bxs[j + 1], bys[j + 1],
                    ) <= e2:
                        hit = True
                        break
                if hit:
                    break
            if hit:
                break
        if hit:
            exp.add(w.id)
    assert got == exp and got


def test_relation_buffer_runs(engine):
    # relation-outer buffer is supported since round 3: distance to the
    # union of DIRECT member geometry (member nodes + member way polylines)
    got = q(engine, f"{bbox_str(BBOX)}.relations{{this.buffer(0.01).nodes{{lang=de}}}}")
    assert isinstance(got, set)


def test_custom_cell_size_same_results(engine):
    """Reference parity: Import takes cellWidth/cellHeight
    (src/importing/import.go:17, src/main.go:87). A 0.05-degree grid built
    through the scheme seam must answer bbox, tag-filter, semi-join AND
    buffered queries with the identical id sets as the default 0.1 grid —
    cell size is a pruning/partitioning knob, never a semantics knob."""
    from simple_osm_queries_ray.functions.hiercell import GridCellScheme

    scheme = GridCellScheme(0.05, 0.05)
    assert scheme.name != GridCellScheme().name  # distinct build_repo cache key
    eng2 = QueryEngine(build_repo(SF, cell_scheme=scheme), cell_scheme=scheme)
    for text in (
        f"{bbox_str(SMALL)}.nodes{{lang=en}}",
        f"{bbox_str(BBOX)}.nodes{{lang=de AND this.ways{{wtype=primary}}}}",
        f"{bbox_str(SMALL)}.ways{{wtype=primary}}",
        f"{bbox_str(SMALL)}.nodes{{lang=de AND this.buffer(0.01).ways{{wtype=primary}}}}",
    ):
        assert q(eng2, text) == q(engine, text), text


def test_build_repo_records_scheme_and_engine_autoresolves():
    """build_repo stores the scheme on the repo (review r04): QueryEngine
    and write_index pick it up without the caller passing it twice —
    forgetting the second pass used to silently probe the wrong geometry."""
    from simple_osm_queries_ray.functions.hiercell import GridCellScheme

    scheme = GridCellScheme(0.05, 0.05)
    repo = build_repo(SF, cell_scheme=scheme)
    # attribute equality, not identity: the repo cache may return a repo
    # built earlier with an equal scheme instance
    assert (repo.cell_scheme.cell_w, repo.cell_scheme.cell_h) == (0.05, 0.05)
    eng = QueryEngine(repo)  # no explicit scheme
    assert eng.cell_scheme is repo.cell_scheme
    default_eng = QueryEngine(build_repo(SF))
    text = f"{bbox_str(SMALL)}.nodes{{lang=en}}"
    assert q(eng, text) == q(default_eng, text)


def test_way_buffer_ways_excludes_self(engine, graph):
    """A way is within 0 of itself: 'primary ways near a primary way' must
    NOT return every primary way trivially (r04 review). Oracle: brute
    min-segment-distance to ANOTHER matching way."""
    _, ways_df, _ = graph
    got = q(
        engine,
        f"{bbox_str(SMALL)}.ways{{wtype=primary AND this.buffer(0.01).ways{{wtype=primary}}}}",
    )
    prim = [w for w in ways_df.itertuples() if w.tags.get("wtype") == "primary"]
    # restrict outer like the engine: bounds intersect AND the way's cell
    # list (member-node home cells — the reference's replication rule) hits
    # the bbox cell rectangle
    from simple_osm_queries_ray.model import cells_for_bbox

    bbox_cells = set(cells_for_bbox(*SMALL).tolist())

    def _in_bbox(w):
        bounds = not (
            w.minlon > SMALL[2] or w.maxlon < SMALL[0]
            or w.minlat > SMALL[3] or w.maxlat < SMALL[1]
        )
        return bounds and bool(bbox_cells & set(w.cells))
    import numpy as np
    from simple_osm_queries_ray.stages.geo import _seg_min_d2

    def min_d2(a, b):
        ax, ay = np.asarray(a.lons), np.asarray(a.lats)
        bx, by = np.asarray(b.lons), np.asarray(b.lats)
        best = np.inf
        # endpoint-to-opposite-segment in both directions (matches kernel)
        for (px, py, sx, sy) in ((ax, ay, bx, by), (bx, by, ax, ay)):
            if len(sx) >= 2:
                d2 = _seg_min_d2(px, py, sx[:-1], sy[:-1], sx[1:], sy[1:])
                best = min(best, float(d2.min()))
        return best

    eps2 = 0.01 * 0.01
    exp = set()
    for a in prim:
        if not _in_bbox(a):
            continue
        for b in prim:
            if b.id != a.id and min_d2(a, b) <= eps2 + 1e-15:
                exp.add(a.id)
                break
    assert got == exp


def test_execute_empty_query_raises_parse_error(engine):
    from simple_osm_queries_ray.parser import ParseError, parse_query

    for text in ("", "// just a comment"):
        with pytest.raises(ParseError):
            engine.execute(parse_query(text, engine.repo.tag_index))


def test_explain_circle_location(engine):
    plans = engine.explain_string("circle(9.95,53.55,0.05).nodes{lang=en}")
    assert len(plans) == 1 and plans[0]["n_candidate_cells"] >= 1


def test_mixed_type_multi_statement_union(engine, graph):
    """Mixed node+way multi-statement queries (reference query.go:29-35)
    must union under ONE schema — the bbox envelope (r04 review)."""
    ds = engine.execute_string(
        f"{bbox_str(SMALL)}.nodes{{lang=en}} {bbox_str(SMALL)}.ways{{wtype=primary}}"
    )
    df = ds.to_pandas()
    assert list(df.columns) == ["id", "minlon", "minlat", "maxlon", "maxlat"]
    n_nodes = len(q(engine, f"{bbox_str(SMALL)}.nodes{{lang=en}}"))
    n_ways = len(q(engine, f"{bbox_str(SMALL)}.ways{{wtype=primary}}"))
    assert len(df) == n_nodes + n_ways
