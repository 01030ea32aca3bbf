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
