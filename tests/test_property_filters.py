"""Property-based check of filter semantics (M4-M7): random filter trees over
the sf0.001 graph must produce the same node ID set as a naive per-row Python
evaluator. Hardens the mask-algebra evaluation (including the reference's
no-key=>false rule for `!=` and the comparison-on-dictionary-order semantics)
beyond the fixed cases in test_query.py.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.001"
BBOX = (9.0, 53.0, 11.0, 55.0)

# grammar pieces: (key, values) the synthetic nodes actually carry
KEYS = {
    "lang": ["de", "en", "es", "fr", "zh"],
    "source": ["crawl", "wiki", "news"],
    "n_chars": ["50", "120", "200", "333", "999"],  # mixture of present/absent
}
OPS = ["=", "!=", ">", ">=", "<", "<="]


@st.composite
def filter_text(draw, depth: int = 0) -> str:
    kind = draw(
        st.sampled_from(
            ["tag", "tag", "key", "and", "or", "not"] if depth < 3 else ["tag", "key"]
        )
    )
    if kind == "tag":
        key = draw(st.sampled_from(sorted(KEYS)))
        op = draw(st.sampled_from(OPS))
        val = draw(st.sampled_from(KEYS[key]))
        return f"{key}{op}{val}"
    if kind == "key":
        key = draw(st.sampled_from(sorted(KEYS)))
        return draw(st.sampled_from([f"{key}=*", f"{key}!=*"]))
    if kind in ("and", "or"):
        a = draw(filter_text(depth + 1))
        b = draw(filter_text(depth + 1))
        return f"({a} {kind.upper()} {b})"
    return f"!({draw(filter_text(depth + 1))})"


def _naive_eval(expr, tags: dict, ti) -> bool:
    from simple_osm_queries_ray.model import NOT_FOUND
    from simple_osm_queries_ray.parser.ast_nodes import (
        BinOp,
        KeyFilter,
        LogicalFilter,
        LogicOp,
        NegatedFilter,
        TagFilter,
    )

    if isinstance(expr, LogicalFilter):
        a, b = _naive_eval(expr.a, tags, ti), _naive_eval(expr.b, tags, ti)
        return (a or b) if expr.op == LogicOp.OR else (a and b)
    if isinstance(expr, NegatedFilter):
        return not _naive_eval(expr.base, tags, ti)
    if isinstance(expr, KeyFilter):
        if expr.key_index == NOT_FOUND:
            has = False
        else:
            has = ti.keys[expr.key_index] in tags
        return has if expr.should_be_set else not has
    assert isinstance(expr, TagFilter)
    if expr.key_index == NOT_FOUND:
        return False
    key = ti.keys[expr.key_index]
    if key not in tags:
        return False  # reference: feature without the key never matches, incl. !=
    vi = ti.values[expr.key_index].index(tags[key])
    t = expr.value_index
    return {
        BinOp.EQ: vi == t,
        BinOp.NEQ: vi != t,
        BinOp.GT: vi > t,
        BinOp.GTE: vi >= t,
        BinOp.LT: vi < t,
        BinOp.LTE: vi <= t,
    }[expr.op]


@pytest.fixture(scope="module")
def engine_and_graph(ray_session):
    from simple_osm_queries_ray.pipelines.query import QueryEngine
    from simple_osm_queries_ray.sources.repo import build_repo

    import oracle

    repo = build_repo(SF)
    nodes_df, _, _ = oracle.build_oracle_graph(SF)
    return QueryEngine(repo), nodes_df, repo.tag_index


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(ftext=filter_text())
def test_random_filter_tree_matches_naive(engine_and_graph, ftext):
    from simple_osm_queries_ray.parser import parse_query

    engine, nodes_df, ti = engine_and_graph
    qtext = f"bbox({BBOX[0]},{BBOX[1]},{BBOX[2]},{BBOX[3]}).nodes{{{ftext}}}"
    query = parse_query(qtext, ti)
    df = engine.execute(query).to_pandas()
    got = set(df["id"]) if "id" in df.columns else set()

    expr = query.statements[0].filter
    want = {
        int(row.id)
        for row in nodes_df.itertuples()
        if BBOX[0] <= row.lon <= BBOX[2]
        and BBOX[1] <= row.lat <= BBOX[3]
        and _naive_eval(expr, row.tags, ti)
    }
    assert got == want, f"query {qtext!r}: {len(got)} vs {len(want)}"
