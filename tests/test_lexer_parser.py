"""Lexer/parser conformance — vectors modeled on the reference suites
(/root/reference/src/parser/lexer_test.go, parser_test.go), including the
comparison-rewrite semantics (parser_test.go:485-561)."""

import pytest

from simple_osm_queries_ray.functions.tags import TagIndex
from simple_osm_queries_ray.model import NOT_FOUND
from simple_osm_queries_ray.parser import (
    BboxLocation,
    ContextAwareLocation,
    KeyFilter,
    Lexer,
    LogicalFilter,
    NegatedFilter,
    ParseError,
    SubStatementFilter,
    TagFilter,
    TokenKind,
    parse_query,
)
from simple_osm_queries_ray.parser.ast_nodes import BinOp, LogicOp


@pytest.fixture
def ti():
    return TagIndex(
        keys=["amenity", "seats", "width", "highway"],
        values=[
            ["bench", "tree"],
            ["1", "2", "3"],
            ["1", "1.5 m", "2", "10"],
            ["primary", "secondary"],
        ],
    )


def lex(s):
    return [(t.kind, t.lexeme) for t in Lexer(s).tokens()]


def test_lexer_basic():
    assert lex("bbox(1,2.5,3,4).nodes{amenity=bench}") == [
        (TokenKind.KEYWORD, "bbox"),
        (TokenKind.OPENING_PARENTHESIS, "("),
        (TokenKind.NUMBER, "1"),
        (TokenKind.NUMBER, "2.5"),
        (TokenKind.NUMBER, "3"),
        (TokenKind.NUMBER, "4"),
        (TokenKind.CLOSING_PARENTHESIS, ")"),
        (TokenKind.EXPRESSION_SEPARATOR, "."),
        (TokenKind.KEYWORD, "nodes"),
        (TokenKind.OPENING_BRACES, "{"),
        (TokenKind.KEYWORD, "amenity"),
        (TokenKind.OPERATOR, "="),
        (TokenKind.KEYWORD, "bench"),
        (TokenKind.CLOSING_BRACES, "}"),
    ]


def test_lexer_operators_and_wildcard():
    assert lex("a!=* b>=1 c<=2 d<3 e>4 !") == [
        (TokenKind.KEYWORD, "a"),
        (TokenKind.OPERATOR, "!="),
        (TokenKind.WILDCARD, "*"),
        (TokenKind.KEYWORD, "b"),
        (TokenKind.OPERATOR, ">="),
        (TokenKind.NUMBER, "1"),
        (TokenKind.KEYWORD, "c"),
        (TokenKind.OPERATOR, "<="),
        (TokenKind.NUMBER, "2"),
        (TokenKind.KEYWORD, "d"),
        (TokenKind.OPERATOR, "<"),
        (TokenKind.NUMBER, "3"),
        (TokenKind.KEYWORD, "e"),
        (TokenKind.OPERATOR, ">"),
        (TokenKind.NUMBER, "4"),
        (TokenKind.OPERATOR, "!"),
    ]


def test_lexer_comments_and_colon_keys():
    toks = lex("// a comment\naddr:housenumber=* // trailing")
    assert toks == [
        (TokenKind.KEYWORD, "addr:housenumber"),
        (TokenKind.OPERATOR, "="),
        (TokenKind.WILDCARD, "*"),
    ]


def test_lexer_rejects_garbage():
    from simple_osm_queries_ray.parser import LexError

    with pytest.raises(LexError):
        Lexer("amenity=bench;").tokens()


def test_parse_simple_statement(ti):
    q = parse_query("bbox(1,2,3,4).nodes{amenity=bench}", ti)
    assert len(q.statements) == 1
    s = q.statements[0]
    assert s.location == BboxLocation(1.0, 2.0, 3.0, 4.0)
    assert s.query_type == "nodes"
    assert s.filter == TagFilter(key_index=0, value_index=0, op=BinOp.EQ)


def test_parse_wildcard_key_filter(ti):
    q = parse_query("bbox(1,2,3,4).nodes{seats=*}", ti)
    assert q.statements[0].filter == KeyFilter(key_index=1, should_be_set=True)
    q = parse_query("bbox(1,2,3,4).nodes{seats!=*}", ti)
    assert q.statements[0].filter == KeyFilter(key_index=1, should_be_set=False)


def test_parse_unknown_key_yields_not_found(ti):
    q = parse_query("bbox(1,2,3,4).nodes{nokey=nothing}", ti)
    f = q.statements[0].filter
    assert f.key_index == NOT_FOUND
    assert f.value_index == NOT_FOUND


def test_and_or_precedence(ti):
    # a AND b OR c -> (a AND b) OR c (parser.go:286-307 recursion trick)
    q = parse_query(
        "bbox(1,2,3,4).nodes{amenity=bench AND seats=2 OR amenity=tree}", ti
    )
    f = q.statements[0].filter
    assert isinstance(f, LogicalFilter) and f.op == LogicOp.OR
    assert isinstance(f.a, LogicalFilter) and f.a.op == LogicOp.AND

    # a OR b AND c -> a OR (b AND c)
    q = parse_query(
        "bbox(1,2,3,4).nodes{amenity=tree OR amenity=bench AND seats=2}", ti
    )
    f = q.statements[0].filter
    assert isinstance(f, LogicalFilter) and f.op == LogicOp.OR
    assert isinstance(f.b, LogicalFilter) and f.b.op == LogicOp.AND


def test_parentheses(ti):
    q = parse_query("bbox(1,2,3,4).nodes{(amenity=bench OR amenity=tree) AND seats=2}", ti)
    f = q.statements[0].filter
    assert isinstance(f, LogicalFilter) and f.op == LogicOp.AND
    assert isinstance(f.a, LogicalFilter) and f.a.op == LogicOp.OR


def test_negation_only_before_paren_or_this(ti):
    q = parse_query("bbox(1,2,3,4).nodes{!(amenity=bench)}", ti)
    assert isinstance(q.statements[0].filter, NegatedFilter)
    with pytest.raises(ParseError):
        parse_query("bbox(1,2,3,4).nodes{!amenity=bench}", ti)


def test_sub_statement(ti):
    q = parse_query(
        "bbox(1,2,3,4).nodes{amenity=bench AND this.ways{highway=primary}}", ti
    )
    f = q.statements[0].filter
    assert isinstance(f, LogicalFilter)
    sub = f.b
    assert isinstance(sub, SubStatementFilter)
    assert isinstance(sub.statement.location, ContextAwareLocation)
    assert sub.statement.query_type == "ways"


def test_child_relations_only_in_substatement(ti):
    q = parse_query("bbox(1,2,3,4).relations{this.child_relations{amenity=bench}}", ti)
    sub = q.statements[0].filter
    assert sub.statement.query_type == "child_relations"
    with pytest.raises(ParseError):
        parse_query("bbox(1,2,3,4).child_relations{amenity=bench}", ti)


def test_comparison_rewrite_exact_value(ti):
    # literal exists: no rewrite
    q = parse_query("bbox(1,2,3,4).nodes{width>=2}", ti)
    assert q.statements[0].filter == TagFilter(key_index=2, value_index=2, op=BinOp.GTE)


def test_comparison_rewrite_missing_value(ti):
    # width dict: ["1", "1.5 m", "2", "10"]; 2.5 missing -> >=2.5 becomes >2
    q = parse_query("bbox(1,2,3,4).nodes{width>=2.5}", ti)
    assert q.statements[0].filter == TagFilter(key_index=2, value_index=2, op=BinOp.GT)
    # <2.5 -> <=2
    q = parse_query("bbox(1,2,3,4).nodes{width<2.5}", ti)
    assert q.statements[0].filter == TagFilter(key_index=2, value_index=2, op=BinOp.LTE)


def test_comparison_rewrite_below_minimum(ti):
    # 0.5 sorts below every width value -> clamp to index 0 with op fix-up
    q = parse_query("bbox(1,2,3,4).nodes{width>0.5}", ti)
    assert q.statements[0].filter == TagFilter(key_index=2, value_index=0, op=BinOp.GTE)
    q = parse_query("bbox(1,2,3,4).nodes{width<=0.5}", ti)
    assert q.statements[0].filter == TagFilter(key_index=2, value_index=0, op=BinOp.LT)
    # = / != are not comparison operators: no rewrite (stay NOT_FOUND)
    q = parse_query("bbox(1,2,3,4).nodes{width=2.5}", ti)
    assert q.statements[0].filter == TagFilter(key_index=2, value_index=NOT_FOUND, op=BinOp.EQ)


def test_multi_statement(ti):
    q = parse_query(
        "bbox(1,2,3,4).nodes{amenity=bench}\nbbox(1,2,3,4).ways{highway=primary}", ti
    )
    assert len(q.statements) == 2


def test_wildcard_requires_equality_op(ti):
    with pytest.raises(ParseError):
        parse_query("bbox(1,2,3,4).nodes{seats>=*}", ti)


def test_circle_location(ti):
    from simple_osm_queries_ray.parser import CircleLocation

    q = parse_query("circle(9.95,53.55,0.05).nodes{amenity=bench}", ti)
    loc = q.statements[0].location
    assert isinstance(loc, CircleLocation)
    assert (loc.lon, loc.lat, loc.radius_deg) == (9.95, 53.55, 0.05)
    b = loc.enclosing_bbox()
    assert (b.minlon, b.maxlat) == (9.95 - 0.05, 53.55 + 0.05)
    # metre unit converts exactly like this.buffer
    q = parse_query("circle(9.95,53.55,1500m).nodes{amenity=bench}", ti)
    assert q.statements[0].location.radius_deg == 1500 / 111320.0


def test_circle_location_errors(ti):
    with pytest.raises(ParseError):
        parse_query("circle(9.95,53.55).nodes{amenity=bench}", ti)  # 2 args
    with pytest.raises(ParseError):
        parse_query("circle(9.95,53.55,0).nodes{amenity=bench}", ti)  # r=0
    with pytest.raises(ParseError):
        parse_query("circle(9.95,53.55,5km).nodes{amenity=bench}", ti)  # bad unit
