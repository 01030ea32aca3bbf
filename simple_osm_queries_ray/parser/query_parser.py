"""Recursive-descent parser for the soq query language.

Grammar and behaviors follow the reference parser
(``/root/reference/src/parser/parser.go:34-475``), including:

- statement = location '.' type '{' filter '}'; top-level locations are
  ``bbox(a,b,c,d)``; sub-statements start with ``this`` and may use the extra
  ``child_relations`` type (parser.go:251-255);
- AND exits recursion / OR re-enters (parser.go:286-307), so
  ``a AND b OR c`` parses as ``(a AND b) OR c`` while ``a OR b AND c`` parses
  as ``a OR (b AND c)``;
- ``!`` is only valid before ``(`` or ``this`` (parser.go:363-380);
- tag literals are resolved to dictionary indices at parse time; comparison
  operators on a literal absent from the value dictionary are rewritten
  against the next lower existing value (parser.go:413-444):
  ``width>=2.5 -> width>2``; below-minimum clamps to index 0 with operator
  fix-up (``>`` -> ``>=``, ``<=`` -> ``<``);
- wildcard values require ``=`` or ``!=`` (parser.go:395-400).
"""

from __future__ import annotations

from ..functions.tags import TagIndex
from ..model import (
    NOT_FOUND,
    QUERY_CHILD_RELATIONS,
    QUERY_NODES,
    QUERY_RELATIONS,
    QUERY_WAYS,
)
from .ast_nodes import (
    BboxLocation,
    BinOp,
    CircleLocation,
    ContextAwareLocation,
    FilterExpr,
    KeyFilter,
    LogicalFilter,
    LogicOp,
    NegatedFilter,
    Query,
    Statement,
    SubStatementFilter,
    TagFilter,
)
from .lexer import Lexer, Token, TokenKind


class ParseError(ValueError):
    pass


_OPS = {
    "=": BinOp.EQ,
    "!=": BinOp.NEQ,
    ">": BinOp.GT,
    ">=": BinOp.GTE,
    "<": BinOp.LT,
    "<=": BinOp.LTE,
}

_TYPES = (QUERY_NODES, QUERY_WAYS, QUERY_RELATIONS)


def parse_query(text: str, tag_index: TagIndex) -> Query:
    tokens = Lexer(text.strip()).tokens()
    parser = _Parser(tokens, tag_index)
    statements = []
    while parser.peek() is not None:
        statements.append(parser.parse_statement())
    return Query(statements=tuple(statements))


class _Parser:
    def __init__(self, tokens: list[Token], tag_index: TagIndex):
        self.tokens = tokens
        self.i = -1  # mirrors the reference's pre-advance cursor style
        self.tag_index = tag_index

    # cursor helpers ------------------------------------------------------
    def peek(self) -> Token | None:
        return self.tokens[self.i + 1] if self.i + 1 < len(self.tokens) else None

    def advance(self) -> Token:
        self.i += 1
        if self.i >= len(self.tokens):
            raise ParseError("Unexpected end of query")
        return self.tokens[self.i]

    def current(self) -> Token:
        return self.tokens[self.i]

    def expect(self, kind: TokenKind, what: str) -> Token:
        tok = self.advance()
        if tok.kind != kind:
            raise ParseError(f"Expected {what} at position {tok.start}, found '{tok.lexeme}'")
        return tok

    # grammar -------------------------------------------------------------
    def parse_statement(self) -> Statement:
        tok = self.advance()
        if tok.kind != TokenKind.KEYWORD:
            raise ParseError(
                f"Expected location expression keyword at position {tok.start}, found '{tok.lexeme}'"
            )
        is_context_aware = tok.lexeme == "this"
        if tok.lexeme == "bbox":
            location = self._parse_bbox()
        elif tok.lexeme == "circle":
            location = self._parse_circle()
        elif is_context_aware:
            location = ContextAwareLocation(buffer_deg=self._maybe_parse_buffer())
        else:
            raise ParseError(
                f"Expected location expression (bbox, circle or this) at position {tok.start}, found '{tok.lexeme}'"
            )

        self.expect(TokenKind.EXPRESSION_SEPARATOR, "'.'")
        type_tok = self.expect(TokenKind.KEYWORD, "object type")
        if type_tok.lexeme in _TYPES:
            query_type = type_tok.lexeme
        elif type_tok.lexeme == QUERY_CHILD_RELATIONS and is_context_aware:
            # child_relations only valid inside context-aware sub-statements
            # (parser.go:251-255)
            query_type = QUERY_CHILD_RELATIONS
        else:
            raise ParseError(
                f"Expected OSM object type at position {type_tok.start}, found '{type_tok.lexeme}'"
            )

        self.expect(TokenKind.OPENING_BRACES, "'{'")
        filt = self.parse_filter_expressions()
        self.expect(TokenKind.CLOSING_BRACES, "'}'")
        return Statement(location=location, query_type=query_type, filter=filt)

    def _maybe_parse_buffer(self) -> float | None:
        """``.buffer(<number>[m])`` after ``this`` (reference README.md:
        155-181, planned there). Returns the radius in planar degrees
        (bare number = degrees; ``m`` suffix = meters / 111320). Leaves the
        cursor untouched when the next tokens are not a buffer clause."""
        nxt, after = self.peek(), (
            self.tokens[self.i + 2] if self.i + 2 < len(self.tokens) else None
        )
        if not (
            nxt is not None
            and nxt.kind == TokenKind.EXPRESSION_SEPARATOR
            and after is not None
            and after.kind == TokenKind.KEYWORD
            and after.lexeme == "buffer"
        ):
            return None
        self.advance()  # '.'
        self.advance()  # 'buffer'
        self.expect(TokenKind.OPENING_PARENTHESIS, "'('")
        num = self.advance()
        if num.kind != TokenKind.NUMBER:
            raise ParseError(
                f"Expected buffer radius at position {num.start}, found '{num.lexeme}'"
            )
        try:
            radius = float(num.lexeme)
        except ValueError as e:
            raise ParseError(f"Invalid number '{num.lexeme}' at position {num.start}") from e
        tok = self.advance()
        if tok.kind == TokenKind.KEYWORD:
            if tok.lexeme != "m":
                raise ParseError(
                    f"Unknown buffer unit '{tok.lexeme}' at position {tok.start} (use m or bare degrees)"
                )
            radius = radius / 111320.0
            tok = self.advance()
        if tok.kind != TokenKind.CLOSING_PARENTHESIS:
            raise ParseError(f"Expected ')' at position {tok.start}, found '{tok.lexeme}'")
        if radius <= 0:
            raise ParseError(f"Buffer radius must be positive at position {num.start}")
        return radius

    def _parse_circle(self) -> CircleLocation:
        """``circle(lon, lat, r[m])`` — extension location type (the seam
        the reference reserved at ``src/query/location.go:14-19``). The
        radius accepts the same optional ``m`` unit as ``this.buffer``."""
        self.expect(TokenKind.OPENING_PARENTHESIS, "'('")
        nums = []
        for _ in range(3):
            tok = self.advance()
            if tok.kind != TokenKind.NUMBER:
                raise ParseError(
                    f"Expected number in circle at position {tok.start}, found '{tok.lexeme}'"
                )
            try:
                nums.append(float(tok.lexeme))
            except ValueError as e:
                raise ParseError(
                    f"Invalid number '{tok.lexeme}' at position {tok.start}"
                ) from e
        tok = self.advance()
        if tok.kind == TokenKind.KEYWORD:
            if tok.lexeme != "m":
                raise ParseError(
                    f"Unknown circle radius unit '{tok.lexeme}' at position {tok.start} "
                    "(use m or bare degrees)"
                )
            nums[2] = nums[2] / 111320.0
            tok = self.advance()
        if tok.kind != TokenKind.CLOSING_PARENTHESIS:
            raise ParseError(f"Expected ')' at position {tok.start}, found '{tok.lexeme}'")
        if nums[2] <= 0:
            raise ParseError("Circle radius must be positive")
        return CircleLocation(nums[0], nums[1], nums[2])

    def _parse_bbox(self) -> BboxLocation:
        self.expect(TokenKind.OPENING_PARENTHESIS, "'('")
        coords = []
        for _ in range(4):
            tok = self.advance()
            if tok.kind != TokenKind.NUMBER:
                raise ParseError(
                    f"Expected number in bbox at position {tok.start}, found '{tok.lexeme}'"
                )
            try:
                coords.append(float(tok.lexeme))
            except ValueError as e:
                raise ParseError(f"Invalid number '{tok.lexeme}' at position {tok.start}") from e
        self.expect(TokenKind.CLOSING_PARENTHESIS, "')'")
        return BboxLocation(*coords)

    def parse_filter_expressions(self) -> FilterExpr:
        expression = self.parse_next_expression()
        while True:
            nxt = self.peek()
            if nxt is None:
                raise ParseError("Expected filter expression or '}'")
            if nxt.kind in (TokenKind.CLOSING_BRACES, TokenKind.CLOSING_PARENTHESIS):
                break
            tok = self.advance()
            if tok.kind != TokenKind.KEYWORD or tok.lexeme not in ("AND", "OR"):
                raise ParseError(
                    f"Expected 'AND' or 'OR' at position {tok.start}, found '{tok.lexeme}'"
                )
            if tok.lexeme == "AND":
                second = self.parse_next_expression()
                expression = LogicalFilter(expression, second, LogicOp.AND)
            else:
                second = self.parse_filter_expressions()
                expression = LogicalFilter(expression, second, LogicOp.OR)
        return expression

    def parse_next_expression(self) -> FilterExpr:
        tok = self.advance()
        if tok.kind == TokenKind.OPENING_PARENTHESIS:
            expr = self.parse_filter_expressions()
            self.expect(TokenKind.CLOSING_PARENTHESIS, "')'")
            return expr
        if tok.kind == TokenKind.OPERATOR:
            if tok.lexeme != "!":
                raise ParseError(
                    f"Expected '!' to start a new expression at position {tok.start}, found '{tok.lexeme}'"
                )
            nxt = self.peek()
            if nxt is None:
                raise ParseError("Expected start of new expression after '!'")
            if nxt.kind != TokenKind.OPENING_PARENTHESIS and not (
                nxt.kind == TokenKind.KEYWORD and nxt.lexeme == "this"
            ):
                raise ParseError(
                    f"Expected '(' after '!' at position {nxt.start}, found '{nxt.lexeme}'"
                )
            return NegatedFilter(self.parse_next_expression())
        if tok.kind == TokenKind.KEYWORD:
            if tok.lexeme == "this":
                # a sub-statement starts; re-parse from the 'this' token
                self.i -= 1
                return SubStatementFilter(self.parse_statement())
            return self._parse_tag_predicate(tok)
        raise ParseError(f"Unexpected token '{tok.lexeme}' at position {tok.start}")

    def _parse_tag_predicate(self, key_tok: Token) -> FilterExpr:
        key = key_tok.lexeme
        key_index = self.tag_index.key_index(key)

        op_tok = self.advance()
        if op_tok.kind != TokenKind.OPERATOR or op_tok.lexeme not in _OPS:
            raise ParseError(
                f"Expected binary operator after '{key}' at position {op_tok.start}"
            )
        op = _OPS[op_tok.lexeme]

        val_tok = self.advance()
        if val_tok.kind == TokenKind.WILDCARD:
            if op not in (BinOp.EQ, BinOp.NEQ):
                raise ParseError(
                    f"Expected '=' or '!=' operator when using wildcard at position {key_tok.start}"
                )
            return KeyFilter(key_index=key_index, should_be_set=op == BinOp.EQ)
        if val_tok.kind not in (TokenKind.KEYWORD, TokenKind.NUMBER, TokenKind.STRING):
            raise ParseError(
                f"Expected value after '{key}{op_tok.lexeme}' at position {val_tok.start}"
            )

        value_index = self.tag_index.value_index(key, val_tok.lexeme)
        if value_index == NOT_FOUND and op.is_comparison:
            # comparison rewrite against the next lower existing value
            # (parser.go:413-444)
            value_index, _ = self.tag_index.next_lower_value_index(key_index, val_tok.lexeme)
            if value_index == NOT_FOUND:
                value_index = 0
                if op == BinOp.GT:
                    op = BinOp.GTE  # width>-1 -> width>=0
                elif op == BinOp.LTE:
                    op = BinOp.LT  # width<=-1 -> width<0
            else:
                if op == BinOp.GTE:
                    op = BinOp.GT  # width>=2.5 -> width>2
                elif op == BinOp.LT:
                    op = BinOp.LTE  # width<2.5 -> width<=2
        return TagFilter(key_index=key_index, value_index=value_index, op=op)
