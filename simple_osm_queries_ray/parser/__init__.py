from .ast_nodes import (
    BboxLocation,
    CircleLocation,
    ContextAwareLocation,
    KeyFilter,
    LogicalFilter,
    NegatedFilter,
    Query,
    Statement,
    SubStatementFilter,
    TagFilter,
)
from .lexer import Lexer, LexError, Token, TokenKind
from .query_parser import ParseError, parse_query

__all__ = [
    "BboxLocation",
    "CircleLocation",
    "ContextAwareLocation",
    "KeyFilter",
    "LogicalFilter",
    "NegatedFilter",
    "Query",
    "Statement",
    "SubStatementFilter",
    "TagFilter",
    "Lexer",
    "LexError",
    "Token",
    "TokenKind",
    "ParseError",
    "parse_query",
]
