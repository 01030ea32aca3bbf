"""Lexer for the soq query language.

Token kinds and scanning rules follow the reference lexer
(``/root/reference/src/parser/lexer.go:40-220``, token kinds
``src/parser/token.go:7-87``):

- whitespace and ``,`` are separators; ``//`` comments run to end of line;
- single-char tokens: ``( ) { } . *``;
- keywords: runs of ``[A-Za-z_:@]`` (includes tag keys like
  ``addr:housenumber``);
- numbers: runs of ``[0-9.]`` (also consumed greedily, so ``2.5.7`` lexes as
  one number token, as in the reference);
- operators: ``! != < <= > >= =``.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

KEYWORD_CHARS = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_:@")
NUMBER_CHARS = set("1234567890.")


class TokenKind(enum.Enum):
    KEYWORD = "keyword"
    NUMBER = "number"
    STRING = "string"
    WILDCARD = "*"
    EXPRESSION_SEPARATOR = "."
    OPENING_PARENTHESIS = "("
    CLOSING_PARENTHESIS = ")"
    OPENING_BRACES = "{"
    CLOSING_BRACES = "}"
    OPERATOR = "operator"


@dataclass(frozen=True)
class Token:
    kind: TokenKind
    lexeme: str
    start: int


class LexError(ValueError):
    pass


_SINGLE = {
    "(": TokenKind.OPENING_PARENTHESIS,
    ")": TokenKind.CLOSING_PARENTHESIS,
    "{": TokenKind.OPENING_BRACES,
    "}": TokenKind.CLOSING_BRACES,
    ".": TokenKind.EXPRESSION_SEPARATOR,
    "*": TokenKind.WILDCARD,
}


class Lexer:
    def __init__(self, text: str):
        self.text = text
        self.i = 0

    def tokens(self) -> list[Token]:
        out: list[Token] = []
        n = len(self.text)
        while self.i < n:
            c = self.text[self.i]
            if c.isspace() or c == ",":
                self.i += 1
                continue
            if c == "/":
                self._skip_comment()
                continue
            # '.' is a single-char token only when not starting a number:
            # reference checks single-char tokens BEFORE number chars, so '.'
            # always lexes as the separator (lexer.go:84-98) — numbers may
            # *contain* dots but not start the number scan from one.
            if c in _SINGLE:
                out.append(Token(_SINGLE[c], c, self.i))
                self.i += 1
                continue
            if c in KEYWORD_CHARS:
                out.append(self._run(TokenKind.KEYWORD, KEYWORD_CHARS))
                continue
            if c in NUMBER_CHARS:
                out.append(self._run(TokenKind.NUMBER, NUMBER_CHARS))
                continue
            if c in "!<>":
                if self.i + 1 < n and self.text[self.i + 1] == "=":
                    out.append(Token(TokenKind.OPERATOR, c + "=", self.i))
                    self.i += 2
                else:
                    out.append(Token(TokenKind.OPERATOR, c, self.i))
                    self.i += 1
                continue
            if c == "=":
                out.append(Token(TokenKind.OPERATOR, c, self.i))
                self.i += 1
                continue
            raise LexError(f"Unexpected character '{c}' at index {self.i}")
        return out

    def _skip_comment(self) -> None:
        start = self.i
        self.i += 1
        if self.i >= len(self.text) or self.text[self.i] != "/":
            raise LexError(f"Unexpected '/' at index {start}")
        while self.i < len(self.text) and self.text[self.i] not in "\r\n":
            self.i += 1

    def _run(self, kind: TokenKind, chars: set[str]) -> Token:
        start = self.i
        while self.i < len(self.text) and self.text[self.i] in chars:
            self.i += 1
        return Token(kind, self.text[start : self.i], start)
