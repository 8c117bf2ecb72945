"""String row-filter DSL -> expression tree.

Grammar parity with the reference (pyiceberg/expressions/parser.py:294-310):
comparisons (= == != <> < <= > >=), BETWEEN..AND, IS [NOT] NULL, IS [NOT]
NAN, [NOT] IN (...), [NOT] LIKE 'prefix%' (prefix-only), AND/OR/NOT,
parentheses, quoted identifiers, string/number/bool literals.

Hand-rolled recursive descent (the reference uses pyparsing; we avoid the
dependency). Unlike the reference we only use this for the metadata plane;
the same string is also valid Spark SQL and could be passed to
``df.where``, but parsing it lets the planner prune files from it.
"""

from __future__ import annotations

import re
from typing import Any, List, Optional, Tuple

from . import (
    AlwaysFalse,
    AlwaysTrue,
    And,
    BooleanExpression,
    Not,
    Or,
    UnboundPredicate,
)

_TOKEN_RE = re.compile(
    r"""
    \s*(?:
        (?P<lparen>\() | (?P<rparen>\)) | (?P<comma>,)
      | (?P<op><>|!=|==|<=|>=|=|<|>)
      | (?P<string>'(?:[^']|'')*')
      | (?P<qident>"(?:[^"]|"")*")
      | (?P<number>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
      | (?P<word>[A-Za-z_][A-Za-z0-9_.]*)
    )
    """,
    re.VERBOSE,
)

_KEYWORDS = {"and", "or", "not", "is", "null", "nan", "in", "like", "between", "true", "false"}


class _Tokens:
    def __init__(self, text: str):
        self.toks: List[Tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN_RE.match(text, pos)
            if not m or m.end() == pos:
                if text[pos:].strip():
                    raise ValueError(f"cannot tokenize filter at: {text[pos:]!r}")
                break
            pos = m.end()
            kind = m.lastgroup
            self.toks.append((kind, m.group(kind)))
        self.i = 0

    def peek(self) -> Optional[Tuple[str, str]]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> Tuple[str, str]:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of filter expression")
        self.i += 1
        return t

    def accept_word(self, word: str) -> bool:
        t = self.peek()
        if t and t[0] == "word" and t[1].lower() == word:
            self.i += 1
            return True
        return False

    def expect_word(self, word: str) -> None:
        if not self.accept_word(word):
            raise ValueError(f"expected {word.upper()} at token {self.peek()}")

    def expect(self, kind: str) -> str:
        t = self.next()
        if t[0] != kind:
            raise ValueError(f"expected {kind}, got {t}")
        return t[1]


def _unquote_string(s: str) -> str:
    return s[1:-1].replace("''", "'")


def _unquote_ident(s: str) -> str:
    return s[1:-1].replace('""', '"')


def _literal(tok: Tuple[str, str]) -> Any:
    kind, val = tok
    if kind == "string":
        return _unquote_string(val)
    if kind == "number":
        return float(val) if ("." in val or "e" in val.lower()) else int(val)
    if kind == "word":
        low = val.lower()
        if low == "true":
            return True
        if low == "false":
            return False
    raise ValueError(f"expected a literal, got {tok}")


def _parse_or(tk: _Tokens) -> BooleanExpression:
    left = _parse_and(tk)
    while tk.accept_word("or"):
        left = Or(left, _parse_and(tk))
    return left


def _parse_and(tk: _Tokens) -> BooleanExpression:
    left = _parse_not(tk)
    while tk.accept_word("and"):
        left = And(left, _parse_not(tk))
    return left


def _parse_not(tk: _Tokens) -> BooleanExpression:
    if tk.accept_word("not"):
        return Not(_parse_not(tk))
    return _parse_primary(tk)


def _parse_primary(tk: _Tokens) -> BooleanExpression:
    t = tk.peek()
    if t is None:
        raise ValueError("unexpected end of filter expression")
    if t[0] == "lparen":
        tk.next()
        inner = _parse_or(tk)
        tk.expect("rparen")
        return inner
    if t[0] == "word" and t[1].lower() == "true":
        tk.next()
        return AlwaysTrue()
    if t[0] == "word" and t[1].lower() == "false":
        tk.next()
        return AlwaysFalse()
    return _parse_predicate(tk)


_OP_MAP = {"=": "eq", "==": "eq", "!=": "not_eq", "<>": "not_eq", "<": "lt", "<=": "lt_eq", ">": "gt", ">=": "gt_eq"}
_OP_FLIP = {"eq": "eq", "not_eq": "not_eq", "lt": "gt", "lt_eq": "gt_eq", "gt": "lt", "gt_eq": "lt_eq"}


def _parse_predicate(tk: _Tokens) -> BooleanExpression:
    t = tk.next()
    # literal-on-the-left comparison: 5 < x
    if t[0] in ("string", "number"):
        value = _literal(t)
        op = _OP_MAP[tk.expect("op")]
        ident = _parse_ident(tk.next())
        return UnboundPredicate(_OP_FLIP[op], ident, value)
    ident = _parse_ident(t)
    nxt = tk.peek()
    if nxt is None:
        raise ValueError(f"dangling column reference {ident!r}")
    if nxt[0] == "op":
        op = _OP_MAP[tk.expect("op")]
        return UnboundPredicate(op, ident, _literal(tk.next()))
    if nxt[0] == "word":
        kw = nxt[1].lower()
        negate = False
        if kw == "is":
            tk.next()
            negate = tk.accept_word("not")
            if tk.accept_word("null"):
                return UnboundPredicate("not_null" if negate else "is_null", ident)
            tk.expect_word("nan")
            return UnboundPredicate("not_nan" if negate else "is_nan", ident)
        if kw == "not":
            tk.next()
            negate = True
            nxt = tk.peek()
            kw = nxt[1].lower() if nxt and nxt[0] == "word" else ""
        if kw == "in":
            tk.next()
            tk.expect("lparen")
            values = [_literal(tk.next())]
            while True:
                t2 = tk.next()
                if t2[0] == "rparen":
                    break
                if t2[0] != "comma":
                    raise ValueError(f"expected , or ) in IN list, got {t2}")
                values.append(_literal(tk.next()))
            return UnboundPredicate("not_in" if negate else "in", ident, *values)
        if kw == "like":
            tk.next()
            pattern = _unquote_string(tk.expect("string"))
            body = pattern[:-1] if pattern.endswith("%") else pattern
            if "%" in body or "_" in body:
                raise ValueError(f"LIKE supports prefix patterns only (reference parser parity): {pattern!r}")
            if pattern.endswith("%"):
                return UnboundPredicate("not_starts_with" if negate else "starts_with", ident, body)
            return UnboundPredicate("not_eq" if negate else "eq", ident, pattern)
        if kw == "between":
            tk.next()
            lo = _literal(tk.next())
            tk.expect_word("and")
            hi = _literal(tk.next())
            rng = And(UnboundPredicate("gt_eq", ident, lo), UnboundPredicate("lt_eq", ident, hi))
            return Not(rng) if negate else rng
    raise ValueError(f"cannot parse predicate starting at {nxt}")


def _parse_ident(tok: Tuple[str, str]) -> str:
    if tok[0] == "qident":
        return _unquote_ident(tok[1])
    if tok[0] == "word" and tok[1].lower() not in _KEYWORDS:
        return tok[1]
    raise ValueError(f"expected a column name, got {tok}")


def parse(text: str) -> BooleanExpression:
    """Parse a row-filter string into an unbound expression tree."""
    tk = _Tokens(text)
    expr = _parse_or(tk)
    if tk.peek() is not None:
        raise ValueError(f"trailing tokens in filter: {tk.toks[tk.i:]}")
    return expr
