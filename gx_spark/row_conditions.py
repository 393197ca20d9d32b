"""GE mini-DSL row_condition parser.

The reference accepts two condition dialects (ref:
great_expectations/expectations/row_conditions.py + parse_condition_to_spark):
`condition_parser="spark"` passes the string to Catalyst verbatim (our
default), while `condition_parser="great_expectations"` uses a restricted
DSL: `col("name") <op> <literal>`, null checks, membership, combined with
and/or/not and parentheses.  This module translates the DSL to an
equivalent Spark SQL string ONCE at plan time — after translation the
engine treats it exactly like a native SQL row_condition (domain dedup,
fused aggs, pushdown all apply).

Supported:
    col("x") == 5        col("x") != 'a'      col("x") > 3.5
    col("x") >= ...      col("x") < ...       col("x") <= ...
    col("x").isNull()    col("x").notNull()
    col("x").isin([1, 2, 3])     col("x") in [1, 2, 3]
    A and B, A or B, not A, parentheses
"""

from __future__ import annotations

import re
from typing import Any

GE_PARSERS = ("great_expectations", "great_expectations__experimental__")

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<col>col\(\s*(?P<q1>["'])(?P<colname>.+?)(?P=q1)\s*\))
      | (?P<method>\.(?:isNull|notNull|isin)\b)
      | (?P<op>==|!=|>=|<=|>|<)
      | (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<lbrack>\[)
      | (?P<rbrack>\])
      | (?P<comma>,)
      | (?P<kw>\b(?:and|or|not|in|AND|OR|NOT|IN)\b)
      | (?P<str>(?P<q2>["'])(?:\\.|(?!(?P=q2)).)*(?P=q2))
      | (?P<num>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
      | (?P<bool>\b(?:true|false|True|False)\b)
      | (?P<null>\b(?:None|null|NULL)\b)
    )""",
    re.VERBOSE,
)


class DSLError(ValueError):
    pass


def _tokenize(s: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise DSLError(f"cannot tokenize row_condition at: {s[pos:]!r}")
        kind = m.lastgroup
        # lastgroup returns the LAST matched group; find the named kind
        for k in ("col", "method", "op", "lparen", "rparen", "lbrack",
                  "rbrack", "comma", "kw", "str", "num", "bool", "null"):
            if m.group(k):
                kind = k
                break
        if kind == "col":
            out.append(("col", m.group("colname")))
        else:
            out.append((kind, m.group(0).strip()))
        pos = m.end()
    return out


def _sql_ident(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


def _sql_literal(kind: str, text: str) -> str:
    if kind == "num":
        return text
    if kind == "bool":
        return text.upper() if text.lower() in ("true", "false") else text
    if kind == "null":
        return "NULL"
    if kind == "str":
        inner = text[1:-1].replace("\\'", "'").replace('\\"', '"')
        return "'" + inner.replace("'", "''") + "'"
    raise DSLError(f"expected a literal, got {text!r}")


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]) -> None:
        self.toks = tokens
        self.i = 0

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        t = self.peek()
        if t is None:
            raise DSLError("unexpected end of row_condition")
        self.i += 1
        return t

    def expect(self, kind: str, text: str | None = None) -> tuple[str, str]:
        t = self.next()
        if t[0] != kind or (text is not None and t[1] != text):
            raise DSLError(f"expected {text or kind}, got {t[1]!r}")
        return t

    # expr := and_term (OR and_term)*
    def parse_expr(self) -> str:
        parts = [self.parse_and()]
        while (t := self.peek()) and t[0] == "kw" and t[1].lower() == "or":
            self.next()
            parts.append(self.parse_and())
        return " OR ".join(parts) if len(parts) > 1 else parts[0]

    def parse_and(self) -> str:
        parts = [self.parse_not()]
        while (t := self.peek()) and t[0] == "kw" and t[1].lower() == "and":
            self.next()
            parts.append(self.parse_not())
        return " AND ".join(parts) if len(parts) > 1 else parts[0]

    def parse_not(self) -> str:
        t = self.peek()
        if t and t[0] == "kw" and t[1].lower() == "not":
            self.next()
            return f"(NOT {self.parse_not()})"
        return self.parse_primary()

    def _parse_value_list(self, open_kind: str, close_kind: str) -> list[str]:
        self.expect(open_kind)
        vals = []
        while True:
            t = self.next()
            if t[0] == close_kind:
                break
            if t[0] == "comma":
                continue
            vals.append(_sql_literal(t[0], t[1]))
        return vals

    def parse_primary(self) -> str:
        t = self.next()
        if t[0] == "lparen":
            inner = self.parse_expr()
            self.expect("rparen")
            return f"({inner})"
        if t[0] != "col":
            raise DSLError(f"expected col(\"...\") , got {t[1]!r}")
        ident = _sql_ident(t[1])
        nxt = self.peek()
        if nxt is None:
            raise DSLError(f"dangling column reference {ident}")
        if nxt[0] == "method":
            self.next()
            name = nxt[1].lstrip(".")
            if name == "isNull":
                self.expect("lparen"), self.expect("rparen")
                return f"{ident} IS NULL"
            if name == "notNull":
                self.expect("lparen"), self.expect("rparen")
                return f"{ident} IS NOT NULL"
            if name == "isin":
                self.expect("lparen")
                vals = self._parse_value_list("lbrack", "rbrack")
                self.expect("rparen")
                return f"{ident} IN ({', '.join(vals)})"
            raise DSLError(f"unknown method .{name}()")
        if nxt[0] == "kw" and nxt[1].lower() == "in":
            self.next()
            vals = self._parse_value_list("lbrack", "rbrack")
            return f"{ident} IN ({', '.join(vals)})"
        if nxt[0] == "op":
            self.next()
            op = {"==": "=", "!=": "<>"}.get(nxt[1], nxt[1])
            lit = self.next()
            if lit[0] == "null":
                return (f"{ident} IS NULL" if op == "="
                        else f"{ident} IS NOT NULL" if op == "<>"
                        else _raise(f"cannot order-compare NULL with {op}"))
            return f"{ident} {op} {_sql_literal(lit[0], lit[1])}"
        raise DSLError(f"expected an operator after {ident}, got {nxt[1]!r}")


def _raise(msg: str):
    raise DSLError(msg)


def ge_condition_to_sql(condition: str) -> str:
    """Translate a GE mini-DSL row_condition to an equivalent Spark SQL
    predicate string.  Raises DSLError on anything outside the dialect."""
    p = _Parser(_tokenize(condition))
    sql = p.parse_expr()
    if p.peek() is not None:
        raise DSLError(f"trailing tokens in row_condition: {p.toks[p.i:]!r}")
    return sql


def normalize_row_condition(kwargs: dict[str, Any]) -> dict[str, Any]:
    """If the configuration uses the GE mini-DSL parser, rewrite it in place
    to the equivalent Spark-SQL condition (called once at plan time)."""
    parser = kwargs.get("condition_parser")
    rc = kwargs.get("row_condition")
    if rc and parser in GE_PARSERS:
        kwargs = dict(kwargs)
        kwargs["row_condition"] = ge_condition_to_sql(rc)
        kwargs["condition_parser"] = "spark"
    return kwargs
