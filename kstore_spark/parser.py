"""Front end for the reference's imperative column-algebra DSL.

The reference grammar is regular — an sscanf cascade over fixed operator
forms (reference: src/common/parser.c:74-407 is the authoritative list;
round-trip validation at parser.c:395-401). We mirror it as an ordered
table of anchored regexes producing typed Op dataclasses. There are no
expressions, no nesting, no quoting beyond the storage-type / filename
string literals.

Accepted forms (reference README.md:120-200, assts/p2-p4.txt):

    create(C,"unsorted"|"sorted"|"b+tree")
    load("path.csv")
    insert(c1,v1[,c2,v2,...])
    delete(PosVar,c1[,c2,...])
    update(PosVar,C,val)
    [v=]select(C) | [v=]select(C,x) | [v=]select(C,lo,hi)
    [v=]fetch(C,PosVar)
    [v=]min|max|sum|avg|count(V)
    [v=]add|sub|mul|div(V1,V2)
    l,r=hashjoin|sortjoin|treejoin|loopjoin(LV,RV)
    l,r=saltjoin(LV,RV)            -- extension: skew-salted equi-join
    tuple(v1[,...])
    print(v)
    explain(v)                     -- extension: show the Catalyst plan

Whitespace is not significant around tokens; lines starting with ``--`` or
empty lines are skipped (comment convention of the reference's test
scripts).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class ParseError(ValueError):
    pass


@dataclass(frozen=True)
class Op:
    kind: str                      # create|load|insert|delete|update|select|fetch|agg|math|join|tuple|print
    assign: tuple[str, ...] = ()   # target variable name(s); () = bare (print immediately)
    args: dict = field(default_factory=dict)


_ID = r"[A-Za-z_][A-Za-z0-9_.]*"
_INT = r"-?\d+"

_RULES: list[tuple[re.Pattern, str]] = []


def _rule(pattern: str):
    def deco(fn):
        _RULES.append((re.compile(pattern), fn))
        return fn
    return deco


@_rule(rf'^create\(\s*({_ID})\s*,\s*"(unsorted|sorted|b\+tree)"\s*\)$')
def _create(m, assign):
    if assign:
        raise ParseError("create() does not bind a variable")
    return Op("create", (), {"column": m.group(1), "stype": m.group(2)})


@_rule(r'^load\(\s*"([^"]+)"\s*\)$')
def _load(m, assign):
    if assign:
        raise ParseError("load() does not bind a variable")
    return Op("load", (), {"path": m.group(1)})


@_rule(rf"^insert\(\s*({_ID}\s*,\s*{_INT}(?:\s*,\s*{_ID}\s*,\s*{_INT})*)\s*\)$")
def _insert(m, assign):
    if assign:
        raise ParseError("insert() does not bind a variable")
    toks = [t.strip() for t in m.group(1).split(",")]
    pairs = [(toks[i], int(toks[i + 1])) for i in range(0, len(toks), 2)]
    return Op("insert", (), {"pairs": pairs})


@_rule(rf"^delete\(\s*({_ID})\s*,\s*({_ID}(?:\s*,\s*{_ID})*)\s*\)$")
def _delete(m, assign):
    if assign:
        raise ParseError("delete() does not bind a variable")
    cols = [t.strip() for t in m.group(2).split(",")]
    return Op("delete", (), {"posvar": m.group(1), "columns": cols})


@_rule(rf"^update\(\s*({_ID})\s*,\s*({_ID})\s*,\s*({_INT})\s*\)$")
def _update(m, assign):
    if assign:
        raise ParseError("update() does not bind a variable")
    return Op("update", (), {"posvar": m.group(1), "column": m.group(2), "value": int(m.group(3))})


@_rule(rf"^select\(\s*({_ID})\s*\)$")
def _select_all(m, assign):
    return Op("select", assign, {"column": m.group(1), "mode": "all"})


@_rule(rf"^select\(\s*({_ID})\s*,\s*({_INT})\s*\)$")
def _select_value(m, assign):
    return Op("select", assign, {"column": m.group(1), "mode": "value", "value": int(m.group(2))})


@_rule(rf"^select\(\s*({_ID})\s*,\s*({_INT})\s*,\s*({_INT})\s*\)$")
def _select_range(m, assign):
    return Op("select", assign, {
        "column": m.group(1), "mode": "range",
        "low": int(m.group(2)), "high": int(m.group(3)),
    })


@_rule(rf"^fetch\(\s*({_ID})\s*,\s*({_ID})\s*\)$")
def _fetch(m, assign):
    return Op("fetch", assign, {"column": m.group(1), "posvar": m.group(2)})


@_rule(rf"^(min|max|sum|avg|count)\(\s*({_ID})\s*\)$")
def _agg(m, assign):
    return Op("agg", assign, {"fn": m.group(1), "var": m.group(2)})


@_rule(rf"^(add|sub|mul|div)\(\s*({_ID})\s*,\s*({_ID})\s*\)$")
def _math(m, assign):
    return Op("math", assign, {"fn": m.group(1), "left": m.group(2), "right": m.group(3)})


@_rule(rf"^(hash|sort|tree|loop|salt)join\(\s*({_ID})\s*,\s*({_ID})\s*\)$")
def _join(m, assign):
    if len(assign) != 2:
        raise ParseError("joins bind exactly two variables: l,r=hashjoin(L,R)")
    return Op("join", assign, {"algorithm": m.group(1), "left": m.group(2), "right": m.group(3)})


@_rule(rf"^tuple\(\s*({_ID}(?:\s*,\s*{_ID})*)\s*\)$")
def _tuple(m, assign):
    if assign:
        raise ParseError("tuple() does not bind a variable")
    return Op("tuple", (), {"vars": [t.strip() for t in m.group(1).split(",")]})


@_rule(rf"^print\(\s*({_ID})\s*\)$")
def _print(m, assign):
    if assign:
        raise ParseError("print() does not bind a variable")
    return Op("print", (), {"var": m.group(1)})


@_rule(rf"^explain\(\s*({_ID})\s*\)$")
def _explain(m, assign):
    if assign:
        raise ParseError("explain() does not bind a variable")
    return Op("explain", (), {"var": m.group(1)})


def op_to_string(op: Op) -> str:
    """Serialize an Op back to canonical DSL text (round-trip validation,
    mirroring the reference's op_string strcmp check, parser.c:395-401)."""
    a = ",".join(op.assign) + "=" if op.assign else ""
    k, g = op.kind, op.args
    if k == "create":
        return f'create({g["column"]},"{g["stype"]}")'
    if k == "load":
        return f'load("{g["path"]}")'
    if k == "insert":
        return "insert(" + ",".join(f"{c},{v}" for c, v in g["pairs"]) + ")"
    if k == "delete":
        return f'delete({g["posvar"]},{",".join(g["columns"])})'
    if k == "update":
        return f'update({g["posvar"]},{g["column"]},{g["value"]})'
    if k == "select":
        if g["mode"] == "all":
            return f'{a}select({g["column"]})'
        if g["mode"] == "value":
            return f'{a}select({g["column"]},{g["value"]})'
        return f'{a}select({g["column"]},{g["low"]},{g["high"]})'
    if k == "fetch":
        return f'{a}fetch({g["column"]},{g["posvar"]})'
    if k == "agg":
        return f'{a}{g["fn"]}({g["var"]})'
    if k == "math":
        return f'{a}{g["fn"]}({g["left"]},{g["right"]})'
    if k == "join":
        return f'{a}{g["algorithm"]}join({g["left"]},{g["right"]})'
    if k == "tuple":
        return f'tuple({",".join(g["vars"])})'
    if k == "print":
        return f'print({g["var"]})'
    if k == "explain":
        return f'explain({g["var"]})'
    raise ValueError(f"unknown op kind {k}")


_ASSIGN_RE = re.compile(rf"^({_ID}(?:\s*,\s*{_ID})*)\s*=\s*(.+)$")


def parse_line(line: str) -> Op | None:
    """Parse one DSL line; returns None for blanks/comments."""
    line = line.strip()
    if not line or line.startswith("--") or line.startswith("#"):
        return None
    assign: tuple[str, ...] = ()
    body = line
    m = _ASSIGN_RE.match(line)
    if m:
        assign = tuple(t.strip() for t in m.group(1).split(","))
        body = m.group(2).strip()
    for pattern, builder in _RULES:
        mm = pattern.match(body)
        if mm:
            return builder(mm, assign)
    raise ParseError(f"unparseable query: {line!r}")


def parse_script(text: str) -> list[Op]:
    ops = []
    for lineno, raw in enumerate(text.splitlines(), 1):
        try:
            op = parse_line(raw)
        except ParseError as e:
            raise ParseError(f"line {lineno}: {e}") from None
        if op is not None:
            ops.append(op)
    return ops
