"""S-expression parser for DRL queries.

Accepts the reference's wire syntax exactly (lib/drl/parser.ml via OCaml's
derived sexp converters), e.g.:

    (Base "users")
    (Const (("age" (Int 18))))
    (Join (id) (Base "L") (Base "R"))
    (Select (Const (("age" (Int 18)))) (Base "users"))
    (Take 5 (Project (name) (Base "users")))
"""

from __future__ import annotations

from sakura_spark.drl import ast


class ParseError(ValueError):
    pass


# --- sexp tokenizer/reader --------------------------------------------------


def _tokenize(s: str) -> list[str]:
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c.isspace():
            i += 1
        elif c in "()":
            out.append(c)
            i += 1
        elif c == '"':
            j = i + 1
            buf = []
            while j < n and s[j] != '"':
                if s[j] == "\\" and j + 1 < n:
                    buf.append(s[j + 1])
                    j += 2
                else:
                    buf.append(s[j])
                    j += 1
            if j >= n:
                raise ParseError("unterminated string literal")
            out.append('"' + "".join(buf))
            i = j + 1
        else:
            j = i
            while j < n and not s[j].isspace() and s[j] not in '()"':
                j += 1
            out.append(s[i:j])
            i = j
    return out


def _read(tokens: list[str], pos: int):
    if pos >= len(tokens):
        raise ParseError("unexpected end of input")
    tok = tokens[pos]
    if tok == "(":
        items = []
        pos += 1
        while pos < len(tokens) and tokens[pos] != ")":
            item, pos = _read(tokens, pos)
            items.append(item)
        if pos >= len(tokens):
            raise ParseError("missing closing paren")
        return items, pos + 1
    if tok == ")":
        raise ParseError("unexpected ')'")
    return tok, pos + 1


def read_sexp(s: str):
    tokens = _tokenize(s)
    expr, pos = _read(tokens, 0)
    if pos != len(tokens):
        raise ParseError(f"trailing tokens after sexp: {tokens[pos:]}")
    return expr


def _atom_str(x) -> str:
    if not isinstance(x, str):
        raise ParseError(f"expected atom, got {x!r}")
    return x[1:] if x.startswith('"') else x


# --- AST construction -------------------------------------------------------


def _value(x) -> ast.Value:
    """(Int 18) | (Float 1.5) | (Str "s") | (Bool true)"""
    if not (isinstance(x, list) and len(x) == 2):
        raise ParseError(f"bad value literal: {x!r}")
    tag, raw = x[0], x[1]
    if tag == "Int":
        return int(_atom_str(raw))
    if tag == "Float":
        return float(_atom_str(raw))
    if tag == "Str":
        return _atom_str(raw)
    if tag == "Bool":
        return _atom_str(raw).lower() == "true"
    raise ParseError(f"unknown value tag: {tag!r}")


def _name_list(x) -> tuple[str, ...]:
    if not isinstance(x, list):
        raise ParseError(f"expected attribute list, got {x!r}")
    return tuple(_atom_str(a) for a in x)


def _build(x) -> ast.Query:
    if not (isinstance(x, list) and x and isinstance(x[0], str)):
        raise ParseError(f"expected (Tag ...), got {x!r}")
    tag, args = x[0], x[1:]

    def arity(n):
        if len(args) != n:
            raise ParseError(f"{tag} expects {n} args, got {len(args)}")

    if tag == "Base":
        arity(1)
        return ast.Base(_atom_str(args[0]))
    if tag == "Const":
        arity(1)
        pairs = []
        for pair in args[0]:
            if not (isinstance(pair, list) and len(pair) == 2):
                raise ParseError(f"bad Const pair: {pair!r}")
            pairs.append((_atom_str(pair[0]), _value(pair[1])))
        return ast.Const(tuple(pairs))
    if tag == "Select":
        arity(2)
        return ast.Select(_build(args[0]), _build(args[1]))
    if tag == "Join":
        arity(3)
        return ast.Join(_name_list(args[0]), _build(args[1]), _build(args[2]))
    if tag == "Cartesian":
        arity(2)
        return ast.Cartesian(_build(args[0]), _build(args[1]))
    if tag == "Project":
        arity(2)
        return ast.Project(_name_list(args[0]), _build(args[1]))
    if tag == "Rename":
        arity(2)
        pairs = tuple(
            (_atom_str(p[0]), _atom_str(p[1]))
            for p in args[0]
            if isinstance(p, list) and len(p) == 2
        )
        if len(pairs) != len(args[0]):
            raise ParseError(f"bad Rename pairs: {args[0]!r}")
        return ast.Rename(pairs, _build(args[1]))
    if tag == "Union":
        arity(2)
        return ast.Union(_build(args[0]), _build(args[1]))
    if tag == "Diff":
        arity(2)
        return ast.Diff(_build(args[0]), _build(args[1]))
    if tag == "Take":
        arity(2)
        return ast.Take(int(_atom_str(args[0])), _build(args[1]))
    raise ParseError(f"unknown query constructor: {tag!r}")


def parse(text: str) -> ast.Query:
    return _build(read_sexp(text))
