"""DRL query AST — faithful to the reference's ten constructors
(lib/drl/ast.ml:16-28) with the same S-expression spelling.

Values in Const nodes are the reference's four literal kinds
(Int/Float/Str/Bool — lib/drl/ast.ml:4); Python's int/float/str/bool map
1:1, so Const carries plain Python values.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Union as U

Value = U[int, float, str, bool]


class Query:
    """Base class for DRL query nodes."""

    __slots__ = ()


@dataclass(frozen=True)
class Base(Query):
    """Base relation by name."""

    name: str


@dataclass(frozen=True)
class Const(Query):
    """Constant single-tuple relation from (attr, value) pairs."""

    pairs: tuple[tuple[str, Value], ...]


@dataclass(frozen=True)
class Select(Query):
    """σ semijoin form: keep source tuples matching the filter relation on
    common attrs (lib/drl/executor.ml:35-49)."""

    filter: Query
    source: Query


@dataclass(frozen=True)
class Join(Query):
    """⋈ natural equijoin on named attrs."""

    attrs: tuple[str, ...]
    left: Query
    right: Query


@dataclass(frozen=True)
class Cartesian(Query):
    left: Query
    right: Query


@dataclass(frozen=True)
class Project(Query):
    attrs: tuple[str, ...]
    source: Query


@dataclass(frozen=True)
class Rename(Query):
    pairs: tuple[tuple[str, str], ...]  # (old, new)
    source: Query


@dataclass(frozen=True)
class Union(Query):
    left: Query
    right: Query


@dataclass(frozen=True)
class Diff(Query):
    left: Query
    right: Query


@dataclass(frozen=True)
class Take(Query):
    n: int
    source: Query
