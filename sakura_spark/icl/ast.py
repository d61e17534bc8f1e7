"""Constraint AST — mirrors the reference's FOL tree (lib/constraint.ml:26-32).

A constraint is attached to a relation R; its body is evaluated per tuple of
R (free Vars bind to that tuple's attributes). Bindings inside MemberOf map
the *target* relation's attributes to either a Var (attribute of the
constrained tuple, possibly namespaced "q.attr" under a quantifier) or a
constant.

Comparison shorthands (lt/lte/gt/gte/eq/neq/between — lib/constraint.ml:
548-593) are modelled as first-class Cmp/Between nodes: in the reference
they are MemberOf against infinite comparison relations; our compiler emits
Column predicates directly, which is the same rewrite prelude.py applies to
DRL joins.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Union


@dataclass(frozen=True)
class Var:
    """Reference to an attribute of the constrained tuple; under a
    quantifier, "var.attr" refers to the quantified relation's tuple."""

    name: str


@dataclass(frozen=True)
class ConstVal:
    value: object


Binding = Union[Var, ConstVal]


class Body:
    __slots__ = ()


@dataclass(frozen=True)
class MemberOf(Body):
    """The bound tuple must be a member of `target` — the FK primitive
    (docs/constraints.org:75-89). bindings: target_attr -> Var|ConstVal."""

    target: str
    bindings: tuple[tuple[str, Binding], ...]


@dataclass(frozen=True)
class Not(Body):
    """Closed-world negation (reference carries a universe relation;
    violations-compilation makes it implicit)."""

    body: Body


@dataclass(frozen=True)
class And(Body):
    left: Body
    right: Body


@dataclass(frozen=True)
class Or(Body):
    left: Body
    right: Body


@dataclass(frozen=True)
class Exists(Body):
    """∃ tuple in `quantifier` (finite relation) satisfying body; inside
    body, Var("var.attr") refers to the quantified tuple
    (lib/constraint.ml:230-251)."""

    var: str
    quantifier: str
    body: Body


@dataclass(frozen=True)
class Forall(Body):
    var: str
    quantifier: str
    body: Body


@dataclass(frozen=True)
class Cmp(Body):
    """Comparison shorthand: op in {lt, lte, gt, gte, eq, neq}."""

    op: str
    left: Binding
    right: Binding


@dataclass(frozen=True)
class Between(Body):
    value: Binding
    low: Binding
    high: Binding


# --- JSON (de)serialization for manifests -----------------------------------


def _binding_to_json(b: Binding) -> dict:
    if isinstance(b, Var):
        return {"var": b.name}
    return {"const": b.value}


def _binding_from_json(d: dict) -> Binding:
    return Var(d["var"]) if "var" in d else ConstVal(d["const"])


def body_to_json(body: Body) -> dict:
    if isinstance(body, MemberOf):
        return {
            "t": "member_of",
            "target": body.target,
            "bindings": [[a, _binding_to_json(b)] for a, b in body.bindings],
        }
    if isinstance(body, Not):
        return {"t": "not", "body": body_to_json(body.body)}
    if isinstance(body, (And, Or)):
        return {
            "t": "and" if isinstance(body, And) else "or",
            "left": body_to_json(body.left),
            "right": body_to_json(body.right),
        }
    if isinstance(body, (Exists, Forall)):
        return {
            "t": "exists" if isinstance(body, Exists) else "forall",
            "var": body.var,
            "quantifier": body.quantifier,
            "body": body_to_json(body.body),
        }
    if isinstance(body, Cmp):
        return {
            "t": "cmp",
            "op": body.op,
            "left": _binding_to_json(body.left),
            "right": _binding_to_json(body.right),
        }
    if isinstance(body, Between):
        return {
            "t": "between",
            "value": _binding_to_json(body.value),
            "low": _binding_to_json(body.low),
            "high": _binding_to_json(body.high),
        }
    raise ValueError(f"unknown body: {body!r}")


def body_from_json(d: dict) -> Body:
    t = d["t"]
    if t == "member_of":
        return MemberOf(
            d["target"], tuple((a, _binding_from_json(b)) for a, b in d["bindings"])
        )
    if t == "not":
        return Not(body_from_json(d["body"]))
    if t in ("and", "or"):
        cls = And if t == "and" else Or
        return cls(body_from_json(d["left"]), body_from_json(d["right"]))
    if t in ("exists", "forall"):
        cls = Exists if t == "exists" else Forall
        return cls(d["var"], d["quantifier"], body_from_json(d["body"]))
    if t == "cmp":
        return Cmp(d["op"], _binding_from_json(d["left"]), _binding_from_json(d["right"]))
    if t == "between":
        return Between(
            _binding_from_json(d["value"]),
            _binding_from_json(d["low"]),
            _binding_from_json(d["high"]),
        )
    raise ValueError(f"unknown body tag: {t}")
