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


# --- algebra propagation transforms (lib/constraint.ml:65-119) ---------------


def _root(name: str) -> str:
    """A namespaced quantifier reference "r.attr" resolves by its root
    variable "r" (this engine's spelling for the reference's quantified
    lookups; the reference matches variable atoms literally)."""
    return name.split(".", 1)[0] if "." in name else name


def _binding_vars(b: Binding) -> set[str]:
    return {_root(b.name)} if isinstance(b, Var) else set()


def filter_by_attrs(attrs: list[str], body: Body) -> Body | None:
    """Drop a constraint that references attributes outside ``attrs``;
    returns None when it cannot be kept (Constraint.filter_by_attrs,
    lib/constraint.ml:95-119). Rules: a MemberOf/comparison survives iff
    every variable it references is present; Not follows its body; And
    keeps the surviving branches (None only if none survive); Or needs
    ALL branches to survive (a pruned disjunct would strengthen the
    constraint — unsound); Exists/Forall add their bound variable to the
    allowed set for the body."""
    allowed = set(attrs)

    def go(b: Body, allowed: set[str]) -> Body | None:
        if isinstance(b, MemberOf):
            used = set()
            for _, expr in b.bindings:
                used |= _binding_vars(expr)
            return b if used <= allowed else None
        if isinstance(b, (Cmp, Between)):
            used = set()
            for expr in (
                (b.left, b.right) if isinstance(b, Cmp) else (b.value, b.low, b.high)
            ):
                used |= _binding_vars(expr)
            return b if used <= allowed else None
        if isinstance(b, Not):
            inner = go(b.body, allowed)
            return Not(inner) if inner is not None else None
        if isinstance(b, (And, Or)):
            # The binary tree flattens to the reference's n-ary list form.
            cls = And if isinstance(b, And) else Or
            branches: list[Body] = []

            def flat(x: Body) -> None:
                if isinstance(x, cls):
                    flat(x.left)
                    flat(x.right)
                else:
                    branches.append(x)

            flat(b)
            kept = [k for k in (go(br, allowed) for br in branches) if k is not None]
            if isinstance(b, Or) and len(kept) != len(branches):
                return None
            if not kept:
                return None
            out = kept[0]
            for k in kept[1:]:
                out = cls(out, k)
            return out
        if isinstance(b, (Exists, Forall)):
            inner = go(b.body, allowed | {b.var})
            if inner is None:
                return None
            cls2 = Exists if isinstance(b, Exists) else Forall
            return cls2(b.var, b.quantifier, inner)
        raise TypeError(f"unknown constraint body: {b!r}")

    return go(body, allowed)


def vars_in(body: Body) -> set[str]:
    """Every variable name referenced in the body (Constraint.vars_in,
    lib/constraint.ml:43-63): Var bindings anywhere in the tree, by their
    root for namespaced "r.attr" references; Consts contribute nothing;
    Exists/Forall contribute their bound variable."""
    if isinstance(body, MemberOf):
        out: set[str] = set()
        for _, expr in body.bindings:
            out |= _binding_vars(expr)
        return out
    if isinstance(body, Cmp):
        return _binding_vars(body.left) | _binding_vars(body.right)
    if isinstance(body, Between):
        return _binding_vars(body.value) | _binding_vars(body.low) | _binding_vars(body.high)
    if isinstance(body, Not):
        return vars_in(body.body)
    if isinstance(body, (And, Or)):
        return vars_in(body.left) | vars_in(body.right)
    if isinstance(body, (Exists, Forall)):
        return {body.var} | vars_in(body.body)
    raise TypeError(f"unknown constraint body: {body!r}")


def and_(bodies: list[Body]) -> Body:
    """Smart conjunction (Constraint.and_, lib/constraint.ml:548-556):
    a singleton list IS its element (no wrapper node); longer lists fold
    into the binary And tree (this engine's spelling of the reference's
    n-ary And list)."""
    if not bodies:
        raise ValueError("and_ of empty list")
    out = bodies[0]
    for b in bodies[1:]:
        out = And(out, b)
    return out


def or_(bodies: list[Body]) -> Body:
    """Smart disjunction (Constraint.or_, lib/constraint.ml:558-566);
    singleton unwraps like :func:`and_`."""
    if not bodies:
        raise ValueError("or_ of empty list")
    out = bodies[0]
    for b in bodies[1:]:
        out = Or(out, b)
    return out


def merge_constraints(
    named: list[tuple[str, Body]],
) -> list[tuple[str, Body]]:
    """Merge a named-constraint list (Constraint.merge,
    lib/constraint.ml:121-139): distinct names all survive in first-seen
    order; duplicate names conjoin into one entry via :func:`and_`."""
    order: list[str] = []
    grouped: dict[str, list[Body]] = {}
    for name, body in named:
        if name not in grouped:
            order.append(name)
            grouped[name] = []
        grouped[name].append(body)
    return [(name, and_(grouped[name])) for name in order]


def rename_vars(mapping: dict[str, str], body: Body) -> Body:
    """Rename attribute references per {old: new} (Constraint.rename_vars,
    lib/constraint.ml:65-93): binding KEYS and Var names both rename (the
    reference renames both), quantifier bound variables rename, Consts
    pass through. Namespaced "r.attr" references rename by their root."""

    def nm(name: str) -> str:
        if "." in name:
            root, rest = name.split(".", 1)
            return f"{mapping.get(root, root)}.{rest}"
        return mapping.get(name, name)

    def rb(expr: Binding) -> Binding:
        return Var(nm(expr.name)) if isinstance(expr, Var) else expr

    def go(b: Body) -> Body:
        if isinstance(b, MemberOf):
            return MemberOf(
                b.target, tuple((nm(k), rb(v)) for k, v in b.bindings)
            )
        if isinstance(b, Cmp):
            return Cmp(b.op, rb(b.left), rb(b.right))
        if isinstance(b, Between):
            return Between(rb(b.value), rb(b.low), rb(b.high))
        if isinstance(b, Not):
            return Not(go(b.body))
        if isinstance(b, And):
            return And(go(b.left), go(b.right))
        if isinstance(b, Or):
            return Or(go(b.left), go(b.right))
        if isinstance(b, Exists):
            return Exists(nm(b.var), b.quantifier, go(b.body))
        if isinstance(b, Forall):
            return Forall(nm(b.var), b.quantifier, go(b.body))
        raise TypeError(f"unknown constraint body: {b!r}")

    return go(body)
