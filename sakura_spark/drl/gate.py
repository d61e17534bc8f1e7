"""Finiteness gate — the reference's Coq-verified admission check.

Re-implements `predicted_finite` (lib/drl_verified/drl_verified.ml:39-67,
proof/Drl.v:49-67) over our AST: Const/Take are always finite; Join,
Cartesian and Union are finite iff both sides are; Select/Project/Rename
inherit the source; Diff inherits the left side; Base is finite iff the
named relation is finite — intensional prelude relations (natural_plus &
co.) are AlephZero.

Spark relations are all finite, so the gate only bites when a query touches
an intensional relation. ``admit`` reproduces the reference behaviour
(reject with "use Take" — lib/drl/gate.ml:75-79); the compiler additionally
supports a non-strict mode where a join that *completes* an intensional
relation (finite output by construction) is admitted — a documented
extension, since our rewrite makes those results finite where the
reference's enumerate-and-join could not prove it.
"""

from __future__ import annotations

from sakura_spark import prelude
from sakura_spark.drl import ast


class GateError(ValueError):
    pass


def predicted_finite(q: ast.Query, is_finite_base) -> bool:
    """is_finite_base: name -> bool (the gate's relation snapshot,
    lib/drl/gate.ml:57-67)."""
    if isinstance(q, ast.Const):
        return True
    if isinstance(q, ast.Take):
        return True
    if isinstance(q, ast.Base):
        return bool(is_finite_base(q.name))
    if isinstance(q, (ast.Join,)):
        return predicted_finite(q.left, is_finite_base) and predicted_finite(
            q.right, is_finite_base
        )
    if isinstance(q, (ast.Cartesian, ast.Union)):
        return predicted_finite(q.left, is_finite_base) and predicted_finite(
            q.right, is_finite_base
        )
    if isinstance(q, ast.Select):
        return predicted_finite(q.source, is_finite_base)
    if isinstance(q, (ast.Project, ast.Rename)):
        return predicted_finite(q.source, is_finite_base)
    if isinstance(q, ast.Diff):
        return predicted_finite(q.left, is_finite_base)
    raise GateError(f"unknown query node: {q!r}")


def default_is_finite(name: str) -> bool:
    return not prelude.is_intensional(name)


def admit(q: ast.Query, is_finite_base=default_is_finite) -> None:
    """Raise unless the result is provably finite (reference wording:
    'potentially infinite result; wrap the query in Take')."""
    if not predicted_finite(q, is_finite_base):
        raise GateError(
            "query may produce an infinite result; wrap it in (Take n ...) "
            "(finiteness gate, cf. reference lib/drl/gate.ml:71-79)"
        )
