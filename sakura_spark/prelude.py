"""Intensional (infinite) prelude relations compiled to Column expressions.

The reference has no scalar functions; arithmetic and comparison are
*infinite relations* enumerated by Cantor/triangular generators with an
intensional membership predicate (lib/prelude/standard.ml:53-330,
docs/constraints.org:142-167). Spark cannot enumerate an infinite relation,
and must not: the idiomatic translation — this module — rewrites any join
against such a relation into expressions (SURVEY §7 risk 1):

  * all attributes bound by the join  -> a filter predicate
    (membership check, e.g. join on (left,right) with less_than -> l < r)
  * output attributes unbound         -> withColumn definitions
    (computation, e.g. join on (a,b) with plus -> sum := a + b)

Each relation also reports per-attribute "functional completions": which
attrs are derivable from which, so the DRL compiler can decide whether a
join is computable or must be rejected by the finiteness gate
(lib/drl/gate.ml:71-79, proof/Drl.v:49-67).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class IntensionalRelation:
    """An infinite relation defined by a predicate and optional completions.

    ``predicate``: dict attr -> Column, returns the membership Column.
    ``completions``: {frozenset(bound_attrs): {derived_attr: fn(bound cols)}}
    — given these bound attrs, the remaining attrs are computed columns.
    """

    name: str
    attrs: tuple[str, ...]
    predicate: Callable[[dict[str, Column]], Column]
    completions: dict[frozenset, dict[str, Callable[[dict[str, Column]], Column]]]
    guard: Callable[[dict[str, Column]], Column] | None = None  # domain guard, e.g. b > 0


def _cmp(name: str, op: Callable[[Column, Column], Column]) -> IntensionalRelation:
    return IntensionalRelation(
        name=name,
        attrs=("left", "right"),
        predicate=lambda b: op(b["left"], b["right"]),
        completions={},  # comparisons derive nothing; both sides must bind
    )


PRELUDE: dict[str, IntensionalRelation] = {}


def _register(rel: IntensionalRelation) -> None:
    PRELUDE[rel.name] = rel


# Comparison relations (lib/prelude/standard.ml:53-161). The reference names
# them natural_natural_*; we register both that spelling and a short alias.
for short, op in [
    ("less_than", lambda l, r: l < r),
    ("less_than_or_equal", lambda l, r: l <= r),
    ("greater_than", lambda l, r: l > r),
    ("greater_than_or_equal", lambda l, r: l >= r),
    ("equal", lambda l, r: l == r),
    ("not_equal", lambda l, r: l != r),
]:
    rel = _cmp(f"natural_natural_{short}", op)
    _register(rel)
    PRELUDE[short] = rel

# Arithmetic relations (lib/prelude/standard.ml:163-330).
_register(
    IntensionalRelation(
        name="natural_plus",
        attrs=("a", "b", "sum"),
        predicate=lambda x: (x["a"] + x["b"]) == x["sum"],
        completions={
            frozenset({"a", "b"}): {"sum": lambda x: x["a"] + x["b"]},
            frozenset({"a", "sum"}): {"b": lambda x: x["sum"] - x["a"]},
            frozenset({"b", "sum"}): {"a": lambda x: x["sum"] - x["b"]},
        },
        guard=lambda x: F.lit(True),
    )
)
_register(
    IntensionalRelation(
        name="natural_times",
        attrs=("a", "b", "product"),
        predicate=lambda x: (x["a"] * x["b"]) == x["product"],
        completions={frozenset({"a", "b"}): {"product": lambda x: x["a"] * x["b"]}},
    )
)
_register(
    IntensionalRelation(
        name="natural_minus",
        # difference >= 0: naturals are closed under truncated subtraction
        # (lib/prelude/standard.ml:240-279)
        attrs=("a", "b", "difference"),
        predicate=lambda x: ((x["a"] - x["b"]) == x["difference"]) & (x["difference"] >= 0),
        completions={frozenset({"a", "b"}): {"difference": lambda x: x["a"] - x["b"]}},
        guard=lambda x: x["a"] >= x["b"],
    )
)
_register(
    IntensionalRelation(
        name="natural_divide",
        # a = b*q + r, 0 <= r < b, b > 0 (lib/prelude/standard.ml:281-330)
        attrs=("a", "b", "quotient", "remainder"),
        predicate=lambda x: (x["a"] == x["b"] * x["quotient"] + x["remainder"])
        & (x["remainder"] >= 0)
        & (x["remainder"] < x["b"]),
        completions={
            frozenset({"a", "b"}): {
                "quotient": lambda x: F.floor(x["a"] / x["b"]).cast("long"),
                "remainder": lambda x: x["a"] % x["b"],
            }
        },
        guard=lambda x: x["b"] > 0,
    )
)
PRELUDE["plus"] = PRELUDE["natural_plus"]
PRELUDE["times"] = PRELUDE["natural_times"]
PRELUDE["minus"] = PRELUDE["natural_minus"]
PRELUDE["divide"] = PRELUDE["natural_divide"]


def is_intensional(name: str) -> bool:
    return name in PRELUDE


def rewrite_join(df: DataFrame, rel_name: str, attr_map: dict[str, str]) -> DataFrame:
    """Rewrite ``df ⋈ PRELUDE[rel_name]`` into expressions.

    ``attr_map``: intensional attr -> df column bound to it. Unbound attrs
    of the relation are added as computed columns when a completion exists;
    otherwise the join is not finitely computable and we raise (the gate's
    "use Take" rejection is not enough — an unbound non-derivable attr means
    an infinite result, reference lib/drl/gate.ml:75-79).
    """
    rel = PRELUDE[rel_name]
    bound = {a: F.col(c) for a, c in attr_map.items() if a in rel.attrs}
    unbound = [a for a in rel.attrs if a not in bound]
    if not unbound:
        cond = rel.predicate(bound)
        if rel.guard is not None:
            cond = cond & rel.guard(bound)
        return df.filter(cond)
    completion = rel.completions.get(frozenset(bound))
    if completion is None or set(unbound) - set(completion):
        raise ValueError(
            f"join against infinite relation {rel_name!r} with bound attrs "
            f"{sorted(bound)} has no finite completion — not computable"
        )
    if rel.guard is not None:
        df = df.filter(rel.guard(bound))
    for attr in unbound:
        df = df.withColumn(attr_map.get(attr, attr), completion[attr](bound))
    return df
