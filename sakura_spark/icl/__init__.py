"""ICL — first-order-logic integrity constraints over relations.

The reference expresses constraints as FOL trees whose atoms are relation
*membership* (constraints are themselves relations — lib/constraint.ml:26-32,
docs/constraints.org). Our engine compiles each constraint to a
violations-DataFrame: set-based, whole-batch validation instead of the
reference's per-tuple evaluator — the same semantics, distributed.
"""

from sakura_spark.icl.ast import (
    And,
    Between,
    Cmp,
    ConstVal,
    Exists,
    Forall,
    MemberOf,
    Not,
    Or,
    Var,
)
from sakura_spark.icl.compiler import polarity, satisfied_rows, violations

__all__ = [
    "MemberOf", "Not", "And", "Or", "Exists", "Forall", "Var", "ConstVal",
    "Cmp", "Between", "satisfied_rows", "violations", "polarity",
]
