"""Engine error taxonomy, mirroring the reference's diagnostics
(lib/manipulation.ml, lib/management/merge.ml)."""


class SakuraError(Exception):
    pass


class UnknownRelation(SakuraError):
    pass


class UnknownDomain(SakuraError):
    pass


class RelationExists(SakuraError):
    pass


class DuplicateTuple(SakuraError):
    """Insert of a tuple already present (set semantics —
    lib/manipulation.ml:539-540)."""


class UnknownTuple(SakuraError):
    """Delete of a tuple not present in the relation (retract_tuple
    semantics — lib/manipulation.ml:579-614)."""


class DomainViolation(SakuraError):
    """Value fails its domain's membership criteria
    (lib/manipulation.ml:20-33)."""


class ConstraintViolation(SakuraError):
    def __init__(self, constraint: str, relation: str, detail: str = ""):
        self.constraint = constraint
        self.relation = relation
        super().__init__(
            f"constraint {constraint!r} violated on {relation!r}" + (f": {detail}" if detail else "")
        )


class MergeConflict(SakuraError):
    pass


class SchemaConflict(MergeConflict):
    """Same relation name, different schema on the two sides
    (lib/management/merge.ml:58-79)."""


class UnknownBranch(SakuraError):
    pass


class BranchNotFound(UnknownBranch):
    """A named branch is absent from the registry — the reference's
    distinct BranchNotFound variant (lib/dcl/executor.ml:9), serialized
    on the wire as (branch-not-found <name>) rather than the generic
    sublanguage message. The exception message is the bare branch name,
    exactly what the reference's error sexp carries."""


class StorageError(SakuraError):
    """The reference's generic storage-layer failure
    (lib/dcl/executor.ml:11 StorageError), serialized on the wire as
    (storage-error <message>). Only UpdateBranchTip surfaces a missing
    branch through THIS variant — Branch.update_tip returns the string
    'Branch not found: <name>' (lib/management/branch.ml:59) which the
    executor wraps as StorageError — unlike Checkout/GetBranchTip/Merge,
    which use the BranchNotFound variant above."""


class Conflict(SakuraError):
    """Optimistic-concurrency failure: a mutation's base database hash is
    stale — another writer advanced the head since the client read it
    (lib/listener.ml:53-59 `Atomic.compare_and_set` returning
    `Error (Conflict {old_db; new_db})`)."""

    def __init__(self, expected: str | None, actual: str | None):
        self.expected = expected  # the base hash the writer executed against
        self.actual = actual  # the head that is actually current
        super().__init__(
            f"conflict: head advanced to {actual!r} since base {expected!r} was read"
        )


class CursorError(SakuraError):
    pass


class UnrecognizedSublanguage(SakuraError):
    """Envelope tag with no registered sublanguage
    (lib/error.ml:10, lib/listener.ml:33-34)."""


class MalformedExpression(SakuraError):
    """Top-level command that is not a ``(tag statement)`` pair
    (lib/error.ml:11, lib/listener.ml:44-45)."""


class UnboundedQuantifier(SakuraError):
    """Exists/Forall over a quantifier too large to iterate — the
    reference's UnboundedQuantifier diagnostic (lib/constraint.ml:184-212),
    extended here to also bound *finite but huge* quantifiers, since the
    witness search crossJoins df x quantifier."""

class ConvergenceError(SakuraError):
    """An iterative fixpoint operator (e.g. connected-component label
    propagation) hit its iteration cap while state was still changing —
    returning the partial result would be silently wrong."""


class SclParseError(SakuraError):
    """SCL statement validation failure — non-positive limit
    (lib/scl/parser.ml:3-7), serialized as (parse-error <msg>) under the
    listener's sublanguage-error wrap (lib/scl/executor.ml:24-26)."""
