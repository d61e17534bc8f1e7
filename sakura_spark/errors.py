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


class CursorError(SakuraError):
    pass
