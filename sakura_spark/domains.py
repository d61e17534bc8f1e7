"""Domain (type) registry.

The reference registers named domains with a membership predicate and
cardinality (lib/domain.ml:1-7, lib/prelude/domains.ml:23-115) and checks
them shallowly at insert (lib/manipulation.ml:20-33). Here a domain maps to
a Spark DataType plus an optional CHECK predicate evaluated as a Column —
validation therefore runs distributed over the whole insert batch, not
row-at-a-time.

Built-ins mirror the reference: integer, natural (>= 0), rational (decimal),
string — extended with Spark's full lattice (double, boolean, timestamp,
date, binary, array/map/struct) since the target workload needs them
(a strict superset, SURVEY §1.2).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class Domain:
    name: str
    spark_type: T.DataType
    # Optional CHECK predicate: Column -> Column(bool). Rows failing it are
    # domain violations (reference: membership_criteria).
    check: Optional[Callable[[Column], Column]] = None
    cardinality: str = "continuum"  # finite | constrained_finite | aleph0 | continuum


BUILTIN_DOMAINS: dict[str, Domain] = {
    "integer": Domain("integer", T.LongType(), cardinality="aleph0"),
    "natural": Domain("natural", T.LongType(), check=lambda c: c >= 0, cardinality="aleph0"),
    "rational": Domain("rational", T.DecimalType(38, 18), cardinality="aleph0"),
    "string": Domain("string", T.StringType()),
    "float": Domain("float", T.DoubleType()),
    "boolean": Domain("boolean", T.BooleanType(), cardinality="finite"),
    "timestamp": Domain("timestamp", T.TimestampType()),
    "date": Domain("date", T.DateType()),
    "binary": Domain("binary", T.BinaryType()),
    "float_vector": Domain("float_vector", T.ArrayType(T.FloatType())),
}


class DomainRegistry:
    """Per-database registry; users add opaque domains via DDL RegisterDomain
    (lib/ddl/executor.ml:52-61)."""

    def __init__(self) -> None:
        self._domains: dict[str, Domain] = dict(BUILTIN_DOMAINS)

    def register(self, domain: Domain) -> None:
        if domain.name in self._domains:
            raise ValueError(f"domain already registered: {domain.name}")
        self._domains[domain.name] = domain

    def get(self, name: str) -> Domain:
        try:
            return self._domains[name]
        except KeyError:
            raise KeyError(f"unknown domain: {name}") from None

    def names(self) -> list[str]:
        return sorted(self._domains)

    def __contains__(self, name: str) -> bool:
        return name in self._domains


def domain_for_spark_type(dt: T.DataType) -> str:
    """Reverse map used when registering external (parquet) tables."""
    mapping = {
        T.LongType(): "integer",
        T.IntegerType(): "integer",
        T.ShortType(): "integer",
        T.StringType(): "string",
        T.DoubleType(): "float",
        T.FloatType(): "float",
        T.BooleanType(): "boolean",
        T.TimestampType(): "timestamp",
        T.TimestampNTZType(): "timestamp",
        T.DateType(): "date",
        T.BinaryType(): "binary",
    }
    if isinstance(dt, T.DecimalType):
        return "rational"
    if isinstance(dt, T.ArrayType) and isinstance(dt.elementType, (T.FloatType, T.DoubleType)):
        return "float_vector"
    return mapping.get(dt, dt.simpleString())


def schema_to_struct(schema_pairs: list[tuple[str, str]], registry: DomainRegistry) -> T.StructType:
    """(attr, domain) pairs -> StructType. No column is nullable: the
    reference model has no NULLs (the project name is literal)."""
    return T.StructType(
        [T.StructField(a, registry.get(d).spark_type, nullable=False) for a, d in schema_pairs]
    )


def domain_violation_cond(
    schema_pairs: list[tuple[str, str]], registry: DomainRegistry
) -> Column:
    """Boolean Column: true on rows violating any domain CHECK (or any NULL
    — no NULLs in the model). Usable inside a larger aggregation so the
    write path folds domain checking into its single stats job."""
    cond = F.lit(False)
    for attr, dom_name in schema_pairs:
        dom = registry.get(dom_name)
        cond = cond | F.col(attr).isNull()
        if dom.check is not None:
            cond = cond | ~dom.check(F.col(attr))
    return cond


def domain_violations(df, schema_pairs: list[tuple[str, str]], registry: DomainRegistry):
    """Filter to rows violating any domain CHECK. One distributed filter for
    the whole batch."""
    return df.filter(domain_violation_cond(schema_pairs, registry))
