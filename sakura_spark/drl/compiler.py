"""DRL AST -> DataFrame compiler.

The reference executor maps each AST node to a lazy generator
(lib/drl/executor.ml:23-71); here each node maps to a DataFrame
transformation, so the composed query is a single Catalyst logical plan —
filters push down through the whole tree, joins reorder, and scans prune,
none of which the reference could do.

The one genuine semantic divergence (SURVEY §7 risk 1) is handled here:
a Join/Select against an *intensional* prelude relation (natural_plus,
less_than, ... — infinite, generator-defined in the reference) is rewritten
into Column expressions via sakura_spark.prelude instead of enumerated.
"""

from __future__ import annotations

from typing import Callable, Union

from pyspark.sql import DataFrame, Row, SparkSession

from sakura_spark import algebra, prelude
from sakura_spark.drl import ast
from sakura_spark.drl.gate import admit, default_is_finite

Resolver = Union[Callable[[str], DataFrame], dict]


def _resolve(resolver: Resolver, name: str) -> DataFrame:
    if isinstance(resolver, dict):
        try:
            return resolver[name]
        except KeyError:
            raise KeyError(f"unknown relation: {name}") from None
    return resolver(name)


def compile_query(
    spark: SparkSession,
    q: ast.Query,
    resolver: Resolver,
    gate: bool = True,
) -> DataFrame:
    """Compile a DRL query to a DataFrame.

    ``gate=True`` applies the reference's finiteness gate before
    compilation; gate=False admits queries our intensional-join rewrite can
    nevertheless compute finitely (documented extension).
    """
    if gate:
        admit(q, default_is_finite)
    return _compile(spark, q, resolver)


def _compile(spark: SparkSession, q: ast.Query, resolver: Resolver) -> DataFrame:
    if isinstance(q, ast.Base):
        if prelude.is_intensional(q.name):
            raise ValueError(
                f"intensional relation {q.name!r} cannot be enumerated; "
                "join against it or wrap in Take after binding its attributes"
            )
        return _resolve(resolver, q.name)

    if isinstance(q, ast.Const):
        return algebra.const_relation(spark, [dict(q.pairs)])

    if isinstance(q, ast.Select):
        source = _compile(spark, q.source, resolver)
        if isinstance(q.filter, ast.Base) and prelude.is_intensional(q.filter.name):
            rel = prelude.PRELUDE[q.filter.name]
            common = [a for a in rel.attrs if a in source.columns]
            return prelude.rewrite_join(source, q.filter.name, {a: a for a in common})
        filt = _compile(spark, q.filter, resolver)
        return algebra.semijoin(filt, source)

    if isinstance(q, ast.Join):
        lint = isinstance(q.left, ast.Base) and prelude.is_intensional(q.left.name)
        rint = isinstance(q.right, ast.Base) and prelude.is_intensional(q.right.name)
        if lint and rint:
            raise ValueError("cannot join two intensional relations")
        if lint or rint:
            concrete = _compile(spark, q.right if lint else q.left, resolver)
            rel_name = (q.left if lint else q.right).name
            rel = prelude.PRELUDE[rel_name]
            missing = [a for a in q.attrs if a not in concrete.columns]
            if missing:
                raise ValueError(
                    f"join attributes {missing} not present on the concrete side "
                    f"of the intensional join against {rel_name!r}"
                )
            # Join attrs bind; remaining intensional attrs become computed
            # columns under their own names (the reference's merged schema).
            attr_map = {a: a for a in rel.attrs if a in concrete.columns}
            return prelude.rewrite_join(concrete, rel_name, attr_map)
        left = _compile(spark, q.left, resolver)
        right = _compile(spark, q.right, resolver)
        return algebra.equijoin(left, right, list(q.attrs))

    if isinstance(q, ast.Cartesian):
        return algebra.cartesian(
            _compile(spark, q.left, resolver), _compile(spark, q.right, resolver)
        )

    if isinstance(q, ast.Project):
        return algebra.project(_compile(spark, q.source, resolver), list(q.attrs))

    if isinstance(q, ast.Rename):
        return algebra.rename(_compile(spark, q.source, resolver), dict(q.pairs))

    if isinstance(q, ast.Union):
        return algebra.union(
            _compile(spark, q.left, resolver), _compile(spark, q.right, resolver)
        )

    if isinstance(q, ast.Diff):
        return algebra.diff(
            _compile(spark, q.left, resolver), _compile(spark, q.right, resolver)
        )

    if isinstance(q, ast.Take):
        return algebra.take(_compile(spark, q.source, resolver), q.n)

    raise ValueError(f"unknown query node: {q!r}")
