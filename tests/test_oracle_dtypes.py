"""Registry-wide oracle dtype-kind agreement gate.

The driver's correctness hash is REPRESENTATION-sensitive: an int64
``11188700000`` and a float64 ``1.118870e+10`` hash-mismatch even though
they compare equal.  DuckDB manufactures exactly this divergence on its
own: ``sum(BIGINT)`` returns HUGEINT, which ``.df()`` renders as pandas
float64, while the Spark twin stays int64.  Round 8 shipped a 48/50
artifact through this gap (`graph_pagerank`, `curation_source_stats`),
so this test runs EVERY registered oracle through DuckDB with ``LIMIT 0``
(types are resolved at plan time — no data is read) and asserts its
column kinds can't hash-diverge from the Spark plan schema.

Only the int-vs-float axis is enforced: that's the class DuckDB's type
promotion actually produces, and wider kind comparison (object vs int,
datetime flavors) would be all noise.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Spark simpleString prefixes -> kind class.
_SPARK_INT = {"tinyint", "smallint", "int", "bigint"}
_SPARK_FLOAT = {"float", "double"}


def _spark_kind(simple: str) -> str:
    if simple in _SPARK_INT:
        return "int"
    if simple in _SPARK_FLOAT or simple.startswith("decimal"):
        return "float"
    return "other"


def _pandas_kind(dtype) -> str:
    if dtype.kind in "iu":
        return "int"
    if dtype.kind == "f":
        return "float"
    return "other"


def test_every_oracle_dtype_kind_matches_spark_plan(spark):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    missing = sorted(set(oracles) - set(queries))
    assert not missing, f"oracle_sql entries without queries(): {missing}"

    failures: list[str] = []
    for name, sql in sorted(oracles.items()):
        sdf = queries[name](spark, SF_DIR)
        spark_kinds = {
            f.name: _spark_kind(f.dataType.simpleString()) for f in sdf.schema
        }
        odf = con.execute(f"SELECT * FROM ({sql}) _q LIMIT 0").df()
        for col in odf.columns:
            if col not in spark_kinds:
                failures.append(f"{name}.{col}: oracle-only column")
                continue
            sk, ok_ = spark_kinds[col], _pandas_kind(odf[col].dtype)
            if {sk, ok_} == {"int", "float"}:
                failures.append(
                    f"{name}.{col}: spark={sk} oracle={ok_} "
                    f"(duckdb dtype {odf[col].dtype}) — will hash-mismatch; "
                    "CAST the oracle column"
                )
    assert not failures, "\n".join(failures)
