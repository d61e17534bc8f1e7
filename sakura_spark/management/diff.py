"""Database diff at relation and tuple granularity
(reference: lib/management/diff.ml:29-70).

Works on manifests + stored parquet snapshots; tuple-level deltas are
distributed anti-joins on the tuple-hash column, so diffing two 100 TB
states shuffles only the changed relations (unchanged relation hashes
short-circuit without touching data)."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from sakura_spark.hashing import TUPLE_HASH_COL, with_tuple_hash
from sakura_spark.management.store import SnapshotStore


@dataclass
class RelationDelta:
    name: str
    kind: str  # added | removed | modified | schema_conflict
    added: DataFrame | None = None  # tuples present in right, absent in left
    removed: DataFrame | None = None


@dataclass
class DatabaseDiff:
    left_hash: str
    right_hash: str
    deltas: dict[str, RelationDelta] = field(default_factory=dict)

    @property
    def is_empty(self) -> bool:
        return not self.deltas


def _tuples(spark: SparkSession, store: SnapshotStore, entry: dict, name: str) -> DataFrame:
    return with_tuple_hash(store.get_relation(spark, entry["hash"]), name)


def diff_databases(
    spark: SparkSession, store: SnapshotStore, left_hash: str, right_hash: str
) -> DatabaseDiff:
    """left -> right delta. Relations with equal content hashes are skipped
    without reading data (the Merkle-tree advantage)."""
    left = store.get_manifest(left_hash)["relations"]
    right = store.get_manifest(right_hash)["relations"]
    out = DatabaseDiff(left_hash, right_hash)

    for name in sorted(set(left) | set(right)):
        le, re = left.get(name), right.get(name)
        if le is None:
            out.deltas[name] = RelationDelta(
                name, "added", added=_tuples(spark, store, re, name)
            )
        elif re is None:
            out.deltas[name] = RelationDelta(
                name, "removed", removed=_tuples(spark, store, le, name)
            )
        elif le["hash"] == re["hash"]:
            continue
        elif [list(p) for p in le["schema"]] != [list(p) for p in re["schema"]]:
            out.deltas[name] = RelationDelta(name, "schema_conflict")
        else:
            ldf = _tuples(spark, store, le, name)
            rdf = _tuples(spark, store, re, name)
            added = rdf.join(ldf.select(TUPLE_HASH_COL), on=TUPLE_HASH_COL, how="left_anti")
            removed = ldf.join(rdf.select(TUPLE_HASH_COL), on=TUPLE_HASH_COL, how="left_anti")
            out.deltas[name] = RelationDelta(name, "modified", added=added, removed=removed)
    return out
