"""Content-addressed snapshot store.

The reference persists every value/tuple/relation/database under its
SHA-256 in a KV backend (lib/management/physical.ml). Our unit of storage
is the *relation snapshot*: a parquet directory keyed by the relation's
content hash — columnar, splittable, and written/read by distributed Spark
jobs, which is the 100 TB-appropriate granularity (per-tuple KV writes are
a single-node design; parquet row groups give us the same dedup-by-content
at file level since identical content hashes to the same key and is written
once).

Database states are small JSON manifests (relation name -> {hash, schema,
constraints}) keyed by the database hash — the Merkle root. History,
branches and merge all operate on these manifests without touching data
files; checkout is O(manifest).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, root: str | None = None):
        self.root = root or tempfile.mkdtemp(prefix="sakura_store_")
        os.makedirs(os.path.join(self.root, "relations"), exist_ok=True)
        os.makedirs(os.path.join(self.root, "manifests"), exist_ok=True)
        # Per-hash Spark schema cache: a snapshot is content-addressed, so
        # its schema is immutable — the first read's footer inference is
        # authoritative for every later read of the same key. Passing the
        # schema explicitly skips the per-read parquet schema-inference
        # job (one scheduled Spark job per get_relation: checkout, diff,
        # merge and time travel all read snapshots repeatedly — round-14
        # optimization, guide §1.2 scheduler overhead).
        self._schema_cache: dict = {}

    # --- relation snapshots (parquet, content-addressed) -------------------

    def relation_path(self, rel_hash: str) -> str:
        return os.path.join(self.root, "relations", rel_hash)

    def put_relation(self, rel_hash: str, df: DataFrame) -> str:
        """Write-once: identical content arrives at the same key and is
        skipped (the reference's value dedup, docs/architecture.org:147-157)."""
        path = self.relation_path(rel_hash)
        if not os.path.exists(path):
            df.write.mode("ignore").parquet(path)
        return path

    def get_relation(self, spark: SparkSession, rel_hash: str) -> DataFrame:
        schema = self._schema_cache.get(rel_hash)
        if schema is not None:
            return spark.read.schema(schema).parquet(self.relation_path(rel_hash))
        df = spark.read.parquet(self.relation_path(rel_hash))
        self._schema_cache[rel_hash] = df.schema
        return df

    def has_relation(self, rel_hash: str) -> bool:
        return os.path.exists(self.relation_path(rel_hash))

    # --- database manifests (JSON, content-addressed) ----------------------

    def _manifest_path(self, db_hash: str) -> str:
        return os.path.join(self.root, "manifests", db_hash + ".json")

    def put_manifest(self, db_hash: str, manifest: dict) -> None:
        """Write a database manifest; on hash collision (a state reached
        again via a different mutation path — e.g. deleting every inserted
        row re-creates an earlier content hash), MERGE the two recorded
        histories instead of keeping the first writer's. A write-once
        manifest would pin the original path's shallow chain, and a later
        LCA search walking the other branch would miss the true common
        ancestor and silently resurrect that branch's deletions."""
        path = self._manifest_path(db_hash)
        if os.path.exists(path):
            with open(path) as f:
                old = json.load(f)
            new_hist = list(manifest.get("history", []))
            seen = set(new_hist)
            extra = [h for h in old.get("history", []) if h not in seen]
            if extra:
                manifest = {**manifest, "history": new_hist + extra}
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, sort_keys=True)
        os.replace(tmp, path)

    def get_manifest(self, db_hash: str) -> dict:
        with open(self._manifest_path(db_hash)) as f:
            return json.load(f)

    def has_manifest(self, db_hash: str) -> bool:
        return os.path.exists(self._manifest_path(db_hash))
