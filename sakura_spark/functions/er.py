"""Entity resolution: blocked fuzzy name matching.

Record-linkage primitive the reference's relational surface lacks: find
pairs of catalog entries whose names are near-identical (listing
duplicates, OCR/typo variants). Classic two-stage shape:

1. **Block**: group candidate names by a cheap deterministic key so the
   quadratic comparison only runs within blocks.
2. **Match**: exact Levenshtein distance within each block (Spark's
   built-in ``levenshtein`` — JVM-side, identical to DuckDB's, so the
   whole surface is integer-exact and oracle-checkable).

Scale shape (100 TB): the pair stage runs on DISTINCT names, not rows —
the distinct collapses an arbitrarily large fact table to its name
vocabulary before any join (same bounded-smalls class as the LM/BPE
tables). Row multiplicity comes back as per-name counts aggregated
map-side. Within-block pairing is still quadratic in block size, so
``max_block_size`` hard-fails rather than letting a degenerate block key
explode — the documented contract, mirroring dedup.jaccard's unblocked
guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_name_pairs(
    df: DataFrame,
    name_col: str,
    block_key=None,
    max_distance: int = 3,
    max_block_size: int = 10_000,
) -> DataFrame:
    """(name_a, name_b, distance, n_a, n_b): pairs of distinct names in
    the same block with Levenshtein distance in [1, max_distance],
    name_a < name_b, plus each name's row count in the input.

    ``block_key`` is a callable Column -> Column over the distinct name;
    it defaults to the name's last whitespace token (for "modifier noun"
    style names the head noun is the stable part — typo variants of the
    modifier still collide). Supply your own for other naming schemes
    (e.g. soundex, prefix, length-bucket composites).
    """
    if block_key is None:
        def block_key(name):
            return F.element_at(F.split(F.trim(name), r"\s+"), -1)

    names = (
        df.groupBy(F.col(name_col).alias("name"))
        .agg(F.count("*").alias("n"))
        .withColumn("__blk", block_key(F.col("name")))
    )

    # Degenerate-block guard: a block key that fails to discriminate
    # would make the self-join quadratic in the vocabulary. Hard error,
    # not silent truncation.
    biggest = (
        names.groupBy("__blk").agg(F.count("*").alias("c")).agg(F.max("c")).first()[0]
    )
    if biggest is not None and biggest > max_block_size:
        raise ValueError(
            f"largest block has {biggest} distinct names (> {max_block_size}); "
            "choose a finer block_key or raise max_block_size"
        )

    a = names.select(
        F.col("__blk"),
        F.col("name").alias("name_a"),
        F.col("n").alias("n_a"),
    )
    b = names.select(
        F.col("__blk"),
        F.col("name").alias("name_b"),
        F.col("n").alias("n_b"),
    )
    return (
        a.join(b, "__blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("distance", F.levenshtein(F.col("name_a"), F.col("name_b")))
        .filter(F.col("distance") <= max_distance)
        .select("name_a", "name_b", "distance", "n_a", "n_b")
    )


def er_clusters(
    df: DataFrame,
    name_col: str,
    block_key=None,
    max_distance: int = 3,
    max_block_size: int = 10_000,
    iterations: int = 6,
) -> DataFrame:
    """(name, entity, n): the match PAIRS closed into ENTITIES — real ER
    resolves records, not edges. The :func:`blocked_name_pairs` matches
    become an undirected graph over the distinct-name vocabulary;
    ``iterations`` synchronous min-label sweeps
    (:func:`sakura_spark.functions.graph.min_label_sweeps` — min works
    on strings, so labels ARE names) assign every matched name its
    component's lexicographically smallest name as the canonical
    ``entity``; unmatched names are their own entity (left join +
    coalesce), so every input name resolves. ``n`` is the name's row
    count in the input — entity row counts are one further groupBy away.

    Fixed sweeps, not convergence detection, for the same reason as
    min_label_sweeps: the unrolled form is oracle-expressible, and a
    match chain longer than ``iterations`` hops (Levenshtein variants
    chained 7+ deep under the default) is pathological for name data;
    raise ``iterations`` if your blocks chain deeper.

    Scale shape: everything downstream of the first groupBy runs on the
    distinct-name vocabulary (bounded-smalls class) — the sweeps join
    edge tables of matched names only, never the fact table."""
    from sakura_spark.functions.graph import min_label_sweeps

    pairs = blocked_name_pairs(
        df,
        name_col,
        block_key=block_key,
        max_distance=max_distance,
        max_block_size=max_block_size,
    )
    edges = pairs.select(F.col("name_a").alias("src"), F.col("name_b").alias("dst"))
    labels = min_label_sweeps(edges, iterations=iterations)
    names = df.groupBy(F.col(name_col).alias("name")).agg(F.count("*").alias("n"))
    return names.join(labels.withColumnRenamed("node", "name"), "name", "left").select(
        "name",
        F.coalesce(F.col("label"), F.col("name")).alias("entity"),
        "n",
    )
