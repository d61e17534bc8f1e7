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
