"""Training-shard packing: deterministic token-budget partitioning.

The last step of a pretraining pipeline groups documents into fixed-budget
shards (e.g. ~100M tokens each) in a deterministic, well-shuffled order.
Semantics: lay documents out in a total order and start a new shard
whenever a document's starting offset crosses a budget boundary —
``shard_id = floor(exclusive_prefix_sum(weight) / budget)``. Every engine
computing the same order and prefix sum assigns identical shards, so the
layout is reproducible and resumable.

A naive implementation is a single window over the whole table ordered
globally — one task holds every row, the classic scale killer. This one is
the textbook distributed prefix sum:

1. range-repartition + sort within partitions on the order key (Spark's
   ordinary distributed sort machinery — no single-task ordering);
2. per-partition weight totals (one tiny aggregate, N_partitions rows)
   collected to the driver and turned into exclusive per-partition offsets
   — the only driver transfer, kilobytes at any data scale;
3. a partition-local cumulative sum (window partitioned BY partition id,
   so state never leaves the executor) plus the broadcast offset.

At 100 TB this is one range shuffle + one map-side window — the same cost
as sorting the data, which any deterministic layout pays anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def shard_pack(
    df: DataFrame,
    weight_col: str,
    budget: int,
    order_cols: list[Column | str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each row a ``shard_id`` by packing rows, in the total order
    given by ``order_cols`` (must be a total order — include a unique
    tiebreak column), into consecutive shards of ``weight_col`` budget.

    Adds ``shard_id`` (long) and ``shard_offset`` (long — the row's
    starting weight offset within the global layout). A row whose weight
    exceeds the remaining budget starts the next shard; a single row larger
    than the whole budget gets a shard of its own (floor semantics).
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ordered = df.repartitionByRange(parts, *cols).sortWithinPartitions(*cols)
    # Pin the partitioning before it is read twice (once for the totals
    # job, once for the final window): repartitionByRange draws fresh
    # samples per execution, so re-running the plan could place boundary
    # rows in different partitions and silently corrupt the driver-computed
    # offsets. localCheckpoint materializes the layout so both jobs see the
    # identical placement.
    staged = ordered.withColumn("__pid", F.spark_partition_id()).localCheckpoint()

    # Tiny driver transfer: one (pid, total) row per partition.
    totals = dict(
        staged.groupBy("__pid")
        .agg(F.sum(F.col(weight_col).cast("long")).alias("t"))
        .collect()
    )
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid] or 0
    offset_expr = (
        F.coalesce(
            F.element_at(
                F.create_map(
                    *[F.lit(x) for pid in offsets for x in (pid, offsets[pid])]
                ),
                F.col("__pid"),
            ),
            F.lit(0),
        )
        if offsets
        else F.lit(0)
    )

    w = Window.partitionBy("__pid").orderBy(*cols)
    local_excl = F.coalesce(
        F.sum(F.col(weight_col).cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    start = (offset_expr + local_excl).alias("shard_offset")
    return (
        staged.withColumn("shard_offset", start)
        .withColumn("shard_id", F.floor(F.col("shard_offset") / F.lit(budget)))
        .drop("__pid")
    )
