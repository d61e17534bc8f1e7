"""Distributed shard packing vs a naive sequential reference."""

from pyspark.sql import functions as F

from sakura_spark.functions.sharding import shard_pack


def _naive_pack(rows, budget):
    """rows: [(key, weight)] already ordered. Returns key -> (offset, shard)."""
    out, acc = {}, 0
    for key, w in rows:
        out[key] = (acc, acc // budget)
        acc += w
    return out


def test_shard_pack_matches_sequential_reference(spark):
    rows = [(i, (i * 37) % 13 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = shard_pack(df, "w", budget=25, order_cols=[F.col("doc_id")], num_partitions=7)
    got = {r.doc_id: (r.shard_offset, r.shard_id) for r in out.collect()}
    expected = _naive_pack(sorted(rows), budget=25)
    assert got == expected


def test_shard_pack_deterministic_and_budget_bounded(spark):
    rows = [(i, 5) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    a = shard_pack(df, "w", 40, [F.col("doc_id")], num_partitions=5)
    b = shard_pack(df, "w", 40, [F.col("doc_id")], num_partitions=5)
    assert a.collect() == b.collect()
    sizes = a.groupBy("shard_id").agg(F.sum("w").alias("tot")).collect()
    # uniform 5-weights pack exactly: every shard holds 40 except maybe the tail
    assert all(r.tot == 40 for r in sizes if r.shard_id < max(s.shard_id for s in sizes))


def test_shard_pack_no_global_single_partition_sort(spark):
    """The scale property: no single-partition global window. The final
    plan reads the checkpointed range-partitioned layout (pinned so the
    totals job and the window job see identical placement) and the
    cumulative-sum window partitions by the partition id — never by a
    single global partition."""
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("w")
    )
    out = shard_pack(df, "w", 10, [F.col("doc_id")], num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    # The range exchange runs inside the checkpoint job; the window job
    # scans the pinned layout instead of re-sampling the partitioning.
    assert "Scan ExistingRDD" in plan
    assert "__pid" in plan  # window keyed by partition id, map-side state


def test_shard_pack_oversized_row_gets_own_shard(spark):
    df = spark.createDataFrame([(1, 3), (2, 100), (3, 3)], "doc_id long, w long")
    out = {r.doc_id: r.shard_id for r in shard_pack(df, "w", 10, [F.col("doc_id")]).collect()}
    assert out[1] == 0
    assert out[2] == 0  # starts inside shard 0 (offset 3)
    assert out[3] == 10  # next row starts at offset 103 -> shard 10
