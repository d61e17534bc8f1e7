"""Sources & sinks.

The reference has NO file formats or connectors — ingest is DML over TCP
and storage is an in-memory KV (SURVEY §2.6). This module is therefore
all extension surface: schema-pinned readers (never infer in production
paths) and scale-aware writers for the formats the runtime ships with.
Delta/Iceberg/JDBC need jars not present in this environment and are gated
behind import-tries that raise a clear error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from sakura_spark.session import load_table


class ConnectorUnavailable(ImportError):
    pass


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet with TIMESTAMP(NANOS) normalization (see session.load_table)."""
    return load_table(spark, path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | str, header: bool = True
) -> DataFrame:
    """CSV with a REQUIRED schema: inference reads the data twice and types
    drift between runs — never in a pipeline."""
    return spark.read.schema(schema).option("header", header).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_text(spark: SparkSession, path: str, whole_file: bool = False) -> DataFrame:
    """Text source: one row per line (or per file with whole_file) — the
    raw-document ingestion path for the text pipeline."""
    return spark.read.option("wholetext", whole_file).text(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None, id_from_path: bool = True
) -> DataFrame:
    """Binary-file source (built-in `binaryFile` format): each file becomes
    (path, modificationTime, length, content) — the multimodal ingestion
    path feeding image_dims / audio_info / extract_metadata. With
    ``id_from_path`` a stable 63-bit doc_id derives from the file path
    (xxhash64 masked non-negative) and content is exposed as ``payload``,
    matching the multimodal operators' schema. Listing parallelizes across
    the cluster; blobs are never collected to the driver."""
    from pyspark.sql import functions as F

    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if not id_from_path:
        return df
    return df.select(
        F.abs(F.xxhash64("path")).alias("doc_id"),
        F.col("path"),
        F.col("length").alias("n_bytes"),
        F.col("content").alias("payload"),
    )


def read_jdbc(spark: SparkSession, url: str, table: str, **options) -> DataFrame:
    raise ConnectorUnavailable(
        "JDBC drivers are not on the classpath in this environment; "
        "spark.read.format('jdbc') works unchanged once a driver jar is added"
    )


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    raise ConnectorUnavailable(
        "delta-spark jars not present; the snapshot store "
        "(sakura_spark.management.store) provides versioned tables meanwhile"
    )


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Partitioned parquet sink. `partition_by` low-cardinality columns only
    (dt, event_type); high-cardinality partitioning creates a small-file
    storm at scale."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def write_bucketed_table(
    df: DataFrame, name: str, bucket_cols: list[str], num_buckets: int = 64, mode: str = "overwrite"
) -> None:
    """Bucketed managed table: joins/aggregations on `bucket_cols` read
    co-located buckets with NO shuffle — the steady-state layout for the
    flagship fact-fact joins at 100 TB."""
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(name)
    )
