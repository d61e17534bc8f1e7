"""Streaming document pipeline: near-duplicate detection at ingestion time.

A training-data pipeline ingests documents continuously; catching
near-duplicates inside the ingestion window (before they land in the
corpus) avoids a full-corpus batch dedup per increment. The minhash
signature/band stage is STATELESS (pure column expressions — shared with
the batch path, functions/dedup.py), so the only streaming state is the
windowed band-bucket aggregation, bounded by the watermark horizon:
state ≈ distinct (window, band, bucket) keys within the horizon, not the
corpus. The same shape runs unchanged on a Kafka source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sakura_spark.functions import dedup

DOCS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)


def read_document_stream(spark, path: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream of (doc_id, ts, text) parquet (swap for Kafka in
    prod: same downstream plan)."""
    return (
        spark.readStream.schema(DOCS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def near_dup_candidates(
    docs: DataFrame,
    window: str = "10 minutes",
    watermark: str = "20 minutes",
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    max_bucket_size: int = 100,
) -> DataFrame:
    """Streaming LSH near-dup candidates within event-time windows.

    Stateless minhash banding (carrying the event time through), then one
    watermarked groupBy on (window, band_id, band_hash) collecting each
    bucket's ids and expanding (id_a < id_b) pairs in-bucket — the exact
    batch shape of minhash_candidate_pairs, windowed. Emits
    (window_start, id_a, id_b) in append mode once the watermark closes
    the window. Pairs may repeat across bands (batch dedups with a second
    pass; downstream verification is idempotent). Oversized buckets are
    dropped, same guard as batch.
    """
    banded = dedup.minhash_bands(
        docs, id_col, text_col, num_hashes, bands, shingle_n, carry=[ts_col]
    )
    grouped = (
        banded.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), "band_id", "band_hash")
        .agg(F.sort_array(F.collect_set("id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket_size))
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return grouped.select(
        F.col("win.start").alias("window_start"), F.explode(pair_arr).alias("p")
    ).select("window_start", "p.id_a", "p.id_b")
