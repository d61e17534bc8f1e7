"""Synthesize an sfN-equivalent corpus by replicating the sf0.1 tables.

Empirical scale validation needs data bigger than the driver ships
(TESTDATA.md caps at sf0.1). This replicates each FACT table `factor`
times with perturbed keys, preserving the semantics the pipelines depend
on:

- orders/lineitem: orderkey offset by replica*stride — FK-consistent
  (lineitem rows follow their order), same customers get factor× orders,
  join/agg key cardinality grows linearly like a real scale-up.
- events: event_id offset AND ts shifted by one full span per replica —
  the same user population stays active over a 10x longer time range, so
  session counts, hourly buckets, and watermark state all scale like a
  real longer-running stream (keeping ts fixed would stack replicas onto
  the SAME sessions: 10x events, 1x sessions — not a scale-up).
- documents: doc_id offset; every alphanumeric token gets a replica
  suffix. Intra-replica near-duplicate structure is preserved EXACTLY
  (both members of a planted pair transform identically, so their
  Jaccard/MinHash/SimHash relationships are unchanged) while
  cross-replica Jaccard drops to ~0 — replicas are new documents, not
  10x copies, so the duplicate RATE stays realistic as the corpus grows.
- embeddings: vec_id offset; the vector is rotated by replica index
  (dimension rotation = orthogonal transform), preserving intra-replica
  cosines exactly while cross-replica similarity decorrelates.
- dims (region/nation/customer/supplier/part): copied as-is, like a real
  scale-up where dimensions grow much slower than facts.

Deterministic (no RNG anywhere). Usage:

    python scripts/synthesize_scale.py [src_dir] [out_dir] [factor] [tag]

`tag` prefixes the per-replica document token suffix and matters when
CHAINING runs (sf0.1 -100x-> sf10 -10x-> sf100): without it, inner
suffix "12" and inner "1" + outer "2" both yield token "word12" — a
cross-replica exact collision that would plant bogus near-duplicates.
A non-digit tag on the outer run ("x": "word12" vs "word1x2") keeps
every composed suffix unique, so cross-replica Jaccard stays ~0 at
every level of the chain.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sakura_spark import get_spark
from sakura_spark.session import load_table

DIMS = ["region", "nation", "customer", "supplier", "part"]


def replicate(df, factor: int, build_replica):
    """Union `factor` transformed copies of df (replica 0 = identity)."""
    out = None
    for i in range(factor):
        part = build_replica(df, i)
        out = part if out is None else out.unionByName(part)
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else ".scale_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    tag = sys.argv[4] if len(sys.argv) > 4 else ""
    spark = get_spark("sakura-synthesize")
    os.makedirs(out_dir, exist_ok=True)

    def write(name, df):
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: {df.count()} rows", flush=True)

    for name in DIMS:
        write(name, load_table(spark, f"{src}/{name}.parquet"))

    orders = load_table(spark, f"{src}/orders.parquet")
    lineitem = load_table(spark, f"{src}/lineitem.parquet")
    ok_stride = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    write(
        "orders",
        replicate(
            orders, factor,
            lambda df, i: df.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(i * ok_stride)
            ),
        ),
    )
    write(
        "lineitem",
        replicate(
            lineitem, factor,
            lambda df, i: df.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(i * ok_stride)
            ),
        ),
    )

    events = load_table(spark, f"{src}/events.parquet")
    ev_stride = events.agg(F.max("event_id")).collect()[0][0] + 1
    lo, hi = events.agg(F.min("ts"), F.max("ts")).collect()[0]
    span_days = (hi - lo).days + 2  # +2: a clean inter-replica session gap

    def event_replica(df, i):
        df = df.withColumn("event_id", F.col("event_id") + F.lit(i * ev_stride))
        if i == 0:
            return df
        return df.withColumn(
            "ts", F.expr(f"timestampadd(DAY, {i * span_days}, ts)")
        )

    write("events", replicate(events, factor, event_replica))

    docs = load_table(spark, f"{src}/documents.parquet")
    doc_stride = docs.agg(F.max("doc_id")).collect()[0][0] + 1

    def doc_replica(df, i):
        df = df.withColumn("doc_id", F.col("doc_id") + F.lit(i * doc_stride))
        if i == 0:
            return df
        # Suffix every token: same-replica similarities unchanged,
        # cross-replica shingle overlap ~0.
        df = df.withColumn(
            "text", F.regexp_replace("text", r"([A-Za-z0-9]+)", rf"$1{tag}{i}")
        )
        return df.withColumn("n_chars", F.length("text").cast("long"))

    write("documents", replicate(docs, factor, doc_replica))

    emb = load_table(spark, f"{src}/embeddings.parquet")
    vec_col = next(c for c in emb.columns if c not in ("vec_id", "label"))
    emb_stride = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    dim = len(emb.select(vec_col).first()[0])

    def emb_replica(df, i):
        df = df.withColumn("vec_id", F.col("vec_id") + F.lit(i * emb_stride))
        if i == 0:
            return df
        rot = i % dim
        rotated = F.concat(
            F.slice(F.col(vec_col), rot + 1, dim - rot),
            F.slice(F.col(vec_col), 1, rot),
        )
        return df.withColumn(vec_col, rotated)

    write("embeddings", replicate(emb, factor, emb_replica))
    print(f"done -> {out_dir} (factor {factor})", flush=True)


if __name__ == "__main__":
    main()
