"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` DuckDB twin on the
same parquet tables, compares row count, column names, and exact values
(columns sorted by name, rows sorted canonically). Usage:

    python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        key = df.astype(str).agg("\x1f".join, axis=1)
        df = df.iloc[key.argsort(kind="stable")].reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"columns: spark={s_cols} oracle={o_cols}")
        return problems
    if problems:
        return problems
    s, o = canon(spark_pdf), canon(oracle_pdf)
    for col in s.columns:
        sv, ov = s[col], o[col]
        try:
            # The driver hashes value REPRESENTATIONS, not values: an
            # int64 20 vs a float64 20.0 hash-mismatches even though they
            # compare equal.  Round 8 shipped a 48/50 artifact through
            # exactly this gap (DuckDB sum(BIGINT) -> HUGEINT -> pandas
            # float64 vs Spark int64), so an int-vs-float kind pair is a
            # hard FAIL here regardless of the values.
            sk, ok_ = sv.dtype.kind, ov.dtype.kind
            if {sk, ok_} <= {"i", "u", "f"} and ("f" in (sk, ok_)) and sk != ok_:
                problems.append(
                    f"col {col}: dtype kind mismatch spark={sv.dtype} "
                    f"oracle={ov.dtype} — driver hashes representations, "
                    "int-vs-float WILL hash-mismatch (cast the oracle)"
                )
                continue
            if sv.dtype.kind == "f" or ov.dtype.kind == "f":
                eq = (sv.astype(float).fillna(0) == ov.astype(float).fillna(0)) | (
                    sv.isna() & ov.isna()
                )
                if not eq.all():
                    bad = (~eq).idxmax()
                    diff = (sv.astype(float) - ov.astype(float)).abs().max()
                    problems.append(
                        f"col {col}: {int((~eq).sum())} mismatches, max|diff|={diff:.3e}, "
                        f"first at row {bad}: spark={sv[bad]!r} oracle={ov[bad]!r}"
                    )
            else:
                eq = sv.astype(str) == ov.astype(str)
                if not eq.all():
                    bad = (~eq).idxmax()
                    problems.append(
                        f"col {col}: {int((~eq).sum())} mismatches, "
                        f"first at row {bad}: spark={sv[bad]!r} oracle={ov[bad]!r}"
                    )
        except Exception as e:  # noqa: BLE001
            problems.append(f"col {col}: compare error {e}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # Deliberately a VANILLA session, not get_spark(): the driver harness
    # builds its own SparkSession, so queries() must be self-sufficient on
    # any session (round 1's 10 red queries were exactly a get_spark-only
    # conf being assumed — the replica masked it).
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("sakura-check")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark query raised")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception:
            print(f"FAIL  {name}: oracle SQL raised")
            traceback.print_exc()
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            n_fail += 1
            print(f"FAIL  {name} ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
        else:
            n_pass += 1
            print(f"ok    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
