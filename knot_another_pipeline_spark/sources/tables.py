"""Parquet table loading for the synthetic test catalog.

The driver materializes TPC-H-ish tables plus ``events``, ``documents``,
``embeddings`` under ``/root/testdata/sf*/`` (TESTDATA.md). One parquet
file per table; load with pushdown-friendly plain reads so Catalyst prunes
columns and pushes filters into the scan.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession, functions as F

from knot_another_pipeline_spark.session import tune_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: Columns stored as TIMESTAMP(NANOS) in the driver's parquet (Spark reads
#: them as long under nanosAsLong); converted back to micros timestamps on
#: load. Truncating div-1000 matches DuckDB's nanos→micros conversion.
_NANOS_TS_COLS = {"events": ("ts",)}


#: Per-session memo of loaded table PLANS: (abspath, mtime) -> DataFrame.
#: A DataFrame is an immutable lazy plan — every action on it still scans
#: the parquet files fresh, so nothing about RESULTS is ever cached; what
#: the memo avoids is re-running the driver-side file listing + footer
#: schema read that ``spark.read.parquet`` performs at DataFrame-creation
#: time (~60-70 ms/call measured at sf0.1, paid by every query build in a
#: catalog-wide bench: 270 queries x >=2 samples x 1-3 tables each).
#: Keyed weakly on the session object (a stopped/replaced session drops
#: its entries) and on the path's mtime (a rewritten test fixture misses
#: the memo and re-lists). Non-local paths (s3://, hdfs://) have no
#: os.stat mtime and bypass the memo entirely — at cluster scale the
#: listing is per-query work the deployment's own file-index cache
#: (spark.sql.hive.filesourcePartitionFileCacheSize) already amortizes.
_TABLE_MEMO: weakref.WeakKeyDictionary = weakref.WeakKeyDictionary()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)  # UTC + AQE even on a caller-built session
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        key = (os.path.abspath(path), os.path.getmtime(path))
    except OSError:  # non-local URI or vanished path: plain read
        key = None
    if key is not None:
        try:
            memo = _TABLE_MEMO.setdefault(spark, {})
        except TypeError:  # session object not weakref-able
            memo = None
        if memo is not None and key in memo:
            return memo[key]
    df = spark.read.parquet(path)
    for col in _NANOS_TS_COLS.get(name, ()):
        if col in df.columns and dict(df.dtypes)[col] == "bigint":
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"{col} div 1000"))
            )
    if key is not None and memo is not None:
        memo[key] = df
    return df


def load_events_time_sliced(
    spark: SparkSession, sf_dir: str, start: str, stop: str
) -> DataFrame:
    """Load ``events`` with the time bounds pushed into the parquet scan.

    ``ts`` is stored TIMESTAMP(NANOS) and surfaced as a *derived*
    timestamp column (the div-1000 conversion above), so a filter written
    against the converted column can never reach parquet row-group
    statistics. At 100 TB, events is the table where that matters: this
    helper applies a *coarse* [start, stop+1s) bound on the raw nanos
    long *before* conversion, which Catalyst pushes to the scan
    (min/max row-group pruning + predicate pushdown), then converts.
    Deliberately one second wide at the top so the nanos→micros
    truncation can never make the pushed bound narrower than a caller's
    exact inclusive filter — callers keep their precise predicate on the
    converted column (coarse-prune + exact-filter pattern). Bounds are
    UTC wall-clock strings, same contract as the reference's track
    exporter (`export_tracks_to_explore.py:65`).
    """
    tune_session(spark)
    from datetime import datetime, timezone

    def to_nanos(s: str) -> int:
        d = datetime.fromisoformat(s).replace(tzinfo=timezone.utc)
        return int(d.timestamp()) * 1_000_000_000

    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.filter(
            (F.col("ts") >= F.lit(to_nanos(start)))
            & (F.col("ts") < F.lit(to_nanos(stop) + 1_000_000_000))
        ).withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = df.filter(
            (F.col("ts") >= F.lit(start))
            & (F.col("ts") <= F.lit(stop))
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every catalog table as a temp view so the SQL surface
    (``spark.sql``) sees the same names as the DataFrame API."""
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
