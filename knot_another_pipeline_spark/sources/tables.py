"""Parquet table loading for the synthetic test catalog.

The driver materializes TPC-H-ish tables plus ``events``, ``documents``,
``embeddings`` under ``/root/testdata/sf*/`` (TESTDATA.md). One parquet
file per table; load with pushdown-friendly plain reads so Catalyst prunes
columns and pushes filters into the scan.
"""

from __future__ import annotations

import os

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)  # UTC + AQE even on a caller-built session
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANOS_TS_COLS.get(name, ()):
        if col in df.columns and dict(df.dtypes)[col] == "bigint":
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"{col} div 1000"))
            )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every catalog table as a temp view so the SQL surface
    (``spark.sql``) sees the same names as the DataFrame API."""
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
