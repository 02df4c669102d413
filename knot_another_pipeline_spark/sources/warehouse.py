"""Warehouse-table DDL: bucketed CTAS-equivalents and external tables.

Reference: the gold CTAS sinks declare ``partitioned_by`` +
``bucketed_by``/``bucket_count`` (S11,
``/root/reference/pipelines/refresh_gold_tables.py:154-181,265-295``;
``sql/gold/create_uid_hourly_h3.sql:14-22``) and the final external-table
DDL + ``MSCK REPAIR TABLE`` partition discovery (S12,
``refresh_gold_tables.py:298-358,674-678``); replace mode drops tables
and wipes prefixes (S13, ``:452-465,633-646``).

Spark equivalents used here:
- bucketing requires the session catalog (``saveAsTable``) — bucket files
  carry the hash so later joins/aggs on the bucket keys skip their
  shuffle, exactly what Athena's ``bucketed_by`` bought the reference;
- ``MSCK REPAIR TABLE`` is built-in for path-partitioned external tables;
- ``mode('overwrite')`` + dynamic partition overwrite replaces the manual
  prefix wipe.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def save_bucketed_table(
    df: DataFrame,
    name: str,
    *,
    partition_by: Sequence[str] = (),
    bucket_by: Sequence[str],
    num_buckets: int,
    sort_by: Sequence[str] = (),
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """CTAS with layout (S11): partitioned + hash-bucketed (+ optionally
    sorted) parquet table in the session catalog. A join or aggregation
    keyed on ``bucket_by`` against another table bucketed the same way
    (or against itself) reads shuffle-free."""
    writer = (
        df.write.format("parquet")
        .option("compression", "snappy")
        .mode(mode)
        .bucketBy(num_buckets, *bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def create_external_table(
    spark: SparkSession,
    name: str,
    path: str,
    *,
    partition_cols: Sequence[str] = (),
    repair: bool = True,
) -> None:
    """External parquet table over an existing partitioned layout (S12):
    schema inferred from the files, partition columns from the paths,
    then ``MSCK REPAIR`` to register every partition — the reference's
    final DDL + repair step, both built-in."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    if partition_cols:
        # Infer the data schema from one partition's files; partition
        # columns are typed string by the Hive path convention.
        sample = spark.read.parquet(path)
        data_fields = [
            f for f in sample.schema.fields if f.name not in set(partition_cols)
        ]
        cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in data_fields)
        parts = ", ".join(f"`{c}` string" for c in partition_cols)
        spark.sql(
            f"CREATE TABLE {name} ({cols}) USING PARQUET "
            f"PARTITIONED BY ({parts}) LOCATION '{path}'"
        )
        if repair:
            spark.sql(f"MSCK REPAIR TABLE {name}")
    else:
        spark.sql(f"CREATE TABLE {name} USING PARQUET LOCATION '{path}'")


def drop_table(spark: SparkSession, name: str) -> None:
    """S13: ``DROP TABLE IF EXISTS`` — prefix wipes are subsumed by
    overwrite modes."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
