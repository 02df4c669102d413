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


def compact_parquet(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: Sequence[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_file_bytes`` files —
    the small-files maintenance job every streaming/incremental sink
    eventually needs (a foreachBatch sink lands one file set per epoch;
    a thousand epochs later every scan pays a thousand file opens and
    the NameNode/S3 listing tax).

    File count = ceil(current_bytes / target); the rewrite stages into a
    ``_compacting`` sibling (Spark leaves a ``_SUCCESS`` marker on
    completion), the original is renamed aside, staging is promoted,
    then the old copy is dropped — at every instant either the live
    directory or a complete staged copy exists, and an orphaned
    complete staging from a crashed run is promoted on the next call.
    ``sort_cols`` optionally sorts within the rewrite
    (``sortWithinPartitions`` after a repartition on the same columns)
    so min/max row-group statistics become selective — the poor-man's
    clustering that makes later predicate pushdown actually skip files.
    Returns the output file count.

    LOCAL PATHS ONLY: sizing/rename/delete go through the local
    filesystem (``os``/``shutil``), so object-store URIs are rejected
    up front. On S3/HDFS, run the same staged-rewrite shape through the
    Hadoop FileSystem API (or a table format's OPTIMIZE).

    Scale notes: one shuffle when sorting (repartition), zero when only
    coalescing (``coalesce`` merges map-side). Run it per partition
    directory (``.../dt=2024-01-01``) in a real lake, not on the table
    root, so compaction parallelizes per partition and never rewrites
    cold data.
    """
    import math
    import os
    import shutil

    if "://" in path and not path.startswith("file://"):
        raise ValueError(
            f"compact_parquet operates on local paths only, got {path!r}"
        )
    path = path.removeprefix("file://")
    staging = path.rstrip("/") + "_compacting"
    tombstone = path.rstrip("/") + "_old"
    if not os.path.exists(path) and os.path.exists(
        os.path.join(staging, "_SUCCESS")
    ):
        os.replace(staging, path)  # crashed mid-promotion last run
    if os.path.exists(tombstone):
        shutil.rmtree(tombstone)
    df = spark.read.parquet(path)
    total_bytes = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    if sort_cols:
        out = df.repartition(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.coalesce(n_files)
    out.write.mode("overwrite").parquet(staging)
    os.replace(path, tombstone)
    os.replace(staging, path)
    shutil.rmtree(tombstone)
    written = sum(
        1
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    return written
