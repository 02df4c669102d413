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


class _HadoopPathOps:
    """Staged-rewrite filesystem primitives routed through the Hadoop
    FileSystem API (``Path.getFileSystem``) so maintenance jobs work on
    any scheme the cluster has a connector for — ``file://``,
    ``hdfs://``, ``s3a://`` — not just the driver's local disk. The
    reference's storage is S3 (``pipelines/ais_pipeline.py:638-673``
    writes gold parquet to S3), so the maintenance story has to speak
    the same layer."""

    def __init__(self, spark: SparkSession, path: str):
        jvm = spark._jvm
        self._jpath = jvm.org.apache.hadoop.fs.Path
        self._fs = self._jpath(path).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )

    def exists(self, p: str) -> bool:
        return self._fs.exists(self._jpath(p))

    def rename(self, src: str, dst: str) -> None:
        # HDFS/local dir rename is atomic; S3A "rename" is a copy+delete
        # (documented non-atomic — see compact_parquet docstring).
        if not self._fs.rename(self._jpath(src), self._jpath(dst)):
            raise OSError(f"filesystem rename failed: {src} -> {dst}")

    def delete(self, p: str) -> None:
        self._fs.delete(self._jpath(p), True)

    def mkdirs(self, p: str) -> None:
        self._fs.mkdirs(self._jpath(p))

    def parquet_stats(self, p: str) -> tuple[int, int]:
        """(file_count, total_bytes) over *.parquet under ``p``."""
        it = self._fs.listFiles(self._jpath(p), True)
        n = size = 0
        while it.hasNext():
            st = it.next()
            if st.getPath().getName().endswith(".parquet"):
                n += 1
                size += st.getLen()
        return n, size


class _LocalPathOps:
    """os/shutil fallback for sessions without a py4j gateway (Spark
    Connect) — local paths only."""

    def __init__(self, path: str):
        if "://" in path and not path.startswith("file://"):
            raise ValueError(
                "this session has no JVM gateway (Spark Connect?); "
                f"non-local maintenance path {path!r} needs the Hadoop "
                "FileSystem API"
            )

    @staticmethod
    def _strip(p: str) -> str:
        return p.removeprefix("file://")

    def exists(self, p: str) -> bool:
        import os

        return os.path.exists(self._strip(p))

    def rename(self, src: str, dst: str) -> None:
        import os

        os.replace(self._strip(src), self._strip(dst))

    def delete(self, p: str) -> None:
        import shutil

        shutil.rmtree(self._strip(p), ignore_errors=True)

    def mkdirs(self, p: str) -> None:
        import os

        os.makedirs(self._strip(p), exist_ok=True)

    def parquet_stats(self, p: str) -> tuple[int, int]:
        import os

        n = size = 0
        for root, _, files in os.walk(self._strip(p)):
            for f in files:
                if f.endswith(".parquet"):
                    n += 1
                    size += os.path.getsize(os.path.join(root, f))
        return n, size


def _path_ops(spark: SparkSession, path: str):
    if getattr(spark, "_jvm", None) is not None and getattr(
        spark, "_jsc", None
    ) is not None:
        return _HadoopPathOps(spark, path)
    return _LocalPathOps(path)


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

    Sizing, rename, and delete all go through the Hadoop FileSystem API
    resolved from the path's scheme (:class:`_HadoopPathOps`), so the
    same call works on ``file://``, ``hdfs://``, and ``s3a://`` — the
    reference's storage layer is S3. Atomicity caveat by scheme: local
    and HDFS directory renames are atomic (the staged shape gives
    at-every-instant-a-complete-copy); S3A's rename is a server-side
    copy+delete, so the promotion window is non-atomic there — still
    crash-*recoverable* (a complete ``_compacting`` copy with
    ``_SUCCESS`` is promoted on the next call), but concurrent readers
    can see partial listings mid-promotion. For serving tables on S3
    use a MERGE/OPTIMIZE-capable format; this job is for the bulk lake
    prefixes behind it.

    Scale notes: one shuffle when sorting (repartition), zero when only
    coalescing (``coalesce`` merges map-side). Run it per partition
    directory (``.../dt=2024-01-01``) in a real lake, not on the table
    root, so compaction parallelizes per partition and never rewrites
    cold data.
    """
    import math

    ops = _path_ops(spark, path)
    base = path.rstrip("/")
    staging = base + "_compacting"
    tombstone = base + "_old"
    if not ops.exists(path) and ops.exists(staging + "/_SUCCESS"):
        ops.rename(staging, path)  # crashed mid-promotion last run
    if ops.exists(tombstone):
        ops.delete(tombstone)
    df = spark.read.parquet(path)
    _, total_bytes = ops.parquet_stats(path)
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    if sort_cols:
        out = df.repartition(n_files, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.coalesce(n_files)
    out.write.mode("overwrite").parquet(staging)
    ops.rename(path, tombstone)
    ops.rename(staging, path)
    ops.delete(tombstone)
    written, _ = ops.parquet_stats(path)
    return written
