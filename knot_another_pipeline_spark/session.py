"""SparkSession factory and tuning.

The reference pipeline parses every timestamp as UTC
(``/root/reference/pipelines/ais_pipeline.py:495-499``) and relies on
Athena/Trino for distributed execution. Here one Spark session owns both
ingestion and analytics; session-level knobs replace the reference's manual
day-at-a-time CTAS sizing (``refresh_gold_tables.py:648-669``):

- AQE re-plans shuffles at runtime (coalesce small partitions, split skewed
  ones) — the scale story for the co-movement self-join, whose hot H3 cells
  (ports/anchorages) are classic skew.
- Dynamic partition overwrite replaces the reference's manual
  ``aws s3 rm --recursive`` + CTAS replace dance (``refresh_gold_tables.py:452-465``).
"""

from __future__ import annotations

import os
import warnings

from pyspark.sql import SparkSession

#: Configs that must be set before the JVM starts.
_BUILD_CONF = {
    # In local mode the driver JVM *is* the whole cluster; Spark's 1g
    # default heap GC-thrashes with 32 concurrent task threads. On a real
    # cluster this is superseded by the deployment's executor sizing.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    "spark.sql.parquet.compression.codec": "snappy",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 128 MiB input splits: at 100 TB this yields ~800k well-sized scan tasks
    # rather than a handful of giant ones.
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Some producers (duckdb, arrow) write TIMESTAMP(NANOS) parquet, which
    # Spark rejects by default; read as long and convert in load_table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}

#: Subset of confs that are runtime-settable on an existing session.
_RUNTIME_CONF_KEYS = (
    "spark.sql.session.timeZone",
    "spark.sql.shuffle.partitions",
    "spark.sql.adaptive.enabled",
    "spark.sql.adaptive.coalescePartitions.enabled",
    "spark.sql.adaptive.skewJoin.enabled",
    "spark.sql.sources.partitionOverwriteMode",
    "spark.sql.parquet.compression.codec",
    "spark.sql.execution.arrow.pyspark.enabled",
    "spark.sql.files.maxPartitionBytes",
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.legacy.parquet.nanosAsLong",
)


def get_spark(
    app_name: str = "knot-another-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster pass ``None`` with an externally-configured master.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = builder.master(master)
    conf = dict(_BUILD_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    tune_session(spark)
    return spark


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an existing session.

    Used when the session is handed to us (driver harness, notebooks) so
    results are timezone-stable (UTC) and plans benefit from AQE regardless
    of how the session was built.

    Memoized per session object: ``load_table`` calls this on every table
    read, and each ``conf.set`` is a py4j round trip — a catalog-wide
    bench pays hundreds of such calls for settings that never change
    after the first application.
    """
    if getattr(spark, "_knap_session_tuned", False):
        return spark
    for key in _RUNTIME_CONF_KEYS:
        value = _BUILD_CONF.get(key)
        if value is None:
            continue
        try:
            spark.conf.set(key, value)
        except Exception as exc:
            # Non-runtime-settable in this deployment; builder default rules.
            warnings.warn(
                f"could not set {key}={value} on the live session "
                f"({type(exc).__name__}); the builder-time default applies",
                RuntimeWarning,
                stacklevel=2,
            )
    try:
        spark._knap_session_tuned = True
    except Exception:
        pass  # frozen/slotted session objects: re-tuning stays idempotent
    return spark
