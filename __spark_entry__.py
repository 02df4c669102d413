"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship co-movement pipeline at
sf0.001; ``queries()``/``oracle_sql()`` expose the full operator catalog
(knot_another_pipeline_spark.catalog_queries) for the sf0.01 DuckDB
differential gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from knot_another_pipeline_spark.catalog_queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: hourly-rollup →
    co-movement pairs → overlap scores (the reference's gold pipeline)."""
    from knot_another_pipeline_spark.catalog_queries import q_pairs_monthly

    return q_pairs_monthly(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (rows-only checks omitted)."""
    return dict(ORACLES)
