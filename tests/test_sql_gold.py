"""SQL-surface parity: the gold pipeline as spark.sql text must produce
the same rows as the DataFrame builders."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.test_ais_pipeline import _ais_fixture


@pytest.fixture(scope="module")
def gold_sql(spark):
    from knot_another_pipeline_spark.plans.sql_gold import run_gold_sql

    silver = _ais_fixture(spark)
    silver.createOrReplaceTempView("silver_ais")
    return run_gold_sql(spark, "silver_ais", min_shared_cells=0)


def test_sql_hourly_matches_dataframe(spark, gold_sql):
    from knot_another_pipeline_spark.operators.rollup import build_uid_hourly_h3

    df_rows = sorted(
        (
            r["mmsi"], r["hour_ts"], round(r["avg_lat"], 9), round(r["avg_lon"], 9),
            r["h3_index"], r["message_count"], r["dt"], r["hour"],
        )
        for r in build_uid_hourly_h3(_ais_fixture(spark)).collect()
    )
    sql_rows = sorted(
        (
            r["mmsi"], r["hour_ts"], round(r["avg_lat"], 9), round(r["avg_lon"], 9),
            r["h3_index"], r["message_count"], r["dt"], r["hour"],
        )
        for r in gold_sql["uid_hourly"].collect()
    )
    assert sql_rows == df_rows


def test_sql_pairs_matches_dataframe(spark, gold_sql):
    from knot_another_pipeline_spark.operators.pairs import co_movement_pairs
    from knot_another_pipeline_spark.operators.rollup import build_uid_hourly_h3

    hourly = build_uid_hourly_h3(_ais_fixture(spark))
    pairs_df = co_movement_pairs(
        hourly.select(
            F.col("mmsi").alias("uid"),
            F.col("hour_ts").alias("window_ts"),
            F.col("h3_index").alias("cell"),
        ),
        min_shared_cells=0,
    )
    df_rows = sorted(
        (r["uid_a"], r["uid_b"], r["day_date"], r["hA"], r["hB"], r["gA"],
         r["gB"], r["hT"], r["gT"], round(r["gto"], 9))
        for r in pairs_df.collect()
    )
    sql_rows = sorted(
        (r["uid_a"], r["uid_b"], r["day_date"], r["hA"], r["hB"], r["gA"],
         r["gB"], r["hT"], r["gT"], round(r["gto"], 9))
        for r in gold_sql["pairs_daily"].collect()
    )
    assert sql_rows == df_rows


def test_sql_totals_shape(gold_sql):
    rows = gold_sql["pairs_total"].collect()
    assert rows, "pairs_total empty"
    for r in rows:
        assert r["max_gto"] >= r["median_gto"] >= r["min_gto"]
        assert r["total_days_observed"] >= 1


def test_normalize_ts_sql_function(spark, gold_sql):
    got = spark.sql(
        """
        SELECT normalize_ts('2025-01-01 07:14:59')       AS a,
               normalize_ts('2025-01-01T07:14:59')       AS b,
               normalize_ts('2025-01-01 07:14:59Z')      AS c,
               normalize_ts('2025-01-01T02:14:59-05:00') AS d,
               normalize_ts('garbage')                   AS e
        """
    ).collect()[0]
    assert got["a"] == got["b"] == got["c"] == got["d"]
    assert got["e"] is None
