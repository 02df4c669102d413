"""Data-quality reconciliation checks.

The reference's correctness oracle is five post-refresh SQL checks
(``/root/reference/pipelines/refresh_gold_tables.py:468-558``): gold row
count, SUM(message_count) and SUM(source_row_count) vs the filtered silver
row count (delta logged), per-day row counts, pairs row count. Here the
checks run in-session and return one structured report DataFrame instead
of driver-side polling + dict diffing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def reconciliation_report(
    spark: SparkSession,
    *,
    silver_filtered_count: int,
    hourly: DataFrame,
    pairs: DataFrame,
    trimmed_cell_windows: int | None = None,
) -> DataFrame:
    """One row per check: check_name, observed, expected, delta, passed.

    Mirrors ``_run_data_checks``: the hourly table's SUM(message_count)
    and SUM(source_row_count) must reconcile to the silver row count that
    survived the filters; row counts must be positive.
    """
    agg = hourly.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("message_count").alias("msg"),
        F.sum("source_row_count").alias("src"),
    ).collect()[0]
    pair_rows = pairs.count()
    checks = [
        ("uid_hourly_rows_positive", agg["rows"], 1, agg["rows"] >= 1),
        (
            "sum_message_count_matches_silver",
            agg["msg"],
            silver_filtered_count,
            agg["msg"] == silver_filtered_count,
        ),
        (
            "sum_source_row_count_matches_silver",
            agg["src"],
            silver_filtered_count,
            agg["src"] == silver_filtered_count,
        ),
        ("pairs_rows_nonnegative", pair_rows, 0, pair_rows >= 0),
    ]
    if trimmed_cell_windows is not None:
        # Informational: how many (day, window, cell) combos the mega-cell
        # skew guard removed from the pairs join. Nonzero means capped
        # data, a documented deviation from reference all-pairs output —
        # observable here rather than silent (ADVICE r2). Always "passed";
        # the delta column carries the signal.
        checks.append(
            (
                "mega_cell_windows_trimmed",
                trimmed_cell_windows,
                0,
                True,
            )
        )
    return spark.createDataFrame(
        [
            (name, int(obs or 0), int(exp), int(obs or 0) - int(exp), bool(ok))
            for name, obs, exp, ok in checks
        ],
        "check_name string, observed long, expected long, delta long, passed boolean",
    )


def daily_counts(df: DataFrame, date_col: str, limit: int = 5) -> DataFrame:
    """Per-day row counts preview (``refresh_gold_tables.py:511-521``):
    GROUP BY dt ORDER BY dt LIMIT n → TakeOrderedAndProject, no global
    sort materialization."""
    return (
        df.groupBy(F.col(date_col).alias("dt"))
        .agg(F.count(F.lit(1)).alias("row_count"))
        .orderBy("dt")
        .limit(limit)
    )
