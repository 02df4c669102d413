"""Gold-layer refresh orchestration: silver → uid_hourly_h3 → pairs_daily
→ pairs_total, with replace/append modes and DQ reconciliation.

Reference: ``/root/reference/pipelines/refresh_gold_tables.py`` — its
day-at-a-time CTAS loop (:648-669), temp-table dance, `MSCK REPAIR`, and
`aws s3 rm` replace mode (:452-465, 633-646) all collapse into Spark's
dynamic partition overwrite: one job writes exactly the day partitions it
recomputed, atomically per partition, and late-arriving days append by
simply being present in the input.

Scale story: the reference bounded each Athena query to one silver day
partition to cap query size. Spark needs no such manual dicing — AQE
sizes the shuffles — but the ``days`` filter is kept for targeted
rebuilds (reprocess one bad day without touching the month).
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from knot_another_pipeline_spark.operators.pairs import co_movement_pairs, pairs_total
from knot_another_pipeline_spark.operators.quality import reconciliation_report
from knot_another_pipeline_spark.operators.rollup import build_uid_hourly_h3


@dataclass
class GoldRefreshResult:
    hourly: DataFrame
    pairs: DataFrame
    totals: DataFrame
    report: DataFrame | None = None
    written: dict[str, str] = field(default_factory=dict)


def refresh_gold(
    spark: SparkSession,
    silver: DataFrame,
    *,
    output_root: str | None = None,
    mode: str = "replace",
    days: Sequence[str] | None = None,
    uid_col: str = "mmsi",
    ts_col: str = "base_date_time",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    sog_col: str = "sog",
    run_checks: bool = True,
    min_shared_cells: int = 1,
    catalog_tables: bool = False,
    max_entities_per_cell: int | None = 10_000,
) -> GoldRefreshResult:
    """Rebuild the gold tables from silver.

    - ``days``: optional list of 'YYYY-MM-DD' strings → partition-pruned
      rebuild of just those days (the reference's per-day CTAS, minus the
      loop).
    - ``mode='replace'``: dynamic partition overwrite of exactly the
      computed day partitions; ``'append'``: add new partitions.
    - ``output_root``: when set, writes hourly/pairs/totals parquet under
      it, partitioned like the reference layout (dt/hour and
      year/month/day).
    - ``catalog_tables``: write through the session catalog with the
      reference's bucketing (`uid_hourly_h3` CLUSTERED BY mmsi ×64,
      `pairs_daily` by (uid_a, uid_b) ×32 —
      `refresh_gold_tables.py:306-358`) so later joins/aggs keyed on the
      bucket columns read shuffle-free. Plain partitioned parquet
      otherwise.
    - ``max_entities_per_cell``: mega-cell skew guard, ON by default. The
      pairs self-join (reference skew point:
      ``sql/gold/create_pairs_daily.sql:40-54``) emits n(n-1)/2 rows per
      cell-window; at AIS scale one port anchorage goes quadratic before
      AQE can split it. Cell-windows above the cap are dropped before the
      join; per-entity denominators still count them (reference
      semantics). 10 000 entities → ≤5·10⁷ pairs from a single
      cell-window, the most a healthy task should absorb. ``None``
      disables.
    """
    hourly = build_uid_hourly_h3(
        silver,
        uid_col=uid_col,
        ts_col=ts_col,
        lat_col=lat_col,
        lon_col=lon_col,
        sog_col=sog_col,
    )
    if days:
        hourly = hourly.filter(F.col("dt").isin(list(days)))

    pairs = co_movement_pairs(
        hourly.select(
            F.col("mmsi").alias("uid"),
            F.col("hour_ts").alias("window_ts"),
            F.col("h3_index").alias("cell"),
        ),
        uid_col="uid",
        window_col="window_ts",
        cell_col="cell",
        min_shared_cells=min_shared_cells,
        max_entities_per_cell=max_entities_per_cell,
    )
    totals = pairs_total(pairs)

    written: dict[str, str] = {}
    if output_root:
        write_mode = "overwrite" if mode == "replace" else "append"
        hourly_path = f"{output_root}/uid_hourly_h3"
        pairs_path = f"{output_root}/pairs_daily"
        totals_path = f"{output_root}/pairs_total"
        pairs_part = (
            pairs.withColumn("year", F.year("day_date"))
            .withColumn("month", F.month("day_date"))
            .withColumn("day", F.dayofmonth("day_date"))
        )
        if catalog_tables:
            from knot_another_pipeline_spark.sources.warehouse import (
                save_bucketed_table,
            )

            save_bucketed_table(
                hourly.withColumn("hour_part", F.col("hour")),
                "uid_hourly_h3",
                partition_by=("dt", "hour_part"),
                bucket_by=("mmsi",),
                num_buckets=64,
                sort_by=("mmsi",),
                mode=write_mode,
                path=hourly_path,
            )
            save_bucketed_table(
                pairs_part,
                "pairs_daily",
                partition_by=("year", "month", "day"),
                bucket_by=("uid_a", "uid_b"),
                num_buckets=32,
                mode=write_mode,
                path=pairs_path,
            )
        else:
            (
                hourly.withColumn("hour_part", F.col("hour"))
                .write.mode(write_mode)
                .partitionBy("dt", "hour_part")
                .parquet(hourly_path)
            )
            pairs_part.write.mode(write_mode).partitionBy(
                "year", "month", "day"
            ).parquet(pairs_path)
        # The lifetime summary must aggregate the WHOLE materialized
        # pairs_daily table (reference create_pairs_total.sql reads the
        # full table) — unconditionally, not just for append/targeted
        # runs: 'replace' uses dynamic partition overwrite, which keeps
        # on-disk day partitions absent from this run's input, so even a
        # replace run can cover fewer days than the table holds. Cheap
        # relative to the refresh (one scan of the pre-built pairs table).
        # Explicit schema: an empty pairs run writes no parquet footers,
        # so schema inference on the read-back would fail.
        full_pairs = (
            spark.table("pairs_daily")
            if catalog_tables
            else spark.read.schema(pairs_part.schema).parquet(pairs_path)
        )
        totals = pairs_total(full_pairs)
        if catalog_tables:
            totals.write.mode("overwrite").option("path", totals_path).saveAsTable(
                "pairs_total"
            )
        else:
            totals.write.mode("overwrite").parquet(totals_path)
        written["uid_hourly_h3"] = hourly_path
        written["pairs_daily"] = pairs_path
        written["pairs_total"] = totals_path

    report = None
    if run_checks:
        from knot_another_pipeline_spark.functions.geo import valid_coords
        from knot_another_pipeline_spark.functions.timestamps import (
            normalize_timestamp,
        )

        silver_filtered = silver.filter(
            F.col(uid_col).isNotNull()
            & normalize_timestamp(ts_col).isNotNull()
            & valid_coords(
                F.col(lat_col).cast("double"), F.col(lon_col).cast("double")
            )
        ).count()
        trimmed = None
        if max_entities_per_cell is not None:
            from knot_another_pipeline_spark.operators.pairs import (
                oversize_cell_windows,
            )

            trimmed = oversize_cell_windows(
                hourly.select(
                    F.to_date("hour_ts").alias("day_date"),
                    F.col("hour_ts").alias("w"),
                    F.col("h3_index").alias("cell"),
                ),
                max_entities_per_cell,
            ).count()
        report = reconciliation_report(
            spark,
            silver_filtered_count=silver_filtered,
            hourly=hourly,
            pairs=pairs,
            trimmed_cell_windows=trimmed,
        )

    return GoldRefreshResult(
        hourly=hourly, pairs=pairs, totals=totals, report=report, written=written
    )
