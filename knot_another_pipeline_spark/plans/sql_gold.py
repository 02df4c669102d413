"""The gold pipeline as Spark SQL text — the reference's native surface.

The reference drives everything through templated SQL
(``/root/reference/sql/gold/create_uid_hourly_h3.sql``,
``create_pairs_daily.sql``, ``create_pairs_total.sql``) with one external
scalar UDF declared per query (``USING EXTERNAL FUNCTION
lat_lng_to_cell_address … LAMBDA 'H3UDF'``). This module provides the
same experience on Spark: :func:`register_sql_functions` registers the
cell encoder and the tiered timestamp normalizer as session functions,
and the three templates below run verbatim through ``spark.sql`` over a
silver temp view — producing results identical to the DataFrame builders
(``operators.rollup`` / ``operators.pairs``), which tests assert.

A user migrating from the reference can therefore keep their SQL-shaped
workflow: point the template at a view, run, get the same gold tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from knot_another_pipeline_spark.functions.geo import h3_module
from knot_another_pipeline_spark.functions.timestamps import (
    _OFFSET_FORMATS,
    _PLAIN_FORMATS,
    _ZONE_SUFFIX,
)

#: Same constant as functions.geo._BASE_DEG — res-7 cell ≈ 1.2 km.
_BASE_DEG = 1.4080


def register_sql_functions(spark: SparkSession) -> None:
    """Register the session SQL functions the gold templates call.

    - ``lat_lng_to_cell_address(lat, lon, res)`` — the reference's H3
      Lambda UDF (U1). With h3-py installed this is the true-H3 pandas
      UDF; otherwise a pure-SQL function with exactly the
      ``functions.geo.grid_cell`` math, so SQL and DataFrame paths emit
      identical addresses.
    - ``normalize_ts(s)`` — the tiered timestamp normalizer (P3), same
      format ladder as ``functions.timestamps.normalize_timestamp``.
    """
    if h3_module() is not None:
        import pandas as pd
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import StringType

        @pandas_udf(StringType())
        def _encode(lat_s, lon_s, res_s):
            import h3 as _h3  # worker-side import (addPyFile/vendored safe)

            out = []
            for la, lo, r in zip(lat_s, lon_s, res_s):
                if la is None or lo is None or pd.isna(la) or pd.isna(lo):
                    out.append(None)
                else:
                    out.append(_h3.latlng_to_cell(float(la), float(lo), int(r)))
            return pd.Series(out)

        spark.udf.register("lat_lng_to_cell_address", _encode)
    else:
        spark.sql(
            f"""
            CREATE OR REPLACE TEMPORARY FUNCTION lat_lng_to_cell_address(
                lat DOUBLE, lon DOUBLE, res INT) RETURNS STRING
            RETURN concat(
              lpad(lower(hex(res)), 1, '0'),
              lpad(lower(hex(CAST(floor((lat + 90.0) / ({_BASE_DEG!r} / power(2, res))) AS BIGINT))), 7, '0'),
              lpad(lower(hex(CAST(floor((lon + 180.0) / ({_BASE_DEG!r} / power(2, res))) AS BIGINT))), 7, '0'))
            """
        )

    canon = r"regexp_replace(trim(s), '^(\\d{4}-\\d{2}-\\d{2})[T ]', '$1 ')"
    zoned = rf"regexp_replace({canon}, 'Z$', '+00:00')"
    plain_tries = ", ".join(
        f"try_to_timestamp({canon}, '{f}')" for f in _PLAIN_FORMATS
    )
    zoned_tries = ", ".join(
        f"try_to_timestamp({zoned}, '{f}')" for f in _OFFSET_FORMATS
    )
    # Spark SQL string literals eat single backslashes — double them when
    # embedding the Python-side regex.
    zone_sql = _ZONE_SUFFIX.replace("\\", "\\\\")
    spark.sql(
        f"""
        CREATE OR REPLACE TEMPORARY FUNCTION normalize_ts(s STRING)
        RETURNS TIMESTAMP
        RETURN CASE WHEN {canon} RLIKE '{zone_sql}'
                    THEN coalesce({zoned_tries})
                    ELSE coalesce({plain_tries}) END
        """
    )


#: Mirrors sql/gold/create_uid_hourly_h3.sql:27-72 (cleaned CTE → hourly
#: rollup → UDF over aggregate). {silver} is a view with AIS-shaped
#: columns; timestamps may be strings in any supported rendering.
UID_HOURLY_SQL = """
WITH cleaned AS (
  SELECT CAST(mmsi AS STRING)            AS mmsi,
         normalize_ts(CAST({ts} AS STRING)) AS event_ts,
         TRY_CAST({lat} AS DOUBLE)       AS lat,
         TRY_CAST({lon} AS DOUBLE)       AS lon,
         TRY_CAST({sog} AS DOUBLE)       AS sog
  FROM {silver}
  WHERE mmsi IS NOT NULL
),
filtered AS (
  SELECT * FROM cleaned
  WHERE event_ts IS NOT NULL
    AND lat BETWEEN -90.0 AND 90.0
    AND lon BETWEEN -180.0 AND 180.0
)
SELECT mmsi,
       date_trunc('hour', event_ts)                    AS hour_ts,
       AVG(lat)                                        AS avg_lat,
       AVG(lon)                                        AS avg_lon,
       lat_lng_to_cell_address(AVG(lat), AVG(lon), 7)  AS h3_index,
       COUNT(*)                                        AS message_count,
       AVG(sog)                                        AS avg_sog,
       COUNT(*)                                        AS source_row_count,
       to_date(date_trunc('hour', event_ts))           AS dt,
       EXTRACT(HOUR FROM date_trunc('hour', event_ts)) AS hour
FROM filtered
GROUP BY mmsi, date_trunc('hour', event_ts)
"""

#: Mirrors sql/gold/create_pairs_daily.sql:29-79 — self equi-join on
#: (dt, hour, h3_index) with a.mmsi < b.mmsi, pair distinct counts,
#: per-vessel stats joined twice, overlap scores, gT > 1.
PAIRS_DAILY_SQL = """
WITH h AS (
  SELECT mmsi, dt AS day_date, hour_ts AS w, h3_index AS cell
  FROM {hourly}
),
colocated AS (
  SELECT a.mmsi AS uid_a, b.mmsi AS uid_b, a.day_date, a.w, a.cell
  FROM h a JOIN h b
    ON a.day_date = b.day_date AND a.w = b.w AND a.cell = b.cell
   AND a.mmsi < b.mmsi
),
pair_day AS (
  SELECT uid_a, uid_b, day_date,
         COUNT(*)             AS hT,
         COUNT(DISTINCT cell) AS gT
  FROM colocated GROUP BY uid_a, uid_b, day_date
),
stats AS (
  SELECT mmsi, day_date, COUNT(*) AS win_cnt, COUNT(DISTINCT cell) AS geo_cnt
  FROM h GROUP BY mmsi, day_date
)
SELECT p.uid_a, p.uid_b, p.day_date,
       ua.win_cnt AS hA, ub.win_cnt AS hB,
       ua.geo_cnt AS gA, ub.geo_cnt AS gB,
       p.hT, p.gT,
       CAST(p.hT AS DOUBLE) / NULLIF(CAST(LEAST(ua.win_cnt, ub.win_cnt) AS DOUBLE), 0.0) AS temporal_o,
       CAST(p.gT AS DOUBLE) / NULLIF(CAST(LEAST(ua.geo_cnt, ub.geo_cnt) AS DOUBLE), 0.0) AS spatial_o,
       0.5 * (CAST(p.hT AS DOUBLE) / NULLIF(CAST(LEAST(ua.win_cnt, ub.win_cnt) AS DOUBLE), 0.0)
            + CAST(p.gT AS DOUBLE) / NULLIF(CAST(LEAST(ua.geo_cnt, ub.geo_cnt) AS DOUBLE), 0.0)) AS gto
FROM pair_day p
JOIN stats ua ON p.uid_a = ua.mmsi AND p.day_date = ua.day_date
JOIN stats ub ON p.uid_b = ub.mmsi AND p.day_date = ub.day_date
WHERE p.gT > {min_shared_cells}
"""

#: Mirrors sql/gold/create_pairs_total.sql:11-21.
PAIRS_TOTAL_SQL = """
SELECT uid_a, uid_b,
       COUNT(DISTINCT day_date)                         AS total_days_observed,
       SUM(CASE WHEN gto >= 0.4 THEN 1 ELSE 0 END)      AS days_with_gto_above_0_4,
       MAX(gto) AS max_gto, MIN(gto) AS min_gto, AVG(gto) AS avg_gto,
       approx_percentile(gto, 0.5)                      AS median_gto
FROM {pairs}
GROUP BY uid_a, uid_b
"""


def run_gold_sql(
    spark: SparkSession,
    silver_view: str,
    *,
    ts_col: str = "base_date_time",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    sog_col: str = "sog",
    min_shared_cells: int = 1,
) -> dict[str, DataFrame]:
    """Run the full gold pipeline as SQL over ``silver_view``.

    Registers the session functions, materializes each stage as a temp
    view (`gold_uid_hourly` / `gold_pairs_daily` / `gold_pairs_total`),
    and returns the three DataFrames. Identical results to
    ``plans.gold_refresh.refresh_gold`` — asserted by tests.
    """
    register_sql_functions(spark)
    hourly = spark.sql(
        UID_HOURLY_SQL.format(
            silver=silver_view, ts=ts_col, lat=lat_col, lon=lon_col, sog=sog_col
        )
    )
    hourly.createOrReplaceTempView("gold_uid_hourly")
    pairs = spark.sql(
        PAIRS_DAILY_SQL.format(
            hourly="gold_uid_hourly", min_shared_cells=min_shared_cells
        )
    )
    pairs.createOrReplaceTempView("gold_pairs_daily")
    totals = spark.sql(PAIRS_TOTAL_SQL.format(pairs="gold_pairs_daily"))
    totals.createOrReplaceTempView("gold_pairs_total")
    return {"uid_hourly": hourly, "pairs_daily": pairs, "pairs_total": totals}
