"""Cohort track extraction + per-track path assembly.

Reference: ``/root/reference/apps/export_tracks_to_explore.py:31-69`` (a
VALUES-list semi-join cohort filter, tiered timestamp normalization,
coordinate-validity bounds, inclusive BETWEEN time range, global
``ORDER BY event_ts, mmsi``) and the app-side path packer
``apps/track_explorer.py:53-84`` (sort by (track, time) → list of
[lon, lat] points per track, keep tracks with > 2 points).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from knot_another_pipeline_spark.functions.geo import valid_coords


def export_tracks(
    df: DataFrame,
    *,
    uid_col: str,
    ts_col: str,
    lat_col: str,
    lon_col: str,
    uids: Sequence[str],
    start=None,
    stop=None,
) -> DataFrame:
    """Ordered track extract for a cohort of entity ids.

    The cohort filter is ``isin`` — Catalyst compiles small lists to an
    in-filter pushed into the parquet scan; a huge cohort should instead be
    a broadcast left-semi join (same semantics, SURVEY §2.3 J3).
    """
    uid = F.col(uid_col).cast("string")
    out = df.filter(uid.isin([str(u) for u in uids]))
    ts = F.col(ts_col)
    if start is not None and stop is not None:
        out = out.filter(ts.between(F.lit(start), F.lit(stop)))
    out = out.filter(
        valid_coords(F.col(lat_col).cast("double"), F.col(lon_col).cast("double"))
    )
    return out.select(
        uid.alias("uid"),
        ts.alias("event_ts"),
        F.col(lat_col).cast("double").alias("latitude"),
        F.col(lon_col).cast("double").alias("longitude"),
    ).orderBy("event_ts", "uid")


def backfill_track_ids(df: DataFrame, id_col: str = "track_id") -> DataFrame:
    """Synthesize stable placeholder ids for missing track ids [P20].

    Reference ``apps/track_explorer.py:179-185``: the id column is
    stringified, ``'nan'/'None'/'NaT'`` count as missing, and missing rows
    get ``"track_" + row_index``. Here the placeholder suffix is
    ``monotonically_increasing_id()`` — unique per row and generated
    entirely map-side (a ``row_number()`` over a global window would
    shuffle everything to one partition at scale; the reference's pandas
    index is just as arbitrary, only uniqueness+stability-within-run
    matter to the app).
    """
    sid = F.col(id_col).cast("string")
    missing = sid.isNull() | sid.isin("nan", "None", "NaT")
    return df.withColumn(
        id_col,
        F.when(
            missing,
            F.concat(
                F.lit("track_"),
                F.monotonically_increasing_id().cast("string"),
            ),
        ).otherwise(sid),
    )


def assemble_paths(
    df: DataFrame,
    *,
    uid_col: str = "uid",
    ts_col: str = "event_ts",
    lat_col: str = "latitude",
    lon_col: str = "longitude",
    min_points: int = 2,
) -> DataFrame:
    """Per-track ordered coordinate path (track_explorer.py `make_paths`):
    ``collect_list(struct(ts, lon, lat))`` sorted in-array — the struct's
    leading ts field makes ``sort_array`` a time sort without a global
    shuffle-sort; only the groupBy shuffles.
    Output: uid, path array<struct<ts,lon,lat>>, npts.
    """
    packed = df.groupBy(F.col(uid_col).alias("uid")).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(ts_col).alias("ts"),
                    F.col(lon_col).alias("lon"),
                    F.col(lat_col).alias("lat"),
                )
            )
        ).alias("path")
    )
    return packed.withColumn("npts", F.size("path")).filter(
        F.col("npts") > F.lit(min_points)
    )
