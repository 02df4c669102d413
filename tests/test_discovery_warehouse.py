"""Tests for driver-side discovery/bronze (S1-S5), warehouse DDL
(S11-S13), and partition-date reconstruction (P17)."""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from knot_another_pipeline_spark.sources.discovery import (
    ArchiveRef,
    bronze_exists,
    download,
    probe_dates,
    scrape_index,
    upload_bronze,
)

INDEX_HTML = """
<html><body><pre>
<a href="AIS_2024_01_02.zip">AIS_2024_01_02.zip</a> 02-Jan-2024 1.1G
<a href="AIS_2024_01_01.zip">AIS_2024_01_01.zip</a> 01-Jan-2024 1.0G
<a href="https://host/data/AIS_2024_01_03.csv.zst">AIS_2024_01_03.csv.zst</a>
<a href="readme.txt">readme.txt</a>
<a href="AIS_2024_013_01.zip">malformed</a>
</pre></body></html>
"""


def test_scrape_index_parses_and_sorts():
    refs = scrape_index(INDEX_HTML, base_url="https://noaa.example/2024")
    assert [r.day for r in refs] == [
        date(2024, 1, 1), date(2024, 1, 2), date(2024, 1, 3),
    ]
    assert refs[0].url == "https://noaa.example/2024/AIS_2024_01_01.zip"
    assert refs[2].url == "https://host/data/AIS_2024_01_03.csv.zst"  # absolute kept


def test_probe_dates_injectable_predicate():
    have = {"u/2024/01/02/f.zip", "u/2024/01/04/f.zip"}
    refs = probe_dates(
        "u/{y}/{m}/{d}/f.zip", date(2024, 1, 1), date(2024, 1, 5),
        exists=lambda u: u in have,
    )
    assert [r.day for r in refs] == [date(2024, 1, 2), date(2024, 1, 4)]


def test_bronze_key_layout():
    ref = ArchiveRef(url="x", filename="AIS_2024_01_02.zip", day=date(2024, 1, 2))
    assert ref.bronze_key == "bronze/ais/year=2024/month=01/day=02/AIS_2024_01_02.zip"


def test_download_reuse_and_bronze_roundtrip(tmp_path):
    src = tmp_path / "src" / "AIS_2024_01_02.zip"
    src.parent.mkdir()
    src.write_bytes(b"archive-bytes")
    ref = ArchiveRef(url=str(src), filename=src.name, day=date(2024, 1, 2))

    got = download(ref, tmp_path / "dl")
    assert got.read_bytes() == b"archive-bytes"
    src.write_bytes(b"CHANGED")  # existing non-empty download is reused
    assert download(ref, tmp_path / "dl").read_bytes() == b"archive-bytes"

    bronze = tmp_path / "bronze"
    assert not bronze_exists(bronze, ref)
    put = upload_bronze(got, bronze, ref)
    assert bronze_exists(bronze, ref)
    assert put.read_bytes() == b"archive-bytes"  # byte-identical


def test_bucketed_table_roundtrip_and_shuffle_free_join(spark, tmp_path):
    from knot_another_pipeline_spark.sources.warehouse import (
        drop_table,
        save_bucketed_table,
    )

    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    save_bucketed_table(
        df, "t_bucketed", bucket_by=["k"], num_buckets=4, sort_by=["k"],
        path=str(tmp_path / "t_bucketed"),
    )
    back = spark.table("t_bucketed")
    assert back.count() == 1000
    # self-join on the bucket key: both sides read pre-bucketed → no
    # shuffle Exchange in the plan (broadcast disabled so the sort-merge
    # path is exercised — with broadcast on, Spark may choose it instead,
    # which also avoids the shuffle)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = back.alias("a").join(back.alias("b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    drop_table(spark, "t_bucketed")


def test_external_table_msck_partition_discovery(spark, tmp_path):
    from knot_another_pipeline_spark.sources.warehouse import (
        create_external_table,
        drop_table,
    )

    root = tmp_path / "ext"
    df = spark.createDataFrame(
        [(1, "a", "2024"), (2, "b", "2024"), (3, "c", "2025")],
        "id long, val string, year string",
    )
    df.write.partitionBy("year").parquet(str(root))
    create_external_table(
        spark, "t_ext", str(root), partition_cols=["year"]
    )
    got = spark.table("t_ext")
    assert got.count() == 3
    assert {r["year"] for r in got.select("year").distinct().collect()} == {
        "2024", "2025",
    }
    # partition pruning: filter on the partition column scans one partition
    pruned = got.filter(F.col("year") == "2025")
    assert pruned.count() == 1
    drop_table(spark, "t_ext")


def test_partition_date_reconstruction(spark):
    from knot_another_pipeline_spark.functions.timestamps import partition_date

    df = spark.createDataFrame(
        [("2024", "02", "29"), ("2023", "02", "29"), ("2024", "1", "2")],
        "y string, m string, d string",
    )
    out = df.select(partition_date("y", "m", "d").alias("dt")).collect()
    assert out[0]["dt"] == date(2024, 2, 29)
    assert out[1]["dt"] is None  # invalid combination → NULL, like TRY()
    assert out[2]["dt"] == date(2024, 1, 2)


def test_format_roundtrips_preserve_rows_and_types(spark, tmp_path):
    """parquet/ORC/CSV/JSON roundtrips return the same rows; columnar
    formats also preserve types without a schema."""
    import datetime as dt

    from pyspark.sql import functions as F

    from knot_another_pipeline_spark.sources.formats import (
        read_table,
        write_table,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha", 1.5, "2025-01-01 00:00:01"),
            (2, "beta", -2.25, "2025-06-30 23:59:59"),
            (3, None, None, None),
        ],
        "id long, name string, score double, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    want = {tuple(r) for r in df.collect()}
    schema = df.schema

    for fmt in ("parquet", "orc"):
        p = str(tmp_path / fmt)
        write_table(df, p, fmt=fmt)
        back = read_table(spark, p, fmt=fmt)
        assert back.schema == schema  # columnar: self-describing
        assert {tuple(r) for r in back.collect()} == want

    for fmt in ("csv", "json"):
        p = str(tmp_path / fmt)
        write_table(df, p, fmt=fmt)
        back = read_table(spark, p, fmt=fmt, schema=schema)
        assert [f.dataType for f in back.schema.fields] == [
            f.dataType for f in schema.fields
        ]
        assert {tuple(r) for r in back.collect()} == want


def test_format_partitioned_write_prunes(spark, tmp_path):
    from pyspark.sql import functions as F

    from knot_another_pipeline_spark.sources.formats import (
        read_table,
        write_table,
    )

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(10)],
        "id long, part string",
    )
    p = str(tmp_path / "orc_part")
    write_table(df, p, fmt="orc", partition_by=["part"])
    back = read_table(spark, p, fmt="orc").filter(F.col("part") == "a")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == 5
    # partition pruning: the filtered scan reads only part=a directories
    assert "PartitionFilters: [isnotnull(part" in plan or "part=a" in plan


def test_format_validation(spark, tmp_path):
    import pytest as _pytest

    from knot_another_pipeline_spark.sources.formats import (
        read_table,
        write_table,
    )

    df = spark.range(1)
    with _pytest.raises(ValueError):
        write_table(df, str(tmp_path / "x"), fmt="avro")
    with _pytest.raises(ValueError):
        read_table(spark, str(tmp_path / "x"), fmt="csv")  # schema required
