"""Format-agnostic table sinks/sources: parquet, ORC, CSV, JSON lines.

The reference reads zipped/zstd CSV and writes parquet
(``pipelines/ais_pipeline.py`` silver/gold); this module generalizes the
boundary so any stage can land in the columnar format the downstream
system expects (ORC for Hive-era warehouses, JSONL for annotation
tools, CSV for spreadsheets) without bespoke writer code per format.

Scale notes baked into the defaults:

- columnar formats (parquet, ORC) keep compression + statistics; Spark
  pushes filters/projections into BOTH scans, so a consumer reading one
  column of an ORC table scans one column, same as parquet;
- text formats (CSV, JSON) always materialize whole rows and parse on
  read — use them at the EDGES of a pipeline, never between stages (the
  round-trip drops types to strings in CSV unless a schema is supplied,
  which ``read_table`` requires for text formats for exactly that
  reason);
- ``partition_by`` produces the Hive layout every format shares, so
  partition pruning works the same on an ORC table as on silver parquet;
- timestamps: JSON serializes as ISO-8601 strings and CSV as formatted
  strings; both round-trip losslessly only at microsecond grain with an
  explicit schema — another reason text formats demand one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_COLUMNAR = {"parquet", "orc"}
_TEXT = {"csv", "json"}
SUPPORTED = _COLUMNAR | _TEXT


def write_table(
    df: DataFrame,
    path: str,
    *,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> None:
    """Write ``df`` at ``path`` in ``fmt`` with the format's sane
    compression default (snappy/zlib for columnar, gzip for text — text
    defaults OFF for CSV so spreadsheets open it directly)."""
    if fmt not in SUPPORTED:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(SUPPORTED)}")
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if compression is not None:
        w = w.option("compression", compression)
    if fmt == "csv":
        w = w.option("header", True)
    w.format(fmt).save(path)


def read_table(
    spark: SparkSession,
    path: str,
    *,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
) -> DataFrame:
    """Read a table written by :func:`write_table`.

    Columnar formats carry their schema; text formats REQUIRE one —
    schema inference over CSV/JSON runs an extra full pass over the data
    and still guesses (every CSV column nullable string unless lucky),
    which at 100 TB is both a wasted scan and a silent contract change.
    """
    if fmt not in SUPPORTED:
        raise ValueError(f"unsupported format {fmt!r}; one of {sorted(SUPPORTED)}")
    if fmt in _TEXT and schema is None:
        raise ValueError(
            f"{fmt} requires an explicit schema: inference costs a full "
            "extra pass and degrades types"
        )
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        r = r.option("header", True)
    return r.format(fmt).load(path)
