"""Round-11 regression tests.

The round-10 driver gate produced the project's first red hash row:
``priority_linestatus``, whose DuckDB oracle returned ``sum(CASE...)``
uncast — DuckDB's integer ``sum`` yields HUGEINT, which crosses Arrow
as decimal128(38,0) and hash-diverges from Spark's int64 even though
the values agree bit-for-bit.  House style is ``CAST(sum(...) AS
BIGINT)``; this module pins that for EVERY oracle output so a typing
miss can never reach the driver again.
"""

from __future__ import annotations

import pytest

from knot_another_pipeline_spark.catalog_queries import ORACLES


def test_no_decimal_or_hugeint_oracle_outputs(duck):
    """Arrow-scan every ORACLE_* at LIMIT 0 and reject decimal outputs.

    The driver's value-hash stringifies engine-native types, so a DuckDB
    decimal128 column (from an uncast integer ``sum`` or a decimal
    literal) hash-diverges from the int64/float64 Spark emits even when
    values match.  Every oracle output column must therefore cross
    Arrow as a non-decimal type.  LIMIT 0 keeps this a planning-only
    scan — the whole sweep over 300+ oracles takes seconds.
    """
    import pyarrow as pa

    offenders = []
    for name in sorted(ORACLES):
        sql = ORACLES[name]
        tbl = duck.execute(
            f"SELECT * FROM (\n{sql}\n) __schema_probe LIMIT 0"
        ).arrow()
        for field in tbl.schema:
            if pa.types.is_decimal(field.type):
                offenders.append((name, field.name, str(field.type)))
    assert not offenders, (
        "oracle outputs must not be decimal128/HUGEINT (cast to BIGINT "
        f"or DOUBLE in the SQL): {offenders}"
    )


def test_priority_linestatus_counts_are_bigint(duck):
    """The specific round-10 red row: both count columns cross as int64."""
    import pyarrow as pa

    from knot_another_pipeline_spark.catalog_queries import (
        ORACLE_PRIORITY_LINESTATUS,
    )

    tbl = duck.execute(
        f"SELECT * FROM (\n{ORACLE_PRIORITY_LINESTATUS}\n) t LIMIT 0"
    ).arrow()
    types = {f.name: f.type for f in tbl.schema}
    assert types["high_line_count"] == pa.int64()
    assert types["low_line_count"] == pa.int64()
