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


def _vec_df(spark, n, dim=4):
    rows = [
        (i, [float((i * 7 + j * 3) % 11) + 1.0 for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_topk_exact_guard_trips(spark):
    """r9 task #5 (enforced this round): the brute-force feeder must
    REFUSE oversized corpora, naming the LSH/IVF swap, rather than
    carrying the scale story only in prose."""
    from knot_another_pipeline_spark.operators.similarity import cosine_topk

    df = _vec_df(spark, 12)
    with pytest.raises(ValueError, match="lsh_bucket_topk"):
        cosine_topk(df.limit(3), df, k=2, max_exact_rows=10)
    # below the ceiling: unchanged result, and None disables the guard
    out = cosine_topk(df.limit(3), df, k=2, max_exact_rows=12).collect()
    out_none = cosine_topk(df.limit(3), df, k=2, max_exact_rows=None).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out_none))
    assert len(out) == 6


def test_twonn_exact_guard_trips(spark):
    from knot_another_pipeline_spark.operators.similarity import (
        twonn_dimension,
    )

    df = _vec_df(spark, 12)
    with pytest.raises(ValueError, match="k=2"):
        twonn_dimension(df, max_exact_rows=10)
    row = twonn_dimension(df, max_exact_rows=12).collect()[0]
    assert row["n_points"] == 12


def test_layout_pruning_staged_split_matches_fused(spark):
    """bench.py's staged shape (layout_rankings materialized once,
    layout_pruning_readout timed) must produce the identical readout
    as the fused operator the catalog/driver runs."""
    from knot_another_pipeline_spark.operators.relational import (
        layout_pruning,
        layout_pruning_readout,
        layout_rankings,
    )

    rows = [(i, (i * 37) % 101, (i * 53) % 97) for i in range(500)]
    df = spark.createDataFrame(rows, "event_id long, x long, y long")
    kw = dict(x_col="x", y_col="y", id_col="event_id")
    box = (10.0, 40.0, 20.0, 60.0)
    fused = layout_pruning(df, box=box, group_rows=64, **kw).collect()
    staged = layout_pruning_readout(
        layout_rankings(df, **kw), box=box, group_rows=64
    ).collect()
    assert sorted(map(tuple, fused)) == sorted(map(tuple, staged))


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
