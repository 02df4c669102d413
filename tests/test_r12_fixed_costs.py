"""Round-12 fixed-cost internals: the load_table plan memo and the
fan_out_small_scan partition-count memo.

The memo caches the lazy DataFrame PLAN per (session, path, mtime) —
never results: every action still scans parquet fresh. These tests pin
the two behaviors that make that safe: (1) a rewritten file (new mtime)
misses the memo and reads the new data; (2) the memoized plan returns
the same rows as a fresh read.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import functions as F

from knot_another_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_load_table_memo_hit_returns_same_plan(spark):
    a = load_table(spark, SF, "nation")
    b = load_table(spark, SF, "nation")
    assert a is b  # memo hit: same immutable plan object


def test_load_table_memo_misses_on_rewrite(spark, tmp_path):
    d = str(tmp_path)
    shutil.copy(os.path.join(SF, "nation.parquet"),
                os.path.join(d, "t.parquet"))
    first = load_table(spark, d, "t")
    n_first = first.count()
    assert n_first > 0
    # rewrite the path with a DIFFERENT table and a newer mtime
    shutil.copy(os.path.join(SF, "region.parquet"),
                os.path.join(d, "t.parquet"))
    now = time.time()
    os.utime(os.path.join(d, "t.parquet"), (now + 2, now + 2))
    second = load_table(spark, d, "t")
    assert second is not first
    assert set(second.columns) != set(first.columns)


def test_load_table_memo_rows_match_fresh_read(spark):
    memoized = load_table(spark, SF, "region")
    fresh = spark.read.parquet(os.path.join(SF, "region.parquet"))
    assert sorted(map(tuple, memoized.collect())) == sorted(
        map(tuple, fresh.collect())
    )


def test_fan_out_memo_consistent(spark):
    from knot_another_pipeline_spark.functions.partitioning import (
        fan_out_small_scan,
    )

    df = load_table(spark, SF, "documents")
    out1 = fan_out_small_scan(df)
    out2 = fan_out_small_scan(df)  # second call takes the memoized count
    assert out1.schema == out2.schema
    assert out1.count() == out2.count() == df.count()


def test_dot_unroll_bit_identical_and_guarded(spark):
    """dot/l2_norm unroll_dim: bit-identical to the fold on matching
    lengths, and the size guard falls back to the fold (same value) on
    any other length — including empty and null arrays."""
    from knot_another_pipeline_spark.operators.similarity import dot, l2_norm

    rows = [
        (1, [1.5, -2.25, 3.0, 0.125], [0.5, 4.0, -1.0, 8.0]),   # len 4
        (2, [1e-300, 1e300, -1e300, 1.0], [1.0, 1.0, 1.0, 1.0]),  # cancellation
        (3, [0.1, 0.2], [0.3, 0.4]),                              # shorter
        (4, [], []),                                              # empty
        (5, None, [1.0, 2.0, 3.0, 4.0]),                          # null side
    ]
    df = spark.createDataFrame(rows, ["id", "a", "b"])
    got = df.select(
        "id",
        dot(F.col("a"), F.col("b")).alias("fold"),
        dot("a", "b", unroll_dim=4).alias("unrolled"),
        l2_norm(F.col("a")).alias("nfold"),
        l2_norm("a", unroll_dim=4).alias("nunrolled"),
    ).collect()
    for r in got:
        # bitwise comparison via repr of doubles (None == None too)
        assert repr(r["fold"]) == repr(r["unrolled"]), r
        assert repr(r["nfold"]) == repr(r["nunrolled"]), r
