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
