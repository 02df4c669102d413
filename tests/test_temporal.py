"""Temporal operators: as-of join, range join, rolling window, KMV sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from knot_another_pipeline_spark.operators.temporal import (
    asof_join,
    range_join,
    rolling_stats,
)


def _quotes(spark):
    return spark.createDataFrame(
        [
            (1, "2025-01-01 00:00:00", 10.0),
            (1, "2025-01-01 00:30:00", 20.0),
            (1, "2025-01-01 02:00:00", 30.0),
            (2, "2025-01-01 01:00:00", 99.0),
        ],
        "uid long, ts string, px double",
    ).withColumn("ts", F.to_timestamp("ts"))


def _probes(spark):
    return spark.createDataFrame(
        [
            (1, "2025-01-01 00:15:00"),   # -> 10.0 (00:00)
            (1, "2025-01-01 00:30:00"),   # -> 20.0 (tie: quote at same ts wins)
            (1, "2025-01-01 03:00:00"),   # -> 30.0 (02:00)
            (2, "2025-01-01 00:30:00"),   # -> no prior quote
            (3, "2025-01-01 00:30:00"),   # -> key never quoted
        ],
        "uid long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))


def test_asof_join_backward_matches_latest_prior(spark):
    out = asof_join(_probes(spark), _quotes(spark), on="uid")
    got = {(r["uid"], str(r["ts"])): r["px"] for r in out.collect()}
    assert got[(1, "2025-01-01 00:15:00")] == 10.0
    assert got[(1, "2025-01-01 00:30:00")] == 20.0  # <= includes equal ts
    assert got[(1, "2025-01-01 03:00:00")] == 30.0
    assert got[(2, "2025-01-01 00:30:00")] is None  # left join keeps row
    assert got[(3, "2025-01-01 00:30:00")] is None
    assert out.count() == 5


def test_asof_join_tolerance_and_inner(spark):
    out = asof_join(
        _probes(spark), _quotes(spark), on="uid", tolerance_seconds=1800
    )
    got = {(r["uid"], str(r["ts"])): r["px"] for r in out.collect()}
    # 03:00 probe's match (02:00) is 1h old -> nulled by 30min tolerance
    assert got[(1, "2025-01-01 03:00:00")] is None
    assert got[(1, "2025-01-01 00:15:00")] == 10.0
    inner = asof_join(
        _probes(spark), _quotes(spark), on="uid",
        tolerance_seconds=1800, how="inner",
    )
    assert inner.count() == 2  # only the two in-tolerance matches survive


def test_asof_join_forward_direction(spark):
    out = asof_join(_probes(spark), _quotes(spark), on="uid", direction="forward")
    got = {(r["uid"], str(r["ts"])): r["px"] for r in out.collect()}
    assert got[(1, "2025-01-01 00:15:00")] == 20.0   # next quote at 00:30
    assert got[(1, "2025-01-01 00:30:00")] == 20.0   # equal ts matches
    assert got[(1, "2025-01-01 03:00:00")] is None   # nothing later
    assert got[(2, "2025-01-01 00:30:00")] == 99.0


def test_asof_join_tiebreak_deterministic(spark):
    # two quotes at the identical (uid, ts): highest tiebreak wins
    quotes = spark.createDataFrame(
        [(1, "2025-01-01 00:00:00", 5.0, 100), (1, "2025-01-01 00:00:00", 7.0, 200)],
        "uid long, ts string, px double, qid long",
    ).withColumn("ts", F.to_timestamp("ts"))
    probes = spark.createDataFrame(
        [(1, "2025-01-01 00:10:00")], "uid long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = asof_join(
        probes, quotes, on="uid", right_cols=["px"], right_tiebreak="qid"
    ).collect()
    assert out[0]["px"] == 7.0


def test_asof_join_string_tiebreak_not_nulled(spark):
    """A non-integral tiebreak is hashed, not cast('long') (which would
    silently NULL every row and restore partition-order
    nondeterminism) — the winner is stable across runs."""
    quotes = spark.createDataFrame(
        [
            (1, "2025-01-01 00:00:00", 5.0, "q-a"),
            (1, "2025-01-01 00:00:00", 7.0, "q-b"),
        ],
        "uid long, ts string, px double, qid string",
    ).withColumn("ts", F.to_timestamp("ts"))
    probes = spark.createDataFrame(
        [(1, "2025-01-01 00:10:00")], "uid long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    picks = {
        asof_join(
            probes, quotes, on="uid", right_cols=["px"], right_tiebreak="qid"
        ).collect()[0]["px"]
        for _ in range(3)
    }
    assert picks == {5.0} or picks == {7.0}


def test_asof_join_matched_ts_col_collision_raises(spark):
    import pytest

    probes = _probes(spark).withColumn("asof_ts", F.col("ts"))
    with pytest.raises(ValueError, match="asof_ts"):
        asof_join(probes, _quotes(spark), on="uid")
    # a custom matched_ts_col dodges the collision
    out = asof_join(
        probes, _quotes(spark), on="uid", matched_ts_col="quote_ts"
    )
    assert "quote_ts" in out.columns


def test_range_join_points_in_intervals(spark):
    intervals = spark.createDataFrame(
        [
            (1, "2025-01-01 00:00:00", "2025-01-01 01:00:00", "w1"),
            (1, "2025-01-01 00:30:00", "2025-01-01 00:45:00", "w2"),  # overlaps w1
            (2, "2025-01-01 05:00:00", "2025-01-01 06:00:00", "w3"),
            (1, "2025-01-01 09:00:00", "2025-01-01 08:00:00", "bad"),  # end<start
        ],
        "uid long, start string, end string, label string",
    ).withColumn("start", F.to_timestamp("start")).withColumn(
        "end", F.to_timestamp("end")
    )
    points = spark.createDataFrame(
        [
            (1, "2025-01-01 00:40:00", 1),  # in w1 AND w2
            (1, "2025-01-01 01:00:00", 2),  # w1 boundary (inclusive end)
            (1, "2025-01-01 02:00:00", 3),  # in nothing
            (2, "2025-01-01 05:30:00", 4),  # in w3
            (1, "2025-01-01 08:30:00", 5),  # inside 'bad' reversed interval: dropped
        ],
        "uid long, ts string, pid long",
    ).withColumn("ts", F.to_timestamp("ts"))
    # bucket smaller than the intervals to exercise multi-bucket explode
    out = range_join(
        points, intervals, on="uid", bucket_seconds=600
    ).select("pid", "label").collect()
    got = sorted((r["pid"], r["label"]) for r in out)
    assert got == [(1, "w1"), (1, "w2"), (2, "w1"), (4, "w3")]


def test_range_join_exclusive_end(spark):
    intervals = spark.createDataFrame(
        [(1, "2025-01-01 00:00:00", "2025-01-01 01:00:00", "w")],
        "uid long, start string, end string, label string",
    ).withColumn("start", F.to_timestamp("start")).withColumn(
        "end", F.to_timestamp("end")
    )
    points = spark.createDataFrame(
        [(1, "2025-01-01 01:00:00", 1)], "uid long, ts string, pid long"
    ).withColumn("ts", F.to_timestamp("ts"))
    assert range_join(points, intervals, on="uid").count() == 1
    assert (
        range_join(points, intervals, on="uid", inclusive_end=False).count() == 0
    )


def test_rolling_stats_trailing_window(spark):
    df = spark.createDataFrame(
        [
            (1, "2025-01-01 00:00:00", 1.0),
            (1, "2025-01-01 00:30:00", 2.0),
            (1, "2025-01-01 01:00:00", 4.0),   # 1h window: sees all three
            (1, "2025-01-01 02:30:00", 8.0),   # everything else aged out
            (2, "2025-01-01 00:10:00", 5.0),
        ],
        "uid long, ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = rolling_stats(
        df, key_col="uid", ts_col="ts", value_col="v", window_seconds=3600
    )
    got = {
        (r["uid"], str(r["ts"])): (r["n_window"], r["sum_window"], r["max_window"])
        for r in out.collect()
    }
    assert got[(1, "2025-01-01 00:00:00")] == (1, 1.0, 1.0)
    assert got[(1, "2025-01-01 00:30:00")] == (2, 3.0, 2.0)
    assert got[(1, "2025-01-01 01:00:00")] == (3, 7.0, 4.0)  # inclusive bound
    assert got[(1, "2025-01-01 02:30:00")] == (1, 8.0, 8.0)
    assert got[(2, "2025-01-01 00:10:00")] == (1, 5.0, 5.0)


def test_rolling_stats_equal_ts_are_range_peers(spark):
    df = spark.createDataFrame(
        [(1, "2025-01-01 00:00:00", 1.0), (1, "2025-01-01 00:00:00", 2.0)],
        "uid long, ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = rolling_stats(
        df, key_col="uid", ts_col="ts", value_col="v", window_seconds=60
    ).collect()
    assert sorted(r["sum_window"] for r in out) == [3.0, 3.0]


def test_kmv_distinct_exact_below_k_and_estimate_above(spark):
    from knot_another_pipeline_spark.operators.quality import kmv_distinct

    rows = [("small", i % 10) for i in range(100)] + [
        ("big", i) for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "grp string, v long")
    out = {
        r["grp"]: r["n_distinct_est"]
        for r in kmv_distinct(df, "v", by="grp", k=64).collect()
    }
    assert out["small"] == 10  # fewer than k distinct -> exact
    # estimate within ~4 standard errors (1/sqrt(62) ~ 12.7%)
    assert abs(out["big"] - 5000) / 5000 < 0.5
    # global (no `by`): one row, exact-small path
    g = kmv_distinct(df.filter("grp = 'small'"), "v", k=64).collect()
    assert len(g) == 1 and g[0]["n_distinct_est"] == 10


def test_temporal_plan_shapes(spark):
    """Scale regression guards: range_join must compile to an equi-join
    (never broadcast-nested-loop/cartesian), and asof_join must be a
    join-free single-window plan."""
    intervals = spark.createDataFrame(
        [(1, "2025-01-01 00:00:00", "2025-01-01 01:00:00", "w")],
        "uid long, start string, end string, label string",
    ).withColumn("start", F.to_timestamp("start")).withColumn(
        "end", F.to_timestamp("end")
    )
    points = spark.createDataFrame(
        [(1, "2025-01-01 00:30:00", 7)], "uid long, ts string, pid long"
    ).withColumn("ts", F.to_timestamp("ts"))
    rj_plan = range_join(points, intervals, on="uid")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in rj_plan
    assert "CartesianProduct" not in rj_plan
    assert "Join" in rj_plan  # it IS a (hash/sort-merge/broadcast-hash) join

    aj_plan = asof_join(_probes(spark), _quotes(spark), on="uid")._jdf\
        .queryExecution().executedPlan().toString()
    assert "Join" not in aj_plan     # union-window: no join operator at all
    assert "Window" in aj_plan


def test_asof_join_null_keys_and_ts_never_match(spark):
    """SQL join semantics: NULL keys don't equal NULL keys, and a NULL
    probe timestamp matches nothing — but probe rows are kept (left)."""
    quotes = spark.createDataFrame(
        [(None, "2025-01-01 00:00:00", 1.0), (1, "2025-01-01 00:00:00", 2.0),
         (1, None, 3.0)],
        "uid long, ts string, px double",
    ).withColumn("ts", F.to_timestamp("ts"))
    probes = spark.createDataFrame(
        [(None, "2025-01-01 01:00:00", 1), (1, None, 2),
         (1, "2025-01-01 01:00:00", 3)],
        "uid long, ts string, pid long",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["pid"]: r["px"] for r in asof_join(probes, quotes, on="uid").collect()}
    assert out == {1: None, 2: None, 3: 2.0}


def test_scd2_history_collapses_duplicates_and_versions(spark):
    from knot_another_pipeline_spark.operators.temporal import scd2_history

    rows = [
        (1, "2025-01-01 00:00:00", "bronze"),
        (1, "2025-01-02 00:00:00", "bronze"),   # no-op: same state
        (1, "2025-01-03 00:00:00", "silver"),   # version 2 opens
        (1, "2025-01-04 00:00:00", "bronze"),   # back to bronze: version 3
        (2, "2025-01-01 00:00:00", None),       # NULL state tracked
        (2, "2025-01-02 00:00:00", None),       # NULL -> NULL is NOT a change
        (2, "2025-01-03 00:00:00", "gold"),
    ]
    df = spark.createDataFrame(
        rows, "uid long, ts string, tier string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = scd2_history(df, "uid", ts_col="ts", attr_cols=["tier"]).collect()
    hist = {}
    for r in sorted(out, key=lambda r: (r["uid"], r["valid_from"])):
        hist.setdefault(r["uid"], []).append(
            (r["tier"], str(r["valid_from"])[:10], 
             str(r["valid_to"])[:10] if r["valid_to"] else None,
             r["is_current"])
        )
    assert hist[1] == [
        ("bronze", "2025-01-01", "2025-01-03", False),
        ("silver", "2025-01-03", "2025-01-04", False),
        ("bronze", "2025-01-04", None, True),
    ]
    assert hist[2] == [
        (None, "2025-01-01", "2025-01-03", False),
        ("gold", "2025-01-03", None, True),
    ]
    # exactly one current version per key
    assert sum(1 for v in out if v["is_current"]) == 2

    # end_of_time closes the open interval instead of NULL
    closed = scd2_history(
        df, "uid", ts_col="ts", attr_cols=["tier"],
        end_of_time="9999-12-31 00:00:00",
    ).collect()
    assert all(r["valid_to"] is not None for r in closed)
    import pytest
    with pytest.raises(ValueError):
        scd2_history(df, "uid", ts_col="ts", attr_cols=[])


def test_interval_merge_islands_and_gap(spark):
    from knot_another_pipeline_spark.operators.temporal import interval_merge

    rows = [
        # key 1: [0,10] [5,20] overlap -> [0,20]; [30,40] separate
        (1, "2025-01-01 00:00:00", "2025-01-01 00:10:00"),
        (1, "2025-01-01 00:05:00", "2025-01-01 00:20:00"),
        (1, "2025-01-01 00:30:00", "2025-01-01 00:40:00"),
        # key 2: containment [0,60] swallows [10,20]
        (2, "2025-01-01 00:00:00", "2025-01-01 01:00:00"),
        (2, "2025-01-01 00:10:00", "2025-01-01 00:20:00"),
        # NULL-bounded rows are dropped
        (2, None, "2025-01-01 02:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "uid long, start_ts string, end_ts string"
    ).select(
        "uid",
        F.to_timestamp("start_ts").alias("start_ts"),
        F.to_timestamp("end_ts").alias("end_ts"),
    )
    got = {
        (r["uid"], str(r["start_ts"])[11:16]): (
            str(r["end_ts"])[11:16], r["n_intervals"]
        )
        for r in interval_merge(df, "uid").collect()
    }
    assert got == {
        (1, "00:00"): ("00:20", 2),
        (1, "00:30"): ("00:40", 1),
        (2, "00:00"): ("01:00", 2),
    }
    # adjacent-within-gap merge: 10-minute gap bridges [0,10] and [15,25]
    df2 = spark.createDataFrame(
        [(1, "2025-01-01 00:00:00", "2025-01-01 00:10:00"),
         (1, "2025-01-01 00:15:00", "2025-01-01 00:25:00")],
        "uid long, s string, e string",
    ).select(
        "uid",
        F.to_timestamp("s").alias("start_ts"),
        F.to_timestamp("e").alias("end_ts"),
    )
    assert interval_merge(df2, "uid", min_gap_seconds=600).count() == 1
    assert interval_merge(df2, "uid", min_gap_seconds=299).count() == 2


def test_scd2_and_interval_merge_plan_shapes(spark):
    """Scale regression guards: both operators must be join-free and
    share ONE hash exchange on the key across their windows + aggregate
    (Catalyst reuses the partitioning; a second exchange means the
    single-shuffle claim regressed)."""
    from knot_another_pipeline_spark.operators.temporal import (
        interval_merge,
        scd2_history,
    )

    df = spark.createDataFrame(
        [(1, "2025-01-01 00:00:00", "a")], "uid long, ts string, attr string"
    ).withColumn("ts", F.to_timestamp("ts"))
    plan = scd2_history(
        df, "uid", ts_col="ts", attr_cols=["attr"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1

    iv = df.select(
        "uid",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
    )
    plan2 = interval_merge(iv, "uid")._jdf.queryExecution().executedPlan(
    ).toString()
    assert "Join" not in plan2
    assert plan2.count("Exchange hashpartitioning") == 1


def test_cdc_apply_plan_is_join_free(spark):
    """cdc_apply must stay the union+window shape: one hash exchange on
    the key, no join operator."""
    from knot_another_pipeline_spark.operators.relational import cdc_apply

    snap = spark.createDataFrame([(1, "a")], "k long, v string")
    chg = spark.createDataFrame(
        [(1, "b", "U", 2)], "k long, v string, op string, ver long"
    )
    plan = cdc_apply(snap, chg, "k", order_col="ver")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
