"""Round-5 operators: funnel, cohort retention, pivot/unpivot,
period-over-period, calendar resample, skew join, fuzzy matching."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knot_another_pipeline_spark.operators.behavior import cohort_retention, funnel
from knot_another_pipeline_spark.operators.dedup import fuzzy_match_pairs
from knot_another_pipeline_spark.operators.relational import (
    pivot_wide,
    skew_join,
    unpivot_long,
)
from knot_another_pipeline_spark.operators.temporal import (
    period_over_period,
    resample_calendar,
)


def _events(spark):
    rows = [
        # u1: clean signup -> view -> purchase
        (1, "2025-01-01 10:00:00", "signup"),
        (1, "2025-01-02 10:00:00", "view"),
        (1, "2025-01-03 10:00:00", "purchase"),
        # u2: purchased BEFORE first view -> reaches step 2 only... no:
        # first view after signup, purchase before view -> stops at view
        (2, "2025-01-01 10:00:00", "signup"),
        (2, "2025-01-02 10:00:00", "purchase"),
        (2, "2025-01-03 10:00:00", "view"),
        # u3: never signed up -> reaches nothing
        (3, "2025-01-01 10:00:00", "view"),
        (3, "2025-01-02 10:00:00", "purchase"),
        # u4: signup only
        (4, "2025-02-05 10:00:00", "signup"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_funnel_first_touch_ordering(spark):
    out = funnel(_events(spark), ["signup", "view", "purchase"])
    got = {r["step"]: r["n_users"] for r in out.collect()}
    # u1, u2, u4 signed up; u1 and u2 viewed after signup; only u1
    # purchased after the first view
    assert got == {"signup": 3, "view": 2, "purchase": 1}
    idx = {r["step"]: r["step_index"] for r in out.collect()}
    assert idx == {"signup": 1, "view": 2, "purchase": 3}


def test_funnel_monotone_counts(spark):
    out = funnel(
        _events(spark), ["signup", "view", "purchase"]
    ).orderBy("step_index")
    counts = [r["n_users"] for r in out.collect()]
    assert counts == sorted(counts, reverse=True)


def test_cohort_retention_offsets(spark):
    rows = [
        (1, "2025-01-05 00:00:00"),  # cohort Jan, active Jan + Mar
        (1, "2025-03-10 00:00:00"),
        (2, "2025-01-20 00:00:00"),  # cohort Jan, active Jan only
        (3, "2025-02-01 00:00:00"),  # cohort Feb, active Feb + Mar
        (3, "2025-03-01 00:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {
        (str(r["cohort_month"]), r["month_offset"]): r["n_active"]
        for r in cohort_retention(ev).collect()
    }
    assert out == {
        ("2025-01-01", 0): 2,
        ("2025-01-01", 2): 1,
        ("2025-02-01", 0): 1,
        ("2025-02-01", 1): 1,
    }


def test_pivot_unpivot_roundtrip(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", "x"), ("a", "y"), ("b", "y")],
        "grp string, kind string",
    )
    wide = pivot_wide(df, "grp", "kind", ["x", "y", "z"])
    rows = {r["grp"]: (r["x"], r["y"], r["z"]) for r in wide.collect()}
    # absent combinations are NULL (CASE-WHEN parity), not 0
    assert rows == {"a": (2, 1, None), "b": (None, 1, None)}

    long = unpivot_long(
        wide.select(
            "grp", *[F.col(c).cast("long") for c in ["x", "y", "z"]]
        ),
        "grp",
        ["x", "y", "z"],
    )
    back = {
        (r["grp"], r["metric"]): r["value"]
        for r in long.collect()
        if r["value"] is not None
    }
    assert back == {("a", "x"): 2, ("a", "y"): 1, ("b", "y"): 1}


def test_period_over_period_guards(spark):
    df = spark.createDataFrame(
        [("2025-01-01", 0.0), ("2025-02-01", 50.0), ("2025-03-01", 75.0)],
        "month string, revenue double",
    ).withColumn("month", F.to_date("month"))
    out = {
        str(r["month"]): (r["prev_revenue"], r["pct_change_revenue"])
        for r in period_over_period(df, "month", "revenue").collect()
    }
    assert out["2025-01-01"] == (None, None)  # no prior period
    assert out["2025-02-01"] == (0.0, None)  # NULLIF zero-prev guard
    assert out["2025-03-01"] == (50.0, 0.5)


def test_resample_calendar_fills_gaps(spark):
    df = spark.createDataFrame(
        [
            ("a", "2025-01-01 05:00:00", 1.0),
            ("a", "2025-01-03 05:00:00", 2.0),  # Jan 2 missing
            ("b", "2025-01-02 05:00:00", 3.0),
        ],
        "k string, ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = resample_calendar(
        df,
        "ts",
        group_cols="k",
        aggs={"n": F.count(F.lit(1)), "total": F.sum("v")},
        fill={"n": 0},
    )
    rows = {
        (r["k"], str(r["bucket"])): (r["n"], r["total"]) for r in out.collect()
    }
    assert rows[("a", "2025-01-01 00:00:00")] == (1, 1.0)
    assert rows[("a", "2025-01-02 00:00:00")] == (0, None)  # filled gap
    assert rows[("a", "2025-01-03 00:00:00")] == (1, 2.0)
    # group b spans one day: no spurious spine rows outside its span
    assert [k for k in rows if k[0] == "b"] == [("b", "2025-01-02 00:00:00")]


def test_skew_join_matches_plain_join(spark):
    left = spark.range(0, 2000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("payload")
    )
    right = spark.createDataFrame(
        [(0, "zero"), (1, "one"), (2, "two"), (7, "never")],
        "k long, name string",
    )
    for how in ("inner", "left"):
        got = skew_join(left, right, "k", salt=4, how=how)
        want = left.join(right, "k", how)
        assert got.count() == want.count()
        assert got.subtract(want).count() == 0
        assert want.subtract(got).count() == 0


def test_skew_join_preserves_duplicate_rows(spark):
    left = spark.createDataFrame([(1, "p")] * 3, "k long, payload string")
    right = spark.createDataFrame([(1, "r")], "k long, name string")
    assert skew_join(left, right, "k", salt=8).count() == 3


def test_skew_join_validation(spark):
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        skew_join(df, df, "k", how="full")
    with pytest.raises(ValueError):
        skew_join(df, df.withColumnRenamed("k", "j"), "k")


def test_fuzzy_match_default_blocking_straddles_bands(spark):
    # "alpha node" vs "alpha nodes": 1 edit, lengths 10 vs 11 — with
    # max_distance=2 the band width is 5, so 10//5=2 and 11//5=2 … force a
    # straddle with lengths 9 and 10 (band 1 vs 2)
    df = spark.createDataFrame(
        [
            (1, "alpha nod"),       # len 9  -> band 1
            (2, "alpha node"),      # len 10 -> band 2, distance 1
            (3, "alpha xyzzy"),     # same first token, distance > 2
            (4, "beta node"),       # different first token: never compared
        ],
        "id long, name string",
    )
    out = fuzzy_match_pairs(
        df, id_col="id", text_col="name", max_distance=2
    )
    pairs = {(r["id_a"], r["id_b"]): r["distance"] for r in out.collect()}
    assert pairs == {(1, 2): 1}


def test_fuzzy_match_explicit_blocks(spark):
    df = spark.createDataFrame(
        [
            (1, "abcd", "g1"),
            (2, "abce", "g1"),
            (3, "abcd", "g2"),  # identical text, other block: not paired
        ],
        "id long, name string, blk string",
    )
    out = fuzzy_match_pairs(
        df, id_col="id", text_col="name", max_distance=1, block_cols=["blk"]
    )
    assert {(r["id_a"], r["id_b"]) for r in out.collect()} == {(1, 2)}


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_r5_plan_shapes(spark):
    """Scale regression guards for the round-5 operators:

    - unpivot_long: pure Expand, NO shuffle/exchange at all;
    - pivot_wide with an explicit value list: no extra distinct job —
      exactly one aggregate pair (partial+final) over one exchange;
    - funnel: the user aggregate is the only wide stage — no Join;
    - skew_join: compiles to an equi hash/sort-merge join, never a
      broadcast-nested-loop, and the right side carries the Expand-style
      replicate (explode) rather than a rescan.
    """
    wide = spark.createDataFrame(
        [("a", 1, 2)], "grp string, x long, y long"
    )
    up = _plan(unpivot_long(wide, "grp", ["x", "y"]))
    assert "Expand" in up
    assert "Exchange" not in up

    df = spark.createDataFrame([("a", "x")], "grp string, kind string")
    pv = _plan(pivot_wide(df, "grp", "kind", ["x", "y"]))
    # the explicit value list compiles to the two-phase pivot aggregate
    # ((grp,kind) partial -> grp pivot) — bounded at 2 exchanges, and the
    # discovery job pivot(col) would otherwise run never appears
    assert pv.count("Exchange") <= 2
    assert "__pivot" in pv

    ev = _events(spark)
    fp = _plan(funnel(ev, ["signup", "view"]))
    assert "Join" not in fp

    left = spark.range(100).select((F.col("id") % 3).alias("k"))
    right = spark.createDataFrame([(0, "a"), (1, "b")], "k long, name string")
    sj = _plan(skew_join(left, right, "k", salt=4))
    assert "BroadcastNestedLoopJoin" not in sj
    assert "CartesianProduct" not in sj
    assert "Join" in sj
    assert "Generate explode" in sj or "Expand" in sj or "explode" in sj


def test_resample_calendar_plan_has_pushdown_free_spine(spark):
    """The spine build must reuse the per-bucket aggregate (self-derived
    min/max), not rescan the raw input: exactly two aggregates total —
    per-bucket and span — plus the spine join."""
    df = spark.createDataFrame(
        [("a", "2025-01-01 05:00:00", 1.0)], "k string, ts string, v double"
    ).withColumn("ts", F.to_timestamp("ts"))
    plan = _plan(
        resample_calendar(df, "ts", group_cols="k", aggs={"n": F.count(F.lit(1))})
    )
    assert "Generate explode" in plan or "explode" in plan


def test_reaggregate_algebraic_merge(spark):
    from knot_another_pipeline_spark.operators.relational import reaggregate

    daily = spark.createDataFrame(
        [
            ("2025-01", "a", 2, 10.0, 1.0, 9.0),
            ("2025-01", "a", 3, 20.0, 0.5, 19.0),
            ("2025-02", "a", 1, 5.0, 5.0, 5.0),
        ],
        "month string, k string, n long, total double, lo double, hi double",
    )
    out = {
        (r["month"], r["k"]): (r["n"], r["total"], r["lo"], r["hi"])
        for r in reaggregate(
            daily,
            ["month", "k"],
            count_cols=["n"],
            sum_cols=["total"],
            min_cols=["lo"],
            max_cols=["hi"],
        ).collect()
    }
    assert out == {
        ("2025-01", "a"): (5, 30.0, 0.5, 19.0),
        ("2025-02", "a"): (1, 5.0, 5.0, 5.0),
    }
    with pytest.raises(ValueError):
        reaggregate(daily, "month")


def test_ntile_assign_deterministic_with_ties(spark):
    from knot_another_pipeline_spark.operators.relational import ntile_assign

    # 5 rows with equal order values: tiebreak decides bucket membership
    df = spark.createDataFrame(
        [(i, 1.0) for i in range(5)], "id long, v double"
    )
    out1 = {
        r["id"]: r["bucket"]
        for r in ntile_assign(df, "v", n=2, tiebreak="id").collect()
    }
    out2 = {
        r["id"]: r["bucket"]
        for r in ntile_assign(df, "v", n=2, tiebreak="id").collect()
    }
    assert out1 == out2
    # first ceil(5/2)=3 ids in bucket 1, remaining 2 in bucket 2
    assert out1 == {0: 1, 1: 1, 2: 1, 3: 2, 4: 2}


def test_normalize_text_canonicalizes_variants(spark):
    from knot_another_pipeline_spark.operators.text_analysis import (
        normalize_documents,
    )

    df = spark.createDataFrame(
        [
            (1, "Hello   World"),
            (2, "hello world"),
            (3, "\x01hello\tworld  "),
            (4, "different text"),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: (r["norm_len"], r["norm_md5"]) for r in
           normalize_documents(df, id_col="doc_id", text_col="text").collect()}
    assert out[1] == out[2] == out[3]  # all collapse to "hello world"
    assert out[1][0] == len("hello world")
    assert out[4] != out[1]


def test_pagerank_uniform_on_cycle_and_mass_conserved(spark):
    from knot_another_pipeline_spark.operators.graph import pagerank

    # 3-cycle: symmetric in/out degree -> rank stays uniform 1/3
    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string"
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(cyc, iterations=4).collect()}
    for v in ranks.values():
        assert abs(v - 1 / 3) < 1e-12
    # symmetric graph (no dangling nodes): total mass conserved at 1
    sym = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")],
        "src string, dst string",
    )
    total = sum(
        r["rank"] for r in pagerank(sym, iterations=3).collect()
    )
    assert abs(total - 1.0) < 1e-9


def test_pagerank_authority_ordering_and_dedup(spark):
    from knot_another_pipeline_spark.operators.graph import pagerank

    # hub: everyone links to 'z'; duplicate edges must not double-vote
    edges = spark.createDataFrame(
        [("a", "z"), ("a", "z"), ("b", "z"), ("c", "z"), ("z", "a")],
        "src string, dst string",
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, iterations=5).collect()}
    assert ranks["z"] > ranks["a"] > ranks["b"]  # a gets z's backlink
    assert abs(ranks["b"] - ranks["c"]) < 1e-12

    dedup_ranks = {
        r["node"]: r["rank"]
        for r in pagerank(edges.distinct(), iterations=5).collect()
    }
    assert ranks == dedup_ranks  # duplicates collapsed before voting


def test_pagerank_zero_iterations_and_checkpoint(spark):
    from knot_another_pipeline_spark.operators.graph import pagerank

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    r0 = {r["node"]: r["rank"] for r in pagerank(edges, iterations=0).collect()}
    assert r0 == {"a": 0.5, "b": 0.5}
    chk = {
        r["node"]: round(r["rank"], 12)
        for r in pagerank(edges, iterations=2, checkpoint_each=True).collect()
    }
    plain = {
        r["node"]: round(r["rank"], 12)
        for r in pagerank(edges, iterations=2).collect()
    }
    assert chk == plain


def test_r5_catalog_scan_pruning(spark):
    """The new catalog queries prune their scans: skew_join reads only
    the three lineitem columns it touches, and json_extract_stats reads
    only (event_type, props) — a full-width scan under either is a
    regression."""
    import re

    from knot_another_pipeline_spark.catalog_queries import (
        q_json_extract_stats,
        q_skew_join,
    )

    sf = "/root/testdata/sf0.001"
    plan = q_skew_join(spark, sf)._jdf.queryExecution().executedPlan().toString()
    li_schemas = [
        s
        for s in re.findall(r"ReadSchema: (struct<[^\n]*>)", plan)
        if "l_" in s
    ]
    assert li_schemas and all(
        s == "struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"
        for s in li_schemas
    ), li_schemas

    p2 = (
        q_json_extract_stats(spark, sf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    s2 = re.findall(r"ReadSchema: (struct<[^\n]*>)", p2)
    assert s2 == ["struct<event_type:string,props:string>"], s2


def test_funnel_conversion_window(spark):
    # u1 converts view->purchase in 1 day; u2 takes 40 days
    rows = [
        (1, "2025-01-01 00:00:00", "signup"),
        (1, "2025-01-02 00:00:00", "view"),
        (2, "2025-01-01 00:00:00", "signup"),
        (2, "2025-02-10 00:00:00", "view"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    unbounded = {r["step"]: r["n_users"] for r in funnel(ev, ["signup", "view"]).collect()}
    assert unbounded == {"signup": 2, "view": 2}
    day_window = {
        r["step"]: r["n_users"]
        for r in funnel(
            ev, ["signup", "view"], max_step_seconds=86400
        ).collect()
    }
    assert day_window == {"signup": 2, "view": 1}  # u2 converted too late


def test_journey_topk_orders_within_session_and_counts(spark):
    from knot_another_pipeline_spark.operators.behavior import journey_topk

    rows = [
        # u1 session: a>b ; u2 session: a>b ; u3 session: b>a
        (1, 1, "2025-01-01 00:00:00", "a"),
        (2, 1, "2025-01-01 00:05:00", "b"),
        (3, 2, "2025-01-01 00:00:00", "a"),
        (4, 2, "2025-01-01 00:10:00", "b"),
        (5, 3, "2025-01-01 00:00:00", "b"),
        (6, 3, "2025-01-01 00:01:00", "a"),
        # u1 second session (gap > 30 min): lone c
        (7, 1, "2025-01-01 02:00:00", "c"),
        # same-ts tie inside u4's session: event_id breaks it -> x>y
        (8, 4, "2025-01-01 00:00:00", "x"),
        (9, 4, "2025-01-01 00:00:00", "y"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["journey"]: r["n_sessions"] for r in journey_topk(ev, k=10).collect()}
    assert out == {"a>b": 2, "b>a": 1, "c": 1, "x>y": 1}


def test_journey_topk_max_steps_truncates(spark):
    from knot_another_pipeline_spark.operators.behavior import journey_topk

    rows = [
        (i, 1, f"2025-01-01 00:{i:02d}:00", chr(ord("a") + i)) for i in range(5)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = journey_topk(ev, max_steps=3, k=5).collect()
    assert [r["journey"] for r in out] == ["a>b>c"]
