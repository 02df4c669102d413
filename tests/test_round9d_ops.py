"""Round-9 late additions, batch d: the four TPC-H plan shapes that
completed the classic 22 (Q6 forecast_revenue, Q10 returned_revenue,
Q12-adapted priority_linestatus, Q14 promo_revenue) — each checked
against an in-Python brute force on random data, plus the plan claims
their docstrings make (pushed filters, one fact pass, no global sort).
"""

from __future__ import annotations

import random
import re
from collections import defaultdict
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from knot_another_pipeline_spark.operators.relational import (
    forecast_revenue,
    priority_linestatus,
    promo_revenue,
    returned_revenue,
)


def _rand_lineitem(rng, n, n_orders, n_parts=20):
    rows = []
    for i in range(n):
        rows.append(
            (
                rng.randrange(n_orders),
                rng.randrange(n_parts),
                float(rng.randrange(1, 50)),
                round(rng.uniform(10.0, 2000.0), 2),
                round(rng.choice([0.0, 0.03, 0.05, 0.06, 0.07, 0.1]), 2),
                rng.choice(["A", "N", "R"]),
                rng.choice(["O", "F"]),
                f"199{rng.randrange(5, 8)}-"
                f"{rng.randrange(1, 13):02d}-{rng.randrange(1, 28):02d}",
            )
        )
    return rows


LINE_SCHEMA = (
    "l_orderkey bigint, l_partkey bigint, l_quantity double, "
    "l_extendedprice double, l_discount double, l_returnflag string, "
    "l_linestatus string, l_shipdate string"
)


def _line_df(spark, rows):
    return spark.createDataFrame(rows, LINE_SCHEMA).withColumn(
        "l_shipdate", F.to_timestamp("l_shipdate")
    )


# ---------------------------------------------------------------------------
# forecast_revenue (Q6)


def test_forecast_revenue_matches_bruteforce(spark):
    rng = random.Random(11)
    rows = _rand_lineitem(rng, 800, 200)
    out = forecast_revenue(
        _line_df(spark, rows),
        start="1996-01-01",
        end="1997-01-01",
        discount_lo=0.05,
        discount_hi=0.07,
        max_qty=24.0,
    ).collect()
    expect = sum(
        price * disc
        for (_, _, qty, price, disc, _, _, ship) in rows
        if "1996-01-01" <= ship < "1997-01-01"
        and 0.05 <= disc <= 0.07
        and qty < 24
    )
    assert len(out) == 1
    assert out[0]["forecast_revenue"] == pytest.approx(expect, abs=0.01)


def test_forecast_revenue_empty_window_is_null(spark):
    rows = _rand_lineitem(random.Random(1), 50, 20)
    out = forecast_revenue(
        _line_df(spark, rows), start="2050-01-01", end="2051-01-01"
    ).collect()
    assert len(out) == 1 and out[0]["forecast_revenue"] is None


def test_forecast_revenue_plan_is_scan_filter_agg(spark, tmp_path):
    """Q6's entire point: every predicate lands in PushedFilters, no
    join exists, and the only exchange is the 1-row agg merge."""
    rows = _rand_lineitem(random.Random(2), 100, 30)
    _line_df(spark, rows).write.parquet(str(tmp_path / "lineitem"))
    df = forecast_revenue(spark.read.parquet(str(tmp_path / "lineitem")))
    qe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    simple = qe.explainString(mode.fromString("simple"))
    formatted = qe.explainString(mode.fromString("formatted"))
    assert "Join" not in simple, simple
    assert "GreaterThanOrEqual(l_shipdate" in formatted
    assert "GreaterThanOrEqual(l_discount,0.05)" in formatted
    assert "LessThanOrEqual(l_discount,0.07)" in formatted
    assert "LessThan(l_quantity,24.0)" in formatted
    shuffles = len(re.findall(r"(?<![A-Za-z])Exchange ", simple))
    single = len(re.findall(r"(?<![A-Za-z])Exchange SinglePartition", simple))
    assert shuffles == single == 1, simple
    # column pruning: the scan reads only the three referenced columns
    m = re.search(r"ReadSchema: struct<([^>]*)>", formatted)
    assert m is not None
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert read_cols == {"l_shipdate", "l_discount", "l_quantity",
                         "l_extendedprice"}


# ---------------------------------------------------------------------------
# returned_revenue (Q10)


def test_returned_revenue_matches_bruteforce(spark):
    rng = random.Random(13)
    n_cust, n_orders = 30, 120
    lines = _rand_lineitem(rng, 600, n_orders)
    orders = [
        (
            o,
            rng.randrange(n_cust),
            f"1996-{rng.randrange(1, 13):02d}-{rng.randrange(1, 28):02d}",
        )
        for o in range(n_orders)
    ]
    custs = [
        (c, f"Customer#{c}", round(rng.uniform(-900, 9000), 2), c % 5)
        for c in range(n_cust)
    ]
    nations = [(k, f"NATION_{k}") for k in range(5)]

    odf = spark.createDataFrame(
        orders, "o_orderkey bigint, o_custkey bigint, o_orderdate string"
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    cdf = spark.createDataFrame(
        custs, "c_custkey bigint, c_name string, c_acctbal double, "
        "c_nationkey bigint"
    )
    ndf = spark.createDataFrame(nations, "n_nationkey bigint, n_name string")
    got = returned_revenue(
        cdf, odf, _line_df(spark, lines), ndf,
        start="1996-01-01", end="1996-04-01", k=10,
    ).collect()

    o_cust = {o: (c, d) for o, c, d in orders}
    rev = defaultdict(Decimal)
    for (ok, _, _, price, disc, flag, _, _) in lines:
        c, d = o_cust[ok]
        if flag == "R" and "1996-01-01" <= d < "1996-04-01":
            rev[c] += Decimal(str(price * (1 - disc))).quantize(
                Decimal("0.0001")
            )
    expect = sorted(
        ((float(round(v, 2)), c) for c, v in rev.items()),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    assert [(r["revenue"], r["c_custkey"]) for r in got] == [
        (pytest.approx(v, abs=0.005), c) for v, c in expect
    ]
    by_key = {c: (f"Customer#{c}", f"NATION_{c % 5}") for c in range(n_cust)}
    for r in got:
        name, nation = by_key[r["c_custkey"]]
        assert r["c_name"] == name and r["n_name"] == nation


def test_returned_revenue_no_returned_lines_is_empty(spark):
    lines = [
        (0, 0, 5.0, 100.0, 0.0, "N", "O", "1996-02-01"),
    ]
    odf = spark.createDataFrame(
        [(0, 0, "1996-02-01")],
        "o_orderkey bigint, o_custkey bigint, o_orderdate string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    cdf = spark.createDataFrame(
        [(0, "c0", 1.0, 0)],
        "c_custkey bigint, c_name string, c_acctbal double, "
        "c_nationkey bigint",
    )
    ndf = spark.createDataFrame([(0, "N0")], "n_nationkey bigint, n_name string")
    assert (
        returned_revenue(cdf, odf, _line_df(spark, lines), ndf).count() == 0
    )


def test_returned_revenue_plan_claims(spark, tmp_path):
    """The returnflag and order-date filters are scan-pushed, revenue
    aggregates to custkey BEFORE customer attaches, nation broadcasts,
    and the top-k is TakeOrderedAndProject."""
    base = str(tmp_path)
    rng = random.Random(3)
    _line_df(spark, _rand_lineitem(rng, 200, 50)).write.parquet(
        base + "/lineitem"
    )
    spark.createDataFrame(
        [(o, o % 10, "1996-02-01") for o in range(50)],
        "o_orderkey bigint, o_custkey bigint, o_orderdate string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate")).write.parquet(
        base + "/orders"
    )
    spark.createDataFrame(
        [(c, f"c{c}", 0.0, 0) for c in range(10)],
        "c_custkey bigint, c_name string, c_acctbal double, "
        "c_nationkey bigint",
    ).write.parquet(base + "/customer")
    spark.createDataFrame(
        [(0, "N0")], "n_nationkey bigint, n_name string"
    ).write.parquet(base + "/nation")
    rd = lambda t: spark.read.parquet(f"{base}/{t}")
    df = returned_revenue(
        rd("customer"), rd("orders"), rd("lineitem"), rd("nation")
    )
    qe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    simple = qe.explainString(mode.fromString("simple"))
    formatted = qe.explainString(mode.fromString("formatted"))
    assert "TakeOrderedAndProject" in simple
    assert "EqualTo(l_returnflag,R)" in formatted
    assert "GreaterThanOrEqual(o_orderdate" in formatted
    # the custkey join consumes the AGGREGATED side: revenue is grouped
    # to o_custkey granularity (the group key survives as-is in the
    # plan), never to a post-join (custkey, name, acctbal, ...) key
    assert "HashAggregate(keys=[o_custkey" in simple, simple
    assert "c_name" not in re.search(
        r"HashAggregate\(keys=\[o_custkey[^\n]*", simple
    ).group(0)
    assert simple.count("BroadcastExchange") >= 1  # nation (at least)


# ---------------------------------------------------------------------------
# priority_linestatus (Q12 shape)


def test_priority_linestatus_matches_bruteforce(spark):
    rng = random.Random(17)
    n_orders = 80
    lines = _rand_lineitem(rng, 400, n_orders)
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    orders = [(o, rng.choice(prios)) for o in range(n_orders)]
    odf = spark.createDataFrame(
        orders, "o_orderkey bigint, o_orderpriority string"
    )
    got = {
        r["l_linestatus"]: (r["high_line_count"], r["low_line_count"])
        for r in priority_linestatus(
            odf, _line_df(spark, lines),
            start="1996-01-01", end="1997-01-01",
        ).collect()
    }
    prio_of = dict(orders)
    expect = defaultdict(lambda: [0, 0])
    for (ok, _, _, _, _, _, status, ship) in lines:
        if "1996-01-01" <= ship < "1997-01-01":
            hi = prio_of[ok] in ("1-URGENT", "2-HIGH")
            expect[status][0 if hi else 1] += 1
    assert got == {k: tuple(v) for k, v in expect.items()}


def test_priority_linestatus_ordered_by_status(spark):
    lines = [
        (0, 0, 1.0, 1.0, 0.0, "N", "O", "1996-06-01"),
        (1, 0, 1.0, 1.0, 0.0, "N", "F", "1996-06-01"),
    ]
    odf = spark.createDataFrame(
        [(0, "1-URGENT"), (1, "5-LOW")],
        "o_orderkey bigint, o_orderpriority string",
    )
    got = priority_linestatus(odf, _line_df(spark, lines)).collect()
    assert [r["l_linestatus"] for r in got] == ["F", "O"]
    assert (got[0]["high_line_count"], got[0]["low_line_count"]) == (0, 1)
    assert (got[1]["high_line_count"], got[1]["low_line_count"]) == (1, 0)


# ---------------------------------------------------------------------------
# promo_revenue (Q14)


def test_promo_revenue_matches_bruteforce(spark):
    rng = random.Random(19)
    n_parts = 25
    lines = _rand_lineitem(rng, 500, 100, n_parts=n_parts)
    types = ["PROMO", "ECONOMY", "STANDARD"]
    parts = [(p, rng.choice(types)) for p in range(n_parts)]
    pdf = spark.createDataFrame(parts, "p_partkey bigint, p_type string")
    got = promo_revenue(
        _line_df(spark, lines), pdf, start="1996-01-01", end="1997-01-01"
    ).collect()[0]
    type_of = dict(parts)
    promo = total = 0.0
    for (_, pk, _, price, disc, _, _, ship) in lines:
        if "1996-01-01" <= ship < "1997-01-01":
            rev = price * (1 - disc)
            total += rev
            if type_of[pk] == "PROMO":
                promo += rev
    assert got["total_revenue"] == pytest.approx(total, abs=0.01)
    assert got["promo_pct"] == pytest.approx(100 * promo / total, abs=1e-3)


def test_promo_revenue_single_fact_pass_no_fact_shuffle(spark, tmp_path):
    """Q14's claim: one lineitem scan, part broadcast, and the only
    exchange is the 1-row agg merge — the fact table never shuffles."""
    base = str(tmp_path)
    _line_df(
        spark, _rand_lineitem(random.Random(5), 100, 30, n_parts=10)
    ).write.parquet(base + "/lineitem")
    spark.createDataFrame(
        [(p, "PROMO" if p % 2 else "ECONOMY") for p in range(10)],
        "p_partkey bigint, p_type string",
    ).write.parquet(base + "/part")
    df = promo_revenue(
        spark.read.parquet(base + "/lineitem"),
        spark.read.parquet(base + "/part"),
        start="1996-01-01",
        end="1997-01-01",
    )
    simple = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    # exactly one fact scan (the tmp-path FileScan line is identified
    # by its fact columns, not the path, which explain elides)
    assert len(re.findall(r"FileScan parquet[^\n]*l_partkey", simple)) == 1
    assert "BroadcastExchange" in simple
    shuffles = len(re.findall(r"(?<![A-Za-z])Exchange ", simple))
    single = len(re.findall(r"(?<![A-Za-z])Exchange SinglePartition", simple))
    assert shuffles == single == 1, simple
