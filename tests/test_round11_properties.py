"""Property-based tests for the round-11 operators: growth-accounting
ledger identities, Lorenz-curve monotonicity, Herfindahl bounds, Theil
decomposition, and RBO against a brute-force prefix-overlap reference
— each on arbitrary inputs."""

from __future__ import annotations

import datetime as dt
import math

from hypothesis import given, settings, strategies as st

# ---------------------------------------------------------------------------
# growth_accounting: mau = new + retained + resurrected on ANY history
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 5), st.integers(0, 8)),  # (user, month)
        min_size=1,
        max_size=30,
    )
)
def test_growth_ledger_identity(spark, visits):
    from knot_another_pipeline_spark.operators.behavior import (
        growth_accounting,
    )

    rows = [
        (u, dt.datetime(2024, 1, 15) + dt.timedelta(days=31 * m))
        for u, m in visits
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = growth_accounting(df).collect()
    months = {}
    for u, m in visits:
        mon = (dt.datetime(2024, 1, 15) + dt.timedelta(days=31 * m))
        months.setdefault((mon.year, mon.month), set()).add(u)
    prev_actives: set = set()
    ordered = sorted(months)
    seen: set = set()
    prev_key = None
    for r in out:
        key = (r["month"].year, r["month"].month)
        actives = months[key]
        assert r["mau"] == len(actives)
        assert r["mau"] == r["n_new"] + r["n_retained"] + r["n_resurrected"]
        new_ref = len(actives - seen)
        assert r["n_new"] == new_ref
        # retained vs the previous CALENDAR month only
        if prev_key is not None and _next_month(prev_key) == key:
            assert r["n_retained"] == len(actives & prev_actives)
            assert r["n_churned"] == len(prev_actives - actives)
        seen |= actives
        prev_actives = actives
        prev_key = key
    assert [
        (r["month"].year, r["month"].month) for r in out
    ] == ordered


def _next_month(key):
    y, m = key
    return (y + (m == 12), m % 12 + 1)


# ---------------------------------------------------------------------------
# lorenz_curve: cum_share is monotone, ends at 1, below the diagonal
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(0, 100), min_size=3, max_size=40).filter(
        lambda v: sum(v) > 0
    )
)
def test_lorenz_monotone_below_diagonal(spark, vals):
    from knot_another_pipeline_spark.operators.quality import lorenz_curve

    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, v double"
    )
    out = lorenz_curve(df, value_col="v", id_col="id", n_points=4).collect()
    shares = [r["cum_share"] for r in out]
    assert shares == sorted(shares)
    assert shares[-1] == 1.0
    n = len(vals)
    counts = [r["n"] for r in out]
    assert sum(counts) == n
    # ascending-value buckets: cumulative share never exceeds the
    # cumulative POPULATION share (Lorenz curves sit under the diagonal)
    cum_n = 0
    for r in out:
        cum_n += r["n"]
        assert r["cum_share"] <= cum_n / n + 1e-6


# ---------------------------------------------------------------------------
# herfindahl: 1/n_firms <= hhi <= 1, effective_firms <= n_firms
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 6), st.integers(1, 50)),  # (firm, value)
        min_size=1,
        max_size=25,
    )
)
def test_herfindahl_bounds(spark, rows):
    from knot_another_pipeline_spark.operators.relational import (
        herfindahl_index,
    )

    df = spark.createDataFrame(
        [("m", f"f{f}", float(v)) for f, v in rows],
        "mkt string, firm string, v double",
    )
    r = herfindahl_index(
        df, market_cols=["mkt"], firm_col="firm", value_col="v"
    ).collect()[0]
    n = r["n_firms"]
    assert 1.0 / n - 1e-6 <= r["hhi"] <= 1.0 + 1e-6
    assert r["effective_firms"] <= n + 1e-6
    totals = {}
    for f, v in rows:
        totals[f] = totals.get(f, 0) + v
    tot = sum(totals.values())
    ref = sum((v / tot) ** 2 for v in totals.values())
    assert r["hhi"] == round(ref, 6) or abs(r["hhi"] - ref) < 2e-6


# ---------------------------------------------------------------------------
# theil: total = between + within, all >= 0, zero for equal values
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(1, 40)),  # (group, value)
        min_size=2,
        max_size=30,
    )
)
def test_theil_nonnegative_decomposition(spark, rows):
    from knot_another_pipeline_spark.operators.quality import theil_index

    df = spark.createDataFrame(
        [(f"g{g}", float(v)) for g, v in rows], "g string, v double"
    )
    r = theil_index(df, group_cols=["g"], value_col="v").collect()[0]
    assert r["theil_total"] >= -1e-6
    assert r["theil_between"] >= -1e-6
    assert r["theil_within"] >= -1e-6
    assert r["theil_total"] == (
        round(r["theil_between"] + r["theil_within"], 6)
    ) or abs(
        r["theil_total"] - r["theil_between"] - r["theil_within"]
    ) < 3e-6
    xs = [float(v) for _, v in rows]
    mu = sum(xs) / len(xs)
    ref = sum(x / mu * math.log(x / mu) for x in xs) / len(xs)
    assert abs(r["theil_total"] - ref) < 2e-6


# ---------------------------------------------------------------------------
# rank_biased_overlap ≡ brute-force prefix overlap sum
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None)
@given(st.permutations(list(range(8))), st.permutations(list(range(8))))
def test_rbo_matches_bruteforce(spark, pa, pb):
    from knot_another_pipeline_spark.operators.evaluation import (
        rank_biased_overlap,
    )

    k, p = 6, 0.85
    a = [f"i{x}" for x in pa]
    b = [f"i{x}" for x in pb]
    ra = spark.createDataFrame(
        [(it, i + 1) for i, it in enumerate(a)], "item string, rank int"
    )
    rb = spark.createDataFrame(
        [(it, i + 1) for i, it in enumerate(b)], "item string, rank int"
    )
    row = rank_biased_overlap(ra, rb, k=k, p=p).collect()[0]
    ref = 0.0
    for d in range(1, k + 1):
        ref += (p ** d) * len(set(a[:d]) & set(b[:d])) / d
    ref *= (1 - p) / p
    assert abs(row["rbo"] - ref) < 1e-6
    assert 0.0 <= row["rbo"] <= 1.0 + 1e-9
