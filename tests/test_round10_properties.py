"""Property-based tests for the round-10 operators: Wilcoxon
signed-rank, Page–Hinkley, Anderson–Darling, Mantel–Haenszel, and
Krippendorff's alpha — each checked against an independent brute-force
Python reference on arbitrary inputs."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings, strategies as st

# ---------------------------------------------------------------------------
# wilcoxon_signed_rank ≡ brute-force midranks on |d|
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-4, 4), st.integers(-4, 4)),
        min_size=1,
        max_size=25,
    )
)
def test_wilcoxon_matches_bruteforce(spark, pairs):
    from knot_another_pipeline_spark.operators.quality import (
        wilcoxon_signed_rank,
    )

    rows = [("g", float(a), float(b)) for a, b in pairs]
    df = spark.createDataFrame(rows, "grp string, a double, b double")
    out = wilcoxon_signed_rank(
        df, group_cols=["grp"], a_col="a", b_col="b"
    ).collect()
    ds = [a - b for a, b in pairs]
    nz = [d for d in ds if d != 0]
    if not nz:
        # every diff zero: the family still emits a degenerate row
        # (n_pairs=0, NULL z) — families must never vanish
        assert len(out) == 1
        assert out[0]["n_pairs"] == 0
        assert out[0]["n_zero"] == len(ds)
        assert out[0]["w_plus"] == 0.0
        assert out[0]["z"] is None
        return
    r = out[0]
    ads = sorted(abs(d) for d in nz)
    rank_of = {}
    for v in set(ads):
        lo = sum(1 for x in ads if x < v)
        eq = sum(1 for x in ads if x == v)
        rank_of[v] = lo + (eq + 1) / 2.0
    wp = sum(rank_of[abs(d)] for d in nz if d > 0)
    n = len(nz)
    tie3 = sum(t**3 - t for t in Counter(abs(d) for d in nz).values())
    var_w = n * (n + 1) * (2 * n + 1) / 24.0 - tie3 / 48.0
    assert r["n_pairs"] == n
    assert r["n_zero"] == len(ds) - n
    assert r["w_plus"] == round(wp, 6)
    if var_w > 0:
        z = (wp - n * (n + 1) / 4.0) / math.sqrt(var_w)
        assert abs(r["z"] - z) < 1e-6
    else:
        assert r["z"] is None


# ---------------------------------------------------------------------------
# page_hinkley ≡ the sequential reference recurrence
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.floats(-50, 50, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=40,
    ),
    st.floats(0.5, 5.0),
)
def test_page_hinkley_matches_recurrence(spark, xs, lam):
    from knot_another_pipeline_spark.operators.temporal import page_hinkley

    df = spark.createDataFrame(
        [("s", i, float(x)) for i, x in enumerate(xs)],
        "series string, ord int, x double",
    )
    r = page_hinkley(
        df, series_col="series", order_col="ord", value_col="x", lam=lam
    ).collect()[0]
    m, mn, run = 0.0, 0.0, 0.0
    ph = []
    for i, x in enumerate(xs, start=1):
        run += x
        m += x - run / i
        mn = min(mn, m)
        ph.append(m - mn)
    assert r["n"] == len(xs)
    assert abs(r["max_ph"] - round(max(ph), 6)) < 1e-5
    assert r["n_alarms"] == sum(1 for v in ph if v > lam)
    assert r["drift"] is (max(ph) > lam)


# ---------------------------------------------------------------------------
# anderson_darling ≡ Pettitt's rank formula, brute force
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(0, 6), min_size=1, max_size=20),
    st.lists(st.integers(0, 6), min_size=1, max_size=20),
)
def test_anderson_darling_matches_bruteforce(spark, xs, ys):
    from knot_another_pipeline_spark.operators.quality import (
        anderson_darling,
    )

    rows = [("g", float(v), 1) for v in xs] + [
        ("g", float(v), 0) for v in ys
    ]
    df = spark.createDataFrame(rows, "grp string, v double, y int")
    r = anderson_darling(
        df, group_cols=["grp"], value_col="v", class_col="y"
    ).collect()[0]
    pooled = sorted(
        [(float(v), 1) for v in xs] + [(float(v), 0) for v in ys],
        key=lambda t: (t[0], -t[1]),
    )
    n, m = len(xs), len(ys)
    nn = n + m
    mi, s = 0, 0.0
    for i, (_, y) in enumerate(pooled[:-1], start=1):
        mi += y
        s += (mi * nn - n * i) ** 2 / (i * (nn - i))
    assert r["n1"] == n and r["n0"] == m
    assert abs(r["ad_stat"] - s / (n * m)) < 1e-6


# ---------------------------------------------------------------------------
# mantel_haenszel ≡ the stratified 2x2 sums
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 6),
            st.integers(1, 6),
            st.integers(1, 6),
            st.integers(1, 6),
        ),
        min_size=1,
        max_size=4,
    )
)
def test_mantel_haenszel_matches_sums(spark, strata):
    from knot_another_pipeline_spark.operators.evaluation import (
        mantel_haenszel,
    )

    rows = []
    for s, (a, b, c, d) in enumerate(strata):
        rows += [(f"s{s}", True, True)] * a
        rows += [(f"s{s}", True, False)] * b
        rows += [(f"s{s}", False, True)] * c
        rows += [(f"s{s}", False, False)] * d
    df = spark.createDataFrame(
        rows, "stratum string, e boolean, o boolean"
    )
    r = mantel_haenszel(
        df, stratum_col="stratum", exposure_col="e", outcome_col="o"
    ).collect()[0]
    sad = sum(a * d / (a + b + c + d) for a, b, c, d in strata)
    sbc = sum(b * c / (a + b + c + d) for a, b, c, d in strata)
    assert r["n_strata"] == len(strata)
    assert abs(r["or_mh"] - sad / sbc) < 1e-6


# ---------------------------------------------------------------------------
# krippendorff_alpha ≡ the coincidence-count reference
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=5),
        min_size=1,
        max_size=10,
    )
)
def test_krippendorff_matches_reference(spark, units):
    from knot_another_pipeline_spark.operators.quality import (
        krippendorff_alpha,
    )

    rows = [(i, c) for i, u in enumerate(units) for c in u]
    df = spark.createDataFrame(rows, "unit long, label string")
    out = krippendorff_alpha(
        df, unit_col="unit", value_col="label"
    ).collect()
    pairable = [u for u in units if len(u) >= 2]
    if not pairable:
        # the pairable join empties the aggregate input: count/sum
        # aggregates still emit one row with 0 units and NULL alpha
        assert out[0]["n_units"] == 0
        assert out[0]["alpha"] is None
        return
    r = out[0]
    ntot = sum(len(u) for u in pairable)
    cats = sorted({c for u in pairable for c in u})
    don = sum(
        u.count(c) * (len(u) - u.count(c)) / (len(u) - 1)
        for u in pairable
        for c in cats
    )
    d_o = don / ntot
    nc = {c: sum(u.count(c) for u in pairable) for c in cats}
    d_e = (ntot * ntot - sum(v * v for v in nc.values())) / (
        ntot * (ntot - 1)
    )
    assert r["n_units"] == len(pairable)
    assert r["n_ratings"] == ntot
    if d_e > 0:
        assert abs(r["alpha"] - (1 - d_o / d_e)) < 1e-6
    else:
        assert r["alpha"] is None
