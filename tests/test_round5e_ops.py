"""Round-5 continuation: Markov transition matrices, Kaplan-Meier
survival curves, OLS trend fitting, CUSUM change-point detection, and
market-basket association rules.

Each operator is checked against hand-computed (or brute-force Python)
references; the DuckDB oracle parity runs in test_catalog_oracle.py.
"""

from __future__ import annotations

import math
import random

import pytest

from knot_another_pipeline_spark.operators.behavior import (
    markov_transitions,
    survival_curve,
)
from knot_another_pipeline_spark.operators.relational import basket_rules
from knot_another_pipeline_spark.operators.temporal import cusum_alarm, trend_fit


# ---------------------------------------------------------------------------
# markov_transitions
# ---------------------------------------------------------------------------


def test_markov_probs_row_normalize(spark):
    # user 1: a b a b a   -> a>b x2, b>a x2
    # user 2: a a c       -> a>a x1, a>c x1
    rows = [
        (1, i, s) for i, s in enumerate(["a", "b", "a", "b", "a"])
    ] + [(2, i, s) for i, s in enumerate(["a", "a", "c"])]
    df = spark.createDataFrame(rows, ["uid", "t", "state"])
    out = {
        (r["src"], r["dst"]): r
        for r in markov_transitions(
            df, entity_col="uid", order_col="t", state_col="state"
        ).collect()
    }
    assert out[("a", "b")]["n"] == 2 and out[("a", "b")]["prob"] == 0.5
    assert out[("a", "a")]["n"] == 1 and out[("a", "a")]["prob"] == 0.25
    assert out[("a", "c")]["prob"] == 0.25
    assert out[("b", "a")]["n"] == 2 and out[("b", "a")]["prob"] == 1.0
    # no transition leaves user boundaries: c is terminal, never a src
    assert not any(src == "c" for src, _ in out)


def test_markov_tiebreak_makes_ties_deterministic(spark):
    # two events at the same timestamp: tiebreak id orders them
    rows = [(1, 10, 1, "a"), (1, 10, 2, "b"), (1, 11, 3, "c")]
    df = spark.createDataFrame(rows, ["uid", "t", "eid", "state"])
    out = {
        (r["src"], r["dst"])
        for r in markov_transitions(
            df,
            entity_col="uid",
            order_col="t",
            state_col="state",
            tiebreak_col="eid",
        ).collect()
    }
    assert out == {("a", "b"), ("b", "c")}


# ---------------------------------------------------------------------------
# survival_curve
# ---------------------------------------------------------------------------


def test_km_textbook_example(spark):
    # Classic KM worked example: events at t=1 (2 die of 10), t=3
    # (1 dies of 7 after 1 censored at 2); censor at 2 and 5.
    subjects = (
        [("g", 1.0, 1)] * 2
        + [("g", 2.0, 0)]
        + [("g", 3.0, 1)]
        + [("g", 5.0, 0)] * 6
    )
    df = spark.createDataFrame(subjects, ["grp", "dur", "ev"])
    out = {
        r["duration"]: r
        for r in survival_curve(
            df, group_col="grp", duration_col="dur", event_col="ev"
        ).collect()
    }
    # steps only at event times
    assert set(out) == {1.0, 3.0}
    assert out[1.0]["at_risk"] == 10 and out[1.0]["events"] == 2
    assert out[1.0]["survival"] == round(8 / 10, 6)
    assert out[3.0]["at_risk"] == 7 and out[3.0]["events"] == 1
    assert out[3.0]["survival"] == round((8 / 10) * (6 / 7), 6)


def test_km_survival_hits_zero_when_all_die(spark):
    df = spark.createDataFrame(
        [("g", 1.0, 1), ("g", 2.0, 1)], ["grp", "dur", "ev"]
    )
    out = {
        r["duration"]: r["survival"]
        for r in survival_curve(
            df, group_col="grp", duration_col="dur", event_col="ev"
        ).collect()
    }
    assert out[1.0] == 0.5
    assert out[2.0] == 0.0  # d == n at the last step: no ln(0) NULL leak


def test_km_matches_bruteforce(spark):
    rng = random.Random(5)
    subjects = [
        (f"g{rng.randrange(2)}", float(rng.randrange(1, 8)), rng.randrange(2))
        for _ in range(200)
    ]
    df = spark.createDataFrame(subjects, ["grp", "dur", "ev"])
    got = {
        (r["group"], r["duration"]): r["survival"]
        for r in survival_curve(
            df, group_col="grp", duration_col="dur", event_col="ev"
        ).collect()
    }
    for grp in ("g0", "g1"):
        rows = [(t, e) for g, t, e in subjects if g == grp]
        times = sorted({t for t, _ in rows})
        n = len(rows)
        s = 1.0
        for t in times:
            d = sum(1 for tt, e in rows if tt == t and e == 1)
            c = sum(1 for tt, e in rows if tt == t and e == 0)
            if d > 0:
                s *= 1.0 - d / n
                assert math.isclose(got[(grp, t)], s, abs_tol=1e-5), (grp, t)
            n -= d + c


# ---------------------------------------------------------------------------
# trend_fit
# ---------------------------------------------------------------------------


def test_trend_perfect_line(spark):
    df = spark.createDataFrame(
        [("s", float(x), 2.0 * x + 1.0) for x in range(10)]
        + [("flat", float(x), 7.0) for x in range(5)],
        ["series", "x", "y"],
    )
    out = {
        r["series"]: r
        for r in trend_fit(
            df, group_cols=["series"], x_col="x", y_col="y"
        ).collect()
    }
    assert out["s"]["slope"] == 2.0
    assert out["s"]["intercept"] == 1.0
    assert out["s"]["r2"] == 1.0
    # zero y-variance: slope 0, r2 NULL (not a division error)
    assert out["flat"]["slope"] == 0.0
    assert out["flat"]["intercept"] == 7.0
    assert out["flat"]["r2"] is None


def test_trend_degenerate_single_point(spark):
    df = spark.createDataFrame([("s", 1.0, 5.0)], ["series", "x", "y"])
    row = trend_fit(
        df, group_cols=["series"], x_col="x", y_col="y"
    ).collect()[0]
    assert row["n"] == 1
    assert row["slope"] is None and row["r2"] is None


# ---------------------------------------------------------------------------
# cusum_alarm
# ---------------------------------------------------------------------------


def _cusum_reference(values, k, h, round_to=6):
    """Iterative textbook recursion (the operator computes it closed-form)."""
    n = len(values)
    mu = sum(values) / n
    var = sum((v - mu) ** 2 for v in values) / (n - 1) if n > 1 else 0.0
    sd = math.sqrt(var)
    zs = [round((v - mu) / sd, round_to) if sd > 0 else 0.0 for v in values]
    out = []
    c_hi = c_lo = 0.0
    m_hi = m_lo = 0.0  # running min of the UNCLIPPED cumsums
    r_hi = r_lo = 0.0
    for z in zs:
        r_hi = round(r_hi + z - k, round_to)
        r_lo = round(r_lo - z - k, round_to)
        m_hi = min(m_hi, r_hi)
        m_lo = min(m_lo, r_lo)
        s_hi = round(r_hi - min(0.0, m_hi), round_to)
        s_lo = round(r_lo - min(0.0, m_lo), round_to)
        out.append((s_hi, s_lo, s_hi > h or s_lo > h))
    return out


def test_cusum_detects_level_shift_not_single_spike(spark):
    # 20 flat points, then a persistent +1.5 shift: CUSUM accumulates.
    base = [10.0] * 20 + [11.5] * 10
    df = spark.createDataFrame(
        [("s", i, v) for i, v in enumerate(base)], ["series", "t", "v"]
    )
    rows = sorted(
        cusum_alarm(
            df, series_col="series", order_col="t", value_col="v",
            k=0.5, h=4.0,
        ).collect(),
        key=lambda r: r["t"],
    )
    # monotone accumulation after the shift, alarm before the end
    assert not rows[5]["alarm"]
    assert rows[-1]["alarm"]
    shift_vals = [r["s_hi"] for r in rows[20:]]
    assert shift_vals == sorted(shift_vals)


def test_cusum_closed_form_equals_recursion(spark):
    rng = random.Random(11)
    vals = [rng.gauss(50.0, 5.0) for _ in range(40)]
    df = spark.createDataFrame(
        [("s", i, v) for i, v in enumerate(vals)], ["series", "t", "v"]
    )
    got = sorted(
        cusum_alarm(
            df, series_col="series", order_col="t", value_col="v",
            k=0.25, h=3.0,
        ).collect(),
        key=lambda r: r["t"],
    )
    ref = _cusum_reference(vals, k=0.25, h=3.0)
    for r, (s_hi, s_lo, alarm) in zip(got, ref):
        assert math.isclose(r["s_hi"], s_hi, abs_tol=1e-4), r["t"]
        assert math.isclose(r["s_lo"], s_lo, abs_tol=1e-4), r["t"]
        assert r["alarm"] == alarm


# ---------------------------------------------------------------------------
# basket_rules
# ---------------------------------------------------------------------------


def test_basket_rules_metrics_by_hand(spark):
    # baskets: {x,y}, {x,y}, {x,z}, {y}  -> N=4, n(x)=3, n(y)=3, n(z)=1
    rows = [
        (1, "x"), (1, "y"),
        (2, "x"), (2, "y"),
        (3, "x"), (3, "z"),
        (4, "y"),
    ]
    df = spark.createDataFrame(rows, ["basket", "item"])
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in basket_rules(
            df, basket_col="basket", item_col="item"
        ).collect()
    }
    xy = out[("x", "y")]
    assert xy["pair_n"] == 2
    assert xy["support"] == 0.5                 # 2/4
    assert xy["confidence"] == round(2 / 3, 6)  # P(y|x)
    assert xy["lift"] == round((2 * 4) / (3 * 3), 6)
    # both directions present with per-antecedent confidence
    assert out[("y", "x")]["confidence"] == round(2 / 3, 6)
    assert out[("z", "x")]["confidence"] == 1.0
    # duplicate item rows in one basket count once (presence semantics)
    df2 = spark.createDataFrame(rows + [(1, "x"), (1, "x")], ["basket", "item"])
    out2 = {
        (r["antecedent"], r["consequent"]): r["pair_n"]
        for r in basket_rules(
            df2, basket_col="basket", item_col="item"
        ).collect()
    }
    assert out2[("x", "y")] == 2


def test_basket_rules_mega_basket_guard(spark):
    # a degenerate basket larger than the cap is dropped entirely
    rows = [(99, f"i{j}") for j in range(10)] + [(1, "a"), (1, "b"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, ["basket", "item"])
    out = basket_rules(
        df, basket_col="basket", item_col="item", max_basket_size=5
    ).collect()
    items = {r["antecedent"] for r in out}
    assert items == {"a", "b"}
    # N counts only surviving baskets
    ab = next(r for r in out if (r["antecedent"], r["consequent"]) == ("a", "b"))
    assert ab["support"] == 1.0


# ---------------------------------------------------------------------------
# spearman_corr
# ---------------------------------------------------------------------------


def test_spearman_monotone_and_ties(spark):
    from knot_another_pipeline_spark.operators.quality import spearman_corr

    rows = (
        # g1: y = x^3 (monotone, nonlinear) -> rho exactly 1
        [("g1", float(x), float(x) ** 3) for x in range(1, 8)]
        # g2: reversed -> rho exactly -1
        + [("g2", float(x), float(-x)) for x in range(1, 8)]
        # g3: constant x -> NULL (zero rank variance)
        + [("g3", 1.0, float(x)) for x in range(5)]
    )
    df = spark.createDataFrame(rows, ["grp", "x", "y"])
    out = {
        r["grp"]: r["rho"]
        for r in spearman_corr(
            df, group_cols=["grp"], x_col="x", y_col="y"
        ).collect()
    }
    assert out["g1"] == 1.0
    assert out["g2"] == -1.0
    assert out["g3"] is None


def test_spearman_midranks_match_scipy_convention(spark):
    from knot_another_pipeline_spark.operators.quality import spearman_corr

    # x ties: [1,1,2] -> ranks [1.5, 1.5, 3]; y = [1,2,3] -> ranks [1,2,3]
    # pearson([1.5,1.5,3],[1,2,3]) = cov/sd = (by hand) 0.866025
    df = spark.createDataFrame(
        [("g", 1.0, 1.0), ("g", 1.0, 2.0), ("g", 2.0, 3.0)], ["grp", "x", "y"]
    )
    rho = spearman_corr(
        df, group_cols=["grp"], x_col="x", y_col="y"
    ).collect()[0]["rho"]
    assert rho == 0.866025


# ---------------------------------------------------------------------------
# gini_concentration
# ---------------------------------------------------------------------------


def test_gini_extremes(spark):
    from knot_another_pipeline_spark.operators.quality import gini_concentration

    rows = (
        [("equal", f"u{i}", 10.0) for i in range(4)]          # perfectly even
        + [("one", "a", 0.0), ("one", "b", 0.0), ("one", "c", 9.0)]
        + [("zero", "a", 0.0)]                                # total 0 -> NULL
    )
    df = spark.createDataFrame(rows, ["grp", "uid", "v"])
    out = {
        r["grp"]: r
        for r in gini_concentration(
            df, group_cols=["grp"], value_col="v"
        ).collect()
    }
    assert out["equal"]["gini"] == 0.0
    assert out["one"]["gini"] == round(1 - 1 / 3, 6)  # 1 - 1/n for one holder
    assert out["zero"]["gini"] is None


# ---------------------------------------------------------------------------
# cms_sketch / cms_estimate
# ---------------------------------------------------------------------------


def test_cms_never_undercounts_and_is_exact_when_wide(spark):
    from knot_another_pipeline_spark.operators.quality import (
        cms_estimate,
        cms_sketch,
    )

    rng = random.Random(7)
    items = [(f"k{rng.randrange(30)}",) for _ in range(500)]
    df = spark.createDataFrame(items, ["item"])
    true = {}
    for (k,) in items:
        true[k] = true.get(k, 0) + 1
    # narrow sketch: collisions expected, but never an undercount
    sk = cms_sketch(df, item_col="item", depth=4, width=16)
    est = {
        r["item"]: r["est_n"]
        for r in cms_estimate(
            sk, df, item_col="item", depth=4, width=16
        ).collect()
    }
    assert set(est) == set(true)
    assert all(est[k] >= true[k] for k in true)
    # wide sketch: 30 keys in 4x4096 buckets -> exact with high probability
    sk2 = cms_sketch(df, item_col="item", depth=4, width=4096)
    est2 = {
        r["item"]: r["est_n"]
        for r in cms_estimate(
            sk2, df, item_col="item", depth=4, width=4096
        ).collect()
    }
    assert est2 == true


def test_cms_sketches_merge_by_addition(spark):
    from knot_another_pipeline_spark.operators.quality import (
        cms_estimate,
        cms_sketch,
    )
    from pyspark.sql import functions as F

    a = spark.createDataFrame([("x",)] * 3 + [("y",)] * 2, ["item"])
    b = spark.createDataFrame([("x",)] * 5 + [("z",)], ["item"])
    merged = (
        cms_sketch(a, item_col="item", depth=3, width=32)
        .unionByName(cms_sketch(b, item_col="item", depth=3, width=32))
        .groupBy("d", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    whole = cms_sketch(a.unionByName(b), item_col="item", depth=3, width=32)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    est = {
        r["item"]: r["est_n"]
        for r in cms_estimate(
            merged, a.unionByName(b), item_col="item", depth=3, width=32
        ).collect()
    }
    assert est["x"] == 8 and est["y"] == 2 and est["z"] == 1


# ---------------------------------------------------------------------------
# seasonal_decompose
# ---------------------------------------------------------------------------


def test_seasonal_decompose_recovers_components(spark):
    from knot_another_pipeline_spark.operators.temporal import seasonal_decompose

    # value = 100 (flat trend) + seasonal pattern of period 3
    pattern = [5.0, -2.0, -3.0]  # sums to 0
    rows = [("s", i, 100.0 + pattern[i % 3]) for i in range(15)]
    df = spark.createDataFrame(rows, ["series", "t0", "v"])
    out = sorted(
        seasonal_decompose(
            df, series_col="series", order_col="t0", value_col="v", period=3
        ).collect(),
        key=lambda r: r["t"],
    )
    # edge rows (half-window) have no trend
    assert out[0]["trend"] is None and out[-1]["trend"] is None
    mid = [r for r in out if r["trend"] is not None]
    # a full-period centered MA of a zero-sum pattern is the flat trend
    assert all(r["trend"] == 100.0 for r in mid)
    for r in mid:
        assert r["seasonal"] == pattern[r["t"] % 3]
        assert r["remainder"] == 0.0
        # additive identity holds exactly on interior rows
        assert r["value"] == r["trend"] + r["seasonal"] + r["remainder"]


def test_seasonal_decompose_rejects_even_period(spark):
    from knot_another_pipeline_spark.operators.temporal import seasonal_decompose

    df = spark.createDataFrame([("s", 1, 1.0)], ["series", "t0", "v"])
    with pytest.raises(ValueError):
        seasonal_decompose(
            df, series_col="series", order_col="t0", value_col="v", period=4
        )


# ---------------------------------------------------------------------------
# acf
# ---------------------------------------------------------------------------


def test_acf_alternating_series(spark):
    from knot_another_pipeline_spark.operators.temporal import acf

    rows = [("s", i, float(i % 2)) for i in range(20)]
    df = spark.createDataFrame(rows, ["series", "t0", "v"])
    out = {
        r["lag"]: r
        for r in acf(
            df, series_col="series", order_col="t0", value_col="v", max_lag=3
        ).collect()
    }
    assert out[1]["acf"] == -1.0
    assert out[2]["acf"] == 1.0
    assert out[3]["acf"] == -1.0
    assert out[1]["n_pairs"] == 19


def test_acf_constant_series_is_null(spark):
    from knot_another_pipeline_spark.operators.temporal import acf

    df = spark.createDataFrame(
        [("s", i, 5.0) for i in range(10)], ["series", "t0", "v"]
    )
    out = acf(
        df, series_col="series", order_col="t0", value_col="v", max_lag=2
    ).collect()
    assert all(r["acf"] is None for r in out)


# ---------------------------------------------------------------------------
# did_readout
# ---------------------------------------------------------------------------


def test_did_parallel_trends_cancel(spark):
    from knot_another_pipeline_spark.operators.quality import did_readout

    # control: 10 -> 14 (+4 secular trend); treated: 20 -> 29 (+9)
    rows = (
        [("a", False, False, 10.0)] * 3
        + [("a", False, True, 14.0)] * 3
        + [("a", True, False, 20.0)] * 3
        + [("a", True, True, 29.0)] * 3
    )
    df = spark.createDataFrame(rows, ["seg", "treat", "post", "m"])
    r = did_readout(
        df, treat_col="treat", post_col="post", metric_col="m", by="seg"
    ).collect()[0]
    assert r["delta_ctl"] == 4.0 and r["delta_trt"] == 9.0
    assert r["did"] == 5.0  # effect net of the shared trend


def test_did_missing_cell_is_null(spark):
    from knot_another_pipeline_spark.operators.quality import did_readout

    rows = [("a", False, False, 1.0), ("a", True, True, 2.0)]
    df = spark.createDataFrame(rows, ["seg", "treat", "post", "m"])
    r = did_readout(
        df, treat_col="treat", post_col="post", metric_col="m", by="seg"
    ).collect()[0]
    assert r["n_ctl_post"] == 0 and r["mean_ctl_post"] is None
    assert r["did"] is None


# ---------------------------------------------------------------------------
# chi2_independence
# ---------------------------------------------------------------------------


def test_chi2_independent_and_dependent(spark):
    from knot_another_pipeline_spark.operators.quality import chi2_independence

    # perfectly independent 2x2: chi2 == 0
    indep = spark.createDataFrame(
        [("a", "x")] * 10 + [("a", "y")] * 10 + [("b", "x")] * 10 + [("b", "y")] * 10,
        ["r", "c"],
    )
    r0 = chi2_independence(indep, row_col="r", col_col="c").collect()[0]
    assert r0["chi2"] == 0.0 and r0["cramers_v"] == 0.0
    assert r0["dof"] == 1 and r0["n"] == 40
    # perfectly dependent 2x2: chi2 == n, cramers_v == 1
    dep = spark.createDataFrame(
        [("a", "x")] * 10 + [("b", "y")] * 10, ["r", "c"]
    )
    r1 = chi2_independence(dep, row_col="r", col_col="c").collect()[0]
    assert r1["chi2"] == 20.0
    assert r1["cramers_v"] == 1.0


# ---------------------------------------------------------------------------
# feature_gain
# ---------------------------------------------------------------------------


def test_feature_gain_perfect_vs_useless(spark):
    from knot_another_pipeline_spark.operators.features import feature_gain

    # label = parity; "exact" mirrors it (gain = H(label) = 1 bit),
    # "noise" is constant (gain = 0)
    rows = [
        (i % 2, str(i % 2), "same") for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["label", "exact", "noise"])
    out = {
        r["feature"]: r
        for r in feature_gain(
            df, label_col="label", feature_cols=["exact", "noise"]
        ).collect()
    }
    assert out["exact"]["parent_entropy"] == 1.0
    assert out["exact"]["gain"] == 1.0
    assert out["noise"]["gain"] == 0.0
    assert out["noise"]["cond_entropy"] == 1.0


# ---------------------------------------------------------------------------
# rfm_segments
# ---------------------------------------------------------------------------


def test_rfm_scores_order_with_behavior(spark):
    import datetime as dt

    from knot_another_pipeline_spark.operators.behavior import rfm_segments

    base = dt.datetime(2024, 1, 1)
    rows = []
    # entity i: recency grows with i (worse), frequency/monetary grow with i
    for i in range(10):
        for j in range(i + 1):
            rows.append((i, base + dt.timedelta(days=30 - 3 * i), 100.0 * (i + 1)))
    df = spark.createDataFrame(rows, ["cust", "odate", "amount"])
    out = {
        r["entity"]: r
        for r in rfm_segments(
            df,
            entity_col="cust",
            ts_col="odate",
            value_col="amount",
            ref_date="2024-03-01",
            n_tiles=5,
        ).collect()
    }
    # most-recent, most-frequent, highest-spend entity scores top grade
    assert out[9]["f_score"] == 5 and out[9]["m_score"] == 5
    assert out[0]["r_score"] == 5  # i=0 has the LATEST activity date
    assert out[9]["r_score"] == 1
    assert out[0]["f_score"] == 1
    assert out[9]["segment"] == "155"
    # scores are within 1..5 and frequency is the raw count
    assert all(1 <= r["f_score"] <= 5 for r in out.values())
    assert out[4]["frequency"] == 5


# ---------------------------------------------------------------------------
# funnel_timing
# ---------------------------------------------------------------------------


def test_funnel_timing_by_hand(spark):
    import datetime as dt

    from knot_another_pipeline_spark.operators.behavior import funnel_timing

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(uid, minutes, etype):
        return (uid, t0 + dt.timedelta(minutes=minutes), etype)

    rows = [
        # user 1: full funnel, 60s then 120s
        ev(1, 0, "s"), ev(1, 1, "v"), ev(1, 3, "p"),
        # user 2: converts s->v in 600s, never purchases
        ev(2, 0, "s"), ev(2, 10, "v"),
        # user 3: out-of-order (v before s): no transitions count
        ev(3, 5, "v"), ev(3, 6, "s"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {
        r["step_index"]: r
        for r in funnel_timing(df, ["s", "v", "p"]).collect()
    }
    assert out[1]["step_from"] == "s" and out[1]["step_to"] == "v"
    assert out[1]["n_users"] == 2
    assert out[1]["avg_seconds"] == (60 + 600) / 2
    assert out[1]["p50_seconds"] == 330.0  # exact interpolated median
    assert out[2]["n_users"] == 1 and out[2]["avg_seconds"] == 120.0


# ---------------------------------------------------------------------------
# readability
# ---------------------------------------------------------------------------


def test_readability_counts_and_score(spark):
    from knot_another_pipeline_spark.operators.text_analysis import readability

    df = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran!"),
            (2, ""),
            (3, "no sentence punctuation here"),
        ],
        ["doc_id", "text"],
    )
    out = {r["id"]: r for r in readability(df).collect()}
    assert out[1]["n_words"] == 6 and out[1]["n_sentences"] == 2
    # vowel groups: e,a,a,e,o,a -> 6
    assert out[1]["n_syllables"] == 6
    assert out[1]["flesch"] == round(206.835 - 1.015 * 3.0 - 84.6 * 1.0, 4)
    assert out[2]["n_words"] == 0 and out[2]["flesch"] is None
    assert out[3]["n_sentences"] == 1  # floored, no divide-by-zero
