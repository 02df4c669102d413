"""Round-11 operators: unit tests against hand-computed references.

Covers dau_mau, growth_accounting, activity_streaks (behavior.py),
theil_index, hill_tail_index, eb_shrinkage, lorenz_curve (quality.py),
peak_detection (temporal.py), rank_biased_overlap (evaluation.py),
herfindahl_index (relational.py).
"""

from __future__ import annotations

import datetime as dt
import math

import pytest


def _ts(day, hour=0):
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=day - 1, hours=hour)


# --- behavior ---------------------------------------------------------


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp"
    )


def test_dau_mau_by_hand(spark):
    from knot_another_pipeline_spark.operators.behavior import dau_mau

    # Jan: u1 on d1,d2; u2 on d1 -> active days {d1: dau 2, d2: dau 1}
    # dau_avg = 1.5, mau = 2, stickiness = 0.75
    rows = [
        (1, _ts(1)), (1, _ts(1, 5)), (1, _ts(2)), (2, _ts(1)),
        # Feb: u1 only, one day
        (1, dt.datetime(2024, 2, 10)),
    ]
    out = {
        r["month"].isoformat(): r
        for r in dau_mau(_events(spark, rows)).collect()
    }
    jan = out["2024-01-01"]
    assert jan["n_days"] == 2 and jan["mau"] == 2
    assert jan["dau_avg"] == pytest.approx(1.5)
    assert jan["stickiness"] == pytest.approx(0.75)
    feb = out["2024-02-01"]
    assert feb["n_days"] == 1 and feb["mau"] == 1
    assert feb["stickiness"] == pytest.approx(1.0)


def test_growth_accounting_ledger_identities(spark):
    from knot_another_pipeline_spark.operators.behavior import (
        growth_accounting,
    )

    # u1 active Jan,Feb,Mar; u2 Jan only (churns in Feb);
    # u3 Jan, skips Feb, returns Mar (resurrected)
    rows = [
        (1, dt.datetime(2024, 1, 5)), (1, dt.datetime(2024, 2, 5)),
        (1, dt.datetime(2024, 3, 5)),
        (2, dt.datetime(2024, 1, 7)),
        (3, dt.datetime(2024, 1, 9)), (3, dt.datetime(2024, 3, 9)),
    ]
    out = {
        r["month"].isoformat(): r
        for r in growth_accounting(_events(spark, rows)).collect()
    }
    jan, feb, mar = (
        out["2024-01-01"], out["2024-02-01"], out["2024-03-01"]
    )
    assert (jan["mau"], jan["n_new"], jan["n_churned"]) == (3, 3, 0)
    assert (feb["mau"], feb["n_new"], feb["n_retained"]) == (1, 0, 1)
    assert feb["n_churned"] == 2  # u2 and u3 left after Jan
    assert (mar["n_retained"], mar["n_resurrected"]) == (1, 1)
    assert mar["n_churned"] == 0
    for r in out.values():
        assert r["mau"] == r["n_new"] + r["n_retained"] + r["n_resurrected"]
    assert mar["quick_ratio"] is None  # nothing churned in Mar


def test_activity_streaks_islands(spark):
    from knot_another_pipeline_spark.operators.behavior import (
        activity_streaks,
    )

    # u1: days 1,2,3,  7,8  -> streaks [3, 2]; u2: day 1 only
    rows = [
        (1, _ts(1)), (1, _ts(2)), (1, _ts(2, 9)), (1, _ts(3)),
        (1, _ts(7)), (1, _ts(8)),
        (2, _ts(1)),
    ]
    out = {
        r["user"]: r for r in activity_streaks(_events(spark, rows)).collect()
    }
    assert out[1]["n_active_days"] == 5
    assert out[1]["n_streaks"] == 2
    assert out[1]["longest_streak"] == 3
    assert out[2]["longest_streak"] == 1


# --- quality ----------------------------------------------------------


def test_theil_index_by_hand(spark):
    from knot_another_pipeline_spark.operators.quality import theil_index

    # groups a: [1, 3]; b: [2, 2] -> n=4, mu=2
    vals = [("a", 1.0), ("a", 3.0), ("b", 2.0), ("b", 2.0)]
    df = spark.createDataFrame(vals, "g string, v double")
    row = theil_index(df, group_cols=["g"], value_col="v").collect()[0]
    xs = [1.0, 3.0, 2.0, 2.0]
    mu = sum(xs) / 4
    t_total = sum(x / mu * math.log(x / mu) for x in xs) / 4
    # shares: a 0.5 (mu_a=2=mu), b 0.5 -> between = 0
    assert row["n"] == 4 and row["n_groups"] == 2
    assert row["mean"] == pytest.approx(2.0)
    assert row["theil_total"] == pytest.approx(t_total, abs=1e-6)
    assert row["theil_between"] == pytest.approx(0.0, abs=1e-6)
    assert row["theil_within"] == pytest.approx(t_total, abs=1e-6)


def test_theil_decomposition_identity(spark):
    from knot_another_pipeline_spark.operators.quality import theil_index

    vals = [
        ("a", float(v)) for v in [1, 2, 3, 10]
    ] + [("b", float(v)) for v in [5, 5, 40]]
    df = spark.createDataFrame(vals, "g string, v double")
    row = theil_index(df, group_cols=["g"], value_col="v").collect()[0]
    assert row["theil_total"] == pytest.approx(
        row["theil_between"] + row["theil_within"], abs=2e-6
    )
    assert row["theil_between"] > 0


def test_hill_tail_index_pareto_recovers_alpha(spark):
    from knot_another_pipeline_spark.operators.quality import (
        hill_tail_index,
    )

    # exact Pareto(alpha=2) quantiles: x_i = (i/n)^(-1/2); Hill on the
    # top k of an exact quantile grid estimates ~alpha
    n, alpha = 400, 2.0
    rows = [
        ("g", (i / n) ** (-1.0 / alpha), i) for i in range(1, n + 1)
    ]
    df = spark.createDataFrame(rows, "g string, v double, id long")
    row = hill_tail_index(
        df, group_cols=["g"], value_col="v", id_col="id", k=50
    ).collect()[0]
    assert row["n_pos"] == n
    assert row["hill_alpha"] == pytest.approx(alpha, rel=0.15)
    assert row["tail_index"] == pytest.approx(1 / alpha, rel=0.15)


def test_hill_small_group_null(spark):
    from knot_another_pipeline_spark.operators.quality import (
        hill_tail_index,
    )

    rows = [("g", 1.0 + i, i) for i in range(5)]
    df = spark.createDataFrame(rows, "g string, v double, id long")
    row = hill_tail_index(
        df, group_cols=["g"], value_col="v", id_col="id", k=10
    ).collect()[0]
    assert row["hill_alpha"] is None and row["threshold"] is None


def test_eb_shrinkage_pulls_toward_prior_mean(spark):
    from knot_another_pipeline_spark.operators.quality import eb_shrinkage

    rows = []
    # 20 items with 100 trials each, rates spread around 0.3
    for i in range(20):
        s = 20 + i  # 20..39 successes
        rows += [("i%02d" % i, 1.0, 1.0)] * s
        rows += [("i%02d" % i, 0.0, 1.0)] * (100 - s)
    # one tiny item: 1/1 raw rate 1.0 — must shrink far toward ~0.3
    rows += [("tiny", 1.0, 1.0)]
    df = spark.createDataFrame(rows, "item string, s double, n double")
    out = {
        r["item"]: r
        for r in eb_shrinkage(
            df, item_col="item", success_col="s", trial_col="n",
            min_trials=10,
        ).collect()
    }
    tiny = out["tiny"]
    assert tiny["raw_rate"] == pytest.approx(1.0)
    assert tiny["shrunk_rate"] < 0.6  # pulled hard toward the prior
    big = out["i10"]
    assert abs(big["shrunk_rate"] - big["raw_rate"]) < 0.05
    assert tiny["prior_alpha"] > 0 and tiny["prior_beta"] > 0


def test_eb_shrinkage_degenerate_prior_null(spark):
    from knot_another_pipeline_spark.operators.quality import eb_shrinkage

    # all rates identical -> var 0 -> NULL priors, NULL shrunk rates
    rows = [("a", 1.0, 1.0), ("a", 0.0, 1.0), ("b", 1.0, 1.0),
            ("b", 0.0, 1.0)]
    df = spark.createDataFrame(rows, "item string, s double, n double")
    out = eb_shrinkage(
        df, item_col="item", success_col="s", trial_col="n"
    ).collect()
    assert all(r["prior_alpha"] is None for r in out)
    assert all(r["shrunk_rate"] is None for r in out)


def test_lorenz_curve_uniform_and_extreme(spark):
    from knot_another_pipeline_spark.operators.quality import lorenz_curve

    # equal values -> cum_share at bucket b is b/5
    df = spark.createDataFrame(
        [(i, 10.0) for i in range(50)], "id long, v double"
    )
    out = lorenz_curve(df, value_col="v", id_col="id", n_points=5).collect()
    assert [r["bucket"] for r in out] == [1, 2, 3, 4, 5]
    assert all(r["n"] == 10 for r in out)
    for r in out:
        assert r["cum_share"] == pytest.approx(r["bucket"] / 5)
    # one row holds everything -> last bucket jumps to 1
    df2 = spark.createDataFrame(
        [(i, 0.0) for i in range(49)] + [(99, 100.0)], "id long, v double"
    )
    out2 = lorenz_curve(df2, value_col="v", id_col="id", n_points=5).collect()
    assert out2[-1]["cum_share"] == pytest.approx(1.0)
    assert out2[0]["cum_share"] == pytest.approx(0.0)


# --- temporal ---------------------------------------------------------


def test_peak_detection_by_hand(spark):
    from knot_another_pipeline_spark.operators.temporal import (
        peak_detection,
    )

    series = [1.0, 5.0, 2.0, 2.0, 3.0, 2.5, 10.0]
    rows = [("s", _ts(i + 1), v) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = peak_detection(
        df, series_cols=["g"], ts_col="ts", value_col="v"
    ).collect()
    # peaks: day2 (5 > 1, 5 > 2) and day5 (3 > 2, 3 > 2.5);
    # day7 is an endpoint, day4 is a plateau shoulder
    assert [(r["ts"].day, r["value"]) for r in out] == [(2, 5.0), (5, 3.0)]
    assert out[0]["prominence_ratio"] == pytest.approx(2.5)


def test_peak_detection_prominence_filter(spark):
    from knot_another_pipeline_spark.operators.temporal import (
        peak_detection,
    )

    series = [1.0, 1.04, 1.0, 2.0, 1.0]
    rows = [("s", _ts(i + 1), v) for i, v in enumerate(series)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = peak_detection(
        df, series_cols=["g"], ts_col="ts", value_col="v",
        min_prominence_ratio=0.05,
    ).collect()
    # 1.04 fails the 5% prominence bar; 2.0 passes
    assert [r["ts"].day for r in out] == [4]


# --- evaluation -------------------------------------------------------


def _ranking(spark, items):
    return spark.createDataFrame(
        [(it, i + 1) for i, it in enumerate(items)], "item string, rank int"
    )


def _rbo_ref(a, b, k, p):
    tot = 0.0
    for d in range(1, k + 1):
        ov = len(set(a[:d]) & set(b[:d]))
        tot += (p ** d) * ov / d
    return (1 - p) / p * tot


def test_rbo_identical_and_disjoint(spark):
    from knot_another_pipeline_spark.operators.evaluation import (
        rank_biased_overlap,
    )

    items = [f"x{i}" for i in range(10)]
    same = rank_biased_overlap(
        _ranking(spark, items), _ranking(spark, items), k=10, p=0.9
    ).collect()[0]
    assert same["n_common"] == 10
    assert same["rbo"] == pytest.approx(
        _rbo_ref(items, items, 10, 0.9), abs=1e-6
    )
    other = [f"y{i}" for i in range(10)]
    disj = rank_biased_overlap(
        _ranking(spark, items), _ranking(spark, other), k=10, p=0.9
    ).collect()[0]
    assert disj["n_common"] == 0 and disj["rbo"] == 0.0


def test_rbo_partial_matches_reference(spark):
    from knot_another_pipeline_spark.operators.evaluation import (
        rank_biased_overlap,
    )

    a = ["a", "b", "c", "d", "e", "f"]
    b = ["b", "a", "c", "x", "e", "y"]
    row = rank_biased_overlap(
        _ranking(spark, a), _ranking(spark, b), k=6, p=0.8
    ).collect()[0]
    assert row["rbo"] == pytest.approx(_rbo_ref(a, b, 6, 0.8), abs=1e-6)


def test_rbo_validates_params(spark):
    from knot_another_pipeline_spark.operators.evaluation import (
        rank_biased_overlap,
    )

    r = _ranking(spark, ["a"])
    with pytest.raises(ValueError):
        rank_biased_overlap(r, r, k=0)
    with pytest.raises(ValueError):
        rank_biased_overlap(r, r, p=1.0)


# --- relational -------------------------------------------------------


def test_herfindahl_by_hand(spark):
    from knot_another_pipeline_spark.operators.relational import (
        herfindahl_index,
    )

    rows = [
        ("m1", "f1", 50.0), ("m1", "f2", 30.0), ("m1", "f2", 20.0),
        ("m2", "f1", 10.0),  # monopoly
        ("m3", "f1", 25.0), ("m3", "f2", 25.0), ("m3", "f3", 25.0),
        ("m3", "f4", 25.0),  # 4 equal firms
    ]
    df = spark.createDataFrame(rows, "mkt string, firm string, v double")
    out = {
        r["mkt"]: r
        for r in herfindahl_index(
            df, market_cols=["mkt"], firm_col="firm", value_col="v"
        ).collect()
    }
    assert out["m1"]["hhi"] == pytest.approx(0.5)  # 0.5^2 + 0.5^2
    assert out["m1"]["effective_firms"] == pytest.approx(2.0)
    assert out["m2"]["hhi"] == pytest.approx(1.0)
    assert out["m3"]["hhi"] == pytest.approx(0.25)
    assert out["m3"]["effective_firms"] == pytest.approx(4.0)


def test_herfindahl_drops_nonpositive_firms(spark):
    from knot_another_pipeline_spark.operators.relational import (
        herfindahl_index,
    )

    rows = [("m", "f1", 10.0), ("m", "f2", 0.0), ("m", "f3", -5.0)]
    df = spark.createDataFrame(rows, "mkt string, firm string, v double")
    row = herfindahl_index(
        df, market_cols=["mkt"], firm_col="firm", value_col="v"
    ).collect()[0]
    assert row["n_firms"] == 1 and row["hhi"] == pytest.approx(1.0)


# --- second batch: gumbel_maxima, engle_granger, h_index --------------


def test_gumbel_maxima_by_hand(spark):
    import math

    from knot_another_pipeline_spark.operators.temporal import (
        gumbel_maxima,
    )

    # monthly maxima: Jan 10, Feb 20, Mar 30 -> m=20, s=10
    rows = [
        ("s", dt.datetime(2024, 1, 5), 10.0),
        ("s", dt.datetime(2024, 1, 9), 3.0),
        ("s", dt.datetime(2024, 2, 5), 20.0),
        ("s", dt.datetime(2024, 3, 5), 30.0),
        ("s", dt.datetime(2024, 3, 9), 1.0),
    ]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    r = gumbel_maxima(
        df, series_col="g", ts_col="ts", value_col="v", return_p=0.99
    ).collect()[0]
    beta = 10.0 * math.sqrt(6) / math.pi
    loc = 20.0 - 0.5772156649015329 * beta
    rl = loc - beta * math.log(-math.log(0.99))
    assert r["n_blocks"] == 3
    assert r["mean_max"] == pytest.approx(20.0)
    assert r["gumbel_scale"] == pytest.approx(beta, abs=1e-6)
    assert r["gumbel_loc"] == pytest.approx(loc, abs=1e-6)
    assert r["return_level"] == pytest.approx(rl, abs=1e-6)
    assert r["return_level"] > r["mean_max"]


def test_gumbel_maxima_degenerate_null(spark):
    from knot_another_pipeline_spark.operators.temporal import (
        gumbel_maxima,
    )

    # one block -> no sample sd -> NULL fit
    df = spark.createDataFrame(
        [("s", dt.datetime(2024, 1, 5), 10.0)],
        "g string, ts timestamp, v double",
    )
    r = gumbel_maxima(
        df, series_col="g", ts_col="ts", value_col="v"
    ).collect()[0]
    assert r["n_blocks"] == 1 and r["gumbel_scale"] is None
    with pytest.raises(ValueError):
        gumbel_maxima(
            df, series_col="g", ts_col="ts", value_col="v", return_p=1.0
        )


def _eg_ref(pairs):
    import math

    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    sxy = sum(x * y for x, y in pairs)
    beta = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    alpha = sy / n - beta * sx / n
    r = [y - alpha - beta * x for x, y in pairs]
    dr = [(r[i - 1], r[i] - r[i - 1]) for i in range(1, n)]
    m = len(dr)
    srd = sum(a * b for a, b in dr)
    srr = sum(a * a for a, b in dr)
    sdd = sum(b * b for a, b in dr)
    gamma = srd / srr
    se = math.sqrt((sdd - gamma * srd) / (m - 1) / srr)
    return beta, alpha, gamma / se


def test_engle_granger_cointegrated_pair(spark):
    import math

    from knot_another_pipeline_spark.operators.temporal import (
        engle_granger,
    )

    # x: a deterministic wander; y = 2x + 1 + small stationary wiggle
    xs = [math.sin(i / 3.0) * 5 + i * 0.1 for i in range(40)]
    ys = [2 * x + 1 + (0.3 if i % 2 else -0.3) for i, x in enumerate(xs)]
    rows = [(i, ys[i], xs[i]) for i in range(40)]
    df = spark.createDataFrame(rows, "t int, y double, x double")
    r = engle_granger(df, order_col="t", y_col="y", x_col="x").collect()[0]
    beta, alpha, t = _eg_ref(list(zip(xs, ys)))
    assert r["beta"] == pytest.approx(beta, abs=1e-5)
    assert r["alpha"] == pytest.approx(alpha, abs=1e-5)
    assert r["adf_t"] == pytest.approx(t, abs=1e-4)
    # the alternating residual is strongly mean-reverting
    assert r["cointegrated_5pct"] is True


def test_engle_granger_short_series_null(spark):
    from knot_another_pipeline_spark.operators.temporal import (
        engle_granger,
    )

    df = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 2.0, 2.0)], "t int, y double, x double"
    )
    r = engle_granger(df, order_col="t", y_col="y", x_col="x").collect()[0]
    assert r["beta"] is None and r["adf_t"] is None


def test_h_index_by_hand(spark):
    from knot_another_pipeline_spark.operators.quality import h_index

    # classic: values [10, 8, 5, 4, 3] -> h = 4; [2, 2, 2] -> h = 2
    rows = [("a", v, i) for i, v in enumerate([10.0, 8.0, 5.0, 4.0, 3.0])]
    rows += [("b", 2.0, i) for i in range(3)]
    df = spark.createDataFrame(rows, "g string, v double, id long")
    out = {
        r["g"]: r
        for r in h_index(
            df, group_cols=["g"], value_col="v", id_col="id"
        ).collect()
    }
    assert out["a"]["h_index"] == 4 and out["a"]["n"] == 5
    assert out["b"]["h_index"] == 2
    assert out["a"]["h_ratio"] == pytest.approx(4 / 5**0.5, abs=1e-6)


def test_h_index_tie_invariant(spark):
    from knot_another_pipeline_spark.operators.quality import h_index

    # equal values: any tie order crosses the v >= i diagonal once
    rows = [("g", 3.0, i) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, v double, id long")
    r = h_index(df, group_cols=["g"], value_col="v", id_col="id").collect()[0]
    assert r["h_index"] == 3
