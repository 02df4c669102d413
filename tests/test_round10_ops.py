"""Round-10 operators: hand-verified and pure-Python-reference tests.

Each new operator is checked against either a hand-computed constant
or an independent pure-Python reference implemented inline (never the
operator's own arithmetic), the same strategy as test_round9*_ops.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# page_hinkley


def _ph_reference(xs, delta, lam):
    m = 0.0
    mn = 0.0
    run = 0.0
    out = []
    for i, x in enumerate(xs, start=1):
        run += x
        m += x - run / i - delta
        mn = min(mn, m)
        out.append(m - mn)
    return out


def test_page_hinkley_matches_reference(spark):
    from knot_another_pipeline_spark.operators.temporal import page_hinkley

    xs = [5.0, 5.2, 4.9, 5.1, 5.0, 9.0, 9.2, 9.1, 8.9, 9.3]
    rows = [("s", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "series string, ord int, x double")
    got = page_hinkley(
        df, series_col="series", order_col="ord", value_col="x",
        delta=0.1, lam=2.0,
    ).collect()[0]
    ref = _ph_reference(xs, 0.1, 2.0)
    assert got["n"] == 10
    assert got["max_ph"] == pytest.approx(max(ref), abs=1e-6)
    assert got["n_alarms"] == sum(1 for v in ref if v > 2.0)
    assert got["drift"] is True
    first = next(i for i, v in enumerate(ref) if v > 2.0)
    assert got["first_alarm_ord"] == first


def test_page_hinkley_stable_series_no_drift(spark):
    from knot_another_pipeline_spark.operators.temporal import page_hinkley

    rows = [("s", i, 5.0 + 0.01 * (i % 2)) for i in range(50)]
    df = spark.createDataFrame(rows, "series string, ord int, x double")
    got = page_hinkley(
        df, series_col="series", order_col="ord", value_col="x", lam=1.0
    ).collect()[0]
    assert got["drift"] is False
    assert got["first_alarm_ord"] is None
    with pytest.raises(ValueError, match="lam"):
        page_hinkley(
            df, series_col="series", order_col="ord", value_col="x",
            lam=0.0,
        )


# ---------------------------------------------------------------------------
# dickey_fuller


def _df_reference(ys):
    xs = ys[:-1]
    ds = [b - a for a, b in zip(ys[:-1], ys[1:])]
    n = len(ds)
    mx, md = sum(xs) / n, sum(ds) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    sxd = sum((x - mx) * (d - md) for x, d in zip(xs, ds))
    sdd = sum((d - md) ** 2 for d in ds)
    g = sxd / sxx
    rss = sdd - g * sxd
    se = math.sqrt(rss / (n - 2) / sxx)
    return n, g, g / se


def test_dickey_fuller_matches_reference(spark):
    from knot_another_pipeline_spark.operators.temporal import dickey_fuller

    # strongly mean-reverting AR(1): phi = 0.2 -> gamma = -0.8
    ys = [10.0]
    for i in range(40):
        ys.append(0.2 * ys[-1] + ((i * 7) % 5 - 2.0))
    rows = [("s", i, y) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "series string, ord int, y double")
    got = dickey_fuller(
        df, series_col="series", order_col="ord", value_col="y"
    ).collect()[0]
    n, g, t = _df_reference(ys)
    assert got["n_diffs"] == n
    assert got["gamma"] == pytest.approx(g, abs=1e-6)
    assert got["t_stat"] == pytest.approx(t, abs=1e-6)
    assert got["stationary_5pct"] is True


def test_dickey_fuller_random_walk_not_stationary(spark):
    from knot_another_pipeline_spark.operators.temporal import dickey_fuller

    # a pure cumulative sum drifts; gamma ~ 0
    steps = [((i * 13) % 7 - 3.0) for i in range(60)]
    ys, acc = [], 0.0
    for s in steps:
        acc += s
        ys.append(acc)
    rows = [("w", i, y) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "series string, ord int, y double")
    got = dickey_fuller(
        df, series_col="series", order_col="ord", value_col="y"
    ).collect()[0]
    n, g, t = _df_reference(ys)
    assert got["t_stat"] == pytest.approx(t, abs=1e-6)


# ---------------------------------------------------------------------------
# spectral_entropy


def test_spectral_entropy_pure_tone_vs_noise(spark):
    from knot_another_pipeline_spark.operators.temporal import (
        spectral_entropy,
    )

    tone = [
        ("tone", t, math.cos(2 * math.pi * t / 10.0)) for t in range(100)
    ]
    flat = [("flat", t, 3.5) for t in range(100)]
    df = spark.createDataFrame(
        tone + flat, "series string, t int, y double"
    )
    out = {
        r["series"]: r
        for r in spectral_entropy(
            df, series_col="series", t_col="t", value_col="y",
            periods=[5.0, 10.0, 20.0],
        ).collect()
    }
    assert out["tone"]["dominant_period"] == 10.0
    assert out["tone"]["spectral_entropy"] < 0.05
    assert out["flat"]["spectral_entropy"] is None
    assert out["flat"]["n_active"] == 0
    with pytest.raises(ValueError, match="distinct"):
        spectral_entropy(
            df, series_col="series", t_col="t", value_col="y",
            periods=[10.0],
        )


def test_spectral_entropy_broadband_near_one(spark):
    from knot_another_pipeline_spark.operators.temporal import (
        spectral_entropy,
    )

    mix = [
        (
            "mix",
            t,
            math.cos(2 * math.pi * t / 5.0)
            + math.cos(2 * math.pi * t / 10.0)
            + math.cos(2 * math.pi * t / 20.0),
        )
        for t in range(200)
    ]
    df = spark.createDataFrame(mix, "series string, t int, y double")
    got = spectral_entropy(
        df, series_col="series", t_col="t", value_col="y",
        periods=[5.0, 10.0, 20.0],
    ).collect()[0]
    # equal power at all three candidates -> entropy ~ 1
    assert got["spectral_entropy"] > 0.95
    assert got["n_active"] == 3


# ---------------------------------------------------------------------------
# runs_test


def test_runs_test_hand_example(spark):
    from knot_another_pipeline_spark.operators.temporal import runs_test

    xs = [5.0, 6.0, 4.0, 3.0, 7.0, 8.0, 2.0, 1.0]  # ++--++--: R=4
    rows = [("s", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "series string, ord int, x double")
    got = runs_test(
        df, series_col="series", order_col="ord", value_col="x"
    ).collect()[0]
    assert got["n_above"] == 4 and got["n_below"] == 4
    assert got["runs"] == 4
    mean_r = 2 * 16 / 8 + 1
    var_r = 2 * 16 * (32 - 8) / (64 * 7)
    assert got["z"] == pytest.approx((4 - mean_r) / math.sqrt(var_r), abs=1e-6)
    assert 0 < got["p_value"] < 1


def test_runs_test_median_values_dropped(spark):
    from knot_another_pipeline_spark.operators.temporal import runs_test

    # odd n: the median element itself must be dropped
    xs = [1.0, 9.0, 5.0, 9.0, 1.0]  # median 5 dropped -> +-+- wait: -++-
    rows = [("s", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "series string, ord int, x double")
    got = runs_test(
        df, series_col="series", order_col="ord", value_col="x"
    ).collect()[0]
    assert got["n_above"] == 2 and got["n_below"] == 2
    assert got["runs"] == 3  # -, ++, -


# ---------------------------------------------------------------------------
# seasonal_strength


def _seasonal_strength_reference(ys, period):
    n = len(ys)
    half = period // 2
    trend = [
        sum(ys[max(0, i - half) : min(n, i + half + 1)])
        / len(ys[max(0, i - half) : min(n, i + half + 1)])
        for i in range(n)
    ]
    detr = [y - t for y, t in zip(ys, trend)]
    seas_mean = {}
    for j in range(period):
        vals = [detr[i] for i in range(n) if i % period == j]
        seas_mean[j] = sum(vals) / len(vals)
    seas = [seas_mean[i % period] for i in range(n)]
    rem = [d - s for d, s in zip(detr, seas)]
    deseas = [y - s for y, s in zip(ys, seas)]

    def var(v):
        m = sum(v) / len(v)
        return sum((x - m) ** 2 for x in v) / len(v)

    fs = max(0.0, 1 - var(rem) / var(detr)) if var(detr) > 0 else None
    ft = max(0.0, 1 - var(rem) / var(deseas)) if var(deseas) > 0 else None
    return fs, ft


def test_seasonal_strength_matches_reference(spark):
    from knot_another_pipeline_spark.operators.temporal import (
        seasonal_strength,
    )

    pattern = [10.0, 2.0, 3.0, 8.0, 1.0, 12.0, 4.0]
    ys = [
        pattern[i % 7] + 0.1 * i + 0.3 * ((i * 11) % 5) for i in range(42)
    ]
    rows = [("s", i, y) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "series string, ord int, y double")
    got = seasonal_strength(
        df, series_col="series", order_col="ord", value_col="y", period=7
    ).collect()[0]
    fs, ft = _seasonal_strength_reference(ys, 7)
    assert got["seasonal_strength"] == pytest.approx(fs, abs=1e-6)
    assert got["trend_strength"] == pytest.approx(ft, abs=1e-6)
    assert got["seasonal_strength"] > 0.8  # the pattern dominates
    with pytest.raises(ValueError, match="period"):
        seasonal_strength(
            df, series_col="series", order_col="ord", value_col="y",
            period=1,
        )


# ---------------------------------------------------------------------------
# wilcoxon_signed_rank


def test_wilcoxon_hand_example_with_ties(spark):
    from knot_another_pipeline_spark.operators.quality import (
        wilcoxon_signed_rank,
    )

    # diffs: 1.5, -0.5, 2.0, 0.0, -1.5, 3.0 -> nonzero ranks on |d|:
    # 0.5->1, {1.5,1.5}->2.5, 2.0->4, 3.0->5; W+ = 2.5+4+5 = 11.5
    pairs = [
        (2.5, 1.0), (1.0, 1.5), (5.0, 3.0), (4.0, 4.0), (2.0, 3.5),
        (6.0, 3.0),
    ]
    df = spark.createDataFrame(
        [("g", a, b) for a, b in pairs], "fam string, a double, b double"
    )
    got = wilcoxon_signed_rank(
        df, group_cols=["fam"], a_col="a", b_col="b"
    ).collect()[0]
    assert got["n_pairs"] == 5 and got["n_zero"] == 1
    assert got["w_plus"] == pytest.approx(11.5)
    var_w = 5 * 6 * 11 / 24 - (2**3 - 2) / 48
    z = (11.5 - 5 * 6 / 4) / math.sqrt(var_w)
    assert got["z"] == pytest.approx(z, abs=1e-6)
    assert 0 < got["p_value"] < 1


def test_wilcoxon_shifted_pairs_significant(spark):
    from knot_another_pipeline_spark.operators.quality import (
        wilcoxon_signed_rank,
    )

    rows = [("g", float(i), float(i) - 2.0 - 0.01 * i) for i in range(40)]
    df = spark.createDataFrame(rows, "fam string, a double, b double")
    got = wilcoxon_signed_rank(
        df, group_cols=["fam"], a_col="a", b_col="b"
    ).collect()[0]
    assert got["p_value"] < 0.001  # every diff positive
    assert got["w_plus"] == pytest.approx(40 * 41 / 2)


# ---------------------------------------------------------------------------
# friedman_test


def _friedman_reference(blocks):
    """blocks: list of dicts treatment->value (complete blocks)."""
    n = len(blocks)
    trts = sorted(blocks[0])
    k = len(trts)
    rj = dict.fromkeys(trts, 0.0)
    tie3 = 0.0
    for b in blocks:
        vals = sorted(b.values())
        for t in trts:
            v = b[t]
            lo = sum(1 for x in vals if x < v)
            eq = sum(1 for x in vals if x == v)
            rj[t] += lo + (eq + 1) / 2.0
        seen = {}
        for v in vals:
            seen[v] = seen.get(v, 0) + 1
        tie3 += sum(c**3 - c for c in seen.values())
    q = 12.0 / (n * k * (k + 1)) * sum(r * r for r in rj.values()) - 3 * n * (
        k + 1
    )
    corr = 1 - tie3 / (n * k * (k * k - 1))
    return q / corr


def test_friedman_matches_reference(spark):
    from knot_another_pipeline_spark.operators.quality import friedman_test

    blocks = [
        {"a": 1.0, "b": 2.0, "c": 3.0},
        {"a": 1.5, "b": 3.0, "c": 2.0},
        {"a": 1.0, "b": 1.0, "c": 4.0},  # tie inside a block
        {"a": 2.0, "b": 5.0, "c": 6.0},
        {"a": 0.5, "b": 2.5, "c": 2.5},  # tie
    ]
    rows = [
        ("f", f"b{i}", t, v)
        for i, b in enumerate(blocks)
        for t, v in b.items()
    ]
    df = spark.createDataFrame(
        rows, "fam string, blk string, trt string, v double"
    )
    got = friedman_test(
        df, group_cols=["fam"], block_col="blk", treatment_col="trt",
        value_col="v",
    ).collect()[0]
    assert got["n_blocks"] == 5 and got["k_treatments"] == 3
    assert got["n_incomplete"] == 0
    assert got["q_corrected"] == pytest.approx(
        _friedman_reference(blocks), abs=1e-6
    )
    assert got["df"] == 2
    assert 0 <= got["p_value"] <= 1


def test_friedman_incomplete_blocks_excluded(spark):
    from knot_another_pipeline_spark.operators.quality import friedman_test

    rows = [
        ("f", "b1", "a", 1.0), ("f", "b1", "b", 2.0),
        ("f", "b2", "a", 3.0), ("f", "b2", "b", 1.0),
        ("f", "b3", "a", 2.0),  # incomplete: missing treatment b
    ]
    df = spark.createDataFrame(
        rows, "fam string, blk string, trt string, v double"
    )
    got = friedman_test(
        df, group_cols=["fam"], block_col="blk", treatment_col="trt",
        value_col="v",
    ).collect()[0]
    assert got["n_blocks"] == 2
    assert got["n_incomplete"] == 1


# ---------------------------------------------------------------------------
# mood_median


def test_mood_median_hand_example(spark):
    from knot_another_pipeline_spark.operators.quality import mood_median

    # class A mostly above the grand median, class B mostly below
    a = [10.0, 11.0, 12.0, 13.0, 2.0]
    b = [1.0, 2.0, 3.0, 4.0, 12.0]
    rows = [("f", "A", v) for v in a] + [("f", "B", v) for v in b]
    df = spark.createDataFrame(rows, "fam string, cls string, v double")
    got = mood_median(
        df, group_cols=["fam"], value_col="v", class_col="cls"
    ).collect()[0]
    vals = sorted(a + b)
    med = (vals[4] + vals[5]) / 2.0
    above = {"A": sum(1 for v in a if v > med),
             "B": sum(1 for v in b if v > med)}
    n_tot, a_tot = 10, above["A"] + above["B"]
    p = a_tot / n_tot
    chi2 = sum(
        (above[c] - 5 * p) ** 2 / (5 * p * (1 - p)) for c in ("A", "B")
    )
    assert got["n_total"] == 10 and got["k_classes"] == 2
    assert got["chi2"] == pytest.approx(chi2, abs=1e-6)
    assert got["df"] == 1


def test_mood_median_degenerate_all_equal(spark):
    from knot_another_pipeline_spark.operators.quality import mood_median

    rows = [("f", c, 5.0) for c in ("A", "B") for _ in range(4)]
    df = spark.createDataFrame(rows, "fam string, cls string, v double")
    got = mood_median(
        df, group_cols=["fam"], value_col="v", class_col="cls"
    ).collect()[0]
    assert got["chi2"] is None and got["p_value"] is None


# ---------------------------------------------------------------------------
# nelson_aalen / log_rank_test


def test_nelson_aalen_hand_example(spark):
    from knot_another_pipeline_spark.operators.behavior import nelson_aalen

    rows = [
        ("g", 1.0, 1), ("g", 2.0, 1), ("g", 2.0, 1), ("g", 3.0, 0),
        ("g", 4.0, 1),
    ]
    df = spark.createDataFrame(rows, "grp string, dur double, ev int")
    out = {
        r["duration"]: r
        for r in nelson_aalen(
            df, group_col="grp", duration_col="dur", event_col="ev"
        ).collect()
    }
    assert set(out) == {1.0, 2.0, 4.0}  # censored-only t=3 emits no row
    assert out[1.0]["cum_hazard"] == pytest.approx(0.2)
    assert out[2.0]["cum_hazard"] == pytest.approx(0.7)
    assert out[4.0]["cum_hazard"] == pytest.approx(1.7)
    assert out[2.0]["hazard_se"] == pytest.approx(math.sqrt(0.165), abs=1e-6)
    assert out[1.0]["fh_survival"] == pytest.approx(math.exp(-0.2), abs=1e-6)
    assert out[2.0]["at_risk"] == 4


def test_log_rank_hand_example_with_missing_step_rows(spark):
    from knot_another_pipeline_spark.operators.behavior import log_rank_test

    # A: [1 ev, 5 cens]; B: [2 ev, 3 ev].  At B's event times A has no
    # step row, so this pins the time-grid densify (at-risk must be 1,
    # not 0).  chi2 = (1 - 4/3)^2 / (13/18) = 0.153846
    rows = [
        ("A", 1.0, 1), ("A", 5.0, 0), ("B", 2.0, 1), ("B", 3.0, 1),
    ]
    df = spark.createDataFrame(rows, "grp string, dur double, ev int")
    out = {
        r["group"]: r
        for r in log_rank_test(
            df, group_col="grp", duration_col="dur", event_col="ev"
        ).collect()
    }
    assert out["A"]["observed"] == pytest.approx(1.0)
    assert out["A"]["expected"] == pytest.approx(4.0 / 3.0, abs=1e-6)
    assert out["B"]["observed"] == pytest.approx(2.0)
    assert out["B"]["expected"] == pytest.approx(3.0 - 4.0 / 3.0, abs=1e-6)
    assert out["A"]["chi2"] == pytest.approx(0.153846, abs=1e-5)
    assert out["A"]["chi2"] == out["B"]["chi2"]
    assert out["A"]["df"] == 1


def test_log_rank_rejects_three_groups(spark):
    from knot_another_pipeline_spark.operators.behavior import log_rank_test

    rows = [("A", 1.0, 1), ("B", 2.0, 1), ("C", 3.0, 1)]
    df = spark.createDataFrame(rows, "grp string, dur double, ev int")
    with pytest.raises(ValueError, match="two-group"):
        log_rank_test(
            df, group_col="grp", duration_col="dur", event_col="ev"
        )


def test_log_rank_identical_groups_null_chi2_or_small(spark):
    from knot_another_pipeline_spark.operators.behavior import log_rank_test

    rows = [("A", float(t), 1) for t in range(1, 11)] + [
        ("B", float(t), 1) for t in range(1, 11)
    ]
    df = spark.createDataFrame(rows, "grp string, dur double, ev int")
    out = log_rank_test(
        df, group_col="grp", duration_col="dur", event_col="ev"
    ).collect()
    # identical curves: observed == expected, chi2 == 0
    assert out[0]["chi2"] == pytest.approx(0.0, abs=1e-9)


# ---------------------------------------------------------------------------
# permutation_test


def test_permutation_test_obvious_effect(spark):
    from knot_another_pipeline_spark.operators.evaluation import (
        permutation_test,
    )

    rows = [(i, "t", 100.0 + (i % 3)) for i in range(60)] + [
        (i + 1000, "c", 1.0 + (i % 3)) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id long, arm string, v double")
    got = permutation_test(
        df, id_col="id", arm_col="arm", value_col="v",
        treatment="t", control="c", n_perm=99,
    ).collect()[0]
    assert got["n_treat"] == 60 and got["n_control"] == 60
    assert got["obs_diff"] == pytest.approx(99.0, abs=1e-6)
    assert got["n_perm"] == 99
    assert got["p_value"] == pytest.approx((1 + got["n_extreme"]) / 100.0)
    assert got["p_value"] <= 0.05  # pseudo-arms never reproduce a 99-gap


def test_permutation_test_null_effect_large_p(spark):
    from knot_another_pipeline_spark.operators.evaluation import (
        permutation_test,
    )

    rows = [(i, "t" if i % 2 == 0 else "c", float((i * 17) % 23))
            for i in range(200)]
    df = spark.createDataFrame(rows, "id long, arm string, v double")
    got = permutation_test(
        df, id_col="id", arm_col="arm", value_col="v",
        treatment="t", control="c", n_perm=50,
    ).collect()[0]
    assert got["p_value"] > 0.05
    # deterministic: rerun gives the identical tally
    again = permutation_test(
        df, id_col="id", arm_col="arm", value_col="v",
        treatment="t", control="c", n_perm=50,
    ).collect()[0]
    assert got["n_extreme"] == again["n_extreme"]
    with pytest.raises(ValueError, match="n_perm"):
        permutation_test(
            df, id_col="id", arm_col="arm", value_col="v",
            treatment="t", control="c", n_perm=0,
        )


# ---------------------------------------------------------------------------
# harmonic_centrality


def test_harmonic_centrality_chain_and_isolate(spark):
    from knot_another_pipeline_spark.operators.graph import (
        harmonic_centrality,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src", "dst"]
    )
    roots = spark.createDataFrame([("a",), ("z",)], ["node"])
    out = {
        r["root"]: r
        for r in harmonic_centrality(edges, roots=roots, hops=3).collect()
    }
    assert out["a"]["n_reach"] == 3
    assert out["a"]["harmonic"] == pytest.approx(1 + 0.5 + 1 / 3, abs=1e-6)
    assert out["z"]["n_reach"] == 0
    assert out["z"]["harmonic"] == pytest.approx(0.0)


def test_harmonic_centrality_min_distance_on_cycles(spark):
    from knot_another_pipeline_spark.operators.graph import (
        harmonic_centrality,
    )

    # a->b, a->c, b->c: c is reached at hop 1 (direct), never recounted
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    roots = spark.createDataFrame([("a",)], ["node"])
    got = harmonic_centrality(edges, roots=roots, hops=3).collect()[0]
    assert got["n_reach"] == 2  # b and c; a itself never counted
    assert got["harmonic"] == pytest.approx(2.0)  # both at distance 1
    with pytest.raises(ValueError, match="hops"):
        harmonic_centrality(edges, roots=roots, hops=0)


# ---------------------------------------------------------------------------
# streaming_page_hinkley_feeder


def test_streaming_page_hinkley_feeder_matches_batch(spark, tmp_path):
    """Feeder rows equal the batch per-window aggregates, and feeding
    the accumulated means into page_hinkley reproduces the batch PH
    readout on the window-mean series exactly — the documented
    stream-feeder/batch-view split."""
    from knot_another_pipeline_spark.operators.temporal import page_hinkley
    from knot_another_pipeline_spark.streaming.rollup_stream import (
        streaming_page_hinkley_feeder,
    )

    rows = []
    for h in range(4):
        base = 5.0 if h < 2 else 11.0  # a level shift at hour 2
        for i in range(12):
            rows.append(
                ("m", base + (i % 3) * 0.1, f"2025-01-01 0{h}:{i + 10:02d}:00")
            )
    rows.append(("m", 1.0, "2025-01-03 00:00:00"))  # watermark pusher
    df = spark.createDataFrame(
        rows, "series string, v double, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    src = tmp_path / "ph_in"
    df.write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(df.schema).parquet(str(src))
    out = streaming_page_hinkley_feeder(
        stream,
        ts_col="ts", series_col="series", value_col="v",
        window_duration="1 hour", watermark="1 minute",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ph_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    looks = spark.sql(
        "SELECT * FROM ph_test WHERE win_start < timestamp '2025-01-02'"
    )
    assert looks.count() == 4
    want = (
        df.filter(F.col("ts") < F.lit("2025-01-02").cast("timestamp"))
        .groupBy("series", F.date_trunc("hour", "ts").alias("win_start"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
    )
    got_m = {
        (r["series"], str(r["win_start"])): (r["n"], round(r["total"], 9))
        for r in looks.collect()
    }
    want_m = {
        (r["series"], str(r["win_start"])): (r["n"], round(r["total"], 9))
        for r in want.collect()
    }
    assert got_m == want_m
    # composition: accumulated feeder rows -> the batch PH readout
    means = looks.select(
        "series",
        F.col("win_start").alias("ord"),
        (F.col("total") / F.col("n")).alias("x"),
    )
    via_stream = page_hinkley(
        means, series_col="series", order_col="ord", value_col="x",
        lam=2.0,
    ).collect()[0]
    direct = page_hinkley(
        want.select(
            "series",
            F.col("win_start").alias("ord"),
            (F.col("total") / F.col("n")).alias("x"),
        ),
        series_col="series", order_col="ord", value_col="x", lam=2.0,
    ).collect()[0]
    assert via_stream == direct
    assert via_stream["drift"] is True  # the hour-2 level shift alarms


# ---------------------------------------------------------------------------
# anderson_darling


def _ad_reference(xs, ys):
    pooled = sorted(
        [(v, 1) for v in xs] + [(v, 0) for v in ys],
        key=lambda t: (t[0], -t[1]),
    )
    n, m = len(xs), len(ys)
    nn = n + m
    mi, s = 0, 0.0
    for i, (_, y) in enumerate(pooled[:-1], start=1):
        mi += y
        s += (mi * nn - n * i) ** 2 / (i * (nn - i))
    return s / (n * m)


def test_anderson_darling_matches_reference(spark):
    from knot_another_pipeline_spark.operators.quality import (
        anderson_darling,
    )

    xs = [1.0, 3.0, 5.0, 7.0, 9.0, 11.0]
    ys = [2.0, 4.0, 6.0, 8.0, 10.0]
    rows = [("f", v, 1) for v in xs] + [("f", v, 0) for v in ys]
    df = spark.createDataFrame(rows, "fam string, v double, y int")
    got = anderson_darling(
        df, group_cols=["fam"], value_col="v", class_col="y"
    ).collect()[0]
    assert got["n1"] == 6 and got["n0"] == 5
    assert got["ad_stat"] == pytest.approx(_ad_reference(xs, ys), abs=1e-6)
    assert got["exceeds_5pct"] is False  # interleaved: same distribution


def test_anderson_darling_separated_samples_exceed(spark):
    from knot_another_pipeline_spark.operators.quality import (
        anderson_darling,
    )

    xs = [float(i) for i in range(30)]
    ys = [float(i) + 100.0 for i in range(30)]
    rows = [("f", v, 1) for v in xs] + [("f", v, 0) for v in ys]
    df = spark.createDataFrame(rows, "fam string, v double, y int")
    got = anderson_darling(
        df, group_cols=["fam"], value_col="v", class_col="y"
    ).collect()[0]
    assert got["ad_stat"] == pytest.approx(_ad_reference(xs, ys), abs=1e-6)
    assert got["exceeds_5pct"] is True
    # one-class family: NULL stat
    df1 = spark.createDataFrame(
        [("g", 1.0, 1), ("g", 2.0, 1)], "fam string, v double, y int"
    )
    r1 = anderson_darling(
        df1, group_cols=["fam"], value_col="v", class_col="y"
    ).collect()[0]
    assert r1["ad_stat"] is None


# ---------------------------------------------------------------------------
# krippendorff_alpha


def _kripp_reference(units):
    """units: list of lists of category labels (one list per unit)."""
    pairable = [u for u in units if len(u) >= 2]
    ntot = sum(len(u) for u in pairable)
    cats = sorted({c for u in pairable for c in u})
    do_num = 0.0
    for u in pairable:
        m = len(u)
        for c in cats:
            nuc = u.count(c)
            do_num += nuc * (m - nuc) / (m - 1)
    d_o = do_num / ntot
    nc = {c: sum(u.count(c) for u in pairable) for c in cats}
    d_e = (ntot * ntot - sum(v * v for v in nc.values())) / (
        ntot * (ntot - 1)
    )
    return 1 - d_o / d_e


def test_krippendorff_alpha_matches_reference(spark):
    from knot_another_pipeline_spark.operators.quality import (
        krippendorff_alpha,
    )

    units = [
        ["a", "a", "b"],
        ["b", "b"],
        ["a", "b", "b", "b"],
        ["a"],          # unpairable: excluded, counted
        ["c", "c", "c"],
    ]
    rows = [(i, c) for i, u in enumerate(units) for c in u]
    df = spark.createDataFrame(rows, "unit long, label string")
    got = krippendorff_alpha(
        df, unit_col="unit", value_col="label"
    ).collect()[0]
    assert got["n_units"] == 4
    assert got["n_unpairable"] == 1
    assert got["n_ratings"] == 12
    assert got["k_categories"] == 3
    assert got["alpha"] == pytest.approx(_kripp_reference(units), abs=1e-6)


def test_krippendorff_alpha_degenerate_cases(spark):
    from knot_another_pipeline_spark.operators.quality import (
        krippendorff_alpha,
    )

    # perfect agreement within every unit -> D_o = 0 -> alpha = 1
    rows = [(1, "a"), (1, "a"), (2, "b"), (2, "b")]
    df = spark.createDataFrame(rows, "unit long, label string")
    got = krippendorff_alpha(
        df, unit_col="unit", value_col="label"
    ).collect()[0]
    assert got["alpha"] == pytest.approx(1.0)
    # a single category ever used -> D_e = 0 -> NULL alpha
    rows1 = [(1, "a"), (1, "a"), (2, "a"), (2, "a")]
    df1 = spark.createDataFrame(rows1, "unit long, label string")
    got1 = krippendorff_alpha(
        df1, unit_col="unit", value_col="label"
    ).collect()[0]
    assert got1["alpha"] is None


# ---------------------------------------------------------------------------
# l_diversity_summary


def test_l_diversity_summary_hand_example(spark):
    from knot_another_pipeline_spark.operators.quality import (
        l_diversity_summary,
    )

    rows = (
        # class (x,1): 4 rows, sensitive evenly split -> entropy-l = 2
        [("x", 1, "s1"), ("x", 1, "s1"), ("x", 1, "s2"), ("x", 1, "s2")]
        # class (y,2): 3 rows all same sensitive -> entropy-l = 1
        + [("y", 2, "s1")] * 3
    )
    df = spark.createDataFrame(rows, "q1 string, q2 int, sens string")
    got = l_diversity_summary(
        df, quasi_cols=["q1", "q2"], sensitive_col="sens",
        min_entropy_l=2.0,
    ).collect()[0]
    assert got["n_classes"] == 2 and got["n_rows"] == 7
    assert got["min_class_size"] == 3
    assert got["min_distinct_l"] == 1
    assert got["min_entropy_l"] == pytest.approx(1.0)
    assert got["n_classes_below"] == 1
    assert got["release_ok"] is False
    with pytest.raises(ValueError, match="quasi_cols"):
        l_diversity_summary(df, quasi_cols=[], sensitive_col="sens")


# ---------------------------------------------------------------------------
# tost_equivalence


def _tost_reference(ts, cs, margin):
    nt, nc = len(ts), len(cs)
    mt, mc = sum(ts) / nt, sum(cs) / nc
    vt = sum((x - mt) ** 2 for x in ts) / (nt - 1)
    vc = sum((x - mc) ** 2 for x in cs) / (nc - 1)
    se = math.sqrt(vt / nt + vc / nc)
    diff = mt - mc

    def sf(z):  # exact-enough normal tail for the test tolerance
        return 0.5 * math.erfc(z / math.sqrt(2))

    return diff, se, max(sf((diff + margin) / se), sf((margin - diff) / se))


def test_tost_equivalence_matches_reference(spark):
    from knot_another_pipeline_spark.operators.evaluation import (
        tost_equivalence,
    )

    ts = [10.0 + 0.05 * ((i * 7) % 11) for i in range(50)]
    cs = [10.1 + 0.05 * ((i * 5) % 11) for i in range(50)]
    rows = [("f", "t", v) for v in ts] + [("f", "c", v) for v in cs]
    df = spark.createDataFrame(rows, "fam string, arm string, v double")
    got = tost_equivalence(
        df, group_cols=["fam"], arm_col="arm", value_col="v",
        treatment="t", control="c", margin=1.0,
    ).collect()[0]
    diff, se, p = _tost_reference(ts, cs, 1.0)
    assert got["n_treat"] == 50 and got["n_control"] == 50
    assert got["diff"] == pytest.approx(diff, abs=1e-6)
    assert got["se"] == pytest.approx(se, abs=1e-6)
    # A&S polynomial is good to ~7.5e-8 vs the exact erfc
    assert got["p_tost"] == pytest.approx(p, abs=1e-5)
    assert got["equivalent"] is True  # tiny diff, wide margin


def test_tost_not_equivalent_when_diff_exceeds_margin(spark):
    from knot_another_pipeline_spark.operators.evaluation import (
        tost_equivalence,
    )

    rows = [("f", "t", 15.0 + (i % 3) * 0.1) for i in range(40)] + [
        ("f", "c", 10.0 + (i % 3) * 0.1) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "fam string, arm string, v double")
    got = tost_equivalence(
        df, group_cols=["fam"], arm_col="arm", value_col="v",
        treatment="t", control="c", margin=1.0,
    ).collect()[0]
    assert got["equivalent"] is False
    assert got["p_tost"] > 0.5  # diff = 5 >> margin = 1
    with pytest.raises(ValueError, match="margin"):
        tost_equivalence(
            df, group_cols=["fam"], arm_col="arm", value_col="v",
            treatment="t", control="c", margin=0.0,
        )


# ---------------------------------------------------------------------------
# mantel_haenszel


def _mh_reference(strata):
    """strata: list of (a, b, c, d) 2x2 tuples."""
    sad = sum(a * d / (a + b + c + d) for a, b, c, d in strata)
    sbc = sum(b * c / (a + b + c + d) for a, b, c, d in strata)
    sa = sum(a for a, _, _, _ in strata)
    se_ = sum(
        (a + b) * (a + c) / (a + b + c + d) for a, b, c, d in strata
    )
    sv = sum(
        (a + b) * (c + d) * (a + c) * (b + d)
        / ((a + b + c + d) ** 2 * (a + b + c + d - 1))
        for a, b, c, d in strata
    )
    return sad / sbc, (sa - se_) ** 2 / sv


def test_mantel_haenszel_matches_reference(spark):
    from knot_another_pipeline_spark.operators.evaluation import (
        mantel_haenszel,
    )

    strata = [(10, 5, 4, 12), (8, 9, 3, 14), (15, 6, 7, 10)]
    rows = []
    for s, (a, b, c, d) in enumerate(strata):
        rows += [(f"s{s}", True, True)] * a
        rows += [(f"s{s}", True, False)] * b
        rows += [(f"s{s}", False, True)] * c
        rows += [(f"s{s}", False, False)] * d
    df = spark.createDataFrame(
        rows, "stratum string, exposed boolean, outcome boolean"
    )
    got = mantel_haenszel(
        df, stratum_col="stratum", exposure_col="exposed",
        outcome_col="outcome",
    ).collect()[0]
    or_ref, chi2_ref = _mh_reference(strata)
    assert got["n_strata"] == 3 and got["n_strata_skipped"] == 0
    assert got["n_rows"] == sum(sum(t) for t in strata)
    assert got["or_mh"] == pytest.approx(or_ref, abs=1e-6)
    assert got["cmh_chi2"] == pytest.approx(chi2_ref, abs=1e-6)
    assert got["df"] == 1
    assert 0 < got["p_value"] < 1


def test_mantel_haenszel_skips_tiny_strata(spark):
    from knot_another_pipeline_spark.operators.evaluation import (
        mantel_haenszel,
    )

    rows = [
        ("big", True, True), ("big", True, False),
        ("big", False, True), ("big", False, False),
        ("tiny", True, True),  # n = 1: V undefined, skipped
    ]
    df = spark.createDataFrame(
        rows, "stratum string, exposed boolean, outcome boolean"
    )
    got = mantel_haenszel(
        df, stratum_col="stratum", exposure_col="exposed",
        outcome_col="outcome",
    ).collect()[0]
    assert got["n_strata"] == 1
    assert got["n_strata_skipped"] == 1


# ---------------------------------------------------------------------------
# heaps_law


def test_heaps_law_matches_reference(spark):
    from knot_another_pipeline_spark.operators.text_analysis import heaps_law

    # vocabulary grows as new words appear in later docs
    docs = []
    for i in range(20):
        words = [f"w{j}" for j in range(0, 5 + i * 2)]
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = heaps_law(
        df, id_col="doc_id", text_col="text", n_checkpoints=5
    ).collect()[0]
    # pure-python reference on the same checkpoint construction
    toks = {i: t.lower().split() for i, t in docs}
    order = sorted(toks)
    first = {}
    for rank, i in enumerate(order, start=1):
        for t in toks[i]:
            first.setdefault(t, rank)
    D = len(order)
    pts = []
    for j in range(1, 6):
        c = math.ceil(j * D / 5)
        n_c = sum(len(toks[order[r - 1]]) for r in range(1, c + 1))
        v_c = sum(1 for r in first.values() if r <= c)
        if n_c > 0 and v_c > 0:
            pts.append((math.log(n_c), math.log(v_c)))
    k = len(pts)
    su = sum(u for u, _ in pts)
    sv = sum(v for _, v in pts)
    suu = sum(u * u for u, _ in pts)
    suv = sum(u * v for u, v in pts)
    beta = (suv - su * sv / k) / (suu - su * su / k)
    k_coef = math.exp(sv / k - beta * su / k)
    assert got["n_docs"] == 20
    assert got["n_tokens"] == sum(len(t) for t in toks.values())
    assert got["vocab"] == len(first)
    assert got["beta"] == pytest.approx(beta, abs=1e-6)
    assert got["k_coef"] == pytest.approx(k_coef, abs=1e-5)
    assert 0 < got["beta"] <= 1.2
    with pytest.raises(ValueError, match="n_checkpoints"):
        heaps_law(df, id_col="doc_id", text_col="text", n_checkpoints=1)


def test_heaps_law_saturated_corpus_low_beta(spark):
    from knot_another_pipeline_spark.operators.text_analysis import heaps_law

    # every doc repeats the same 5 words: vocabulary saturates at once
    df = spark.createDataFrame(
        [(i, "a b c d e") for i in range(30)], ["doc_id", "text"]
    )
    got = heaps_law(
        df, id_col="doc_id", text_col="text", n_checkpoints=5
    ).collect()[0]
    assert got["vocab"] == 5
    assert got["beta"] == pytest.approx(0.0, abs=1e-6)


# ---------------------------------------------------------------------------
# tail_dependence


def test_tail_dependence_comonotone_vs_independent(spark):
    from knot_another_pipeline_spark.operators.quality import tail_dependence

    # comonotone: y = x -> both tails fully dependent
    rows = [(float(i), float(i)) for i in range(200)]
    df = spark.createDataFrame(rows, "x double, y double")
    got = tail_dependence(df, x_col="x", y_col="y", q=0.9).collect()[0]
    assert got["lambda_upper"] == pytest.approx(1.0)
    assert got["lambda_lower"] == pytest.approx(1.0)
    # anti-monotone: y = -x -> tails never co-occur
    rows2 = [(float(i), float(-i)) for i in range(200)]
    df2 = spark.createDataFrame(rows2, "x double, y double")
    got2 = tail_dependence(df2, x_col="x", y_col="y", q=0.9).collect()[0]
    assert got2["lambda_upper"] == pytest.approx(0.0)
    assert got2["lambda_lower"] == pytest.approx(0.0)
    with pytest.raises(ValueError, match="q must"):
        tail_dependence(df, x_col="x", y_col="y", q=0.4)


def test_tail_dependence_matches_bruteforce(spark):
    from knot_another_pipeline_spark.operators.quality import tail_dependence

    rows = [
        (float((i * 17) % 101), float((i * 29) % 103)) for i in range(150)
    ]
    df = spark.createDataFrame(rows, "x double, y double")
    q = 0.8
    got = tail_dependence(df, x_col="x", y_col="y", q=q).collect()[0]

    def pct(vals, p):  # linear interpolation like Spark's percentile
        s = sorted(vals)
        pos = (len(s) - 1) * p
        lo = int(math.floor(pos))
        g = pos - lo
        return s[lo] if g == 0 else s[lo] * (1 - g) + s[lo + 1] * g

    xs = [r[0] for r in rows]
    ys = [r[1] for r in rows]
    xq, yq = pct(xs, q), pct(ys, q)
    xl, yl = pct(xs, 1 - q), pct(ys, 1 - q)
    n_hi = sum(1 for x in xs if x > xq)
    both_hi = sum(1 for x, y in rows if x > xq and y > yq)
    n_lo = sum(1 for x in xs if x <= xl)
    both_lo = sum(1 for x, y in rows if x <= xl and y <= yl)
    assert got["n_x_hi"] == n_hi
    assert got["lambda_upper"] == pytest.approx(both_hi / n_hi, abs=1e-6)
    assert got["lambda_lower"] == pytest.approx(both_lo / n_lo, abs=1e-6)


# ---------------------------------------------------------------------------
# control_chart


def test_control_chart_rules_fire_correctly(spark):
    from knot_another_pipeline_spark.operators.temporal import control_chart

    # stable series with one huge spike: R1 fires at the spike
    xs = [10.0, 12.0] * 15 + [100.0] + [10.0, 12.0] * 15
    rows = [("s", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "series string, ord int, x double")
    got = control_chart(
        df, series_col="series", order_col="ord", value_col="x"
    ).collect()[0]
    assert got["n_r1"] >= 1
    assert got["n_flagged"] >= 1
    assert got["first_flag_ord"] is not None
    # constant series: sigma = 0, flags nothing by contract
    dfc = spark.createDataFrame(
        [("c", i, 5.0) for i in range(20)],
        "series string, ord int, x double",
    )
    gc = control_chart(
        dfc, series_col="series", order_col="ord", value_col="x"
    ).collect()[0]
    assert gc["sigma"] == pytest.approx(0.0)
    assert gc["n_flagged"] == 0
    assert gc["first_flag_ord"] is None


def test_control_chart_r4_same_side_run(spark):
    from knot_another_pipeline_spark.operators.temporal import control_chart

    # alternate around the mean, then 8+ points slightly above it:
    # no 1/2/3-sigma breach, but R4 (8 same side) must fire
    xs = [0.0, 4.0] * 12 + [2.5] * 9
    rows = [("s", i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "series string, ord int, x double")
    got = control_chart(
        df, series_col="series", order_col="ord", value_col="x"
    ).collect()[0]
    assert got["n_r4"] >= 1
    mu = sum(xs) / len(xs)
    sig = math.sqrt(sum((x - mu) ** 2 for x in xs) / len(xs))
    assert got["mean"] == pytest.approx(mu, abs=1e-6)
    assert got["sigma"] == pytest.approx(sig, abs=1e-6)
    # the completing point of the first 8-run above the mean
    first_r4 = None
    side = [1 if x > mu else 0 for x in xs]
    for i in range(7, len(xs)):
        w = side[i - 7 : i + 1]
        if sum(w) in (0, 8):
            first_r4 = i
            break
    assert got["first_flag_ord"] == first_r4


# ---------------------------------------------------------------------------
# abc_classes


def test_abc_classes_hand_example(spark):
    from knot_another_pipeline_spark.operators.relational import abc_classes

    rows = [
        ("k1", 50.0), ("k2", 30.0), ("k3", 10.0), ("k4", 6.0),
        ("k5", 4.0),
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    out = {r["key"]: r for r in abc_classes(
        df, key_col="k", value_col="v"
    ).collect()}
    # cum shares: .5, .8, .9, .96, 1.0
    assert out["k1"]["abc_class"] == "A"
    assert out["k2"]["abc_class"] == "A"  # cum .8 <= a_cut
    assert out["k3"]["abc_class"] == "B"
    assert out["k4"]["abc_class"] == "C"  # cum .96 > b_cut
    assert out["k5"]["abc_class"] == "C"
    assert out["k1"]["share"] == pytest.approx(0.5)
    assert out["k2"]["cum_share"] == pytest.approx(0.8)


def test_abc_classes_single_dominant_key_is_a(spark):
    from knot_another_pipeline_spark.operators.relational import abc_classes

    rows = [("big", 99.0), ("tiny", 1.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    out = {r["key"]: r for r in abc_classes(
        df, key_col="k", value_col="v"
    ).collect()}
    assert out["big"]["abc_class"] == "A"  # cum .99 > .8 but rank 1
    assert out["tiny"]["abc_class"] == "C"
    with pytest.raises(ValueError, match="a_cut"):
        abc_classes(df, key_col="k", value_col="v", a_cut=0.9, b_cut=0.5)


# ---------------------------------------------------------------------------
# degenerate inputs must emit rows, never vanish (the twonn ADVICE class)


def test_degenerate_families_still_emit_rows(spark):
    from knot_another_pipeline_spark.operators.quality import (
        friedman_test,
        wilcoxon_signed_rank,
    )
    from knot_another_pipeline_spark.operators.temporal import (
        dickey_fuller,
        runs_test,
    )

    # wilcoxon: one family all-tied, one normal
    wdf = spark.createDataFrame(
        [("tied", 1.0, 1.0), ("tied", 2.0, 2.0),
         ("ok", 3.0, 1.0), ("ok", 1.0, 2.0), ("ok", 5.0, 1.0)],
        "fam string, a double, b double",
    )
    w = {r["fam"]: r for r in wilcoxon_signed_rank(
        wdf, group_cols=["fam"], a_col="a", b_col="b"
    ).collect()}
    assert set(w) == {"tied", "ok"}
    assert w["tied"]["n_pairs"] == 0 and w["tied"]["n_zero"] == 2
    assert w["tied"]["w_plus"] == 0.0 and w["tied"]["z"] is None

    # friedman: one family with ONLY incomplete blocks
    fdf = spark.createDataFrame(
        [("bad", "b1", "t1", 1.0),          # missing t2: incomplete
         ("bad", "b2", "t2", 2.0),          # missing t1: incomplete
         ("good", "b1", "t1", 1.0), ("good", "b1", "t2", 2.0),
         ("good", "b2", "t1", 3.0), ("good", "b2", "t2", 1.0)],
        "fam string, blk string, trt string, v double",
    )
    f = {r["fam"]: r for r in friedman_test(
        fdf, group_cols=["fam"], block_col="blk", treatment_col="trt",
        value_col="v",
    ).collect()}
    assert set(f) == {"bad", "good"}
    assert f["bad"]["n_blocks"] == 0 and f["bad"]["n_incomplete"] == 2
    assert f["bad"]["k_treatments"] == 2
    assert f["bad"]["q_corrected"] is None and f["bad"]["p_value"] is None
    assert f["good"]["n_blocks"] == 2

    # runs_test: one constant series (every value AT the median)
    rdf = spark.createDataFrame(
        [("flat", i, 5.0) for i in range(6)]
        + [("ok", i, float(i % 3)) for i in range(9)],
        "series string, ord int, x double",
    )
    r = {x["series"]: x for x in runs_test(
        rdf, series_col="series", order_col="ord", value_col="x"
    ).collect()}
    assert set(r) == {"flat", "ok"}
    assert r["flat"]["n_above"] == 0 and r["flat"]["runs"] == 0
    assert r["flat"]["z"] is None and r["flat"]["p_value"] is None

    # dickey_fuller: a single-point series
    ddf = spark.createDataFrame(
        [("one", 0, 5.0)]
        + [("ok", i, float((i * 7) % 5)) for i in range(10)],
        "series string, ord int, y double",
    )
    d = {x["series"]: x for x in dickey_fuller(
        ddf, series_col="series", order_col="ord", value_col="y"
    ).collect()}
    assert set(d) == {"one", "ok"}
    assert d["one"]["n_diffs"] == 0
    assert d["one"]["gamma"] is None and d["one"]["t_stat"] is None
    assert d["ok"]["n_diffs"] == 9


# ---------------------------------------------------------------------------
# rouge_n


def _rouge_reference(cand, ref, n):
    def grams(t):
        toks = t.lower().split()
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    from collections import Counter

    cc, cr = Counter(grams(cand)), Counter(grams(ref))
    overlap = sum(min(c, cr[g]) for g, c in cc.items())
    nc, nr = sum(cc.values()), sum(cr.values())
    rec = overlap / nr if nr else None
    prec = overlap / nc if nc else None
    return nc, nr, overlap, rec, prec


def test_rouge_n_matches_reference(spark):
    from knot_another_pipeline_spark.operators.text_analysis import rouge_n

    pairs = [
        (1, "the cat sat on the mat", "the cat lay on the mat"),
        (2, "a a a a", "a a b"),          # clipping matters here
        (3, "completely different words", "nothing shared at all"),
        (4, "one", "two words here"),     # cand too short for bigrams
    ]
    df = spark.createDataFrame(pairs, ["pid", "cand", "ref"])
    out = {
        r["id"]: r
        for r in rouge_n(
            df, id_col="pid", cand_col="cand", ref_col="ref", n=2
        ).collect()
    }
    for pid, cand, ref in pairs:
        nc, nr, ov, rec, prec = _rouge_reference(cand, ref, 2)
        r = out[pid]
        assert r["n_cand_grams"] == nc
        assert r["n_ref_grams"] == nr
        assert r["n_overlap"] == ov
        if rec is None:
            assert r["rouge_recall"] is None
        else:
            assert r["rouge_recall"] == pytest.approx(rec, abs=1e-6)
        if prec is None:
            assert r["rouge_precision"] is None
        else:
            assert r["rouge_precision"] == pytest.approx(prec, abs=1e-6)
    # clipping: "a a a a" vs "a a b" shares min(3,1)=1 "a a" bigram...
    assert out[2]["n_overlap"] == 1
    # zero-overlap pair: F1 = 0.0, not NULL
    assert out[3]["rouge_f1"] == 0.0
    with pytest.raises(ValueError, match="n must"):
        rouge_n(df, id_col="pid", cand_col="cand", ref_col="ref", n=0)


def test_rouge_n_identical_texts_perfect(spark):
    from knot_another_pipeline_spark.operators.text_analysis import rouge_n

    df = spark.createDataFrame(
        [(1, "same exact text here", "same exact text here")],
        ["pid", "cand", "ref"],
    )
    r = rouge_n(
        df, id_col="pid", cand_col="cand", ref_col="ref", n=1
    ).collect()[0]
    assert r["rouge_recall"] == 1.0 and r["rouge_precision"] == 1.0
    assert r["rouge_f1"] == 1.0


# ---------------------------------------------------------------------------
# token_jsd


def _jsd_reference(groups):
    """groups: dict group -> list of tokens. JSD of each vs the rest."""
    from collections import Counter

    out = {}
    for g, toks in groups.items():
        rest = [t for og, ts in groups.items() if og != g for t in ts]
        if not rest:
            out[g] = None
            continue
        cp, cq = Counter(toks), Counter(rest)
        np_, nq = len(toks), len(rest)
        jsd = 0.0
        for t in set(cp) | set(cq):
            p = cp[t] / np_
            q = cq[t] / nq
            m = (p + q) / 2
            if p > 0:
                jsd += 0.5 * p * math.log2(p / m)
            if q > 0:
                jsd += 0.5 * q * math.log2(q / m)
        out[g] = jsd
    return out


def test_token_jsd_matches_reference(spark):
    from knot_another_pipeline_spark.operators.text_analysis import token_jsd

    groups = {
        "news": "the stock market rose today the market was up".split(),
        "code": "def foo return x def bar return y".split(),
        "mixed": "the market def foo today y".split(),
    }
    rows = [(g, " ".join(toks)) for g, toks in groups.items()]
    df = spark.createDataFrame(rows, "src string, text string")
    out = {
        r["group"]: r
        for r in token_jsd(df, group_col="src", text_col="text").collect()
    }
    ref = _jsd_reference(groups)
    for g in groups:
        assert out[g]["n_tokens"] == len(groups[g])
        assert out[g]["jsd"] == pytest.approx(ref[g], abs=1e-6)
    # disjoint-vocabulary group diverges more than the overlapping one
    assert out["code"]["jsd"] > out["mixed"]["jsd"]


def test_token_jsd_single_group_null(spark):
    from knot_another_pipeline_spark.operators.text_analysis import token_jsd

    df = spark.createDataFrame(
        [("only", "a b c a")], "src string, text string"
    )
    r = token_jsd(df, group_col="src", text_col="text").collect()[0]
    assert r["jsd"] is None
    assert r["vocab"] == 3


# ---------------------------------------------------------------------------
# distribution_overlap


def test_distribution_overlap_identical_and_disjoint(spark):
    from knot_another_pipeline_spark.operators.quality import (
        distribution_overlap,
    )

    same = [("f", float(i % 10), y) for i in range(100) for y in (0, 1)]
    df = spark.createDataFrame(same, "fam string, v double, y int")
    r = distribution_overlap(
        df, group_cols=["fam"], value_col="v", class_col="y", n_bins=10
    ).collect()[0]
    assert r["ovl"] == pytest.approx(1.0)
    disj = [("f", float(i % 10), 1) for i in range(50)] + [
        ("f", 100.0 + (i % 10), 0) for i in range(50)
    ]
    df2 = spark.createDataFrame(disj, "fam string, v double, y int")
    r2 = distribution_overlap(
        df2, group_cols=["fam"], value_col="v", class_col="y", n_bins=10
    ).collect()[0]
    assert r2["ovl"] == pytest.approx(0.0)
    with pytest.raises(ValueError, match="n_bins"):
        distribution_overlap(
            df, group_cols=["fam"], value_col="v", class_col="y", n_bins=0
        )


def test_distribution_overlap_matches_reference(spark):
    from knot_another_pipeline_spark.operators.quality import (
        distribution_overlap,
    )

    rows = [("f", float((i * 7) % 23), i % 2) for i in range(200)]
    df = spark.createDataFrame(rows, "fam string, v double, y int")
    nb = 8
    got = distribution_overlap(
        df, group_cols=["fam"], value_col="v", class_col="y", n_bins=nb
    ).collect()[0]
    vs = [(v, y) for _, v, y in rows]
    lo, hi = min(v for v, _ in vs), max(v for v, _ in vs)
    w = (hi - lo) / nb
    from collections import Counter

    b1 = Counter(min(nb - 1, int((v - lo) // w)) for v, y in vs if y == 1)
    b0 = Counter(min(nb - 1, int((v - lo) // w)) for v, y in vs if y == 0)
    n1, n0 = sum(b1.values()), sum(b0.values())
    ovl = sum(min(b1[b] / n1, b0[b] / n0) for b in range(nb))
    assert got["ovl"] == pytest.approx(ovl, abs=1e-6)
    # degenerate family (all values equal): one bin, full overlap
    dfd = spark.createDataFrame(
        [("d", 5.0, y) for y in (0, 1) for _ in range(3)],
        "fam string, v double, y int",
    )
    gd = distribution_overlap(
        dfd, group_cols=["fam"], value_col="v", class_col="y"
    ).collect()[0]
    assert gd["ovl"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# cliffs_delta


def test_cliffs_delta_matches_bruteforce(spark):
    from knot_another_pipeline_spark.operators.quality import cliffs_delta

    x1 = [3.0, 5.0, 7.0, 5.0, 9.0]
    x0 = [1.0, 5.0, 2.0, 4.0]
    rows = [("f", v, 1) for v in x1] + [("f", v, 0) for v in x0]
    df = spark.createDataFrame(rows, "fam string, v double, y int")
    got = cliffs_delta(
        df, group_cols=["fam"], value_col="v", class_col="y"
    ).collect()[0]
    wins = sum(1 for a in x1 for b in x0 if a > b)
    losses = sum(1 for a in x1 for b in x0 if a < b)
    delta = (wins - losses) / (len(x1) * len(x0))
    assert got["delta"] == pytest.approx(delta, abs=1e-6)
    assert got["n1"] == 5 and got["n0"] == 4
    assert got["magnitude"] in (
        "negligible", "small", "medium", "large"
    )
    # one-class family: NULL delta and magnitude
    df1 = spark.createDataFrame(
        [("g", 1.0, 1), ("g", 2.0, 1)], "fam string, v double, y int"
    )
    g1 = cliffs_delta(
        df1, group_cols=["fam"], value_col="v", class_col="y"
    ).collect()[0]
    assert g1["delta"] is None and g1["magnitude"] is None


def test_cliffs_delta_extremes(spark):
    from knot_another_pipeline_spark.operators.quality import cliffs_delta

    rows = [("f", float(i + 100), 1) for i in range(10)] + [
        ("f", float(i), 0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "fam string, v double, y int")
    got = cliffs_delta(
        df, group_cols=["fam"], value_col="v", class_col="y"
    ).collect()[0]
    assert got["delta"] == pytest.approx(1.0)
    assert got["magnitude"] == "large"
