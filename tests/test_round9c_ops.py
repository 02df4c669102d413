"""Round-9 late additions, batch c (round-10 window leads): the
paired-classifier test family (McNemar, Cochran's Q), the
Hosmer–Lemeshow calibration GOF, and the experiment sensitivity (MDE /
power) readout — each checked against an in-Python brute force plus
the degenerate cases the closed forms must survive (no discordant
pairs, incomplete blocks, unanimous items, single-row arms).
"""

from __future__ import annotations

import math
import random
from collections import defaultdict

import pytest

from knot_another_pipeline_spark.operators.evaluation import (
    cochran_q,
    hosmer_lemeshow,
    mcnemar_readout,
    mde_power,
)


# ---------------------------------------------------------------------------
# mcnemar_readout


def test_mcnemar_matches_bruteforce(spark):
    rng = random.Random(7)
    rows = [(i, rng.random() < 0.6, rng.random() < 0.5) for i in range(500)]
    out = mcnemar_readout(
        spark.createDataFrame(rows, ["id", "a_ok", "b_ok"]),
        a_correct_col="a_ok",
        b_correct_col="b_ok",
    ).collect()[0]
    n10 = sum(1 for _, a, b in rows if a and not b)
    n01 = sum(1 for _, a, b in rows if b and not a)
    z = (abs(n10 - n01) - 1) / math.sqrt(n10 + n01)
    assert out["n"] == len(rows)
    assert out["only_a"] == n10 and out["only_b"] == n01
    assert out["both_correct"] == sum(1 for _, a, b in rows if a and b)
    assert abs(out["z"] - z) < 1e-6
    assert 0 <= out["p_value"] <= 1


def test_mcnemar_no_discordant_pairs_is_null(spark):
    rows = [(i, True, True) for i in range(10)] + [
        (i, False, False) for i in range(10, 15)
    ]
    out = mcnemar_readout(
        spark.createDataFrame(rows, ["id", "a_ok", "b_ok"]),
        a_correct_col="a_ok",
        b_correct_col="b_ok",
    ).collect()[0]
    assert out["z"] is None and out["p_value"] is None
    assert out["n"] == 15 and out["both_correct"] == 10


def test_mcnemar_grouped_and_null_rows_excluded(spark):
    rows = [
        ("g1", True, False),
        ("g1", True, False),
        ("g1", False, True),
        ("g1", None, True),  # unscored by A -> excluded
        ("g2", False, True),
        ("g2", True, True),
    ]
    got = {
        r["g"]: r
        for r in mcnemar_readout(
            spark.createDataFrame(rows, ["g", "a_ok", "b_ok"]),
            a_correct_col="a_ok",
            b_correct_col="b_ok",
            group_cols=["g"],
        ).collect()
    }
    assert got["g1"]["n"] == 3
    assert got["g1"]["only_a"] == 2 and got["g1"]["only_b"] == 1
    # z = (|2-1|-1)/sqrt(3) = 0 -> p = 1
    assert got["g1"]["z"] == 0.0 and got["g1"]["p_value"] == pytest.approx(
        1.0, abs=1e-6
    )
    assert got["g2"]["n"] == 2 and got["g2"]["only_b"] == 1


# ---------------------------------------------------------------------------
# cochran_q


def _brute_q(items, k):
    cnt = defaultdict(int)
    for i, _, _ in items:
        cnt[i] += 1
    keep = {i for i, c in cnt.items() if c == k}
    L = defaultdict(int)
    G = defaultdict(int)
    for i, t, y in items:
        if i in keep:
            L[i] += y
            G[t] += y
    T = sum(L.values())
    gg = sum((g - T / k) ** 2 for g in G.values())
    ll = sum(v * v for v in L.values())
    denom = k * T - ll
    q = k * (k - 1) * gg / denom if denom > 0 else None
    return len(keep), q


def test_cochran_q_matches_bruteforce_and_drops_incomplete(spark):
    rng = random.Random(11)
    k = 3
    items = [
        (i, f"m{t}", int(rng.random() < 0.3 + 0.15 * t))
        for i in range(200)
        for t in range(k)
    ]
    # item 5 is missing one treatment: the completeness filter drops it
    items = [r for r in items if not (r[0] == 5 and r[1] == "m1")]
    out = cochran_q(
        spark.createDataFrame(items, ["item", "model", "ok"]),
        item_col="item",
        treatment_col="model",
        success_col="ok",
    ).collect()[0]
    n_keep, q = _brute_q(items, k)
    assert out["n_items"] == n_keep == 199
    assert out["k_treatments"] == k and out["df"] == k - 1
    assert abs(out["q_stat"] - q) < 1e-6
    assert 0 <= out["p_value"] <= 1


def test_cochran_q_at_k2_reduces_to_uncorrected_mcnemar(spark):
    """Cochran's Q with two treatments IS McNemar's chi-square without
    the continuity correction: Q = (n10 - n01)^2 / (n10 + n01)."""
    rng = random.Random(3)
    pairs = [(i, rng.random() < 0.6, rng.random() < 0.4) for i in range(300)]
    long = [(i, "a", int(a)) for i, a, _ in pairs] + [
        (i, "b", int(b)) for i, _, b in pairs
    ]
    out = cochran_q(
        spark.createDataFrame(long, ["item", "model", "ok"]),
        item_col="item",
        treatment_col="model",
        success_col="ok",
    ).collect()[0]
    n10 = sum(1 for _, a, b in pairs if a and not b)
    n01 = sum(1 for _, a, b in pairs if b and not a)
    assert out["q_stat"] == pytest.approx(
        (n10 - n01) ** 2 / (n10 + n01), abs=1e-6
    )
    assert out["df"] == 1


def test_cochran_q_unanimous_items_yield_null(spark):
    """Every item all-success or all-failure: k*T == sum(L^2), the
    denominator is 0 and Q/p must be NULL, not a division error."""
    long = [(i, t, int(i % 2 == 0)) for i in range(20) for t in ("a", "b")]
    out = cochran_q(
        spark.createDataFrame(long, ["item", "model", "ok"]),
        item_col="item",
        treatment_col="model",
        success_col="ok",
    ).collect()[0]
    assert out["n_items"] == 20
    assert out["q_stat"] is None and out["p_value"] is None


# ---------------------------------------------------------------------------
# hosmer_lemeshow


def _brute_hl(rows, bins):
    srt = sorted(rows, key=lambda r: (r[1], r[0]))
    n = len(srt)
    acc = defaultdict(lambda: [0, 0.0, 0.0])
    for r, (_, s, y) in enumerate(srt):
        b = (r * bins) // n
        acc[b][0] += 1
        acc[b][1] += y
        acc[b][2] += s
    chi2, nb = 0.0, 0
    for ng, o, e in acc.values():
        if 0 < e < ng:
            nb += 1
            chi2 += (o - e) ** 2 / (e * (1 - e / ng))
    return chi2, nb


def test_hosmer_lemeshow_matches_bruteforce(spark):
    rng = random.Random(5)
    rows = []
    for i in range(1000):
        s = min(max(rng.random(), 1e-3), 1 - 1e-3)
        rows.append((i, s, 1 if rng.random() < s else 0))
    out = hosmer_lemeshow(
        spark.createDataFrame(rows, ["id", "score", "y"]).repartition(8),
        score_col="score",
        label_col="y",
        id_col="id",
        bins=10,
    ).collect()[0]
    chi2, nb = _brute_hl(rows, 10)
    assert out["n"] == 1000 and out["n_bins_valid"] == nb
    assert abs(out["chi2"] - chi2) < 1e-4
    assert out["df"] == nb - 2
    assert 0 <= out["p_value"] <= 1


def test_hosmer_lemeshow_excludes_degenerate_bins(spark):
    """A top decile whose scores are exactly 1.0 has E == n_g — zero
    variance, excluded from chi2 with df shrinking alongside."""
    rng = random.Random(9)
    rows = [(i, 0.2 + 0.5 * rng.random(), rng.randint(0, 1))
            for i in range(450)]
    rows += [(1000 + i, 1.0, 1) for i in range(50)]  # degenerate top bin
    out = hosmer_lemeshow(
        spark.createDataFrame(rows, ["id", "score", "y"]),
        score_col="score",
        label_col="y",
        id_col="id",
        bins=10,
    ).collect()[0]
    chi2, nb = _brute_hl(rows, 10)
    assert nb == 9  # brute force agrees the bin is degenerate
    assert out["n_bins_valid"] == 9 and out["df"] == 7
    assert abs(out["chi2"] - chi2) < 1e-4


def test_hosmer_lemeshow_rejects_tiny_bins():
    # the bins guard fires before the DataFrame is touched
    with pytest.raises(ValueError, match="bins"):
        hosmer_lemeshow(
            None, score_col="s", label_col="y", id_col="i", bins=2
        )


# ---------------------------------------------------------------------------
# mde_power


def _var(xs):
    m = sum(xs) / len(xs)
    return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)


def test_mde_power_matches_bruteforce(spark):
    rng = random.Random(13)
    rows = [
        ("c" if rng.random() < 0.5 else "t", rng.gauss(10, 3))
        for _ in range(2000)
    ]
    out = mde_power(
        spark.createDataFrame(rows, ["arm", "v"]),
        arm_col="arm",
        value_col="v",
        control="c",
        treatment="t",
    ).collect()[0]
    cs = [v for a, v in rows if a == "c"]
    ts = [v for a, v in rows if a == "t"]
    se = math.sqrt(_var(cs) / len(cs) + _var(ts) / len(ts))
    zsum = 1.959963984540054 + 0.8416212335729143
    diff = sum(ts) / len(ts) - sum(cs) / len(cs)
    assert out["n_control"] == len(cs) and out["n_treatment"] == len(ts)
    assert abs(out["se"] - se) < 1e-6
    assert abs(out["mde_abs"] - zsum * se) < 1e-6
    assert out["diff"] == pytest.approx(diff, abs=1e-6)
    assert out["n_per_arm_next"] == math.ceil(
        zsum * zsum * (_var(cs) + _var(ts)) / diff**2
    )
    assert 0 <= out["power_at_observed"] <= 1


def test_mde_power_single_row_arm_is_null(spark):
    rows = [("c", 1.0), ("c", 2.0), ("t", 5.0)]
    out = mde_power(
        spark.createDataFrame(rows, ["arm", "v"]),
        arm_col="arm",
        value_col="v",
        control="c",
        treatment="t",
    ).collect()[0]
    assert out["n_treatment"] == 1
    assert out["se"] is None and out["mde_abs"] is None
    assert out["power_at_observed"] is None


def test_mde_power_other_arms_ignored(spark):
    rows = [("c", 1.0), ("c", 3.0), ("t", 2.0), ("t", 4.0), ("x", 99.0)]
    out = mde_power(
        spark.createDataFrame(rows, ["arm", "v"]),
        arm_col="arm",
        value_col="v",
        control="c",
        treatment="t",
    ).collect()[0]
    assert out["n_control"] == 2 and out["n_treatment"] == 2
    assert out["mean_treatment"] == pytest.approx(3.0)


# ---------------------------------------------------------------------------
# oneway_anova / levene_test


def _brute_anova_f(pts):
    groups = {}
    for c, v in pts:
        groups.setdefault(c, []).append(v)
    n = sum(len(g) for g in groups.values())
    k = len(groups)
    gm = sum(sum(g) for g in groups.values()) / n
    ssb = sum(len(g) * (sum(g) / len(g) - gm) ** 2 for g in groups.values())
    ssw = sum(
        sum((x - sum(g) / len(g)) ** 2 for x in g) for g in groups.values()
    )
    return (ssb / (k - 1)) / (ssw / (n - k)), ssb / (ssb + ssw)


def test_oneway_anova_matches_bruteforce_and_discriminates(spark):
    from knot_another_pipeline_spark.operators.quality import oneway_anova

    rng = random.Random(7)
    rows = []
    for i in range(900):
        c = str(i % 3)
        rows.append(("shift", c, rng.gauss(10 + 2 * int(c), 2)))
        rows.append(("spread", c, rng.gauss(10, 1 + 2 * int(c))))
    got = {
        r["family"]: r
        for r in oneway_anova(
            spark.createDataFrame(
                rows, "family string, cls string, v double"
            ),
            group_cols=["family"],
            value_col="v",
            class_col="cls",
        ).collect()
    }
    for fam in ("shift", "spread"):
        pts = [(c, v) for f, c, v in rows if f == fam]
        f_stat, eta = _brute_anova_f(pts)
        assert abs(got[fam]["f_stat"] - f_stat) < 1e-4
        assert abs(got[fam]["eta_sq"] - eta) < 1e-6
        assert got[fam]["df1"] == 2 and got[fam]["df2"] == 897
    # mean shift is ANOVA's signal; pure variance spread is not
    assert got["shift"]["p_value"] < 1e-4
    assert got["spread"]["p_value"] > 0.05


def test_oneway_anova_degenerate_families_are_null(spark):
    from knot_another_pipeline_spark.operators.quality import oneway_anova

    rows = [("one_class", "a", float(v)) for v in range(10)] + [
        ("constant", c, 5.0) for c in "ab" for _ in range(5)
    ]
    got = {
        r["family"]: r
        for r in oneway_anova(
            spark.createDataFrame(rows, "family string, cls string, v double"),
            group_cols=["family"],
            value_col="v",
            class_col="cls",
        ).collect()
    }
    assert got["one_class"]["f_stat"] is None  # k < 2
    assert got["constant"]["f_stat"] is None  # ssw == 0
    assert got["constant"]["p_value"] is None


def test_levene_matches_bruteforce_and_discriminates(spark):
    import statistics

    from knot_another_pipeline_spark.operators.quality import levene_test

    rng = random.Random(7)
    rows = []
    for i in range(900):
        c = str(i % 3)
        rows.append(("shift", c, rng.gauss(10 + 2 * int(c), 2)))
        rows.append(("spread", c, rng.gauss(10, 1 + 2 * int(c))))
    got = {
        r["family"]: r
        for r in levene_test(
            spark.createDataFrame(
                rows, "family string, cls string, v double"
            ),
            group_cols=["family"],
            value_col="v",
            class_col="cls",
        ).collect()
    }
    for fam in ("shift", "spread"):
        pts = [(c, v) for f, c, v in rows if f == fam]
        groups = {}
        for c, v in pts:
            groups.setdefault(c, []).append(v)
        zs = []
        for c, g in groups.items():
            med = statistics.median(g)
            zs += [(c, abs(x - med)) for x in g]
        w, _ = _brute_anova_f(zs)
        assert abs(got[fam]["w_stat"] - w) < 1e-4
    # Brown-Forsythe's signal is the variance spread, not the mean shift
    assert got["spread"]["p_value"] < 1e-3
    assert got["shift"]["p_value"] > 0.05


# ---------------------------------------------------------------------------
# periodogram / lag_correlation


def test_periodogram_finds_planted_cycle(spark):
    from knot_another_pipeline_spark.operators.temporal import periodogram

    rng = random.Random(7)
    rows = [
        (
            "s",
            t,
            10 + 5 * math.cos(2 * math.pi * t / 24) + rng.gauss(0, 0.5),
        )
        for t in range(720)
    ]
    out = periodogram(
        spark.createDataFrame(rows, "series string, t long, y double"),
        series_col="series",
        t_col="t",
        value_col="y",
        periods=[6.0, 12.0, 24.0, 168.0],
    ).collect()
    dom = [r for r in out if r["is_dominant"]]
    assert len(dom) == 1 and dom[0]["period"] == 24.0
    # the fitted cosine amplitude recovers the planted 5
    assert abs(dom[0]["amplitude"] - 5) < 0.2
    # brute-force var_share at the planted period
    n = len(rows)
    ys = [y for _, _, y in rows]
    mean = sum(ys) / n
    var = sum(y * y for y in ys) / n - mean * mean
    c = sum(
        y * math.cos(2 * math.pi * t / 24) for _, t, y in rows
    ) - mean * sum(math.cos(2 * math.pi * t / 24) for _, t, _ in rows)
    s = sum(
        y * math.sin(2 * math.pi * t / 24) for _, t, y in rows
    ) - mean * sum(math.sin(2 * math.pi * t / 24) for _, t, _ in rows)
    share = (c * c + s * s) * 2 / n / (2 * var * n)
    assert abs(dom[0]["var_share"] - share) < 1e-6
    # off-cycle candidates explain almost nothing
    for r in out:
        if r["period"] in (6.0, 168.0):
            assert r["var_share"] < 0.05


def test_periodogram_constant_series_is_null(spark):
    from knot_another_pipeline_spark.operators.temporal import periodogram

    rows = [("c", t, 5.0) for t in range(100)]
    out = periodogram(
        spark.createDataFrame(rows, "series string, t long, y double"),
        series_col="series",
        t_col="t",
        value_col="y",
        periods=[24.0],
    ).collect()
    assert out[0]["var_share"] is None


def test_periodogram_rejects_bad_periods(spark):
    from knot_another_pipeline_spark.operators.temporal import periodogram

    df = spark.createDataFrame(
        [("s", 0, 1.0)], "series string, t long, y double"
    )
    with pytest.raises(ValueError, match="non-empty"):
        periodogram(
            df, series_col="series", t_col="t", value_col="y", periods=[]
        )
    with pytest.raises(ValueError, match="positive"):
        periodogram(
            df,
            series_col="series",
            t_col="t",
            value_col="y",
            periods=[0.0],
        )


def test_lag_correlation_recovers_planted_shift(spark):
    from knot_another_pipeline_spark.operators.temporal import (
        lag_correlation,
    )

    rng = random.Random(7)
    a = {t: rng.gauss(0, 1) for t in range(300)}
    rows = [(t, a[t], a.get(t - 3)) for t in range(300)]
    out = lag_correlation(
        spark.createDataFrame(rows, "t long, a double, b double"),
        t_col="t",
        a_col="a",
        b_col="b",
        max_lag=5,
    ).collect()
    assert len(out) == 11
    best = [r for r in out if r["is_best"]]
    assert len(best) == 1
    assert best[0]["lag"] == 3 and best[0]["corr"] == pytest.approx(1.0)
    # brute-force a non-trivial lag
    got0 = {r["lag"]: r for r in out}[0]
    xs = [(a[t], a[t - 3]) for t in range(3, 300)]
    n = len(xs)
    sa = sum(x for x, _ in xs)
    sb = sum(y for _, y in xs)
    cov = n * sum(x * y for x, y in xs) - sa * sb
    va = n * sum(x * x for x, _ in xs) - sa * sa
    vb = n * sum(y * y for _, y in xs) - sb * sb
    assert got0["n_overlap"] == n
    assert got0["corr"] == pytest.approx(cov / math.sqrt(va * vb), abs=1e-6)


def test_lag_correlation_constant_side_is_null(spark):
    from knot_another_pipeline_spark.operators.temporal import (
        lag_correlation,
    )

    rows = [(t, float(t % 5), 2.0) for t in range(50)]
    out = lag_correlation(
        spark.createDataFrame(rows, "t long, a double, b double"),
        t_col="t",
        a_col="a",
        b_col="b",
        max_lag=2,
    ).collect()
    assert all(r["corr"] is None for r in out)
    # exactly one row still flagged best (deterministic tiebreak: lag 0)
    assert [r["lag"] for r in out if r["is_best"]] == [0]


# ---------------------------------------------------------------------------
# hilbert_key


def _xy2d(n, x, y):
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_key_matches_reference_walk(spark):
    from knot_another_pipeline_spark.functions.hashing import hilbert_key

    rng = random.Random(7)
    pts = [
        (i, rng.randrange(0, 1 << 16), rng.randrange(0, 1 << 16))
        for i in range(500)
    ]
    got = {
        r["id"]: r["hkey"]
        for r in hilbert_key(
            spark.createDataFrame(pts, ["id", "x", "y"]),
            x_col="x",
            y_col="y",
            order=16,
        ).collect()
    }
    for i, x, y in pts:
        assert got[i] == _xy2d(1 << 16, x, y)


def test_hilbert_key_is_a_true_hilbert_walk(spark):
    """The defining locality property Z-order lacks: consecutive keys
    are ALWAYS grid-adjacent (Manhattan distance exactly 1)."""
    from knot_another_pipeline_spark.functions.hashing import hilbert_key

    small = [(x * 8 + y, x, y) for x in range(8) for y in range(8)]
    got = {
        r["hkey"]: (r["x"], r["y"])
        for r in hilbert_key(
            spark.createDataFrame(small, ["id", "x", "y"]),
            x_col="x",
            y_col="y",
            order=3,
        ).collect()
    }
    assert sorted(got) == list(range(64))  # a bijection onto 0..63
    for d in range(63):
        (x1, y1), (x2, y2) = got[d], got[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_beats_morton_locality(spark):
    """Total walk length over the full 16x16 grid: Hilbert's is the
    minimum possible (255 unit steps); Morton pays for its quadrant
    seams. This is the quantitative reason hilbert_key exists."""
    from knot_another_pipeline_spark.functions.hashing import (
        hilbert_key,
        morton_key,
    )
    from pyspark.sql import functions as F

    grid = [(x * 16 + y, x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(grid, ["id", "x", "y"])
    hil = {
        r["hkey"]: (r["x"], r["y"])
        for r in hilbert_key(
            df, x_col="x", y_col="y", order=4
        ).collect()
    }
    mor = {
        r["zkey"]: (r["x"], r["y"])
        for r in df.select(
            "x", "y", morton_key(F.col("x"), F.col("y")).alias("zkey")
        ).collect()
    }

    def walk_len(d):
        ks = sorted(d)
        return sum(
            abs(d[a][0] - d[b][0]) + abs(d[a][1] - d[b][1])
            for a, b in zip(ks, ks[1:])
        )

    assert walk_len(hil) == 255  # optimal: every step adjacent
    assert walk_len(mor) > walk_len(hil)


def test_hilbert_key_masks_and_validates(spark):
    from knot_another_pipeline_spark.functions.hashing import hilbert_key

    df = spark.createDataFrame([(1, 9, 3)], ["id", "x", "y"])
    # order-3 grid: x = 9 wraps to 1
    out = hilbert_key(df, x_col="x", y_col="y", order=3).collect()[0]
    assert out["hkey"] == _xy2d(8, 1, 3)
    with pytest.raises(ValueError, match="order"):
        hilbert_key(df, x_col="x", y_col="y", order=0)
    with pytest.raises(ValueError, match="order"):
        hilbert_key(df, x_col="x", y_col="y", order=32)


# ---------------------------------------------------------------------------
# layout_pruning


def test_layout_pruning_hilbert_beats_morton_beats_natural(spark):
    from knot_another_pipeline_spark.operators.relational import (
        layout_pruning,
    )

    rng = random.Random(7)
    rows = [
        (i, rng.randrange(0, 256), rng.randrange(0, 256))
        for i in range(20000)
    ]
    out = {
        r["layout"]: r
        for r in layout_pruning(
            spark.createDataFrame(rows, ["id", "x", "y"]).repartition(8),
            x_col="x",
            y_col="y",
            id_col="id",
            box=(40, 80, 100, 140),
            group_rows=128,
            order=8,
        ).collect()
    }
    assert set(out) == {"natural", "morton", "hilbert"}
    for r in out.values():
        assert r["n_rows"] == 20000
        assert r["n_groups"] == math.ceil(20000 / 128)
    # random ids carry no spatial signal: every group intersects the box
    assert out["natural"]["prune_fraction"] == 0.0
    # space-filling layouts prune most of the file; Hilbert's tighter
    # locality prunes at least as much as Morton's seam-hopping walk
    assert out["morton"]["prune_fraction"] > 0.5
    assert (
        out["hilbert"]["prune_fraction"]
        >= out["morton"]["prune_fraction"]
    )


def test_layout_pruning_counts_match_bruteforce(spark):
    """Brute-force the morton layout's group stats in Python and
    compare groups_touched / rows_touched exactly."""
    from knot_another_pipeline_spark.operators.relational import (
        layout_pruning,
    )

    def spread(v):
        v &= 0x1FFFFF
        v = (v | (v << 32)) & 0x1F00000000FFFF
        v = (v | (v << 16)) & 0x1F0000FF0000FF
        v = (v | (v << 8)) & 0x100F00F00F00F00F
        v = (v | (v << 4)) & 0x10C30C30C30C30C3
        v = (v | (v << 2)) & 0x1249249249249249
        return v

    rng = random.Random(11)
    rows = [(i, rng.randrange(0, 64), rng.randrange(0, 64))
            for i in range(3000)]
    box = (10, 30, 20, 50)
    out = {
        r["layout"]: r
        for r in layout_pruning(
            spark.createDataFrame(rows, ["id", "x", "y"]),
            x_col="x",
            y_col="y",
            id_col="id",
            box=box,
            group_rows=64,
            order=6,
        ).collect()
    }
    srt = sorted(rows, key=lambda r: (spread(r[1]) | (spread(r[2]) << 1), r[0]))
    touched_groups = touched_rows = n_groups = 0
    for g in range(0, len(srt), 64):
        grp = srt[g : g + 64]
        n_groups += 1
        if (
            max(x for _, x, _ in grp) >= box[0]
            and min(x for _, x, _ in grp) <= box[1]
            and max(y for _, _, y in grp) >= box[2]
            and min(y for _, _, y in grp) <= box[3]
        ):
            touched_groups += 1
            touched_rows += len(grp)
    r = out["morton"]
    assert r["n_groups"] == n_groups
    assert r["groups_touched"] == touched_groups
    assert r["rows_touched"] == touched_rows


def test_layout_pruning_validates_group_rows(spark):
    from knot_another_pipeline_spark.operators.relational import (
        layout_pruning,
    )

    df = spark.createDataFrame([(1, 2, 3)], ["id", "x", "y"])
    with pytest.raises(ValueError, match="group_rows"):
        layout_pruning(
            df,
            x_col="x",
            y_col="y",
            id_col="id",
            box=(0, 1, 0, 1),
            group_rows=0,
        )


# ---------------------------------------------------------------------------
# msprt_readout / qte_readout


def test_msprt_null_experiment_never_rejects_and_p_is_monotone(spark):
    from knot_another_pipeline_spark.operators.evaluation import (
        msprt_readout,
    )

    rng = random.Random(7)
    rows = [
        (d, "c" if rng.random() < 0.5 else "t", rng.gauss(10, 3))
        for d in range(30)
        for _ in range(200)
    ]
    out = msprt_readout(
        spark.createDataFrame(rows, "look long, arm string, v double"),
        look_col="look",
        arm_col="arm",
        value_col="v",
        control="c",
        treatment="t",
        tau_sq=1.0,
    ).collect()
    assert len(out) == 30
    assert not any(r["reject"] for r in out)
    ps = [r["p_always_valid"] for r in out]
    assert all(a >= b for a, b in zip(ps, ps[1:]))  # running min


def test_msprt_detects_real_effect_and_matches_bruteforce_lambda(spark):
    import statistics

    from knot_another_pipeline_spark.operators.evaluation import (
        msprt_readout,
    )

    rng = random.Random(7)
    rows = [(d, "c", rng.gauss(10, 3)) for d in range(30) for _ in range(200)]
    rows += [(d, "t", rng.gauss(11, 3)) for d in range(30) for _ in range(200)]
    out = msprt_readout(
        spark.createDataFrame(rows, "look long, arm string, v double"),
        look_col="look",
        arm_col="arm",
        value_col="v",
        control="c",
        treatment="t",
        tau_sq=1.0,
    ).collect()
    assert out[-1]["reject"]
    # once rejected, always rejected (the always-valid contract)
    first = min(r["look"] for r in out if r["reject"])
    assert all(r["reject"] for r in out if r["look"] >= first)
    # brute-force the final-look mixture likelihood ratio
    cs = [v for _, a, v in rows if a == "c"]
    ts = [v for _, a, v in rows if a == "t"]
    vn = statistics.variance(cs) / len(cs) + statistics.variance(ts) / len(ts)
    diff = sum(ts) / len(ts) - sum(cs) / len(cs)
    lam = math.sqrt(vn / (vn + 1.0)) * math.exp(
        diff * diff / (2 * vn * (vn + 1.0))
    )
    got = out[-1]["lambda_mixture"]
    assert abs(got - lam) < max(1e-6, 1e-8 * lam)


def test_msprt_validates_params(spark):
    from knot_another_pipeline_spark.operators.evaluation import (
        msprt_readout,
    )

    df = spark.createDataFrame(
        [(0, "c", 1.0)], "look long, arm string, v double"
    )
    with pytest.raises(ValueError, match="tau_sq"):
        msprt_readout(
            df,
            look_col="look",
            arm_col="arm",
            value_col="v",
            control="c",
            treatment="t",
            tau_sq=0.0,
        )
    with pytest.raises(ValueError, match="alpha"):
        msprt_readout(
            df,
            look_col="look",
            arm_col="arm",
            value_col="v",
            control="c",
            treatment="t",
            tau_sq=1.0,
            alpha=1.0,
        )


def test_qte_recovers_uniform_shift_and_interpolation(spark):
    from knot_another_pipeline_spark.operators.evaluation import qte_readout

    rng = random.Random(13)
    cs = [rng.gauss(10, 3) for _ in range(3000)]
    rows = [("c", v) for v in cs] + [("t", v + 1.0) for v in cs]
    out = qte_readout(
        spark.createDataFrame(rows, "arm string, v double"),
        arm_col="arm",
        value_col="v",
        control="c",
        treatment="t",
    ).collect()
    assert [r["q"] for r in out] == [0.1, 0.25, 0.5, 0.75, 0.9]
    # an exact +1 shift of the SAME sample gives qte exactly 1 at
    # every quantile (interpolation is shift-equivariant)
    assert all(r["qte"] == pytest.approx(1.0, abs=1e-6) for r in out)
    # brute-force the interpolated 0.25 quantile
    srt = sorted(cs)
    pos = (len(srt) - 1) * 0.25
    lo, frac = int(pos), pos - int(pos)
    expect = srt[lo] + frac * (srt[lo + 1] - srt[lo])
    got = {r["q"]: r for r in out}
    assert got[0.25]["q_control"] == pytest.approx(expect, abs=1e-6)


def test_qte_validates_quantiles(spark):
    from knot_another_pipeline_spark.operators.evaluation import qte_readout

    df = spark.createDataFrame([("c", 1.0)], "arm string, v double")
    with pytest.raises(ValueError, match="quantiles"):
        qte_readout(
            df,
            arm_col="arm",
            value_col="v",
            control="c",
            treatment="t",
            quantiles=[1.5],
        )


# ---------------------------------------------------------------------------
# lsh_tuning


def _mk_neardup_corpus(n_pairs=150, seed=7):
    rng = random.Random(seed)
    words = [f"w{i}" for i in range(500)]
    docs = []
    for i in range(n_pairs):
        base = [rng.choice(words) for _ in range(30)]
        docs.append((i * 2, " ".join(base)))
        mut = list(base)
        mut[rng.randrange(30)] = "zzz"
        docs.append((i * 2 + 1, " ".join(mut)))
    return docs


def test_lsh_tuning_scurve_monotonicity(spark):
    from knot_another_pipeline_spark.operators.dedup import lsh_tuning

    df = spark.createDataFrame(_mk_neardup_corpus(), ["doc_id", "text"])
    out = {
        (r["bands"], r["rows_per_band"]): r
        for r in lsh_tuning(
            df,
            id_col="doc_id",
            text_col="text",
            threshold=0.5,
            sample_pct=100,
        ).collect()
    }
    # more bands at fixed rows: recall AND fp load both rise
    assert (
        out[(4, 4)]["est_recall"]
        <= out[(8, 4)]["est_recall"]
        <= out[(16, 4)]["est_recall"]
    )
    assert (
        out[(4, 4)]["est_fp_candidates"]
        <= out[(8, 4)]["est_fp_candidates"]
    )
    # more rows per band at fixed bands: stricter, recall falls
    assert out[(4, 8)]["est_recall"] <= out[(4, 4)]["est_recall"]
    for r in out.values():
        assert r["sig_size"] == r["bands"] * r["rows_per_band"]
        assert 0 <= r["candidate_share"] <= 1


def test_lsh_tuning_matches_bruteforce_expectation(spark):
    """Replay the S-curve expectation in Python from the exact pair
    Jaccards and compare one grid cell to 1e-6."""
    from knot_another_pipeline_spark.operators.dedup import (
        lsh_tuning,
        ngram_jaccard_pairs,
        shingle_table,
    )

    df = spark.createDataFrame(
        _mk_neardup_corpus(60, seed=11), ["doc_id", "text"]
    )
    sims = [
        r["jaccard"]
        for r in ngram_jaccard_pairs(
            shingle_table(df, id_col="doc_id", text_col="text", n=3),
            min_jaccard=0.0,
        ).collect()
    ]
    b, r_ = 8, 4
    et = sum(
        1 - (1 - s**r_) ** b for s in sims if s >= 0.5
    )
    n_true = sum(1 for s in sims if s >= 0.5)
    got = {
        (r["bands"], r["rows_per_band"]): r
        for r in lsh_tuning(
            df,
            id_col="doc_id",
            text_col="text",
            threshold=0.5,
            sample_pct=100,
        ).collect()
    }[(8, 4)]
    assert got["n_true_pairs"] == n_true
    assert got["est_recall"] == pytest.approx(et / n_true, abs=1e-6)


def test_lsh_tuning_validates_params(spark):
    from knot_another_pipeline_spark.operators.dedup import lsh_tuning

    df = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="sample_pct"):
        lsh_tuning(
            df, id_col="doc_id", text_col="text", threshold=0.5,
            sample_pct=0,
        )
    with pytest.raises(ValueError, match="threshold"):
        lsh_tuning(
            df, id_col="doc_id", text_col="text", threshold=0.0,
        )
    with pytest.raises(ValueError, match="grid"):
        lsh_tuning(
            df, id_col="doc_id", text_col="text", threshold=0.5,
            grid=[(0, 4)],
        )


# ---------------------------------------------------------------------------
# streaming_msprt_monitor


def _msprt_rows():
    # three hourly looks; treatment shifted +2 so the readout moves
    rows = []
    rng = random.Random(7)
    for h in range(3):
        for i in range(20):
            rows.append(
                ("c", 10 + rng.random(), f"2025-01-01 0{h}:{10 + i:02d}:00")
            )
            rows.append(
                ("t", 12 + rng.random(), f"2025-01-01 0{h}:{10 + i:02d}:00")
            )
    return rows


def test_streaming_msprt_monitor_matches_batch_and_composes(
    spark, tmp_path
):
    """The monitor's per-window moment rows equal the batch per-hour
    moments, and feeding the accumulated rows into msprt_from_moments
    reproduces msprt_readout on the raw data exactly — the documented
    stream-feeder/batch-view split."""
    from pyspark.sql import functions as F

    from knot_another_pipeline_spark.operators.evaluation import (
        msprt_from_moments,
        msprt_readout,
    )
    from knot_another_pipeline_spark.streaming.rollup_stream import (
        streaming_msprt_monitor,
    )

    rows = _msprt_rows() + [("c", 1.0, "2025-01-03 00:00:00")]  # pusher
    df = spark.createDataFrame(
        rows, "arm string, v double, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    src = tmp_path / "msprt_in"
    df.write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(df.schema).parquet(str(src))
    out = streaming_msprt_monitor(
        stream,
        ts_col="ts",
        arm_col="arm",
        value_col="v",
        control="c",
        treatment="t",
        window_duration="1 hour",
        watermark="1 minute",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("msprt_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    looks = spark.sql(
        "SELECT * FROM msprt_test WHERE look < timestamp '2025-01-02'"
    )
    assert looks.count() == 3
    # moment parity vs a plain batch aggregate
    want = (
        df.filter(F.col("ts") < F.lit("2025-01-02").cast("timestamp"))
        .groupBy(F.date_trunc("hour", "ts").alias("look"))
        .agg(
            F.sum(F.when(F.col("arm") == "c", 1.0).otherwise(0.0)).alias(
                "dnc"
            ),
            F.sum(F.when(F.col("arm") == "c", F.col("v")).otherwise(0.0))
            .alias("dsc"),
            F.sum(
                F.when(F.col("arm") == "c", F.col("v") * F.col("v"))
                .otherwise(0.0)
            ).alias("dqc"),
            F.sum(F.when(F.col("arm") == "t", 1.0).otherwise(0.0)).alias(
                "dnt"
            ),
            F.sum(F.when(F.col("arm") == "t", F.col("v")).otherwise(0.0))
            .alias("dst"),
            F.sum(
                F.when(F.col("arm") == "t", F.col("v") * F.col("v"))
                .otherwise(0.0)
            ).alias("dqt"),
        )
    )
    got_m = {
        str(r["look"]): tuple(
            round(r[c], 9) for c in ("dnc", "dsc", "dqc", "dnt", "dst", "dqt")
        )
        for r in looks.collect()
    }
    want_m = {
        str(r["look"]): tuple(
            round(r[c], 9) for c in ("dnc", "dsc", "dqc", "dnt", "dst", "dqt")
        )
        for r in want.collect()
    }
    assert got_m == want_m
    # composition: accumulated monitor rows -> the exact batch readout
    via_stream = msprt_from_moments(looks, tau_sq=1.0).collect()
    direct = msprt_readout(
        df.filter(F.col("ts") < F.lit("2025-01-02").cast("timestamp"))
        .select(
            F.date_trunc("hour", "ts").alias("look"), "arm", "v"
        ),
        look_col="look",
        arm_col="arm",
        value_col="v",
        control="c",
        treatment="t",
        tau_sq=1.0,
    ).collect()
    assert len(via_stream) == len(direct) == 3
    for a, b in zip(via_stream, direct):
        assert (a["look"], a["n_control"], a["n_treatment"]) == (
            b["look"], b["n_control"], b["n_treatment"],
        )
        assert a["diff"] == b["diff"]
        assert a["p_always_valid"] == b["p_always_valid"]
        assert a["reject"] == b["reject"]
        # lambda passes through exp(), which amplifies the summation-
        # order difference between streamed and batch moment sums —
        # relative tolerance, everything else exact
        assert a["lambda_mixture"] == pytest.approx(
            b["lambda_mixture"], rel=1e-6
        )


def test_streaming_msprt_monitor_late_and_too_late_replay(spark, tmp_path):
    """The family replay contract: late-but-in-watermark rows for an
    OPEN window aggregate; rows for an emitted-and-evicted window are
    dropped; the final moments equal the accepted rows' batch sums."""
    import os
    import time

    from pyspark.sql import functions as F

    from knot_another_pipeline_spark.streaming.rollup_stream import (
        streaming_msprt_monitor,
    )

    schema = "arm string, v double, ts string"
    src = tmp_path / "msprt_replay_in"

    def write_epoch(rows, mtime):
        d = spark.createDataFrame(rows, schema).withColumn(
            "ts", F.to_timestamp("ts")
        )
        before = (
            {f for f in os.listdir(src) if f.endswith(".parquet")}
            if src.exists()
            else set()
        )
        d.coalesce(1).write.mode("append").parquet(str(src))
        for f in os.listdir(src):
            if f.endswith(".parquet") and f not in before:
                os.utime(src / f, (mtime, mtime))

    write_epoch(
        [("c", 10.0, "2025-01-01 00:05:00"),
         ("t", 12.0, "2025-01-01 00:40:00")],
        time.time() - 300,
    )
    # late but in-watermark for the still-open 00:00 window + pusher
    write_epoch(
        [("c", 11.0, "2025-01-01 00:02:00"),
         ("c", 1.0, "2025-01-02 00:00:00")],
        time.time() - 250,
    )
    # buffer batch: emits and evicts the 00:00 window
    write_epoch([("c", 1.0, "2025-01-02 12:00:00")], time.time() - 200)
    # too late: 00:00 already evicted -> dropped
    write_epoch(
        [("t", 99.0, "2025-01-01 00:50:00"),
         ("c", 1.0, "2025-01-03 00:00:00")],
        time.time() - 100,
    )
    stream = (
        spark.readStream.schema("arm string, v double, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = streaming_msprt_monitor(
        stream,
        ts_col="ts",
        arm_col="arm",
        value_col="v",
        control="c",
        treatment="t",
        window_duration="1 hour",
        watermark="1 minute",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("msprt_replay_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = {
        str(r["look"]): (r["dnc"], r["dsc"], r["dqc"], r["dnt"], r["dst"])
        for r in spark.sql(
            "SELECT * FROM msprt_replay_test "
            "WHERE look < timestamp '2025-01-02'"
        ).collect()
    }
    # accepted: the two epoch-1 rows + the late epoch-2 row; the
    # too-late 00:50 treatment row (v=99) must NOT be in the sums
    assert got == {
        "2025-01-01 00:00:00": (2.0, 21.0, 221.0, 1.0, 12.0)
    }


# ---------------------------------------------------------------------------
# srm_check / holm_adjust


def test_srm_check_balanced_vs_broken(spark):
    from knot_another_pipeline_spark.operators.quality import srm_check

    rows = [("a",)] * 5030 + [("b",)] * 4970
    out = srm_check(
        spark.createDataFrame(rows, ["arm"]),
        arm_col="arm",
        expected={"a": 1, "b": 1},
    ).collect()[0]
    assert not out["srm_detected"]
    assert out["chi2"] == pytest.approx(
        (5030 - 5000) ** 2 / 5000 + (4970 - 5000) ** 2 / 5000, abs=1e-6
    )
    broken = srm_check(
        spark.createDataFrame([("a",)] * 5000 + [("b",)] * 4500, ["arm"]),
        arm_col="arm",
        expected={"a": 1, "b": 1},
    ).collect()[0]
    assert broken["srm_detected"] and broken["p_value"] < 0.001


def test_srm_check_unseen_declared_arm_is_an_alarm(spark):
    from knot_another_pipeline_spark.operators.quality import srm_check

    rows = [("a",)] * 500 + [("b",)] * 500
    out = srm_check(
        spark.createDataFrame(rows, ["arm"]),
        arm_col="arm",
        expected={"a": 1, "b": 1, "c": 1},
    ).collect()[0]
    assert out["k_arms"] == 3 and out["srm_detected"]
    # undeclared arms in the data are excluded, not crashed on
    out2 = srm_check(
        spark.createDataFrame(rows + [("x",)] * 100, ["arm"]),
        arm_col="arm",
        expected={"a": 1, "b": 1},
    ).collect()[0]
    assert out2["n"] == 1000


def test_srm_check_validates(spark):
    from knot_another_pipeline_spark.operators.quality import srm_check

    df = spark.createDataFrame([("a",)], ["arm"])
    with pytest.raises(ValueError, match="positive"):
        srm_check(df, arm_col="arm", expected={"a": 0})
    with pytest.raises(ValueError, match="alpha"):
        srm_check(df, arm_col="arm", expected={"a": 1}, alpha=2.0)


def _nsf_py(z):
    az = abs(z)
    k = 1 / (1 + 0.2316419 * az)
    poly = k * (
        0.319381530
        + k
        * (
            -0.356563782
            + k * (1.781477937 + k * (-1.821255978 + k * 1.330274429))
        )
    )
    return 2 * math.exp(-az * az / 2) / math.sqrt(2 * math.pi) * poly


def test_holm_adjust_matches_bruteforce_stepdown(spark):
    from knot_another_pipeline_spark.operators.quality import holm_adjust

    rng = random.Random(7)
    zs = [
        (f"k{i}", rng.gauss(0, 1) * (3 if i < 5 else 1)) for i in range(50)
    ]
    got = {
        r["key"]: r
        for r in holm_adjust(
            spark.createDataFrame(zs, ["k", "z"]), key_col="k", z_col="z"
        ).collect()
    }
    ordered = sorted(zs, key=lambda kv: (-abs(round(kv[1], 6)), kv[0]))
    m = len(ordered)
    run = 0.0
    for i, (k, z) in enumerate(ordered):
        run = max(run, min(1.0, _nsf_py(round(z, 6)) * (m - i)))
        assert got[k]["rank"] == i + 1
        assert got[k]["p_holm"] == pytest.approx(run, abs=1e-6)
    # step-down contract: rejects are a prefix of the ranking, and
    # Holm never rejects anything BH-FDR at the same alpha would keep
    rej = sorted(r["rank"] for r in got.values() if r["reject"])
    assert rej == list(range(1, len(rej) + 1))


def test_holm_is_never_more_permissive_than_fdr(spark):
    from knot_another_pipeline_spark.operators.quality import (
        fdr_adjust,
        holm_adjust,
    )

    rng = random.Random(23)
    zs = [(f"k{i}", rng.gauss(0, 1.8)) for i in range(80)]
    df = spark.createDataFrame(zs, ["k", "z"])
    h = {r["key"] for r in holm_adjust(
        df, key_col="k", z_col="z").collect() if r["reject"]}
    b = {r["key"] for r in fdr_adjust(
        df, key_col="k", z_col="z").collect() if r["reject"]}
    assert h <= b  # FWER control is strictly more conservative
