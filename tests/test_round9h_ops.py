"""Round-9 late additions, batch h: distribution and manifold
geometry — exact 1-D energy distance (pooled-sort prefix identity vs
the all-pairs definition) and the TwoNN intrinsic-dimension MLE
(recovers planted manifold dimension, matches an exact-2NN brute
force).
"""

from __future__ import annotations

import math
import random

import pytest

from knot_another_pipeline_spark.operators.quality import energy_drift
from knot_another_pipeline_spark.operators.similarity import twonn_dimension


def _brute_energy(xs, ys):
    ec = sum(abs(x - y) for x in xs for y in ys) / (len(xs) * len(ys))
    ex = sum(abs(a - b) for a in xs for b in xs) / (len(xs) ** 2)
    ey = sum(abs(a - b) for a in ys for b in ys) / (len(ys) ** 2)
    return ec, ex, ey, 2 * ec - ex - ey


def test_energy_drift_matches_allpairs_bruteforce(spark):
    rng = random.Random(13)
    rows = (
        [("g1", "base", round(rng.gauss(0, 1), 1)) for _ in range(150)]
        + [("g1", "cur", round(rng.gauss(0.5, 1.2), 1)) for _ in range(120)]
        + [("g2", "base", round(rng.random(), 2)) for _ in range(80)]
        + [("g2", "cur", round(rng.random(), 2)) for _ in range(90)]
    )
    got = {
        r["g"]: r
        for r in energy_drift(
            spark.createDataFrame(rows, "g string, tag string, v double"),
            value_col="v",
            sample_col="tag",
            baseline="base",
            current="cur",
            group_cols=["g"],
        ).collect()
    }
    for g in ("g1", "g2"):
        xs = [v for gg, t, v in rows if gg == g and t == "base"]
        ys = [v for gg, t, v in rows if gg == g and t == "cur"]
        ec, ex, ey, dist = _brute_energy(xs, ys)
        r = got[g]
        assert r["e_cross"] == pytest.approx(ec, abs=1e-6)
        assert r["e_within_base"] == pytest.approx(ex, abs=1e-6)
        assert r["e_within_cur"] == pytest.approx(ey, abs=1e-6)
        assert r["energy_distance"] == pytest.approx(dist, abs=1e-6)
        assert (r["n_base"], r["n_cur"]) == (len(xs), len(ys))
    # the shifted gaussian drifts more than the identical uniforms
    assert got["g1"]["energy_distance"] > got["g2"]["energy_distance"]


def test_energy_drift_identical_samples_is_zero(spark):
    rows = [("s", "base", float(i % 7)) for i in range(70)] + [
        ("s", "cur", float(i % 7)) for i in range(70)
    ]
    out = energy_drift(
        spark.createDataFrame(rows, "g string, tag string, v double"),
        value_col="v",
        sample_col="tag",
        baseline="base",
        current="cur",
        group_cols=["g"],
    ).collect()[0]
    assert out["energy_distance"] == pytest.approx(0.0, abs=1e-9)


def test_energy_drift_empty_side_is_null(spark):
    rows = [("s", "base", 1.0), ("s", "base", 2.0)]
    out = energy_drift(
        spark.createDataFrame(rows, "g string, tag string, v double"),
        value_col="v",
        sample_col="tag",
        baseline="base",
        current="cur",
        group_cols=["g"],
    ).collect()[0]
    assert out["n_cur"] == 0
    assert out["energy_distance"] is None and out["e_cross"] is None
    assert out["e_within_base"] is not None


def test_energy_drift_ignores_unknown_tags(spark):
    rows = [
        ("s", "base", 1.0),
        ("s", "cur", 2.0),
        ("s", "junk", 99.0),  # neither tag -> dropped
    ]
    out = energy_drift(
        spark.createDataFrame(rows, "g string, tag string, v double"),
        value_col="v",
        sample_col="tag",
        baseline="base",
        current="cur",
        group_cols=["g"],
    ).collect()[0]
    assert (out["n_base"], out["n_cur"]) == (1, 1)
    assert out["e_cross"] == 1.0


# ---------------------------------------------------------------------------
# twonn_dimension


def _brute_twonn(pts):
    s, n_used = 0.0, 0
    for pid, v in pts:
        ds = sorted(
            (math.dist(v, w), wid) for wid, w in pts if wid != pid
        )
        r1, r2 = ds[0][0], ds[1][0]
        if r1 > 0:
            n_used += 1
            s += math.log(r2 / r1)
    return len(pts), n_used, (n_used / s if s > 0 else None)


def test_twonn_recovers_planted_dimension_and_matches_bruteforce(spark):
    rng = random.Random(17)
    rows = []
    for i in range(300):  # 2-D plane embedded in 5-D
        a, b = rng.random(), rng.random()
        rows.append((f"p{i}", [a, b, a + b, 2 * a - b, 0.5], "plane"))
    for i in range(300):  # genuinely 4-D cloud
        rows.append(
            (f"q{i}", [rng.random() for _ in range(4)] + [0.0], "cube")
        )
    rows += [  # exact duplicates: counted but excluded from the MLE
        ("dup1", [0.5, 0.5, 1.0, 0.5, 0.5], "plane"),
        ("dup2", [0.5, 0.5, 1.0, 0.5, 0.5], "plane"),
    ]
    got = {
        r["grp"]: r
        for r in twonn_dimension(
            spark.createDataFrame(
                rows, "vec_id string, embedding array<double>, grp string"
            ),
            group_cols=["grp"],
        ).collect()
    }
    for g in ("plane", "cube"):
        pts = [(pid, v) for pid, v, gg in rows if gg == g]
        n_pts, n_used, dim = _brute_twonn(pts)
        r = got[g]
        assert (r["n_points"], r["n_used"]) == (n_pts, n_used)
        assert r["intrinsic_dim"] == pytest.approx(dim, abs=1e-4)
    assert 1.5 < got["plane"]["intrinsic_dim"] < 2.6
    assert got["cube"]["intrinsic_dim"] > got["plane"]["intrinsic_dim"]


def test_twonn_all_duplicates_is_null(spark):
    rows = [(f"d{i}", [1.0, 2.0], "g") for i in range(5)]
    out = twonn_dimension(
        spark.createDataFrame(
            rows, "vec_id string, embedding array<double>, grp string"
        ),
        group_cols=["grp"],
    ).collect()[0]
    # every r1 = 0 -> nothing usable
    assert out["n_used"] == 0 and out["intrinsic_dim"] is None
    assert out["n_points"] == 5


# ---------------------------------------------------------------------------
# smd_balance


def test_smd_balance_matches_weighted_bruteforce(spark):
    rng = random.Random(19)
    rows = []
    for _ in range(400):
        arm = "t" if rng.random() < 0.45 else "c"
        x1 = rng.gauss(1.0 if arm == "t" else 0.0, 1.0)
        x2 = None if rng.random() < 0.05 else rng.random()
        rows.append((arm, x1, x2, rng.uniform(0.5, 2.0)))
    from knot_another_pipeline_spark.operators.evaluation import smd_balance

    got = {
        r["covariate"]: r
        for r in smd_balance(
            spark.createDataFrame(
                rows, "arm string, x1 double, x2 double, w double"
            ),
            arm_col="arm",
            treatment="t",
            control="c",
            covariate_cols=["x1", "x2"],
            weight_col="w",
        ).collect()
    }

    def brute(col_ix):
        def mom(arm):
            sw = swx = swxx = 0.0
            n = 0
            for a, x1, x2, wgt in rows:
                x = x1 if col_ix == 1 else x2
                if a == arm and x is not None:
                    sw += wgt
                    swx += wgt * x
                    swxx += wgt * x * x
                    n += 1
            m = swx / sw
            return m, swxx / sw - m * m, n

        mt, vt, nt = mom("t")
        mc, vc, nc = mom("c")
        return mt, mc, (mt - mc) / math.sqrt((vt + vc) / 2), nt, nc

    for name, ix in (("x1", 1), ("x2", 2)):
        mt, mc, smd, nt, nc = brute(ix)
        r = got[name]
        assert r["smd"] == pytest.approx(smd, abs=1e-6)
        assert r["mean_treat"] == pytest.approx(mt, abs=1e-6)
        assert r["mean_control"] == pytest.approx(mc, abs=1e-6)
        assert (r["n_treat"], r["n_control"]) == (nt, nc)
    # the shifted covariate is flagged, direction preserved
    assert got["x1"]["balanced"] is False and got["x1"]["smd"] > 0


def test_smd_balance_identical_arms_are_balanced(spark):
    rows = [("t", float(i % 5)) for i in range(50)] + [
        ("c", float(i % 5)) for i in range(50)
    ]
    from knot_another_pipeline_spark.operators.evaluation import smd_balance

    out = smd_balance(
        spark.createDataFrame(rows, "arm string, x double"),
        arm_col="arm",
        treatment="t",
        control="c",
        covariate_cols=["x"],
    ).collect()[0]
    assert out["smd"] == pytest.approx(0.0, abs=1e-9)
    assert out["balanced"] is True


def test_smd_balance_constant_covariate_is_null(spark):
    rows = [("t", 3.0), ("t", 3.0), ("c", 3.0), ("c", 3.0)]
    from knot_another_pipeline_spark.operators.evaluation import smd_balance

    out = smd_balance(
        spark.createDataFrame(rows, "arm string, x double"),
        arm_col="arm",
        treatment="t",
        control="c",
        covariate_cols=["x"],
    ).collect()[0]
    # zero pooled variance -> undefined, not 0/0
    assert out["smd"] is None and out["balanced"] is None


def test_smd_balance_rejects_empty_covariates(spark):
    from knot_another_pipeline_spark.operators.evaluation import smd_balance

    with pytest.raises(ValueError, match="covariate_cols"):
        smd_balance(
            spark.createDataFrame([("t", 1.0)], "arm string, x double"),
            arm_col="arm",
            treatment="t",
            control="c",
            covariate_cols=[],
        )
