"""Round-9 late additions, batch f: time-series diagnostics —
Ljung–Box portmanteau whiteness test and the rescaled-range Hurst
exponent — against in-Python brute force (textbook estimators) plus
the degenerate cases (constant series, series shorter than the lag
budget, fewer than two usable scales).
"""

from __future__ import annotations

import math
import random

import pytest

from knot_another_pipeline_spark.operators.temporal import (
    hurst_exponent,
    ljung_box,
)


def _brute_ljung_box(vals, h):
    n = len(vals)
    m = sum(vals) / n
    c0 = sum((v - m) ** 2 for v in vals)
    if c0 == 0 or n <= h:
        return None
    q = 0.0
    for k in range(1, h + 1):
        ck = sum((vals[t] - m) * (vals[t - k] - m) for t in range(k, n))
        q += (ck / c0) ** 2 / (n - k)
    return n * (n + 2) * q


def _series_df(spark, rows):
    return spark.createDataFrame(rows, "series string, ord int, value double")


def test_ljung_box_matches_bruteforce_and_separates_ar_from_noise(spark):
    rng = random.Random(3)
    rows = []
    x = 0.0
    for i in range(400):
        x = 0.7 * x + rng.gauss(0, 1)
        rows.append(("ar", i, x))
    for i in range(400):
        rows.append(("wn", i, rng.gauss(0, 1)))
    got = {
        r["series"]: r
        for r in ljung_box(
            _series_df(spark, rows),
            series_col="series",
            order_col="ord",
            value_col="value",
            max_lag=5,
        ).collect()
    }
    for name in ("ar", "wn"):
        vals = [v for s, _, v in rows if s == name]
        assert got[name]["q_stat"] == pytest.approx(
            _brute_ljung_box(vals, 5), abs=1e-3
        )
        assert got[name]["n"] == 400 and got[name]["max_lag"] == 5
    # the AR(1) series is loudly non-white; the noise is not
    assert got["ar"]["p_value"] < 0.001
    assert got["wn"]["p_value"] > 0.05


def test_ljung_box_constant_and_short_series_are_null(spark):
    rows = [("const", i, 5.0) for i in range(50)] + [
        ("short", i, float(i)) for i in range(4)
    ]
    got = {
        r["series"]: r
        for r in ljung_box(
            _series_df(spark, rows),
            series_col="series",
            order_col="ord",
            value_col="value",
            max_lag=5,
        ).collect()
    }
    assert got["const"]["q_stat"] is None and got["const"]["p_value"] is None
    assert got["short"]["q_stat"] is None  # n=4 <= max_lag=5
    assert got["short"]["n"] == 4


def test_ljung_box_rejects_bad_lag(spark):
    with pytest.raises(ValueError, match="max_lag"):
        ljung_box(
            _series_df(spark, [("a", 0, 1.0)]),
            series_col="series",
            order_col="ord",
            value_col="value",
            max_lag=0,
        )


# ---------------------------------------------------------------------------
# hurst_exponent


def _brute_hurst(vals, scales=(8, 16, 32, 64)):
    pts = []
    for s in scales:
        rss = []
        for b in range(len(vals) // s):
            blk = vals[b * s : (b + 1) * s]
            m = sum(blk) / s
            run, zs = 0.0, []
            for v in blk:
                run += v - m
                zs.append(run)
            big_r = max(zs) - min(zs)
            big_s = math.sqrt(sum(v * v for v in blk) / s - m * m)
            if big_s > 0:
                rss.append(big_r / big_s)
        if rss:
            avg = sum(rss) / len(rss)
            if avg > 0:
                pts.append((math.log(s), math.log(avg)))
    if len(pts) < 2:
        return None
    n = len(pts)
    su = sum(u for u, _ in pts)
    sv = sum(v for _, v in pts)
    suu = sum(u * u for u, _ in pts)
    suv = sum(u * v for u, v in pts)
    return (suv - su * sv / n) / (suu - su * su / n)


def test_hurst_matches_bruteforce_and_ranks_persistence(spark):
    rng = random.Random(5)
    rows = []
    for i in range(1024):
        rows.append(("wn", i, rng.gauss(0, 1)))
    x = 0.0
    for i in range(1024):
        x = 0.8 * x + rng.gauss(0, 1)
        rows.append(("ar", i, x))
    got = {
        r["series"]: r
        for r in hurst_exponent(
            _series_df(spark, rows),
            series_col="series",
            order_col="ord",
            value_col="value",
        ).collect()
    }
    for name in ("wn", "ar"):
        vals = [v for s, _, v in rows if s == name]
        assert got[name]["hurst"] == pytest.approx(
            _brute_hurst(vals), abs=1e-5
        )
        assert got[name]["n_scales"] == 4 and got[name]["n"] == 1024
    # persistent AR(1) levels score higher than white noise
    assert got["ar"]["hurst"] > got["wn"]["hurst"]


def test_hurst_constant_series_is_null(spark):
    rows = [("const", i, 3.0) for i in range(128)]
    out = hurst_exponent(
        _series_df(spark, rows),
        series_col="series",
        order_col="ord",
        value_col="value",
    ).collect()[0]
    # every block has S = 0 -> no usable scales -> NULL slope
    assert out["n_scales"] == 0 and out["hurst"] is None
    assert out["n"] == 128


def test_hurst_too_short_for_two_scales_is_null(spark):
    rng = random.Random(7)
    rows = [("s", i, rng.random()) for i in range(10)]  # only scale 8 fits
    out = hurst_exponent(
        _series_df(spark, rows),
        series_col="series",
        order_col="ord",
        value_col="value",
    ).collect()[0]
    assert out["n_scales"] <= 1 and out["hurst"] is None


def test_hurst_validates_scales(spark):
    df = _series_df(spark, [("a", 0, 1.0)])
    with pytest.raises(ValueError, match="scales"):
        hurst_exponent(
            df, series_col="series", order_col="ord", value_col="value",
            scales=(8,),
        )
    with pytest.raises(ValueError, match="distinct"):
        hurst_exponent(
            df, series_col="series", order_col="ord", value_col="value",
            scales=(8, 8, 16),
        )
