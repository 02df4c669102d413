"""Round-6 hardening: the model-evaluation family's first unit tests
(auc/calibration/lift/psi landed in round 5's final commit with only the
oracle differential), plus regression tests for the round-6 fixes — PSI
full-grid densification, rfm NULL-metric scoring, acf/seasonal tiebreak
determinism, and the chi2 whole-table-window removal.

References are hand-computed or brute-force Python; DuckDB oracle parity
runs in test_catalog_oracle.py.
"""

from __future__ import annotations

import math
import re

import pytest

from pyspark.sql import functions as F

from knot_another_pipeline_spark.operators.evaluation import (
    auc_scores,
    calibration_curve,
    lift_table,
    psi_stability,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# auc_scores
# ---------------------------------------------------------------------------


def _auc_bruteforce(pairs):
    """P(score+ > score-) + 0.5 P(=) over all (pos, neg) pairs."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    if not pos or not neg:
        return None
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
    )
    return wins / (len(pos) * len(neg))


def test_auc_matches_bruteforce_with_ties(spark):
    pairs = [
        (0.9, 1), (0.8, 1), (0.8, 0), (0.7, 1), (0.5, 0),
        (0.5, 0), (0.5, 1), (0.3, 0), (0.1, 0), (0.1, 1),
    ]
    df = spark.createDataFrame(
        [("g", s, y) for s, y in pairs], ["grp", "score", "label"]
    )
    row = auc_scores(
        df, group_cols=["grp"], score_col="score", label_col="label"
    ).collect()[0]
    assert row["n_pos"] == 5 and row["n_neg"] == 5
    assert row["auc"] == pytest.approx(_auc_bruteforce(pairs), abs=1e-6)


def test_auc_perfect_and_degenerate_groups(spark):
    rows = (
        # perfect separation
        [("sep", 0.9, 1), ("sep", 0.8, 1), ("sep", 0.2, 0), ("sep", 0.1, 0)]
        # anti-separation
        + [("anti", 0.1, 1), ("anti", 0.9, 0)]
        # no negatives -> NULL
        + [("allpos", 0.5, 1), ("allpos", 0.6, 1)]
    )
    df = spark.createDataFrame(rows, ["grp", "score", "label"])
    out = {
        r["grp"]: r
        for r in auc_scores(
            df, group_cols=["grp"], score_col="score", label_col="label"
        ).collect()
    }
    assert out["sep"]["auc"] == pytest.approx(1.0)
    assert out["anti"]["auc"] == pytest.approx(0.0)
    assert out["allpos"]["auc"] is None


def test_auc_plan_single_exchange(spark):
    """Rank window, tie window, and aggregate share ONE group shuffle."""
    df = spark.createDataFrame(
        [("g", 0.1 * i, i % 2) for i in range(20)], ["grp", "score", "label"]
    )
    plan = _plan(
        auc_scores(df, group_cols=["grp"], score_col="score", label_col="label")
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


# ---------------------------------------------------------------------------
# calibration_curve
# ---------------------------------------------------------------------------


def test_calibration_bins_and_edge_fold(spark):
    rows = [
        (0.05, 0), (0.08, 0),          # bin 0
        (0.55, 1), (0.58, 0),          # bin 5
        (1.0, 1),                      # exactly 1.0 folds into top bin
    ]
    df = spark.createDataFrame(rows, ["score", "label"])
    out = {
        r["bin"]: r
        for r in calibration_curve(
            df, score_col="score", label_col="label", n_bins=10
        ).collect()
    }
    assert set(out) == {0, 5, 9}
    assert out[0]["n"] == 2 and out[0]["event_rate"] == 0.0
    assert out[0]["mean_score"] == pytest.approx(0.065, abs=1e-6)
    assert out[5]["event_rate"] == pytest.approx(0.5)
    assert out[5]["lo"] == pytest.approx(0.5) and out[5]["hi"] == pytest.approx(0.6)
    assert out[9]["n"] == 1 and out[9]["event_rate"] == 1.0


def test_calibration_validates_bins(spark):
    df = spark.createDataFrame([(0.5, 1)], ["score", "label"])
    with pytest.raises(ValueError, match="n_bins"):
        calibration_curve(df, score_col="score", label_col="label", n_bins=1)


# ---------------------------------------------------------------------------
# lift_table
# ---------------------------------------------------------------------------


def test_lift_table_values(spark):
    # 100 rows, score = i/100; positives are exactly the top 20 scores.
    rows = [(i / 100.0, 1 if i >= 80 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, ["score", "label"])
    out = {
        r["tile"]: r
        for r in lift_table(
            df, score_col="score", label_col="label", n_tiles=5
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    # tile 1 = highest scores: all 20 positives live in the top quintile
    assert out[1]["n_events"] == 20 and out[1]["event_rate"] == 1.0
    # base rate 0.2 -> top-tile lift 5x
    assert out[1]["lift"] == pytest.approx(5.0)
    assert out[1]["cum_capture"] == pytest.approx(1.0)
    assert out[5]["n_events"] == 0 and out[5]["cum_capture"] == pytest.approx(1.0)
    assert sum(r["n"] for r in out.values()) == 100


def test_lift_table_plan_no_global_ntile_sort(spark):
    """Tiling is threshold-broadcast + map-side compare: no ntile() and
    no single-partition window over the scored rows."""
    df = spark.createDataFrame(
        [(i / 50.0, i % 2) for i in range(50)], ["score", "label"]
    )
    plan = _plan(lift_table(df, score_col="score", label_col="label"))
    # no ntile() window function ("percentile" the aggregate is fine)
    assert not re.search(r"\bntile\(", plan), plan


# ---------------------------------------------------------------------------
# psi_stability
# ---------------------------------------------------------------------------


def _psi_bruteforce(e_vals, a_vals, bins, lo, hi):
    width = (hi - lo) / bins
    ne = [0.0] * bins
    na = [0.0] * bins
    for v in e_vals:
        ne[min(max(int((v - lo) // width), 0), bins - 1)] += 1
    for v in a_vals:
        na[min(max(int((v - lo) // width), 0), bins - 1)] += 1
    te, ta = sum(ne), sum(na)
    psi = 0.0
    for b in range(bins):
        pe = (ne[b] + 0.5) / (te + 0.5 * bins)
        pa = (na[b] + 0.5) / (ta + 0.5 * bins)
        psi += (pa - pe) * math.log(pa / pe)
    return psi


def test_psi_identical_distributions_stable(spark):
    vals = [(float(i % 10),) for i in range(200)]
    e = spark.createDataFrame(vals, ["v"])
    a = spark.createDataFrame(vals, ["v"])
    row = psi_stability(e, a, "v", bins=10, lo=0.0, hi=10.0).collect()[0]
    assert row["psi"] == pytest.approx(0.0, abs=1e-9)
    assert row["verdict"] == "stable"
    assert row["n_expected"] == 200 and row["n_actual"] == 200


def test_psi_counts_both_empty_bins(spark):
    """Regression (round-6 fix): bins empty in BOTH snapshots still
    carry a nonzero Laplace term when the totals differ — the grid is
    densified to 0..bins-1, not just the union of occupied bins."""
    e_vals = [1.0] * 100          # bin 0 only, total 100
    a_vals = [1.0] * 10           # bin 0 only, total 10
    e = spark.createDataFrame([(v,) for v in e_vals], ["v"])
    a = spark.createDataFrame([(v,) for v in a_vals], ["v"])
    row = psi_stability(e, a, "v", bins=4, lo=0.0, hi=4.0).collect()[0]
    expected = _psi_bruteforce(e_vals, a_vals, 4, 0.0, 4.0)
    assert row["psi"] == pytest.approx(expected, abs=1e-6)
    # the sparse-join (pre-fix) value would miss the 3 both-empty bins
    sparse = _psi_bruteforce(e_vals, a_vals, 1, 0.0, 1.0)  # only bin 0
    assert abs(row["psi"] - sparse) > 1e-4


def test_psi_shifted_distribution_flags(spark):
    e = spark.createDataFrame([(float(i % 3),) for i in range(300)], ["v"])
    a = spark.createDataFrame([(float(7 + i % 3),) for i in range(300)], ["v"])
    row = psi_stability(e, a, "v", bins=10, lo=0.0, hi=10.0).collect()[0]
    assert row["verdict"] == "shifted"
    assert row["psi"] > 0.25


# ---------------------------------------------------------------------------
# rfm_segments NULL-metric scoring (round-6 fix)
# ---------------------------------------------------------------------------


def test_rfm_null_monetary_scores_null_not_one(spark):
    from knot_another_pipeline_spark.operators.behavior import rfm_segments

    rows = [
        ("a", "2024-01-10", 100.0),
        ("a", "2024-01-12", 50.0),
        ("b", "2024-01-01", 10.0),
        ("c", "2024-01-05", None),   # all-NULL monetary for entity c
    ]
    df = spark.createDataFrame(rows, ["cust", "ts", "amount"]).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {
        r["entity"]: r
        for r in rfm_segments(
            df,
            entity_col="cust",
            ts_col="ts",
            value_col="amount",
            ref_date="2024-02-01",
            n_tiles=3,
        ).collect()
    }
    assert out["c"]["monetary"] is None
    assert out["c"]["m_score"] is None
    assert out["c"]["segment"] is None        # not a silent 2-digit code
    # entities with real metrics still score 1..n
    assert out["a"]["segment"] is not None
    assert len(out["a"]["segment"]) == 3


# ---------------------------------------------------------------------------
# acf / seasonal_decompose tiebreak determinism (round-6 fix)
# ---------------------------------------------------------------------------


def test_acf_tiebreak_makes_duplicate_orders_deterministic(spark):
    from knot_another_pipeline_spark.operators.temporal import acf

    # duplicate order value 2 with distinct row ids; tiebreak pins order
    rows = [
        ("s", 0, 10, 1.0), ("s", 1, 11, 2.0),
        ("s", 2, 12, 3.0), ("s", 2, 13, 4.0),
        ("s", 3, 14, 5.0),
    ]
    df = spark.createDataFrame(rows, ["sid", "t", "rid", "v"])
    base = sorted(
        map(
            tuple,
            acf(
                df, series_col="sid", order_col="t", value_col="v",
                max_lag=2, tiebreak_col="rid",
            ).collect(),
        )
    )
    shuffled = sorted(
        map(
            tuple,
            acf(
                df.repartition(7), series_col="sid", order_col="t",
                value_col="v", max_lag=2, tiebreak_col="rid",
            ).collect(),
        )
    )
    assert base == shuffled
    # brute force with the pinned order 10,11,12,13,14
    series = [1.0, 2.0, 3.0, 4.0, 5.0]

    def pearson(x, y):
        n = len(x)
        mx, my = sum(x) / n, sum(y) / n
        cov = sum((a - mx) * (b - my) for a, b in zip(x, y)) / n
        vx = sum((a - mx) ** 2 for a in x) / n
        vy = sum((b - my) ** 2 for b in y) / n
        return cov / math.sqrt(vx * vy)

    got = {r[1]: r[3] for r in base}
    for k in (1, 2):
        ref = pearson(series[k:], series[:-k])
        assert got[k] == pytest.approx(ref, abs=1e-6)


def test_seasonal_decompose_tiebreak_stable_under_repartition(spark):
    from knot_another_pipeline_spark.operators.temporal import (
        seasonal_decompose,
    )

    rows = [
        ("s", i // 2, i, float((i % 3) + i * 0.1)) for i in range(12)
    ]  # every order value duplicated -> ties everywhere
    df = spark.createDataFrame(rows, ["sid", "t", "rid", "v"])
    kwargs = dict(
        series_col="sid", order_col="t", value_col="v", period=3,
        tiebreak_col="rid",
    )
    a = sorted(map(tuple, seasonal_decompose(df, **kwargs).collect()))
    b = sorted(
        map(tuple, seasonal_decompose(df.repartition(5), **kwargs).collect())
    )
    assert a == b


# ---------------------------------------------------------------------------
# chi2_independence: no whole-table window (round-6 fix)
# ---------------------------------------------------------------------------


def test_chi2_plan_has_no_single_partition_window(spark):
    from knot_another_pipeline_spark.operators.quality import (
        chi2_independence,
    )

    df = spark.createDataFrame(
        [(f"r{i % 13}", f"c{i % 7}") for i in range(300)], ["a", "b"]
    )
    plan = _plan(chi2_independence(df, row_col="a", col_col="b"))
    # margin totals are joins over distributed aggregates, never an
    # Exchange SinglePartition feeding a Window over the cells frame
    assert "Window" not in plan, plan


def test_chi2_values_match_scipy_free_reference(spark):
    from knot_another_pipeline_spark.operators.quality import (
        chi2_independence,
    )

    # 2x2 table: [[10, 20], [30, 40]]
    rows = (
        [("x", "p")] * 10 + [("x", "q")] * 20
        + [("y", "p")] * 30 + [("y", "q")] * 40
    )
    df = spark.createDataFrame(rows, ["a", "b"])
    row = chi2_independence(df, row_col="a", col_col="b").collect()[0]
    n = 100
    chi2 = 0.0
    table = {("x", "p"): 10, ("x", "q"): 20, ("y", "p"): 30, ("y", "q"): 40}
    rt = {"x": 30, "y": 70}
    ct = {"p": 40, "q": 60}
    for (r, c), o in table.items():
        e = rt[r] * ct[c] / n
        chi2 += (o - e) ** 2 / e
    assert row["n"] == n and row["dof"] == 1
    assert row["chi2"] == pytest.approx(chi2, abs=1e-6)
    assert row["cramers_v"] == pytest.approx(math.sqrt(chi2 / n), abs=1e-6)
