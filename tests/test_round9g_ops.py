"""Round-9 late additions, batch g: inference-grade evaluation —
DeLong AUC standard errors / CIs and Fleiss' multi-rater kappa —
against exact in-Python brute force (pairwise placements, textbook
Fleiss), plus the degenerate single-class / single-rating / unanimous
cases.
"""

from __future__ import annotations

import math
import random
from collections import Counter, defaultdict

import pytest

from knot_another_pipeline_spark.operators.evaluation import delong_auc
from knot_another_pipeline_spark.operators.quality import fleiss_kappa


def _brute_delong(scored):
    pos = [s for s, y in scored if y == 1]
    neg = [s for s, y in scored if y == 0]

    def placement(x, arr):
        lt = sum(1 for a in arr if a < x)
        eq = sum(1 for a in arr if a == x)
        return (lt + 0.5 * eq) / len(arr)

    v10 = [placement(p, neg) for p in pos]
    v01 = [1 - placement(n, pos) for n in neg]
    auc = sum(v10) / len(v10)

    def svar(v):
        m = sum(v) / len(v)
        return sum((x - m) ** 2 for x in v) / (len(v) - 1)

    se = math.sqrt(svar(v10) / len(pos) + svar(v01) / len(neg))
    return auc, se


def test_delong_matches_pairwise_bruteforce_with_ties(spark):
    rng = random.Random(9)
    rows = []
    for _ in range(300):
        y = 1 if rng.random() < 0.4 else 0
        s = round(rng.gauss(1.0 if y else 0.0, 1.0), 1)  # coarse -> ties
        rows.append(("m", s, y))
    out = delong_auc(
        spark.createDataFrame(rows, "g string, score double, y int"),
        group_cols=["g"],
        score_col="score",
        label_col="y",
    ).collect()[0]
    auc, se = _brute_delong([(s, y) for _, s, y in rows])
    assert out["auc"] == pytest.approx(auc, abs=1e-6)
    assert out["se"] == pytest.approx(se, abs=1e-6)
    z = 1.959963984540054
    assert out["ci_lo"] == pytest.approx(max(0.0, auc - z * se), abs=1e-5)
    assert out["ci_hi"] == pytest.approx(min(1.0, auc + z * se), abs=1e-5)


def test_delong_perfect_separation_clamps_ci(spark):
    rows = [("g", float(i), 0) for i in range(10)] + [
        ("g", float(100 + i), 1) for i in range(10)
    ]
    out = delong_auc(
        spark.createDataFrame(rows, "g string, score double, y int"),
        group_cols=["g"],
        score_col="score",
        label_col="y",
    ).collect()[0]
    assert out["auc"] == 1.0 and out["se"] == 0.0
    assert out["ci_lo"] == 1.0 and out["ci_hi"] == 1.0


def test_delong_single_class_group_is_null(spark):
    rows = [("pos_only", float(i), 1) for i in range(5)] + [
        ("tiny", 1.0, 1),
        ("tiny", 0.0, 0),
    ]
    got = {
        r["g"]: r
        for r in delong_auc(
            spark.createDataFrame(rows, "g string, score double, y int"),
            group_cols=["g"],
            score_col="score",
            label_col="y",
        ).collect()
    }
    assert got["pos_only"]["auc"] is None and got["pos_only"]["se"] is None
    # one row per class: AUC defined, SE not (needs >= 2 per class)
    assert got["tiny"]["auc"] == 1.0 and got["tiny"]["se"] is None


# ---------------------------------------------------------------------------
# fleiss_kappa


def _brute_fleiss(rows):
    cellc = defaultdict(Counter)
    for i, c in rows:
        cellc[i][c] += 1
    inc = {i: cnt for i, cnt in cellc.items() if sum(cnt.values()) >= 2}
    if not inc:
        return None
    tot, big_n, pis = Counter(), 0, []
    for cnt in inc.values():
        ni = sum(cnt.values())
        big_n += ni
        pis.append(
            (sum(v * v for v in cnt.values()) - ni) / (ni * (ni - 1))
        )
        tot.update(cnt)
    pbar = sum(pis) / len(pis)
    pe = sum((v / big_n) ** 2 for v in tot.values())
    return (pbar - pe) / (1 - pe), pbar, pe, len(inc), big_n


def test_fleiss_matches_bruteforce_variable_raters(spark):
    rng = random.Random(11)
    cats = ["a", "b", "c"]
    rows = []
    for item in range(60):
        bias = rng.choice(cats)
        for _ in range(rng.randrange(2, 7)):
            rows.append(
                (f"it{item}", bias if rng.random() < 0.6 else rng.choice(cats))
            )
    rows += [("solo1", "a"), ("solo2", "b")]  # excluded single ratings
    out = fleiss_kappa(
        spark.createDataFrame(rows, "item string, label string"),
        item_col="item",
        label_col="label",
    ).collect()[0]
    kappa, pbar, pe, n_items, n_ratings = _brute_fleiss(rows)
    assert out["n_items"] == n_items and out["n_ratings"] == n_ratings
    assert out["kappa"] == pytest.approx(kappa, abs=1e-6)
    assert out["p_bar"] == pytest.approx(pbar, abs=1e-6)
    assert out["p_e"] == pytest.approx(pe, abs=1e-6)


def test_fleiss_unanimous_single_category_is_null(spark):
    rows = [(f"it{i}", "same") for i in range(10) for _ in range(3)]
    out = fleiss_kappa(
        spark.createDataFrame(rows, "item string, label string"),
        item_col="item",
        label_col="label",
    ).collect()[0]
    # P_e = 1 -> kappa undefined, not 1.0
    assert out["kappa"] is None
    assert out["p_bar"] == 1.0 and out["p_e"] == 1.0


def test_fleiss_perfect_agreement_two_categories_is_one(spark):
    rows = [(f"a{i}", "x") for i in range(5) for _ in range(4)] + [
        (f"b{i}", "y") for i in range(5) for _ in range(4)
    ]
    out = fleiss_kappa(
        spark.createDataFrame(rows, "item string, label string"),
        item_col="item",
        label_col="label",
    ).collect()[0]
    assert out["kappa"] == pytest.approx(1.0, abs=1e-9)
    assert out["k_categories"] == 2


def test_fleiss_no_multirated_items_is_null_row(spark):
    rows = [("a", "x"), ("b", "y")]
    out = fleiss_kappa(
        spark.createDataFrame(rows, "item string, label string"),
        item_col="item",
        label_col="label",
    ).collect()[0]
    assert out["n_items"] == 0 and out["kappa"] is None
