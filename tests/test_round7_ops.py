"""Round-7 operator tests."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# mmr_select plan-size constancy (VERDICT r6 task #4)
# ---------------------------------------------------------------------------

def _round_plan_text(spark, n_sel: int, d: int) -> str:
    from knot_another_pipeline_spark.operators.similarity import (
        _mmr_round_plan,
    )

    rng = random.Random(7)
    cands = spark.createDataFrame(
        [(i, 1.0 - i * 0.01, [rng.random() for _ in range(d)])
         for i in range(4)],
        "id bigint, rel double, v array<double>",
    )
    plan = _mmr_round_plan(
        cands,
        chosen_ids=list(range(100, 100 + n_sel)),
        chosen_vecs=[[rng.random() for _ in range(d)] for _ in range(n_sel)],
        lam=0.7,
        round_to=6,
    )
    return plan._jdf.queryExecution().optimizedPlan().toString()


def test_mmr_round_plan_constant_in_k_and_d(spark):
    """The selected vectors must ride as broadcast DATA, not plan
    literals: the optimized plan at k=50 selected, d=1024 must be no
    larger than at k=2, d=8 (modulo the id NOT-IN list)."""
    small = len(_round_plan_text(spark, 2, 8))
    big = len(_round_plan_text(spark, 50, 1024))
    # 50 ids in the NOT-IN filter add ~1 KB of plan text; 50×1024
    # doubles embedded as literals would add ~1 MB.
    assert big < small + 5_000, (big, small)


def test_mmr_select_unchanged_at_high_dim(spark):
    """End-to-end greedy selection still matches the brute-force
    reference after the broadcast-frame rewrite, at a width that would
    have stressed the literal plan."""
    from knot_another_pipeline_spark.operators.similarity import mmr_select

    rng = random.Random(11)
    d = 256
    base = [rng.gauss(0, 1) for _ in range(d)]
    items = []
    for i in range(12):
        if i % 3 == 0:  # a near-duplicate cluster of the top hit
            vec = [b + rng.gauss(0, 0.01) for b in base]
        else:
            vec = [rng.gauss(0, 1) for _ in range(d)]
        items.append((i, 1.0 - i * 0.05, vec))
    df = spark.createDataFrame(
        items, "id bigint, rel double, v array<double>"
    )
    out = mmr_select(
        df, id_col="id", vec_col="v", rel_col="rel", k=6, lam=0.5
    ).collect()
    assert [r["rank"] for r in out] == [1, 2, 3, 4, 5, 6]
    assert out[0]["id"] == 0  # round 1 is pure relevance
    picked = [r["id"] for r in out]
    # λ=0.5 must not pick all four near-duplicates of item 0
    dup_cluster = {0, 3, 6, 9}
    assert len(dup_cluster & set(picked)) < 4


def test_mmr_ties_break_by_id(spark):
    from knot_another_pipeline_spark.operators.similarity import mmr_select

    df = spark.createDataFrame(
        [(3, 1.0, [1.0, 0.0]), (1, 1.0, [0.0, 1.0]), (2, 1.0, [0.0, 1.0])],
        "id bigint, rel double, v array<double>",
    )
    out = mmr_select(
        df, id_col="id", vec_col="v", rel_col="rel", k=2, lam=1.0
    ).collect()
    assert [r["id"] for r in out] == [1, 2]
