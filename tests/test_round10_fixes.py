"""Round-10 fixes pinned (ADVICE r9 items #1/#2, VERDICT r9 task #2).

1. smd_balance: rows with a NULL weight are excluded from BOTH the
   moment sums and n_treat/n_control, so the reported arm sizes equal
   the rows that actually contribute to the means/SMD.
2. twonn_dimension: a group too small for any point to have two
   same-group neighbors still emits a row — (n_points=0, n_used=0,
   intrinsic_dim NULL) — instead of vanishing from the output.
3. lsh_tuning: max_sample_docs caps the hash-sample at an absolute
   count (smallest (hash64, id) kept — ORDER BY hash, id LIMIT N, the
   rule the DuckDB oracle replays), so the exact-Jaccard leg is
   O(cap²) regardless of corpus size.
"""

from __future__ import annotations

import pytest


def test_smd_balance_null_weight_rows_excluded_from_counts(spark):
    from knot_another_pipeline_spark.operators.evaluation import smd_balance

    rows = [
        ("t", 1.0, 1.0),
        ("t", 3.0, 1.0),
        ("t", 100.0, None),  # NULL weight: must not count nor contribute
        ("c", 2.0, 1.0),
        ("c", 4.0, 1.0),
    ]
    df = spark.createDataFrame(rows, "arm string, x double, w double")
    out = smd_balance(
        df,
        arm_col="arm",
        treatment="t",
        control="c",
        covariate_cols=["x"],
        weight_col="w",
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_treat"] == 2  # not 3: the NULL-weight row is out
    assert r["n_control"] == 2
    assert r["mean_treat"] == pytest.approx(2.0)
    assert r["mean_control"] == pytest.approx(3.0)


def test_twonn_degenerate_group_still_emits_row(spark):
    from knot_another_pipeline_spark.operators.similarity import (
        twonn_dimension,
    )

    rows = [
        # "big": 4 distinct points — a real estimate
        (1, [0.0, 0.0], "big"),
        (2, [1.0, 0.0], "big"),
        (3, [0.0, 2.0], "big"),
        (4, [3.0, 3.0], "big"),
        # "lonely": a single point — no neighbors at all
        (5, [9.0, 9.0], "lonely"),
        # "twins": 2 points — each has ONE neighbor, never two
        (6, [5.0, 5.0], "twins"),
        (7, [5.0, 6.0], "twins"),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    out = {
        r["label"]: r
        for r in twonn_dimension(df, group_cols=["label"]).collect()
    }
    assert set(out) == {"big", "lonely", "twins"}
    for lab in ("lonely", "twins"):
        assert out[lab]["n_points"] == 0
        assert out[lab]["n_used"] == 0
        assert out[lab]["intrinsic_dim"] is None
    assert out["big"]["n_points"] == 4
    assert out["big"]["intrinsic_dim"] is not None


def test_lsh_tuning_absolute_cap_bounds_sample(spark):
    from knot_another_pipeline_spark.operators.dedup import lsh_tuning

    df = spark.createDataFrame(
        [(i, f"alpha beta gamma d{i} e{i} f{i}") for i in range(300)],
        ["doc_id", "text"],
    )
    capped = lsh_tuning(
        df,
        id_col="doc_id",
        text_col="text",
        threshold=0.5,
        sample_pct=100,
        max_sample_docs=40,
    ).collect()
    assert all(r["n_docs_sampled"] <= 40 for r in capped)
    # cap larger than the corpus: a no-op, same sample as uncapped
    uncapped = lsh_tuning(
        df,
        id_col="doc_id",
        text_col="text",
        threshold=0.5,
        sample_pct=100,
    ).collect()
    loose = lsh_tuning(
        df,
        id_col="doc_id",
        text_col="text",
        threshold=0.5,
        sample_pct=100,
        max_sample_docs=10_000,
    ).collect()
    assert sorted(map(tuple, loose)) == sorted(map(tuple, uncapped))
    with pytest.raises(ValueError, match="max_sample_docs"):
        lsh_tuning(
            df,
            id_col="doc_id",
            text_col="text",
            threshold=0.5,
            max_sample_docs=1,
        )


def test_lsh_tuning_cap_is_deterministic_smallest_hash(spark):
    """The capped membership must be exactly the N smallest
    (hash64(id, seed=1), id) — the rule the DuckDB oracle replays."""
    from knot_another_pipeline_spark.functions.hashing import hash64
    from knot_another_pipeline_spark.operators.dedup import lsh_tuning

    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(100)],
        ["doc_id", "text"],
    )
    n = lsh_tuning(
        df,
        id_col="doc_id",
        text_col="text",
        threshold=0.5,
        sample_pct=100,
        max_sample_docs=25,
    ).collect()[0]["n_docs_sampled"]
    assert n == 25
    expected = {
        r["doc_id"]
        for r in df.select("doc_id", hash64(F.col("doc_id"), seed=1).alias("h"))
        .orderBy("h", "doc_id")
        .limit(25)
        .collect()
    }
    assert len(expected) == 25
