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


# ---------------------------------------------------------------------------
# fuzzy_match_pairs deletion-neighborhood path (k=1) vs brute force
# ---------------------------------------------------------------------------

def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_match_deletion_join_matches_bruteforce(spark):
    from knot_another_pipeline_spark.operators.dedup import fuzzy_match_pairs

    import random
    rng = random.Random(3)
    alphabet = "abcde"
    base = ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 7)))
            for _ in range(30)]
    rows = []
    for i, s in enumerate(base):
        rows.append((i, s, "blk"))
        # mutated sibling: substitution, insertion, or deletion
        op = rng.choice(["sub", "ins", "del"])
        if op == "sub" and s:
            p = rng.randrange(len(s))
            m = s[:p] + rng.choice(alphabet) + s[p + 1:]
        elif op == "ins":
            p = rng.randrange(len(s) + 1)
            m = s[:p] + rng.choice(alphabet) + s[p:]
        else:
            p = rng.randrange(len(s)) if s else 0
            m = s[:p] + s[p + 1:] if s else "a"
        rows.append((100 + i, m, "blk"))
    df = spark.createDataFrame(rows, "id bigint, name string, seg string")
    got = {
        (r["id_a"], r["id_b"], r["distance"])
        for r in fuzzy_match_pairs(
            df, id_col="id", text_col="name", max_distance=1,
            block_cols=["seg"],
        ).collect()
    }
    want = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            ia, sa, _ = rows[i]
            ib, sb, _ = rows[j]
            d = _lev(sa, sb)
            if d <= 1:
                lo, hi = min(ia, ib), max(ia, ib)
                want.add((lo, hi, d))
    assert got == want


# ---------------------------------------------------------------------------
# bradley_terry: strengths order matches win dominance; MM math vs numpy
# ---------------------------------------------------------------------------

def test_bradley_terry_matches_reference_updates(spark):
    from knot_another_pipeline_spark.operators.evaluation import bradley_terry

    matches = (
        [("a", "b")] * 8 + [("b", "a")] * 2
        + [("b", "c")] * 6 + [("c", "b")] * 4
        + [("a", "c")] * 9 + [("c", "a")] * 1
    )
    df = spark.createDataFrame(matches, "w string, l string")
    out = {
        r["item"]: r
        for r in bradley_terry(
            df, winner_col="w", loser_col="l", iterations=2
        ).collect()
    }
    # reference MM in plain python
    import itertools
    items = ["a", "b", "c"]
    wins = {(w, l): 0 for w, l in itertools.permutations(items, 2)}
    for w, l in matches:
        wins[(w, l)] += 1
    n = {
        (i, j): wins[(i, j)] + wins[(j, i)]
        for i, j in itertools.permutations(items, 2)
    }
    W = {i: sum(wins[(i, j)] for j in items if j != i) for i in items}
    s = {i: 1.0 for i in items}
    for _ in range(2):
        new = {}
        for i in items:
            denom = sum(
                n[(i, j)] / (s[i] + s[j]) for j in items if j != i
            )
            new[i] = W[i] / denom if denom > 0 else 0.0
        mean = sum(new.values()) / len(new)
        s = {i: v / mean for i, v in new.items()}
    for i in items:
        assert abs(out[i]["strength"] - round(s[i], 6)) < 1e-9, (i, s[i])
    assert out["a"]["strength"] > out["b"]["strength"] > out["c"]["strength"]
    assert out["a"]["n_matches"] == 20 and out["a"]["n_wins"] == 17


# ---------------------------------------------------------------------------
# conformal_threshold: finite-sample coverage on a known distribution
# ---------------------------------------------------------------------------

def test_conformal_threshold_rank_selection(spark):
    from knot_another_pipeline_spark.operators.evaluation import (
        conformal_threshold,
    )

    # cal_pct=100 puts every row in calibration; with n rows and
    # alpha=0.2 the threshold is the ceil((n+1)*0.8)-th smallest score.
    rows = [("g", float(v), str(v)) for v in range(1, 20)]
    df = spark.createDataFrame(rows, "grp string, score double, id string")
    out = conformal_threshold(
        df, group_col="grp", score_col="score", id_col="id",
        alpha=0.2, cal_pct=101,
    ).collect()
    # all rows calibrated -> no eval rows -> empty coverage table
    assert out == []
    out2 = conformal_threshold(
        df, group_col="grp", score_col="score", id_col="id",
        alpha=0.2, cal_pct=50,
    ).collect()
    assert len(out2) == 1
    r = out2[0]
    assert r["n_cal"] + r["n_eval"] == 19
    assert 0.0 <= r["coverage"] <= 1.0
    assert r["target"] == 0.8


def test_classification_report_perfect_and_noisy(spark):
    from knot_another_pipeline_spark.operators.evaluation import (
        classification_report,
    )

    rows = [(0, 0)] * 8 + [(0, 1)] * 2 + [(1, 1)] * 5 + [(2, 1)] * 1
    df = spark.createDataFrame(rows, "t int, p int")
    out = {r["label"]: r for r in classification_report(
        df, true_col="t", pred_col="p"
    ).collect()}
    assert out[0]["support"] == 10 and out[0]["tp"] == 8
    assert out[0]["precision"] == 1.0 and out[0]["recall"] == 0.8
    assert out[1]["predicted"] == 8 and out[1]["tp"] == 5
    assert out[2]["recall"] == 0.0 and out[2]["f1"] is None


def test_class_weights_sum_properties(spark):
    from knot_another_pipeline_spark.operators.features import class_weights

    rows = [(0,)] * 90 + [(1,)] * 9 + [(2,)] * 1
    df = spark.createDataFrame(rows, "label int")
    out = {r["label"]: r for r in class_weights(
        df, label_col="label", beta=0.9
    ).collect()}
    # rare classes get larger weights under both schemes
    assert out[2]["inv_freq_weight"] > out[1]["inv_freq_weight"] > out[0]["inv_freq_weight"]
    assert out[2]["eff_num_weight"] > out[1]["eff_num_weight"] > out[0]["eff_num_weight"]
    # effective-number weights renormalized to mean 1
    mean_eff = sum(r["eff_num_weight"] for r in out.values()) / 3
    assert abs(mean_eff - 1.0) < 1e-4


# ---------------------------------------------------------------------------
# boilerplate_segments / segment_dedup
# ---------------------------------------------------------------------------

def test_boilerplate_segments_flags_template(spark):
    from knot_another_pipeline_spark.operators.text_analysis import (
        boilerplate_segments,
    )

    footer = "all rights reserved contact us"
    rows = [(i, f"unique body {i} words here {footer}") for i in range(4)]
    rows.append((99, "completely different content entirely novel text"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc"]: r for r in boilerplate_segments(
        df, id_col="doc_id", text_col="text",
        segment_tokens=3, min_docs=3,
    ).collect()}
    # docs 0-3 share the 3-token-aligned footer segments; doc 99 shares
    # nothing
    assert out[99]["n_boilerplate"] == 0
    assert all(out[i]["n_boilerplate"] > 0 for i in range(4))


def test_segment_dedup_first_occurrence_wins(spark):
    from knot_another_pipeline_spark.operators.dedup import segment_dedup

    df = spark.createDataFrame(
        [
            (1, "a b c d"),        # segments: "a b", "c d"
            (2, "a b x y"),        # "a b" already claimed by doc 1
            (3, "c d a b"),        # both claimed
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc"]: r for r in segment_dedup(
        df, id_col="doc_id", text_col="text", segment_tokens=2
    ).collect()}
    assert out[1]["n_removed"] == 0
    assert out[2]["n_kept"] == 1 and out[2]["n_removed"] == 1
    assert out[3]["n_kept"] == 0 and out[3]["removed_ratio"] == 1.0


def test_knn_label_noise_flags_minority_island(spark):
    from knot_another_pipeline_spark.operators.similarity import (
        cosine_topk,
        knn_label_noise,
    )

    # two tight clusters; one point in cluster A carries cluster B's label
    rows = []
    for i in range(6):
        rows.append((i, [1.0, 0.01 * i], 0))
    for i in range(6, 12):
        rows.append((i, [0.01 * (i - 6), 1.0], 1))
    rows[2] = (2, rows[2][1], 1)  # mislabeled point inside cluster A
    df = spark.createDataFrame(rows, "vec_id bigint, v array<double>, label int")
    neigh = cosine_topk(df, df, id_col="vec_id", vec_col="v", k=3)
    out = {r["id"]: r for r in knn_label_noise(
        neigh, df, id_col="vec_id", label_col="label",
        suspect_threshold=0.5,
    ).collect()}
    assert out[2]["suspect"] and out[2]["disagree_rate"] == 1.0
    assert not out[7]["suspect"]


def test_dim_truncation_error_full_dim_is_exact(spark):
    from knot_another_pipeline_spark.operators.similarity import (
        dim_truncation_error,
    )

    import random
    rng = random.Random(5)
    pairs = [
        ([rng.gauss(0, 1) for _ in range(16)],
         [rng.gauss(0, 1) for _ in range(16)])
        for _ in range(20)
    ]
    df = spark.createDataFrame(pairs, "va array<double>, vb array<double>")
    out = {r["dim"]: r for r in dim_truncation_error(
        df, vec_a_col="va", vec_b_col="vb", dims=[4, 16]
    ).collect()}
    # truncating to the full width is the identity
    assert out[16]["mean_abs_err"] == 0.0 and out[16]["max_abs_err"] == 0.0
    assert out[4]["mean_abs_err"] > 0.0
    assert out[4]["n_pairs"] == 20


# ---------------------------------------------------------------------------
# pareto_front / group_fairness / cumulative_users (round-7 batch 2)
# ---------------------------------------------------------------------------

def _brute_skyline(rows, max_x, max_y):
    def better(q, p):
        qx, qy = (q[0], q[1]) if max_x else (-q[0], q[1])
        px, py = (p[0], p[1]) if max_x else (-p[0], p[1])
        if not max_y:
            qy, py = -qy, -py
        return qx >= px and qy >= py and (qx > px or qy > py)

    return sorted(
        p for p in rows
        if p[0] is not None and p[1] is not None
        and not any(
            q[0] is not None and q[1] is not None and better(q, p)
            for q in rows
        )
    )


def test_pareto_front_matches_bruteforce_all_orientations(spark):
    from knot_another_pipeline_spark.operators.relational import pareto_front

    rng = random.Random(42)
    rows = [(rng.randint(0, 12), float(rng.randint(0, 12))) for _ in range(200)]
    rows += [(None, 1.0), (3, None), rows[0]]  # NULLs drop; dup survives twice
    df = spark.createDataFrame(rows, "x int, y double")
    for mx in (True, False):
        for my in (True, False):
            got = sorted(
                (r.x, r.y)
                for r in pareto_front(
                    df, x_col="x", y_col="y", maximize_x=mx, maximize_y=my
                ).collect()
            )
            assert got == _brute_skyline(rows, mx, my), (mx, my)


def test_pareto_front_keeps_equal_point_duplicates(spark):
    from knot_another_pipeline_spark.operators.relational import pareto_front

    df = spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, 5.0), (3, 9, 5.0), (4, 10, 4.0)],
        "id int, x int, y double",
    )
    got = sorted(
        r.id for r in pareto_front(df, x_col="x", y_col="y").collect()
    )
    # (10, 5.0) twice — mutually non-dominating; the others are dominated.
    assert got == [1, 2]


def test_group_fairness_hand_computed(spark):
    from knot_another_pipeline_spark.operators.evaluation import group_fairness

    # group a: scores 0.9/0.8 predicted pos (t=0.5), labels 1/0;
    #          0.1 predicted neg, label 1  → tpr 1/2, fpr 1/1, pos_rate 2/3
    # group b: all labels 0 → tpr NULL; no predicted pos → precision NULL
    rows = [
        ("a", 0.9, 1), ("a", 0.8, 0), ("a", 0.1, 1),
        ("b", 0.2, 0), ("b", 0.3, 0),
        (None, 0.9, 1), ("a", None, 1), ("a", 0.9, None),
    ]
    df = spark.createDataFrame(rows, "g string, s double, y int")
    out = {
        r.group: r
        for r in group_fairness(
            df, group_col="g", score_col="s", label_col="y", threshold=0.5
        ).collect()
    }
    a, b = out["a"], out["b"]
    assert (a.n, b.n) == (3, 2)
    assert a.pos_rate == round(2 / 3, 6) and b.pos_rate == 0.0
    assert a.tpr == 0.5 and a.fpr == 1.0 and a.precision == 0.5
    assert b.tpr is None and b.precision is None and b.fpr == 0.0
    # overall pos_rate = 2/5; dp gaps vs it
    assert a.dp_gap == round(2 / 3 - 2 / 5, 6)
    assert b.dp_gap == round(0 - 2 / 5, 6)
    assert b.tpr_gap is None


def test_cumulative_users_first_seen_semantics(spark):
    from knot_another_pipeline_spark.operators.behavior import cumulative_users

    rows = [
        ("2024-01-01 10:00:00", 1), ("2024-01-01 11:00:00", 2),
        ("2024-01-02 09:00:00", 1),  # returning — not new
        ("2024-01-03 09:00:00", 3), ("2024-01-03 10:00:00", 1),
        (None, 9), ("2024-01-04 00:00:00", None),
    ]
    df = spark.createDataFrame(rows, "ts string, user_id int").select(
        F.col("ts").cast("timestamp").alias("ts"), "user_id"
    )
    got = [
        (str(r.day), r.n_new, r.cum_users)
        for r in cumulative_users(df, ts_col="ts", user_col="user_id").collect()
    ]
    assert got == [("2024-01-01", 2, 2), ("2024-01-03", 1, 3)]


def test_blocking_quality_hand_computed(spark):
    from knot_another_pipeline_spark.operators.dedup import blocking_quality

    # names: "aa"~"ab" (dist 1, same block), "aa"~"ba" (dist 1, SPLIT
    # across blocks), "zz" isolated. Block sizes: x=3 -> 3 cand pairs,
    # y=1 -> 0. Truth pairs: (1,2),(1,3),(2,3)? "ab"~"ba" is dist 2 —
    # truth = (1,2),(1,4) where 4 is "ba" in block y.
    rows = [
        (1, "aa", "x"), (2, "ab", "x"), (3, "zz", "x"), (4, "ba", "y"),
    ]
    df = spark.createDataFrame(rows, "id int, t string, blk string")
    out = blocking_quality(
        df, id_col="id", text_col="t", block_cols=["blk"]
    ).collect()[0]
    assert out.n_rows == 4
    assert out.n_candidate_pairs == 3  # C(3,2) + C(1,2)
    assert out.n_truth_pairs == 2      # (aa,ab) and (aa,ba)
    assert out.n_truth_blocked == 1    # (aa,ba) straddles blocks
    assert out.reduction_ratio == 0.5  # 1 - 3/6
    assert out.pairs_completeness == 0.5


def test_shard_moves_matches_md5_bruteforce(spark):
    import hashlib

    from knot_another_pipeline_spark.operators.sampling import shard_moves

    keys = list(range(1, 61))
    n_from, n_to = 3, 4

    def hx(seed, key):
        return hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:15]

    mod_moved = sum(
        1 for k in keys
        if int(hx(0, k), 16) % n_from != int(hx(0, k), 16) % n_to
    )
    def owner(k, n):
        ws = [hx(s, k) for s in range(n)]
        return ws.index(max(ws))
    rdv_moved = sum(
        1 for k in keys if owner(k, n_from) != owner(k, n_to)
    )
    df = spark.createDataFrame([(k,) for k in keys], "key int")
    out = {
        r.scheme: r
        for r in shard_moves(
            df, key_col="key", n_from=n_from, n_to=n_to
        ).collect()
    }
    assert out["mod"].n_keys == 60 and out["rendezvous"].n_keys == 60
    assert out["mod"].n_moved == mod_moved
    assert out["rendezvous"].n_moved == rdv_moved
    # the whole point: HRW moves far fewer keys than mod on a resize
    assert rdv_moved < mod_moved
