"""Property-based tests for the round-7 operators: the Pareto-front
skyline and the group-fairness audit, each checked against an
independent brute-force Python reference on arbitrary inputs."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st


# ---------------------------------------------------------------------------
# pareto_front ≡ brute-force domination scan
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-5, 5), st.integers(-5, 5)),
        min_size=1,
        max_size=40,
    ),
    st.booleans(),
    st.booleans(),
)
def test_pareto_front_matches_bruteforce(spark, pts, mx, my):
    from knot_another_pipeline_spark.operators.relational import pareto_front

    def key(p):
        return (p[0] if mx else -p[0], p[1] if my else -p[1])

    def dominated(p):
        kp = key(p)
        return any(
            key(q)[0] >= kp[0]
            and key(q)[1] >= kp[1]
            and key(q) != kp
            for q in pts
        )

    expect = sorted(p for p in pts if not dominated(p))
    df = spark.createDataFrame(pts, "x int, y int")
    got = sorted(
        (r.x, r.y)
        for r in pareto_front(
            df, x_col="x", y_col="y", maximize_x=mx, maximize_y=my
        ).collect()
    )
    assert got == expect


# ---------------------------------------------------------------------------
# group_fairness ≡ brute-force confusion arithmetic
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(0, 10),
            st.integers(0, 1),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_group_fairness_matches_bruteforce(spark, rows):
    from knot_another_pipeline_spark.operators.evaluation import group_fairness

    t = 5.0

    def rate(num, den):
        return round(num / den, 6) if den else None

    df = spark.createDataFrame(rows, "g string, s int, y int")
    got = {
        r.group: r
        for r in group_fairness(
            df, group_col="g", score_col="s", label_col="y", threshold=t
        ).collect()
    }
    o_pred = [(1 if s >= t else 0, y) for _, s, y in rows]
    o_pos_raw = sum(p for p, _ in o_pred) / len(o_pred)
    for g in {g for g, _, _ in rows}:
        sub = [(1 if s >= t else 0, y) for gg, s, y in rows if gg == g]
        n = len(sub)
        r = got[g]
        assert r.n == n
        assert r.base_rate == rate(sum(y for _, y in sub), n)
        assert r.pos_rate == rate(sum(p for p, _ in sub), n)
        assert r.tpr == rate(
            sum(p * y for p, y in sub), sum(y for _, y in sub)
        )
        assert r.fpr == rate(
            sum(p * (1 - y) for p, y in sub),
            sum(1 - y for _, y in sub),
        )
        assert r.precision == rate(
            sum(p * y for p, y in sub), sum(p for p, _ in sub)
        )
        # gap is rounded AFTER subtracting the unrounded rates
        pos_raw = sum(p for p, _ in sub) / n
        assert r.dp_gap == round(pos_raw - o_pos_raw, 6)


# ---------------------------------------------------------------------------
# blocking_quality ≡ brute-force RR / PC arithmetic
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="ab", min_size=1, max_size=4),
            st.sampled_from(["x", "y"]),
        ),
        min_size=2,
        max_size=25,
    )
)
def test_blocking_quality_matches_bruteforce(spark, rows):
    from knot_another_pipeline_spark.operators.dedup import blocking_quality

    def lev(s, t):
        if len(s) < len(t):
            s, t = t, s
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s):
            cur = [i + 1]
            for j, ct in enumerate(t):
                cur.append(
                    min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (cs != ct))
                )
            prev = cur
        return prev[-1]

    data = [(i + 1, t, b) for i, (t, b) in enumerate(rows)]
    n = len(data)
    truth = [
        (a[0], b[0], a[2], b[2])
        for i, a in enumerate(data)
        for b in data[i + 1:]
        if lev(a[1], b[1]) <= 1
    ]
    from collections import Counter

    sizes = Counter(b for _, _, b in data)
    cand = sum(c * (c - 1) // 2 for c in sizes.values())
    blocked = sum(1 for _, _, ba, bb in truth if ba == bb)

    df = spark.createDataFrame(data, "id int, t string, blk string")
    out = blocking_quality(
        df, id_col="id", text_col="t", block_cols=["blk"]
    ).collect()[0]
    assert out.n_rows == n
    assert out.n_candidate_pairs == cand
    assert out.n_truth_pairs == len(truth)
    assert out.n_truth_blocked == blocked
    assert out.reduction_ratio == round(1 - cand / (n * (n - 1) / 2), 6)
    expect_pc = round(blocked / len(truth), 6) if truth else None
    assert out.pairs_completeness == expect_pc


# ---------------------------------------------------------------------------
# cumulative_users ≡ brute-force first-seen accumulation
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(1, 6)),
        min_size=1,
        max_size=50,
    )
)
def test_cumulative_users_matches_bruteforce(spark, events):
    from pyspark.sql import functions as F

    from knot_another_pipeline_spark.operators.behavior import (
        cumulative_users,
    )

    rows = [
        (f"2024-01-{day + 1:02d} 12:00:00", uid) for day, uid in events
    ]
    df = spark.createDataFrame(rows, "ts string, user_id int").select(
        F.to_timestamp("ts").alias("ts"), "user_id"
    )
    first_seen = {}
    for day, uid in events:
        first_seen[uid] = min(first_seen.get(uid, day), day)
    from collections import Counter

    n_new = Counter(first_seen.values())
    expect, cum = [], 0
    for day in sorted(n_new):
        cum += n_new[day]
        expect.append((f"2024-01-{day + 1:02d}", n_new[day], cum))
    got = [
        (str(r.day), r.n_new, r.cum_users)
        for r in cumulative_users(
            df, ts_col="ts", user_col="user_id"
        ).collect()
    ]
    assert got == expect
