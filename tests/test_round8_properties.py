"""Property-based tests for the round-8 operators: Mann-Whitney,
Kendall tau-b, the Murphy Brier decomposition, and the Q21
decorrelation — each checked against an independent brute-force Python
reference on arbitrary inputs."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

# ---------------------------------------------------------------------------
# mann_whitney ≡ brute-force pair counting + tie-corrected variance
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(0, 5), min_size=1, max_size=25),
    st.lists(st.integers(0, 5), min_size=1, max_size=25),
)
def test_mann_whitney_matches_pair_counting(spark, xs1, xs0):
    from collections import Counter

    from knot_another_pipeline_spark.operators.quality import mann_whitney

    rows = [("g", float(v), 1) for v in xs1] + [
        ("g", float(v), 0) for v in xs0
    ]
    df = spark.createDataFrame(rows, "grp string, v double, y int")
    r = mann_whitney(
        df, group_cols=["grp"], value_col="v", class_col="y"
    ).collect()[0]
    u = sum(
        1.0 if a > b else 0.5 if a == b else 0.0 for a in xs1 for b in xs0
    )
    assert r["n1"] == len(xs1) and r["n0"] == len(xs0)
    assert r["u"] == round(u, 6)
    n1, n0 = len(xs1), len(xs0)
    n = n1 + n0
    if n >= 2:
        tie3 = sum(t**3 - t for t in Counter(xs1 + xs0).values())
        var_u = n1 * n0 / 12.0 * ((n + 1) - tie3 / (n * (n - 1)))
        if var_u > 0:
            z = (u - n1 * n0 / 2.0) / math.sqrt(var_u)
            assert r["z"] is not None
            assert abs(r["z"] - z) < 1e-6
        else:  # all values tied -> degenerate, NULL by contract
            assert r["z"] is None


# ---------------------------------------------------------------------------
# kendall_tau ≡ brute-force concordant/discordant enumeration
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(-3, 3), st.integers(-3, 3)),
        min_size=2,
        max_size=25,
    )
)
def test_kendall_tau_matches_bruteforce(spark, pts):
    from knot_another_pipeline_spark.operators.quality import kendall_tau

    df = spark.createDataFrame(
        [("g", float(x), float(y)) for x, y in pts],
        "grp string, x double, y double",
    )
    r = kendall_tau(
        df, group_cols=["grp"], x_col="x", y_col="y"
    ).collect()[0]
    c = d = tx = ty = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dx = pts[j][0] - pts[i][0]
            dy = pts[j][1] - pts[i][1]
            if dx == 0:
                tx += 1
            if dy == 0:
                ty += 1
            if dx * dy > 0:
                c += 1
            elif dx * dy < 0:
                d += 1
    n0 = len(pts) * (len(pts) - 1) // 2
    denom = math.sqrt((n0 - tx) * (n0 - ty))
    assert r["n"] == len(pts)
    if denom > 0:
        assert r["tau"] is not None
        assert abs(r["tau"] - (c - d) / denom) < 1e-6
    else:
        assert r["tau"] is None


# ---------------------------------------------------------------------------
# brier_decomposition: exact identity brier = rel - res + unc + residual
# and agreement with row-level brute force
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(0.0, 1.0, allow_nan=False, width=32),
            st.integers(0, 1),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_brier_decomposition_identity(spark, rows):
    from knot_another_pipeline_spark.operators.evaluation import (
        brier_decomposition,
    )

    df = spark.createDataFrame(
        [(float(p), int(o)) for p, o in rows], "score double, y int"
    )
    r = brier_decomposition(df, score_col="score", label_col="y").collect()[
        0
    ]
    brier = sum((p - o) ** 2 for p, o in rows) / len(rows)
    obar = sum(o for _, o in rows) / len(rows)
    assert r["n"] == len(rows)
    assert abs(r["brier"] - brier) < 1e-5
    assert abs(r["uncertainty"] - obar * (1 - obar)) < 1e-5
    # the Murphy identity holds exactly once the reported within-bin
    # residual is added back
    assert (
        abs(
            r["brier"]
            - (
                r["reliability"]
                - r["resolution"]
                + r["uncertainty"]
                + r["residual"]
            )
        )
        < 1e-5
    )
    assert r["reliability"] >= -1e-9 and r["resolution"] >= -1e-9


# ---------------------------------------------------------------------------
# waiting_suppliers decorrelation ≡ classic EXISTS/NOT-EXISTS brute force
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 5),   # orderkey
            st.integers(1, 4),   # suppkey
            st.booleans(),       # late?
        ),
        min_size=1,
        max_size=30,
    )
)
def test_waiting_suppliers_matches_classic_subqueries(spark, lines):
    from collections import Counter

    from knot_another_pipeline_spark.operators.relational import (
        waiting_suppliers,
    )

    base = "2024-01-01 00:00:00"
    late_ship, ok_ship = "2025-06-01 00:00:00", "2024-01-05 00:00:00"
    orders = spark.createDataFrame(
        [(ok, "F", base) for ok in {o for o, _, _ in lines}],
        "o_orderkey long, o_orderstatus string, o_orderdate string",
    ).selectExpr(
        "o_orderkey", "o_orderstatus", "CAST(o_orderdate AS TIMESTAMP) o_orderdate"
    )
    supplier = spark.createDataFrame(
        [(s, f"S#{s}") for s in range(1, 5)], "s_suppkey long, s_name string"
    )
    lineitem = spark.createDataFrame(
        [(o, s, late_ship if is_late else ok_ship) for o, s, is_late in lines],
        "l_orderkey long, l_suppkey long, l_shipdate string",
    ).selectExpr(
        "l_orderkey", "l_suppkey", "CAST(l_shipdate AS TIMESTAMP) l_shipdate"
    )
    # classic formulation, brute force: count late l1 rows where another
    # supplier exists in the order and no other supplier is late
    expect: Counter = Counter()
    for o, s, is_late in lines:
        if not is_late:
            continue
        others = {s2 for o2, s2, _ in lines if o2 == o and s2 != s}
        other_late = {
            s2 for o2, s2, l2 in lines if o2 == o and s2 != s and l2
        }
        if others and not other_late:
            expect[f"S#{s}"] += 1
    got = {
        r["s_name"]: r["numwait"]
        for r in waiting_suppliers(
            supplier, orders, lineitem, late_days=365
        ).collect()
    }
    assert got == dict(expect)


# ---------------------------------------------------------------------------
# signal_gaps ≡ brute-force consecutive-diff enumeration
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 200)),  # (entity, hour)
        min_size=1,
        max_size=30,
    )
)
def test_signal_gaps_matches_bruteforce(spark, evts):
    from collections import defaultdict
    from datetime import datetime, timedelta

    from knot_another_pipeline_spark.operators.tracks import signal_gaps

    base = datetime(2024, 1, 1)
    rows = [(e, base + timedelta(hours=h)) for e, h in evts]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = sorted(
        (r["entity"], str(r["gap_start"]), str(r["gap_end"]), r["gap_hours"])
        for r in signal_gaps(
            df, entity_col="user_id", ts_col="ts", min_gap_hours=24.0
        ).collect()
    )
    by_e = defaultdict(list)
    for e, ts in rows:
        by_e[e].append(ts)
    want = []
    for e, tss in by_e.items():
        tss.sort()
        for a, b in zip(tss, tss[1:]):
            hours = (b - a).total_seconds() / 3600.0
            if hours > 24.0:
                want.append((e, str(a), str(b), round(hours, 3)))
    assert got == sorted(want)


# ---------------------------------------------------------------------------
# od_matrix ≡ brute-force first/last-of-day flows
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["u1", "u2"]),
            st.integers(0, 71),            # hour offset -> 3 days
            st.integers(-2, 2),            # lat cell-ish
            st.integers(-2, 2),            # lon cell-ish
        ),
        min_size=1,
        max_size=30,
    )
)
def test_od_matrix_matches_bruteforce(spark, evts):
    from collections import defaultdict
    from datetime import datetime, timedelta
    from math import floor

    from knot_another_pipeline_spark.operators.tracks import od_matrix

    base = datetime(2024, 1, 1)
    rows = [
        (u, base + timedelta(hours=h), float(la * 7), float(lo * 7), i)
        for i, (u, h, la, lo) in enumerate(evts)
    ]
    df = spark.createDataFrame(
        rows, "uid string, ts timestamp, lat double, lon double, event_id long"
    )
    got = {
        (r["origin_zone"], r["dest_zone"]): (r["n_trips"], r["n_entities"])
        for r in od_matrix(
            df,
            entity_col="uid",
            ts_col="ts",
            lat_col="lat",
            lon_col="lon",
            cell_deg=10.0,
            tiebreak_col="event_id",
        ).collect()
    }
    zone = lambda la, lo: f"{floor(la / 10.0)}:{floor(lo / 10.0)}"  # noqa: E731
    by_day = defaultdict(list)
    for u, ts, la, lo, i in rows:
        by_day[(u, ts.date())].append((ts, i, la, lo))
    flows = defaultdict(set)
    counts = defaultdict(int)
    for (u, _), pts in by_day.items():
        pts.sort()
        o = zone(pts[0][2], pts[0][3])
        d = zone(pts[-1][2], pts[-1][3])
        counts[(o, d)] += 1
        flows[(o, d)].add(u)
    want = {k: (counts[k], len(flows[k])) for k in counts}
    assert got == want


# ---------------------------------------------------------------------------
# silhouette_score ≡ numpy brute force of the centroid formulation
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),  # label
            st.integers(-5, 5),
            st.integers(-5, 5),
        ),
        min_size=2,
        max_size=25,
    ).filter(lambda pts: len({p[0] for p in pts}) >= 2)
)
def test_silhouette_matches_bruteforce(spark, pts):
    import numpy as np

    from knot_another_pipeline_spark.operators.similarity import (
        silhouette_score,
    )

    df = spark.createDataFrame(
        [
            (i, [float(x), float(y)], int(lab))
            for i, (lab, x, y) in enumerate(pts)
        ],
        "vec_id long, embedding array<double>, label int",
    )
    got = {
        r["label"]: (r["n"], r["avg_silhouette"])
        for r in silhouette_score(df).collect()
    }
    X = np.array([[x, y] for _, x, y in pts], dtype=float)
    labs = np.array([lab for lab, _, _ in pts])
    cents = {c: X[labs == c].mean(axis=0) for c in set(labs)}
    per_label = {}
    for c in set(labs):
        ss = []
        for v, lab in zip(X, labs):
            if lab != c:
                continue
            a = float(np.linalg.norm(v - cents[c]))
            b = min(
                float(np.linalg.norm(v - cents[o]))
                for o in cents
                if o != c
            )
            m = max(a, b)
            ss.append((b - a) / m if m > 0 else 0.0)
        per_label[c] = (len(ss), round(sum(ss) / len(ss), 6))
    for c, (n, s) in per_label.items():
        assert got[c][0] == n
        assert abs(got[c][1] - s) < 1e-5, (c, got[c], s)


# ---------------------------------------------------------------------------
# TPC-H-shaped joins ≡ brute-force Python over arbitrary order/line sets
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(1, 6), min_size=0, max_size=12, unique=True),
    st.lists(
        st.tuples(st.integers(1, 6), st.integers(-400, 800)),  # (order, lag)
        min_size=0,
        max_size=25,
    ),
)
def test_order_priority_counts_matches_bruteforce(spark, orderkeys, lines):
    from datetime import datetime, timedelta

    from knot_another_pipeline_spark.operators.relational import (
        order_priority_counts,
    )

    base = datetime(2024, 1, 1)
    prio = lambda k: f"{k % 3}-P"  # noqa: E731
    orders = spark.createDataFrame(
        [(k, prio(k), base) for k in orderkeys],
        "o_orderkey long, o_orderpriority string, o_orderdate timestamp",
    )
    lineitem = spark.createDataFrame(
        [(o, base + timedelta(days=lag)) for o, lag in lines],
        "l_orderkey long, l_shipdate timestamp",
    )
    got = {
        (r["o_orderpriority"], r["n_late_orders"])
        for r in order_priority_counts(
            orders, lineitem, late_days=90
        ).collect()
    }
    late_orders = {
        k
        for k in orderkeys
        if any(o == k and lag > 90 for o, lag in lines)
    }
    from collections import Counter

    want = Counter(prio(k) for k in late_orders)
    assert got == {(p, n) for p, n in want.items()}


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(1, 8), min_size=1, max_size=8, unique=True),
    st.lists(st.integers(1, 8), min_size=0, max_size=30),  # o_custkey per order
)
def test_customer_order_distribution_matches_bruteforce(
    spark, custkeys, order_custs
):
    from collections import Counter

    from knot_another_pipeline_spark.operators.relational import (
        customer_order_distribution,
    )

    customer = spark.createDataFrame(
        [(c,) for c in custkeys], "c_custkey long"
    )
    orders = spark.createDataFrame(
        [(i, c) for i, c in enumerate(order_custs)],
        "o_orderkey long, o_custkey long",
    ) if order_custs else spark.createDataFrame(
        [], "o_orderkey long, o_custkey long"
    )
    got = {
        (r["c_count"], r["custdist"])
        for r in customer_order_distribution(customer, orders).collect()
    }
    per_cust = Counter(c for c in order_custs if c in set(custkeys))
    dist = Counter(per_cust.get(c, 0) for c in custkeys)
    assert got == {(k, v) for k, v in dist.items()}


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),            # nationkey
            st.integers(-200, 200),       # acctbal
            st.booleans(),                # has recent order?
        ),
        min_size=1,
        max_size=20,
    )
)
def test_idle_customers_matches_bruteforce(spark, custs):
    from collections import defaultdict

    from knot_another_pipeline_spark.operators.relational import (
        idle_customers,
    )

    customer = spark.createDataFrame(
        [
            (i, nat, float(bal))
            for i, (nat, bal, _) in enumerate(custs)
        ],
        "c_custkey long, c_nationkey int, c_acctbal double",
    )
    orders = spark.createDataFrame(
        [
            (1000 + i, i, "2002-01-01 00:00:00")
            for i, (_, _, recent) in enumerate(custs)
            if recent
        ],
        "o_orderkey long, o_custkey long, o_orderdate string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "CAST(o_orderdate AS TIMESTAMP) o_orderdate"
    )
    got = {
        r["c_nationkey"]: (r["numcust"], r["totacctbal"])
        for r in idle_customers(
            customer, orders, since="2001-01-01"
        ).collect()
    }
    pos = [bal for _, bal, _ in custs if bal > 0]
    if not pos:
        assert got == {}
        return
    avg = sum(pos) / len(pos)
    agg = defaultdict(lambda: [0, 0.0])
    for nat, bal, recent in custs:
        if bal > avg and not recent:
            agg[nat][0] += 1
            agg[nat][1] += bal
    want = {n: (c, round(t, 2)) for n, (c, t) in agg.items()}
    assert got == want
