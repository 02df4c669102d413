"""Property-based tests for the round-6 operators: pair evaluation,
weighted quantiles, interval concurrency, containment joins,
sorted-neighborhood blocking, changepoint detection and label
propagation — each checked against an independent brute-force Python
reference on arbitrary inputs, one batched Spark run per property."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# pair_eval ≡ brute-force set arithmetic
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), max_size=20
    ),
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), max_size=20
    ),
)
def test_pair_eval_matches_set_arithmetic(spark, pred, truth):
    from knot_another_pipeline_spark.operators.evaluation import pair_eval

    def canon(pairs):
        return {
            (min(a, b), max(a, b)) for a, b in pairs if a != b
        }

    p, t = canon(pred), canon(truth)
    pdf = spark.createDataFrame(
        pred or [(0, 0)], ["id_a", "id_b"]
    )
    if not pred:
        pdf = pdf.filter(F.lit(False))
    tdf = spark.createDataFrame(
        truth or [(0, 0)], ["id_a", "id_b"]
    )
    if not truth:
        tdf = tdf.filter(F.lit(False))
    row = pair_eval(pdf, tdf).collect()[0]
    tp = len(p & t)
    assert row["n_pred"] == len(p) and row["n_true"] == len(t)
    assert row["tp"] == tp
    if p:
        assert row["precision"] == round(tp / len(p), 6)
    else:
        assert row["precision"] is None
    if t:
        assert row["recall"] == round(tp / len(t), 6)
    else:
        assert row["recall"] is None


# ---------------------------------------------------------------------------
# weighted_quantiles ≡ brute-force cumulative crossing
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(-5, 5),
            st.floats(min_value=0.1, max_value=9.0, allow_nan=False),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_weighted_quantiles_match_bruteforce(spark, rows):
    from knot_another_pipeline_spark.operators.quality import (
        weighted_quantiles,
    )

    qs = [0.25, 0.5, 0.9]
    df = spark.createDataFrame(
        [("g", float(v), w) for v, w in rows], ["g", "v", "w"]
    )
    got = weighted_quantiles(
        df, group_cols=["g"], value_col="v", weight_col="w", quantiles=qs
    ).collect()[0]

    mass: dict = {}
    for v, w in rows:
        mass[float(v)] = mass.get(float(v), 0.0) + w
    total = sum(mass.values())
    for q, name in zip(qs, ["q25", "q50", "q90"]):
        cum = 0.0
        want = None
        for v in sorted(mass):
            cum += mass[v]
            if cum >= q * total:
                want = v
                break
        assert got[name] == round(want, 6)


# ---------------------------------------------------------------------------
# max_concurrency ≡ brute-force sweep over event points
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        min_size=1,
        max_size=25,
    )
)
def test_max_concurrency_matches_bruteforce(spark, iv):
    from knot_another_pipeline_spark.operators.temporal import (
        max_concurrency,
    )

    df = spark.createDataFrame(
        [("g", float(s), float(e)) for s, e in iv], ["g", "s", "e"]
    )
    row = max_concurrency(
        df, group_cols=["g"], start_col="s", end_col="e"
    ).collect()[0]
    valid = [(s, e) for s, e in iv if e > s]
    assert row["n_intervals"] == len(valid)
    assert row["n_dropped"] == len(iv) - len(valid)
    if not valid:
        assert row["max_concurrent"] == 0
        return
    # concurrency just after each start point, half-open semantics
    best = max(
        sum(1 for s, e in valid if s <= t < e)
        for t, _ in valid
    )
    assert row["max_concurrent"] == best


# ---------------------------------------------------------------------------
# containment_pairs ≡ brute-force shingle set containment
# ---------------------------------------------------------------------------


_doc = st.lists(
    st.sampled_from("abcdef"), min_size=3, max_size=12
).map(lambda ws: " ".join(ws))


@settings(max_examples=6, deadline=None)
@given(st.lists(_doc, min_size=2, max_size=6))
def test_containment_matches_bruteforce(spark, docs):
    from knot_another_pipeline_spark.operators.dedup import (
        containment_pairs,
        shingle_table,
    )

    def shingles(text):
        toks = text.split()
        return {
            " ".join(toks[i: i + 3]) for i in range(len(toks) - 2)
        }

    sets = {i: shingles(t) for i, t in enumerate(docs)}
    df = spark.createDataFrame(
        list(enumerate(docs)), ["doc_id", "text"]
    )
    sh = shingle_table(df, id_col="doc_id", text_col="text", n=3)
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(sh, min_containment=0.0).collect()
    }
    for a in sets:
        for b in sets:
            if a == b or not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            if inter == 0:
                assert (a, b) not in got
            else:
                assert got[(a, b)] == round(inter / len(sets[a]), 6)


# ---------------------------------------------------------------------------
# sorted_neighborhood_pairs ≡ brute-force rank-window pair set
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.text("xyz", min_size=1, max_size=4), min_size=1,
             max_size=15),
    st.integers(2, 5),
)
def test_sorted_neighborhood_matches_bruteforce(spark, keys, window):
    from knot_another_pipeline_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    rows = list(enumerate(keys))
    df = spark.createDataFrame(rows, ["id", "key"])
    got = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(
            df, id_col="id", sort_key_col="key", window=window
        ).collect()
    }
    order = [i for i, _ in sorted(rows, key=lambda r: (r[1], r[0]))]
    want = {
        (order[i], order[j])
        for i in range(len(order))
        for j in range(i + 1, min(i + window, len(order)))
    }
    assert got == want


# ---------------------------------------------------------------------------
# changepoint_detect ≡ O(n²) SSE scan
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-9, max_value=9, allow_nan=False),
        min_size=2,
        max_size=20,
    )
)
def test_changepoint_matches_quadratic_scan(spark, xs):
    from knot_another_pipeline_spark.operators.temporal import (
        changepoint_detect,
    )

    def sse(seg):
        if not seg:
            return 0.0
        mu = sum(seg) / len(seg)
        return sum((x - mu) ** 2 for x in seg)

    best = min(
        (round(sse(xs[:t]) + sse(xs[t:]), 6), t)
        for t in range(1, len(xs))
    )
    df = spark.createDataFrame(
        [("g", i, float(x)) for i, x in enumerate(xs)], ["g", "t", "x"]
    )
    row = changepoint_detect(
        df, series_col="g", order_col="t", value_col="x"
    ).collect()[0]
    assert row["split_pos"] == best[1]
    assert abs(row["sse_split"] - best[0]) < 2e-6


# ---------------------------------------------------------------------------
# label_propagation ≡ brute-force synchronous simulation
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)),
        min_size=1,
        max_size=15,
    ),
    st.dictionaries(st.integers(0, 7), st.sampled_from("pq"),
                    min_size=1, max_size=3),
)
def test_label_propagation_matches_simulation(spark, edges, seeds):
    from knot_another_pipeline_spark.operators.graph import (
        label_propagation,
    )

    adj: dict = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = dict(seeds)
    rounds = {n: 0 for n in labels}
    for r in (1, 2):
        new = {}
        for n in adj:
            if n in labels:
                continue
            votes = Counter(
                labels[m] for m in adj[n] if m in labels
            )
            if votes:
                top = max(votes.values())
                new[n] = min(l for l, c in votes.items() if c == top)
        for n, l in new.items():
            labels[n] = l
            rounds[n] = r

    edf = spark.createDataFrame(edges, ["src", "dst"])
    sdf = spark.createDataFrame(list(seeds.items()), ["node", "label"])
    got = {
        r["node"]: (r["label"], r["round"])
        for r in label_propagation(edf, sdf, iterations=2).collect()
    }
    assert got == {n: (labels[n], rounds[n]) for n in labels}


# ---------------------------------------------------------------------------
# tfidf_cosine_pairs ≡ brute-force vector cosine
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None)
@given(st.lists(_doc, min_size=2, max_size=5))
def test_tfidf_cosine_matches_bruteforce(spark, docs):
    from knot_another_pipeline_spark.operators.dedup import (
        tfidf_cosine_pairs,
    )

    n = len(docs)
    tf = [Counter(t.split()) for t in docs]
    df_count: Counter = Counter()
    for c in tf:
        df_count.update(c.keys())

    def vec(c):
        return {
            t: cnt * (math.log((n + 1) / (df_count[t] + 1)) + 1)
            for t, cnt in c.items()
        }

    def cos(a, b):
        va, vb = vec(a), vec(b)
        na = math.sqrt(sum(w * w for w in va.values()))
        nb = math.sqrt(sum(w * w for w in vb.values()))
        num = sum(va[t] * vb.get(t, 0.0) for t in va)
        return num / (na * nb)

    sdf = spark.createDataFrame(
        list(enumerate(docs)), ["doc_id", "text"]
    )
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(
            sdf, id_col="doc_id", text_col="text", min_cosine=0.0
        ).collect()
    }
    for i in range(n):
        for j in range(i + 1, n):
            shared = set(tf[i]) & set(tf[j])
            if not shared:
                assert (i, j) not in got
            else:
                assert got[(i, j)] == pytest.approx(
                    cos(tf[i], tf[j]), abs=2e-6
                )


# ---------------------------------------------------------------------------
# wasserstein_drift ≡ brute-force binned CDF distance
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.floats(min_value=-5, max_value=25, allow_nan=False),
             min_size=1, max_size=30),
    st.lists(st.floats(min_value=-5, max_value=25, allow_nan=False),
             min_size=1, max_size=30),
)
def test_wasserstein_matches_bruteforce(spark, xs, ys):
    from knot_another_pipeline_spark.operators.quality import (
        wasserstein_drift,
    )

    bins, lo, hi = 10, 0.0, 20.0
    width = (hi - lo) / bins

    def histo(vals):
        h = [0] * bins
        for v in vals:
            b = min(bins - 1, max(0, int((v - lo) // width)))
            h[b] += 1
        return h

    he, ha = histo(xs), histo(ys)
    te, ta = sum(he), sum(ha)
    ce = ca = 0.0
    w1 = 0.0
    for b in range(bins):
        ce += he[b] / te
        ca += ha[b] / ta
        w1 += abs(ce - ca) * width
    e = spark.createDataFrame([(float(v),) for v in xs], ["v"])
    a = spark.createDataFrame([(float(v),) for v in ys], ["v"])
    row = wasserstein_drift(
        e, a, "v", bins=bins, lo=lo, hi=hi
    ).collect()[0]
    assert row["w1"] == pytest.approx(w1, abs=2e-6)
    assert row["n_expected"] == te and row["n_actual"] == ta
