"""Round-9 late additions (round-10 window leads): exact heavy hitters
with a Misra-Gries prune, hash-seeded deterministic random walks, and
the bounded-hop reach census — each property-tested against an
in-Python brute force, plus the adversarial cases the sketches must
survive (evenly-spread heavy items, sink nodes, isolated roots).
"""

from __future__ import annotations

import hashlib
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from knot_another_pipeline_spark.operators.graph import (
    deterministic_walks,
    reach_census,
)
from knot_another_pipeline_spark.operators.quality import heavy_hitters


# ---------------------------------------------------------------------------
# heavy_hitters


def _brute_hitters(items, num, den):
    n = len(items)
    cnt = Counter(items)
    return {
        it: c for it, c in cnt.items() if c * den >= n * num
    }


def test_heavy_hitters_matches_bruteforce(spark):
    rng = random.Random(17)
    # zipf-ish: token i drawn with weight 1/(i+1)
    vocab = [f"w{i}" for i in range(200)]
    weights = [1.0 / (i + 1) for i in range(200)]
    items = rng.choices(vocab, weights=weights, k=20_000)
    df = spark.createDataFrame([(v,) for v in items], ["tok"]).repartition(16)
    out = {
        r["item"]: (r["cnt"], r["share"])
        for r in heavy_hitters(
            df, item_col="tok", support_num=1, support_den=100
        ).collect()
    }
    expect = _brute_hitters(items, 1, 100)
    assert set(out) == set(expect)
    for it, c in expect.items():
        assert out[it][0] == c
        assert out[it][1] == round(c / len(items), 6)


def test_heavy_hitters_survives_even_spread(spark):
    """The adversarial case for a per-partition prune: a heavy item
    spread perfectly evenly across many partitions, sitting exactly at
    the global threshold, must still be found (the MG union-superset
    guarantee the docstring proves)."""
    # 64 partitions, heavy item exactly 1% of 51_200 rows = 512
    # occurrences, 8 per partition, drowned locally by partition-unique
    # filler tokens.
    rows = []
    for p in range(64):
        rows.extend([(f"filler_{p}_{i}",) for i in range(792)])
        rows.extend([("needle",)] * 8)
    df = spark.createDataFrame(rows, ["tok"]).repartition(64)
    out = heavy_hitters(
        df, item_col="tok", support_num=1, support_den=100
    ).collect()
    assert [r["item"] for r in out] == ["needle"]
    assert out[0]["cnt"] == 512


def test_heavy_hitters_ignores_nulls_and_validates(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), ("b",)], ["tok"]
    )
    out = heavy_hitters(
        df, item_col="tok", support_num=1, support_den=2
    ).collect()
    # N = 3 non-null items; only "a" (2 >= 3/2)
    assert [(r["item"], r["cnt"]) for r in out] == [("a", 2)]
    with pytest.raises(ValueError, match="support"):
        heavy_hitters(df, item_col="tok", support_num=0, support_den=2)
    with pytest.raises(ValueError, match="margin"):
        heavy_hitters(df, item_col="tok", margin=1)


# ---------------------------------------------------------------------------
# deterministic_walks


def _hash64(payload: str) -> int:
    return int(hashlib.md5(f"0:{payload}".encode()).hexdigest()[:15], 16)


def _brute_walks(edges, starts, steps, walks_per_start):
    adj = {}
    for s, d in sorted(set(edges)):
        adj.setdefault(s, []).append(d)
    out = []
    for node in sorted(set(starts)):
        for w in range(walks_per_start):
            wid = f"{node}#{w}"
            cur = node
            out.append((wid, 0, cur))
            for t in range(1, steps + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = nbrs[_hash64(f"{wid}|{t}|{cur}") % len(nbrs)]
                out.append((wid, t, cur))
    return sorted(out)


def test_deterministic_walks_matches_bruteforce(spark):
    rng = random.Random(23)
    nodes = [f"n{i}" for i in range(40)]
    edges = list(
        {
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(300)
        }
    )
    e = spark.createDataFrame(edges, ["src", "dst"])
    starts = spark.createDataFrame(
        [(n,) for n in nodes[:10]], ["node"]
    )
    got = sorted(
        (r["walk_id"], r["step"], r["node"])
        for r in deterministic_walks(
            e, starts=starts, steps=4, walks_per_start=3
        ).collect()
    )
    assert got == _brute_walks(edges, nodes[:10], 4, 3)


def test_deterministic_walks_partitioning_invariant(spark):
    """Bit-identical output whatever the physical partitioning — the
    whole point of hash-seeded picks over rand()."""
    edges = [(f"a{i}", f"b{(i * 7) % 11}") for i in range(60)] + [
        (f"b{i}", f"a{(i * 3) % 13}") for i in range(11)
    ]
    starts = [(f"a{i}",) for i in range(5)]
    outs = []
    for parts in (1, 7):
        e = spark.createDataFrame(edges, ["src", "dst"]).repartition(parts)
        s = spark.createDataFrame(starts, ["node"])
        outs.append(
            sorted(
                (r["walk_id"], r["step"], r["node"])
                for r in deterministic_walks(
                    e, starts=s, steps=3, walks_per_start=2
                ).collect()
            )
        )
    assert outs[0] == outs[1]


def test_deterministic_walks_sink_truncates(spark):
    e = spark.createDataFrame([("a", "sink")], ["src", "dst"])
    s = spark.createDataFrame([("a",)], ["node"])
    rows = sorted(
        (r["walk_id"], r["step"], r["node"])
        for r in deterministic_walks(e, starts=s, steps=5).collect()
    )
    assert rows == [("a#0", 0, "a"), ("a#0", 1, "sink")]
    with pytest.raises(ValueError, match="steps"):
        deterministic_walks(e, starts=s, steps=-1)
    with pytest.raises(ValueError, match="walks_per_start"):
        deterministic_walks(e, starts=s, steps=1, walks_per_start=0)


# ---------------------------------------------------------------------------
# reach_census


def _brute_reach(edges, roots, hops):
    adj = {}
    for s, d in set(edges):
        adj.setdefault(s, set()).add(d)
    out = {}
    for r in set(roots):
        reached = {r}
        frontier = {r}
        per_hop = []
        for _ in range(hops):
            nxt = set()
            for u in frontier:
                nxt |= adj.get(u, set())
            frontier = nxt - reached
            reached |= frontier
            per_hop.append(len(frontier))
        out[r] = tuple(per_hop) + (sum(per_hop),)
    return out


def test_reach_census_matches_bruteforce(spark):
    rng = random.Random(5)
    nodes = [f"v{i}" for i in range(50)]
    edges = list(
        {(rng.choice(nodes), rng.choice(nodes)) for _ in range(200)}
    )
    e = spark.createDataFrame(edges, ["src", "dst"])
    roots = spark.createDataFrame([(n,) for n in nodes[:12]], ["node"])
    got = {
        r["root"]: (r["n_hop1"], r["n_hop2"], r["n_hop3"], r["n_reach"])
        for r in reach_census(e, roots=roots, hops=3).collect()
    }
    assert got == _brute_reach(edges, nodes[:12], 3)


def test_reach_census_isolated_root_zero_filled(spark):
    e = spark.createDataFrame([("a", "b"), ("b", "c")], ["src", "dst"])
    roots = spark.createDataFrame(
        [("a",), ("lonely",)], ["node"]
    )
    got = {
        r["root"]: (r["n_hop1"], r["n_hop2"], r["n_reach"])
        for r in reach_census(e, roots=roots, hops=2).collect()
    }
    assert got == {"a": (1, 1, 2), "lonely": (0, 0, 0)}
    with pytest.raises(ValueError, match="hops"):
        reach_census(e, roots=roots, hops=0)


# ---------------------------------------------------------------------------
# isotonic_calibration


def _brute_minimax_iso(bins):
    """O(B^2) minimax reference: iso(i) = max_{a<=i} min_{b>=i} mean(a..b)
    over PRESENT bins (n, pos) in bin order, exact rationals."""
    from fractions import Fraction

    B = len(bins)
    out = []
    for i in range(B):
        best = None
        for a in range(i + 1):
            worst = None
            for b in range(i, B):
                n = sum(x[0] for x in bins[a : b + 1])
                p = sum(x[1] for x in bins[a : b + 1])
                m = Fraction(p, n)
                if worst is None or m < worst:
                    worst = m
            if best is None or worst > best:
                best = worst
        out.append(float(best))
    return out


def test_isotonic_calibration_matches_minimax(spark):
    from knot_another_pipeline_spark.operators.evaluation import (
        isotonic_calibration,
    )

    rng = random.Random(11)
    rows = []
    for _ in range(4000):
        s = rng.random()
        # miscalibrated, non-monotone in patches: flip band [0.4, 0.5)
        p = 0.9 - 0.7 * s if 0.4 <= s < 0.5 else 0.15 + 0.7 * s
        rows.append((s, 1 if rng.random() < p else 0))
    df = spark.createDataFrame(rows, "score double, y int")
    got = isotonic_calibration(
        df, score_col="score", label_col="y", n_bins=20
    ).collect()
    # reference over the same fixed-width bins
    binned = {}
    for s, y in rows:
        b = min(19, max(0, int(s * 20)))
        n, p = binned.get(b, (0, 0))
        binned[b] = (n + 1, p + y)
    order = sorted(binned)
    ref = _brute_minimax_iso([binned[b] for b in order])
    assert [r["bin"] for r in got] == order
    for r, b, iso in zip(got, order, ref):
        assert r["n"] == binned[b][0] and r["pos"] == binned[b][1]
        assert r["iso_prob"] == round(iso, 6)
    # fitted curve is monotone non-decreasing
    iso_seq = [r["iso_prob"] for r in got]
    assert iso_seq == sorted(iso_seq)


def test_isotonic_calibration_groups_and_validation(spark):
    from knot_another_pipeline_spark.operators.evaluation import (
        isotonic_calibration,
    )

    # group g1 perfectly increasing, g2 all-violating (decreasing):
    # g2 must pool to one flat block = its global rate
    rows = (
        [("g1", 0.1, 0), ("g1", 0.1, 0), ("g1", 0.9, 1), ("g1", 0.9, 1)]
        + [("g2", 0.1, 1), ("g2", 0.1, 1), ("g2", 0.9, 0), ("g2", 0.9, 1)]
    )
    df = spark.createDataFrame(rows, "g string, score double, y int")
    got = {
        (r["g"], r["bin"]): r["iso_prob"]
        for r in isotonic_calibration(
            df, score_col="score", label_col="y", group_cols=["g"],
            n_bins=10,
        ).collect()
    }
    assert got[("g1", 1)] == 0.0 and got[("g1", 9)] == 1.0
    assert got[("g2", 1)] == got[("g2", 9)] == 0.75
    with pytest.raises(ValueError, match="n_bins"):
        isotonic_calibration(df, score_col="score", label_col="y", n_bins=1)


# ---------------------------------------------------------------------------
# cuped_readout


def test_cuped_readout_matches_bruteforce(spark):
    from knot_another_pipeline_spark.operators.evaluation import (
        cuped_readout,
    )

    rng = random.Random(29)
    rows = []
    for i in range(3000):
        x = rng.gauss(10, 3)
        arm = "t" if i % 2 else "c"
        lift = 0.5 if arm == "t" else 0.0
        y = 2.0 + 0.8 * x + lift + rng.gauss(0, 1)
        rows.append((arm, x, y))
    df = spark.createDataFrame(rows, "arm string, x double, y double")
    got = {
        r["arm"]: r
        for r in cuped_readout(
            df, metric_col="y", covariate_col="x", arm_col="arm"
        ).collect()
    }
    # brute force
    xs = [x for _, x, _ in rows]
    ys = [y for _, _, y in rows]
    n = len(rows)
    mx = sum(xs) / n
    myy = sum(ys) / n
    cov = sum(x * y for _, x, y in rows) / n - mx * myy
    varx = sum(x * x for x in xs) / n - mx * mx
    theta = cov / varx
    for arm in ("c", "t"):
        sub = [(x, y) for a, x, y in rows if a == arm]
        na = len(sub)
        mxa = sum(x for x, _ in sub) / na
        mya = sum(y for _, y in sub) / na
        assert got[arm]["n"] == na
        assert got[arm]["mean_metric"] == round(mya, 6)
        assert abs(
            got[arm]["mean_adjusted"] - (mya - theta * (mxa - mx))
        ) < 2e-6
        assert abs(got[arm]["theta"] - theta) < 2e-6
        # strong covariate correlation => big variance reduction
        assert got[arm]["var_reduction"] > 0.7
    # CUPED must not move the pooled treatment-effect estimate much:
    # adjusted and raw deltas agree to the covariate-imbalance term
    raw_delta = got["t"]["mean_metric"] - got["c"]["mean_metric"]
    adj_delta = got["t"]["mean_adjusted"] - got["c"]["mean_adjusted"]
    assert abs(adj_delta - 0.5) < abs(raw_delta - 0.5) + 0.2


def test_cuped_readout_degenerate_covariate(spark):
    """Zero-variance covariate => theta 0, adjusted == raw means."""
    from knot_another_pipeline_spark.operators.evaluation import (
        cuped_readout,
    )

    rows = [("a", 1.0, float(v)) for v in (1, 2, 3)] + [
        ("b", 1.0, float(v)) for v in (4, 5, 6)
    ]
    df = spark.createDataFrame(rows, "arm string, x double, y double")
    got = {
        r["arm"]: r
        for r in cuped_readout(
            df, metric_col="y", covariate_col="x", arm_col="arm"
        ).collect()
    }
    assert got["a"]["theta"] == 0.0
    assert got["a"]["mean_adjusted"] == got["a"]["mean_metric"] == 2.0
    assert got["b"]["mean_adjusted"] == got["b"]["mean_metric"] == 5.0


# ---------------------------------------------------------------------------
# theil_sen / holt_forecast / fdr_adjust


def test_theil_sen_matches_bruteforce_and_resists_outliers(spark):
    from knot_another_pipeline_spark.operators.temporal import theil_sen

    rng = random.Random(3)
    rows = []
    for i in range(60):
        y = 5.0 + 0.7 * i + rng.gauss(0, 0.5)
        rows.append(("s", float(i), y))
    # inject 8 gross outliers that would wreck OLS
    for i in range(8):
        rows.append(("s", float(100 + i), 10000.0))
    df = spark.createDataFrame(rows, "series string, x double, y double")
    got = theil_sen(df, series_col="series", x_col="x", y_col="y").collect()
    r = got[0]
    # brute force median of pairwise slopes
    pts = [(x, y) for _, x, y in rows]
    slopes = sorted(
        (y2 - y1) / (x2 - x1)
        for i, (x1, y1) in enumerate(pts)
        for (x2, y2) in pts[i + 1 :]
        if x2 != x1
    )
    n = len(slopes)
    med = (
        slopes[n // 2]
        if n % 2
        else (slopes[n // 2 - 1] + slopes[n // 2]) / 2
    )
    assert r["n_points"] == len(pts)
    assert r["n_pairs"] == n
    assert abs(r["slope"] - med) < 1e-6
    assert 0.6 < r["slope"] < 0.8  # outliers did not drag the trend
    resid = sorted(y - med * x for x, y in pts)
    m = len(resid)
    imed = (
        resid[m // 2]
        if m % 2
        else (resid[m // 2 - 1] + resid[m // 2]) / 2
    )
    assert abs(r["intercept"] - imed) < 1e-6


def test_holt_forecast_matches_python_recurrence(spark):
    from knot_another_pipeline_spark.operators.temporal import holt_forecast

    rng = random.Random(9)
    ys = [50 + 2.0 * t + rng.gauss(0, 3) for t in range(40)]
    rows = [("a", float(t), y) for t, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "series string, t double, y double")
    got = holt_forecast(
        df, series_col="series", t_col="t", y_col="y",
        alpha=0.5, beta=0.3, horizon=7,
    ).collect()[0]
    l, b = ys[1], ys[1] - ys[0]
    sse, n_err = 0.0, 0
    for y in ys[2:]:
        e = y - (l + b)
        sse += e * e
        n_err += 1
        l_new = 0.5 * y + 0.5 * (l + b)
        b = 0.3 * (l_new - l) + 0.7 * b
        l = l_new
    assert got["n_points"] == 40
    assert got["level"] == round(l, 6)
    assert got["trend"] == round(b, 6)
    assert got["forecast"] == round(l + 7 * b, 6)
    assert got["rmse"] == round((sse / n_err) ** 0.5, 6)
    # trend recovered the true slope on a clean-ish series
    assert 1.0 < got["trend"] < 3.0
    with pytest.raises(ValueError, match="horizon"):
        holt_forecast(
            df, series_col="series", t_col="t", y_col="y", horizon=0
        )


def _brute_bh(zs, alpha=0.05):
    import math as _m

    def p_of(z):
        az = abs(z)
        k = 1.0 / (1.0 + 0.2316419 * az)
        poly = k * (
            0.319381530
            + k
            * (
                -0.356563782
                + k * (1.781477937 + k * (-1.821255978 + k * 1.330274429))
            )
        )
        return 2 * (_m.exp(-az * az / 2) / _m.sqrt(2 * _m.pi)) * poly

    items = sorted(
        ((round(z, 6), key) for key, z in zs.items()),
        key=lambda t: (-abs(t[0]), t[1]),
    )
    m = len(items)
    raw = [p_of(z) * m / (i + 1) for i, (z, _) in enumerate(items)]
    out = {}
    suffix = float("inf")
    for i in range(m - 1, -1, -1):
        suffix = min(suffix, raw[i])
        z, key = items[i]
        q = min(1.0, suffix)
        out[key] = (i + 1, p_of(z), q, q <= alpha)
    return out


def test_fdr_adjust_matches_bruteforce(spark):
    from knot_another_pipeline_spark.operators.quality import fdr_adjust

    rng = random.Random(31)
    zs = {f"k{i}": rng.gauss(0, 1.5) for i in range(80)}
    zs["strong1"], zs["strong2"] = 6.0, -5.5  # certain discoveries
    df = spark.createDataFrame(
        [(k, v) for k, v in zs.items()], "key string, z double"
    )
    got = {
        r["key"]: r
        for r in fdr_adjust(df, key_col="key", z_col="z").collect()
    }
    ref = _brute_bh(zs)
    assert set(got) == set(ref)
    for k, (rank, p, q, rej) in ref.items():
        assert got[k]["rank"] == rank
        assert abs(got[k]["p_value"] - p) < 2e-6
        assert abs(got[k]["q_value"] - q) < 2e-6
        assert got[k]["reject"] == rej
    assert got["strong1"]["reject"] and got["strong2"]["reject"]
    # q-values are monotone non-decreasing in rank
    qs = [r["q_value"] for r in sorted(got.values(), key=lambda r: r["rank"])]
    assert qs == sorted(qs)
    with pytest.raises(ValueError, match="alpha"):
        fdr_adjust(df, key_col="key", z_col="z", alpha=1.5)


def test_fdr_adjust_null_and_empty(spark):
    from knot_another_pipeline_spark.operators.quality import fdr_adjust

    df = spark.createDataFrame(
        [("a", None), ("b", None)], "key string, z double"
    )
    out = fdr_adjust(df, key_col="key", z_col="z")
    assert out.count() == 0
    assert out.columns == [
        "key", "z", "p_value", "rank", "q_value", "reject",
    ]


def test_mann_kendall_matches_bruteforce(spark):
    from knot_another_pipeline_spark.operators.temporal import mann_kendall

    rng = random.Random(13)
    # trending series with ties (integer-valued), plus a flat noisy one
    rows = []
    for t in range(50):
        rows.append(("up", float(t), float(20 + t // 2 + rng.randint(0, 2))))
        rows.append(("flat", float(t), float(rng.randint(10, 12))))
    df = spark.createDataFrame(rows, "series string, x double, y double")
    got = {
        r["series"]: r
        for r in mann_kendall(
            df, series_col="series", x_col="x", y_col="y"
        ).collect()
    }
    for name in ("up", "flat"):
        pts = [(x, y) for s, x, y in rows if s == name]
        S = sum(
            (0 if y2 == y1 else (1 if y2 > y1 else -1))
            for i, (x1, y1) in enumerate(pts)
            for (x2, y2) in pts[i + 1 :]
        )
        n = len(pts)
        from collections import Counter as _C

        tie = sum(
            t * (t - 1) * (2 * t + 5)
            for t in _C(y for _, y in pts).values()
        )
        var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
        z = (S - (1 if S > 0 else -1 if S < 0 else 0)) / var ** 0.5
        r = got[name]
        assert r["s_stat"] == S and r["n_points"] == n
        assert r["var_s"] == round(var, 6)
        assert abs(r["z"] - z) < 1e-6
    assert got["up"]["trend_99"] is True
    assert got["flat"]["trend_95"] is False


def test_kruskal_wallis_matches_scipyfree_bruteforce(spark):
    from knot_another_pipeline_spark.operators.quality import kruskal_wallis

    rng = random.Random(7)
    rows = []
    # family "shift": class means differ; family "same": identical dist
    for i in range(600):
        c = str(i % 3)
        rows.append(("shift", c, rng.gauss(10 + 2 * int(c), 2)))
        rows.append(("same", c, float(rng.randint(0, 5))))  # heavy ties
    df = spark.createDataFrame(rows, "family string, cls string, v double")
    got = {
        r["family"]: r
        for r in kruskal_wallis(
            df, group_cols=["family"], value_col="v", class_col="cls"
        ).collect()
    }
    for fam in ("shift", "same"):
        pts = [(c, v) for f, c, v in rows if f == fam]
        vals = sorted(v for _, v in pts)
        # midranks
        from collections import Counter as _C, defaultdict

        first = {}
        for idx, v in enumerate(vals, start=1):
            first.setdefault(v, idx)
        cnt = _C(vals)
        mid = {v: first[v] + (cnt[v] - 1) / 2.0 for v in cnt}
        n = len(pts)
        by_c = defaultdict(list)
        for c, v in pts:
            by_c[c].append(mid[v])
        h = 12.0 / (n * (n + 1)) * sum(
            (sum(rs)) ** 2 / len(rs) for rs in by_c.values()
        ) - 3 * (n + 1)
        tie3 = sum(t**3 - t for t in cnt.values())
        hc = h / (1 - tie3 / (n**3 - n))
        r = got[fam]
        assert r["n_total"] == n and r["k_classes"] == 3 and r["df"] == 2
        assert abs(r["h_corrected"] - hc) < 1e-5
    assert got["shift"]["p_value"] < 0.001
    assert got["same"]["p_value"] > 0.01


def test_jackknife_ratio_bruteforce_and_coverage(spark):
    from knot_another_pipeline_spark.operators.quality import jackknife_ratio

    rng = random.Random(19)
    rows = [(i % 20, rng.uniform(5, 15), 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "bucket int, x double, y double")
    got = jackknife_ratio(
        df, num_col="x", den_col="y", bucket_col="bucket"
    ).collect()[0]
    from collections import defaultdict

    sx, sy = defaultdict(float), defaultdict(float)
    for b, x, y in rows:
        sx[b] += x
        sy[b] += y
    tx, ty, B = sum(sx.values()), sum(sy.values()), len(sx)
    thetas = [(tx - sx[b]) / (ty - sy[b]) for b in sx]
    tbar = sum(thetas) / B
    var = (B - 1) / B * sum((t - tbar) ** 2 for t in thetas)
    assert got["n_buckets"] == B
    assert abs(got["ratio"] - tx / ty) < 1e-6
    assert abs(got["jk_se"] - var**0.5) < 1e-6
    assert got["ci_lo"] < tx / ty < got["ci_hi"]


def test_capture_recapture_estimates_population(spark):
    from knot_another_pipeline_spark.operators.quality import (
        capture_recapture,
    )

    ids = list(range(5000))
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = capture_recapture(df, id_col="id", pct_a=25, pct_b=25).collect()[0]
    # brute-force the same hash membership
    import hashlib as _h

    def mem(i, seed, pct):
        return int(
            _h.md5(f"{seed}:{i}".encode()).hexdigest()[:15], 16
        ) % 100 < pct

    na = sum(mem(i, 1, 25) for i in ids)
    nb = sum(mem(i, 2, 25) for i in ids)
    m = sum(mem(i, 1, 25) and mem(i, 2, 25) for i in ids)
    assert (got["n_a"], got["n_b"], got["overlap"]) == (na, nb, m)
    n_hat = (na + 1) * (nb + 1) / (m + 1) - 1
    assert got["n_hat"] == round(n_hat, 6)
    # the interval should bracket the true population
    assert got["ci_lo"] < 5000 < got["ci_hi"]
    # and the point estimate should be in the right ballpark
    assert abs(n_hat - 5000) / 5000 < 0.15
    with pytest.raises(ValueError, match="percents"):
        capture_recapture(df, id_col="id", pct_a=0)
