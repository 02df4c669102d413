"""Round-5 final additions: sequence packing, a Lloyd k-means step,
common-neighbor link prediction, majority-vote label aggregation, and
cluster-canonical dedup selection.

Each operator is checked against an independent pure-Python reference
(plus its DuckDB oracle in test_catalog_oracle.py).
"""

from __future__ import annotations

import hashlib
import math

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# pack_sequences ≡ brute-force concat-and-chunk arithmetic
# ---------------------------------------------------------------------------


def _brute_pack(counts: dict[int, int], seq_len: int):
    out = {}
    cum = 0
    for i in sorted(counts):
        n = counts[i]
        if n <= 0:
            continue
        start = cum
        cum += n
        first = start // seq_len
        last = (cum - 1) // seq_len
        out[i] = (n, first, start % seq_len, last - first + 1)
    return out


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=37), min_size=1, max_size=40),
    st.integers(min_value=1, max_value=13),
)
def test_pack_sequences_matches_bruteforce(spark, counts, seq_len):
    from knot_another_pipeline_spark.operators.sampling import pack_sequences

    rows = [(i, c) for i, c in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id: bigint, n_tok: bigint")
    got = {
        r["id"]: (
            r["n_tokens"],
            r["pack_id"],
            r["offset_in_pack"],
            r["n_packs_spanned"],
        )
        for r in pack_sequences(
            df, id_col="doc_id", token_col="n_tok", seq_len=seq_len
        ).collect()
    }
    assert got == _brute_pack(dict(rows), seq_len)


def test_pack_sequences_window_invariants(spark):
    from knot_another_pipeline_spark.operators.sampling import pack_sequences

    rows = [(i, 7 + (i * 13) % 50) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id: bigint, n_tok: bigint")
    out = pack_sequences(
        df, id_col="doc_id", token_col="n_tok", seq_len=128
    ).collect()
    assert len(out) == 200
    total = sum(n for _, n in rows)
    by_id = sorted(out, key=lambda r: r["id"])
    # documents tile the token stream: consecutive starts are contiguous
    start = 0
    for r in by_id:
        assert r["pack_id"] == start // 128
        assert r["offset_in_pack"] == start % 128
        assert 0 <= r["offset_in_pack"] < 128
        end = start + r["n_tokens"]
        assert r["n_packs_spanned"] == (end - 1) // 128 - start // 128 + 1
        start = end
    assert start == total
    with pytest.raises(ValueError):
        pack_sequences(df, id_col="doc_id", token_col="n_tok", seq_len=0)


# ---------------------------------------------------------------------------
# kmeans_step ≡ numpy reference (same md5 init, argmax ties, means, shift)
# ---------------------------------------------------------------------------


def test_kmeans_step_matches_bruteforce(spark):
    from knot_another_pipeline_spark.operators.similarity import kmeans_step

    dim, n = 6, 40
    vecs = {
        i: [((i * 37 + j * 11) % 19) - 9.0 + 0.25 * j for j in range(dim)]
        for i in range(n)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id: bigint, embedding: array<double>"
    )
    k = 5
    out = {
        r["cell"]: r
        for r in kmeans_step(
            df, id_col="vec_id", vec_col="embedding", num_centroids=k
        ).collect()
    }

    cent_ids = sorted(
        vecs, key=lambda i: hashlib.md5(str(i).encode()).hexdigest()
    )[:k]

    def norm(v):
        return math.sqrt(sum(x * x for x in v))

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b)) / (norm(a) * norm(b))

    assign: dict[int, list[int]] = {}
    for i, v in vecs.items():
        best = min(cent_ids, key=lambda c: (-cos(v, vecs[c]), c))
        assign.setdefault(best, []).append(i)

    assert set(out) == set(assign)
    assert sum(r["n_vectors"] for r in out.values()) == n
    for c, members in assign.items():
        mean = [
            sum(vecs[m][j] for m in members) / len(members)
            for j in range(dim)
        ]
        shift = math.sqrt(
            sum((a - b) ** 2 for a, b in zip(mean, vecs[c]))
        )
        assert out[c]["n_vectors"] == len(members)
        assert out[c]["new_centroid"] == pytest.approx(
            [round(x, 6) for x in mean], abs=2e-6
        )
        assert out[c]["shift"] == pytest.approx(round(shift, 6), abs=2e-6)


# ---------------------------------------------------------------------------
# common_neighbor_scores ≡ brute force over random small graphs
# ---------------------------------------------------------------------------


def _brute_cn(edges, min_common, max_degree, exclude_existing):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict[int, set[int]] = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    deg = {x: len(s) for x, s in adj.items()}
    out = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            shared = {
                x
                for x in adj[a] & adj[b]
                if max_degree is None or deg[x] <= max_degree
            }
            cn = len(shared)
            if cn < min_common:
                continue
            if exclude_existing and (a, b) in und:
                continue
            j = cn / (deg[a] + deg[b] - cn)
            out[(a, b)] = (cn, deg[a], deg[b], round(j, 6))
    return out


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=11),
            st.integers(min_value=0, max_value=11),
        ),
        min_size=1,
        max_size=40,
    ),
    st.sampled_from([None, 3, 5]),
    st.booleans(),
)
def test_common_neighbors_matches_bruteforce(spark, edges, cap, excl):
    from knot_another_pipeline_spark.operators.graph import (
        common_neighbor_scores,
    )

    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    got = {
        (r["node_a"], r["node_b"]): (
            r["common_neighbors"],
            r["degree_a"],
            r["degree_b"],
            r["jaccard"],
        )
        for r in common_neighbor_scores(
            df,
            min_common=1,
            max_degree=cap,
            exclude_existing=excl,
        ).collect()
    }
    assert got == _brute_cn(edges, 1, cap, excl)


def test_common_neighbors_hub_cap_drops_star_center(spark):
    from knot_another_pipeline_spark.operators.graph import (
        common_neighbor_scores,
    )

    # star: hub 0 connects 1..6; leaves share ONLY the hub as a neighbor
    star = [(0, i) for i in range(1, 7)]
    df = spark.createDataFrame(star, "src: bigint, dst: bigint")
    uncapped = common_neighbor_scores(df, min_common=1).collect()
    assert len(uncapped) == 15  # C(6,2) leaf pairs via the hub
    capped = common_neighbor_scores(df, min_common=1, max_degree=3).collect()
    assert capped == []  # hub excluded from the apex role


# ---------------------------------------------------------------------------
# majority_vote ≡ brute force with lexicographic tie-break
# ---------------------------------------------------------------------------


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.one_of(st.none(), st.sampled_from(["a", "b", "c", "d"])),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_majority_vote_matches_bruteforce(spark, votes):
    from knot_another_pipeline_spark.operators.quality import majority_vote

    df = spark.createDataFrame(votes, "item: bigint, label: string")
    got = {
        r["item"]: (
            r["majority_label"],
            r["n_votes"],
            r["n_total"],
            r["n_labels"],
            r["agreement"],
        )
        for r in majority_vote(df, item_col="item", label_col="label").collect()
    }
    expected = {}
    per_item: dict[int, dict[str, int]] = {}
    for item, label in votes:
        if label is None:
            continue
        per_item.setdefault(item, {})
        per_item[item][label] = per_item[item].get(label, 0) + 1
    for item, counts in per_item.items():
        winner = min(counts, key=lambda l: (-counts[l], l))
        total = sum(counts.values())
        expected[item] = (
            winner,
            counts[winner],
            total,
            len(counts),
            round(counts[winner] / total, 6),
        )
    assert got == expected


# ---------------------------------------------------------------------------
# canonical_docs: cluster/representative invariants
# ---------------------------------------------------------------------------


def test_canonical_docs_reps_and_singletons(spark):
    from knot_another_pipeline_spark.operators.dedup import canonical_docs

    docs = spark.createDataFrame(
        [
            (1, "aaaa"),       # cluster {1,2,3}: 3 has the longest text
            (2, "bb"),
            (3, "cccccc"),
            (4, "dddddd"),     # cluster {4,5}: tie on length -> smallest id
            (5, "eeeeee"),
            (6, "solo"),       # singleton
        ],
        "doc_id: bigint, text: string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a: bigint, id_b: bigint"
    )
    out = {r["doc_id"]: r for r in canonical_docs(docs, pairs).collect()}
    assert len(out) == 6  # every document appears exactly once
    assert {out[i]["cluster_id"] for i in (1, 2, 3)} == {1}
    assert all(out[i]["rep_id"] == 3 for i in (1, 2, 3))
    assert all(out[i]["cluster_size"] == 3 for i in (1, 2, 3))
    assert out[3]["is_rep"] and not out[1]["is_rep"] and not out[2]["is_rep"]
    assert all(out[i]["rep_id"] == 4 for i in (4, 5))  # tie -> smallest id
    assert out[6]["cluster_id"] == 6 and out[6]["is_rep"]
    assert out[6]["cluster_size"] == 1 and out[6]["rep_id"] == 6
    # exactly one representative per cluster
    reps = [r for r in out.values() if r["is_rep"]]
    assert len(reps) == 3


def test_canonical_docs_rejects_string_ids(spark):
    from knot_another_pipeline_spark.operators.dedup import canonical_docs

    docs = spark.createDataFrame(
        [("a", "x")], "doc_id: string, text: string"
    )
    pairs = spark.createDataFrame([("a", "b")], "id_a: string, id_b: string")
    with pytest.raises(TypeError):
        canonical_docs(docs, pairs)


# ---------------------------------------------------------------------------
# temperature_mix ≡ brute-force hash acceptance; alpha edge cases
# ---------------------------------------------------------------------------


def _hash_frac(v) -> float:
    h = hashlib.md5(f"0:{v}".encode()).hexdigest()[:15]
    return int(h, 16) / float(1 << 60)


def test_temperature_mix_matches_bruteforce(spark):
    from knot_another_pipeline_spark.operators.sampling import temperature_mix

    rows = [(i, "en" if i % 10 < 7 else ("de" if i % 10 < 9 else "fr"))
            for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id: bigint, lang: string")
    alpha = 0.5
    counts: dict[str, int] = {}
    for _, g in rows:
        counts[g] = counts.get(g, 0) + 1
    total = len(rows)
    rates = {g: (n / total) ** (alpha - 1.0) for g, n in counts.items()}
    rmax = max(rates.values())
    fr = {g: r / rmax for g, r in rates.items()}
    expected = {
        (i, g, round(fr[g], 6))
        for i, g in rows
        if _hash_frac(i) < fr[g]
    }
    got = {
        (r["id"], r["lang"], r["keep_fraction"])
        for r in temperature_mix(
            df, group_col="lang", id_col="doc_id", alpha=alpha
        ).collect()
    }
    assert got == expected
    # the rarest group keeps everything
    assert {g for _, g, f in got if f == 1.0} == {"fr"}


def test_temperature_mix_alpha_one_keeps_all(spark):
    from knot_another_pipeline_spark.operators.sampling import temperature_mix

    rows = [(i, "a" if i % 3 else "b") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id: bigint, lang: string")
    out = temperature_mix(df, group_col="lang", id_col="doc_id", alpha=1.0)
    assert out.count() == 60  # p^0 = 1 for every group: no downsampling
    with pytest.raises(ValueError):
        temperature_mix(df, group_col="lang", id_col="doc_id", alpha=-0.1)


# ---------------------------------------------------------------------------
# k_anonymity_audit ≡ brute force
# ---------------------------------------------------------------------------


def test_k_anonymity_audit_matches_bruteforce(spark):
    from knot_another_pipeline_spark.operators.quality import k_anonymity_audit

    rows = [
        (i, i % 4, "seg" + str(i % 3), float(i % 5)) for i in range(50)
    ] + [(100, 9, "rare", 1.0)]
    df = spark.createDataFrame(rows, "id: bigint, nat: int, seg: string, bal: double")
    got = {
        (r["nat"], r["seg"]): (r["class_size"], r["below_k"], r["l_diversity"])
        for r in k_anonymity_audit(
            df, quasi_cols=["nat", "seg"], k=5, sensitive_col="bal"
        ).collect()
    }
    classes: dict[tuple, list[float]] = {}
    for _, nat, seg, bal in rows:
        classes.setdefault((nat, seg), []).append(bal)
    expected = {
        key: (len(v), len(v) < 5, len(set(v))) for key, v in classes.items()
    }
    assert got == expected
    assert got[(9, "rare")] == (1, True, 1)
    with pytest.raises(ValueError):
        k_anonymity_audit(df, quasi_cols=[], k=5)
    with pytest.raises(ValueError):
        k_anonymity_audit(df, quasi_cols=["nat"], k=1)


# ---------------------------------------------------------------------------
# sketch_overlap: exact in the < k regime; degenerate identities
# ---------------------------------------------------------------------------


def test_sketch_overlap_exact_below_k(spark):
    from knot_another_pipeline_spark.operators.quality import sketch_overlap

    a_vals = [f"v{i}" for i in range(30)]
    b_vals = [f"v{i}" for i in range(20, 50)]  # overlap = 10, union = 50
    a = spark.createDataFrame([(v,) for v in a_vals], "val: string")
    b = spark.createDataFrame([(v,) for v in b_vals], "val: string")
    r = sketch_overlap(a, b, "val", k=128).collect()[0]
    assert (r["n_a_est"], r["n_b_est"], r["n_union_est"]) == (30, 30, 50)
    assert r["n_intersect_est"] == 10
    assert r["jaccard_est"] == pytest.approx(10 / 50, abs=1e-6)


def test_sketch_overlap_identical_and_estimated(spark):
    from knot_another_pipeline_spark.operators.quality import sketch_overlap

    vals = [(f"x{i}",) for i in range(2000)]  # well above k: estimator path
    a = spark.createDataFrame(vals, "val: string")
    r = sketch_overlap(a, a, "val", k=64).collect()[0]
    assert r["n_a_est"] == r["n_b_est"] == r["n_union_est"]
    assert r["n_intersect_est"] == r["n_a_est"]
    assert r["jaccard_est"] == 1.0
    # ~13% standard error at k=64: the estimate is in the right decade
    assert 1000 < r["n_a_est"] < 4000


# ---------------------------------------------------------------------------
# plan shapes: the scale-critical properties, pinned
# ---------------------------------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pack_sequences_plan_no_corpus_global_window(spark):
    """Every corpus-sized cumulative window must partition by the id-range
    bucket; only the √N-row offsets table may see an unkeyed window."""
    import re

    from knot_another_pipeline_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(i, 5) for i in range(500)], "doc_id: bigint, n_tok: bigint"
    )
    plan = _plan(
        pack_sequences(df, id_col="doc_id", token_col="n_tok", seq_len=64)
    )
    specs = re.findall(r"windowspecdefinition\(([^)]*?) ASC", plan)
    assert specs, "cumulative-sum windows missing from plan"
    # exactly one unkeyed window (the offsets prefix over bucket totals,
    # input rows ≈ √N); the corpus window is keyed by the bucket `b`
    unkeyed = [s for s in specs if s.strip().startswith(("b#", "id#")) is False]
    keyed = [s for s in specs if "b#" in s.split(",")[0]]
    assert keyed, f"corpus cumsum window is not bucket-keyed: {specs}"
    assert len(unkeyed) <= 1, f"multiple unkeyed windows: {specs}"


def test_kmeans_step_plan_broadcast_centroids_no_shuffled_expand(spark):
    from knot_another_pipeline_spark.operators.similarity import kmeans_step

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)],
        "vec_id: bigint, embedding: array<double>",
    )
    plan = _plan(kmeans_step(df, num_centroids=4))
    # centroid set rides a broadcast; the C-per-row expansion is collapsed
    # by partial aggregation (argmax), never window-ranked
    assert "BroadcastExchange" in plan
    assert "row_number" not in plan
    assert "Generate posexplode" in plan


def test_link_prediction_plan_equi_joins_only(spark):
    from knot_another_pipeline_spark.operators.graph import (
        common_neighbor_scores,
    )

    df = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 4)], "src: bigint, dst: bigint"
    )
    plan = _plan(common_neighbor_scores(df, min_common=1, max_degree=10))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan  # hub-cap and existing-edge exclusions


def test_majority_vote_window_runs_over_reduced_counts(spark):
    from knot_another_pipeline_spark.operators.quality import majority_vote

    df = spark.createDataFrame(
        [(1, "a")] * 50 + [(1, "b")] * 20, "item: bigint, label: string"
    )
    plan = _plan(majority_vote(df, item_col="item", label_col="label"))
    # the aggregate (partial+final) must appear BELOW the window: votes
    # collapse to (item,label) counts before any sort-based ranking
    assert plan.index("HashAggregate") > plan.index("Window") or (
        "partial_count" in plan.split("Window")[-1]
    )


def test_kmeans_iteration_sse_non_increasing(spark):
    """Lloyd's guarantee: feeding each round's centroids back in must
    never increase within-cluster SSE (assignment and update are both
    SSE-non-increasing under cosine-on-comparable-norms here we check
    the euclidean SSE against the returned centroids)."""
    from knot_another_pipeline_spark.operators.similarity import kmeans_step

    vecs = {
        i: [
            float(((i * 31 + j * 7) % 23) - 11) + 0.1 * ((i + j) % 5)
            for j in range(4)
        ]
        for i in range(60)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id: bigint, embedding: array<double>",
    )

    def sse(step_rows):
        # recompute assignment SSE against each round's NEW centroids
        cents = {r["cell"]: r["new_centroid"] for r in step_rows}
        total = 0.0
        for v in vecs.values():
            best = min(
                sum((a - b) ** 2 for a, b in zip(v, c))
                for c in cents.values()
            )
            total += best
        return total

    out = kmeans_step(df, num_centroids=6)
    prev_sse = None
    for _ in range(3):
        rows = out.collect()
        cur = sse(rows)
        if prev_sse is not None:
            assert cur <= prev_sse + 1e-6
        prev_sse = cur
        fed = (
            spark.createDataFrame(
                [(r["cell"], r["new_centroid"]) for r in rows],
                "cent_id: bigint, centv: array<double>",
            )
        )
        out = kmeans_step(df, centroids=fed)
    total_assigned = sum(r["n_vectors"] for r in out.collect())
    assert total_assigned == 60


def test_temperature_mix_drops_null_groups_consistently(spark):
    from knot_another_pipeline_spark.operators.sampling import temperature_mix

    rows = [(i, "en" if i % 3 else None) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id: bigint, lang: string")
    out = temperature_mix(df, group_col="lang", id_col="doc_id", alpha=0.5)
    got = out.collect()
    # null-group rows neither appear NOR distort the survivors' fraction:
    # with nulls excluded, 'en' is the only (and thus rarest) group -> 1.0
    assert all(r["lang"] == "en" for r in got)
    assert all(r["keep_fraction"] == 1.0 for r in got)
    assert len(got) == sum(1 for _, g in rows if g is not None)


# ---------------------------------------------------------------------------
# assign_zones / point_in_polygon ≡ brute-force ray cast
# ---------------------------------------------------------------------------


def _brute_pip(lat, lon, ring):
    n = len(ring)
    crossings = 0
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > lat) != (y2 > lat):
            if lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1:
                crossings += 1
    return crossings % 2 == 1


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-79.9, max_value=79.9),
            st.floats(min_value=-179.9, max_value=179.9),
        ),
        min_size=20,
        max_size=40,
    )
)
def test_assign_zones_matches_bruteforce(spark, pts):
    from knot_another_pipeline_spark.operators.tracks import assign_zones

    rings = {
        "sq": [(-10.5, -10.25), (10.75, -10.25), (10.75, 10.5), (-10.5, 10.5)],
        "tri": [(-60.3, 20.1), (60.7, 25.3), (0.1, 75.9)],
        "concave": [(-50.2, -60.1), (50.4, -60.1), (50.4, -20.3),
                    (0.0, -45.7), (-50.2, -20.3)],
    }
    points = [(i, la, lo) for i, (la, lo) in enumerate(pts)]
    pdf = spark.createDataFrame(points, "pid: bigint, lat: double, lon: double")
    zdf = spark.createDataFrame(
        [(z, [{"lon": x, "lat": y} for x, y in ring]) for z, ring in rings.items()],
        "zone string, polygon array<struct<lon:double, lat:double>>",
    )
    got = {
        (r["id"], r["zone"])
        for r in assign_zones(pdf, zdf, id_col="pid").collect()
    }
    expected = {
        (i, z)
        for i, la, lo in points
        for z, ring in rings.items()
        if _brute_pip(la, lo, ring)
    }
    assert got == expected


def test_assign_zones_plan_broadcast_only_no_point_shuffle(spark):
    from knot_another_pipeline_spark.operators.tracks import assign_zones

    pdf = spark.createDataFrame(
        [(1, 0.0, 0.0)], "pid: bigint, lat: double, lon: double"
    )
    zdf = spark.createDataFrame(
        [("z", [{"lon": -1.0, "lat": -1.0}, {"lon": 1.0, "lat": -1.0},
                {"lon": 0.0, "lat": 1.0}])],
        "zone string, polygon array<struct<lon:double, lat:double>>",
    )
    plan = (
        assign_zones(pdf, zdf, id_col="pid")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan
    # the points side must reach the join without any shuffle exchange
    assert "Exchange hashpartitioning" not in plan


def test_pack_sequences_rejects_string_ids(spark):
    from knot_another_pipeline_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame([("a", 5)], "doc_id: string, n_tok: bigint")
    with pytest.raises(TypeError):
        pack_sequences(df, id_col="doc_id", token_col="n_tok", seq_len=8)


# ---------------------------------------------------------------------------
# phrase_search ≡ brute-force sliding window; zero-shuffle plan
# ---------------------------------------------------------------------------


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("ab"), min_size=0, max_size=12),
        min_size=1,
        max_size=20,
    ),
    st.lists(st.sampled_from("ab"), min_size=1, max_size=3),
)
def test_phrase_search_matches_bruteforce(spark, docs_words, phrase_words):
    from knot_another_pipeline_spark.operators.search import phrase_search

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    df = spark.createDataFrame(rows, "doc_id: bigint, text: string")
    phrase = " ".join(phrase_words)
    got = {
        r["id"]: (r["n_occurrences"], r["first_pos"], r["n_tokens"])
        for r in phrase_search(
            df, id_col="doc_id", text_col="text", phrase=phrase
        ).collect()
    }
    expected = {}
    for i, ws in enumerate(docs_words):
        hits = [
            j
            for j in range(len(ws) - len(phrase_words) + 1)
            if ws[j : j + len(phrase_words)] == phrase_words
        ]
        if hits:
            expected[i] = (len(hits), hits[0], len(ws))
    assert got == expected


def test_phrase_search_plan_zero_shuffle_and_validation(spark):
    from knot_another_pipeline_spark.operators.search import phrase_search

    df = spark.createDataFrame(
        [(1, "new york city new york")], "doc_id: bigint, text: string"
    )
    out = phrase_search(df, id_col="doc_id", text_col="text", phrase="new york")
    rows = out.collect()
    assert rows[0]["n_occurrences"] == 2 and rows[0]["first_pos"] == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # fully row-local scan
    with pytest.raises(ValueError):
        phrase_search(df, id_col="doc_id", text_col="text", phrase="   ")


# ---------------------------------------------------------------------------
# time_weighted_avg ≡ brute-force interval splitting
# ---------------------------------------------------------------------------


def _brute_twa(rows, bucket_s, max_hold_s):
    import datetime as dt

    per_e: dict[int, list] = {}
    for e, ts, v, tb in rows:
        per_e.setdefault(e, []).append((ts, tb, v))
    out: dict[tuple, list] = {}
    epoch = dt.datetime(1970, 1, 1)
    for e, obs in per_e.items():
        obs.sort()
        for i, (ts, _, v) in enumerate(obs[:-1]):
            nxt = obs[i + 1][0]
            if max_hold_s is not None:
                nxt = min(nxt, ts + dt.timedelta(seconds=max_hold_s))
            t = ts
            while t < nxt:
                sec = (t - epoch).total_seconds()
                b = epoch + dt.timedelta(seconds=sec - sec % bucket_s)
                b_end = b + dt.timedelta(seconds=bucket_s)
                seg_end = min(nxt, b_end)
                dur = (seg_end - max(t, b)).total_seconds()
                if dur > 0:
                    out.setdefault((e, b), []).append((v, dur))
                t = seg_end
    return {
        k: (
            round(sum(v * d for v, d in segs) / sum(d for _, d in segs), 6),
            round(sum(d for _, d in segs), 6),
        )
        for k, segs in out.items()
    }


def test_time_weighted_avg_matches_bruteforce(spark):
    import datetime as dt

    from knot_another_pipeline_spark.operators.temporal import (
        time_weighted_avg,
    )

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    tb = 0
    for e in range(4):
        t = base
        for i in range(25):
            rows.append((e, t, float((e * 7 + i * 3) % 11), tb))
            tb += 1
            t += dt.timedelta(minutes=7 + ((e + i * 13) % 200))
    df = spark.createDataFrame(
        rows, "e: bigint, ts: timestamp, v: double, tb: bigint"
    )
    got = {
        (r["e"], r["bucket_ts"]): (r["twa"], r["covered_s"])
        for r in time_weighted_avg(
            df,
            entity_col="e",
            ts_col="ts",
            value_col="v",
            bucket="hour",
            max_hold="2 hours",
            tiebreak_col="tb",
        ).collect()
    }
    expected = _brute_twa(rows, 3600, 7200)
    assert set(got) == set(expected)
    for k in expected:
        assert got[k][0] == pytest.approx(expected[k][0], abs=1e-5)
        assert got[k][1] == pytest.approx(expected[k][1], abs=1e-5)
    # a constant-value stream averages to that constant in every bucket
    const = spark.createDataFrame(
        [(1, base + dt.timedelta(minutes=30 * i), 5.0, i) for i in range(10)],
        "e: bigint, ts: timestamp, v: double, tb: bigint",
    )
    vals = {
        r["twa"]
        for r in time_weighted_avg(
            const, entity_col="e", ts_col="ts", value_col="v", bucket="hour"
        ).collect()
    }
    assert vals == {5.0}
    with pytest.raises(KeyError):
        time_weighted_avg(
            const, entity_col="e", ts_col="ts", value_col="v", bucket="week"
        )


# ---------------------------------------------------------------------------
# target_encode / hash_features / benford_check ≡ brute force
# ---------------------------------------------------------------------------


def test_target_encode_matches_bruteforce_and_loo_guard(spark):
    from knot_another_pipeline_spark.operators.features import target_encode

    rows = [(i, "c" + str(i % 3), float((i * 7) % 13)) for i in range(40)]
    rows.append((100, "solo", 9.0))  # singleton category
    df = spark.createDataFrame(rows, "id: bigint, cat: string, y: double")
    m = 5.0
    mu = sum(y for _, _, y in rows) / len(rows)
    stats: dict[str, tuple[int, float]] = {}
    for _, c, y in rows:
        n, s = stats.get(c, (0, 0.0))
        stats[c] = (n + 1, s + y)
    got = {
        r["id"]: r["te"]
        for r in target_encode(
            df, id_col="id", category_col="cat", target_col="y", smoothing=m
        ).collect()
    }
    for i, c, y in rows:
        n, s = stats[c]
        expected = (s - y + m * mu) / (n - 1 + m)
        assert got[i] == pytest.approx(round(expected, 6), abs=2e-6)
    # LOO leakage guard: a singleton category encodes exactly the prior
    assert got[100] == pytest.approx(round(mu, 6), abs=2e-6)
    with pytest.raises(ValueError):
        target_encode(
            df, id_col="id", category_col="cat", target_col="y", smoothing=0
        )


def test_hash_features_bruteforce_and_stability(spark):
    import hashlib

    from knot_another_pipeline_spark.operators.features import hash_features

    rows = [(i, "s" + str(i % 5), i % 7) for i in range(60)]
    df = spark.createDataFrame(rows, "id: bigint, seg: string, nat: int")
    D = 64  # small space: forces collisions, exercising sign-sum merge
    got = {
        (r["id"], r["feature_idx"]): r["feature_val"]
        for r in hash_features(
            df, id_col="id", cols=["seg", "nat"], num_features=D
        ).collect()
    }

    def h(seed, payload):
        return int(
            hashlib.md5(f"{seed}:{payload}".encode()).hexdigest()[:15], 16
        )

    expected: dict[tuple, int] = {}
    for i, seg, nat in rows:
        for col, val in (("seg", seg), ("nat", str(nat))):
            payload = f"{col}={val}"
            idx = h(0, payload) % D
            sgn = 1 if h(1, payload) % 2 == 0 else -1
            expected[(i, idx)] = expected.get((i, idx), 0) + sgn
    expected = {k: v for k, v in expected.items() if v != 0}
    assert got == expected


def test_benford_check_uniform_vs_benford(spark):
    import math

    from knot_another_pipeline_spark.operators.quality import (
        BENFORD_EXPECTED,
        benford_check,
    )

    # group "b": synthetic Benford-ish sample (powers of a log-uniform
    # generator); group "u": uniform 1000-9999 (flag-raising)
    rows = []
    for i in range(2000):
        rows.append(("b", 10.0 ** ((i * 0.6180339887) % 3.0)))
        rows.append(("u", float(1000 + (i * 4391) % 9000)))
    df = spark.createDataFrame(rows, "grp: string, v: double")
    out = {
        r["grp"]: r
        for r in benford_check(df, value_col="v", by="grp").collect()
    }
    assert not out["b"]["suspicious"]
    assert out["u"]["suspicious"]
    assert out["b"]["n"] == out["u"]["n"] == 2000
    # brute-force chi2 for the uniform group
    counts = [0] * 9
    for g, v in rows:
        if g == "u":
            counts[int(str(v).lstrip("0.-")[0]) - 1] += 1
    chi2 = sum(
        (c - 2000 * e) ** 2 / (2000 * e)
        for c, e in zip(counts, BENFORD_EXPECTED)
    )
    assert out["u"]["chi2"] == pytest.approx(round(chi2, 6), abs=1e-4)
    # zero/null excluded
    z = spark.createDataFrame(
        [("g", 0.0), ("g", None), ("g", 12.0)], "grp: string, v: double"
    )
    assert benford_check(z, value_col="v", by="grp").collect()[0]["n"] == 1
