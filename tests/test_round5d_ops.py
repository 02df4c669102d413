"""Round-5 closing additions: DSIR importance weights, ANN recall
evaluation, token-distribution entropy, and MAD robust outliers.

Each operator is checked against an independent pure-Python reference
(plus its DuckDB oracle in test_catalog_oracle.py).
"""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from knot_another_pipeline_spark.operators.features import dsir_weights
from knot_another_pipeline_spark.operators.quality import mad_outliers
from knot_another_pipeline_spark.operators.similarity import ann_recall
from knot_another_pipeline_spark.operators.text_analysis import token_entropy


# ---------------------------------------------------------------------------
# dsir_weights
# ---------------------------------------------------------------------------


def test_dsir_target_like_docs_score_higher(spark):
    # Target distribution is all-"alpha" text; source mixes two styles.
    src = spark.createDataFrame(
        [
            (1, "alpha alpha alpha alpha"),
            (2, "zebra quux xylophone jumble"),
        ],
        ["doc_id", "text"],
    )
    tgt = spark.createDataFrame([(10, "alpha alpha alpha")], ["doc_id", "text"])
    out = {
        r["id"]: r
        for r in dsir_weights(
            src, tgt, id_col="doc_id", text_col="text", num_buckets=64
        ).collect()
    }
    assert out[1]["logweight"] > out[2]["logweight"]
    assert out[1]["n_tokens"] == 4 and out[2]["n_tokens"] == 4
    # length-normalized variant is sum/len
    assert out[1]["avg_logratio"] == pytest.approx(
        out[1]["logweight"] / 4, abs=1e-5
    )


def test_dsir_matches_brute_force(spark):
    docs = [(i, f"tok{i % 3} tok{i % 5} common") for i in range(12)]
    src = spark.createDataFrame(docs, ["doc_id", "text"])
    tgt_rows = [d for d in docs if d[0] % 4 == 0]
    tgt = spark.createDataFrame(tgt_rows, ["doc_id", "text"])
    D, a = 32, 0.5

    def bucket(tok: str) -> int:
        import hashlib

        h = int(hashlib.md5(f"0:{tok}".encode()).hexdigest()[:15], 16)
        return h % D

    src_cnt: dict[int, int] = {}
    tgt_cnt: dict[int, int] = {}
    per_doc: dict[int, list[int]] = {}
    for i, text in docs:
        for t in text.split():
            b = bucket(t)
            src_cnt[b] = src_cnt.get(b, 0) + 1
            per_doc.setdefault(i, []).append(b)
    for i, text in tgt_rows:
        for t in text.split():
            b = bucket(t)
            tgt_cnt[b] = tgt_cnt.get(b, 0) + 1
    ns, nt = sum(src_cnt.values()), sum(tgt_cnt.values())
    expected = {}
    for i, buckets in per_doc.items():
        s = sum(
            math.log((tgt_cnt.get(b, 0) + a) / (nt + a * D))
            - math.log((src_cnt.get(b, 0) + a) / (ns + a * D))
            for b in buckets
        )
        expected[i] = round(s, 6)
    got = {
        r["id"]: r["logweight"]
        for r in dsir_weights(
            src, tgt, id_col="doc_id", text_col="text", num_buckets=D
        ).collect()
    }
    assert got == pytest.approx(expected, abs=1e-5)


def test_dsir_validation(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="num_buckets"):
        dsir_weights(df, df, id_col="doc_id", text_col="text", num_buckets=1)
    with pytest.raises(ValueError, match="alpha"):
        dsir_weights(df, df, id_col="doc_id", text_col="text", alpha=0.0)


# ---------------------------------------------------------------------------
# ann_recall
# ---------------------------------------------------------------------------


def _topk_df(spark, rows):
    return spark.createDataFrame(rows, ["query_id", "neighbor_id"])


def test_ann_recall_perfect_and_partial(spark):
    exact = _topk_df(
        spark, [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21), (2, 22)]
    )
    approx = _topk_df(
        spark, [(1, 10), (1, 11), (1, 12), (2, 20), (2, 99), (2, 98)]
    )
    out = {r["query_id"]: r for r in ann_recall(exact, approx).collect()}
    assert out[1]["recall"] == 1.0 and out[1]["n_hit"] == 3
    assert out[2]["recall"] == pytest.approx(1 / 3, abs=1e-6)
    assert out[2]["n_approx"] == 3


def test_ann_recall_missing_query_counts_zero(spark):
    exact = _topk_df(spark, [(1, 10), (1, 11), (3, 30)])
    approx = _topk_df(spark, [(1, 10)])  # query 3 returned nothing
    out = {r["query_id"]: r for r in ann_recall(exact, approx).collect()}
    assert set(out) == {1, 3}
    assert out[3]["n_approx"] == 0 and out[3]["n_hit"] == 0
    assert out[3]["recall"] == 0.0
    assert out[1]["recall"] == 0.5


# ---------------------------------------------------------------------------
# token_entropy
# ---------------------------------------------------------------------------


def test_token_entropy_uniform_and_degenerate(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d"),        # uniform over 4 types → 2 bits
            (2, "a a a a"),        # single type → 0 bits, norm NULL
            (3, "a a b b b b"),    # p = (1/3, 2/3)
            (4, "   "),            # zero tokens → no row
        ],
        ["doc_id", "text"],
    )
    out = {
        r["id"]: r
        for r in token_entropy(df, id_col="doc_id", text_col="text").collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["entropy"] == pytest.approx(2.0, abs=1e-6)
    assert out[1]["entropy_norm"] == pytest.approx(1.0, abs=1e-6)
    assert out[2]["entropy"] == 0.0 and out[2]["entropy_norm"] is None
    h = -(1 / 3) * math.log2(1 / 3) - (2 / 3) * math.log2(2 / 3)
    assert out[3]["entropy"] == pytest.approx(h, abs=1e-6)
    assert out[3]["n_tokens"] == 6 and out[3]["n_types"] == 2


# ---------------------------------------------------------------------------
# mad_outliers
# ---------------------------------------------------------------------------


def test_mad_flags_obvious_outlier(spark):
    rows = [(i, "g", float(v)) for i, v in enumerate([10, 11, 12, 13, 14])]
    rows.append((99, "g", 1000.0))
    df = spark.createDataFrame(rows, ["id", "grp", "v"])
    out = mad_outliers(df, id_col="id", value_col="v", by="grp").collect()
    assert [r["id"] for r in out] == [99]
    r = out[0]
    # median 12.25? no: values 10..14 + 1000 → sorted 10,11,12,13,14,1000,
    # continuous median = 12.5; adev median over {2.5,1.5,.5,.5,1.5,987.5}=1.5
    assert r["med"] == pytest.approx(12.5)
    assert r["mad"] == pytest.approx(1.5)
    assert r["robust_z"] == pytest.approx(
        (1000 - 12.5) / (1.4826 * 1.5), abs=1e-4
    )


def test_mad_zero_mad_group_never_flags(spark):
    # >50% of rows at the median → MAD 0 → NULL z, no flags.
    rows = [(i, float(5)) for i in range(6)] + [(10, 500.0)]
    df = spark.createDataFrame(rows, ["id", "v"])
    out = mad_outliers(df, id_col="id", value_col="v", k=2.0).collect()
    assert out == []


def test_mad_grouped_independent_scales(spark):
    # Same offset is an outlier in the tight group, not in the wide one.
    tight = [(i, "t", float(100 + i)) for i in range(5)] + [(50, "t", 140.0)]
    wide = [(100 + i, "w", float(100 + 10 * i)) for i in range(5)] + [
        (150, "w", 180.0)
    ]
    df = spark.createDataFrame(tight + wide, ["id", "grp", "v"])
    out = mad_outliers(df, id_col="id", value_col="v", by="grp", k=3.5)
    assert [r["id"] for r in out.collect()] == [50]


# ---------------------------------------------------------------------------
# phash_media / phash_pairs
# ---------------------------------------------------------------------------


def _phash_ref(payload: bytes) -> str:
    import hashlib

    px = []
    for b in range(4):
        d = hashlib.md5(payload + f":{b}".encode()).hexdigest()
        px.extend(int(d[2 * j : 2 * j + 2], 16) for j in range(16))
    total = sum(px)
    bits = 0
    for p in px:
        bits = (bits << 1) | (1 if p * 64 > total else 0)
    return f"{bits:016x}"


def test_phash_matches_reference_and_null(spark):
    from knot_another_pipeline_spark.operators.multimodal import phash_media

    df = spark.createDataFrame(
        [(1, b"hello world"), (2, b"other"), (3, None)],
        "doc_id bigint, payload binary",
    )
    out = {r["doc_id"]: r for r in
           phash_media(df, id_col="doc_id", payload_col="payload").collect()}
    assert out[1]["phash"] == _phash_ref(b"hello world")
    assert out[1]["phash_hi"] == int(out[1]["phash"][:8], 16)
    assert out[1]["phash_lo"] == int(out[1]["phash"][8:], 16)
    assert out[3]["phash"] is None and out[3]["phash_hi"] is None


def test_phash_pairs_finds_exact_and_near_dups(spark):
    from knot_another_pipeline_spark.operators.multimodal import (
        phash_media,
        phash_pairs,
    )

    # Identical payloads → hamming 0; a 1-nibble perturbed signature →
    # small hamming found via the 3 untouched bands.
    df = spark.createDataFrame(
        [(1, b"same-bytes"), (2, b"same-bytes"), (3, b"unrelated payload x")],
        "doc_id bigint, payload binary",
    )
    sig = phash_media(df, id_col="doc_id", payload_col="payload")
    h = _phash_ref(b"same-bytes")
    flipped = f"{int(h, 16) ^ 0b11:016x}"  # flip 2 bits in the last band
    extra = spark.createDataFrame(
        [(4, flipped, int(flipped[:8], 16), int(flipped[8:], 16))],
        "doc_id bigint, phash string, phash_hi bigint, phash_lo bigint",
    )
    out = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_pairs(sig.union(extra), max_hamming=3).collect()
    }
    assert out[(1, 2)] == 0
    assert out[(1, 4)] == 2 and out[(2, 4)] == 2
    assert (1, 3) not in out and (2, 3) not in out


def test_phash_pairs_wide_radius_needs_more_bands(spark):
    """A pair at Hamming 4 with one flipped bit PER 16-bit band is
    invisible to 4-band blocking — 8 bands must find it, and asking
    4 bands for radius 4 must raise instead of silently missing."""
    from knot_another_pipeline_spark.operators.multimodal import phash_pairs

    h = int(_phash_ref(b"payload-x"), 16)
    damaged = h ^ ((1 << 63) | (1 << 47) | (1 << 31) | (1 << 15))

    def sig_row(i, v):
        hx = f"{v:016x}"
        return (i, hx, int(hx[:8], 16), int(hx[8:], 16))

    df = spark.createDataFrame(
        [sig_row(1, h), sig_row(2, damaged)],
        "doc_id bigint, phash string, phash_hi bigint, phash_lo bigint",
    )
    with pytest.raises(ValueError, match="guarantee recall"):
        phash_pairs(df, max_hamming=4)
    # 4 bands + explicit opt-in: pair legitimately absent
    assert (
        phash_pairs(df, max_hamming=4, allow_partial_recall=True).count()
        == 0
    )
    # 8 bands honor the radius: one of the 8-bit slices is untouched
    got = phash_pairs(df, max_hamming=4, bands=8).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in got] == [(1, 2, 4)]


def test_phash_pairs_validation(spark):
    from knot_another_pipeline_spark.operators.multimodal import phash_pairs

    df = spark.createDataFrame(
        [], "doc_id bigint, phash string, phash_hi bigint, phash_lo bigint"
    )
    with pytest.raises(ValueError, match="max_hamming"):
        phash_pairs(df, max_hamming=65)
    with pytest.raises(ValueError, match="bands"):
        phash_pairs(df, bands=5)


# ---------------------------------------------------------------------------
# bpe_pair_counts / bpe_learn
# ---------------------------------------------------------------------------


def test_bpe_learn_classic_example(spark):
    from knot_another_pipeline_spark.operators.text_analysis import bpe_learn

    w = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
        ["word", "cnt"],
    )
    got = bpe_learn(w, n_merges=3)
    # Sennrich example: es(9) → est(9) → est</w>(9)
    assert got == [
        (1, "e", "s", 9),
        (2, "es", "t", 9),
        (3, "est", "</w>", 9),
    ]


def test_bpe_merge_application_is_greedy_left_to_right(spark):
    from knot_another_pipeline_spark.operators.text_analysis import (
        bpe_pair_counts,
    )

    # After merging (a, a), "aaa" must pair as (aa, a) — greedy, not (a, aa).
    w = spark.createDataFrame([("aaa", 1)], ["word", "cnt"])
    rows = {
        (r["a"], r["b"]): r["pair_count"]
        for r in bpe_pair_counts(w, merges=[("a", "a")]).collect()
    }
    assert rows == {("aa", "a"): 1, ("a", "</w>"): 1}


def test_bpe_learn_stops_when_vocab_exhausted(spark):
    from knot_another_pipeline_spark.operators.text_analysis import bpe_learn

    w = spark.createDataFrame([("ab", 4)], ["word", "cnt"])
    got = bpe_learn(w, n_merges=10)
    # "a b </w>" → ab, ab</w>, then single symbols: no pairs remain.
    assert [g[:3] for g in got] == [
        (1, "a", "b"), (2, "ab", "</w>")
    ]
    with pytest.raises(ValueError, match="n_merges"):
        bpe_learn(w, n_merges=0)


def test_bpe_incremental_matches_full_recount(spark):
    """The delta-recount path (round-6) must learn the IDENTICAL rule
    sequence — counts included — as the naive full-recount path, on a
    corpus with ties, runs ('aaa'), and exhaustion."""
    import random

    from knot_another_pipeline_spark.operators.text_analysis import bpe_learn

    rng = random.Random(42)
    alpha = "abcde"
    vocab = sorted(
        {
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 7)))
            for _ in range(60)
        }
    ) + ["aaa", "aaaa", "low", "lower", "newest", "widest"]
    w = spark.createDataFrame(
        [(word, rng.randint(1, 9)) for word in vocab], ["word", "cnt"]
    )
    inc = bpe_learn(w, n_merges=12, full_recount=False)
    full = bpe_learn(w, n_merges=12, full_recount=True)
    assert inc == full


def test_bpe_incremental_delta_shrinks_scanned_rows(spark):
    """The measurable win of the incremental path: late iterations
    re-extract pairs only from words CONTAINING the merged pair. With a
    vocabulary where the top pair is rare, the delta job touches a
    handful of rows while a full recount always touches all V."""
    from pyspark.sql import functions as F

    from knot_another_pipeline_spark.operators.text_analysis import (
        bpe_learn,
    )

    # 200 distinct 1-char words (no pairs beyond c</w>) + 2 rare words
    # sharing the dominant 'q u' pair: after merge 1 only those 2 words
    # are affected.
    rows = [(f"{c}", 1) for c in map(chr, range(0x400, 0x4C8))] + [
        ("quick", 50),
        ("quill", 40),
    ]
    w = spark.createDataFrame(rows, ["word", "cnt"])
    got = bpe_learn(w, n_merges=3, full_recount=False)
    assert [(g[1], g[2]) for g in got][0] == ("q", "u")
    # equality with the naive path on the same input
    assert got == bpe_learn(w, n_merges=3, full_recount=True)
    # the affected-word filter is the delta bound: only 2 of 202 words
    # contain " q  u " once state is built
    state = w.select(
        F.concat(
            F.lit("  "),
            F.regexp_replace(F.col("word"), "(.)", "$1  "),
            F.lit("</w>  "),
        ).alias("syms")
    )
    assert state.filter(F.col("syms").contains(" q  u ")).count() == 2


# ---------------------------------------------------------------------------
# plan shapes: the scale-critical properties, pinned
# ---------------------------------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_attach_band_keys_plan_arrow_batched_no_shuffle(spark):
    """Banding must be one ArrowEvalPython (vectorized matmul) stage +
    Generate — no shuffle, no interpreted per-row fold, and the vector
    column must not survive past the caller's projection."""
    from knot_another_pipeline_spark.operators.similarity import (
        attach_band_keys,
    )

    df = spark.createDataFrame(
        [(i, [float(i + j) for j in range(64)]) for i in range(4)],
        "vec_id: bigint, embedding: array<float>",
    )
    out = attach_band_keys(df, vec_col="embedding", dim=64)
    plan = _plan(out)
    assert "ArrowEvalPython" in plan, plan
    assert "Exchange" not in plan, f"banding must not shuffle: {plan}"


def test_attach_band_keys_matches_column_reference(spark):
    """The matmul path must produce the exact keys of the sequential
    hyperplane_band_keys fold (same planes, same packing)."""
    from pyspark.sql import functions as F

    from knot_another_pipeline_spark.operators.similarity import (
        attach_band_keys,
        hyperplane_band_keys,
    )

    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(50)
    ] + [(99, None)]
    df = spark.createDataFrame(rows, "vec_id: bigint, embedding: array<float>")
    fast = {
        (r["vec_id"], r["band"]): r["bucket"]
        for r in attach_band_keys(df, vec_col="embedding", dim=64).collect()
    }
    keys = hyperplane_band_keys(F.col("embedding"), dim=64)
    ref = {
        (r["vec_id"], r["band"]): r["bucket"]
        for r in df.select(
            "vec_id", F.posexplode(F.array(*keys)).alias("band", "bucket")
        ).collect()
    }
    # NULL vectors: reference folds NULL -> bucket 0 via otherwise();
    # the matmul path emits no row (posexplode of NULL). Compare the
    # non-null universe, and assert the null doc is absent from fast.
    ref_nonnull = {k: v for k, v in ref.items() if k[0] != 99}
    assert fast == ref_nonnull
    assert not any(k[0] == 99 for k in fast)


def test_ann_recall_plan_single_evaluation_of_each_input(spark):
    """The recall metric must evaluate each top-k input subtree once:
    one full-outer join, one aggregate — no re-execution of the
    expensive search per count."""
    from knot_another_pipeline_spark.operators.similarity import ann_recall

    exact = spark.createDataFrame(
        [(1, 10), (1, 11)], ["query_id", "neighbor_id"]
    )
    approx = spark.createDataFrame(
        [(1, 10)], ["query_id", "neighbor_id"]
    )
    plan = _plan(ann_recall(exact, approx))
    # each input is scanned exactly once, through one full-outer join
    n_scans = plan.count("Scan ExistingRDD") + plan.count("LocalTableScan")
    assert n_scans == 2, plan
    assert plan.count("FullOuter") == 1, plan


# ---------------------------------------------------------------------------
# repeated_ngram_spans
# ---------------------------------------------------------------------------


def test_repeated_spans_merges_overlaps_and_positions(spark):
    from knot_another_pipeline_spark.operators.text_analysis import (
        repeated_ngram_spans,
    )

    shared = "the quick brown fox jumps over the lazy dog"  # 9 tokens
    df = spark.createDataFrame(
        [
            (1, f"{shared} today"),
            (2, f"intro text {shared} and more"),
            (3, "completely different words here nothing shared at all"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in repeated_ngram_spans(
            df, id_col="doc_id", text_col="text", n=5
        ).collect()
    }
    # 5 constituent 5-grams merge into ONE maximal span per doc
    assert set(out) == {1, 2}
    assert (out[1]["span_start"], out[1]["span_end"]) == (0, 8)
    assert (out[2]["span_start"], out[2]["span_end"]) == (2, 10)
    assert out[1]["span_tokens"] == 9 and out[1]["n_grams"] == 5


def test_repeated_spans_disjoint_spans_stay_separate(spark):
    from knot_another_pipeline_spark.operators.text_analysis import (
        repeated_ngram_spans,
    )

    a = "alpha beta gamma delta epsilon"       # shared run 1 (5 tokens)
    b = "one two three four five"              # shared run 2
    df = spark.createDataFrame(
        [
            (1, f"{a} filler1 filler2 filler3 {b}"),
            (2, f"{a} unrelated tail words here"),
            (3, f"prefix words {b} suffix"),
        ],
        ["doc_id", "text"],
    )
    rows = repeated_ngram_spans(
        df, id_col="doc_id", text_col="text", n=5
    ).collect()
    doc1 = sorted(
        (r["span_start"], r["span_end"]) for r in rows if r["doc_id"] == 1
    )
    assert doc1 == [(0, 4), (8, 12)]  # two separate spans, not merged


def test_repeated_spans_validation(spark):
    from knot_another_pipeline_spark.operators.text_analysis import (
        repeated_ngram_spans,
    )

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="n must"):
        repeated_ngram_spans(df, id_col="doc_id", text_col="text", n=1)
    with pytest.raises(ValueError, match="min_docs"):
        repeated_ngram_spans(
            df, id_col="doc_id", text_col="text", min_docs=1
        )


# ---------------------------------------------------------------------------
# negative_samples
# ---------------------------------------------------------------------------


def test_negative_samples_excludes_positives_and_is_deterministic(spark):
    from knot_another_pipeline_spark.operators.sampling import (
        negative_samples,
    )

    inter = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a")], ["u", "it"]
    )
    items = spark.createDataFrame([(x,) for x in "abcdefgh"], ["it"])
    out = negative_samples(inter, items, user_col="u", item_col="it", k=3)
    rows = sorted(map(tuple, out.collect()))
    pos = {(1, "a"), (1, "b"), (2, "a")}
    assert all((u, i) not in pos for (u, i, _) in rows)
    assert {u for (u, _, _) in rows} == {1, 2}
    assert all(1 <= r <= 3 for (_, _, r) in rows)
    # repartitioning must not change the draws
    out2 = negative_samples(
        inter.repartition(4), items, user_col="u", item_col="it", k=3
    )
    assert rows == sorted(map(tuple, out2.collect()))
    # per-user: at most one of each rank, no duplicate items
    for u in (1, 2):
        mine = [(i, r) for (uu, i, r) in rows if uu == u]
        assert len({r for _, r in mine}) == len(mine)
        assert len({i for i, _ in mine}) == len(mine)


def test_negative_samples_seed_changes_draws(spark):
    from knot_another_pipeline_spark.operators.sampling import (
        negative_samples,
    )

    inter = spark.createDataFrame([(1, "a")], ["u", "it"])
    items = spark.createDataFrame(
        [(f"item{x}",) for x in range(50)] + [("a",)], ["it"]
    )
    a = sorted(
        map(tuple, negative_samples(
            inter, items, user_col="u", item_col="it", k=5, seed=0
        ).collect())
    )
    b = sorted(
        map(tuple, negative_samples(
            inter, items, user_col="u", item_col="it", k=5, seed=1
        ).collect())
    )
    assert a != b


def test_negative_samples_validation(spark):
    from knot_another_pipeline_spark.operators.sampling import (
        negative_samples,
    )

    df = spark.createDataFrame([(1, "a")], ["u", "it"])
    with pytest.raises(ValueError, match="k must"):
        negative_samples(df, df, user_col="u", item_col="it", k=0)
    with pytest.raises(ValueError, match="oversample"):
        negative_samples(df, df, user_col="u", item_col="it", oversample=0)


def test_negative_samples_plan_no_single_partition_item_window(spark):
    """Item indexing routes through global_rank: every row_number
    window in the plan must be keyed (by the range-partition pid or the
    per-user rank key) — no unkeyed ORDER BY window that would funnel
    the item catalog through one task."""
    import re

    from knot_another_pipeline_spark.operators.sampling import (
        negative_samples,
    )

    inter = spark.createDataFrame([(1, "a"), (2, "b")], ["u", "it"])
    items = spark.createDataFrame([(x,) for x in "abcdef"], ["it"])
    plan = _plan(negative_samples(inter, items, user_col="u", item_col="it"))
    specs = re.findall(
        r"row_number\(\) windowspecdefinition\(([^)]*)\)", plan
    )
    assert specs, "row_number windows missing from plan"
    for spec in specs:
        assert "_gr_pid" in spec or "user" in spec, (
            f"unkeyed global row_number window in plan: {spec}"
        )


# ---------------------------------------------------------------------------
# next_event_examples
# ---------------------------------------------------------------------------


def test_next_event_examples_windows_and_cold_start(spark):
    from knot_another_pipeline_spark.operators.behavior import (
        next_event_examples,
    )

    df = spark.createDataFrame(
        [
            (1, 10, 1, "a"), (1, 20, 2, "b"), (1, 30, 3, "c"),
            (1, 40, 4, "d"), (2, 10, 5, "x"),
        ],
        ["u", "ts", "eid", "it"],
    )
    out = {
        r["anchor"]: r
        for r in next_event_examples(
            df, user_col="u", ts_col="ts", item_col="it",
            tiebreak_col="eid", context_len=2,
        ).collect()
    }
    # first event per user has no context -> dropped; user 2 emits nothing
    assert set(out) == {2, 3, 4}
    assert out[2]["context"] == "a" and out[2]["label"] == "b"
    assert out[3]["context"] == "a|b"
    assert out[4]["context"] == "b|c"  # window slides: 'a' aged out


def test_next_event_examples_tiebreak_orders_equal_timestamps(spark):
    from knot_another_pipeline_spark.operators.behavior import (
        next_event_examples,
    )

    df = spark.createDataFrame(
        [(1, 10, 2, "b"), (1, 10, 1, "a"), (1, 10, 3, "c")],
        ["u", "ts", "eid", "it"],
    )
    out = {
        r["anchor"]: r["context"]
        for r in next_event_examples(
            df, user_col="u", ts_col="ts", item_col="it",
            tiebreak_col="eid", context_len=5,
        ).collect()
    }
    assert out == {2: "a", 3: "a|b"}


def test_next_event_examples_validation(spark):
    from knot_another_pipeline_spark.operators.behavior import (
        next_event_examples,
    )

    df = spark.createDataFrame([(1, 1, 1, "a")], ["u", "ts", "eid", "it"])
    with pytest.raises(ValueError, match="context_len"):
        next_event_examples(
            df, user_col="u", ts_col="ts", item_col="it",
            tiebreak_col="eid", context_len=0,
        )
    with pytest.raises(ValueError, match="min_context"):
        next_event_examples(
            df, user_col="u", ts_col="ts", item_col="it",
            tiebreak_col="eid", context_len=3, min_context=4,
        )


# ---------------------------------------------------------------------------
# bpe_encode
# ---------------------------------------------------------------------------


def test_bpe_encode_applies_merges_in_order(spark):
    from knot_another_pipeline_spark.operators.text_analysis import (
        bpe_encode,
    )

    docs = spark.createDataFrame([(1, "lowest low")], ["doc_id", "text"])
    out = bpe_encode(
        docs,
        id_col="doc_id",
        text_col="text",
        merges=[("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")],
    ).collect()[0]
    assert out["symbols"] == "lo|w|est</w>|lo|w|</w>"
    assert out["n_symbols"] == 6


def test_bpe_encode_roundtrip_with_learn(spark):
    """Encoding the training corpus with its own learned merges must
    reduce the symbol count monotonically as merges are added."""
    from knot_another_pipeline_spark.operators.text_analysis import (
        _tokens,
        bpe_encode,
        bpe_learn,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, "low lower newest widest " * 3) for i in range(4)],
        ["doc_id", "text"],
    )
    words = (
        docs.select(F.explode(_tokens(F.col("text"))).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    )
    learned = [(a, b) for _, a, b, _ in bpe_learn(words, n_merges=6)]
    n_prev = None
    for cut in (1, 3, 6):
        total = bpe_encode(
            docs, id_col="doc_id", text_col="text", merges=learned[:cut]
        ).agg(F.sum("n_symbols")).collect()[0][0]
        if n_prev is not None:
            assert total < n_prev
        n_prev = total
    with pytest.raises(ValueError, match="merges"):
        bpe_encode(docs, id_col="doc_id", text_col="text", merges=[])


# ---------------------------------------------------------------------------
# ab_test
# ---------------------------------------------------------------------------


def test_ab_test_welch_statistic_and_verdict(spark):
    import statistics

    from knot_another_pipeline_spark.operators.quality import ab_test

    ctl = [10.0, 11.0, 9.0, 10.5, 9.5, 10.2, 10.8, 9.2]
    trt = [12.0, 13.0, 11.5, 12.5, 12.2, 11.8, 12.8, 13.2]
    rows = [("g", "A", v) for v in ctl] + [("g", "B", v) for v in trt]
    df = spark.createDataFrame(rows, ["seg", "arm", "m"])
    out = ab_test(
        df, arm_col="arm", metric_col="m", control="A", treatment="B",
        by="seg",
    ).collect()[0]
    ma, mb = statistics.mean(ctl), statistics.mean(trt)
    va, vb = statistics.variance(ctl), statistics.variance(trt)
    z = (round(mb, 6) - round(ma, 6)) / (
        (round(va, 6) / len(ctl) + round(vb, 6) / len(trt)) ** 0.5
    )
    assert out["n_ctl"] == 8 and out["n_trt"] == 8
    assert out["mean_ctl"] == pytest.approx(ma, abs=1e-6)
    assert out["z"] == pytest.approx(z, abs=1e-3)
    assert out["significant"] is True
    assert out["lift"] == pytest.approx(mb / ma - 1, abs=1e-5)


def test_ab_test_null_arm_and_flat_metric(spark):
    from knot_another_pipeline_spark.operators.quality import ab_test

    # identical constant metric in both arms -> se 0 -> NULL z, not sig
    rows = [("A", 5.0)] * 4 + [("B", 5.0)] * 4 + [("C", 99.0)]
    df = spark.createDataFrame(rows, ["arm", "m"])
    out = ab_test(
        df, arm_col="arm", metric_col="m", control="A", treatment="B"
    ).collect()[0]
    # arm C is excluded entirely
    assert out["n_ctl"] == 4 and out["n_trt"] == 4
    assert out["z"] is None and out["significant"] is False


# ---------------------------------------------------------------------------
# ewma_smooth
# ---------------------------------------------------------------------------


def test_ewma_matches_recurrence_and_alarms_on_spike(spark):
    from knot_another_pipeline_spark.operators.temporal import ewma_smooth

    vals = [10.0 + (i % 3) for i in range(10)] + [100.0]
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(vals)], ["s", "d", "v"]
    )
    out = {
        r["t"]: r
        for r in ewma_smooth(
            df, series_col="s", order_col="d", value_col="v", alpha=0.3
        ).collect()
    }
    # reference recurrence with per-step rounding identical to the op
    e = vals[0]
    assert out[0]["ewma"] == e and out[0]["resid"] is None
    for i, v in enumerate(vals[1:], 1):
        prev = round(e, 6)
        e = 0.3 * v + 0.7 * e
        assert out[i]["ewma"] == pytest.approx(e, abs=1e-5)
        assert out[i]["resid"] == pytest.approx(v - prev, abs=1e-5)
    alarms = [t for t, r in out.items() if r["alarm"]]
    assert alarms == [10]


def test_ewma_series_independent_and_validated(spark):
    from knot_another_pipeline_spark.operators.temporal import ewma_smooth

    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 1, 2.0), ("b", 0, 100.0), ("b", 1, 200.0)],
        ["s", "d", "v"],
    )
    out = {
        (r["series"], r["t"]): r["ewma"]
        for r in ewma_smooth(
            df, series_col="s", order_col="d", value_col="v", alpha=0.5
        ).collect()
    }
    assert out[("a", 1)] == pytest.approx(1.5)
    assert out[("b", 1)] == pytest.approx(150.0)
    with pytest.raises(ValueError, match="alpha"):
        ewma_smooth(df, series_col="s", order_col="d", value_col="v",
                    alpha=1.0)
    # numeric-bound guard is IN-PLAN (stays lazy, no eager scan): the
    # job fails at materialization when a series exceeds 50/alpha rows
    long = spark.createDataFrame(
        [("a", i, 1.0) for i in range(200)], ["s", "d", "v"]
    )
    over = ewma_smooth(long, series_col="s", order_col="d", value_col="v",
                       alpha=0.3)  # must NOT raise here
    with pytest.raises(Exception, match="closed-form numeric bound"):
        over.collect()


def test_ewma_tiebreak_orders_duplicate_keys(spark):
    from knot_another_pipeline_spark.operators.temporal import ewma_smooth

    # two rows share ord=0; the tiebreak makes t assignment total
    df = spark.createDataFrame(
        [("a", 0, 2, 20.0), ("a", 0, 1, 10.0), ("a", 1, 3, 30.0)],
        ["s", "d", "eid", "v"],
    )
    out = {
        r["t"]: r["value"]
        for r in ewma_smooth(
            df, series_col="s", order_col="d", value_col="v",
            tiebreak_col="eid", alpha=0.5,
        ).collect()
    }
    assert out == {0: 10.0, 1: 20.0, 2: 30.0}


# ---------------------------------------------------------------------------
# scd2_as_of
# ---------------------------------------------------------------------------


def test_scd2_as_of_half_open_snapshot(spark):
    from knot_another_pipeline_spark.operators.temporal import (
        scd2_as_of,
        scd2_history,
    )

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "bronze"),
            (1, "2024-01-10 00:00:00", "silver"),
            (1, "2024-01-20 00:00:00", "gold"),
            (2, "2024-01-12 00:00:00", "bronze"),
        ],
        "uid bigint, ts string, tier string",
    ).withColumn("ts", F.to_timestamp("ts"))
    hist = scd2_history(ev, "uid", ts_col="ts", attr_cols=["tier"])
    snap = {
        r["uid"]: r["tier"]
        for r in scd2_as_of(hist, as_of="2024-01-15 00:00:00").collect()
    }
    assert snap == {1: "silver", 2: "bronze"}
    # exactly at a version boundary: the NEW version is live (half-open)
    at_boundary = {
        r["uid"]: r["tier"]
        for r in scd2_as_of(hist, as_of="2024-01-10 00:00:00").collect()
    }
    assert at_boundary[1] == "silver"
    # before any history: user absent
    early = scd2_as_of(hist, as_of="2023-12-01 00:00:00").collect()
    assert early == []


def test_scd2_lookup_point_in_time_enrichment(spark):
    from knot_another_pipeline_spark.operators.temporal import (
        scd2_history,
        scd2_lookup,
    )

    changes = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "free"),
            (1, "2024-01-10 00:00:00", "pro"),
        ],
        "uid bigint, ts string, plan string",
    ).withColumn("ts", F.to_timestamp("ts"))
    hist = scd2_history(changes, "uid", ts_col="ts", attr_cols=["plan"])
    facts = spark.createDataFrame(
        [
            (100, 1, "2023-12-25 00:00:00"),  # before first version
            (101, 1, "2024-01-05 00:00:00"),  # free era
            (102, 1, "2024-01-10 00:00:00"),  # boundary: pro is live
            (103, 1, "2024-02-01 00:00:00"),  # current era
            (104, 2, "2024-01-05 00:00:00"),  # unknown user
        ],
        "fid bigint, uid bigint, fts string",
    ).withColumn("fts", F.to_timestamp("fts"))
    out = {
        r["fid"]: r["plan"]
        for r in scd2_lookup(
            facts, hist, "uid", fact_ts="fts", attr_cols=["plan"]
        ).collect()
    }
    assert out == {100: None, 101: "free", 102: "pro", 103: "pro",
                   104: None}
