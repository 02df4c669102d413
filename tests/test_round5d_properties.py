"""Property-based tests for the round-5 closing operators: BPE learning
vs a pure-Python Sennrich reference, repeated-span detection vs brute
force, token entropy vs direct computation, and negative-sampling
invariants — arbitrary inputs, one batched Spark run per property."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

_word = st.text(alphabet="abcd", min_size=1, max_size=6)


# ---------------------------------------------------------------------------
# bpe_learn ≡ Sennrich reference on the same word-frequency table
# ---------------------------------------------------------------------------


def _ref_bpe(words: dict[str, int], n_merges: int):
    """Independent reimplementation of BPE merge learning (Sennrich
    et al. 2016, Algorithm 1) with (count desc, a, b) tie-breaks."""
    vocab = {tuple(w) + ("</w>",): c for w, c in words.items()}
    out = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((rank, a, b, cnt))
        merged = {}
        for syms, c in vocab.items():
            new, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    new.append(a + b)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            merged[tuple(new)] = merged.get(tuple(new), 0) + c
        vocab = merged
    return out


@settings(max_examples=6, deadline=None)
@given(
    st.dictionaries(_word, st.integers(min_value=1, max_value=9),
                    min_size=1, max_size=8)
)
def test_bpe_learn_matches_sennrich_reference(spark, words):
    from knot_another_pipeline_spark.operators.text_analysis import bpe_learn

    w = spark.createDataFrame(list(words.items()), "word string, cnt long")
    got = bpe_learn(w, n_merges=4)
    assert got == _ref_bpe(words, 4)


# ---------------------------------------------------------------------------
# repeated_ngram_spans ≡ brute-force span computation
# ---------------------------------------------------------------------------


def _ref_spans(docs: dict[int, str], n: int, min_docs: int):
    grams: dict[str, set[int]] = {}
    positions: dict[int, list[tuple[int, str]]] = {}
    for i, text in docs.items():
        toks = text.split()
        for p in range(len(toks) - n + 1):
            g = " ".join(toks[p : p + n])
            grams.setdefault(g, set()).add(i)
            positions.setdefault(i, []).append((p, g))
    frequent = {g for g, ds in grams.items() if len(ds) >= min_docs}
    out = set()
    for i, plist in positions.items():
        hits = sorted(p for p, g in plist if g in frequent)
        if not hits:
            continue
        start, end, cnt = hits[0], hits[0] + n - 1, 1
        for p in hits[1:]:
            if p <= end + 1:
                end = max(end, p + n - 1)
                cnt += 1
            else:
                out.add((i, start, end, end - start + 1, cnt))
                start, end, cnt = p, p + n - 1, 1
        out.add((i, start, end, end - start + 1, cnt))
    return out


@settings(max_examples=6, deadline=None)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=9),
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=12).map(
            " ".join
        ),
        min_size=2,
        max_size=6,
    )
)
def test_repeated_spans_match_brute_force(spark, docs):
    from knot_another_pipeline_spark.operators.text_analysis import (
        repeated_ngram_spans,
    )

    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"],
         r["n_grams"])
        for r in repeated_ngram_spans(
            df, id_col="doc_id", text_col="text", n=2, min_docs=2
        ).collect()
    }
    assert got == _ref_spans(docs, n=2, min_docs=2)


# ---------------------------------------------------------------------------
# token_entropy ≡ direct Shannon computation
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None)
@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=9),
        st.lists(st.sampled_from("abcde"), min_size=1, max_size=15).map(
            " ".join
        ),
        min_size=1,
        max_size=6,
    )
)
def test_token_entropy_matches_direct(spark, docs):
    from knot_another_pipeline_spark.operators.text_analysis import (
        token_entropy,
    )

    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    got = {
        r["id"]: (r["n_tokens"], r["n_types"], r["entropy"])
        for r in token_entropy(df, id_col="doc_id", text_col="text").collect()
    }
    for i, text in docs.items():
        toks = text.split()
        counts = Counter(toks)
        n = len(toks)
        h = -sum((c / n) * math.log2(c / n) for c in counts.values())
        gt = got[i]
        assert gt[0] == n and gt[1] == len(counts)
        assert abs(gt[2] - h) < 1e-5


# ---------------------------------------------------------------------------
# negative_samples invariants on arbitrary interaction graphs
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None)
@given(
    st.sets(
        st.tuples(
            st.integers(min_value=1, max_value=5),
            st.integers(min_value=100, max_value=119),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_negative_samples_invariants(spark, inter_pairs):
    from knot_another_pipeline_spark.operators.sampling import (
        negative_samples,
    )

    inter = spark.createDataFrame(
        list(inter_pairs), "u long, it long"
    )
    items = spark.createDataFrame(
        [(i,) for i in range(100, 120)], "it long"
    )
    rows = negative_samples(
        inter, items, user_col="u", item_col="it", k=3, oversample=3
    ).collect()
    users = {u for u, _ in inter_pairs}
    by_user: dict[int, list] = {}
    for r in rows:
        assert (r["user"], r["item"]) not in inter_pairs
        assert 100 <= r["item"] < 120
        by_user.setdefault(r["user"], []).append(r["neg_rank"])
    assert set(by_user) <= users
    for u, ranks in by_user.items():
        # ranks are 1..m contiguous, m <= k
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3
