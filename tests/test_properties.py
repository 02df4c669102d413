"""Property-based tests (hypothesis): the expression library must agree
with independent pure-Python reference implementations on arbitrary
inputs — one batched Spark evaluation per property, bit-exact compare."""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# stable_bucket ≡ the reference's _stable_hash (sha256 % n), bit-exact
# ---------------------------------------------------------------------------


def _ref_stable_hash(value: str, num_buckets: int) -> int:
    # independent reimplementation of ais_pipeline.py:532-535
    return int(hashlib.sha256(value.encode()).hexdigest()[:16], 16) % num_buckets


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=10**12).map(str),
            st.text(
                alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
                min_size=1,
                max_size=40,
            ),
        ),
        min_size=1,
        max_size=50,
    ),
    st.sampled_from([2, 64, 96, 256]),
)
def test_stable_bucket_bit_exact(spark, values, n):
    from knot_another_pipeline_spark.functions.hashing import stable_bucket

    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [
        r["b"] for r in df.select(stable_bucket("v", n).alias("b")).collect()
    ]
    expected = [_ref_stable_hash(v, n) for v in values]
    assert got == expected


# ---------------------------------------------------------------------------
# normalize_timestamp parses every supported rendering of an instant to
# the same UTC timestamp, and rejects garbage as NULL
# ---------------------------------------------------------------------------


_base_ts = st.datetimes(
    min_value=datetime(1990, 1, 1), max_value=datetime(2100, 1, 1)
).map(lambda d: d.replace(microsecond=0))


def _renderings(dt: datetime) -> list[tuple[str, datetime]]:
    """(string rendering, expected UTC instant) pairs for one instant."""
    iso = dt.strftime("%Y-%m-%d %H:%M:%S")
    out = [
        (iso, dt),
        (iso.replace(" ", "T"), dt),
        (iso + "Z", dt),
        (iso.replace(" ", "T") + "Z", dt),
        (iso + "+00:00", dt),
    ]
    # a nonzero offset must shift the instant
    shifted = dt + timedelta(hours=5)
    out.append((shifted.strftime("%Y-%m-%d %H:%M:%S") + "+05:00", dt))
    return out


@settings(max_examples=10, deadline=None)
@given(st.lists(_base_ts, min_size=1, max_size=20))
def test_normalize_timestamp_renderings(spark, instants):
    from knot_another_pipeline_spark.functions.timestamps import (
        normalize_timestamp,
    )

    rows = []
    for dt in instants:
        rows.extend(_renderings(dt))
    df = spark.createDataFrame(
        [(s,) for s, _ in rows], "raw string"
    ).select("raw", normalize_timestamp("raw").alias("ts"))
    got = [r["ts"] for r in df.collect()]
    for (raw, expected), parsed in zip(rows, got):
        assert parsed is not None, f"failed to parse {raw!r}"
        assert parsed.replace(tzinfo=None) == expected, (
            f"{raw!r} -> {parsed} != {expected}"
        )


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
            min_size=1,
            max_size=30,
        ).filter(
            lambda s: not s.strip()[:10].count("-") == 2  # crude date-shape veto
        ),
        min_size=1,
        max_size=20,
    )
)
def test_normalize_timestamp_garbage_is_null(spark, garbage):
    from knot_another_pipeline_spark.functions.timestamps import (
        normalize_timestamp,
    )

    df = spark.createDataFrame([(g,) for g in garbage], "raw string")
    out = df.select(normalize_timestamp("raw").alias("ts")).collect()
    for g, r in zip(garbage, out):
        # a random ascii string is essentially never a valid timestamp;
        # the property is "no crash, unparsable -> NULL"
        if r["ts"] is not None:
            # accept the rare accidental valid parse, but it must be a
            # real date prefix
            assert any(ch.isdigit() for ch in g)


# ---------------------------------------------------------------------------
# winnowing guarantee: every selected fingerprint is a real k-gram hash
# and each doc yields ≥1 fingerprint iff it has ≥ window grams
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        # printable ASCII only: the pure-Python model below uses Python's
        # whitespace semantics (strip/\s), which disagree with Java's on
        # control characters like \x1f — the operator itself is
        # cross-engine consistent (DuckDB differential), the *model* here
        # is only valid on printable input.
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0,
            max_size=120,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_winnow_fingerprint_coverage(spark, texts):
    from knot_another_pipeline_spark.operators.text_analysis import (
        winnow_fingerprints,
    )

    k, w = 8, 4
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    fps = winnow_fingerprints(df, id_col="doc_id", text_col="text", k=k, window=w)
    by_id: dict[int, set] = {}
    for r in fps.collect():
        by_id.setdefault(r["id"], set()).add(r["fp_hash"])
    import re

    for i, t in enumerate(texts):
        norm = re.sub(r"\s+", " ", t.lower()).strip()
        n_grams = len(norm) - k + 1
        if n_grams >= w:
            assert by_id.get(i), f"doc {i} ({norm!r}) produced no fingerprints"
            # every fingerprint is the hash of some actual k-gram
            gram_hashes = {
                int(hashlib.md5(norm[p : p + k].encode()).hexdigest()[:10], 16)
                for p in range(n_grams)
            }
            assert by_id[i] <= gram_hashes
        else:
            assert i not in by_id


# ---------------------------------------------------------------------------
# repetition_stats' sorted-array run-length fold ≡ naive Counter max
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=12
        ),
        min_size=1,
        max_size=10,
    )
)
def test_repetition_fold_matches_counter(spark, docs):
    from collections import Counter

    from knot_another_pipeline_spark.operators.text_analysis import (
        repetition_stats,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: (r["n_2grams"], r["top_2gram_cnt"])
        for r in repetition_stats(df, id_col="doc_id", text_col="text").collect()
    }
    for i, toks in enumerate(docs):
        grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        top = max(Counter(grams).values()) if grams else 0
        assert got[i] == (len(grams), top), (i, toks)


# ---------------------------------------------------------------------------
# token_budget_select's distributed prefix-sum ≡ naive global cumsum
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0.0, max_value=1.0, allow_nan=False).map(
                lambda x: round(x, 2)
            ),
            st.integers(min_value=1, max_value=50),
        ),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=500),
)
def test_token_budget_matches_naive_cumsum(spark, rows, budget):
    from knot_another_pipeline_spark.operators.sampling import (
        token_budget_select,
    )

    data = [(i, score, toks) for i, (score, toks) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, score double, toks long")
    got = {
        r["id"]: r["cum_tokens"]
        for r in token_budget_select(
            df, id_col="id", score_col="score", token_col="toks", budget=budget
        ).collect()
    }
    expected = {}
    cum = 0
    for i, score, toks in sorted(data, key=lambda t: (-t[1], t[0])):
        cum += toks
        if cum <= budget:
            expected[i] = cum
    assert got == expected


# ---------------------------------------------------------------------------
# asof_join ≡ brute-force latest-at-or-before per probe, on arbitrary data
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(  # probes: (key, t)
        st.tuples(st.integers(0, 3), st.integers(0, 100)),
        min_size=1, max_size=25,
    ),
    st.lists(  # quotes: (key, t, qid) — qid made unique below
        st.tuples(st.integers(0, 3), st.integers(0, 100)),
        min_size=0, max_size=25,
    ),
    st.one_of(st.none(), st.integers(1, 40)),
)
def test_asof_join_matches_bruteforce(spark, probes, quotes, tol):
    from knot_another_pipeline_spark.operators.temporal import asof_join

    base = datetime(2025, 1, 1, tzinfo=timezone.utc)
    quote_rows = [
        (k, base + timedelta(seconds=t), i, float(i))
        for i, (k, t) in enumerate(quotes)
    ]
    probe_rows = [
        (k, base + timedelta(seconds=t), i) for i, (k, t) in enumerate(probes)
    ]
    left = spark.createDataFrame(
        probe_rows, "k long, ts timestamp, pid long"
    )
    right = spark.createDataFrame(
        quote_rows, "k long, ts timestamp, qid long, px double"
    )
    out = asof_join(
        left, right, on="k",
        tolerance_seconds=tol, right_tiebreak="qid",
    ).collect()

    def brute(k, t):
        cands = [
            (qt, qid, px)
            for (qk, qt, qid, px) in quote_rows
            if qk == k and qt <= t
            and (tol is None or (t - qt).total_seconds() <= tol)
        ]
        if not cands:
            return None
        # latest ts; among equal ts the largest tiebreak wins
        qt, qid, px = max(cands, key=lambda c: (c[0], c[1]))
        return px

    assert len(out) == len(probe_rows)  # left join keeps every probe
    for r in out:
        want = brute(r["k"], r["ts"].replace(tzinfo=timezone.utc))
        assert r["px"] == want, (r["k"], r["ts"], r["px"], want)


# ---------------------------------------------------------------------------
# range_join ≡ brute-force interval containment (each match exactly once)
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 200)),
        min_size=1, max_size=20,
    ),
    st.lists(  # (key, start_s, span_s)
        st.tuples(st.integers(0, 2), st.integers(0, 200), st.integers(0, 120)),
        min_size=1, max_size=12,
    ),
    st.sampled_from([7, 60, 3600]),
)
def test_range_join_matches_bruteforce(spark, points, intervals, bucket):
    from knot_another_pipeline_spark.operators.temporal import range_join

    base = datetime(2025, 1, 1, tzinfo=timezone.utc)
    point_rows = [
        (k, base + timedelta(seconds=t), i) for i, (k, t) in enumerate(points)
    ]
    iv_rows = [
        (
            k,
            base + timedelta(seconds=s),
            base + timedelta(seconds=s + span),
            i,
        )
        for i, (k, s, span) in enumerate(intervals)
    ]
    p = spark.createDataFrame(point_rows, "k long, ts timestamp, pid long")
    iv = spark.createDataFrame(
        iv_rows, "k long, start timestamp, end timestamp, ivid long"
    )
    got = sorted(
        (r["pid"], r["ivid"])
        for r in range_join(p, iv, on="k", bucket_seconds=bucket).collect()
    )
    want = sorted(
        (pid, ivid)
        for (pk, pt, pid) in point_rows
        for (ik, s, e, ivid) in iv_rows
        if pk == ik and s <= pt <= e
    )
    assert got == want  # every containment, exactly once, no duplicates


# ---------------------------------------------------------------------------
# chunk_documents: full coverage, exact overlap, reconstruction
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.integers(0, 60),               # token count
    st.integers(1, 12),               # chunk size
    st.integers(0, 11),               # overlap (clamped below chunk)
)
def test_chunk_documents_covers_all_tokens(spark, n, chunk, overlap):
    from knot_another_pipeline_spark.operators.text_analysis import (
        chunk_documents,
    )

    overlap = min(overlap, chunk - 1)
    stride = chunk - overlap
    text = " ".join(f"t{i}" for i in range(n))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(
            df, id_col="doc_id", text_col="text",
            chunk_tokens=chunk, overlap_tokens=overlap,
        ).collect(),
        key=lambda r: r["chunk_id"],
    )
    if n == 0:
        assert rows == []
        return
    toks = [f"t{i}" for i in range(n)]
    # every chunk is exactly the expected slice
    for r in rows:
        start = r["chunk_id"] * stride
        expect = toks[start:start + chunk]
        assert r["chunk_text"].split(" ") == expect
        assert r["n_tokens"] == len(expect)
    # union of chunks covers every token
    covered = set()
    for r in rows:
        covered.update(r["chunk_text"].split(" "))
    assert covered == set(toks)
    # chunk ids are dense from 0
    assert [r["chunk_id"] for r in rows] == list(range(len(rows)))


# ---------------------------------------------------------------------------
# skew_join ≡ plain join on arbitrary (skewed) key distributions
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 100)),
        min_size=1,
        max_size=60,
    ),
    st.lists(
        st.tuples(st.integers(0, 6), st.text(alphabet="xyz", max_size=3)),
        min_size=0,
        max_size=12,
    ),
    st.sampled_from([2, 5, 8]),
    st.sampled_from(["inner", "left"]),
)
def test_skew_join_matches_plain_join_property(spark, left, right, salt, how):
    from knot_another_pipeline_spark.operators.relational import skew_join

    ldf = spark.createDataFrame(left or [(0, 0)], "k long, v long")
    rdf = (
        spark.createDataFrame(right, "k long, name string")
        if right
        else spark.createDataFrame([], "k long, name string")
    )
    got = sorted(
        tuple(r) for r in skew_join(ldf, rdf, "k", salt=salt, how=how).collect()
    )
    want = sorted(tuple(r) for r in ldf.join(rdf, "k", how).collect())
    assert got == want


# ---------------------------------------------------------------------------
# reaggregate over any partial split ≡ direct aggregation of the rows
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),  # group
            st.integers(0, 5),  # sub-grain (the finer key being merged away)
            st.integers(-100, 100),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_reaggregate_identity_property(spark, rows):
    from pyspark.sql import functions as FF

    from knot_another_pipeline_spark.operators.relational import reaggregate

    df = spark.createDataFrame(rows, "g long, sub long, v long")
    partials = df.groupBy("g", "sub").agg(
        FF.count(FF.lit(1)).alias("n"),
        FF.sum("v").alias("s"),
        FF.min("v").alias("lo"),
        FF.max("v").alias("hi"),
    )
    merged = {
        r["g"]: (r["n"], r["s"], r["lo"], r["hi"])
        for r in reaggregate(
            partials, "g", count_cols=["n"], sum_cols=["s"],
            min_cols=["lo"], max_cols=["hi"],
        ).collect()
    }
    direct = {
        r["g"]: (r["n"], r["s"], r["lo"], r["hi"])
        for r in df.groupBy("g")
        .agg(
            FF.count(FF.lit(1)).alias("n"),
            FF.sum("v").alias("s"),
            FF.min("v").alias("lo"),
            FF.max("v").alias("hi"),
        )
        .collect()
    }
    assert merged == direct


# ---------------------------------------------------------------------------
# funnel counts are monotone non-increasing for any event soup
# ---------------------------------------------------------------------------


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),
            st.integers(0, 10_000),
            st.sampled_from(["a", "b", "c", "d"]),
        ),
        min_size=1,
        max_size=80,
    )
)
def test_funnel_monotone_property(spark, rows):
    from pyspark.sql import functions as FF

    from knot_another_pipeline_spark.operators.behavior import funnel

    ev = spark.createDataFrame(
        rows, "user_id long, ts long, event_type string"
    ).withColumn("ts", FF.timestamp_seconds("ts"))
    out = (
        funnel(ev, ["a", "b", "c"])
        .orderBy("step_index")
        .collect()
    )
    counts = [r["n_users"] for r in out]
    assert counts == sorted(counts, reverse=True)
    n_a_users = ev.filter("event_type = 'a'").select("user_id").distinct().count()
    assert counts[0] == n_a_users
