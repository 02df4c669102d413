"""Round-9 operators.

Covers the round-8 verdict items that are testable in-repo: the
corpus-level exact substring dedup with first-copy retention (VERDICT
r8 task #6) and its per-source duplication scorecard, plus the round-9
relational plan shapes.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# substring_dedup: exact substring dedup, first-copy retention


def _brute_substring_dedup(docs: dict[int, str], n: int):
    """O(corpus²) reference: global keep-first per n-gram, then merge
    consecutive removable positions into maximal spans."""
    toks = {d: [t for t in txt.lower().split() if t] for d, txt in docs.items()}
    first: dict[tuple, tuple] = {}
    for d in sorted(toks):
        tk = toks[d]
        for p in range(len(tk) - n + 1):
            g = tuple(tk[p : p + n])
            if g not in first:
                first[g] = (d, p)
    removable: dict[int, list[int]] = {}
    for d in sorted(toks):
        tk = toks[d]
        for p in range(len(tk) - n + 1):
            if first[tuple(tk[p : p + n])] != (d, p):
                removable.setdefault(d, []).append(p)
    spans = []
    for d, poss in removable.items():
        run = [poss[0]]
        for p in poss[1:]:
            # merge while the gram still overlaps/extends the open span
            if p <= run[-1] + n:
                run.append(p)
            else:
                spans.append((d, run[0], run[-1] + n - 1, len(run)))
                run = [p]
        spans.append((d, run[0], run[-1] + n - 1, len(run)))
    return {
        (d, s): (e, e - s + 1, k) for d, s, e, k in spans
    }


def test_substring_dedup_keep_first_and_merge(spark):
    """Cross-doc keep-first (smaller doc id wins), intra-doc repeats
    marked from the second occurrence, adjacent hits merged into one
    maximal span."""
    from knot_another_pipeline_spark.operators.dedup import substring_dedup

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "x a b c d e y"),
            (3, "p q r p q r p q"),
        ],
        "doc_id bigint, text string",
    )
    got = {
        (r["doc_id"], r["span_start"]): (
            r["span_end"],
            r["span_tokens"],
            r["n_grams"],
        )
        for r in substring_dedup(
            docs, id_col="doc_id", text_col="text", n=3
        ).collect()
    }
    # doc 2 repeats doc 1's "a b c d e": grams at pos 1,2,3 -> one span
    # over tokens [1..5]; doc 3 repeats its own "p q r" prefix: grams at
    # pos 3,4,5 -> span [3..7]. doc 1 owns every first copy.
    assert got == {(2, 1): (5, 5, 3), (3, 3): (7, 5, 3)}


def test_substring_dedup_matches_bruteforce(spark):
    """Randomized corpus with heavy cross-doc and intra-doc repetition
    agrees with the O(corpus²) keep-first reference."""
    from knot_another_pipeline_spark.operators.dedup import substring_dedup

    rng = random.Random(9)
    vocab = [f"w{i}" for i in range(12)]
    phrases = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 9)))
        for _ in range(6)
    ]
    docs = {}
    for d in range(14):
        parts = [
            rng.choice(phrases)
            if rng.random() < 0.55
            else " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 6)))
            for _ in range(rng.randint(1, 5))
        ]
        docs[d] = " ".join(parts)
    df = spark.createDataFrame(
        list(docs.items()), "doc_id bigint, text string"
    )
    n = 4
    got = {
        (r["doc_id"], r["span_start"]): (
            r["span_end"],
            r["span_tokens"],
            r["n_grams"],
        )
        for r in substring_dedup(
            df, id_col="doc_id", text_col="text", n=n
        ).collect()
    }
    assert got == _brute_substring_dedup(docs, n)


def test_substring_dedup_validates_n(spark):
    from knot_another_pipeline_spark.operators.dedup import substring_dedup

    docs = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="n must be >= 2"):
        substring_dedup(docs, id_col="doc_id", text_col="text", n=1)


def test_duplication_rate_composition(spark, monkeypatch, tmp_path):
    """Per-source scorecard: removed_tokens is the span-token sum of the
    source's docs; sources with no removable spans report rate 0."""
    from knot_another_pipeline_spark import catalog_queries as cq

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f", "en", "feedA", 11),
            (2, "x a b c d e y", "en", "feedA", 13),
            (3, "p q r s t u v", "en", "feedB", 13),
        ],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    )
    monkeypatch.setattr(
        cq, "load_table", lambda spark, sf_dir, name: docs
    )
    out = {
        r["source"]: (
            r["n_docs"], r["total_tokens"], r["removed_tokens"], r["dup_rate"]
        )
        for r in cq.q_duplication_rate(spark, "unused").collect()
    }
    # feedA: doc 2 has one removal span of 5 tokens ("a b c d e" owned
    # by doc 1 under the default n=5); 13 tokens total across its docs?
    # doc1=6 + doc2=7 = 13.
    assert out["feedA"] == (2, 13, 5, pytest.approx(5 / 13, abs=1e-6))
    assert out["feedB"] == (1, 7, 0, 0.0)


# ---------------------------------------------------------------------------
# round-9 relational plan shapes (TPC-H Q2 / Q11 / Q15 / Q16 / Q20)


def _dims(spark):
    supplier = spark.createDataFrame(
        [(1, "S1", 10, 5.0), (2, "S2", 10, -1.0), (3, "S3", 20, 2.0)],
        "s_suppkey bigint, s_name string, s_nationkey bigint, "
        "s_acctbal double",
    )
    nation = spark.createDataFrame(
        [(10, "N_A", 100), (20, "N_B", 200)],
        "n_nationkey bigint, n_name string, n_regionkey bigint",
    )
    region = spark.createDataFrame(
        [(100, "EUROPE"), (200, "ASIA")],
        "r_regionkey bigint, r_name string",
    )
    part = spark.createDataFrame(
        [
            (7, "blue bolt", "Brand#2", "STANDARD", 5, 1.0),
            (8, "red ring", "Brand#1", "STANDARD", 5, 1.0),
            (9, "small cog", "Brand#3", "LARGE", 9, 1.0),
        ],
        "p_partkey bigint, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    return supplier, nation, region, part


def test_min_cost_supplier_ties_and_region_scope(spark):
    """Both tied-at-min suppliers surface; out-of-region cheaper offers
    are invisible; the part filter applies."""
    from knot_another_pipeline_spark.operators.relational import (
        min_cost_supplier,
    )

    supplier, nation, region, part = _dims(spark)
    lineitem = spark.createDataFrame(
        [
            # part 7: suppliers 1 and 2 (EUROPE) tie at unit cost 2.0;
            # supplier 3 (ASIA) is cheaper but out of region
            (1, 7, 1, 10.0, 20.0),
            (2, 7, 2, 5.0, 10.0),
            (3, 7, 3, 10.0, 5.0),
            # part 9: wrong p_type, filtered out
            (4, 9, 1, 1.0, 1.0),
        ],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_quantity double, l_extendedprice double",
    )
    got = {
        (r["p_partkey"], r["s_suppkey"]): (r["unit_cost"], r["n_name"])
        for r in min_cost_supplier(
            lineitem, supplier, nation, region, part,
            region_name="EUROPE", part_type="STANDARD", max_size=15,
        ).collect()
    }
    assert got == {(7, 1): (2.0, "N_A"), (7, 2): (2.0, "N_A")}


def test_important_stock_threshold(spark):
    """Only parts above fraction x the nation total survive; other
    nations' lines never contribute."""
    from knot_another_pipeline_spark.operators.relational import (
        important_stock,
    )

    supplier, nation, _, _ = _dims(spark)
    lineitem = spark.createDataFrame(
        [
            (1, 7, 1, 1.0, 90.0),   # N_A
            (2, 8, 1, 1.0, 10.0),   # N_A
            (3, 8, 3, 1.0, 500.0),  # N_B — excluded from N_A's readout
        ],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_quantity double, l_extendedprice double",
    )
    rows = important_stock(
        lineitem, supplier, nation, nation_name="N_A", fraction=0.5
    ).collect()
    assert [(r["l_partkey"], r["value"]) for r in rows] == [(7, 90.0)]


def test_top_supplier_revenue_ties_and_window(spark):
    """Ties at the max all surface; out-of-window lines don't count."""
    from knot_another_pipeline_spark.operators.relational import (
        top_supplier_revenue,
    )

    supplier, _, _, _ = _dims(spark)
    lineitem = spark.createDataFrame(
        [
            (1, 7, 1, 1.0, 100.0, 0.0, "1996-02-01"),
            (2, 7, 2, 1.0, 100.0, 0.0, "1996-03-01"),
            (3, 7, 3, 1.0, 999.0, 0.0, "1995-12-31"),  # before window
        ],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    rows = top_supplier_revenue(
        lineitem, supplier,
        period_start="1996-01-01", period_end="1996-04-01",
    ).collect()
    assert {(r["s_suppkey"], r["total_revenue"]) for r in rows} == {
        (1, 100.0),
        (2, 100.0),
    }


def test_supplier_part_variety_excludes_and_dedups(spark):
    """Negative-balance suppliers drop out; repeat shipments of the
    same (part, supplier) count once; brand_not filters."""
    from knot_another_pipeline_spark.operators.relational import (
        supplier_part_variety,
    )

    supplier, _, _, part = _dims(spark)
    lineitem = spark.createDataFrame(
        [
            (1, 7, 1), (2, 7, 1),  # duplicate pair -> one supplier
            (3, 7, 2),             # negative balance -> excluded
            (4, 7, 3),
            (5, 8, 1),             # Brand#1 -> brand_not filters it
        ],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint",
    )
    rows = supplier_part_variety(
        lineitem, part, supplier,
        brand_not="Brand#1", sizes=(5, 9),
    ).collect()
    assert [
        (r["p_brand"], r["p_type"], r["p_size"], r["supplier_cnt"])
        for r in rows
    ] == [("Brand#2", "STANDARD", 5, 2)]


def test_dominant_part_suppliers_share(spark):
    """Share strictly above the threshold qualifies; name prefix
    prunes; share arithmetic is over the part's TOTAL."""
    from knot_another_pipeline_spark.operators.relational import (
        dominant_part_suppliers,
    )

    supplier, _, _, part = _dims(spark)
    lineitem = spark.createDataFrame(
        [
            (1, 7, 1, 60.0), (2, 7, 2, 25.0), (3, 7, 3, 15.0),
            (4, 9, 1, 100.0),  # 'small cog' -> prefix 'b' prunes it
        ],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_quantity double",
    )
    rows = dominant_part_suppliers(
        lineitem, supplier, part, name_prefix="b", share=0.5
    ).collect()
    assert [
        (r["p_partkey"], r["s_suppkey"], r["qty_share"]) for r in rows
    ] == [(7, 1, 0.6)]


# ---------------------------------------------------------------------------
# window_funnel / average_precision / split_contamination


def _brute_window_funnel(events, steps, T):
    """Exhaustive chain search: level = max l such that a chain
    t1<=...<=tl<=t1+T exists with step types in order."""
    import itertools

    by_user = {}
    for u, typ, t in events:
        if typ in steps:
            by_user.setdefault(u, []).append((t, steps.index(typ) + 1))
    out = {}
    for u, evs in by_user.items():
        best = 0
        for l in range(len(steps), 0, -1):
            pools = [
                [t for t, s in evs if s == step] for step in range(1, l + 1)
            ]
            if any(not p for p in pools):
                continue
            found = False
            for chain in itertools.product(*pools):
                if all(
                    chain[i] <= chain[i + 1] for i in range(len(chain) - 1)
                ) and chain[-1] <= chain[0] + T:
                    found = True
                    break
            if found:
                best = l
                break
        out[u] = best
    return out


def test_window_funnel_matches_bruteforce(spark):
    """The single-pass max-start DP equals the exhaustive chain search
    on random event streams with repeats, ties, and stale completions."""
    from knot_another_pipeline_spark.operators.behavior import window_funnel

    rng = random.Random(17)
    steps = ["s1", "s2", "s3"]
    events = []
    for u in range(40):
        for _ in range(rng.randint(1, 12)):
            events.append(
                (u, rng.choice(steps + ["noise"]), rng.randint(0, 50))
            )
    rows = [(u, t, sec) for (u, t, sec) in events]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_type string, off bigint"
    ).select(
        "user_id",
        "event_type",
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("off").cast("double"))).alias("ts"),
    )
    T = 10
    got = {
        r["user_id"]: r["funnel_level"]
        for r in window_funnel(
            df, steps, user_col="user_id", window_seconds=T
        ).collect()
    }
    want = _brute_window_funnel(events, steps, T)
    assert got == want


def test_window_funnel_stale_completion_excluded(spark):
    """A purchase outside the window of the chain start doesn't count,
    but a LATER signup can restart the window."""
    from knot_another_pipeline_spark.operators.behavior import window_funnel

    rows = [
        # user 1: signup@0, view@5, purchase@100 -> level 2 (purchase
        # falls outside signup+10)
        (1, "s1", 0), (1, "s2", 5), (1, "s3", 100),
        # user 2: same but a second signup@95 restarts: s1@95, s2@96,
        # s3@100 -> level 3
        (2, "s1", 0), (2, "s2", 5), (2, "s1", 95), (2, "s2", 96),
        (2, "s3", 100),
        # user 3: steps out of order -> level 1
        (3, "s3", 0), (3, "s2", 1), (3, "s1", 2),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_type string, off bigint"
    ).select(
        "user_id",
        "event_type",
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("off").cast("double"))).alias("ts"),
    )
    got = {
        r["user_id"]: r["funnel_level"]
        for r in window_funnel(
            df, ["s1", "s2", "s3"], window_seconds=10
        ).collect()
    }
    assert got == {1: 2, 2: 3, 3: 1}


def test_average_precision_matches_bruteforce(spark):
    """AP equals the rank-walk definition under the (score desc, id asc)
    total order; a no-positive group reports NULL."""
    from knot_another_pipeline_spark.operators.evaluation import (
        average_precision,
    )

    rng = random.Random(23)
    rows = []
    for g in ("a", "b"):
        for i in range(30):
            rows.append(
                (g, i, round(rng.choice([0.1, 0.5, 0.5, 0.9]), 3),
                 rng.randint(0, 1))
            )
    rows += [("empty", i, 0.5, 0) for i in range(5)]  # no positives
    df = spark.createDataFrame(
        rows, "g string, id bigint, s double, y int"
    )
    got = {
        r["g"]: (r["n"], r["n_pos"], r["avg_precision"])
        for r in average_precision(
            df, group_cols=["g"], score_col="s", label_col="y", id_col="id"
        ).collect()
    }
    for g in ("a", "b"):
        ranked = sorted(
            [r for r in rows if r[0] == g], key=lambda r: (-r[2], r[1])
        )
        tp, ap_sum, npos = 0, 0.0, sum(r[3] for r in ranked)
        for k, r in enumerate(ranked, start=1):
            if r[3] == 1:
                tp += 1
                ap_sum += tp / k
        assert got[g] == (
            len(ranked), npos, pytest.approx(ap_sum / npos, abs=1e-6)
        )
    assert got["empty"] == (5, 0, None)


def test_split_contamination_canonical_cells(spark):
    """Pair orientation doesn't split cells; off-diagonal cells count
    cross-split leaks."""
    from knot_another_pipeline_spark.operators.dedup import (
        split_contamination,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (7, 8)], "id_a bigint, id_b bigint"
    )
    splits = spark.createDataFrame(
        [
            (1, "train"), (2, "test"),   # cross
            (3, "test"), (4, "train"),   # cross, other orientation
            (5, "train"), (6, "train"),  # within
            (7, "val"), (8, "test"),
        ],
        "doc_id bigint, split string",
    )
    got = {
        (r["split_a"], r["split_b"]): r["n_pairs"]
        for r in split_contamination(pairs, splits).collect()
    }
    assert got == {
        ("test", "train"): 2,
        ("train", "train"): 1,
        ("test", "val"): 1,
    }


# ---------------------------------------------------------------------------
# streaming window funnel: batch parity + replay/reorder invariance


def _run_funnel_stream(spark, src, schema):
    from knot_another_pipeline_spark.streaming.rollup_stream import (
        streaming_window_funnel,
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = streaming_window_funnel(
        stream,
        ["s1", "s2", "s3"],
        user_col="user_id",
        type_col="event_type",
        ts_col="ts",
        window_seconds=10,
        watermark="1 minute",
    )
    name = f"wf_test_{abs(hash(str(src))) % 10**8}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    return {
        (r["uid"], r["funnel_level"]): str(r["reached_ts"])
        for r in spark.sql(f"SELECT * FROM {name} WHERE uid != 'z'").collect()
    }


def _write_epoch(spark, src, rows, mtime):
    """Append one micro-batch worth of part files into ``src`` and pin
    their mtime so maxFilesPerTrigger replays epochs in order (the
    round-8 monitor-test pattern)."""
    import os

    df = spark.createDataFrame(
        rows, "user_id string, event_type string, off bigint"
    ).select(
        "user_id",
        "event_type",
        (
            F.lit("2025-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=F.col("off").cast("double"))
        ).alias("ts"),
    )
    before = (
        {f for f in os.listdir(src) if f.endswith(".parquet")}
        if src.exists()
        else set()
    )
    df.coalesce(1).write.mode("append").parquet(str(src))
    for f in os.listdir(src):
        if f.endswith(".parquet") and f not in before:
            os.utime(src / f, (mtime, mtime))


def test_streaming_window_funnel_matches_batch(spark, tmp_path):
    """The append-mode level trace's max per user equals the batch
    window_funnel level for every user reaching step 1."""
    import time

    from knot_another_pipeline_spark.operators.behavior import window_funnel

    rows = [
        ("a", "s1", 0), ("a", "s2", 5), ("a", "s3", 8),     # level 3
        ("b", "s1", 0), ("b", "s2", 5), ("b", "s3", 100),   # level 2
        ("c", "s2", 0), ("c", "s3", 1),                     # level 0
        ("d", "s1", 0), ("d", "s1", 50), ("d", "s2", 55),   # restart, 2
    ]
    src = tmp_path / "wf_in"
    src.mkdir()
    base = time.time() - 500
    _write_epoch(spark, src, rows, base)
    _write_epoch(spark, src, [("z", "s1", 86_400 * 2)], base + 100)
    _write_epoch(spark, src, [("z", "s1", 86_400 * 3)], base + 200)

    schema = "user_id string, event_type string, ts timestamp"
    got = _run_funnel_stream(spark, src, schema)
    levels = {}
    for (uid, lvl), _ts in got.items():
        levels[uid] = max(levels.get(uid, 0), lvl)
    batch_df = spark.read.parquet(str(src)).filter(F.col("user_id") != "z")
    want = {
        r["user_id"]: r["funnel_level"]
        for r in window_funnel(
            batch_df, ["s1", "s2", "s3"], user_col="user_id",
            window_seconds=10,
        ).collect()
        if r["funnel_level"] >= 1
    }
    assert levels == want
    # the level trace is complete: reaching 3 also emitted 1 and 2
    assert ("a", 1) in got and ("a", 2) in got and ("a", 3) in got
    # level-0 user c emits nothing
    assert not any(uid == "c" for uid, _ in got)


def test_streaming_window_funnel_reorder_and_replay_invariant(
    spark, tmp_path
):
    """Out-of-order arrival within the watermark and at-least-once
    duplicates produce the SAME emission set as in-order delivery —
    the DP folds in event-time order from the pending buffer and max()
    makes duplicates idempotent."""
    import time

    in_order = [
        ("a", "s1", 0), ("a", "s2", 5), ("a", "s3", 8),
        ("b", "s1", 0), ("b", "s2", 20),
    ]
    shuffled_epochs = [
        # epoch 1: later events arrive FIRST (within watermark)
        [("a", "s3", 8), ("b", "s2", 20)],
        # epoch 2: the earlier events land, plus a replay DUPLICATE
        [("a", "s1", 0), ("a", "s2", 5), ("a", "s3", 8), ("b", "s1", 0)],
    ]
    schema = "user_id string, event_type string, ts timestamp"

    src1 = tmp_path / "wf_ord"
    src1.mkdir()
    base = time.time() - 600
    _write_epoch(spark, src1, in_order, base)
    _write_epoch(spark, src1, [("z", "s1", 86_400 * 2)], base + 100)
    _write_epoch(spark, src1, [("z", "s1", 86_400 * 3)], base + 200)
    ordered = _run_funnel_stream(spark, src1, schema)

    src2 = tmp_path / "wf_shuf"
    src2.mkdir()
    for i, rows in enumerate(shuffled_epochs):
        _write_epoch(spark, src2, rows, base + 50 * i)
    _write_epoch(spark, src2, [("z", "s1", 86_400 * 2)], base + 300)
    _write_epoch(spark, src2, [("z", "s1", 86_400 * 3)], base + 400)
    shuffled = _run_funnel_stream(spark, src2, schema)

    assert ordered == shuffled
    assert ("a", 3) in ordered
    # b's s2 sits at +20s, outside the 10s window of its s1 — level 1
    assert ("b", 1) in ordered and ("b", 2) not in ordered


def test_remove_spans_executes_the_dedup(spark):
    """Cleaned corpus keeps first copies verbatim (normalized), cuts
    later copies, yields an empty string (not a missing row) for
    fully-removed and empty docs."""
    from knot_another_pipeline_spark.operators.dedup import (
        remove_spans,
        substring_dedup,
    )

    docs = spark.createDataFrame(
        [
            (1, "A b c d e f"),
            (2, "x a b c d e y"),
            (3, "a b c d e"),   # exact duplicate of doc 1's span: fully cut
            (4, ""),
        ],
        "doc_id bigint, text string",
    )
    spans = substring_dedup(docs, id_col="doc_id", text_col="text", n=3)
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in remove_spans(docs, spans).collect()
    }
    assert got[1] == ("a b c d e f", 6, 0)   # first copy, normalized
    assert got[2] == ("x y", 2, 5)
    assert got[3] == ("", 0, 5)
    assert got[4] == ("", 0, 0)


def test_round9_tpch_shapes_match_bruteforce(spark):
    """Randomized lineitem/dimension data: each decorrelated round-9
    shape equals a pure-Python replay of its textbook correlated
    formulation."""
    rng = random.Random(31)
    suppliers = [
        (s, f"S{s}", rng.randint(0, 3), round(rng.uniform(-5, 10), 2))
        for s in range(1, 13)
    ]
    nations = [(n, f"N{n}", n % 2) for n in range(4)]
    regions = [(0, "EUROPE"), (1, "ASIA")]
    parts = [
        (
            p,
            rng.choice(["blue bolt", "red ring", "big cog"]) + f" {p}",
            f"Brand#{rng.randint(1, 3)}",
            rng.choice(["STANDARD", "LARGE"]),
            rng.choice([5, 9, 20]),
            1.0,
        )
        for p in range(1, 9)
    ]
    lines = [
        (
            i,
            rng.randint(1, 8),
            rng.randint(1, 12),
            float(rng.randint(1, 10)),
            round(rng.uniform(10, 500), 2),
            round(rng.choice([0.0, 0.1]), 2),
            f"1996-0{rng.randint(1, 4)}-15",
        )
        for i in range(1, 160)
    ]
    supplier = spark.createDataFrame(
        suppliers,
        "s_suppkey bigint, s_name string, s_nationkey bigint, "
        "s_acctbal double",
    )
    nation = spark.createDataFrame(
        nations, "n_nationkey bigint, n_name string, n_regionkey bigint"
    )
    region = spark.createDataFrame(
        regions, "r_regionkey bigint, r_name string"
    )
    part = spark.createDataFrame(
        parts,
        "p_partkey bigint, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    lineitem = spark.createDataFrame(
        lines,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))

    nat = {s: n for s, _n, n, _b in suppliers}
    reg = {n: r for n, _s, r in nations}
    pinfo = {p[0]: p for p in parts}

    from knot_another_pipeline_spark.operators import relational as R

    # Q2: min unit cost per STANDARD size<=15 part among EUROPE suppliers
    cost = {}
    for _o, pk, sk, q, ep, _d, _sd in lines:
        if reg[nat[sk]] == 0 and q > 0:
            key = (pk, sk)
            cost[key] = min(cost.get(key, float("inf")), ep / q)
    want_q2 = {}
    for (pk, sk), c in cost.items():
        if pinfo[pk][3] != "STANDARD" or pinfo[pk][4] > 15:
            continue
        mn = min(v for (pk2, _s), v in cost.items() if pk2 == pk)
        if c == mn:
            want_q2[(pk, sk)] = c
    got_q2 = {
        (r["p_partkey"], r["s_suppkey"]): r["unit_cost"]
        for r in R.min_cost_supplier(
            lineitem, supplier, nation, region, part,
            region_name="EUROPE", part_type="STANDARD", max_size=15,
        ).collect()
    }
    assert set(got_q2) == set(want_q2)
    for k, v in want_q2.items():  # rounding modes differ: compare approx
        assert got_q2[k] == pytest.approx(v, abs=1e-4)

    # Q11: per-part value from N1 suppliers above 10% of the N1 total
    val = {}
    for _o, pk, sk, _q, ep, _d, _sd in lines:
        if nat[sk] == 1:
            val[pk] = val.get(pk, 0.0) + ep
    total = sum(val.values())
    want_q11 = {pk: v for pk, v in val.items() if v > 0.1 * total}
    got_q11 = {
        r["l_partkey"]: r["value"]
        for r in R.important_stock(
            lineitem, supplier, nation, nation_name="N1", fraction=0.1
        ).collect()
    }
    assert set(got_q11) == set(want_q11)
    for k, v in want_q11.items():
        assert got_q11[k] == pytest.approx(v, abs=1e-2)

    # Q15: max-revenue suppliers in Feb-Mar 1996 (ties all surface)
    rev = {}
    for _o, _pk, sk, _q, ep, d, sd in lines:
        if "1996-02-15" <= sd <= "1996-03-15":
            rev[sk] = rev.get(sk, 0.0) + ep * (1 - d)
    mx = max(rev.values())
    want_q15 = {sk: v for sk, v in rev.items() if abs(v - mx) < 1e-9}
    got_q15 = {
        r["s_suppkey"]: r["total_revenue"]
        for r in R.top_supplier_revenue(
            lineitem, supplier,
            period_start="1996-02-01", period_end="1996-04-01",
        ).collect()
    }
    assert set(got_q15) == set(want_q15)
    for k, v in want_q15.items():
        assert got_q15[k] == pytest.approx(v, abs=1e-2)

    # Q16: distinct non-negative-balance suppliers per (brand,type,size),
    # brand != Brand#1, sizes in (5, 9)
    bad = {s for s, _n, _nk, b in suppliers if b < 0}
    combos = {}
    for _o, pk, sk, _q, _ep, _d, _sd in lines:
        p = pinfo[pk]
        if p[2] == "Brand#1" or p[4] not in (5, 9) or sk in bad:
            continue
        combos.setdefault((p[2], p[3], p[4]), set()).add(sk)
    want_q16 = {(b, t, s, len(v)) for (b, t, s), v in combos.items()}
    got_q16 = {
        (r["p_brand"], r["p_type"], r["p_size"], r["supplier_cnt"])
        for r in R.supplier_part_variety(
            lineitem, part, supplier, brand_not="Brand#1", sizes=(5, 9)
        ).collect()
    }
    assert got_q16 == want_q16

    # Q20: suppliers shipping > 40% of a 'b...' part's total quantity
    ps, tot = {}, {}
    for _o, pk, sk, q, _ep, _d, _sd in lines:
        if pinfo[pk][1].startswith("b"):
            ps[(pk, sk)] = ps.get((pk, sk), 0.0) + q
            tot[pk] = tot.get(pk, 0.0) + q
    want_q20 = {
        (pk, sk): q / tot[pk]
        for (pk, sk), q in ps.items()
        if q > 0.4 * tot[pk]
    }
    got_q20 = {
        (r["p_partkey"], r["s_suppkey"]): r["qty_share"]
        for r in R.dominant_part_suppliers(
            lineitem, supplier, part, name_prefix="b", share=0.4
        ).collect()
    }
    assert set(got_q20) == set(want_q20)
    for k, v in want_q20.items():
        assert got_q20[k] == pytest.approx(v, abs=1e-6)


def test_round9b_tpch_shapes_match_bruteforce(spark):
    """Randomized star-schema data: the Q3/Q7/Q8/Q9 staged plans equal
    pure-Python replays of the textbook flat formulations."""
    rng = random.Random(47)
    nations = [(n, f"N{n}", n % 2) for n in range(4)]
    regions = [(0, "EUROPE"), (1, "ASIA")]
    suppliers = [
        (s, f"S{s}", rng.randint(0, 3), 0.0) for s in range(1, 9)
    ]
    customers = [
        (c, f"C{c}", rng.randint(0, 3), 0.0,
         rng.choice(["BUILDING", "AUTO"]))
        for c in range(1, 13)
    ]
    parts = [
        (p, rng.choice(["red ring", "blue bolt"]) + f" {p}", "Brand#1",
         rng.choice(["STANDARD", "LARGE"]), 5,
         round(rng.uniform(5, 50), 2))
        for p in range(1, 9)
    ]
    orders = [
        (o, rng.randint(1, 12), "F", 0.0,
         f"199{rng.randint(5, 8)}-0{rng.randint(1, 9)}-10", "1-URGENT")
        for o in range(1, 41)
    ]
    lines = [
        (rng.randint(1, 40), rng.randint(1, 8), rng.randint(1, 8),
         float(rng.randint(1, 10)), round(rng.uniform(10, 500), 2),
         rng.choice([0.0, 0.1]),
         f"199{rng.randint(5, 8)}-0{rng.randint(1, 9)}-20")
        for _ in range(200)
    ]

    nation = spark.createDataFrame(
        nations, "n_nationkey bigint, n_name string, n_regionkey bigint"
    )
    region = spark.createDataFrame(
        regions, "r_regionkey bigint, r_name string"
    )
    supplier = spark.createDataFrame(
        suppliers,
        "s_suppkey bigint, s_name string, s_nationkey bigint, "
        "s_acctbal double",
    )
    customer = spark.createDataFrame(
        customers,
        "c_custkey bigint, c_name string, c_nationkey bigint, "
        "c_acctbal double, c_mktsegment string",
    )
    part = spark.createDataFrame(
        parts,
        "p_partkey bigint, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    orders_df = spark.createDataFrame(
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    lineitem = spark.createDataFrame(
        lines,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))

    snat = {s: f"N{n}" for s, _x, n, _b in suppliers}
    cnat = {c: f"N{n}" for c, _x, n, _b, _m in customers}
    creg = {c: n % 2 for c, _x, n, _b, _m in customers}
    cseg = {c: m for c, _x, _n, _b, m in customers}
    odate = {o: d for o, _c, _s, _t, d, _p in orders}
    ocust = {o: c for o, c, _s, _t, _d, _p in orders}
    pinfo = {p[0]: p for p in parts}

    from knot_another_pipeline_spark.operators import relational as R

    # Q3: top open-revenue BUILDING orders around a mid-window cutoff
    cut = "1997-01-01"
    q3 = {}
    for o, pk, sk, q, ep, d, sd in lines:
        if (
            cseg[ocust[o]] == "BUILDING"
            and odate[o] < cut
            and sd > cut
        ):
            q3[o] = q3.get(o, 0.0) + ep * (1 - d)
    want_q3 = sorted(
        ((round(v, 2), odate[o], o) for o, v in q3.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:5]
    got = R.shipping_priority(
        customer, orders_df, lineitem, segment="BUILDING",
        cutoff=cut, k=5,
    ).collect()
    assert [
        (r["revenue"], r["o_orderdate"].strftime("%Y-%m-%d"), r["l_orderkey"])
        for r in got
    ] == [(v, d, o) for v, d, o in want_q3]
    assert all(r["o_orderpriority"] == "1-URGENT" for r in got)

    # Q7: N0<->N1 trade volume by direction and ship year
    q7 = {}
    for o, pk, sk, q, ep, d, sd in lines:
        sn, cn = snat[sk], cnat[ocust[o]]
        if {sn, cn} == {"N0", "N1"} and "1996-01-01" <= sd <= "1997-12-31":
            key = (sn, cn, int(sd[:4]))
            q7[key] = q7.get(key, 0.0) + ep * (1 - d)
    got_q7 = {
        (r["supp_nation"], r["cust_nation"], r["l_year"]): r["revenue"]
        for r in R.nation_trade_volume(
            lineitem, orders_df, customer, supplier, nation,
            nation_a="N0", nation_b="N1",
            start="1996-01-01", end="1997-12-31",
        ).collect()
    }
    assert set(got_q7) == set(q7)
    for k, v in q7.items():
        assert got_q7[k] == pytest.approx(v, abs=1e-2)

    # Q8: N2's share of STANDARD-part revenue sold into region 0
    num, den = {}, {}
    for o, pk, sk, q, ep, d, sd in lines:
        if (
            pinfo[pk][3] == "STANDARD"
            and creg[ocust[o]] == 0
            and "1996-01-01" <= odate[o] <= "1997-12-31"
        ):
            y = int(odate[o][:4])
            v = ep * (1 - d)
            den[y] = den.get(y, 0.0) + v
            if snat[sk] == "N2":
                num[y] = num.get(y, 0.0) + v
    want_q8 = {y: num.get(y, 0.0) / den[y] for y in den}
    got_q8 = {
        r["o_year"]: r["mkt_share"]
        for r in R.market_share(
            lineitem, orders_df, customer, supplier, nation, region, part,
            region_name="EUROPE", supp_nation="N2", part_type="STANDARD",
            start="1996-01-01", end="1997-12-31",
        ).collect()
    }
    assert set(got_q8) == set(want_q8)
    for k, v in want_q8.items():
        assert got_q8[k] == pytest.approx(v, abs=1e-6)

    # Q9: profit on 'red' parts per supplier nation and order year
    q9 = {}
    for o, pk, sk, q, ep, d, sd in lines:
        if "red" in pinfo[pk][1]:
            key = (snat[sk], int(odate[o][:4]))
            amount = ep * (1 - d) - 0.6 * pinfo[pk][5] * q
            q9[key] = q9.get(key, 0.0) + amount
    got_q9rows = R.product_profit(
        lineitem, orders_df, supplier, nation, part,
        name_token="red", cost_factor=0.6,
    ).collect()
    got_q9 = {(r["nation"], r["o_year"]): r["sum_profit"] for r in got_q9rows}
    assert set(got_q9) == set(q9)
    for k, v in q9.items():
        assert got_q9[k] == pytest.approx(v, abs=1e-2)
    # ordering contract: nation asc, year desc
    keys = [(r["nation"], r["o_year"]) for r in got_q9rows]
    assert keys == sorted(keys, key=lambda t: (t[0], -t[1]))


def test_shipping_priority_plan_shape(spark, tmp_path):
    """Q3's aggregate must reuse the orderkey join partitioning (no
    second exchange between the join and the group-by), the top-k must
    plan as TakeOrderedAndProject, and both date filters must reach
    the parquet scans."""
    from knot_another_pipeline_spark.operators.relational import (
        shipping_priority,
    )

    base = str(tmp_path)
    spark.createDataFrame(
        [(1, "BUILDING"), (2, "AUTO")], "c_custkey bigint, c_mktsegment string"
    ).write.parquet(base + "/customer")
    spark.createDataFrame(
        [(10, 1, "1996-06-01", "1-URGENT")],
        "o_orderkey bigint, o_custkey bigint, o_orderdate string, "
        "o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate")).write.parquet(
        base + "/orders"
    )
    spark.createDataFrame(
        [(10, 100.0, 0.0, "1997-06-01")],
        "l_orderkey bigint, l_extendedprice double, l_discount double, "
        "l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate")).write.parquet(
        base + "/lineitem"
    )
    df = shipping_priority(
        spark.read.parquet(base + "/customer"),
        spark.read.parquet(base + "/orders"),
        spark.read.parquet(base + "/lineitem"),
        cutoff="1997-01-01",
        k=10,
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
    )
    import re

    assert "TakeOrderedAndProject" in plan
    # exactly ONE shuffle exchange: the orderkey join; the aggregate
    # reuses HashPartitioning(l_orderkey) and the top-k never sorts
    # globally
    assert len(re.findall(r"(?<![A-Za-z])Exchange ", plan)) - len(
        re.findall(r"(?<![A-Za-z])Exchange SinglePartition", plan)
    ) == 1
    assert plan.count("GreaterThan(l_shipdate") >= 1
    assert plan.count("LessThan(o_orderdate") >= 1


def test_round9b_tpch_plan_claims(spark):
    """Pin the plan CLAIMS of the Q7/Q8/Q9 shapes: each scans lineitem
    exactly once (the one-fact-pass claim), the dimension filters reach
    their parquet scans as PushedFilters, and nothing plans an Expand
    or a second fact pass."""
    import re

    from knot_another_pipeline_spark.catalog_queries import QUERIES
    from tests.conftest import SF_SMOKE

    def plans(name):
        df = QUERIES[name](spark, SF_SMOKE)
        qe = df._jdf.queryExecution()
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
        return (
            qe.explainString(mode.fromString("simple")),
            qe.explainString(mode.fromString("formatted")),
        )

    def lineitem_scans(simple_plan):
        return len(
            re.findall(r"FileScan parquet[^\n]*lineitem", simple_plan)
        )

    p7s, p7f = plans("nation_trade_volume")
    assert lineitem_scans(p7s) == 1, p7s
    # the two-nation restriction reaches the nation scans as a pushed
    # IN filter, and the ship-date window reaches the lineitem scan
    assert "In(n_name, [NATION_1,NATION_2])" in p7f, p7f
    assert "GreaterThanOrEqual(l_shipdate" in p7f, p7f

    p8s, p8f = plans("market_share")
    assert lineitem_scans(p8s) == 1, p8s
    # numerator + denominator in ONE aggregate: a single partial_sum
    # aggregate node carries both sums, and no second fact pass exists
    assert "Expand" not in p8s, p8s
    assert "EqualTo(p_type,ECONOMY)" in p8f, p8f
    assert "GreaterThanOrEqual(o_orderdate" in p8f, p8f
    assert len(re.findall(r"partial_sum", p8s)) == 2, (
        "Q8 must compute numerator and denominator in one aggregate "
        "pass (two partial_sum expressions in one HashAggregate)"
    )
    assert p8s.count("HashAggregate") == 2, p8s  # partial + final

    p9s, p9f = plans("product_profit")
    assert lineitem_scans(p9s) == 1, p9s
    assert "StringContains(p_name,red)" in p9f, p9f
