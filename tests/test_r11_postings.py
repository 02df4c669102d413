"""Round-11 optimization internals: posting-list pair enumeration,
the row-local simhash fold, and the MMR literal-penalty path.

These pin the SEMANTICS the rewrites must preserve — the multiset
equivalence with the self-join formulation they replaced, the
null/empty edge cases, and the literal-vs-broadcast MMR parity —
independently of the catalog oracle differential (which covers the
end-to-end values at the declared parameters only).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knot_another_pipeline_spark.functions.postings import (
    sorted_pairs_from_postings,
)


def _pairs(spark, rows, keep=()):
    df = spark.createDataFrame(rows, "key string, ids array<bigint>")
    out = sorted_pairs_from_postings(
        df, items_col="ids", a_col="u", b_col="v", keep_cols=keep
    )
    cols = list(keep) + ["u", "v"]
    return sorted(tuple(r[c] for c in cols) for r in out.collect())


def test_postings_basic_ordered_pairs(spark):
    assert _pairs(spark, [("k", [3, 1, 2])]) == [(1, 2), (1, 3), (2, 3)]


def test_postings_multiset_matches_self_join(spark):
    # duplicates yield d_a*d_b pairs, equal ids never pair — exactly
    # the `a JOIN b ON key AND a.id < b.id` multiset
    rows = [("k", [5, 5, 7]), ("m", [9])]
    assert _pairs(spark, rows) == [(5, 7), (5, 7)]


def test_postings_empty_and_single_lists_emit_nothing(spark):
    assert _pairs(spark, [("k", []), ("m", [4])]) == []


def test_postings_keep_cols_ride_through(spark):
    got = _pairs(spark, [("k", [2, 1])], keep=("key",))
    assert got == [("k", 1, 2)]


def test_postings_self_join_equivalence_random(spark):
    import random

    rng = random.Random(11)
    rows = [
        (f"k{i}", [rng.randrange(20) for _ in range(rng.randrange(6))])
        for i in range(40)
    ]
    flat = spark.createDataFrame(
        [(k, v) for k, ids in rows for v in ids], "key string, id bigint"
    )
    joined = sorted(
        (r["u"], r["v"])
        for r in flat.alias("a")
        .join(
            flat.alias("b"),
            (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("u"), F.col("b.id").alias("v"))
        .collect()
    )
    assert _pairs(spark, rows) == joined


def test_simhash_drops_null_text_rows(spark):
    from knot_another_pipeline_spark.operators.dedup import simhash

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, None), (3, "")],
        "doc_id bigint, text string",
    )
    out = {r["id"]: r["simhash"] for r in
           simhash(docs, id_col="doc_id", text_col="text").collect()}
    # null text: no row (the historical explode dropped it);
    # empty text: split yields [''] -> one hashed token -> a row
    assert set(out) == {1, 3}
    assert all(isinstance(v, int) for v in out.values())


def test_mmr_literal_and_broadcast_paths_agree(spark, monkeypatch):
    import knot_another_pipeline_spark.operators.similarity as S

    rows = [
        (i, float(10 - i), [float((i * 7 + j * 3) % 5 - 2) for j in range(8)])
        for i in range(1, 30)
    ]
    df = spark.createDataFrame(rows, "id bigint, rel double, v array<double>")

    def run():
        out = S.mmr_select(
            df, id_col="id", vec_col="v", rel_col="rel", k=4, lam=0.7
        )
        return [tuple(r) for r in out.collect()]

    lit = run()
    monkeypatch.setattr(S, "_MMR_LIT_BUDGET", 0)  # force broadcast path
    assert run() == lit
