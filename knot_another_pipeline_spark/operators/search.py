"""Lexical search over document tables: TF-IDF keyword ranking.

The retrieval counterpart to the embedding-based ``similarity`` module:
exact term matching with inverse-document-frequency weighting — the
baseline every corpus-exploration tool ships, and the lexical half of a
hybrid (BM25 + vector) retrieval stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from knot_another_pipeline_spark.operators.text_analysis import _tokens


def keyword_search(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str,
    query: str,
    k: int = 10,
) -> DataFrame:
    """Top-k documents for a keyword query, scored by
    ``Σ tf(term, doc) · ln(1 + N/df(term))`` over the query's terms.

    Scale shape: the query-term filter is applied to the exploded token
    stream *before* any aggregation, so only postings for the handful of
    query terms ever reach a shuffle — the full inverted index is never
    materialized. Document frequencies are computed from those same
    surviving postings (a per-query-term table, broadcast back), the
    corpus size comes from a 1-row aggregate cross-joined in, and the
    final top-k compiles to TakeOrdered (per-partition heads, no global
    sort). Ties break by id for determinism.
    Output: id, score (rounded 6), ordered best-first, ≤ k rows.
    """
    qtokens = sorted(
        {t for t in query.strip().lower().split() if t}
    )
    if not qtokens:
        raise ValueError("query must contain at least one token")
    postings = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(_tokens(F.col(text_col))).alias("token"),
        )
        .filter(F.col("token").isin(qtokens))
        .groupBy("id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = postings.groupBy("token").agg(
        F.countDistinct("id").alias("df")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        postings.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "w",
            F.col("tf")
            * F.log(
                F.lit(1.0)
                + F.col("n_docs").cast("double") / F.col("df").cast("double")
            ),
        )
        .groupBy("id")
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("id").asc()).limit(k)


def bm25_search(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a keyword query under Okapi BM25 — the
    production-standard lexical ranker (Robertson/Walker), and the
    lexical half of a hybrid retrieval stack next to the ANN operators.

    Per query term ``t`` with document frequency ``df`` in a corpus of
    ``N`` docs of average token length ``avgdl``::

        idf(t)        = ln(1 + (N - df + 0.5) / (df + 0.5))
        score(d)      = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

    Scale shape mirrors :func:`keyword_search`: the token stream is
    filtered to the query's terms *before* any shuffle (only those
    postings aggregate), per-document length ``dl`` is computed
    row-locally in the scan (``size(tokens)``, no second pass), corpus
    stats (``N``, ``avgdl``) are a broadcast 1-row aggregate, document
    frequencies a broadcast per-term table, and the top-k compiles to
    TakeOrdered. Ties break by id. Output: id, score (rounded 6),
    best-first, ≤ k rows.
    """
    qtokens = sorted({t for t in query.strip().lower().split() if t})
    if not qtokens:
        raise ValueError("query must contain at least one token")
    base = docs.select(
        F.col(id_col).alias("id"),
        _tokens(F.col(text_col)).alias("toks"),
    )
    postings = (
        base.select(
            "id",
            F.size("toks").cast("double").alias("dl"),
            F.explode("toks").alias("token"),
        )
        .filter(F.col("token").isin(qtokens))
        .groupBy("id", "dl", "token")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = postings.groupBy("token").agg(F.countDistinct("id").alias("df"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size("toks")).alias("avgdl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    scored = (
        postings.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "w",
            idf * F.col("tf") * F.lit(k1 + 1.0) / (F.col("tf") + norm),
        )
        .groupBy("id")
        .agg(F.round(F.sum("w"), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("id").asc()).limit(k)
