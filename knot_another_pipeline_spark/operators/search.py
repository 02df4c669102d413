"""Lexical search over document tables: TF-IDF keyword ranking.

The retrieval counterpart to the embedding-based ``similarity`` module:
exact term matching with inverse-document-frequency weighting — the
baseline every corpus-exploration tool ships, and the lexical half of a
hybrid (BM25 + vector) retrieval stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

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


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    *,
    id_col: str,
    text_col: str,
    query: str,
    query_vec_id: int,
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    k_each: int = 50,
    rrf_k: int = 60,
) -> DataFrame:
    """Hybrid retrieval: fuse the BM25 lexical ranking with the exact
    cosine vector ranking via RECIPROCAL RANK FUSION —
    ``rrf(d) = Σ_systems 1/(rrf_k + rank_system(d))`` (Cormack/Clarke/
    Buettcher, SIGIR'09) — the standard production shape for
    "keyword + embedding" search (lexical precision + semantic recall)
    that needs NO score calibration between the two systems: only
    ranks fuse, never raw scores on incomparable scales.

    Scale shape: each leg is its own already-scale-correct operator
    (:func:`bm25_search`: query-term postings only;
    :func:`~knot_another_pipeline_spark.operators.similarity.cosine_topk`:
    broadcast query × corpus scan) truncated to ``k_each`` rows — the
    fusion itself (rank windows + full outer join + TakeOrdered) runs
    on two ≤ ``k_each``-row tables, bounded by the parameter, never by
    the corpus. A document found by only one system still scores (its
    missing rank simply contributes nothing).

    Output: id, lex_rank, vec_rank (NULL when absent), rrf_score
    (rounded 6), best-first, ≤ k rows.
    """
    from knot_another_pipeline_spark.operators.similarity import cosine_topk

    if k_each < 1 or k < 1:
        raise ValueError("k and k_each must be >= 1")
    lex = bm25_search(
        docs, id_col=id_col, text_col=text_col, query=query, k=k_each
    )
    w_lex = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    lex_ranked = lex.select(
        "id", F.row_number().over(w_lex).alias("lex_rank")
    )
    vec = cosine_topk(
        embeddings.filter(F.col(vec_id_col) == query_vec_id),
        embeddings,
        id_col=vec_id_col,
        vec_col=vec_col,
        k=k_each,
        fan_out=True,  # r12: −20% on hybrid_search (guide §2.5)
    ).select(F.col("neighbor_id").alias("id"), F.col("rank").alias("vec_rank"))
    fused = (
        lex_ranked.join(vec, "id", "full_outer")
        .withColumn(
            "rrf_score",
            F.round(
                F.coalesce(
                    1.0 / (F.lit(rrf_k) + F.col("lex_rank")), F.lit(0.0)
                )
                + F.coalesce(
                    1.0 / (F.lit(rrf_k) + F.col("vec_rank")), F.lit(0.0)
                ),
                6,
            ),
        )
    )
    return fused.orderBy(
        F.col("rrf_score").desc(), F.col("id").asc()
    ).limit(k)


def phrase_search(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str,
    phrase: str,
    k: int | None = None,
) -> DataFrame:
    """Exact phrase matching: documents containing the query words
    consecutively, with occurrence counts and the first match position
    — the quoted-query operator term-based ranking (keyword/BM25)
    cannot express (those score bags of words; "new york" ≠ york, new).

    Scale shape: ZERO shuffle, pure codegen. The text is whitespace-
    normalized once and the phrase becomes a zero-width lookahead regex
    anchored to token starts, so occurrence counting (overlap-correct:
    "a a a" contains "a a" twice) and the first match offset are single
    ``regexp_count`` / ``regexp_instr`` calls in the scan — measured
    ~10× over the interpreted sliding array-slice formulation, which
    allocates a slice per (doc, position). The first TOKEN index is
    recovered arithmetically: the normalized prefix before the match
    has exactly ``first_pos`` spaces. With ``k``, ranking compiles to
    TakeOrdered; without, every matching document returns. At 100 TB
    this is the cost of reading the text column once — a positional-
    postings index (L-way self-join) only pays off pre-materialized.

    The catalog oracle computes the same answer from the explicit
    token-array sliding window, so the regex shortcut is
    differentially proven against the definitional form.

    Output: id, n_occurrences, first_pos (0-based token index),
    n_tokens; best-first (count desc, id asc) when ``k`` is set.
    """
    qtokens = [t for t in phrase.strip().lower().split() if t]
    if not qtokens:
        raise ValueError("phrase must contain at least one token")
    # \Q..\E-quoted phrase, zero-width so overlapping matches all count;
    # (?= … (?: |$)) right-anchors the last token to a word end.
    pattern = "(?<=^|[ ])(?=\\Q" + " ".join(qtokens) + "\\E(?:[ ]|$))"
    norm = F.regexp_replace(
        F.trim(F.lower(F.col(text_col))), r"\s+", " "
    )
    toks = _tokens(F.col(text_col))
    prefix = F.substring(
        norm, 1, F.regexp_instr(norm, F.lit(pattern)) - 1
    )
    out = (
        docs.select(
            F.col(id_col).alias("id"),
            F.regexp_count(norm, F.lit(pattern))
            .cast("bigint")
            .alias("n_occurrences"),
            (
                F.length(prefix)
                - F.length(F.replace(prefix, F.lit(" "), F.lit("")))
            )
            .cast("bigint")
            .alias("first_pos"),
            F.size(toks).cast("bigint").alias("n_tokens"),
        )
        .filter(F.col("n_occurrences") > 0)
    )
    if k is not None:
        out = out.orderBy(
            F.col("n_occurrences").desc(), F.col("id").asc()
        ).limit(k)
    return out


def doc_keywords(
    docs: DataFrame,
    *,
    id_col: str,
    text_col: str,
    k: int = 5,
    min_df: int = 1,
    round_to: int = 6,
) -> DataFrame:
    """Top-k TF-IDF keywords PER DOCUMENT — the unsupervised "what is
    this doc about" summary used for corpus browsing, cluster
    labeling, and keyword-facet indexes.  Smoothed IDF
    ``ln((N+1)/(df+1)) + 1`` (never zero, so frequent-but-universal
    terms still rank below distinctive ones without dropping out).

    Scale shape: one hash aggregate to per-(doc, token) term
    frequencies, one token-level aggregate for document frequencies
    (broadcast by AQE — vocabulary-sized, not corpus-sized), and the
    per-doc top-k is a row_number window partitioned by doc id — the
    frame it ranks over is ≤ distinct-terms-per-doc, never global.
    Deterministic: ties break score desc, then token asc.  ``min_df``
    drops hapax noise before the join when > 1.

    Output: id, rank (1..k), token, tf, score (rounded).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    base = docs.select(
        F.col(id_col).alias("id"), _tokens(F.col(text_col)).alias("toks")
    )
    tf = (
        base.select("id", F.explode("toks").alias("token"))
        .groupBy("id", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    n_docs = base.agg(F.count(F.lit(1)).alias("n_docs"))
    dfreq = tf.groupBy("token").agg(F.countDistinct("id").alias("df"))
    if min_df > 1:
        dfreq = dfreq.filter(F.col("df") >= min_df)
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n_docs") + 1.0) / (F.col("df") + 1.0)
                    )
                    + 1.0
                ),
                round_to,
            ),
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.desc("score"), F.asc("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("id", F.col("rank").cast("bigint").alias("rank"), "token", "tf", "score")
    )
