"""Text analysis over document tables: token counts, quality scores,
language ID, fingerprints.

Training-data-pipeline extension (BASELINE.json north star). Everything is
built-in string/regex expressions — at 100 TB these run inside whole-stage
codegen on every document, so no Python appears in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from knot_another_pipeline_spark.functions.hashing import content_fingerprint

#: Tiny per-language stopword lexicons for the stopword-hit language-ID
#: heuristic. Deliberately small — language ID here is a scoring
#: heuristic, not a model.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "una", "los", "por"),
    "fr": ("le", "la", "de", "et", "un", "une", "les", "des", "en", "que"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "不", "这", "人"),
}


def _tokens(text: Column) -> Column:
    return F.filter(F.split(F.trim(F.lower(text)), r"\s+"), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(_tokens(c))


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-ish subword proxy: count of word/number/punct units via regex —
    ``\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]`` — a deterministic stand-in for a
    real tokenizer's unit count."""
    c = F.col(text) if isinstance(text, str) else text
    units = F.regexp_extract_all(c, F.lit(r"(\p{L}+|\p{N}+|[^\p{L}\p{N}\s])"), 1)
    return F.size(units)


def quality_features(
    df: DataFrame, *, id_col: str, text_col: str, lang: str = "en"
) -> DataFrame:
    """Per-document quality metrics: n_chars, n_tokens, avg token length,
    punctuation ratio, stopword ratio, and a composite quality score in
    [0,1] (longer, word-dense, stopword-bearing docs score higher — the
    classic Gopher/C4-style heuristics)."""
    text = F.col(text_col)
    toks = _tokens(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    stop = STOPWORDS.get(lang, STOPWORDS["en"])
    stop_arr = F.array(*[F.lit(s) for s in stop])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    punct = F.length(F.regexp_replace(text, r"[\p{L}\p{N}\s]", ""))
    avg_tok_len = F.when(
        n_tokens > 0,
        (F.length(F.regexp_replace(text, r"\s+", "")).cast("double") / n_tokens),
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct.cast("double") / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(0.0)
    score = (
        F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(4.0), F.lit(1.0))) * 0.3
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(avg_tok_len, 4).alias("avg_token_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def language_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit fraction of tokens."""
    c = F.col(text) if isinstance(text, str) else text
    toks = _tokens(c)
    n = F.size(toks)
    out: dict[str, Column] = {}
    for lang, words in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        if lang == "zh":
            # CJK has no whitespace tokens — count character hits instead.
            hits = sum(
                (F.length(c) - F.length(F.replace(c, F.lit(w), F.lit("")))).cast("double")
                for w in words
            )
            out[lang] = F.when(F.length(c) > 0, hits / F.length(c)).otherwise(0.0)
        else:
            hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
            out[lang] = F.when(n > 0, hits.cast("double") / n).otherwise(0.0)
    return out


def detect_language(df: DataFrame, *, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword scores
    (deterministic tiebreak by language code). Output: id, detected_lang,
    lang_score."""
    scores = language_scores(text_col)
    pairs = F.array(
        *[
            F.struct(F.round(v, 6).alias("score"), F.lit(k).alias("lang"))
            for k, v in sorted(scores.items())
        ]
    )
    best = F.array_max(pairs)
    return df.select(
        F.col(id_col).alias("id"),
        best["lang"].alias("detected_lang"),
        best["score"].alias("lang_score"),
    )


def fingerprint_documents(df: DataFrame, *, id_col: str, text_col: str) -> DataFrame:
    """Normalized-content md5 fingerprint per document."""
    return df.select(
        F.col(id_col).alias("id"), content_fingerprint(text_col).alias("fingerprint")
    )


def winnow_fingerprints(
    df: DataFrame, *, id_col: str, text_col: str, k: int = 8, window: int = 4
) -> DataFrame:
    """Rolling-hash document fingerprints via winnowing (Schleimer et al.,
    SIGMOD'03): hash every char ``k``-gram, slide a ``window``-wide frame
    over consecutive gram hashes, keep the min of each frame, dedupe.
    Near-identical documents share most selected hashes, so fingerprint
    overlap ⇒ local similarity even when MinHash's bag-of-shingles view
    would wash out ordering.

    Gram hashes are 40-bit md5-derived bigints (portable to any engine
    with md5). The frame-min is a window aggregate ordered by gram
    position — one shuffle on the doc id; everything else is codegen'd
    string/hash expressions. Output: id, fp_hash (distinct rows).
    """
    from pyspark.sql import Window

    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    n_grams = (F.length(norm) - F.lit(k) + 1).alias("n_grams")
    grams = (
        df.select(F.col(id_col).alias("id"), norm.alias("t"), n_grams)
        .filter(F.col("n_grams") >= window)
        .select(
            "id",
            "n_grams",
            "t",
            F.explode(F.sequence(F.lit(1), F.col("n_grams"))).alias("pos"),
        )
        .select(
            "id",
            "n_grams",
            "pos",
            F.conv(
                F.substring(F.md5(F.expr(f"substring(t, pos, {k})")), 1, 10), 16, 10
            ).cast("long").alias("h"),
        )
    )
    frame = Window.partitionBy("id").orderBy("pos").rowsBetween(0, window - 1)
    return (
        grams.withColumn("fp_hash", F.min("h").over(frame))
        .filter(F.col("pos") <= F.col("n_grams") - window + 1)
        .select("id", "fp_hash")
        .distinct()
    )
