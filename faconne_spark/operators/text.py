"""Text analysis operators for training-data pipelines.

Language ID (stopword profiles), quality scoring, token counting, and
document fingerprinting — all as Catalyst expressions from the portable
builders, so the DuckDB oracle reproduces them exactly. Zero UDFs: at
100 TB these run entirely inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from faconne_spark.session import spread
from faconne_spark.functions import (
    LANG_PROFILES,
    lang_array_sql,
    phash60,
    tokens_bpe_count,
    tokens_ws,
    word_shingles,
)


def lang_scores_exprs(dialect: str) -> dict:
    """Per-language stopword-hit counts over the token set."""
    toks = tokens_ws("lower(text)", dialect)
    out = {}
    for lang in LANG_PROFILES:
        arr = lang_array_sql(lang, dialect)
        if dialect == "spark":
            out[lang] = f"size(array_intersect(array_distinct({toks}), {arr}))"
        else:
            out[lang] = f"len(list_intersect(list_distinct({toks}), {arr}))"
    return out


def lang_id(docs: DataFrame) -> DataFrame:
    """Best-scoring language profile per document (ties → lexicographic
    first, deterministic)."""
    scores = lang_scores_exprs("spark")
    pairs = ", ".join(
        f"struct({sql} as score, '{lang}' as lang)" for lang, sql in sorted(scores.items())
    )
    best = (
        f"array_max(array({pairs}))"
    )
    return spread(docs).select(
        "doc_id",
        "lang",
        F.expr(f"{best}.lang").alias("pred_lang"),
        F.expr(f"{best}.score").alias("pred_score"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality features: length, token stats, punctuation /
    non-alpha ratio, stopword ratio, repetition (distinct-token ratio)."""
    toks = tokens_ws("text", "spark")
    en = lang_array_sql("en", "spark")
    return spread(docs).select(
        "doc_id",
        F.expr("length(text)").alias("n_chars"),
        F.expr(f"size({toks})").alias("n_tokens"),
        F.expr(
            f"round(cast(size(array_distinct({toks})) as double) /"
            f" cast(size({toks}) as double), 6)"
        ).alias("distinct_ratio"),
        F.expr(
            "round(cast(length(regexp_replace(text, '[a-zA-Z0-9 ]', '')) as double)"
            " / cast(greatest(length(text), 1) as double), 6)"
        ).alias("punct_ratio"),
        F.expr(
            f"round(cast(size(filter({toks}, t -> array_contains({en}, lower(t)))) as double)"
            f" / cast(greatest(size({toks}), 1) as double), 6)"
        ).alias("stopword_ratio"),
        F.expr(
            f"round(cast(aggregate({toks}, 0, (a, t) -> a + length(t)) as double)"
            f" / cast(greatest(size({toks}), 1) as double), 6)"
        ).alias("mean_token_len"),
    )


def token_count(docs: DataFrame) -> DataFrame:
    toks = tokens_ws("text", "spark")
    return spread(docs).select(
        "doc_id",
        F.expr(f"size({toks})").alias("n_ws_tokens"),
        F.expr(tokens_bpe_count("text", "spark")).alias("n_bpe_tokens"),
        F.expr("length(text)").alias("n_chars"),
    )


def fingerprint(docs: DataFrame, n_shingle: int = 4) -> DataFrame:
    """Winnowing-style fingerprint: min / max / count of shingle hashes
    (a compact, order-invariant sketch usable as a near-dup prefilter)."""
    sh = word_shingles("text", n_shingle, "spark")
    hashed = f"transform({sh}, s -> {phash60('s', 'spark')})"
    return spread(docs).select(
        "doc_id",
        F.expr(f"array_min({hashed})").alias("fp_min"),
        F.expr(f"array_max({hashed})").alias("fp_max"),
        F.expr(f"size({hashed})").alias("n_shingles"),
    )
