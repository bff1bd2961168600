"""Text-analysis operators as reusable Column builders (scale path).

Mirrors benchqueries/text_ops.py but as composable DataFrame transforms
using Spark-native hashing — everything stays in whole-stage codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_STOPWORDS = ("the", "and", "of", "a", "to", "in", "is", "that")


def token_count(col: str = "text") -> F.Column:
    return F.size(F.split(F.trim(F.col(col)), " "))


def stopword_ratio(col: str = "text", stopwords: tuple[str, ...] = DEFAULT_STOPWORDS) -> F.Column:
    toks = f"split(lower(trim({col})), ' ')"
    inlist = ", ".join(f"'{w}'" for w in stopwords)
    return F.expr(
        f"size(filter({toks}, t -> t IN ({inlist}))) / CAST(size({toks}) AS DOUBLE)"
    )


def punct_ratio(col: str = "text") -> F.Column:
    stripped = F.regexp_replace(F.col(col), r"[.,;:!?]", "")
    return (F.length(col) - F.length(stripped)) / F.length(col).cast("double")


def quality_score(col: str = "text") -> F.Column:
    """0-3 heuristic quality score: enough tokens, sane punctuation
    density, plausible token shape."""
    tok = token_count(col)
    avg_len = F.length(F.regexp_replace(F.col(col), " ", "")) / tok.cast("double")
    return (
        F.when(tok >= 20, 1).otherwise(0)
        + F.when(punct_ratio(col) <= 0.1, 1).otherwise(0)
        + F.when(avg_len.between(3.0, 12.0), 1).otherwise(0)
    ).cast("int")


def lang_scores(col: str, markers: dict[str, tuple[str, ...]]) -> list[F.Column]:
    toks = f"split(lower(trim({col})), ' ')"
    out = []
    for lang, words in markers.items():
        inlist = ", ".join(f"'{w}'" for w in words)
        out.append(F.expr(f"size(filter({toks}, t -> t IN ({inlist})))").alias(f"score_{lang}"))
    return out


def fingerprint(col: str = "text") -> F.Column:
    """64-bit content fingerprint of normalized text (xxhash64 — for the
    oracle-portable md5 flavor see functions/compat.h64)."""
    return F.xxhash64(F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " "))


def with_text_features(df: DataFrame, col: str = "text") -> DataFrame:
    return (
        df.withColumn("n_tokens", token_count(col))
        .withColumn("punct_ratio", punct_ratio(col))
        .withColumn("stopword_ratio", stopword_ratio(col))
        .withColumn("quality_score", quality_score(col))
        .withColumn("fingerprint", fingerprint(col))
    )
