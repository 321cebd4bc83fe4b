"""Text analysis: token stats, quality scoring, language-ID,
fingerprinting — all JVM-side expressions (no Python UDFs), designed to
run as a single narrow map over a 100 TB documents table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pennsieve_streaming_spark.llm.hashing import poly_hash_expr

TOKS = "split(trim(text), '\\\\s+')"

# Per-language marker words for the n-gram/stopword language heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "a"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein"],
    "es": ["el", "la", "de", "que", "los", "una", "es"],
    "fr": ["le", "les", "et", "des", "une", "est", "dans"],
    "zh": ["的", "是", "不", "了", "在", "我", "有"],
}
# Deterministic prediction priority (ties resolve to the earlier entry).
LANG_PRIORITY = ["en", "de", "es", "fr", "zh"]

EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "that", "this",
]


def _marker_count_expr(markers: list[str]) -> str:
    arr = ", ".join("'" + m.replace("'", "''") + "'" for m in markers)
    return f"size(filter({TOKS}, t -> array_contains(array({arr}), lower(t))))"


def token_stats(documents: DataFrame) -> DataFrame:
    """Per-document token statistics.

    Output: (doc_id, n_chars, n_tokens, n_alpha, n_punct, avg_token_len).
    """
    return documents.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.expr(
            f"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE size({TOKS}) END"
        ).cast("long").alias("n_tokens"),
        F.length(F.regexp_replace("text", "[^A-Za-z]", "")).cast("long").alias("n_alpha"),
        F.length(F.regexp_replace("text", "[^.,;:!?]", "")).cast("long").alias("n_punct"),
        F.expr(
            f"CASE WHEN length(trim(text)) = 0 THEN CAST(0 AS DOUBLE) "
            f"ELSE aggregate(transform({TOKS}, t -> length(t)), 0, (a, x) -> a + x) "
            f"/ CAST(size({TOKS}) AS DOUBLE) END"
        ).alias("avg_token_len"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Heuristic document quality in [0, 1]:
    0.5*alpha_ratio + 0.3*stopword_ratio + 0.2*min(n_tokens,200)/200.

    Output: (doc_id, n_tokens, alpha_ratio, stop_ratio, quality).
    """
    stop_expr = _marker_count_expr(EN_STOPWORDS)
    df = documents.select(
        "doc_id",
        F.expr(f"size({TOKS})").cast("long").alias("n_tokens"),
        (
            F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
            / F.length("text").cast("double")
        ).alias("alpha_ratio"),
        F.expr(f"{stop_expr} / CAST(size({TOKS}) AS DOUBLE)").alias("stop_ratio"),
    )
    return df.withColumn(
        "quality",
        F.col("alpha_ratio") * 0.5
        + F.col("stop_ratio") * 0.3
        + F.least(F.col("n_tokens"), F.lit(200)) / F.lit(200.0) * 0.2,
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Marker-word language heuristic.

    Output: (doc_id, lang, predicted_lang, correct) — `lang` is the
    labeled column from the table, `predicted_lang` the heuristic's
    argmax with deterministic priority tie-breaking.
    """
    scores = {
        code: _marker_count_expr(markers) for code, markers in LANG_MARKERS.items()
    }
    df = documents.select(
        "doc_id",
        "lang",
        *[F.expr(e).alias(f"score_{c}") for c, e in scores.items()],
    )
    # First language (in priority order) whose score >= every later
    # language's score — argmax with deterministic tie-breaking.
    pred = F.lit(LANG_PRIORITY[-1])
    for i in range(len(LANG_PRIORITY) - 2, -1, -1):
        code = LANG_PRIORITY[i]
        cond = None
        for other in LANG_PRIORITY[i + 1:]:
            c = F.col(f"score_{code}") >= F.col(f"score_{other}")
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, F.lit(code)).otherwise(pred)
    return df.withColumn("predicted_lang", pred).select(
        "doc_id",
        "lang",
        "predicted_lang",
        (F.col("predicted_lang") == F.col("lang")).alias("correct"),
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """Rolling-hash content fingerprint (doc_id, fp LONG)."""
    return documents.select(
        "doc_id", F.expr(poly_hash_expr("text")).alias("fp")
    )
