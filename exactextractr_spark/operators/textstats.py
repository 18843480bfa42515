"""Text analysis: language-ID, quality scoring, token counting,
document fingerprinting. All hot-path expressions are built-in
``pyspark.sql.functions`` (JVM-side, whole-stage-codegen) — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "nicht", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "por", "para", "que"],
}

#: BPE-ish token regex: words, numbers, or single punctuation marks
TOKEN_REGEX = r"\w+|[^\w\s]"


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace and BPE-ish token counts as generated columns."""
    t = F.col(text_col)
    ws = F.size(F.split(F.trim(t), r"\s+"))
    bpe = F.size(F.regexp_extract_all(t, F.lit(TOKEN_REGEX), 0))
    return docs.withColumn(
        "ws_tokens", F.when(F.length(F.trim(t)) == 0, 0).otherwise(ws)
    ).withColumn("bpe_tokens", bpe)


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length
    heuristics — the standard pretraining quality filters."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    words = F.split(F.lower(F.trim(t)), r"\s+")
    n_words = F.size(words)
    sw = F.array([F.lit(w) for w in _STOPWORDS["en"]])
    n_stop = F.size(F.array_intersect(words, sw))
    distinct_ratio = F.size(F.array_distinct(words)) / n_words
    return (
        docs.withColumn("n_chars_calc", n_chars)
        .withColumn("n_words", n_words)
        .withColumn("punct_ratio", n_punct / F.greatest(n_chars, F.lit(1)))
        .withColumn("stopword_hits", n_stop)
        .withColumn(
            "mean_word_len",
            (F.length(F.regexp_replace(t, r"\s+", "")) / F.greatest(n_words, F.lit(1))),
        )
        .withColumn("distinct_word_ratio", distinct_ratio)
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword heuristic language ID: count per-language stopword
    hits (JVM-side array_intersect of distinct words), pick the argmax
    (ties → lexicographically last language code, struct-max ordering)."""
    words = F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    scores = F.array(
        *[
            F.struct(
                F.size(
                    F.array_intersect(words, F.array([F.lit(w) for w in ws]))
                ).alias("hits"),
                F.lit(lang).alias("lang"),
            )
            for lang, ws in sorted(_STOPWORDS.items())
        ]
    )
    best = F.array_max(scores)
    return docs.withColumn(
        "lang_pred",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: 64-bit from xxhash64 of the
    normalized text (rolling-hash analog, collision-safe for dedup keys)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return docs.withColumn("fp64", F.xxhash64(norm))


def rolling_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Polynomial rolling-hash fingerprint over the character codes of the
    whitespace-normalized text: ``h = (h*31 + code) mod 1e9+7``. Entirely
    JVM-side (``aggregate`` over ``split``), and — unlike xxhash64 —
    expressible verbatim in ANSI SQL, so it is oracle-checkable bit-exactly
    (DuckDB ``list_reduce`` mirror verified). Use ``fingerprint`` (xxhash64)
    when collision resistance matters more than auditability."""
    d = docs.withColumn(
        "_norm", F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    )
    return d.withColumn(
        "fp64",
        F.expr(
            "aggregate(filter(split(_norm, ''), c -> c <> ''), "
            "cast(0 as bigint), (h, c) -> (h * 31 + ascii(c)) % 1000000007)"
        ),
    ).drop("_norm")
