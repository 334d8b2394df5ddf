"""Text-analysis column expressions (training-data pipeline surface).

All JVM-side built-ins — no Python UDFs in the hot path. Each helper
returns a Column so callers compose them into declarative plans that
whole-stage codegen fuses. The reference has no text processing at all
(SURVEY.md §2.2 "no string functions"); this module is the extension
surface for 100 TB document pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny multilingual stopword marker sets for the n-gram-free language-ID
# heuristic. Public knowledge (common function words per language).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "es": ("el", "la", "los", "y", "es", "una"),
    "zh": ("的", "了", "是"),
}

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (single-space corpus => literal split)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    """Token count via char arithmetic — identical formula to the SQL
    oracle, avoids regex-dialect differences."""
    return F.length(text) - F.length(F.regexp_replace(text, " ", "")) + 1


def unique_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def stopword_count(text: Column) -> Column:
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(stop_arr, t)))


def punct_count(text: Column) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, "[.,;:!?]", ""))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the raw text. Used for
    exact dedup; matches DuckDB's md5() byte-for-byte."""
    return F.md5(text)


def quality_score(text: Column) -> Column:
    """Heuristic quality score in [0, 1]: rewards moderate length and a
    sane stopword ratio, penalizes punctuation soup. Deterministic and
    JVM-side."""
    n_tok = token_count(text).cast("double")
    stop_ratio = stopword_count(text).cast("double") / n_tok
    punct_ratio = punct_count(text).cast("double") / F.greatest(F.length(text), F.lit(1)).cast("double")
    length_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    # floor(x*1e4+0.5)/1e4 — the repo's cross-engine rounding convention
    # (Spark's ROUND(HALF_UP on BigDecimal) is not what other engines do)
    return F.floor(
        F.greatest(
            F.lit(0.0),
            F.least(F.lit(1.0), 0.5 * length_term + 0.5 * (1.0 - punct_ratio) - 0.2 * stop_ratio),
        )
        * 10000
        + F.lit(0.5)
    ) / 10000


def lang_scores(text: Column) -> Column:
    """Map of language -> marker-word hit count (the language-ID signal)."""
    toks = tokens(text)

    def _marker_filter(markers: tuple[str, ...]):
        marker_arr = F.array(*[F.lit(x) for x in markers])
        return lambda t: F.array_contains(marker_arr, t)

    entries = [
        F.struct(
            F.lit(lang).alias("lang"),
            F.size(F.filter(toks, _marker_filter(markers))).alias("hits"),
        )
        for lang, markers in LANG_MARKERS.items()
    ]
    return F.array(*entries)


def lang_guess(text: Column) -> Column:
    """argmax over lang_scores with deterministic tie-break on language
    code; 'und' (undetermined) when no marker hits at all."""
    scores = lang_scores(text)
    best = F.aggregate(
        scores,
        F.struct(F.lit("und").alias("lang"), F.lit(0).alias("hits")),
        lambda acc, s: F.when(
            (s["hits"] > acc["hits"]) | ((s["hits"] == acc["hits"]) & (s["lang"] < acc["lang"]) & (acc["hits"] > 0)),
            s,
        ).otherwise(acc),
    )
    return best["lang"]
