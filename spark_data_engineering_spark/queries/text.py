"""Text-analysis queries over the documents table (training-data
pipeline surface; absent from the reference — SURVEY.md §2.2 notes no
string functions anywhere)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_data_engineering_spark.functions import text as TX
from spark_data_engineering_spark.functions import numeric as NR
from spark_data_engineering_spark.registry import query
from spark_data_engineering_spark.sources import load_table


@query(
    "doc_stats",
    oracle="""
    SELECT doc_id,
           lang,
           CAST(LENGTH(text) AS BIGINT) AS n_chars_actual,
           CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
           CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS BIGINT) AS n_unique_tokens,
           FLOOR((CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
                 / (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)) * 10000 + 0.5) / 10000 AS avg_token_len,
           FLOOR((CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                 t -> t IN ('the', 'a', 'and', 'of', 'to', 'in', 'is'))) AS DOUBLE)
                 / (LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)) * 10000 + 0.5) / 10000 AS stopword_ratio
    FROM documents
    """,
)
def doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/char statistics — all JVM-side expressions that
    fuse into one codegen stage over the parquet scan (no shuffle)."""
    d = load_table(spark, "documents", sf_dir)
    text = F.col("text")
    n_tokens = TX.token_count(text)
    return d.select(
        "doc_id",
        "lang",
        F.length(text).cast("bigint").alias("n_chars_actual"),
        n_tokens.cast("bigint").alias("n_tokens"),
        TX.unique_token_count(text).cast("bigint").alias("n_unique_tokens"),
        NR.round4(F.length(F.regexp_replace(text, " ", "")).cast("double") / n_tokens).alias("avg_token_len"),
        NR.round4(TX.stopword_count(text).cast("double") / n_tokens).alias("stopword_ratio"),
    )


@query(
    "doc_fingerprints",
    oracle="""
    SELECT doc_id, md5(text) AS fp, CAST(LENGTH(text) AS BIGINT) AS n_chars_actual
    FROM documents
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5 document fingerprint (exact-dedup key)."""
    d = load_table(spark, "documents", sf_dir)
    return d.select(
        "doc_id",
        TX.fingerprint(F.col("text")).alias("fp"),
        F.length("text").cast("bigint").alias("n_chars_actual"),
    )


@query(
    "lang_source_profile",
    oracle="""
    SELECT lang,
           source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           FLOOR((AVG(n_chars)) * 100 + 0.5) / 100 AS mean_chars,
           FLOOR((AVG(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)) * 100 + 0.5) / 100 AS mean_tokens
    FROM documents
    GROUP BY lang, source
    """,
)
def lang_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile per (lang, source) — the dataset-card query."""
    d = load_table(spark, "documents", sf_dir)
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        NR.round2(F.avg("n_chars")).alias("mean_chars"),
        NR.round2(F.avg(TX.token_count(F.col("text")))).alias("mean_tokens"),
    )


@query(
    "doc_quality_and_lang",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, text,
             LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS n_tok,
             LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                 x -> x IN ('the', 'a', 'and', 'of', 'to', 'in', 'is'))) AS n_stop,
             LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.,;:!?]', '', 'g')) AS n_punct,
             LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                 x -> x IN ('the', 'and', 'of', 'to', 'a', 'in', 'is'))) AS h_en,
             LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                 x -> x IN ('der', 'die', 'das', 'und', 'ist', 'nicht'))) AS h_de,
             LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                 x -> x IN ('le', 'la', 'les', 'et', 'est', 'une'))) AS h_fr,
             LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                 x -> x IN ('el', 'la', 'los', 'y', 'es', 'una'))) AS h_es,
             LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                 x -> x IN ('的', '了', '是'))) AS h_zh
      FROM documents
    )
    SELECT doc_id, lang,
           FLOOR(GREATEST(0.0, LEAST(1.0,
               0.5 * LEAST(CAST(n_tok AS DOUBLE) / 100.0, 1.0)
             + 0.5 * (1.0 - CAST(n_punct AS DOUBLE)
                            / CAST(GREATEST(LENGTH(text), 1) AS DOUBLE))
             - 0.2 * (CAST(n_stop AS DOUBLE) / CAST(n_tok AS DOUBLE))
           )) * 10000 + 0.5) / 10000 AS quality,
           CASE WHEN GREATEST(h_en, h_de, h_fr, h_es, h_zh) = 0 THEN 'und'
                WHEN h_de = GREATEST(h_en, h_de, h_fr, h_es, h_zh) THEN 'de'
                WHEN h_en = GREATEST(h_en, h_de, h_fr, h_es, h_zh) THEN 'en'
                WHEN h_es = GREATEST(h_en, h_de, h_fr, h_es, h_zh) THEN 'es'
                WHEN h_fr = GREATEST(h_en, h_de, h_fr, h_es, h_zh) THEN 'fr'
                ELSE 'zh' END AS lang_guess
    FROM t
    """,
)
def doc_quality_and_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality score + marker-based language ID per document. Both
    heuristics are deterministic column arithmetic, replayed in the
    oracle: the CASE checks languages in lexicographic order, which is
    exactly ``lang_guess``'s min-lang tie-break on equal hit counts."""
    d = load_table(spark, "documents", sf_dir)
    return d.select(
        "doc_id",
        "lang",
        TX.quality_score(F.col("text")).alias("quality"),
        TX.lang_guess(F.col("text")).alias("lang_guess"),
    )


@query(
    "token_regex_stats",
    oracle="""
    SELECT doc_id,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+')) AS BIGINT) AS n_word_tokens,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '[a-z]{5,}')) AS BIGINT) AS n_long_tokens,
           CAST(LENGTH(REGEXP_REPLACE(text, '[^aeiou]', '', 'g')) AS BIGINT) AS n_vowels
    FROM documents
    """,
)
def token_regex_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex tokenization counts (the BPE-ish pre-tokenizer shape:
    pattern-based token classes) — regexp_count / regexp_replace are
    JVM-side; patterns restricted to the regex subset both engines
    implement identically."""
    d = load_table(spark, "documents", sf_dir)
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit("[a-z]+")).cast("bigint").alias("n_word_tokens"),
        F.regexp_count("text", F.lit("[a-z]{5,}")).cast("bigint").alias("n_long_tokens"),
        F.length(F.regexp_replace("text", "[^aeiou]", "")).cast("bigint").alias("n_vowels"),
    )
