"""Text analysis over the `documents` table: token counting, quality
scoring, language-ID heuristic, document fingerprinting (north-star
training-data-pipeline operators; no reference citation by definition —
SURVEY.md §2.9 / §7 phase 6).

All expressions are JVM-side built-ins (no UDFs): tokenization, ratios and
fingerprints run inside whole-stage codegen, so the operator is a single
parquet scan with full column pruning — the 100 TB shape (embarrassingly
parallel, zero shuffles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apmbackend_spark.functions.text import (
    NONWORD_RE,
    hash64,
    hash64_sql,
    stop_count,
    stop_count_sql,
    tokens,
    tokens_sql,
)

# quality score weights: length signal, stopword signal, punctuation penalty
W_LEN, W_STOP, W_PUNCT = 0.4, 0.4, 0.2
LANG_STOP_THRESHOLD = 0.08  # stop-ratio >= threshold -> 'en'


def doc_stats(documents: DataFrame) -> DataFrame:
    tok = tokens(F.col("text"))
    n_tok = F.size(tok)
    n_chars = F.length("text")
    n_word_chars = F.length(F.regexp_replace(F.lower("text"), NONWORD_RE, ""))
    punct_ratio = F.when(
        n_chars > 0, (n_chars - n_word_chars).cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tok > 0, stop_count(tok).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    len_score = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    quality = (
        F.lit(W_LEN) * len_score
        + F.lit(W_STOP) * F.least(stop_ratio * F.lit(4.0), F.lit(1.0))
        - F.lit(W_PUNCT) * punct_ratio
    )
    return documents.select(
        "doc_id",
        "lang",
        "source",
        n_tok.cast("long").alias("n_tokens"),  # long: DuckDB len() is BIGINT
        n_chars.cast("long").alias("n_chars_actual"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        F.when(stop_ratio >= F.lit(LANG_STOP_THRESHOLD), F.lit("en"))
        .otherwise(F.lit("other"))
        .alias("lang_pred"),
        quality.alias("quality"),
        hash64(F.concat_ws(" ", tok)).alias("fingerprint"),
    )


def doc_stats_oracle_sql() -> str:
    tok = tokens_sql("text")
    return f"""
WITH base AS (
    SELECT doc_id, lang, source, text,
           {tok} AS tok,
           length(text) AS n_chars_actual,
           length(regexp_replace(lower(text), '{NONWORD_RE}', '', 'g')) AS n_word_chars
    FROM documents
), m AS (
    SELECT doc_id, lang, source,
           len(tok) AS n_tokens,
           n_chars_actual,
           CASE WHEN n_chars_actual > 0
                THEN CAST(n_chars_actual - n_word_chars AS DOUBLE) / n_chars_actual
                ELSE 0.0 END AS punct_ratio,
           CASE WHEN len(tok) > 0
                THEN CAST({stop_count_sql('tok')} AS DOUBLE) / len(tok)
                ELSE 0.0 END AS stop_ratio,
           least(CAST(len(tok) AS DOUBLE) / 100.0, 1.0) AS len_score,
           {hash64_sql("array_to_string(tok, ' ')")} AS fingerprint
    FROM base
)
SELECT doc_id, lang, source, n_tokens, n_chars_actual, punct_ratio, stop_ratio,
       CASE WHEN stop_ratio >= {LANG_STOP_THRESHOLD!r} THEN 'en' ELSE 'other' END AS lang_pred,
       ({W_LEN!r} * len_score + {W_STOP!r} * least(stop_ratio * 4.0, 1.0)
        - {W_PUNCT!r} * punct_ratio) AS quality,
       fingerprint
FROM m
"""
