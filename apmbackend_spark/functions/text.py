"""Deterministic text primitives for the training-data-pipeline operators
(dedup, quality scoring, language ID, fingerprinting).

Every primitive is rendered twice — Spark Column and DuckDB SQL — with
identical semantics: same regexes (shared Java/RE2 subset), same md5-based
hashing (`conv(substr(md5(x),1,15),16,10)` == `('0x'||substr(md5(x),1,15))::BIGINT`),
same integer arithmetic. All run JVM-side in whole-stage codegen — no Python
UDFs anywhere on the text hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"
NONWORD_RE = "[^a-z0-9 ]"

# Tiny fixed stopword list for the language-ID heuristic + stop-ratio.
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "on", "for", "with")


def tokens(col: Column) -> Column:
    """Lower-cased word tokens (whitespace/punct split)."""
    return F.filter(
        F.split(F.lower(col), TOKEN_SPLIT_RE), lambda x: x != F.lit("")
    )


def tokens_sql(expr: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(lower({expr}), '{TOKEN_SPLIT_RE}'), "
        "x -> x <> '')"
    )


# GPT-2-style pre-tokenizer, simplified to the ASCII subset both engines'
# regex libraries (Java util.regex / RE2) treat identically: a token is a
# letter run, digit run, or punctuation run, each optionally absorbing one
# leading space. This is the unit a byte-level BPE merges within — counting
# them is the standard tokenizer-fertility proxy when the merge table
# itself isn't part of the pipeline.
BPE_PRETOKEN_RE = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"


def bpe_tokens(col: Column) -> Column:
    """BPE pre-tokenizer segments (leftmost-first alternation — same result
    in Java regex and RE2 for this ASCII pattern)."""
    return F.regexp_extract_all(col, F.lit(BPE_PRETOKEN_RE), 0)


def bpe_tokens_sql(expr: str) -> str:
    return f"regexp_extract_all({expr}, '{BPE_PRETOKEN_RE}')"


def hash64(col: Column) -> Column:
    """Deterministic 60-bit hash from md5 hex — identical in DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hash64_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def py_hash64(s: str) -> int:
    """Pure-Python twin of hash64 (md5-hex first 15 digits as an integer).
    Lets harness-side consumers (the mini-broker crash rules) evaluate the
    SAME content-keyed predicate per streamed payload in O(1) memory,
    instead of collecting a data-proportional membership set to the
    driver. Parity with the Column form is pinned by tests."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def shingles(tok: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a token array. (Spark's sequence()
    runs DESCENDING when start > stop, so the short-doc case must be gated
    to an empty array, not sequence(1, 0).)"""
    idx = F.when(
        F.size(tok) >= n, F.sequence(F.lit(1), F.size(tok) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tok, i, n)))
    )


def shingles_sql(tok_expr: str, n: int = 3) -> str:
    # DuckDB: generate the start indices, slice the list, join with spaces.
    return f"""list_distinct(list_transform(
        range(1, greatest(len({tok_expr}) - {n - 1}, 0) + 1),
        i -> array_to_string({tok_expr}[i:i+{n - 1}], ' ')))"""


def char_trigrams(col: Column) -> Column:
    """All character trigrams (every occurrence, 1-per-position) of a string
    column. Empty array below 3 chars — gated, because Spark's sequence()
    runs DESCENDING when start > stop."""
    idx = F.when(
        F.length(col) >= 3, F.sequence(F.lit(1), F.length(col) - 2)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.substring(col, i, F.lit(3)))


def char_trigrams_sql(expr: str) -> str:
    # DuckDB range(a, b) excludes b: starts 1..L-2 for string length L.
    return (
        f"CASE WHEN length({expr}) >= 3 THEN "
        f"list_transform(range(1, length({expr}) - 1), i -> substr({expr}, i, 3)) "
        "ELSE []::VARCHAR[] END"
    )


def stop_count(tok: Column) -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    return F.size(F.filter(tok, lambda x: F.array_contains(sw, x)))


def stop_count_sql(tok_expr: str) -> str:
    sw = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"
    return f"len(list_filter({tok_expr}, x -> list_contains({sw}, x)))"


def ngrams(tok: Column, n: int) -> Column:
    """Space-joined word n-grams (all occurrences, not distinct)."""
    if n == 1:
        return tok
    return F.when(
        F.size(tok) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tok) - F.lit(n)),
            lambda i: F.concat_ws(" ", F.slice(tok, i + F.lit(1), n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngrams_sql(tok_expr: str, n: int) -> str:
    if n == 1:
        return tok_expr
    return (
        f"CASE WHEN len({tok_expr}) >= {n} THEN "
        f"list_transform(range(len({tok_expr}) - {n} + 1), "
        f"i -> array_to_string(({tok_expr})[i + 1 : i + {n}], ' ')) "
        "ELSE []::VARCHAR[] END"
    )
