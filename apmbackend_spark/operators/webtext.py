"""HTML -> text extraction (the web-corpus preparation step).

Training corpora sourced from web crawls arrive as HTML; the first pipeline
stage strips markup, drops script/style payloads, decodes character
entities, and normalizes whitespace — at crawl scale this must be a pure
stateless scan. This module implements that stage as a chained
regexp_replace / regexp_count / replace pipeline inside whole-stage codegen:
zero shuffles, zero Python, embarrassingly parallel over 100 TB of pages.

The fixture corpus is plain text, so the gate wraps each document in a
deterministic HTML page first (``synth_html`` — title/nav/heading
boilerplate, a script and a style block, inline tags injected INTO the
body text, and the six common entities), the same synthesize-then-process
pattern as the Y4M/WAV/PNG multimodal gates: the wrapper is pure codegen
over existing columns, so the whole gate stays a deterministic function of
the input tables and the DuckDB oracle replays it exactly.

Engine parity: the regex subset (character classes, non-greedy ``.*?``,
``(?s)`` dotall, alternation) behaves identically in Java util.regex and
RE2 — the same subset discipline as ``pii_scrub``. Entity decode is plain
(non-regex) string replace, chained with ``&amp;`` LAST so freshly decoded
ampersands can't cascade into double-decoding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash64, hash64_sql

# script/style payloads go first — their BODIES may contain '<' that the
# generic tag regex must never see. Non-greedy across the closing tag;
# (?s) because payloads span lines.
SCRIPT_STYLE_RE = "(?s)<(script|style)[^>]*>.*?</(script|style)>"
TAG_RE = "<[^>]*>"
ENTITY_RE = "&(amp|lt|gt|quot|#39|nbsp);"
# Shared whitespace class for the collapse step. NOT \s: Java includes
# \x0B in \s, RE2 does not — the explicit class is identical in both.
WS_RE = "[ \\t\\n\\r\\f\\x0B]+"
# decode order: every named entity BEFORE &amp; (decoding &amp; first would
# turn '&amp;lt;' into '&lt;' and then wrongly into '<')
ENTITY_DECODE: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)


def synth_html(documents: DataFrame) -> DataFrame:
    """Wrap each document in a deterministic HTML page (gate fixture).

    Boilerplate exercises every strip path: a <style> and a <script> block
    (the script body contains a '<' comparison — the case that breaks
    naive tag-regex-only strippers), nav/heading chrome with named
    entities, inline <b> tags injected into the body text, and an unknown
    entity (&copy;) that must SURVIVE decode (unknown entities pass
    through — the lossless behavior).
    """
    did = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        did,
        F.lit("</title><style>p { color: #333; }</style>"),
        F.lit("<script>var id="),
        did,
        F.lit("; if (id < 9 && id > 0) { track(id); }</script>"),
        F.lit('</head><body><nav><a href="/home">Home &amp; Index</a>'),
        F.lit(" &gt; "),
        F.col("source"),
        F.lit("</nav><h1>"),
        F.col("lang"),
        F.lit(" &quot;corpus&quot; &#39;v2&#39;</h1><p>"),
        F.replace(F.col("text"), F.lit(" the "), F.lit(" <b>the</b> ")),
        F.lit("</p><footer>&copy; 2026&nbsp;example</footer></body></html>"),
    )
    return documents.select("doc_id", html.alias("html"))


def synth_html_sql() -> str:
    return (
        "SELECT doc_id, "
        "'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || "
        "'</title><style>p { color: #333; }</style>' || "
        "'<script>var id=' || CAST(doc_id AS VARCHAR) || "
        "'; if (id < 9 && id > 0) { track(id); }</script>' || "
        "'</head><body><nav><a href=\"/home\">Home &amp; Index</a>' || "
        "' &gt; ' || source || '</nav><h1>' || lang || "
        "' &quot;corpus&quot; &#39;v2&#39;</h1><p>' || "
        "replace(text, ' the ', ' <b>the</b> ') || "
        "'</p><footer>&copy; 2026&nbsp;example</footer></body></html>' "
        "AS html FROM documents"
    )


def _strip_expr(html: Column) -> tuple[Column, Column, Column]:
    """(clean, n_tags, n_entities) strip pipeline over an html column."""
    no_script = F.regexp_replace(html, SCRIPT_STYLE_RE, " ")
    n_tags = F.regexp_count(no_script, F.lit(TAG_RE)).cast("long")
    no_tags = F.regexp_replace(no_script, TAG_RE, " ")
    n_entities = F.regexp_count(no_tags, F.lit(ENTITY_RE)).cast("long")
    decoded = no_tags
    for ent, ch in ENTITY_DECODE:
        decoded = F.replace(decoded, F.lit(ent), F.lit(ch))
    # Explicit whitespace class instead of \s: Java regex \s includes
    # vertical tab (\x0B) while DuckDB/RE2 \s does not, so \s+ would make
    # clean/clean_fp diverge between engines on a \x0B-bearing document.
    clean = F.trim(F.regexp_replace(decoded, WS_RE, " "))
    return clean, n_tags, n_entities


def html_strip(html_docs: DataFrame) -> DataFrame:
    """(doc_id, n_tags, n_entities, len_html, len_clean, clean_fp) per page.

    One stateless codegen scan: script/style payload removal -> tag strip
    (tags become spaces so adjacent words never fuse) -> entity count ->
    chained entity decode (amp last) -> whitespace collapse. The cleaned
    text itself is fingerprinted (hash64) so the gate value-checks the
    exact output string without hauling page bodies through the compare.
    """
    clean, n_tags, n_entities = _strip_expr(F.col("html"))
    return html_docs.select(
        "doc_id",
        n_tags.alias("n_tags"),
        n_entities.alias("n_entities"),
        F.length("html").cast("long").alias("len_html"),
        F.length(clean).cast("long").alias("len_clean"),
        hash64(clean).alias("clean_fp"),
    )


def html_strip_oracle_sql() -> str:
    decode = "no_tags"
    for ent, ch in ENTITY_DECODE:
        lit = ch.replace("'", "''")
        decode = f"replace({decode}, '{ent}', '{lit}')"
    return f"""
WITH pages AS ({synth_html_sql()}),
stripped AS (
    SELECT doc_id, html,
           regexp_replace(html, '{SCRIPT_STYLE_RE}', ' ', 'g') AS no_script
    FROM pages
),
tagless AS (
    SELECT doc_id, html, no_script,
           regexp_replace(no_script, '{TAG_RE}', ' ', 'g') AS no_tags
    FROM stripped
),
cleaned AS (
    SELECT doc_id, html, no_script, no_tags,
           trim(regexp_replace({decode}, '{WS_RE}', ' ', 'g')) AS clean
    FROM tagless
)
SELECT doc_id,
       CAST(len(regexp_extract_all(no_script, '{TAG_RE}')) AS BIGINT) AS n_tags,
       CAST(len(regexp_extract_all(no_tags, '{ENTITY_RE}')) AS BIGINT) AS n_entities,
       CAST(length(html) AS BIGINT) AS len_html,
       CAST(length(clean) AS BIGINT) AS len_clean,
       {hash64_sql('clean')} AS clean_fp
FROM cleaned
"""
