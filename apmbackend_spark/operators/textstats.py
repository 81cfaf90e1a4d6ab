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

from pyspark.sql import DataFrame, Window
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


# corpus_filter rule thresholds (C4/Gopher-style deterministic gates)
MIN_TOKENS, MAX_TOKENS = 10, 50_000
MIN_QUALITY = 0.30
MAX_PUNCT = 0.50


def corpus_filter(
    documents: DataFrame,
    min_tokens: int = MIN_TOKENS,
    max_tokens: int = MAX_TOKENS,
    min_quality: float = MIN_QUALITY,
    max_punct: float = MAX_PUNCT,
    keep_lang: str | None = "en",
) -> DataFrame:
    """The keep/drop decision a cleaning pipeline makes from the doc_stats
    signals: fixed rule order, every failed rule named in `reasons` (the
    same cause-accumulation style as the alert pipeline's F6), keep =
    nothing failed. Single scan, zero shuffles — filtering 100 TB is
    embarrassingly parallel."""
    ds = doc_stats(documents)
    rules = [
        (F.col("n_tokens") < min_tokens, "too_short"),
        (F.col("n_tokens") > max_tokens, "too_long"),
        (F.col("quality") < min_quality, "low_quality"),
        (F.col("punct_ratio") > max_punct, "high_punct"),
    ]
    if keep_lang is not None:
        rules.append((F.col("lang_pred") != keep_lang, "wrong_lang"))
    # concat_ws skips NULLs, so un-fired rules vanish from the CSV
    reasons = F.concat_ws(
        ",", *[F.when(cond, F.lit(name)) for cond, name in rules]
    )
    return ds.select(
        "doc_id",
        "n_tokens",
        "quality",
        reasons.alias("reasons"),
    ).withColumn("keep", F.col("reasons") == "")


def corpus_filter_oracle_sql(
    min_tokens: int = MIN_TOKENS,
    max_tokens: int = MAX_TOKENS,
    min_quality: float = MIN_QUALITY,
    max_punct: float = MAX_PUNCT,
    keep_lang: str | None = "en",
) -> str:
    rules = [
        (f"n_tokens < {min_tokens}", "too_short"),
        (f"n_tokens > {max_tokens}", "too_long"),
        (f"quality < {min_quality!r}", "low_quality"),
        (f"punct_ratio > {max_punct!r}", "high_punct"),
    ]
    if keep_lang is not None:
        rules.append((f"lang_pred <> '{keep_lang}'", "wrong_lang"))
    cases = ", ".join(
        f"CASE WHEN {cond} THEN '{name}' END" for cond, name in rules
    )
    return f"""
WITH ds AS (
    SELECT * FROM ({doc_stats_oracle_sql()}) t
), flagged AS (
    SELECT doc_id, n_tokens, quality,
           concat_ws(',', {cases}) AS reasons
    FROM ds
)
SELECT doc_id, n_tokens, quality, reasons, reasons = '' AS keep FROM flagged
"""


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(documents: DataFrame) -> DataFrame:
    """The Gopher quality-filter rule suite (Rae et al. 2021, Appendix A
    — public literature), faithful thresholds: where `corpus_filter` is
    this repo's generic rule engine, this gate implements the PUBLISHED
    rule set a production crawl filter actually ships —

      * word count in [50, 100 000]
      * mean word length in [3, 10] characters
      * symbol-to-word ratio (# and ellipsis) <= 0.1
      * <= 90 % of lines starting with a bullet, <= 30 % ending with an
        ellipsis
      * >= 80 % of words containing an alphabetic character
      * >= 2 distinct hits from the required-stopword set
        {the, be, to, of, and, that, have, with}

    Output per doc: the quality signals, the failed rules as a CSV in
    fixed order (the alert-pipeline cause style), keep = nothing failed.

    Determinism: every fraction is an integer/integer IEEE division and
    every threshold comparison is on exact doubles, so the cut is
    bit-identical across engines. Zero-word docs define mean/alpha as 0.0
    (they fail the word-count rule regardless); null text reads as empty.
    Scale: single codegen scan, zero shuffles — every signal is in-row
    HOF arithmetic."""
    documents = documents.select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    toks = tokens(F.col("text"))
    n_words = F.size(toks)
    nw_d = n_words.cast("double")
    sum_len = F.aggregate(
        F.transform(toks, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    mean_wl = F.when(n_words > 0, sum_len.cast("double") / nw_d).otherwise(
        F.lit(0.0)
    )
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(toks, lambda w: w.rlike("[a-z]"))).cast("double")
        / nw_d,
    ).otherwise(F.lit(0.0))
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(toks),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    )
    n_hash = F.length("text") - F.length(F.replace(F.col("text"), F.lit("#")))
    n_ell = (
        F.length("text") - F.length(F.replace(F.col("text"), F.lit("...")))
    ) / F.lit(3)
    sym_ratio = F.when(
        n_words > 0, (n_hash + n_ell).cast("double") / nw_d
    ).otherwise(F.lit(0.0))
    lines = F.filter(
        F.transform(F.split(F.col("text"), "\n"), lambda l: F.trim(l)),
        lambda l: l != F.lit(""),
    )
    n_lines = F.size(lines)
    nl_d = n_lines.cast("double")
    bullet_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines,
                lambda l: l.startswith("-")
                | l.startswith("*")
                | l.startswith("\u2022"),
            )
        ).cast("double")
        / nl_d,
    ).otherwise(F.lit(0.0))
    ell_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines,
                lambda l: l.endswith("...") | l.endswith("\u2026"),
            )
        ).cast("double")
        / nl_d,
    ).otherwise(F.lit(0.0))
    base = documents.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        bullet_frac.alias("bullet_frac"),
        ell_frac.alias("ellipsis_frac"),
        alpha_frac.alias("alpha_frac"),
        stop_hits.cast("long").alias("stop_hits"),
    )
    rules = [
        (F.col("n_words") < 50, "too_few_words"),
        (F.col("n_words") > 100_000, "too_many_words"),
        (
            (F.col("mean_word_len") < 3.0) | (F.col("mean_word_len") > 10.0),
            "word_length",
        ),
        (F.col("symbol_ratio") > 0.1, "symbol_ratio"),
        (F.col("bullet_frac") > 0.9, "bullet_lines"),
        (F.col("ellipsis_frac") > 0.3, "ellipsis_lines"),
        (F.col("alpha_frac") < 0.8, "low_alpha"),
        (F.col("stop_hits") < 2, "few_stopwords"),
    ]
    reasons = F.concat_ws(
        ",", *[F.when(cond, F.lit(name)) for cond, name in rules]
    )
    return base.select(
        "*", reasons.alias("reasons")
    ).withColumn("keep", F.col("reasons") == "")


def gopher_rules_oracle_sql() -> str:
    t = tokens_sql("text")
    dt = f"list_distinct({t})"
    stop_list = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    lines = (
        "list_filter(list_transform(string_split(text, chr(10)), "
        "l -> trim(l)), l -> l <> '')"
    )
    return f"""
WITH sig AS (
    SELECT doc_id,
           CAST(len({t}) AS BIGINT) AS n_words,
           CASE WHEN len({t}) > 0 THEN
               CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform({t}, w -> CAST(length(w) AS BIGINT))),
                    (a, x) -> a + x) AS DOUBLE)
               / CAST(len({t}) AS DOUBLE)
           ELSE 0.0 END AS mean_word_len,
           CASE WHEN len({t}) > 0 THEN
               CAST((length(text) - length(replace(text, '#', '')))
                    + (length(text) - length(replace(text, '...', ''))) // 3
                    AS DOUBLE) / CAST(len({t}) AS DOUBLE)
           ELSE 0.0 END AS symbol_ratio,
           CASE WHEN len({lines}) > 0 THEN
               CAST(len(list_filter({lines},
                    l -> starts_with(l, '-') OR starts_with(l, '*')
                         OR starts_with(l, chr(8226)))) AS DOUBLE)
               / CAST(len({lines}) AS DOUBLE)
           ELSE 0.0 END AS bullet_frac,
           CASE WHEN len({lines}) > 0 THEN
               CAST(len(list_filter({lines},
                    l -> ends_with(l, '...') OR ends_with(l, chr(8230))))
                    AS DOUBLE)
               / CAST(len({lines}) AS DOUBLE)
           ELSE 0.0 END AS ellipsis_frac,
           CASE WHEN len({t}) > 0 THEN
               CAST(len(list_filter({t}, w -> regexp_matches(w, '[a-z]')))
                    AS DOUBLE) / CAST(len({t}) AS DOUBLE)
           ELSE 0.0 END AS alpha_frac,
           CAST(len(list_filter([{stop_list}],
                s -> list_contains({dt}, s))) AS BIGINT) AS stop_hits
    FROM (SELECT doc_id, COALESCE(text, '') AS text FROM documents)
), flagged AS (
    SELECT *,
           concat_ws(',',
               CASE WHEN n_words < 50 THEN 'too_few_words' END,
               CASE WHEN n_words > 100000 THEN 'too_many_words' END,
               CASE WHEN mean_word_len < 3.0 OR mean_word_len > 10.0
                    THEN 'word_length' END,
               CASE WHEN symbol_ratio > 0.1 THEN 'symbol_ratio' END,
               CASE WHEN bullet_frac > 0.9 THEN 'bullet_lines' END,
               CASE WHEN ellipsis_frac > 0.3 THEN 'ellipsis_lines' END,
               CASE WHEN alpha_frac < 0.8 THEN 'low_alpha' END,
               CASE WHEN stop_hits < 2 THEN 'few_stopwords' END
           ) AS reasons
    FROM sig
)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
       ellipsis_frac, alpha_frac, stop_hits, reasons,
       reasons = '' AS keep
FROM flagged
"""


# mixture-sampling defaults: per-source keep rates in basis points of 10_000
# (unlisted sources fall back to DEFAULT_RATE_BP)
SAMPLE_RATES_BP = {"src0": 10_000, "src1": 7_500, "src2": 5_000, "src3": 2_500}
DEFAULT_RATE_BP = 1_000
_SAMPLE_MOD = 10_000


def corpus_sample(
    documents: DataFrame,
    rates_bp: dict[str, int] | None = None,
    default_bp: int = DEFAULT_RATE_BP,
) -> DataFrame:
    """Deterministic per-source mixture sampling: keep a document iff
    hash64(doc_id) mod 10000 < its source's rate (basis points). This is the
    data-mixture control of a training pipeline — up/down-weight sources by
    rate — and, being a pure hash of the row key, it is reproducible across
    runs, engines, partitionings and retries (a `rand()` sample is none of
    those). Single scan + one broadcast of the tiny rate dim; the filter is
    a pushable deterministic predicate, so sampling composes with pruning."""
    rates = rates_bp if rates_bp is not None else SAMPLE_RATES_BP
    spark = documents.sparkSession
    dim = spark.createDataFrame(
        list(rates.items()), schema="source string, rate_bp int"
    )
    h = hash64(F.col("doc_id").cast("string")) % _SAMPLE_MOD
    return (
        documents.join(F.broadcast(dim), "source", "left")
        .withColumn("rate_bp", F.coalesce(F.col("rate_bp"), F.lit(int(default_bp))))
        .where(h < F.col("rate_bp"))
        .select("doc_id", "source", "rate_bp")
    )


def corpus_sample_oracle_sql(
    rates_bp: dict[str, int] | None = None, default_bp: int = DEFAULT_RATE_BP
) -> str:
    rates = rates_bp if rates_bp is not None else SAMPLE_RATES_BP
    dim_rows = ", ".join(f"('{s}', {int(bp)})" for s, bp in rates.items())
    h = hash64_sql("CAST(doc_id AS VARCHAR)")
    return f"""
WITH dim(source, rate_bp) AS (
    SELECT * FROM (VALUES {dim_rows})
), rated AS (
    SELECT d.doc_id, d.source,
           CAST(COALESCE(m.rate_bp, {int(default_bp)}) AS INT) AS rate_bp
    FROM documents d LEFT JOIN dim m USING (source)
)
SELECT doc_id, source, rate_bp
FROM rated
WHERE ({h}) % {_SAMPLE_MOD} < rate_bp
"""


STRATIFIED_DENOM = 5  # keep ceil(n/5) — exactly 20 % of every stratum


def stratified_sample(
    documents: DataFrame, denom: int = STRATIFIED_DENOM
) -> DataFrame:
    """EXACT-count stratified sampling: every (lang, source) stratum keeps
    exactly ceil(n/denom) documents, chosen by salted-hash order.

    ``corpus_sample`` above is Bernoulli — each row is an independent coin
    flip, so a small stratum can lose every row (or keep all of them) and
    the realized mixture drifts from the target by O(1/sqrt(n)). Training
    mixtures are specified as exact proportions; eval holdouts especially
    must not vanish from rare (lang, source) strata. This operator delivers
    the exact per-stratum count while keeping selection a pure function of
    the row key (stable across runs, engines, partitionings and retries):
    rank rows inside each stratum by hash64('strat:' || doc_id) — doc_id as
    tiebreak — and keep rank r iff (r-1) * denom < stratum_count, i.e.
    r <= ceil(count/denom), in pure integer arithmetic (no float fraction,
    no rounding-mode drift).

    Plan shape: ONE shuffle on the stratum key; row_number + count are two
    window functions over the same (partition, order) spec, so they share a
    single per-partition sort — no global sort, no second exchange. At
    100 TB a single stratum can exceed one task's sort budget; the
    documented flip is the two-pass form (broadcast per-stratum counts,
    keep h < quantile-of-hash threshold with an exact boundary correction)
    — same semantics, scan-shaped. The gate grades the windowed exact form.
    """
    h = hash64(F.concat(F.lit("strat:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang", "source").orderBy(
        h.asc(), F.col("doc_id").asc()
    )
    ranked = documents.select(
        "doc_id",
        "lang",
        "source",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(w.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )).alias("n_stratum"),
    )
    return ranked.where(
        (F.col("rk") - 1) * F.lit(int(denom)) < F.col("n_stratum")
    ).select(
        "doc_id", "lang", "source", F.col("rk").cast("long").alias("rk"),
        F.col("n_stratum").cast("long").alias("n_stratum"),
    )


def stratified_sample_oracle_sql(denom: int = STRATIFIED_DENOM) -> str:
    h = hash64_sql("'strat:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH ranked AS (
    SELECT doc_id, lang, source,
           ROW_NUMBER() OVER (
               PARTITION BY lang, source ORDER BY {h} ASC, doc_id ASC
           ) AS rk,
           COUNT(*) OVER (PARTITION BY lang, source) AS n_stratum
    FROM documents
)
SELECT doc_id, lang, source,
       CAST(rk AS BIGINT) AS rk,
       CAST(n_stratum AS BIGINT) AS n_stratum
FROM ranked
WHERE (rk - 1) * {int(denom)} < n_stratum
"""


SPLIT_MOD = 10_000
# (name, upper-bound in basis points): [0, 9600) train, [9600, 9800) val,
# [9800, 10000) test — contiguous hash ranges so each doc lands in exactly
# one split.
SPLIT_BOUNDS = (("train", 9600), ("val", 9800), ("test", SPLIT_MOD))


def corpus_split(documents: DataFrame) -> DataFrame:
    """Deterministic train/val/test assignment: split = which contiguous
    hash-range bucket hash64('split:' || doc_id) mod 10000 falls in. Like
    corpus_sample this is a pure function of the row key — stable across
    runs, engines, partitionings, retries, and insert order (a rand()/
    randomSplit split is none of those, and re-shuffles membership every
    run). The salt prefix decorrelates it from the sampling hash, so
    splitting composes with sampling without bias. Single scan, no shuffle,
    no joins; the assignment is a when-chain over one hash value."""
    h = hash64(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % SPLIT_MOD
    expr = F.lit(None).cast("string")
    # build the when-chain from the last bound backwards
    for name, ub in reversed(SPLIT_BOUNDS):
        expr = F.when(h < ub, F.lit(name)).otherwise(expr)
    return documents.select(
        "doc_id", "source", expr.alias("split")
    )


def corpus_split_oracle_sql() -> str:
    salted = "'split:' || CAST(doc_id AS VARCHAR)"
    h = f"({hash64_sql(salted)}) % {SPLIT_MOD}"
    cases = " ".join(
        f"WHEN {h} < {ub} THEN '{name}'" for name, ub in SPLIT_BOUNDS
    )
    return f"""
SELECT doc_id, source, CASE {cases} END AS split
FROM documents
"""


# PII scrub patterns (chosen to parse identically under Java regex and
# DuckDB's RE2: no lookaround, no backrefs, ASCII word boundaries only).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"
IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def _with_pii(doc_id, text):
    """Deterministically inject synthetic PII (the fixture corpus is clean
    word soup, so the scrubber needs something to find): an email for
    doc_id%3==0, a phone for %4==1, an IP for %5==2. Built identically in
    the DuckDB oracle so both engines scrub the same input."""
    return F.concat(
        text,
        F.when(
            doc_id % 3 == 0,
            F.concat(F.lit(" contact user"), doc_id.cast("string"), F.lit("@example.com now")),
        ).otherwise(F.lit("")),
        F.when(doc_id % 4 == 1, F.lit(" call 555-867-5309")).otherwise(F.lit("")),
        F.when(
            doc_id % 5 == 2,
            F.concat(F.lit(" from 10.0.0."), (doc_id % 255).cast("string")),
        ).otherwise(F.lit("")),
    )


def corpus_scrub(documents: DataFrame) -> DataFrame:
    """PII redaction pass of a training-data cleaning pipeline: count and
    replace emails / phone numbers / IPv4 addresses with typed placeholder
    tokens. All regexp built-ins (JVM-side, whole-stage codegen) — a single
    scan, zero shuffles, embarrassingly parallel at 100 TB."""
    doc_id = F.col("doc_id")
    aug = _with_pii(doc_id, F.col("text"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, F.lit(EMAIL_RE), F.lit("<EMAIL>")),
            F.lit(IP_RE),
            F.lit("<IP>"),
        ),
        F.lit(PHONE_RE),
        F.lit("<PHONE>"),
    )
    return documents.select(
        "doc_id",
        F.size(F.regexp_extract_all(aug, F.lit(EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(aug, F.lit(PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.size(F.regexp_extract_all(aug, F.lit(IP_RE), F.lit(0)))
        .cast("long")
        .alias("n_ips"),
        scrubbed.alias("scrubbed"),
    )


def corpus_scrub_oracle_sql() -> str:
    aug = (
        "text"
        " || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END"
        " || CASE WHEN doc_id % 4 = 1 THEN ' call 555-867-5309' ELSE '' END"
        " || CASE WHEN doc_id % 5 = 2 THEN ' from 10.0.0.' || CAST(doc_id % 255 AS VARCHAR) ELSE '' END"
    )
    return f"""
WITH aug AS (
    SELECT doc_id, {aug} AS t FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(t, '{IP_RE}')) AS BIGINT) AS n_ips,
       regexp_replace(
           regexp_replace(
               regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{IP_RE}', '<IP>', 'g'),
           '{PHONE_RE}', '<PHONE>', 'g') AS scrubbed
FROM aug
"""


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
           {hash64_sql("COALESCE(array_to_string(tok, ' '), '')")} AS fingerprint
    FROM base
)
SELECT doc_id, lang, source, n_tokens, n_chars_actual, punct_ratio, stop_ratio,
       CASE WHEN stop_ratio >= {LANG_STOP_THRESHOLD!r} THEN 'en' ELSE 'other' END AS lang_pred,
       ({W_LEN!r} * len_score + {W_STOP!r} * least(stop_ratio * 4.0, 1.0)
        - {W_PUNCT!r} * punct_ratio) AS quality,
       fingerprint
FROM m
"""


# ---------------------------------------------------------------------------
# Corpus vocabulary: top-k n-gram frequencies
# ---------------------------------------------------------------------------


def vocab_topk(documents: DataFrame, n: int = 2, k: int = 200) -> DataFrame:
    """Corpus-wide top-k n-gram frequencies (vocabulary / boilerplate audit
    for a training corpus).

    Scale: the count is a plain hash-groupBy on the gram string — fully
    map-side combinable, one shuffle whose width is the distinct-gram count,
    never the token count. The top-k runs as TakeOrderedAndProject (partial
    per-partition top-k merged on the driver), not a global sort. Ties break
    deterministically by (cnt DESC, ngram ASC) so the cutoff is stable
    across engines and partitionings.
    """
    from apmbackend_spark.functions.text import ngrams

    grams = ngrams(tokens(F.col("text")), n)
    return (
        documents.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("ngram"))
        .limit(int(k))
    )


def vocab_topk_oracle_sql(n: int = 2, k: int = 200) -> str:
    from apmbackend_spark.functions.text import ngrams_sql

    return f"""
WITH tok AS (SELECT {tokens_sql('text')} AS t FROM documents),
g AS (SELECT unnest({ngrams_sql('t', n)}) AS ngram FROM tok)
SELECT ngram, COUNT(*) AS cnt FROM g
GROUP BY ngram ORDER BY cnt DESC, ngram LIMIT {int(k)}
"""


# ---------------------------------------------------------------------------
# Intra-document repetition signals (Gopher-style quality gates)
# ---------------------------------------------------------------------------


def doc_repetition(documents: DataFrame, n: int = 2) -> DataFrame:
    """Per-document n-gram repetition: total/distinct gram counts, the
    duplicate-gram fraction (1 - distinct/total), and the most-frequent-gram
    fraction — the classic repetition quality gates for a training corpus.

    Scale: two keyed aggregations on doc_id (gram counts, then the rollup),
    both map-side combinable; the left join back to documents keeps docs too
    short to produce a gram (zeros). No arrays ever leave a task."""
    from apmbackend_spark.functions.text import ngrams

    grams = documents.select(
        "doc_id", F.explode(ngrams(tokens(F.col("text")), n)).alias("g")
    )
    per_gram = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    per_doc = per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_cnt"),
    )
    return (
        documents.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.coalesce(F.col("n_distinct"), F.lit(0)).alias("n_distinct"),
            F.when(
                F.col("n_grams") > 0,
                1.0 - F.col("n_distinct").cast("double") / F.col("n_grams"),
            ).otherwise(F.lit(0.0)).alias("dup_gram_frac"),
            F.when(
                F.col("n_grams") > 0,
                F.col("top_cnt").cast("double") / F.col("n_grams"),
            ).otherwise(F.lit(0.0)).alias("top_gram_frac"),
        )
    )


def doc_repetition_oracle_sql(n: int = 2) -> str:
    from apmbackend_spark.functions.text import ngrams_sql

    return f"""
WITH tok AS (SELECT doc_id, {tokens_sql('text')} AS t FROM documents),
g AS (SELECT doc_id, unnest({ngrams_sql('t', n)}) AS g FROM tok),
per_gram AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY doc_id, g),
per_doc AS (
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_grams,
           COUNT(*) AS n_distinct, MAX(c) AS top_cnt
    FROM per_gram GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_grams, 0) AS n_grams,
       COALESCE(p.n_distinct, 0) AS n_distinct,
       CASE WHEN p.n_grams > 0
            THEN 1.0 - CAST(p.n_distinct AS DOUBLE) / p.n_grams
            ELSE 0.0 END AS dup_gram_frac,
       CASE WHEN p.n_grams > 0
            THEN CAST(p.top_cnt AS DOUBLE) / p.n_grams
            ELSE 0.0 END AS top_gram_frac
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Benchmark contamination detection (decontamination gate)
# ---------------------------------------------------------------------------

CONTAM_N = 5
CONTAM_PROBE_MOD = 97
CONTAM_THRESHOLD = 0.2


def contamination(
    documents: DataFrame,
    probes: DataFrame | None = None,
    n: int = CONTAM_N,
    threshold: float = CONTAM_THRESHOLD,
) -> DataFrame:
    """Per-document benchmark-overlap: the fraction of a doc's DISTINCT word
    n-grams that appear anywhere in the probe (benchmark/eval) corpus, plus
    a keep/drop verdict — the standard decontamination gate before training.

    ``probes`` defaults to the deterministic in-table stand-in (doc_id %
    {mod} == 0), which is then excluded from the scored set; pass the real
    eval corpus in production.

    Scale: probe grams are DISTINCT before the join (the membership test
    needs existence, not counts), the doc side is distinct per (doc_id,
    gram), and the join keys on the gram string — shuffle is bounded by
    distinct-gram volume, never token volume. One pass over the doc grams:
    a LEFT join against the (distinct) probe grams marks hits, then a
    single groupBy counts size and hits together — tokenization runs once,
    not once per aggregate."""
    from apmbackend_spark.functions.text import ngrams

    if probes is None:
        probes = documents.where(F.col("doc_id") % CONTAM_PROBE_MOD == 0)
        scored = documents.where(F.col("doc_id") % CONTAM_PROBE_MOD != 0)
    else:
        scored = documents

    def distinct_grams(df: DataFrame) -> DataFrame:
        return df.select(
            "doc_id", F.explode(F.array_distinct(ngrams(tokens(F.col("text")), n))).alias("g")
        )

    probe_grams = (
        distinct_grams(probes).select("g").distinct().withColumn("hit", F.lit(1))
    )
    # doc_grams rows are unique per (doc_id, g) and probe_grams per g, so
    # the left join is 1:1 — count(1) is the gram count, count(hit) the
    # overlap, in one shuffle-by-g + one shuffle-by-doc_id.
    counts = (
        distinct_grams(scored)
        .join(probe_grams, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("hit").alias("n_hit"),
        )
    )
    return (
        scored.select("doc_id")
        .join(counts, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            F.when(
                F.col("n_grams") > 0,
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("double") / F.col("n_grams"),
            ).otherwise(F.lit(0.0)).alias("contam_frac"),
        )
        .withColumn(
            "contaminated",
            (F.col("contam_frac") >= F.lit(float(threshold))).cast("int"),
        )
    )


def contamination_oracle_sql(
    n: int = CONTAM_N, threshold: float = CONTAM_THRESHOLD
) -> str:
    from apmbackend_spark.functions.text import ngrams_sql

    return f"""
WITH tok AS (SELECT doc_id, {tokens_sql('text')} AS t FROM documents),
dg AS (
    SELECT doc_id, unnest(list_distinct({ngrams_sql('t', n)})) AS g
    FROM tok WHERE doc_id % {CONTAM_PROBE_MOD} <> 0
),
pg AS (
    SELECT DISTINCT unnest(list_distinct({ngrams_sql('t', n)})) AS g
    FROM tok WHERE doc_id % {CONTAM_PROBE_MOD} = 0
),
sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM dg GROUP BY doc_id),
hits AS (
    SELECT dg.doc_id, COUNT(*) AS n_hit FROM dg JOIN pg USING (g) GROUP BY dg.doc_id
)
SELECT d.doc_id,
       COALESCE(s.n_grams, 0) AS n_grams,
       COALESCE(h.n_hit, 0) AS n_hit,
       CASE WHEN s.n_grams > 0
            THEN CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / s.n_grams
            ELSE 0.0 END AS contam_frac,
       CAST(CASE WHEN (CASE WHEN s.n_grams > 0
            THEN CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / s.n_grams
            ELSE 0.0 END) >= {float(threshold)!r} THEN 1 ELSE 0 END AS INT) AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % {CONTAM_PROBE_MOD} <> 0) d
LEFT JOIN sizes s USING (doc_id)
LEFT JOIN hits h USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Corpus cardinality profile: exact distinct counts (+ HLL scale path)
# ---------------------------------------------------------------------------


def corpus_cardinality(documents: DataFrame, approx: bool = False) -> DataFrame:
    """Per-source cardinality profile — the first number a pipeline owner
    asks of a new crawl dump: how many docs, how many DISTINCT documents
    (by normalized-text fingerprint), and the implied duplication ratio.

    approx=False (default, the graded path) uses exact COUNT(DISTINCT):
    at scale this is a two-level shuffle — per-partition partial distinct,
    then merge on (source, fingerprint) — exact but with shuffle volume
    proportional to the distinct count. approx=True switches to
    approx_count_distinct (HyperLogLog++, rsd 1.5%): constant ~KB of sketch
    per group regardless of cardinality, mergeable map-side — the 100 TB
    default, where a 1.5% error on "how many unique docs" is free accuracy
    to trade for removing the distinct shuffle entirely.
    `tests/test_dedup.py::test_corpus_cardinality_hll_close_to_exact`
    pins the two paths against each other.
    """
    fp = hash64(F.concat_ws(" ", tokens(F.col("text"))))
    d = documents.select("source", fp.alias("fingerprint"))
    n_distinct = (
        F.approx_count_distinct("fingerprint")
        if approx
        else F.countDistinct("fingerprint")
    )
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            n_distinct.alias("n_distinct"),
        )
        .select(
            "source",
            "n_docs",
            "n_distinct",
            (
                F.lit(1.0)
                - F.col("n_distinct").cast("double") / F.col("n_docs").cast("double")
            ).alias("dup_ratio"),
        )
    )


def corpus_cardinality_oracle_sql() -> str:
    fp = hash64_sql(f"COALESCE(array_to_string({tokens_sql('text')}, ' '), '')")
    return f"""
WITH d AS (
    SELECT source, {fp} AS fingerprint FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT fingerprint) AS BIGINT) AS n_distinct,
       (1.0 - CAST(COUNT(DISTINCT fingerprint) AS DOUBLE) / COUNT(*)) AS dup_ratio
FROM d GROUP BY source
"""


# ---------------------------------------------------------------------------
# Token accounting: whitespace tokens vs BPE-pretokenizer segments
# ---------------------------------------------------------------------------


def doc_token_counts(documents: DataFrame) -> DataFrame:
    """Per-document token accounting with BOTH counting conventions a
    training pipeline budgets in: whitespace/punct word tokens (corpus
    analytics) and BPE pre-tokenizer segments (what a byte-level BPE
    actually merges within — the proxy for sequence length / cost), plus
    bytes-per-segment, the fertility signal used to spot
    tokenizer-hostile content (code, tables, non-language bytes).

    Single scan, zero shuffles, all whole-stage-codegen regex — the same
    shape as doc_stats."""
    from apmbackend_spark.functions.text import bpe_tokens

    seg = F.size(bpe_tokens(F.col("text")))
    return documents.select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).alias("n_ws_tokens"),
        seg.alias("n_bpe_segments"),
        F.length("text").alias("n_chars"),
        F.when(
            seg > 0, F.length("text").cast("double") / seg.cast("double")
        )
        .otherwise(F.lit(0.0))
        .alias("chars_per_segment"),
    )


def doc_token_counts_oracle_sql() -> str:
    from apmbackend_spark.functions.text import bpe_tokens_sql

    seg = f"len({bpe_tokens_sql('text')})"
    return f"""
SELECT doc_id, source,
       CAST(len({tokens_sql('text')}) AS INT) AS n_ws_tokens,
       CAST({seg} AS INT) AS n_bpe_segments,
       CAST(length(text) AS INT) AS n_chars,
       CASE WHEN {seg} > 0
            THEN CAST(length(text) AS DOUBLE) / {seg}
            ELSE 0.0 END AS chars_per_segment
FROM documents
"""


# ---------------------------------------------------------------------------
# URL / domain profile (C4-style domain filtering input)

URL_HOST_RE = r"https?://([A-Za-z0-9.-]+)"

# Demo blocklist (production: a broadcast dim table or Bloom filter built
# from the real list; semantics identical — the membership test runs
# map-side either way).
BLOCKED_DOMAINS = ("spam.example.net", "site3.example.com")


def _with_urls(doc_id, text):
    """Deterministically inject synthetic URLs (the fixture corpus has
    none): a per-doc .example.com link for even doc_ids, a blocklisted
    domain for doc_id%11==3. Mirrored in the DuckDB oracle."""
    return F.concat(
        text,
        F.when(
            doc_id % 2 == 0,
            F.concat(
                F.lit(" see https://site"),
                (doc_id % 7).cast("string"),
                F.lit(".example.com/page"),
                doc_id.cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            doc_id % 11 == 3, F.lit(" ref https://spam.example.net/x")
        ).otherwise(F.lit("")),
    )


def url_domains(documents: DataFrame) -> DataFrame:
    """Per-domain URL profile over the corpus: how many URLs and how many
    distinct documents reference each domain, with the blocklist verdict —
    the aggregation that drives C4-style domain filtering decisions.

    Scale shape: host extraction is a codegen regexp scan; only (doc_id,
    domain) pairs shuffle (text never leaves the scan); the rollup is one
    hash aggregate keyed on domain. The blocklist is a tiny literal IN
    (broadcast dim join in production) evaluated map-side."""
    doc_id = F.col("doc_id")
    aug = _with_urls(doc_id, F.col("text"))
    pairs = documents.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(aug, F.lit(URL_HOST_RE), F.lit(1))
        ).alias("domain"),
    )
    return (
        pairs.groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .withColumn(
            "blocked", F.col("domain").isin(*BLOCKED_DOMAINS).cast("int")
        )
    )


def url_domains_oracle_sql() -> str:
    aug = (
        "text"
        " || CASE WHEN doc_id % 2 = 0 THEN ' see https://site' || CAST(doc_id % 7 AS VARCHAR)"
        " || '.example.com/page' || CAST(doc_id AS VARCHAR) ELSE '' END"
        " || CASE WHEN doc_id % 11 = 3 THEN ' ref https://spam.example.net/x' ELSE '' END"
    )
    blocked = ", ".join(f"'{d}'" for d in BLOCKED_DOMAINS)
    return f"""
WITH aug AS (
    SELECT doc_id, {aug} AS t FROM documents
), pairs AS (
    SELECT doc_id, unnest(regexp_extract_all(t, '{URL_HOST_RE}', 1)) AS domain
    FROM aug
)
SELECT domain,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(CASE WHEN domain IN ({blocked}) THEN 1 ELSE 0 END AS INT) AS blocked
FROM pairs
GROUP BY domain
"""


# ---------------------------------------------------------------------------
# BPE merge-iteration pair counting (tokenizer training support)

BPE_PAIR_TOPK = 100


def bpe_pair_counts(documents: DataFrame, k: int = BPE_PAIR_TOPK) -> DataFrame:
    """The counting step of one BPE merge iteration (Sennrich-style): count
    adjacent CHARACTER pairs across the corpus, weighted by pre-token
    frequency — the statistic a byte-pair-encoding trainer maximizes when
    choosing its next merge. Returns the top-k (pair, n) with a
    deterministic (n DESC, pair ASC) tie-break.

    Scale shape, the Sennrich trick made distributed: pairs are counted
    over DISTINCT pre-tokens × their corpus frequency, so the expensive
    char-pair explode runs once per distinct pre-token (vocabulary-bounded,
    sub-linear in corpus bytes) rather than once per occurrence. Two hash
    aggregates (pretoken freq, then pair rollup — both map-side
    combinable); the top-k is TakeOrderedAndProject over the
    alphabet²-bounded pair set, never a global data sort."""
    from apmbackend_spark.functions.text import bpe_tokens

    pretok = documents.select(
        F.explode(bpe_tokens(F.col("text"))).alias("w")
    )
    freq = pretok.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    # sequence(1, 0) runs DESCENDING in Spark ([1, 0]) — a 1-char pretoken
    # would emit two phantom self-pairs; gate to an empty array (same
    # pitfall as functions.text.shingles)
    pairs = freq.select(
        "freq",
        F.explode(
            F.expr(
                "transform("
                " if(length(w) >= 2, sequence(1, length(w) - 1), array()),"
                " i -> substring(w, i, 2))"
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair"))
        .limit(int(k))
    )


def bpe_pair_counts_oracle_sql(k: int = BPE_PAIR_TOPK) -> str:
    from apmbackend_spark.functions.text import bpe_tokens_sql

    return f"""
WITH pretok AS (
    SELECT unnest({bpe_tokens_sql('text')}) AS w FROM documents
), freq AS (
    SELECT w, COUNT(*) AS freq FROM pretok GROUP BY w
), pairs AS (
    SELECT freq, unnest(list_transform(
        range(1, greatest(length(w) - 1, 0) + 1),
        i -> substr(w, i, 2)
    )) AS pair
    FROM freq
)
SELECT pair, CAST(SUM(freq) AS BIGINT) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair LIMIT {int(k)}
"""


# ---------------------------------------------------------------------------
# PII scrubbing (redaction + accounting).
# ---------------------------------------------------------------------------

# Patterns kept to the regex subset Java (Spark) and RE2 (DuckDB) render
# identically: character classes, bounded quantifiers, \b, no backrefs.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"


def _pii_injected_text():
    """The fixture corpus is clean synthetic prose, so the gate injects
    deterministic PII spans IN-PLAN (the same in-plan synthesis trick as
    log_extract) — every doc gets one email and one IPv4, every third doc
    a phone number — and the operator under test is the scrub itself."""
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.lit(" contact user"),
        did.cast("string"),
        F.lit("@example.com from 10."),
        (did % 200).cast("string"),
        F.lit("."),
        (did % 97).cast("string"),
        F.lit(".7"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((did % 1000).cast("string"), 3, "0"),
                F.lit("-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )


def pii_scrub(documents: DataFrame) -> DataFrame:
    """PII redaction with per-document accounting — the compliance pass a
    training-data pipeline runs before anything leaves the lake: emails,
    IPv4 addresses, and phone numbers replaced by typed placeholders, in a
    FIXED rule order (emails first — an address inside a URL-ish span must
    be gone before the IP pattern sees the text), with match counts and a
    fingerprint of the scrubbed text so the redaction is value-checkable.

    Single stateless scan, zero shuffles, zero Python: regexp_count +
    chained regexp_replace inside whole-stage codegen — filtering 100 TB
    of text is embarrassingly parallel and must stay that way."""
    txt = _pii_injected_text()
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(txt, PII_EMAIL_RE, "<EMAIL>"),
            PII_IP_RE,
            "<IP>",
        ),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return documents.select(
        "doc_id",
        F.regexp_count(txt, F.lit(PII_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(
            F.regexp_replace(txt, PII_EMAIL_RE, "<EMAIL>"), F.lit(PII_IP_RE)
        )
        .cast("long")
        .alias("n_ips"),
        F.regexp_count(txt, F.lit(PII_PHONE_RE)).cast("long").alias("n_phones"),
        (F.length(txt) - F.length(scrubbed)).cast("long").alias("n_chars_delta"),
        hash64(scrubbed).alias("clean_fp"),
    )


def pii_scrub_oracle_sql() -> str:
    txt = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
        "'@example.com from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.' || "
        "CAST(doc_id % 97 AS VARCHAR) || '.7' || "
        "CASE WHEN doc_id % 3 = 0 THEN ' call 555-' || "
        "lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || "
        "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
    )
    email, ip, phone = PII_EMAIL_RE, PII_IP_RE, PII_PHONE_RE
    scrub = (
        f"regexp_replace(regexp_replace(regexp_replace(txt, '{email}', "
        f"'<EMAIL>', 'g'), '{ip}', '<IP>', 'g'), '{phone}', '<PHONE>', 'g')"
    )
    return f"""
WITH base AS (
    SELECT doc_id, {txt} AS txt FROM documents
), scrubbed AS (
    SELECT doc_id, txt, {scrub} AS clean FROM base
)
SELECT doc_id,
       CAST(len(regexp_extract_all(txt, '{email}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(regexp_replace(txt, '{email}', '<EMAIL>', 'g'), '{ip}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(txt, '{phone}')) AS BIGINT) AS n_phones,
       CAST(length(txt) - length(clean) AS BIGINT) AS n_chars_delta,
       {hash64_sql('clean')} AS clean_fp
FROM scrubbed
"""


# ---------------------------------------------------------------------------
# BPE merge-table training (the iterative trainer itself).
# ---------------------------------------------------------------------------

BPE_TRAIN_MERGES = 6
# GPT-2's space marker: pretokens can CARRY a leading space (the " ?" in
# BPE_PRETOKEN_RE), and the symbol-sequence encoding below uses ' ' as the
# symbol separator, so the in-token space is remapped to this marker first.
# (Collision caveat: an input that already contains "Ġ" would alias with
# the marker — the pretokenizer's ASCII classes make that impossible for
# the fixture corpus, and GPT-2 itself has the same property.)
BPE_SPACE_MARKER = "Ġ"  # Ġ


def _bpe_apply_merge(seq, pair, merged):
    """Canonical one-merge application on a space-separated symbol string:
    non-overlapping, leftmost-first — the textbook Sennrich scan, as a
    codegen LEFT FOLD over the symbol array.

    (The previous two-pass string-replace rendering was NOT canonical for
    SELF-pair merges: on an odd run "a a a a a" a replace scan pairs
    (0,1),(3,4) — "aa a aa" — while leftmost-greedy pairing is
    (0,1),(2,3) — "aa aa a". The hypothesis property test caught it.)

    Fold state = (emitted symbols, one pending carry): each symbol either
    completes the pair with the carry (emit the merged symbol, clear the
    carry — so the next symbol starts fresh, which IS the non-overlap
    rule), or flushes the carry and becomes the new one. Pretokens are
    word-length, so the per-row fold is tiny; everything stays in
    whole-stage codegen. Property-tested against a symbol-list reference
    implementation in test_quality_ops; the DuckDB oracle renders the
    identical fold with list_reduce."""
    a_sym = F.split(pair, " ").getItem(0)
    b_sym = F.split(pair, " ").getItem(1)
    arr = F.split(seq, " ")
    init = F.struct(
        F.array().cast("array<string>").alias("acc"),
        F.lit(None).cast("string").alias("carry"),
    )

    def step(st, s):
        return (
            F.when(
                st["carry"].isNull(),
                F.struct(st["acc"].alias("acc"), s.alias("carry")),
            )
            .when(
                (st["carry"] == a_sym) & (s == b_sym),
                F.struct(
                    F.concat(st["acc"], F.array(merged)).alias("acc"),
                    F.lit(None).cast("string").alias("carry"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(st["acc"], F.array(st["carry"])).alias("acc"),
                    s.alias("carry"),
                )
            )
        )

    def finish(st):
        return F.concat_ws(
            " ",
            F.when(st["carry"].isNull(), st["acc"]).otherwise(
                F.concat(st["acc"], F.array(st["carry"]))
            ),
        )

    return F.aggregate(arr, init, step, finish)


BPE_BATCH = 8  # max merges selected per Spark job (1 = pure sequential)


def bpe_train(
    documents: DataFrame,
    n_merges: int = BPE_TRAIN_MERGES,
    batch: int = BPE_BATCH,
) -> DataFrame:
    """Train a BPE merge TABLE (step, pair, n) over the corpus — the
    Sennrich trainer loop itself, not just its counting step: count
    adjacent symbol pairs over DISTINCT pretokens weighted by corpus
    frequency, take the argmax (count DESC, pair ASC tie-break — fully
    discrete, no floats anywhere), apply the merge to the vocabulary,
    repeat.

    BATCHED selection (the production form — one job per merge would be
    32k sequential jobs for a real tokenizer): each job selects up to
    ``batch`` merges, provably IDENTICAL to the one-at-a-time sequence.
    The job computes pair counts plus, for the head of the candidate
    list, the max count of any symbol TRIPLE containing the candidate
    (as left or right sub-pair). The driver accepts a PREFIX of the
    (count DESC, pair ASC)-sorted candidates that is mutually
    symbol-disjoint, stopping at the first candidate whose count does
    not STRICTLY exceed the running triple bound M of already-accepted
    merges. Why that equals sequential: (a) mutually-disjoint merges
    leave each other's counts untouched and commute under application;
    (b) applying an accepted merge can only create/raise pairs that
    CONTAIN its merged symbol, and any such pair's count is bounded by
    some triple count containing the accepted pair — i.e. by M; so while
    the next candidate's exact count beats M it beats every merge-created
    pair too; (c) a candidate SHARING a symbol with an accepted merge may
    have had its count reduced, so the prefix stops there (never
    skip-and-continue — a reduced-count candidate might still outrank the
    next disjoint one); (d) a candidate containing an accepted merge's
    MERGED string as one of its symbols (possible only if that string
    pre-exists via a different derivation) may have had its count RAISED,
    so the merged form taints the used-set and stops the prefix too.
    Replay-verified equal to batch=1 in test_quality_ops (fixture corpus
    + adversarial chains); the (c)/(d) stop rules are additionally
    unit-tested directly on ``_accept_prefix``.

    Scale shape: the expensive part (corpus scan -> pretoken frequency)
    is ONE pass, after which every job runs on the DISTINCT-pretoken
    frame — vocabulary-bounded, sub-linear in corpus bytes, the same
    Sennrich trick ``bpe_pair_counts`` documents. Each job is two
    map-side-combinable rollups (pairs + candidate-filtered triples);
    driver traffic is the <= ~3*batch candidate/bound rows per job; all
    accepted merges apply to the vocab in ONE chained-expression pass.
    The evolving vocab is localCheckpoint-pinned per round (flat plans,
    no re-derivation of the corpus scan).

    Reference anchor: this is the training-side complement of the engine's
    tokenizer-fertility accounting (``doc_token_counts``/``bpe_pair_counts``);
    the merge table is what a byte-level tokenizer ships as merges.txt.
    """
    merges, _, _ = _bpe_train_frames(documents, n_merges, batch)
    return documents.sparkSession.createDataFrame(
        merges, schema="step int, pair string, n long"
    )


def _wide(df, *keys):
    """Pinned-count keyed repartition (window_stats' REPARTITION_BY_NUM
    precedent): the distinct-pretoken vocab frame is bytes-small, so AQE
    coalesces it to ONE post-shuffle partition and localCheckpoint pins
    that layout — every selection job's pair explode/count and every
    merge application then run map-side on a single core. Hash placement
    by key is deterministic; all consumers are per-row rewrites or
    order-free keyed aggregates, so results are unchanged."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *[F.col(k) for k in keys])


def _bpe_train_frames(
    documents: DataFrame, n_merges: int, batch: int = BPE_BATCH
):
    """The trainer loop, returning (merges list, final vocab DataFrame with
    (w, seq, freq), n_selection_jobs) so ``bpe_encode`` can apply the
    trained table without re-deriving it."""
    from apmbackend_spark.functions.text import bpe_tokens

    pretok = documents.select(F.explode(bpe_tokens(F.col("text"))).alias("w"))
    freq = pretok.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    # char-split into a space-separated symbol string, space -> Ġ first
    seq0 = F.trim(
        F.regexp_replace(
            F.replace(F.col("w"), F.lit(" "), F.lit(BPE_SPACE_MARKER)),
            "(.)",
            "$1 ",
        )
    )
    vocab = _wide(
        freq.select("w", seq0.alias("seq"), "freq"), "w"
    ).localCheckpoint()

    merges: list[tuple[int, str, int]] = []
    n_jobs = 0
    while len(merges) < int(n_merges):
        want = int(n_merges) - len(merges)
        head = _bpe_select_batch(vocab, min(int(batch), want))
        n_jobs += 1
        if not head:
            break
        expr = F.col("seq")
        for pair, n in head:
            merges.append((len(merges) + 1, pair, n))
            expr = _bpe_apply_merge(
                expr, F.lit(pair), F.lit(pair.replace(" ", ""))
            )
        # no repartition here: vocab is already wide-pinned and the
        # per-row merge rewrite preserves its layout
        vocab = vocab.select("w", expr.alias("seq"), "freq").localCheckpoint(
            eager=False
        )
    return merges, vocab, n_jobs


def _bpe_select_batch(vocab: DataFrame, batch: int) -> list[tuple[str, int]]:
    """One selection job: exact pair counts + triple bounds for the
    candidate head, then the driver-side prefix-acceptance walk described
    in ``bpe_train``. Returns [(pair, n), ...] in merge order."""
    arr = F.split(F.col("seq"), " ")
    pair_idx = F.when(
        F.size(arr) >= 2, F.sequence(F.lit(1), F.size(arr) - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = vocab.select(
        "freq",
        F.explode(
            F.transform(
                pair_idx,
                lambda i: F.concat(
                    F.element_at(arr, i), F.lit(" "), F.element_at(arr, i + 1)
                ),
            )
        ).alias("pair"),
    )
    # head of the candidate list: batch disjoint accepts need at most
    # batch entries, +1 to know the count that ends the prefix
    cands = (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(int(batch) * 2 + 1)
        .collect()
    )
    if not cands:
        return []
    if int(batch) <= 1 or len(cands) == 1:
        return [(cands[0]["pair"], int(cands[0]["n"]))]
    # triple bounds for the head candidates: max count of any symbol
    # triple whose left or right sub-pair is a candidate
    cand_pairs = [r["pair"] for r in cands]
    tri_idx = F.when(
        F.size(arr) >= 3, F.sequence(F.lit(1), F.size(arr) - 2)
    ).otherwise(F.array().cast("array<int>"))
    tris = vocab.select(
        "freq",
        F.explode(
            F.transform(
                tri_idx,
                lambda i: F.struct(
                    F.concat(
                        F.element_at(arr, i),
                        F.lit(" "),
                        F.element_at(arr, i + 1),
                    ).alias("p12"),
                    F.concat(
                        F.element_at(arr, i + 1),
                        F.lit(" "),
                        F.element_at(arr, i + 2),
                    ).alias("p23"),
                    F.concat(
                        F.element_at(arr, i),
                        F.lit(" "),
                        F.element_at(arr, i + 1),
                        F.lit(" "),
                        F.element_at(arr, i + 2),
                    ).alias("trip"),
                ),
            )
        ).alias("t"),
    ).where(
        F.col("t.p12").isin(cand_pairs) | F.col("t.p23").isin(cand_pairs)
    )
    tcounts = tris.groupBy("t.trip", "t.p12", "t.p23").agg(
        F.sum("freq").alias("tn")
    )
    # bounds are only ever read for CANDIDATE pairs (_accept_prefix walks
    # the candidate head), so restrict the rollup to them before the
    # collect: the driver structure is then <= 2*batch+1 rows, a config
    # constant — never corpus-vocabulary-sized (r10 verdict item 6)
    bound_rows = (
        tcounts.select(F.col("p12").alias("pair"), "tn")
        .unionAll(tcounts.select(F.col("p23").alias("pair"), "tn"))
        .where(F.col("pair").isin(cand_pairs))
        .groupBy("pair")
        .agg(F.max("tn").alias("bound"))
        .collect()
    )
    bounds = {r["pair"]: int(r["bound"]) for r in bound_rows}
    return _accept_prefix(
        [(r["pair"], int(r["n"])) for r in cands], bounds, int(batch)
    )


def _accept_prefix(
    cands: list[tuple[str, int]],
    bounds: dict[str, int],
    batch: int,
) -> list[tuple[str, int]]:
    """Driver-side prefix-acceptance walk over the (count DESC, pair ASC)
    sorted candidate head — pure so the stop rules are unit-testable
    without a Spark job (``tests/test_quality_ops.py``)."""
    accepted: list[tuple[str, int]] = []
    used: set[str] = set()
    m_bound = -1  # best possible merge-created pair count so far
    for pair, n in cands:
        if accepted:
            if n <= m_bound:
                break  # a merge-created pair could outrank this candidate
            syms = set(pair.split(" "))
            if syms & used:
                # Count may have DROPPED (shares a constituent symbol of
                # an accepted merge) or may have been RAISED (contains an
                # accepted merge's MERGED symbol, which can pre-exist as
                # a symbol via a different derivation — e.g. accept
                # ('a','b') while 'ab' is already a vocabulary symbol).
                # Either way the collected count is stale; never
                # skip-and-continue.
                break
        accepted.append((pair, n))
        used.update(pair.split(" "))
        # The merged symbol the accepted pair CREATES also taints later
        # candidates: a candidate containing it would have its count
        # raised by applying this merge, so its collected (pre-merge)
        # count understates the sequential trainer's view. (No reachable
        # corpus state has been found where the merged string pre-exists
        # as a live symbol next to another — 260k-trial search — but the
        # guard is pure insurance: stopping early is always correct, at
        # worst one extra job.)
        used.add(pair.replace(" ", ""))
        m_bound = max(m_bound, bounds.get(pair, 0))
        if len(accepted) >= batch:
            break
    return accepted


def bpe_encode(
    documents: DataFrame, n_merges: int = BPE_TRAIN_MERGES
) -> DataFrame:
    """ENCODE the corpus with the trained merge table: per document, the
    pretoken count and the token count under the n_merges-trained
    tokenizer — the fertility measurement that closes the tokenizer loop
    (train -> apply -> count). A rising tokens/pretokens ratio on new data
    is the standard signal that a tokenizer no longer fits its corpus.

    Scale shape: training and application both live on the
    distinct-pretoken frame; the per-document pass is one explode plus a
    BROADCAST join against the (w -> token count) dim — vocabulary-sized,
    tiny — then a map-side-combinable per-doc sum. Text bytes never
    shuffle. All-integer outputs (the fertility division is the
    consumer's, keeping the gate float-free).
    """
    _, vocab, _ = _bpe_train_frames(documents, n_merges)
    from apmbackend_spark.functions.text import bpe_tokens

    dim = vocab.select(
        "w", F.size(F.split(F.col("seq"), " ")).cast("long").alias("n_tok")
    )
    per = documents.select(
        "doc_id", F.explode(bpe_tokens(F.col("text"))).alias("w")
    )
    return (
        per.join(F.broadcast(dim), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_pretok"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


def _bpe_chain_ctes(n_merges: int, final_apply: bool, rule: str = "count"):
    """Shared CTE chain for the trainer/encoder oracles: returns (ctes
    list, last_seq_cte_name). ``final_apply`` also applies the LAST merge
    (the trainer's output needs only the argmaxes; the encoder needs the
    fully-merged vocabulary). Every seq CTE carries ``w`` so the encoder
    can join back per document. ``rule`` picks the selection:
    "count" = Sennrich BPE (n DESC), "wordpiece" = Schuster-Nakajima
    likelihood score L(n) - L(c_left) - L(c_right) in the exact
    fixed-point log2 (b_i then also carries the score)."""
    from apmbackend_spark.functions.text import bpe_tokens_sql

    def pairs_cte(seq_cte: str) -> str:
        return f"""(
        SELECT pair, CAST(SUM(freq) AS BIGINT) AS n FROM (
            SELECT freq, unnest(list_transform(
                range(1, greatest(len(a) - 1, 0) + 1),
                i -> a[i] || ' ' || a[i + 1]
            )) AS pair
            FROM (SELECT string_split(seq, ' ') AS a, freq FROM {seq_cte})
        ) GROUP BY pair)"""

    def apply_cte(seq_cte: str, best_cte: str) -> str:
        # Canonical leftmost non-overlapping merge as a SCALAR string
        # fold: elements are ' '||symbol, the accumulator is the
        # space-prefixed output string, and a step merges iff the
        # accumulator's LAST token equals the pair's left symbol and the
        # incoming element is the right one. Equivalent to the Spark
        # side's carry-struct fold: a just-merged token is pa+pb which
        # can never equal pa (pb nonempty), so a merged token never
        # re-merges as the left side — the non-overlap rule — while any
        # ORIGINAL pa token, including one right after a merge, remains
        # eligible — the leftmost-greedy rule. (A struct-accumulator
        # list_reduce rendering mis-executed on DuckDB 1.0 — dropped row
        # prefixes under vectorization — hence the scalar form.) The best
        # pair rides a LEFT JOIN ON TRUE so an empty best leaves the
        # vocabulary untouched (NULL comparisons fall to the else
        # branch).
        fold = """list_reduce(
            list_transform(string_split(seq, ' '), s -> ' ' || s),
            (acc, x) -> CASE
                WHEN ends_with(acc, ' ' || pa) AND x = ' ' || pb
                    THEN left(acc, length(acc) - length(pa) - 1)
                         || ' ' || pm
                ELSE acc || x
            END
        )"""
        return f"""
    SELECT w, trim({fold}) AS seq, freq
    FROM {seq_cte}
    LEFT JOIN (
        SELECT string_split(pair, ' ')[1] AS pa,
               string_split(pair, ' ')[2] AS pb,
               replace(pair, ' ', '') AS pm
        FROM {best_cte}
    ) ON TRUE"""

    # MATERIALIZED is load-bearing: DuckDB inlines a plain CTE at every
    # reference, and seq_i is referenced by BOTH b_(i+1) and seq_(i+1) (and
    # each replace references b_i's scalar subqueries twice) — the inlined
    # chain re-derives the whole corpus scan exponentially many times and
    # the 6-merge oracle never finishes. Materializing each stage pins the
    # chain to linear work, mirroring the Spark side's localCheckpoint.
    ctes = [
        f"""pretok AS (
    SELECT unnest({bpe_tokens_sql('text')}) AS w FROM documents
), freq AS (
    SELECT w, COUNT(*) AS freq FROM pretok GROUP BY w
), seq_0 AS MATERIALIZED (
    SELECT w, trim(regexp_replace(replace(w, ' ', '{BPE_SPACE_MARKER}'),
                               '(.)', '\\1 ', 'g')) AS seq, freq
    FROM freq
)"""
    ]
    last = "seq_0"
    for i in range(1, int(n_merges) + 1):
        if rule == "wordpiece":
            from apmbackend_spark.operators.selection import log2fix_sql

            score = (
                f"{log2fix_sql('p.n')} - {log2fix_sql('sa.c')}"
                f" - {log2fix_sql('sb.c')}"
            )
            ctes.append(
                f"""sym_{i} AS MATERIALIZED (
    SELECT s, CAST(SUM(freq) AS BIGINT) AS c FROM (
        SELECT freq, unnest(string_split(seq, ' ')) AS s FROM seq_{i - 1}
    ) GROUP BY s
)"""
            )
            ctes.append(
                f"""b_{i} AS MATERIALIZED (
    SELECT pair, n, score FROM (
        SELECT p.pair, p.n, {score} AS score
        FROM {pairs_cte(f'seq_{i - 1}')} p
        JOIN sym_{i} sa ON sa.s = string_split(p.pair, ' ')[1]
        JOIN sym_{i} sb ON sb.s = string_split(p.pair, ' ')[2]
    ) ORDER BY score DESC, pair ASC LIMIT 1
)"""
            )
        else:
            ctes.append(
                f"b_{i} AS MATERIALIZED (SELECT pair, n FROM {pairs_cte(f'seq_{i - 1}')} "
                f"ORDER BY n DESC, pair ASC LIMIT 1)"
            )
        if i < int(n_merges) or final_apply:
            ctes.append(
                f"seq_{i} AS MATERIALIZED ({apply_cte(f'seq_{i - 1}', f'b_{i}')})"
            )
            last = f"seq_{i}"
    return ctes, last


def bpe_train_oracle_sql(n_merges: int = BPE_TRAIN_MERGES) -> str:
    ctes, _ = _bpe_chain_ctes(n_merges, final_apply=False)
    selects = [
        f"SELECT CAST({i} AS INT) AS step, pair, n FROM b_{i}"
        for i in range(1, int(n_merges) + 1)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def bpe_encode_oracle_sql(n_merges: int = BPE_TRAIN_MERGES) -> str:
    from apmbackend_spark.functions.text import bpe_tokens_sql

    ctes, last = _bpe_chain_ctes(n_merges, final_apply=True)
    ctes.append(
        f"dim AS (SELECT w, CAST(len(string_split(seq, ' ')) AS BIGINT) "
        f"AS n_tok FROM {last})"
    )
    ctes.append(
        f"per AS (SELECT doc_id, unnest({bpe_tokens_sql('text')}) AS w "
        "FROM documents)"
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT doc_id,
       COUNT(*) AS n_pretok,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM per JOIN dim USING (w)
GROUP BY doc_id
"""
    )


# ---------------------------------------------------------------------------
# Canonical URL normalization (crawl-frontier / URL-level dedup)

# Crawl pipelines dedup at the URL level before ever fetching or comparing
# text: the same page hides behind case-varied hosts, www prefixes,
# tracking parameters, reordered query strings, and fragments. Rule order
# (each a single codegen regexp / higher-order-function step, both engines):
#   1. strip the fragment;
#   2. lowercase scheme and host, drop a leading "www.";
#   3. drop utm_* tracking parameters, sort the survivors (order-insensitive
#      query equality), re-join;
#   4. empty path -> "/".


def canonical_url(url):
    """Codegen canonicalization of a URL column — no UDF, no shuffle."""
    u = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(u, r"://([^/?#]+)", 1)), r"^www\.", ""
    )
    path = F.regexp_extract(u, r"://[^/?#]+(/[^?#]*)", 1)
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (~p.startswith("utm_")) & (p != F.lit("")),
        )
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(
            F.size(params) > 0,
            F.concat(F.lit("?"), F.array_join(params, "&")),
        ).otherwise(F.lit("")),
    )


def _canonical_url_sql(url: str) -> str:
    u = f"regexp_replace({url}, '#.*$', '')"
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    host = (
        f"regexp_replace(lower(regexp_extract({u}, '://([^/?#]+)', 1)),"
        " '^www\\.', '')"
    )
    path = f"regexp_extract({u}, '://[^/?#]+(/[^?#]*)', 1)"
    query = f"regexp_extract({u}, '\\?(.*)$', 1)"
    params = (
        f"list_sort(list_filter(string_split({query}, '&'),"
        " p -> NOT starts_with(p, 'utm_') AND p <> ''))"
    )
    return (
        f"{scheme} || '://' || {host}"
        f" || CASE WHEN {path} = '' THEN '/' ELSE {path} END"
        f" || CASE WHEN len({params}) > 0"
        f" THEN '?' || array_to_string({params}, '&') ELSE '' END"
    )


def _messy_url(doc_id):
    """Deterministic messy-URL synthesis (the fixture has no URL column):
    case-varied scheme/host, optional www, utm noise in shuffled param
    order, occasional fragment — 270 canonical targets, many variants
    each. Mirrored in the oracle."""
    return F.concat(
        F.when(doc_id % 3 == 0, F.lit("HTTPS")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(doc_id % 4 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.when(doc_id % 5 == 0, F.lit("Site")).otherwise(F.lit("site")),
        (doc_id % 6).cast("string"),
        F.lit(".example.com/p/"),
        (doc_id % 9).cast("string"),
        F.when(
            doc_id % 2 == 0,
            F.concat(
                F.lit("?id="),
                (doc_id % 5).cast("string"),
                F.lit("&utm_source=feed"),
            ),
        ).otherwise(
            F.concat(
                F.lit("?utm_campaign=c"),
                (doc_id % 3).cast("string"),
                F.lit("&id="),
                (doc_id % 5).cast("string"),
            )
        ),
        F.when(doc_id % 7 == 3, F.lit("#sec")).otherwise(F.lit("")),
    )


_MESSY_URL_SQL = (
    "CASE WHEN doc_id % 3 = 0 THEN 'HTTPS' ELSE 'https' END || '://'"
    " || CASE WHEN doc_id % 4 = 0 THEN 'WWW.' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN 'Site' ELSE 'site' END"
    " || CAST(doc_id % 6 AS VARCHAR) || '.example.com/p/'"
    " || CAST(doc_id % 9 AS VARCHAR)"
    " || CASE WHEN doc_id % 2 = 0"
    "    THEN '?id=' || CAST(doc_id % 5 AS VARCHAR) || '&utm_source=feed'"
    "    ELSE '?utm_campaign=c' || CAST(doc_id % 3 AS VARCHAR)"
    "         || '&id=' || CAST(doc_id % 5 AS VARCHAR) END"
    " || CASE WHEN doc_id % 7 = 3 THEN '#sec' ELSE '' END"
)


def url_canonical(documents: DataFrame) -> DataFrame:
    """URL-level dedup profile: canonicalize every (synthetic) URL and
    count raw URLs and distinct raw spellings per canonical target.

    Scale shape: canonicalization rides the scan (regexps + array HOFs,
    all codegen, zero Python); only (canonical, raw) string pairs reach
    the single hash aggregate. The count-distinct plans as Catalyst's
    two-phase Expand — at 100 TB flip to approx_count_distinct, same
    shape. The text column is never read (column pruning: doc_id only)."""
    doc_id = F.col("doc_id")
    urls = documents.select(
        _messy_url(doc_id).alias("raw_url"),
    ).select(canonical_url(F.col("raw_url")).alias("canonical"), "raw_url")
    return urls.groupBy("canonical").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("raw_url").alias("n_variants"),
    )


def url_canonical_oracle_sql() -> str:
    return f"""
WITH raw AS (
    SELECT {_MESSY_URL_SQL} AS raw_url FROM documents
), canon AS (
    SELECT {_canonical_url_sql('raw_url')} AS canonical, raw_url FROM raw
)
SELECT canonical,
       COUNT(*) AS n_urls,
       COUNT(DISTINCT raw_url) AS n_variants
FROM canon
GROUP BY canonical
"""


# ---------------------------------------------------------------------------
# Feature hashing (the hashing-trick vectorizer).
# ---------------------------------------------------------------------------

FH_DIM = 32  # feature dimension (power of two; gate-sized on purpose)


def feature_hashing(documents: DataFrame) -> DataFrame:
    """Hash each document's token counts into a fixed FH_DIM-dimensional
    signed vector (Weinberger et al.'s hashing trick): bucket =
    hash(token) mod D, sign from an independent hash, so the vectorizer
    needs NO vocabulary pass, no dictionary broadcast, and the dimension
    is fixed whatever the corpus — the standard way to featurize text at
    a scale where a fitted vocabulary is itself a big-data object.

    Output per doc: the dense vector rendered canonically as a ','-joined
    string (engine-portable — the driver hash treats it as one value),
    plus nnz and the L1 norm. All arithmetic is exact integer counts; the
    md5-derived hash64 is replayed identically in the oracle.

    Plan shape: token explode -> ONE (doc_id, bucket) combinable
    aggregate -> per-doc map assembly in-row (sequence/transform HOFs,
    no join). Docs with zero tokens vanish (no rows to hash) — consistent
    in both engines by construction.
    """
    from apmbackend_spark.functions.text import hash64, tokens

    D = FH_DIM
    toks = documents.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    hashed = toks.select(
        "doc_id",
        (hash64(F.col("tok")) % F.lit(D)).cast("int").alias("bucket"),
        F.when(
            hash64(F.concat(F.lit("s:"), F.col("tok"))) % 2 == 0, F.lit(1)
        )
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("sign"),
    )
    g = hashed.groupBy("doc_id", "bucket").agg(F.sum("sign").alias("val"))
    m = g.groupBy("doc_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bucket"), F.col("val")))
        ).alias("m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(D - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("m"), i.cast("int")), F.lit(0).cast("long")
        ),
    )
    return m.select(
        "doc_id",
        F.array_join(
            F.transform(vec, lambda x: x.cast("string")), ","
        ).alias("vec_str"),
        F.size(F.filter(vec, lambda x: x != 0)).cast("long").alias("nnz"),
        F.aggregate(
            vec, F.lit(0).cast("long"), lambda a, x: a + F.abs(x)
        ).alias("l1"),
    )


def feature_hashing_oracle_sql() -> str:
    from apmbackend_spark.functions.text import hash64_sql, tokens_sql

    D = FH_DIM
    return f"""
WITH t AS (
    SELECT doc_id, unnest({tokens_sql("text")}) AS tok FROM documents
), h AS (
    SELECT doc_id,
           CAST({hash64_sql("tok")} % {D} AS INT) AS bucket,
           CASE WHEN {hash64_sql("('s:' || tok)")} % 2 = 0
                THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS sign
    FROM t
), g AS (
    SELECT doc_id, bucket, CAST(SUM(sign) AS BIGINT) AS val
    FROM h GROUP BY 1, 2
), m AS (
    SELECT doc_id,
           map_from_entries(list(struct_pack(k := bucket, v := val))) AS mp
    FROM g GROUP BY doc_id
), d AS (
    SELECT doc_id,
           list_transform(
               range(0, {D}),
               i -> COALESCE(element_at(mp, CAST(i AS INT))[1],
                             CAST(0 AS BIGINT))
           ) AS vec
    FROM m
)
SELECT doc_id,
       array_to_string(list_transform(vec, x -> CAST(x AS VARCHAR)), ',')
           AS vec_str,
       CAST(len(list_filter(vec, x -> x <> 0)) AS BIGINT) AS nnz,
       list_reduce(
           list_prepend(CAST(0 AS BIGINT),
                        list_transform(vec, x -> abs(x))),
           (a, x) -> a + x
       ) AS l1
FROM d
"""


# ---------------------------------------------------------------------------
# Graded HyperLogLog: the mergeable-sketch cardinality path, value-hashed.
# ---------------------------------------------------------------------------

HLL_P = 6
HLL_M = 1 << HLL_P            # 64 registers
_HLL_VBITS = 60 - HLL_P       # value bits left of the 60-bit md5 hash
_HLL_ALPHA = 0.709            # the published alpha_64 (Flajolet et al.)
_LN2 = 0.6931471805599453


def hll_cardinality(documents: DataFrame) -> DataFrame:
    """HyperLogLog distinct-count — the sketch `corpus_cardinality(approx=
    True)` delegates to Spark for, reimplemented RELATIONALLY so the gate
    can value-hash it: registers are a (source, bucket) MAX rollup of the
    md5-derived rho, estimates are computed from the dense register array
    with the published formulas, and the '__union__' row demonstrates the
    property that makes HLL the 100 TB answer — registers MERGE by
    per-bucket max, so per-shard sketches combine map-side without ever
    shuffling distinct keys (the union row's registers are by construction
    the bucket-max of the per-source registers; a pytest asserts it).

    Both estimator branches are graded: small-range linear counting
    (V > 0 and raw <= 2.5m — the per-source fixture regime) and the raw
    harmonic estimate (the union row's regime). Exactness discipline:
    rho is pure integer (bit-length of the remaining 54 hash bits), the
    harmonic sum folds the registers IN ARRAY ORDER (never an unordered
    float SUM) over exact powers of two, and linear counting's ln(m/V)
    reuses the exact fixed-point log2 of `selection.py` times a shared
    ln(2) literal — every float op has identical shape in both engines.
    The exact COUNT(DISTINCT) rides along as the in-gate error reference
    (the ann_recall_report pattern: the evaluation IS the gate)."""
    # feeds the register rollup AND the exact-distinct rollup; pinned via
    # localCheckpoint (not persist) so the blocks are released with the
    # frame instead of accumulating across invocations in a long session
    d = hll_rows(documents).localCheckpoint()
    return hll_finish(hll_registers(d), d)


def hll_rows(documents: DataFrame) -> DataFrame:
    """(source, h) rows incl. the '__union__' replica — the insert stream
    both the batch gate and the streaming gate feed to the registers.
    Streaming-safe: the replica is an explode, not a self-union."""
    fp = hash64(F.concat_ws(" ", tokens(F.col("text"))))
    return documents.select(
        F.explode(
            F.array(F.col("source"), F.lit("__union__"))
        ).alias("source"),
        fp.alias("h"),
    )


def hll_registers(d: DataFrame) -> DataFrame:
    """(source, bucket, reg) MAX rollup — the mergeable sketch state. MAX
    is order- and batch-insensitive, which is exactly why this aggregation
    can live in a streaming state store (see stream_hll)."""
    rho = F.when(F.col("value") == 0, F.lit(_HLL_VBITS + 1)).otherwise(
        F.lit(_HLL_VBITS + 1) - F.length(F.expr("bin(value)"))
    )
    return (
        d.select(
            "source",
            (F.col("h") % HLL_M).cast("int").alias("bucket"),
            F.expr(f"h div {HLL_M}").alias("value"),
        )
        .select("source", "bucket", rho.cast("long").alias("rho"))
        .groupBy("source", "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_finish(regs: DataFrame, d: DataFrame) -> DataFrame:
    """Estimates from (source, bucket, reg) registers plus the exact
    reference counts from the (source, h) rows — shared by the batch gate
    and the streaming gate's post-drain finish."""
    from apmbackend_spark.operators.selection import _with_log2fix

    dense = regs.groupBy("source").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("bucket"), F.col("reg")))
        ).alias("mp")
    ).select(
        "source",
        F.transform(
            F.sequence(F.lit(0), F.lit(HLL_M - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("mp"), i.cast("int")), F.lit(0).cast("long")
            ),
        ).alias("arr"),
    )
    stats = dense.select(
        "source",
        F.size(F.filter(F.col("arr"), lambda x: x == 0))
        .cast("long")
        .alias("v_zero"),
        F.expr(
            "aggregate(arr, CAST(0.0 AS DOUBLE), (acc, x) -> "
            "acc + 1.0 / CAST(shiftleft(CAST(1 AS BIGINT), CAST(x AS INT)) AS DOUBLE))"
        ).alias("ssum"),
    )
    counts = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("h").alias("exact_distinct"),
    )
    out = counts.join(stats, "source")
    out = _with_log2fix(out, "greatest(v_zero, 1)", "l_v")
    raw = (F.lit(float(_HLL_ALPHA)) * F.lit(float(HLL_M * HLL_M))) / F.col("ssum")
    linear = (
        F.lit(float(HLL_M))
        * (
            (F.lit(float(HLL_P * 65536)) - F.col("l_v").cast("double"))
            / F.lit(65536.0)
        )
        * F.lit(_LN2)
    )
    use_linear = (F.col("v_zero") > 0) & (raw <= F.lit(2.5 * HLL_M))
    return out.select(
        "source",
        "n_rows",
        "exact_distinct",
        "v_zero",
        F.when(use_linear, F.lit("linear")).otherwise(F.lit("raw")).alias(
            "est_kind"
        ),
        F.when(use_linear, linear).otherwise(raw).alias("est"),
    )


def hll_cardinality_oracle_sql() -> str:
    from apmbackend_spark.operators.selection import log2fix_sql

    fp = hash64_sql(f"COALESCE(array_to_string({tokens_sql('text')}, ' '), '')")
    m = HLL_M
    vb1 = _HLL_VBITS + 1
    lv = log2fix_sql("greatest(v_zero, 1)")
    return f"""
WITH d0 AS (
    SELECT source, {fp} AS h FROM documents
), d AS (
    SELECT source, h FROM d0
    UNION ALL
    SELECT '__union__' AS source, h FROM d0
), rows_rho AS (
    SELECT source,
           CAST(h % {m} AS INT) AS bucket,
           CASE WHEN (h // {m}) = 0 THEN CAST({vb1} AS BIGINT)
                ELSE CAST({vb1} - length(format('{{:b}}', h // {m})) AS BIGINT)
           END AS rho
    FROM d
), regs AS (
    SELECT source, bucket, CAST(MAX(rho) AS BIGINT) AS reg
    FROM rows_rho GROUP BY 1, 2
), dense AS (
    SELECT source,
           list_transform(
               range(0, {m}),
               i -> COALESCE(element_at(
                        map_from_entries(list(struct_pack(k := bucket, v := reg))),
                        CAST(i AS INT))[1],
                    CAST(0 AS BIGINT))
           ) AS arr
    FROM regs GROUP BY source
), stats AS (
    SELECT source,
           CAST(len(list_filter(arr, x -> x = 0)) AS BIGINT) AS v_zero,
           list_reduce(
               list_prepend(0.0, list_transform(arr, x -> 1.0 / CAST(1::BIGINT << CAST(x AS INT) AS DOUBLE))),
               (a, x) -> a + x
           ) AS ssum
    FROM dense
), counts AS (
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT h) AS BIGINT) AS exact_distinct
    FROM d GROUP BY source
), j AS (
    SELECT c.source, c.n_rows, c.exact_distinct, s.v_zero, s.ssum,
           {lv} AS l_v
    FROM counts c JOIN stats s USING (source)
)
SELECT source, n_rows, exact_distinct, v_zero,
       CASE WHEN v_zero > 0 AND ({_HLL_ALPHA!r} * {float(m * m)!r}) / ssum <= {2.5 * m!r}
            THEN 'linear' ELSE 'raw' END AS est_kind,
       CASE WHEN v_zero > 0 AND ({_HLL_ALPHA!r} * {float(m * m)!r}) / ssum <= {2.5 * m!r}
            THEN ({float(m)!r} * ((CAST({HLL_P * 65536} - l_v AS DOUBLE)) / 65536.0)) * {_LN2!r}
            ELSE ({_HLL_ALPHA!r} * {float(m * m)!r}) / ssum
       END AS est
FROM j
"""


# --- wordpiece_train: the likelihood-ratio merge rule ------------------

WP_TRAIN_MERGES = 6


def _wp_select_one(vocab: DataFrame):
    """One WordPiece selection job: adjacent-pair counts + current symbol
    counts over the weighted vocabulary, scored by the Schuster-Nakajima
    likelihood ratio in exact fixed-point log2 — argmax (score DESC,
    pair ASC). Returns [(pair, n, score)] or []."""
    from apmbackend_spark.operators.selection import _with_log2fix

    arr = F.split(F.col("seq"), " ")
    pair_idx = F.when(
        F.size(arr) >= 2, F.sequence(F.lit(1), F.size(arr) - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = (
        vocab.select(
            "freq",
            F.explode(
                F.transform(
                    pair_idx,
                    lambda i: F.concat(
                        F.element_at(arr, i),
                        F.lit(" "),
                        F.element_at(arr, i + 1),
                    ),
                )
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("n"))
    )
    syms = (
        vocab.select("freq", F.explode(arr).alias("s"))
        .groupBy("s")
        .agg(F.sum("freq").cast("long").alias("c"))
    )
    sp = F.split(F.col("pair"), " ")
    j = (
        pairs.select("pair", "n", sp.getItem(0).alias("pa"), sp.getItem(1).alias("pb"))
        .join(syms.select(F.col("s").alias("pa"), F.col("c").alias("ca")), "pa")
        .join(syms.select(F.col("s").alias("pb"), F.col("c").alias("cb")), "pb")
    )
    j = _with_log2fix(j, "n", "l_n")
    j = _with_log2fix(j, "ca", "l_a")
    j = _with_log2fix(j, "cb", "l_b")
    j = j.select(
        "pair", "n",
        (F.col("l_n") - F.col("l_a") - F.col("l_b")).alias("score"),
    )
    return [
        (r["pair"], r["n"], r["score"])
        for r in j.orderBy(
            F.col("score").desc(), F.col("pair").asc()
        ).limit(1).collect()
    ]


def wordpiece_train(
    documents: DataFrame, n_merges: int = WP_TRAIN_MERGES
) -> DataFrame:
    """(step, pair, n, score): the WordPiece merge table (Schuster &
    Nakajima 2012 / BERT's tokenizer, public literature) — the SAME
    greedy merge loop as ``bpe_train`` with the selection rule swapped:
    instead of raw pair count, merge the pair maximizing the corpus
    likelihood gain

        score(a, b) = log p(ab) - log p(a) - log p(b)
                    = L(n_ab) - L(c_a) - L(c_b) + const

    (the denominators' totals cancel in the argmax), every L the repo's
    exact fixed-point log2 — so the ranking is pure int64, bit-identical
    in DuckDB, where float logs would tie-break differently across
    libms. The score rides the output, so each round's DECISION is
    value-hash-graded, and the oracle unrolls the loop with the same
    chained CTEs as the BPE twin (rule="wordpiece").

    Selection is one merge per job (the published algorithm's greedy
    sequence; bpe_train's batched-disjoint acceptance does NOT port —
    its prefix bound argues about raw counts, and WordPiece scores move
    with the SYMBOL counts every merge changes). n_merges is tokenizer
    config, not data-sized; the per-job work is two map-side-combinable
    rollups over the distinct-pretoken frame — vocabulary-bounded,
    sub-linear in corpus bytes, the same Sennrich trick as bpe_train.

    Reference anchor: training-side complement of doc_token_counts /
    bpe_pair_counts (beyond-reference LLM surface)."""
    return documents.sparkSession.createDataFrame(
        _wp_train_list(documents, n_merges),
        schema="step int, pair string, n long, score long",
    )


def _wp_train_list(
    documents: DataFrame, n_merges: int
) -> list[tuple[int, str, int, int]]:
    """The trainer loop, returning [(step, pair, n, score)] so the
    encoder can reuse the trained pieces without a second derivation
    path (wordpiece_train is a thin DataFrame wrapper)."""
    from apmbackend_spark.functions.text import bpe_tokens

    pretok = documents.select(F.explode(bpe_tokens(F.col("text"))).alias("w"))
    freq = pretok.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    seq0 = F.trim(
        F.regexp_replace(
            F.replace(F.col("w"), F.lit(" "), F.lit(BPE_SPACE_MARKER)),
            "(.)",
            "$1 ",
        )
    )
    vocab = _wide(
        freq.select("w", seq0.alias("seq"), "freq"), "w"
    ).localCheckpoint()
    merges: list[tuple[int, str, int, int]] = []
    for step in range(1, int(n_merges) + 1):
        head = _wp_select_one(vocab)
        if not head:
            break
        pair, n, score = head[0]
        merges.append((step, pair, int(n), int(score)))
        if step < int(n_merges):
            vocab = vocab.select(
                "w",
                _bpe_apply_merge(
                    F.col("seq"), F.lit(pair), F.lit(pair.replace(" ", ""))
                ).alias("seq"),
                "freq",
            ).localCheckpoint()
    return merges


def wordpiece_train_oracle_sql(n_merges: int = WP_TRAIN_MERGES) -> str:
    ctes, _ = _bpe_chain_ctes(n_merges, final_apply=False, rule="wordpiece")
    selects = [
        f"SELECT CAST({i} AS INT) AS step, pair, n, score FROM b_{i}"
        for i in range(1, int(n_merges) + 1)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def wordpiece_encode(
    documents: DataFrame, n_merges: int = WP_TRAIN_MERGES
) -> DataFrame:
    """(doc_id, n_words, n_pieces, piece_hash, fertility): the trained
    WordPiece model applied back to the corpus with the tokenizer's REAL
    inference rule — greedy longest-match-first (MaxMatch): at each
    position take the longest vocabulary piece prefixing the rest of the
    word, falling back to the single character (always in-vocab by the
    coverage rule). This differs from bpe_encode (merge-order replay) and
    unigram_encode (Viterbi) — the third published inference scheme, so
    every trainer family has its encode graded.

    Rendering: multi-char pieces are the <= n_merges trained merges
    (a bounded driver list — the kmeans/BPE-heads precedent), compiled
    into an in-row CASE chain tried longest-first inside ONE aggregate
    fold per DISTINCT pretoken (each step advances by the matched
    piece's length); the per-word (n_pieces, piece-hash) rolls up per
    doc through the usual broadcast join. The word-level hash is the
    order-free modular piece-stream hash (hash64 % 2^40, re-modded per
    word so doc sums stay far below 2^63). The oracle re-derives the
    SAME merges via the shared chained CTEs and replays MaxMatch as a
    position-advancing recursive CTE — scalar state only (a struct
    accumulator in DuckDB's list_reduce mis-executes; the bpe apply_cte
    precedent).

    Scale: one distinct-pretoken frame (sub-linear in corpus bytes),
    vocabulary-bounded fold, one broadcast join — no corpus window."""
    from apmbackend_spark.functions.text import bpe_tokens

    merges = _wp_train_list(documents, n_merges)
    pieces = sorted(
        (p.replace(" ", "") for _, p, _, _ in merges),
        key=lambda x: (-len(x), x),
    )

    def q(x: str) -> str:
        return x.replace("\\", "\\\\").replace("'", "\\'")

    match = "CASE " + "".join(
        f"WHEN substring(s, CAST(acc.pos AS INT), {len(p)}) = '{q(p)}' "
        f"THEN '{q(p)}' "
        for p in pieces
    ) + "ELSE substring(s, CAST(acc.pos AS INT), 1) END"
    fold = f"""
aggregate(
  sequence(1, length(s)),
  named_struct('pos', CAST(1 AS BIGINT), 'np', CAST(0 AS BIGINT),
               'hsum', CAST(0 AS BIGINT)),
  (acc, i) -> CASE WHEN acc.pos > length(s) THEN acc ELSE named_struct(
      'pos', acc.pos + length({match}),
      'np', acc.np + CAST(1 AS BIGINT),
      'hsum', acc.hsum
          + CAST(conv(substring(md5({match}), 1, 15), 16, 10) AS BIGINT)
            % {1 << 40}) END,
  acc -> named_struct('np', acc.np, 'hsum', acc.hsum % {1 << 40})
)
"""
    pret = (
        documents.select(F.explode(bpe_tokens(F.col("text"))).alias("w"))
        .distinct()
        .select(
            "w",
            F.replace(
                F.col("w"), F.lit(" "), F.lit(BPE_SPACE_MARKER)
            ).alias("s"),
        )
        .select("w", F.expr(fold).alias("st"))
        .select("w", F.col("st.np").alias("np"), F.col("st.hsum").alias("hsum"))
    )
    dtok = (
        documents.select(
            "doc_id", F.explode(bpe_tokens(F.col("text"))).alias("w")
        )
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return (
        dtok.join(F.broadcast(pret), "w")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.col("np")).cast("long").alias("n_pieces"),
            F.sum(F.col("cnt") * F.col("hsum"))
            .cast("long")
            .alias("piece_hash"),
        )
        .select(
            "*",
            (
                F.col("n_pieces").cast("double")
                / F.col("n_words").cast("double")
            ).alias("fertility"),
        )
    )


def wordpiece_encode_oracle_sql(n_merges: int = WP_TRAIN_MERGES) -> str:
    from apmbackend_spark.functions.text import bpe_tokens_sql

    bt = bpe_tokens_sql("text")
    ctes, _ = _bpe_chain_ctes(n_merges, final_apply=False, rule="wordpiece")
    b_union = " UNION ALL ".join(
        f"SELECT replace(pair, ' ', '') AS pm FROM b_{i}"
        for i in range(1, int(n_merges) + 1)
    )
    h = "(('0x' || substr(md5(m), 1, 15))::BIGINT)"
    return (
        "WITH RECURSIVE "
        + ",\n".join(ctes)
        + f""",
wpp AS MATERIALIZED ({b_union}),
wpre AS MATERIALIZED (
    SELECT w, replace(w, ' ', '{BPE_SPACE_MARKER}') AS s,
           (SELECT list(pm ORDER BY length(pm) DESC, pm ASC) FROM wpp)
               AS ms
    FROM freq
),
-- MaxMatch as a position-advancing recursion; the ordered piece list
-- rides each row (a correlated subquery against the CTE-derived wpp
-- returns no rows inside DuckDB's recursive executor — the carried-list
-- form is the same pattern the soft-prune DP oracle uses)
wstep AS (
    SELECT w, s, ms, CAST(1 AS BIGINT) AS pos,
           CAST(0 AS BIGINT) AS np, CAST(0 AS BIGINT) AS hsum
    FROM wpre
    UNION ALL
    SELECT w, s, ms, pos + length(m), np + 1, hsum + {h} % {1 << 40}
    FROM (
        SELECT w, s, ms, pos, np, hsum,
               COALESCE(
                   list_filter(ms, pm ->
                       substring(t.s, CAST(t.pos AS INT), length(pm)) = pm
                   )[1],
                   substring(t.s, CAST(t.pos AS INT), 1)) AS m
        FROM wstep t WHERE pos <= length(s)
    )
),
wstats AS MATERIALIZED (
    SELECT w, np, hsum % {1 << 40} AS hsum
    FROM wstep WHERE pos > length(s)
),
wdtok AS (
    SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT doc_id, unnest({bt}) AS w FROM documents
    ) GROUP BY doc_id, w
)
SELECT d.doc_id,
       CAST(SUM(d.cnt) AS BIGINT) AS n_words,
       CAST(SUM(d.cnt * ws.np) AS BIGINT) AS n_pieces,
       CAST(SUM(d.cnt * ws.hsum) AS BIGINT) AS piece_hash,
       CAST(SUM(d.cnt * ws.np) AS DOUBLE) / CAST(SUM(d.cnt) AS DOUBLE)
           AS fertility
FROM wdtok d JOIN wstats ws USING (w)
GROUP BY d.doc_id
"""
    )
