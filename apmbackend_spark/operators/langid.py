"""Language identification and corpus-profiling operators over the
``documents`` table — the text-analysis tier of the training-data pipeline
(beyond the stopword-ratio heuristic in ``textstats.doc_stats``).

``lang_id`` is the Cavnar–Trenkle n-gram method (character-trigram profile
scoring): a document's trigram multiset is scored against a small fixed
per-language weighted-trigram profile, argmax wins. The profiles live in a
map literal evaluated inside whole-stage codegen (``aggregate`` over the
trigram array), so the operator is a SINGLE stateless scan — no explode, no
join, no shuffle, no Python. That is the 100 TB shape: language ID is
embarrassingly parallel and must never cost more than one pass over the
bytes.

``doc_keywords`` is tf-idf top-k term extraction. The idf factor is
rendered as ``tf * (N / df)`` (two exactly-rounded IEEE ops — ``ln`` is NOT
exactly rounded and could rank-flip between engines, so the monotone
log-free form is used; ordering is identical). Shuffles: one token-level
combine (map-side partial), one |vocab| df rollup, one term-keyed join, one
per-doc window — all keyed, none global.

``domain_stats`` is the per-source corpus profile (doc counts, token sums,
exact midpoint percentiles, distinct-fingerprint dedup rate) a curation
pipeline reads before choosing mixture weights. Integer sums and
integer-input percentiles only — cross-row float accumulation is
order-dependent and would not be bit-deterministic under Spark's partial
aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apmbackend_spark.functions.percentile import (
    midpoint_percentile,
    midpoint_percentile_sql,
)
from apmbackend_spark.functions.text import (
    char_trigrams,
    char_trigrams_sql,
    hash64,
    hash64_sql,
    tokens,
    tokens_sql,
)

# Fixed per-language character-trigram profiles (Cavnar & Trenkle 1994
# style: the most frequent trigrams of each language, integer-weighted by
# typical rank). Trigrams may legitimately appear in several profiles with
# different weights (" de" is heavy in de/fr/es). Space-padded entries
# capture word boundaries, as in the original method.
LANG_PROFILES: dict[str, dict[str, int]] = {
    "de": {
        "der": 5, " de": 4, "er ": 4, "und": 5, " un": 3, "nd ": 3,
        "die": 4, " di": 3, "ie ": 3, "ein": 4, " ei": 3, "ich": 4,
        "ch ": 3, "sch": 4, "ung": 3, "gen": 3, "en ": 4, "cht": 3,
    },
    "en": {
        "the": 5, " th": 4, "he ": 4, "ing": 4, "ng ": 3, "and": 4,
        " an": 3, "nd ": 2, " of": 3, "of ": 3, " to": 3, "to ": 3,
        "ion": 3, " in": 3, "in ": 2, "ed ": 3, "er ": 2, "is ": 2,
    },
    "es": {
        " de": 4, "de ": 4, " la": 4, "la ": 4, "os ": 4, "que": 4,
        " qu": 3, "ue ": 3, " el": 3, "el ": 3, " en": 3, "en ": 2,
        "ar ": 3, "ado": 3, "as ": 3, "es ": 3, "ien": 2, "nte": 2,
    },
    "fr": {
        " le": 4, "le ": 4, " de": 4, "de ": 3, "es ": 4, "ent": 4,
        " et": 3, "et ": 3, " la": 3, "la ": 2, "ion": 3, "que": 3,
        " qu": 2, "ue ": 2, "eur": 3, "ait": 3, "ois": 2, "ais": 2,
    },
    "zh": {
        # romanized (pinyin) finals/initials — the ASCII-representable
        # signal; CJK-codepoint trigrams would join here for raw text
        "ang": 4, "eng": 4, "ong": 4, "zh ": 3, "sh ": 3, "shi": 4,
        "zhi": 4, "ian": 3, "uan": 3, "iao": 3, "uo ": 3, "ei ": 2,
        "ao ": 3, "an ": 2, "ui ": 2, "un ": 2, "ia ": 2, "ou ": 2,
    },
}


def lang_id(documents: DataFrame) -> DataFrame:
    """Char-trigram profile language ID: one codegen scan, zero shuffles.

    Per language, ``aggregate(trigrams, 0L, acc + profile_map[t])`` sums the
    profile weights of every trigram occurrence; the argmax (ties broken by
    lexicographically-smallest language, via a priority field in the struct
    compare) is the prediction. Scores are integers, so cross-engine
    equality is exact.
    """
    txt = F.lower(F.col("text"))
    trigs = char_trigrams(txt)
    langs = sorted(LANG_PROFILES)

    def score(lang: str):
        prof = LANG_PROFILES[lang]
        m = F.create_map(
            *[x for k, w in sorted(prof.items()) for x in (F.lit(k), F.lit(w))]
        )
        return F.aggregate(
            trigs,
            F.lit(0).cast("long"),
            lambda acc, t: acc + F.coalesce(m[t], F.lit(0)).cast("long"),
        )

    # array_max over (score, priority, lang) structs: field-order compare,
    # priority descending in lang order so ties pick the smallest lang.
    cands = F.array(
        *[
            F.struct(
                score(lang).alias("s"),
                F.lit(len(langs) - i).alias("p"),
                F.lit(lang).alias("l"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    best = F.array_max(cands)
    return documents.select(
        "doc_id",
        "lang",
        best["l"].alias("lang_pred"),
        best["s"].alias("score"),
        F.greatest(F.length(txt) - 2, F.lit(0)).cast("long").alias("n_trigrams"),
    )


def lang_id_oracle_sql() -> str:
    langs = sorted(LANG_PROFILES)
    prof_rows = ", ".join(
        f"('{lang}', '{tg}', {w})"
        for lang in langs
        for tg, w in sorted(LANG_PROFILES[lang].items())
    )
    lang_rows = ", ".join(f"('{lang}')" for lang in langs)
    return f"""
WITH d AS (
    SELECT doc_id, lang, lower(text) AS txt FROM documents
),
profile(plang, tg, w) AS (VALUES {prof_rows}),
plangs(plang) AS (VALUES {lang_rows}),
trigs AS (
    SELECT doc_id, UNNEST({char_trigrams_sql("txt")}) AS tg FROM d
),
scores AS (
    SELECT t.doc_id, p.plang, CAST(SUM(p.w) AS BIGINT) AS s
    FROM trigs t JOIN profile p ON t.tg = p.tg
    GROUP BY t.doc_id, p.plang
),
full_grid AS (
    SELECT d.doc_id, d.lang, l.plang, COALESCE(s.s, 0) AS s,
           CAST(greatest(length(d.txt) - 2, 0) AS BIGINT) AS n_trigrams
    FROM d CROSS JOIN plangs l
    LEFT JOIN scores s ON s.doc_id = d.doc_id AND s.plang = l.plang
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY s DESC, plang ASC
    ) AS rn
    FROM full_grid
)
SELECT doc_id, lang, plang AS lang_pred, CAST(s AS BIGINT) AS score, n_trigrams
FROM ranked WHERE rn = 1
"""


KEYWORDS_TOP_K = 5


def doc_keywords(documents: DataFrame, k: int = KEYWORDS_TOP_K) -> DataFrame:
    """tf-idf top-k keywords per document.

    Score is ``tf * (N / df)`` — the log-free idf (same ordering as
    ``tf * ln(N/df)`` within a document since ln is monotone; division and
    multiplication are exactly-rounded IEEE ops so both engines produce
    identical doubles, which ``ln`` would not guarantee).
    """
    tok = documents.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    # persist the narrow tf frame: both the df rollup and the scored join
    # consume it, and without materialization each branch would re-run the
    # tokenize + explode + token-level shuffle over the corpus
    tf = (
        tok.groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # separate column-pruned scan on purpose: N must count ALL documents,
    # including zero-token ones that have no tf rows
    nd = documents.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(nd))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (F.col("n_docs").cast("double") / F.col("df").cast("double")),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "score", "rank")
    )


def doc_keywords_oracle_sql(k: int = KEYWORDS_TOP_K) -> str:
    return f"""
WITH tok AS (
    SELECT doc_id, UNNEST({tokens_sql("text")}) AS term FROM documents
),
tf AS (
    SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM tok GROUP BY doc_id, term
),
df AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
),
nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM documents),
scored AS (
    SELECT f.doc_id, f.term, f.tf, d.df,
           CAST(f.tf AS DOUBLE)
             * (CAST(n.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE)) AS score
    FROM tf f JOIN df d USING (term) CROSS JOIN nd n
),
ranked AS (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, term ASC
    ) AS INT) AS rank
    FROM scored
)
SELECT doc_id, term, tf, df, score, rank FROM ranked WHERE rank <= {k}
"""


def domain_stats(documents: DataFrame) -> DataFrame:
    """Per-source corpus profile: volume, token distribution (exact midpoint
    percentiles over integer token counts), and exact-dup rate inputs
    (distinct text fingerprints vs docs).

    Exact percentiles need the group's token-count multiset; groups are
    |sources|, each bounded by corpus share — at 100 TB swap
    ``percentile_approx`` in if a single source's doc COUNT (not bytes)
    outgrows executor memory. All other aggregates are map-side combinable
    integer sums.
    """
    per_doc = documents.select(
        "source",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        hash64(F.col("text")).alias("fp"),
    )
    arr = F.sort_array(F.collect_list("n_tokens"))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.countDistinct("fp").alias("n_unique"),
            midpoint_percentile(arr, 50).alias("p50_tokens"),
            midpoint_percentile(arr, 95).alias("p95_tokens"),
        )
        .withColumn(
            "avg_tokens",
            F.col("total_tokens").cast("double") / F.col("n_docs").cast("double"),
        )
        .withColumn(
            "dup_rate",
            (F.col("n_docs") - F.col("n_unique")).cast("double")
            / F.col("n_docs").cast("double"),
        )
        .select(
            "source", "n_docs", "total_tokens", "n_unique",
            "p50_tokens", "p95_tokens", "avg_tokens", "dup_rate",
        )
    )


def domain_stats_oracle_sql() -> str:
    arr = "list_sort(list(n_tokens))"
    return f"""
WITH per_doc AS (
    SELECT source,
           CAST(len({tokens_sql("text")}) AS BIGINT) AS n_tokens,
           {hash64_sql("text")} AS fp
    FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique,
       {midpoint_percentile_sql(arr, 50)} AS p50_tokens,
       {midpoint_percentile_sql(arr, 95)} AS p95_tokens,
       CAST(SUM(n_tokens) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_tokens,
       CAST(COUNT(*) - COUNT(DISTINCT fp) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS dup_rate
FROM per_doc
GROUP BY source
"""


# ---------------------------------------------------------------------------
# Corpus-trained character-LM quality scoring.
# ---------------------------------------------------------------------------

CHARLM_MODEL_SIZE = 2048
CHARLM_SCALE = 1_000_000


def charlm_score(
    documents: DataFrame,
    model_size: int = CHARLM_MODEL_SIZE,
    scale: int = CHARLM_SCALE,
) -> DataFrame:
    """Corpus-trained character-trigram LM scoring — the in-distribution
    quality signal (CCNet-style "does this look like the reference
    corpus") that rule-based `doc_stats.quality` cannot give: train a
    trigram frequency model on the WHOLE corpus, score each document by
    its mean per-trigram model weight.

    Bit-determinism: the model weight is ``floor(scale * (c / total))`` —
    division and multiplication are exactly-rounded IEEE ops, floor makes
    the weight an integer, so per-doc sums are integer math and the final
    score an integer division. (A log-prob rendering would hinge on ``ln``,
    which is not exactly rounded and differs across libms.) The double
    intermediate also avoids the ``c * scale`` int64 overflow a 100 TB
    corpus would hit (~1e14 trigrams x 1e6).

    Plan shape: one (doc_id, tri) pre-aggregate feeds BOTH the model
    rollup and the scoring join (shared Exchange, reused); the model is
    top-``model_size`` trigrams (TakeOrdered, deterministic c-then-tri
    tie-break) and joins back as a BROADCAST — corpus bytes shuffle only
    as compressed (doc_id, tri, k) rows, never as text."""
    tris = documents.select(
        "doc_id", F.explode(char_trigrams(F.lower(F.col("text")))).alias("tri")
    )
    dt = tris.groupBy("doc_id", "tri").agg(F.count(F.lit(1)).alias("k"))
    cnt = dt.groupBy("tri").agg(F.sum("k").alias("c"))
    total = cnt.agg(F.sum("c").alias("total"))
    model = (
        cnt.orderBy(F.col("c").desc(), F.col("tri").asc())
        .limit(int(model_size))
        .crossJoin(F.broadcast(total))
        .select(
            "tri",
            F.floor(
                F.lit(int(scale))
                * (F.col("c").cast("double") / F.col("total").cast("double"))
            )
            .cast("long")
            .alias("w"),
        )
    )
    per_doc = (
        dt.join(F.broadcast(model), "tri", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_tris"),
            F.sum(
                F.when(F.col("w").isNotNull(), F.col("k")).otherwise(F.lit(0))
            ).alias("n_model_hits"),
            F.sum(F.col("k") * F.coalesce(F.col("w"), F.lit(0))).alias("wsum"),
        )
    )
    return (
        documents.select("doc_id", "lang", "source")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "source",
            F.coalesce(F.col("n_tris"), F.lit(0)).cast("long").alias("n_tris"),
            F.coalesce(F.col("n_model_hits"), F.lit(0))
            .cast("long")
            .alias("n_model_hits"),
            F.when(
                F.col("n_tris") > 0, F.expr("wsum DIV n_tris")
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("lm_score"),
        )
    )


def charlm_score_oracle_sql(
    model_size: int = CHARLM_MODEL_SIZE, scale: int = CHARLM_SCALE
) -> str:
    tri = char_trigrams_sql("lower(text)")
    return f"""
WITH tris AS (
    SELECT doc_id, UNNEST({tri}) AS tri FROM documents
), dt AS (
    SELECT doc_id, tri, CAST(COUNT(*) AS BIGINT) AS k
    FROM tris GROUP BY doc_id, tri
), cnt AS (
    SELECT tri, CAST(SUM(k) AS BIGINT) AS c FROM dt GROUP BY tri
), tot AS (
    SELECT CAST(SUM(c) AS BIGINT) AS total FROM cnt
), model AS (
    SELECT tri,
           CAST(FLOOR({int(scale)} * (CAST(c AS DOUBLE) / CAST(total AS DOUBLE))) AS BIGINT) AS w
    FROM cnt CROSS JOIN tot
    ORDER BY c DESC, tri ASC
    LIMIT {int(model_size)}
), per_doc AS (
    SELECT dt.doc_id,
           CAST(SUM(k) AS BIGINT) AS n_tris,
           CAST(SUM(CASE WHEN m.tri IS NOT NULL THEN k ELSE 0 END) AS BIGINT) AS n_model_hits,
           CAST(SUM(k * COALESCE(m.w, 0)) AS BIGINT) AS wsum
    FROM dt LEFT JOIN model m USING (tri)
    GROUP BY dt.doc_id
)
SELECT d.doc_id, d.lang, d.source,
       COALESCE(p.n_tris, 0) AS n_tris,
       COALESCE(p.n_model_hits, 0) AS n_model_hits,
       CAST(CASE WHEN p.n_tris > 0 THEN p.wsum // p.n_tris ELSE 0 END AS BIGINT) AS lm_score
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


def ccnet_buckets(
    documents: DataFrame,
    model_size: int = CHARLM_MODEL_SIZE,
    scale: int = CHARLM_SCALE,
) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020, public
    literature): split the corpus into head / middle / tail thirds by the
    PER-LANGUAGE distribution of the LM quality score — CCNet's signature
    output, and the partition its pipeline uses to keep head+middle and
    drop (or downweight) tail. The score is `charlm_score`'s integer
    in-distribution signal (higher = more reference-like, standing in for
    lower perplexity; same monotone role, exactly hashable where a
    log-prob would hinge on libm).

    Bucket rule per language L with exact midpoint percentiles p33/p66 of
    L's scores: head iff score >= p66, middle iff score >= p33, else
    tail — thresholds and comparisons on exact doubles (integer scores
    < 2^53), so the cut is bit-identical across engines.

    Scale shape: thresholds need the per-language score distribution —
    rendered exactly here via per-lang sorted arrays (|langs| groups;
    the domain_stats precedent) with the documented 100 TB flip to the
    mergeable histogram sketch of `hist_quantiles` when per-group volume
    is unbounded. Scoring itself is charlm_score's shape: one (doc, tri)
    pre-aggregate, broadcast model, no text past the scan. The |langs|-row
    threshold dim broadcasts back."""
    from ..functions.percentile import midpoint_percentile

    scored = charlm_score(documents, model_size, scale).localCheckpoint()
    arr = F.sort_array(F.collect_list(F.col("lm_score").cast("double")))
    th = (
        scored.groupBy("lang")
        .agg(arr.alias("arr"))
        .select(
            "lang",
            midpoint_percentile(F.col("arr"), 33.0).alias("p33"),
            midpoint_percentile(F.col("arr"), 66.0).alias("p66"),
        )
    )
    s = F.col("lm_score").cast("double")
    return scored.join(F.broadcast(th), "lang").select(
        "doc_id",
        "lang",
        "lm_score",
        F.when(s >= F.col("p66"), F.lit("head"))
        .when(s >= F.col("p33"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )


def ccnet_buckets_sketch(
    documents: DataFrame,
    model_size: int = CHARLM_MODEL_SIZE,
    scale: int = CHARLM_SCALE,
) -> DataFrame:
    """The 100 TB form of ``ccnet_buckets``' one per-group-unbounded
    stage, GRADED against the exact path: per-language p33/p66 come from
    a mergeable SUB-OCTAVE histogram sketch (the HDR-histogram /
    DDSketch bucketing shape, public literature): 64 sub-bins per
    power-of-two octave, bin edges from pure INTEGER shifts — bit-length
    octave, top-6-bits mantissa — so binning is bit-identical across
    engines and relative threshold error is bounded at 1/64 (the plain
    `hist_quantiles` octave bins are the right sketch for long-tailed
    latencies, but the LM score clusters inside ONE octave, where a 2x
    bin is a useless threshold). Sketch size: |langs| x <=4096 rows
    whatever the corpus; two sketches merge by adding counts.

    Documents are bucketed under BOTH threshold sets; output is the
    per-language agreement report:

      (lang, n_docs, n_agree, exact_head/middle/tail,
       sketch_head/middle/tail)

    — integer counts, so the exact-vs-sketch bucket agreement itself is
    value-hash-gradeable. The sketch is an approximation by design; what
    the hash pins is that BOTH paths are deterministic and the sketch's
    bucketing loss is exactly what the report says it is. The pytest pin
    asserts the measured agreement floor."""
    from ..functions.percentile import midpoint_percentile
    from .profile import _subbin_est

    scored = charlm_score(documents, model_size, scale).localCheckpoint()
    # exact thresholds — the ccnet_buckets path, verbatim
    arr = F.sort_array(F.collect_list(F.col("lm_score").cast("double")))
    th = (
        scored.groupBy("lang")
        .agg(arr.alias("arr"))
        .select(
            "lang",
            midpoint_percentile(F.col("arr"), 33.0).alias("p33"),
            midpoint_percentile(F.col("arr"), 66.0).alias("p66"),
        )
    )
    # sub-octave sketch bins over the score in cents: shift = octave-6
    # (64 sub-bins; clamped at 0), lo = top-bits mantissa shifted back,
    # width = 2^shift — lo is unique per bin and sorts them, all integer
    binned = (
        scored.select(
            "lang",
            F.expr(
                "greatest(CAST(1 AS BIGINT), CAST(lm_score * 100 AS BIGINT))"
            ).alias("c"),
        )
        .withColumn(
            "shift",
            F.greatest(F.length(F.bin(F.col("c"))) - 7, F.lit(0)).cast("int"),
        )
        .select(
            "lang",
            F.expr("shiftleft(shiftright(c, shift), shift)").alias("lo"),
            F.expr("shiftleft(CAST(1 AS BIGINT), shift)").alias("width"),
        )
        .groupBy("lang", "lo", "width")
        .agg(F.count("*").alias("cnt"))
    )
    g = binned.groupBy("lang").agg(
        F.sum("cnt").alias("n"),
        F.array_sort(
            F.collect_list(
                F.struct(F.col("lo"), F.col("width"), F.col("cnt"))
            )
        ).alias("arr"),
    )
    n = F.col("n")
    ths = g.select(
        "lang",
        _subbin_est(F.col("arr"), n, 33.0).alias("s33"),
        _subbin_est(F.col("arr"), n, 66.0).alias("s66"),
    )
    s = F.col("lm_score").cast("double")
    eb = (
        F.when(s >= F.col("p66"), F.lit("head"))
        .when(s >= F.col("p33"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    sb = (
        F.when(s >= F.col("s66"), F.lit("head"))
        .when(s >= F.col("s33"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    per = (
        scored.join(F.broadcast(th), "lang")
        .join(F.broadcast(ths), "lang")
        .select("lang", eb.alias("eb"), sb.alias("sb"))
    )

    def _cnt(col: str, v: str):
        return (
            F.sum(F.when(F.col(col) == v, 1).otherwise(0))
            .cast("long")
            .alias(f"{'exact' if col == 'eb' else 'sketch'}_{v}")
        )

    return per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("eb") == F.col("sb"), 1).otherwise(0))
        .cast("long")
        .alias("n_agree"),
        _cnt("eb", "head"),
        _cnt("eb", "middle"),
        _cnt("eb", "tail"),
        _cnt("sb", "head"),
        _cnt("sb", "middle"),
        _cnt("sb", "tail"),
    )


def ccnet_buckets_sketch_oracle_sql(
    model_size: int = CHARLM_MODEL_SIZE, scale: int = CHARLM_SCALE
) -> str:
    from ..functions.percentile import midpoint_percentile_sql
    from .profile import _subbin_est_sql

    inner = charlm_score_oracle_sql(model_size, scale)
    parr = "list_sort(list(CAST(lm_score AS DOUBLE)))"
    return f"""
WITH scored AS MATERIALIZED ({inner}),
th AS (
    SELECT lang,
           {midpoint_percentile_sql(parr, 33.0)} AS p33,
           {midpoint_percentile_sql(parr, 66.0)} AS p66
    FROM scored GROUP BY lang
), binned AS (
    SELECT lang,
           CAST((c >> shift) << shift AS BIGINT) AS lo,
           CAST(1::BIGINT << shift AS BIGINT) AS width,
           COUNT(*) AS cnt
    FROM (
        SELECT lang, c,
               CAST(GREATEST(length(bin(c)) - 7, 0) AS INT) AS shift
        FROM (
            SELECT lang,
                   GREATEST(CAST(1 AS BIGINT),
                            CAST(lm_score * 100 AS BIGINT)) AS c
            FROM scored
        )
    )
    GROUP BY 1, 2, 3
), g AS (
    SELECT lang,
           CAST(SUM(cnt) AS BIGINT) AS n,
           list_sort(list({{'lo': CAST(lo AS BIGINT),
                            'width': CAST(width AS BIGINT),
                            'cnt': CAST(cnt AS BIGINT)}})) AS arr
    FROM binned GROUP BY lang
), ths AS (
    SELECT lang,
           ({_subbin_est_sql(33.0)}) AS s33,
           ({_subbin_est_sql(66.0)}) AS s66
    FROM g
), per AS (
    SELECT s.lang,
           CASE WHEN CAST(s.lm_score AS DOUBLE) >= t.p66 THEN 'head'
                WHEN CAST(s.lm_score AS DOUBLE) >= t.p33 THEN 'middle'
                ELSE 'tail' END AS eb,
           CASE WHEN CAST(s.lm_score AS DOUBLE) >= h.s66 THEN 'head'
                WHEN CAST(s.lm_score AS DOUBLE) >= h.s33 THEN 'middle'
                ELSE 'tail' END AS sb
    FROM scored s JOIN th t USING (lang) JOIN ths h USING (lang)
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN eb = sb THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
       CAST(SUM(CASE WHEN eb = 'head' THEN 1 ELSE 0 END) AS BIGINT) AS exact_head,
       CAST(SUM(CASE WHEN eb = 'middle' THEN 1 ELSE 0 END) AS BIGINT) AS exact_middle,
       CAST(SUM(CASE WHEN eb = 'tail' THEN 1 ELSE 0 END) AS BIGINT) AS exact_tail,
       CAST(SUM(CASE WHEN sb = 'head' THEN 1 ELSE 0 END) AS BIGINT) AS sketch_head,
       CAST(SUM(CASE WHEN sb = 'middle' THEN 1 ELSE 0 END) AS BIGINT) AS sketch_middle,
       CAST(SUM(CASE WHEN sb = 'tail' THEN 1 ELSE 0 END) AS BIGINT) AS sketch_tail
FROM per
GROUP BY lang
"""


def ccnet_buckets_oracle_sql(
    model_size: int = CHARLM_MODEL_SIZE, scale: int = CHARLM_SCALE
) -> str:
    from ..functions.percentile import midpoint_percentile_sql

    inner = charlm_score_oracle_sql(model_size, scale)
    parr = "list_sort(list(CAST(lm_score AS DOUBLE)))"
    return f"""
WITH scored AS ({inner}),
th AS (
    SELECT lang,
           {midpoint_percentile_sql(parr, 33.0)} AS p33,
           {midpoint_percentile_sql(parr, 66.0)} AS p66
    FROM scored GROUP BY lang
)
SELECT s.doc_id, s.lang, s.lm_score,
       CASE WHEN CAST(s.lm_score AS DOUBLE) >= t.p66 THEN 'head'
            WHEN CAST(s.lm_score AS DOUBLE) >= t.p33 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scored s JOIN th t USING (lang)
"""
