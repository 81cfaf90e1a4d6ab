"""Data selection via importance resampling (DSIR — Xie et al. 2023,
public literature): score every raw document by how much more likely its
hashed n-gram features are under a target distribution than under the raw
distribution, the standard automatic way a pretraining pipeline tilts a
100 TB crawl toward a curated target domain without training a classifier.

Method (faithful to the paper's hashed-ngram variant):
  * features: unigrams + bigrams of the shared word tokenizer, hashed into
    DSIR_BUCKETS buckets with the repo's md5-derived ``hash64`` (same
    hashing-trick discipline as ``feature_hashing``);
  * two bag-of-buckets unigram models with add-1 smoothing — p_target from
    the target slice (here: ``lang = target_lang``, the curated-domain
    stand-in the fixtures offer), p_raw from the whole corpus;
  * per-document log-importance weight
        w(x) = sum_b c_xb * (log p_target(b) - log p_raw(b))
    and selection = w(x) > 0 (more target-like than raw-like — an absolute
    threshold, so no global sort is needed to make the cut).

Bit-determinism — the exact-log2 discipline: every ``log`` above is the
FIXED-POINT INTEGER base-2 log

    L(x) = e * 2^16 + frac,   e = floor(log2 x),

computed by the classic square-and-normalize algorithm in PURE int64
arithmetic: normalize x to a 31-bit mantissa m in [2^30, 2^31), then 16
rounds of m <- m^2 with a renormalizing shift, emitting one fraction bit
per round (m^2 < 2^62 never overflows; the (m, bits) state is packed into
ONE bigint as m * 2^16 + bits so both engines fold plain integers). Both
engines run the identical algorithm — Spark as an ``aggregate`` HOF over
``sequence(1,16)``, DuckDB as a ``list_reduce`` fold — so L is exact and
engine-independent, where a float ``ln`` would differ across libms (the
``charlm_score`` precedent, which dodged logs; this module keeps the real
log-ratio semantics DSIR needs). L(x) <= floor(2^16 * log2 x) with error
< 4 fixed-point ulps from mantissa truncation — identical in both engines,
monotone across the count magnitudes that matter.

Per-doc scores are then integer sums of (count x integer weight): exact,
order-independent, hash-gradeable. |w_b| < 64 * 2^16 and counts < 2^40 at
100 TB keep every sum far below 2^63.

Scale shape (100 TB): one gram explode -> combinable (doc_id, bucket)
count (the only corpus-sized shuffle, and it carries 3 small columns);
the two models are B-row rollups of that frame; the weight table is B
rows BROADCAST back onto the per-doc counts for one more combinable
aggregate. No Python, no window over the corpus, no global sort.

Reference parity note: the reference engine (APMBackend, a Node.js APM
stack) has no corpus-selection operator — this is part of the
beyond-reference LLM-data-pipeline surface the build brief asks for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash64, hash64_sql, tokens, tokens_sql

DSIR_BUCKETS = 512
DSIR_TARGET_LANG = "en"
L2_FRAC = 16
L2_SCALE = 1 << L2_FRAC           # 65536
_T61 = 1 << 61                    # m^2 >= 2^61  <=>  mantissa crossed 2.0


def _with_log2fix(df: DataFrame, src_sql: str, out: str) -> DataFrame:
    """df + column `out` = L(src_sql) via the packed-state integer fold.
    `src_sql` is a SQL expression over df's columns, value >= 1."""
    e = f"__e_{out}"
    m0 = f"__m0_{out}"
    df = df.withColumn(e, F.expr(f"CAST(length(bin({src_sql})) - 1 AS INT)"))
    df = df.withColumn(
        m0,
        F.expr(
            f"CASE WHEN {e} <= 30 THEN shiftleft(CAST({src_sql} AS BIGINT), 30 - {e}) "
            f"ELSE shiftright(CAST({src_sql} AS BIGINT), {e} - 30) END"
        ),
    )
    fold = (
        f"aggregate(sequence(1, {L2_FRAC}), {m0} * {L2_SCALE}L, "
        f"(s, i) -> CASE WHEN shiftright(s, {L2_FRAC}) * shiftright(s, {L2_FRAC}) >= {_T61}L "
        f"THEN shiftright(shiftright(s, {L2_FRAC}) * shiftright(s, {L2_FRAC}), 31) * {L2_SCALE}L "
        f"     + (s % {L2_SCALE}L) * 2L + 1L "
        f"ELSE shiftright(shiftright(s, {L2_FRAC}) * shiftright(s, {L2_FRAC}), 30) * {L2_SCALE}L "
        f"     + (s % {L2_SCALE}L) * 2L END, "
        f"s -> CAST({e} AS BIGINT) * {L2_SCALE}L + s % {L2_SCALE}L)"
    )
    return df.withColumn(out, F.expr(fold)).drop(e, m0)


def log2fix_sql(x: str) -> str:
    """DuckDB rendering of the identical packed-state fold."""
    e = f"(length(format('{{:b}}', {x})) - 1)"
    m0 = (
        f"(CASE WHEN {e} <= 30 THEN CAST(({x}) AS BIGINT) << (30 - {e}) "
        f"ELSE CAST(({x}) AS BIGINT) >> ({e} - 30) END)"
    )
    step = (
        f"CASE WHEN (a >> {L2_FRAC}) * (a >> {L2_FRAC}) >= {_T61} "
        f"THEN (((a >> {L2_FRAC}) * (a >> {L2_FRAC})) >> 31) * {L2_SCALE} + (a % {L2_SCALE}) * 2 + 1 "
        f"ELSE (((a >> {L2_FRAC}) * (a >> {L2_FRAC})) >> 30) * {L2_SCALE} + (a % {L2_SCALE}) * 2 END"
    )
    return (
        f"(CAST({e} AS BIGINT) * {L2_SCALE} + "
        f"list_reduce(list_prepend({m0} * {L2_SCALE}, "
        f"list_transform(range(1, {L2_FRAC + 1}), i -> CAST(0 AS BIGINT))), "
        f"(a, x) -> {step}) % {L2_SCALE})"
    )


def _grams(text: Column) -> Column:
    """Unigram + bigram multiset (NOT deduped — DSIR models counts)."""
    t = tokens(text)
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i), F.element_at(t, i + F.lit(1))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(t, bigrams)


def _grams_sql(text: str) -> str:
    t = tokens_sql(text)
    return (
        f"list_concat({t}, list_transform("
        f"range(1, greatest(len({t}) - 1, 0) + 1), "
        f"i -> ({t})[i] || ' ' || ({t})[i + 1]))"
    )


def dsir_select(
    documents: DataFrame,
    buckets: int = DSIR_BUCKETS,
    target_lang: str = DSIR_TARGET_LANG,
) -> DataFrame:
    """Per-document DSIR log-importance weight and the w > 0 selection
    (see module docstring). Output: (doc_id, lang, n_feats, dsir_score,
    selected) for EVERY document — zero-token docs score 0 / unselected."""
    B = int(buckets)
    db = (
        documents.select(
            "doc_id",
            "lang",
            F.explode(_grams(F.col("text"))).alias("g"),
        )
        .select(
            "doc_id",
            "lang",
            (hash64(F.col("g")) % F.lit(B)).cast("int").alias("bucket"),
        )
        .groupBy("doc_id", "lang", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        # four consumers (cr, ct, totals, the scoring join) would each
        # re-run the gram explode over the corpus otherwise; pinned via
        # localCheckpoint (not persist) so the blocks are released with
        # the frame instead of accumulating across invocations
        .localCheckpoint()
    )
    cr = db.groupBy("bucket").agg(F.sum("c").alias("cr"))
    ct = (
        db.where(F.col("lang") == target_lang)
        .groupBy("bucket")
        .agg(F.sum("c").alias("ct"))
    )
    totals = db.agg(
        F.sum("c").alias("nr"),
        F.sum(F.when(F.col("lang") == target_lang, F.col("c")).otherwise(0)).alias(
            "nt"
        ),
    )
    # the smoothed-totals logs are constant across buckets: fold them ONCE
    # on the 1-row totals frame, then broadcast the two scalars — the
    # weight table's cost stays "B rows", not "B x 16-round folds"
    totals = _with_log2fix(totals, f"nt + {B}", "l_nt")
    totals = _with_log2fix(totals, f"nr + {B}", "l_nr")
    model = (
        cr.join(ct, "bucket", "left")
        .select("bucket", "cr", F.coalesce(F.col("ct"), F.lit(0)).alias("ct"))
        .crossJoin(F.broadcast(totals.select("l_nt", "l_nr")))
    )
    model = _with_log2fix(model, "ct + 1", "l_ct")
    model = _with_log2fix(model, "cr + 1", "l_cr")
    weights = model.select(
        "bucket",
        (
            F.col("l_ct") - F.col("l_nt") - F.col("l_cr") + F.col("l_nr")
        ).alias("w"),
    )
    per_doc = (
        db.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_feats"),
            F.sum(F.col("c") * F.col("w")).alias("score"),
        )
    )
    return (
        documents.select("doc_id", "lang")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce(F.col("score"), F.lit(0)).cast("long").alias("dsir_score"),
            (F.coalesce(F.col("score"), F.lit(0)) > 0).alias("selected"),
        )
    )


def dsir_select_oracle_sql(
    buckets: int = DSIR_BUCKETS, target_lang: str = DSIR_TARGET_LANG
) -> str:
    B = int(buckets)
    return f"""
WITH grams AS (
    SELECT doc_id, lang, unnest({_grams_sql('text')}) AS g FROM documents
), db AS (
    SELECT doc_id, lang, CAST({hash64_sql('g')} % {B} AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM grams GROUP BY 1, 2, 3
), cr AS (
    SELECT bucket, CAST(SUM(c) AS BIGINT) AS cr FROM db GROUP BY 1
), ct AS (
    SELECT bucket, CAST(SUM(c) AS BIGINT) AS ct
    FROM db WHERE lang = '{target_lang}' GROUP BY 1
), totals AS (
    SELECT CAST(SUM(c) AS BIGINT) AS nr,
           CAST(SUM(CASE WHEN lang = '{target_lang}' THEN c ELSE 0 END) AS BIGINT) AS nt
    FROM db
), model AS (
    SELECT cr.bucket,
           {log2fix_sql('COALESCE(ct.ct, 0) + 1')}
             - {log2fix_sql(f'nt + {B}')}
             - {log2fix_sql('cr.cr + 1')}
             + {log2fix_sql(f'nr + {B}')} AS w
    FROM cr LEFT JOIN ct USING (bucket) CROSS JOIN totals
), per_doc AS (
    SELECT db.doc_id,
           CAST(SUM(c) AS BIGINT) AS n_feats,
           CAST(SUM(c * m.w) AS BIGINT) AS score
    FROM db JOIN model m USING (bucket)
    GROUP BY db.doc_id
)
SELECT d.doc_id, d.lang,
       COALESCE(p.n_feats, 0) AS n_feats,
       COALESCE(p.score, 0) AS dsir_score,
       (COALESCE(p.score, 0) > 0) AS selected
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis & Spirakis 2006): the
# one-pass distributed reservoir a quality-proportional corpus sample needs.
# ---------------------------------------------------------------------------

WSAMPLE_M = 100
_WS_H = 1 << 60  # hash64 range; u = (h + 1) / H in (0, 1]


def weighted_sample(
    documents: DataFrame, m: int = WSAMPLE_M, weights: DataFrame | None = None
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis 2006):
    every item draws key u^(1/w) from a uniform u and the sample is the
    top-m keys — inclusion probability proportional to weight, one pass,
    no sequential reservoir, which is why it is THE distributed form of
    weighted sampling (a quality-proportional corpus subsample at 100 TB:
    score once, take top-m).

    Deterministic rendering: u comes from the engine hash
    (``hash64('ws:' || doc_id) + 1) / 2^60``, and the sort key
    ln(u)/w is computed as ``(L(h+1) - L(2^60)) / w`` with the module's
    EXACT fixed-point log2 — the numerator is an integer identical in
    both engines, and the single double division is exactly rounded, so
    the ranking (DESC, ties on doc_id) replays bit-for-bit. (ln vs log2
    differs by a positive constant factor, which cannot change the
    ordering.) Weights default to the quality signal, clamped to >= 1:
    ``greatest(1, 1 + floor(quality * 100))``.

    Scale shape: one stateless scan computes (w, key); the top-m is the
    two-stage exact window (salted pre-window bounds each task, global
    window ranks 64*m survivors — the binary_rerank discipline).

    Output: the m selected rows as (rank, doc_id, weight, skey).
    """
    from pyspark.sql import Window

    if weights is None:
        from apmbackend_spark.operators.textstats import doc_stats

        weights = doc_stats(documents).select(
            "doc_id",
            F.greatest(
                F.lit(1).cast("long"),
                (F.lit(1) + F.floor(F.col("quality") * 100)).cast("long"),
            ).alias("w"),
        )
    keyed = weights.select(
        "doc_id",
        "w",
        (
            hash64(F.concat(F.lit("ws:"), F.col("doc_id").cast("string")))
            + F.lit(1)
        ).alias("h1"),
    )
    keyed = _with_log2fix(keyed, "h1", "l_h")
    skey = (F.col("l_h") - F.lit(60 * L2_SCALE)).cast("double") / F.col(
        "w"
    ).cast("double")
    w1 = Window.partitionBy("salt").orderBy(F.desc("skey"), F.asc("doc_id"))
    w2 = Window.orderBy(F.desc("skey"), F.asc("doc_id"))
    return (
        keyed.select(
            "doc_id",
            F.col("w").alias("weight"),
            skey.alias("skey"),
            (F.col("doc_id") % 64).alias("salt"),
        )
        .withColumn("rn1", F.row_number().over(w1))
        .where(F.col("rn1") <= int(m))
        .withColumn("rank", F.row_number().over(w2).cast("int"))
        .where(F.col("rank") <= int(m))
        .select("rank", "doc_id", "weight", "skey")
    )


def weighted_sample_oracle_sql(m: int = WSAMPLE_M) -> str:
    from apmbackend_spark.operators.textstats import doc_stats_oracle_sql

    h1 = f"({hash64_sql(chr(39) + 'ws:' + chr(39) + ' || CAST(doc_id AS VARCHAR)')} + 1)"
    lh = log2fix_sql(h1)
    return f"""
WITH ds AS (
    SELECT doc_id,
           greatest(CAST(1 AS BIGINT),
                    CAST(1 + floor(quality * 100) AS BIGINT)) AS w
    FROM ({doc_stats_oracle_sql()}) q
), keyed AS (
    SELECT doc_id, w,
           CAST({lh} - {60 * L2_SCALE} AS DOUBLE) / CAST(w AS DOUBLE) AS skey
    FROM ds
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY skey DESC, doc_id ASC) AS INT) AS rank,
       doc_id, w AS weight, skey
FROM keyed
QUALIFY rank <= {int(m)}
"""


# --- nb_quality: multinomial Naive-Bayes quality classifier ------------

NB_HOLDOUT_MOD = 5        # doc_id % 5 == 0 is the held-out scoring split
NB_MIN_WORDS = 50         # teacher-rule thresholds (see nb_quality)
NB_MIN_STOPHITS = 2
NB_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
NB_LEN_BUCKET = 10        # word-count bucket width for the #len pseudo-token


def _nb_labeled(documents: DataFrame) -> DataFrame:
    """(doc_id, t, bag, lbl): tokens, student feature bag, teacher
    label — word count >= NB_MIN_WORDS and >= NB_MIN_STOPHITS
    required-stopword token hits (the Gopher stopword set, total hits
    since the fixture corpus tops out at one distinct hit per doc).
    The bag is the word tokens plus ONE `#lenK` pseudo-token (K =
    word count DIV NB_LEN_BUCKET) — the fastText-trick way to hand a
    bag-of-words student a document-level signal as just another
    vocabulary row ('#' can't appear in a real token)."""
    docs = documents.select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    stop = F.array(*[F.lit(s) for s in NB_STOPWORDS])
    return docs.select(
        "doc_id",
        tokens(F.col("text")).alias("t"),
    ).select(
        "doc_id",
        "t",
        F.concat(
            F.col("t"),
            F.array(
                F.concat(
                    F.lit("#len"),
                    F.expr(
                        f"CAST(CAST(size(t) AS BIGINT)"
                        f" DIV {NB_LEN_BUCKET} AS STRING)"
                    ),
                )
            ),
        ).alias("bag"),
        F.when(
            (F.size("t") >= NB_MIN_WORDS)
            & (
                F.size(F.filter(F.col("t"), lambda w: F.array_contains(stop, w)))
                >= NB_MIN_STOPHITS
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("lbl"),
    )


def nb_quality(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, label, score_pass, score_fail, pred, correct):
    a multinomial Naive-Bayes text-quality classifier — the
    fastText-style "cheap student mimics an expensive teacher" shape
    every production crawl filter ships (CCNet/LLaMA use an n-gram
    linear classifier the same way; public literature). The teacher is a
    compact rule label (word count + required-stopword hits); the
    student trains word likelihoods on the 4/5 training split and scores
    the held-out 1/5 (doc_id % NB_HOLDOUT_MOD == 0), add-1 smoothed:

        score_c(d) = L(n_c) - L(n) + sum_w cnt_dw * (L(c_wc + 1)
                                                     - L(T_c + V))

    with every L the repo's exact fixed-point log2 (dsir_select's fold),
    so scores are integer sums — bit-identical in DuckDB — and pred is
    an exact integer comparison, never a float argmax. Unseen words
    carry L(1) - L(T_c + V) = -L(T_c + V), the same smoothing mass.

    Scale (100 TB): one token explode into a combinable (doc, word)
    count (the only corpus-sized shuffle); the model is a |vocab|-row
    rollup joined back by word; priors/denominators are 1-row frames
    broadcast onto the scored split. No window, no global sort, no
    Python.

    Reference parity note: the reference (APMBackend, Node.js APM stack)
    has no classifier — beyond-reference LLM-pipeline surface."""
    lab = _nb_labeled(documents)
    tc = (
        lab.select("doc_id", "lbl", F.explode("bag").alias("word"))
        .groupBy("doc_id", "lbl", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    train = tc.where(F.col("doc_id") % NB_HOLDOUT_MOD != 0)
    wc = train.groupBy("word").agg(
        F.coalesce(
            F.sum(F.when(F.col("lbl") == 1, F.col("cnt"))), F.lit(0)
        )
        .cast("long")
        .alias("c1"),
        F.coalesce(
            F.sum(F.when(F.col("lbl") == 0, F.col("cnt"))), F.lit(0)
        )
        .cast("long")
        .alias("c0"),
    )
    tot = wc.agg(
        F.sum("c1").cast("long").alias("t1"),
        F.sum("c0").cast("long").alias("t0"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    pri = (
        lab.where(F.col("doc_id") % NB_HOLDOUT_MOD != 0)
        .agg(
            F.sum("lbl").cast("long").alias("n1"),
            F.sum(1 - F.col("lbl")).cast("long").alias("n0"),
        )
    )
    cons = tot.crossJoin(F.broadcast(pri))
    cons = _with_log2fix(cons, "t1 + v", "den1")
    cons = _with_log2fix(cons, "t0 + v", "den0")
    cons = _with_log2fix(cons, "n1", "l_n1")
    cons = _with_log2fix(cons, "n0", "l_n0")
    cons = _with_log2fix(cons, "n1 + n0", "l_n")
    cons = cons.select(
        "den1",
        "den0",
        (F.col("l_n1") - F.col("l_n")).alias("prior1"),
        (F.col("l_n0") - F.col("l_n")).alias("prior0"),
    )
    ws = _with_log2fix(wc, "c1 + 1", "l_c1")
    ws = _with_log2fix(ws, "c0 + 1", "l_c0")
    ws = ws.crossJoin(F.broadcast(cons.select("den1", "den0"))).select(
        "word",
        (F.col("l_c1") - F.col("den1")).alias("s1"),
        (F.col("l_c0") - F.col("den0")).alias("s0"),
    )
    test_tc = tc.where(F.col("doc_id") % NB_HOLDOUT_MOD == 0)
    sums = (
        test_tc.join(ws, "word", "left")
        .crossJoin(F.broadcast(cons.select("den1", "den0")))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("cnt") * F.coalesce(F.col("s1"), -F.col("den1"))
            )
            .cast("long")
            .alias("sum1"),
            F.sum(
                F.col("cnt") * F.coalesce(F.col("s0"), -F.col("den0"))
            )
            .cast("long")
            .alias("sum0"),
        )
    )
    out = (
        lab.where(F.col("doc_id") % NB_HOLDOUT_MOD == 0)
        .select("doc_id", F.size("t").cast("long").alias("n_tokens"), "lbl")
        .join(sums, "doc_id", "left")
        .crossJoin(F.broadcast(cons.select("prior1", "prior0")))
        .select(
            "doc_id",
            "n_tokens",
            F.col("lbl").alias("label"),
            (F.col("prior1") + F.coalesce(F.col("sum1"), F.lit(0)))
            .cast("long")
            .alias("score_pass"),
            (F.col("prior0") + F.coalesce(F.col("sum0"), F.lit(0)))
            .cast("long")
            .alias("score_fail"),
        )
    )
    return out.select(
        "*",
        F.when(F.col("score_pass") > F.col("score_fail"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("pred"),
    ).select(
        "*",
        F.when(F.col("pred") == F.col("label"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("correct"),
    )


def nb_quality_oracle_sql() -> str:
    t = tokens_sql("text")
    stop_list = ", ".join(f"'{s}'" for s in NB_STOPWORDS)
    return f"""
WITH nbdocs AS (
    SELECT doc_id, COALESCE(text, '') AS text FROM documents
), nbt AS (
    SELECT doc_id, {t} AS t FROM nbdocs
), nblab AS (
    SELECT doc_id, t,
           list_append(t, '#len' ||
               CAST(CAST(len(t) AS BIGINT) // {NB_LEN_BUCKET} AS VARCHAR))
               AS bag,
           CASE WHEN len(t) >= {NB_MIN_WORDS}
                 AND len(list_filter(t, w -> w IN ({stop_list})))
                     >= {NB_MIN_STOPHITS}
                THEN 1 ELSE 0 END AS lbl
    FROM nbt
), nbtok AS (
    SELECT doc_id, lbl, unnest(bag) AS word FROM nblab
), nbtc AS (
    SELECT doc_id, lbl, word, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM nbtok GROUP BY doc_id, lbl, word
), nbwc AS (
    SELECT word,
           CAST(COALESCE(SUM(CASE WHEN lbl = 1 THEN cnt END), 0)
                AS BIGINT) AS c1,
           CAST(COALESCE(SUM(CASE WHEN lbl = 0 THEN cnt END), 0)
                AS BIGINT) AS c0
    FROM nbtc WHERE doc_id % {NB_HOLDOUT_MOD} <> 0 GROUP BY word
), nbtot AS (
    SELECT CAST(SUM(c1) AS BIGINT) AS t1,
           CAST(SUM(c0) AS BIGINT) AS t0,
           CAST(COUNT(*) AS BIGINT) AS v
    FROM nbwc
), nbpri AS (
    SELECT CAST(SUM(lbl) AS BIGINT) AS n1,
           CAST(SUM(1 - lbl) AS BIGINT) AS n0
    FROM nblab WHERE doc_id % {NB_HOLDOUT_MOD} <> 0
), nbcons AS (
    SELECT {log2fix_sql('t1 + v')} AS den1,
           {log2fix_sql('t0 + v')} AS den0,
           {log2fix_sql('n1')} - {log2fix_sql('n1 + n0')} AS prior1,
           {log2fix_sql('n0')} - {log2fix_sql('n1 + n0')} AS prior0
    FROM nbtot, nbpri
), nbws AS (
    SELECT word,
           {log2fix_sql('c1 + 1')} - den1 AS s1,
           {log2fix_sql('c0 + 1')} - den0 AS s0
    FROM nbwc, nbcons
), nbsums AS (
    SELECT c.doc_id,
           CAST(SUM(c.cnt * COALESCE(w.s1, -k.den1)) AS BIGINT) AS sum1,
           CAST(SUM(c.cnt * COALESCE(w.s0, -k.den0)) AS BIGINT) AS sum0
    FROM nbtc c CROSS JOIN nbcons k LEFT JOIN nbws w ON c.word = w.word
    WHERE c.doc_id % {NB_HOLDOUT_MOD} = 0
    GROUP BY c.doc_id
), nbout AS (
    SELECT l.doc_id,
           CAST(len(l.t) AS BIGINT) AS n_tokens,
           l.lbl AS label,
           CAST(k.prior1 + COALESCE(s.sum1, 0) AS BIGINT) AS score_pass,
           CAST(k.prior0 + COALESCE(s.sum0, 0) AS BIGINT) AS score_fail
    FROM nblab l CROSS JOIN nbcons k LEFT JOIN nbsums s
         ON l.doc_id = s.doc_id
    WHERE l.doc_id % {NB_HOLDOUT_MOD} = 0
)
SELECT doc_id, n_tokens,
       CAST(label AS INT) AS label,
       score_pass, score_fail,
       CAST(CASE WHEN score_pass > score_fail THEN 1 ELSE 0 END AS INT)
           AS pred,
       CAST(CASE WHEN (CASE WHEN score_pass > score_fail THEN 1 ELSE 0
                       END) = label
                 THEN 1 ELSE 0 END AS INT) AS correct
FROM nbout
"""
