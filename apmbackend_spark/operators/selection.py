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
