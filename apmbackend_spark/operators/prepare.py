"""End-to-end training-corpus preparation: the composed DAG a user actually
runs before a tokenization job, built entirely from the engine's
LLM-pipeline operators (each independently oracle-checked):

    quality filter (textstats.corpus_filter)
      ∩ near-dup representative selection (dedup.dedup_clusters)
      → PII scrub counts (textstats.corpus_scrub)
      → sequence packing over the surviving corpus (packing.token_pack)

Semantics choices, stated explicitly because they are contracts:
  * Dedup clusters are computed over the FULL corpus, then intersected with
    the filter survivors; the kept representative is the MIN doc_id among a
    cluster's *surviving* members (a cluster whose canonical doc was
    filtered out still keeps its best remaining member).
  * Packing runs over the prepared corpus in doc_id order, so sequence
    addresses are a pure function of the corpus + config — two engines (or
    two runs) agree bit-for-bit.

Scale shape: filter and scrub are stateless single scans; the dedup join is
|V|-sized 8-byte label rows against the doc stream (text bytes never
shuffle); packing is the range-partitioned two-pass cumulative sum, fed the
filter scan's precomputed n_tokens so the surviving text is never
re-tokenized. The whole DAG adds NO new shuffle beyond its constituent
operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apmbackend_spark.operators.dedup import (
    dedup_clusters,
    dedup_clusters_oracle_sql,
)
from apmbackend_spark.operators.packing import token_pack
from apmbackend_spark.operators.textstats import (
    corpus_filter,
    corpus_filter_oracle_sql,
    corpus_scrub,
    corpus_scrub_oracle_sql,
)
from apmbackend_spark.functions.text import hash64, hash64_sql, tokens, tokens_sql


def corpus_prepare(
    documents: DataFrame,
    bands: int = 4,
    rows_per_band: int = 2,
    budget: int = 2048,
) -> DataFrame:
    """One row per document surviving filter+dedup, with its PII scrub
    counts and its packed-sequence address: (doc_id, source, n_tokens,
    n_pii, start_offset, seq_id)."""
    # carry n_tokens out of the filter scan: doc_stats already computed
    # size(tokens(text)) for every document, so packing can run over this
    # narrow (doc_id, n_tokens) frame instead of re-tokenizing the
    # surviving text — one full-corpus regex pass removed from the DAG
    filt = (
        corpus_filter(documents)
        .where(F.col("keep"))
        .select("doc_id", "n_tokens")
    )
    clusters = dedup_clusters(documents, bands, rows_per_band)
    # no extra persist here: dedup_clusters already persists its label
    # frame (the expensive upstream), so the three downstream consumers
    # (packing, scrub, source projection) re-derive kept ids via cheap
    # joins against that cache — an additional persist at this seam was
    # measured ~25% SLOWER at sf0.1 (cache materialization serializes the
    # branches)
    kept_members = clusters.join(filt, "doc_id")
    reps = kept_members.groupBy("cluster_id").agg(
        F.min("doc_id").alias("doc_id")
    )
    kept = kept_members.join(reps.select("doc_id"), "doc_id").select(
        "doc_id", "n_tokens"
    )
    kept_ids = kept.select("doc_id")

    prepared = documents.join(kept_ids, "doc_id")
    packed = token_pack(
        documents, budget, counts=kept
    )  # doc_id, n_tokens, start_offset, seq_id
    # scrub only the survivors: every inner join downstream keys on the kept
    # set anyway, and the PII regex pass is the expensive scan — running it
    # over dropped documents (or rescanning `documents` for `source`) would
    # be pure wasted work at corpus scale
    pii = corpus_scrub(prepared).select(
        "doc_id",
        (F.col("n_emails") + F.col("n_phones") + F.col("n_ips")).alias("n_pii"),
    )
    return (
        packed.join(pii, "doc_id")
        .join(prepared.select("doc_id", "source"), "doc_id")
        .select(
            "doc_id", "source", "n_tokens", "n_pii", "start_offset", "seq_id"
        )
    )


# Default mixture config for the graded query: up-weighted "curated"
# sources, default weight 1 elsewhere, keep ~40% of corpus tokens.
MIXTURE_WEIGHTS: dict[str, int] = {"src0": 4, "src1": 4, "src2": 2, "src3": 2}
MIXTURE_DEFAULT_WEIGHT = 1
MIXTURE_FRAC = (2, 5)  # token budget = total_tokens * 2/5 (exact rational)


def corpus_mixture(
    documents: DataFrame,
    weights: dict[str, int] | None = None,
    default_weight: int = MIXTURE_DEFAULT_WEIGHT,
    frac: tuple[int, int] = MIXTURE_FRAC,
) -> DataFrame:
    """Domain-weighted mixture sampling to a token budget (the Pile/DoReMi
    mixture-building step): each source s gets budget
    ``budget_total * w_s / Σw``, realized as a deterministic per-source
    acceptance rate ``min(1, budget_s / tokens_s)`` applied by hash
    threshold on doc_id — so the sampled corpus is a pure function of
    (corpus, weights, frac), reproducible across engines and runs.

    Determinism: the budget is an exact integer (``total_tokens*num div
    den``), rates are one exactly-rounded IEEE division of exact integer
    products (< 2^53), and acceptance compares an integer hash residue
    against ``rate * 1e6`` — no cross-row float accumulation anywhere.

    Scale shape: ONE tokenize scan — the narrow per-doc frame (doc_id,
    source, n_tokens, hash; no text) is persisted so the per-source rollup,
    the totals aggregate, and the final rate join all read the same
    materialization instead of re-tokenizing the corpus per branch — then a
    map-side-combinable |sources| rollup, a single-row totals broadcast,
    and a broadcast rate join. The corpus text never shuffles.
    """
    weights = MIXTURE_WEIGHTS if weights is None else weights
    num, den = frac
    wmap = F.create_map(
        *[x for k, v in sorted(weights.items()) for x in (F.lit(k), F.lit(v))]
    )
    per_doc = documents.select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        (hash64(F.col("doc_id").cast("string")) % F.lit(1_000_000)).alias("h"),
    ).persist()
    per_source = per_doc.groupBy("source").agg(
        F.sum("n_tokens").alias("tokens_s")
    ).withColumn(
        "w", F.coalesce(wmap[F.col("source")], F.lit(default_weight)).cast("long")
    )
    totals = per_source.agg(
        F.sum("tokens_s").alias("total_tokens"), F.sum("w").alias("sum_w")
    )
    rates = (
        per_source.crossJoin(F.broadcast(totals))
        .withColumn(
            "budget_total", F.expr(f"(total_tokens * {num}) div {den}")
        )
        .withColumn(
            "rate",
            F.least(
                F.lit(1.0),
                (F.col("budget_total") * F.col("w")).cast("double")
                / (F.col("sum_w") * F.col("tokens_s")).cast("double"),
            ),
        )
        .select("source", "rate")
    )
    return (
        per_doc.join(F.broadcast(rates), "source")
        .where(F.col("h").cast("double") < F.col("rate") * F.lit(1_000_000.0))
        .select("doc_id", "source", "n_tokens", "rate")
    )


def corpus_mixture_oracle_sql(
    weights: dict[str, int] | None = None,
    default_weight: int = MIXTURE_DEFAULT_WEIGHT,
    frac: tuple[int, int] = MIXTURE_FRAC,
) -> str:
    weights = MIXTURE_WEIGHTS if weights is None else weights
    num, den = frac
    wcase = (
        "CASE source "
        + " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(weights.items()))
        + f" ELSE {default_weight} END"
    )
    return f"""
WITH per_doc AS (
    SELECT doc_id, source,
           CAST(len({tokens_sql("text")}) AS BIGINT) AS n_tokens,
           {hash64_sql("CAST(doc_id AS VARCHAR)")} % 1000000 AS h
    FROM documents
),
per_source AS (
    SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS tokens_s,
           CAST({wcase} AS BIGINT) AS w
    FROM per_doc GROUP BY source
),
totals AS (
    SELECT CAST(SUM(tokens_s) AS BIGINT) AS total_tokens,
           CAST(SUM(w) AS BIGINT) AS sum_w
    FROM per_source
),
rates AS (
    SELECT source,
           least(CAST(1.0 AS DOUBLE),
                 CAST(((total_tokens * {num}) // {den}) * w AS DOUBLE)
                   / CAST(sum_w * tokens_s AS DOUBLE)) AS rate
    FROM per_source CROSS JOIN totals
)
SELECT d.doc_id, d.source, d.n_tokens, r.rate
FROM per_doc d JOIN rates r USING (source)
WHERE CAST(d.h AS DOUBLE) < r.rate * CAST(1000000 AS DOUBLE)
"""


def corpus_prepare_oracle_sql(
    bands: int = 4, rows_per_band: int = 2, budget: int = 2048
) -> str:
    return f"""
WITH clusters AS ({dedup_clusters_oracle_sql(bands, rows_per_band)}),
filt AS ({corpus_filter_oracle_sql()}),
keptm AS (
    SELECT c.doc_id, c.cluster_id
    FROM clusters c JOIN filt f USING (doc_id)
    WHERE f.keep
), reps AS (
    SELECT cluster_id, MIN(doc_id) AS doc_id FROM keptm GROUP BY cluster_id
), kept AS (
    SELECT k.doc_id FROM keptm k JOIN reps r ON k.doc_id = r.doc_id
), counted AS (
    SELECT d.doc_id, CAST(len({tokens_sql('text')}) AS BIGINT) AS n_tokens
    FROM documents d JOIN kept USING (doc_id)
), cum AS (
    SELECT doc_id, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS start_offset
    FROM counted
), scrub AS ({corpus_scrub_oracle_sql()})
SELECT c.doc_id, d.source, c.n_tokens,
       CAST(s.n_emails + s.n_phones + s.n_ips AS BIGINT) AS n_pii,
       c.start_offset, c.start_offset // {budget} AS seq_id
FROM cum c
JOIN documents d USING (doc_id)
JOIN scrub s USING (doc_id)
"""


def corpus_prepare_exact(
    documents: DataFrame,
    k: int | None = None,
    budget: int = 2048,
) -> DataFrame:
    """End-to-end prep with EXACT substring dedup in the chain — the
    ExactSubstr pipeline (filter -> span-level scrub -> pack):

        quality filter (textstats.corpus_filter)
          -> span_scrub over the SURVIVORS (every duplicated k-token
             window cut except its canonical site — dedup.span_scrub)
          -> sequence packing of the SCRUBBED token counts

    One row per surviving document: (doc_id, source, n_raw, n_cut,
    n_kept, scrub_fp, start_offset, seq_id). Semantics contracts:
    duplication (and each span's canonical site) is decided WITHIN the
    filter-surviving corpus — you scrub what you keep, so a duplicate
    whose canonical copy was quality-filtered away keeps its best
    surviving site; packing runs over n_kept (the scrubbed corpus is
    what gets tokenized downstream) in doc_id order, so sequence
    addresses are a pure function of (corpus, config).

    Scale shape: the constituent operators' own shapes, composed with no
    new shuffle — the filter is one scan, span_scrub ships only
    (doc_id, pos, fp) keys, and packing consumes the scrub's already-
    computed n_kept so the surviving text is never re-tokenized."""
    from apmbackend_spark.operators.dedup import SPAN_EXACT_K, span_scrub

    kk = int(SPAN_EXACT_K if k is None else k)
    filt = (
        corpus_filter(documents).where(F.col("keep")).select("doc_id")
    )
    survivors = documents.join(filt, "doc_id")
    scrub = span_scrub(survivors, k=kk)
    counts = scrub.select("doc_id", F.col("n_kept").alias("n_tokens"))
    packed = token_pack(documents, budget, counts=counts)
    return (
        packed.join(
            scrub.select(
                "doc_id",
                F.col("n_tokens").alias("n_raw"),
                "n_cut",
                "scrub_fp",
            ),
            "doc_id",
        )
        .join(survivors.select("doc_id", "source"), "doc_id")
        .select(
            "doc_id",
            "source",
            "n_raw",
            "n_cut",
            F.col("n_tokens").alias("n_kept"),
            "scrub_fp",
            "start_offset",
            "seq_id",
        )
    )


def corpus_prepare_exact_oracle_sql(
    k: int | None = None, budget: int = 2048
) -> str:
    from apmbackend_spark.operators.dedup import (
        SPAN_EXACT_K,
        span_scrub_oracle_sql,
    )

    kk = int(SPAN_EXACT_K if k is None else k)
    return f"""
WITH cfilt AS ({corpus_filter_oracle_sql()}),
survivors AS (
    SELECT d.* FROM documents d JOIN cfilt f USING (doc_id) WHERE f.keep
),
sscrub AS ({span_scrub_oracle_sql(kk, src='survivors')}),
cum AS (
    SELECT doc_id, n_kept,
           CAST(COALESCE(SUM(n_kept) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS start_offset
    FROM sscrub
)
SELECT s.doc_id, d.source,
       s.n_tokens AS n_raw,
       s.n_cut,
       s.n_kept,
       s.scrub_fp,
       c.start_offset,
       c.start_offset // {int(budget)} AS seq_id
FROM sscrub s
JOIN cum c USING (doc_id)
JOIN survivors d USING (doc_id)
"""


# ---------------------------------------------------------------------------
# UniMax budget allocation (Chung et al. 2023, public literature): epoch-
# capped water-filling of a token budget across languages — the "fairer"
# alternative to temperature sampling for multilingual pretraining mixes.
# ---------------------------------------------------------------------------

UNIMAX_EPOCH_CAP = 2
UNIMAX_BUDGET_FRAC = (3, 2)  # budget = total_tokens * 3/2


def unimax_alloc(
    documents: DataFrame,
    epoch_cap: int = UNIMAX_EPOCH_CAP,
    frac: tuple[int, int] = UNIMAX_BUDGET_FRAC,
) -> DataFrame:
    """UniMax allocation: distribute a token budget across languages,
    capping every language at ``epoch_cap`` epochs of its own data, by the
    paper's sequential water-filling — visit languages by ascending cap,
    give each ``min(cap, b_left DIV langs_left)``. Small languages hit
    their epoch cap; the leftover budget splits across the large ones.

    Rendering: the corpus-scale work is ONE combinable tokenize rollup to
    |langs| rows. The sequential fill is inherently tiny (the language
    dimension — a few hundred rows at worst) and ordered, so it runs as a
    single in-row ``aggregate`` fold over the cap-sorted array: all-integer
    arithmetic (DIV shares, least), bit-identical to the DuckDB oracle's
    recursive CTE replay of the same loop. No driver loop, no Python.

    Output per language: (lang, n_tokens, cap, alloc, capped). alloc sums
    to at most the budget; strictly less only when every language capped
    (sum of caps < budget — the paper's under-budget case).
    """
    num, den = frac
    per_lang = documents.groupBy("lang").agg(
        F.sum(F.size(tokens(F.col("text")))).cast("long").alias("n_tokens")
    )
    rows = per_lang.select(
        F.col("lang"),
        F.col("n_tokens"),
        (F.lit(int(epoch_cap)) * F.col("n_tokens")).alias("cap"),
    )
    packed = rows.agg(
        F.array_sort(
            F.collect_list(F.struct("cap", "lang", "n_tokens"))
        ).alias("arr"),
        F.expr(f"(CAST(sum(n_tokens) AS BIGINT) * {int(num)}) div {int(den)}").alias(
            "budget"
        ),
    )
    # fold state: (b_left, emitted array); share re-derives langs_left from
    # the emitted count, so the state is self-contained
    folded = packed.select(
        F.expr(
            """
            aggregate(
              arr,
              named_struct(
                'b', budget,
                'out', CAST(array() AS
                  array<struct<lang:string, n_tokens:bigint, cap:bigint, alloc:bigint>>)
              ),
              (acc, x) -> named_struct(
                'b', acc.b - least(x.cap, acc.b DIV (size(arr) - size(acc.out))),
                'out', concat(acc.out, array(named_struct(
                  'lang', x.lang,
                  'n_tokens', x.n_tokens,
                  'cap', x.cap,
                  'alloc', least(x.cap, acc.b DIV (size(arr) - size(acc.out))))))
              ),
              acc -> acc.out
            ) AS out
            """
        )
    )
    return folded.select(F.explode("out").alias("s")).select(
        F.col("s.lang").alias("lang"),
        F.col("s.n_tokens").alias("n_tokens"),
        F.col("s.cap").alias("cap"),
        F.col("s.alloc").alias("alloc"),
        (F.col("s.alloc") == F.col("s.cap")).alias("capped"),
    )


def unimax_alloc_oracle_sql(
    epoch_cap: int = UNIMAX_EPOCH_CAP,
    frac: tuple[int, int] = UNIMAX_BUDGET_FRAC,
) -> str:
    num, den = frac
    return f"""
WITH RECURSIVE per_lang AS (
    SELECT lang,
           CAST(SUM(len({tokens_sql('text')})) AS BIGINT) AS n_tokens
    FROM documents GROUP BY lang
), ordered AS (
    SELECT lang, n_tokens, {int(epoch_cap)} * n_tokens AS cap,
           CAST(ROW_NUMBER() OVER (ORDER BY {int(epoch_cap)} * n_tokens ASC, lang ASC) AS BIGINT) AS i,
           CAST(COUNT(*) OVER () AS BIGINT) AS n_langs,
           CAST((SUM(n_tokens) OVER () * {int(num)}) // {int(den)} AS BIGINT) AS budget
    FROM per_lang
), fill AS (
    SELECT i, lang, n_tokens, cap, n_langs,
           least(cap, budget // n_langs) AS alloc,
           budget - least(cap, budget // n_langs) AS b_after
    FROM ordered WHERE i = 1
    UNION ALL
    SELECT o.i, o.lang, o.n_tokens, o.cap, o.n_langs,
           least(o.cap, f.b_after // (o.n_langs - f.i)) AS alloc,
           f.b_after - least(o.cap, f.b_after // (o.n_langs - f.i)) AS b_after
    FROM fill f JOIN ordered o ON o.i = f.i + 1
)
SELECT lang, n_tokens, cap, alloc, (alloc = cap) AS capped FROM fill
"""


# ---------------------------------------------------------------------------
# Temperature sampling (Devlin 2019 mBERT / Conneau 2020 XLM-R, public
# literature): language sampling weights p_l ∝ c_l^alpha — the standard
# multilingual mix UniMax was proposed against; both gates share the same
# per-language rollup, so the two policies are directly comparable.
# ---------------------------------------------------------------------------

TEMP_MIX_ALPHAS = (19661, 45875, 65536)  # ~0.3, ~0.7, 1.0 in 2^-16 units
TEMP_MIX_BUDGET = 1_000_000
_X2_ONE = 1 << 30
# C_j = round(2^(2^-j) * 2^30), j = 1..16 — the classic binary-fraction
# exp2 ladder (multiply in C_j exactly when bit j of the fraction is set)
_X2_CONSTS = (
    1518500250, 1276901417, 1170923762, 1121280436, 1097253708,
    1085434106, 1079572136, 1076653033, 1075196443, 1074468888,
    1074105294, 1073923544, 1073832680, 1073787251, 1073764537,
    1073753181,
)


def _exp2fix_spark(x: str) -> tuple[str, str]:
    """(mantissa_expr, exponent_expr): 2^(x / 2^16) for x >= 0 as a
    (m in [2^30, 2^31), e) pair — integer multiply-rescale ladder over
    the 16 fraction bits, bit-identical in both engines."""
    carr = "array(" + ", ".join(f"{c}L" for c in _X2_CONSTS) + ")"
    m = (
        f"aggregate(sequence(1, 16), CAST({_X2_ONE} AS BIGINT), "
        f"(acc, j) -> CASE WHEN (shiftright(({x}) % 65536, 16 - j) & 1) = 1 "
        f"THEN shiftright(acc * element_at({carr}, j), 30) ELSE acc END)"
    )
    return m, f"CAST(shiftright({x}, 16) AS INT)"


def _exp2fix_duck(x: str) -> tuple[str, str]:
    carr = "[" + ", ".join(f"CAST({c} AS BIGINT)" for c in _X2_CONSTS) + "]"
    m = (
        f"list_reduce(list_prepend(CAST({_X2_ONE} AS BIGINT), "
        f"list_transform(range(1, 17), j -> CAST(j AS BIGINT))), "
        f"(acc, j) -> CASE WHEN ((({x}) % 65536) >> (16 - j)) & 1 = 1 "
        f"THEN (acc * ({carr})[j]) >> 30 ELSE acc END)"
    )
    return m, f"CAST(({x}) >> 16 AS INT)"


def temp_mixture(
    documents: DataFrame,
    alphas: tuple[int, ...] = TEMP_MIX_ALPHAS,
    budget: int = TEMP_MIX_BUDGET,
) -> DataFrame:
    """(alpha_fix, lang, n_tokens, w_norm, alloc): TEMPERATURE-SAMPLED
    token-budget allocation across languages — p_l ∝ c_l^alpha for each
    alpha on the sweep (0.3 / 0.7 / 1.0, the published multilingual
    operating points; alpha = 1.0 is proportional sampling, smaller
    alpha flattens toward uniform), with the budget realized as exact
    integers by largest-remainder apportionment (sum(alloc) == budget,
    pinned).

    Bit-determinism: c^alpha = exp2(alpha * log2 c) with BOTH transforms
    exact integer folds — the repo's fixed-point log2 (selection.py) and
    a 16-step binary-fraction exp2 ladder (multiply in the baked
    C_j = round(2^2^-j * 2^30) exactly when fraction bit j is set), so
    weights are identical int64 in both engines; w_norm is the mantissa
    aligned to each sweep row's max exponent. The apportionment is
    integer DIV/MOD with a (remainder DESC, lang ASC) tie rule.

    Scale (100 TB): ONE combinable tokenize rollup to |langs| rows (the
    same frame unimax_alloc folds); everything after is |langs| x
    |alphas| rows — windows partitioned per alpha over a
    language-bounded frame. No corpus window, no Python.

    Reference parity note: the reference (APMBackend, Node.js APM stack)
    has no mixture operator — beyond-reference LLM-pipeline surface,
    UniMax's published baseline alongside it."""
    from pyspark.sql import Window

    from apmbackend_spark.operators.selection import _with_log2fix

    per_lang = documents.groupBy("lang").agg(
        F.sum(F.size(tokens(F.col("text")))).cast("long").alias("n_tokens")
    )
    av = F.array(*[F.lit(int(a)).cast("long") for a in alphas])
    sweep = per_lang.select(
        "*", F.explode(av).alias("alpha_fix")
    )
    sweep = _with_log2fix(sweep, "greatest(n_tokens, 1)", "l_c")
    sweep = sweep.withColumn(
        "x", F.expr("shiftright(alpha_fix * l_c, 16)")
    )
    m_expr, e_expr = _exp2fix_spark("x")
    sweep = sweep.select(
        "alpha_fix", "lang", "n_tokens",
        F.expr(m_expr).alias("w_mant"),
        F.expr(e_expr).alias("w_exp"),
    )
    wa = Window.partitionBy("alpha_fix")  # |langs|-bounded frame
    sweep = sweep.withColumn("e_max", F.max("w_exp").over(wa)).withColumn(
        "w_norm",
        F.expr(
            "shiftright(w_mant, CAST(least(e_max - w_exp, 62) AS INT))"
        ),
    )
    sweep = sweep.withColumn("tot", F.sum("w_norm").over(wa)).select(
        "alpha_fix", "lang", "n_tokens", "w_norm",
        F.expr(f"CAST(({int(budget)} * w_norm) DIV tot AS BIGINT)").alias(
            "alloc0"
        ),
        F.expr(f"CAST(({int(budget)} * w_norm) % tot AS BIGINT)").alias(
            "rem"
        ),
    )
    wr = Window.partitionBy("alpha_fix").orderBy(
        F.col("rem").desc(), F.col("lang").asc()
    )
    return (
        sweep.withColumn(
            "deficit", F.lit(int(budget)) - F.sum("alloc0").over(wa)
        )
        .withColumn("rk", F.row_number().over(wr))
        .select(
            F.col("alpha_fix").cast("int").alias("alpha_fix"),
            "lang",
            "n_tokens",
            "w_norm",
            (
                F.col("alloc0")
                + F.when(F.col("rk") <= F.col("deficit"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("alloc"),
        )
    )


def temp_mixture_oracle_sql(
    alphas: tuple[int, ...] = TEMP_MIX_ALPHAS,
    budget: int = TEMP_MIX_BUDGET,
) -> str:
    from apmbackend_spark.operators.selection import log2fix_sql

    alist = ", ".join(f"({int(a)})" for a in alphas)
    m_expr, e_expr = _exp2fix_duck("x")
    return f"""
WITH tm_lang AS (
    SELECT lang,
           CAST(SUM(len({tokens_sql('text')})) AS BIGINT) AS n_tokens
    FROM documents GROUP BY lang
), tm_alpha(alpha_fix) AS (VALUES {alist}),
tm_x AS (
    SELECT CAST(alpha_fix AS BIGINT) AS alpha_fix, lang, n_tokens,
           (CAST(alpha_fix AS BIGINT)
            * {log2fix_sql('greatest(n_tokens, 1)')}) >> 16 AS x
    FROM tm_lang, tm_alpha
), tm_w AS (
    SELECT alpha_fix, lang, n_tokens,
           {m_expr} AS w_mant, {e_expr} AS w_exp
    FROM tm_x
), tm_n AS (
    SELECT alpha_fix, lang, n_tokens,
           w_mant >> least(MAX(w_exp) OVER (PARTITION BY alpha_fix)
                           - w_exp, 62) AS w_norm
    FROM tm_w
), tm_a AS (
    SELECT alpha_fix, lang, n_tokens, w_norm,
           CAST(({int(budget)} * w_norm)
                // SUM(w_norm) OVER (PARTITION BY alpha_fix) AS BIGINT)
               AS alloc0,
           CAST(({int(budget)} * w_norm)
                % SUM(w_norm) OVER (PARTITION BY alpha_fix) AS BIGINT)
               AS rem
    FROM tm_n
), tm_r AS (
    SELECT alpha_fix, lang, n_tokens, w_norm, alloc0,
           {int(budget)} - SUM(alloc0) OVER (PARTITION BY alpha_fix)
               AS deficit,
           ROW_NUMBER() OVER (PARTITION BY alpha_fix
                              ORDER BY rem DESC, lang ASC) AS rk
    FROM tm_a
)
SELECT CAST(alpha_fix AS INT) AS alpha_fix, lang, n_tokens, w_norm,
       CAST(alloc0 + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT)
           AS alloc
FROM tm_r
"""


TWO_LEVEL_ALPHA = TEMP_MIX_ALPHAS[0]  # ~0.3 — the flattening tier
TWO_LEVEL_W_SHIFT = 14  # weight precision 2^17: products stay < 2^63
                        # even when the budget is corpus-sized (100 TB)


def mixture_two_level(
    documents: DataFrame,
    epoch_cap: int = UNIMAX_EPOCH_CAP,
    frac: tuple[int, int] = UNIMAX_BUDGET_FRAC,
    alpha: int = TWO_LEVEL_ALPHA,
) -> DataFrame:
    """(source, lang, n_tokens, src_alloc, w_norm, alloc): the PUBLISHED
    two-level multilingual mix — the SOURCE tier allocated by UniMax
    (epoch-capped water-filling, so no crawl dump exceeds epoch_cap
    epochs of its own data) and each source's allocation split across
    its LANGUAGES by temperature sampling p ∝ c^alpha (alpha ≈ 0.3, the
    mT5 operating point) — the composition production mixes actually
    ship (cap the dumps, flatten the languages). Σ alloc per source ==
    that source's src_alloc exactly (largest-remainder within source,
    pinned), and the source fill replays unimax_alloc's integer
    water-filling verbatim.

    Arithmetic: ONE corpus-sized rollup to the (source, lang) cell
    frame; the source fill is the in-row aggregate fold over the
    cap-sorted source array (unimax_alloc's rendering); language
    weights are exp2(alpha·log2 c) integer ladders aligned per source
    and down-shifted to TWO_LEVEL_W_SHIFT bits below the 2^31 mantissa
    — 17-bit weight precision, so budget × weight products stay below
    2^63 even with a corpus-sized budget (shares under 2^-17 of their
    source round to zero, documented). All windows are per-source over
    the |langs|-bounded frame."""
    from pyspark.sql import Window

    from apmbackend_spark.operators.selection import _with_log2fix

    num, den = frac
    cell = (
        documents.groupBy("source", "lang")
        .agg(
            F.sum(F.size(tokens(F.col("text")))).cast("long").alias("n_tokens")
        )
        .localCheckpoint()  # source tier + language tier both read it
    )
    src = cell.groupBy("source").agg(
        F.sum("n_tokens").cast("long").alias("n_src")
    )
    packed = src.select(
        "source",
        "n_src",
        (F.lit(int(epoch_cap)) * F.col("n_src")).alias("cap"),
    ).agg(
        F.array_sort(
            F.collect_list(F.struct("cap", "source", "n_src"))
        ).alias("arr"),
        F.expr(
            f"(CAST(sum(n_src) AS BIGINT) * {int(num)}) div {int(den)}"
        ).alias("budget"),
    )
    filled = packed.select(
        F.expr(
            """
            aggregate(
              arr,
              named_struct(
                'b', budget,
                'out', CAST(array() AS
                  array<struct<source:string, n_src:bigint, cap:bigint,
                               alloc:bigint>>)
              ),
              (acc, x) -> named_struct(
                'b', acc.b - least(x.cap, acc.b DIV (size(arr) - size(acc.out))),
                'out', concat(acc.out, array(named_struct(
                  'source', x.source,
                  'n_src', x.n_src,
                  'cap', x.cap,
                  'alloc', least(x.cap, acc.b DIV (size(arr) - size(acc.out))))))
              ),
              acc -> acc.out
            ) AS out
            """
        )
    ).select(F.explode("out").alias("s")).select(
        F.col("s.source").alias("source"),
        F.col("s.alloc").alias("src_alloc"),
    )
    sweep = cell.join(F.broadcast(filled), "source")
    sweep = _with_log2fix(sweep, "greatest(n_tokens, 1)", "l_c")
    sweep = sweep.withColumn(
        "x", F.expr(f"shiftright({int(alpha)}L * l_c, 16)")
    )
    m_expr, e_expr = _exp2fix_spark("x")
    sweep = sweep.select(
        "source", "lang", "n_tokens", "src_alloc",
        F.expr(m_expr).alias("w_mant"),
        F.expr(e_expr).alias("w_exp"),
    )
    wa = Window.partitionBy("source")  # |langs|-bounded frame
    sweep = sweep.withColumn("e_max", F.max("w_exp").over(wa)).withColumn(
        "w_norm",
        F.expr(
            f"shiftright(w_mant, CAST(least(e_max - w_exp"
            f" + {TWO_LEVEL_W_SHIFT}, 62) AS INT))"
        ),
    )
    sweep = sweep.withColumn("tot", F.sum("w_norm").over(wa)).select(
        "source", "lang", "n_tokens", "src_alloc", "w_norm",
        F.expr("CAST((src_alloc * w_norm) DIV tot AS BIGINT)").alias(
            "alloc0"
        ),
        F.expr("CAST((src_alloc * w_norm) % tot AS BIGINT)").alias("rem"),
    )
    wr = Window.partitionBy("source").orderBy(
        F.col("rem").desc(), F.col("lang").asc()
    )
    return (
        sweep.withColumn(
            "deficit", F.col("src_alloc") - F.sum("alloc0").over(wa)
        )
        .withColumn("rk", F.row_number().over(wr))
        .select(
            "source",
            "lang",
            "n_tokens",
            "src_alloc",
            "w_norm",
            (
                F.col("alloc0")
                + F.when(F.col("rk") <= F.col("deficit"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("alloc"),
        )
    )


def mixture_two_level_oracle_sql(
    epoch_cap: int = UNIMAX_EPOCH_CAP,
    frac: tuple[int, int] = UNIMAX_BUDGET_FRAC,
    alpha: int = TWO_LEVEL_ALPHA,
) -> str:
    from apmbackend_spark.operators.selection import log2fix_sql

    num, den = frac
    m_expr, e_expr = _exp2fix_duck("x")
    return f"""
WITH RECURSIVE m2cell AS MATERIALIZED (
    SELECT source, lang,
           CAST(SUM(len({tokens_sql('text')})) AS BIGINT) AS n_tokens
    FROM documents GROUP BY source, lang
), m2src AS (
    SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS n_src
    FROM m2cell GROUP BY source
), m2ord AS (
    SELECT source, n_src, {int(epoch_cap)} * n_src AS cap,
           CAST(ROW_NUMBER() OVER (
               ORDER BY {int(epoch_cap)} * n_src ASC, source ASC,
                        n_src ASC) AS BIGINT) AS i,
           CAST(COUNT(*) OVER () AS BIGINT) AS n_srcs,
           CAST((SUM(n_src) OVER () * {int(num)}) // {int(den)} AS BIGINT)
               AS budget
    FROM m2src
), m2fill AS (
    SELECT i, source, n_src, cap, n_srcs,
           least(cap, budget // n_srcs) AS src_alloc,
           budget - least(cap, budget // n_srcs) AS b_after
    FROM m2ord WHERE i = 1
    UNION ALL
    SELECT o.i, o.source, o.n_src, o.cap, o.n_srcs,
           least(o.cap, f.b_after // (o.n_srcs - f.i)) AS src_alloc,
           f.b_after - least(o.cap, f.b_after // (o.n_srcs - f.i))
               AS b_after
    FROM m2fill f JOIN m2ord o ON o.i = f.i + 1
), m2x AS (
    SELECT c.source, c.lang, c.n_tokens, f.src_alloc,
           ({int(alpha)} * {log2fix_sql('greatest(c.n_tokens, 1)')}) >> 16
               AS x
    FROM m2cell c JOIN m2fill f ON c.source = f.source
), m2w AS (
    SELECT source, lang, n_tokens, src_alloc,
           {m_expr} AS w_mant, {e_expr} AS w_exp
    FROM m2x
), m2n AS (
    SELECT source, lang, n_tokens, src_alloc,
           w_mant >> least(MAX(w_exp) OVER (PARTITION BY source) - w_exp
                           + {TWO_LEVEL_W_SHIFT}, 62) AS w_norm
    FROM m2w
), m2a AS (
    SELECT source, lang, n_tokens, src_alloc, w_norm,
           CAST((src_alloc * w_norm)
                // SUM(w_norm) OVER (PARTITION BY source) AS BIGINT)
               AS alloc0,
           CAST((src_alloc * w_norm)
                % SUM(w_norm) OVER (PARTITION BY source) AS BIGINT) AS rem
    FROM m2n
), m2r AS (
    SELECT source, lang, n_tokens, src_alloc, w_norm, alloc0,
           src_alloc - SUM(alloc0) OVER (PARTITION BY source) AS deficit,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY rem DESC, lang ASC) AS rk
    FROM m2a
)
SELECT source, lang, n_tokens, src_alloc, w_norm,
       CAST(alloc0 + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT)
           AS alloc
FROM m2r
"""
