"""Training-sequence packing: assign documents, in deterministic corpus
order, to fixed-token-budget sequences (the sharding step between a cleaned
corpus and a tokenized training run).

Semantics: documents are concatenated in doc_id order; a document's
sequence is determined by its STARTING token offset (`seq_id =
floor(start_offset / budget)`), so every sequence holds ~budget tokens and
assignment is a pure function of the corpus — no packing heuristics, no
order dependence between engines.

Scale shape: a naive cumulative sum is `Window.orderBy(doc_id)` — the
whole corpus through ONE task. Instead the same two-pass pattern as
ordering.ordered_release: range-partition on doc_id (sample sort keeps
partition i's ids before partition i+1's), cumulative-sum WITHIN each
partition in parallel, then add broadcast per-partition token totals. The
only single-partition step operates on |partitions| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from apmbackend_spark.functions.text import tokens, tokens_sql


def token_pack(
    documents: DataFrame,
    budget: int = 2048,
    counts: DataFrame | None = None,
) -> DataFrame:
    """``counts``, if given, is a precomputed (doc_id, n_tokens) frame that
    REPLACES the tokenization scan — the caller guarantees the values equal
    ``size(tokens(text))`` for the same rows (doc_stats computes exactly
    that expression, so a pipeline that already ran the quality-filter scan
    can pack without re-tokenizing the surviving text — one full-corpus
    regex pass saved)."""
    if counts is not None:
        d = counts.select("doc_id", F.col("n_tokens").cast("long"))
    else:
        d = documents.select(
            "doc_id",
            F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        )
    rng = d.repartitionByRange(F.col("doc_id"))
    # persist the NARROW (doc_id, n_tokens, pid) frame: it feeds both the
    # cumsum pass and the totals aggregate — without it the text scan and
    # tokenize run twice (24 B/row cached vs a second full-corpus pass)
    part = rng.withColumn("__pid", F.spark_partition_id()).persist()
    wp = (
        Window.partitionBy("__pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = part.withColumn(
        "__lcum", F.coalesce(F.sum("n_tokens").over(wp), F.lit(0).cast("long"))
    )
    totals = part.groupBy("__pid").agg(F.sum("n_tokens").alias("__tot"))
    wo = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid", F.coalesce(F.sum("__tot").over(wo), F.lit(0).cast("long")).alias("__off")
    )
    start = F.col("__off") + F.col("__lcum")
    # integer division, not floor(double /): a double quotient one ulp under
    # an integer boundary would misassign a document at large offsets
    return (
        local.join(F.broadcast(offsets), "__pid")
        .select("doc_id", "n_tokens", start.alias("start_offset"))
        .withColumn("seq_id", F.expr(f"start_offset DIV {int(budget)}"))
    )


def corpus_shuffle(
    documents: DataFrame, n_shards: int = 8, seed: int = 42
) -> DataFrame:
    """Deterministic global shuffle + sharding for training-data loaders:
    every document gets a (shard, pos) address in a pseudo-random
    permutation that is a pure function of (doc_id, seed) — re-running with
    the same seed reproduces the exact epoch order, a different seed gives
    an independent permutation (the standard reshuffle-per-epoch contract).

    Mechanics: key = md5(seed:doc_id); shard = key-prefix mod n_shards;
    pos = rank of key within the shard. md5 (not Spark's murmur `hash`)
    keeps the permutation engine-portable — the DuckDB oracle computes the
    identical bytes.

    Scale shape: the shard assignment is a stateless map over the scan
    (no shuffle); the per-shard position is ONE hash-partitioned window
    where a task holds N/n_shards rows — n_shards is sized so a shard fits
    a task (at 100 TB: tens of thousands of shards, which is also the
    file layout a data loader wants). No global sort, no driver state."""
    key = F.md5(F.concat(F.lit(f"shuf{int(seed)}:"), F.col("doc_id").cast("string")))
    shard = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % int(n_shards)
    ).cast("int")
    keyed = documents.select(
        "doc_id", key.alias("__k"), shard.alias("shard")
    )
    w = Window.partitionBy("shard").orderBy("__k", "doc_id")
    return keyed.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("int").alias("pos"),
    )


def corpus_shuffle_oracle_sql(n_shards: int = 8, seed: int = 42) -> str:
    return f"""
WITH keyed AS (
    SELECT doc_id,
           md5('shuf{int(seed)}:' || CAST(doc_id AS VARCHAR)) AS k
    FROM documents
), sharded AS (
    SELECT doc_id, k,
           CAST(('0x' || substr(k, 1, 8))::BIGINT % {int(n_shards)} AS INT) AS shard
    FROM keyed
)
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, doc_id) AS INT) AS pos
FROM sharded
"""


def token_pack_oracle_sql(budget: int = 2048) -> str:
    return f"""
WITH counted AS (
    SELECT doc_id, CAST(len({tokens_sql('text')}) AS BIGINT) AS n_tokens
    FROM documents
), cum AS (
    SELECT doc_id, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS start_offset
    FROM counted
)
SELECT doc_id, n_tokens, start_offset,
       start_offset // {budget} AS seq_id
FROM cum
"""

def token_spans(
    documents: DataFrame,
    budget: int = 2048,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Training-sequence spans with document SPLITTING: where ``token_pack``
    assigns a document to the single sequence containing its start offset,
    a real loader must fill every sequence to exactly ``budget`` tokens —
    a document crossing a boundary contributes a span to EACH sequence it
    touches. One row per (document, touched sequence):

        (doc_id, seq_id, tok_start, tok_end)

    with tok_* document-relative and tok_end exclusive, so per doc the
    span lengths sum to n_tokens and per sequence the lengths sum to
    ``budget`` (except the corpus tail). Zero-token docs contribute no
    spans. Scale shape: ``token_pack``'s two-pass cumulative sum plus a
    per-row sequence explode — fan-out is ceil(n_tokens/budget)+1 per doc,
    no new shuffle."""
    b = int(budget)
    packed = token_pack(documents, b, counts=counts)
    first = F.expr(f"start_offset DIV {b}")
    last = F.expr(f"(start_offset + n_tokens - 1) DIV {b}")
    spans = packed.where(F.col("n_tokens") > 0).select(
        "doc_id",
        "n_tokens",
        "start_offset",
        F.explode(F.sequence(first, last)).alias("seq_id"),
    )
    tok_start = F.greatest(
        F.col("seq_id") * b - F.col("start_offset"), F.lit(0).cast("long")
    )
    tok_end = F.least(
        (F.col("seq_id") + 1) * b - F.col("start_offset"), F.col("n_tokens")
    )
    return spans.select(
        "doc_id",
        F.col("seq_id").cast("long").alias("seq_id"),
        tok_start.cast("long").alias("tok_start"),
        tok_end.cast("long").alias("tok_end"),
    )


def token_spans_oracle_sql(budget: int = 2048) -> str:
    b = int(budget)
    return f"""
WITH packed AS ({token_pack_oracle_sql(b)}),
spans AS (
    SELECT doc_id, n_tokens, start_offset,
           unnest(range(start_offset // {b},
                        (start_offset + n_tokens - 1) // {b} + 1)) AS seq_id
    FROM packed WHERE n_tokens > 0
)
SELECT doc_id,
       CAST(seq_id AS BIGINT) AS seq_id,
       CAST(greatest(seq_id * {b} - start_offset, 0) AS BIGINT) AS tok_start,
       CAST(least((seq_id + 1) * {b} - start_offset, n_tokens) AS BIGINT) AS tok_end
FROM spans
"""


# ---------------------------------------------------------------------------
# Overlapping token-window chunking (RAG / long-context preprocessing).
# ---------------------------------------------------------------------------

CHUNK_SIZE = 64
CHUNK_OVERLAP = 16
_CHUNK_STEP = CHUNK_SIZE - CHUNK_OVERLAP


def doc_chunks(
    documents: DataFrame,
    chunk_size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """Split each document into overlapping token windows (the retrieval /
    long-context chunking step): starts at 1, 1+step, ... with step =
    chunk_size - overlap, last window truncated. Emits the chunk's address
    and fingerprint, not its text — downstream joins re-slice lazily.

    Scale: a stateless scan + explode (fan-out = ceil(n_tokens/step) per
    doc); no shuffle, no Python. Empty docs emit no chunks.
    """
    from apmbackend_spark.functions.text import hash64, tokens

    step = chunk_size - overlap
    tok = tokens(F.col("text"))
    base = documents.select(
        "doc_id", tok.alias("tok"), F.size(tok).alias("n")
    ).where(F.col("n") > 0)
    exploded = base.select(
        "doc_id",
        "tok",
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(F.col("n") - overlap, F.lit(1)),
                F.lit(step),
            )
        ).alias("s"),
    )
    chunk = F.slice(F.col("tok"), F.col("s"), chunk_size)
    return exploded.select(
        "doc_id",
        F.expr(f"CAST((s - 1) DIV {step} AS INT)").alias("chunk_id"),
        F.col("s").cast("int").alias("start_tok"),
        F.size(chunk).cast("int").alias("n_chunk_tokens"),
        hash64(F.concat_ws(" ", chunk)).alias("chunk_fp"),
    )


def doc_chunks_oracle_sql(
    chunk_size: int = CHUNK_SIZE, overlap: int = CHUNK_OVERLAP
) -> str:
    from apmbackend_spark.functions.text import hash64_sql, tokens_sql

    step = chunk_size - overlap
    hi = chunk_size - 1
    return f"""
WITH t AS (
    SELECT doc_id, {tokens_sql("text")} AS tok FROM documents
), base AS (
    SELECT doc_id, tok, len(tok) AS n FROM t WHERE len(tok) > 0
), st AS (
    SELECT doc_id, tok,
           UNNEST(range(1, greatest(n - {overlap}, 1) + 1, {step})) AS s
    FROM base
)
SELECT doc_id,
       CAST((s - 1) // {step} AS INT) AS chunk_id,
       CAST(s AS INT) AS start_tok,
       CAST(len(tok[s:s+{hi}]) AS INT) AS n_chunk_tokens,
       {hash64_sql(f"array_to_string(tok[s:s+{hi}], ' ')")} AS chunk_fp
FROM st
"""


# ---------------------------------------------------------------------------
# Curriculum ordering (curriculum learning, Bengio et al. 2009; the
# quality-annealed data schedule modern pretraining runs use: plain data
# early, highest-quality slice last).
# ---------------------------------------------------------------------------

CURRICULUM_CUTS = (0.25, 0.45)  # quality thresholds: phase 0 | 1 | 2
# (cut at 0.25/0.45, not terciles: fixed thresholds need no global pass, and
# the fixture quality range [0.04, 0.62] populates all three phases)
CURRICULUM_SHARDS = 8
CURRICULUM_SEED = 42


def curriculum_order(
    documents: DataFrame,
    cuts: tuple[float, float] = CURRICULUM_CUTS,
    n_shards: int = CURRICULUM_SHARDS,
    seed: int = CURRICULUM_SEED,
) -> DataFrame:
    """Quality-phased training order: every document gets a (phase, shard,
    pos) address — the loader consumes phases in order, shards within a
    phase in shard order, so low-quality data trains early and the
    highest-quality slice lands in the final anneal (the curriculum /
    mid-training-anneal schedule). Within a phase the order is the
    epoch-deterministic md5 permutation of `corpus_shuffle` (same seed
    contract: pure function of (doc_id, seed)).

    Phases come from FIXED quality thresholds (the `corpus_filter`
    discipline), not global quantiles — no corpus-wide percentile pass, so
    the phase assignment is a stateless map over the scan. The quality
    signal is `doc_stats.quality`, whose arithmetic is bit-identical across
    engines, so the threshold compare is exact.

    Scale shape: one scan computes (quality -> phase, md5 key -> shard);
    the only shuffle is the (phase, shard)-partitioned position window,
    where a task holds ~N/(phases * shards) rows — n_shards is sized so a
    shard fits a task, and the (phase, shard, pos) triple IS the file
    layout a curriculum loader wants (no global sort, no driver state).
    """
    from apmbackend_spark.operators.textstats import doc_stats

    lo, hi = float(cuts[0]), float(cuts[1])
    key = F.md5(
        F.concat(F.lit(f"curr{int(seed)}:"), F.col("doc_id").cast("string"))
    )
    shard = (
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % int(n_shards)
    ).cast("int")
    phase = (
        F.when(F.col("quality") < F.lit(lo), F.lit(0))
        .when(F.col("quality") < F.lit(hi), F.lit(1))
        .otherwise(F.lit(2))
        .cast("int")
    )
    keyed = doc_stats(documents).select(
        "doc_id",
        "quality",
        phase.alias("phase"),
        key.alias("__k"),
        shard.alias("shard"),
    )
    w = Window.partitionBy("phase", "shard").orderBy("__k", "doc_id")
    return keyed.select(
        "doc_id",
        "quality",
        "phase",
        "shard",
        F.row_number().over(w).cast("int").alias("pos"),
    )


def curriculum_order_oracle_sql(
    cuts: tuple[float, float] = CURRICULUM_CUTS,
    n_shards: int = CURRICULUM_SHARDS,
    seed: int = CURRICULUM_SEED,
) -> str:
    from apmbackend_spark.operators.textstats import doc_stats_oracle_sql

    lo, hi = float(cuts[0]), float(cuts[1])
    return f"""
WITH ds AS (
    {doc_stats_oracle_sql()}
), keyed AS (
    SELECT doc_id, quality,
           CASE WHEN quality < {lo!r} THEN 0
                WHEN quality < {hi!r} THEN 1
                ELSE 2 END AS phase,
           md5('curr{int(seed)}:' || CAST(doc_id AS VARCHAR)) AS k
    FROM ds
), sharded AS (
    SELECT doc_id, quality, phase, k,
           CAST(('0x' || substr(k, 1, 8))::BIGINT % {int(n_shards)} AS INT) AS shard
    FROM keyed
)
SELECT doc_id, quality, CAST(phase AS INT) AS phase, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY phase, shard ORDER BY k, doc_id) AS INT) AS pos
FROM sharded
"""
