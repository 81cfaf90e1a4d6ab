"""Unigram-LM tokenizer (Kudo 2018, SentencePiece's unigram model; public
literature) — the OTHER production tokenizer family, complementing the BPE
trainer/encoder in ``textstats.py``.

Method (the hard-EM / Viterbi-EM variant of the published algorithm —
E-steps use the single best segmentation, a standard approximation that
keeps every count an integer):
  * pretokens: the shared word tokenizer, DISTINCT words with corpus
    frequencies (the Sennrich weighting the BPE trainer uses), length
    capped at ``UNI_MAXWORD`` (longer words never enter training; the
    encoder segments them through the byte/char FALLBACK tier — each
    over-long word becomes its single-char pieces, graded as
    fb_pieces/fb_hash);
  * seed vocab: every substring of length 1..``UNI_MAXPIECE`` weighted by
    pretoken frequency — all single chars (coverage guarantee) plus the
    top ``UNI_SEED`` longer substrings;
  * scores: the fixed-point integer log2 of ``selection.py`` —
    sc(piece) = L(cnt + 1) - L(total + |V|), an exact integer rendering
    of the add-1-smoothed log-probability (both engines run the identical
    16-round square-and-normalize fold, so Viterbi compares identical
    integers);
  * EM round = Viterbi-segment every pretoken under the current scores,
    recount piece usage over best segmentations, re-score; after round 1
    the vocab is PRUNED (chars always survive; longer pieces must have
    nonzero usage and rank in the top ``UNI_KEEP`` by usage) — the
    prune-by-contribution step of the published algorithm with the loss
    delta specialized to hard-EM (a piece's contribution is its usage);
  * round 2 segments under the pruned, re-scored model; its usage counts
    and scores are the trained table.

Viterbi determinism contract: DP over word positions maximizing the sum
of piece scores; ties broken toward the SMALLER start position j (longer
last piece). Spark runs the DP as one in-row ``aggregate`` fold over
positions (append-only best/backpointer array of structs, candidates
pre-sorted by (i, j) so strict-greater keeps the j-ascending winner);
DuckDB runs the identical recurrence as position-iterating recursive
CTEs (the ``zscore_step`` list-carrying oracle pattern) over candidates
packed into single BIGINTs, with the tie rule encoded in the packing
((score + 2^40)*32 + (16 - j): max prefers higher score, then smaller
j). All arithmetic is int64 — segmentations are bit-identical.

Scale shape (100 TB): ONE corpus-sized token shuffle builds the
distinct-pretoken frame; everything after runs on that vocabulary-sized
frame — the substring explode is |pretokens| x O(len x maxpiece) small
rows, vocab joins broadcast, the DP is an in-row codegen fold, usage
recounts are map-side-combinable. The encoder joins the broadcast-sized
(pretoken -> stats) dim onto per-doc token counts: one more combinable
aggregate, no Python anywhere.

Reference parity note: the reference engine (a Node.js APM stack) has no
tokenizer-training operator — this is beyond-reference LLM-pipeline
surface, like ``bpe_train``/``bpe_encode`` which it mirrors gate-for-gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash64_sql, tokens, tokens_sql
from .selection import _with_log2fix, log2fix_sql

UNI_MAXPIECE = 4
UNI_MAXWORD = 12
# The DuckDB oracle packs (i, j) into mod-17 fields, the tie rule into a
# `16 - j` term, and positions into 32-wide slots — widths valid only while
# the constants stay under them. Fail loudly on a bump instead of silently
# corrupting the packed cross-engine comparison.
assert UNI_MAXWORD < 16 and UNI_MAXPIECE < 17, (
    "oracle bit-packing (mod-17 i/j fields, 16-j tie term, 32-wide "
    "positions) requires UNI_MAXWORD < 16 and UNI_MAXPIECE < 17"
)
UNI_SEED = 80
UNI_KEEP = 40
NEG_INF = -(1 << 50)
_BIG = 1 << 40  # packing offset keeping every packed value positive
_HASH_MOD = 1 << 40  # piece-hash modulus: doc sums stay far below 2^63


# ---------------------------------------------------------------------------
# Spark building blocks.
# ---------------------------------------------------------------------------


def _pretokens(documents: DataFrame) -> DataFrame:
    """(pt, freq): distinct pretokens with corpus frequencies, segmentable
    lengths only."""
    return (
        documents.select(F.explode(tokens(F.col("text"))).alias("pt"))
        .where(F.length("pt") <= UNI_MAXWORD)
        .groupBy("pt")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _substrings(pret: DataFrame) -> DataFrame:
    """(pt, freq, i, j, piece): every candidate piece occurrence — piece
    spans word positions j..i (1-based end i, 0-based start j)."""
    return (
        pret.select(
            "pt",
            "freq",
            F.explode(F.expr("sequence(1, length(pt))")).alias("i0"),
        )
        .select(
            "pt",
            "freq",
            "i0",
            F.explode(
                F.expr(
                    f"sequence(1, least({UNI_MAXPIECE}, length(pt) - i0 + 1))"
                )
            ).alias("l"),
        )
        .select(
            "pt",
            "freq",
            F.expr("CAST(i0 + l - 1 AS INT)").alias("i"),
            F.expr("CAST(i0 - 1 AS INT)").alias("j"),
            F.expr("substring(pt, i0, l)").alias("piece"),
        )
    )


def _scored(vocab: DataFrame, cnt_col: str) -> DataFrame:
    """(piece, sc): add-1-smoothed fixed-point log2 scores. The constant
    totals log is folded ONCE on the 1-row aggregate and broadcast (the
    dsir_select discipline)."""
    tot = vocab.agg(
        F.sum(cnt_col).cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("nv"),
    )
    tot = _with_log2fix(tot, "tot + nv", "l_tot")
    v = _with_log2fix(vocab, f"{cnt_col} + 1", "l_cnt")
    return v.crossJoin(F.broadcast(tot.select("l_tot"))).select(
        "piece", (F.col("l_cnt") - F.col("l_tot")).alias("sc")
    )


_DP_EXPR = f"""
aggregate(
  sequence(1, length(pt)),
  array(named_struct('s', CAST(0 AS BIGINT), 'b', 0)),
  (acc, p) -> concat(acc, array(
      aggregate(
        filter(cands, c -> c.i = p),
        named_struct('s', CAST({NEG_INF} AS BIGINT), 'b', 0),
        (m, c) -> IF(element_at(acc, c.j + 1).s > CAST({NEG_INF} AS BIGINT)
                     AND element_at(acc, c.j + 1).s + c.sc > m.s,
                  named_struct('s', element_at(acc, c.j + 1).s + c.sc,
                               'b', c.j),
                  m))))
)
"""

_WB_EXPR = """
aggregate(
  sequence(1, length(pt)),
  named_struct('p', length(pt), 'l', CAST(array() AS array<string>)),
  (a, x) -> IF(a.p > 0,
      named_struct(
        'p', element_at(dp, a.p + 1).b,
        'l', concat(a.l, array(substring(
                 pt,
                 element_at(dp, a.p + 1).b + 1,
                 a.p - element_at(dp, a.p + 1).b)))),
      a),
  a -> a.l
)
"""


def _segment(pret: DataFrame, vocab_scored: DataFrame) -> DataFrame:
    """(pt, freq, pieces): Viterbi best segmentation of every pretoken
    under (piece, sc) — DP fold + backpointer walk, both in-row codegen."""
    cand = _substrings(pret).join(
        F.broadcast(vocab_scored.select("piece", "sc")), "piece"
    )
    cl = cand.groupBy("pt", "freq").agg(
        F.sort_array(F.collect_list(F.struct("i", "j", "sc"))).alias("cands")
    )
    return (
        cl.withColumn("dp", F.expr(_DP_EXPR))
        .withColumn("pieces", F.expr(_WB_EXPR))
        .select("pt", "freq", "pieces")
    )


def _usage(seg: DataFrame) -> DataFrame:
    """(piece, u): frequency-weighted piece usage over best segmentations."""
    return (
        seg.select("freq", F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("u"))
    )


def _train_frames(
    documents: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Shared trainer pipeline: returns (pret, v1s, seg2, u2) — the
    pretoken frame, the final scored vocab, its segmentations, and the
    final usage counts."""
    pret = _pretokens(documents).localCheckpoint()
    pcnt = (
        _substrings(pret)
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("cnt"))
        .localCheckpoint()  # chars + seed ranking + round-1 scores all read it
    )
    chars = pcnt.where(F.length("piece") == 1)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cnt"), F.asc("piece"))
    seedk = (
        pcnt.where(F.length("piece") >= 2)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= UNI_SEED)
        .drop("rn")
    )
    v0s = _scored(chars.unionAll(seedk), "cnt")
    seg1 = _segment(pret, v0s)
    u1 = _usage(seg1).localCheckpoint()  # prune ranking + rescore share it
    wk = Window.orderBy(F.desc("u"), F.asc("piece"))
    kept = (
        u1.where((F.length("piece") >= 2) & (F.col("u") > 0))
        .withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") <= UNI_KEEP)
        .select("piece")
    )
    v1 = chars.select("piece").unionAll(kept)
    v1u = v1.join(u1, "piece", "left").select(
        "piece", F.coalesce(F.col("u"), F.lit(0)).cast("long").alias("u")
    )
    v1s = _scored(v1u, "u").localCheckpoint()  # seg2 + train output share it
    seg2 = _segment(pret, v1s)
    u2 = _usage(seg2)
    return pret, v1s, seg2, u2


def unigram_train(documents: DataFrame) -> DataFrame:
    """(piece, piece_len, n_used, score): the trained unigram table —
    pruned vocab, round-2 usage counts, the scores that produced them."""
    _, v1s, _, u2 = _train_frames(documents)
    return v1s.join(u2, "piece", "left").select(
        "piece",
        F.length("piece").cast("int").alias("piece_len"),
        F.coalesce(F.col("u"), F.lit(0)).cast("long").alias("n_used"),
        F.col("sc").alias("score"),
    )


def with_fallback_probe(documents: DataFrame) -> DataFrame:
    """The fixture corpus has no word longer than 8 chars, so the gate
    injects deterministic >UNI_MAXWORD words IN-PLAN (the pii_scrub
    synthesis trick): every 7th doc gains one shared long word and one
    per-doc-unique one. The byte/char fallback tier is graded doing real
    work, while TRAINING is untouched — pretokens are length-capped
    before seeding, so the probes never reach the Viterbi tier."""
    probe = F.concat(
        F.col("text"),
        F.lit(" internationalization fallbackprobe"),
        F.lpad((F.col("doc_id") % 100000).cast("string"), 5, "0"),
    )
    return documents.withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 0, probe).otherwise(F.col("text")),
    )


def unigram_encode(documents: DataFrame) -> DataFrame:
    """(doc_id, n_words, n_enc_words, n_pieces, piece_hash, fertility,
    fb_pieces, fb_hash): the trained model applied back to the corpus —
    per doc, total words, segmentable words, total pieces, an order-free
    modular piece-stream hash (so the SEGMENTATIONS are graded, not just
    their sizes), pieces-per-word fertility over the Viterbi tier (the
    tokenizer-quality headline number), and the BYTE/CHAR FALLBACK tier
    made real: every word longer than ``UNI_MAXWORD`` is segmented into
    its single-char pieces (SentencePiece's byte-fallback specialized to
    this ASCII token alphabet, where char == byte; single-char pieces are
    guaranteed in the vocab by the coverage rule), graded as fb_pieces
    (total fallback pieces) and fb_hash (the same order-free piece-stream
    hash over the fallback char streams)."""
    _, _, seg2, _ = _train_frames(documents)
    return _encode_from_seg(documents, seg2)


def _encode_from_seg(documents: DataFrame, seg2: DataFrame) -> DataFrame:
    """The per-doc encode rollup over any (pt, pieces) segmentation frame
    (shared by the hard- and soft-model encoders)."""
    ptstats = (
        seg2.select("pt", F.explode("pieces").alias("piece"))
        .groupBy("pt")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pieces"),
            F.sum(
                F.expr(
                    "CAST(conv(substring(md5(piece), 1, 15), 16, 10) AS BIGINT)"
                    f" % {_HASH_MOD}"
                )
            )
            .cast("long")
            .alias("hsum"),
        )
    )
    dtok = (
        documents.select("doc_id", F.explode(tokens(F.col("text"))).alias("pt"))
        .groupBy("doc_id", "pt")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    enc_ok = F.length("pt") <= UNI_MAXWORD
    per_doc = (
        dtok.join(F.broadcast(ptstats), "pt", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.when(enc_ok, F.col("cnt")).otherwise(0))
            .cast("long")
            .alias("n_enc_words"),
            F.sum(F.when(enc_ok, F.col("cnt") * F.col("n_pieces")).otherwise(0))
            .cast("long")
            .alias("n_pieces"),
            F.sum(F.when(enc_ok, F.col("cnt") * F.col("hsum")).otherwise(0))
            .cast("long")
            .alias("piece_hash"),
            # byte/char fallback tier: a >UNI_MAXWORD word's segmentation
            # IS its char stream — len(pt) single-char pieces, hashed with
            # the same order-free modular piece hash (in-row codegen fold,
            # no vocab join needed: chars are always in-vocab)
            F.sum(
                F.when(~enc_ok, F.col("cnt") * F.length("pt").cast("long"))
                .otherwise(0)
            )
            .cast("long")
            .alias("fb_pieces"),
            F.sum(
                F.when(
                    ~enc_ok,
                    F.col("cnt")
                    * F.expr(
                        "aggregate(sequence(1, length(pt)), CAST(0 AS BIGINT),"
                        " (acc, i) -> acc + CAST(conv(substring(md5("
                        "substring(pt, i, 1)), 1, 15), 16, 10) AS BIGINT)"
                        f" % {_HASH_MOD})"
                    ),
                ).otherwise(0)
            )
            .cast("long")
            .alias("fb_hash"),
        )
    )
    return documents.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_words"), F.lit(0)).cast("long").alias("n_words"),
        F.coalesce(F.col("n_enc_words"), F.lit(0))
        .cast("long")
        .alias("n_enc_words"),
        F.coalesce(F.col("n_pieces"), F.lit(0)).cast("long").alias("n_pieces"),
        F.coalesce(F.col("piece_hash"), F.lit(0))
        .cast("long")
        .alias("piece_hash"),
        F.when(
            F.coalesce(F.col("n_enc_words"), F.lit(0)) > 0,
            F.col("n_pieces").cast("double")
            / F.col("n_enc_words").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("fertility"),
        F.coalesce(F.col("fb_pieces"), F.lit(0))
        .cast("long")
        .alias("fb_pieces"),
        F.coalesce(F.col("fb_hash"), F.lit(0)).cast("long").alias("fb_hash"),
    )


def unigram_encode_soft(documents: DataFrame) -> DataFrame:
    """The soft-trained model graded END TO END: Viterbi segmentation
    under ``unigram_train_soft``'s scores (expected-count table), rolled
    up with the same per-doc encode as ``unigram_encode`` — same schema,
    same order-free piece-stream hash, so the SOFT model's segmentations
    are value-graded, not just its training table. The DP fold, tie rule,
    and oracle rendering are shared with the hard encoder; only the score
    source changes."""
    pret = _pretokens(documents).localCheckpoint()
    # hand the pinned pretoken frame to the trainer: without it the
    # corpus tokenize + groupBy chain runs twice in this gate
    soft = unigram_train_soft(documents, pret=pret).select(
        "piece", F.col("score").alias("sc")
    )
    return _encode_from_seg(documents, _segment(pret, soft))


# ---------------------------------------------------------------------------
# DuckDB oracle renderings.
# ---------------------------------------------------------------------------


def _seg_ctes(vocab_cte: str, tag: str) -> str:
    """Recursive-CTE rendering of the Viterbi DP + backpointer walk (the
    zscore_step list-carrying pattern). Candidates pack into one BIGINT
    ((sc + 2^40)*289 + j*17 + i, every component recoverable by positive
    integer div/mod); the per-position max packs (score + 2^40)*32 +
    (16 - j) so the tie rule — higher score, then smaller j — rides the
    plain MAX."""
    return f"""
, cand_{tag} AS (
    SELECT sb.pt, (CAST(v.sc + {_BIG} AS BIGINT)) * 289 + sb.j * 17 + sb.i AS cpk
    FROM subs sb JOIN {vocab_cte} v USING (piece)
), cl_{tag} AS (
    SELECT pt, list(cpk) AS cpks FROM cand_{tag} GROUP BY pt
), dp_{tag} AS (
    SELECT pt, 0 AS pos,
           [CAST(0 AS BIGINT)] AS s, [CAST(0 AS INT)] AS b
    FROM cl_{tag}
    UNION ALL
    SELECT pt, pos + 1,
           s || [CASE WHEN mxp > 0 THEN (mxp // 32) - {_BIG}
                      ELSE CAST({NEG_INF} AS BIGINT) END],
           b || [CASE WHEN mxp > 0 THEN CAST(16 - (mxp % 32) AS INT)
                      ELSE 0 END]
    FROM (
        SELECT d.pt, d.pos, d.s, d.b,
               list_aggregate(list_prepend(CAST(0 AS BIGINT),
                 list_transform(
                   list_filter(c.cpks, q -> q % 17 = d.pos + 1),
                   q -> CASE WHEN d.s[((q // 17) % 17) + 1]
                                  > CAST({NEG_INF} AS BIGINT)
                        -- q // 289 IS (sc + 2^40), so the offset rides in
                        THEN (d.s[((q // 17) % 17) + 1] + (q // 289)) * 32
                             + (16 - ((q // 17) % 17))
                        ELSE CAST(0 AS BIGINT) END)), 'max') AS mxp
        FROM dp_{tag} d JOIN cl_{tag} c USING (pt)
        WHERE d.pos < length(d.pt)
    )
), wb_{tag} AS (
    SELECT pt, CAST(length(pt) AS INT) AS p, b, CAST([] AS VARCHAR[]) AS pieces
    FROM dp_{tag} WHERE pos = length(pt)
    UNION ALL
    SELECT pt, b[p + 1], b,
           list_append(pieces, substr(pt, b[p + 1] + 1, p - b[p + 1]))
    FROM wb_{tag} WHERE p > 0
), seg_{tag} AS (
    SELECT w.pt, pr.freq, w.pieces
    FROM wb_{tag} w JOIN pret pr USING (pt) WHERE w.p = 0
)"""


def _train_ctes(docs: str = "documents") -> str:
    """The full trainer as a WITH-RECURSIVE chain (caller prepends
    'WITH RECURSIVE' and appends the final SELECT). ``docs`` names the
    corpus source CTE/table (the fallback-probe gate passes its injected
    twin)."""
    l_tot0 = log2fix_sql("tot + nv")
    l_cnt = log2fix_sql("cnt + 1")
    l_u = log2fix_sql("u + 1")
    return f"""
pret AS (
    SELECT pt, CAST(COUNT(*) AS BIGINT) AS freq
    FROM (SELECT unnest({tokens_sql('text')}) AS pt FROM {docs})
    WHERE length(pt) <= {UNI_MAXWORD}
    GROUP BY pt
), subs AS (
    SELECT p.pt, p.freq,
           CAST(i.range + l.range - 1 AS INT) AS i,
           CAST(i.range - 1 AS INT) AS j,
           substr(p.pt, CAST(i.range AS INT), CAST(l.range AS INT)) AS piece
    FROM pret p
    JOIN range(1, {UNI_MAXWORD + 1}) i ON i.range <= length(p.pt)
    JOIN range(1, {UNI_MAXPIECE + 1}) l
      ON i.range + l.range - 1 <= length(p.pt)
), pcnt AS (
    SELECT piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM subs GROUP BY piece
), chars AS (
    SELECT piece, cnt FROM pcnt WHERE length(piece) = 1
), seedk AS (
    SELECT piece, cnt FROM (
        SELECT piece, cnt,
               ROW_NUMBER() OVER (ORDER BY cnt DESC, piece ASC) AS rn
        FROM pcnt WHERE length(piece) >= 2
    ) WHERE rn <= {UNI_SEED}
), v0 AS (
    SELECT piece, cnt FROM chars UNION ALL SELECT piece, cnt FROM seedk
), v0tot AS (
    SELECT {l_tot0} AS l_tot
    FROM (SELECT CAST(SUM(cnt) AS BIGINT) AS tot,
                 CAST(COUNT(*) AS BIGINT) AS nv FROM v0)
), v0s AS (
    SELECT piece, {l_cnt} - (SELECT l_tot FROM v0tot) AS sc FROM v0
){_seg_ctes('v0s', '1')}
, u1 AS (
    SELECT piece, CAST(SUM(freq) AS BIGINT) AS u
    FROM (SELECT freq, unnest(pieces) AS piece FROM seg_1)
    GROUP BY piece
), kept AS (
    SELECT piece FROM (
        SELECT piece, u, ROW_NUMBER() OVER (ORDER BY u DESC, piece ASC) AS rn
        FROM u1 WHERE length(piece) >= 2 AND u > 0
    ) WHERE rn <= {UNI_KEEP}
), v1u AS (
    SELECT v.piece, CAST(COALESCE(u1.u, 0) AS BIGINT) AS u
    FROM (SELECT piece FROM chars UNION ALL SELECT piece FROM kept) v
    LEFT JOIN u1 USING (piece)
), v1tot AS (
    SELECT {l_tot0} AS l_tot
    FROM (SELECT CAST(SUM(u) AS BIGINT) AS tot,
                 CAST(COUNT(*) AS BIGINT) AS nv FROM v1u)
), v1s AS (
    SELECT piece, {l_u} - (SELECT l_tot FROM v1tot) AS sc FROM v1u
){_seg_ctes('v1s', '2')}
, u2 AS (
    SELECT piece, CAST(SUM(freq) AS BIGINT) AS u
    FROM (SELECT freq, unnest(pieces) AS piece FROM seg_2)
    GROUP BY piece
)"""


def unigram_train_oracle_sql() -> str:
    return (
        "WITH RECURSIVE "
        + _train_ctes()
        + """
SELECT v.piece,
       CAST(length(v.piece) AS INT) AS piece_len,
       CAST(COALESCE(u2.u, 0) AS BIGINT) AS n_used,
       v.sc AS score
FROM v1s v LEFT JOIN u2 USING (piece)
"""
    )


def _encode_tail_sql(seg: str, docs: str) -> str:
    """The per-doc encode rollup as SQL over any segmentation CTE ``seg``
    (pt, pieces) and corpus source ``docs`` — oracle twin of
    ``_encode_from_seg``."""
    h = hash64_sql("piece")
    return f"""
, ptstats AS (
    SELECT pt, CAST(COUNT(*) AS BIGINT) AS n_pieces,
           CAST(SUM({h} % {_HASH_MOD}) AS BIGINT) AS hsum
    FROM (SELECT pt, unnest(pieces) AS piece FROM {seg})
    GROUP BY pt
), dtok AS (
    SELECT doc_id, pt, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (SELECT doc_id, unnest({tokens_sql('text')}) AS pt FROM {docs})
    GROUP BY doc_id, pt
), fbstats AS (
    -- byte/char fallback tier: segmentation of a >UNI_MAXWORD word is its
    -- char stream; the order-free modular hash replays the Spark fold
    SELECT pt,
           CAST(list_sum(list_transform(range(1, length(pt) + 1),
                i -> ('0x' || substr(md5(substr(pt, CAST(i AS INT), 1)),
                                     1, 15))::BIGINT % {_HASH_MOD}))
                AS BIGINT) AS hsum
    FROM (SELECT DISTINCT pt FROM dtok WHERE length(pt) > {UNI_MAXWORD})
)
SELECT d.doc_id,
       CAST(COALESCE(SUM(t.cnt), 0) AS BIGINT) AS n_words,
       CAST(COALESCE(SUM(CASE WHEN length(t.pt) <= {UNI_MAXWORD}
                              THEN t.cnt ELSE 0 END), 0) AS BIGINT)
           AS n_enc_words,
       CAST(COALESCE(SUM(CASE WHEN length(t.pt) <= {UNI_MAXWORD}
                              THEN t.cnt * p.n_pieces ELSE 0 END), 0)
            AS BIGINT) AS n_pieces,
       CAST(COALESCE(SUM(CASE WHEN length(t.pt) <= {UNI_MAXWORD}
                              THEN t.cnt * p.hsum ELSE 0 END), 0)
            AS BIGINT) AS piece_hash,
       CASE WHEN COALESCE(SUM(CASE WHEN length(t.pt) <= {UNI_MAXWORD}
                                   THEN t.cnt ELSE 0 END), 0) > 0
            THEN CAST(COALESCE(SUM(CASE WHEN length(t.pt) <= {UNI_MAXWORD}
                                        THEN t.cnt * p.n_pieces
                                        ELSE 0 END), 0) AS DOUBLE)
                 / CAST(SUM(CASE WHEN length(t.pt) <= {UNI_MAXWORD}
                                 THEN t.cnt ELSE 0 END) AS DOUBLE)
            ELSE 0.0 END AS fertility,
       CAST(COALESCE(SUM(CASE WHEN length(t.pt) > {UNI_MAXWORD}
                              THEN t.cnt * length(t.pt) ELSE 0 END), 0)
            AS BIGINT) AS fb_pieces,
       CAST(COALESCE(SUM(CASE WHEN length(t.pt) > {UNI_MAXWORD}
                              THEN t.cnt * f.hsum ELSE 0 END), 0)
            AS BIGINT) AS fb_hash
FROM {docs} d
LEFT JOIN dtok t ON d.doc_id = t.doc_id
LEFT JOIN ptstats p ON t.pt = p.pt
LEFT JOIN fbstats f ON t.pt = f.pt
GROUP BY d.doc_id
"""


def unigram_encode_oracle_sql(fallback_probe: bool = False) -> str:
    docs = "docs_fb" if fallback_probe else "documents"
    probe_cte = ""
    if fallback_probe:
        probe_cte = f"""
docs_fb AS (
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 0
                THEN text || ' internationalization fallbackprobe'
                     || lpad(CAST(doc_id % 100000 AS VARCHAR), 5, '0')
                ELSE text END AS text
    FROM documents
), """
    return (
        "WITH RECURSIVE "
        + probe_cte
        + _train_ctes(docs)
        + _encode_tail_sql("seg_2", docs)
    )


# ---------------------------------------------------------------------------
# Soft-EM (forward-backward) round — fixed-point softfloat arithmetic.
# ---------------------------------------------------------------------------
# The hard-EM trainer above uses Viterbi (single-best) counts. The published
# algorithm's E-step uses EXPECTED counts over all segmentations
# (forward-backward). Floating-point logsumexp would hinge on libm rounding
# and could drift between engines, so the probabilities ride a tiny
# deterministic SOFTFLOAT: value = m * 2^e with the mantissa normalized to
# [2^30, 2^31), packed into ONE BIGINT as (e + 4096) * 2^31 + m (packed
# integer comparison == value comparison; 0 packs the value zero). mul =
# integer product + bit-length renormalize; add = align-by-shift + truncate
# + renormalize; div = (m << 31) // m' + renormalize. Every op is integer
# shifts/div/mod — bit-identical in Spark codegen folds and DuckDB
# recursive CTEs. Fold ORDER is pinned by sorting the packed candidate
# list (truncated adds don't commute across 3+ terms), identically in both
# engines. Worst-case exponent: |e| <= 2 * UNI_MAXWORD * (bitlen(D) + 1)
# + 31 — far inside the 4096 bias for any conceivable corpus.

_SFB = 1 << 31
_SF_BIAS = 4096
_SF_ONE = (_SF_BIAS - 30) * _SFB + (1 << 30)  # m=2^30, e=-30 -> value 1.0
_SOFT_Q = 65536  # expected counts quantized to 2^-16 units

_SPARK_SF = {
    "div": lambda a, b: f"(({a}) DIV ({b}))",
    "shl": lambda x, n: f"shiftleft({x}, CAST({n} AS INT))",
    "shr": lambda x, n: f"shiftright({x}, CAST({n} AS INT))",
}
_DUCK_SF = {
    "div": lambda a, b: f"(({a}) // ({b}))",
    "shl": lambda x, n: f"(({x}) << ({n}))",
    "shr": lambda x, n: f"(({x}) >> ({n}))",
}


def _sf_m(x: str) -> str:
    return f"(({x}) % {_SFB})"


def _sf_e(x: str, d) -> str:
    return f"({d['div'](x, _SFB)} - {_SF_BIAS})"


def _sf_mulc_sql(a: str, pm: str, pe: str, d) -> str:
    """packed a  x  explicit-(pm, pe) softfloat -> packed."""
    prod = f"({_sf_m(a)} * ({pm}))"
    sh = f"(length(bin({prod})) - 31)"
    return (
        f"(({_sf_e(a, d)} + ({pe}) + {sh} + {_SF_BIAS}) * {_SFB}"
        f" + {d['shr'](prod, sh)})"
    )


def _sf_mulp_sql(a: str, b: str, d) -> str:
    """packed x packed -> packed."""
    prod = f"({_sf_m(a)} * {_sf_m(b)})"
    sh = f"(length(bin({prod})) - 31)"
    return (
        f"(({_sf_e(a, d)} + {_sf_e(b, d)} + {sh} + {_SF_BIAS}) * {_SFB}"
        f" + {d['shr'](prod, sh)})"
    )


def _sf_add_sql(a: str, b: str, d) -> str:
    """packed + packed -> packed (0 = zero). Align lo to hi's exponent,
    truncate, renormalize. Packed order == value order, so hi/lo via one
    integer compare."""
    hi = f"(CASE WHEN ({a}) >= ({b}) THEN ({a}) ELSE ({b}) END)"
    lo = f"(CASE WHEN ({a}) >= ({b}) THEN ({b}) ELSE ({a}) END)"
    dd = f"least({_sf_e(hi, d)} - {_sf_e(lo, d)}, 62)"
    s = f"({_sf_m(hi)} + {d['shr'](_sf_m(lo), dd)})"
    sh = f"(length(bin({s})) - 31)"
    return (
        f"(CASE WHEN ({a}) = 0 THEN ({b}) WHEN ({b}) = 0 THEN ({a}) ELSE "
        f"({_sf_e(hi, d)} + {sh} + {_SF_BIAS}) * {_SFB} + {d['shr'](s, sh)}"
        f" END)"
    )


def _sf_div_sql(a: str, b: str, d) -> str:
    """packed / packed -> packed."""
    q = f"({d['div'](d['shl'](_sf_m(a), 31), _sf_m(b))})"
    sh = f"(length(bin({q})) - 31)"
    return (
        f"(({_sf_e(a, d)} - {_sf_e(b, d)} - 31 + {sh} + {_SF_BIAS}) * {_SFB}"
        f" + {d['shr'](q, sh)})"
    )


def _sf_q16_sql(x: str, d) -> str:
    """floor(value(x) * 2^16) as BIGINT."""
    t = f"({_sf_e(x, d)} + 16)"
    return (
        f"(CASE WHEN {t} >= 0 THEN {d['shl'](_sf_m(x), f'least({t}, 20)')}"
        f" ELSE {d['shr'](_sf_m(x), f'least(-({t}), 62)')} END)"
    )


def _sf_ratio_sql(num: str, den: str, d) -> tuple[str, str]:
    """(pm, pe) softfloat of the integer ratio num/den (both >= 1)."""
    bln = f"length(bin({num}))"
    bld = f"length(bin({den}))"
    mn = (
        f"(CASE WHEN {bln} >= 31 THEN {d['shr'](num, f'({bln} - 31)')}"
        f" ELSE {d['shl'](num, f'(31 - {bln})')} END)"
    )
    md = (
        f"(CASE WHEN {bld} >= 31 THEN {d['shr'](den, f'({bld} - 31)')}"
        f" ELSE {d['shl'](den, f'(31 - {bld})')} END)"
    )
    q = f"({d['div'](d['shl'](mn, 31), md)})"
    sh = f"(length(bin({q})) - 31)"
    pm = d["shr"](q, sh)
    pe = f"({bln} - {bld} - 31 + {sh})"
    return pm, pe


# candidate packing: ((i*16 + j)*256 + (pe + 192)) * 2^31 + pm
def _sfc_i(c: str, d) -> str:
    return f"({d['div'](d['div'](d['div'](c, _SFB), 256), 16)})"


def _sfc_j(c: str, d) -> str:
    return f"({d['div'](d['div'](c, _SFB), 256)} % 16)"


def _sfc_pm(c: str) -> str:
    return f"(({c}) % {_SFB})"


def _sfc_pe(c: str, d) -> str:
    return f"({d['div'](c, _SFB)} % 256 - 192)"


def _alpha_fold_spark() -> str:
    d = _SPARK_SF
    mul = _sf_mulc_sql(
        f"element_at(acc, CAST({_sfc_j('c', d)} + 1 AS INT))",
        _sfc_pm("c"), _sfc_pe("c", d), d,
    )
    add = _sf_add_sql("s", "x", d)
    return f"""
aggregate(
  sequence(1, length(pt)),
  array(CAST({_SF_ONE} AS BIGINT)),
  (acc, p) -> concat(acc, array(
      aggregate(
        transform(
          filter(cands, c -> {_sfc_i('c', d)} = p),
          c -> {mul}),
        CAST(0 AS BIGINT),
        (s, x) -> {add}))))
"""


def _rbeta_fold_spark() -> str:
    d = _SPARK_SF
    mul = _sf_mulc_sql(
        f"element_at(acc, CAST(length(pt) - {_sfc_i('c', d)} + 1 AS INT))",
        _sfc_pm("c"), _sfc_pe("c", d), d,
    )
    add = _sf_add_sql("s", "x", d)
    return f"""
aggregate(
  sequence(1, length(pt)),
  array(CAST({_SF_ONE} AS BIGINT)),
  (acc, p) -> concat(acc, array(
      aggregate(
        transform(
          filter(cands, c -> {_sfc_j('c', d)} = length(pt) - p),
          c -> {mul}),
        CAST(0 AS BIGINT),
        (s, x) -> {add}))))
"""


def _soft_pv(vocab: DataFrame, cnt_col: str, unit: int) -> DataFrame:
    """(piece, pm, pe): add-``unit``-smoothed softfloat probabilities —
    p(piece) = (cnt + unit)/(tot + |V|·unit). unit=1 for raw substring
    counts (round 1); unit=2^16 for quantized expected counts (round 2),
    so the smoothing is add-1 in each round's own count units."""
    den = vocab.agg(
        (F.sum(cnt_col) + F.count(F.lit(1)) * unit).cast("long").alias("dd")
    )
    pm_sql, pe_sql = _sf_ratio_sql(f"({cnt_col} + {int(unit)})", "dd", _SPARK_SF)
    return (
        vocab.crossJoin(F.broadcast(den))
        .select(
            "piece",
            F.expr(pm_sql).cast("long").alias("pm"),
            F.expr(pe_sql).cast("long").alias("pe"),
        )
        .localCheckpoint()  # candidates + posterior both read it
    )


def _soft_estep(pret: DataFrame, pv: DataFrame) -> DataFrame:
    """(piece, u): one forward-backward E-step — frequency-weighted
    posteriors of every candidate occurrence under the softfloat model
    ``pv``, quantized to 2^-16 units. The fb frame is discarded, so its
    pin is skipped (r11): the usage rollup is fb's only consumer here,
    and the pin was a pure extra blocking materialization."""
    return _soft_estep_frames(pret, pv, pin_fb=False)[0]


def _soft_estep_frames(
    pret: DataFrame, pv: DataFrame, pin_fb: bool = True
) -> tuple[DataFrame, DataFrame]:
    """(us, fb): the E-step's usage rollup plus the per-pretoken
    (alpha, rbeta) frame — the iterated trainer reads alpha(n) off ``fb``
    for the fixed-point corpus log-likelihood, so callers that consume
    BOTH frames keep ``pin_fb=True`` (one materialization shared by the
    rollup and the LL scalar)."""
    d = _SPARK_SF
    cand = _substrings(pret).join(F.broadcast(pv), "piece")
    packed = F.expr(
        f"((CAST(i AS BIGINT) * 16 + j) * 256 + (pe + 192)) * {_SFB} + pm"
    )
    cl = cand.groupBy("pt").agg(
        F.sort_array(F.collect_list(packed)).alias("cands")
    )
    fb = (
        cl.withColumn("alpha", F.expr(_alpha_fold_spark()))
        .withColumn("rbeta", F.expr(_rbeta_fold_spark()))
        .select("pt", "alpha", "rbeta")
    )
    if pin_fb:
        fb = fb.localCheckpoint()  # usage rollup + LL both read it
    post = _sf_div_sql(
        _sf_mulp_sql(
            _sf_mulc_sql("element_at(alpha, j + 1)", "pm", "pe", d),
            "element_at(rbeta, length(pt) - i + 1)",
            d,
        ),
        "element_at(alpha, length(pt) + 1)",
        d,
    )
    contrib = F.expr(f"freq * {_sf_q16_sql(post, d)}").cast("long")
    us = (
        cand.join(fb, "pt")
        .select("piece", contrib.alias("contrib"))
        .groupBy("piece")
        .agg(F.sum("contrib").cast("long").alias("u"))
    )
    return us, fb


def unigram_train_soft(
    documents: DataFrame, pret: DataFrame | None = None
) -> DataFrame:
    """(piece, piece_len, u_soft, score): the FULL soft-EM training loop,
    mirroring the hard trainer's two-round structure with the published
    algorithm's true E-step — forward-backward EXPECTED counts over all
    segmentations instead of Viterbi best-path counts:

      * round 1: E-step under the add-1-smoothed seed probabilities
        p = (cnt+1)/(tot+|V|);
      * prune by soft contribution (chars always survive; longer pieces
        need expected count > 0 and a top-``UNI_KEEP`` rank — the
        prune-by-loss-delta step with the delta rendered as the piece's
        expected usage, the soft analogue of the hard trainer's rule);
      * round 2: E-step under the pruned model re-smoothed in quantized
        units, p = (u + 2^16)/(tot_q + |V|·2^16); its expected counts and
        fixed-point-log2 scores are the trained table.

    Exactness: every probability is a deterministic 31-bit-mantissa
    softfloat packed into one BIGINT (module comment above); the DP folds
    are in-row codegen aggregates over the SORTED packed candidate list,
    and the DuckDB twin replays the identical integer ops in the same
    order — expected counts are bit-identical, with no libm logsumexp
    anywhere.

    Scale shape: identical to the hard trainer — one corpus-sized token
    shuffle builds the distinct-pretoken frame; candidate explodes, DP
    folds, and posterior quantization run on the vocabulary-sized frame;
    usage rollups are map-side combinable."""
    from pyspark.sql import Window

    # ``pret`` lets a composing gate (unigram_encode_soft) hand in its
    # already-pinned pretoken frame instead of re-running the corpus
    # tokenize + groupBy chain a second time — same frame by construction
    if pret is None:
        pret = _pretokens(documents).localCheckpoint()
    pcnt = (
        _substrings(pret)
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("cnt"))
        .localCheckpoint()
    )
    chars = pcnt.where(F.length("piece") == 1)
    w = Window.orderBy(F.desc("cnt"), F.asc("piece"))
    seedk = (
        pcnt.where(F.length("piece") >= 2)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= UNI_SEED)
        .drop("rn")
    )
    v0 = chars.unionAll(seedk).localCheckpoint()
    u1 = _soft_estep(pret, _soft_pv(v0, "cnt", 1)).localCheckpoint()
    wk = Window.orderBy(F.desc("u"), F.asc("piece"))
    kept = (
        u1.where((F.length("piece") >= 2) & (F.col("u") > 0))
        .withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") <= UNI_KEEP)
        .select("piece")
    )
    v1u = (
        chars.select("piece")
        .unionAll(kept)
        .join(u1, "piece", "left")
        .select(
            "piece", F.coalesce(F.col("u"), F.lit(0)).cast("long").alias("u")
        )
        .localCheckpoint()  # pv1 + final output share it
    )
    u2 = _soft_estep(pret, _soft_pv(v1u, "u", _SOFT_Q))
    uv = v1u.select("piece").join(u2, "piece", "left").select(
        "piece", F.coalesce(F.col("u"), F.lit(0)).cast("long").alias("u")
    )
    tot = uv.agg(
        F.sum("u").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("nv"),
    )
    tot = _with_log2fix(tot, f"tot + nv * {_SOFT_Q}", "l_tot")
    scored = _with_log2fix(uv, f"u + {_SOFT_Q}", "l_u")
    return scored.crossJoin(F.broadcast(tot.select("l_tot"))).select(
        "piece",
        F.length("piece").cast("int").alias("piece_len"),
        F.col("u").alias("u_soft"),
        (F.col("l_u") - F.col("l_tot")).alias("score"),
    )


UNI_SOFT_MAX_ROUNDS = 4
# per-TOKEN minimum log-likelihood gain to continue, in 2^-16-bit units
# (655 ~ 0.01 bits/token)
UNI_SOFT_MIN_GAIN = 655


def _soft_ll(pret: DataFrame, fb: DataFrame) -> int:
    """Fixed-point corpus log-likelihood under the model that produced
    ``fb``: sum over pretokens of freq * (log2fix(m_Z) + e_Z * 2^16),
    where Z = alpha(n) is the word's total segmentation probability as a
    packed softfloat. Pure integer — bit-identical in DuckDB — and a
    1-row bounded scalar (the kmeans_train eager-iteration precedent)."""
    z = "element_at(alpha, CAST(length(pt) + 1 AS INT))"
    df = fb.join(pret, "pt").select(
        "freq",
        F.expr(f"({z} % {_SFB})").alias("zm"),
        F.expr(f"(({z} DIV {_SFB}) - {_SF_BIAS})").alias("ze"),
    )
    df = _with_log2fix(df, "zm", "l_m")
    row = df.agg(
        F.sum(
            F.col("freq") * (F.col("l_m") + F.col("ze") * F.lit(65536))
        )
        .cast("long")
        .alias("ll")
    ).first()
    return int(row["ll"])


def unigram_train_soft_iter(
    documents: DataFrame,
    max_rounds: int = UNI_SOFT_MAX_ROUNDS,
    min_gain: int = UNI_SOFT_MIN_GAIN,
) -> DataFrame:
    """(piece, piece_len, u_soft, score, n_rounds, ll): the ITERATED
    soft-EM schedule with a fixed-point log-likelihood stopping rule —
    the full Kudo training loop on the softfloat machinery. Round 1
    E-steps the seed vocab and prunes (as ``unigram_train_soft``); then
    pruned-vocab E-steps repeat, each re-smoothing from the previous
    round's quantized expected counts, while the corpus log-likelihood
    (an exact integer: sum of freq * log2fix-rendered alpha(n)) improves
    by at least ``min_gain`` 2^-16-bits per token; stop at the first
    round whose gain falls below, or at ``max_rounds`` E-steps. n_rounds
    and the final ll ride the output, so the STOPPING DECISION itself is
    value-hash-graded.

    The driver loop is eager with 1-row scalar collects only (the
    kmeans_train precedent); the DuckDB oracle unrolls max_rounds as
    CTEs, computes every round's ll, and selects the stopped round with
    the identical integer rule."""
    from pyspark.sql import Window

    pret = _pretokens(documents).localCheckpoint()
    pcnt = (
        _substrings(pret)
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("cnt"))
        .localCheckpoint()
    )
    chars = pcnt.where(F.length("piece") == 1)
    w = Window.orderBy(F.desc("cnt"), F.asc("piece"))
    seedk = (
        pcnt.where(F.length("piece") >= 2)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= UNI_SEED)
        .drop("rn")
    )
    v0 = chars.unionAll(seedk).localCheckpoint()
    u1 = _soft_estep(pret, _soft_pv(v0, "cnt", 1)).localCheckpoint()
    wk = Window.orderBy(F.desc("u"), F.asc("piece"))
    kept = (
        u1.where((F.length("piece") >= 2) & (F.col("u") > 0))
        .withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") <= UNI_KEEP)
        .select("piece")
    )
    v1p = chars.select("piece").unionAll(kept).localCheckpoint()
    cur = v1p.join(u1, "piece", "left").select(
        "piece", F.coalesce(F.col("u"), F.lit(0)).cast("long").alias("u")
    ).localCheckpoint()
    tot_freq = int(pret.agg(F.sum("freq")).first()[0])
    threshold = int(min_gain) * tot_freq

    prev_ll = None
    ll = 0
    n_rounds = 1
    for r in range(2, int(max_rounds) + 1):
        us, fbr = _soft_estep_frames(pret, _soft_pv(cur, "u", _SOFT_Q))
        ll = _soft_ll(pret, fbr)
        cur = v1p.join(us, "piece", "left").select(
            "piece", F.coalesce(F.col("u"), F.lit(0)).cast("long").alias("u")
        ).localCheckpoint()
        n_rounds = r
        if prev_ll is not None and ll - prev_ll < threshold:
            break
        prev_ll = ll

    tot = cur.agg(
        F.sum("u").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("nv"),
    )
    tot = _with_log2fix(tot, f"tot + nv * {_SOFT_Q}", "l_tot")
    scored = _with_log2fix(cur, f"u + {_SOFT_Q}", "l_u")
    return scored.crossJoin(F.broadcast(tot.select("l_tot"))).select(
        "piece",
        F.length("piece").cast("int").alias("piece_len"),
        F.col("u").alias("u_soft"),
        (F.col("l_u") - F.col("l_tot")).alias("score"),
        F.lit(int(n_rounds)).cast("int").alias("n_rounds"),
        F.lit(int(ll)).cast("long").alias("ll"),
    )


UNI_SOFT_PRUNE_TARGET = 24  # stop once the multi-char vocab reaches this
# Kudo's shrinking factor: keep 3/4 of the multi-char pieces per prune
UNI_SOFT_SHRINK_NUM, UNI_SOFT_SHRINK_DEN = 3, 4

# Scores-only Viterbi over a piece's own string: dp[p] = best sum of
# candidate scores covering positions 1..p (candidates exclude the
# full-span piece itself, so dp[len] is the best ALTERNATIVE
# segmentation). Same fold as _DP_EXPR without backpointers.
_ALT_DP_EXPR = f"""
aggregate(
  sequence(1, length(pt)),
  array(CAST(0 AS BIGINT)),
  (acc, p) -> concat(acc, array(
      aggregate(
        filter(cands, c -> c.i = p),
        CAST({NEG_INF} AS BIGINT),
        (m, c) -> IF(element_at(acc, c.j + 1) > CAST({NEG_INF} AS BIGINT)
                     AND element_at(acc, c.j + 1) + c.sc > m,
                  element_at(acc, c.j + 1) + c.sc,
                  m))))
)
"""


def _soft_scores(cur: DataFrame) -> DataFrame:
    """(piece, sc): add-2^16-smoothed fixed-point log2 scores over the
    quantized expected counts ``cur`` (piece, u) — the model the prune
    deltas are measured under."""
    tot = cur.agg(
        F.sum("u").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("nv"),
    )
    tot = _with_log2fix(tot, f"tot + nv * {_SOFT_Q}", "l_tot")
    v = _with_log2fix(cur, f"u + {_SOFT_Q}", "l_u")
    return v.crossJoin(F.broadcast(tot.select("l_tot"))).select(
        "piece", (F.col("l_u") - F.col("l_tot")).alias("sc")
    )


def _prune_delta(cur: DataFrame) -> DataFrame:
    """(piece, delta) for every multi-char piece of ``cur``: Kudo's
    prune-by-loss-delta — the corpus log-likelihood loss of removing the
    piece, rendered exactly as

        delta = u * (sc(piece) - alt(piece))

    where alt(piece) is the best segmentation score of the piece's OWN
    string under the current model with the piece itself excluded (its
    occurrences must re-segment that way if pruned; SentencePiece's
    PruneSentencePieces computes the identical first-order estimate).
    Everything is int64 — u is the quantized expected count, sc/alt are
    fixed-point log2 — so the ranking is bit-identical in DuckDB. Chars
    never appear (they always survive). Vocabulary-sized work: pieces
    are <= UNI_MAXPIECE chars, so the DP is a tiny in-row fold."""
    sc = _soft_scores(cur).localCheckpoint()  # candidates + deltas read it
    multi = cur.where(F.length("piece") >= 2).select(
        F.col("piece").alias("pt"), F.lit(1).cast("long").alias("freq")
    )
    cand = (
        _substrings(multi)
        .where(F.col("piece") != F.col("pt"))
        .join(F.broadcast(sc), "piece")
        .groupBy("pt")
        .agg(F.sort_array(F.collect_list(F.struct("i", "j", "sc"))).alias("cands"))
    )
    alt = cand.withColumn("dp", F.expr(_ALT_DP_EXPR)).select(
        F.col("pt").alias("piece"),
        F.expr("element_at(dp, length(pt) + 1)").alias("alt"),
    )
    return (
        cur.join(sc, "piece")
        .join(alt, "piece")
        .select(
            "piece",
            (F.col("u") * (F.col("sc") - F.col("alt")))
            .cast("long")
            .alias("delta"),
        )
    )


def unigram_train_soft_prune(
    documents: DataFrame,
    max_rounds: int = UNI_SOFT_MAX_ROUNDS,
    target_multi: int = UNI_SOFT_PRUNE_TARGET,
) -> DataFrame:
    """(piece, piece_len, u_soft, score, n_rounds, ll): the INTERLEAVED
    soft-EM schedule — Kudo's published outer loop, closing SURVEY
    §7.1.3's residual: instead of pruning once after round 1 and
    iterating E-steps over a frozen vocab (``unigram_train_soft_iter``),
    every round after the seed prune runs

        E-step  ->  corpus LL  ->  prune-by-loss-delta (keep the top
        3/4 of multi-char pieces ranked by ``_prune_delta``; chars
        always survive)

    and the loop stops when the multi-char vocab reaches
    ``target_multi`` (the algorithm's actual termination: shrink toward
    the requested vocab size) or at ``max_rounds`` E-steps. n_rounds and
    the final ll ride the output, and the surviving vocab IS the row
    set, so the interleaved schedule's every decision — which pieces
    each round's deltas condemned, and when the loop stopped — is
    value-hash-graded. The DuckDB oracle unrolls the schedule round by
    round with the identical integer arithmetic.

    Driver loop is eager with bounded scalar collects only (1-row LL,
    1-row vocab count — the kmeans_train precedent); all corpus-sized
    work stays in the same distributed E-step plans as the fixed-vocab
    trainer."""
    from pyspark.sql import Window

    pret = _pretokens(documents).localCheckpoint()
    pcnt = (
        _substrings(pret)
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("cnt"))
        .localCheckpoint()
    )
    chars = pcnt.where(F.length("piece") == 1)
    w = Window.orderBy(F.desc("cnt"), F.asc("piece"))
    seedk = (
        pcnt.where(F.length("piece") >= 2)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= UNI_SEED)
        .drop("rn")
    )
    v0 = chars.unionAll(seedk).localCheckpoint()
    u1 = _soft_estep(pret, _soft_pv(v0, "cnt", 1)).localCheckpoint()
    wk = Window.orderBy(F.desc("u"), F.asc("piece"))
    kept = (
        u1.where((F.length("piece") >= 2) & (F.col("u") > 0))
        .withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") <= UNI_KEEP)
        .select("piece")
    )
    cur = (
        chars.select("piece")
        .unionAll(kept)
        .join(u1, "piece", "left")
        .select(
            "piece", F.coalesce(F.col("u"), F.lit(0)).cast("long").alias("u")
        )
        .localCheckpoint()
    )

    wd = Window.orderBy(F.desc("delta"), F.asc("piece"))
    ll = 0
    n_rounds = 1
    for r in range(2, int(max_rounds) + 1):
        us, fbr = _soft_estep_frames(pret, _soft_pv(cur, "u", _SOFT_Q))
        ll = _soft_ll(pret, fbr)
        uvx = (
            cur.select("piece")
            .join(us, "piece", "left")
            .select(
                "piece",
                F.coalesce(F.col("u"), F.lit(0)).cast("long").alias("u"),
            )
            .localCheckpoint()  # deltas + the kept counts both read it
        )
        ranked = _prune_delta(uvx).withColumn("rn", F.row_number().over(wd))
        kcnt = ranked.agg(
            F.expr(
                f"CAST((count(1) * {UNI_SOFT_SHRINK_NUM})"
                f" DIV {UNI_SOFT_SHRINK_DEN} AS BIGINT)"
            ).alias("kn")
        )
        pkept = (
            ranked.crossJoin(F.broadcast(kcnt))
            .where(F.col("rn") <= F.col("kn"))
            .select("piece")
        )
        cur = (
            uvx.where(F.length("piece") == 1)
            .unionAll(pkept.join(uvx, "piece").select("piece", "u"))
            .localCheckpoint()
        )
        n_rounds = r
        n_multi = int(cur.where(F.length("piece") >= 2).count())
        if n_multi <= int(target_multi):
            break

    tot = cur.agg(
        F.sum("u").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("nv"),
    )
    tot = _with_log2fix(tot, f"tot + nv * {_SOFT_Q}", "l_tot")
    scored = _with_log2fix(cur, f"u + {_SOFT_Q}", "l_u")
    return scored.crossJoin(F.broadcast(tot.select("l_tot"))).select(
        "piece",
        F.length("piece").cast("int").alias("piece_len"),
        F.col("u").alias("u_soft"),
        (F.col("l_u") - F.col("l_tot")).alias("score"),
        F.lit(int(n_rounds)).cast("int").alias("n_rounds"),
        F.lit(int(ll)).cast("long").alias("ll"),
    )


def _soft_estep_ctes(tag: str, pv: str) -> str:
    """One E-step as DuckDB CTEs (candp_/cl_/af_/bf_/fbx_/postc_/us_{tag})
    over the model CTE ``pv`` — the oracle twin of ``_soft_estep``."""
    d = _DUCK_SF
    mul_a = _sf_mulc_sql(
        f"a.al[{_sfc_j('x', d)} + 1]", _sfc_pm("x"), _sfc_pe("x", d), d
    )
    mul_b = _sf_mulc_sql(
        f"b.bl[length(b.pt) - {_sfc_i('x', d)} + 1]",
        _sfc_pm("x"), _sfc_pe("x", d), d,
    )
    add = _sf_add_sql("s", "x", d)
    post = _sf_div_sql(
        _sf_mulp_sql(
            _sf_mulc_sql("f.al[sb.j + 1]", "v.pm", "v.pe", d),
            "f.bl[length(sb.pt) - sb.i + 1]",
            d,
        ),
        "f.al[length(sb.pt) + 1]",
        d,
    )
    return f"""
, candp_{tag} AS (
    SELECT sb.pt,
           ((CAST(sb.i AS BIGINT) * 16 + sb.j) * 256 + (v.pe + 192))
               * {_SFB} + v.pm AS cpk
    FROM subs sb JOIN {pv} v USING (piece)
), cl_{tag} AS MATERIALIZED (
    SELECT pt, list_sort(list(cpk)) AS cands FROM candp_{tag} GROUP BY pt
), af_{tag} AS (
    SELECT pt, 0 AS pos, [CAST({_SF_ONE} AS BIGINT)] AS al FROM cl_{tag}
    UNION ALL
    SELECT a.pt, a.pos + 1,
           a.al || [(
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(
                   list_filter(c.cands,
                               x -> {_sfc_i('x', d)} = a.pos + 1),
                   x -> {mul_a})),
               (s, x) -> {add})
           )]
    FROM af_{tag} a JOIN cl_{tag} c USING (pt)
    WHERE a.pos < length(a.pt)
), bf_{tag} AS (
    SELECT pt, 0 AS pos, [CAST({_SF_ONE} AS BIGINT)] AS bl FROM cl_{tag}
    UNION ALL
    SELECT b.pt, b.pos + 1,
           b.bl || [(
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(
                   list_filter(c.cands,
                               x -> {_sfc_j('x', d)} = length(b.pt) - (b.pos + 1)),
                   x -> {mul_b})),
               (s, x) -> {add})
           )]
    FROM bf_{tag} b JOIN cl_{tag} c USING (pt)
    WHERE b.pos < length(b.pt)
), fbx_{tag} AS MATERIALIZED (
    SELECT a.pt, a.al, b.bl
    FROM af_{tag} a JOIN bf_{tag} b USING (pt)
    WHERE a.pos = length(a.pt) AND b.pos = length(b.pt)
), postc_{tag} AS (
    SELECT sb.piece,
           sb.freq * {_sf_q16_sql(post, d)} AS contrib
    FROM subs sb JOIN {pv} v USING (piece) JOIN fbx_{tag} f ON f.pt = sb.pt
), us_{tag} AS (
    SELECT piece, CAST(SUM(contrib) AS BIGINT) AS u
    FROM postc_{tag} GROUP BY piece
)"""


def _soft_pv_ctes(tag: str, vocab: str, cnt_col: str, unit: int) -> str:
    d = _DUCK_SF
    pm_sql, pe_sql = _sf_ratio_sql(f"({cnt_col} + {int(unit)})", "dd", d)
    return f"""
, den_{tag} AS (
    SELECT CAST(SUM({cnt_col}) AS BIGINT)
           + CAST(COUNT(*) AS BIGINT) * {int(unit)} AS dd FROM {vocab}
), pv_{tag} AS MATERIALIZED (
    SELECT piece, CAST({pm_sql} AS BIGINT) AS pm,
           CAST({pe_sql} AS BIGINT) AS pe
    FROM {vocab} CROSS JOIN den_{tag}
)"""


def _soft_ctes() -> str:
    """The full two-round soft trainer as CTEs (through ``uv``/``ut``) —
    shared by the trained-table oracle and the soft-encode oracle."""
    # seed CTEs: pret/subs/pcnt/chars/seedk/v0 verbatim from the hard
    # trainer (everything up to and including v0)
    seed = _train_ctes().split("), v0tot AS (")[0] + ")"
    return f"""{seed}
{_soft_pv_ctes('0', 'v0', 'cnt', 1)}
{_soft_estep_ctes('1', 'pv_0')}
, kept AS (
    SELECT piece FROM (
        SELECT piece, u,
               ROW_NUMBER() OVER (ORDER BY u DESC, piece ASC) AS rn
        FROM us_1 WHERE length(piece) >= 2 AND u > 0
    ) WHERE rn <= {UNI_KEEP}
), v1u AS MATERIALIZED (
    SELECT v.piece, CAST(COALESCE(us_1.u, 0) AS BIGINT) AS u
    FROM (SELECT piece FROM chars UNION ALL SELECT piece FROM kept) v
    LEFT JOIN us_1 USING (piece)
)
{_soft_pv_ctes('2', 'v1u', 'u', _SOFT_Q)}
{_soft_estep_ctes('2', 'pv_2')}
, uv AS MATERIALIZED (
    SELECT v1u.piece, CAST(COALESCE(us_2.u, 0) AS BIGINT) AS u
    FROM v1u LEFT JOIN us_2 USING (piece)
), ut AS (
    SELECT {log2fix_sql(f'tot + nv * {_SOFT_Q}')} AS l_tot
    FROM (SELECT CAST(SUM(u) AS BIGINT) AS tot,
                 CAST(COUNT(*) AS BIGINT) AS nv FROM uv)
)"""


def unigram_train_soft_oracle_sql() -> str:
    return f"""
WITH RECURSIVE {_soft_ctes()}
SELECT piece,
       CAST(length(piece) AS INT) AS piece_len,
       u AS u_soft,
       {log2fix_sql(f'u + {_SOFT_Q}')} - (SELECT l_tot FROM ut) AS score
FROM uv
"""


def _soft_ll_cte(tag: str) -> str:
    """Corpus log-likelihood of round ``tag`` as a 1-row CTE — the oracle
    twin of ``_soft_ll`` (same integer ops over the same packed alpha)."""
    z = f"(f.al[length(f.pt) + 1])"
    return f"""
, ll_{tag} AS (
    SELECT CAST(SUM(p.freq * (
               {log2fix_sql(f'({z} % {_SFB})')}
               + ((({z} // {_SFB})) - {_SF_BIAS}) * 65536)) AS BIGINT) AS v
    FROM fbx_{tag} f JOIN pret p ON p.pt = f.pt
)"""


def unigram_train_soft_iter_oracle_sql(
    max_rounds: int = UNI_SOFT_MAX_ROUNDS,
    min_gain: int = UNI_SOFT_MIN_GAIN,
) -> str:
    """Unrolled oracle of the iterated soft trainer: every round's E-step
    and log-likelihood as CTEs, the stopped round selected by the
    identical integer rule (first round >= 3 whose gain over the previous
    round falls below min_gain * total_freq, else max_rounds)."""
    assert max_rounds >= 3, "the stopping rule needs at least rounds 2..3"
    seed = _train_ctes().split("), v0tot AS (")[0] + ")"
    parts = [f"""{seed}
{_soft_pv_ctes('0', 'v0', 'cnt', 1)}
{_soft_estep_ctes('1', 'pv_0')}
, kept AS (
    SELECT piece FROM (
        SELECT piece, u,
               ROW_NUMBER() OVER (ORDER BY u DESC, piece ASC) AS rn
        FROM us_1 WHERE length(piece) >= 2 AND u > 0
    ) WHERE rn <= {UNI_KEEP}
), uvr_1 AS MATERIALIZED (
    SELECT v.piece, CAST(COALESCE(us_1.u, 0) AS BIGINT) AS u
    FROM (SELECT piece FROM chars UNION ALL SELECT piece FROM kept) v
    LEFT JOIN us_1 USING (piece)
)"""]
    for r in range(2, int(max_rounds) + 1):
        prev = f"uvr_{r - 1}"
        parts.append(_soft_pv_ctes(str(r), prev, "u", _SOFT_Q))
        parts.append(_soft_estep_ctes(str(r), f"pv_{r}"))
        parts.append(f"""
, uvr_{r} AS MATERIALIZED (
    SELECT p.piece, CAST(COALESCE(us_{r}.u, 0) AS BIGINT) AS u
    FROM (SELECT piece FROM uvr_1) p
    LEFT JOIN us_{r} USING (piece)
)""")
        parts.append(_soft_ll_cte(str(r)))
    # the stopped round: first r >= 3 with gain < T, else max_rounds
    t = f"({int(min_gain)} * (SELECT CAST(SUM(freq) AS BIGINT) FROM pret))"
    cases = " ".join(
        f"WHEN (SELECT v FROM ll_{r}) - (SELECT v FROM ll_{r - 1}) < {t} "
        f"THEN {r}"
        for r in range(3, int(max_rounds) + 1)
    )
    sel_branches = " UNION ALL ".join(
        f"SELECT piece, u FROM uvr_{r} WHERE (SELECT nr FROM nrx) = {r}"
        for r in range(3, int(max_rounds) + 1)
    )
    ll_case = " ".join(
        f"WHEN (SELECT nr FROM nrx) = {r} THEN (SELECT v FROM ll_{r})"
        for r in range(3, int(max_rounds) + 1)
    )
    parts.append(f"""
, nrx AS (
    SELECT CASE {cases} ELSE {int(max_rounds)} END AS nr
), sel AS MATERIALIZED (
    {sel_branches}
), selt AS (
    SELECT {log2fix_sql(f'tot + nv * {_SOFT_Q}')} AS l_tot
    FROM (SELECT CAST(SUM(u) AS BIGINT) AS tot,
                 CAST(COUNT(*) AS BIGINT) AS nv FROM sel)
)
SELECT piece,
       CAST(length(piece) AS INT) AS piece_len,
       u AS u_soft,
       {log2fix_sql(f'u + {_SOFT_Q}')} - (SELECT l_tot FROM selt) AS score,
       CAST((SELECT nr FROM nrx) AS INT) AS n_rounds,
       CAST(CASE {ll_case} END AS BIGINT) AS ll
FROM sel
""")
    return "WITH RECURSIVE " + "".join(parts)


def unigram_train_soft_prune_oracle_sql(
    max_rounds: int = UNI_SOFT_MAX_ROUNDS,
    target_multi: int = UNI_SOFT_PRUNE_TARGET,
) -> str:
    """Unrolled oracle of the INTERLEAVED trainer: per round, the E-step
    CTEs, the corpus LL, the fixed-log2 score table, the piece-level
    alternative-segmentation Viterbi (a position-iterating recursive CTE
    over each multi-char piece's own substrings, full-span candidate
    excluded), the loss-delta ranking, and the 3/4-shrink prune — the
    stopped round selected by the identical vocab-target rule."""
    assert max_rounds >= 2, "the interleaved schedule needs round 2"
    seed = _train_ctes().split("), v0tot AS (")[0] + ")"
    d = _DUCK_SF
    parts = [f"""{seed}
{_soft_pv_ctes('0', 'v0', 'cnt', 1)}
{_soft_estep_ctes('1', 'pv_0')}
, kept AS (
    SELECT piece FROM (
        SELECT piece, u,
               ROW_NUMBER() OVER (ORDER BY u DESC, piece ASC) AS rn
        FROM us_1 WHERE length(piece) >= 2 AND u > 0
    ) WHERE rn <= {UNI_KEEP}
), pcur_1 AS MATERIALIZED (
    SELECT v.piece, CAST(COALESCE(us_1.u, 0) AS BIGINT) AS u
    FROM (SELECT piece FROM chars UNION ALL SELECT piece FROM kept) v
    LEFT JOIN us_1 USING (piece)
), psubs AS MATERIALIZED (
    SELECT k.piece AS pt,
           CAST(t1.i0 + t2.l - 1 AS INT) AS i,
           CAST(t1.i0 - 1 AS INT) AS j,
           substring(k.piece, CAST(t1.i0 AS INT), CAST(t2.l AS INT)) AS sub
    FROM kept k,
         LATERAL unnest(range(1, length(k.piece) + 1)) AS t1(i0),
         LATERAL unnest(range(1, least({UNI_MAXPIECE},
                                       length(k.piece) - t1.i0 + 1) + 1))
             AS t2(l)
    WHERE substring(k.piece, CAST(t1.i0 AS INT), CAST(t2.l AS INT))
          <> k.piece
)"""]
    for r in range(2, int(max_rounds) + 1):
        prev = f"pcur_{r - 1}"
        tag = f"q{r}"
        parts.append(_soft_pv_ctes(tag, prev, "u", _SOFT_Q))
        parts.append(_soft_estep_ctes(tag, f"pv_{tag}"))
        parts.append(_soft_ll_cte(tag))
        parts.append(f"""
, uvx_{tag} AS MATERIALIZED (
    SELECT p.piece, CAST(COALESCE(us_{tag}.u, 0) AS BIGINT) AS u
    FROM (SELECT piece FROM {prev}) p
    LEFT JOIN us_{tag} USING (piece)
), sct_{tag} AS (
    SELECT {log2fix_sql(f'tot + nv * {_SOFT_Q}')} AS l_tot
    FROM (SELECT CAST(SUM(u) AS BIGINT) AS tot,
                 CAST(COUNT(*) AS BIGINT) AS nv FROM uvx_{tag})
), scv_{tag} AS MATERIALIZED (
    SELECT piece,
           {log2fix_sql(f'u + {_SOFT_Q}')} - (SELECT l_tot FROM sct_{tag})
               AS sc
    FROM uvx_{tag}
), acl_{tag} AS MATERIALIZED (
    SELECT ps.pt,
           list_sort(list({{'i': ps.i, 'j': ps.j, 'sc': s.sc}})) AS cands
    FROM psubs ps
    JOIN {prev} vv ON vv.piece = ps.pt AND length(vv.piece) >= 2
    JOIN scv_{tag} s ON s.piece = ps.sub
    GROUP BY ps.pt
), adp_{tag} AS (
    SELECT pt, 0 AS pos, [CAST(0 AS BIGINT)] AS dl FROM acl_{tag}
    UNION ALL
    SELECT a.pt, a.pos + 1,
           a.dl || [(
             list_reduce(
               list_prepend(CAST({NEG_INF} AS BIGINT),
                 list_transform(
                   list_filter(c.cands, x -> x.i = a.pos + 1),
                   x -> CASE WHEN a.dl[x.j + 1] > CAST({NEG_INF} AS BIGINT)
                             THEN a.dl[x.j + 1] + x.sc
                             ELSE CAST({NEG_INF} AS BIGINT) END)),
               (s2, x) -> greatest(s2, x))
           )]
    FROM adp_{tag} a JOIN acl_{tag} c USING (pt)
    WHERE a.pos < length(a.pt)
), alt_{tag} AS (
    SELECT pt AS piece, dl[length(pt) + 1] AS alt
    FROM adp_{tag} WHERE pos = length(pt)
), dly_{tag} AS MATERIALIZED (
    SELECT u.piece, CAST(u.u * (s.sc - a.alt) AS BIGINT) AS delta
    FROM uvx_{tag} u
    JOIN scv_{tag} s USING (piece)
    JOIN alt_{tag} a USING (piece)
), keepn_{tag} AS (
    SELECT CAST((COUNT(*) * {UNI_SOFT_SHRINK_NUM})
                // {UNI_SOFT_SHRINK_DEN} AS BIGINT) AS kn
    FROM dly_{tag}
), pkept_{tag} AS MATERIALIZED (
    SELECT piece FROM (
        SELECT piece,
               ROW_NUMBER() OVER (ORDER BY delta DESC, piece ASC) AS rn
        FROM dly_{tag}
    ) WHERE rn <= (SELECT kn FROM keepn_{tag})
), pcur_{r} AS MATERIALIZED (
    SELECT u.piece, u.u FROM uvx_{tag} u
    WHERE length(u.piece) = 1
       OR u.piece IN (SELECT piece FROM pkept_{tag})
), cnt_{tag} AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS c FROM pkept_{tag}
)""")
    # the stopped round: first r >= 2 whose post-prune multi count hits
    # the target, else max_rounds (the eager loop's exact rule)
    cases = " ".join(
        f"WHEN (SELECT c FROM cnt_q{r}) <= {int(target_multi)} THEN {r}"
        for r in range(2, int(max_rounds) + 1)
    )
    sel_branches = " UNION ALL ".join(
        f"SELECT piece, u FROM pcur_{r} WHERE (SELECT nr FROM nrx) = {r}"
        for r in range(2, int(max_rounds) + 1)
    )
    ll_case = " ".join(
        f"WHEN (SELECT nr FROM nrx) = {r} THEN (SELECT v FROM ll_q{r})"
        for r in range(2, int(max_rounds) + 1)
    )
    parts.append(f"""
, nrx AS (
    SELECT CASE {cases} ELSE {int(max_rounds)} END AS nr
), sel AS MATERIALIZED (
    {sel_branches}
), selt AS (
    SELECT {log2fix_sql(f'tot + nv * {_SOFT_Q}')} AS l_tot
    FROM (SELECT CAST(SUM(u) AS BIGINT) AS tot,
                 CAST(COUNT(*) AS BIGINT) AS nv FROM sel)
)
SELECT piece,
       CAST(length(piece) AS INT) AS piece_len,
       u AS u_soft,
       {log2fix_sql(f'u + {_SOFT_Q}')} - (SELECT l_tot FROM selt) AS score,
       CAST((SELECT nr FROM nrx) AS INT) AS n_rounds,
       CAST(CASE {ll_case} END AS BIGINT) AS ll
FROM sel
""")
    return "WITH RECURSIVE " + "".join(parts)


def unigram_encode_soft_oracle_sql() -> str:
    # softv = the soft model as a (piece, sc) vocab; the shared Viterbi
    # _seg_ctes + encode tail do the rest (identical DP, identical hash)
    return f"""
WITH RECURSIVE {_soft_ctes()}
, softv AS MATERIALIZED (
    SELECT piece,
           {log2fix_sql(f'u + {_SOFT_Q}')} - (SELECT l_tot FROM ut) AS sc
    FROM uv
){_seg_ctes('softv', 's')}{_encode_tail_sql('seg_s', 'documents')}
"""
