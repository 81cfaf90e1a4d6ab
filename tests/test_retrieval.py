"""BM25 retrieval + edit-distance near-dup verify.

Semantics are tested against independent pure-Python references (the DuckDB
oracle is graded separately by scripts/check_oracle.py); plan assertions pin
the scale claims (no cartesian candidate generation, broadcast dims)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apmbackend_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    BM25_QUERIES,
    _query_terms,
    bm25_topk,
)
from apmbackend_spark.operators.dedup import (
    EDIT_PREFIX_CAP,
    EDIT_SIM_THRESHOLD,
    edit_neardup,
    minhash_lsh_pairs,
)


@pytest.fixture(autouse=True)
def _clean_cache(spark):
    spark.catalog.clearCache()
    yield


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", f"src{i % 3}", len(t)) for i, t in enumerate(texts)],
        schema="doc_id long, text string, lang string, source string,"
        " n_chars long",
    )


TEXTS = [
    "spark window agg over the fast table scan",
    "customer order join with a slow filter and merge",
    "spark spark spark window window agg agg agg agg",
    "batch stream merge merge stream batch stream",
    "totally unrelated words about nothing in particular",
    "fast scan filter slow fast scan filter slow fast scan",
    "",  # zero-token doc still counts toward N / avgdl
]


def _tokens(text):
    import re

    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _bm25_reference(texts, k=10):
    docs = {i: _tokens(t) for i, t in enumerate(texts)}
    n = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n
    all_terms = {t for _, t in _query_terms()}
    tf = {}  # (doc, term) -> count
    for d, toks in docs.items():
        for t in toks:
            if t in all_terms:
                tf[(d, t)] = tf.get((d, t), 0) + 1
    df = {}
    for (_, t), _c in tf.items():
        df[t] = df.get(t, 0) + 1
    out = {}
    for qid, qtext in BM25_QUERIES:
        scores = {}
        for d in docs:
            terms = sorted(
                t for t in set(qtext.split()) if (d, t) in tf
            )
            if not terms:
                continue
            s = 0.0
            for t in terms:  # left fold in term order — the gate contract
                idf = (n - df[t] + 0.5) / (df[t] + 0.5)
                f = tf[(d, t)]
                dl = len(docs[d])
                s = s + idf * (
                    (f * (BM25_K1 + 1.0))
                    / (f + BM25_K1 * ((1.0 - BM25_B) + BM25_B * (dl / avgdl)))
                )
            scores[d] = (s, len(terms))
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))
        out[qid] = [
            (d, n_t, s, r + 1)
            for r, (d, (s, n_t)) in enumerate(ranked[:k])
        ]
    return out


def test_bm25_matches_python_reference(spark):
    got = {
        (r["query_id"], r["doc_id"]): (r["n_terms"], r["score"], r["rank"])
        for r in bm25_topk(_docs_df(spark, TEXTS)).collect()
    }
    want = _bm25_reference(TEXTS)
    want_flat = {
        (qid, d): (n_t, s, rk)
        for qid, rows in want.items()
        for d, n_t, s, rk in rows
    }
    assert set(got) == set(want_flat)
    for key, (n_t, s, rk) in want_flat.items():
        gn, gs, gr = got[key]
        assert gn == n_t and gr == rk
        assert gs == pytest.approx(s, abs=0, rel=0) or gs == s, (
            key,
            gs,
            s,
        )  # bit-exact: same fold order, same IEEE ops


def test_bm25_zero_token_doc_counts_toward_stats(spark):
    # dropping the empty doc changes N and avgdl, hence every score
    with_empty = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_topk(_docs_df(spark, TEXTS)).collect()
    }
    without = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_topk(_docs_df(spark, TEXTS[:-1])).collect()
    }
    assert set(with_empty) == set(without)
    assert any(with_empty[k] != without[k] for k in with_empty)


def test_bm25_plan_broadcasts_dims_no_cartesian(spark):
    p = plan(bm25_topk(_docs_df(spark, TEXTS)))
    assert "CartesianProduct" not in p
    # query terms, df rollup and the corpus-stats scalar all broadcast
    assert p.count("BroadcastExchange") >= 2
    # the explode feeds from the filtered hits array, not raw tokens
    assert "hits" in p


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


NEARDUP_TEXTS = [
    # 0/1: one small edit apart — banded together AND verified
    "the quick brown fox jumps over the lazy dog again and again today",
    "the quick brown fox jumps over the lazy cat again and again today",
    # 2: shares opening shingles with 0 (may band-collide) but diverges
    # into a long different tail — candidate that the verifier rejects
    "the quick brown fox jumps over completely different material that "
    "keeps going with many other words and an unrelated long ending here",
    # 3: unrelated
    "nothing in common with anything else in this tiny corpus at all",
]


def test_edit_neardup_matches_python_reference(spark):
    docs = _docs_df(spark, NEARDUP_TEXTS)
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs).collect()
    }
    assert (0, 1) in cands  # one-word edit must band-collide
    expected = {}
    for a, b in cands:
        ta = NEARDUP_TEXTS[a][:EDIT_PREFIX_CAP]
        tb = NEARDUP_TEXTS[b][:EDIT_PREFIX_CAP]
        lev = _lev(ta, tb)
        sim = 1.0 - lev / max(len(ta), len(tb), 1)
        if sim >= EDIT_SIM_THRESHOLD:
            expected[(a, b)] = (lev, sim)
    got = {
        (r["doc_a"], r["doc_b"]): (r["lev"], r["edit_sim"])
        for r in edit_neardup(docs).collect()
    }
    assert set(got) == set(expected)
    assert (0, 1) in got
    for k, (lev, sim) in expected.items():
        assert got[k][0] == lev
        assert got[k][1] == pytest.approx(sim, rel=1e-12)


def test_edit_neardup_is_order_sensitive(spark):
    # identical multisets of words, reversed order: Jaccard-style set
    # verifiers score these 1.0; the edit verifier must not pass them
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    b = "kappa iota theta eta zeta epsilon delta gamma beta alpha"
    docs = _docs_df(spark, [a, b])
    rows = edit_neardup(docs).collect()
    ta, tb = a[:EDIT_PREFIX_CAP], b[:EDIT_PREFIX_CAP]
    sim = 1.0 - _lev(ta, tb) / max(len(ta), len(tb), 1)
    assert sim < EDIT_SIM_THRESHOLD  # the scrambled pair is NOT a near-dup
    assert rows == []  # either not banded, or banded and rejected


def test_edit_neardup_plan_no_cartesian(spark):
    p = plan(edit_neardup(_docs_df(spark, NEARDUP_TEXTS)))
    assert "CartesianProduct" not in p
    assert "levenshtein" in p


def test_hybrid_rrf_arithmetic_and_leg_consistency(spark):
    from apmbackend_spark.operators.retrieval import hybrid_rrf
    from apmbackend_spark.operators.similarity import ann_bruteforce
    from apmbackend_spark.sources.loaders import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    embs = load_table(spark, SF_SMOKE, "embeddings")
    rows = hybrid_rrf(docs, embs).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
        # the fused score is exactly the RRF formula over the leg ranks
        want = 0.0
        if r["lex_rank"] is not None:
            want += 1.0 / (60 + r["lex_rank"])
        if r["sem_rank"] is not None:
            want += 1.0 / (60 + r["sem_rank"])
        assert r["rrf"] == want
        # no self-matches through either leg
        assert r["cand_id"] != r["query_id"]
    for q, rs in by_q.items():
        assert len(rs) == 5
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == [1, 2, 3, 4, 5]
        scores = [r["rrf"] for r in sorted(rs, key=lambda x: x["rank"])]
        assert scores == sorted(scores, reverse=True)
    # the semantic leg's ranks are the bruteforce ranks verbatim
    bf = {
        (r["query_id"], r["cand_id"]): r["rank"]
        for r in ann_bruteforce(embs, k=20).collect()
    }
    for r in rows:
        if r["sem_rank"] is not None:
            assert bf[(r["query_id"], r["cand_id"])] == r["sem_rank"]
