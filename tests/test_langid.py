"""Unit tests for the language-ID / keywords / domain-stats tier
(operators/langid.py). Cross-engine parity is covered by
test_oracle_parity.py; these pin the edge semantics."""

from __future__ import annotations

from apmbackend_spark.operators.langid import (
    LANG_PROFILES,
    doc_keywords,
    domain_stats,
    lang_id,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, src) for i, (t, lang, src) in enumerate(rows)],
        "doc_id long, text string, lang string, source string",
    )


def test_lang_id_scores_profile_trigrams(spark):
    df = _docs(
        spark,
        [
            ("the thing and the other thing", "en", "s"),
            ("der und die ein ich schlecht", "de", "s"),
        ],
    )
    got = {r["doc_id"]: r for r in lang_id(df).collect()}
    assert got[0]["lang_pred"] == "en"
    assert got[1]["lang_pred"] == "de"
    assert got[0]["score"] > 0 and got[1]["score"] > 0
    assert got[0]["n_trigrams"] == len("the thing and the other thing") - 2


def test_lang_id_short_and_empty_doc_ties_break_to_first_lang(spark):
    # <3 chars -> no trigrams -> all scores 0 -> smallest lang wins
    df = _docs(spark, [("xy", "en", "s"), ("", "en", "s")])
    first = sorted(LANG_PROFILES)[0]
    for r in lang_id(df).collect():
        assert r["lang_pred"] == first
        assert r["score"] == 0
        assert r["n_trigrams"] == 0


def test_lang_id_is_case_insensitive(spark):
    df = _docs(spark, [("THE THING AND THE OTHER", "en", "s")])
    assert lang_id(df).collect()[0]["lang_pred"] == "en"


def test_doc_keywords_ranks_rare_terms_above_common(spark):
    # 'zebra' appears once in one doc (df=1); 'common' is in every doc
    # (df=3, idf factor 1) — zebra must outrank common despite equal tf.
    df = _docs(
        spark,
        [
            ("common zebra", "en", "s"),
            ("common other", "en", "s"),
            ("common words here", "en", "s"),
        ],
    )
    rows = doc_keywords(df, k=5).collect()
    d0 = {r["term"]: r for r in rows if r["doc_id"] == 0}
    assert d0["zebra"]["rank"] < d0["common"]["rank"]
    assert d0["zebra"]["df"] == 1 and d0["common"]["df"] == 3
    assert d0["zebra"]["score"] == 3.0  # tf 1 * (3 docs / df 1)
    assert d0["common"]["score"] == 1.0


def test_doc_keywords_tiebreak_is_lexicographic(spark):
    df = _docs(spark, [("b a c", "en", "s")])
    rows = sorted(doc_keywords(df, k=3).collect(), key=lambda r: r["rank"])
    assert [r["term"] for r in rows] == ["a", "b", "c"]


def test_domain_stats_counts_and_dup_rate(spark):
    df = _docs(
        spark,
        [
            ("one two three", "en", "src_a"),
            ("one two three", "en", "src_a"),  # exact dup
            ("four five", "en", "src_a"),
            ("solo doc", "en", "src_b"),
        ],
    )
    got = {r["source"]: r for r in domain_stats(df).collect()}
    a = got["src_a"]
    assert a["n_docs"] == 3
    assert a["total_tokens"] == 8
    assert a["n_unique"] == 2
    assert a["dup_rate"] == 1.0 / 3.0
    assert a["p50_tokens"] == 3.0  # sorted [2,3,3], midpoint rule
    b = got["src_b"]
    assert b["n_docs"] == 1 and b["dup_rate"] == 0.0


def test_corpus_mixture_budget_and_cap(spark):
    from apmbackend_spark.operators.prepare import corpus_mixture

    # big: 8 docs x 10 tokens = 80; rare: 2 docs x 10 = 20. total=100.
    # weights rare=9, big=1; frac=1/2 -> budget=50; rare budget=45 > 20
    # so rare rate caps at 1.0 (all kept); big rate = 5/80 = 0.0625.
    rows = [(i, "ten words " * 5, "en", "big") for i in range(8)]
    rows += [(100 + i, "ten words " * 5, "en", "rare") for i in range(2)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = corpus_mixture(df, weights={"rare": 9}, default_weight=1, frac=(1, 2))
    got = out.collect()
    rare = [r for r in got if r["source"] == "rare"]
    big = [r for r in got if r["source"] == "big"]
    assert len(rare) == 2  # rate 1.0 keeps everything
    assert all(r["rate"] == 1.0 for r in rare)
    assert all(r["rate"] == 0.0625 for r in big)
    # acceptance is the doc_id-hash threshold: recompute it exactly
    import hashlib

    def h(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 1_000_000

    expect_big = {i for i in range(8) if h(i) < 0.0625 * 1_000_000}
    assert {r["doc_id"] for r in big} == expect_big


def test_doc_chunks_boundaries(spark):
    from apmbackend_spark.operators.packing import doc_chunks

    words = " ".join(f"w{i}" for i in range(65))  # 65 tokens
    df = spark.createDataFrame(
        [(1, words, "en", "s"), (2, "short doc", "en", "s"), (3, "", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    rows = doc_chunks(df).collect()
    d1 = sorted(
        [r for r in rows if r["doc_id"] == 1], key=lambda r: r["chunk_id"]
    )
    # 65 tokens, chunk 64, step 48: starts 1 and 49 -> lens 64 and 17
    assert [(r["start_tok"], r["n_chunk_tokens"]) for r in d1] == [(1, 64), (49, 17)]
    assert [r["chunk_id"] for r in d1] == [0, 1]
    d2 = [r for r in rows if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["n_chunk_tokens"] == 2
    assert not [r for r in rows if r["doc_id"] == 3]  # empty doc: no chunks


def test_embed_quantize_range_and_zero_vector(spark):
    from apmbackend_spark.operators.similarity import embed_quantize

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r for r in embed_quantize(df).collect()}
    v = got[1]
    # scale = 127/1.0; q = [64, -127, 32] (0.5*127=63.5 rounds half-up to 64)
    assert v["scale"] == 127.0
    assert (v["min_q"], v["max_q"]) == (-127, 64)
    assert v["sum_q"] == 64 - 127 + 32
    assert v["sumsq_q"] == 64**2 + 127**2 + 32**2
    assert v["recon_err"] <= 0.5 / 127.0
    z = got[2]
    assert (z["scale"], z["sum_q"], z["recon_err"]) == (0.0, 0, 0.0)


def test_ccnet_buckets_sketch_agreement_and_consistency(spark):
    # the sub-octave sketch's bucket agreement vs the exact path stays
    # above the measured floor (0.96 at both fixtures; 64 sub-bins per
    # octave bound relative threshold error at 1/64), and the report's
    # internal accounting is consistent
    from apmbackend_spark.operators.langid import (
        ccnet_buckets,
        ccnet_buckets_sketch,
    )
    from apmbackend_spark.sources.loaders import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    rows = ccnet_buckets_sketch(docs).collect()
    exact = ccnet_buckets(docs).collect()
    tot = sum(r["n_docs"] for r in rows)
    agree = sum(r["n_agree"] for r in rows)
    assert tot == docs.count()
    assert agree / tot >= 0.96
    # the exact-side counts must equal ccnet_buckets' own bucketing
    from collections import Counter

    want = Counter((r["lang"], r["bucket"]) for r in exact)
    for r in rows:
        for b in ("head", "middle", "tail"):
            assert r[f"exact_{b}"] == want.get((r["lang"], b), 0), (r["lang"], b)
        assert (
            r["sketch_head"] + r["sketch_middle"] + r["sketch_tail"]
            == r["n_docs"]
        )
        assert r["n_agree"] <= r["n_docs"]
