"""Semantic unit tests for corpus_prepare (composition contracts) and
log_extract (codegen extraction round-trip)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


GOOD = (
    "the quick brown fox jumps over the lazy dog and then walks back home "
    "because it forgot the keys to the barn near the river bank yesterday "
    "while the sun was setting slowly behind the old wooden fence outside"
)


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "doc_id": i,
                    "text": t,
                    "lang": "en",
                    "source": "unit",
                    "n_chars": len(t),
                }
                for i, t in rows
            ]
        )
    )


def test_corpus_prepare_keeps_min_surviving_representative(spark):
    from apmbackend_spark.operators.prepare import corpus_prepare

    # docs 5 and 9 are exact near-dups (one cluster); 7 is a distinct
    # singleton; 3 fails the quality filter (too short).
    docs = _docs(
        spark,
        [
            (3, "too short"),
            (5, GOOD),
            (
                7,
                "a completely different story about mountain trails where "
                "hikers carry heavy packs through winding paths toward the "
                "summit and watch eagles circle high above granite cliffs "
                "while cold wind pushes clouds across the open valley below",
            ),
            (9, GOOD),
        ],
    )
    out = corpus_prepare(docs).collect()
    kept = sorted(r["doc_id"] for r in out)
    # 3 filtered, 9 deduped into 5's cluster, 5 and 7 survive
    assert kept == [5, 7]
    by_id = {r["doc_id"]: r for r in out}
    # packing addresses: doc_id order, cumulative token offsets
    assert by_id[5]["start_offset"] == 0
    assert by_id[7]["start_offset"] == by_id[5]["n_tokens"]
    assert all(r["seq_id"] == r["start_offset"] // 2048 for r in out)


def test_corpus_prepare_rep_can_be_non_minimum_when_min_filtered(spark):
    from apmbackend_spark.operators.prepare import corpus_prepare
    from apmbackend_spark.operators.textstats import corpus_filter

    # doc 2 and doc 8: one near-dup cluster where the MIN member (2) fails
    # the filter (punctuation flood appended) but shares enough shingles
    # with 8 to band together; the kept representative must then be 8.
    noisy = GOOD + " !!! ??? ;;; ::: ,,, ... !!! ??? ;;; ::: ,,, ... !!! ???" * 6
    docs = _docs(spark, [(2, noisy), (8, GOOD)])

    filt = {r["doc_id"]: r["keep"] for r in corpus_filter(docs).collect()}
    out = sorted(r["doc_id"] for r in corpus_prepare(docs).collect())
    if not filt[2]:
        # min member filtered: its surviving near-dup (or distinct doc) stays
        assert out == [8]
    else:  # pragma: no cover - fixture drift guard
        assert out == [2]


def test_token_pack_counts_fastpath_identical(spark):
    from apmbackend_spark.operators.packing import token_pack
    from apmbackend_spark.operators.textstats import doc_stats
    from apmbackend_spark.sources.loaders import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    base = {r["doc_id"]: r for r in token_pack(docs).collect()}
    counts = doc_stats(docs).select("doc_id", "n_tokens")
    fast = {r["doc_id"]: r for r in token_pack(docs, counts=counts).collect()}
    assert len(base) == len(fast) > 0
    for i, b in base.items():
        f = fast[i]
        assert (b["n_tokens"], b["start_offset"], b["seq_id"]) == (
            f["n_tokens"], f["start_offset"], f["seq_id"],
        )


def test_log_extract_round_trip(spark):
    from apmbackend_spark.sources.logparse import log_extract
    from apmbackend_spark.sources.tx import load_tx

    tx = load_tx(spark, SF_SMOKE)
    got = {r["logid"]: r for r in log_extract(tx).collect()}
    src = {r["logid"]: r for r in tx.collect()}
    assert len(got) == len(src) > 0
    for logid, s in src.items():
        g = got[logid]
        assert g["server"] == s["server"]
        assert g["endts"] == s["endts"]  # U5 ms-precision round trip
        assert g["elapsed"] == s["elapsed"]
        # U9: fabricated non-numeric acct tokens must be rejected to NULL
        assert g["acctnum"] == s["acctnum"]
        # P5: toplevel services surface in normalized Provider:x spelling
        if s["service"].startswith("S:"):
            assert g["service"] == "Provider:" + s["service"][2:]
        else:
            assert g["service"] == s["service"]
