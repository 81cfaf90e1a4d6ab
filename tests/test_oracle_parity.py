"""Differential tests: every queries() entry vs its DuckDB oracle at sf0.001
— a local replica of the driver's correctness gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from apmbackend_spark.testing import compare_query
from tests.conftest import SF_SMOKE

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    ok, msg = compare_query(spark, SF_SMOKE, QUERIES[name], ORACLES.get(name))
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_props_rollup_oracle_survives_hostile_json(spark, tmpdir):
    """The rollup advertises malformed-JSON accounting; the oracle must
    DEGRADE (k NULL, counted as unparsed) on such rows exactly like
    Spark's strict from_json — not abort, not coerce quoted numbers."""
    import duckdb

    from apmbackend_spark.operators.semistruct import (
        PROPS_ROLLUP_ORACLE,
        props_rollup,
    )

    rows = [
        ("a", '{"k": 3}'),
        ("a", "not json"),
        ("a", '{"k": "abc"}'),
        ("a", '{"k": "7"}'),   # quoted number: Spark from_json -> NULL
        ("a", '{"k": 5.7}'),   # non-integer: Spark from_json -> NULL
        ("b", '{"j": 1}'),
        ("b", None),
    ]
    sdf = spark.createDataFrame(rows, "event_type string, props string")
    got = {
        r["event_type"]: (r["n"], r["sum_k"], r["n_distinct_k"], r["n_unparsed"])
        for r in props_rollup(sdf).collect()
    }

    pq = f"{tmpdir}/events.parquet"
    sdf.toPandas().to_parquet(pq)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{pq}')")
    want = {
        r[0]: tuple(r[1:]) for r in con.sql(PROPS_ROLLUP_ORACLE).fetchall()
    }
    assert got == want
    assert got["a"] == (5, 3, 1, 4)  # only the JSON-integer k parses


def _hostile_docs_compare(spark, tmpdir, rows, spark_fn, oracle_sql_str, key_cols):
    """Differential check on a CUSTOM documents table: run the Spark
    operator and its DuckDB oracle over the same hostile rows; outputs
    must agree exactly."""
    import duckdb

    sdf = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    pq = f"{tmpdir}/documents.parquet"
    sdf.toPandas().to_parquet(pq)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')")

    got_rows = spark_fn(sdf).collect()
    cols = got_rows[0].asDict().keys() if got_rows else key_cols
    got = {tuple(r[c] for c in key_cols): tuple(r[c] for c in cols) for r in got_rows}
    res = con.sql(oracle_sql_str)
    names = [d[0] for d in res.description]
    want = {}
    for row in res.fetchall():
        d = dict(zip(names, row))
        want[tuple(d[c] for c in key_cols)] = tuple(d[c] for c in cols)
    assert got == want, (
        f"engine/oracle diverge: only-engine={set(got) - set(want)}, "
        f"only-oracle={set(want) - set(got)}"
    )


HOSTILE_DOCS = [
    (1, "", "en", "src0", 0),                      # empty text
    (2, "   \t  ", "en", "src0", 6),               # whitespace only
    (3, "it's a 'quoted' line -- dashes", "en", "src1", 30),
    (4, "UPPER lower MiXeD 12345 !!!", "xx", "src1", 27),
    (5, "repeat repeat repeat repeat repeat", "en", "src2", 34),
    (6, "a", "en", "src2", 1),                     # single char
    (7, "x" * 500, "en", "src3", 500),             # one long run
    (8, "tab\tsep\tand  double  spaces", "en", "src3", 27),
]


def test_line_dedup_oracle_survives_hostile_corpus(spark, tmpdir):
    from apmbackend_spark.operators.dedup import line_dedup, line_dedup_oracle_sql

    _hostile_docs_compare(
        spark, tmpdir, HOSTILE_DOCS, line_dedup, line_dedup_oracle_sql(), ("doc_id",)
    )


def test_url_domains_oracle_survives_hostile_corpus(spark, tmpdir):
    from apmbackend_spark.operators.textstats import (
        url_domains,
        url_domains_oracle_sql,
    )

    _hostile_docs_compare(
        spark, tmpdir, HOSTILE_DOCS, url_domains, url_domains_oracle_sql(), ("domain",)
    )


def test_doc_fingerprint_oracle_survives_hostile_corpus(spark, tmpdir):
    from apmbackend_spark.operators.dedup import (
        doc_fingerprint,
        doc_fingerprint_oracle_sql,
    )

    _hostile_docs_compare(
        spark, tmpdir, HOSTILE_DOCS, doc_fingerprint,
        doc_fingerprint_oracle_sql(), ("doc_id",)
    )


def test_bpe_pair_counts_oracle_survives_hostile_corpus(spark, tmpdir):
    from apmbackend_spark.operators.textstats import (
        bpe_pair_counts,
        bpe_pair_counts_oracle_sql,
    )

    _hostile_docs_compare(
        spark, tmpdir, HOSTILE_DOCS, bpe_pair_counts,
        bpe_pair_counts_oracle_sql(), ("pair",)
    )


def test_langid_family_oracle_survives_hostile_corpus(spark, tmpdir):
    from apmbackend_spark.operators.langid import (
        doc_keywords,
        doc_keywords_oracle_sql,
        domain_stats,
        domain_stats_oracle_sql,
        lang_id,
        lang_id_oracle_sql,
    )

    _hostile_docs_compare(
        spark, tmpdir, HOSTILE_DOCS, lang_id, lang_id_oracle_sql(), ("doc_id",)
    )
    _hostile_docs_compare(
        spark, tmpdir, HOSTILE_DOCS, doc_keywords, doc_keywords_oracle_sql(),
        ("doc_id", "term"),
    )
    _hostile_docs_compare(
        spark, tmpdir, HOSTILE_DOCS, domain_stats, domain_stats_oracle_sql(),
        ("source",),
    )


def test_textstats_family_oracle_survives_hostile_corpus(spark, tmpdir):
    from apmbackend_spark.operators.textstats import (
        contamination,
        contamination_oracle_sql,
        corpus_scrub,
        corpus_scrub_oracle_sql,
        doc_stats,
        doc_stats_oracle_sql,
    )

    _hostile_docs_compare(
        spark, tmpdir, HOSTILE_DOCS, doc_stats, doc_stats_oracle_sql(), ("doc_id",)
    )
    _hostile_docs_compare(
        spark, tmpdir, HOSTILE_DOCS, corpus_scrub, corpus_scrub_oracle_sql(),
        ("doc_id",),
    )
    _hostile_docs_compare(
        spark, tmpdir, HOSTILE_DOCS, contamination, contamination_oracle_sql(),
        ("doc_id",),
    )


def test_dedup_pair_family_oracle_survives_hostile_corpus(spark, tmpdir):
    from apmbackend_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_oracle,
        ngram_jaccard_pairs,
        ngram_jaccard_oracle_sql,
        simhash,
        simhash_oracle_sql,
        doc_span_dup,
        doc_span_dup_oracle_sql,
    )

    # add exact-duplicate and near-duplicate hostile rows so the pair
    # queries emit something
    rows = HOSTILE_DOCS + [
        (9, "repeat repeat repeat repeat repeat", "en", "src2", 34),  # dup of 5
        (10, "repeat repeat repeat repeat indeed", "en", "src2", 34),  # near-dup
    ]
    _hostile_docs_compare(
        spark, tmpdir, rows, ngram_jaccard_pairs, ngram_jaccard_oracle_sql(),
        ("doc_a", "doc_b"),
    )
    _hostile_docs_compare(
        spark, tmpdir, rows, minhash_lsh_pairs, minhash_lsh_oracle(),
        ("doc_a", "doc_b"),
    )
    _hostile_docs_compare(
        spark, tmpdir, rows, simhash, simhash_oracle_sql(), ("doc_id",)
    )
    _hostile_docs_compare(
        spark, tmpdir, rows, doc_span_dup, doc_span_dup_oracle_sql(), ("doc_id",)
    )


def test_sampling_family_oracle_survives_hostile_corpus(spark, tmpdir):
    from apmbackend_spark.operators.textstats import (
        corpus_sample,
        corpus_sample_oracle_sql,
        corpus_split,
        corpus_split_oracle_sql,
        vocab_topk,
        vocab_topk_oracle_sql,
        doc_repetition,
        doc_repetition_oracle_sql,
    )

    _hostile_docs_compare(
        spark, tmpdir, HOSTILE_DOCS, corpus_sample, corpus_sample_oracle_sql(),
        ("doc_id",),
    )
    _hostile_docs_compare(
        spark, tmpdir, HOSTILE_DOCS, corpus_split, corpus_split_oracle_sql(),
        ("doc_id",),
    )
    _hostile_docs_compare(
        spark, tmpdir, HOSTILE_DOCS, vocab_topk, vocab_topk_oracle_sql(),
        ("ngram",),
    )
    _hostile_docs_compare(
        spark, tmpdir, HOSTILE_DOCS, doc_repetition, doc_repetition_oracle_sql(),
        ("doc_id",),
    )


def test_apm_family_oracle_survives_hostile_events(spark, tmp_path):
    """APM-family differential check on an ADVERSARIAL events table:
    timestamp ties (ordering ambiguity), negative user_id (cross-engine %
    sign), zero / fractional-rounding / large `value`s, duplicate
    event_ids, empty event_type, and the NULL-acct / NULL-startts mod
    branches all hit at once. Engine and DuckDB oracle must agree exactly
    on every batch APM gate (the contract keeps ts NOT NULL, so that is
    not exercised)."""
    import datetime
    import os

    import pandas as pd

    from tests.conftest import SF_SMOKE

    d = tmp_path / "hostile_sf"
    d.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem documents embeddings"
    ).split():
        os.symlink(f"{SF_SMOKE}/{t}.parquet", d / f"{t}.parquet")

    base = datetime.datetime(2024, 1, 5, 12, 0, 0)
    ms = lambda s: base + datetime.timedelta(seconds=s)  # noqa: E731
    rows = []
    # five events at the IDENTICAL timestamp, mixed keys (tie ordering)
    for i in range(5):
        rows.append((i, ms(0), i, "click", 1.5 + i, "{}"))
    # duplicate event_id (at-least-once delivery), different ts
    rows.append((3, ms(10), 3, "click", 2.0, "{}"))
    # negative user_id: % sign semantics must match across engines
    rows.append((20, ms(20), -7, "view", 3.25, "{}"))
    rows.append((21, ms(21), -8, "purchase", 0.0, "{}"))  # zero elapsed
    # event_id % 20 == 0 -> NULL startts branch; % 7 == 0 -> NULL acct
    rows.append((40, ms(30), 2, "signup", 199.994999, "{}"))  # rounding edge
    rows.append((49, ms(31), 3, "error", 10.5, None))  # NULL props
    rows.append((50, ms(32), 4, "", 7.0, "not json"))  # empty event_type
    # a dense run for window/session structure
    for i in range(60, 90):
        rows.append((i, ms(40 + (i - 60) * 7), i % 5, "api", 1.0 + (i % 13) * 0.25, "{}"))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf.to_parquet(d / "events.parquet")

    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    from apmbackend_spark.testing import compare_query

    for name in (
        "tx_normalize",
        "log_extract",
        "sessionize",
        "service_rollup",
        "service_cube",
        "apdex",
        "top_services",
        "account_coverage",
        "correlate",
        "acct_enrich",
        "ordered_release",
        "jmx_rollup",
        "window_stats",
        "daily_slice_rollup",
    ):
        ok, msg = compare_query(spark, str(d), qs[name], os_[name])
        assert ok, f"{name}: {msg}"


def test_zscore_family_oracle_survives_hostile_events(spark, tmp_path):
    """Dense-grid z-score / alert chain on the adversarial events table
    (ties, zero elapsed, negative keys): the grid is span-bound, so the
    recursive oracles stay small here."""
    import datetime
    import os

    import pandas as pd

    from tests.conftest import SF_SMOKE

    d = tmp_path / "hostile_sf_z"
    d.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem documents embeddings"
    ).split():
        os.symlink(f"{SF_SMOKE}/{t}.parquet", d / f"{t}.parquet")

    base = datetime.datetime(2024, 1, 5, 12, 0, 0)
    rows = []
    # two keys, 90 minutes of 30 s cadence with ties and a step change
    for i in range(180):
        t = base + datetime.timedelta(seconds=30 * i)
        v = 1.0 if i < 150 else 50.0
        rows.append((i, t, i % 2, "api", v, "{}"))
        if i % 17 == 0:  # tie at the same timestamp, same key
            rows.append((1000 + i, t, i % 2, "api", v + 0.25, "{}"))
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    pdf.to_parquet(d / "events.parquet")

    import __spark_entry__ as entry

    qs, os_ = entry.queries(), entry.oracle_sql()
    from apmbackend_spark.testing import compare_query

    for name in (
        "st_zerofill_dense",
        "zscore",
        "zscore_override",
        "alert_candidates",
        "zscore_recursive",
        "alerts",
    ):
        ok, msg = compare_query(spark, str(d), qs[name], os_[name])
        assert ok, f"{name}: {msg}"


def test_packing_family_oracle_survives_hostile_corpus(spark, tmpdir):
    from apmbackend_spark.operators.packing import (
        corpus_shuffle,
        corpus_shuffle_oracle_sql,
        doc_chunks,
        doc_chunks_oracle_sql,
        token_pack,
        token_pack_oracle_sql,
        token_spans,
        token_spans_oracle_sql,
    )

    _hostile_docs_compare(
        spark, tmpdir, HOSTILE_DOCS, token_pack, token_pack_oracle_sql(),
        ("doc_id",),
    )
    _hostile_docs_compare(
        spark, tmpdir, HOSTILE_DOCS, token_spans, token_spans_oracle_sql(),
        ("doc_id", "span_idx") if "span_idx" in token_spans_oracle_sql() else ("doc_id",),
    )
    _hostile_docs_compare(
        spark, tmpdir, HOSTILE_DOCS, doc_chunks, doc_chunks_oracle_sql(),
        ("doc_id", "chunk_idx") if "chunk_idx" in doc_chunks_oracle_sql() else ("doc_id",),
    )
    _hostile_docs_compare(
        spark, tmpdir, HOSTILE_DOCS, corpus_shuffle, corpus_shuffle_oracle_sql(),
        ("doc_id",),
    )


def _hostile_embs_compare(spark, tmpdir, rows, spark_fn, oracle_sql_str, key_cols):
    import duckdb

    sdf = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    pq = f"{tmpdir}/embeddings.parquet"
    sdf.toPandas().to_parquet(pq)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{pq}')")
    got_rows = spark_fn(sdf).collect()
    cols = got_rows[0].asDict().keys() if got_rows else key_cols
    got = {tuple(r[c] for c in key_cols): tuple(r[c] for c in cols) for r in got_rows}
    res = con.sql(oracle_sql_str)
    names = [d[0] for d in res.description]
    want = {}
    for row in res.fetchall():
        d = dict(zip(names, row))
        want[tuple(d[c] for c in key_cols)] = tuple(d[c] for c in cols)
    assert got == want, (
        f"diverge: only-engine={set(got) - set(want)}, only-oracle={set(want) - set(got)}"
    )


def test_quantize_oracle_survives_hostile_embeddings(spark, tmpdir):
    """int8 quantization on adversarial vectors: the all-zero vector
    (max|x| = 0 — division guard), a constant vector, huge/tiny
    magnitudes, and sign flips."""
    from apmbackend_spark.operators.similarity import (
        embed_quantize,
        embed_quantize_oracle_sql,
    )

    dim = 8
    rows = [
        (1, [0.0] * dim, 0),                       # zero vector
        (2, [1.0] * dim, 0),                       # constant
        (3, [1e30] + [0.0] * (dim - 1), 1),        # huge spike
        (4, [1e-30] * dim, 1),                     # tiny magnitudes
        (5, [(-1.0) ** i * (i + 1) for i in range(dim)], 2),  # sign flips
    ]
    _hostile_embs_compare(
        spark, tmpdir, rows, embed_quantize, embed_quantize_oracle_sql(),
        ("vec_id",),
    )


def test_charlm_and_pii_oracle_survive_hostile_corpus(spark, tmpdir):
    from apmbackend_spark.operators.langid import (
        charlm_score,
        charlm_score_oracle_sql,
    )
    from apmbackend_spark.operators.textstats import (
        pii_scrub,
        pii_scrub_oracle_sql,
    )

    # regex-adversarial rows on top of the standard hostile set: Java
    # (Spark) and RE2 (DuckDB) must agree on every boundary case — partial
    # emails, 5-octet runs (where \b anchors differently than a human
    # would guess), over-long phone shapes, PII already present in text
    rows = HOSTILE_DOCS + [
        (11, "not@an email@ @nope trailing@dot.", "en", "src4", 33),
        (12, "five octets 1.2.3.4.5 and 10.0.0.1 real", "en", "src4", 39),
        (13, "phone 123-456-78901 too long, 12-345-6789 short", "en", "src4", 48),
        (14, "already here: b@c.io and 255.255.255.255 x", "en", "src4", 43),
        (15, "dots..everywhere..a@b..c..de 1...2", "en", "src4", 34),
    ]
    _hostile_docs_compare(
        spark, tmpdir, rows, charlm_score, charlm_score_oracle_sql(), ("doc_id",)
    )
    _hostile_docs_compare(
        spark, tmpdir, rows, pii_scrub, pii_scrub_oracle_sql(), ("doc_id",)
    )
