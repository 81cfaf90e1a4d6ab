"""DSIR importance selection: fixed-point log2 exactness, a literal Python
replay of the full operator, directionality, and plan hygiene."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

L2_FRAC = 16
L2_SCALE = 1 << L2_FRAC
_T61 = 1 << 61


def _l2fix_py(x: int) -> int:
    e = x.bit_length() - 1
    m = (x << (30 - e)) if e <= 30 else (x >> (e - 30))
    acc = 0
    for _ in range(L2_FRAC):
        m2 = m * m
        if m2 >= _T61:
            acc = acc * 2 + 1
            m = m2 >> 31
        else:
            acc = acc * 2
            m = m2 >> 30
    return e * L2_SCALE + acc


def test_log2fix_spark_and_duckdb_match_python_bit_for_bit(spark):
    import duckdb

    from apmbackend_spark.operators.selection import _with_log2fix, log2fix_sql

    xs = (
        [1, 2, 3, 5, 7, 9, 100, 511, 512, 513, 65535, 65536, 65537]
        + [10**6, 10**9, 10**12, (1 << 40) + 12345, (1 << 52) + 987654321]
    )
    want = {x: _l2fix_py(x) for x in xs}
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    got_spark = {
        r["x"]: r["lx"] for r in _with_log2fix(df, "x", "lx").collect()
    }
    assert got_spark == want
    con = duckdb.connect()
    vals = ", ".join(f"({x})" for x in xs)
    got_duck = dict(
        con.sql(
            f"SELECT x, {log2fix_sql('x')} AS lx FROM (VALUES {vals}) t(x)"
        ).fetchall()
    )
    assert got_duck == want
    # truncation bound: within 4 fixed-point ulps BELOW exact log2
    for x, lx in want.items():
        exact = math.log2(x) * L2_SCALE
        assert 0 <= exact - lx < 4, (x, lx, exact)


def _dsir_reference(docs, buckets, target_lang):
    """Literal DSIR replay with the repo hash64 (md5 60-bit)."""
    import hashlib
    import re

    def h64(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def grams(text):
        t = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    db = {}  # (doc_id, bucket) -> c ; lang per doc
    lang = {}
    for did, lg, text in docs:
        lang[did] = lg
        for g in grams(text):
            b = h64(g) % buckets
            db[(did, b)] = db.get((did, b), 0) + 1
    cr, ct = {}, {}
    for (did, b), c in db.items():
        cr[b] = cr.get(b, 0) + c
        if lang[did] == target_lang:
            ct[b] = ct.get(b, 0) + c
    nr = sum(cr.values())
    nt = sum(ct.values())
    w = {
        b: _l2fix_py(ct.get(b, 0) + 1)
        - _l2fix_py(nt + buckets)
        - _l2fix_py(cr[b] + 1)
        + _l2fix_py(nr + buckets)
        for b in cr
    }
    out = {}
    for did, lg, _ in docs:
        feats = [(b, c) for (d, b), c in db.items() if d == did]
        n = sum(c for _, c in feats)
        s = sum(c * w[b] for b, c in feats)
        out[did] = (lg, n, s, s > 0)
    return out


def test_dsir_select_matches_python_reference(spark):
    from apmbackend_spark.operators.selection import dsir_select

    docs = [
        (0, "en", "the cat sat on the mat and the dog barked"),
        (1, "en", "a quick brown fox jumps over the lazy dog"),
        (2, "en", "the cat and the dog are friends"),
        (3, "fr", "le chat est sur le tapis et le chien aboie"),
        (4, "fr", "un renard brun rapide saute par dessus le chien"),
        (5, "de", "die katze sitzt auf der matte und der hund bellt"),
        (6, "en", ""),  # zero-token doc
    ]
    df = spark.createDataFrame(
        [(d, t, lg, "srcX", len(t)) for d, lg, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    want = _dsir_reference(docs, buckets=64, target_lang="en")
    got = {
        r["doc_id"]: (r["lang"], r["n_feats"], r["dsir_score"], r["selected"])
        for r in dsir_select(df, buckets=64).collect()
    }
    assert got == want
    # directionality: in-target docs score positive, out-of-target negative
    assert all(got[d][3] for d in (0, 1, 2))
    assert not any(got[d][3] for d in (3, 4, 5, 6))
    assert got[6] == ("en", 0, 0, False)


def test_dsir_select_plan_broadcast_model_no_python(spark):
    from apmbackend_spark.operators.selection import dsir_select
    from apmbackend_spark.sources.loaders import load_table
    from tests.conftest import SF_SMOKE

    df = dsir_select(load_table(spark, SF_SMOKE, "documents"))
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # weight table and totals ride broadcasts; per-doc agg is combinable
    assert p.count("BroadcastExchange") >= 2
    assert "partial_sum" in p


def test_log2fix_fuzz_duckdb_vs_python():
    # three-way exactness on arbitrary int64-range inputs: DuckDB's
    # list_reduce rendering replays the Python fold bit-for-bit, and the
    # truncation error stays below 4 fixed-point ulps (the monotone-enough
    # bound the DSIR weights rely on)
    import duckdb

    from apmbackend_spark.operators.selection import log2fix_sql
    from hypothesis import given, settings
    from hypothesis import strategies as st

    con = duckdb.connect()

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=1, max_value=(1 << 62) - 1))
    def run(x):
        got = con.sql(f"SELECT {log2fix_sql(str(x))}").fetchone()[0]
        want = _l2fix_py(x)
        assert got == want, x
        exact = math.log2(x) * L2_SCALE
        assert 0 <= exact - got < 4, (x, got, exact)

    run()


def _es_reference(weights_by_doc):
    """Literal Efraimidis-Spirakis replay with the fixed-point log2 key."""
    import hashlib

    def h64(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    out = []
    for doc_id, w in weights_by_doc.items():
        lh = _l2fix_py(h64(f"ws:{doc_id}") + 1)
        skey = float(lh - 60 * L2_SCALE) / float(w)
        out.append((skey, doc_id, w))
    out.sort(key=lambda t: (-t[0], t[1]))
    return out


def test_weighted_sample_matches_python_reference_with_custom_weights(spark):
    from apmbackend_spark.operators.selection import weighted_sample

    weights = {i: (1 if i % 3 else 50) for i in range(200)}
    docs = spark.createDataFrame(
        [(i, "x", "en", "s", 1) for i in weights],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    wdf = spark.createDataFrame(
        [(d, w) for d, w in weights.items()], "doc_id long, w long"
    )
    got = [
        (r["rank"], r["doc_id"], r["weight"], r["skey"])
        for r in weighted_sample(docs, m=40, weights=wdf)
        .orderBy("rank")
        .collect()
    ]
    want = [
        (i + 1, d, w, skey)
        for i, (skey, d, w) in enumerate(_es_reference(weights)[:40])
    ]
    assert got == want
    # inclusion tracks weight: the 50x-weighted third of docs should hold
    # a clear majority of the 40 slots (expected ~94%)
    heavy = sum(1 for _, d, w, _ in got if w == 50)
    assert heavy >= 30, heavy


def test_weighted_sample_uniform_weights_is_pure_hash_order(spark):
    from apmbackend_spark.operators.selection import weighted_sample

    docs = spark.createDataFrame(
        [(i, "x", "en", "s", 1) for i in range(100)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    wdf = spark.createDataFrame([(i, 7) for i in range(100)], "doc_id long, w long")
    got = [r["doc_id"] for r in weighted_sample(docs, m=10, weights=wdf).orderBy("rank").collect()]
    want = [d for _, d, _ in _es_reference({i: 7 for i in range(100)})[:10]]
    assert got == want


def _nb_reference(doc_rows):
    """Pure-Python multinomial NB with the identical fixed-point log2 —
    independent of both engines' SQL renderings."""
    import re
    from collections import Counter

    stop = {"the", "be", "to", "of", "and", "that", "have", "with"}

    def toks(text):
        return [w for w in re.split(r"[^0-9a-zA-Z]+", (text or "").lower()) if w]

    labeled = {}
    for doc_id, text in doc_rows:
        t = toks(text)
        hits = sum(1 for w in t if w in stop)
        bag = t + [f"#len{len(t) // 10}"]
        labeled[doc_id] = (t, bag, 1 if len(t) >= 50 and hits >= 2 else 0)
    cnt = {0: Counter(), 1: Counter()}
    n = {0: 0, 1: 0}
    for doc_id, (t, bag, lbl) in labeled.items():
        if doc_id % 5 != 0:
            cnt[lbl].update(bag)
            n[lbl] += 1
    vocab = set(cnt[0]) | set(cnt[1])
    v = len(vocab)
    t1, t0 = sum(cnt[1].values()), sum(cnt[0].values())
    den1, den0 = _l2fix_py(t1 + v), _l2fix_py(t0 + v)
    prior1 = _l2fix_py(n[1]) - _l2fix_py(n[1] + n[0])
    prior0 = _l2fix_py(n[0]) - _l2fix_py(n[1] + n[0])
    out = {}
    for doc_id, (t, bag, lbl) in labeled.items():
        if doc_id % 5 != 0:
            continue
        s1, s0 = prior1, prior0
        for w, c in Counter(bag).items():
            if w in vocab:
                s1 += c * (_l2fix_py(cnt[1][w] + 1) - den1)
                s0 += c * (_l2fix_py(cnt[0][w] + 1) - den0)
            else:
                s1 += c * -den1
                s0 += c * -den0
        pred = 1 if s1 > s0 else 0
        out[doc_id] = (len(t), lbl, s1, s0, pred, 1 if pred == lbl else 0)
    return out


def test_nb_quality_matches_python_reference(spark):
    from apmbackend_spark.operators.selection import nb_quality

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = [(r["doc_id"], r["text"]) for r in df.select("doc_id", "text").collect()]
    want = _nb_reference(rows)
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["label"], r["score_pass"], r["score_fail"],
            r["pred"], r["correct"],
        )
        for r in nb_quality(df).collect()
    }
    assert got == want  # scores + argmax + accuracy BIT-exact


def test_nb_quality_learns_the_teacher(spark):
    # the student must beat the majority-class baseline on the held-out
    # split — i.e. the word likelihoods genuinely carry the signal
    from apmbackend_spark.operators.selection import nb_quality

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = nb_quality(df).collect()
    acc = sum(r["correct"] for r in rows) / len(rows)
    maj = max(
        sum(1 for r in rows if r["label"] == 1),
        sum(1 for r in rows if r["label"] == 0),
    ) / len(rows)
    assert acc > maj
    assert acc >= 0.8  # and is genuinely predictive, not barely above
