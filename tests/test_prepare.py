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


def test_token_spans_partition_invariants(spark):
    from pyspark.sql import functions as F

    from apmbackend_spark.operators.packing import token_pack, token_spans
    from apmbackend_spark.sources.loaders import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    budget = 64  # small budget so many docs cross boundaries
    packed = {r["doc_id"]: r for r in token_pack(docs, budget).collect()}
    spans = token_spans(docs, budget).collect()

    # per doc: spans tile [0, n_tokens) exactly, in seq order
    by_doc: dict = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["seq_id"])
        assert rs[0]["tok_start"] == 0
        assert rs[-1]["tok_end"] == packed[doc_id]["n_tokens"]
        for a, b in zip(rs, rs[1:]):
            assert a["tok_end"] == b["tok_start"]
            assert b["seq_id"] == a["seq_id"] + 1

    # per sequence: span lengths sum to exactly budget (except the tail)
    per_seq: dict = {}
    for r in spans:
        per_seq[r["seq_id"]] = per_seq.get(r["seq_id"], 0) + (
            r["tok_end"] - r["tok_start"]
        )
    tail = max(per_seq)
    assert all(v == budget for s, v in per_seq.items() if s != tail)
    assert 0 < per_seq[tail] <= budget
    # zero-token docs contribute no spans
    assert set(by_doc) == {i for i, p in packed.items() if p["n_tokens"] > 0}


def test_doc_span_dup_flags_shared_boilerplate(spark):
    from apmbackend_spark.operators.dedup import doc_span_dup

    boiler = " ".join(f"w{i}" for i in range(20))  # exactly one chunk
    uniq_a = " ".join(f"a{i}" for i in range(20))
    uniq_b = " ".join(f"b{i}" for i in range(20))
    docs = _docs(
        spark,
        [
            (1, boiler + " " + uniq_a),   # chunk0=boiler (dup), chunk1=uniq
            (2, boiler + " " + uniq_b),   # chunk0=boiler (dup), chunk1=uniq
            (3, uniq_a),                  # same as doc1's chunk1 -> dup
            (4, "short text"),            # < 20 tokens: zero chunks
        ],
    )
    out = {r["doc_id"]: r for r in doc_span_dup(docs).collect()}
    assert out[1]["n_chunks"] == 2 and out[1]["n_dup_chunks"] == 2
    assert out[2]["n_chunks"] == 2 and out[2]["n_dup_chunks"] == 1
    assert out[3]["n_chunks"] == 1 and out[3]["n_dup_chunks"] == 1
    assert out[4]["n_chunks"] == 0 and out[4]["dup_fraction"] == 0.0
    assert out[1]["dup_fraction"] == 1.0 and out[2]["dup_fraction"] == 0.5


def test_corpus_prepare_exact_scrubs_duplicate_and_packs_kept(spark):
    # two quality-passing docs share a 6-token run; the canonical copy
    # (lower doc_id) survives intact, the other is cut; packing runs over
    # the SCRUBBED counts so start offsets reflect n_kept
    from apmbackend_spark.operators.prepare import corpus_prepare_exact

    run = "the shared run of tokens here"  # 6 tokens, stopword-heavy
    # fillers pass the quality filter (stopword-rich prose) and share no
    # 4-gram with each other or the run, so the run is the ONLY duplicate
    filler1 = (
        "the quick fox is in a big field and the dog sleeps for hours "
        "on the warm mat with a bone today now"
    )  # 23 tokens
    filler2 = (
        "a small bird flew to the old tree and sang with the wind in "
        "its wings for a long while at dusk"
    )  # 22 tokens
    docs = spark.createDataFrame(
        [
            (1, f"{filler1} {run}", "en", "src0", 100),
            (2, f"{run} {filler2}", "en", "src0", 100),
            (3, "zz", "en", "src0", 2),  # fails the filter -> absent
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in corpus_prepare_exact(docs, k=4, budget=16).collect()
    }
    assert sorted(out) == [1, 2]  # the filtered doc never reaches scrub
    assert out[1]["n_raw"] == 29 and out[1]["n_cut"] == 0
    assert out[1]["n_kept"] == 29  # canonical copy survives intact
    assert out[2]["n_raw"] == 28 and out[2]["n_cut"] == 6
    assert out[2]["n_kept"] == 22  # exactly the shared run cut
    # packing over KEPT counts in doc_id order
    assert out[1]["start_offset"] == 0 and out[1]["seq_id"] == 0
    assert out[2]["start_offset"] == 29 and out[2]["seq_id"] == 29 // 16


def _unimax_reference(lang_tokens, epoch_cap, num, den):
    """Literal UniMax water-filling replay."""
    total = sum(lang_tokens.values())
    b = (total * num) // den
    items = sorted(
        ((epoch_cap * n, lang, n) for lang, n in lang_tokens.items())
    )
    out = {}
    left = len(items)
    for cap, lang, n in items:
        share = b // left
        alloc = min(cap, share)
        out[lang] = (n, cap, alloc, alloc == cap)
        b -= alloc
        left -= 1
    return out


def test_unimax_alloc_matches_python_reference_and_invariants(spark):
    from apmbackend_spark.operators.prepare import unimax_alloc

    docs = [
        (0, "aa", "one two three"),
        (1, "aa", "four five"),
        (2, "bb", "a b c d e f g h i j k l m n o p"),
        (3, "cc", "x y z"),
        (4, "dd", "solo"),
    ]
    df = spark.createDataFrame(
        [(d, t, lg, "s", len(t)) for d, lg, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    lang_tokens = {"aa": 5, "bb": 16, "cc": 3, "dd": 1}
    want = _unimax_reference(lang_tokens, epoch_cap=2, num=3, den=2)
    got = {
        r["lang"]: (r["n_tokens"], r["cap"], r["alloc"], r["capped"])
        for r in unimax_alloc(df).collect()
    }
    assert got == want
    # budget exhaustion: total alloc == budget unless every lang capped
    total = sum(lang_tokens.values())
    budget = (total * 3) // 2
    allocs = sum(v[2] for v in got.values())
    if not all(v[3] for v in got.values()):
        assert allocs == budget
    assert allocs <= budget
    # epoch cap never exceeded
    for lang, (n, cap, alloc, _) in got.items():
        assert alloc <= 2 * n


def test_unimax_all_capped_leaves_budget_unspent(spark):
    from apmbackend_spark.operators.prepare import unimax_alloc

    df = spark.createDataFrame(
        [(0, "one two", "aa", "s", 7), (1, "three four", "bb", "s", 10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # budget 4x total > caps (1x total each at epoch_cap=1): all capped
    got = {r["lang"]: r for r in unimax_alloc(df, epoch_cap=1, frac=(4, 1)).collect()}
    assert all(r["capped"] for r in got.values())
    assert all(r["alloc"] == r["n_tokens"] for r in got.values())


def test_unimax_alloc_plan_single_rollup_no_python(spark):
    from apmbackend_spark.operators.prepare import unimax_alloc
    from apmbackend_spark.sources.loaders import load_table
    from tests.conftest import SF_SMOKE

    df = unimax_alloc(load_table(spark, SF_SMOKE, "documents"))
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "partial_sum" in p  # the tokenize rollup is map-side combinable


def test_curriculum_order_phases_and_permutation(spark):
    import hashlib

    from apmbackend_spark.operators.packing import curriculum_order
    from apmbackend_spark.operators.textstats import doc_stats
    from apmbackend_spark.sources.loaders import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    got = curriculum_order(docs).collect()
    q = {r["doc_id"]: r["quality"] for r in doc_stats(docs).collect()}
    for r in got:
        want_phase = 0 if q[r["doc_id"]] < 0.25 else (1 if q[r["doc_id"]] < 0.45 else 2)
        assert r["phase"] == want_phase, r
        k = hashlib.md5(f"curr42:{r['doc_id']}".encode()).hexdigest()
        assert r["shard"] == int(k[:8], 16) % 8, r
    # positions are a dense 1..n permutation within every (phase, shard)
    by_ps = {}
    for r in got:
        by_ps.setdefault((r["phase"], r["shard"]), []).append(r["pos"])
    for ps, positions in by_ps.items():
        assert sorted(positions) == list(range(1, len(positions) + 1)), ps
    # both ends of the curriculum must exist on the fixture
    phases = {r["phase"] for r in got}
    assert 0 in phases and 2 in phases


def test_curriculum_order_plan_one_window_no_python(spark):
    from apmbackend_spark.operators.packing import curriculum_order
    from apmbackend_spark.sources.loaders import load_table
    from tests.conftest import SF_SMOKE

    df = curriculum_order(load_table(spark, SF_SMOKE, "documents"))
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert p.count("Exchange") <= 2  # the (phase, shard) window partition
    assert "Window" in p


def _temp_mix_reference(lang_tokens, alphas=(19661, 45875, 65536), budget=1_000_000):
    """Pure-Python twin of the integer temperature-sampling pipeline:
    fixed-point log2, the 16-step exp2 ladder, exponent alignment,
    largest-remainder apportionment."""
    from tests.test_selection import _l2fix_py

    consts = [round(2 ** (2 ** -j) * 2 ** 30) for j in range(1, 17)]
    out = {}
    for a in alphas:
        rows = []
        for lang, c in lang_tokens.items():
            x = (a * _l2fix_py(max(c, 1))) >> 16
            e, f = x >> 16, x % 65536
            m = 1 << 30
            for j in range(1, 17):
                if (f >> (16 - j)) & 1:
                    m = (m * consts[j - 1]) >> 30
            rows.append((lang, c, m, e))
        e_max = max(e for _, _, _, e in rows)
        rows = [
            (lang, c, m >> min(e_max - e, 62)) for lang, c, m, e in rows
        ]
        tot = sum(w for _, _, w in rows)
        base = [(lang, c, w, budget * w // tot, budget * w % tot) for lang, c, w in rows]
        deficit = budget - sum(b[3] for b in base)
        ranked = sorted(base, key=lambda b: (-b[4], b[0]))
        topped = {b[0] for b in ranked[:deficit]}
        for lang, c, w, a0, _ in base:
            out[(a, lang)] = (c, w, a0 + (1 if lang in topped else 0))
    return out


def test_temp_mixture_matches_python_reference_bitwise(spark):
    from apmbackend_spark.operators.prepare import temp_mixture

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    import re
    from collections import Counter

    toks = Counter()
    for r in df.select("lang", "text").collect():
        n = len([w for w in re.split(r"[^0-9a-zA-Z]+", (r["text"] or "").lower()) if w])
        toks[r["lang"]] += n
    want = _temp_mix_reference(dict(toks))
    got = {
        (r["alpha_fix"], r["lang"]): (r["n_tokens"], r["w_norm"], r["alloc"])
        for r in temp_mixture(df).collect()
    }
    assert got == want  # weights + apportionment BIT-exact


def test_temp_mixture_semantics(spark):
    # budget realized exactly per alpha; alpha=1.0 is proportional
    # (max relative deviation < 1 token of rounding); smaller alpha
    # flattens the mix (min share grows, max share shrinks); and the
    # integer weights track float c^alpha within ladder tolerance
    from apmbackend_spark.operators.prepare import (
        TEMP_MIX_BUDGET,
        temp_mixture,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = temp_mixture(df).collect()
    by_alpha = {}
    for r in rows:
        by_alpha.setdefault(r["alpha_fix"], []).append(r)
    for a, rs in by_alpha.items():
        assert sum(r["alloc"] for r in rs) == TEMP_MIX_BUDGET, a
        tot_w = sum(r["w_norm"] for r in rs)
        tot_c = sum(r["n_tokens"] for r in rs)
        for r in rs:
            f = (r["n_tokens"] / tot_c) ** (a / 65536)
            norm = sum(
                (q["n_tokens"] / tot_c) ** (a / 65536) for q in rs
            )
            assert abs(r["w_norm"] / tot_w - f / norm) < 1e-3, (a, r["lang"])
    mins = {a: min(r["alloc"] for r in rs) for a, rs in by_alpha.items()}
    maxs = {a: max(r["alloc"] for r in rs) for a, rs in by_alpha.items()}
    assert mins[19661] >= mins[45875] >= mins[65536]
    assert maxs[19661] <= maxs[45875] <= maxs[65536]


def test_mixture_two_level_semantics(spark):
    # per-source language allocations sum EXACTLY to the source tier's
    # UniMax allocation; the source tier replays unimax semantics (caps
    # respected, budget realized up to all-capped); flattening works
    # within sources (alpha=1.0 degenerate check via alpha knob)
    from apmbackend_spark.operators.prepare import (
        UNIMAX_BUDGET_FRAC,
        UNIMAX_EPOCH_CAP,
        mixture_two_level,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = mixture_two_level(df).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    total_tokens = sum(r["n_tokens"] for r in rows)
    num, den = UNIMAX_BUDGET_FRAC
    budget = total_tokens * num // den
    src_allocs = {}
    for src, rs in by_src.items():
        sa = rs[0]["src_alloc"]
        assert all(r["src_alloc"] == sa for r in rs)
        assert sum(r["alloc"] for r in rs) == sa, src
        n_src = sum(r["n_tokens"] for r in rs)
        assert sa <= UNIMAX_EPOCH_CAP * n_src  # epoch cap respected
        src_allocs[src] = sa
    assert sum(src_allocs.values()) <= budget
    # flattening: within each source the allocation ordering follows the
    # token-count ordering (monotone in c for a monotone weight fn)
    for src, rs in by_src.items():
        rs2 = sorted(rs, key=lambda r: r["n_tokens"])
        allocs = [r["alloc"] for r in rs2]
        assert allocs == sorted(allocs), src
    # ...but flatter than proportional: the smallest language's share
    # exceeds its raw token share somewhere (alpha < 1 lifts the tail)
    lifted = 0
    for src, rs in by_src.items():
        n_src = sum(r["n_tokens"] for r in rs)
        sa = src_allocs[src]
        smallest = min(rs, key=lambda r: r["n_tokens"])
        if sa and smallest["alloc"] / sa > smallest["n_tokens"] / n_src:
            lifted += 1
    assert lifted >= len(by_src) // 2
