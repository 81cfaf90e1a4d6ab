"""Dedup operator unit tests beyond the oracle sweep: the hot-shingle
document-frequency guard (skew bomb mitigation) on adversarial input."""

from __future__ import annotations

from apmbackend_spark.operators.dedup import ngram_jaccard_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def test_hot_shingle_cap_drops_stopword_pairs(spark):
    # 40 docs that share ONLY a stopword-ish boilerplate trigram, plus two
    # genuine near-duplicates.
    boiler = "all rights reserved"
    rows = [
        (i, f"{boiler} unique{i} alpha{i} beta{i} gamma{i}") for i in range(40)
    ]
    rows += [
        (100, "the quick brown fox jumps over the lazy dog"),
        (101, "the quick brown fox jumps over the lazy cat"),
    ]
    docs = _docs(spark, rows)

    uncapped = ngram_jaccard_pairs(docs, threshold=0.1, max_doc_freq=1000)
    capped = ngram_jaccard_pairs(docs, threshold=0.1, max_doc_freq=10)

    un_pairs = {(r["doc_a"], r["doc_b"]) for r in uncapped.collect()}
    cap_pairs = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}

    # uncapped: the boilerplate shingle alone creates ~40^2/2 join pairs
    assert any(a < 40 and b < 40 for a, b in un_pairs)
    # capped: boilerplate (df=40 > 10) is dropped; no boiler-only pairs
    assert not any(a < 40 and b < 40 for a, b in cap_pairs)
    # the genuine near-dup pair survives the cap
    assert (100, 101) in cap_pairs


def test_cap_recomputes_sizes_on_filtered_universe(spark):
    # Two identical docs plus a hot shingle spread across many others: with
    # the hot shingle removed, the identical pair must stay jaccard == 1.0.
    hot = "copyright twenty twentysix"
    rows = [(i, f"{hot} filler{i} pad{i} word{i}") for i in range(20)]
    rows += [
        (200, f"{hot} identical body of text here"),
        (201, f"{hot} identical body of text here"),
    ]
    docs = _docs(spark, rows)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, threshold=0.5, max_doc_freq=5
        ).collect()
    }
    assert got.get((200, 201)) == 1.0


def test_simhash_pairs_pigeonhole_recall(spark):
    # Band blocking must find EVERY pair within max_hamming — verify against
    # a brute-force all-pairs Hamming computation on the same signatures.
    from apmbackend_spark.operators.dedup import simhash, simhash_pairs

    rows = [
        (i, f"shared body of mostly common text tokens here variant{i % 7}")
        for i in range(30)
    ] + [(i, f"totally unrelated document number {i} " + " ".join(
        f"w{i}x{j}" for j in range(10))) for i in range(50, 60)]
    docs = _docs(spark, rows)
    k = 3

    sigs = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    ids = sorted(sigs)
    expect = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(sigs[a] ^ sigs[b]).count("1") <= k
    }
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_pairs(docs, max_hamming=k).collect()
    }
    assert expect  # fixture must actually produce near-dup pairs
    assert got == expect


def test_dedup_clusters_transitive_closure(spark):
    # a~b and b~c via shared text => all three land in one cluster even if
    # a and c never share an LSH band; d is an unrelated singleton.
    from apmbackend_spark.operators.dedup import dedup_clusters

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base + " tail one"),
        (2, base + " tail one variant"),
        (3, base + " tail one variant two"),
        (10, "completely different text about spark catalyst optimizer plans"),
    ]
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(_docs(spark, rows)).collect()
    }
    assert out[10] == 10  # singleton keeps its own id
    assert out[1] == 1
    # 2 and 3 must collapse into doc 1's component (transitively)
    assert out[2] == 1 and out[3] == 1


def test_corpus_cardinality_hll_close_to_exact(spark):
    # the HLL scale path must agree with the exact path within its
    # advertised rsd (1.5% default; allow 5% at fixture cardinalities)
    from apmbackend_spark.operators.textstats import corpus_cardinality
    from apmbackend_spark.sources.loaders import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    exact = {r["source"]: r["n_distinct"] for r in corpus_cardinality(docs).collect()}
    approx = {
        r["source"]: r["n_distinct"]
        for r in corpus_cardinality(docs, approx=True).collect()
    }
    assert set(exact) == set(approx)
    for src, n in exact.items():
        assert abs(approx[src] - n) <= max(1, 0.05 * n), (src, n, approx[src])


def test_dedup_incremental_exact_near_and_novel(spark):
    from apmbackend_spark.operators.dedup import dedup_incremental

    base = (
        "the quick brown fox jumps over the lazy dog and then walks back "
        "home because it forgot the keys to the barn near the river bank"
    )
    other = (
        "a completely different story about mountain trails where hikers "
        "carry heavy packs through winding paths toward the granite summit"
    )
    rows = [
        # corpus (doc_id % 5 != 0)
        (1, base),
        (2, other),
        # batch (doc_id % 5 == 0)
        (5, base),                      # exact dup of 1
        (10, base + " yesterday"),      # near dup of 1 (shares bands)
        (15, "totally novel text about deep sea creatures and coral"),
    ]
    out = {
        r["doc_id"]: (r["dup_of"], r["via"])
        for r in dedup_incremental(_docs(spark, rows)).collect()
    }
    assert set(out) == {5, 10, 15}
    assert out[5] == (1, "exact")
    assert out[10][1] in ("minhash", None) or out[10] == (1, "minhash")
    # novel doc: no corpus collision of either kind
    assert out[15] == (None, None)
    # exact wins over minhash when both fire
    assert out[5][1] == "exact"


# ---------------------------------------------------------------------------
# Winnowing fingerprint


def _fp_sets(spark, rows, k=8, w=4):
    from pyspark.sql import functions as F

    from apmbackend_spark.operators.dedup import doc_fingerprint

    # re-derive the raw fingerprint arrays (the gate folds them) by
    # running the same expression pipeline with n_fp only
    out = {
        r["doc_id"]: (r["n_kgrams"], r["n_fp"], r["fp_fold"])
        for r in doc_fingerprint(
            spark.createDataFrame(rows, "doc_id long, text string"), k, w
        ).collect()
    }
    return out


def test_winnow_identical_docs_fold_equal(spark):
    rows = [(1, "The quick brown fox jumps over the lazy dog!"),
            (2, "the QUICK brown-fox ... jumps over the lazy dog"),
            (3, "an entirely different sentence with other words")]
    out = _fp_sets(spark, rows)
    # normalization strips case/punct/whitespace: 1 and 2 normalize
    # identically -> identical fingerprint profile
    assert out[1] == out[2]
    assert out[1] != out[3]
    # xor fold of a non-empty set is (almost surely) nonzero
    assert out[1][2] != 0


def test_winnow_guarantee_shared_long_substring(spark):
    # winnowing guarantee: a shared substring of >= k+w-1 chars (normalized)
    # contributes at least one common fingerprint. Verify via the raw sets.
    from pyspark.sql import functions as F

    from apmbackend_spark.operators.dedup import doc_fingerprint

    shared = "xylophonequartzmarmaladeobelisk"  # 31 chars >= 8+4-1
    rows = [(1, "aaa bbb ccc " + shared + " ddd"),
            (2, shared + " zzz yyy unrelated tail words here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # recover the sets by exploding: run doc_fingerprint's internals via the
    # public frame equality instead — fold differs but intersection must be
    # non-empty, so check via a pairwise xor trick: if the sets were
    # disjoint, |union| = n_fp1 + n_fp2. Compute union size by
    # fingerprinting the concatenated corpus vocabulary — simplest honest
    # check: explode raw selected hashes with a local reimplementation.
    import hashlib

    def winnow(text, k=8, w=4):
        import re

        s = re.sub("[^a-z0-9]", "", text.lower())
        hs = [
            int(hashlib.md5(s[i : i + k].encode()).hexdigest()[:15], 16)
            for i in range(len(s) - k + 1)
        ]
        return {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}

    s1, s2 = winnow(rows[0][1]), winnow(rows[1][1])
    assert s1 & s2, "winnowing guarantee violated in reference model"
    # engine agrees with the local model on count + fold per doc
    out = {r["doc_id"]: r for r in doc_fingerprint(df).collect()}
    for doc_id, s in ((1, s1), (2, s2)):
        fold = 0
        for x in s:
            fold ^= x
        assert out[doc_id]["n_fp"] == len(s)
        assert out[doc_id]["fp_fold"] == fold


def test_winnow_short_doc_empty_profile(spark):
    rows = [(1, "ab"), (2, "")]
    out = _fp_sets(spark, rows)
    assert out[1] == (0, 0, 0)
    assert out[2] == (0, 0, 0)


def test_line_dedup_drops_corpus_boilerplate_keeps_order(spark):
    from apmbackend_spark.operators.dedup import line_dedup

    # even doc_ids get the shared HEADER line (4 of them -> corpus count 4
    # >= 3 -> dropped); footer variant doc_id%5 recurs at most twice here
    # (below threshold -> kept); body lines are unique -> kept.
    rows = [(i, f"body text of document {i}") for i in range(2, 10)]
    out = {
        r["doc_id"]: r
        for r in line_dedup(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert set(out) == set(range(2, 10))
    for i in range(2, 10):
        r = out[i]
        lines = r["kept_text"].split("\n")
        if i % 2 == 0:  # had the HEADER boilerplate -> dropped
            assert r["n_dropped"] >= 1
            assert all("HEADER" not in ln for ln in lines)
        # body retained, in original position (first kept line)
        assert lines[0] == f"body text of document {i}"
        # footer kept (each variant occurs <= 2x in this corpus)
        assert any(ln.startswith("COPYRIGHT") for ln in lines)


def test_winnow_engine_matches_model_on_diverse_corpus(spark):
    # seeded diverse batch: unicode, punctuation-only, repeats, short/empty,
    # long runs — engine (n_kgrams, n_fp, fp_fold) must equal the local
    # reference model on every row
    import hashlib
    import re

    from apmbackend_spark.operators.dedup import WINNOW_K, WINNOW_W, doc_fingerprint

    def model(text, k=WINNOW_K, w=WINNOW_W):
        s = re.sub("[^a-z0-9]", "", (text or "").lower())
        n_kgrams = max(len(s) - k + 1, 0)
        if n_kgrams == 0:
            return (0, 0, 0)
        hs = [
            int(hashlib.md5(s[i : i + k].encode()).hexdigest()[:15], 16)
            for i in range(n_kgrams)
        ]
        if len(hs) < w:
            return (n_kgrams, 0, 0)
        fps = {min(hs[j : j + w]) for j in range(len(hs) - w + 1)}
        fold = 0
        for x in fps:
            fold ^= x
        return (n_kgrams, len(fps), fold)

    corpus = [
        "",
        "ab",
        "!!! ??? ...",
        "aaaaaaaaaaaaaaaaaaaaaaaa",
        "The quick brown fox; the quick brown fox; the quick brown fox",
        "MiXeD CaSe With   WHITESPACE\tand\nnewlines here",
        "digits 1234567890 interleaved 1a2b3c4d5e6f7g8h",
        "Ünïcödé ìs strípped by the ascii-only normalizer, leaving nothing?",
        "a b c d e f g h i j k l m n o p q r s t u v w x y z",
        "x" * 7 + "y",  # exactly k chars after normalize
    ]
    rows = [(i, t) for i, t in enumerate(corpus)]
    got = {
        r["doc_id"]: (r["n_kgrams"], r["n_fp"], r["fp_fold"])
        for r in doc_fingerprint(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    for i, t in rows:
        assert got[i] == model(t), (i, t, got[i], model(t))


def test_bpe_pair_counts_single_char_pretoken_emits_no_pair(spark):
    # regression: Spark sequence(1, 0) runs DESCENDING — an ungated range
    # emitted two phantom self-pairs per 1-char pretoken (DuckDB emits none)
    from apmbackend_spark.operators.textstats import bpe_pair_counts

    df = spark.createDataFrame([(1, "a , b . a")], "doc_id long, text string")
    got = {r["pair"]: r["n"] for r in bpe_pair_counts(df).collect()}
    # pretokens: 'a', ' ,', ' b', ' .', ' a' — the bare 'a' contributes none
    assert got == {" ,": 1, " .": 1, " a": 1, " b": 1}


# ---------------------------------------------------------------------------
# dup_triangles (clustering coefficient over the candidate graph)


def test_dup_triangles_matches_python_reference(spark):
    from itertools import combinations

    from apmbackend_spark.operators.dedup import (
        dup_triangles,
        minhash_lsh_pairs,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from a warm windowsill nearby every single afternoon"
    )
    texts = [
        base,                    # 0: near-identical trio -> clique
        base + " indeed",        # 1: suffix-only deltas keep jaccard ~0.95
        base + " truly",         # 2
        "completely different words about spark shuffles and parquet "
        "files that share nothing with the animal corpus at all here",  # 3
        "another unrelated document talking about benchmark harnesses "
        "and oracle twins with zero overlap whatsoever in shingles",    # 4
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", f"s{i}", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    edges = {
        (r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()
    }
    # python reference: exact triangles per node over the same edge set
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {n: 0 for n in adj}
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                tri[n] += 1
    got = {r["doc_id"]: r for r in dup_triangles(docs).collect()}
    assert set(got) == set(adj)
    for n in adj:
        deg = len(adj[n])
        assert got[n]["degree"] == deg
        assert got[n]["triangles"] == tri[n]
        want_cc = (2.0 * tri[n]) / (deg * (deg - 1)) if deg >= 2 else 0.0
        assert got[n]["clustering"] == want_cc
    # the mirror trio must actually close a triangle for the test to bite
    assert (0, 1) in edges and (0, 2) in edges
    if (1, 2) in edges:
        assert got[0]["triangles"] >= 1


def test_dup_triangles_orientation_no_cartesian(spark):
    from apmbackend_spark.operators.dedup import dup_triangles

    docs = spark.createDataFrame(
        [(i, f"doc number {i} words alpha beta gamma delta", "en", "s", 40)
         for i in range(4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df = dup_triangles(docs)
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


# ---------------------------------------------------------------------------
# minhash_est_pairs (Broder agreement estimator)


def test_minhash_est_tracks_exact_jaccard(spark):
    from apmbackend_spark.operators.dedup import (
        minhash_est_pairs,
        ngram_jaccard_pairs,
    )

    base = (
        "one two three four five six seven eight nine ten eleven twelve "
        "thirteen fourteen fifteen sixteen seventeen eighteen nineteen"
    )
    texts = [
        base,
        base + " twenty",          # near-identical -> jaccard ~0.9+
        base.replace("one two three four five six ", "")
        + " other tail words entirely",  # moderate overlap
        "nothing shared with the number corpus in any shingle at all",
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    est = {
        (r["doc_a"], r["doc_b"]): (r["agree"], r["est_sim"])
        for r in minhash_est_pairs(docs).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.0).collect()
    }
    assert (0, 1) in est
    for pair, (agree, sim) in est.items():
        assert sim == agree / 32.0  # dyadic-exact score
        if pair in exact:
            # unbiased estimator with 32 samples: allow a generous band
            assert abs(sim - exact[pair]) < 0.35, (pair, sim, exact[pair])
    # the near-identical pair must score clearly high
    assert est[(0, 1)][1] >= 0.6


# ---------------------------------------------------------------------------
# span_exact_dedup (ExactSubstr semantics: arbitrary-boundary spans)


def test_span_exact_catches_chunk_straddling_duplicate(spark):
    # A 20-token duplicate run placed at DIFFERENT offsets in two docs:
    # every chunk_tokens=20 ALIGNED chunk mixes duplicate with unique
    # context, so doc_span_dup reports zero dup chunks — the documented
    # blind spot — while the window-exact operator recovers the exact
    # token range of the shared run in both docs.
    from apmbackend_spark.operators.dedup import doc_span_dup, span_exact_dedup

    dup_run = " ".join(f"shared{i}" for i in range(20))
    doc_a = " ".join(f"ua{i}" for i in range(10)) + " " + dup_run + " " + \
        " ".join(f"va{i}" for i in range(10))
    doc_b = " ".join(f"wb{i}" for i in range(5)) + " " + dup_run + " " + \
        " ".join(f"xb{i}" for i in range(15))
    docs = _docs(spark, [(1, doc_a), (2, doc_b)])

    chunked = {
        r["doc_id"]: r["n_dup_chunks"]
        for r in doc_span_dup(docs, chunk_tokens=20).collect()
    }
    assert chunked == {1: 0, 2: 0}  # the approximation misses it entirely

    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_len"])
        for r in span_exact_dedup(docs, k=16).collect()
    }
    # doc 1: run occupies tokens [10, 29]; doc 2: [5, 24]
    assert spans == {1: (10, 29, 20), 2: (5, 24, 20)}


def test_span_exact_merges_overlap_and_counts_within_doc(spark):
    from apmbackend_spark.operators.dedup import span_exact_dedup

    # within-doc repetition: the same 4-token phrase twice in ONE doc is
    # >= 2 occurrence sites, so both sites are duplicated spans
    phrase = "alpha beta gamma delta"
    doc = phrase + " filler1 filler2 filler3 filler4 " + phrase
    spans = sorted(
        (r["span_start"], r["span_end"])
        for r in span_exact_dedup(_docs(spark, [(1, doc)]), k=4).collect()
    )
    assert spans == [(0, 3), (8, 11)]

    # overlapping duplicated windows merge into ONE maximal span: a
    # 6-token shared run with k=4 yields starts {s, s+1, s+2} -> one span
    run = "p q r s t u"
    docs = _docs(spark, [(1, f"a1 b1 {run} c1"), (2, f"{run} z2 y2 x2")])
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_len"])
        for r in span_exact_dedup(docs, k=4).collect()
    }
    assert spans == {1: (2, 7, 6), 2: (0, 5, 6)}


def test_span_exact_no_dups_empty_and_short_docs(spark):
    from apmbackend_spark.operators.dedup import span_exact_dedup

    docs = _docs(
        spark,
        [(1, "one two three"), (2, "four five six seven"), (3, "")],
    )
    assert span_exact_dedup(docs, k=4).count() == 0


def test_span_scrub_keeps_canonical_copy_only(spark):
    from apmbackend_spark.operators.dedup import span_scrub

    run = " ".join(f"s{i}" for i in range(6))  # 6 shared tokens
    docs = _docs(
        spark,
        [
            (1, f"a1 b1 {run} c1"),        # canonical (lowest doc_id)
            (2, f"{run} z2 y2 x2"),        # duplicate -> cut
            (3, "plain unique text here"),  # untouched
        ],
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_cut"], r["n_kept"])
        for r in span_scrub(docs, k=4).collect()
    }
    # doc 1 keeps everything (it owns the canonical window sites)
    assert got[1] == (9, 0, 9)
    # doc 2 loses exactly the 6-token duplicated run
    assert got[2] == (9, 6, 3)
    assert got[3] == (4, 0, 4)

    # the scrubbed fingerprint proves the surviving SEQUENCE: doc 2's
    # survivors are its unique tail
    from apmbackend_spark.functions.text import hash64

    from pyspark.sql import functions as F

    want_fp = (
        spark.range(1)
        .select(hash64(F.lit("z2 y2 x2")).alias("fp"))
        .first()["fp"]
    )
    [r2] = [r for r in span_scrub(docs, k=4).collect() if r["doc_id"] == 2]
    assert r2["scrub_fp"] == want_fp


def test_span_scrub_within_doc_repetition_keeps_first(spark):
    from apmbackend_spark.operators.dedup import span_scrub

    phrase = "alpha beta gamma delta"
    doc = phrase + " mid1 mid2 " + phrase
    [r] = span_scrub(_docs(spark, [(1, doc)]), k=4).collect()
    # second occurrence cut, first kept
    assert (r["n_tokens"], r["n_cut"], r["n_kept"]) == (10, 4, 6)


def test_span_family_matches_python_reference_on_random_corpora(spark):
    # differential property: spans and scrub counts vs a literal Python
    # re-derivation on small random corpora with heavy shared runs
    import random

    from apmbackend_spark.operators.dedup import span_exact_dedup, span_scrub

    def ref(docs_tokens, k):
        # window occurrences
        occ = {}
        for did, toks in docs_tokens.items():
            for s in range(max(len(toks) - k + 1, 0)):
                occ.setdefault(tuple(toks[s:s + k]), []).append((did, s))
        dup_sites = {
            g: sorted(sites) for g, sites in occ.items() if len(sites) >= 2
        }
        # spans: merged islands of dup starts per doc
        spans = {}
        starts = {}
        for sites in dup_sites.values():
            for did, s in sites:
                starts.setdefault(did, set()).add(s)
        for did, ss in starts.items():
            ss = sorted(ss)
            cur = [ss[0], ss[0] + k - 1]
            out = []
            for s in ss[1:]:
                if s <= cur[1] + 1:
                    cur[1] = s + k - 1
                else:
                    out.append(tuple(cur))
                    cur = [s, s + k - 1]
            out.append(tuple(cur))
            spans[did] = out
        # scrub: cut all dup sites except the canonical min one
        cutpos = {}
        for sites in dup_sites.values():
            canon = sites[0]
            for did, s in sites:
                if (did, s) != canon:
                    cutpos.setdefault(did, set()).update(
                        range(s, s + k)
                    )
        scrub = {}
        for did, toks in docs_tokens.items():
            cut = cutpos.get(did, set())
            kept = [t for i, t in enumerate(toks) if i not in cut]
            scrub[did] = (len(toks), len(toks) - len(kept), len(kept))
        return spans, scrub

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(8)]
    shared = [rng.choice(vocab) for _ in range(7)]
    docs_tokens = {}
    for did in range(1, 9):
        toks = [rng.choice(vocab) for _ in range(rng.randint(0, 14))]
        if did % 2 == 0:  # half the docs embed the shared run somewhere
            at = rng.randint(0, len(toks))
            toks = toks[:at] + shared + toks[at:]
        docs_tokens[did] = toks
    k = 4
    docs = _docs(
        spark, [(d, " ".join(t)) for d, t in docs_tokens.items()]
    )
    want_spans, want_scrub = ref(docs_tokens, k)
    got_spans = {}
    for r in span_exact_dedup(docs, k=k).collect():
        got_spans.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    assert {d: sorted(v) for d, v in got_spans.items()} == want_spans
    got_scrub = {
        r["doc_id"]: (r["n_tokens"], r["n_cut"], r["n_kept"])
        for r in span_scrub(docs, k=k).collect()
    }
    assert got_scrub == want_scrub


def test_span_scrub_long_fully_duplicated_doc_stays_linear(spark):
    # Adversarial shape from the round-6 verdict: a long document whose
    # EVERY window is duplicated has |cuts| ~ |tokens|, so a rebuild that
    # tests each position against the raw cut-start list is O(n^2) in one
    # row (~10^8 interpreted HOF steps at 12k tokens). The island-merged
    # rebuild sees exactly ONE interval and stays linear.
    import time

    from apmbackend_spark.operators.dedup import span_scrub

    n = 12_000
    body = " ".join(f"t{i}" for i in range(n))
    docs = _docs(spark, [(1, body), (2, body)])
    t0 = time.time()
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_cut"], r["n_kept"])
        for r in span_scrub(docs, k=16).collect()
    }
    wall = time.time() - t0
    # doc 1 owns every canonical site; doc 2 is one full-cover island
    assert got == {1: (n, 0, n), 2: (n, n, 0)}
    # generous ceiling: the quadratic form takes minutes on this input,
    # the island form low seconds even on a loaded box
    assert wall < 60, f"span_scrub rebuild took {wall:.0f}s — quadratic?"


# ---------------------------------------------------------------------------
# winnowing fingerprints


def _winnow_reference(text, k, w):
    import hashlib
    import re

    t = [x for x in re.split(r"[^a-z0-9]+", text.lower()) if x]
    h = [
        int(hashlib.md5(" ".join(t[i:i + k]).encode()).hexdigest()[:15], 16)
        for i in range(len(t) - k + 1)
    ]
    if not h:
        return set()
    n_win = max(len(h) - w + 1, 1)
    sel = set()
    for i in range(n_win):
        win = h[i:i + w]
        # rightmost minimum (the paper's rule)
        best = max(
            (j for j in range(len(win)) if win[j] == min(win))
        )
        sel.add(h[i + best])
    return sel


def test_winnow_selection_matches_python_reference(spark):
    from apmbackend_spark.operators.dedup import winnow_matches

    shared = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (0, f"alpha beta {shared} gamma delta"),
        (1, f"one two three {shared} four five"),   # shares a long run with 0
        (2, "completely different words everywhere nothing matches here at all ok"),
        (3, "tiny"),                                  # < k tokens: no grams
        (4, "six little tokens only here"),           # grams < w: one window
    ]
    df = spark.createDataFrame(
        [(d, t, "en", "s", len(t)) for d, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in winnow_matches(df).collect()
    }
    fps = {d: _winnow_reference(t, 5, 4) for d, t in docs}
    want = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            n = len(fps[a] & fps[b])
            if n:
                want[(a, b)] = n
    assert got == want
    # the guarantee: a shared run of >= w + k - 1 = 8 tokens MUST match
    assert (0, 1) in got and got[(0, 1)] >= 1


def test_winnow_density_and_plan(spark):
    from apmbackend_spark.operators.dedup import winnow_matches
    from apmbackend_spark.sources.loaders import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    df = winnow_matches(docs)
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "CartesianProduct" not in p
    rows = df.collect()
    assert len(rows) > 0  # fixture near-dups are caught
    assert all(r["n_shared"] >= 1 for r in rows)


def test_lsh_band_plan_chooses_shipped_banding_and_tracks_float(spark):
    # the k=8 argmin must be the repo's SHIPPED minhash_lsh banding
    # (4 bands x 2 rows), and every budget's integer-fixed-point argmin
    # must agree with an independent FLOAT rendering of the same
    # FP+FN integral (the datasketch optimal_param calculation)
    from apmbackend_spark.operators.dedup import (
        LSH_PLAN_GRID,
        LSH_PLAN_KS,
        lsh_band_plan,
        _lsh_plan_rows,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = lsh_band_plan(df).collect()
    assert len(rows) == len(_lsh_plan_rows())
    chosen = {
        r["n_hashes"]: (r["bands"], r["rows_per_band"])
        for r in rows
        if r["chosen"] == 1
    }
    assert chosen[8] == (4, 2)

    def float_err(b, r):
        G = LSH_PLAN_GRID
        fp = sum(
            1 - (1 - (i / G) ** r) ** b for i in range(1, G // 2)
        )
        fn = sum(
            (1 - (i / G) ** r) ** b for i in range(G // 2, G)
        )
        return fp + fn

    for k in LSH_PLAN_KS:
        pairs = [(b, k // b) for b in range(1, k + 1) if k % b == 0]
        best = min(pairs, key=lambda p: (float_err(*p), p[0]))
        assert chosen[k] == best, k
