"""Unigram-LM tokenizer semantics (Kudo 2018 hard-EM; operators/unigram.py).

The Viterbi contract is validated against a step-by-step pure-Python
reference (maximize summed piece scores, ties to the smaller start
position), and the trained model against hand-checkable corpora where the
optimal pieces are obvious.
"""

from __future__ import annotations

from apmbackend_spark.operators.unigram import (
    NEG_INF,
    UNI_MAXPIECE,
    UNI_MAXWORD,
    unigram_encode,
    unigram_train,
)


def _log2fix_py(x: int) -> int:
    """Python twin of selection.py's fixed-point log2 fold."""
    e = x.bit_length() - 1
    m = x << (30 - e) if e <= 30 else x >> (e - 30)
    bits = 0
    for _ in range(16):
        m2 = m * m
        if m2 >= 1 << 61:
            m = m2 >> 31
            bits = bits * 2 + 1
        else:
            m = m2 >> 30
            bits = bits * 2
    return e * 65536 + bits


def _viterbi_py(pt: str, scores: dict[str, int]) -> list[str]:
    L = len(pt)
    best = [0] + [NEG_INF] * L
    bp = [0] * (L + 1)
    for i in range(1, L + 1):
        for j in range(max(0, i - UNI_MAXPIECE), i):
            sc = scores.get(pt[j:i])
            if sc is None or best[j] <= NEG_INF:
                continue
            v = best[j] + sc
            if v > best[i]:  # strict: ties keep the smaller j seen first
                best[i] = v
                bp[i] = j
    pieces = []
    p = L
    while p > 0:
        j = bp[p]
        pieces.append(pt[j:p])
        p = j
    return pieces


def _train_py(docs: list[str]):
    """Reference trainer: mirrors _train_frames step for step."""
    import re
    from collections import Counter

    toks = []
    for t in docs:
        toks += [w for w in re.split(r"[^0-9a-z]+", t.lower()) if w]
    pret = Counter(w for w in toks if len(w) <= UNI_MAXWORD)
    pcnt: Counter = Counter()
    for pt, f in pret.items():
        for i in range(len(pt)):
            for l in range(1, min(UNI_MAXPIECE, len(pt) - i) + 1):
                pcnt[pt[i : i + l]] += f
    chars = {p: c for p, c in pcnt.items() if len(p) == 1}
    longs = sorted(
        ((p, c) for p, c in pcnt.items() if len(p) >= 2),
        key=lambda x: (-x[1], x[0]),
    )[:80]
    v0 = dict(chars, **dict(longs))
    tot0, nv0 = sum(v0.values()), len(v0)
    s0 = {
        p: _log2fix_py(c + 1) - _log2fix_py(tot0 + nv0) for p, c in v0.items()
    }
    u1: Counter = Counter()
    for pt, f in pret.items():
        for piece in _viterbi_py(pt, s0):
            u1[piece] += f
    kept = sorted(
        ((p, u) for p, u in u1.items() if len(p) >= 2 and u > 0),
        key=lambda x: (-x[1], x[0]),
    )[:40]
    v1 = {p: u1.get(p, 0) for p in chars} | dict(kept)
    tot1, nv1 = sum(v1.values()), len(v1)
    s1 = {
        p: _log2fix_py(u + 1) - _log2fix_py(tot1 + nv1) for p, u in v1.items()
    }
    u2: Counter = Counter()
    segs = {}
    for pt, f in pret.items():
        pieces = _viterbi_py(pt, s1)
        segs[pt] = pieces
        for piece in pieces:
            u2[piece] += f
    return s1, u2, segs


DOCS = [
    "the cat sat on the mat the cat sat",
    "catalog catalog catnip mat mat mat on on",
    "internationalization is one very long word",
    "the the the thecat catcat",
]


def test_unigram_train_matches_python_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], "doc_id long, text string"
    )
    s1, u2, _ = _train_py(DOCS)
    got = {
        r["piece"]: (r["piece_len"], r["n_used"], r["score"])
        for r in unigram_train(df).collect()
    }
    assert set(got) == set(s1)
    for p in got:
        assert got[p][0] == len(p), p
        assert got[p][1] == u2.get(p, 0), p
        assert got[p][2] == s1[p], p  # exact fixed-point score
    # the trainer must actually have learned multi-char pieces and used
    # them: at least one len>=2 piece with nonzero final usage
    assert any(len(p) >= 2 and u2.get(p, 0) > 0 for p in got)


def test_unigram_encode_matches_python_reference(spark):
    import re
    from collections import Counter

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], "doc_id long, text string"
    )
    _, _, segs = _train_py(DOCS)
    rows = {r["doc_id"]: r for r in unigram_encode(df).collect()}
    assert set(rows) == set(range(len(DOCS)))
    for i, t in enumerate(DOCS):
        toks = [w for w in re.split(r"[^0-9a-z]+", t.lower()) if w]
        cnt = Counter(toks)
        n_words = sum(cnt.values())
        enc = {w: c for w, c in cnt.items() if len(w) <= UNI_MAXWORD}
        n_enc = sum(enc.values())
        n_pieces = sum(c * len(segs[w]) for w, c in enc.items())
        r = rows[i]
        assert r["n_words"] == n_words, i
        assert r["n_enc_words"] == n_enc, i
        assert r["n_pieces"] == n_pieces, i
        want_f = n_pieces / n_enc if n_enc else 0.0
        assert r["fertility"] == want_f, i
    # the long word is counted outside the Viterbi tier...
    r2 = rows[2]
    assert r2["n_words"] == r2["n_enc_words"] + 1
    # ...and segmented by the byte/char FALLBACK tier: its pieces are its
    # chars, hashed with the same order-free modular piece hash
    import hashlib

    word = "internationalization"
    assert r2["fb_pieces"] == len(word)
    want_hash = sum(
        int(hashlib.md5(c.encode()).hexdigest()[:15], 16) % (1 << 40)
        for c in word
    )
    assert r2["fb_hash"] == want_hash
    # docs without over-long words carry an empty fallback tier
    assert rows[0]["fb_pieces"] == 0 and rows[0]["fb_hash"] == 0


def test_fallback_probe_feeds_only_the_fallback_tier(spark):
    # with_fallback_probe must leave training untouched (probes exceed the
    # pretoken length cap) and only move n_words/fb_pieces/fb_hash
    from apmbackend_spark.operators.unigram import (
        unigram_train,
        with_fallback_probe,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], "doc_id long, text string"
    )
    probed = with_fallback_probe(df)
    plain_train = {
        (r["piece"], r["n_used"], r["score"])
        for r in unigram_train(df).collect()
    }
    probe_train = {
        (r["piece"], r["n_used"], r["score"])
        for r in unigram_train(probed).collect()
    }
    assert probe_train == plain_train
    plain = {r["doc_id"]: r for r in unigram_encode(df).collect()}
    got = {r["doc_id"]: r for r in unigram_encode(probed).collect()}
    for i in plain:
        if i % 7 == 0:
            assert got[i]["n_words"] == plain[i]["n_words"] + 2, i
            assert got[i]["fb_pieces"] > plain[i]["fb_pieces"], i
        else:
            assert got[i] == plain[i], i
        # Viterbi-tier columns never move
        assert got[i]["n_pieces"] == plain[i]["n_pieces"], i
        assert got[i]["piece_hash"] == plain[i]["piece_hash"], i


def test_viterbi_prefers_frequent_long_pieces():
    # 'mat' frequent enough to out-score char-by-char segmentation
    s = {
        "m": -100,
        "a": -100,
        "t": -100,
        "mat": -150,
        "ma": -180,
        "at": -180,
    }
    assert _viterbi_py("mat", s) == ["mat"]
    assert _viterbi_py("matmat", s) == ["mat", "mat"]


def test_viterbi_tie_prefers_longer_last_piece():
    # equal total score: DP keeps the smaller start j (longer last piece)
    s = {"a": -10, "b": -10, "ab": -20}
    # 'ab' via ['ab'] scores -20; via ['a','b'] also -20 -> j=0 wins
    assert _viterbi_py("ab", s) == ["ab"]


# ---------------------------------------------------------------------------
# Soft-EM: pure-Python softfloat reference (mirrors the packed integer ops).


_SFB = 1 << 31
_SF_BIAS = 4096
_SF_ONE = (_SF_BIAS - 30) * _SFB + (1 << 30)


def _sfp(m, e):
    return (e + _SF_BIAS) * _SFB + m


def _sfu(x):
    return x % _SFB, x // _SFB - _SF_BIAS


def _sf_ratio(num, den):
    bln, bld = num.bit_length(), den.bit_length()
    mn = num >> (bln - 31) if bln >= 31 else num << (31 - bln)
    md = den >> (bld - 31) if bld >= 31 else den << (31 - bld)
    q = (mn << 31) // md
    sh = q.bit_length() - 31
    return q >> sh, bln - bld - 31 + sh


def _sf_mul(a, pm, pe):
    ma, ea = _sfu(a)
    prod = ma * pm
    sh = prod.bit_length() - 31
    return _sfp(prod >> sh, ea + pe + sh)


def _sf_add(a, b):
    if a == 0:
        return b
    if b == 0:
        return a
    hi, lo = (a, b) if a >= b else (b, a)
    mh, eh = _sfu(hi)
    ml, el = _sfu(lo)
    s = mh + (ml >> min(eh - el, 62))
    sh = s.bit_length() - 31
    return _sfp(s >> sh, eh + sh)


def _sf_div(a, b):
    ma, ea = _sfu(a)
    mb, eb = _sfu(b)
    q = (ma << 31) // mb
    sh = q.bit_length() - 31
    return _sfp(q >> sh, ea - eb - 31 + sh)


def _sf_q16(x):
    m, e = _sfu(x)
    t = e + 16
    return (m << min(t, 20)) if t >= 0 else (m >> min(-t, 62))


def _soft_estep_py(pret, subs, pv):
    """One forward-backward E-step with the identical packed integer ops
    and the identical sorted fold order."""
    return _soft_estep_ll_py(pret, subs, pv)[0]


def _soft_estep_ll_py(pret, subs, pv):
    """(u, ll): the E-step plus the fixed-point corpus log-likelihood
    (sum of freq * (log2fix(m_Z) + e_Z * 2^16) over packed Z=alpha(n))."""
    from collections import Counter

    ll = 0
    u = Counter()
    for pt in pret:
        n = len(pt)
        cands = sorted(
            ((i * 16 + j) * 256 * _SFB
             + (pv[p][1] + 192) * _SFB + pv[p][0], i, j, p)
            for (w, f, i, j, p) in subs
            if w == pt and p in pv
        )
        al = [_SF_ONE] + [0] * n
        for t in range(1, n + 1):
            acc = 0
            for _, i, j, p in cands:
                if i == t:
                    acc = _sf_add(acc, _sf_mul(al[j], *pv[p]))
            al[t] = acc
        rb = [_SF_ONE]
        for k in range(1, n + 1):
            acc = 0
            for _, i, j, p in cands:
                if j == n - k:
                    acc = _sf_add(acc, _sf_mul(rb[n - i], *pv[p]))
            rb.append(acc)
        for _, i, j, p in cands:
            post = _sf_div(
                _sf_mulp(_sf_mul(al[j], *pv[p]), rb[n - i]), al[n]
            )
            u[p] += pret[pt] * _sf_q16(post)
        zm, ze = al[n] % _SFB, al[n] // _SFB - _SF_BIAS
        ll += pret[pt] * (_log2fix_py(zm) + ze * 65536)
    return u, ll


def _soft_train_py(docs: list[str]):
    """Reference two-round soft-EM loop (E-step -> prune -> re-smooth in
    quantized units -> E-step)."""
    import re
    from collections import Counter

    pret = Counter()
    for t in docs:
        for w in re.split(r"[^0-9a-z]+", t.lower()):
            if w and len(w) <= UNI_MAXWORD:
                pret[w] += 1
    pcnt = Counter()
    subs = []
    for pt, f in pret.items():
        for i0 in range(1, len(pt) + 1):
            for l in range(1, min(UNI_MAXPIECE, len(pt) - i0 + 1) + 1):
                piece = pt[i0 - 1 : i0 - 1 + l]
                subs.append((pt, f, i0 + l - 1, i0 - 1, piece))
                pcnt[piece] += f
    chars = {p: c for p, c in pcnt.items() if len(p) == 1}
    longer = sorted(
        ((p, c) for p, c in pcnt.items() if len(p) >= 2),
        key=lambda x: (-x[1], x[0]),
    )[:80]
    v0 = dict(chars)
    v0.update(dict(longer))
    dd = sum(v0.values()) + len(v0)
    pv0 = {p: _sf_ratio(c + 1, dd) for p, c in v0.items()}
    u1 = _soft_estep_py(pret, subs, pv0)
    kept = sorted(
        ((p, u) for p, u in u1.items() if len(p) >= 2 and u > 0),
        key=lambda x: (-x[1], x[0]),
    )[:40]
    v1u = {p: u1.get(p, 0) for p in chars} | dict(kept)
    dd1 = sum(v1u.values()) + len(v1u) * 65536
    pv1 = {p: _sf_ratio(u + 65536, dd1) for p, u in v1u.items()}
    u2 = _soft_estep_py(pret, subs, pv1)
    uv = {p: u2.get(p, 0) for p in v1u}
    tot = sum(uv.values())
    l_tot = _log2fix_py(tot + len(uv) * 65536)
    return {
        p: (c, _log2fix_py(c + 65536) - l_tot) for p, c in uv.items()
    }


def _sf_mulp(a, b):
    ma, ea = _sfu(a)
    mb, eb = _sfu(b)
    prod = ma * mb
    sh = prod.bit_length() - 31
    return _sfp(prod >> sh, ea + eb + sh)


def test_unigram_train_soft_matches_python_reference_bitwise(spark):
    from apmbackend_spark.operators.unigram import unigram_train_soft

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], "doc_id long, text string"
    )
    want = _soft_train_py(DOCS)
    got = {
        r["piece"]: (r["u_soft"], r["score"])
        for r in unigram_train_soft(df).collect()
    }
    assert set(got) == set(want)
    for p in got:
        assert got[p] == want[p], p  # expected counts + scores BIT-exact


def test_unigram_soft_posteriors_track_float_forward_backward(spark):
    # the quantized expected counts must track an independent FLOAT
    # forward-backward to within quantization error (the softfloat is an
    # arithmetic rendering, not a different model)
    import re
    from collections import Counter

    from apmbackend_spark.operators.unigram import unigram_train_soft

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], "doc_id long, text string"
    )
    got = {r["piece"]: r["u_soft"] for r in unigram_train_soft(df).collect()}
    # float reference for ROUND 2: the pruned vocab + quantized round-1
    # counts come from the bit-exact reference (prune ranking near ties
    # must match the engine's); only the final forward-backward is float
    pret = Counter()
    for t in DOCS:
        for w in re.split(r"[^0-9a-z]+", t.lower()):
            if w and len(w) <= UNI_MAXWORD:
                pret[w] += 1
    pcnt = Counter()
    subs = []
    for pt, f in pret.items():
        for i0 in range(1, len(pt) + 1):
            for l in range(1, min(UNI_MAXPIECE, len(pt) - i0 + 1) + 1):
                piece = pt[i0 - 1 : i0 - 1 + l]
                subs.append((pt, f, i0 + l - 1, i0 - 1, piece))
                pcnt[piece] += f
    chars = {p for p in pcnt if len(p) == 1}
    longer = sorted(
        ((p, c) for p, c in pcnt.items() if len(p) >= 2),
        key=lambda x: (-x[1], x[0]),
    )[:80]
    v0 = {p: pcnt[p] for p in chars} | dict(longer)
    dd = sum(v0.values()) + len(v0)
    pv0 = {p: _sf_ratio(c + 1, dd) for p, c in v0.items()}
    u1 = _soft_estep_py(pret, subs, pv0)
    kept = sorted(
        ((p, u) for p, u in u1.items() if len(p) >= 2 and u > 0),
        key=lambda x: (-x[1], x[0]),
    )[:40]
    v1u = {p: u1.get(p, 0) for p in chars} | dict(kept)
    dd1 = sum(v1u.values()) + len(v1u) * 65536
    pf = {p: (u + 65536) / dd1 for p, u in v1u.items()}
    uf = Counter()
    occ = Counter()
    for pt, f in pret.items():
        n = len(pt)
        cands = [
            (i, j, pt[j:i])
            for i in range(1, n + 1)
            for j in range(max(0, i - UNI_MAXPIECE), i)
            if pt[j:i] in pf
        ]
        af = [1.0] + [0.0] * n
        for t in range(1, n + 1):
            af[t] = sum(af[j] * pf[p] for (i, j, p) in cands if i == t)
        bf = [0.0] * n + [1.0]
        for t in range(n - 1, -1, -1):
            bf[t] = sum(pf[p] * bf[i] for (i, j, p) in cands if j == t)
        for i, j, p in cands:
            uf[p] += f * af[j] * pf[p] * bf[i] / af[n]
            occ[p] += f
    for p, uq in got.items():
        # quantization: each (occurrence, freq) contribution floors at
        # 2^-16, so the worst error is occ[p]/2^16; the softfloat adds
        # ~1e-9 relative truncation per op chain
        bound = occ.get(p, 0) / 65536.0 + 1e-6 * max(uf.get(p, 0.0), 1.0)
        assert abs(uq / 65536.0 - uf.get(p, 0.0)) <= bound, p


def test_unigram_encode_soft_segments_under_soft_scores(spark):
    # end-to-end soft-model grading: the per-doc piece counts and the
    # order-free piece hash must equal a pure-Python Viterbi under the
    # bit-exact soft reference's scores
    import hashlib
    import re
    from collections import Counter

    from apmbackend_spark.operators.unigram import unigram_encode_soft

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], "doc_id long, text string"
    )
    scores = {p: sc for p, (u, sc) in _soft_train_py(DOCS).items()}

    def h64(piece: str) -> int:
        return int(hashlib.md5(piece.encode()).hexdigest()[:15], 16) % (
            1 << 40
        )

    rows = {r["doc_id"]: r for r in unigram_encode_soft(df).collect()}
    differs = False
    for i, t in enumerate(DOCS):
        toks = [w for w in re.split(r"[^0-9a-z]+", t.lower()) if w]
        cnt = Counter(w for w in toks if len(w) <= UNI_MAXWORD)
        n_pieces = 0
        phash = 0
        for w, c in cnt.items():
            pieces = _viterbi_py(w, scores)
            n_pieces += c * len(pieces)
            phash += c * sum(h64(p) for p in pieces)
        r = rows[i]
        assert r["n_pieces"] == n_pieces, i
        assert r["piece_hash"] == phash, i
    # ...and the soft model genuinely differs from the hard one somewhere
    from apmbackend_spark.operators.unigram import unigram_encode

    hard = {r["doc_id"]: r["piece_hash"] for r in unigram_encode(df).collect()}
    differs = any(rows[i]["piece_hash"] != hard[i] for i in rows)
    # (equality on every doc would mean the soft scores never flip a
    # segmentation on this corpus — possible in principle, but then the
    # gate adds nothing; the toy corpus is built so they differ)
    assert differs


def _soft_iter_py(docs, max_rounds=4, min_gain=655):
    """Reference iterated soft-EM with the stopping rule — identical
    integer ops, identical round schedule."""
    import re
    from collections import Counter

    pret = Counter()
    for t in docs:
        for w in re.split(r"[^0-9a-z]+", t.lower()):
            if w and len(w) <= UNI_MAXWORD:
                pret[w] += 1
    pcnt = Counter()
    subs = []
    for pt, f in pret.items():
        for i0 in range(1, len(pt) + 1):
            for l in range(1, min(UNI_MAXPIECE, len(pt) - i0 + 1) + 1):
                piece = pt[i0 - 1 : i0 - 1 + l]
                subs.append((pt, f, i0 + l - 1, i0 - 1, piece))
                pcnt[piece] += f
    chars = {p: c for p, c in pcnt.items() if len(p) == 1}
    longer = sorted(
        ((p, c) for p, c in pcnt.items() if len(p) >= 2),
        key=lambda x: (-x[1], x[0]),
    )[:80]
    v0 = dict(chars)
    v0.update(dict(longer))
    dd = sum(v0.values()) + len(v0)
    pv0 = {p: _sf_ratio(c + 1, dd) for p, c in v0.items()}
    u1 = _soft_estep_py(pret, subs, pv0)
    kept = sorted(
        ((p, u) for p, u in u1.items() if len(p) >= 2 and u > 0),
        key=lambda x: (-x[1], x[0]),
    )[:40]
    v1p = set(chars) | {p for p, _ in kept}
    cur = {p: u1.get(p, 0) for p in v1p}
    tot_freq = sum(pret.values())
    threshold = min_gain * tot_freq
    prev_ll = None
    ll = 0
    n_rounds = 1
    for r in range(2, max_rounds + 1):
        dd_r = sum(cur.values()) + len(cur) * 65536
        pv = {p: _sf_ratio(u + 65536, dd_r) for p, u in cur.items()}
        us, ll = _soft_estep_ll_py(pret, subs, pv)
        cur = {p: us.get(p, 0) for p in v1p}
        n_rounds = r
        if prev_ll is not None and ll - prev_ll < threshold:
            break
        prev_ll = ll
    tot = sum(cur.values())
    l_tot = _log2fix_py(tot + len(cur) * 65536)
    return {
        p: (c, _log2fix_py(c + 65536) - l_tot) for p, c in cur.items()
    }, n_rounds, ll


def test_unigram_train_soft_iter_matches_python_reference_bitwise(spark):
    from apmbackend_spark.operators.unigram import unigram_train_soft_iter

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], "doc_id long, text string"
    )
    want, n_rounds, ll = _soft_iter_py(DOCS)
    rows = unigram_train_soft_iter(df).collect()
    got = {r["piece"]: (r["u_soft"], r["score"]) for r in rows}
    assert got == want  # expected counts + scores BIT-exact
    assert rows[0]["n_rounds"] == n_rounds
    assert rows[0]["ll"] == ll


def test_unigram_soft_iter_stopping_rule_both_branches(spark):
    # the stopping decision is data+threshold-driven: a huge min_gain
    # stops at the first decision point (round 3), min_gain=0 runs to
    # max_rounds — and the log-likelihood is monotone across rounds
    from apmbackend_spark.operators.unigram import unigram_train_soft_iter

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], "doc_id long, text string"
    )
    early = unigram_train_soft_iter(df, min_gain=10**15).collect()
    full = unigram_train_soft_iter(df, min_gain=0).collect()
    assert early[0]["n_rounds"] == 3
    assert full[0]["n_rounds"] == 4
    assert full[0]["ll"] >= early[0]["ll"]  # EM monotonicity (quantized)
    # both agree with the python reference under the same knobs
    _, nr_e, ll_e = _soft_iter_py(DOCS, min_gain=10**15)
    _, nr_f, ll_f = _soft_iter_py(DOCS, min_gain=0)
    assert (early[0]["n_rounds"], early[0]["ll"]) == (nr_e, ll_e)
    assert (full[0]["n_rounds"], full[0]["ll"]) == (nr_f, ll_f)


def _soft_prune_py(docs, max_rounds=4, target_multi=24):
    """Reference INTERLEAVED schedule: per round E-step -> LL ->
    prune-by-loss-delta (keep top 3/4 multi by u*(sc-alt), chars
    survive) until the multi vocab reaches target_multi."""
    import re
    from collections import Counter

    pret = Counter()
    for t in docs:
        for w in re.split(r"[^0-9a-z]+", t.lower()):
            if w and len(w) <= UNI_MAXWORD:
                pret[w] += 1
    pcnt = Counter()
    subs = []
    for pt, f in pret.items():
        for i0 in range(1, len(pt) + 1):
            for l in range(1, min(UNI_MAXPIECE, len(pt) - i0 + 1) + 1):
                piece = pt[i0 - 1 : i0 - 1 + l]
                subs.append((pt, f, i0 + l - 1, i0 - 1, piece))
                pcnt[piece] += f
    chars = {p: c for p, c in pcnt.items() if len(p) == 1}
    longer = sorted(
        ((p, c) for p, c in pcnt.items() if len(p) >= 2),
        key=lambda x: (-x[1], x[0]),
    )[:80]
    v0 = dict(chars)
    v0.update(dict(longer))
    dd = sum(v0.values()) + len(v0)
    pv0 = {p: _sf_ratio(c + 1, dd) for p, c in v0.items()}
    u1 = _soft_estep_py(pret, subs, pv0)
    kept = sorted(
        ((p, u) for p, u in u1.items() if len(p) >= 2 and u > 0),
        key=lambda x: (-x[1], x[0]),
    )[:40]
    cur = {p: u1.get(p, 0) for p in chars} | dict(kept)
    ll = 0
    n_rounds = 1
    for r in range(2, max_rounds + 1):
        dd_r = sum(cur.values()) + len(cur) * 65536
        pv = {p: _sf_ratio(u + 65536, dd_r) for p, u in cur.items()}
        us, ll = _soft_estep_ll_py(pret, subs, pv)
        uvx = {p: us.get(p, 0) for p in cur}
        tot = sum(uvx.values())
        l_tot = _log2fix_py(tot + len(uvx) * 65536)
        sc = {p: _log2fix_py(u + 65536) - l_tot for p, u in uvx.items()}
        deltas = {}
        for p, u in uvx.items():
            if len(p) < 2:
                continue
            L = len(p)
            dp = [0] + [NEG_INF] * L
            for i in range(1, L + 1):
                for j in range(max(0, i - UNI_MAXPIECE), i):
                    sub = p[j:i]
                    s = sc.get(sub)
                    if sub == p or s is None or dp[j] <= NEG_INF:
                        continue
                    dp[i] = max(dp[i], dp[j] + s)
            deltas[p] = u * (sc[p] - dp[L])
        ranked = sorted(deltas.items(), key=lambda x: (-x[1], x[0]))
        keep = {p for p, _ in ranked[: len(ranked) * 3 // 4]}
        cur = {
            p: u for p, u in uvx.items() if len(p) == 1 or p in keep
        }
        n_rounds = r
        if sum(1 for p in cur if len(p) >= 2) <= target_multi:
            break
    tot = sum(cur.values())
    l_tot = _log2fix_py(tot + len(cur) * 65536)
    return {
        p: (c, _log2fix_py(c + 65536) - l_tot) for p, c in cur.items()
    }, n_rounds, ll


def test_unigram_train_soft_prune_matches_python_reference_bitwise(spark):
    from apmbackend_spark.operators.unigram import unigram_train_soft_prune

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], "doc_id long, text string"
    )
    want, n_rounds, ll = _soft_prune_py(DOCS)
    rows = unigram_train_soft_prune(df).collect()
    got = {r["piece"]: (r["u_soft"], r["score"]) for r in rows}
    assert got == want  # survivors + counts + scores BIT-exact
    assert rows[0]["n_rounds"] == n_rounds
    assert rows[0]["ll"] == ll


def test_unigram_soft_prune_schedule_invariants(spark):
    # chars all survive; the multi vocab follows the exact 3/4-shrink
    # sequence from the round-1 keep and stops at the first round at or
    # under the target — the trainer's actual termination rule
    from apmbackend_spark.operators.unigram import (
        UNI_SOFT_SHRINK_DEN,
        UNI_SOFT_SHRINK_NUM,
        unigram_train_soft_prune,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(DOCS)], "doc_id long, text string"
    )
    target = 24
    rows = unigram_train_soft_prune(df, target_multi=target).collect()
    chars = {p for p, _ in _soft_prune_py(DOCS)[0].items() if len(p) == 1}
    got_chars = {r["piece"] for r in rows if r["piece_len"] == 1}
    assert got_chars == chars
    n_multi = sum(1 for r in rows if r["piece_len"] >= 2)
    assert n_multi <= target
    # replay the shrink arithmetic from the round-1 keep count
    k, rounds = 40, 1
    while k > target:
        k = k * UNI_SOFT_SHRINK_NUM // UNI_SOFT_SHRINK_DEN
        rounds += 1
    assert n_multi == k
    assert rows[0]["n_rounds"] == rounds
