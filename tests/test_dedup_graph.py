"""Label-propagation community semantics (operators/dedup.py::
labelprop_from_pairs — Raghavan et al. 2007, the graded synchronous
fixed-round spec)."""

from __future__ import annotations


def _lpa_reference(pairs, iters=3):
    """Pure-Python replay of the graded spec: synchronous rounds, label(v)
    starts at v, update = argmax neighbor label by (count DESC, label ASC)."""
    from collections import Counter, defaultdict

    adj = defaultdict(list)
    for a, b in pairs:
        adj[a].append(b)
        adj[b].append(a)
    labels = {v: v for v in adj}
    for _ in range(iters):
        new = {}
        for v, nbrs in adj.items():
            cnt = Counter(labels[u] for u in nbrs)
            new[v] = min(cnt, key=lambda l: (-cnt[l], l))
        labels = new
    return labels


def test_lpa_splits_bridged_cliques_where_cc_merges(spark):
    # two 4-cliques joined by ONE bridge edge: connected components see a
    # single blob; LPA keeps the bridge as a label border
    import itertools

    from apmbackend_spark.operators.dedup import labelprop_from_pairs

    cliques = [list(range(4)), list(range(10, 14))]
    pairs = [
        (a, b) for c in cliques for a, b in itertools.combinations(c, 2)
    ] + [(3, 10)]
    pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: (r["lpa_label"], r["n_members"])
        for r in labelprop_from_pairs(pdf).collect()
    }
    want = _lpa_reference(pairs)
    assert {v: lab for v, (lab, _n) in got.items()} == want
    lab_a = {got[v][0] for v in (0, 1, 2)}
    lab_b = {got[v][0] for v in (11, 12, 13)}
    assert len(lab_a) == 1 and len(lab_b) == 1 and lab_a != lab_b
    # n_members is the community size under the final labels
    from collections import Counter

    sizes = Counter(want.values())
    for v, (lab, n) in got.items():
        assert n == sizes[lab], v


def test_lpa_matches_reference_on_irregular_graph(spark):
    # chain + triangle + isolated edge: every shape the tie rule touches
    from apmbackend_spark.operators.dedup import labelprop_from_pairs

    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (5, 6), (6, 7), (5, 7), (20, 21)]
    pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["lpa_label"]
        for r in labelprop_from_pairs(pdf).collect()
    }
    assert got == _lpa_reference(pairs)


def test_bloom_dedup_no_false_negatives_and_fp_regime(spark):
    # planted exact dups across the batch/corpus split MUST bloom-hit
    # (no false negatives — the Bloom guarantee), novel docs mostly miss
    # at this (m, k, n) point, and false_positive is exactly hit&!dup
    from apmbackend_spark.operators.dedup import bloom_dedup

    rows = []
    for i in range(200):
        if i % 5 == 0 and i % 10 == 0:
            text = f"shared duplicate body {i // 10}"  # batch doc...
            rows.append((i, text))
            rows.append((i + 1, text))  # ...with a corpus twin (i+1 % 5 != 0)
        else:
            rows.append((i, f"unique body {i} with words {i * 7}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in bloom_dedup(docs).collect()}
    assert set(out) == {i for i, _ in rows if i % 5 == 0}
    for i, r in out.items():
        assert r["false_positive"] == (r["bloom_hit"] and not r["exact_dup"])
        if r["exact_dup"]:
            assert r["bloom_hit"], i  # NO false negatives, ever
    dups = [i for i, r in out.items() if r["exact_dup"]]
    assert len(dups) == 20  # every planted twin found
    # the novel majority should mostly miss (m=2^16, k=4, n~180 -> tiny FPR)
    novel = [r for r in out.values() if not r["exact_dup"]]
    fps = sum(1 for r in novel if r["bloom_hit"])
    assert fps <= len(novel) // 10


def test_dup_kcore_converges_to_exact_peeling(spark):
    # the iterated h-index at the gate's fixed rounds must equal the
    # TRUE coreness from an exact sequential peel of the same LSH graph
    from apmbackend_spark.operators.dedup import dup_kcore, minhash_lsh_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    edges = [
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs).collect()
    ]
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # standard peel: coreness(v) = value of k when v is removed, where k
    # only ever increases
    deg2 = {v: len(ns) for v, ns in adj.items()}
    neigh2 = {v: set(ns) for v, ns in adj.items()}
    want = {}
    k = 0
    live2 = dict(deg2)
    while live2:
        v = min(live2, key=lambda x: (live2[x], x))
        k = max(k, live2[v])
        want[v] = k
        for u in neigh2[v]:
            if u in live2:
                neigh2[u].discard(v)
                live2[u] = len(neigh2[u] & set(live2))
        del live2[v]
    got = {
        r["doc_id"]: (r["degree"], r["coreness"])
        for r in dup_kcore(docs).collect()
    }
    assert set(got) == set(deg2)
    for v in got:
        assert got[v][0] == deg2[v], v
        assert got[v][1] == want[v], v
    # the measure does real work: coreness differs from degree somewhere
    assert any(got[v][1] != got[v][0] for v in got)
