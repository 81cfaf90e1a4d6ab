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
