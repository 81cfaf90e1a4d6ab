"""Unit tests for the SCD2 snapshot merge (operators/scd.py). Cross-engine
parity of the graded composition is in test_oracle_parity.py; these pin the
merge semantics over consecutive deliveries."""

from __future__ import annotations

from apmbackend_spark.operators.scd import scd2_init, scd2_merge


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, seg string, bal double")


def _by_version(rows):
    out = {}
    for r in rows:
        out.setdefault(r["k"], []).append(r)
    for v in out.values():
        v.sort(key=lambda r: r["valid_from"])
    return out


def test_two_consecutive_merges_build_history(spark):
    t0, t1, t2 = 0, 100, 200
    scd = scd2_init(_snap(spark, [(1, "A", 1.0), (2, "B", 2.0)]), t0)
    # t1: key 1 changes, key 3 appears, key 2 absent (no news)
    scd = scd2_merge(
        scd, _snap(spark, [(1, "A2", 1.0), (3, "C", 3.0)]), "k",
        ["seg", "bal"], t1,
    )
    # t2: key 1 changes again, key 2 finally changes
    scd = scd2_merge(
        scd, _snap(spark, [(1, "A3", 1.0), (2, "B2", 2.0)]), "k",
        ["seg", "bal"], t2,
    )
    v = _by_version(scd.collect())
    k1 = [(r["seg"], r["valid_from"], r["valid_to"], r["is_current"]) for r in v[1]]
    assert k1 == [("A", 0, 100, False), ("A2", 100, 200, False), ("A3", 200, None, True)]
    k2 = [(r["seg"], r["valid_from"], r["valid_to"], r["is_current"]) for r in v[2]]
    assert k2 == [("B", 0, 200, False), ("B2", 200, None, True)]
    k3 = [(r["seg"], r["valid_from"], r["valid_to"], r["is_current"]) for r in v[3]]
    assert k3 == [("C", 100, None, True)]


def test_unchanged_row_is_not_versioned(spark):
    scd = scd2_init(_snap(spark, [(1, "A", 1.0)]), 0)
    out = scd2_merge(
        scd, _snap(spark, [(1, "A", 1.0)]), "k", ["seg", "bal"], 50
    ).collect()
    assert len(out) == 1
    assert out[0]["valid_from"] == 0 and out[0]["is_current"]


def test_null_transitions_version_correctly(spark):
    # NULL -> value and value -> NULL must both count as changes
    scd = scd2_init(_snap(spark, [(1, None, 1.0), (2, "B", 2.0)]), 0)
    out = scd2_merge(
        scd, _snap(spark, [(1, "A", 1.0), (2, None, 2.0)]), "k",
        ["seg", "bal"], 50,
    )
    v = _by_version(out.collect())
    assert [r["seg"] for r in v[1]] == [None, "A"]
    assert [r["seg"] for r in v[2]] == ["B", None]
    assert all(len(vs) == 2 for vs in v.values())


def test_merge_matches_naive_reference_on_randomized_delivery(spark):
    """Differential guard for the single-pass explode form of scd2_merge:
    a seeded randomized dim + delivery (churn, absent keys, new keys,
    NULL attr transitions) must produce exactly the rows of the naive
    per-leg reference computed in plain Python."""
    import random

    rng = random.Random(0x5CD)
    segs = ["A", "B", "C", None]
    dim = [
        (k, rng.choice(segs), float(rng.randint(0, 5)))
        for k in range(1, 61)
    ]
    # delivery: ~1/3 changed, ~1/4 absent, some brand-new keys, and NULL
    # flips in both directions
    snap = []
    for k, seg, bal in dim:
        r = rng.random()
        if r < 0.25:
            continue  # absent -> carried
        if r < 0.60:
            snap.append((k, rng.choice(segs), float(rng.randint(0, 5))))
        else:
            snap.append((k, seg, bal))  # unchanged delivery
    snap += [(1000 + k, rng.choice(segs), float(k)) for k in range(7)]

    t0, t1 = 0, 777
    out = scd2_merge(
        scd2_init(_snap(spark, dim), t0), _snap(spark, snap), "k",
        ["seg", "bal"], t1,
    ).collect()

    # naive reference over the same inputs
    snap_by_k = {k: (seg, bal) for k, seg, bal in snap}
    expect = set()
    for k, seg, bal in dim:
        if k not in snap_by_k or snap_by_k[k] == (seg, bal):
            expect.add((k, seg, bal, t0, None, True))
        else:
            expect.add((k, seg, bal, t0, t1, False))
            nseg, nbal = snap_by_k[k]
            expect.add((k, nseg, nbal, t1, None, True))
    dim_keys = {k for k, _, _ in dim}
    for k, (seg, bal) in snap_by_k.items():
        if k not in dim_keys:
            expect.add((k, seg, bal, t1, None, True))

    got = {
        (r["k"], r["seg"], r["bal"], r["valid_from"], r["valid_to"],
         r["is_current"])
        for r in out
    }
    assert got == expect
